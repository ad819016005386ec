"""Benchmark harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line:

    {"metric": ..., "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N,
     "points_per_s": ..., "tokens_per_s": ...}

``--scaling`` runs the same bench twice in fresh processes (num_cpus=8
then 32) on the same input and reports both plus the scaling efficiency
(T8/T32)/4 — the sandbox stand-in for the north rule's N vs 4N cluster
criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from pycatcher_ray.config import EngineConfig
    from pycatcher_ray.pipelines import run_flagship
    from pycatcher_ray.queries import (
        ann_topk,
        dedup_exact,
        iqr_flags_1h,
        rollup_events,
        tokens_input_dir,
    )

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # ---- native tokens flagship (headline) -----------------------------
    tok_dir = tokens_input_dir(SF_DIR)  # cached synth; untimed
    paths = [os.path.join(tok_dir, f) for f in sorted(os.listdir(tok_dir))
             if f.endswith(".parquet")]
    # warm the page cache so we measure compute+shuffle, not cold disk
    ds = rd.read_parquet(paths)
    n_rows = ds.count()
    tokens_total = int(ds.sum("n_tok"))

    out_dir = f"/tmp/pycatcher_ray_bench/{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    cfg = EngineConfig(
        detect_tier="1h",
        detectors=("iqr", "mad", "zscore", "stl", "esd"),
        detect_concurrency=max(2, NUM_CPUS // 4),
        num_output_partitions=max(16, NUM_CPUS),
    )
    t0 = time.time()
    flags, metrics = run_flagship(paths, out_dir, cfg)
    headline = round(time.time() - t0, 3)
    timings["flagship_tokens"] = headline
    n_flags = flags.count()

    # rollup output points across tiers (for points/s)
    points = sum(
        s.get("rows_written", 0)
        for name, s in metrics["stages"].items()
        if name.startswith("rollup_")
    )

    # ---- events-based operator benchmarks ------------------------------
    timed("rollup_1m_events", lambda: rollup_events(SF_DIR, "1m").count())
    timed("rollup_1d_cascade_events", lambda: rollup_events(SF_DIR, "1d").count())
    timed("iqr_flags_1h_events", lambda: iqr_flags_1h(SF_DIR).count())
    timed("ann_topk", lambda: ann_topk(SF_DIR).count())
    timed("dedup_exact", lambda: dedup_exact(SF_DIR).count())

    shutil.rmtree(out_dir, ignore_errors=True)
    result = {
        "metric": "tokens flagship pipeline (ingest+rollup 1m/1h/1d+gapfill+detect+gorilla) wall time",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(os.path.normpath(SF_DIR)),
        "num_cpus": NUM_CPUS,
        "input_rows": n_rows,
        "tokens_total": tokens_total,
        "rollup_points": points,
        "flags": n_flags,
        "points_per_s": round(points / headline, 1) if headline else None,
        "tokens_per_s": round(tokens_total / headline, 1) if headline else None,
        "rows_per_s": round(n_rows / headline, 1) if headline else None,
    }
    ray.shutdown()
    return result


def _run_subprocess(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main():
    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        r_lo = _run_subprocess(lo)
        r_hi = _run_subprocess(hi)
        eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
        print(json.dumps({
            "metric": "scaling efficiency (num_cpus 8 -> 32, same input)",
            "value": round(eff, 3),
            "unit": "efficiency",
            "sec_8": r_lo["value"],
            "sec_32": r_hi["value"],
            "tokens_per_s_8": r_lo["tokens_per_s"],
            "tokens_per_s_32": r_hi["tokens_per_s"],
            "sf": r_hi["sf"],
        }))
    else:
        print(json.dumps(_run_bench()))


if __name__ == "__main__":
    main()
