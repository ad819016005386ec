"""CLI entry point — the engine's replacement for the reference's Flask
webapp / FastAPI surface (SURVEY.md §2.3: upload→analyze becomes
``python -m pycatcher_ray`` / ``ray job submit -- python -m
pycatcher_ray ...``).

Subcommands:

  flagship --input <parquet...> --out <dir> [--detect-tier 1h] [--no-checkpoint]
      run the full rollup+detect+compress pipeline (resumable).
  detect --input <file.{parquet,csv,json}> [--method stl] [--key-col col]
         [--ts-col col] [--value-col col] [--tier 1h]
      rollup + single-method anomaly scan over any supported input file;
      prints flag rows as CSV to stdout.
  synth --out <dir> --rows N [--sources K]
      write the deterministic native-input fixture.
"""

from __future__ import annotations

import argparse
import json
import sys


def _to_pandas_result(res):
    """Dataset | pandas | pyarrow → pandas (query results are small)."""
    import pandas as pd

    if isinstance(res, pd.DataFrame):
        return res
    return res.to_pandas()


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="pycatcher_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship")
    f.add_argument("--input", nargs="+", required=True)
    f.add_argument("--out", required=True)
    f.add_argument("--detect-tier", default="1h", choices=["1m", "1h", "1d"])
    f.add_argument("--no-checkpoint", action="store_true")

    d = sub.add_parser("detect")
    d.add_argument("--input", required=True)
    d.add_argument("--method", default="stl",
                   choices=["iqr", "zscore", "mad", "classic", "stl", "mstl",
                            "esd", "moving_average"])
    d.add_argument("--key-col", default="source")
    d.add_argument("--ts-col", default="ts")
    d.add_argument("--value-col", default="value")
    d.add_argument("--tier", default="1h", choices=["1m", "1h", "1d"])

    u = sub.add_parser("update")
    u.add_argument("--input", nargs="+", required=True,
                   help="NEW shards to fold into existing tiers")
    u.add_argument("--out", required=True,
                   help="out dir of a prior checkpointed flagship run")

    s = sub.add_parser("synth")
    s.add_argument("--out", required=True)
    s.add_argument("--rows", type=int, required=True)
    s.add_argument("--sources", type=int, default=20)

    c = sub.add_parser("curate", help="document-curation pipeline: quality "
                                      "gate -> exact dedup -> minhash "
                                      "near-dup -> checkpointed corpus write")
    c.add_argument("--input", nargs="+", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--min-quality", type=float, default=0.35)
    c.add_argument("--min-words", type=int, default=5)
    c.add_argument("--neardup-threshold", type=float, default=0.7)

    pr = sub.add_parser("profile", help="one-pass fused corpus profile "
                                        "(docs/chars/words/vocab/langs/"
                                        "quality/dup per source)")
    pr.add_argument("--input", nargs="+", required=True)
    pr.add_argument("--out", default=None,
                    help="optional parquet path for the report")

    q = sub.add_parser("query", help="run a registry query over an sf dir; "
                                     "CSV to stdout, or --out dir for "
                                     "partitioned parquet")
    q.add_argument("name", nargs="?", default=None,
                   help="query name (omit or use 'list' to enumerate)")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None,
                   help="write result as parquet to this dir instead of CSV")

    a = sub.add_parser("api", help="one JSON request (stdin) -> response "
                                   "(stdout); reference api_catch contract")
    a.add_argument("--endpoint", required=True,
                   choices=["find_outliers", "detect_outliers_stl",
                            "detect_outliers_today_classic"])

    args = p.parse_args(argv)

    if args.cmd == "api":
        from .serving import handle_api_request

        payload = json.load(sys.stdin)
        status, body = handle_api_request(args.endpoint, payload)
        print(json.dumps({"status": status, **body}, default=str))
        return 0 if status == 200 else 1

    if args.cmd == "synth":
        from .sources import write_tokens_dataset

        paths = write_tokens_dataset(args.out, args.rows,
                                     n_sources=args.sources)
        print(json.dumps({"files": len(paths), "dir": args.out}))
        return 0

    if args.cmd == "query":
        from .queries import queries as registry

        qs = registry()
        if args.name in (None, "list"):
            print("\n".join(sorted(qs)))
            return 0
        if args.name not in qs:
            print(f"unknown query {args.name!r}; run "
                  "'query list' for names", file=sys.stderr)
            return 1
        _init_ray()
        res = qs[args.name](args.sf_dir)
        if args.out is not None:
            import ray.data as rd

            if not isinstance(res, rd.Dataset):
                res = rd.from_pandas(_to_pandas_result(res))
            res.write_parquet(args.out)
            print(json.dumps({"query": args.name, "dir": args.out}))
        else:
            _to_pandas_result(res).to_csv(sys.stdout, index=False)
        return 0

    _init_ray()
    if args.cmd == "flagship":
        from .config import EngineConfig
        from .pipelines import run_flagship

        cfg = EngineConfig(detect_tier=args.detect_tier)
        flags, metrics = run_flagship(
            args.input, args.out, cfg,
            checkpoint_intermediate=not args.no_checkpoint,
        )
        print(json.dumps(metrics, default=str))
        return 0

    if args.cmd == "curate":
        from .pipelines import run_curation

        metrics = run_curation(
            args.input, args.out, min_quality=args.min_quality,
            min_words=args.min_words,
            neardup_threshold=args.neardup_threshold)
        print(json.dumps(metrics, default=str))
        return 0

    if args.cmd == "profile":
        from .pipelines.profile import run_profile

        metrics = run_profile(args.input, args.out)
        print(json.dumps(metrics, default=str))
        return 0

    if args.cmd == "update":
        from .pipelines.incremental import update_tiers

        metrics = update_tiers(args.input, args.out)
        print(json.dumps(metrics, default=str))
        return 0

    if args.cmd == "detect":
        from .config import TIERS, EngineConfig
        from .sources.readers import read_table
        from .stages.detect import detect
        from .stages.rollup import rollup

        ds = read_table(args.input)
        tier_seconds = TIERS[args.tier].seconds
        roll = rollup(ds, args.key_col, args.ts_col, args.value_col,
                      tier_seconds)
        cfg = EngineConfig(detect_concurrency=2)
        flags = detect(roll, args.key_col, tier=args.tier, cfg=cfg,
                       methods=(args.method,))
        flags.to_pandas().to_csv(sys.stdout, index=False)
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
