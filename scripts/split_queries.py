"""Mechanical splitter: pycatcher_ray/queries.py -> pycatcher_ray/queries/
package (verdict r4 item 3).  Pure source move:

- top-level blocks keep their original text and relative order;
- shared helpers (referenced from >=2 family modules) land in _core.py,
  computed as a closure so _core never references a family module;
- family classification by input-table markers (tokens / events /
  detectors / relational / docs / embeddings);
- registry aggregators (queries()/oracles()/_registry/_GATE_PRIORITY)
  land in __init__.py, which imports EVERY name from every module so
  `from pycatcher_ray.queries import X` keeps working for any X;
- modules over the line budget are cut at block boundaries where no
  earlier block references a later name (refs are backward because the
  original order is preserved);
- `from .x import` in moved code is rewritten to `from ..x import`.

Run:  python scripts/split_queries.py [--apply]
Without --apply it writes to /tmp/queries_pkg for inspection.
"""

from __future__ import annotations

import ast
import os
import re
import sys
from collections import defaultdict

SRC = os.path.join(os.path.dirname(__file__), "..", "pycatcher_ray",
                   "queries.py")
MAX_LINES = 3900

REGISTRY_NAMES = {"queries", "oracles", "_registry", "_GATE_PRIORITY"}

FAMILIES = ["tokens", "events", "detectors", "relational", "docs",
            "embeddings"]

TOKENS_MARKERS = ("_tokens_paths", "tokens_input_dir", "_tokens_oracle_cte",
                  "_tokens_rollup", "tokens_rollup_1m", "_TOKENS_HOURLY",
                  "_tokens_flags", "_tokens_gapfill", "tokensynth")
DETECT_MARKERS = ("_flags(", "pack_series", "detect(", "functions.stl",
                  "functions.esd", "functions/stl", "DetectorActor",
                  "from .functions.stl", "from ..functions.stl",
                  "generalized_esd", "seasonal_esd", "shapiro")
RELATIONAL_MARKERS = ("lineitem", "orders.parquet", "customer", "supplier",
                      "part.parquet", "nation", "region", "l_orderkey",
                      "o_orderkey", "partsupp")


def blocks_of(tree, lines):
    segs = []
    prev_end = 0
    for n in tree.body:
        names = []
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef,
                          ast.ClassDef)):
            names = [n.name]
        elif isinstance(n, ast.Assign):
            for t in n.targets:
                for sub in ast.walk(t):
                    if isinstance(sub, ast.Name):
                        names.append(sub.id)
        elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name):
            names = [n.target.id]
        start = min([n.lineno] + [d.lineno for d in
                                  getattr(n, "decorator_list", [])]) - 1
        end = n.end_lineno
        text = "".join(lines[prev_end:end])
        prev_end = end
        segs.append({"names": names, "node": n, "text": text,
                     "start": start, "end": end,
                     "kind": type(n).__name__})
    tail = "".join(lines[prev_end:])
    return segs, tail


def main(apply=False):
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)
    segs, tail = blocks_of(tree, lines)

    defined = {}
    for i, s in enumerate(segs):
        for nm in s["names"]:
            if nm in defined:
                raise SystemExit(f"duplicate top-level name {nm}")
            defined[nm] = i

    # per-segment references to other top-level names
    refs = []
    for s in segs:
        r = set()
        for sub in ast.walk(s["node"]):
            if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                if sub.id in defined and sub.id not in s["names"]:
                    r.add(sub.id)
        refs.append(r)

    # --- initial classification
    def classify(s):
        if set(s["names"]) & REGISTRY_NAMES:
            return "__init__"
        t = s["text"]
        names = s["names"]
        if s["kind"] in ("Import", "ImportFrom"):
            return "_core"
        if any(nm.startswith(("token", "_token", "_TOKEN", "_TOKENS"))
               for nm in names) or any(m in t for m in TOKENS_MARKERS):
            return "tokens"
        if "_documents" in t or "documents.parquet" in t:
            return "docs"
        if "embeddings.parquet" in t or "embedding" in " ".join(names):
            return "embeddings"
        if any(m in t for m in RELATIONAL_MARKERS):
            return "relational"
        if any(m in t for m in DETECT_MARKERS):
            return "detectors"
        return "events"

    fam = [classify(s) for s in segs]

    # header segments (docstring region) -> _core
    # module docstring is not a block; it rides in the first segment's
    # leading text, which classify() may have sent elsewhere — force the
    # first import segment to carry it (it already does via text-gap).

    # --- core promotion: any name referenced from >=2 distinct modules,
    # plus anything a core block references (closure, so _core is
    # self-contained apart from stdlib/engine imports)
    forder = {"_core": 0, "tokens": 1, "events": 2, "detectors": 3,
              "relational": 4, "docs": 5, "embeddings": 6, "__init__": 7}
    changed = True
    while changed:
        changed = False
        used_by = defaultdict(set)
        for i, s in enumerate(segs):
            for r in refs[i]:
                used_by[r].add(fam[i])
        for nm, fams in used_by.items():
            i = defined[nm]
            if fam[i] in ("__init__", "_core"):
                continue
            others = {f for f in fams if f not in ("_core", fam[i])}
            # promote when >=2 other families use it, or when a family
            # EARLIER in import order uses it (forward ref otherwise)
            if len(others - {"__init__"}) >= 2 or any(
                    forder[f] < forder[fam[i]] for f in others
                    if f != "__init__"):
                fam[i] = "_core"
                changed = True
        # closure: core blocks must not reference family blocks
        for i, s in enumerate(segs):
            if fam[i] != "_core":
                continue
            for r in refs[i]:
                j = defined[r]
                if fam[j] not in ("_core", "__init__"):
                    fam[j] = "_core"
                    changed = True

    # --- report sizes
    sizes = defaultdict(int)
    for i, s in enumerate(segs):
        sizes[fam[i]] += s["text"].count("\n")
    print("module line counts:", dict(sizes))

    # --- inter-module reference check (family -> family)
    order = ["_core", "tokens", "events", "detectors", "relational",
             "docs", "embeddings", "__init__"]
    pos = {m: k for k, m in enumerate(order)}
    cross = defaultdict(set)
    for i, s in enumerate(segs):
        for r in refs[i]:
            j = defined[r]
            if fam[j] != fam[i]:
                cross[(fam[i], fam[j])].add(r)
    bad = {k: v for k, v in cross.items()
           if k[1] not in ("_core",) and k[0] != "__init__"}
    if bad:
        print("NON-CORE cross-module refs (resolving by promotion):")
        for (a, b), names in sorted(bad.items()):
            print(f"  {a} -> {b}: {sorted(names)}")
        # promote targets to _core and re-run closure
        for (_a, _b), names in bad.items():
            for nm in names:
                fam[defined[nm]] = "_core"
        # redo closure
        changed = True
        while changed:
            changed = False
            for i, s in enumerate(segs):
                if fam[i] != "_core":
                    continue
                for r in refs[i]:
                    j = defined[r]
                    if fam[j] not in ("_core", "__init__"):
                        fam[j] = "_core"
                        changed = True
        sizes = defaultdict(int)
        for i, s in enumerate(segs):
            sizes[fam[i]] += s["text"].count("\n")
        print("after promotion:", dict(sizes))

    # --- split oversize modules into parts at safe boundaries
    mod_segments = defaultdict(list)   # module -> [seg index]
    for i, s in enumerate(segs):
        mod_segments[fam[i]].append(i)

    out_modules = []   # (filename, [seg idx]) in import order
    for m in order[:-1]:
        idxs = mod_segments.get(m, [])
        if not idxs:
            continue
        total = sum(segs[i]["text"].count("\n") for i in idxs)
        if total <= MAX_LINES:
            out_modules.append((m, idxs))
            continue
        # cut into parts; a cut at position k is safe if no block
        # before the cut references a name defined at/after the cut
        parts = []
        k = 0
        while k < len(idxs):
            cur, cur_lines = [], 0
            while k < len(idxs) and (cur_lines == 0 or
                                     cur_lines + segs[idxs[k]]["text"]
                                     .count("\n") <= MAX_LINES):
                cur.append(idxs[k])
                cur_lines += segs[idxs[k]]["text"].count("\n")
                k += 1

            def unsafe():
                """names defined LATER in this family that a block
                already in `cur` references (would become a forward
                ref across the part boundary)"""
                later = {nm for i2 in idxs[k:] for nm in segs[i2]["names"]}
                hits = set()
                for i2 in cur:
                    hits |= refs[i2] & later
                return hits

            while k < len(idxs) and unsafe():
                cur.append(idxs[k])
                k += 1
            parts.append(cur)
        for pi, p in enumerate(parts):
            nm = m if len(parts) == 1 else f"{m}{'' if pi == 0 else pi + 1}"
            out_modules.append((nm, p))

    # part-2+ modules of a family must import part-1 names: handled by
    # the generic cross-import generation below (treat parts as modules)
    seg_module = {}
    for name, idxs in out_modules:
        for i in idxs:
            seg_module[i] = name
    for i, s in enumerate(segs):
        if fam[i] == "__init__":
            seg_module[i] = "__init__"

    # validate: refs must point to earlier-or-same module in order
    mod_order = [name for name, _ in out_modules] + ["__init__"]
    mpos = {m: k for k, m in enumerate(mod_order)}
    for i, s in enumerate(segs):
        for r in refs[i]:
            j = defined[r]
            if mpos[seg_module[j]] > mpos[seg_module[i]]:
                raise SystemExit(
                    f"forward ref {seg_module[i]}:{s['names']} -> "
                    f"{seg_module[j]}:{r}")

    # --- emit
    outdir = (os.path.join(os.path.dirname(SRC), "queries") if apply
              else "/tmp/queries_pkg")
    os.makedirs(outdir, exist_ok=True)
    relfix = re.compile(r"^(\s*)from \.(\w)", re.M)

    import_header = (
        "from __future__ import annotations\n\n"
        "import math\nimport os\n\n"
        "import numpy as np\nimport pandas as pd\n"
        "import pyarrow as pa\nimport pyarrow.compute as pc\n\n"
        "from ..config import TIERS, EngineConfig\n"
        "from ..stages.detect import detect\n"
        "from ..stages.gapfill import gapfill\n"
        "from ..stages.rollup import cascade, rollup\n")

    future_re = re.compile(r"^from __future__ import.*\n", re.M)

    def fix(text):
        return future_re.sub("", relfix.sub(r"\1from ..\2", text))

    def import_lines(target_module):
        """explicit imports of every earlier module's names used here"""
        need = defaultdict(set)
        for i, s in enumerate(segs):
            if seg_module.get(i) != target_module:
                continue
            for r in refs[i]:
                srcmod = seg_module[defined[r]]
                if srcmod != target_module:
                    need[srcmod].add(r)
        out = []
        for m in mod_order:
            if m in need:
                names = sorted(need[m])
                out.append(f"from .{m} import (\n    " +
                           ",\n    ".join(names) + ",\n)\n")
        return "".join(out)

    dochdr = {"_core": "Shared helpers for the queries package "
                       "(mechanical split of queries.py, r5).",
              "tokens": "Native-tokens-input queries (north-rule core).",
              "events": "Events-table time-series / sketch / sampling "
                        "queries.",
              "detectors": "Detector / decomposition / stationarity "
                           "queries.",
              "relational": "TPC-H-shaped relational queries.",
              "docs": "Documents-corpus (LLM curation) queries.",
              "embeddings": "Embedding-table (ANN / clustering) queries."}

    for name, idxs in out_modules:
        base = dochdr.get(re.sub(r"\d+$", "", name),
                          dochdr.get(name, "queries split module"))
        body = "".join(fix(segs[i]["text"]) for i in idxs)
        # first segment's text may include the original module docstring
        # + import header; strip nothing — duplicate imports are valid.
        hdr = f'"""{base}"""\n\n' + import_header + "\n" + \
            import_lines(name) + "\n"
        with open(os.path.join(outdir, f"{name}.py"), "w") as f:
            f.write(hdr + body)

    # __init__: re-export EVERYTHING, then registry blocks
    init_imports = []
    for name, idxs in out_modules:
        names = sorted({nm for i in idxs for nm in segs[i]["names"]})
        if names:
            init_imports.append(
                f"from .{name} import (\n    " +
                ",\n    ".join(names) + ",\n)\n")
    init_body = "".join(fix(segs[i]["text"]) for i, s in enumerate(segs)
                        if fam[i] == "__init__")
    init_doc = '"""' + src.split('"""')[1] + '"""\n\n'
    with open(os.path.join(outdir, "__init__.py"), "w") as f:
        f.write(init_doc + "".join(init_imports) + "\n" + init_body +
                fix(tail))

    print("wrote", outdir)
    for name, idxs in out_modules:
        nl = sum(segs[i]["text"].count("\n") for i in idxs)
        print(f"  {name}.py: {nl} lines, {len(idxs)} blocks")
    print("  __init__.py:",
          sum(segs[i]['text'].count('\n') for i in range(len(segs))
              if fam[i] == '__init__'), "lines of registry")


if __name__ == "__main__":
    main(apply="--apply" in sys.argv)
