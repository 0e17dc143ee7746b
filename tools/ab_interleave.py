"""Interleaved A/B timing of registered queries: HEAD code vs working tree.

The box's ambient drift (BASELINE.md) makes back-to-back *process* pairs
useless — the second invocation routinely reads 2-4x the first with
byte-identical code. This harness removes the window entirely: ONE Spark
session, the old (HEAD) and new (working-tree) builders loaded side by
side, runs alternated old,new,old,new,... so both variants sample the
same ambient conditions. Reported figure: per-variant MEDIAN.

Usage:
    python tools/ab_interleave.py --module hyrise_spark/pipeline/graph.py \
        --runs 5 name1 name2 ...

Names must be registered queries whose builders live in --module.

For a change in a SHARED module (e.g. engine.py) whose effect shows through
builders defined elsewhere, use --head-swap instead of --module: the HEAD
version of that module is imported once and temporarily installed into
sys.modules under its canonical name while the "old" variant runs, so
builders that import it lazily (inside the function body) pick it up.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_head_module(repo_rel_path: str, rev: str = "HEAD"):
    """Import the `rev` version of a repo module under a scratch name,
    swallowing its @register calls into a throwaway registry."""
    import hyrise_spark.registry as reg

    src = subprocess.run(
        ["git", "show", f"{rev}:{repo_rel_path}"],
        capture_output=True, text=True, check=True,
        cwd=Path(__file__).resolve().parent.parent,
    ).stdout
    scratch = Path("/tmp/_ab_head_mod")
    scratch.mkdir(exist_ok=True)
    mod_path = scratch / (Path(repo_rel_path).stem + "_head.py")
    mod_path.write_text(src)

    saved = reg._REGISTRY
    reg._REGISTRY = {}
    try:
        spec = importlib.util.spec_from_file_location("_ab_head", mod_path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        head_queries = reg._REGISTRY
    finally:
        reg._REGISTRY = saved
    return mod, head_queries


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--module",
                    help="repo-relative path, e.g. hyrise_spark/pipeline/graph.py")
    ap.add_argument("--head-swap",
                    help="repo-relative path of a shared module; its HEAD "
                         "version is installed in sys.modules while the old "
                         "variant runs (builders = current registry for both)")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--rev", default="HEAD",
                    help="git rev for the 'old' variant (default HEAD) — "
                         "use it to A/B an already-committed change")
    ap.add_argument("--gc", action="store_true",
                    help="force Python+JVM GC after every run: builders "
                         "that localCheckpoint per invocation otherwise "
                         "accumulate pinned RDDs across the A/B session, "
                         "inflating later runs for both variants")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from hyrise_spark.session import get_spark
    from hyrise_spark.registry import all_queries

    new_qs = all_queries()
    swap_name = swap_head = swap_cur = None
    if args.head_swap:
        swap_name = args.head_swap.replace("/", ".").removesuffix(".py")
        swap_cur = importlib.import_module(swap_name)
        swap_head, _ = load_head_module(args.head_swap, args.rev)
        head_qs = new_qs
    else:
        _, head_qs = load_head_module(args.module, args.rev)

    spark = get_spark("hyrise_spark_ab")
    spark.sparkContext.setLogLevel("ERROR")

    def timed(builder, label, variant="new"):
        if swap_name and variant == "old":
            sys.modules[swap_name] = swap_head
        try:
            spark.sparkContext.setJobDescription(label)
            t0 = time.perf_counter()
            df = builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
        finally:
            if swap_name:
                sys.modules[swap_name] = swap_cur
        if args.gc:
            import gc

            gc.collect()
            spark._jvm.System.gc()
        return dt

    out = {}
    for name in args.names:
        old_b = head_qs[name].builder
        new_b = new_qs[name].builder
        # warm both once (JVM/codegen first-touch)
        timed(old_b, f"warm-old:{name}", "old")
        timed(new_b, f"warm-new:{name}")
        olds, news = [], []
        for i in range(args.runs):
            olds.append(timed(old_b, f"old:{name}:{i}", "old"))
            news.append(timed(new_b, f"new:{name}:{i}"))
        o, n = statistics.median(olds), statistics.median(news)
        out[name] = {"old": round(o, 3), "new": round(n, 3),
                     "ratio": round(n / o, 3),
                     "old_runs": [round(x, 3) for x in olds],
                     "new_runs": [round(x, 3) for x in news]}
        print(f"{name:40s} old {o:7.3f}  new {n:7.3f}  ({n / o:.2f}x)",
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
