"""One-off discovery scan: which registered queries contain (a) a global
window over a non-constant-bounded input, (b) CartesianProduct, (c) Python
eval nodes.  Used to seed the allowlists in tests/test_plan_quality.py."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hyrise_spark.registry import all_queries
from hyrise_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

BOUNDED = {"GlobalLimit", "LocalRelation", "OneRowRelation", "Range"}


def subtree_bounded(node) -> bool:
    name = node.getClass().getSimpleName()
    if name in BOUNDED:
        return True
    kids = node.children()
    n = kids.size()
    if n == 0:
        return False
    return all(subtree_bounded(kids.apply(i)) for i in range(n))


def unbounded_global_windows(df) -> list[str]:
    out = []

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "Window" and node.partitionSpec().isEmpty():
            if not subtree_bounded(node):
                out.append(node.simpleStringWithNodeId())
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def main():
    spark = get_spark()
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, qd in sorted(all_queries().items()):
        try:
            df = qd.builder(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
            flags = []
            gw = unbounded_global_windows(df)
            if gw:
                flags.append(f"GLOBAL_WINDOW x{len(gw)}")
            if "CartesianProduct" in plan:
                flags.append("CARTESIAN")
            if "BroadcastNestedLoopJoin" in plan:
                flags.append("BNLJ")
            for bad in ("BatchEvalPython", "ArrowEvalPython"):
                if bad in plan:
                    flags.append(bad)
            if flags:
                print(f"{name}: {', '.join(flags)}")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print("scan done")


if __name__ == "__main__":
    main()
