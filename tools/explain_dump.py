"""Dump .explain("formatted") for catalog queries to plans/<tag>/.

Usage: python tools/explain_dump.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
default "before").  With no query list, dumps every bench query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r14"
    names = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    from opentsdb_aura_spark import get_spark
    from opentsdb_aura_spark.catalog import SPARK_QUERIES

    if not names:
        import bench

        names = bench.BENCH_QUERIES

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_dump")
    for name in names:
        try:
            df = SPARK_QUERIES[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 - record the failure in place
            plan = f"EXPLAIN FAILED: {ex}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")


if __name__ == "__main__":
    main()
