#!/usr/bin/env python
"""Dump .explain("formatted") for catalog queries to plans/<dir>/.

Usage: python tools/dump_plan.py <out_dir> <suffix> <query> [query...]

Writes <out_dir>/<query>_<suffix>.txt for each query. Run from the tree
whose plan you want (HEAD for _after, an .ab_worktrees checkout for
_before); out_dir may be an absolute path into the main repo.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecommerce_full_etl_process_spark.plans import catalog  # noqa: E402
from ecommerce_full_etl_process_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    queries = catalog.spark_queries()
    for name in names:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
