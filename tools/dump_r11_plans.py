"""Dump `.explain("formatted")` for the round-11 optimization targets.

Usage:  python tools/dump_r11_plans.py <suffix> <query> [<query> ...]
        python tools/dump_r11_plans.py before dedup_substring_cut ...

Writes plans/r11/<query>_<suffix>.txt for each query (the judge checks
optimization claims — Exchange counts, join strategies, pushed filters —
against these files).  SF dir via SPARK_GRAFT_SF_DIR, default the bench
scale /root/testdata/sf0.1 so plan literals (AQE initial partitions,
derived plane counts) match what the bench runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mediawiki_to_notion_spark.operators import QUERIES, load_all  # noqa: E402
from mediawiki_to_notion_spark.session import get_spark  # noqa: E402


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    suffix, names = sys.argv[1], sys.argv[2:]
    load_all()
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    spark = get_spark("plans-r11")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — {suffix} (sf dir: {sf_dir})\n\n")
            f.write(plan.rstrip("\n") + "\n")
        print(f"wrote {os.path.relpath(path, root)}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
