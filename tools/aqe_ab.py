"""A/B harness for the wide-AQE initialPartitionNum conf (VERDICT r7
brief #1): times a query list under the current session config — the
conf side is selected by SPARK_GRAFT_AQE_INITIAL in the environment, so
each arm runs in its OWN process (session confs are per-JVM).

Usage:
    SPARK_GRAFT_AQE_INITIAL=unset python tools/aqe_ab.py q1 q2 ... > a.json
    SPARK_GRAFT_AQE_INITIAL=256   python tools/aqe_ab.py q1 q2 ... > b.json

Prints one JSON line: {"conf": ..., "queries": {name: {"median": s,
"min": s, "runs": [...]}}, "loadavg_start": [...]}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mediawiki_to_notion_spark.operators import QUERIES, load_all  # noqa: E402
from mediawiki_to_notion_spark.session import get_spark  # noqa: E402

RUNS = int(os.environ.get("AQE_AB_RUNS", "5"))


def main() -> None:
    load_all()
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    loadavg = list(os.getloadavg())
    spark = get_spark("aqe_ab")
    try:
        conf = spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
    except Exception:
        conf = "unset"
    # warmup (JIT/first-job overhead — verify-skill gotcha)
    QUERIES[names[0]](spark, sf_dir).write.format("noop") \
        .mode("overwrite").save()
    out = {}
    for name in names:
        runs = []
        for _ in range(RUNS):
            spark.catalog.clearCache()
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = {"median": round(statistics.median(runs), 3),
                     "min": min(runs), "runs": runs}
    print(json.dumps({"conf": conf, "sf_dir": sf_dir,
                      "loadavg_start": [round(x, 2) for x in loadavg],
                      "queries": out}))


if __name__ == "__main__":
    main()
