"""Multi-executor soak for the multitable SRP-LSH dedup (VERDICT r8
brief #3): the r8 single-box analysis attributed ~0.18 of the query's
~1.27 sf10→sf100 wall exponent to a shuffle-regime transition that
``local[32]``'s single in-process shuffle cannot distinguish from a
real defect — one JVM's shuffle spills to one disk queue as soon as
the probe-side bytes (~12 GB at sf100) outgrow memory, whereas a real
cluster shards that per executor.

This tool runs the query on ``local-cluster[E,C,memMB]`` — separate
executor JVMs with their OWN shuffle trees and block managers, the
closest a single box gets to cluster shuffle — at the sf10 and sf100
soak corpora, and records wall times, the decade exponent, and the
executors' aggregate shuffle/spill metrics (via the status REST API)
so the regime claim is demonstrated with data, not prose.

Usage:  python tools/multitable_cluster_soak.py
Env:    MT_SOAK_EXECUTORS (4) / MT_SOAK_CORES (8) / MT_SOAK_MEM_MB
        (20480), SOAK_IDLE_LOAD / SOAK_IDLE_WAIT as in the other soaks.
Output: MULTITABLE_CLUSTER_SOAK.json + one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_EXEC = int(os.environ.get("MT_SOAK_EXECUTORS", "4"))
N_CORES = int(os.environ.get("MT_SOAK_CORES", "8"))
MEM_MB = int(os.environ.get("MT_SOAK_MEM_MB", "20480"))
QUERY = "dedup_embedding_cosine_lsh_multitable"
SF10 = os.environ.get("MT_SOAK_SRC", os.path.join(ROOT, ".scale", "sf10"))
SF100 = os.environ.get("MT_SOAK_DST", os.path.join(ROOT, ".scale", "sf100"))


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read().decode())


def _stage_totals(base: str, app_id: str) -> dict:
    """Aggregate shuffle/spill metrics for THIS application's stages.

    ADVICE r9: the app is addressed by the caller's sc.applicationId
    (never applications[0], which could be a stale history entry), and
    failed stages are counted too — their shuffle bytes are real work,
    and a nonzero ``failed_stages`` in the artifact flags that the
    deltas include partial attempts."""
    tot = {"shuffle_write_bytes": 0, "shuffle_read_bytes": 0,
           "memory_spilled_bytes": 0, "disk_spilled_bytes": 0,
           "failed_stages": 0}
    for status in ("complete", "failed"):
        stages = _rest(
            base, f"/api/v1/applications/{app_id}/stages?status={status}")
        for st in stages:
            tot["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
            tot["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
            tot["memory_spilled_bytes"] += st.get("memoryBytesSpilled", 0)
            tot["disk_spilled_bytes"] += st.get("diskBytesSpilled", 0)
            if status == "failed":
                tot["failed_stages"] += 1
    return tot


def main() -> None:
    sys.path.insert(0, ROOT)
    from pyspark.sql import SparkSession

    from mediawiki_to_notion_spark.operators import QUERIES, load_all

    idle_gate_load = float(os.environ.get("SOAK_IDLE_LOAD", "1.0"))
    idle_budget_s = float(os.environ.get("SOAK_IDLE_WAIT", "1800"))
    waited_s = 0.0
    last_load = os.getloadavg()[0]
    while last_load >= idle_gate_load and waited_s < idle_budget_s:
        time.sleep(15.0)
        waited_s += 15.0
        last_load = os.getloadavg()[0]
    idle_gate_timed_out = (waited_s >= idle_budget_s
                           and last_load >= idle_gate_load)
    loadavg = list(os.getloadavg())

    # mirror get_spark()'s confs (session.py) on a local-cluster master;
    # the UI is ON here (only here) so the status REST API can report
    # executor-sharded shuffle/spill totals
    spark = (
        SparkSession.builder
        .master(f"local-cluster[{N_EXEC},{N_CORES},{MEM_MB}]")
        .appName("multitable_cluster_soak")
        .config("spark.executor.memory", f"{MEM_MB - 2048}m")
        # local[!] mode ships no code: executor python workers need the
        # repo importable (the Arrow kernels close over repo modules)
        .config("spark.executorEnv.PYTHONPATH", ROOT)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                "256")
        .config("spark.sql.autoBroadcastJoinThreshold",
                str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.files.maxPartitionBytes",
                str(128 * 1024 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    load_all()
    ui_base = f"http://127.0.0.1:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" \
        if spark.sparkContext.uiWebUrl else None
    app_id = spark.sparkContext.applicationId

    fn = QUERIES[QUERY]
    # warmup (codegen + Arrow workers on every executor)
    fn(spark, "/root/testdata/sf0.01").write.mode("overwrite") \
        .format("noop").save()
    spark.catalog.clearCache()

    rows = {}
    prev_tot = _stage_totals(ui_base, app_id) if ui_base else {}
    for label, sf_dir in (("sf10", SF10), ("sf100", SF100)):
        la = round(os.getloadavg()[0], 2)
        t0 = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        spark.catalog.clearCache()
        tot = _stage_totals(ui_base, app_id) if ui_base else {}
        delta = {k: tot[k] - prev_tot.get(k, 0) for k in tot}
        prev_tot = tot
        rows[label] = {"wall_s": round(wall, 3),
                       "loadavg_1m_at_start": la,
                       "shuffle_spill": delta}
        print(f"{label}: {wall:.1f}s {json.dumps(delta)}",
              file=sys.stderr, flush=True)

    out = {
        "metric": "multitable_lsh_local_cluster_soak",
        "query": QUERY,
        "master": f"local-cluster[{N_EXEC},{N_CORES},{MEM_MB}]",
        "loadavg_start": [round(x, 2) for x in loadavg],
        "idle_gate_waited_s": waited_s,
        "idle_gate_timed_out": idle_gate_timed_out,
        "rows": rows,
        "exponent_sf10_sf100": round(
            math.log(rows["sf100"]["wall_s"] / rows["sf10"]["wall_s"])
            / math.log(10.0), 3),
    }
    with open(os.path.join(ROOT, "MULTITABLE_CLUSTER_SOAK.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
