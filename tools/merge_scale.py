"""merge_cells growth curve: rewrite cost must track the TOUCHED
partitions, not the store.

Builds one cell store from sf0.1 lineitem (24 salt partitions, ~600k
cells), then merges three same-sized update batches whose keys are
confined to 2, 8, and all 24 salt partitions (plus a full compaction
rewrite as the ceiling).  The claim under measurement: wall time and
bytes rewritten grow with the touched-partition count while the batch
size stays constant — the difference between "backfill touches 2
regions" and "backfill rewrites the table" at 100 TB.

Usage: python tools/merge_scale.py [replication]   (default 1: ~600k
cells; 8 gives a ~4.8M-cell store where wall time, not just bytes,
separates the touched-partition bound from the full rewrite)
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
BATCH = 2_000  # change rows per merge, constant across runs
REP = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def _store_bytes(path: str, salts: set[int] | None = None) -> int:
    total = 0
    for f in glob.glob(f"{path}/salt=*/*.parquet"):
        s = int(f.split("salt=")[1].split("/")[0])
        if salts is None or s in salts:
            total += os.path.getsize(f)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        cellstore as CS,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="merge-scale", cpus=32)
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    if REP > 1:
        # offset the order-key space per replica (distinct row keys,
        # same per-cell value counts) — the tpch_scale.py recipe
        li = li.crossJoin(
            spark.range(REP).select(F.col("id").alias("_r"))
        ).withColumn(
            "l_orderkey", F.col("l_orderkey") * REP + F.col("_r")
        )
    cells = CS.to_cells(
        li,
        ["l_returnflag", "l_linestatus", "l_orderkey"],
        F.col("l_partkey"),
        ["l_linenumber", "l_suppkey"],
    ).localCheckpoint(eager=True)
    root = tempfile.mkdtemp(prefix="merge_scale_")
    n_cells = cells.count()

    for n_salts in (2, 8, 24):
        path = os.path.join(root, f"store_{n_salts}")
        CS.write_cells(cells, path, mode="overwrite")
        target = list(range(n_salts))
        batch = (
            cells.filter(F.col("salt").isin(target))
            .limit(BATCH)
            .select(
                "row_key",
                "col_name",
                F.array(F.lit("updated")).alias("values"),
            )
        ).localCheckpoint(eager=True)
        t0 = time.time()
        stats = CS.merge_cells(spark, path, batch)
        wall = time.time() - t0
        touched = set(stats["touched_salts"])
        rewritten = _store_bytes(path, touched)
        print(
            f"salts={len(touched):2d}/24  wall={wall:6.2f}s  "
            f"rows_rewritten={stats['rows_written']:9,d}  "
            f"bytes_rewritten={rewritten/1e6:7.1f} MB  "
            f"(batch={BATCH:,}, store={n_cells:,} cells)"
        )

    # ceiling: the full-store rewrite a formatless engine would pay
    path = os.path.join(root, "store_full")
    CS.write_cells(cells, path, mode="overwrite")
    t0 = time.time()
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        versions as VER,
    )

    VER.compact_cells(spark, path, path + ".out")
    wall = time.time() - t0
    print(
        f"FULL rewrite (compact_cells ceiling): wall={wall:6.2f}s  "
        f"bytes={_store_bytes(path + '.out')/1e6:7.1f} MB"
    )
    shutil.rmtree(root)


if __name__ == "__main__":
    main()
