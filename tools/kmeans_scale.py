"""kmeans_fixed (operators/clustering.py) scaling check: fixed k and
iteration count over a replicated embedding corpus — per-iteration cost
must be linear in corpus size (each round is one broadcast cross +
fold + struct-min aggregate and one (cid, dim)-keyed mean; nothing
quadratic, nothing driver-side).

Usage: python tools/kmeans_scale.py [replications_csv]  (default 4,16,64)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"
REPS = (
    [int(x) for x in sys.argv[1].split(",")]
    if len(sys.argv) > 1
    else [4, 16, 64]
)
K = 64
ITERS = 3


def main() -> None:
    from pyspark.sql import functions as F

    from applications_analytics_midas_hbase_metrics_spark.operators import (
        clustering as CLU,
    )
    from applications_analytics_midas_hbase_metrics_spark.operators import (
        similarity as S,
    )
    from applications_analytics_midas_hbase_metrics_spark.session import get_spark

    spark = get_spark(app_name="kmeans-scale", cpus=32)
    base = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )

    for rep in REPS:
        corpus = S.replicate_embeddings(
            base.withColumnRenamed("e", "embedding"), rep
        ).withColumnRenamed("embedding", "e").localCheckpoint(eager=True)
        n = corpus.count()
        t0 = time.time()
        out = CLU.kmeans_fixed(corpus, k=K, iters=ITERS)
        n_assigned = out.count()
        dt = time.time() - t0
        assert n_assigned == n
        n_clusters = out.select("cluster").distinct().count()
        print(
            f"{rep:>3}x: {n} vectors, k={K}, {ITERS} iters: {dt:.1f}s"
            f"  ({dt / ITERS:.1f}s/iter, {n_clusters} live clusters)"
        )


if __name__ == "__main__":
    main()
