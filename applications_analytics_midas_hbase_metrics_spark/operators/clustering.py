"""Fixed-iteration Lloyd's k-means over embedding columns (extension
tier).  build_ivf_centroids (operators/similarity.py) is the PRODUCTION
k-means — hash-spread seeding, tuned for the IVF/PQ index builds; this
module is the DIFFERENTIALLY VERIFIABLE form: deterministic lowest-id
seeding and per-iteration centroid quantization, so every assignment
and every centroid of every round replays exactly in an unrolled SQL
oracle (the same fixed-iteration pattern as graph.pagerank).

Cross-engine determinism is engineered, not hoped for:

- centroids are rounded to ``round_decimals`` BEFORE every distance
  evaluation — embedding values are exact (float->double widening),
  so both engines feed bit-identical operands into the distance;
- the squared-distance is a strict LEFT FOLD in array order
  (``F.aggregate`` here, ``list_reduce`` in the oracle) — the same
  additions in the same order give bit-identical sums, so the argmin
  needs no tolerance;
- argmin ties break on centroid id (min over (dist, cid));
- per-dimension means are averaged distributed-side then rounded —
  the one place summation order differs, absorbed by the quantization.

Scale shape per iteration: one broadcast of the k×d centroid table
into a map-side cross + fold + struct-min aggregate (shuffles only
(id, cid, dist)), one posexplode + (cid, dim)-keyed mean (shuffles
(cid, pos, val) — bounded by n·d, with map-side partial aggregation).
Nothing is driver-side; k and d ride broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fixed(
    vecs: DataFrame,
    *,
    k: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_decimals: int = 6,
) -> DataFrame:
    """Run exactly ``iters`` assignment rounds (with a centroid update
    between consecutive rounds) from lowest-``id_col`` seeds; returns
    the final assignment (id, ``cluster``, ``dist`` — the fold-exact
    squared distance, rounded for output)."""
    r = int(round_decimals)
    # Seed numbering is WINDOW-FREE: the k lowest-id rows (k rows, never
    # the corpus) fold into ONE sorted array row and posexplode hands
    # each seed its rank — same single-partition data movement as a
    # global row_number window, but the WindowExec "No Partition
    # Defined" warning never fires, so that warning stays a real
    # unbounded-window signal in the logs.
    cents = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            F.struct(
                F.col(id_col).alias("_sid"),
                F.transform(F.col(vec_col), lambda x: F.round(x, r)).alias(
                    "_c"
                ),
            ).alias("_s")
        )
        .agg(F.array_sort(F.collect_list("_s")).alias("_a"))
        .select(F.posexplode("_a").alias("cid", "_s"))
        .select("cid", F.col("_s._c").alias("c"))
    )

    assign = None
    for i in range(iters):
        d = vecs.crossJoin(F.broadcast(cents))
        dist = F.aggregate(
            F.zip_with(
                F.col(vec_col), F.col("c"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        assign = (
            d.select(
                id_col,
                F.struct(dist.alias("dist"), F.col("cid").alias("cid")).alias(
                    "_m"
                ),
            )
            .groupBy(id_col)
            .agg(F.min("_m").alias("_m"))
            .select(
                id_col,
                F.col("_m.cid").alias("cluster"),
                F.col("_m.dist").alias("dist"),
            )
        )
        if i < iters - 1:
            ex = assign.join(vecs, id_col).select(
                "cluster", F.posexplode(vec_col).alias("pos", "val")
            )
            cents = (
                ex.groupBy("cluster", "pos")
                .agg(F.round(F.avg("val"), r).alias("m"))
                .groupBy("cluster")
                .agg(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "m"))
                    ).alias("_cm")
                )
                .select(
                    F.col("cluster").alias("cid"),
                    F.transform(F.col("_cm"), lambda s: s["m"]).alias("c"),
                )
            )
    return assign.select(
        id_col, "cluster", F.round("dist", r).alias("dist")
    )


def pca_power_top(
    vecs: DataFrame,
    *,
    iters: int = 3,
    d: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_decimals: int = 6,
) -> DataFrame:
    """Leading singular direction of the raw embedding matrix by
    ``iters`` rounds of power iteration on X'X — the whitening /
    dominant-direction primitive an embedding pipeline runs before
    ABTT-style postprocessing ("All-but-the-Top": dominant directions
    carry corpus-wide bias and are removed before similarity search).

    Uncentered by design (the top direction of X itself, not the
    covariance): embedding corpora are what this runs on, and keeping
    the recurrence one matvec makes every round exactly replayable in
    an unrolled SQL oracle — the same differential-determinism recipe
    as :func:`kmeans_fixed`:

    - the iterate v is ROUNDED to ``round_decimals`` after every
      normalization, so both engines feed bit-identical operands into
      the next round's dot products;
    - each row's score s = x·v is a strict LEFT FOLD in array order
      (F.aggregate / list_reduce) — bit-identical across engines;
    - the per-dimension sum w_i = Σ_rows x_i·s is the one place
      summation order differs (distributed vs sequential), absorbed by
      the quantization exactly as kmeans' centroid means are.

    Scale shape per round: v (d doubles) rides a broadcast cross join;
    the matvec is ONE pass — per-row fold, posexplode, (pos)-keyed sum
    with map-side combine — so the shuffle is O(d × partitions) rows,
    never O(n); the d-row normalization reduce is a single-row
    aggregate.  The driver never sees data; iteration count is a small
    constant like pagerank's.

    Returns (pos, loading) — d rows, the unit top direction rounded."""
    import math

    if iters < 1:
        raise ValueError("iters must be >= 1")
    r = int(round_decimals)
    spark = vecs.sparkSession
    v0 = round(1.0 / math.sqrt(d), r)
    vdf = spark.range(1).select(
        F.array(*[F.lit(v0).cast("double") for _ in range(d)]).alias("v")
    )
    x = vecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("x"))
    for _ in range(iters):
        s = x.crossJoin(F.broadcast(vdf)).select(
            "x",
            F.aggregate(
                F.zip_with("x", "v", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, y: acc + y,
            ).alias("s"),
        )
        w = (
            s.select("s", F.posexplode("x").alias("pos", "xi"))
            .groupBy("pos")
            .agg(F.sum(F.col("xi") * F.col("s")).alias("w"))
        )
        vdf = w.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "w"))),
                lambda st: st["w"],
            ).alias("wl")
        ).select(
            F.transform(
                "wl",
                lambda wi: F.round(
                    wi
                    / F.sqrt(
                        F.aggregate(
                            "wl", F.lit(0.0), lambda acc, y: acc + y * y
                        )
                    ),
                    r,
                ),
            ).alias("v")
        )
    return vdf.select(F.posexplode("v").alias("pos", "loading")).select(
        F.col("pos").cast("bigint").alias("pos"), "loading"
    )


def abtt_remove_top(
    vecs: DataFrame,
    loading: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_decimals: int = 6,
) -> DataFrame:
    """All-but-the-Top embedding correction (Mu & Viswanath, ICLR'18):
    subtract each vector's projection onto the dominant direction —
    ``x' = x - (x·v) v`` — the postprocessing step that measurably
    improves similarity search on anisotropic embedding corpora.
    ``loading`` is :func:`pca_power_top`'s (pos, loading) output.

    Map-side only: the direction rides one broadcast (d doubles), the
    projection is a strict left-fold dot plus one zip_with per row —
    no shuffle at any corpus size.  Both the scalar component and the
    corrected coordinates quantize at ``round_decimals``, and x and v
    are exact on both engines, so the whole correction replays in the
    differential oracle bit-for-bit.

    Returns (id, component, corrected)."""
    r = int(round_decimals)
    vdf = loading.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "loading"))),
            lambda st: st["loading"],
        ).alias("v")
    )
    s = F.aggregate(
        F.zip_with(vec_col, "v", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )
    return (
        vecs.crossJoin(F.broadcast(vdf))
        .withColumn("_s", s)
        .select(
            F.col(id_col).alias("id"),
            F.round("_s", r).alias("component"),
            F.zip_with(
                vec_col, "v", lambda a, b: F.round(a - F.col("_s") * b, r)
            ).alias("corrected"),
        )
    )
