"""Sequence packing — assign documents to fixed-token-budget training
sequences (the GPT-style "concatenate the corpus, cut every B tokens"
shape), as a pure DataFrame composition.

The core primitive is a DISTRIBUTED PREFIX SUM.  The naive formulation —
``sum(tokens) OVER (ORDER BY doc_id)`` — is a global window: Spark must
funnel every row through ONE task to evaluate it, which is the same
scale trap as an unpartitioned ranking window.  Instead:

  1. each row gets a DETERMINISTIC range bucket on ``order_col``
     (sampling._det_range_bucket — broadcast boundary literals from one
     bounded sample pass, pure map-side comparison expression), so rows
     are order-contiguous ACROSS buckets;
  2. per-bucket totals (one tiny aggregate, |buckets| rows) are folded
     into cumulative OFFSETS and broadcast back as a join on bucket
     id — the only driver-size state is one number per bucket;
  3. within-bucket running sum (a window PARTITIONED by bucket id, so
     it parallelizes) + the bucket's offset = the exact global prefix
     sum.

Everything downstream (pack assignment, pack summaries) is plain
arithmetic on the prefix sum, so the whole operator survives a corpus
that does not fit one task — the property the global-window version
lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_prefix_sum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``sum(value) OVER (ORDER BY order_col)`` (inclusive) without
    a single-task global window.  ``order_col`` values must be unique;
    ``value_col`` must be integral (token counts — the per-partition
    totals are carried as bigint)."""
    from .sampling import _det_range_bucket, _pin_branch_input

    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # Deterministic range bucket on the order key (round 14): a pure
    # expression of the row against broadcast boundary literals, so
    # the totals branch and the probe branch agree BY CONSTRUCTION —
    # the round-13 exchange-reuse trap (each rangepartitioning
    # exchange samples boundaries with a per-RDD seed; planner reuse
    # silently breaks when column pruning desynchronizes the subtrees,
    # corrupting the prefix sums nondeterministically) has no root to
    # grow from, and the lazy localCheckpoint that pinned it — whose
    # replication-1, lineage-truncated blocks made any executor loss
    # fatal — is gone.  The input is persisted WITH lineage instead
    # (sampling._pin_branch_input, round 15): the sample, totals, and
    # probe branches read the cache on the healthy path, a lost block
    # recomputes from lineage, and the pure-expression bucket keeps
    # every recomputation agreeing by construction.
    df = _pin_branch_input(df)
    ranged = _det_range_bucket(df, [(order_col, False)], n, out="_pid")
    # one row per bucket; cumulative offset = sum of all PRIOR
    # buckets' totals.  |buckets| rows (hundreds at cluster
    # scale), not the data — the whole point of the two-phase sum is
    # that only this tiny frame is ever globally ordered.  Computed
    # WINDOW-FREE: one collect_list aggregate folds the per-partition
    # totals into a single sorted array row and the exclusive prefix
    # sums are array math (O(P²) on P≈hundreds is trivial), so the
    # WindowExec "No Partition Defined" warning never fires here and
    # stays a real unbounded-window signal in the logs.
    totals = ranged.groupBy("_pid").agg(
        F.sum(value_col).cast("bigint").alias("_ptotal")
    )
    offsets = (
        totals.agg(
            F.array_sort(F.collect_list(F.struct("_pid", "_ptotal"))).alias(
                "_a"
            )
        )
        .select(
            F.posexplode(
                F.expr(
                    "transform(_a, (x, i) -> struct(x._pid AS _pid,"
                    " aggregate(slice(_a, 1, i), CAST(0 AS BIGINT),"
                    " (acc, y) -> acc + y._ptotal) AS _poffset))"
                )
            ).alias("_i", "_s")
        )
        .select("_s._pid", "_s._poffset")
    )
    w_in = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ranged.withColumn("_local", F.sum(value_col).over(w_in))
        .join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_local") + F.col("_poffset"))
        .drop("_pid", "_local", "_poffset")
    )


def assign_packs(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    budget: int = 512,
) -> DataFrame:
    """Concatenate-and-chunk pack assignment: documents are laid out in
    ``order_col`` order and the token stream is cut every ``budget``
    tokens; a document belongs to the pack in which it STARTS
    (``floor(prefix_sum_before / budget)``).  Deterministic, exactly
    reproducible in ANSI SQL (the oracle uses a plain window cumsum),
    and O(n) — no all-to-one shuffle.

    Returns the input columns + ``cum_tokens`` (inclusive prefix sum),
    ``pack_id``, and ``pack_offset`` (where in its pack the document
    starts)."""
    cum = global_prefix_sum(df, tokens_col, order_col, out_col="cum_tokens")
    before = F.col("cum_tokens") - F.col(tokens_col)
    return cum.withColumn(
        "pack_id", F.floor(before / budget).cast("bigint")
    ).withColumn("pack_offset", (before % budget).cast("bigint"))


def emit_packed_chunks(
    packed: DataFrame,
    tokens_col: str = "n_tokens",
    budget: int = 512,
) -> DataFrame:
    """Boundary-splitting chunk emission over :func:`assign_packs`
    output: a document spanning pack boundaries is split into one row
    per pack it touches — the rows a real packer hands the tokenizer,
    where every pack is exactly ``budget`` tokens (except the corpus
    tail) and a document may contribute a prefix to one pack and the
    remainder to the next.

    Pure arithmetic on the existing prefix sum — a document occupying
    global token interval [b, b+n) intersects packs floor(b/B) ..
    floor((b+n-1)/B); ``sequence`` + ``explode`` generate those pack
    ids map-side, so this adds ZERO shuffles beyond the prefix sum's.
    Per row: ``chunk_idx`` (0-based within the document), ``doc_start``
    (token offset inside the document where the chunk begins),
    ``chunk_len``, and ``pack_offset`` (where the chunk starts inside
    its pack).  Zero-token documents emit no chunks.  Invariants:
    sum(chunk_len) per doc == n_tokens; per pack,
    sum(chunk_len) == budget for every non-tail pack."""
    B = F.lit(budget)
    b = F.col("cum_tokens") - F.col(tokens_col)
    end = F.col("cum_tokens")
    pk = F.col("_chunk_pack")
    chunk_start = F.greatest(b, pk * B)  # global token where chunk begins
    chunk_end = F.least(end, (pk + 1) * B)
    return (
        packed.filter(F.col(tokens_col) > 0)
        .withColumn(
            "_chunk_pack",
            F.explode(
                F.sequence(
                    F.floor(b / budget).cast("bigint"),
                    F.floor((end - 1) / budget).cast("bigint"),
                )
            ),
        )
        .withColumn("chunk_idx", (pk - F.floor(b / budget)).cast("int"))
        .withColumn("doc_start", (chunk_start - b).cast("bigint"))
        .withColumn("chunk_len", (chunk_end - chunk_start).cast("bigint"))
        .withColumn("pack_offset", (chunk_start - pk * B).cast("bigint"))
        .drop("pack_id")
        .withColumnRenamed("_chunk_pack", "pack_id")
    )


def pack_summary(packed: DataFrame, tokens_col: str = "n_tokens") -> DataFrame:
    """Per-pack rollup: document count and token count (a document's
    tokens count toward the pack it starts in — chunk-boundary spill is
    the downstream tokenizer's concern, matching the assignment rule)."""
    return packed.groupBy("pack_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(tokens_col).cast("bigint").alias("pack_tokens"),
        F.min("pack_offset").cast("bigint").alias("first_offset"),
    )


def length_bucket_stats(
    df: DataFrame,
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Power-of-two length-bucket accounting — the batch-shaping
    companion to :func:`assign_packs`: a training loader that pads each
    batch to its bucket cap wants to know, per bucket, how many
    documents land there and how much padding the bucket costs
    (``cap − n_tokens`` per doc).  The decision between padding
    (bucketed batching) and packing (concat-and-chunk) is exactly this
    waste number against packing's cross-document attention cost.

    The bucket cap is the smallest power of two >= n_tokens, computed
    with INTEGER bit math (``1 << len(bin(n−1))``) rather than
    ``2^ceil(log2 n)`` — libm's log2 is not guaranteed correctly
    rounded at exact powers of two, and a one-ulp undershoot would
    silently halve a bucket on one engine but not the other.  One
    partial-aggregated groupBy; empty docs land in the cap-1 bucket.

    Returns (bucket_cap, n_docs, sum_tokens, padding, waste_frac)."""
    n = F.col(tokens_col).cast("bigint")
    # SQL form because the Python shiftleft() helper takes a literal
    # bit count; the SQL function accepts a column
    cap = F.expr(
        "CASE WHEN _n <= 1 THEN CAST(1 AS BIGINT)"
        " ELSE CAST(shiftleft(CAST(1 AS BIGINT), length(bin(_n - 1)))"
        " AS BIGINT) END"
    )
    per = df.select(F.col(id_col), n.alias("_n")).withColumn(
        "bucket_cap", cap
    )
    return (
        per.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("_n").cast("bigint").alias("sum_tokens"),
            F.sum(F.col("bucket_cap") - F.col("_n"))
            .cast("bigint")
            .alias("padding"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            "padding",
            F.round(
                F.col("padding").cast("double")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double"),
                6,
            ).alias("waste_frac"),
        )
    )
