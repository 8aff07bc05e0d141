"""Deterministic corpus sampling — training-data curation operators
beyond the reference surface (task brief: large-scale pipeline ops).

``top_k_per_group`` solves "keep N documents per domain/source/language"
— the few-groups × huge-rows shape where a naive ranking window is a
scale trap: ``Window.partitionBy(source)`` funnels each group's ENTIRE
row set through one task.  Instead the top-K is computed in two phases,
like ``TakeOrderedAndProject`` generalized per group:

  1. per-input-partition local top-K (a row_number window keyed on
     (group, partition_id) — fully parallel, shuffles only the
     (group, order) projection, never the payload).  Sort-based, so
     per-task state is the external sort's spillable buffer — an
     earlier collect_list formulation instead pinned every (group,
     task) value in the aggregation hash map, bounded by partition
     size rather than by K and unable to spill;
  2. global top-K over the reduced candidate set (≤ K × n_partitions
     rows per group — the ranking window now runs on a tiny frame);
  3. semi-join the winners back to the full rows (broadcast-sized:
     K × n_groups keys).

Deterministic by construction (ordering on a unique key), so the result
is reproducible and oracle-comparable — the property a training corpus
snapshot needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
) -> DataFrame:
    """The ``k`` rows with the smallest ``order_col`` per ``group_col``
    (``order_col`` values must be unique, e.g. a document id)."""
    wl = Window.partitionBy(group_col, "_p").orderBy(order_col)
    local = (
        df.select(group_col, order_col)
        .withColumn("_p", F.spark_partition_id())
        # partition-local candidates: at most k survive per (group, task)
        .withColumn("_rk", F.row_number().over(wl))
        .filter(F.col("_rk") <= k)
        .select(group_col, order_col)
    )
    w = Window.partitionBy(group_col).orderBy(order_col)
    winners = (
        local.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
    # winners is K × n_groups rows — broadcast it so the corpus-side scan
    # never shuffles
    return df.join(F.broadcast(winners), on=[group_col, order_col], how="left_semi")
