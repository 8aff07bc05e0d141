"""Classic analytic queries (TPC-H Q1/Q3 shapes) + cell versioning +
chunk dedup — oracle-checked."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import versions as VER
from .queries import register, register_extra, t
from .queries_ext import _DUP_DOCS_SQL, _dup_docs


@register_extra(
    # retired to the pytest tier: every op here (filter/agg/sort/decimal
    # money math) is gated by cell_build/meta_enrich/rollup_revenue
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2)))
                    * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / count(*), 6) AS avg_qty,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY 1, 2
    """,
)
def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
            .cast("double")
            .alias("sum_charge"),
            F.round(
                F.sum(qty).cast("double") / F.count("*"), 6
            ).alias("avg_qty"),
            F.count("*").cast("bigint").alias("count_order"),
        )
    )


@register_extra(
    # retired to the pytest tier: the join+agg+TOP-n shape is gated by
    # meta_enrich + topk_orders
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY 1, 3, 4
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "cell_versions",
    oracle="""
    WITH vcells AS (
        SELECT CAST(o_custkey AS VARCHAR) AS row_key,
               o_orderstatus AS col_name,
               o_orderdate AS version_ts,
               CAST(o_orderkey AS VARCHAR) AS value
        FROM orders
    )
    SELECT row_key, col_name, version_ts, value FROM vcells
    QUALIFY row_number() OVER (PARTITION BY row_key, col_name
                               ORDER BY version_ts DESC, value DESC) <= 2
    """,
)
def q_cell_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBase VERSIONS=2 read: latest two timestamped versions per cell."""
    orders = t(spark, sf_dir, "orders")
    vcells = orders.select(
        F.col("o_custkey").cast("string").alias("row_key"),
        F.col("o_orderstatus").alias("col_name"),
        F.col("o_orderdate").alias("version_ts"),
        F.col("o_orderkey").cast("string").alias("value"),
    )
    return VER.latest_versions(vcells, k=2)


@register(
    "chunk_dedup",
    oracle=f"""
    WITH corpus AS ({_DUP_DOCS_SQL}),
    chunks AS (
        SELECT doc_id AS id,
               unnest(list_transform(
                   range(0, CAST(ceil(len(tks) / 20.0) AS INT)),
                   i -> array_to_string(tks[i*20+1:i*20+20], ' '))) AS chunk
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '\\s+'),
                                 tk -> tk != '') AS tks
              FROM corpus)
    )
    SELECT id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN owner = id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM (SELECT id, chunk, min(id) OVER (PARTITION BY chunk) AS owner
          FROM chunks)
    GROUP BY id
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style chunk dedup over the duplicated corpus: copies keep 0
    chunks, originals keep all of theirs."""
    corpus = _dup_docs(spark, sf_dir)
    return VER.dedupe_chunks(corpus, chunk_tokens=20)
