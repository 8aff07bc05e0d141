"""Cell-store round-trip tests (SURVEY.md §5: file→cells→read-back→decode
must round-trip; the reference's file-vs-table diff as exceptAll == empty).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.operators import cellstore as CS

KEY_COLS = ["l_returnflag", "l_linestatus", "l_orderkey"]
VAL_COLS = ["l_linenumber", "l_quantity", "l_extendedprice"]


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def cells(lineitem):
    return CS.to_cells(lineitem, KEY_COLS, F.col("l_partkey"), VAL_COLS)


def test_to_cells_shape(cells, lineitem):
    assert set(cells.columns) == {"row_key", "col_name", "values", "salt"}
    # group count == distinct (key, qualifier) pairs
    expected = lineitem.select(
        *(F.col(c).cast("string") for c in KEY_COLS), "l_partkey"
    ).distinct().count()
    assert cells.count() == expected


@pytest.mark.parametrize("chunks", [1, 3])
def test_write_aligned_build_matches_to_cells(cells, lineitem, chunks):
    """The single-exchange write-aligned build must produce the exact
    cell set of the canonical two-exchange form (same rows, same sorted
    values, same salt), for both the plain and the chunked layout; and
    its physical plan must contain exactly ONE exchange."""
    aligned = CS.to_cells_write_aligned(
        lineitem, KEY_COLS, F.col("l_partkey"), VAL_COLS, chunks_per_salt=chunks
    )
    assert aligned.columns == ["row_key", "col_name", "values", "salt"]
    assert aligned.exceptAll(cells).count() == 0
    assert cells.exceptAll(aligned).count() == 0
    plan = aligned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_cell_values_sorted_and_complete(cells, lineitem):
    total = cells.select(F.sum(F.size("values")).alias("n")).first().n
    assert total == lineitem.count()
    bad = cells.filter(
        F.expr("values != array_sort(values)")
    ).count()
    assert bad == 0


def test_blob_encode_decode_roundtrip(cells):
    enc = cells.select("row_key", "col_name", CS.encode_blob("values").alias("blob"))
    dec = enc.select("row_key", "col_name", CS.decode_blob("blob").alias("values"))
    diff = (
        dec.join(cells.select("row_key", "col_name", "values").withColumnRenamed("values", "orig"),
                 ["row_key", "col_name"])
        .filter(F.expr("values != orig"))
        .count()
    )
    assert diff == 0
    # blob carries the leading count, reference format (Utils.scala:56)
    one = enc.first()
    count_str = one.blob.split("\x00", 1)[0]
    assert int(count_str) >= 1


def test_write_read_prefix_pushdown(cells, spark, tmp_path):
    path = str(tmp_path / "cells")
    CS.write_cells(cells, path)
    back = CS.read_cells(spark, path, prefix="A\x00F")
    assert back.count() == cells.filter(F.col("row_key").startswith("A\x00F")).count()
    assert back.count() > 0
    # the filter must be pushed to the parquet scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_lookup_cells_is_broadcast_join(cells, spark):
    keys = cells.select("row_key", "col_name").limit(50)
    got = CS.lookup_cells(cells, keys)
    assert got.count() == 50
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decode_cells_roundtrips_lineitem(cells, lineitem):
    decoded = CS.decode_cells(
        cells,
        key_names=KEY_COLS,
        value_names=VAL_COLS,
    ).withColumnRenamed("col_name", "l_partkey")
    orig = lineitem.select(
        *(F.col(c).cast("string").alias(c) for c in KEY_COLS),
        F.col("l_partkey").cast("string"),
        *(F.col(c).cast("string").alias(c) for c in VAL_COLS),
    )
    dec = decoded.select(*orig.columns)
    assert dec.count() == orig.count()
    assert dec.exceptAll(orig).count() == 0
    assert orig.exceptAll(dec).count() == 0
