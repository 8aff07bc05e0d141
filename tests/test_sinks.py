"""Sink/source surface tests: text write + append (K3/K4), glob reads
(S11), output coalesce (O4), partitioned cell-store layout."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_text_write_and_append(spark, tmp_path):
    p = str(tmp_path / "log_out")
    spark.createDataFrame([("line1",)], ["value"]).coalesce(1).write.text(p)
    spark.createDataFrame([("line2",)], ["value"]).coalesce(1).write.mode(
        "append"
    ).text(p)
    back = spark.read.text(p)
    assert sorted(r.value for r in back.collect()) == ["line1", "line2"]


def test_glob_read_and_input_file_name(spark, tmp_path):
    for name in ["a", "b"]:
        spark.createDataFrame([(name,)], ["v"]).coalesce(1).write.parquet(
            str(tmp_path / f"part_{name}")
        )
    df = spark.read.parquet(str(tmp_path / "part_*")).withColumn(
        "src", F.input_file_name()
    )
    rows = df.collect()
    assert sorted(r.v for r in rows) == ["a", "b"]
    # the source path is recoverable per row (the S11 directory-listing role)
    assert all("part_" in r.src for r in rows)


def test_output_coalesce(spark, tmp_path):
    # O4: the reference coalesces final cell frames to 4 partitions
    df = spark.range(0, 1000).repartition(16)
    out = df.coalesce(4)
    assert out.rdd.getNumPartitions() == 4
    p = str(tmp_path / "coalesced")
    out.write.parquet(p)
    import glob

    files = glob.glob(p + "/part-*")
    assert len(files) == 4
