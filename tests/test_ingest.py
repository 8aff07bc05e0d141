"""Ingestion parser tests: MUPR fixed schema, MUCR variable-arity HOF
parse, trigger broadcast-join enrichment (SURVEY.md §2.1, §3.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from applications_analytics_midas_hbase_metrics_spark.sources import ingest as I

D = "\x00"


@pytest.fixture(scope="module")
def mupr_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("mupr") / "f1.mupr"
    rows = [
        D.join(["101", "SUB_A", "1", "5", "1.5", "7", "3.25", "AC", "PF", "MV", "t_volt"]),
        D.join(["101", "SUB_A", "1", "6", "", "8", "4.5", "AC", "PF", "MV", "t_amp"]),
        D.join(["102", "SUB_B", "2", "1", "2.0", "9", "0.125", "IC", "FF", "MK", "t_volt"]),
    ]
    p.write_text("\n".join(rows))
    return str(p)


@pytest.fixture(scope="module")
def mucr_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("mucr") / "f1.mucr"
    rows = [
        # 6 fixed + 2 counters (triples)
        D.join(["201", "1", "prog_x", "P", "SUB_A", "2",
                "CNT1", "3", "11", "LONGCNT22", "4", "12"]),
        # 1 counter
        D.join(["202", "2", "prog_y", "F", "SUB_B", "1", "C9", "7", "21"]),
        # malformed: declares 3 counters, has only 1 triple -> dropped
        D.join(["203", "3", "prog_z", "P", "SUB_C", "3", "CX", "1", "31"]),
    ]
    p.write_text("\n".join(rows))
    return str(p)


@pytest.fixture(scope="module")
def trig_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("trig") / "trig.csv"
    p.write_text(
        "File_Name,Lot,Lato_Start_WW,Lots_seq_key\n"
        "f1.mupr,LOT_A,202233,9001\n"
        "f2.mupr,LOT_B,202234,9002\n"
    )
    return str(p)


def test_mupr_schema_and_types(spark, mupr_file):
    df = I.read_mupr(spark, mupr_file)
    # Spark file sources relax nullability to True on read; names+types
    # are the contract (the reference's nullability flags are documented
    # in MUPR_SCHEMA).
    assert df.schema.simpleString() == I.MUPR_SCHEMA.simpleString()
    rows = df.orderBy("Unit_Testing_Seq_Key", "Test_Result_Order_Num").collect()
    assert len(rows) == 3
    assert rows[0].Unit_Testing_Seq_Key == 101
    assert rows[0].Measurement_Value == pytest.approx(3.25)
    assert rows[1].Test_Result_Array_Seq_Num is None  # empty field -> null
    assert rows[2].Test_Name == "t_volt"


def test_mucr_variable_arity_parse(spark, mucr_file):
    df = I.read_mucr(spark, mucr_file)
    rows = df.orderBy("Unit_Testing_Seq_Key", "Unit_Counter_Seq_Num").collect()
    # 2 + 1 counters; malformed row dropped
    assert len(rows) == 3
    r0, r1, r2 = rows
    assert (r0.Unit_Counter_ID, r0.Repeating_Counter_Occurrences, r0.Unit_Counter_Seq_Num) == ("CNT1", "3", "11")
    assert r1.Unit_Counter_ID == "LONGCNT22"
    assert r1.counter_id_len_hex == "9"  # len 9 -> hex '9'
    assert r2.Unit_Counter_ID == "C9"
    # qualifier build (fixed Test_Name bug): flg + hex(len) + id
    q = df.filter(F.col("Unit_Counter_ID") == "CNT1").select(
        I.mucr_column_qualifier().alias("q")
    ).first().q
    assert q == "P4CNT1"


def test_mucr_hex_is_lowercase_hex(spark, mucr_file):
    df = I.read_mucr(spark, mucr_file)
    # 16-char id would be '10' — emulate via expression check on lengths
    got = {r.Unit_Counter_ID: r.counter_id_len_hex for r in df.collect()}
    assert got == {"CNT1": "4", "LONGCNT22": "9", "C9": "2"}


def test_trigger_enrichment_broadcast_join(spark, mupr_file, trig_file):
    # Two distinct File_Name values so the join key isn't constant-folded
    # (with a literal key Catalyst degenerates the join into a pushed
    # filter + broadcast stamp — also correct, but not what we assert).
    d1 = I.read_mupr(spark, mupr_file).withColumn("File_Name", F.lit("f1.mupr"))
    d2 = I.read_mupr(spark, mupr_file).withColumn("File_Name", F.lit("f2.mupr"))
    data = d1.union(d2)
    trig = I.read_trigger(spark, trig_file)
    assert dict(trig.dtypes)["Lato_Start_WW"] == "int"
    out = I.enrich_with_metadata(data, trig)
    assert out.count() == 6
    first = (
        out.filter(F.col("File_Name") == "f1.mupr")
        .select("Lot", "Lato_Start_WW", "Lots_seq_key")
        .first()
    )
    assert (first.Lot, first.Lato_Start_WW, first.Lots_seq_key) == ("LOT_A", 202233, 9001)
    from tests.conftest import final_plan

    assert "BroadcastHashJoin" in final_plan(out)


def test_nullbyte_to_csv(spark, mupr_file):
    raw = spark.read.text(mupr_file)
    out = I.nullbyte_to_csv(raw, add_header_row=True)
    rows = out.collect()
    assert rows[0].value.startswith("0,1,2,")
    assert "\x00" not in rows[1].value and "," in rows[1].value


def test_parse_kv_details(spark):
    df = spark.createDataFrame([(["a=1", "b=x y", "c=3"],)], "details array<string>")
    got = df.select(I.parse_kv_details("details", ["a", "c", "zz"]).alias("s")).first().s
    assert (got.a, got.c, got.zz) == ("1", "3", None)


def test_read_properties(tmp_path):
    p = tmp_path / "db.properties"
    p.write_text("url=jdbc:x://h/db\nuser=u\n# comment\npassword=p\n")
    cfg = I.read_properties(str(p))
    assert cfg == {"url": "jdbc:x://h/db", "user": "u", "password": "p"}


def test_read_jdbc_executes_roundtrip(spark, tmp_path):
    # the getTeradataDataframe shape, executed for real against the
    # embedded Derby engine on Spark's classpath: write a table over
    # JDBC, read it back through read_jdbc with a pushed-down subquery.
    # (Derby folds unquoted identifiers to uppercase, hence the naming.)
    url = "jdbc:derby:memory:midasjdbc;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    src = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["ID", "NAME"])
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "T_METRICS")
        .option("driver", drv)
        .mode("overwrite")
        .save()
    )
    cfg = tmp_path / "jdbc.properties"
    cfg.write_text(f"url=jdbc:derby:memory:midasjdbc\ndriver={drv}\n")
    out = I.read_jdbc(
        spark, str(cfg), "SELECT ID, NAME FROM T_METRICS WHERE ID >= 2"
    )
    assert sorted((r.ID, r.NAME) for r in out.collect()) == [(2, "b"), (3, "c")]


def test_read_jdbc_missing_url_and_unreachable(spark, tmp_path):
    import pytest as _pytest

    empty = tmp_path / "empty.properties"
    empty.write_text("user=u\n")
    with _pytest.raises(ValueError, match="missing the required 'url'"):
        I.read_jdbc(spark, str(empty), "SELECT 1")

    bad = tmp_path / "bad.properties"
    bad.write_text("url=jdbc:derby:memory:nosuchdb\n")  # no ;create=true
    with _pytest.raises(RuntimeError, match="JDBC read failed for url"):
        I.read_jdbc(spark, str(bad), "SELECT 1 FROM SYSIBM.SYSDUMMY1")


def test_read_jsonl_corrupt_capture_and_strict(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        '{"id": 2, "name": "b"}\n'
        '{"id": "NOT_A_NUMBER", "name": "c"}\n'
        "not json at all\n"
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    out = I.read_jsonl(spark, str(p), schema, keep_corrupt=True)
    rows = out.collect()
    good = sorted((r.id, r.name) for r in rows if r._corrupt_record is None)
    bad = [r for r in rows if r._corrupt_record is not None]
    assert good == [(1, "a"), (2, "b")]
    # malformed JSON and type-mismatch rows both land in the capture
    # column with schema fields nulled
    assert len(bad) == 2
    assert all(r.id is None for r in bad)
    assert {r._corrupt_record for r in bad} == {
        '{"id": "NOT_A_NUMBER", "name": "c"}',
        "not json at all",
    }

    # strict variant: no capture column, corrupt rows come back all-null
    strict = I.read_jsonl(spark, str(p), schema)
    assert "_corrupt_record" not in strict.columns
    assert strict.count() == 4


def test_read_orc_pushdown_and_pruning(spark, tmp_path):
    """The ORC scan must keep parquet's plan properties: the predicate
    reaches the reader (PushedFilters) and unreferenced columns are
    pruned from ReadSchema."""
    from pyspark.sql import functions as F

    p = str(tmp_path / "orc")
    spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    ).write.orc(p)
    out = I.read_orc(spark, p, columns=["id", "grp"]).filter(F.col("grp") == 3)
    assert out.count() == len([i for i in range(1000) if i % 7 == 3])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(grp), EqualTo(grp,3)]" in plan
    assert "payload" not in plan.split("ReadSchema")[1][:200]
