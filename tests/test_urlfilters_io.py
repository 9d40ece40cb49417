"""URL filters (F1/F2) + file sinks (S10-S12)."""

from pyspark.sql import functions as F

from webtableextractionsystem_spark import io_sinks
from webtableextractionsystem_spark.operators.urlfilters import classify_urls


def test_classify_urls(spark):
    rows = [
        ("https://baike.baidu.com/item/%E7%8E%8B%E8%8A%B3",),   # 王芳 -> keep
        ("https://baike.baidu.com/item/%E5%AD%94%E5%AD%90/1584",),  # digits seg
        ("https://baike.baidu.com/item/page.html",),            # '.' -> reject
        ("https://example.com/item/%E7%8E%8B%E8%8A%B3",),       # wrong host
        ("https://baike.baidu.com/item/abc",),                  # not a CJK name
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r["url"]: (r["possible"], r["relevance"], r["keep"])
           for r in classify_urls(df).collect()}
    assert got[rows[0][0]] == (True, 1, True)
    assert got[rows[1][0]] == (True, 0, False)   # last seg '1584' not a name
    assert got[rows[2][0]] == (False, 0, False)
    # relevance (F1) only inspects the decoded name; host gate is F2
    assert got[rows[3][0]] == (False, 1, False)
    assert got[rows[4][0]] == (True, 0, False)


def test_triples_csv_and_entities_json(spark, tmp_path):
    triples = spark.createDataFrame(
        [("d1", 0, "甲", "u1", "兄弟", "乙", "u2")],
        "doc_id string, seq int, subj_name string, subj_url string, "
        "rel string, obj_name string, obj_url string")
    p = str(tmp_path / "triples_csv")
    io_sinks.write_triples_csv(triples, p)
    back = spark.read.option("header", True).csv(p).first()
    assert back["subject"] == "['甲', 'u1']"
    assert back["relationship"] == "兄弟"
    assert back["object"] == "['乙', 'u2']"

    ents = spark.createDataFrame(
        [("d1", 0, "甲", "u1", {"k": "v"})],
        "doc_id string, seq int, name string, url string, "
        "props map<string,string>")
    p2 = str(tmp_path / "ents_json")
    io_sinks.write_entities_json(ents, p2)
    line = spark.read.text(p2).first()["value"]
    assert '"who":["甲","u1"]' in line
    assert '"props":{"k":"v"}' in line


def test_bucketed_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket"))
    p = str(tmp_path / "bp")
    io_sinks.write_bucketed_parquet(df, p)
    back = io_sinks.read_parquet(spark, p)
    assert back.count() == 100
    # partition pruning: a bucket filter reads only that partition
    plan = back.where(F.col("bucket") == 2)._jdf.queryExecution() \
        .executedPlan().toString()
    assert back.where(F.col("bucket") == 2).count() == 25
