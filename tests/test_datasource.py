"""Spark 4 Python DataSource sources: partition planning, executor-side
reads, pagination semantics (missing page == empty), case-insensitive
column matching, binary-column generation."""

import json

from pyspark.sql import functions as F

from analyst_spark.sources.datasource import register_datasources


def test_paged_json_reads_all_pages(spark, tmp_path):
    register_datasources(spark)
    rows = [{"ID": i, "Name": f"n{i}"} for i in range(25)]
    for page in range(3):
        chunk = rows[page * 10 : (page + 1) * 10]
        (tmp_path / f"page_{page}.json").write_text(json.dumps(chunk))
    df = (
        spark.read.format("paged_json")
        .schema("id long, name string, missing string")
        .option("url_template", f"file://{tmp_path}/page_{{page}}.json")
        .option("page_size", "10")
        .option("max_pages", "6")  # pages 3..5 do not exist -> empty
        .load()
    )
    got = df.collect()
    assert len(got) == 25
    byid = {r.id: r for r in got}
    assert byid[7].name == "n7"          # case-insensitive key match
    assert byid[7].missing is None       # absent key -> NULL
    assert df.rdd.getNumPartitions() == 6  # one task per page


def test_synthetic_corpus_distributed_generation(spark):
    register_datasources(spark)
    df = (
        spark.read.format("synthetic_corpus")
        .option("rows", "64")
        .option("partitions", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 64
    # binary column feeds the multimodal pipeline directly
    from analyst_spark.functions.multimodal import image_features

    feats = image_features(df.select("doc_id", "image")).collect()
    assert len(feats) == 64
    assert all(r.width == 8 for r in feats)
    # deterministic: same options -> same content
    again = (
        spark.read.format("synthetic_corpus")
        .option("rows", "64").option("partitions", "4").load()
    )
    a = sorted((r.doc_id, r.text) for r in df.select("doc_id", "text").collect())
    b = sorted((r.doc_id, r.text) for r in again.select("doc_id", "text").collect())
    assert a == b


def test_paged_json_filter_pushscan(spark, tmp_path):
    # the relation is ordinary to Catalyst: filters/projections apply
    register_datasources(spark)
    (tmp_path / "page_0.json").write_text(
        json.dumps([{"id": i} for i in range(10)])
    )
    df = (
        spark.read.format("paged_json")
        .schema("id long")
        .option("url_template", f"file://{tmp_path}/page_{{page}}.json")
        .option("max_pages", "1")
        .load()
        .filter(F.col("id") >= 5)
    )
    assert df.count() == 5
