"""S6/S7 interchange formats: JSON store + GraphML round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_graphml_round_trip(spark, tmp_path):
    from memfuse_spark.sources.graphml import export_graphml, import_graphml

    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 0.5, "SIMILAR_TO"), (1, 2, 1.0, "FOLLOWS"), (2, 0, 0.25, "SIMILAR_TO")],
        "src long, dst long, weight double, relation string",
    )
    path = str(tmp_path / "g.graphml")
    n = export_graphml(nodes, edges, path)
    assert n == 3
    nodes2, edges2 = import_graphml(spark, path)
    assert sorted(r.node_id for r in nodes2.collect()) == [0, 1, 2]
    got = sorted(map(tuple, edges2.collect()))
    want = sorted(map(tuple, edges.collect()))
    assert got == want  # weights survive exactly (repr round-trip)


def test_graphml_feeds_graph_operators(spark, tmp_path):
    from memfuse_spark.operators.graph import neighbors
    from memfuse_spark.sources.graphml import export_graphml, import_graphml

    nodes = spark.createDataFrame([(0,), (1,), (2,)], "node_id long")
    edges = spark.createDataFrame(
        [(0, 1, 0.9, "SIMILAR_TO"), (0, 2, 0.4, "SIMILAR_TO")],
        "src long, dst long, weight double, relation string",
    )
    path = str(tmp_path / "g2.graphml")
    export_graphml(nodes, edges, path)
    _, e2 = import_graphml(spark, path)
    out = neighbors(e2, 0).collect()
    assert [r.dst for r in out] == [1, 2]  # weight-desc order preserved


def test_json_store_round_trip(spark, tables, tmp_path):
    from memfuse_spark.sources.jsonstore import (
        items_from_documents,
        load_json_store,
        save_json_store,
    )

    docs = tables["documents"]
    emb = tables["embeddings"]
    items = items_from_documents(docs)
    embeddings = emb.select(
        F.col("vec_id").cast("string").alias("id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    base = str(tmp_path / "store")
    save_json_store(items, embeddings, base)
    items2, emb2 = load_json_store(spark, base)
    assert items2.count() == docs.count()
    assert emb2.count() == emb.count()
    row = items2.filter(F.col("id") == "0").first()
    assert row.metadata["lang"] is not None
    # embedding values survive the JSON round-trip
    a = emb.filter("vec_id = 0").first().embedding
    b = emb2.filter(F.col("id") == "0").first().embedding
    assert [float(x) for x in a] == b
