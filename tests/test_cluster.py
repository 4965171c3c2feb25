"""Connected components (pipeline/cluster.py): known graphs + the
dedup_clusters contract (canonical = min doc id, singletons kept)."""

import pyspark.sql.functions as F

from openmldb_spark.pipeline.cluster import (connected_components,
                                             dedup_clusters)


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    return {r.id: r.component
            for r in connected_components(df).collect()}


def test_cc_chain(spark):
    # a-b-c-d-e chain: one component rooted at 'a'
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    assert got == {x: "a" for x in "abcde"}


def test_cc_two_components_and_cycle(spark):
    got = _cc(spark, [("x", "y"), ("y", "z"), ("z", "x"),  # cycle
                      ("m", "n")])
    assert got == {"x": "x", "y": "x", "z": "x", "m": "m", "n": "m"}


def test_cc_long_chain_converges_logarithmically(spark):
    # 64-node chain: plain min-propagation needs 63 rounds; the
    # star algorithm must finish well inside max_iter=25
    ids = [f"n{i:03d}" for i in range(64)]
    pairs = list(zip(ids, ids[1:]))
    got = _cc(spark, pairs)
    assert set(got.values()) == {"n000"}
    assert len(got) == 64


def test_dedup_clusters_singletons_and_canonical(spark):
    docs = spark.createDataFrame(
        [("d1",), ("d2",), ("d3",), ("d4",)], "doc_id string")
    pairs = spark.createDataFrame([("d2", "d3")], "id_a string, id_b string")
    out = {r.doc_id: (r.component, r.is_canonical, r.cluster_size)
           for r in dedup_clusters(docs, pairs).collect()}
    assert out == {
        "d1": ("d1", True, 1),
        "d2": ("d2", True, 2),
        "d3": ("d2", False, 2),
        "d4": ("d4", True, 1),
    }
