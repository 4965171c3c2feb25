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


def test_cc_self_pair_vertex_is_singleton(spark):
    # 'a' appears only in a self-pair: it must still get a label
    # (its own singleton component), and null ids are dropped
    df = spark.createDataFrame(
        [("a", "a"), ("b", "c"), (None, "q")], "id_a string, id_b string")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {"a": "a", "b": "b", "c": "b", "q": "q"}


def test_dedup_clusters_canonical_when_component_label_absent(spark):
    # pairs reference 'a0' (filtered out of docs) and a0 < b1 < c2:
    # the component label is an absent id, so the canonical doc must
    # fall back to the min PRESENT doc — never zero canonicals
    docs = spark.createDataFrame([("b1",), ("c2",)], "doc_id string")
    pairs = spark.createDataFrame(
        [("a0", "b1"), ("b1", "c2")], "id_a string, id_b string")
    rows = dedup_clusters(docs, pairs).collect()
    comp = {r.doc_id: r.component for r in rows}
    assert comp == {"b1": "a0", "c2": "a0"}
    canon = {r.doc_id: r.is_canonical for r in rows}
    assert canon == {"b1": True, "c2": False}
    assert all(r.cluster_size == 2 for r in rows)


def test_dedup_clusters_plan_has_no_unbounded_window(spark):
    # cluster_size must come from groupBy+join, not an unbounded
    # count() window that serializes a mega-cluster into one task
    docs = spark.createDataFrame([("d1",), ("d2",)], "doc_id string")
    pairs = spark.createDataFrame([("d1", "d2")], "id_a string, id_b string")
    plan = dedup_clusters(docs, pairs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
