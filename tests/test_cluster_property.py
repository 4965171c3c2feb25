"""Property test: connected_components == a pure-Python union-find
oracle on random graphs.

The large-star/small-star rounds (pipeline/cluster.py) contract the
edge multiset through several non-obvious rewrites; the known-graph
tests in test_cluster.py pin specific shapes, this drives random edge
lists (self-loops, duplicates, reversed duplicates, isolated pairs,
dense pockets) and checks every node's label equals the min id of its
component as computed by union-find.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from openmldb_spark.pipeline.cluster import connected_components

_IDS = [f"v{i:02d}" for i in range(24)]

_edge = st.tuples(st.sampled_from(_IDS), st.sampled_from(_IDS))


def _union_find_oracle(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for x in list(parent):
        comps.setdefault(find(x), []).append(x)
    out = {}
    for members in comps.values():
        root = min(members)
        for m in members:
            out[m] = root
    return out


@settings(max_examples=8, deadline=None)
@given(st.lists(_edge, min_size=1, max_size=40))
def test_cc_matches_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {r.id: r.component
           for r in connected_components(df).collect()}
    want = _union_find_oracle(pairs)
    # connected_components drops pure self-loop nodes (no real edge);
    # the oracle keeps them as singletons labeled by themselves
    for k in list(want):
        if k not in got:
            assert want[k] == k
            del want[k]
    assert got == want
