"""Connected components over near-duplicate pairs — the clustering step
a real dedup pipeline needs after pair generation: pairs → duplicate
clusters → one canonical document per cluster.

Algorithm: alternating Large-Star / Small-Star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC '14). Each round
is two key-grouped aggregations over the EDGE set only — no vertex
state table is joined, so memory is O(edges per key) and the edge
multiset contracts toward the star form. Converges in O(log n) rounds
(vs O(graph diameter) for plain min-label propagation), which is what
makes it safe on adversarial chain-shaped graphs at 100 TB scale. Each
round ends with an eager ``localCheckpoint`` to truncate the iterative
lineage (otherwise the plan — and task-serialization cost — grows per
round).

The reference engine has no graph operator; this is a build-brief
training-data-pipeline addition (SURVEY.md "beyond the reference").
Component labels are the MIN node id (total order on ids), so results
are deterministic and the label doubles as the canonical doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u})."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).where(F.col("src") != F.col("dst"))
    mins = sym.groupBy("src").agg(F.min("dst").alias("mn"))
    mins = mins.select("src", F.least("mn", "src").alias("m"))
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges high→low, then connect every not-larger neighbor
    (and u itself) to the minimum."""
    canon = edges.select(
        F.greatest("src", "dst").alias("src"),
        F.least("src", "dst").alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    mins = canon.groupBy("src").agg(F.min("dst").alias("m"))
    out = (
        canon.join(mins, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .union(mins.select(F.col("src"), F.col("m").alias("dst")))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    return out


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(src, dst) pair DataFrame → (id, component) for every non-null id
    that appears in a pair; component = min id of its connected
    component. Ids of any orderable type (tested with strings). An id
    seen only in self-pairs (src == dst) is its own singleton component;
    null ids are dropped (no order position, can't label a component)."""
    base = pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    verts = (
        base.select(F.col("src").alias("id"))
        .union(base.select(F.col("dst").alias("id")))
        .where(F.col("id").isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        base
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        # One partial-aggregate job: (count, XOR of 64-bit row hashes).
        # Both edge sets are distinct, so equal count + equal XOR
        # fingerprint identifies set equality up to a 2^-64-scale
        # collision — the convergence check without exceptAll's two
        # extra shuffles. (XOR, not sum: ANSI long sum can overflow.)
        r = df.agg(F.count(F.lit(1)).alias("n"),
                   F.expr("bit_xor(xxhash64(src, dst))").alias("h")).first()
        return (r["n"], r["h"])

    # prev=None skips fingerprinting the raw input: round 1's output
    # equaling the input would only mean the input was already in star
    # form, which round 2 detects at the same total round count — so
    # the pre-loop aggregate job is pure overhead.
    #
    # Rounds 0-1 also skip the fingerprint: convergence is only
    # DETECTABLE from two computed fingerprints (cur == prev), so the
    # earliest useful compare is round 2 vs round 1 — and the first
    # rounds carry the LARGEST edge sets, making their aggregate jobs
    # the two most expensive of the loop. The skipped rounds'
    # non-eager checkpoints materialize together with round 2's
    # fingerprint action in one pass. (With a tiny max_iter budget the
    # skip would make convergence unreachable, so it only engages when
    # the budget allows the deferred detection.)
    skip_until = 2 if max_iter >= 4 else 0
    prev = None
    converged = False
    for i in range(max_iter):
        # non-eager checkpoint: the _sig action below materializes it,
        # one pass instead of eager-checkpoint + count
        edges_new = _small_star(_large_star(edges)) \
            .localCheckpoint(eager=False)
        edges = edges_new
        if i < skip_until:
            continue
        cur = _sig(edges_new)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # labels derived from a non-star edge set are silently WRONG
        # (min over a non-root neighbor set) — never return them
        raise RuntimeError(
            f"connected_components did not reach a fixed point in "
            f"{max_iter} iterations; raise max_iter (alternation "
            f"converges in O(log^2 n) rounds)")
    # star form: every non-root points at its component root; every
    # other vertex of the input (roots AND ids seen only in self-pairs,
    # which the src != dst edge filter removed) is its own label
    labels = edges.groupBy("src").agg(F.min("dst").alias("component")) \
        .select(F.col("src").alias("id"), "component")
    singletons = (
        verts.join(labels, "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return labels.union(singletons)


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Every doc → (doc_id, component, is_canonical, cluster_size).
    Docs in no pair are their own singleton cluster; the canonical doc
    of a cluster is the min PRESENT doc id (deterministic keep-one
    policy) — not the component label, which can name an id absent from
    ``docs`` when pairs were generated before a doc filter; labeling off
    the component would then keep ZERO docs from that cluster.

    Cluster stats come from a groupBy (map-side partial aggregation)
    joined back onto the docs — an unbounded count() window would
    serialize a boilerplate mega-cluster into one task, the skew this
    file's 100 TB framing exists to avoid. The join strategy is left to
    AQE: stats can be near-|docs| rows (mostly singletons), so a forced
    broadcast would be wrong; AQE converts to broadcast when the
    measured size is small and splits skewed partitions otherwise."""
    comp = connected_components(pairs)
    labeled = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.select(F.col("id").alias("doc_id"), "component"),
              "doc_id", "left")
        .select("doc_id",
                F.coalesce("component", "doc_id").alias("component"))
    )
    stats = labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.min("doc_id").alias("__canon"))
    out = (
        labeled.join(stats, "component")
        .withColumn("is_canonical", F.col("doc_id") == F.col("__canon"))
    )
    return out.select("doc_id", "component", "is_canonical", "cluster_size")
