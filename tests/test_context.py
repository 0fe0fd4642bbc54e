"""Context index (operators/context.py) — the reference's second
roadmap item (/root/reference/README.md:46-48): reverse-reference
lookup, cascade discard, dangling-ref audit, relation-nesting closure.

Unit semantics are pinned on hand-built graphs (including the cases
the synthetic TPC-H derivation can't produce: cycles, diamonds, mixed
live/deleted parents, a tagged node shielded from discard), the
multi-partition path is forced explicitly (CLAUDE.md: one-block parity
can't see cross-block bugs), and the PBF-fixture entry is verified
against an independent pandas brute force.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from osm_io_spark.operators import context as CTX


def _edges(spark, rows, n_parts=5):
    """(parent_type, parent_id, seq, ref_type, ref_id) edge frame,
    repartitioned so aggregation/join paths cross partitions."""
    df = spark.createDataFrame(
        [Row(parent_type=pt, parent_id=pid, seq=s, ref_type=rt, ref_id=rid)
         for (pt, pid, s, rt, rid) in rows],
        schema="parent_type string, parent_id long, seq long, "
               "ref_type string, ref_id long")
    return df.repartition(n_parts, "ref_id")


def test_explode_references_ways_and_relations(spark):
    ways = spark.createDataFrame(
        [Row(id=1, refs=[10, 11, 10]), Row(id=2, refs=[12])],
        schema="id long, refs array<long>")
    rels = spark.createDataFrame(
        [Row(id=7, members=[Row(type="Node", id=10, role="admin_centre"),
                            Row(type="Way", id=1, role="outer")])],
        schema="id long, members array<struct<type string, id long, "
               "role string>>")
    out = CTX.explode_references(ways=ways, relations=rels)
    got = {(r.parent_type, r.parent_id, r.seq, r.ref_type, r.ref_id)
           for r in out.collect()}
    assert got == {("way", 1, 0, "node", 10), ("way", 1, 1, "node", 11),
                   ("way", 1, 2, "node", 10), ("way", 2, 0, "node", 12),
                   ("relation", 7, 0, "node", 10),
                   ("relation", 7, 1, "way", 1)}
    # duplicate ref in one way stays two edges (order data preserved)
    assert out.count() == 6


def test_reverse_index_counts_distinct_parent_identity(spark):
    # node 10 referenced twice by way 1 and once by relation 1 — the
    # SAME numeric id in two type namespaces must count as 2 parents
    edges = _edges(spark, [
        ("way", 1, 0, "node", 10), ("way", 1, 2, "node", 10),
        ("relation", 1, 0, "node", 10), ("way", 2, 0, "node", 11)])
    got = {r.ref_id: r for r in CTX.reverse_index(edges).collect()}
    assert got[10].n_refs == 3 and got[10].n_parents == 2
    assert got[10].min_parent == 1 and got[10].max_parent == 1
    assert got[11].n_refs == 1 and got[11].n_parents == 1
    assert got[11].min_parent == 2 and got[11].max_parent == 2


def _nodes(spark, rows):
    return spark.createDataFrame(
        [Row(node_id=i, tagged=t) for (i, t) in rows],
        schema="node_id long, tagged boolean")


def _ids(spark, ids, col="way_id"):
    return spark.createDataFrame([Row(**{col: i}) for i in ids],
                                 schema=f"{col} long")


CASCADE_EDGES = [
    # node 10: both ways deleted, untagged  -> discardable
    ("way", 1, 0, "node", 10), ("way", 2, 0, "node", 10),
    # node 11: one live parent              -> kept
    ("way", 1, 0, "node", 11), ("way", 3, 0, "node", 11),
    # node 12: all parents deleted but TAGGED -> kept
    ("way", 2, 0, "node", 12),
    # node 13: unreferenced (no edge)        -> not emitted
    # node 14: deleted way references it twice (dup ref counts)
    ("way", 1, 0, "node", 14), ("way", 1, 1, "node", 14),
]


@pytest.mark.parametrize("broadcast", [True, False])
def test_cascade_discard_semantics(spark, broadcast):
    nodes = _nodes(spark, [(10, False), (11, False), (12, True),
                           (13, False), (14, False)])
    edges = _edges(spark, CASCADE_EDGES)
    deleted = _ids(spark, [1, 2, 2])  # dup deleted id must not inflate
    out = {r.node_id: r for r in CTX.cascade_discard(
        nodes, edges, deleted, broadcast_deleted=broadcast).collect()}
    assert set(out) == {10, 14}
    assert out[10].n_refs == 2 and out[10].n_parents == 2
    assert out[14].n_refs == 2 and out[14].n_parents == 1


def test_cascade_discard_type_namespaces(spark):
    """OSM ids are unique only PER TYPE: a live relation whose id
    collides with a deleted way id must not count as deleted, and a
    way ref_id colliding with a node ref_id must not merge into the
    node's liveness group (both bugs existed when the join keyed on
    parent_id alone and the groupBy on ref_id alone)."""
    edges = _edges(spark, [
        # node 10 held by deleted way 1 AND by LIVE relation 1 (same
        # numeric parent_id as the deleted way) -> kept
        ("way", 1, 0, "node", 10), ("relation", 1, 0, "node", 10),
        # node 11 held only by deleted way 1 -> discardable
        ("way", 1, 1, "node", 11),
        # relation 9 references WAY 11 (live): same ref_id as node 11
        # in a different namespace; must not contaminate node 11
        ("relation", 9, 0, "way", 11),
    ])
    nodes = _nodes(spark, [(10, False), (11, False)])
    deleted = _ids(spark, [1])  # deleted WAY 1 (relation 1 is live)
    out = {r.node_id: r for r in CTX.cascade_discard(
        nodes, edges, deleted).collect()}
    assert set(out) == {11}
    assert out[11].n_refs == 1 and out[11].n_parents == 1


def test_dangling_references_null_safe(spark):
    edges = _edges(spark, [
        ("way", 1, 0, "node", 10), ("way", 1, 1, "node", 99),
        ("way", 2, 0, "node", 98), ("way", 2, 1, "node", 98),
        ("relation", 7, 0, "way", 1), ("relation", 7, 1, "way", 555)])
    targets = {"node": _ids(spark, [10, 11], col="id"),
               "way": _ids(spark, [1, 2], col="id")}
    got = {(r.parent_type, r.ref_type): r
           for r in CTX.dangling_references(edges, targets).collect()}
    wn = got[("way", "node")]
    assert wn.n_dangling == 3 and wn.n_missing_targets == 2
    assert wn.min_missing == 98 and wn.max_missing == 99
    rw = got[("relation", "way")]
    assert rw.n_dangling == 1 and rw.min_missing == 555
    assert len(got) == 2


def _closure_edges(spark, pairs):
    return spark.createDataFrame(
        [Row(parent_id=p, child_id=c) for (p, c) in pairs],
        schema="parent_id long, child_id long").repartition(4, "child_id")


def test_transitive_closure_chain_and_diamond(spark):
    # chain 1->2->3->4 plus a diamond shortcut 1->3: depth(1,3) must be
    # the SHORTEST path (1), matching recursive-CTE UNION + min(depth)
    e = _closure_edges(spark, [(1, 2), (2, 3), (3, 4), (1, 3)])
    got = {(r.ancestor_id, r.descendant_id): r.depth
           for r in CTX.transitive_closure(e).collect()}
    assert got == {(1, 2): 1, (2, 3): 1, (3, 4): 1, (1, 3): 1,
                   (2, 4): 2, (1, 4): 2}


def test_transitive_closure_cycle_terminates(spark):
    e = _closure_edges(spark, [(1, 2), (2, 3), (3, 1)])
    got = {(r.ancestor_id, r.descendant_id): r.depth
           for r in CTX.transitive_closure(e, max_depth=10).collect()}
    # every ordered pair of the 3-cycle, each at its shortest depth
    assert got == {(1, 2): 1, (2, 3): 1, (3, 1): 1,
                   (1, 3): 2, (2, 1): 2, (3, 2): 2,
                   (1, 1): 3, (2, 2): 3, (3, 3): 3}


def test_transitive_closure_depth_guard(spark):
    e = _closure_edges(spark, [(i, i + 1) for i in range(10)])
    with pytest.raises(ValueError, match="max_depth"):
        CTX.transitive_closure(e, max_depth=3)
    got = CTX.transitive_closure(e, max_depth=3,
                                 on_depth_exceeded="truncate")
    assert got.agg(F.max("depth")).first()[0] == 3


def test_pbf_discard_matches_pandas_brute_force(spark):
    """The registry's ctx_pbf_discard path, verified independently:
    explode the fixture's ways in pandas and recompute the discardable
    set with plain python sets."""
    from osm_io_spark import queries as Q
    from osm_io_spark.sources.pbf import decode as PD

    path = Q._fixture_pbf_path(spark)
    els = PD.read_pbf(spark, path)
    ways = els.filter("etype = 'way'").select("id", "refs").toPandas()
    nodes = els.filter("etype = 'node'").select(
        "id", (F.size("tags") > 0).alias("tagged")).toPandas()

    deleted = {int(i) for i in ways["id"] if i % 3 == 0}
    ref_count: dict[int, int] = {}
    parents: dict[int, set] = {}
    all_deleted: dict[int, bool] = {}
    for wid, refs in zip(ways["id"], ways["refs"]):
        for r in refs:
            r = int(r)
            ref_count[r] = ref_count.get(r, 0) + 1
            parents.setdefault(r, set()).add(int(wid))
            all_deleted[r] = all_deleted.get(r, True) and wid in deleted
    tagged = dict(zip(nodes["id"].astype(int), nodes["tagged"]))
    want = {r for r, ok in all_deleted.items()
            if ok and r in tagged and not tagged[r]}

    row = Q.q_ctx_pbf_discard(spark, "/root/testdata/sf0.001").first()
    assert row.n_discardable == len(want)
    if want:
        assert row.min_id == min(want) and row.max_id == max(want)
        assert row.total_refs == sum(ref_count[r] for r in want)


def test_plan_shapes(spark):
    """Scale audit: no cartesian product anywhere in the family; the
    reverse index partial-aggregates map-side (hot objects combine
    before the shuffle); cascade's deleted set broadcasts when small."""
    from osm_io_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    ridx = Q.q_ctx_reverse_index(spark, sf)
    plan = ridx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # map-side combine before shuffle

    casc = Q.q_ctx_cascade_discard(spark, sf)
    plan = casc._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # gated deleted-set broadcast

    dang = Q.q_ctx_dangling_refs(spark, sf)
    plan = dang._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan  # the null-safe anti-join form


def test_transitive_closure_deep_chain_plan_stays_linear(spark):
    """Regression for the sf0.1 driver OOM: a self-referencing
    accumulator (union + anti-join per level) doubled the logical plan
    each iteration — persist() caches data, not lineage, and the SQL
    listener's explainString of the ~2^depth tree exhausted the driver
    heap one nesting level beyond what sf0.01 parity exercised. The
    closure must complete a 13-deep chain AND return a frame whose
    plan is a flat union of checkpointed levels (size linear in
    depth)."""
    n = 14
    e = _closure_edges(spark, [(i, i + 1) for i in range(n - 1)])
    out = CTX.transitive_closure(e, max_depth=16)
    rows = out.collect()
    assert len(rows) == n * (n - 1) // 2
    got = {(r.ancestor_id, r.descendant_id): r.depth for r in rows}
    assert got[(0, n - 1)] == n - 1 and got[(0, 1)] == 1
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert len(plan) < 60_000, len(plan)
    assert "LogicalRDD" in plan  # levels are checkpoint scans, not
    # re-derived join trees
