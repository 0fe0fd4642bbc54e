"""Context index — the reference's second roadmap item
(/root/reference/README.md:46-48, src/lib.rs:29-30): "index the entire
OSM dataset by relations between its objects. So, for example, it
would be possible to efficiently discard all Nodes that belong to a
deleted Way."

The index is a plain edge table — one row per reference an object
makes to another object:

    (parent_type, parent_id, seq, ref_type, ref_id)

built by exploding way ``refs`` arrays (way → node, order preserved
via ``seq``) and relation ``members`` arrays (relation → node / way /
relation, the member-role model of
/root/reference/src/osm/model/relation.rs:3-49). Everything downstream
is declarative DataFrame algebra, so Catalyst keeps the scans pruned
and the aggregations partial:

- ``reverse_index`` — "who references X?" — is ONE hash aggregation on
  (ref_type, ref_id). Hot objects (a node shared by thousands of ways,
  a relation like a country boundary with 10^5 members) are absorbed
  by map-side partial aggregation, not salted joins: the skewed key
  never crosses the shuffle un-combined.
- ``cascade_discard`` — the roadmap's own example — flags referenced
  objects whose EVERY referencing parent is deleted (and that carry no
  tags of their own, so nothing else anchors them). The deleted set
  joins in broadcast when driver-small (auto-gated by a count, same
  policy as spatial_join.s2_containment_join), else as a shuffled hash
  join on parent_id — the 10^12-row path degrades, never OOMs.
- ``dangling_references`` — referential-integrity audit (refs whose
  target id does not exist) as null-safe LEFT ANTI joins per ref_type,
  never ``NOT IN`` (NULL-poisoned in SQL, and Spark's translation of
  NOT IN is a nested-loop-prone null-aware anti join).
- ``transitive_closure`` — relation→relation nesting expanded to
  (ancestor, descendant, min depth). OSM relation nesting is shallow
  (<10 in practice) and may contain cycles (bad data), so the loop is
  frontier-based: each level joins the NEW pairs only against the base
  edges, subtracts already-seen pairs (left anti — this is what makes
  cycles terminate), and stops on an empty frontier or ``max_depth``.
  Each frontier is persisted once (it fans out into the accumulator
  union AND the next join — the fan-out re-execution rule).

Scale notes (10^12 rows): the edge explode is narrow (no shuffle);
every aggregation partials map-side; the only broadcast is the gated
deleted set; closure cost is levels × (frontier ⋈ edges) where the
frontier shrinks to the nesting depth's population, not the node
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: edge-table column order shared by every operator below
EDGE_COLS = ("parent_type", "parent_id", "seq", "ref_type", "ref_id")


def explode_references(ways: DataFrame | None = None,
                       relations: DataFrame | None = None,
                       id_col: str = "id",
                       refs_col: str = "refs",
                       members_col: str = "members") -> DataFrame:
    """Explode OSM container columns into the context-index edge table.

    ``ways``: frame with (id, refs array<long>) — emits one edge per
    ref with ``seq`` = position (the reference keeps refs ordered,
    way.rs:3-14; ``posexplode`` preserves that order as data).
    ``relations``: frame with (id, members array<struct<type,id,role>>)
    — member ``type`` values are normalized to lowercase so the edge
    table keys match element-type columns elsewhere.
    """
    parts = []
    if ways is not None:
        parts.append(
            ways.select(F.col(id_col).alias("parent_id"),
                        F.posexplode(refs_col).alias("seq", "ref_id"))
            .select(F.lit("way").alias("parent_type"), "parent_id",
                    "seq", F.lit("node").alias("ref_type"), "ref_id"))
    if relations is not None:
        parts.append(
            relations.select(F.col(id_col).alias("parent_id"),
                             F.posexplode(members_col).alias("seq", "_m"))
            .select(F.lit("relation").alias("parent_type"), "parent_id",
                    "seq", F.lower(F.col("_m.type")).alias("ref_type"),
                    F.col("_m.id").alias("ref_id")))
    if not parts:
        raise ValueError("explode_references: pass ways and/or relations")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def reverse_index(edges: DataFrame) -> DataFrame:
    """Reverse-reference index: per referenced object, how many
    incoming references and from how many distinct parents.

    One hash aggregation; distinct parents counted over the combined
    (type, id) identity because a node may be referenced by both ways
    and relations. Output: (ref_type, ref_id, n_refs, n_parents,
    min_parent, max_parent).
    """
    parent_key = F.concat_ws(":", "parent_type",
                             F.col("parent_id").cast("string"))
    return (edges.groupBy("ref_type", "ref_id")
            .agg(F.count("*").alias("n_refs"),
                 F.countDistinct(parent_key).alias("n_parents"),
                 F.min("parent_id").alias("min_parent"),
                 F.max("parent_id").alias("max_parent")))


def cascade_discard(nodes: DataFrame, edges: DataFrame,
                    deleted_parents: DataFrame,
                    node_id_col: str = "node_id",
                    tagged_col: str = "tagged",
                    broadcast_deleted: bool | str = "auto",
                    max_broadcast_rows: int = 4_000_000,
                    deleted_parent_type: str = "way",
                    node_ref_type: str = "node") -> DataFrame:
    """The roadmap's example: nodes discardable after a way deletion.

    A node is discardable iff it is referenced by ≥1 parent, EVERY
    referencing parent is in ``deleted_parents`` (one column:
    parent_id, all of ``deleted_parent_type``), and the node itself is
    untagged (``tagged_col`` false — a tagged node is an object in its
    own right and survives its containers, matching the reference's
    data model where tags are the extension mechanism, tag.rs:1-5).

    OSM id namespaces are PER TYPE (a node and a way may share an id),
    so the deleted match is on (parent_type, parent_id), liveness
    groups on (ref_type, ref_id), and only ``node_ref_type`` rows join
    the node table — a full mixed edge table from
    ``explode_references(ways=…, relations=…)`` is safe to pass: a
    live relation whose id collides with a deleted way keeps its
    members alive.

    Plan: edges LEFT JOIN deleted (broadcast when driver-small, gated
    like s2_containment_join per the r4 ADVICE pattern) → bool_and of
    the deletion flag per (ref_type, ref_id) (map-side partial) →
    inner join the node table → tag filter. Output: (node_id, n_refs,
    n_parents).
    """
    # dedupe the deleted set: a duplicate parent id in a plain join
    # would duplicate every edge row of that parent and inflate n_refs
    deleted = deleted_parents.select(
        F.col(deleted_parents.columns[0]).alias("_del_pid")).distinct()
    deleted = deleted.withColumn("_deleted", F.lit(True))
    if broadcast_deleted == "auto":
        broadcast_deleted = deleted.count() <= max_broadcast_rows
    if broadcast_deleted:
        deleted = F.broadcast(deleted)
    flagged = edges.join(
        deleted,
        (edges.parent_id == deleted._del_pid)
        & (edges.parent_type == F.lit(deleted_parent_type)), "left")
    per_node = (flagged.groupBy("ref_type", "ref_id")
                .agg(F.count("*").alias("n_refs"),
                     F.countDistinct(F.concat_ws(
                         ":", "parent_type",
                         F.col("parent_id").cast("string")))
                     .alias("n_parents"),
                     F.bool_and(F.coalesce("_deleted", F.lit(False)))
                     .alias("_all_deleted")))
    return (per_node.filter("_all_deleted")
            .filter(F.col("ref_type") == node_ref_type)
            .join(nodes, per_node.ref_id == nodes[node_id_col], "inner")
            .filter(~F.col(tagged_col))
            .select(F.col(node_id_col), "n_refs", "n_parents"))


def dangling_references(edges: DataFrame,
                        targets: dict[str, DataFrame]) -> DataFrame:
    """Referential-integrity audit: references whose target does not
    exist, grouped per (parent_type, ref_type).

    ``targets`` maps a ref_type to a one-column frame of existing ids
    of that type. Each ref_type is checked with a LEFT ANTI join (the
    null-safe anti-join form — NOT IN returns no rows if the target
    side contains a single NULL). Ref types with no target frame are
    skipped (unauditable, not dangling). Output: (parent_type,
    ref_type, n_dangling, n_missing_targets, min_missing, max_missing).
    """
    parts = []
    for ref_type, ids in targets.items():
        tgt = ids.select(F.col(ids.columns[0]).alias("_tid"))
        parts.append(edges.filter(F.col("ref_type") == ref_type)
                     .join(tgt, F.col("ref_id") == F.col("_tid"),
                           "left_anti"))
    if not parts:
        raise ValueError("dangling_references: no target frames given")
    missing = parts[0]
    for p in parts[1:]:
        missing = missing.unionByName(p)
    return (missing.groupBy("parent_type", "ref_type")
            .agg(F.count("*").alias("n_dangling"),
                 F.countDistinct("ref_id").alias("n_missing_targets"),
                 F.min("ref_id").alias("min_missing"),
                 F.max("ref_id").alias("max_missing")))


def transitive_closure(edges: DataFrame, max_depth: int = 16,
                       on_depth_exceeded: str = "raise") -> DataFrame:
    """Expand containment edges (parent_id, child_id) to (ancestor_id,
    descendant_id, depth) with depth = length of the SHORTEST path —
    the semantics of a recursive CTE with UNION-dedup + min(depth).

    Cycle-safe by construction: each level's candidate pairs subtract
    the already-accumulated pairs (left anti), so a cycle contributes
    each pair once and the frontier then empties. ``max_depth`` bounds
    the loop for genuinely deep data; ``on_depth_exceeded`` = 'raise'
    (default — silent truncation would be a wrong answer) or
    'truncate' for callers that want the bounded prefix.

    The driver-side loop is bounded by the data's nesting depth (OSM
    relation nesting is single digits); each iteration is one hash
    equi-join frontier ⋈ edges plus one anti join against the
    accumulated levels — both shrink with the frontier.

    Every level is EAGERLY localCheckpointed and the accumulator is a
    FLAT union of the checkpointed levels. This truncates lineage per
    iteration, which is load-bearing, not a cache hint: a
    self-referencing accumulator (acc feeds both the anti-join of the
    next level and the union building the next acc) DOUBLES the
    logical plan each iteration even under persist() — the data is
    cached but the tree is not, and the SQL listener's explainString
    of the ~2^depth-node plan OOMed the 12g driver at sf0.1 (one
    nesting level deeper than sf0.01, which is why small-sf parity
    never saw it).
    """
    base = (edges.select(F.col("parent_id").alias("ancestor_id"),
                         F.col("child_id").alias("descendant_id"))
            .distinct())
    lvl = (base.withColumn("depth", F.lit(1).cast("int"))
           .localCheckpoint(eager=True))
    levels = [lvl]

    def _acc():
        out = levels[0]
        for d in levels[1:]:
            out = out.unionByName(d)
        return out

    depth = 1
    while True:
        nxt = (lvl.join(
            base.select(F.col("ancestor_id").alias("_p"),
                        F.col("descendant_id").alias("_c")),
            lvl.descendant_id == F.col("_p"), "inner")
            .select("ancestor_id", F.col("_c").alias("descendant_id"))
            .distinct()
            .join(_acc().select("ancestor_id", "descendant_id"),
                  ["ancestor_id", "descendant_id"], "left_anti")
            .withColumn("depth", F.lit(depth + 1).cast("int"))
            .localCheckpoint(eager=True))
        if nxt.isEmpty():
            return _acc()
        depth += 1
        if depth > max_depth:
            if on_depth_exceeded == "raise":
                raise ValueError(
                    f"transitive_closure: nesting exceeds max_depth="
                    f"{max_depth}; pass a larger bound or "
                    f"on_depth_exceeded='truncate'")
            return _acc()
        levels.append(nxt)
        lvl = nxt
