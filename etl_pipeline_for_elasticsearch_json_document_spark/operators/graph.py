"""Distributed connected components — the closer for fuzzy dedup.

Pair generators (MinHash-LSH, SimHash, Jaccard — ``operators/dedup.py``)
emit *edges*; turning edges into keep/drop decisions needs the transitive
closure: documents A-B and B-C similar ⇒ {A,B,C} are one duplicate cluster
with one representative. This module computes per-node cluster labels with
min-label propagation expressed as plain DataFrame joins:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to a fixed point. Each iteration is one shuffle-join + one
aggregation, both on short (id, label) rows; ``localCheckpoint`` truncates
the lineage so plans stay constant-size across iterations (the classic
iterative-Spark trap).

Scale notes (100 TB posture): each round combines one neighbor-min hop
with pointer jumping (label ← label(label)), so rounds scale with
O(log diameter), not diameter — a 128-node path closes in ≤10 rounds
(tests/test_llm_ops.py), and near-dup graphs (dense cliques-of-clusters,
2-4 hop diameters) close in ≤4. This matches the round complexity of the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — the propagation step IS
its small-star half, and the pointer jump plays large-star's
path-contraction role while keeping the per-round shape two joins. The
convergence check scans the already-materialized checkpoint of the new
labels (``isEmpty`` over cached partitions), not a recompute.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a_id",
    dst: str = "b_id",
    nodes: Optional[DataFrame] = None,
    max_iter: int = 25,
    iteration_log: Optional[list] = None,
    edges_distinct: bool = False,
    nodes_cover_edges: bool = False,
) -> DataFrame:
    """Per-node minimum-reachable-id labels for an undirected edge list.

    Returns ``(id, cluster_id)`` where ``cluster_id`` is the smallest node
    id in the component. ``nodes`` (single-column ``id``) optionally adds
    isolated vertices — e.g. every document, so singletons get their own
    cluster — otherwise only endpoint nodes are labeled.

    ``iteration_log`` (if given) receives one appended entry per completed
    propagation round — near-dup graphs should converge in ≤4 (clusters are
    near-cliques); more indicates a pathological chain graph where the
    large-star/small-star variant (module docstring) should take over.

    Min-label propagation is idempotent over duplicate edges (min over a
    multiset equals min over its support), so the edge/node dedup shuffles
    exist only to shrink the iterated relations — callers that already
    guarantee uniqueness should skip them:

    * ``edges_distinct=True``: skip the ``distinct`` on the symmetrized
      edge list (a full extra shuffle of the biggest relation in the job).
      Safe when the pair generator emits each undirected pair once, as
      LSH first-match-band / SimHash first-chunk emission do.
    * ``nodes_cover_edges=True``: ``nodes`` is a superset of every edge
      endpoint (e.g. the full corpus), so seed labels directly from it
      instead of union+distinct against the endpoint projection.
    """
    # Materialize the edge relation ONCE before symmetrizing: the union
    # used to sit under the checkpoint, so the (potentially expensive) pair
    # generator upstream — e.g. a 6M-candidate LSH self-join — was
    # evaluated twice, once per union branch. Checkpointing first makes the
    # swap a narrow projection over cached partitions (halved e2e closure
    # time at sf0.1, bench.py dedup_close_e2e).
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if not edges_distinct:
        sym = sym.distinct().localCheckpoint()
    if nodes is not None and nodes_cover_edges:
        labels = nodes.select(F.col(nodes.columns[0]).alias("id"))
    else:
        labels = sym.select(F.col("u").alias("id")).distinct()
        if nodes is not None:
            labels = labels.union(nodes.select(F.col(nodes.columns[0]).alias("id"))).distinct()
    labels = labels.select("id", F.col("id").alias("cluster_id")).localCheckpoint()

    for it in range(max_iter):
        # min label among each node's neighbors, joined against its own
        prop = (
            sym.join(labels, sym.v == labels.id)
            .groupBy("u")
            .agg(F.min("cluster_id").alias("nbr"))
        )
        stepped = labels.join(prop, labels.id == prop.u, "left").select(
            "id",
            F.least(F.col("cluster_id"), F.coalesce(F.col("nbr"), F.col("cluster_id"))).alias(
                "mid"
            ),
            F.col("cluster_id").alias("old"),
        )
        # Pointer jumping: label(v) ← min(label(v), label(label(v))). One
        # extra self-join on the SMALL (id, label) relation per round —
        # negligible next to the edge join — but it halves the remaining
        # propagation distance, so rounds drop from graph diameter to
        # O(log diameter). On a 6M-edge near-dup graph this cut the loop
        # from 6 rounds to 4 (measured, sf0.1 documents).
        ptr = stepped.select(F.col("id").alias("pid"), F.col("mid").alias("plabel"))
        merged = (
            stepped.join(ptr, stepped.mid == ptr.pid, "left")
            .select(
                "id",
                F.least(F.col("mid"), F.coalesce(F.col("plabel"), F.col("mid"))).alias(
                    "new_cluster_id"
                ),
                "old",
            )
            .localCheckpoint()  # materializes; truncates iteration lineage
        )
        changed = merged.filter(F.col("new_cluster_id") < F.col("old")).isEmpty()
        labels = merged.select("id", F.col("new_cluster_id").alias("cluster_id"))
        if iteration_log is not None:
            iteration_log.append(1)
        if changed:
            break
        # Edge CONTRACTION (the large-star path-compression half made
        # explicit): rewrite every edge through the labels just computed
        # and drop intra-cluster self-loops. Near-dup graphs are dense
        # cliques, so after round 1 almost every edge maps to a self-loop
        # and vanishes — later rounds scan hundreds of (label, label)
        # edges instead of the full multi-million-row relation, which is
        # what makes round cost DECREASE as components merge instead of
        # staying O(|E|) every round. Both mapping joins are plain
        # equi-joins (AQE broadcasts the label side while it is small; at
        # 100 TB they hash-partition like any big join), and the distinct
        # shrinks map-side before it shuffles. Correctness: contracted
        # endpoints are label ids, which ARE node ids present in
        # ``labels``, and pointer jumping forwards any later improvement
        # of a representative's label to its adoptees — same fixed point,
        # pinned by the path/clique equivalence tests.
        lu = labels.select(F.col("id").alias("__u"), F.col("cluster_id").alias("__lu"))
        lv = labels.select(F.col("id").alias("__v"), F.col("cluster_id").alias("__lv"))
        sym = (
            sym.join(lu, sym.u == lu.__u)
            .join(lv, sym.v == lv.__v)
            .filter(F.col("__lu") != F.col("__lv"))
            .select(F.col("__lu").alias("u"), F.col("__lv").alias("v"))
            .distinct()
            .localCheckpoint()
        )
    return labels


def dedup_clusters(
    pairs: DataFrame,
    all_docs: DataFrame,
    id_col: str = "doc_id",
    src: str = "a_id",
    dst: str = "b_id",
    iteration_log: Optional[list] = None,
) -> DataFrame:
    """Cluster assignment for every document given near-dup pairs: columns
    ``(doc_id, cluster_id, is_representative)``. The representative (the
    doc to keep) is the minimum id in the cluster; filtering on
    ``is_representative`` yields the deduplicated corpus.

    Skips both closure dedup shuffles (see :func:`connected_components`):
    the pair generators emit each undirected pair once, and ``all_docs``
    covers every endpoint by definition. Even if a caller hands in
    duplicated pairs the result is unchanged — min-label propagation is
    idempotent — only the per-round join does redundant work."""
    cc = connected_components(
        pairs,
        src=src,
        dst=dst,
        nodes=all_docs.select(F.col(id_col).alias("id")),
        iteration_log=iteration_log,
        edges_distinct=True,
        nodes_cover_edges=True,
    )
    return cc.select(
        F.col("id").alias(id_col),
        "cluster_id",
        (F.col("id") == F.col("cluster_id")).alias("is_representative"),
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    damping: float = 0.85,
    digits: int = 6,
) -> DataFrame:
    """Fixed-iteration PageRank as plain DataFrame joins — the iterative-
    algorithm pattern (link analysis over a web corpus' outlink graph).

    Each iteration is one join (ranks ⋈ edges on src, shuffle on the edge
    key) plus one partial-aggregated groupBy(dst); the rank relation stays
    (node, rank) — tiny next to the edge set, so at 100 TB the edges are
    bucketed/partitioned by ``src`` once and every iteration reuses that
    layout while only the small rank table moves. Dangling-node mass is
    dropped (standard simplification). Ranks are rounded only at the end;
    per-node in-degrees are small so double accumulation drift stays far
    below the rounding threshold.

    Columns: node, rank (rounded), in_deg.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # contribution weight per edge is fixed across iterations: 1/outdeg
    w = e.join(outdeg, "src").select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(iterations):
        contrib = (
            w.join(ranks, w.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("mass"), F.lit(0.0))).alias(
                    "rank"
                ),
            )
        )
    in_deg = e.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("in_deg"))
    return (
        ranks.join(in_deg, "node", "left")
        .select(
            "node",
            F.round("rank", digits).alias("rank"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over an undirected graph.

    Uses the degree-ordered orientation (node iterator of Schank & Wagner /
    the MapReduce formulation of Suri & Vassilvitskii, WWW'11): orient each
    edge from the (degree, id)-smaller endpoint to the larger, enumerate
    wedges only at each edge's SMALLER endpoint, and close them against the
    oriented edge set. Every triangle is counted exactly once, and — the
    100 TB point — wedge fan-out is bounded by out-degrees under the
    orientation, which are O(sqrt(m)) even for power-law hubs: a celebrity
    node of degree 10M generates no wedges because nearly all its edges
    point INTO it. Total work O(m^1.5) instead of sum(deg^2).

    All stages are equi-joins/aggregations on (int, int) rows.
    Columns: node, n_triangles.
    """
    oriented = orient_edges(edges, src, dst)
    # wedges at the common smaller endpoint; b<c dedups the wedge pair
    wedges = oriented_wedges(oriented)
    closing = oriented.select(
        F.least("a", "b").alias("w_b"), F.greatest("a", "b").alias("w_c")
    )
    tris = wedges.join(closing, ["w_b", "w_c"])
    nodes = (
        tris.select(F.col("w_a").alias("node"))
        .unionAll(tris.select(F.col("w_b").alias("node")))
        .unionAll(tris.select(F.col("w_c").alias("node")))
    )
    return nodes.groupBy("node").agg(F.count("*").alias("n_triangles"))


def oriented_wedges(oriented: DataFrame) -> DataFrame:
    """Wedge enumeration under the degree orientation — exposed separately
    so the skew guarantee is testable: a star hub of any size generates
    ZERO wedges (all its edges point INTO it), where naive per-node wedge
    counting would do sum(deg^2) work. Columns: w_a, w_b, w_c."""
    o1 = oriented.select(F.col("a").alias("w_a"), F.col("b").alias("w_b"))
    o2 = oriented.select(F.col("a").alias("w_a"), F.col("b").alias("w_c"))
    return o1.join(o2, "w_a").filter(F.col("w_b") < F.col("w_c"))


def orient_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Degree-ordered orientation of an undirected edge set (the first two
    stages of :func:`triangle_counts`, reusable for any wedge-bounded
    algorithm). Columns: a -> b with (deg(a), a) < (deg(b), b)."""
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n")).unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    withdeg = (
        und.join(deg.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
    )
    lt = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    return withdeg.select(
        F.when(lt, F.col("u")).otherwise(F.col("v")).alias("a"),
        F.when(lt, F.col("v")).otherwise(F.col("u")).alias("b"),
    )


def bfs_levels(
    edges: DataFrame,
    source_nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 4,
) -> DataFrame:
    """Multi-source BFS: each node's hop distance to the nearest source
    (min-plus iteration, the reachability/influence primitive next to
    connected components and PageRank).

    ``source_nodes`` has one ``node`` column (level 0). Each hop is one
    levels⋈edges join + a min groupBy — same shape as :func:`pagerank`:
    edges stay put (bucket once by ``src`` at scale), only the small
    (node, level) relation moves. Fixed ``max_hops`` keeps the plan static
    and the oracle expressible as unrolled CTEs; unreached nodes are
    absent from the output (no sentinel rows to carry).

    Columns: node, level.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    levels = source_nodes.select(F.col("node"), F.lit(0).cast("int").alias("level"))
    for _ in range(max_hops):
        hop = (
            e.join(levels, e.src == levels.node)
            .select(F.col("dst").alias("node"), (F.col("level") + 1).alias("level"))
        )
        levels = (
            levels.unionByName(hop)
            .groupBy("node")
            .agg(F.min("level").cast("int").alias("level"))
        )
    return levels
