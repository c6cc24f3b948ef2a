"""Iterative graph algorithms as join+aggregate rounds.

Beyond-reference operators: the reference has no graph surface; this
module hosts the iterative-algorithm family (connected components lives
with its dedup consumers in ``operators/dedup.py``; PageRank here).

Scale design (100 TB): one iteration = ONE |E|-linear equi-join plus a
hash aggregation on the destination key — the canonical distributed
PageRank shape; no adjacency matrices, no driver-side graph. Lineage is
truncated per round with ``localCheckpoint`` exactly like
``dedup.connected_components``, so 10 iterations cost 10 shuffles, not
an exponentially deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed-point scale for integer PageRank (1.0 == 10^12 units)
PAGERANK_UNIT = 10**12


def pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "n",
    iterations: int = 6,
    unit: int = PAGERANK_UNIT,
) -> DataFrame:
    """PageRank with damping 0.85 in EXACT integer fixed-point.

    Every quantity is a BIGINT multiple of ``1/unit`` and every division
    is integral floor division on positives, so the result is
    bit-identical across engines, partitionings, and summation orders —
    the property that lets a DuckDB oracle replay the full iteration
    unrolled (no float accumulation anywhere). The recurrence:

        r₀(v)    = unit // N
        contrib  = (r(u)·85) // (100·deg(u))        per edge u→v
        dangling = Σ_{deg(u)=0} (r(u)·85) // 100
        r'(v)    = (15·unit)//(100·N) + Σ contrib + dangling//N

    Floor-division remainders leak a few units per node per round
    (deterministically), which is irrelevant to ranking and the price of
    cross-engine exactness.

    ``edges`` is a directed (a, b) relation — pass both directions for an
    undirected graph. ``nodes`` must contain every vertex (isolated
    vertices are dangling mass). N is one bounded driver scalar (the
    watermark pattern).
    """
    deg = edges.groupBy("a").agg(F.count("*").alias("d"))
    n_nodes = nodes.count()
    base = (15 * unit) // (100 * n_nodes)
    node_ids = nodes.select(F.col(id_col).alias("n"))
    edges_d = edges.join(deg, "a").localCheckpoint(eager=True)
    # the dangling-node SET is loop-invariant — materialize it once so
    # each round's dangling-mass aggregate is a semi-join against a
    # checkpointed id list instead of re-deriving deg from the caller's
    # full edge pipeline every iteration
    dang_nodes = node_ids.join(
        deg, F.col("n") == F.col("a"), "left_anti"
    ).localCheckpoint(eager=True)

    r = node_ids.select(
        "n", F.lit(unit // n_nodes).cast("long").alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            r.join(edges_d, F.col("n") == F.col("a"))
            .select(
                F.col("b").alias("dst"),
                F.expr("(r * 85) div (100 * d)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        dang = r.join(dang_nodes, "n", "left_semi").agg(
            F.coalesce(F.sum(F.expr("(r * 85) div 100")), F.lit(0)).alias(
                "dang"
            )
        )
        r = (
            node_ids.join(contrib, F.col("n") == F.col("dst"), "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "n",
                (
                    F.lit(base)
                    + F.coalesce("c", F.lit(0))
                    + F.expr(f"dang div {n_nodes}")
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        r.join(deg, F.col("n") == F.col("a"), "left")
        .select(
            F.col("n").alias(id_col),
            F.coalesce("d", F.lit(0)).cast("long").alias("degree"),
            F.col("r").alias("rank_unit"),
        )
    )


def triangle_count(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Global triangle count over an undirected edge list, via the
    degree-ordered node-iterator (the standard distributed formulation:
    Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11).

    Each undirected edge is oriented from its lower-(degree, id)
    endpoint to the higher one, so every node's out-degree is bounded
    and the wedge relation (two out-edges sharing a source) has at most
    Σ_v d⁺(v)² rows with d⁺ ≤ O(√|E|) — the orientation is exactly what
    keeps a hot hub (a boilerplate near-dup cluster centre) from
    generating deg² wedges in one partition at 100 TB. A wedge
    (u→v, u→w) closes into a triangle iff the oriented edge v→w exists;
    with a consistent total order every triangle is counted exactly
    once, so the result is identical to the naive a<b<c enumeration the
    SQL oracle uses.

    Cost: two |E|-linear hash joins plus one wedge⋈edge join — all
    equi-joins on node keys, no cartesian anywhere.

    Returns a single row: (n_nodes, n_edges, n_triangles), all BIGINT.
    """
    # canonical undirected edge set (a < b), self-loops dropped.
    # localCheckpoint: the edge relation is referenced by SIX subtrees
    # below (degrees, orientation, both wedge sides, closure, counts) —
    # without truncation each subtree re-executes the caller's full
    # edge-producing pipeline (e.g. the LSH candidate build), measured
    # 16 s → 5 s at sf0.1. The relation is |pairs|-sized (∝ dup rate),
    # never corpus-sized, so materializing it is the cheap side.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("ea"),
            F.greatest(F.col(src), F.col(dst)).alias("eb"),
        )
        .filter(F.col("ea") < F.col("eb"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("ea").alias("n"))
        .union(e.select(F.col("eb").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("d"))
    )
    # orient toward the higher-(degree, id) endpoint
    with_deg = (
        e.join(deg.withColumnRenamed("n", "ea").withColumnRenamed("d", "da"), "ea")
        .join(deg.withColumnRenamed("n", "eb").withColumnRenamed("d", "db"), "eb")
    )
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("ea") < F.col("eb"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("ea")).otherwise(F.col("eb")).alias("u"),
        F.when(lower_first, F.col("eb")).otherwise(F.col("ea")).alias("v"),
        F.when(lower_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # wedges: two out-edges of u, deduped by the same (deg, id) order
    o1 = oriented.select(
        F.col("u"), F.col("v").alias("w1"), F.col("dv").alias("dw1")
    )
    o2 = oriented.select(
        F.col("u"), F.col("v").alias("w2"), F.col("dv").alias("dw2")
    )
    wedge_order = (F.col("dw1") < F.col("dw2")) | (
        (F.col("dw1") == F.col("dw2")) & (F.col("w1") < F.col("w2"))
    )
    wedges = o1.join(o2, "u").filter(wedge_order).select(
        F.col("w1").alias("u2"), F.col("w2").alias("v2")
    )
    # a wedge closes iff its (ordered) far pair is itself an oriented edge
    tri = wedges.join(
        oriented.select(F.col("u").alias("u2"), F.col("v").alias("v2")),
        ["u2", "v2"],
    ).agg(F.count("*").cast("long").alias("n_triangles"))
    n_edges = e.agg(F.count("*").cast("long").alias("n_edges"))
    n_nodes = deg.agg(F.count("*").cast("long").alias("n_nodes"))
    return (
        n_nodes.crossJoin(n_edges)
        .crossJoin(tri)
        .select("n_nodes", "n_edges", "n_triangles")
    )


def majority_label_propagation(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "n",
    iterations: int = 3,
) -> DataFrame:
    """Synchronous majority-label propagation (Raghavan et al. 2007) —
    community detection distinct from connected components: each round,
    every node adopts the label held by the MOST of its neighbors
    (tie-break: smallest label; isolated nodes keep their own), starting
    from label = node id. A fixed iteration count plus the deterministic
    tie-break makes every round a pure function of the edge set, so a
    SQL oracle can replay the iterations unrolled — no randomized
    update order (the usual LPA nondeterminism) anywhere.

    One iteration = one |E|-linear equi-join (neighbor labels) + two
    hash aggregations (label counts, per-node argmax via max-struct) —
    the same scale shape as the PageRank rounds; lineage truncated per
    round with localCheckpoint. The argmax is encoded as
    max(struct(count, -label)) so the whole round stays in map-side-
    combining aggregates — no per-node window sort.

    Returns (id_col, label) — final community assignment per node.
    """
    node_ids = nodes.select(F.col(id_col).alias("n")).distinct()
    e = edges.select(F.col("a"), F.col("b")).localCheckpoint(eager=True)
    labels = node_ids.select(
        "n", F.col("n").cast("long").alias("lbl")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        msgs = labels.join(e, F.col("n") == F.col("a")).select(
            F.col("b").alias("dst"), F.col("lbl")
        )
        counts = msgs.groupBy("dst", "lbl").agg(
            F.count("*").cast("long").alias("c")
        )
        # argmax by (count desc, label asc): max over (c, -lbl) structs
        pick = counts.groupBy("dst").agg(
            F.max(F.struct(F.col("c"), (-F.col("lbl")).alias("neg"))).alias(
                "s"
            )
        ).select(F.col("dst"), (-F.col("s.neg")).cast("long").alias("new_lbl"))
        labels = (
            labels.join(pick, F.col("n") == F.col("dst"), "left")
            .select(
                "n",
                F.coalesce("new_lbl", "lbl").cast("long").alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select(F.col("n").alias(id_col), F.col("lbl").alias("label"))


def connected_components_minlabel(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "n",
    max_iterations: int = 20,
    symmetrize: bool = True,
) -> DataFrame:
    """Connected components by min-label propagation with star
    shortcuts — the alternating-contraction family (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC 2014): each
    round every node adopts the minimum label among itself and its
    neighbors, and the label assignment itself is fed back as extra
    (node → label) star edges, so reach DOUBLES per round and
    convergence is O(log diameter) rounds instead of O(diameter) —
    the property that makes the operator viable on a 100 TB graph
    whose path diameter can be millions.

    Converges to label(v) = min node id in v's component — a pure
    function of the edge set, so a recursive-CTE oracle (min reachable
    id per node) replays it exactly. Iteration stops at the first
    round with zero label changes (checked with a single count
    aggregate per round); ``max_iterations`` bounds the loop — with
    doubling, 20 rounds cover diameter ~2^20.

    One round = one |E|-linear equi-join + one min-aggregation +
    one left join; lineage truncated per round with localCheckpoint
    (the iterative-plan-growth guard the PageRank/LPA rounds use).

    Labels propagate along STORED edge direction only (nbr_min
    aggregates over a→b), so the edge set must contain BOTH directions
    of every undirected edge or components fail to merge whenever the
    smaller id has no in-edge (edge 2→1 alone would leave node 2 in
    its own component). ``symmetrize=True`` (the default) unions the
    reversed edges internally — a one-time lineage step before the
    single checkpoint, NOT a per-round cost; pass ``symmetrize=False``
    only when the input is already symmetric (skips doubling the
    checkpointed edge relation).

    Returns (id_col, component) — component = min node id reachable.
    """
    node_ids = nodes.select(F.col(id_col).alias("n")).distinct()
    base = edges.select("a", "b")
    if symmetrize:
        base = base.unionByName(
            base.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    base = base.localCheckpoint(eager=True)
    # Size the loop's partitioning from the MATERIALIZED edge count
    # (one cheap job over the checkpointed relation, the watermark
    # pattern): the per-round joins/aggregates only need enough
    # partitions to hold ~2M edges each, and a 13-round loop over a
    # tiny graph otherwise pays 13 × (conf-many empty tasks + an AQE
    # wave per exchange) of pure scheduling overhead — measured 14.7 s
    # → 6.5 s at sf0.1 for modularity's 920-edge graph. On a real
    # cluster the same formula yields conf-many partitions and the
    # scoped setting is a no-op. Labels/base are narrowed with
    # coalesce (no recompute of the checkpointed RDDs).
    spark = base.sparkSession
    n_edges = base.count()
    par = int(spark.sparkContext.defaultParallelism)
    n_parts = max(1, min(par, n_edges // 2_000_000 + 1))
    if n_parts < base.rdd.getNumPartitions():
        base = base.coalesce(n_parts)
    # materialize the label seed BEFORE narrowing the shuffle conf: the
    # caller's node pipeline (often a distinct/aggregate over a large
    # relation) must run at full parallelism — only the per-round loop
    # joins, whose inputs are the two checkpointed relations, get the
    # size-derived partition count
    labels = node_ids.select(
        "n", F.col("n").cast("long").alias("lbl")
    ).localCheckpoint(eager=True)
    if n_parts < labels.rdd.getNumPartitions():
        labels = labels.coalesce(n_parts)
    old_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        return _minlabel_loop(base, labels, max_iterations, id_col)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_shuffle)


def _minlabel_loop(
    base: DataFrame,
    labels: DataFrame,
    max_iterations: int,
    id_col: str,
) -> DataFrame:
    for _ in range(max_iterations):
        # star shortcuts: every node reaches its current label's node
        # directly, both directions — this is what doubles reach/round
        stars = labels.filter(F.col("n") != F.col("lbl"))
        aug = base.unionByName(
            stars.select(F.col("n").alias("a"), F.col("lbl").alias("b"))
        ).unionByName(
            stars.select(F.col("lbl").alias("a"), F.col("n").alias("b"))
        )
        nbr_min = (
            labels.join(aug, F.col("n") == F.col("a"))
            .groupBy(F.col("b").alias("dst"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr_min, F.col("n") == F.col("dst"), "left")
            .select(
                "n",
                F.least(
                    F.col("lbl"), F.coalesce("nbr_lbl", F.col("lbl"))
                ).cast("long").alias("lbl"),
                (F.coalesce("nbr_lbl", F.col("lbl")) < F.col("lbl"))
                .cast("int")
                .alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = new_labels.agg(F.sum("changed")).first()[0] or 0
        labels = new_labels.drop("changed")
        if n_changed == 0:
            break
    return labels.select(
        F.col("n").alias(id_col), F.col("lbl").alias("component")
    )


def k_core(
    nodes: DataFrame,
    edges: DataFrame,
    k: int = 2,
    rounds: int = 4,
    id_col: str = "n",
) -> DataFrame:
    """k-core decomposition by synchronous peeling (Batagelj-Zaversnik
    family, round-unrolled): each round removes every node whose degree
    WITHIN the surviving subgraph is < k; the k-core is the fixpoint —
    the maximal subgraph where every member keeps ≥ k neighbors, the
    standard dense-region extractor (community seeds, spam-farm
    detection) that CC/LPA can't express (they never remove nodes).

    A FIXED round count keeps every round a pure function of the edge
    set, so a SQL oracle replays the peeling CTE by CTE (the LPA
    discipline); at fixture scale the fixpoint is reached well inside
    ``rounds`` — at 100 TB each round is one |E|-linear join + one
    count aggregation, and O(log) rounds suffice in practice because
    peeling cascades.

    Returns (id_col, core_degree) for members of the k-core after
    ``rounds`` peels, with their within-core degree.
    """
    e = edges.select("a", "b").localCheckpoint(eager=True)
    alive = nodes.select(F.col(id_col).alias("n")).distinct().localCheckpoint(
        eager=True
    )
    for _ in range(rounds):
        live_edges = (
            e.join(alive.withColumnRenamed("n", "a"), "a")
            .join(alive.withColumnRenamed("n", "b"), "b")
        )
        deg = live_edges.groupBy("a").agg(F.count("*").alias("d"))
        alive = (
            alive.join(deg, alive["n"] == deg["a"])
            .filter(F.col("d") >= k)
            .select("n")
            .localCheckpoint(eager=True)
        )
    final_edges = (
        e.join(alive.withColumnRenamed("n", "a"), "a")
        .join(alive.withColumnRenamed("n", "b"), "b")
    )
    return (
        final_edges.groupBy("a")
        .agg(F.count("*").cast("long").alias("core_degree"))
        .select(F.col("a").alias(id_col), "core_degree")
    )


def personalized_pagerank_integer(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    id_col: str = "n",
    iterations: int = 6,
    unit: int = PAGERANK_UNIT,
) -> DataFrame:
    """Personalized PageRank (random walk with restart) in the same
    EXACT integer fixed-point as ``pagerank_integer`` — the
    seed-relative importance measure behind 'related items' and
    graph-local expansion: teleport mass restarts at the SEED SET, not
    uniformly, so rank concentrates in the seeds' neighborhoods and
    nodes unreachable from any seed converge to exactly 0 (a property
    the integer arithmetic preserves bit-for-bit; float PPR leaks
    epsilon mass everywhere).

        r₀(v)    = [v ∈ S] · unit // |S|
        contrib  = (r(u)·85) // (100·deg(u))     per edge u→v
        dangling = Σ_{deg(u)=0} (r(u)·85) // 100
        r'(v)    = [v ∈ S]·((15·unit)//(100·|S|) + dangling//|S|)
                   + Σ contrib

    Same per-round shape and cost as pagerank_integer (one |E| join +
    aggregation + left join, lineage truncated per round); |S| is one
    bounded driver scalar. ``edges`` directed — pass both directions
    for an undirected graph.
    """
    deg = edges.groupBy("a").agg(F.count("*").alias("d"))
    n_seeds = seeds.count()
    if n_seeds == 0:
        raise ValueError("seeds must be non-empty")
    node_ids = nodes.select(F.col(id_col).alias("n"))
    seed_ids = seeds.select(F.col(id_col).alias("n")).withColumn(
        "is_seed", F.lit(1)
    )
    base = (15 * unit) // (100 * n_seeds)
    marked = node_ids.join(F.broadcast(seed_ids), "n", "left").select(
        "n", F.coalesce("is_seed", F.lit(0)).alias("is_seed")
    ).localCheckpoint(eager=True)
    edges_d = edges.join(deg, "a").localCheckpoint(eager=True)
    # loop-invariant dangling-node set, materialized once (see
    # pagerank_integer)
    dang_nodes = node_ids.join(
        deg, F.col("n") == F.col("a"), "left_anti"
    ).localCheckpoint(eager=True)

    r = marked.select(
        "n",
        (F.col("is_seed") * F.lit(unit // n_seeds)).cast("long").alias("r"),
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            r.join(edges_d, F.col("n") == F.col("a"))
            .select(
                F.col("b").alias("dst"),
                F.expr("(r * 85) div (100 * d)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        dang = r.join(dang_nodes, "n", "left_semi").agg(
            F.coalesce(F.sum(F.expr("(r * 85) div 100")), F.lit(0)).alias(
                "dang"
            )
        )
        r = (
            marked.join(contrib, F.col("n") == F.col("dst"), "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "n",
                (
                    F.col("is_seed")
                    * (F.lit(base) + F.expr(f"dang div {n_seeds}"))
                    + F.coalesce("c", F.lit(0))
                )
                .cast("long")
                .alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return r.select(F.col("n").alias(id_col), F.col("r").alias("rank_unit"))
