"""Distributed connected components — pair lists → dedup clusters.

Every near-dup operator (MinHash/SimHash/embedding) emits PAIRS; the
keep/drop decision needs CLUSTERS (transitive closure: a~b, b~c ⇒
{a,b,c} share one survivor). This is min-label propagation:

    label(v) ← min(label(v), min over neighbors(label(u)))

iterated to fixpoint. Each iteration is one join + one groupBy on the
node key (no driver-side graph), so it scales to billions of edges;
iterations needed = graph diameter, and near-dup graphs are
shallow (chains of a few hops). Lineage is truncated per iteration
with localCheckpoint so 20 iterations don't build a 20-deep plan.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Iterative algorithm hit its iteration cap before fixpoint."""


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """(src, dst) pairs → (id, component) with component = the
    smallest node id reachable from ``id``. Deterministic; nodes
    include every id on either side of any edge.

    Label propagation needs ~diameter iterations; a high-diameter
    graph (a chain longer than ``max_iter``) would otherwise return
    SILENTLY SPLIT clusters. ``on_nonconverged`` controls the exit
    when labels are still changing at the cap: "raise" (default)
    aborts with ConvergenceError, "warn" returns the partial labels
    with a warning — never silent."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)  # sym feeds every round — cut
        # the (possibly expensive) pair-generation lineage once
    )
    # seed = least(id, min neighbor): exactly the result of round 1 of
    # identity-seeded propagation, computed as ONE aggregate without
    # the labels join — every run starts one round ahead
    labels = (
        sym.groupBy("b")
        .agg(F.min("a").alias("nmin"))
        .select(
            F.col("b").alias("id"),
            F.least(F.col("b"), F.col("nmin")).alias("component"),
        )
        .localCheckpoint(eager=False)
    )
    changed = 0
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.a == labels.id)
            .groupBy(F.col("b").alias("id2"))
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == F.col("id2"), "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
        )
        # LAZY checkpoint: the convergence count below is the action
        # that materializes it, so each round costs ONE Spark job
        # (eager=True would run a separate materialization job first)
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise "
            f"max_iter (graph diameter exceeds it)"
        )
        if on_nonconverged == "warn":
            warnings.warn(msg, RuntimeWarning, stacklevel=2)
        else:
            raise ConvergenceError(msg)
    return labels


def partitioned_components(
    edges: DataFrame,
    part_col: str,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Connected components of a graph whose EVERY edge lies inside
    one ``part_col`` block — the blocked-candidate shape every
    blocking-keyed ER/dedup pipeline produces (an edge exists only
    between rows sharing the block key, so components can never span
    blocks). Returns (id, component) with component = the smallest
    node id in the component, identical to ``connected_components``
    on the same edges.

    Because blocks are independent, the closure needs NO iteration:
    one shuffle groups each block's edges onto a task and a
    union-find runs per block in an Arrow batch — total cost one
    exchange + O(edges α(n)) work, versus ~diameter Spark jobs for
    label propagation. Use this whenever the edge generator was a
    block-keyed self-join; keep ``connected_components`` for pair
    lists that genuinely span arbitrary rows (MinHash/winnowing
    bucket pairs). Block sizes are bounded by the blocking-key design
    (the same invariant the candidate join already relies on), so a
    per-block batch always fits a task."""
    id_type = edges.schema[src].dataType.simpleString()
    out_schema = f"id {id_type}, component {id_type}"

    def uf(pdf):
        import pandas as pd

        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a, b in zip(pdf[src], pdf[dst]):
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by MIN id so the root IS the representative
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = list(parent)
        return pd.DataFrame(
            {"id": nodes, "component": [find(n) for n in nodes]}
        )

    return edges.groupBy(part_col).applyInPandas(uf, out_schema)


def dedup_clusters(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Pairs → (member, survivor): survivor = min id per component —
    the drop-list a dedup pipeline applies."""
    cc = connected_components(edges, src, dst, max_iter)
    return cc.select(
        F.col("id").alias("member"), F.col("component").alias("survivor")
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    undirected: bool = False,
    exact: bool = False,
) -> DataFrame:
    """Distributed PageRank over an edge list → (id, rank).

    Classic power iteration, expressed as one join + one aggregate
    per step (rank mass flows src→dst along out-edges; dangling nodes
    contribute only teleport mass). Every per-node sum is a hash
    aggregate on the node key — partial/map-side combined, no driver
    graph, no single-partition stage — so each iteration is exactly
    one shuffle of (node, contribution) pairs and the whole run is
    ``iterations`` shuffles regardless of graph size. Lineage is cut
    per iteration with localCheckpoint (an iterative plan would
    otherwise nest ``iterations`` joins deep and stall Catalyst).

    ``exact=True`` switches the per-iteration inflow sum to the
    repo's integer-sufficient-statistics recipe: each contribution
    quantizes to ``floor(c·1e12 + 0.5)`` (pure IEEE mult/add/floor —
    identical in every engine) and accumulates as an exact bigint,
    order-independent under any partitioning; one double division
    converts back. Ranks then replay bit-for-bit in any engine that
    unrolls the same iterations (the graph_pagerank DuckDB oracle) —
    at the cost of a ≤ 5e-13 per-contribution perturbation, far
    below PageRank's own iteration-truncation error.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if undirected:
        e = e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    e = e.distinct().localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("d").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    teleport = (1.0 - damping) / n
    c = F.col("rank") / F.col("deg")
    if exact:
        # integer sufficient statistics: floor(x·1e12 + 0.5) is pure
        # IEEE mult/add/floor — identical in every engine, unlike
        # round() (engines disagree on the multiply-round-divide vs
        # shortest-repr variants at 12th-digit boundaries). The sum
        # is then an exact bigint, order-independent.
        c = F.floor(c * F.lit(1e12) + F.lit(0.5))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.s == ranks.id)
            .join(out_deg, "s")
            .select(F.col("d").alias("id2"), c.alias("c"))
            .groupBy("id2")
            .agg(F.sum("c").alias("inflow"))
        )
        inflow = F.coalesce(F.col("inflow").cast("double"), F.lit(0.0))
        if exact:
            inflow = inflow / F.lit(1e12)
        ranks = (
            nodes.join(contribs, nodes.id == F.col("id2"), "left")
            .select(
                "id",
                (F.lit(teleport) + F.lit(damping) * inflow).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def triangle_count(edges: DataFrame, src: str = "u", dst: str = "v") -> DataFrame:
    """Exact triangle census of an undirected simple graph given as
    distinct edges with ``src < dst`` (one row per undirected edge).
    Returns a one-row frame (n_triangles BIGINT).

    The wedge join on a hub node touches deg² pairs — billions for a
    single celebrity node at scale. DEGREE ORIENTATION bounds it:
    direct each edge from its (degree, id)-smaller endpoint, making
    every out-degree O(√E), and enumerate each triangle exactly once
    via two oriented hops plus a closing equi-join. All joins are
    node-keyed equi-joins; nothing collects to the driver.

    The edge list materializes ONCE at entry and the oriented list
    ONCE before the wedge join (localCheckpoint, the same lineage cut
    every iterative operator here uses): without them Catalyst inlines
    the ``edges`` subtree into every reference — und 2×, the degree
    join 5×, orientation 10×, the three-way wedge join 30× — and a
    caller deriving edges from a fact table (q_triangle_count's
    co-purchase projection) shows 60 lineitem FileScans in one plan
    (r12 sweep). AQE's ReuseExchange deduplicates MOST of that at
    runtime (38 ReusedExchange nodes, so the measured sf0.1 win is
    modest: interleaved medians 9.3 → 8.6 s, identical census), but
    reuse is canonical-subtree-match best-effort — the r12 minhash
    audit showed column pruning silently defeating it — where the
    checkpoint is a guarantee, and it shrinks the executed DAG from
    360 Exchange nodes to 22 (driver planning cost at every scale).
    Both checkpoints hold exactly the algorithm's working set (E
    rows, two ids)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint(
        eager=True
    )
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    ej = e.join(deg.select("u", F.col("d").alias("du")), "u").join(
        deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v"
    )
    lt = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        ej.filter(lt)
        .select("u", "v")
        .unionByName(
            ej.filter(~lt).select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .localCheckpoint(eager=True)
    )
    e1, e2, e3 = oriented.alias("e1"), oriented.alias("e2"), oriented.alias("e3")
    tri = e1.join(e2, on=F.expr("e2.u = e1.v")).join(
        e3, on=F.expr("e3.u = e1.u AND e3.v = e2.v")
    )
    return tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


def label_propagation(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    iterations: int = 5,
) -> DataFrame:
    """Community detection by synchronous label propagation over an
    undirected graph (distinct edges, one row per pair). Returns
    (id, community).

    Deterministic variant: every node starts as its own label; each
    round it adopts the neighbor label with the highest count, ties
    broken by smallest label — so the result is a pure function of
    the graph, not of scheduling. Each round is one neighbor-keyed
    aggregation (map-side combinable) + a window argmax over
    (node, label) counts; labels localCheckpoint per round so lineage
    stays O(1). Communities capture dense clusters even where the
    whole graph is one connected component (which is where
    connected_components stops helping)."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        und.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("community", F.col("id"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql import Window

    for _ in range(iterations):
        # the node's CURRENT label gets one vote alongside its
        # neighbors' — without it, degree-1 pairs swap labels every
        # round and the result depends on the parity of `iterations`
        votes = und.join(labels, und.v == labels.id).select(
            F.col("u").alias("id2"), F.col("community")
        )
        own = labels.select(
            F.col("id").alias("id2"), F.col("community")
        )
        nbr = (
            votes.unionByName(own)
            .groupBy("id2", "community")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("id2").orderBy(
            F.col("n").desc(), F.col("community").asc()
        )
        best = (
            nbr.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("id2"), F.col("community").alias("new_comm"))
        )
        labels = (
            labels.join(best, labels.id == best.id2, "left")
            .select(
                "id",
                F.coalesce(F.col("new_comm"), F.col("community")).alias(
                    "community"
                ),
            )
            .localCheckpoint(eager=True)
        )
    return labels


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "u",
    dst: str = "v",
    max_iters: int = 30,
) -> DataFrame:
    """The k-core of an undirected graph: the maximal subgraph where
    every node keeps degree ≥ k — the standard "dense backbone"
    extractor (spam/bot rings in interaction graphs, the stable
    nucleus of a co-occurrence graph). Returns (id, degree) with each
    survivor's degree INSIDE the core.

    Iterative peel: drop all nodes of degree < k, recompute degrees
    on the induced subgraph, repeat to fixpoint (guaranteed: node
    count strictly decreases until stable, so iterations ≤ peel
    depth, far below node count in practice). Each round is one
    semi-join + one map-side-combinable degree count; the edge frame
    localCheckpoints per round so lineage stays O(1). Raises
    ConvergenceError at ``max_iters`` — a graph needing more rounds
    than that is a pathological chain and the caller should know."""
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = und.count()
    for _ in range(max_iters):
        if n_edges == 0:
            break
        deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("u")
        nxt = (
            und.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        n_next = nxt.count()
        if n_next == n_edges:
            return deg.filter(F.col("degree") >= k).select(
                F.col("u").alias("id"), "degree"
            )
        und, n_edges = nxt, n_next
    else:
        raise ConvergenceError(
            f"k-core peel did not stabilize in {max_iters} rounds"
        )
    # peeled to the empty graph: no k-core exists — derive the empty
    # frame's id type from the input so string/int node ids keep the
    # same schema as the populated path (unions downstream)
    return und.select(
        F.col("u").alias("id"), F.lit(0).cast("long").alias("degree")
    ).limit(0)
