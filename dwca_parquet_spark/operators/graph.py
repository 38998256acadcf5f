"""Link-graph importance scoring: PageRank on (src, dst) edge tables
(SURVEY §2 round-4 extension).

Web-curation pipelines weight documents by their host's link-graph
importance (the CommonCrawl-ranking signal; pairs with
text.extract_urls/registrable_domain, which produce exactly the
(doc → linked-domain) edges this consumes). Beyond connected components
(operators/dedup.py), this adds the ITERATIVE numeric graph family.

Determinism contract (the repo-wide rule, applied to an iterative float
algorithm): rank mass is DECIMAL(28,12) throughout — decimal sums are
order-free exact, and the one division per (node, iteration) is
explicitly quantized — so the final ranks are bit-identical across runs,
partitionings, and a driver-side Decimal reference (the pytest oracle
mirrors the arithmetic with Python's decimal module, HALF_UP like
Spark's).

Scale/shuffle shape per iteration: contributions explode along edges (a
projection over the edge table joined with current ranks — equi-join on
src, co-partitionable), then ONE map-side-combinable groupBy on dst.
Dangling mass (nodes without out-edges) is a 1-row aggregate broadcast
back — the textbook redistribution, kept exact in decimal. Iterations
are a fixed count (convergence-threshold loops need a collect per round;
fixed iters need none beyond the dangling scalar).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dwca_parquet_spark.cache import persist_tracked

# decimal(28,12), NOT (38,12): Spark derives division/multiplication
# result types from operand precisions and SHRINKS the scale when the
# derived precision exceeds 38 — a (38,12)/(20,0) division would come
# back at scale 6 and the subsequent cast would double-round, diverging
# from the single-quantize Python mirror. With (28,12) operands every
# intermediate fits in 38 digits at scale ≥ 12, so the one explicit cast
# is the ONLY rounding point — same as the reference's one quantize.
DEC = "decimal(28,12)"
Q12 = Decimal("0.000000000001")


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: str = "0.85",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank; returns (node, rank DECIMAL(28,12)),
    ranks summing to ~1 (exact up to the per-node quantization).
    ``damping`` is a STRING so it enters decimal arithmetic unrounded.
    Out-degrees are capped at decimal(8,0) (10^8 edges per node) by the
    precision budget above."""
    # damping at its NATURAL precision (3,2): a (28,12)×(28,12) product
    # would exceed 38 digits and trigger Spark's scale reduction; (3,2)×
    # (28,12) stays exact at (32,14), so the cast to DEC is the single
    # rounding point, mirroring the reference's one quantize.
    d = F.lit(damping).cast("decimal(3,2)")
    # nodes is referenced twice per iteration across all iterations —
    # checkpoint once so those references read a materialized table.
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # one scalar; fixes the teleport share
    if n_nodes == 0:  # empty edge table → empty ranks, not DivisionByZero
        return nodes.select("node", F.lit(None).cast(DEC).alias("rank"))
    init = (Decimal(1) / Decimal(n_nodes)).quantize(Q12, ROUND_HALF_UP)
    teleport_coef = (
        (Decimal(1) - Decimal(damping)) / Decimal(n_nodes)
    ).quantize(Q12, ROUND_HALF_UP)

    # out_deg feeds every iteration — persist it once (released by the
    # session owner via release_caches, the repo-wide cache lifecycle).
    out_deg = persist_tracked(
        edges.groupBy(src).agg(F.count(F.lit(1)).alias("_deg"))
    )
    ranks = nodes.select("node", F.lit(str(init)).cast(DEC).alias("rank"))

    for _ in range(iters):
        # Truncate lineage and materialize ONCE per round (the CC
        # discipline, operators/dedup.py:302-330): both references below —
        # the dangling-mass scalar action and the contributions join — read
        # this materialized table. Without it, iteration i's action replays
        # rounds 0..i-1 from source: O(iters²) executed work.
        ranks = ranks.localCheckpoint()
        with_deg = ranks.join(
            out_deg.select(F.col(src).alias("node"), "_deg"), "node", "left"
        )
        contribs = (
            with_deg.filter(F.col("_deg").isNotNull())
            .join(edges.select(F.col(src).alias("node"), F.col(dst)), "node")
            .select(
                F.col(dst).alias("node"),
                (F.col("rank") / F.col("_deg").cast("decimal(8,0)"))
                .cast(DEC)
                .alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").cast(DEC).alias("_in"))
        )
        # dangling nodes' mass redistributes uniformly — one exact scalar
        dangling = (
            with_deg.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit("0").cast(DEC)).cast(DEC))
            .first()[0]
        ) or Decimal(0)
        dang_share = (Decimal(dangling) / Decimal(n_nodes)).quantize(
            Q12, ROUND_HALF_UP
        )
        base = F.lit(str(teleport_coef)).cast(DEC) + (
            d * F.lit(str(dang_share)).cast(DEC)
        ).cast(DEC)
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    base
                    + (
                        d * F.coalesce(F.col("_in"), F.lit("0").cast(DEC))
                    ).cast(DEC)
                )
                .cast(DEC)
                .alias("rank"),
            )
        )
    # final checkpoint: the caller's first action replays zero iterations
    return ranks.localCheckpoint()


def pagerank_reference(
    edge_list: list[tuple[str, str]], iters: int = 5, damping: str = "0.85"
) -> dict[str, Decimal]:
    """Driver-side Decimal mirror of :func:`pagerank` — the differential
    oracle for the iterative arithmetic (same quantization points)."""
    nodes = sorted({s for s, _ in edge_list} | {t for _, t in edge_list})
    n = Decimal(len(nodes))
    d = Decimal(damping)
    out: dict[str, list[str]] = {}
    for s, t in edge_list:
        out.setdefault(s, []).append(t)
    ranks = {v: (Decimal(1) / n).quantize(Q12, ROUND_HALF_UP) for v in nodes}
    teleport = ((Decimal(1) - d) / n).quantize(Q12, ROUND_HALF_UP)
    for _ in range(iters):
        incoming = {v: Decimal(0) for v in nodes}
        dangling = Decimal(0)
        for v in nodes:
            if v in out:
                share = (ranks[v] / Decimal(len(out[v]))).quantize(
                    Q12, ROUND_HALF_UP
                )
                for t in out[v]:
                    incoming[t] += share
            else:
                dangling += ranks[v]
        dang_share = (dangling / n).quantize(Q12, ROUND_HALF_UP)
        base = teleport + (d * dang_share).quantize(Q12, ROUND_HALF_UP)
        ranks = {
            v: (base + (d * incoming[v]).quantize(Q12, ROUND_HALF_UP)).quantize(
                Q12, ROUND_HALF_UP
            )
            for v in nodes
        }
    return ranks


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Distinct undirected co-occurrence edges (u < v): items appearing in
    the same group. The graph-construction step for co-purchase /
    co-citation / shared-context analysis.

    Scale shape: per-group sorted item sets build in ONE combinable
    groupBy, the C(items, 2) ordered pairs expand IN-ROW (a transform/
    slice/flatten projection inside whole-stage codegen — no self-join,
    no shuffle of pair rows before they exist), then one distinct on the
    edge. Two shuffles total where the textbook self-join shape costs
    three (measured 2.5 → 1.7 s at sf0.1). Per-group fan-out is still
    C(items_in_group, 2); groups are typically small (an order's parts,
    a doc's hosts). A pathological hot group (celebrity key) would both
    square AND concentrate in one task's array — cap it upstream with a
    per-group item limit if the domain allows.
    """
    adj = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.sort_array(F.collect_set(item_col)).alias("_is")
    )
    pairs = adj.select(
        F.explode(
            F.expr(
                "flatten(transform(_is, (x, i) -> "
                "transform(slice(_is, i + 2, size(_is)), "
                "y -> struct(x AS u, y AS v))))"
            )
        ).alias("_p")
    ).select("_p.u", "_p.v")
    return pairs.distinct()


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact global triangle count over an undirected edge set stored as
    (u < v) pairs — the clustering/community-density census (SURVEY §2.G
    op 142).

    Scale shape — degree-ordered orientation (Cohen / Suri-Vassilvitskii
    MapReduce triangle counting): re-orient every edge from its
    lower-(degree, id) endpoint to the higher one, so each node's
    out-degree is bounded by O(sqrt(m)) on any graph (arboricity bound) —
    robust to the power-law hubs that make the naive (u<v-oriented)
    enumeration quadratic in the hub degree: a hub of degree d closes
    C(d,2) wedges naively but only C(out_deg,2) ≤ O(m) oriented.
    Counting is then the EDGE-ITERATOR form: per oriented edge u→v the
    closing triangles are |N⁺(u) ∩ N⁺(v)| — adjacency lists ride the two
    edge equi-joins as array payload and intersect inside whole-stage
    codegen, so the Σ out_deg² wedge set is never materialized or
    shuffled as rows (the first cut self-joined the oriented adjacency
    into wedge rows + a semi-join against the edge set; the intersect
    form deletes that 10⁷-row shuffle — SCALE.md round 9 carries the
    measurements, incl. the planted-hub sweep where this plan beats the
    naive canonical triple join 2.9 s vs 37.9 s).
    Every triangle {a,b,c} is counted exactly once: at the oriented edge
    between its two lowest-(deg,id) vertices, with the third as the
    common out-neighbor.

    Output: ONE row (n_edges, n_wedges, n_triangles, global_clustering) —
    global clustering = 3·triangles / wedges over the ORIGINAL graph
    (wedges = Σ_v C(deg_v, 2), reported from unoriented degrees).
    """
    e = persist_tracked(edges.select("u", "v").distinct())
    deg = (
        e.select(F.col("u").alias("n"))
        .unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # orient by (degree, id): lower endpoint -> higher endpoint
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    ed = e.join(du, "u").join(dv, "v")
    fwd = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = persist_tracked(
        ed.select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
    )
    adj = oriented.groupBy("s").agg(F.collect_list("t").alias("_nb"))
    with_a = oriented.join(adj, "s").select(
        F.col("t"), F.col("_nb").alias("_nb_u")
    )
    with_b = with_a.join(
        # INNER: a sink endpoint with no out-edges closes no wedge and
        # would only add a typed-empty-array corner to the intersect
        adj.select(F.col("s").alias("t"), F.col("_nb").alias("_nb_v")),
        "t",
    )
    n_tri = with_b.select(
        F.size(F.array_intersect(F.col("_nb_u"), F.col("_nb_v"))).alias("_c")
    ).groupBy().agg(
        # sum over an empty frame is NULL; a triangle-free graph is 0
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_triangles")
    )
    n_edges = e.groupBy().agg(F.count(F.lit(1)).alias("n_edges"))
    n_wedges = deg.groupBy().agg(
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges")
    )
    return (
        n_edges.crossJoin(n_wedges)
        .crossJoin(n_tri)
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                F.round(
                    F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
                ),
            ).alias("global_clustering"),
        )
    )
