"""Graph centrality over DataFrame edge lists — the corpus-curation use is
domain/source authority ranking (CCNet/RefinedWeb-style: weight a web corpus
by the link authority of its origin), here exercised on the trade graph the
fixtures carry (customer ⇄ supplier volume).

The reference has no graph surface at all (its only keyed iteration is the
`mapWithState` partial-merge, JoinStreaming.scala:40); this module extends
the engine the same way `dedup.connected_components` does: an iterative
DataFrame loop with periodic eager `localCheckpoint` so the lineage never
compounds past analyzable depth (the diameter-8 stack-overflow lesson from
the components differential) without paying a materialization every round.

Engine-exactness: every floating-point step is either (a) a single IEEE-754
double expression written token-for-token the same in the DuckDB oracle
(`round(rank * w / out_w, dp)`), or (b) an EXACT decimal sum of those
pre-rounded contributions — so N-iteration ranks hash-match across engines.
`oracle_pagerank_sql` emits the matching unrolled-CTE SQL from the same
parameters, which keeps the two sides in lockstep by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bullet_spark_spark.operators._cache import persist_generation


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 5,
    damping: float = 0.85,
    teleport: float = 0.15,
    round_dp: int = 10,
    checkpoint_every: int = 1,
    broadcast_nodes_below: int = 2_000_000,
    checkpoint_final: bool = True,
) -> DataFrame:
    """Weighted PageRank over a directed edge list → (node, rank).

    Semantics: rank_{i+1}(v) = q(teleport/n + damping * Σ_{(u,v)}
    q(rank_i(u) * w(u,v) / out_w(u))), ranks initialized to q(1/n),
    where q(x) = floor(x·10^dp)/10^dp — FLOOR quantization, not round():
    Spark rounds the shortest decimal repr of a double while DuckDB
    rounds its binary value, so round() flips exact-tie digits between
    engines (surfaced at sf0.1: rank 0.000715137 vs ...136); floor of an
    IEEE product is bit-identical everywhere (the int8-quantization
    lesson). ``damping``/``teleport`` are two independent literals (not
    1-d) so the oracle can use the same decimal literals — 1-0.85 in
    IEEE is 0.15000000000000002, not 0.15.

    Dangling nodes (out-degree 0) contribute nothing — callers that need
    mass conservation should symmetrize the edge list (the trade-graph
    entry does), which also matches the undirected-authority reading.

    Scale shape: ``out_w`` is a window sum over the edge partitioning by
    ``src`` — ONE shuffle, reused by every iteration through the persisted
    normalized edge frame. Each iteration is one join of the rank frame
    (node-sized) against the edges (edge-sized), then the per-edge
    contribution terms UNIONED with a zero row per node through ONE
    groupBy(node) aggregate with map-side partial sums (the r11
    union-with-zeros shape — no second join, no per-iteration contribs
    broadcast; the zero row keeps dangling-inbound nodes in the result);
    every ``checkpoint_every`` rounds (and on the final round) the rank
    frame is eagerly localCheckpoint'ed — truncating the compounding
    lineage BEFORE it reaches the depth that overflows plan analysis
    (the connected-components diameter-8 lesson). The default is EVERY
    round: re-measured in r8 after the argmin/broadcast rewrites,
    chaining 5 iterations into one deep plan costs MORE in Catalyst
    analysis + codegen of the compounding join tree than the per-round
    materialization saves (sf0.1 trade graph: 4.8 s at cadence 1 vs
    7.9–16.9 s at cadence 6 — the r6 measurement that favored chaining
    predates the per-iteration plan getting two broadcast joins). The
    materialized frame is NODE-sized, not edge-sized, so at 100 TB of
    edges the per-round checkpoint is a rounding error against the
    iteration's edge shuffle; a barrier per round is inherent to the
    fixed point anyway. The only
    driver materialization is the node COUNT (one scalar). At 100 TB of
    edges the per-iteration cost is the rank join against the edge frame
    plus ONE aggregate exchange of the contribution terms — the
    canonical distributed-PageRank shape (Pregel/GraphX formulation
    expressed in DataFrames).
    """
    ecols = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).filter(
        # null endpoints dropped up front (ADVICE r11): the pre-r12
        # union-with-zeros aggregate would otherwise MERGE null-dst
        # contributions into a null node's group, where the old
        # nodes-LEFT-JOIN-contribs shape silently dropped them — pinning
        # the filter keeps the two shapes equivalent on any input (every
        # current caller already feeds non-null ids)
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    ).persist()
    nodes = (
        ecols.select(F.col("src").alias("node"))
        .unionByName(ecols.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = float(nodes.count())  # bounded: one scalar
    # checkpoint-backed rank frames are stat-less leaves (ExistingRDD
    # defaults to "huge"), so Catalyst would sort-merge every iteration's
    # joins; we KNOW the node count — broadcast rank-sized frames while
    # they fit (the million-node regime), shuffle-join beyond it (the
    # web-graph regime, where a rank broadcast cannot fit an executor).
    bcast = (lambda d: F.broadcast(d)) if n <= broadcast_nodes_below else (lambda d: d)
    if n <= broadcast_nodes_below:
        # out-weights as a hash aggregate (map-side partials, node-sized
        # output) broadcast back — the edge frame is never sorted or
        # shuffled; a window sum over 100 TB of edges pays a full
        # sort-based exchange for the same node-sized statistic
        out_w = ecols.groupBy("src").agg(F.sum("w").alias("out_w"))
        e_norm = ecols.join(F.broadcast(out_w), "src").persist()
    else:
        # large-node regime: one shuffle on src, reused by every iteration
        e_norm = ecols.withColumn(
            "out_w", F.sum("w").over(Window.partitionBy("src"))
        ).persist()

    scale = float(10 ** round_dp)

    def q(col):  # floor quantization: IEEE-identical in every engine
        return F.floor(col * F.lit(scale)) / F.lit(scale)

    ranks = nodes.withColumn(
        "rank", q(F.lit(1.0) / F.lit(n))
    ).localCheckpoint(eager=True)

    for it in range(iterations):
        # exact integer-unit terms, accumulated as LONGs (r11): each term
        # floor(rank·w/out_w·10^dp) ≤ rank·10^dp and the ranks sum to
        # ≤ ~1 by mass conservation, so a node's sum is ≤ ~10^dp ≪ 2⁶³
        # at ANY graph scale — the long sum equals the previous
        # decimal(28,0) accumulator digit-for-digit and avoids its
        # per-row widen/unscale (measured faster, bit-identical; HITS
        # keeps decimal — its weighted-degree bound is NOT mass-conserved)
        terms = e_norm.join(bcast(ranks), e_norm["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.floor(
                F.col("rank") * F.col("w") / F.col("out_w") * F.lit(scale)
            ).alias("__t"),
        )
        # union-with-zeros instead of nodes LEFT JOIN broadcast(contribs)
        # (r11 continuation, guide §2.4/§5): the zero row per node keeps
        # dangling-inbound nodes in the result through the SAME aggregate
        # (sum + 0 ≡ coalesce(sum, 0) — bit-identical), so one exchange
        # replaces the aggregate + a second broadcast build (a per-
        # iteration node-sized driver collect) + the join — the same
        # one-pass union-aggregate shape the BFS/Bellman-Ford hops moved
        # to earlier this round
        zeros = nodes.select("node", F.lit(0).cast("bigint").alias("__t"))
        ranks = (
            terms.unionByName(zeros)
            .groupBy("node")
            .agg(F.sum("__t").cast("double").alias("s"))
            .select(
                "node",
                q(
                    F.lit(teleport) / F.lit(n)
                    + F.lit(damping) * (F.col("s") / F.lit(scale))
                ).alias("rank"),
            )
        )
        if it == iterations - 1:
            # checkpoint_final=False leaves the last iteration's plan live so
            # tests can pin its shape (broadcast joins, exchange count) —
            # it must override the cadence too, or cadence 1 would
            # checkpoint the final round regardless
            if checkpoint_final:
                ranks = ranks.localCheckpoint(eager=True)
        elif (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=True)

    ecols.unpersist()
    e_norm.unpersist()
    nodes.unpersist()
    return ranks


def oracle_pagerank_sql(
    edges_cte: str,
    iterations: int = 5,
    damping: float = 0.85,
    teleport: float = 0.15,
    round_dp: int = 10,
    select: str = "SELECT node, rank FROM {last}",
) -> str:
    """Build the DuckDB oracle for :func:`pagerank`: the same fixed-point
    arithmetic unrolled as chained CTEs (standard SQL forbids aggregation
    in a recursive member, so fixed iteration count = fixed CTE chain).

    ``edges_cte`` must define a relation ``edges(src, dst, w)``; ``select``
    is the final projection with ``{last}`` substituted by the last rank CTE.
    """
    sc = float(10 ** round_dp)
    parts = [
        f"WITH {edges_cte}",
        """nodes AS (SELECT src AS node FROM edges
                     UNION SELECT dst FROM edges)""",
        "nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        """e AS (SELECT src, dst, w,
                        sum(w) OVER (PARTITION BY src) AS out_w FROM edges)""",
        f"""r0 AS (SELECT node,
                     floor(1.0 / (SELECT n FROM nn) * {sc}) / {sc} AS rank
                   FROM nodes)""",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
              SELECT nd.node,
                     floor(({teleport} / (SELECT n FROM nn)
                            + {damping} * (coalesce(c.s, 0.0) / {sc})) * {sc})
                       / {sc} AS rank
              FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum(CAST(floor(r.rank * e.w / e.out_w * {sc})
                                     AS DECIMAL(28,0))) AS DOUBLE) AS s
                FROM e JOIN r{i - 1} r ON e.src = r.node
                GROUP BY e.dst) c
              ON nd.node = c.node)"""
        )
    return ",\n".join(parts) + "\n" + select.format(last=f"r{iterations}")


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 5,
    round_dp: int = 10,
    checkpoint_every: int = 1,
    broadcast_nodes_below: int = 2_000_000,
    checkpoint_final: bool = True,
) -> DataFrame:
    """Kleinberg HITS over a weighted directed edge list → (node, hub,
    authority): the hub/authority decomposition PageRank flattens — in a
    corpus-curation setting, authorities are heavily-cited content
    domains, hubs are the aggregator/index pages that point at them
    (downweight hubs, keep authorities).

    Per iteration: authority(v) = Σ_{(u,v)} hub(u)·w, then hub(u) =
    Σ_{(u,v)} authority(v)·w, each MAX-normalized. Engine-exactness uses
    the pagerank conventions (same module): every product floor-quantizes
    to 10^-dp integer units summed as exact decimals; normalization
    divides by the exact MAX (selection, not arithmetic) and re-quantizes
    — so ``oracle_hits_sql`` reproduces the fixed point digit-for-digit.

    Scale shape mirrors :func:`pagerank`: node-sized score frames are
    BROADCAST into the edge joins below ``broadcast_nodes_below`` (the
    checkpoint leaves are stat-less; Catalyst would otherwise sort-merge
    every round), shuffle-join beyond; two groupBy shuffles of the edge
    frame per iteration (the dst-keyed and src-keyed partial sums);
    periodic eager localCheckpoint truncates the compounding lineage.
    """
    ecols = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), F.col(weight).alias("w")
    ).persist()
    nodes = (
        ecols.select(F.col("src").alias("node"))
        .unionByName(ecols.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # bounded: one scalar
    bcast = (lambda d: F.broadcast(d)) if n <= broadcast_nodes_below else (lambda d: d)
    scale = float(10 ** round_dp)

    def q(col):
        return F.floor(col * F.lit(scale)) / F.lit(scale)

    scores = nodes.select(
        "node", F.lit(1.0).alias("hub"), F.lit(1.0).alias("authority")
    ).localCheckpoint(eager=True)

    # The raw-score frames each feed TWO consumers (the max aggregate and
    # the normalized projection), so unlike pagerank's single-consumer
    # chain the logical plan TREE doubles per iteration — Catalyst
    # analysis goes exponential even when a cache would dedupe execution
    # (measured 2.7/6.1/45.6 s for 1/2/3 iterations with persist alone).
    # Eager localCheckpoint per iteration truncates the lineage: plan size
    # stays constant per round, and the materialized frame is node-sized
    # (cheap) — the HITS-specific variant of the connected-components
    # lineage lesson.
    # union-with-zeros instead of nodes LEFT JOIN broadcast(raw) (r11
    # continuation, the pagerank iteration shape): the zero row per node
    # rides the SAME aggregate (decimal sum + 0 ≡ coalesce(sum, 0),
    # bit-identical), removing per-iteration a second broadcast build —
    # a node-sized driver collect — and the join, twice per round here
    # (authority and hub halves). The decimal accumulator itself stays:
    # HITS's weighted-degree bound is NOT mass-conserved, so a long
    # could overflow on extreme in-degree × weight.
    for it in range(iterations):
        a_terms = (
            ecols.join(bcast(scores.select("node", "hub")), ecols["src"] == F.col("node"))
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("hub") * F.col("w") * F.lit(scale)).cast(
                    "decimal(28,0)"
                ).alias("__t"),
            )
        )
        a_zeros = nodes.select(
            "node", F.lit(0).cast("decimal(28,0)").alias("__t")
        )
        a_frame = (
            a_terms.unionByName(a_zeros)
            .groupBy("node")
            .agg(
                (F.sum("__t").cast("double") / F.lit(scale)).alias("a_raw")
            )
            .localCheckpoint(eager=True)
        )
        amax = a_frame.agg(F.max("a_raw").alias("m"))
        auth = (
            a_frame.crossJoin(F.broadcast(amax))
            .select(
                "node",
                F.when(F.col("m") > 0, q(F.col("a_raw") / F.col("m")))
                .otherwise(F.lit(0.0))
                .alias("authority"),
            )
        )
        h_terms = (
            ecols.join(bcast(auth), ecols["dst"] == auth["node"])
            .select(
                F.col("src").alias("node"),
                F.floor(F.col("authority") * F.col("w") * F.lit(scale)).cast(
                    "decimal(28,0)"
                ).alias("__t"),
            )
        )
        h_zeros = nodes.select(
            "node", F.lit(0).cast("decimal(28,0)").alias("__t")
        )
        h_frame = (
            h_terms.unionByName(h_zeros)
            .groupBy("node")
            .agg(
                (F.sum("__t").cast("double") / F.lit(scale)).alias("h_raw")
            )
            .localCheckpoint(eager=True)
        )
        hmax = h_frame.agg(F.max("h_raw").alias("m"))
        hub = (
            h_frame.crossJoin(F.broadcast(hmax))
            .select(
                "node",
                F.when(F.col("m") > 0, q(F.col("h_raw") / F.col("m")))
                .otherwise(F.lit(0.0))
                .alias("hub"),
            )
        )
        scores = hub.join(bcast(auth), "node").select("node", "hub", "authority")
        if it == iterations - 1:
            # same checkpoint_final override as pagerank (plan-pinning escape)
            if checkpoint_final:
                scores = scores.localCheckpoint(eager=True)
        elif (it + 1) % checkpoint_every == 0:
            scores = scores.localCheckpoint(eager=True)

    ecols.unpersist()
    nodes.unpersist()
    return scores


def triangle_counts(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient over
    an undirected simple graph → (node, degree, triangles, clustering).
    The corpus-curation read: triangle density separates genuinely
    interlinked communities (citation/source clusters worth keeping
    together) from star-shaped spam hubs whose degree looks identical —
    degree-only authority (pagerank/HITS above) can't tell them apart.

    Semantics: input edges are canonicalized to the undirected simple
    graph (self-loops dropped, duplicate/multi/reverse edges collapsed);
    degree counts distinct neighbors; ``triangles`` is the number of
    unordered triangles the node belongs to; ``clustering`` = 2T /
    (d·(d−1)) rounded 6 dp (0.0 when d < 2). Everything but the final
    ratio is exact integer arithmetic — hash-matchable by construction;
    the ratio is one IEEE expression written token-identically in SQL.

    Scale shape (Suri–Vassilvitskii / Cohen MapReduce triangle counting —
    public knowledge): every canonical edge is ORIENTED from its lower-
    (degree, node) endpoint to the higher, which caps every node's
    out-degree at O(√m) on any graph — so the wedge self-join on the
    oriented source (the only quadratic-looking step) fans out at most
    out-deg² = O(m^1.5) total wedges instead of Σ deg² (a single
    celebrity node would otherwise explode the join). Closure is ONE
    equi-semi-join of wedges against oriented edges on (v, w); per-node
    counts are one explode + hash aggregate. No driver materialization
    anywhere: two groupBys, three joins, all keyed — the plan survives a
    100× scale-up wherever the edge shuffle itself does.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ed = e.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    low_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ed.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(low_first, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    # one bounded cache generation per call site (ADVICE r9): the returned
    # frame is LAZY, so these must outlive the call — the NEXT call
    # releases them (see operators._cache)
    e, deg, oriented = persist_generation(
        "graph.triangle_counts", e, deg, oriented
    )
    o1 = oriented.select("u", F.col("v").alias("x"), F.col("dv").alias("dx"))
    o2 = oriented.select("u", F.col("v").alias("y"), F.col("dv").alias("dy"))
    # wedge (x, y) ordered by the SAME (degree, node) total order the
    # orientation used, so the closing edge can only exist as x -> y
    wedges = o1.join(o2, "u").filter(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"],
        "left_semi",
    ).select("u", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("u", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    out = (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            F.col("deg").cast("bigint").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("triangles"),
            F.when(
                F.col("deg") >= 2,
                F.round(
                    F.lit(2.0)
                    * F.coalesce(F.col("t"), F.lit(0)).cast("double")
                    / (F.col("deg").cast("double") * (F.col("deg") - F.lit(1))),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("clustering"),
        )
    )
    # no unpersist here: the returned frame is LAZY — dropping the cache
    # before the caller's action would force e/oriented to recompute per
    # consuming branch (ks_two_sample's persist-and-return precedent);
    # the persist_generation registry releases them on the NEXT call
    return out


def adamic_adar_pairs(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 10_000,
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected simple graph → one
    row per node pair sharing ≥1 neighbor: (node_a, node_b, n_common,
    score) with score = Σ_{z ∈ N(a)∩N(b)} 1/ln(deg(z)) (Adamic & Adar
    2003 — public knowledge). THE classical "which edges are missing"
    baseline: common neighbors weighted so that sharing a RARE neighbor
    counts for much more than sharing a hub everyone touches — for a
    curation pipeline, which sources/suppliers/domains are probably
    related even though no direct edge was observed.

    Semantics: input canonicalizes like :func:`triangle_counts`
    (self-loops dropped, duplicates/reverses collapsed); the pair (a<b)
    may or may not itself be an edge (callers anti-join the edge set
    when they only want NEW-link candidates). deg(z)=1 nodes have no
    pair through them (need ≥2 neighbors), so ln never sees 1.

    Engine-exactness: each 1/ln(deg) term is one IEEE expression
    floor-quantized to 10^-9 and summed as exact LONG numerators (r11,
    guide §2.3 narrower types): a term is ≤ floor(1/ln 2 · 10⁹) ≈
    1.44·10⁹ and a pair has n_common ≤ the degree cap, so the sum stays
    ≤ ~1.44·10¹³ ≪ 2⁶³ (even uncapped it needs >6·10⁹ common neighbors
    to overflow a long); the integer sum is the same the decimal(28,0)
    accumulator produced, and its double cast is the identical IEEE
    value — measured ~0.8 s faster at sf0.1, results bit-identical.
    n_common is exact integers.

    Scale shape: the wedge expansion through z is Σ_z deg(z)² — and
    UNLIKE triangle counting no orientation trick applies (Adamic–Adar
    needs every pair through z), so the hub cap IS the algorithm's
    scale bound: ``max_degree`` drops centers with more neighbors
    (their terms are the smallest anyway — 1/ln(10⁴) ≈ 0.109 — and a
    single 10⁶-degree hub alone would emit 5·10¹¹ wedges). The default
    is an ABSOLUTE cap, the posting-join df-cap lesson; pass None to
    disable where the degree distribution is known-bounded."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = e.select(F.col("a").alias("z"), F.col("b").alias("n")).unionByName(
        e.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    (adj,) = persist_generation("graph.adamic_adar_pairs", adj)
    deg = adj.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= int(max_degree))
    centers = adj.join(deg, "z")
    c1 = centers.select("z", F.col("n").alias("x"), "deg")
    c2 = centers.select("z", F.col("n").alias("y"))
    wedges = c1.join(c2, "z").filter(F.col("x") < F.col("y"))
    scale = 1e9
    return (
        wedges.groupBy(
            F.col("x").alias("node_a"), F.col("y").alias("node_b")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
            (
                F.sum(
                    F.floor(
                        F.lit(1.0) / F.log(F.col("deg").cast("double"))
                        * F.lit(scale)
                    ).cast("long")
                ).cast("double")
                / F.lit(scale)
            ).alias("__s"),
        )
        .select(
            "node_a",
            "node_b",
            "n_common",
            F.round(F.col("__s"), 6).alias("score"),
        )
    )


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    checkpoint_every: int = 1,
    broadcast_edges_below: int = 2_000_000,
) -> DataFrame:
    """The k-CORE of an undirected simple graph → (node, core_degree):
    the maximal subgraph in which every node keeps ≥ k neighbors
    (Seidman 1983, public knowledge) — the standard "dense backbone"
    extractor: spam rings and real communities survive coreness that
    star-shaped promotion graphs do not, and it is the cheap prefilter
    in front of triangle/AA-style wedge work (wedge cost Σdeg² drops to
    the core's).

    Algorithm: iterative PEELING — drop every node of degree < k,
    recompute degrees on the induced subgraph, repeat to fixpoint. Each
    round is one degree aggregate (map-side combinable, node-sized
    output) + two semi-joins of the edge frame against the surviving
    node set; the edge frame shrinks monotonically, so the fixpoint
    arrives in ≤ diameter-ish rounds in practice (``max_iterations``
    bounds the pathological chain). Per-round eager localCheckpoint
    truncates the compounding lineage (the pagerank discipline).
    Termination check is the round's edge count — a scalar the degree
    aggregate already produced.

    Rows-only by nature (iterative fixpoint; a recursive-CTE oracle
    cannot express "the LAST iteration's set" under UNION semantics) —
    certified instead by the SELF-VERIFYING law: every returned node has
    core_degree ≥ k computed within the returned set, and every dropped
    node fails it greedily (pinned in tests + the in-sweep assert)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()
    # Checkpoint-backed edge frames are stat-less leaves, so the per-round
    # semi-joins against the node-sized keep set would sort-merge; the
    # keep set is bounded by 2·|edges| and shrinks monotonically —
    # broadcast it while the (known) edge count fits, shuffle beyond
    # (the pagerank gate).
    bcast = (
        (lambda d: F.broadcast(d))
        if n_edges <= broadcast_edges_below
        else (lambda d: d)
    )
    converged = False
    for it in range(max_iterations):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("node")
        e2 = e.join(
            bcast(keep.select(F.col("node").alias("a"))), "a", "left_semi"
        ).join(bcast(keep.select(F.col("node").alias("b"))), "b", "left_semi")
        if checkpoint_every and (it % checkpoint_every == 0):
            e2 = e2.localCheckpoint(eager=True)
        n2 = e2.count()  # bounded: one scalar per round
        e = e2
        if n2 == n_edges:
            converged = True
            break
        n_edges = n2
    if not converged:
        # Returning the partially-peeled subgraph would violate the
        # documented invariant (every returned node has core_degree >= k
        # within the returned set) — a 2(max_iterations)-node path needs
        # ~len/2 rounds, so a silent fall-through here is a wrong answer,
        # not a degraded one.
        raise RuntimeError(
            f"kcore(k={k}) did not reach the peeling fixpoint within "
            f"max_iterations={max_iterations} (edge count still shrinking: "
            f"{n_edges} edges at the last round); raise max_iterations."
        )
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("core_degree"))
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
    checkpoint_every: int = 1,
    broadcast_nodes_below: int = 2_000_000,
) -> DataFrame:
    """FIXED-ROUND synchronous label propagation → (node, label): the
    community-detection member of the graph panel (Raghavan et al. 2007,
    public). Label⁰(v) = v; each round every node adopts the MOST
    FREQUENT label among its neighbors, ties broken by the SMALLEST
    label — the deterministic synchronous variant (async LPA's
    visit-order randomness is what makes the textbook algorithm
    non-reproducible; fixed rounds + min-label ties make this one
    hash-stable across engines AND expressible as chained non-recursive
    CTEs, so it carries a FULL oracle where an until-convergence loop
    could not name its last iteration).

    Scale shape per round: one edge⋈labels join (edge-sized, the same
    shuffle a pagerank round pays), one (node, label) count aggregate
    (map-side combinable), one per-node top-1 window over the node's
    DISTINCT NEIGHBOR LABELS — bounded by degree, shrinking with
    convergence, NOT the stream of neighbor rows. Per-round eager
    localCheckpoint truncates lineage (the pagerank discipline).
    Isolated nodes (none in an edge-list representation) and nodes
    whose neighbors are all themselves keep their label via the
    fallback coalesce."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    # Checkpoint-backed label frames are stat-less leaves, so Catalyst
    # would sort-merge the edge⋈labels join every round; the label frame
    # is NODE-sized by construction — broadcast it while the node count
    # fits (the pagerank gate), shuffle-join beyond it.
    n_nodes = labels.count()  # bounded: one scalar
    bcast = (
        (lambda d: F.broadcast(d))
        if n_nodes <= broadcast_nodes_below
        else (lambda d: d)
    )
    for it in range(rounds):
        nbr = sym.join(
            bcast(labels.select(F.col("node").alias("v"), "label")), "v"
        ).select(F.col("u").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        # top-1 per node as an aggregate: min(struct(-c, label)) orders
        # by count DESC then label ASC — exactly the former
        # row_number(desc(c), asc(label)) == 1 pick. Compiles to a
        # SortAggregate WITH a partial pass: the exchange carries one
        # candidate per node per map partition, where the window shipped
        # every (node, label, c) row and sorted it again post-shuffle.
        new = (
            cnt.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("label").alias("l")
                    )
                ).alias("t")
            )
            .select("node", F.col("t.l").alias("label"))
        )
        labels = new
        if checkpoint_every and (it % checkpoint_every == 0):
            labels = labels.localCheckpoint(eager=True)
    return labels


def oracle_lpa_sql(edges_cte: str, rounds: int, select: str) -> str:
    """DuckDB twin of :func:`label_propagation`: the fixed-round update
    unrolled as chained non-recursive CTEs from the same parameters —
    integer counts and min-label ties only, so the fixpoint prefix is
    engine-exact with no float protocol. ``edges_cte`` must define
    ``edges(src, dst)``; ``select`` reads the final ``l{rounds}(node,
    label)``."""
    parts = [
        edges_cte,
        """sym AS (
    SELECT src AS u, dst AS v FROM edges WHERE src <> dst
    UNION
    SELECT dst AS u, src AS v FROM edges WHERE src <> dst)""",
        """l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""c{r} AS (
    SELECT s.u AS node, l.label, count(*) AS c
    FROM sym s JOIN l{r - 1} l ON s.v = l.node
    GROUP BY 1, 2),
  l{r} AS (
    SELECT node, label FROM (
      SELECT node, label,
             row_number() OVER (PARTITION BY node
                                ORDER BY c DESC, label) AS rk
      FROM c{r})
    WHERE rk = 1)"""
        )
    return "WITH " + ",\n  ".join(parts) + "\n" + select


def oracle_adamic_adar_sql(
    edges_cte: str, select: str, max_degree: int | None = 10_000
) -> str:
    """DuckDB oracle for :func:`adamic_adar_pairs`. ``edges_cte`` must
    define ``edges(src, dst)``; ``select`` projects over ``{last}`` =
    pairs(node_a, node_b, n_common, score). ``max_degree=None`` emits
    an uncapped oracle, mirroring the engine's disable switch."""
    having = (
        f"\n               HAVING count(*) <= {int(max_degree)}"
        if max_degree is not None
        else ""
    )
    return f"""WITH {edges_cte},
       ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM edges
              WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       adj AS (SELECT a AS z, b AS n FROM ce
               UNION ALL SELECT b AS z, a AS n FROM ce),
       deg AS (SELECT z, count(*) AS deg FROM adj GROUP BY 1{having}),
       centers AS (SELECT adj.z, adj.n, deg.deg
                   FROM adj JOIN deg ON deg.z = adj.z),
       wedges AS (SELECT c1.z, c1.n AS x, c2.n AS y, c1.deg
                  FROM centers c1 JOIN centers c2 ON c1.z = c2.z
                  WHERE c1.n < c2.n),
       pairs AS (
         SELECT x AS node_a, y AS node_b,
                CAST(count(*) AS BIGINT) AS n_common,
                round(CAST(sum(CAST(floor(1.0 / ln(CAST(deg AS DOUBLE))
                                          * 1000000000.0)
                                    AS DECIMAL(28,0))) AS DOUBLE)
                      / 1000000000.0, 6) AS score
         FROM wedges GROUP BY 1, 2)
       {select.format(last="pairs")}"""


def oracle_triangle_sql(edges_cte: str, select: str) -> str:
    """DuckDB oracle for :func:`triangle_counts`: the same orient → wedge
    → close pipeline. ``edges_cte`` must define ``edges(src, dst)``;
    ``select`` is the final projection over ``{last}`` =
    panel(node, degree, triangles, clustering)."""
    return f"""WITH {edges_cte},
       ce AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM edges
              WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       deg AS (SELECT node, count(*) AS deg
               FROM (SELECT a AS node FROM ce UNION ALL SELECT b FROM ce)
               GROUP BY 1),
       ed AS (SELECT ce.a, ce.b, da.deg AS da, db.deg AS db
              FROM ce JOIN deg da ON da.node = ce.a
                      JOIN deg db ON db.node = ce.b),
       o AS (SELECT CASE WHEN da < db OR (da = db AND a < b)
                         THEN a ELSE b END AS u,
                    CASE WHEN da < db OR (da = db AND a < b)
                         THEN b ELSE a END AS v,
                    CASE WHEN da < db OR (da = db AND a < b)
                         THEN db ELSE da END AS dv
             FROM ed),
       tri AS (SELECT o1.u, o1.v AS x, o2.v AS y
               FROM o o1 JOIN o o2 ON o1.u = o2.u
                AND (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
               WHERE EXISTS (SELECT 1 FROM o oe
                             WHERE oe.u = o1.v AND oe.v = o2.v)),
       pn AS (SELECT node, count(*) AS t
              FROM (SELECT u AS node FROM tri
                    UNION ALL SELECT x FROM tri
                    UNION ALL SELECT y FROM tri)
              GROUP BY 1),
       panel AS (
         SELECT deg.node,
                CAST(deg.deg AS BIGINT) AS degree,
                CAST(coalesce(pn.t, 0) AS BIGINT) AS triangles,
                CASE WHEN deg.deg >= 2
                     THEN round(2.0 * CAST(coalesce(pn.t, 0) AS DOUBLE)
                                / (CAST(deg.deg AS DOUBLE) * (deg.deg - 1)), 6)
                     ELSE 0.0 END AS clustering
         FROM deg LEFT JOIN pn ON pn.node = deg.node)
       {select.format(last="panel")}"""


def oracle_hits_sql(
    edges_cte: str,
    iterations: int = 5,
    round_dp: int = 10,
    select: str = "SELECT node, hub, authority FROM {last}",
) -> str:
    """DuckDB oracle for :func:`hits`: the same fixed point unrolled as
    chained CTEs (see oracle_pagerank_sql). ``edges_cte`` must define
    ``edges(src, dst, w)``."""
    sc = float(10 ** round_dp)
    parts = [
        f"WITH {edges_cte}",
        """nodes AS MATERIALIZED (SELECT src AS node FROM edges
                     UNION SELECT dst FROM edges)""",
        "s0 AS MATERIALIZED (SELECT node, 1.0 AS hub, 1.0 AS authority FROM nodes)",
    ]
    for i in range(1, iterations + 1):
        p = i - 1
        parts.append(
            f"""ar{i} AS MATERIALIZED (
              SELECT nd.node, coalesce(c.s / {sc}, 0.0) AS a_raw
              FROM nodes nd LEFT JOIN (
                SELECT e.dst AS node,
                       CAST(sum(CAST(floor(s.hub * e.w * {sc}) AS DECIMAL(28,0)))
                            AS DOUBLE) AS s
                FROM edges e JOIN s{p} s ON e.src = s.node
                GROUP BY e.dst) c ON nd.node = c.node)"""
        )
        parts.append(
            f"""a{i} AS MATERIALIZED (
              SELECT node,
                     CASE WHEN (SELECT max(a_raw) FROM ar{i}) > 0
                          THEN floor(a_raw / (SELECT max(a_raw) FROM ar{i}) * {sc}) / {sc}
                          ELSE 0.0 END AS authority
              FROM ar{i})"""
        )
        parts.append(
            f"""hr{i} AS MATERIALIZED (
              SELECT nd.node, coalesce(c.s / {sc}, 0.0) AS h_raw
              FROM nodes nd LEFT JOIN (
                SELECT e.src AS node,
                       CAST(sum(CAST(floor(a.authority * e.w * {sc}) AS DECIMAL(28,0)))
                            AS DOUBLE) AS s
                FROM edges e JOIN a{i} a ON e.dst = a.node
                GROUP BY e.src) c ON nd.node = c.node)"""
        )
        parts.append(
            f"""s{i} AS MATERIALIZED (
              SELECT h.node,
                     CASE WHEN (SELECT max(h_raw) FROM hr{i}) > 0
                          THEN floor(h.h_raw / (SELECT max(h_raw) FROM hr{i}) * {sc}) / {sc}
                          ELSE 0.0 END AS hub,
                     a.authority
              FROM hr{i} h JOIN a{i} a ON a.node = h.node)"""
        )
    return ",\n".join(parts) + "\n" + select.format(last=f"s{iterations}")


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: (node, dist) = minimum hop count from any node in
    ``sources`` (dist 0), following directed ``edges(src, dst)``, out to
    ``max_hops``. The k-hop-neighborhood primitive behind seed-set corpus
    expansion (grow a trusted-domain crawl frontier outward from curated
    seeds, RefinedWeb/CCNet posture) and blast-radius queries ("every
    entity within 3 trades of this supplier"). Source nodes are reported
    at dist 0 whether or not they appear in the edge list — the semantics
    are "distance from the source SET", not "distance within the graph".

    Level-synchronous frontier expansion, the Pregel/GraphX BFS shape in
    DataFrames: each hop is ONE shuffle join of the current frontier
    (frontier-sized, never graph-sized) against the edge list, then an
    anti-join against the visited set so settled nodes never re-enter.
    Every new frontier is eagerly ``localCheckpoint``-ed — same lineage
    discipline as ``dedup.connected_components`` (iteration depth ≥ 8
    overflows the analyzer stack on compounding plans) — and the loop
    exits early on an empty frontier (one driver-side COUNT per hop, a
    scalar; the 100 TB cost per hop is the edge join, which shuffles
    edge-bytes not corpus-bytes). Integer-exact, so the DuckDB oracle
    (:func:`oracle_bfs_sql`, a recursive CTE) hash-matches with no
    rounding protocol.

    Reference has no graph surface (nearest keyed iteration:
    JoinStreaming.scala:40); extension per SURVEY §2.5.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    ecols = edges.select(F.col("src"), F.col("dst")).distinct().persist()
    visited = (
        sources.select(F.col("node").cast("string").alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = visited
    try:
        for hop in range(1, max_hops + 1):
            nxt = (
                frontier.join(ecols, frontier["node"] == ecols["src"])
                .select(F.col("dst").alias("node"))
                .withColumn("dist", F.lit(hop).cast("long"))
            )
            # One min-aggregate over visited ∪ frontier-expansion merges the
            # visited set, dedups the expansion AND identifies the fresh
            # frontier (dist == hop exactly for first-reached nodes, since
            # every visited node carries dist < hop): the former
            # distinct + anti-join + union (three exchanges, two eager
            # checkpoints per hop) collapses to one exchange and one
            # checkpoint. Settled nodes keep their min dist by construction.
            agg = (
                visited.unionByName(nxt)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint()  # eager: truncates per-hop lineage
            )
            fresh = agg.filter(F.col("dist") == hop)
            if fresh.count() == 0:  # driver scalar — the convergence probe
                break
            visited = agg
            frontier = fresh
    finally:
        ecols.unpersist()
    return visited


def oracle_bfs_sql(
    edges_cte: str,
    sources_cte: str,
    max_hops: int = 3,
    select: str = "SELECT node, dist FROM dists",
) -> str:
    """DuckDB oracle for :func:`bfs_distances`: a recursive CTE whose UNION
    (not UNION ALL) recursion dedups (node, dist) rows, bounded by the
    ``dist < max_hops`` guard; min(dist) per node is the BFS distance.
    ``edges_cte`` must define ``edges(src, dst)`` (extra columns fine);
    ``sources_cte`` must define ``srcs(node)``."""
    return f"""WITH RECURSIVE {edges_cte},
{sources_cte},
walk(node, dist) AS (
    SELECT node, 0 FROM srcs
    UNION
    SELECT e.dst, w.dist + 1
    FROM walk w JOIN edges e ON e.src = w.node
    WHERE w.dist < {max_hops}),
dists AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist
          FROM walk GROUP BY node)
{select}"""


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths (multi-source): (node, cost) =
    minimum total edge weight over any path of at most ``max_hops`` edges
    from the source set, following ``edges(src, dst, w)`` with
    non-negative integer weights. The Bellman-Ford relaxation,
    level-synchronous, with the DELTA optimization that keeps each
    round's join FRONTIER-sized: only nodes whose best cost IMPROVED
    last round re-relax their out-edges (an unimproved node cannot
    improve a neighbor this round — the standard worklist argument), so
    at 100 TB the per-hop shuffle is (improved nodes × their edges),
    never graph-sized. Costs are exact integer sums, so the DuckDB
    oracle (:func:`oracle_shortest_paths_sql`) hash-matches with no
    rounding protocol. Same lineage discipline as :func:`bfs_distances`
    (per-round localCheckpoint, empty-worklist early exit).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    ecols = (
        edges.select(
            F.col("src"), F.col("dst"), F.col("w").cast("long").alias("w")
        )
        .groupBy("src", "dst")
        .agg(F.min("w").alias("w"))  # parallel edges: keep the cheapest
        .persist()
    )
    best = (
        sources.select(F.col("node").cast("string").alias("node"))
        .distinct()
        .withColumn("cost", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    frontier = best
    try:
        for _hop in range(1, max_hops + 1):
            cand = (
                frontier.join(ecols, frontier["node"] == ecols["src"])
                .select(
                    F.col("dst").alias("node"),
                    (F.col("cost") + F.col("w")).alias("cost"),
                )
                .groupBy("node")
                .agg(F.min("cost").alias("cost"))
            )
            # One tagged union-aggregate yields the merged best table AND
            # the improved-worklist test: min over (best ∪ cand) is the new
            # best, min over the best-tagged rows alone recovers the prior
            # cost (each node appears at most once in best), and a node
            # improved iff it had no prior cost or the new min undercuts
            # it. Replaces the former merge-aggregate + left-join probe
            # (two exchanges + a join) and two eager checkpoints per hop
            # with one exchange and one checkpoint.
            agg = (
                best.select("node", "cost", F.lit(True).alias("__old"))
                .unionByName(
                    cand.select("node", "cost", F.lit(False).alias("__old"))
                )
                .groupBy("node")
                .agg(
                    F.min("cost").alias("cost"),
                    F.min(F.when(F.col("__old"), F.col("cost"))).alias(
                        "__oldcost"
                    ),
                )
                .localCheckpoint()
            )
            improved = agg.filter(
                F.col("__oldcost").isNull()
                | (F.col("cost") < F.col("__oldcost"))
            ).select("node", "cost")
            if improved.count() == 0:
                break
            best = agg.select("node", "cost")
            frontier = improved
    finally:
        ecols.unpersist()
    return best


def oracle_shortest_paths_sql(
    edges_cte: str,
    sources_cte: str,
    max_hops: int = 3,
    select: str = "SELECT node, cost FROM dists",
) -> str:
    """DuckDB oracle for :func:`shortest_paths`: recursive CTE carrying a
    hop counter so cyclic graphs terminate (rows bounded by nodes ×
    distinct (hops, cost) pairs under the hop cap); min(cost) per node is
    the answer. ``edges_cte`` must define ``edges(src, dst, w)``;
    ``sources_cte`` must define ``srcs(node)``."""
    return f"""WITH RECURSIVE {edges_cte},
{sources_cte},
ew AS (SELECT src, dst, CAST(min(w) AS BIGINT) AS w
       FROM edges GROUP BY src, dst),
walk(node, hops, cost) AS (
    SELECT node, 0, CAST(0 AS BIGINT) FROM srcs
    UNION
    SELECT e.dst, wk.hops + 1, wk.cost + e.w
    FROM walk wk JOIN ew e ON e.src = wk.node
    WHERE wk.hops < {max_hops}),
dists AS (SELECT node, min(cost) AS cost FROM walk GROUP BY node)
{select}"""
