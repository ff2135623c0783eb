"""Graph analytics, second wave: HITS hubs/authorities on the directed
trade graph, k-core decomposition by iterative peeling, and
common-neighbor link prediction (common neighbors / Jaccard /
Adamic-Adar) — the standard recommender-candidate generator.

Extension surface beyond the reference (which has no joins at all,
SURVEY.md §2.3); builds on the memoized co-purchase adjacency shared
with triangle counting / LPA / BFS (queries_graph.py).

Determinism: iterative double state is quantized to integer micro-units
every step (the q_embed_pca_power pattern) so cross-engine hashes are
bit-identical; Adamic-Adar folds integer-rounded 1/ln(deg) weights.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_graph import (
    _COPURCHASE_SQL,
    _copurchase_adj,
    _copurchase_edges,
)
from openmaptiles_zh_modifier_spark.registry import (
    load,
    local_frame,
    memo_frame,
    memo_frame_lazy,
    register,
)

# ---------------------------------------------------------------------------
# HITS hubs & authorities on the nation trade graph
# ---------------------------------------------------------------------------

HITS_ITERS = 4
HITS_SCALE = 1_000_000  # L1-normalized scores in integer micro-units

_TRADE_EDGE_SQL = """
edges AS (
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nodes AS (SELECT n_nationkey AS node, n_name FROM nation)
"""


def _hits_iter_sql(i: int) -> str:
    prev = f"hs{i - 1}"
    return f"""
raw{i} AS (
  SELECT ep.out AS node, ep.kind,
         SUM((CASE WHEN ep.kind = 'a' THEN p.h ELSE p.a END) * ep.w) AS r
  FROM ep JOIN {prev} p ON p.node = ep.key
  GROUP BY 1, 2
),
nrm{i} AS (
  SELECT node, kind,
         CAST(ROUND(r * {HITS_SCALE}.0 / SUM(r) OVER (PARTITION BY kind))
              AS BIGINT) AS v
  FROM raw{i}
),
hs{i} AS (
  SELECT n.node,
         COALESCE(MAX(CASE WHEN m.kind = 'a' THEN m.v END), 0) AS a,
         COALESCE(MAX(CASE WHEN m.kind = 'h' THEN m.v END), 0) AS h
  FROM nodes n LEFT JOIN nrm{i} m ON m.node = n.node
  GROUP BY n.node
)"""


@register(
    "q_hits_scores",
    oracle=f"""
WITH {_TRADE_EDGE_SQL},
ep AS (
  SELECT src AS key, dst AS out, w, 'a' AS kind FROM edges
  UNION ALL
  SELECT dst AS key, src AS out, w, 'h' AS kind FROM edges
),
hs0 AS (SELECT node, {HITS_SCALE} AS a, {HITS_SCALE} AS h FROM nodes),
{', '.join(_hits_iter_sql(i) for i in range(1, HITS_ITERS + 1))}
SELECT n.node AS nationkey, n.n_name AS nation,
       p.a AS auth_micro, p.h AS hub_micro,
       ROW_NUMBER() OVER (ORDER BY p.a DESC, n.node) AS auth_rk
FROM hs{HITS_ITERS} p JOIN nodes n USING (node)
ORDER BY auth_rk
""",
)
def q_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs & authorities over the directed trade graph
    (supplier nation -> customer nation, weight = lineitems shipped):
    {HITS_ITERS} synchronous Jacobi iterations — a(n) <- sum over
    in-edges of h_prev(src)*w and h(n) <- sum over out-edges of
    a_prev(dst)*w, both from the PREVIOUS state, L1-normalized per
    kind each round. (Jacobi rather than the textbook Gauss-Seidel
    half-steps: both are power iteration on the bipartite adjacency
    [[0,A],[A^T,0]] and share the fixed point; the Jacobi form lets
    one iteration reference the previous state exactly ONCE — the
    Gauss-Seidel form references the fresh authority frame twice per
    round, whose self-join dedup cloning goes exponential in rounds,
    measured: analysis never finishes at 4 rounds.) Hubs are exporter
    nations shipping to strong importers; authorities the converse.

    Determinism: scores live as integer micro-units; each round is one
    integer SUM aggregate (order-independent) followed by ONE double
    division against the exact integer L1 mass per kind, rounded back
    to BIGINT. L1 (not the textbook L2) normalization keeps the math
    sqrt-free so both engines agree bit-for-bit.

    Scale shape: the edge build is three dimension joins off the fact
    table into a 25x25 node space; each round is ONE join of the
    tagged two-direction edge list against the 25-row state, one
    combinable integer aggregate, a per-kind window renormalize, and a
    pivot back to wide — cost independent of corpus size once edges
    are built, the standard bulk-synchronous shape."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("node"), "n_name"
    )
    edges = memo_frame_lazy(
        spark,
        f"trade_edges:{sf_dir}",
        lambda: (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(c, o["o_custkey"] == c["c_custkey"])
            .join(s, li["l_suppkey"] == s["s_suppkey"])
            .groupBy(
                s["s_nationkey"].alias("src"), c["c_nationkey"].alias("dst")
            )
            .agg(F.count(F.lit(1)).alias("w"))
        ),
    )
    # the tagged two-direction edge list is <= 2*|edges| rows (1250 at
    # any SF — node space is the fixed 25 nations), so the whole
    # iteration chain runs in ONE partition: the corpus-sized work
    # already happened building `edges`, and 32-task scheduling on
    # 50-row stages otherwise dominates (the q_embed_pca_power lesson;
    # measured there 5.7 -> 2.2 s)
    ep = memo_frame_lazy(
        spark,
        f"trade_ep:{sf_dir}",
        lambda: edges.select(
            F.col("src").alias("key"),
            F.col("dst").alias("out"),
            "w",
            F.lit("a").alias("kind"),
        )
        .unionByName(
            edges.select(
                F.col("dst").alias("key"),
                F.col("src").alias("out"),
                "w",
                F.lit("h").alias("kind"),
            )
        )
        .coalesce(1),
    )
    # The iteration runs DRIVER-SIDE over the collected trade graph —
    # ep is <= 1250 rows and the node space the fixed 25 nations, both
    # BY CONSTRUCTION (the corpus-sized work is the memoized edge
    # build, which stays distributed). Four unrolled Spark rounds were
    # pure stage overhead on 50-row frames (~1.0 s warm; the
    # q_textrank_keywords / q_pagerank_nations treatment). Bit-exact by
    # the query's own design: each round is an INTEGER sum
    # (order-free), one double renormalize ROUND(r * 1e6 / sum_r)
    # replicated with Decimal HALF_UP on the identical double ops, and
    # integer state; the final rank window stays in Spark.
    from decimal import ROUND_HALF_UP, Decimal

    def _rhu(x: float) -> int:
        return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

    ep_rows = [(r.key, r.out, r.w, r.kind) for r in ep.collect()]
    node_ids = [r.node for r in nation.select("node").collect()]
    a_d = {n: HITS_SCALE for n in node_ids}
    h_d = {n: HITS_SCALE for n in node_ids}
    for _ in range(HITS_ITERS):
        raw: dict[tuple[int, str], int] = {}
        for key, out, w_, kind in ep_rows:
            inc = (h_d[key] if kind == "a" else a_d[key]) * w_
            raw[(out, kind)] = raw.get((out, kind), 0) + inc
        ksum = {"a": 0, "h": 0}
        for (_, kind), r_ in raw.items():
            ksum[kind] += r_
        a_d = {n: 0 for n in node_ids}
        h_d = {n: 0 for n in node_ids}
        for (out, kind), r_ in raw.items():
            # degenerate guard (ADVICE r13): an empty/zero-weight trade
            # graph keeps zeroed state, like the replaced Spark plan's
            # left join + coalesce did
            v = _rhu(r_ * float(HITS_SCALE) / ksum[kind]) if ksum[kind] else 0
            if kind == "a":
                a_d[out] = v
            else:
                h_d[out] = v
    state = local_frame(
        spark,
        sorted((n, a_d[n], h_d[n]) for n in node_ids),
        "node int, a long, h long",
    )
    w = Window.orderBy(F.desc("a"), F.asc("node"))
    return (
        state.join(nation, "node")
        .select(
            F.col("node").alias("nationkey"),
            F.col("n_name").alias("nation"),
            F.col("a").alias("auth_micro"),
            F.col("h").alias("hub_micro"),
            F.row_number().over(w).alias("auth_rk"),
        )
        .orderBy("auth_rk")
    )


# ---------------------------------------------------------------------------
# k-core decomposition by iterative peeling
# ---------------------------------------------------------------------------

KCORE_K = 3
KCORE_ITERS = 6


def _kcore_iter_sql(i: int) -> str:
    prev = f"adjs{i - 1}"
    return f"""
adjs{i} AS (
  SELECT node, nbr FROM (
    SELECT node, nbr,
           COUNT(*) OVER (PARTITION BY node) AS dn,
           COUNT(*) OVER (PARTITION BY nbr) AS dm
    FROM {prev}
  ) t WHERE dn >= {KCORE_K} AND dm >= {KCORE_K}
)"""


@register(
    "q_kcore",
    oracle=f"""
WITH {_COPURCHASE_SQL},
adjs0 AS (SELECT node, nbr FROM adj),
{', '.join(_kcore_iter_sql(i) for i in range(1, KCORE_ITERS + 1))},
counts AS (
  {' UNION ALL '.join(
      f"SELECT {i} AS iteration,"
      f" (SELECT COUNT(DISTINCT node) FROM adjs{i}) AS n_nodes"
      for i in range(KCORE_ITERS + 1)
  )}
)
SELECT iteration, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_nodes = LAG(n_nodes) OVER (ORDER BY iteration) AS INT)
         AS converged
FROM counts
ORDER BY iteration
""",
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core decomposition of the co-purchase graph by
    synchronous peeling: each round drops every node whose degree
    within the surviving subgraph is < {KCORE_K}, until the fixpoint —
    the standard subgraph-density primitive (community cores, spam/bot
    rings, the degeneracy ordering that makes triangle counting
    linear). Emits the peel trajectory (iteration, surviving nodes,
    converged flag) — the operational output a capacity planner reads.

    Determinism: pure integer counts; the converged flag is a LAG
    comparison on exact counts.

    Scale shape: the peel is formulated as an EDGE filter over the
    symmetric adjacency — both endpoint degrees come from two window
    counts on the same frame (the row count of a nbr-partition IS that
    neighbor's degree, by symmetry), so each round references the
    previous state exactly ONCE: plan depth stays linear in rounds
    (the node-set formulation needs two semi-joins per round, whose
    self-join subtree cloning goes exponential — measured: OOM at 6
    rounds), and execution is two hash-partition window counts, no
    joins. The surviving edge set shrinks monotonically; {KCORE_ITERS}
    unrolled rounds bound the plan (the fixture graph converges in
    far fewer). Production peels with a priority-bucket queue; the
    BSP formulation here is the one that distributes."""
    adjs = _copurchase_adj(spark, sf_dir)
    wn = Window.partitionBy("node")
    wm = Window.partitionBy("nbr")
    counts = [
        adjs.agg(F.countDistinct("node").alias("n_nodes")).select(
            F.lit(0).alias("iteration"), "n_nodes"
        )
    ]
    # Each round's survivor set is consumed TWICE — by the next round
    # and by its own census leg — so it needs a boundary for intra-query
    # CSE. Round 14 (VERDICT r13 #1 discipline): per-call
    # eager_checkpoint instead of a session-lifetime memo — a repeat
    # timed run rebuilds from the parquet inputs. EAGER, not lazy: the
    # census legs are independent of the next round, so inside one
    # action their stages run CONCURRENTLY and race a lazily-persisted
    # round into duplicate compute (measured warm at sf0.1: eager
    # 0.83 s, per-call cache 1.07 s, lazy_checkpoint 1.45-1.73 s).
    # Construction therefore runs the rounds eagerly — the documented
    # _CONVERGENCE_LOOPS exemption in tools/type_audit.py.
    from openmaptiles_zh_modifier_spark.operators.lineage import (
        eager_checkpoint,
    )

    for i in range(1, KCORE_ITERS + 1):
        adjs = eager_checkpoint(
            adjs.withColumn("dn", F.count(F.lit(1)).over(wn))
            .withColumn("dm", F.count(F.lit(1)).over(wm))
            .where((F.col("dn") >= KCORE_K) & (F.col("dm") >= KCORE_K))
            .select("node", "nbr")
        )
        counts.append(
            adjs.agg(F.countDistinct("node").alias("n_nodes")).select(
                F.lit(i).alias("iteration"), "n_nodes"
            )
        )
    trajectory = counts[0]
    for c in counts[1:]:
        trajectory = trajectory.unionByName(c)
    w = Window.orderBy("iteration")
    return (
        trajectory.withColumn(
            "converged",
            (F.col("n_nodes") == F.lag("n_nodes").over(w)).cast("int"),
        )
        .select(
            "iteration", F.col("n_nodes").cast("long").alias("n_nodes"),
            "converged",
        )
        .orderBy("iteration")
    )


# ---------------------------------------------------------------------------
# Link prediction: common neighbors / Jaccard / Adamic-Adar
# ---------------------------------------------------------------------------

LP_TOPK = 20
LP_DEG_CAP = 16  # wedges per middle vertex bounded by this fan-in


@register(
    "q_link_prediction",
    oracle=f"""
WITH {_COPURCHASE_SQL},
deg AS (SELECT node, COUNT(*) AS d FROM adj GROUP BY 1),
rk0 AS (
  SELECT node, nbr,
         ROW_NUMBER() OVER (PARTITION BY nbr ORDER BY node) AS r
  FROM adj
),
cadj AS (SELECT node, nbr FROM rk0 WHERE r <= {LP_DEG_CAP}),
cand AS (
  SELECT a.node AS u, b.node AS v,
         COUNT(*) AS cn,
         CAST(SUM(CAST(ROUND(1000000 / ln(dm.d)) AS BIGINT)) AS BIGINT)
           AS aa_micro
  FROM cadj a
  JOIN cadj b ON b.nbr = a.nbr AND a.node < b.node
  JOIN deg dm ON dm.node = a.nbr
  GROUP BY 1, 2
),
nonedge AS (
  SELECT c.* FROM cand c
  LEFT JOIN e ON e.pa = c.u AND e.pb = c.v
  WHERE e.pa IS NULL
),
scored AS (
  SELECT u, v, cn, aa_micro,
         ROUND(cn * 1.0 / (du.d + dv.d - cn), 4) AS jaccard
  FROM nonedge
  JOIN deg du ON du.node = u
  JOIN deg dv ON dv.node = v
)
SELECT u, v, CAST(cn AS BIGINT) AS common_nbrs, aa_micro, jaccard,
       ROW_NUMBER() OVER (ORDER BY aa_micro DESC, u, v) AS rk
FROM scored
ORDER BY rk
LIMIT {LP_TOPK}
""",
)
def q_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction over the co-purchase graph: for every
    NON-adjacent node pair at distance 2, score by common-neighbor
    count, Jaccard overlap, and Adamic-Adar (sum of 1/ln(deg) over the
    shared neighbors — rare shared neighbors weigh more); top
    {LP_TOPK} by Adamic-Adar. This is the candidate generator of
    collaborative-filtering recommenders and the classic
    missing-edge-inference baseline (Liben-Nowell & Kleinberg).

    Determinism: Adamic-Adar terms quantize to integer micro-units
    BEFORE the per-pair sum; Jaccard is an exact ratio of exact
    integer degrees; top-k tie-breaks on (u, v).

    Scale shape: one wedge self-join on the shared-neighbor key (the
    same middle-vertex explosion as triangle counting), DEGREE-CAPPED
    at the middle: each middle vertex contributes wedges from at most
    its {LP_DEG_CAP} smallest-id incident edges, bounding pair count
    by n * cap^2 regardless of hub size. The cap is load-bearing, not
    theoretical — the uncapped wedge join measured > 6 MINUTES on the
    3x-densified skew anchor (vs ~1 s at sf0.1); capped it stays flat.
    Hub middles are also the least informative (their 1/ln(deg) AA
    weight is smallest), so the cap drops the lowest-value wedges
    first — the standard candidate-generation trade, mirrored exactly
    in the oracle. Then one combinable (u, v) aggregate, an anti-join
    against the edge set, two broadcast degree lookups (TRUE degrees —
    score math is uncapped), and a TakeOrdered."""
    e = _copurchase_edges(spark, sf_dir)
    adj = _copurchase_adj(spark, sf_dir)
    deg = memo_frame_lazy(
        spark,
        f"lp_deg:{sf_dir}",
        lambda: adj.groupBy("node").agg(F.count(F.lit(1)).alias("d")),
    )
    wcap = Window.partitionBy("nbr").orderBy("node")
    cadj = memo_frame_lazy(
        spark,
        f"lp_cadj:{sf_dir}",
        lambda: (
            adj.withColumn("r", F.row_number().over(wcap))
            .where(F.col("r") <= LP_DEG_CAP)
            .select("node", "nbr")
        ),
    )
    a, b = cadj.alias("a"), cadj.alias("b")
    dm = deg.select(F.col("node").alias("mid"), F.col("d").alias("dmid"))
    cand = (
        a.join(
            b,
            (F.col("b.nbr") == F.col("a.nbr"))
            & (F.col("a.node") < F.col("b.node")),
        )
        .join(dm, F.col("mid") == F.col("a.nbr"))
        .groupBy(F.col("a.node").alias("u"), F.col("b.node").alias("v"))
        .agg(
            F.count(F.lit(1)).alias("cn"),
            F.sum(
                F.round(F.lit(1_000_000) / F.log(F.col("dmid"))).cast("long")
            ).alias("aa_micro"),
        )
    )
    nonedge = cand.join(
        e,
        (e["pa"] == cand["u"]) & (e["pb"] == cand["v"]),
        "left_anti",
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    scored = (
        nonedge.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            F.col("cn").cast("long").alias("common_nbrs"),
            "aa_micro",
            F.round(
                F.col("cn") * F.lit(1.0) / (F.col("du") + F.col("dv") - F.col("cn")),
                4,
            ).alias("jaccard"),
        )
    )
    w = Window.orderBy(F.desc("aa_micro"), F.asc("u"), F.asc("v"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .orderBy("rk")
        .limit(LP_TOPK)
    )


@register(
    "q_cc_star",
    oracle="""
WITH RECURSIVE
nodes0 AS (
  SELECT doc_id,
         doc_id - (doc_id % 32)
           + (doc_id * 2654435761) % 32 AS partner
  FROM documents WHERE doc_id % 4 <> 3
),
edges AS (
  SELECT doc_id AS a, partner AS b FROM nodes0 WHERE doc_id <> partner
),
und AS (
  SELECT a AS u, b AS v FROM edges
  UNION ALL SELECT b AS u, a AS v FROM edges
),
nodes AS (SELECT DISTINCT u AS node FROM und),
reach(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.node, u.v FROM reach r JOIN und u ON u.u = r.lab
),
comp AS (SELECT node, MIN(lab) AS component FROM reach GROUP BY node)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(node) AS BIGINT) AS sum_nodes
FROM comp
GROUP BY component
ORDER BY component
""",
)
def q_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by the LARGE-STAR/SMALL-STAR algorithm
    (Kiveris et al., SoCC'14) — algorithmic diversity for the one
    iterative primitive everything clustering-shaped reuses: unlike the
    pointer-jumping label loop (operators/graph.py
    connected_components), the star algorithm carries NO per-node label
    state between rounds — the edge set itself converges to component
    stars, so a skewed hot node is one reduce group per round, never a
    growing frontier. Fixture: block-local pseudo-random partner edges
    (each doc in a 32-id block links to a hashed partner in the SAME
    block, 75% of docs participate), giving thousands of bounded
    components whose recursive-CTE closure stays cheap at every scale.
    The oracle computes the same fixpoint declaratively; the hash match
    proves the alternating rewiring converges to exactly the
    reachability minima.

    Scale shape: each round is two grouped MIN aggregates + hash joins
    on the edge frame (combinable, skew-tolerant); rounds are
    O(log^2 n); per-round localCheckpoint truncates the iterative
    lineage like every loop in this repo."""
    from openmaptiles_zh_modifier_spark.operators.graph import (
        connected_components_star,
    )

    docs = load(spark, sf_dir, "documents").where(F.col("doc_id") % 4 != 3)
    edges = docs.select(
        F.col("doc_id").alias("a"),
        (
            F.col("doc_id")
            - (F.col("doc_id") % 32)
            + (F.col("doc_id") * 2654435761) % 32
        ).alias("b"),
    ).where(F.col("a") != F.col("b"))
    # Round 14 (VERDICT r13 #1): no finished-result memo — every
    # invocation re-runs the star fixpoint (its rounds already
    # eager_checkpoint internally), so timed runs measure the
    # computation.
    labels = connected_components_star(edges)
    return (
        labels.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("node").alias("sum_nodes"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction (round 13): weighted PageRank over the word
# co-occurrence graph, the unsupervised keyword baseline (Mihalcea &
# Tarau, EMNLP'04).

TR_VOCAB = 120   # node set: top-V corpus words (count DESC, word ASC)
TR_ITERS = 5
TR_DAMP = 0.85
TR_TOP = 20


def _tr_iter_sql(i: int) -> str:
    prev = f"tr{i - 1}"
    return f"""
tr{i} AS (
  SELECT n.w,
         (CAST(1 AS DOUBLE) - CAST({TR_DAMP} AS DOUBLE))
             / (SELECT nv FROM nvoc)
           + CAST({TR_DAMP} AS DOUBLE) * COALESCE(c.s, 0.0) AS r
  FROM vocab n LEFT JOIN (
    SELECT e.dst AS w,
           list_reduce(
             list_prepend(0.0::DOUBLE, list(p.r * e.w8 / e.ow ORDER BY e.src)),
             (acc, x) -> acc + x) AS s
    FROM e JOIN {prev} p ON p.w = e.src
    GROUP BY e.dst
  ) c USING (w)
)"""


@register(
    "q_textrank_keywords",
    oracle=f"""
WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
u AS (SELECT unnest(t) AS w FROM toks),
uc AS (SELECT w, COUNT(*) AS c FROM u GROUP BY 1),
vocab AS (
  SELECT w FROM uc ORDER BY c DESC, w LIMIT {TR_VOCAB}
),
nvoc AS (SELECT COUNT(*) AS nv FROM vocab),
bg AS (
  SELECT unnest(t[:len(t) - 1]) AS w1, unnest(t[2:]) AS w2 FROM toks
  WHERE len(t) >= 2
),
und AS (
  SELECT LEAST(w1, w2) AS u, GREATEST(w1, w2) AS v, COUNT(*) AS cw
  FROM bg
  WHERE w1 <> w2
    AND w1 IN (SELECT w FROM vocab) AND w2 IN (SELECT w FROM vocab)
  GROUP BY 1, 2
),
edges AS (
  SELECT u AS src, v AS dst, cw FROM und
  UNION ALL
  SELECT v AS src, u AS dst, cw FROM und
),
outw AS (SELECT src, SUM(cw) AS ow FROM edges GROUP BY src),
e AS (SELECT edges.src, dst, CAST(cw AS DOUBLE) AS w8, ow
      FROM edges JOIN outw USING (src)),
tr0 AS (SELECT w, CAST(1 AS DOUBLE) / (SELECT nv FROM nvoc) AS r
        FROM vocab),
{', '.join(_tr_iter_sql(i) for i in range(1, TR_ITERS + 1))}
SELECT w AS word, ROUND(r, 6) AS textrank,
       ROW_NUMBER() OVER (ORDER BY r DESC, w) AS rk
FROM tr{TR_ITERS}
ORDER BY rk
LIMIT {TR_TOP}
""",
)
def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau, EMNLP'04):
    weighted PageRank over the adjacent-token co-occurrence graph,
    restricted to the top-{TR_VOCAB} corpus words (count DESC, word ASC
    — a deterministic node set), damping {TR_DAMP}, {TR_ITERS} unrolled
    iterations. Reuses the engine's cross-engine PageRank determinism
    discipline verbatim (queries_graph.py): per-destination double
    contributions fold in EXPLICIT ascending-source order on BOTH
    engines (array_sort+aggregate vs list ORDER BY + list_reduce), and
    the data-dependent constants 1/N and (1-d)/N are the SAME division
    executed on the same integers, so every iteration is bit-identical
    and the only rounding is the final 6dp presentation.

    Scale shape: tokenize + bigram passes are map-side combinable
    aggregations (the same two corpus passes as q_pmi_cooccurrence);
    the iteration then lives entirely on the vocab-bounded graph
    (<= V^2 edges, Zipf-sparse in practice) — at 100 TB the corpus
    passes are the work and the graph is broadcast-sized. Dangling
    words inside the vocab keep the (1-d)/N floor, matching the
    oracle's LEFT JOIN."""
    docs = load(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("t")
    )
    toks = memo_frame_lazy(
        spark, f"textrank_toks:{sf_dir}", lambda: docs
    )
    u = toks.select(F.explode("t").alias("w"))
    uc = u.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    # One corpus unigram pass, collected (<= TR_VOCAB rows, bounded).
    # The vocab subtree is referenced by every iteration below; as a
    # lazy plan it re-entered the final plan ~7x (measured: 405-operator
    # plan, 306 Exchanges, one full corpus agg + top-V sort per
    # reference — 3.2 s warm). A 120-row local relation keeps results
    # bit-identical (same deterministic top-V) and collapses the plan
    # to the two real corpus passes (guide §2.4: remove shuffles
    # outright; §5: bounded driver collect).
    vocab_memo = memo_frame(
        spark,
        f"textrank_vocab:{sf_dir}",
        lambda: uc.orderBy(F.desc("c"), F.asc("w"))
        .limit(TR_VOCAB)
        .select("w"),
    )
    vocab_rows = vocab_memo.collect()
    vocab = local_frame(spark, vocab_rows, "w string")

    bg = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] AS w1, t[i] AS w2))"
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )
    v1 = vocab.select(F.col("w").alias("w1"))
    v2 = vocab.select(F.col("w").alias("w2"))
    und = (
        bg.where(F.col("w1") != F.col("w2"))
        .join(F.broadcast(v1), "w1")
        .join(F.broadcast(v2), "w2")
        .select(
            F.least("w1", "w2").alias("u"),
            F.greatest("w1", "w2").alias("v"),
        )
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    edges = und.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "cw"
    ).unionByName(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"), "cw")
    )
    outw = edges.groupBy("src").agg(F.sum("cw").alias("ow"))
    e = memo_frame(
        spark,
        f"textrank_edges:{sf_dir}",
        lambda: edges.join(outw, "src").select(
            "src", "dst", F.col("cw").cast("double").alias("w8"), "ow"
        ),
    )
    # nv is a tiny driver-side scalar: the SAME integer both engines
    # divide by (constants below are computed, not literals — N is
    # data-dependent; identical ops on identical ints are bit-stable)
    nv = len(vocab_rows)
    init = 1.0 / nv
    res = (1.0 - TR_DAMP) / nv

    # The fixpoint runs DRIVER-SIDE over the collected vocab-bounded edge
    # table (<= 2*C(V,2) = 14,280 rows at V=120 — bounded by
    # construction, not by data volume; guide §1.2 step 1: don't run
    # constant-size work through distributed machinery). The previous
    # 5 unrolled Spark iterations cost one ObjectHashAggregate shuffle +
    # two broadcast joins EACH on a 120-row frame — measured ~2.5 s of
    # pure stage/AQE overhead warm, vs <1 ms for the same arithmetic in
    # Python. Bit-exactness is preserved because the fold order is
    # reproduced literally: per dst, contributions accumulate in
    # ascending src order (the engine's array_sort(collect_list) order)
    # with the identical double ops r*w8/ow and res + DAMP*s; the final
    # ROUND + rank window stay in Spark so presentation semantics are
    # untouched. At 100 TB the two corpus passes above are the work;
    # this loop is on the broadcast-sized graph either way.
    edge_rows = sorted(
        ((r.dst, r.src, r.w8, r.ow) for r in e.collect())
    )
    ranks_d = {w: init for (w,) in vocab_rows}
    for _ in range(TR_ITERS):
        summed: dict[str, float] = {}
        for dst, src, w8, ow in edge_rows:
            summed[dst] = summed.get(dst, 0.0) + ranks_d[src] * w8 / ow
        ranks_d = {
            w: res + TR_DAMP * summed.get(w, 0.0) for w in ranks_d
        }
    ranks = local_frame(
        spark, sorted(ranks_d.items()), "w string, r double"
    )
    w_rk = Window.orderBy(F.desc("r"), F.asc("w"))
    return (
        ranks.select(
            F.col("w").alias("word"),
            F.round("r", 6).alias("textrank"),
            F.row_number().over(w_rk).alias("rk"),
        )
        .orderBy("rk")
        .limit(TR_TOP)
    )
