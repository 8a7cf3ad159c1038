"""Web-graph analytics for training-data pipelines: deterministic
link-graph construction and integer fixed-point PageRank.

A 100 TB web corpus needs host/page authority signals for quality
weighting and crawl prioritization.  The link graph here is
synthesized deterministically from the ``documents`` table (the
testdata carries no real hyperlinks) via the shared md5 hash — the
*mechanism* being exercised is the scale-relevant part: narrow edge
generation with the out-degree attached per row (no degree join), a
per-iteration shuffle on ``src``/``dst`` (the irreducible Pregel
shape), and all-integer fixed-point arithmetic so Spark and the DuckDB
oracle agree bit-for-bit (no float summation order to desync engines).

Scale shape (100 TB): edge generation is a zero-Exchange flat map
(out-degree computed from the same per-row array — never a groupBy);
each PageRank iteration is one shuffle join (edges ⋈ ranks on src) +
one partial-aggregated groupBy(dst) + one left join back to the node
set.  On a real cluster the edge table would be hash-partitioned by
``src`` once and reused across iterations (co-partitioned joins); here
the edges DataFrame is persisted across the three iterations.
Dangling nodes (out-degree 0 after self-loop removal) contribute no
mass — their rank leaks, which is the documented, deterministic
behavior both engines implement identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import DUCK_MD5I32, _ppm_exact, md5i32

PR_FANOUT = 3  # candidate out-links per page before self-loop removal
PR_ITERS = 3
PR_SCALE = 1_000_000_000_000  # rank fixed-point scale (10^12)
PR_D_NUM = 85  # damping d = 85/100
PR_D_DEN = 100
PR_BASE = (PR_D_DEN - PR_D_NUM) * PR_SCALE // PR_D_DEN  # (1-d)·scale


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _targets_expr(n_nodes):
    """Distinct non-self out-links of ``doc_id`` as a narrow array
    expression: dst_k = md5(doc_id ':' k) mod N for k in 1..FANOUT."""
    src = F.col("doc_id")
    cand = F.transform(
        F.sequence(F.lit(1), F.lit(PR_FANOUT)),
        lambda k: md5i32(F.concat(src.cast("string"), F.lit(":"), k.cast("string")))
        % n_nodes,
    )
    return F.filter(F.array_distinct(cand), lambda t: t != src)


def pagerank_iter(spark, sf_dir):
    """PR_ITERS rounds of integer fixed-point PageRank over the
    deterministic doc-id link graph.

    rank_0 = SCALE; rank_{t+1}(v) = BASE + (85 · Σ_{u→v} rank_t(u) DIV
    out_deg(u)) DIV 100 — every division is integer (Spark ``DIV`` ==
    DuckDB ``//`` for non-negative operands), so the result is exact
    and engine-independent.  N (the node count) enters the plan as a
    broadcast 1-row aggregate, never a driver-side ``.count()``."""
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    # deliberately NOT persisted: the subtree is a narrow md5 expansion
    # over the doc_id column alone (no text), so recomputing it once
    # per iteration is far cheaper than pinning an edge-table cache for
    # the rest of the session (an in-operator persist has no safe
    # unpersist point — the caller's action runs after we return)
    edges = withn.select(
        F.col("doc_id").alias("src"),
        F.explode(targets).alias("dst"),
        F.size(targets).alias("out_deg"),
    )
    ranks = d.select("doc_id", F.lit(PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(PR_ITERS):
        contrib = edges.join(ranks, edges.src == ranks.doc_id).select(
            "dst", F.expr("rank DIV out_deg").alias("c")
        )
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            d.join(insum, d.doc_id == insum.dst, "left")
            .select(
                "doc_id",
                (
                    F.lit(PR_BASE)
                    + F.expr(f"{PR_D_NUM} * coalesce(s, 0L) DIV {PR_D_DEN}")
                ).cast("bigint").alias("rank"),
            )
        )
    # witness column: out-degree recomputed as the same narrow array
    # expression (NOT a groupBy over edges — no extra shuffle)
    deg = withn.select("doc_id", F.size(targets).cast("int").alias("out_deg"))
    return ranks.join(deg, "doc_id").select("doc_id", "out_deg", "rank")


def _sql_targets() -> str:
    h = DUCK_MD5I32.format(x="doc_id || ':' || k")
    return (
        f"list_filter(list_distinct(list_transform(range(1, {PR_FANOUT} + 1), "
        f"k -> {h} % nn)), t -> t <> doc_id)"
    )


def _sql_rank_iter(prev: str, out: str) -> str:
    return f"""
c{out} AS (
  SELECT e.dst, sum({prev}.rank // e.out_deg) AS s
  FROM e JOIN {prev} ON e.src = {prev}.doc_id GROUP BY e.dst
),
r{out} AS (
  SELECT d.doc_id,
         CAST({PR_BASE} + ({PR_D_NUM} * coalesce(c{out}.s, 0)) // {PR_D_DEN}
              AS BIGINT) AS rank
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN c{out} ON d.doc_id = c{out}.dst
)"""


SQL_PAGERANK = f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst, len(ts) AS out_deg FROM t
),
r0 AS (
  SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS rank FROM documents
),{",".join(_sql_rank_iter(f"r{i}", str(i + 1)) for i in range(PR_ITERS))}
SELECT r.doc_id, CAST(coalesce(len(t.ts), 0) AS INT) AS out_deg, r.rank
FROM r{PR_ITERS} r LEFT JOIN t ON r.doc_id = t.doc_id
"""


# --------------------------------------------------------------------------
# hits_scores — HITS hubs & authorities (Kleinberg 1999), the OTHER
# classic authority signal next to PageRank: authorities are pages
# many good hubs point to, hubs are pages pointing to many good
# authorities.  Crawl stacks run both — PageRank for global quality
# weighting, HITS for topic-portal / link-directory detection (a page
# can be a top hub with zero authority, which PageRank cannot say).
# Same deterministic doc-id link graph as pagerank_iter (single-
# sourced through `_targets_expr` — the two signals can never be
# computed over different graphs).
#
# Arithmetic is exact integer fixed-point: each half-step MAX-
# normalizes the raw sums to ppm (score = raw·1e6 div max(raw), via
# the shared `_ppm_exact` quotient staging), so Spark and DuckDB agree
# bit-for-bit (no float power iteration to desync engines; max-norm
# replaces the classical L2 — sqrt would reopen the float trap — and
# is a sanctioned HITS variant).  Max-norm, NOT L1-to-1e6: L1 shares
# ppm granularity across the whole corpus, so beyond ~1e6 nodes every
# share floors to 0 and the signal vanishes — max-norm pins the top
# node at 1e6 and keeps per-node resolution independent of corpus
# size (the pagerank_iter per-node-scale principle).  Bigint headroom:
# scores ≤ 1e6, raw sums ≤ out_deg·1e6 ≤ 3e6, and the staging needs
# den·1000 < 2^63 — satisfied at any corpus size.
#
# Scale shape (10^12 edges): per half-step ONE shuffle join
# (edges ⋈ scores) + one map-side-combined groupBy + a 1-row
# broadcast total — the irreducible Pregel shape pagerank_iter
# documents; score tables stay sparse (zero-score nodes materialize
# only in the final left joins).  No window, no python.
# --------------------------------------------------------------------------

HITS_ITERS = 2
HITS_SCALE = 1_000_000  # max-norm ppm: top node = 1e6 each half-step


def _max_ppm(raw, key, val, out):
    """Max-normalize ``val`` over ``raw`` to ppm (top row → 1e6),
    exact-integer.  Max, not L1: per-node granularity must not shrink
    with corpus size (see module header)."""
    from .text_analysis import _ppm_exact

    tot = raw.agg(F.max(val).alias("_tot"))
    return raw.crossJoin(F.broadcast(tot)).select(
        F.col(key).alias("doc_id"),
        F.expr(_ppm_exact(val, "_tot", "div")).cast("bigint").alias(out),
    )


def hits_scores(spark, sf_dir):
    """HITS_ITERS rounds of integer L1-normalized HITS over the
    deterministic doc-id link graph.

    a_0 = SCALE; h_t(u) = norm(Σ_{u→v} a_t(v)); a_{t+1}(v) =
    norm(Σ_{u→v} h_t(u)) with norm(x) = x·1e6 div max(x) (exact staged
    division) — engine-independent, order-independent."""
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    # same narrow no-persist rationale as pagerank_iter above
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    )
    auth = d.select(
        "doc_id", F.lit(HITS_SCALE).cast("bigint").alias("a")
    )
    hub = None
    for _ in range(HITS_ITERS):
        h_raw = (
            edges.join(auth, edges.dst == auth.doc_id)
            .groupBy("src")
            .agg(F.sum("a").alias("hr"))
        )
        hub = _max_ppm(h_raw, "src", "hr", "h")
        a_raw = (
            edges.join(hub, edges.src == hub.doc_id)
            .groupBy("dst")
            .agg(F.sum("h").alias("ar"))
        )
        auth = _max_ppm(a_raw, "dst", "ar", "a")
    return (
        d.join(hub, "doc_id", "left")
        .join(auth, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("h", F.lit(0)).cast("bigint").alias("hub_ppm"),
            F.coalesce("a", F.lit(0)).cast("bigint").alias("auth_ppm"),
        )
    )


def _sql_hits_half(score_tbl, score_col, edge_key, group_key, out_tbl, out_col):
    """One HITS half-step as DuckDB CTEs: raw sum + max ppm norm."""
    from .text_analysis import _ppm_exact

    return f"""
{out_tbl}_raw AS (
  SELECT e.{group_key} AS doc_id, sum(s.{score_col}) AS raw
  FROM e JOIN {score_tbl} s ON e.{edge_key} = s.doc_id GROUP BY 1
),
{out_tbl} AS (
  SELECT doc_id,
         CAST({_ppm_exact('raw', '_tot', '//')} AS BIGINT) AS {out_col}
  FROM {out_tbl}_raw, (SELECT max(raw) AS _tot FROM {out_tbl}_raw)
)"""


def _sql_hits() -> str:
    parts = []
    prev_a = "a0"
    hub_tbl = None
    for i in range(1, HITS_ITERS + 1):
        parts.append(_sql_hits_half(prev_a, "a", "dst", "src", f"h{i}", "h"))
        parts.append(_sql_hits_half(f"h{i}", "h", "src", "dst", f"a{i}", "a"))
        prev_a = f"a{i}"
        hub_tbl = f"h{i}"
    steps = ",".join(parts)
    return f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst FROM t
),
a0 AS (
  SELECT doc_id, CAST({HITS_SCALE} AS BIGINT) AS a FROM documents
),{steps}
SELECT d.doc_id,
       CAST(coalesce(h.h, 0) AS BIGINT) AS hub_ppm,
       CAST(coalesce(a.a, 0) AS BIGINT) AS auth_ppm
FROM (SELECT doc_id FROM documents) d
LEFT JOIN {hub_tbl} h ON d.doc_id = h.doc_id
LEFT JOIN {prev_a} a ON d.doc_id = a.doc_id
"""


SQL_HITS = _sql_hits()


# --------------------------------------------------------------------------
# two_hop_reach — friend-of-friend expansion over the deterministic
# doc-id link graph: per node, how many NEW pages become reachable at
# exactly two hops (2-hop neighbors that are not the node itself and
# not already direct out-links).  Crawl scheduling uses this as the
# frontier-growth signal; recommenders as the candidate pool size.
# Same `_targets_expr` graph as pagerank/HITS — the three signals can
# never disagree about the edges.
#
# Scale shape (10^12 edges): the 2-hop expansion is edges ⋈ edges on
# (dst = src) — per-node fan-out bounded by out_deg² (≤ FANOUT² = 9
# here; real graphs cap the join's hot side the item_cooccurrence
# way), then a distinct (src, v) partial dedup, a LEFT ANTI join
# against the 1-hop set (the "not already a neighbor" subtraction),
# and one src-grain rollup.  Left joins keep zero-reach nodes.
# --------------------------------------------------------------------------


def two_hop_reach(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    )
    e2 = edges.select(F.col("src").alias("_mid"), F.col("dst").alias("v"))
    two = (
        edges.join(e2, edges.dst == e2._mid)
        .select("src", "v")
        .filter(F.col("v") != F.col("src"))
        .distinct()
    )
    fresh = two.join(
        edges.select(F.col("src"), F.col("dst").alias("v")),
        ["src", "v"],
        "left_anti",
    )
    deg1 = edges.groupBy("src").agg(
        F.count("*").cast("bigint").alias("n_1hop")
    )
    deg2 = fresh.groupBy("src").agg(
        F.count("*").cast("bigint").alias("n_2hop")
    )
    return (
        d.join(deg1, d.doc_id == deg1.src, "left")
        .drop("src")
        .join(deg2, d.doc_id == deg2.src, "left")
        .drop("src")
        .select(
            "doc_id",
            F.coalesce("n_1hop", F.lit(0).cast("bigint")).alias("n_1hop"),
            F.coalesce("n_2hop", F.lit(0).cast("bigint")).alias("n_2hop"),
        )
    )


SQL_TWO_HOP_REACH = f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst FROM t
),
two AS (
  SELECT DISTINCT e1.src, e2.dst AS v
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  WHERE e2.dst <> e1.src
),
fresh AS (
  SELECT two.src, two.v
  FROM two ANTI JOIN e ON two.src = e.src AND two.v = e.dst
),
deg1 AS (SELECT src, CAST(count(*) AS BIGINT) AS n_1hop FROM e GROUP BY 1),
deg2 AS (SELECT src, CAST(count(*) AS BIGINT) AS n_2hop FROM fresh GROUP BY 1)
SELECT d.doc_id,
       coalesce(deg1.n_1hop, 0) AS n_1hop,
       coalesce(deg2.n_2hop, 0) AS n_2hop
FROM (SELECT doc_id FROM documents) d
LEFT JOIN deg1 ON d.doc_id = deg1.src
LEFT JOIN deg2 ON d.doc_id = deg2.src
"""


# --------------------------------------------------------------------------
# triangle_count — per-node triangle counts over the undirected
# closure of the deterministic doc-id link graph (clustering-
# coefficient numerator: link farms show dense triangle cores, organic
# link neighborhoods are sparse — the third graph signal next to
# PageRank/HITS).  Algorithm = degree-ordered orientation (Suri &
# Vassilvitskii 2011, "Counting triangles and the curse of the last
# reducer"): orient every undirected edge from its lower (deg, id)
# endpoint to its higher, enumerate wedges only at each triangle's
# LOWEST-key apex, and close them against the oriented edge set.  The
# orientation is the scale mechanism: a celebrity node with 10^7
# undirected neighbors has oriented out-degree O(√m), so wedge fan-out
# is bounded per node and no reducer ever sees the celebrity's full
# neighborhood² — the naive wedge count dies exactly there.
#
# Orientation keys pack as okey(v) = deg(v)·10^9 + v (bigint-exact:
# needs deg < 9.2e9 and id < 10^9 — both documented headroom at any
# conceivable sf here).  Every join is an equi-join on node ids; the
# undirected-closure distinct and both degree rollups partial-
# aggregate map-side.  Triangles are found once (at the apex) and
# exploded ×3 to per-corner rows — bounded fan-out.  Zero-triangle
# nodes survive via the final left join.
# --------------------------------------------------------------------------

OKEY_SCALE = 1_000_000_000  # okey = deg * 1e9 + id (see headroom note)


def triangle_count(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    )
    # eager localCheckpoints on every multi-consumer relation (the
    # dist_drift rule): und feeds deg + the orientation join (2),
    # deg feeds both endpoint joins + the final output (3), oriented
    # feeds both wedge legs + the closure (3) — without the cuts the
    # shuffling distinct and the degree rollup replan from the raw
    # scan once per consumer (measured: 21 raw scans, 0 reuse)
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct().localCheckpoint()
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("bigint").alias("deg"))
        .localCheckpoint()
    )
    dega = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    degb = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    keyed = (
        und.join(dega, "a")
        .join(degb, "b")
        .select(
            "a", "b",
            (F.col("deg_a") * OKEY_SCALE + F.col("a")).alias("ka"),
            (F.col("deg_b") * OKEY_SCALE + F.col("b")).alias("kb"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b"))
        .alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a"))
        .alias("v"),
        F.least("ka", "kb").alias("ku"),
        F.greatest("ka", "kb").alias("kv"),
    ).localCheckpoint()
    o1 = oriented.select("u", "v", "kv")
    o2 = oriented.select(
        F.col("u").alias("u2"), F.col("v").alias("w"), F.col("kv").alias("kw")
    )
    wedges = (
        o1.join(o2, o1.u == o2.u2)
        .filter(F.col("kv") < F.col("kw"))
        .select("u", "v", "w")
    )
    closer = oriented.select(
        F.col("u").alias("v"), F.col("v").alias("w")
    )
    tris = wedges.join(closer, ["v", "w"])  # oriented v→w edge exists
    corners = tris.select(
        F.explode(F.array("u", "v", "w")).alias("doc_id")
    ).groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_tri"))
    degd = deg.select(F.col("v").alias("doc_id"), F.col("deg"))
    return (
        d.join(degd, "doc_id", "left")
        .join(corners, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("deg", F.lit(0).cast("bigint")).alias("deg"),
            F.coalesce("n_tri", F.lit(0).cast("bigint")).alias("n_tri"),
        )
    )


SQL_TRIANGLE_COUNT = f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst FROM t
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e
),
deg AS (
  SELECT v, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT unnest([a, b]) AS v FROM und) GROUP BY v
),
oriented AS (
  SELECT CASE WHEN ka < kb THEN a ELSE b END AS u,
         CASE WHEN ka < kb THEN b ELSE a END AS v,
         least(ka, kb) AS ku, greatest(ka, kb) AS kv
  FROM (SELECT und.a, und.b,
               da.deg * {OKEY_SCALE} + und.a AS ka,
               db.deg * {OKEY_SCALE} + und.b AS kb
        FROM und
        JOIN deg da ON da.v = und.a
        JOIN deg db ON db.v = und.b)
),
wedges AS (
  SELECT o1.u, o1.v, o2.v AS w
  FROM oriented o1 JOIN oriented o2 ON o1.u = o2.u
  WHERE o1.kv < o2.kv
),
tris AS (
  SELECT wedges.u, wedges.v, wedges.w
  FROM wedges JOIN oriented c ON c.u = wedges.v AND c.v = wedges.w
),
corners AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri
  FROM (SELECT unnest([u, v, w]) AS doc_id FROM tris) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(deg.deg, 0) AS deg,
       coalesce(corners.n_tri, 0) AS n_tri
FROM (SELECT doc_id FROM documents) d
LEFT JOIN deg ON d.doc_id = deg.v
LEFT JOIN corners ON d.doc_id = corners.doc_id
"""


# --------------------------------------------------------------------------
# community_lpa — label-propagation communities (Raghavan et al.
# 2007) over the undirected closure of the deterministic doc-id link
# graph: each node repeatedly adopts the label MOST FREQUENT among
# its neighbors (ties → smallest label).  Communities are the fourth
# graph signal: unlike connected components (dedup_components /
# cc_bigstar find everything reachable), LPA splits a connected graph
# into densely-linked regions — the mirror-site / link-farm
# neighborhood detector beside triangle_count's local density.
# Synchronous updates for a FIXED LPA_ROUNDS rounds (deterministic
# and oracle-mirrorable; classic LPA stops at convergence, and the
# docstring scopes that honestly).
#
# Scale shape (10^12 edges): each round is ONE shuffle join
# (edges ⋈ labels on the neighbor key) + one partial-aggregated
# (node, label) count + one partial-aggregable struct-max per node —
# the per-node winner is max(struct(cnt, -label)), constant-size
# aggregation state, NO window anywhere (a row_number per node would
# sort-shuffle the neighbor-label table every round).  The symmetric
# edge list is localCheckpointed once and reused by every round.
# Isolated nodes keep their own label via the final left join.
# --------------------------------------------------------------------------

LPA_ROUNDS = 3


def community_lpa(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    # one symmetric edge list, checkpointed: it feeds every round's
    # neighbor join (the dist_drift multi-consumer rule)
    sym = (
        und.select(F.col("a").alias("v"), F.col("b").alias("nbr"))
        .unionByName(
            und.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
        )
        .localCheckpoint()
    )
    labels = d.select("doc_id", F.col("doc_id").alias("lab"))
    for _ in range(LPA_ROUNDS):
        nl = sym.join(
            labels, sym.nbr == labels.doc_id
        ).select("v", "lab")
        cnts = nl.groupBy("v", "lab").agg(F.count("*").alias("cnt"))
        win = cnts.groupBy("v").agg(
            F.max(F.struct(F.col("cnt"), (-F.col("lab")).alias("nl")))
            .alias("best")
        )
        labels = (
            d.join(win, d.doc_id == win.v, "left")
            .select(
                "doc_id",
                F.coalesce(-F.col("best")["nl"], F.col("doc_id"))
                .alias("lab"),
            )
        )
    # eager localCheckpoint: the converged labels feed TWO consumers
    # (the sizes rollup and the output join) — without the cut the
    # whole 3-round LPA DAG executes once per branch (measured: 8 raw
    # scans, 0 reuse; the dist_drift rule)
    labels = labels.localCheckpoint()
    sizes = labels.groupBy("lab").agg(
        F.count("*").cast("bigint").alias("comm_size")
    )
    return (
        labels.join(sizes, "lab")
        .select("doc_id", F.col("lab").alias("community"), "comm_size")
    )


def _sql_lpa_round(prev: str, out: str) -> str:
    return f"""
c{out} AS (
  SELECT s.v, {prev}.lab, count(*) AS cnt
  FROM sym s JOIN {prev} ON s.nbr = {prev}.doc_id
  GROUP BY 1, 2
),
w{out} AS (
  SELECT v, lab,
         row_number() OVER (PARTITION BY v ORDER BY cnt DESC, lab) AS rk
  FROM c{out}
),
{out} AS (
  SELECT d.doc_id, coalesce(w{out}.lab, d.doc_id) AS lab
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN w{out} ON d.doc_id = w{out}.v AND w{out}.rk = 1
)"""


SQL_COMMUNITY_LPA = f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst FROM t
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e
),
sym AS (
  SELECT a AS v, b AS nbr FROM und
  UNION ALL
  SELECT b AS v, a AS nbr FROM und
),
l0 AS (
  SELECT doc_id, doc_id AS lab FROM documents
),{",".join(_sql_lpa_round(f"l{i}", f"l{i + 1}") for i in range(LPA_ROUNDS))},
sizes AS (
  SELECT lab, CAST(count(*) AS BIGINT) AS comm_size
  FROM l{LPA_ROUNDS} GROUP BY 1
)
SELECT l.doc_id, l.lab AS community, sizes.comm_size
FROM l{LPA_ROUNDS} l JOIN sizes ON l.lab = sizes.lab
"""


# --------------------------------------------------------------------------
# bfs_landmarks — multi-source BFS hop distances (landmark/ANF-style
# distance sketching, Palmer et al. 2002): per node, the minimum hop
# count to ANY of BFS_N_SEEDS seed pages within BFS_ROUNDS hops
# (unreached → −1).  The crawl-coverage / influence-radius relation:
# "how much of the graph is within k hops of the seed list" is the
# first question a frontier plan answers, and landmark distances are
# the standard approximation for point-to-point distance queries at
# 10^10-node scale (exact APSP is impossible).
#
# This is the THIRD propagation semiring in the graph family — MIN-
# PLUS (shortest path), beside pagerank/HITS' sum-times and LPA's
# mode — on the same single-sourced `_targets_expr` edges.  Each
# round is one shuffle join (sym ⋈ frontier) + one partial-aggregable
# min per node + a min-merge with the previous distances; the
# symmetric edge list is checkpointed once for all rounds, distances
# stay one row per REACHED node (sparse) until the final left join.
# --------------------------------------------------------------------------

BFS_N_SEEDS = 4  # landmarks = doc_ids 0..3
BFS_ROUNDS = 3


def _sym_edges(spark, sf_dir):
    """The checkpointed symmetric (v, nbr) edge relation of the
    deterministic doc-id link graph — shared by bfs_landmarks and
    harmonic_centrality (and mirrored once as DUCK_SYM_CTES) so every
    traversal op walks the SAME graph."""
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    return (
        und.select(F.col("a").alias("v"), F.col("b").alias("nbr"))
        .unionByName(
            und.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
        )
        .localCheckpoint()
    )


DUCK_SYM_CTES = f"""n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst FROM t
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e
),
sym AS (
  SELECT a AS v, b AS nbr FROM und
  UNION ALL
  SELECT b AS v, a AS nbr FROM und
)"""


def bfs_landmarks(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    sym = _sym_edges(spark, sf_dir)
    dist = d.filter(F.col("doc_id") < BFS_N_SEEDS).select(
        "doc_id", F.lit(0).cast("int").alias("dist")
    )
    for i in range(BFS_ROUNDS):
        cand = (
            sym.join(dist, sym.nbr == dist.doc_id)
            .select("v", (F.col("dist") + 1).alias("nd"))
            .groupBy("v")
            .agg(F.min("nd").alias("nd"))
        )
        dist = (
            dist.select(F.col("doc_id").alias("v"), "dist")
            .join(cand, "v", "full_outer")
            .select(
                F.col("v").alias("doc_id"),
                F.least(
                    F.coalesce("dist", F.lit(BFS_ROUNDS + 1)),
                    F.coalesce("nd", F.lit(BFS_ROUNDS + 1)),
                ).cast("int").alias("dist"),
            )
        )
        # between-round materialization: the state feeds cand AND the
        # outer join, so an unmaterialized chain doubles the plan per
        # round (the harmonic_centrality lesson, round 4).  The LAST
        # round stays un-checkpointed so the returned plan still shows
        # the min-plus shape the audit pins (check 81).
        if i < BFS_ROUNDS - 1:
            dist = dist.localCheckpoint()
    return (
        d.join(dist, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dist", F.lit(-1)).cast("int").alias("dist"),
        )
    )


def _sql_bfs_round(prev: str, out: str) -> str:
    return f"""
c{out} AS (
  SELECT s.v, min({prev}.dist + 1) AS nd
  FROM sym s JOIN {prev} ON s.nbr = {prev}.doc_id
  GROUP BY 1
),
{out} AS (
  SELECT coalesce({prev}.doc_id, c{out}.v) AS doc_id,
         least(coalesce({prev}.dist, {BFS_ROUNDS + 1}),
               coalesce(c{out}.nd, {BFS_ROUNDS + 1})) AS dist
  FROM {prev} FULL OUTER JOIN c{out} ON {prev}.doc_id = c{out}.v
)"""


SQL_BFS_LANDMARKS = f"""
WITH {DUCK_SYM_CTES},
d0 AS (
  SELECT doc_id, 0 AS dist FROM documents WHERE doc_id < {BFS_N_SEEDS}
),{",".join(_sql_bfs_round(f"d{i}", f"d{i + 1}") for i in range(BFS_ROUNDS))}
SELECT docs.doc_id,
       CAST(coalesce(d{BFS_ROUNDS}.dist, -1) AS INT) AS dist
FROM (SELECT doc_id FROM documents) docs
LEFT JOIN d{BFS_ROUNDS} ON docs.doc_id = d{BFS_ROUNDS}.doc_id
"""


# --------------------------------------------------------------------------
# q_recursive_bfs — Spark 4's native WITH RECURSIVE, value-locked to
# its dataflow twin: the recursive CTE enumerates bounded-depth paths
# from the landmark seeds over the SAME symmetric edge relation
# bfs_landmarks iterates on, and min(dist) per node must equal the
# iterative min-plus result row for row (pytest cross-checks the two
# in-engine; the oracle is DuckDB's own WITH RECURSIVE — both
# engines' recursion exercised on one contract).
#
# Scale honesty: recursion materializes PATHS, not nodes — per-level
# multiplicity grows with deg^depth, so the recursive form is the
# small-graph/ad-hoc surface; the production path for 10^12 edges is
# bfs_landmarks' per-round min-aggregated frontier (each level
# collapses to ≤1 row per node before the next join).  That tradeoff
# is exactly why this op exists beside, not instead of, the dataflow
# twin.
# --------------------------------------------------------------------------


def q_recursive_bfs(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    )
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    sym = und.select(
        F.col("a").alias("v"), F.col("b").alias("nbr")
    ).unionByName(
        und.select(F.col("b").alias("v"), F.col("a").alias("nbr"))
    )
    d.createOrReplaceTempView("rbfs_docs")
    sym.createOrReplaceTempView("rbfs_edges")
    return spark.sql(f"""
WITH RECURSIVE reach(doc_id, dist) AS (
  SELECT doc_id, 0 FROM rbfs_docs WHERE doc_id < {BFS_N_SEEDS}
  UNION ALL
  SELECT e.nbr, r.dist + 1
  FROM reach r JOIN rbfs_edges e ON e.v = r.doc_id
  WHERE r.dist < {BFS_ROUNDS}
),
best AS (SELECT doc_id, min(dist) AS dist FROM reach GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(best.dist, -1) AS INT) AS dist
FROM rbfs_docs d LEFT JOIN best ON d.doc_id = best.doc_id
""")


SQL_RECURSIVE_BFS = f"""
WITH RECURSIVE n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst FROM t
),
und AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e
),
sym AS (
  SELECT a AS v, b AS nbr FROM und
  UNION ALL
  SELECT b AS v, a AS nbr FROM und
),
reach(doc_id, dist) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id < {BFS_N_SEEDS}
  UNION ALL
  SELECT s.nbr, r.dist + 1
  FROM reach r JOIN sym s ON s.v = r.doc_id
  WHERE r.dist < {BFS_ROUNDS}
),
best AS (SELECT doc_id, min(dist) AS dist FROM reach GROUP BY doc_id)
SELECT d.doc_id, CAST(coalesce(best.dist, -1) AS INT) AS dist
FROM (SELECT doc_id FROM documents) d
LEFT JOIN best ON d.doc_id = best.doc_id
"""


# --------------------------------------------------------------------------
# redirect_resolve — bounded redirect-chain resolution by POINTER
# DOUBLING (path halving): the crawl-infrastructure primitive that
# turns a redirect log into (url, final_url, hops) — 3 doubling
# rounds + one final terminal-check join resolve chains up to exactly
# 2^3 = 8 hops (the rounds alone certify only 2^3 - 1; the final join
# decides doneness from cur's own pointer, like the oracle's fin
# CTE), so round count is O(log max_chain), never O(chain) (the
# cc_bigstar round-bound posture).  The synthetic pointer table is deterministic: doc_id %
# 4 != 0 redirects one step down (chains of length <= 3 ending at
# multiples of 4), and each doc_id % 101 == 55/56 pair forms a
# 2-CYCLE (55→56→55) that can never resolve — docs chaining INTO a
# cycle (57, 58, 59 mod 101·k neighborhoods) stay unresolved too,
# exercising the cycle-detection contract: after the rounds, a row
# still pointing at a redirect is flagged resolved=0 with final_id/
# hops = -1 (both engines walk exactly 8 hops on such rows, so the
# relation is value-identical, not just flag-identical).
#
# Scale shape (100 TB): the pointer table localCheckpoints once; each
# round is ONE self-equi-join on cur (hash-partitioned, AQE-split on
# hub targets); no window, no python.  hops <= 8 — no headroom math.
# --------------------------------------------------------------------------

RD_ROUNDS = 3  # resolves chains up to 2^3 = 8 hops


def redirect_resolve(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.max("doc_id").alias("max_id"))
    p = d.crossJoin(F.broadcast(n)).select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 101 = 55 AND doc_id + 1 <= max_id"
            "       THEN doc_id + 1"
            "     WHEN doc_id % 101 = 56 THEN doc_id - 1"
            "     WHEN doc_id % 4 != 0 THEN doc_id - 1"
            "     ELSE NULL END"
        ).alias("ptr"),
    )
    return _resolve_ptrs(p)


def _resolve_ptrs(p):
    """Pointer doubling over any ``(doc_id, ptr)`` relation — split
    out so tests can drive chains of exactly 2^RD_ROUNDS hops (the
    synthetic corpus pointers terminate within 3)."""
    # localCheckpoint: p feeds TWO consumers — the initial doubling
    # state and the final terminal-check join (the dist_drift rule)
    p = p.localCheckpoint()
    res = p.select(
        "doc_id",
        F.coalesce("ptr", F.col("doc_id")).alias("cur"),
        F.when(F.col("ptr").isNull(), 0).otherwise(1).cast("bigint").alias(
            "hops"
        ),
        F.col("ptr").isNull().alias("done"),
    ).localCheckpoint()
    for _ in range(RD_ROUNDS):
        a, b = res.alias("a"), res.alias("b")
        res = (
            a.join(b, F.col("a.cur") == F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.when(F.col("a.done"), F.col("a.cur"))
                .otherwise(F.col("b.cur"))
                .alias("cur"),
                F.when(F.col("a.done"), F.col("a.hops"))
                .otherwise(F.col("a.hops") + F.col("b.hops"))
                .cast("bigint")
                .alias("hops"),
                (F.col("a.done") | F.col("b.done")).alias("done"),
            )
            # per-round materialization: the state feeds BOTH legs of
            # the doubling self-join, so an unmaterialized chain
            # recomputes 2^k subtrees (the harmonic_centrality lesson,
            # audit check 101)
            .localCheckpoint()
        )
    # final terminal-check join (mirrors the oracle's fin CTE): the
    # done flag composed INSIDE the rounds only certifies chains up
    # to 2^k - 1 = 7 hops (done propagates from the previous round's
    # b-segment state), but a never-done row has walked cur exactly
    # 2^k = 8 steps with exact hops — so doneness is decided by
    # whether cur still points anywhere, closing the 8-hop gap the
    # round-4 ADVICE flagged (all three implementations — doubling,
    # recursive oracle, pytest walk — now state the same 2^RD_ROUNDS
    # bound)
    fin = res.join(p.select(F.col("doc_id").alias("cur"), "ptr"), "cur")
    return fin.select(
        "doc_id",
        F.when(F.col("ptr").isNull(), F.col("cur"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("final_id"),
        F.when(F.col("ptr").isNull(), F.col("hops"))
        .otherwise(F.lit(-1))
        .cast("bigint")
        .alias("hops"),
        F.col("ptr").isNull().cast("int").alias("resolved"),
    )


SQL_REDIRECT_RESOLVE = f"""
WITH RECURSIVE n AS (SELECT max(doc_id) AS max_id FROM documents),
p AS (
  SELECT doc_id,
         CASE WHEN doc_id % 101 = 55 AND doc_id + 1 <= max_id
                THEN doc_id + 1
              WHEN doc_id % 101 = 56 THEN doc_id - 1
              WHEN doc_id % 4 != 0 THEN doc_id - 1
              ELSE NULL END AS ptr
  FROM documents, n
),
walk(doc_id, cur, hops) AS (
  SELECT doc_id, doc_id, 0 FROM p
  UNION ALL
  SELECT w.doc_id, p2.ptr, w.hops + 1
  FROM walk w JOIN p p2 ON w.cur = p2.doc_id
  WHERE p2.ptr IS NOT NULL AND w.hops < {2 ** RD_ROUNDS}
),
last AS (
  SELECT doc_id, cur, hops,
         row_number() OVER (PARTITION BY doc_id ORDER BY hops DESC) AS rn
  FROM walk
),
fin AS (
  SELECT l.doc_id, l.cur, l.hops, (p.ptr IS NULL) AS done
  FROM last l JOIN p ON l.cur = p.doc_id
  WHERE l.rn = 1
)
SELECT doc_id,
       CAST(CASE WHEN done THEN cur ELSE -1 END AS BIGINT) AS final_id,
       CAST(CASE WHEN done THEN hops ELSE -1 END AS BIGINT) AS hops,
       CAST(done AS INT) AS resolved
FROM fin
"""


# --------------------------------------------------------------------------
# cocitation_sim — co-citation page similarity (Small 1973; the
# link-structure twin of sparse_cosine's term-structure view): two
# pages are similar when the same sources link to both.  Pairs come
# from the out-link self-join on src — bounded BY CONSTRUCTION at
# C(out_deg, 2) <= 3 pairs per source page (out-degree is capped by
# the link-graph fanout, the triangle_count orientation posture), so
# no all-pairs blowup exists at any corpus size.  jaccard_ppm =
# |in(a) ∩ in(b)| / |in(a) ∪ in(b)| in exact integer ppm.
#
# Scale shape: edges localCheckpoint once (in-degree + both pair
# legs); pair generation is one src-grain self-equi-join; in-degrees
# partial-aggregate; no window, no python, no product.
# --------------------------------------------------------------------------


def cocitation_sim(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    ).localCheckpoint()  # in-degree + both pair legs
    indeg = edges.groupBy("dst").agg(F.count("*").cast("bigint").alias("din"))
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    pairs = (
        e1.join(
            e2,
            (F.col("e1.src") == F.col("e2.src"))
            & (F.col("e1.dst") < F.col("e2.dst")),
        )
        .groupBy(F.col("e1.dst").alias("a"), F.col("e2.dst").alias("b"))
        .agg(F.count("*").cast("bigint").alias("shared"))
    )
    ia, ib = indeg.alias("ia"), indeg.alias("ib")
    j = (
        pairs.join(ia, F.col("a") == F.col("ia.dst"))
        .join(ib, F.col("b") == F.col("ib.dst"))
        .select(
            "a",
            "b",
            "shared",
            F.col("ia.din").alias("din_a"),
            F.col("ib.din").alias("din_b"),
        )
    )
    return j.withColumn(
        "jaccard_ppm",
        F.expr(_ppm_exact("shared", "(din_a + din_b - shared)", "div"))
        .cast("bigint"),
    )


SQL_COCITATION_SIM = f"""
WITH {DUCK_SYM_CTES},
indeg AS (SELECT dst, CAST(count(*) AS BIGINT) AS din FROM e GROUP BY dst),
pairs AS (
  SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS shared
  FROM e e1 JOIN e e2 ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY 1, 2
)
SELECT p.a, p.b, p.shared,
       ia.din AS din_a, ib.din AS din_b,
       CAST({_ppm_exact('p.shared', '(ia.din + ib.din - p.shared)', '//')}
         AS BIGINT) AS jaccard_ppm
FROM pairs p
JOIN indeg ia ON p.a = ia.dst
JOIN indeg ib ON p.b = ib.dst
"""


# --------------------------------------------------------------------------
# harmonic_centrality — landmark-approximated harmonic centrality
# (Boldi & Vigna 2014's axioms pick harmonic over closeness exactly
# because disconnected nodes contribute 0, not ∞): per-(node, seed)
# BFS distances over the SAME symmetric edge relation bfs_landmarks
# walks (single-sourced via _sym_edges / DUCK_SYM_CTES), then
# harmonic_micro = Σ_seeds ⌊1e6 / dist⌋ — the 1/d discounts are
# integer literals (1000000/500000/333333 for d = 1..3), so the score
# is an exact integer sum, bit-identical cross-engine.
#
# Scale shape: the BFS state is (node, seed) grain — seeds are a
# constant landmark set, so state is O(N·seeds); each round is one
# edge⋈state join + a partial-aggregated min, the bfs_landmarks
# shape; final rollup is node-grain.
# --------------------------------------------------------------------------

# ⌊1e6 / d⌋ for d = 1..BFS_ROUNDS — the one discount table, used by
# both engines.  The assert ties the table to BFS_ROUNDS (the
# NDCG_DISC precedent): without it, raising BFS_ROUNDS would let
# dist=4 rows fall through the ELSE-less CASE to NULL, which sum()
# silently SKIPS in both engines while n_seeds_reached still counts
# the row — a silent drop of every distance-4 contribution.
HARM_DISC = {1: 1_000_000, 2: 500_000, 3: 333_333}
assert set(HARM_DISC) == set(range(1, BFS_ROUNDS + 1)), (
    "HARM_DISC must cover every reachable distance 1..BFS_ROUNDS"
)
HARM_CASE = (
    "CASE {d} "
    + " ".join(f"WHEN {k} THEN {v}" for k, v in sorted(HARM_DISC.items()))
    + " END"
)


def harmonic_centrality(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    sym = _sym_edges(spark, sf_dir)
    dist = d.filter(F.col("doc_id") < BFS_N_SEEDS).select(
        F.col("doc_id").alias("node"),
        F.col("doc_id").alias("seed"),
        F.lit(0).cast("int").alias("dist"),
    )
    for _ in range(BFS_ROUNDS):
        cand = (
            sym.join(dist, sym.nbr == dist.node)
            .select(
                F.col("v").alias("node"),
                "seed",
                (F.col("dist") + 1).alias("nd"),
            )
            .groupBy("node", "seed")
            .agg(F.min("nd").alias("nd"))
        )
        dist = (
            dist.join(cand, ["node", "seed"], "full_outer")
            .select(
                "node",
                "seed",
                F.least(
                    F.coalesce("dist", F.lit(BFS_ROUNDS + 1)),
                    F.coalesce("nd", F.lit(BFS_ROUNDS + 1)),
                ).cast("int").alias("dist"),
            )
            # per-round materialization (the Pregel convention): the
            # state subtree appears TWICE in each merge (cand + the
            # outer join), so an unmaterialized chain doubles the plan
            # per round — measured 9 raw scans at 3 rounds before this
            # checkpoint, 0 after (audit check 103)
            .localCheckpoint()
        )
    h = (
        dist.filter(F.col("dist") >= 1)
        .groupBy("node")
        .agg(
            F.count("*").cast("int").alias("n_seeds_reached"),
            F.sum(F.expr(HARM_CASE.format(d="dist")))
            .cast("bigint")
            .alias("harmonic_micro"),
        )
    )
    return d.join(h, d.doc_id == h.node, "left").select(
        "doc_id",
        F.coalesce("n_seeds_reached", F.lit(0)).cast("int").alias(
            "n_seeds_reached"
        ),
        F.coalesce("harmonic_micro", F.lit(0)).cast("bigint").alias(
            "harmonic_micro"
        ),
    )


def _sql_harm_round(prev: str, out: str) -> str:
    return f"""
hc{out} AS (
  SELECT s.v AS node, {prev}.seed, min({prev}.dist + 1) AS nd
  FROM sym s JOIN {prev} ON s.nbr = {prev}.node
  GROUP BY 1, 2
),
h{out} AS (
  SELECT coalesce(p.node, c.node) AS node,
         coalesce(p.seed, c.seed) AS seed,
         least(coalesce(p.dist, {BFS_ROUNDS + 1}),
               coalesce(c.nd, {BFS_ROUNDS + 1})) AS dist
  FROM {prev} p FULL OUTER JOIN hc{out} c
    ON p.node = c.node AND p.seed = c.seed
)"""


SQL_HARMONIC_CENTRALITY = f"""
WITH {DUCK_SYM_CTES},
h0 AS (
  SELECT doc_id AS node, doc_id AS seed, 0 AS dist
  FROM documents WHERE doc_id < {BFS_N_SEEDS}
),{",".join(_sql_harm_round(f"h{i}", str(i + 1)) for i in range(BFS_ROUNDS))},
hh AS (
  SELECT node, CAST(count(*) AS INT) AS n_seeds_reached,
         CAST(sum({HARM_CASE.format(d="dist")}) AS BIGINT) AS harmonic_micro
  FROM h{BFS_ROUNDS} WHERE dist >= 1 GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(hh.n_seeds_reached, 0) AS INT) AS n_seeds_reached,
       CAST(coalesce(hh.harmonic_micro, 0) AS BIGINT) AS harmonic_micro
FROM (SELECT doc_id FROM documents) d
LEFT JOIN hh ON d.doc_id = hh.node
"""


# --------------------------------------------------------------------------
# textrank_keywords — corpus-level keyword extraction via TextRank
# (Mihalcea & Tarau 2004): build the word co-occurrence graph
# (consecutive-token pairs, undirected, deduped), run the same integer
# fixed-point damped power iteration pagerank_iter uses, and emit the
# top-K terms.  The keyword layer every corpus-curation report wants
# next to tfidf_topk: tfidf ranks terms per document, TextRank ranks
# them by global graph centrality.
#
# Determinism: identical to pagerank_iter — rank_0 = SCALE, rank_{t+1}
# = BASE + (85 · Σ_{u~v} rank_t(u) DIV deg(u)) DIV 100, all integer,
# bit-exact cross-engine.  Headroom: a total-mass bound gives
# rank(v) ≤ Σ ranks ≤ N_vocab · SCALE / 0.15, so 85·s stays under 2^63
# while N_vocab · SCALE ≤ ~1e17; at web-scale vocabularies SCALE is
# the documented dial (drop 1e12 → 1e9), the pagerank_iter convention.
#
# Scale shape (100 TB): pair generation is a zero-Exchange flat map;
# the symmetric edge set is localCheckpointed ONCE (the corpus
# tokenization must not re-run per iteration — the dist_drift rule),
# degrees derive from it, and each iteration is one edge⋈rank join +
# one partial-aggregated groupBy(dst), the irreducible Pregel shape.
# Top-K is orderBy+limit (TakeOrderedAndProject) with the rank window
# applied only to the ≤K-row result (the _bm25_scores convention — no
# constant-key window over a growing relation).
# --------------------------------------------------------------------------

TR_ITERS = 3
TR_TOPK = 20
TR_SCALE = PR_SCALE  # shared fixed-point scale; same headroom math
TR_BASE = PR_BASE


def textrank_keywords(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select(
        F.split(F.col("text"), " ").alias("_tk")
    ).filter(F.size("_tk") >= 2)
    pairs_arr = F.transform(
        # size >= 2 is filtered above, so sequence(1, size-1) is an
        # ascending range — Spark's sequence DESCENDS when start >
        # stop, which would fabricate reversed pairs on 1-token docs
        F.sequence(F.lit(1), F.size("_tk") - 1),
        lambda i: F.struct(
            F.element_at("_tk", i).alias("a"),
            F.element_at("_tk", i + 1).alias("b"),
        ),
    )
    cp = (
        d.select(F.explode(pairs_arr).alias("p"))
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
    )
    sym = (
        cp.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(cp.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
        .localCheckpoint()  # feeds deg + the edge join; tokenize ONCE
    )
    deg = sym.groupBy("src").agg(F.count("*").cast("bigint").alias("deg"))
    e = sym.join(deg, "src").localCheckpoint()  # scanned once per iteration
    ranks = e.select("src", "deg").distinct().select(
        F.col("src").alias("term"), F.lit(TR_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(TR_ITERS):
        contrib = e.join(ranks, e.src == ranks.term).select(
            "dst", F.expr("rank DIV deg").alias("c")
        )
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        nodes = e.select("src").distinct()
        ranks = nodes.join(insum, nodes.src == insum.dst, "left").select(
            F.col("src").alias("term"),
            (F.lit(TR_BASE) + F.expr("85 * coalesce(s, 0L) DIV 100"))
            .cast("bigint")
            .alias("rank"),
        )
    degt = e.select("src", "deg").distinct()
    top = (
        ranks.join(degt, ranks.term == degt.src)
        .select("term", "deg", "rank")
        .orderBy(F.desc("rank"), F.asc("term"))
        .limit(TR_TOPK)
    )
    w = Window.orderBy(F.desc("rank"), F.asc("term"))  # <= TR_TOPK rows
    return top.withColumn("rk", F.row_number().over(w).cast("int"))


def _sql_textrank_iter(prev: str, out: str) -> str:
    return f"""
c{out} AS (
  SELECT e.dst, sum({prev}.rank // e.deg) AS s
  FROM e JOIN {prev} ON e.src = {prev}.term GROUP BY e.dst
),
r{out} AS (
  SELECT deg.src AS term,
         CAST({TR_BASE} + (85 * coalesce(c{out}.s, 0)) // 100 AS BIGINT)
           AS rank
  FROM deg LEFT JOIN c{out} ON deg.src = c{out}.dst
)"""


SQL_TEXTRANK = f"""
WITH d AS (SELECT string_split(text, ' ') AS tk FROM documents
           WHERE len(string_split(text, ' ')) >= 2),
cp AS (
  SELECT tk[i] AS a, tk[i + 1] AS b
  FROM (SELECT tk, unnest(range(1, len(tk))) AS i FROM d)
  WHERE tk[i] <> tk[i + 1]
),
sym AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM cp
    UNION ALL
    SELECT b AS src, a AS dst FROM cp)
),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY src),
e AS (SELECT sym.src, sym.dst, deg.deg FROM sym JOIN deg USING (src)),
r0 AS (SELECT src AS term, CAST({TR_SCALE} AS BIGINT) AS rank FROM deg),
{",".join(_sql_textrank_iter(f"r{i}", str(i + 1)) for i in range(TR_ITERS))}
SELECT term, deg, rank, CAST(rk AS INT) AS rk FROM (
  SELECT r.term, deg.deg, r.rank,
         row_number() OVER (ORDER BY r.rank DESC, r.term) AS rk
  FROM r{TR_ITERS} r JOIN deg ON r.term = deg.src)
WHERE rk <= {TR_TOPK}
"""


# --------------------------------------------------------------------------
# ppr_seeds — personalized PageRank from a trusted seed set (the
# TrustRank recipe, Gyöngyi et al. 2004: teleport mass goes ONLY to
# seeds, so rank measures reachability-from-trust and spam farms —
# however interlinked — collect nothing except through real paths
# from the seed neighborhood).  The crawl-quality twin of
# pagerank_iter's global authority: deployments run both and flag
# pages with high global rank but near-zero trust rank.
#
# Determinism: identical integer fixed-point discipline — rank_0 =
# SCALE·(v ∈ S), rank_{t+1} = (v ∈ S)·BASE + (85·Σ rank_t(u) DIV
# deg(u)) DIV 100, bit-exact cross-engine; same SCALE·N ≤ 1e17
# headroom dial (total mass here is bounded by |S|·SCALE/0.15, which
# is STRICTER than pagerank's N·SCALE bound).
#
# Scale shape: identical to pagerank_iter (the shared _targets_expr
# edge rule — one graph for every authority signal); the seed
# indicator is a narrow doc_id predicate, never a join.
# --------------------------------------------------------------------------

PPR_N_SEEDS = 4  # trusted seeds = doc_ids 0..3 (the bfs landmark set)


def ppr_seeds(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"),
        F.explode(targets).alias("dst"),
        F.size(targets).alias("out_deg"),
    )
    seed = F.col("doc_id") < PPR_N_SEEDS
    ranks = d.select(
        "doc_id",
        F.when(seed, F.lit(PR_SCALE)).otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank"),
    )
    for _ in range(PR_ITERS):
        contrib = edges.join(ranks, edges.src == ranks.doc_id).select(
            "dst", F.expr("rank DIV out_deg").alias("c")
        )
        insum = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            d.join(insum, d.doc_id == insum.dst, "left")
            .select(
                "doc_id",
                (
                    F.when(seed, F.lit(PR_BASE)).otherwise(F.lit(0))
                    + F.expr(f"{PR_D_NUM} * coalesce(s, 0L) DIV {PR_D_DEN}")
                ).cast("bigint").alias("rank"),
            )
        )
    return ranks.select(
        "doc_id", "rank", seed.cast("int").alias("is_seed")
    )


def _sql_ppr_iter(prev: str, out: str) -> str:
    return f"""
pc{out} AS (
  SELECT e.dst, sum({prev}.rank // e.out_deg) AS s
  FROM e JOIN {prev} ON e.src = {prev}.doc_id GROUP BY e.dst
),
pr{out} AS (
  SELECT d.doc_id,
         CAST(CASE WHEN d.doc_id < {PPR_N_SEEDS} THEN {PR_BASE} ELSE 0 END
              + ({PR_D_NUM} * coalesce(pc{out}.s, 0)) // {PR_D_DEN}
              AS BIGINT) AS rank
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN pc{out} ON d.doc_id = pc{out}.dst
)"""


SQL_PPR_SEEDS = f"""
WITH n AS (SELECT count(*) AS nn FROM documents),
t AS (
  SELECT doc_id, {_sql_targets()} AS ts
  FROM documents, n
),
e AS (
  SELECT doc_id AS src, unnest(ts) AS dst, len(ts) AS out_deg FROM t
),
pr0 AS (
  SELECT doc_id,
         CAST(CASE WHEN doc_id < {PPR_N_SEEDS} THEN {PR_SCALE} ELSE 0 END
              AS BIGINT) AS rank
  FROM documents
),{",".join(_sql_ppr_iter(f"pr{i}", str(i + 1)) for i in range(PR_ITERS))}
SELECT doc_id, rank,
       CAST(CASE WHEN doc_id < {PPR_N_SEEDS} THEN 1 ELSE 0 END AS INT)
         AS is_seed
FROM pr{PR_ITERS}
"""


# --------------------------------------------------------------------------
# degree_assortativity — Pearson correlation of endpoint degrees over
# the directed edge list (Newman 2002): the one-number structure
# diagnostic (social graphs assort positively, the web assorts
# NEGATIVELY — hubs link to leaves; a crawl whose assortativity
# drifts toward 0/positive is usually drowning in mirror farms).
# x = out_deg(src), y = in_deg(dst) per edge.
#
# Determinism: the six sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact
# bigints; the Pearson terms n·Σxy − ΣxΣy etc. and r_micro are then
# ONE token-identical float expression over those exact integers
# (the sparse_cosine discipline).  Headroom (round-4 review fix —
# the first draft claimed a false bound): degrees clamp at
# DEG_CLAMP = 1e3 (the embedding_dim_stats milli lesson), so
# Σy² ≤ n·1e6 stays under 2^63 to n ≈ 9e12 EDGES with no further
# care; the n·Σy² PRODUCT would overflow bigint at just ~3e6 edges
# under ANY useful clamp, which is why the Pearson terms are formed
# in DOUBLE (exact-int inputs, correctly rounded identically in both
# engines) and never as bigint products.
#
# Scale shape: degrees partial-aggregate; ONE edge-grain join each to
# attach x and y; the moment rollup is a 1-row aggregate.
# --------------------------------------------------------------------------

DEG_CLAMP = 1_000


def degree_assortativity(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"),
        F.explode(targets).alias("dst"),
        F.size(targets).cast("bigint").alias("out_deg"),
    ).localCheckpoint()  # feeds indeg + the xy join
    indeg = edges.groupBy("dst").agg(
        F.least(F.count("*"), F.lit(DEG_CLAMP)).cast("bigint").alias("din")
    )
    xy = edges.join(indeg, "dst").select(
        F.least(F.col("out_deg"), F.lit(DEG_CLAMP)).alias("x"),
        F.col("din").alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    # Pearson terms in DOUBLE (see headroom note): exact-int inputs,
    # token-identical expression trees, correctly rounded identically
    # in both engines; greatest(·,1.0) guards the degenerate
    # all-equal-degree graph
    return s.select(
        F.col("n").alias("n_edges"),
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        F.floor(
            (
                (
                    F.col("n").cast("double") * F.col("sxy").cast("double")
                    - F.col("sx").cast("double") * F.col("sy").cast("double")
                )
                * F.lit(1000000.0)
            )
            / (
                F.sqrt(
                    F.greatest(
                        F.col("n").cast("double")
                        * F.col("sxx").cast("double")
                        - F.col("sx").cast("double")
                        * F.col("sx").cast("double"),
                        F.lit(1.0),
                    )
                )
                * F.sqrt(
                    F.greatest(
                        F.col("n").cast("double")
                        * F.col("syy").cast("double")
                        - F.col("sy").cast("double")
                        * F.col("sy").cast("double"),
                        F.lit(1.0),
                    )
                )
            )
        )
        .cast("bigint")
        .alias("r_micro"),
    )


SQL_DEGREE_ASSORTATIVITY = f"""
WITH {DUCK_SYM_CTES},
ec AS (SELECT src, dst, CAST(len(ts) AS BIGINT) AS out_deg
       FROM (SELECT doc_id AS src, unnest(ts) AS dst, ts FROM t)),
indeg AS (SELECT dst,
                 least(CAST(count(*) AS BIGINT), {DEG_CLAMP}) AS din
          FROM ec GROUP BY dst),
xy AS (
  SELECT least(ec.out_deg, {DEG_CLAMP}) AS x, indeg.din AS y
  FROM ec JOIN indeg USING (dst)
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM xy
)
SELECT n AS n_edges, sx, sy, sxy, sxx, syy,
       CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   * 1000000.0)
                  / (sqrt(greatest(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE),
                                   1.0))
                     * sqrt(greatest(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                     - CAST(sy AS DOUBLE)
                                       * CAST(sy AS DOUBLE),
                                     1.0))))
         AS BIGINT) AS r_micro
FROM s
"""


# --------------------------------------------------------------------------
# h_index_domains — per-source h-index over page in-degrees (the
# Hirsch measure applied to link authority: a source has h-index h
# when h of its pages each collect >= h in-links): the robust
# domain-authority summary next to domain_authority's degree sums —
# insensitive to one viral page (max) and to long tails of
# zero-link pages (mean), which is why citation analytics prefers it.
# Same deterministic directed edge relation as pagerank/cocitation.
#
# Scale shape: in-degrees partial-aggregate; the rank window
# partitions on source (per-domain page enumeration, the sitemap
# convention); h is a single conditional-max rollup.  Exact integers.
# --------------------------------------------------------------------------


def h_index_domains(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select("doc_id", "source")
    n = d.agg(F.count("*").alias("n_nodes"))
    withn = d.select("doc_id").crossJoin(F.broadcast(n))
    targets = _targets_expr(F.col("n_nodes"))
    edges = withn.select(
        F.col("doc_id").alias("src"), F.explode(targets).alias("dst")
    )
    indeg = edges.groupBy("dst").agg(
        F.count("*").cast("bigint").alias("indeg")
    )
    pages = d.join(indeg, d.doc_id == indeg.dst, "left").select(
        "source",
        "doc_id",
        F.coalesce("indeg", F.lit(0)).cast("bigint").alias("indeg"),
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("indeg"), F.asc("doc_id")
    )
    r = pages.withColumn("rn", F.row_number().over(w))
    return r.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_pages"),
        F.coalesce(
            F.max(F.when(F.col("indeg") >= F.col("rn"), F.col("rn"))),
            F.lit(0),
        )
        .cast("int")
        .alias("h_index"),
    )


SQL_H_INDEX_DOMAINS = f"""
WITH {DUCK_SYM_CTES},
indeg AS (SELECT dst, CAST(count(*) AS BIGINT) AS indeg
          FROM e GROUP BY dst),
pages AS (
  SELECT d.source, d.doc_id, coalesce(i.indeg, 0) AS indeg
  FROM documents d LEFT JOIN indeg i ON d.doc_id = i.dst
),
r AS (
  SELECT source, indeg,
         row_number() OVER (PARTITION BY source
                            ORDER BY indeg DESC, doc_id) AS rn
  FROM pages
)
SELECT source, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(coalesce(max(CASE WHEN indeg >= rn THEN rn END), 0) AS INT)
         AS h_index
FROM r GROUP BY source
"""


QUERIES = {
    "pagerank_iter": pagerank_iter,
    "h_index_domains": h_index_domains,
    "ppr_seeds": ppr_seeds,
    "degree_assortativity": degree_assortativity,
    "hits_scores": hits_scores,
    "two_hop_reach": two_hop_reach,
    "triangle_count": triangle_count,
    "community_lpa": community_lpa,
    "bfs_landmarks": bfs_landmarks,
    "q_recursive_bfs": q_recursive_bfs,
    "textrank_keywords": textrank_keywords,
    "redirect_resolve": redirect_resolve,
    "cocitation_sim": cocitation_sim,
    "harmonic_centrality": harmonic_centrality,
}

ORACLE_SQL = {
    "pagerank_iter": SQL_PAGERANK,
    "hits_scores": SQL_HITS,
    "two_hop_reach": SQL_TWO_HOP_REACH,
    "triangle_count": SQL_TRIANGLE_COUNT,
    "community_lpa": SQL_COMMUNITY_LPA,
    "bfs_landmarks": SQL_BFS_LANDMARKS,
    "q_recursive_bfs": SQL_RECURSIVE_BFS,
    "textrank_keywords": SQL_TEXTRANK,
    "redirect_resolve": SQL_REDIRECT_RESOLVE,
    "cocitation_sim": SQL_COCITATION_SIM,
    "harmonic_centrality": SQL_HARMONIC_CENTRALITY,
    "h_index_domains": SQL_H_INDEX_DOMAINS,
    "ppr_seeds": SQL_PPR_SEEDS,
    "degree_assortativity": SQL_DEGREE_ASSORTATIVITY,
}
