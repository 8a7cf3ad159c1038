"""Search-index operators over the corpus: inverted-index build and
BM25 top-k retrieval.

A training-data platform needs corpus SEARCH, not just dedup: quality
audits ("show me the docs this filter killed"), decontamination
forensics, and targeted sampling all run ranked term queries over the
10^12-doc corpus.  The two ops here are the classic pair: build the
impact-ordered inverted index, and score documents with BM25
(Robertson/Sparck Jones; the +1 idf form popularized by Lucene keeps
every weight positive).

Cross-engine determinism: BM25 is inherently ln()-based, so the score
math runs in doubles and each PER-TERM score is floored to integer
micros BEFORE summation — sums and rankings then operate on exact
bigints (the tfidf_topk floor-scaling precedent, applied one step
earlier so multi-term sums cannot reassociate).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .corpus_prep import _docs
from .common import DUCK_MD5I32, _ppm_exact, md5i32, toks
from .dedup import DUCK_CORPUS, _near_dup_corpus

# inverted index: drop df-1 singleton terms (retrieval-useless index
# bloat), keep the top-POSTINGS_CAP highest-tf postings per term
# (impact-ordered "champion list" truncation — the standard index-time
# cap; the cap is the op's documented contract, not a silent drop)
DF_MIN = 2
POSTINGS_CAP = 8

# BM25: k1=1.2, b=0.75 (the canonical defaults).  Written INLINE as
# 2.2 / 1.2 / 0.25 / 0.75 in both engines so the float expression
# trees are token-identical.
BM25_SCALE = 1_000_000  # per-term score -> integer micros
# query workload: global frequency ranks QSTART..QSTART+7, two terms
# per query -> 4 queries (mid-frequency terms: frequent enough to hit
# many docs, rare enough for idf to discriminate)
QSTART = 11
N_QTERMS = 8
BM25_TOPK = 5


def inverted_postings(spark, sf_dir):
    """Impact-ordered inverted index as flat rows (term, df, doc_id,
    tf, rk).

    Scale shape (100 TB): the token explode is a flat map; the
    (doc_id, term) tf rollup and the per-term df rollup both
    partial-aggregate map-side before their single Exchange; the
    ranking window partitions on TERM (vocabulary-grain, the same key
    cardinality ngram_topk already windows on) and WindowGroupLimit
    prunes to the cap before the final filter."""
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    tf = (
        d.select("doc_id", F.explode("_tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") >= DF_MIN
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    return (
        tf.join(df_, "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= POSTINGS_CAP)
        .select("term", "df", "doc_id", "tf", "rk")
    )


SQL_INVERTED_POSTINGS = f"""
WITH e AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
           FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM e GROUP BY 1, 2),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       FROM tf GROUP BY term HAVING count(*) >= {DF_MIN})
SELECT term, df, doc_id, tf, CAST(rk AS INT) AS rk
FROM (SELECT term, df, doc_id, tf,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id) AS rk
      FROM tf JOIN df USING (term))
WHERE rk <= {POSTINGS_CAP}
"""


def _query_terms(df_):
    """The deterministic query-workload selection (global-frequency
    ranks QSTART..QSTART+7, two terms per query) from a (term, df, cf)
    table — the ONE Spark-side definition, shared by _bm25_scores and
    kwic_concordance exactly as DUCK_BM25_AGG_CTES' `q` CTE is its one
    SQL mirror (the retrievers and the concordance must query the
    same terms or the tooling lies)."""
    qw = Window.orderBy(F.desc("cf"), F.asc("term"))  # <= QSTART+7 rows
    return (
        df_.orderBy(F.desc("cf"), F.asc("term"))
        .limit(QSTART + N_QTERMS - 1)
        .withColumn("gr", F.row_number().over(qw))
        .filter(F.col("gr") >= QSTART)
        .select(
            # explicit floor-div: `/` then cast would TRUNCATE in
            # Spark but ROUND in DuckDB — a silent query regrouping
            (F.floor((F.col("gr") - QSTART) / 2) + 1)
            .cast("int")
            .alias("query_id"),
            "term",
            "df",
        )
    )


def _bm25_scores(spark, sf_dir):
    """The shared BM25 scoring relation (query_id, doc_id, score_micro,
    n_terms) over every candidate doc matching >= 1 query term —
    single-sourced between ``bm25_topk`` and ``hard_negatives`` so the
    scoring rule cannot drift (the DUCK_DUPSPAN_CTES convention)."""
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    e = d.select(
        "doc_id", F.size("_tk").alias("dl"), F.explode("_tk").alias("term")
    )
    tf = e.groupBy("doc_id", "dl", "term").agg(F.count("*").alias("tf"))
    stats = d.agg(
        F.count("*").alias("n_docs"),
        (F.sum(F.size("_tk")) / F.count("*")).cast("double").alias("avgdl"),
    )
    df_ = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    qterms = _query_terms(df_)
    hits = tf.join(F.broadcast(qterms), "term").crossJoin(F.broadcast(stats))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfs = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2)
        * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
    )
    per_term = hits.select(
        "query_id",
        "doc_id",
        F.floor(idf * tfs * F.lit(float(BM25_SCALE)))
        .cast("bigint")
        .alias("s_micro"),
    )
    return per_term.groupBy("query_id", "doc_id").agg(
        F.sum("s_micro").alias("score_micro"),
        F.count("*").cast("int").alias("n_terms"),
    )


def bm25_topk(spark, sf_dir):
    """BM25 top-{k} documents per query over a deterministic 4-query
    workload (terms at global-frequency ranks {qs}..{qe}, two per
    query).

    Scale shape (100 TB): document length rides the tf groupBy key
    (functionally dependent on doc_id — no extra shuffle, no
    corpus-grain join-back); corpus stats (N, avgdl) are a 1-row
    broadcast aggregate folded into the plan; query-term selection is
    a distributed top-k (TakeOrderedAndProject — never a global sort);
    the query-term table broadcast-joins into tf so only matching
    postings survive; the final ranking window partitions on QUERY_ID
    (workload-grain, tiny).  Per-term scores are floored to integer
    micros before the per-(query, doc) sum, so cross-engine float
    reassociation cannot flip a rank."""
    return _bm25_rank(_bm25_scores(spark, sf_dir))


def _bm25_rank(agg):
    """Top-{BM25_TOPK} ranking of a _bm25_scores relation — shared by
    bm25_topk and ndcg_eval (the _bm25_scores single-sourcing rule,
    one level up: the eval op must rank with the retriever's exact
    window or its DCG measures a different system)."""
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        agg.withColumn("rk", F.row_number().over(rw))
        .filter(F.col("rk") <= BM25_TOPK)
        .select("query_id", "doc_id", "score_micro", "n_terms", "rk")
    )


bm25_topk.__doc__ = bm25_topk.__doc__.format(
    k=BM25_TOPK, qs=QSTART, qe=QSTART + N_QTERMS - 1
)


# --------------------------------------------------------------------------
# hard_negatives — BM25-mined hard negatives for retrieval training
# (the DPR recipe, Karpukhin et al. 2020: the strongest negatives are
# top-ranked BM25 docs that are NOT relevant).  Relevance here is the
# exact-match rule the 2-term workload affords: a doc is a POSITIVE
# for its query iff it matches BOTH query terms (n_terms = 2); a
# mined negative is a top-scoring doc matching only ONE — the classic
# lexical-trap document.  Each negative carries margin_micro = (the
# query's weakest positive score) − (its own score): the triplet-loss
# margin, NEGATIVE when the trap outscores a true positive (the
# hardest and most valuable training pairs).  Queries with no positive
# at all are dropped (DPR's unanswerable-question rule).
#
# Scale shape (100 TB): reuses _bm25_scores verbatim (one scoring
# job feeds both the eval top-k and the miner); the min-positive and
# the negative ranking are query-grain windows over the candidate
# table, which the index's champion lists bound per query — both
# windows share one Exchange on query_id.
# --------------------------------------------------------------------------

NEG_K = 5


def hard_negatives(spark, sf_dir):
    agg = _bm25_scores(spark, sf_dir)
    qw = Window.partitionBy("query_id")
    scored = agg.withColumn(
        "pos_min",
        F.min(F.when(F.col("n_terms") == 2, F.col("score_micro"))).over(qw),
    )
    negw = Window.partitionBy("query_id").orderBy(
        F.desc("score_micro"), F.asc("doc_id")
    )
    return (
        scored.filter((F.col("n_terms") < 2) & F.col("pos_min").isNotNull())
        .withColumn("neg_rk", F.row_number().over(negw))
        .filter(F.col("neg_rk") <= NEG_K)
        .select(
            "query_id",
            "doc_id",
            "score_micro",
            (F.col("pos_min") - F.col("score_micro")).alias("margin_micro"),
            F.col("neg_rk").cast("int").alias("neg_rk"),
        )
    )


# CTE chain d..agg mirrors _bm25_scores exactly and is shared by the
# bm25_topk and hard_negatives oracles (single-sourced like
# DUCK_DUPSPAN_CTES, so the scoring rule cannot drift between them).
DUCK_BM25_AGG_CTES = f"""d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
e AS (SELECT doc_id, len(tk) AS dl, unnest(tk) AS term FROM d),
tf AS (SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       FROM e GROUP BY 1, 2, 3),
stats AS (SELECT count(*) AS n_docs,
                 CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
          FROM d),
df AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY term),
q AS (SELECT CAST((gr - {QSTART}) // 2 + 1 AS INT) AS query_id, term, df
      FROM (SELECT term, df,
                   row_number() OVER (ORDER BY cf DESC, term) AS gr
            FROM df)
      WHERE gr BETWEEN {QSTART} AND {QSTART + N_QTERMS - 1}),
per_term AS (
  SELECT query_id, doc_id,
         CAST(floor(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
           * {BM25_SCALE}.0
         ) AS BIGINT) AS s_micro
         -- the tf-saturation quotient is parenthesized as ONE operand:
         -- left-associating `idf * num / denom` computes a DIFFERENT
         -- double (~1 ulp, measured on ~34% of inputs) than Spark's
         -- idf * (num/denom) tree, and a 1-ulp difference at an
         -- integer-micro boundary flips the floor
  FROM tf JOIN q USING (term), stats),
agg AS (
  SELECT query_id, doc_id, CAST(sum(s_micro) AS BIGINT) AS score_micro,
         CAST(count(*) AS INT) AS n_terms
  FROM per_term GROUP BY 1, 2)"""

SQL_BM25_TOPK = f"""
WITH {DUCK_BM25_AGG_CTES}
SELECT query_id, doc_id, score_micro, n_terms, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, doc_id) AS rk
      FROM agg)
WHERE rk <= {BM25_TOPK}
"""

SQL_HARD_NEGATIVES = f"""
WITH {DUCK_BM25_AGG_CTES},
scored AS (
  SELECT query_id, doc_id, score_micro, n_terms,
         min(CASE WHEN n_terms = 2 THEN score_micro END)
           OVER (PARTITION BY query_id) AS pos_min
  FROM agg)
SELECT query_id, doc_id, score_micro,
       CAST(pos_min - score_micro AS BIGINT) AS margin_micro,
       CAST(neg_rk AS INT) AS neg_rk
FROM (SELECT query_id, doc_id, score_micro, pos_min,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score_micro DESC, doc_id) AS neg_rk
      FROM scored WHERE n_terms < 2 AND pos_min IS NOT NULL)
WHERE neg_rk <= {NEG_K}
"""


# --------------------------------------------------------------------------
# heavy_hitters_cms — Count-Min sketch frequency estimation (Cormode &
# Muthukrishnan 2005): the fixed-memory answer to "how often does X
# occur" over 10^12 tokens.  The sketch is K=4 hash rows x M=1024
# counters — 4096 cells TOTAL regardless of corpus size (that is the
# point: the exact per-token count table has vocabulary cardinality;
# the sketch is a constant-size partial-aggregable state you can keep
# per hour, per source, per shard).  Estimate = min over the K cells a
# token hashes to; one-sided error (est >= truth, always) with
# overestimate bounded by collision mass — both properties pinned in
# pytest against exact counts.
#
# Scale shape (100 TB): the sketch build is ONE partial-agg'd groupBy
# on (k, m) — 4096 output rows, so the Exchange carries pre-combined
# constant-size state; the true-count side (used here to verify) is
# the standard top-k; estimation joins the 20-candidate table to the
# BROADCAST 4096-row sketch.
# --------------------------------------------------------------------------

CMS_K = 4
CMS_M = 1024
CMS_TOP = 20


def _cms_cell(k: int, tok):
    return (
        md5i32(F.concat(F.lit(f"cms{k}|"), tok)) % CMS_M
    ).cast("int")


def _cms_cells(key):
    """The full K-way (k, m) cell explode for one key column — the
    sketch-layout contract (CMS_K rows per key, columns `k`/`m`).
    Single-sourced so batch (heavy_hitters_cms build + candidate
    sides) and streaming (stream_cms) cannot drift in layout; only
    project `col("c.k"), col("c.m")` after selecting this."""
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("k"), _cms_cell(k, key).alias("m")
                )
                for k in range(CMS_K)
            ]
        )
    ).alias("c")


def heavy_hitters_cms(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    e = d.select(F.explode("_tk").alias("tok"))
    cnt = e.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    cand = cnt.orderBy(F.desc("true_cnt"), F.asc("tok")).limit(CMS_TOP)
    cells = (
        e.select(_cms_cells(F.col("tok")))
        .select("c.k", "c.m")
        .groupBy("k", "m")
        .agg(F.count("*").alias("cell_cnt"))
    )
    ck = cand.select(
        "tok", "true_cnt", _cms_cells(F.col("tok"))
    ).select("tok", "true_cnt", "c.k", "c.m")
    est = (
        ck.join(F.broadcast(cells), ["k", "m"])
        .groupBy("tok", "true_cnt")
        .agg(F.min("cell_cnt").alias("est_cnt"))
    )
    return est.select("tok", "true_cnt", "est_cnt")


def _duck_cms_cell(tok: str) -> str:
    h = DUCK_MD5I32.format(x=f"'cms' || CAST(k AS VARCHAR) || '|' || {tok}")
    return f"CAST({h} % {CMS_M} AS INT)"


SQL_HEAVY_HITTERS_CMS = f"""
WITH e AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt
        FROM e GROUP BY tok),
cand AS (SELECT tok, true_cnt FROM cnt
         ORDER BY true_cnt DESC, tok LIMIT {CMS_TOP}),
ek AS (SELECT tok, k, {_duck_cms_cell('tok')} AS m
       FROM e, UNNEST(range(0, {CMS_K})) t(k)),
cells AS (SELECT k, m, CAST(count(*) AS BIGINT) AS cell_cnt
          FROM ek GROUP BY k, m),
ck AS (SELECT tok, true_cnt, k, {_duck_cms_cell('tok')} AS m
       FROM cand, UNNEST(range(0, {CMS_K})) t(k))
SELECT tok, true_cnt, CAST(min(cell_cnt) AS BIGINT) AS est_cnt
FROM ck JOIN cells USING (k, m)
GROUP BY tok, true_cnt
"""


# --------------------------------------------------------------------------
# hybrid_rrf — hybrid retrieval via reciprocal-rank fusion (Cormack,
# Clarke & Buettcher 2009; the fusion rule behind every production
# lexical+dense stack — Elasticsearch, Vespa, Azure AI Search all
# ship RRF verbatim): fused(q, d) = Σ_rankers 1/(K + rank_r(d)),
# K = 60, which needs no score calibration between BM25 micros and
# cosine units — only ranks cross the fusion boundary.  Lexical
# ranking = bm25_topk, semantic ranking = ann_lsh_bucketed, both
# single-sourced (the fused list can never disagree with either
# retriever), aligned on the shared query ids (bm25's 4-query
# workload ∩ the ANN probe ids).  Contributions are exact integer
# micros (1e6 div (K + rank)) so cross-engine float addition cannot
# reorder the fused list; ties (a doc ranked by only one retriever at
# the same reciprocal as another) break by doc_id.
#
# A third, query-independent ranker fills the static-prior slot real
# fusion stacks wire in (authority/recency priors beside the lexical
# and dense lists): a deterministic PRIOR_K-doc authority list.  On
# this fixture the lexical and dense lists never intersect (the
# embeddings are random vectors, independent of the text), so the
# prior is also what exercises the multi-source summation branch —
# each probe's own vector is its dense rank-1 hit AND sits in the
# prior, giving n_sources >= 2 rows the oracle value-checks.
#
# Scale shape (100 TB): both retrievers keep their own audited plans
# (champion-list postings / LSH buckets); fusion only ever touches
# the top-k survivors — a union of ≤(BM25_TOPK + TOP_K) rows per
# query, one map-side-combined (query, doc) rollup, and a ranking
# window on query_id over those few rows.  The corpus is never
# rescanned by the fusion layer.
# --------------------------------------------------------------------------

RRF_K = 60
HYBRID_TOPK = 5
HYBRID_N_QUERIES = N_QTERMS // 2  # bm25's 2-terms-per-query workload
PRIOR_K = 5  # static authority-prior list: doc ids 1..PRIOR_K


def hybrid_rrf(spark, sf_dir):
    from .similarity import ann_lsh_bucketed

    lex = bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rk").alias("rank")
    )
    sem = (
        ann_lsh_bucketed(spark, sf_dir)
        .filter((F.col("q_id") >= 1) & (F.col("q_id") <= HYBRID_N_QUERIES))
        .select(
            F.col("q_id").cast("int").alias("query_id"),
            F.col("vec_id").alias("doc_id"),
            F.col("rnk").alias("rank"),
        )
    )
    prior = (
        spark.range(1, HYBRID_N_QUERIES + 1)
        .select(F.col("id").cast("int").alias("query_id"))
        .crossJoin(
            spark.range(1, PRIOR_K + 1).select(
                F.col("id").alias("doc_id"),
                F.col("id").cast("int").alias("rank"),
            )
        )
    )
    both = lex.unionByName(sem).unionByName(prior).select(
        "query_id",
        "doc_id",
        F.expr(f"1000000 div ({RRF_K} + rank)").alias("contrib"),
    )
    fused = both.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("rrf_micro"),
        F.count("*").cast("int").alias("n_sources"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_micro"), F.asc("doc_id")
    )
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= HYBRID_TOPK)
    )


def _sql_hybrid_rrf() -> str:
    from .similarity import SQL_ANN_LSH

    return f"""
WITH lex AS ({SQL_BM25_TOPK}),
sem AS ({SQL_ANN_LSH}),
both_r AS (
  SELECT query_id, doc_id, 1000000 // ({RRF_K} + rk) AS contrib
  FROM lex
  UNION ALL
  SELECT CAST(q_id AS INT) AS query_id, vec_id AS doc_id,
         1000000 // ({RRF_K} + rnk) AS contrib
  FROM sem WHERE q_id BETWEEN 1 AND {HYBRID_N_QUERIES}
  UNION ALL
  SELECT CAST(q AS INT) AS query_id, CAST(d AS BIGINT) AS doc_id,
         1000000 // ({RRF_K} + d) AS contrib
  FROM range(1, {HYBRID_N_QUERIES + 1}) q(q),
       range(1, {PRIOR_K + 1}) d(d)
),
fused AS (
  SELECT query_id, doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_micro,
         CAST(count(*) AS INT) AS n_sources
  FROM both_r GROUP BY 1, 2
)
SELECT query_id, doc_id, rrf_micro, n_sources,
       CAST(rk AS INT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_micro DESC, doc_id) AS rk
  FROM fused
)
WHERE rk <= {HYBRID_TOPK}
"""


SQL_HYBRID_RRF = _sql_hybrid_rrf()


# --------------------------------------------------------------------------
# phrase_query — exact phrase retrieval over a POSITIONAL inverted
# index (Manning/Raghavan/Schütze IR ch. 2): the retrieval primitive
# bag-of-words indexes cannot answer ("new york times" ≠ {new, york,
# times}).  Production decontamination audits and filter forensics
# need it — "which training docs contain this exact benchmark
# sentence" is a phrase query, not a term query.  The positional
# postings relation is (term, doc_id, pos); a k-term phrase executes
# as k−1 ADJACENCY self-joins keyed on (doc_id, pos+i) — the classic
# positional-intersection algorithm, expressed as equi-joins Catalyst
# hash-partitions on (doc_id, pos).
#
# Workload: deterministic 3-term phrases mined from the corpus itself —
# trigrams (with multiplicity) at global-frequency ranks
# PHRASE_START..PHRASE_START+N_PHRASES−1 (the bm25 mid-frequency
# workload convention), restricted to true 3-word trigrams (short-doc
# degenerates drop out).
#
# Scale shape (100 TB): the positional explode is a flat map; the
# workload is a distributed top-k (TakeOrderedAndProject) broadcast
# into the postings scan so only matching postings survive; both
# adjacency joins are equi-joins on (doc_id, position) — under the
# io.py doc_id bucketing convention the index is co-partitioned and
# the joins are shuffle-free; the final rollup partial-aggregates to
# (phrase, doc) grain.  No window touches corpus-grain rows.
# --------------------------------------------------------------------------

PHRASE_START = 3  # skip the 2 most frequent trigrams (stopword-like)
N_PHRASES = 4


def phrase_query(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    tri = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_tk") - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice("_tk", i, 3)),
    )
    cnt = (
        d.select(F.explode(tri).alias("phrase"))
        .filter(F.size(F.split(F.col("phrase"), " ")) == 3)
        .groupBy("phrase")
        .agg(F.count("*").alias("c"))
    )
    gw = Window.orderBy(F.desc("c"), F.asc("phrase"))  # ≤6-row relation
    wl = (
        cnt.orderBy(F.desc("c"), F.asc("phrase"))
        .limit(PHRASE_START + N_PHRASES - 1)
        .withColumn("gr", F.row_number().over(gw))
        .filter(F.col("gr") >= PHRASE_START)
        .select(
            (F.col("gr") - PHRASE_START + 1).cast("int").alias("phrase_id"),
            "phrase",
            F.split(F.col("phrase"), " ")[0].alias("t1"),
            F.split(F.col("phrase"), " ")[1].alias("t2"),
            F.split(F.col("phrase"), " ")[2].alias("t3"),
        )
    )
    # eager localCheckpoint: the positional index feeds THREE join
    # legs (p1/p2/p3) — without the cut each leg replans the
    # posexplode from the raw corpus scan (the dist_drift rule;
    # measured 4 raw scans before the cut).  At scale this is the
    # point of an index: built once, probed many times.
    pos = d.select(
        "doc_id", F.posexplode("_tk").alias("p0", "term")
    ).select(
        "doc_id", (F.col("p0") + 1).alias("pos"), "term"
    ).localCheckpoint()
    p1 = pos.join(F.broadcast(wl), pos.term == wl.t1).select(
        "phrase_id", "phrase", "doc_id", "pos", "t2", "t3"
    )
    p2 = pos.select(
        F.col("doc_id").alias("d2"), F.col("pos").alias("q2"),
        F.col("term").alias("w2"),
    )
    m2 = p1.join(
        p2,
        (p1.doc_id == p2.d2) & (p1.pos + 1 == p2.q2) & (p1.t2 == p2.w2),
    ).select("phrase_id", "phrase", "doc_id", "pos", "t3")
    p3 = pos.select(
        F.col("doc_id").alias("d3"), F.col("pos").alias("q3"),
        F.col("term").alias("w3"),
    )
    m3 = m2.join(
        p3,
        (m2.doc_id == p3.d3) & (m2.pos + 2 == p3.q3) & (m2.t3 == p3.w3),
    ).select("phrase_id", "phrase", "doc_id", "pos")
    return m3.groupBy("phrase_id", "phrase", "doc_id").agg(
        F.count("*").alias("n_occur"),
        F.min("pos").cast("int").alias("first_pos"),
    )


SQL_PHRASE_QUERY = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
tri AS (
  SELECT unnest(list_transform(
           range(1, greatest(len(tk) - 2, 1) + 1),
           i -> array_to_string(tk[i:i+2], ' '))) AS phrase
  FROM d),
cnt AS (SELECT phrase, CAST(count(*) AS BIGINT) AS c
        FROM tri
        WHERE len(string_split(phrase, ' ')) = 3
        GROUP BY phrase),
wl AS (
  SELECT CAST(gr - {PHRASE_START} + 1 AS INT) AS phrase_id, phrase,
         string_split(phrase, ' ')[1] AS t1,
         string_split(phrase, ' ')[2] AS t2,
         string_split(phrase, ' ')[3] AS t3
  FROM (SELECT phrase, row_number() OVER (ORDER BY c DESC, phrase) AS gr
        FROM cnt)
  WHERE gr BETWEEN {PHRASE_START} AND {PHRASE_START + N_PHRASES - 1}),
pos AS (SELECT doc_id, generate_subscripts(tk, 1) AS pos,
               unnest(tk) AS term
        FROM d),
m AS (
  SELECT wl.phrase_id, wl.phrase, p1.doc_id, p1.pos
  FROM pos p1
  JOIN wl ON p1.term = wl.t1
  JOIN pos p2 ON p2.doc_id = p1.doc_id AND p2.pos = p1.pos + 1
             AND p2.term = wl.t2
  JOIN pos p3 ON p3.doc_id = p1.doc_id AND p3.pos = p1.pos + 2
             AND p3.term = wl.t3)
SELECT phrase_id, phrase, doc_id,
       CAST(count(*) AS BIGINT) AS n_occur,
       CAST(min(pos) AS INT) AS first_pos
FROM m GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# rank_agreement — retriever-agreement telemetry between the lexical
# (bm25_topk) and fused (hybrid_rrf) top-k lists: per query, the
# overlap of the two top-5 sets (Jaccard in exact ppm) and the
# Spearman-style displacement mass Σd² over the common documents
# (d = lexical rank − fused rank; ρ = 1 − 6Σd²/(n(n²−1)) is a
# constant-size driver-side read off these integers — the float never
# touches a row).  This is the eval every fusion rollout watches: a
# fused list that never moves (Σd² = 0, overlap 1e6) means the extra
# retrievers add nothing; one that shares nothing with lexical
# (overlap 0) means the fusion is drowning the signal.
#
# Both rankings are SINGLE-SOURCED (the same bm25_topk / hybrid_rrf
# plans and, on the oracle side, their exact SQL texts as CTEs — the
# DUCK_BM25_AGG_CTES convention), so this op can never disagree with
# the retrievers it measures.  All outputs exact integers
# (_ppm_exact; d² sums are tiny).
#
# Scale shape: both inputs are already top-k relations (≤k rows per
# query); the full-outer join and both rollups are query-grain.
# --------------------------------------------------------------------------


def rank_agreement(spark, sf_dir):
    lex = bm25_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rk").alias("rl")
    )
    fus = hybrid_rrf(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rk").alias("rf")
    )
    j = lex.join(fus, ["query_id", "doc_id"], "full_outer")
    per = j.groupBy("query_id").agg(
        F.count("*").cast("bigint").alias("n_union"),
        F.sum(
            F.when(F.col("rl").isNotNull() & F.col("rf").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_common"),
        F.sum(
            F.when(
                F.col("rl").isNotNull() & F.col("rf").isNotNull(),
                (F.col("rl") - F.col("rf")) * (F.col("rl") - F.col("rf")),
            ).otherwise(0)
        ).cast("bigint").alias("sum_d2"),
    )
    return per.select(
        "query_id",
        "n_common",
        "sum_d2",
        F.expr(_ppm_exact("n_common", "n_union", "div")).cast("bigint")
        .alias("overlap_ppm"),
    )


def _sql_rank_agreement() -> str:
    return f"""
WITH lex_full AS ({SQL_BM25_TOPK}),
fus_full AS ({SQL_HYBRID_RRF}),
lex AS (SELECT query_id, doc_id, rk AS rl FROM lex_full),
fus AS (SELECT query_id, doc_id, rk AS rf FROM fus_full),
j AS (
  SELECT coalesce(lex.query_id, fus.query_id) AS query_id,
         lex.rl, fus.rf
  FROM lex FULL OUTER JOIN fus
    ON lex.query_id = fus.query_id AND lex.doc_id = fus.doc_id
),
per AS (
  SELECT query_id,
         CAST(count(*) AS BIGINT) AS n_union,
         CAST(sum(CASE WHEN rl IS NOT NULL AND rf IS NOT NULL
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         CAST(sum(CASE WHEN rl IS NOT NULL AND rf IS NOT NULL
                  THEN (rl - rf) * (rl - rf) ELSE 0 END) AS BIGINT)
           AS sum_d2
  FROM j GROUP BY 1
)
SELECT query_id, n_common, sum_d2,
       CAST({_ppm_exact('n_common', 'n_union', '//')} AS BIGINT)
         AS overlap_ppm
FROM per
"""


SQL_RANK_AGREEMENT = _sql_rank_agreement()


# --------------------------------------------------------------------------
# sparse_cosine_topk — TF-IDF sparse-vector cosine top-k document
# similarity as two-phase all-pairs similarity search (Bayardo et al.
# WWW'07): PREFIX-INDEX candidate generation (each doc indexes only
# its {prefix} strongest terms; docs sharing an indexed term become a
# candidate pair) followed by EXACT full-vector verification of every
# candidate.  The LEXICAL near-dup/similarity signal next to the
# dense ANN family — no embeddings needed.  Runs over the near-dup
# corpus (documents ∪ truncated mutants) so real similar pairs exist.
#
# Why doc-side prefixes and not per-term champion lists: the integer
# weights quantize heavily (capped tf × deci-idf), so a term-side
# top-C cut ties on w and degenerates to a doc_id lottery (measured:
# 6/50 planted mutant pairs survived a C=8 champion cut on the
# fixture), and — the structural guarantee the pytest pins — two
# IDENTICAL documents always index identical prefix terms, so an
# exact copy can never be missed, whereas a champion list can evict
# one copy of a tied pair.
#
# Determinism: integer weights w = min(tf, {tf_cap}) · ⌊ln(N/df)·10⌋
# (the BM25 floor-before-combine lesson one level earlier: weights
# are bigints, so verified dot products and norms² are EXACT integer
# sums — no float reassociation).  The only float math is the final
# cos_ppm = ⌊(dot·1e6) / (√n2_a · √n2_b)⌋ where every operand is a
# correctly-rounded function of exact integers and the expression
# tree is token-identical in both engines (the BM25 association
# rule).  df=N terms get idf 0 and drop out — natural stopword
# removal.
#
# Scale shape (100 TB): the ONLY corpus-grain work is tokenize → tf →
# weights, localCheckpointed once (four consumers: norms, the prefix
# index, and both verification legs — checkpoint-before-fan-out).
# Candidate buckets are per-term sets of docs that chose the term as
# a top-{prefix} weight: idf weighting keeps common terms out of
# every prefix, so buckets track term rarity, not corpus size; a
# pathologically shared rare term is an AQE-skew-split equi-join
# bucket, the LSH-band posture.  Verification is two equi-joins at
# candidate×doc-length grain — bounded by the candidate set the index
# admits.  Windows partition on doc_id / a — growing keys only.
# --------------------------------------------------------------------------

SC_TF_CAP = 30
SC_PREFIX = 8
SC_TOPK = 5


def sparse_cosine_topk(spark, sf_dir):
    c = _near_dup_corpus(spark, sf_dir)
    d = c.select("doc_id", toks(F.col("text")).alias("_tk"))
    tf = (
        d.select("doc_id", F.explode("_tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = d.agg(F.count("*").alias("n_docs"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df")).filter(
        F.col("df") >= DF_MIN
    )
    wts = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            "term",
            (
                F.least(F.col("tf"), F.lit(SC_TF_CAP))
                * F.floor(
                    F.log(F.col("n_docs").cast("double") / F.col("df"))
                    * F.lit(10.0)
                ).cast("bigint")
            ).alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint()  # norms + prefix index + both verify legs
    )
    n2 = wts.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2")
    )
    pw = Window.partitionBy("doc_id").orderBy(F.desc("w"), F.asc("term"))
    px = (
        wts.withColumn("prk", F.row_number().over(pw))
        .filter(F.col("prk") <= SC_PREFIX)
        .select("doc_id", "term")
    )
    p1, p2 = px.alias("p1"), px.alias("p2")
    cand = (
        p1.join(
            p2,
            (F.col("p1.term") == F.col("p2.term"))
            & (F.col("p1.doc_id") < F.col("p2.doc_id")),
        )
        .select(
            F.col("p1.doc_id").alias("a"), F.col("p2.doc_id").alias("b")
        )
        .distinct()
    )
    wa = wts.select(
        F.col("doc_id").alias("a"), "term", F.col("w").alias("w_a")
    )
    wb = wts.select(
        F.col("doc_id").alias("b"), "term", F.col("w").alias("w_b")
    )
    dots = (
        cand.join(wa, "a")
        .join(wb, ["b", "term"])
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("int").alias("n_shared"),
            F.sum(F.col("w_a") * F.col("w_b")).cast("bigint").alias("dot_w"),
        )
    )
    na, nb = n2.alias("na"), n2.alias("nb")
    sc = (
        dots.join(na, F.col("a") == F.col("na.doc_id"))
        .join(nb, F.col("b") == F.col("nb.doc_id"))
        .select(
            "a",
            "b",
            "n_shared",
            "dot_w",
            # dot enters the float world BEFORE the ·1e6 (a bigint
            # dot·1000000 could overflow on pathological mega-doc
            # pairs; double·double is correctly rounded and identical
            # cross-engine) — the quotient is parenthesized as ONE
            # operand per the BM25 association rule
            F.floor(
                (F.col("dot_w").cast("double") * F.lit(1000000.0))
                / (
                    F.sqrt(F.col("na.n2").cast("double"))
                    * F.sqrt(F.col("nb.n2").cast("double"))
                )
            )
            .cast("bigint")
            .alias("cos_ppm"),
        )
    )
    rw = Window.partitionBy("a").orderBy(F.desc("cos_ppm"), F.asc("b"))
    return (
        sc.withColumn("rk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rk") <= SC_TOPK)
    )


sparse_cosine_topk.__doc__ = (
    "Two-phase prefix-indexed TF-IDF cosine top-k over the near-dup "
    "corpus; see the block comment above for the determinism and "
    "scale contracts."
)


def _sql_sparse_cosine() -> str:
    return f"""
WITH {DUCK_CORPUS.strip()},
tkn AS (SELECT doc_id, string_split(text, ' ') AS tk FROM corpus),
e AS (SELECT doc_id, unnest(tk) AS term FROM tkn),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM e GROUP BY 1, 2),
stats AS (SELECT count(*) AS n_docs FROM corpus),
dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df
        FROM tf GROUP BY term HAVING count(*) >= {DF_MIN}),
wts AS (
  SELECT doc_id, term,
         least(tf, {SC_TF_CAP})
           * CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 10.0) AS BIGINT)
           AS w
  FROM tf JOIN dfx USING (term), stats),
wp AS (SELECT * FROM wts WHERE w > 0),
n2 AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2
       FROM wp GROUP BY doc_id),
px AS (SELECT doc_id, term FROM (
         SELECT doc_id, term,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY w DESC, term) AS prk
         FROM wp)
       WHERE prk <= {SC_PREFIX}),
cand AS (
  SELECT DISTINCT p1.doc_id AS a, p2.doc_id AS b
  FROM px p1 JOIN px p2
    ON p1.term = p2.term AND p1.doc_id < p2.doc_id),
dots AS (
  SELECT c.a, c.b,
         CAST(count(*) AS INT) AS n_shared,
         CAST(sum(wa.w * wb.w) AS BIGINT) AS dot_w
  FROM cand c
  JOIN wp wa ON wa.doc_id = c.a
  JOIN wp wb ON wb.doc_id = c.b AND wb.term = wa.term
  GROUP BY 1, 2),
sc AS (
  SELECT p.a, p.b, p.n_shared, p.dot_w,
         CAST(floor((CAST(p.dot_w AS DOUBLE) * 1000000.0)
                    / (sqrt(CAST(na.n2 AS DOUBLE))
                       * sqrt(CAST(nb.n2 AS DOUBLE)))) AS BIGINT) AS cos_ppm
  FROM dots p
  JOIN n2 na ON p.a = na.doc_id
  JOIN n2 nb ON p.b = nb.doc_id)
SELECT a, b, n_shared, dot_w, cos_ppm, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY a
                                   ORDER BY cos_ppm DESC, b) AS rk
      FROM sc)
WHERE rk <= {SC_TOPK}
"""


SQL_SPARSE_COSINE_TOPK = _sql_sparse_cosine()


# --------------------------------------------------------------------------
# ndcg_eval — NDCG@{k} of the BM25 retriever against the workload's
# graded relevance (gain = n_terms matched: 2 = fully relevant, 1 =
# partial), the standard ranking-quality report next to
# rank_agreement's system-agreement view.  Single-sourced: candidates
# and the ranked list come from the SAME _bm25_scores relation and the
# SAME _bm25_rank window as bm25_topk (oracle reuses the exact CTE
# texts), so the eval can never measure a different retriever.
#
# Determinism: the 1/log2(r+1) position discounts are PRECOMPUTED
# integer-micro literals (the same table in both engines — no runtime
# log2), so DCG/IDCG are exact integer sums and ndcg_ppm is _ppm_exact
# integer staging.  IDCG ties need no cross-engine tie-break: equal
# gains contribute equally wherever they land among tied ranks.
#
# Scale shape: ONE scoring job (the candidate relation is
# localCheckpointed before its two-consumer fan-out — ranked list +
# ideal ranking; the dist_drift rule), both windows partition on
# query_id, rollups are query-grain.
# --------------------------------------------------------------------------

# floor(1e6 / log2(r + 1)) for r = 1..BM25_TOPK
NDCG_DISC = [1000000, 630929, 500000, 430676, 386852]
assert len(NDCG_DISC) == BM25_TOPK

_DISC_CASE = (
    "CASE {rk} "
    + " ".join(f"WHEN {r + 1} THEN {d}" for r, d in enumerate(NDCG_DISC))
    + " END"
)


def ndcg_eval(spark, sf_dir):
    agg = _bm25_scores(spark, sf_dir).localCheckpoint()
    ranked = _bm25_rank(agg)
    dcg = ranked.groupBy("query_id").agg(
        F.sum(
            F.col("n_terms") * F.expr(_DISC_CASE.format(rk="rk"))
        ).cast("bigint").alias("dcg_micro")
    )
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("n_terms"), F.desc("score_micro"), F.asc("doc_id")
    )
    idcg = (
        agg.withColumn("irk", F.row_number().over(iw))
        .filter(F.col("irk") <= BM25_TOPK)
        .groupBy("query_id")
        .agg(
            F.sum(
                F.col("n_terms") * F.expr(_DISC_CASE.format(rk="irk"))
            ).cast("bigint").alias("idcg_micro")
        )
    )
    return dcg.join(idcg, "query_id").select(
        "query_id",
        "dcg_micro",
        "idcg_micro",
        F.expr(_ppm_exact("dcg_micro", "idcg_micro", "div"))
        .cast("bigint")
        .alias("ndcg_ppm"),
    )


ndcg_eval.__doc__ = f"NDCG@{BM25_TOPK}; see the block comment above."

SQL_NDCG_EVAL = f"""
WITH {DUCK_BM25_AGG_CTES},
ranked AS (
  SELECT query_id, n_terms, rk FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY score_micro DESC, doc_id) AS rk
    FROM agg)
  WHERE rk <= {BM25_TOPK}),
dcg AS (
  SELECT query_id,
         CAST(sum(n_terms * {_DISC_CASE.format(rk="rk")}) AS BIGINT)
           AS dcg_micro
  FROM ranked GROUP BY 1),
ideal AS (
  SELECT query_id, n_terms, row_number() OVER (
           PARTITION BY query_id
           ORDER BY n_terms DESC, score_micro DESC, doc_id) AS irk
  FROM agg),
idcg AS (
  SELECT query_id,
         CAST(sum(n_terms * {_DISC_CASE.format(rk="irk")}) AS BIGINT)
           AS idcg_micro
  FROM ideal WHERE irk <= {BM25_TOPK} GROUP BY 1)
SELECT query_id, dcg_micro, idcg_micro,
       CAST({_ppm_exact('dcg_micro', 'idcg_micro', '//')} AS BIGINT)
         AS ndcg_ppm
FROM dcg JOIN idcg USING (query_id)
"""


# --------------------------------------------------------------------------
# kwic_concordance — keyword-in-context concordance lines for the
# BM25 query workload (the corpus-audit view behind every "show me
# how this term is actually used" request: decontamination forensics,
# blocklist tuning, and query debugging all read KWIC lines, not bare
# postings): for each workload term, up to {cap} occurrences with
# {ctx} tokens of left/right context.  The term set is SINGLE-SOURCED
# with the retrievers (_query_terms / the `q` CTE), so the
# concordance audits exactly what BM25 queries.
#
# Determinism: context strings are pure slices of the bound token
# array (empty-edge slices render '' — DuckDB needs the documented
# coalesce since array_to_string([]) is NULL); occurrence ranking is
# (doc_id, pos) per term.
#
# Scale shape: ONE corpus tokenization feeding both the workload
# selection and the position explode (localCheckpointed d); the
# workload broadcast-joins into the occurrence stream so only
# matching positions survive; per-term cap via a term-grain window.
# --------------------------------------------------------------------------

KWIC_CAP = 10
KWIC_CTX = 2


def kwic_concordance(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", toks(F.col("text")).alias("_tk")
    ).localCheckpoint()  # feeds the workload stats + the pos explode
    tf = (
        d.select("doc_id", F.explode("_tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )
    qterms = _query_terms(df_).select("query_id", "term")
    occ = d.select(
        "doc_id", "_tk", F.posexplode("_tk").alias("pos0", "w")
    )
    hits = occ.join(F.broadcast(qterms), occ.w == qterms.term).select(
        "query_id",
        "term",
        "doc_id",
        F.col("pos0").cast("int").alias("pos"),
        F.expr(
            f"concat_ws(' ', slice(_tk, greatest(pos0 + 1 - {KWIC_CTX}, 1),"
            f" least({KWIC_CTX}, pos0)))"
        ).alias("left_ctx"),
        F.expr(
            f"concat_ws(' ', slice(_tk, pos0 + 2,"
            f" least({KWIC_CTX}, size(_tk) - pos0 - 1)))"
        ).alias("right_ctx"),
    )
    rw = Window.partitionBy("term").orderBy("doc_id", "pos")
    return (
        hits.withColumn("rk", F.row_number().over(rw).cast("int"))
        .filter(F.col("rk") <= KWIC_CAP)
    )


SQL_KWIC_CONCORDANCE = f"""
WITH {DUCK_BM25_AGG_CTES},
occ AS (
  SELECT doc_id, tk, i - 1 AS pos0
  FROM (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM d)
),
hits AS (
  SELECT q.query_id, q.term, o.doc_id, CAST(o.pos0 AS INT) AS pos,
         coalesce(array_to_string(
           o.tk[greatest(o.pos0 + 1 - {KWIC_CTX}, 1):o.pos0], ' '), '')
           AS left_ctx,
         coalesce(array_to_string(
           o.tk[o.pos0 + 2:least(o.pos0 + 1 + {KWIC_CTX}, len(o.tk))], ' '),
           '') AS right_ctx
  FROM occ o JOIN q ON o.tk[o.pos0 + 1] = q.term
)
SELECT query_id, term, doc_id, pos, left_ctx, right_ctx,
       CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY term
                                   ORDER BY doc_id, pos) AS rk
      FROM hits)
WHERE rk <= {KWIC_CAP}
"""


QUERIES = {
    "rank_agreement": rank_agreement,
    "kwic_concordance": kwic_concordance,
    "sparse_cosine_topk": sparse_cosine_topk,
    "ndcg_eval": ndcg_eval,
    "inverted_postings": inverted_postings,
    "bm25_topk": bm25_topk,
    "hard_negatives": hard_negatives,
    "heavy_hitters_cms": heavy_hitters_cms,
    "hybrid_rrf": hybrid_rrf,
    "phrase_query": phrase_query,
}

ORACLE_SQL = {
    "rank_agreement": SQL_RANK_AGREEMENT,
    "kwic_concordance": SQL_KWIC_CONCORDANCE,
    "sparse_cosine_topk": SQL_SPARSE_COSINE_TOPK,
    "ndcg_eval": SQL_NDCG_EVAL,
    "inverted_postings": SQL_INVERTED_POSTINGS,
    "bm25_topk": SQL_BM25_TOPK,
    "hard_negatives": SQL_HARD_NEGATIVES,
    "heavy_hitters_cms": SQL_HEAVY_HITTERS_CMS,
    "hybrid_rrf": SQL_HYBRID_RRF,
    "phrase_query": SQL_PHRASE_QUERY,
}
