"""Deduplication operators for large-scale training-data pipelines:
exact (hash groupBy), MinHash+LSH (shingle → minhash → band → bucket
join), SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Every operator is expressed with built-in Spark functions (JVM-side,
whole-stage codegen — no Python in the hot path) and carries an exact
DuckDB oracle: hashing is md5-based (bit-identical across engines,
see functions/common.py), similarity math is integer-exact (minhash
match fractions, jaccard from counts) or rounded doubles.

Scale notes (10^12 docs): the LSH band join is the scale path — the
only shuffle is on (band, band_value); candidate pairs are bounded by
bucket sizes, never O(n^2).  A skewed band value (boilerplate text)
is handled by AQE skew-join splitting since the join is a plain
equi-join.  The derived near-dup corpus (mutated copies of the first
docs) exists so the small testdata actually exercises the
candidate-pair path end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .common import (
    DUCK_MD5I32,
    DUCK_MD5I60,
    DUCK_MUTATED,
    DUCK_SHINGLES,
    _mutated,
    _ppm_exact,
    md5i32,
    md5i60,
    shingles,
    toks,
)

N_MINHASH = 8
N_BANDS = 4  # 2 rows per band


def _t(spark, sf_dir, name) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _near_dup_corpus(spark, sf_dir) -> DataFrame:
    """documents ∪ mutated copies (first 50 docs, last 3 tokens cut):
    guarantees real near-duplicate pairs in the small testdata."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.unionByName(_mutated(d))


# _mutated / DUCK_MUTATED live in common.py (three consumer modules —
# see the note there); DUCK_CORPUS composes the corpus union from it.
DUCK_CORPUS = f"""
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  {DUCK_MUTATED}
)
"""


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------


def _exact_copies(d: DataFrame) -> DataFrame:
    """Byte-identical copies of the first 30 docs, re-keyed at
    +1100000 (the next free variant-id slot after cdc's +1000000; the
    largest sf's doc_id space tops out at 4999, so any +N00000 offset
    is collision-proof per the repo's offset rule).  Exists because the
    _mutated near-dup variants are truncated, NOT identical — without
    planted exact copies no sha256 group ever reaches n_copies >= 2
    and the driver's dedup_exact hash check only proves both engines
    agree on "empty" (round-3 verdict).  Scoped to dedup_exact — the
    shared _near_dup_corpus feeds ~15 near-dup operators whose
    semantics want near-duplicates, not exact ones."""
    extra = [c for c in d.columns if c not in ("doc_id", "text")]
    return d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 1100000).alias("doc_id"), "text", *extra
    )


def dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    c = d.unionByName(_mutated(d)).unionByName(_exact_copies(d))
    return (
        c.groupBy(F.sha2("text", 256).alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") >= 2)  # report only true dup groups
    )


SQL_DEDUP_EXACT = f"""
WITH {DUCK_CORPUS.strip()},
corpus_x AS (
  SELECT doc_id, text FROM corpus
  UNION ALL
  SELECT doc_id + 1100000 AS doc_id, text FROM documents WHERE doc_id < 30
)
SELECT sha256(text) AS text_hash, min(doc_id) AS keeper, count(*) AS n_copies
FROM corpus_x GROUP BY sha256(text) HAVING count(*) >= 2
"""


# --------------------------------------------------------------------------
# domain_dup_rate — per-source duplication-rate telemetry (the "which
# sites are mirror farms" report every dedup rollout publishes next
# to the global dup-group table): a doc is a dup member iff its exact
# text hash appears >= 2 times ANYWHERE in the corpus (corpus-wide
# groups, per-source attribution — a mirror pair split across two
# sources counts against both, which is the point).  The corpus is
# documents ∪ the planted +1100000 exact copies (single-sourced via
# _exact_copies, which carries `source` through so a copy attributes
# to its original's site), so the relation is non-vacuous at every sf
# even when the corpus has no natural dup (sf0.01 has exactly zero).
#
# Scale shape: ONE scan; the hash table localCheckpoints before its
# two-consumer fan-out (group sizes + the member join — the
# dist_drift rule); group sizes partial-aggregate at hash grain; the
# final rollup is source-grain.  dup_ppm via _ppm_exact.
# --------------------------------------------------------------------------


def domain_dup_rate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    c = d.unionByName(_exact_copies(d))
    h = c.select("source", F.sha2("text", 256).alias("th")).localCheckpoint()
    grp = h.groupBy("th").agg(F.count("*").alias("n_copies"))
    per = (
        h.join(grp, "th")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum((F.col("n_copies") >= 2).cast("int"))
            .cast("bigint")
            .alias("n_dup_docs"),
        )
    )
    return per.select(
        "source",
        "n_docs",
        "n_dup_docs",
        F.expr(_ppm_exact("n_dup_docs", "n_docs", "div"))
        .cast("bigint")
        .alias("dup_ppm"),
    )


SQL_DOMAIN_DUP_RATE = f"""
WITH cx AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT source, text FROM documents WHERE doc_id < 30
),
h AS (SELECT source, sha256(text) AS th FROM cx),
grp AS (SELECT th, count(*) AS n_copies FROM h GROUP BY th),
per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN grp.n_copies >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs
  FROM h JOIN grp USING (th)
  GROUP BY source
)
SELECT source, n_docs, n_dup_docs,
       CAST({_ppm_exact('n_dup_docs', 'n_docs', '//')} AS BIGINT) AS dup_ppm
FROM per
"""


# --------------------------------------------------------------------------
# MinHash + LSH banding
# --------------------------------------------------------------------------


# universal-hash permutation constants over GF(2^31-1): shingles are
# md5-hashed ONCE, the k minhashes are (A_s*h + B_s) mod p — 8x fewer
# md5 calls than hash-per-seed, standard MinHash construction.
_P31 = 2147483647
_A = [
    int(__import__("hashlib").md5(f"A|{s}".encode()).hexdigest()[:8], 16) % (_P31 - 1)
    + 1
    for s in range(N_MINHASH)
]
_B = [
    int(__import__("hashlib").md5(f"B|{s}".encode()).hexdigest()[:8], 16) % _P31
    for s in range(N_MINHASH)
]


def _with_minhash(c: DataFrame) -> DataFrame:
    # tokens bound as a column FIRST: shingles()' slice lambda reads
    # the token array per element, and interpreted HOF eval re-runs
    # lambda-body outer refs per element — handing it the raw split()
    # expression re-splits the whole text per shingle, O(n^2) per doc
    # (the CLAUDE.md HOF rule)
    t = c.select("doc_id", toks(F.col("text")).alias("_tk"))
    sh_h = F.transform(shingles(F.col("_tk")), lambda g: md5i32(g) % _P31)
    mh = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_hs"),
                    lambda h: (F.lit(_A[s]) * h + F.lit(_B[s])) % _P31,
                )
            )
            for s in range(N_MINHASH)
        ]
    )
    return t.select("doc_id", sh_h.alias("_hs")).select("doc_id", mh.alias("mh"))


def _bands(mh_df: DataFrame) -> DataFrame:
    """(doc_id, band, bv) LSH band keys from a (doc_id, mh) table —
    the one banding convention shared by the batch and incremental
    dedup paths (mirrored once, in _duck_mh_ctes' `bands` CTE)."""
    return mh_df.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.concat_ws(
                        "_",
                        F.element_at("mh", b * 2 + 1),
                        F.element_at("mh", b * 2 + 2),
                    ).alias("bv"),
                ),
            )
        ).alias("x"),
    ).select("doc_id", "x.band", "x.bv")


def _band_pairs(bands: DataFrame) -> DataFrame:
    """Distinct (a, b) candidate pairs (a < b) from a (doc_id, band,
    bv) table via the band-key self-equi-join — the one pair-generation
    convention shared by dedup_minhash_lsh and split_leakage (mirrored
    once, in _MH_CTES' `pairs` CTE)."""
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    return (
        b1.join(
            b2,
            (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.bv") == F.col("b2.bv"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(F.col("b1.doc_id").alias("a"), F.col("b2.doc_id").alias("b"))
        .distinct()
    )


def dedup_minhash_lsh(spark, sf_dir):
    # eager localCheckpoint, not persist: the minhash scan (shingles +
    # md5 over full text) is referenced three times below (bands, m1,
    # m2) and must compute ONCE; checkpoint blocks are released by the
    # ContextCleaner when the result goes out of scope, whereas an
    # in-operator persist has no safe unpersist point (the caller's
    # action runs after we return) and pins the unified cache for the
    # rest of the session.
    mh = _with_minhash(_near_dup_corpus(spark, sf_dir)).localCheckpoint()
    pairs = _band_pairs(_bands(mh))
    m1, m2 = mh.alias("m1"), mh.alias("m2")
    return (
        pairs.join(m1, F.col("a") == F.col("m1.doc_id"))
        .join(m2, F.col("b") == F.col("m2.doc_id"))
        .select(
            "a",
            "b",
            (
                F.size(
                    F.filter(
                        F.zip_with("m1.mh", "m2.mh", lambda x, y: x == y),
                        lambda z: z,
                    )
                )
                / F.lit(float(N_MINHASH))
            ).alias("est_sim"),
        )
    )


_A_LIST = "[" + ", ".join(str(a) for a in _A) + "]"
_B_LIST = "[" + ", ".join(str(b) for b in _B) + "]"


def _duck_mh_ctes(src: str, pfx: str) -> str:
    """sh/mh/bands/ex CTEs for an arbitrary (doc_id, text) source —
    the ONE SQL mirror of the minhash + banding formulas (_MH_CTES is
    defined THROUGH this, and the incremental op instantiates it twice
    to model two corpora in one query — the two can never desync)."""
    return f"""
{pfx}sh AS (
  SELECT doc_id, list_transform(
           {DUCK_SHINGLES.format(l="string_split(text,' ')")},
           g -> {DUCK_MD5I32.format(x="g")} % {_P31}) AS hs
  FROM {src}
),
{pfx}mh AS (
  SELECT doc_id,
         list_transform(range(1, {N_MINHASH + 1}), i ->
           list_min(list_transform(hs,
             h -> ({_A_LIST}[i] * h + {_B_LIST}[i]) % {_P31}))) AS mh
  FROM {pfx}sh
),
{pfx}bands AS (
  SELECT doc_id, b.band,
         mh[b.band * 2 + 1] || '_' || mh[b.band * 2 + 2] AS bv
  FROM {pfx}mh, (SELECT unnest(range(0, {N_BANDS})) AS band) b
),
{pfx}ex AS (
  SELECT doc_id, unnest(mh) AS v, generate_subscripts(mh, 1) AS i FROM {pfx}mh
)"""


_MH_CTES = f"""
WITH {DUCK_CORPUS.strip()},
{_duck_mh_ctes("corpus", "").lstrip()},
pairs AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.bv = b2.bv AND b1.doc_id < b2.doc_id
)
"""

SQL_DEDUP_MINHASH = (
    _MH_CTES
    + f"""
SELECT p.a, p.b,
       sum(CASE WHEN e1.v = e2.v THEN 1 ELSE 0 END) / {float(N_MINHASH)} AS est_sim
FROM pairs p
JOIN ex e1 ON e1.doc_id = p.a
JOIN ex e2 ON e2.doc_id = p.b AND e2.i = e1.i
GROUP BY p.a, p.b
"""
)


# --------------------------------------------------------------------------
# dedup_eval — recall/precision of the banded MinHash candidate set
# against the corpus's PLANTED ground truth (the _mutated convention:
# every doc_id < 50 has a suffix-truncated copy at +100000).  Every
# dedup rollout is judged by exactly this relation — "what fraction of
# known duplicates does the banding catch, and how much of what it
# emits is the planted signal" — and making it a first-class operator
# means the recall number is oracle-checked cross-engine instead of
# living only in a pytest threshold.  Precision here is measured
# against the planted set specifically: organic band pairs (real
# near-dups the base corpus happens to contain) count against it by
# construction — documented, since the planted set is the only ground
# truth that exists.
#
# Scale shape: the found side is dedup_minhash_lsh's audited plan
# (banded equi-join, checkpointed minhash); the planted side is a
# narrow filtered scan; the comparison is ONE pair-grain full-outer
# equi-join on (a, b) followed by a single 1-row aggregate — nothing
# corpus-sized survives.  Ratio denominators are pair counts (far
# under the _ppm_exact ~9.2e15 staging bound), zero-guarded with
# greatest(..., 1).
# --------------------------------------------------------------------------

DEDUP_PLANT_OFFSET = 100000  # the _mutated re-key (single source: above)
DEDUP_PLANT_MAX = 50  # docs with doc_id < this carry a planted mutant


def dedup_eval(spark, sf_dir):
    found = (
        dedup_minhash_lsh(spark, sf_dir)
        .select("a", "b")
        .withColumn("f", F.lit(1))
    )
    planted = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < DEDUP_PLANT_MAX)
        .select(
            F.col("doc_id").alias("a"),
            (F.col("doc_id") + DEDUP_PLANT_OFFSET).alias("b"),
        )
        .withColumn("p", F.lit(1))
    )
    j = planted.join(found, ["a", "b"], "full_outer")
    agg = j.agg(
        F.sum("p").cast("bigint").alias("n_planted"),
        F.sum("f").cast("bigint").alias("n_found"),
        F.sum(
            F.when(F.col("p").isNotNull() & F.col("f").isNotNull(), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("n_hit"),
    )
    return agg.select(
        "n_planted",
        "n_found",
        "n_hit",
        F.expr(_ppm_exact("n_hit", "greatest(n_planted, 1)", "div"))
        .cast("bigint")
        .alias("recall_ppm"),
        F.expr(_ppm_exact("n_hit", "greatest(n_found, 1)", "div"))
        .cast("bigint")
        .alias("precision_ppm"),
    )


SQL_DEDUP_EVAL = (
    _MH_CTES
    + f""",
planted AS (
  SELECT doc_id AS a, doc_id + {DEDUP_PLANT_OFFSET} AS b
  FROM documents WHERE doc_id < {DEDUP_PLANT_MAX}
),
j AS (
  SELECT CASE WHEN pl.a IS NOT NULL THEN 1 END AS p,
         CASE WHEN pr.a IS NOT NULL THEN 1 END AS f
  FROM planted pl FULL OUTER JOIN pairs pr
    ON pl.a = pr.a AND pl.b = pr.b
),
agg AS (
  SELECT count(p) AS n_planted, count(f) AS n_found,
         sum(CASE WHEN p IS NOT NULL AND f IS NOT NULL THEN 1 ELSE 0 END)
           AS n_hit
  FROM j
)
SELECT CAST(n_planted AS BIGINT) AS n_planted,
       CAST(n_found AS BIGINT) AS n_found,
       CAST(n_hit AS BIGINT) AS n_hit,
       CAST({_ppm_exact('n_hit', 'greatest(n_planted, 1)', '//')} AS BIGINT)
         AS recall_ppm,
       CAST({_ppm_exact('n_hit', 'greatest(n_found, 1)', '//')} AS BIGINT)
         AS precision_ppm
FROM agg
"""
)


# --------------------------------------------------------------------------
# dup_verify_edit — edit-distance verification of LSH candidate pairs
# (the confirm stage after banding): MinHash banding over-generates —
# boilerplate band collisions produce candidate pairs that are not
# near-duplicates — so production dedup confirms each candidate with
# a direct string comparison before dropping documents.  Full-text
# Levenshtein is O(len_a × len_b) per pair and unusable on multi-KB
# web documents, so the verify runs on a bounded common-prefix window
# W = least(len_a, len_b, EDIT_PREFIX): DP cost is capped at
# EDIT_PREFIX^2 per pair regardless of document size, and a
# suffix-truncation near-dup (the corpus's mutation class) scores a
# perfect window similarity while unrelated collision pairs score the
# base character-overlap of independent text.  `levenshtein` exists in
# both engines but is NOT cross-engine exact on raw text: Spark counts
# CHARACTER edits while DuckDB counts BYTE edits (measured:
# levenshtein('héllo','hello') = 1 in Spark, 2 in DuckDB — é is two
# UTF-8 bytes), so both sides ASCII-project the comparison windows
# first (non-ASCII codepoint → '?', one char in both engines).  The
# projection is applied AFTER the code-point-aligned substr (substr /
# length agree cross-engine) and makes the distance integer-exact;
# distinct non-ASCII chars collapsing to '?' is a documented
# approximation of the verify signal, not a correctness leak.  RULE:
# never feed raw (potentially non-ASCII) text to cross-engine
# levenshtein — byte-vs-char semantics silently diverge.
#
# sim_ppm = (W − dist) · 10^6 div W (integer; W ≥ dist always since
# dist ≤ max(len of the two W-prefixes) = W), is_dup at ≥ 900k ppm.
#
# Scale shape (100 TB): candidates come from the band equi-join
# (never all-pairs); full text joins only onto candidate pair ids
# (two equi-joins), and the DP window bounds per-pair compute.
# --------------------------------------------------------------------------

EDIT_PREFIX = 192
EDIT_DUP_MIN_PPM = 900_000


def dup_verify_edit(spark, sf_dir):
    c = _near_dup_corpus(spark, sf_dir)
    # the minhash table feeds both sides of the band self-join —
    # checkpoint so the shingle+md5 corpus pass computes ONCE (the
    # dedup_minhash_lsh rule; without it both join sides replan the
    # full scan).  The text fetch below re-reads only the narrow
    # (doc_id, text) corpus projection onto candidate ids.
    mh = _with_minhash(c).localCheckpoint()
    pairs = _band_pairs(_bands(mh))
    c1 = c.select(F.col("doc_id").alias("_id1"), F.col("text").alias("_t1"))
    c2 = c.select(F.col("doc_id").alias("_id2"), F.col("text").alias("_t2"))
    w = F.least(
        F.length("_t1"), F.length("_t2"), F.lit(EDIT_PREFIX)
    ).alias("w")
    j = (
        pairs.join(c1, F.col("a") == F.col("_id1"))
        .join(c2, F.col("b") == F.col("_id2"))
        .select("a", "b", w, "_t1", "_t2")
    )

    def _ascii_win(t):  # byte==char only on ASCII; see header RULE
        return F.regexp_replace(
            F.substring(t, F.lit(1), F.col("w")), "[^\\x00-\\x7F]", "?"
        )

    dist = F.levenshtein(_ascii_win(F.col("_t1")), _ascii_win(F.col("_t2")))
    scored = j.select(
        "a",
        "b",
        F.col("w").cast("bigint").alias("w"),
        dist.cast("bigint").alias("edit_dist"),
    )
    sim = (
        (F.col("w") - F.col("edit_dist"))
        * F.lit(1_000_000)
        / F.greatest(F.col("w"), F.lit(1))
    ).cast("bigint")
    return scored.select(
        "a",
        "b",
        "w",
        "edit_dist",
        sim.alias("sim_ppm"),
        (sim >= EDIT_DUP_MIN_PPM).cast("int").alias("is_dup"),
    )


SQL_DUP_VERIFY_EDIT = (
    _MH_CTES
    + f"""
SELECT a, b, w, edit_dist,
       (w - edit_dist) * 1000000 // greatest(w, 1) AS sim_ppm,
       CASE WHEN (w - edit_dist) * 1000000 // greatest(w, 1)
                 >= {EDIT_DUP_MIN_PPM}
            THEN 1 ELSE 0 END AS is_dup
FROM (
  SELECT p.a, p.b,
         CAST(least(length(c1.text), length(c2.text), {EDIT_PREFIX})
              AS BIGINT) AS w,
         CAST(levenshtein(
           regexp_replace(substr(c1.text, 1,
                  least(length(c1.text), length(c2.text), {EDIT_PREFIX})),
                '[^\\x00-\\x7f]', '?', 'g'),
           regexp_replace(substr(c2.text, 1,
                  least(length(c1.text), length(c2.text), {EDIT_PREFIX})),
                '[^\\x00-\\x7f]', '?', 'g')
         ) AS BIGINT) AS edit_dist
  FROM pairs p
  JOIN corpus c1 ON c1.doc_id = p.a
  JOIN corpus c2 ON c2.doc_id = p.b
)
"""
)


# --------------------------------------------------------------------------
# dedup_incremental — new-batch-vs-corpus dedup (the daily-crawl
# shape): the EXISTING corpus carries a minhash band index (in
# production a stored table, appended to per batch and bucketed by
# band value), the new batch minhashes itself, equi-joins the index on
# the band key, verifies candidates by minhash agreement, and emits a
# per-new-doc keep/drop decision with its best corpus match.  New docs
# are never compared to each other here — intra-batch dedup is the
# standard dedup_minhash_lsh pass; this op is the cross-snapshot half
# that avoids rescanning 10^12 existing docs per increment.
#
# Scale shape: the index probe is an equi-join on (band, bv); with the
# stored index bucketed by bv only the increment (10^9 vs 10^12)
# shuffles.  Verification joins fetch only candidate signatures, and
# the best-match election windows on new_id — batch-cardinality keys,
# no skew pileup.  The increment here is synthesized deterministically
# (mutated near-dups of existing docs + md5-fresh docs) so both the
# hit and the miss paths are exercised and oracle-checked.
# --------------------------------------------------------------------------

INC_DUP_MIN_MATCH2 = N_MINHASH  # is_dup ⇔ n_match * 2 >= N_MINHASH (sim ≥ 0.5)


def _fresh_batch(d: DataFrame) -> DataFrame:
    """Deterministic genuinely-new docs (first 20 ids, re-keyed at
    +300000): 8 md5-derived tokens that match nothing in the corpus."""
    sid = F.col("doc_id").cast("string")
    words = [
        F.concat(
            F.lit("zz"),
            F.substring(F.md5(F.concat(F.lit(f"fresh|{i}|"), sid)), 1, 6),
        )
        for i in range(8)
    ]
    return d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.concat_ws(" ", *words).alias("text"),
    )


# --------------------------------------------------------------------------
# snapshot_diff — crawl-snapshot CDC: classify every doc_id across two
# snapshots as added / removed / changed / same by content digest.
# This is the bookkeeping step in front of dedup_incremental: a daily
# recrawl feeds only its 'added' + 'changed' rows into the signature
# probe, so the 10^12-doc base is never rescanned.  Snapshot B is
# synthesized deterministically from A (doc_id % 11 == 2 removed,
# doc_id % 7 == 1 rewritten, first 30 ids re-keyed at +500000 as new).
#
# Scale shape (100 TB): each side reduces to (doc_id, md5) BEFORE the
# full-outer join — text never moves; with both snapshots bucketed by
# doc_id (io.py convention) the join is co-located, zero Exchange.
# --------------------------------------------------------------------------


def _snapshot_b(a):
    """Snapshot B's deterministic mutation of A (doc_id % 11 == 2
    removed, % 7 == 1 rewritten, first 30 ids re-keyed at +500000 as
    new) — single-sourced for snapshot_diff and scd2_history."""
    rem = F.col("doc_id") % 11 == 2
    chg = F.col("doc_id") % 7 == 1
    return (
        a.filter(~rem)
        .select(
            "doc_id",
            F.when(chg, F.concat(F.col("text"), F.lit(" rev2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            a.filter(F.col("doc_id") < 30).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.concat(F.lit("new "), F.col("text")).alias("text"),
            )
        )
    )


# oracle mirror of _snapshot_b over a CTE named `a` (doc_id, text)
_DUCK_SNAPSHOT_B = """
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 1 THEN text || ' rev2' ELSE text END AS text
  FROM a WHERE doc_id % 11 <> 2
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, 'new ' || text AS text
  FROM a WHERE doc_id < 30
"""


def snapshot_diff(spark, sf_dir):
    a = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b = _snapshot_b(a)
    ah = a.select("doc_id", F.md5("text").alias("ha"))
    bh = b.select("doc_id", F.md5("text").alias("hb"))
    j = ah.join(bh, "doc_id", "full_outer")
    status = (
        F.when(F.col("ha").isNull(), "added")
        .when(F.col("hb").isNull(), "removed")
        .when(F.col("ha") != F.col("hb"), "changed")
        .otherwise("same")
    )
    return j.select("doc_id", status.alias("status"))


SQL_SNAPSHOT_DIFF = f"""
WITH a AS (SELECT doc_id, text FROM documents),
b AS ({_DUCK_SNAPSHOT_B}),
ah AS (SELECT doc_id, md5(text) AS ha FROM a),
bh AS (SELECT doc_id, md5(text) AS hb FROM b)
SELECT coalesce(ah.doc_id, bh.doc_id) AS doc_id,
  CASE WHEN ha IS NULL THEN 'added'
       WHEN hb IS NULL THEN 'removed'
       WHEN ha <> hb THEN 'changed'
       ELSE 'same' END AS status
FROM ah FULL OUTER JOIN bh ON ah.doc_id = bh.doc_id
"""


# --------------------------------------------------------------------------
# scd2_history — type-2 slowly-changing-dimension history over crawl
# snapshots: the "which version of this page was live at snapshot t"
# relation every recrawl archive needs (provenance, point-in-time
# reconstruction, dedup-against-what-was-live).  Three deterministic
# snapshots: A (t=0), B = _snapshot_b(A) (t=1, the snapshot_diff
# convention), C (t=2) = B with doc_id % 13 == 3 removed, % 5 == 2
# rewritten ' rev3', first 20 A-ids re-keyed at +600000, and the
# B-removed ids < 60 RE-ADDED with their original text (a dropped
# page re-crawled unchanged).  A version run breaks on digest CHANGE
# or presence GAP — the re-added pages pin the gap rule: identical
# content, but the live-range genuinely has a hole, so a new interval
# starts; valid_to = the first snapshot where the version no longer
# holds, NULL = still current.
#
# Scale shape (100 TB): each snapshot reduces to (doc_id, t, md5)
# before anything moves — text never shuffles; the lag/run-id windows
# and the (doc_id, ver) rollup all share ONE hashpartitioning(doc_id)
# Exchange (the rollup's grouping keys are a superset of the window
# key, so Catalyst reuses the partitioning), ≤3 rows per doc.
# --------------------------------------------------------------------------

SCD2_T_MAX = 2


def _snapshot_c(a, b):
    rem = F.col("doc_id") % 13 == 3
    chg = F.col("doc_id") % 5 == 2
    return (
        b.filter(~rem)
        .select(
            "doc_id",
            F.when(chg, F.concat(F.col("text"), F.lit(" rev3")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            a.filter(F.col("doc_id") < 20).select(
                (F.col("doc_id") + 600000).alias("doc_id"),
                F.concat(F.lit("v3 "), F.col("text")).alias("text"),
            )
        )
        .unionByName(
            a.filter(
                (F.col("doc_id") % 11 == 2) & (F.col("doc_id") < 60)
            ).select("doc_id", "text")
        )
    )


def scd2_history(spark, sf_dir):
    a = _t(spark, sf_dir, "documents").select("doc_id", "text")
    b = _snapshot_b(a)
    c = _snapshot_c(a, b)
    ev = (
        a.select("doc_id", F.lit(0).alias("t"), F.md5("text").alias("h"))
        .unionByName(
            b.select("doc_id", F.lit(1).alias("t"), F.md5("text").alias("h"))
        )
        .unionByName(
            c.select("doc_id", F.lit(2).alias("t"), F.md5("text").alias("h"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy("t")
    lag_h = F.lag("h").over(w)
    lag_t = F.lag("t").over(w)
    start = F.when(lag_h.isNull(), F.lit(True)).otherwise(
        (lag_h != F.col("h")) | (lag_t != F.col("t") - 1)
    )
    run = ev.withColumn(
        "ver",
        F.sum(start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    g = run.groupBy("doc_id", "ver").agg(
        F.min("h").alias("digest"),
        F.min("t").alias("valid_from"),
        F.max("t").alias("last_seen"),
    )
    return g.select(
        "doc_id",
        "digest",
        F.col("valid_from").cast("int").alias("valid_from"),
        F.when(F.col("last_seen") < SCD2_T_MAX, F.col("last_seen") + 1)
        .cast("int")
        .alias("valid_to"),
        (F.col("last_seen") == SCD2_T_MAX).alias("is_current"),
    )


SQL_SCD2_HISTORY = f"""
WITH a AS (SELECT doc_id, text FROM documents),
b AS ({_DUCK_SNAPSHOT_B}),
c AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 2 THEN text || ' rev3' ELSE text END AS text
  FROM b WHERE doc_id % 13 <> 3
  UNION ALL
  SELECT doc_id + 600000 AS doc_id, 'v3 ' || text AS text
  FROM a WHERE doc_id < 20
  UNION ALL
  SELECT doc_id, text FROM a WHERE doc_id % 11 = 2 AND doc_id < 60
),
ev AS (
  SELECT doc_id, 0 AS t, md5(text) AS h FROM a
  UNION ALL SELECT doc_id, 1, md5(text) FROM b
  UNION ALL SELECT doc_id, 2, md5(text) FROM c
),
runs AS (
  SELECT doc_id, t, h,
         sum(CASE WHEN lag_h IS NULL OR lag_h <> h OR lag_t <> t - 1
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS ver
  FROM (SELECT doc_id, t, h,
               lag(h) OVER (PARTITION BY doc_id ORDER BY t) AS lag_h,
               lag(t) OVER (PARTITION BY doc_id ORDER BY t) AS lag_t
        FROM ev)
),
g AS (
  SELECT doc_id, ver, min(h) AS digest,
         min(t) AS valid_from, max(t) AS last_seen
  FROM runs GROUP BY 1, 2
)
SELECT doc_id, digest,
       CAST(valid_from AS INT) AS valid_from,
       CAST(CASE WHEN last_seen < {SCD2_T_MAX} THEN last_seen + 1 END AS INT)
         AS valid_to,
       last_seen = {SCD2_T_MAX} AS is_current
FROM g
"""


def dedup_incremental(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # eager localCheckpoint on both signature tables — each is
    # referenced by multiple branches below (bands + the verification
    # join, + inc_ids) and the shingle+md5 minhash derivation must
    # compute ONCE per corpus, not once per reference (same rationale
    # as dedup_minhash_lsh; without it the plan re-scans the corpus
    # per branch).  In production base_mh IS the stored index table.
    base_mh = _with_minhash(d).localCheckpoint()
    inc_mh = _with_minhash(
        _mutated(d).unionByName(_fresh_batch(d))
    ).localCheckpoint()
    return _score_increment(inc_mh, base_mh)


def _score_increment(
    inc_mh: DataFrame, base_mh: DataFrame, base_bands: DataFrame | None = None
) -> DataFrame:
    """Probe the corpus signature index with an increment's signatures
    and elect each new doc's best corpus match.  Callers pass
    checkpointed/stored signature tables (both are referenced by
    multiple branches); a caller scoring MANY increments against one
    corpus (the streaming ingest loop) passes the band index
    precomputed so the corpus is never re-banded per batch — in
    production both base tables are stored, band-bucketed tables."""
    if base_bands is None:
        base_bands = _bands(base_mh)
    base_bands = base_bands.withColumnRenamed("doc_id", "old_id")
    inc_bands = _bands(inc_mh).withColumnRenamed("doc_id", "new_id")
    cand = (
        inc_bands.join(base_bands, ["band", "bv"])
        .select("new_id", "old_id")
        .distinct()
    )
    scored = (
        cand.join(
            base_mh.select(F.col("doc_id").alias("old_id"), F.col("mh").alias("mh_o")),
            "old_id",
        )
        .join(
            inc_mh.select(F.col("doc_id").alias("new_id"), F.col("mh").alias("mh_n")),
            "new_id",
        )
        .select(
            "new_id",
            "old_id",
            F.size(
                F.filter(F.zip_with("mh_n", "mh_o", lambda x, y: x == y), lambda z: z)
            ).alias("n_match"),
        )
    )
    w = Window.partitionBy("new_id").orderBy(F.desc("n_match"), F.asc("old_id"))
    best = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("new_id", F.col("old_id").alias("best_old"), "n_match")
    )
    inc_ids = inc_mh.select(F.col("doc_id").alias("new_id"))
    nm = F.coalesce("n_match", F.lit(0))
    return inc_ids.join(best, "new_id", "left").select(
        "new_id",
        "best_old",
        nm.alias("n_match"),
        (nm * 2 >= INC_DUP_MIN_MATCH2).cast("int").alias("is_dup"),
    )


def _duck_fresh_words() -> str:
    return " || ' ' || ".join(
        f"'zz' || substr(md5('fresh|{i}|' || CAST(doc_id AS VARCHAR)), 1, 6)"
        for i in range(8)
    )


SQL_DEDUP_INCREMENTAL = f"""
WITH base AS (SELECT doc_id, text FROM documents),
inc AS (
  {DUCK_MUTATED}
  UNION ALL
  SELECT doc_id + 300000 AS doc_id, {_duck_fresh_words()} AS text
  FROM documents WHERE doc_id < 20
),
{_duck_mh_ctes("base", "b").lstrip()},
{_duck_mh_ctes("inc", "n").lstrip()},
cand AS (
  SELECT DISTINCT nb.doc_id AS new_id, bb.doc_id AS old_id
  FROM nbands nb JOIN bbands bb ON nb.band = bb.band AND nb.bv = bb.bv
),
sc AS (
  SELECT c.new_id, c.old_id,
         CAST(sum(CASE WHEN e1.v = e2.v THEN 1 ELSE 0 END) AS INT) AS n_match
  FROM cand c
  JOIN nex e1 ON e1.doc_id = c.new_id
  JOIN bex e2 ON e2.doc_id = c.old_id AND e2.i = e1.i
  GROUP BY 1, 2
),
best AS (
  SELECT new_id, old_id AS best_old, n_match
  FROM (SELECT *, row_number() OVER (PARTITION BY new_id
                                     ORDER BY n_match DESC, old_id) AS rk
        FROM sc)
  WHERE rk = 1
)
SELECT i.doc_id AS new_id, best.best_old,
       CAST(coalesce(best.n_match, 0) AS INT) AS n_match,
       CAST(coalesce(best.n_match, 0) * 2 >= {INC_DUP_MIN_MATCH2} AS INT)
         AS is_dup
FROM inc i LEFT JOIN best ON best.new_id = i.doc_id
"""


# --------------------------------------------------------------------------
# SimHash (60-bit, shingle-level) with banded LSH candidate search.
#
# The fingerprint is computed per row as ONE narrow expression (nested
# higher-order functions: for each of the 60 bits, sum the ±1 votes of
# the shingle hashes and keep the sign) — no per-bit explode, nothing
# shuffles until the fingerprints are banded.  Candidate pairs come
# from Manku-style block combinations (Manku/Jain/Das Sarma, WWW'07):
# the fingerprint splits into SIM_BANDS blocks of SIM_BAND_BITS bits,
# and each doc is keyed by every SIM_MATCH_BANDS-subset of blocks —
# C(SIM_BANDS, SIM_MATCH_BANDS) tables whose keys are
# SIM_MATCH_BANDS×SIM_BAND_BITS bits wide.  Two docs within Hamming
# distance k differ in at most k blocks, so they share an untouched
# m-subset whenever k <= SIM_BANDS − SIM_MATCH_BANDS: recall is
# GUARANTEED up to that radius and probabilistic beyond it, out to the
# reported SIM_HAMMING_MAX filter.  A final Hamming check (bit_count of
# xor) keeps real near-dups.
#
# Scale notes (10^12 docs): fingerprinting is zero-shuffle; the only
# shuffle key is (combo_id, key) and the expected bucket size is
# n / 2^(SIM_MATCH_BANDS × SIM_BAND_BITS) — the candidate join is
# quadratic IN THE BUCKET, so the key width is the scale dial and must
# grow with log2(n).  m=2 (20-bit keys) keeps buckets O(1) to ~10^7
# docs; 10^12 docs needs m=4 (40-bit keys, guaranteed radius 2, still
# C(6,4)=15 tables).  A guaranteed radius ≥3 AND 40-bit keys can't
# both come out of 60 bits — that configuration requires widening the
# fingerprint (e.g. two independent 60-bit simhashes from disjoint
# hash families), not shrinking the key.  60 bits (15 md5 hex chars)
# is the widest simhash exact in a signed bigint in both engines;
# shingle features (not tokens) keep the fingerprint discriminative
# even over small vocabularies.
# --------------------------------------------------------------------------

SIM_BITS = 60
SIM_BANDS = 6
SIM_BAND_BITS = 10  # SIM_BANDS * SIM_BAND_BITS == SIM_BITS
SIM_MATCH_BANDS = 2  # m: key width m×10 bits, guaranteed radius 6−m
SIM_HAMMING_MAX = 8

_SIM_COMBOS = list(
    __import__("itertools").combinations(range(SIM_BANDS), SIM_MATCH_BANDS)
)

_SIMHASH_EXPR = f"""
aggregate(
  transform(sequence(0, {SIM_BITS - 1}), b ->
    CASE WHEN aggregate(_hs, 0L, (acc, h) -> acc + ((shiftright(h, b) & 1) * 2 - 1)) > 0
         THEN shiftleft(1L, b) ELSE 0L END),
  0L, (acc, x) -> acc + x)
"""


def _with_simhash(c: DataFrame) -> DataFrame:
    # tokens bound first — same O(n^2) HOF trap as _with_minhash
    t = c.select("doc_id", toks(F.col("text")).alias("_tk"))
    hs = F.transform(shingles(F.col("_tk")), md5i60)
    return t.select("doc_id", hs.alias("_hs")).select(
        "doc_id", F.expr(_SIMHASH_EXPR).alias("simhash")
    )


def _sim_combo_key(col, combo):
    """Concatenate the combo's block values into one integer key
    (block at combo position p occupies bits [p*B, (p+1)*B))."""
    key = F.lit(0).cast("long")
    for pos, k in enumerate(combo):
        block = F.shiftright(col, SIM_BAND_BITS * k).bitwiseAND(
            F.lit(2**SIM_BAND_BITS - 1)
        )
        key = key + block * F.lit(2 ** (SIM_BAND_BITS * pos)).cast("long")
    return key


def dedup_simhash(spark, sf_dir):
    sim = _with_simhash(_near_dup_corpus(spark, sf_dir))
    band_arr = F.array(
        *[
            F.struct(
                F.lit(ci).alias("band"),
                _sim_combo_key(F.col("simhash"), combo).alias("bv"),
            )
            for ci, combo in enumerate(_SIM_COMBOS)
        ]
    )
    bands = sim.select(
        "doc_id", "simhash", F.explode(band_arr).alias("x")
    ).select("doc_id", "simhash", "x.band", "x.bv")
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    pairs = (
        b1.join(
            b2,
            (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.bv") == F.col("b2.bv"))
            & (F.col("b1.doc_id") < F.col("b2.doc_id")),
        )
        .select(
            F.col("b1.doc_id").alias("a"),
            F.col("b2.doc_id").alias("b"),
            F.col("b1.simhash").alias("s1"),
            F.col("b2.simhash").alias("s2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).cast("int")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= SIM_HAMMING_MAX)
        .select("a", "b", "hamming")
    )


def _duck_combo_key(combo) -> str:
    """DuckDB mirror of _sim_combo_key for one block combination."""
    return " + ".join(
        f"(((simhash >> {SIM_BAND_BITS * k}) & {2**SIM_BAND_BITS - 1})"
        f" * {2 ** (SIM_BAND_BITS * pos)})"
        for pos, k in enumerate(combo)
    )


_DUCK_SIM_BANDS = ",\n           ".join(
    f"struct_pack(band := {ci}, bv := {_duck_combo_key(c)})"
    for ci, c in enumerate(_SIM_COMBOS)
)

SQL_DEDUP_SIMHASH = f"""
WITH {DUCK_CORPUS.strip()},
sh AS (
  SELECT doc_id, list_transform(
           {DUCK_SHINGLES.format(l="string_split(text,' ')")},
           g -> {DUCK_MD5I60.format(x="g")}) AS hs
  FROM corpus
),
sim AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, {SIM_BITS}), b ->
           CASE WHEN list_sum(list_transform(hs, h -> ((h >> b) & 1) * 2 - 1)) > 0
                THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END))
           AS BIGINT) AS simhash
  FROM sh
),
bandx AS (
  SELECT doc_id, simhash,
         unnest([{_DUCK_SIM_BANDS}]) AS x
  FROM sim
),
bands AS (
  SELECT doc_id, simhash, x.band AS band, CAST(x.bv AS BIGINT) AS bv FROM bandx
),
pairs AS (
  SELECT DISTINCT b1.doc_id AS a, b2.doc_id AS b,
         b1.simhash AS s1, b2.simhash AS s2
  FROM bands b1 JOIN bands b2
    ON b1.band = b2.band AND b1.bv = b2.bv AND b1.doc_id < b2.doc_id
)
SELECT a, b, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(s1, s2)) <= {SIM_HAMMING_MAX}
"""


# --------------------------------------------------------------------------
# n-gram Jaccard on rare-shingle candidates
# --------------------------------------------------------------------------


# candidate shingles must appear in JACCARD_DF_MIN..JACCARD_DF_MAX
# docs.  The upper cap bounds the within-shingle pair blowup (a df-d
# shingle emits d(d-1)/2 pairs) — but it is a COVERAGE CAP, not just an
# optimization: a duplicate cluster replicated in MORE than
# JACCARD_DF_MAX copies has every shingle above the cap and emits NO
# edges from this operator.  That regime is exact/boilerplate
# duplication and is owned by dedup_exact and dedup_minhash_lsh (banded
# keys never cap df); this operator's contract is scored edges between
# rare-overlap pairs.
JACCARD_DF_MIN = 2
JACCARD_DF_MAX = 10


def _rare_band_edges(spark, sf_dir):
    """(ds, overlap): the checkpointed shingle explode and the
    rare-band candidate edge relation (a, b, common) — the ONE
    Spark-side definition of the df-band candidate construction,
    shared by dedup_ngram_jaccard and dedup_containment exactly as
    DUCK_EDGE_CTES is its one SQL mirror (a change to the df band,
    the checkpoint discipline, or the common >= 3 cut lands on all
    consumers or none)."""
    c = _near_dup_corpus(spark, sf_dir)
    ds = (
        # tokens bound first — same O(n^2) HOF trap as _with_minhash.
        # localCheckpoint, not persist: ds feeds four consumers below
        # (sizes, rare, and both sides of the candidate self-join) and
        # must compute once; an in-operator persist has no safe
        # unpersist point and pins the unified cache for the session
        # (see dedup_minhash_lsh above — same rule).
        c.select("doc_id", toks(F.col("text")).alias("_tk"))
        .select("doc_id", F.explode(shingles(F.col("_tk"))).alias("sh"))
        .localCheckpoint()
    )
    rare = ds.groupBy("sh").agg(F.countDistinct("doc_id").alias("df")).filter(
        F.col("df").between(JACCARD_DF_MIN, JACCARD_DF_MAX)
    )
    cand = ds.join(F.broadcast(rare.select("sh")), "sh")
    c1, c2 = cand.alias("c1"), cand.alias("c2")
    overlap = (
        c1.join(
            c2,
            (F.col("c1.sh") == F.col("c2.sh"))
            & (F.col("c1.doc_id") < F.col("c2.doc_id")),
        )
        .groupBy(
            F.col("c1.doc_id").alias("a"), F.col("c2.doc_id").alias("b")
        )
        .agg(F.countDistinct("c1.sh").alias("common"))
        .filter(F.col("common") >= 3)
    )
    return ds, overlap


def dedup_ngram_jaccard(spark, sf_dir):
    """Scored Jaccard edges between rare-overlap near-dup pairs.

    CONTRACT (a coverage cap, like POSTINGS_CAP): candidate shingles
    must have df in [JACCARD_DF_MIN, JACCARD_DF_MAX] — see the constants
    comment above.  A cluster replicated in more than JACCARD_DF_MAX
    copies has every shingle above the cap and emits NO edges here;
    that exact/boilerplate regime is owned by dedup_exact and
    dedup_minhash_lsh (banded keys never cap df) — run those alongside
    this operator, never instead of it.  A run that needs the dropped
    mass quantified should aggregate `df > JACCARD_DF_MAX` counts from
    the same shingle table; the cap value is a module constant
    precisely so such an audit can reference it.
    """
    ds, overlap = _rare_band_edges(spark, sf_dir)
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    s1, s2 = sizes.alias("s1"), sizes.alias("s2")
    return (
        overlap.join(s1, F.col("a") == F.col("s1.doc_id"))
        .join(s2, F.col("b") == F.col("s2.doc_id"))
        .select(
            "a",
            "b",
            F.round(
                F.col("common")
                / (F.col("s1.n_sh") + F.col("s2.n_sh") - F.col("common")),
                4,
            ).alias("jaccard"),
        )
    )


# shared rare-shingle edge construction (used by the jaccard oracle AND
# the connected-components oracle — one definition, two consumers, so
# the two oracles cannot desync from each other or from the Spark side)
DUCK_EDGE_CTES = f"""ds AS (
  SELECT doc_id, unnest({DUCK_SHINGLES.format(l="string_split(text,' ')")}) AS sh
  FROM corpus
),
rare AS (SELECT sh FROM ds GROUP BY sh
         HAVING count(DISTINCT doc_id) BETWEEN {JACCARD_DF_MIN} AND {JACCARD_DF_MAX}),
cand AS (SELECT ds.* FROM ds JOIN rare USING (sh)),
edges AS (
  SELECT c1.doc_id AS a, c2.doc_id AS b, count(DISTINCT c1.sh) AS common
  FROM cand c1 JOIN cand c2 ON c1.sh = c2.sh AND c1.doc_id < c2.doc_id
  GROUP BY 1, 2 HAVING count(DISTINCT c1.sh) >= 3
)"""

SQL_DEDUP_JACCARD = f"""
WITH {DUCK_CORPUS.strip()},
{DUCK_EDGE_CTES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM ds GROUP BY doc_id)
SELECT a, b, round(common / (s1.n_sh + s2.n_sh - common), 4) AS jaccard
FROM edges JOIN sizes s1 ON a = s1.doc_id JOIN sizes s2 ON b = s2.doc_id
"""


# --------------------------------------------------------------------------
# dedup_containment — ASYMMETRIC shingle containment (Broder 1997's
# other resemblance measure): |S(a) ∩ S(b)| / |S(a)| and / |S(b)| —
# the sub-document duplication signal jaccard cannot express (a short
# quote fully contained in a long page has tiny jaccard but
# containment ≈ 1 on the quote side; the planted truncated mutants
# are exactly this shape and pytest pins their cand-side containment).
# Candidates come from the SAME rare-shingle edge construction as
# dedup_ngram_jaccard (Spark: _rare_band_edges; SQL: DUCK_EDGE_CTES —
# one definition per engine, shared consumers), inheriting its
# df-band coverage contract — which also BOUNDS the score: the
# numerator counts only rare-band shared shingles while the
# denominators count the FULL distinct shingle set, so containment is
# a lower bound that reaches 1e6 only when every subset shingle sits
# inside the df band (a heavily-replicated subset scores low here and
# is owned by dedup_exact/minhash, the jaccard contract verbatim).
# Note shingles() is already array_distinct, so jaccard's count(*)
# sizes and these countDistinct sizes agree — the cast here is just
# explicit.  All integers; _ppm_exact staging.
#
# Scale shape: identical to dedup_ngram_jaccard — the shingle explode
# localCheckpoints once (sizes + rare + both self-join legs), the
# rare-band broadcast bounds every join bucket.
# --------------------------------------------------------------------------


def dedup_containment(spark, sf_dir):
    ds, overlap0 = _rare_band_edges(spark, sf_dir)
    overlap = overlap0.select(
        "a", "b", F.col("common").cast("bigint").alias("common")
    )
    sizes = ds.groupBy("doc_id").agg(
        F.countDistinct("sh").cast("bigint").alias("n_sh")
    )
    s1, s2 = sizes.alias("s1"), sizes.alias("s2")
    j = (
        overlap.join(s1, F.col("a") == F.col("s1.doc_id"))
        .join(s2, F.col("b") == F.col("s2.doc_id"))
        .select(
            "a",
            "b",
            "common",
            F.col("s1.n_sh").alias("n_sh_a"),
            F.col("s2.n_sh").alias("n_sh_b"),
        )
    )
    return j.select(
        "a",
        "b",
        "common",
        "n_sh_a",
        "n_sh_b",
        F.expr(_ppm_exact("common", "n_sh_a", "div"))
        .cast("bigint")
        .alias("contain_a_ppm"),
        F.expr(_ppm_exact("common", "n_sh_b", "div"))
        .cast("bigint")
        .alias("contain_b_ppm"),
    )


SQL_DEDUP_CONTAINMENT = f"""
WITH {DUCK_CORPUS.strip()},
{DUCK_EDGE_CTES},
dsizes AS (SELECT doc_id, CAST(count(DISTINCT sh) AS BIGINT) AS n_sh
           FROM ds GROUP BY doc_id)
SELECT a, b, CAST(common AS BIGINT) AS common,
       s1.n_sh AS n_sh_a, s2.n_sh AS n_sh_b,
       CAST({_ppm_exact('common', 's1.n_sh', '//')} AS BIGINT)
         AS contain_a_ppm,
       CAST({_ppm_exact('common', 's2.n_sh', '//')} AS BIGINT)
         AS contain_b_ppm
FROM edges
JOIN dsizes s1 ON a = s1.doc_id
JOIN dsizes s2 ON b = s2.doc_id
"""


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------


def _cosine(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n1 = F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    n2 = F.sqrt(
        F.aggregate(
            F.transform(b, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (n1 * n2)


def dedup_embedding_cosine(spark, sf_dir):
    """Embedding near-dup detection with LSH-bucketed candidates: every
    vector gets a random-hyperplane signature bucket (the same
    ``_bucket`` the ANN operators use — one narrow pass), probes search
    their own bucket plus the N_PLANES one-bit-flip neighbors
    (multi-probe: a true near-dup pair straddling ONE hyperplane is
    still found), and cosine is scored only within the probed buckets.

    This is an APPROXIMATE candidate generator — unlike the old
    crossJoin it can miss a near-dup pair whose vectors differ in ≥2
    hyperplane signs (for cos ≥ 0.99 the per-plane disagreement
    probability is ~arccos(0.99)/π ≈ 4.5%, so ≥2-plane misses are
    ~3% at N_PLANES=6 — the price of not being O(n²)).  Scaled copies
    are always found (scaling never flips any sign).

    Scale notes (10^12 docs): the only shuffle key is the bucket id.
    With N_PLANES fixed, expected bucket size is n/2^N_PLANES and the
    within-bucket join is quadratic IN THE BUCKET — so N_PLANES is the
    scale dial and must grow with log2(n) (~40 planes at 10^12 to keep
    buckets O(1)), with multi-probe (and more probes per miss budget)
    paying back the recall each added plane costs."""
    from .similarity import N_PLANES, _bucket

    em = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mut = em.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x.cast("double") * 1.01).alias("embedding"),
    )
    corpus = (
        em.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
        )
        .unionByName(mut)
        .withColumn("bucket", _bucket(F.col("embedding")))
    )
    # probe side fans out x(N_PLANES+1); every candidate has exactly one
    # bucket and the probed keys are distinct, so no pair scores twice
    probes = corpus.filter(F.col("vec_id") >= 100000).select(
        F.col("vec_id"),
        F.col("embedding"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)],
            )
        ).alias("bucket"),
    ).alias("p")
    cos = F.round(_cosine(F.col("p.embedding"), F.col("c.embedding")), 4)
    return (
        probes.join(corpus.alias("c"), F.col("p.bucket") == F.col("c.bucket"))
        .filter(F.col("p.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("p.vec_id").alias("probe_id"),
            F.col("c.vec_id").alias("match_id"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= 0.99)
    )


def _sql_dedup_embedding() -> str:
    from .similarity import DUCK_PLANE_W, N_PLANES

    return f"""
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01)
  FROM embeddings WHERE vec_id < 20
),
ex AS (
  SELECT vec_id, unnest(embedding) AS x, generate_subscripts(embedding, 1) AS j
  FROM corpus
),
pd AS (
  SELECT vec_id, p.p AS p, sum(x * (({DUCK_PLANE_W} % 2001 - 1000) / 1000.0)) AS dot
  FROM ex, (SELECT unnest(range(0, {N_PLANES})) AS p) p
  GROUP BY vec_id, p.p
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM pd GROUP BY vec_id
),
pbuckets AS (
  SELECT vec_id,
         unnest([bucket] || list_transform(range(0, {N_PLANES}),
                                           p -> xor(bucket, CAST(1 << p AS BIGINT))))
           AS bucket
  FROM buckets WHERE vec_id >= 100000
),
dots AS (
  SELECT bp.vec_id AS probe_id, bc.vec_id AS match_id,
         sum(p.x * c.x) AS dot,
         sqrt(sum(p.x * p.x)) AS n1, sqrt(sum(c.x * c.x)) AS n2
  FROM pbuckets bp
  JOIN buckets bc ON bp.bucket = bc.bucket
  JOIN ex p ON p.vec_id = bp.vec_id
  JOIN ex c ON c.vec_id = bc.vec_id AND c.j = p.j
  WHERE bp.vec_id <> bc.vec_id
  GROUP BY 1, 2
)
SELECT probe_id, match_id, round(dot / (n1 * n2), 4) AS cos
FROM dots WHERE round(dot / (n1 * n2), 4) >= 0.99
"""


SQL_DEDUP_EMBEDDING = _sql_dedup_embedding()


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup via k-means clustering + within-cluster
# cosine (Abbas et al. 2023, arXiv:2303.09540)
# --------------------------------------------------------------------------

SEMDEDUP_T = 0.99


def dedup_semantic(spark, sf_dir):
    """SemDeDup over the embedding corpus: every vector is assigned to
    its nearest coarse-centroid cluster (``similarity._assign_lists``
    — the narrow broadcast-argmax map, zero corpus shuffle), candidate
    pairs exist WITHIN a cluster only, and a vector is a semantic
    duplicate iff some lower-id cluster-mate has cosine >= SEMDEDUP_T
    (keeper = the smallest such id — first-occurrence election, the
    same keep rule as ``paragraph_dedup``).  The corpus is embeddings
    ∪ scaled copies (+100000, x1.01) so real epsilon-ball duplicates
    exist in the small testdata: scaling never changes any cosine, so
    each copy lands in its original's cluster and scores cos = 1.

    Scale shape (10^9+ vectors): the only shuffle keys are the cluster
    id (candidate equi-join, AQE-skew-splittable) and the dup-side
    vec_id (min-keeper agg, partial map-side).  Work is
    sum-over-clusters of |cluster|^2, never n^2 — K is the scale dial
    and must grow ~n/const to keep clusters bounded (SemDeDup itself
    runs 50k-100k clusters at LAION scale; K=16 here matches the
    testdata's IVF setup).  Unlike the LSH candidate generator of
    ``dedup_embedding_cosine`` this finds every within-cluster pair
    exactly — the approximation is the clustering boundary itself
    (a pair split across clusters is unseen; the paper accepts this)."""
    from .similarity import _assign_lists, _emb

    em = _emb(spark, sf_dir)
    mut = em.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("v", lambda x: x * 1.01).alias("v"),
    )
    # eager localCheckpoint: the scan + K x d broadcast-argmax
    # assignment feeds three consumers (both self-join sides and the
    # final left join) and must compute once; blocks are released by
    # the ContextCleaner when the result goes out of scope (an
    # in-operator persist has no safe unpersist point — see
    # dedup_minhash_lsh)
    assigned = _assign_lists(em.unionByName(mut)).localCheckpoint()
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = F.round(_cosine(F.col("a.v"), F.col("b.v")), 4)
    hits = (
        a.join(
            b,
            (F.col("a.list_id") == F.col("b.list_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("a.vec_id").alias("cand"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= SEMDEDUP_T)
        .groupBy("vec_id")
        .agg(F.min("cand").alias("keeper"))
    )
    return (
        assigned.select("vec_id", "list_id")
        .join(hits, "vec_id", "left")
        .select(
            "vec_id",
            "list_id",
            F.when(F.col("keeper").isNotNull(), 1).otherwise(0).alias("is_dup"),
            "keeper",
        )
    )


def _sql_dedup_semantic() -> str:
    from .similarity import CENTROID_BASE, N_CENTROIDS

    return f"""
WITH corpus AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000,
         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01)
  FROM embeddings WHERE vec_id < 20
),
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS j FROM corpus
),
ccos AS (
  SELECT e.vec_id, c.vec_id AS cent_id,
         round(sum(e.x * c.x) / (sqrt(sum(e.x * e.x)) * sqrt(sum(c.x * c.x))), 5)
           AS ccos
  FROM ex e JOIN ex c ON e.j = c.j
  WHERE c.vec_id >= {CENTROID_BASE} AND c.vec_id < {CENTROID_BASE + N_CENTROIDS}
  GROUP BY 1, 2
),
assigned AS (
  SELECT vec_id, cent_id AS list_id FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY ccos DESC, cent_id) AS crnk
    FROM ccos
  ) WHERE crnk = 1
),
pairs AS (
  SELECT a.vec_id AS cand, b.vec_id AS vec_id
  FROM assigned a JOIN assigned b
    ON a.list_id = b.list_id AND a.vec_id < b.vec_id
),
scored AS (
  SELECT p.vec_id, p.cand,
         round(sum(pa.x * pb.x)
               / (sqrt(sum(pa.x * pa.x)) * sqrt(sum(pb.x * pb.x))), 4) AS cos
  FROM pairs p
  JOIN ex pa ON pa.vec_id = p.cand
  JOIN ex pb ON pb.vec_id = p.vec_id AND pb.j = pa.j
  GROUP BY 1, 2
),
hits AS (
  SELECT vec_id, min(cand) AS keeper FROM scored
  WHERE cos >= {SEMDEDUP_T} GROUP BY vec_id
)
SELECT a.vec_id, a.list_id,
       CASE WHEN h.keeper IS NOT NULL THEN 1 ELSE 0 END AS is_dup,
       h.keeper
FROM assigned a LEFT JOIN hits h ON a.vec_id = h.vec_id
"""


SQL_DEDUP_SEMANTIC = _sql_dedup_semantic()


# --------------------------------------------------------------------------
# near-dup clusters: connected components over the jaccard pair graph
# (iterative min-label propagation — the canonical "pick one canonical
# doc per duplicate cluster" step of a dedup pipeline).  Loops to a
# fixed point, so the result is the true component labeling and the
# DuckDB oracle can state it as a recursive transitive closure.
# Scale note: plain min-propagation converges in O(diameter) rounds;
# duplicate clusters are shallow (copies of one original), so the
# diameter is small in practice.  For adversarial long-chain graphs
# swap in large-star/small-star (O(log n) rounds) — same contract.
# --------------------------------------------------------------------------

COMPONENT_MAX_ITERS = 50


def dedup_components(spark, sf_dir):
    edges = dedup_ngram_jaccard(spark, sf_dir).select("a", "b")
    sym = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(edges.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    sym = sym.persist()
    lab = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(COMPONENT_MAX_ITERS):
        prop = sym.join(lab, sym.src == lab.id).select(
            F.col("dst").alias("id"), F.col("comp")
        )
        new = (
            lab.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()  # cut lineage: iteration depth stays O(1)
        )
        if new.join(lab, ["id", "comp"], "left_anti").isEmpty():
            lab = new
            break
        lab = new
    else:
        # a partial labeling is silently wrong (comp != min member id
        # for the unconverged tail) — fail loudly instead; graphs with
        # diameter > COMPONENT_MAX_ITERS need a large-star/small-star
        # variant, not more of this loop
        sym.unpersist()
        raise RuntimeError(
            f"component propagation did not converge in "
            f"{COMPONENT_MAX_ITERS} rounds (graph diameter too large)"
        )
    sym.unpersist()
    return lab.select(F.col("id").alias("doc_id"), "comp")


# --------------------------------------------------------------------------
# cc_bigstar — the same connected-components contract computed with
# the large-star/small-star algorithm (Kiveris et al. 2014, "Connected
# Components in MapReduce and Beyond"): the adversarial-graph upgrade
# dedup_components' docstring names.  Min-label propagation needs
# O(diameter) rounds — a 10^6-long chain of near-dups (scraped mirror
# chains do this) needs 10^6 rounds; star contraction needs
# O(log^2 n) rounds on ANY graph shape.  Each round is two
# groupBy+join passes over the edge set (no collect_list — per-node
# neighborhoods are never materialized as arrays, so a 10^8-degree
# hub node cannot blow a task).
# --------------------------------------------------------------------------

# round need grows ~log2(n)+~3.3/decade on pure chains (measured: 10^3
# nodes -> 11 rounds, 10^6 -> 21, extrapolated 10^12 -> ~41); 64 keeps
# headroom over any realizable corpus without masking true divergence
BIGSTAR_MAX_ITERS = 64


def _large_star(edges):
    """(hi, lo) canonical edges -> large-star step: every neighbor v of
    u with v > u connects to m(u) = min(N(u) + {u})."""
    sym = edges.select(F.col("hi").alias("src"), F.col("lo").alias("dst")).unionByName(
        edges.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
    )
    m = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        sym.join(m, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("hi"), F.col("m").alias("lo"))
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )


def _small_star(edges):
    """(hi, lo) canonical edges -> small-star step: per node u, all its
    smaller neighbors plus u itself connect to m(u) = min of them."""
    m = edges.groupBy("hi").agg(F.min("lo").alias("m"))
    em = edges.join(m, "hi")
    to_min = em.select(F.col("lo").alias("hi"), F.col("m").alias("lo")).unionByName(
        em.select("hi", F.col("m").alias("lo"))
    )
    return to_min.filter(F.col("hi") != F.col("lo")).distinct()


def star_contract(raw_edges):
    """(a, b) undirected edge DataFrame -> (doc_id, comp) labels via
    alternating large-star/small-star to a fixed point."""
    edges = (
        raw_edges.select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("hi").alias("doc_id"))
        .unionByName(edges.select(F.col("lo").alias("doc_id")))
        .distinct()
        .persist()
    )
    try:
        for _ in range(BIGSTAR_MAX_ITERS):
            # localCheckpoint each round: O(1) lineage depth, like
            # dedup_components
            new = _small_star(_large_star(edges)).localCheckpoint()
            unchanged = (
                new.join(edges, ["hi", "lo"], "left_anti").isEmpty()
                and edges.join(new, ["hi", "lo"], "left_anti").isEmpty()
            )
            edges = new
            if unchanged:
                break
        else:
            raise RuntimeError(
                f"large-star/small-star did not converge in "
                f"{BIGSTAR_MAX_ITERS} rounds — O(log^2 n) bound exceeded, "
                f"input edge set suspect"
            )
        # converged: a star forest (child -> component-min root); roots
        # appear only as lo, so they label themselves via coalesce
        roots = edges.groupBy("hi").agg(F.min("lo").alias("comp"))
        out = (
            nodes.join(roots, nodes.doc_id == roots.hi, "left")
            .select("doc_id", F.coalesce("comp", "doc_id").alias("comp"))
            # materialize before nodes.unpersist() in finally: out is
            # returned lazily, so its nodes-side input must not lose
            # its cache out from under the caller
            .localCheckpoint()
        )
        return out
    finally:
        nodes.unpersist()


def cc_bigstar(spark, sf_dir):
    return star_contract(dedup_ngram_jaccard(spark, sf_dir).select("a", "b"))


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {DUCK_CORPUS.strip()},
{DUCK_EDGE_CTES},
sym AS (SELECT a AS src, b AS dst FROM edges
        UNION SELECT b, a FROM edges),
reach(id, r) AS (
  SELECT src, src FROM sym
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
)
SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id
"""


# --------------------------------------------------------------------------
# dedup_canonical — pick the doc to KEEP per duplicate cluster.  The
# production rule real pipelines use (keep the most complete copy, not
# an arbitrary member): within each connected component, the keeper is
# the member with the most tokens, ties broken toward the smallest
# doc_id.  The tie-break is folded into one bigint ordinal
# (n_tok * ORD_SCALE - doc_id) so the argmax is a single max_by — a
# plain partial-aggregable aggregate, identical semantics in DuckDB's
# arg_max.
#
# The argmax ordinal is a STRUCT (n_tok, -doc_id), not a folded
# bigint: folding (n_tok * SCALE - doc_id) silently elects the wrong
# keeper the moment any doc_id reaches SCALE, and at 10^12 docs every
# fixed scale is eventually wrong.  Struct ordering is exact at any
# id width; Spark's max_by still partially aggregates it.
#
# Scale shape (100 TB): component labels join to per-doc token counts
# on doc_id (hash join at doc grain), then ONE groupBy(comp) whose
# aggregates (max_by, count, sum, max) all combine map-side — only
# (comp, partial-state) rows shuffle.  Cluster skew (a 10^6-member
# mirror cluster) is bounded: partial states are constant-size.
# --------------------------------------------------------------------------


def _labeled_sizes(spark, sf_dir):
    """(doc_id, comp, n_tok) for every doc in the dup-pair graph — the
    shared election input of dedup_canonical and dedup_keep."""
    sizes = _near_dup_corpus(spark, sf_dir).select(
        "doc_id", F.size(toks(F.col("text"))).alias("n_tok")
    )
    return dedup_components(spark, sf_dir).join(sizes, "doc_id")


def _keeper_ordinal():
    """THE keeper rule (most tokens, min doc_id tie-break) — the one
    Spark-side source, mirrored once in SQL by DUCK_LABELED_CTES'
    row_number ordering."""
    return F.struct(
        F.col("n_tok").alias("nt"), (-F.col("doc_id")).alias("negid")
    )


def dedup_canonical(spark, sf_dir):
    m = _labeled_sizes(spark, sf_dir)
    return m.groupBy("comp").agg(
        F.max_by("doc_id", _keeper_ordinal()).alias("keeper"),
        F.count("*").alias("n_members"),
        F.max("n_tok").alias("kept_tokens"),
        (F.sum("n_tok") - F.max("n_tok")).alias("dropped_tokens"),
    )


# the ONE SQL mirror of the components labeling + keeper election
# (shared by SQL_DEDUP_CANONICAL and SQL_DEDUP_KEEP so the keeper rule
# can never drift between them)
DUCK_LABELED_CTES = f"""sym AS (SELECT a AS src, b AS dst FROM edges
        UNION SELECT b, a FROM edges),
reach(id, r) AS (
  SELECT src, src FROM sym
  UNION
  SELECT reach.id, sym.dst FROM reach JOIN sym ON reach.r = sym.src
),
labels AS (SELECT id AS doc_id, min(r) AS comp FROM reach GROUP BY id),
sizes AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tok
  FROM corpus
),
labeled AS (SELECT comp, doc_id, n_tok FROM labels JOIN sizes USING (doc_id)),
k AS (
  SELECT comp, doc_id AS keeper FROM (
    SELECT comp, doc_id,
           row_number() OVER (PARTITION BY comp
                              ORDER BY n_tok DESC, doc_id ASC) AS rn
    FROM labeled
  ) WHERE rn = 1
)"""

SQL_DEDUP_CANONICAL = f"""
WITH RECURSIVE {DUCK_CORPUS.strip()},
{DUCK_EDGE_CTES},
{DUCK_LABELED_CTES},
agg AS (
  SELECT comp, count(*) AS n_members, max(n_tok) AS kept_tokens,
         CAST(sum(n_tok) - max(n_tok) AS BIGINT) AS dropped_tokens
  FROM labeled GROUP BY comp
)
SELECT comp, keeper, n_members, kept_tokens, dropped_tokens
FROM agg JOIN k USING (comp)
"""


def dedup_keep(spark, sf_dir):
    """The end-to-end dedup DECISION relation — one row per corpus
    document: kept=1 for cluster keepers and for docs in no dup
    cluster, kept=0 for dropped near-duplicates.  This is the table a
    user anti-joins training input against; it composes the whole
    family (banded candidates -> jaccard edges -> components ->
    keeper election) into the one output that matters downstream.

    Scale shape (100 TB): reuses the banded candidate graph (never
    all-pairs); the keeper election is the same partial-aggregable
    max_by as dedup_canonical (constant-size partial state, safe on
    10^6-member mirror clusters); member flagging is a hash join keyed
    on comp (AQE-skew-splittable); untouched docs arrive via a doc_id
    anti-join.  Only (doc_id, n_tok, comp) triples ever shuffle — the
    corpus text stays where the scan put it."""
    m = _labeled_sizes(spark, sf_dir)
    keepers = m.groupBy("comp").agg(
        F.max_by("doc_id", _keeper_ordinal()).alias("keeper")
    )
    flagged = m.join(keepers, "comp").select(
        "doc_id", (F.col("doc_id") == F.col("keeper")).cast("int").alias("kept")
    )
    solo = (
        _near_dup_corpus(spark, sf_dir)
        .select("doc_id")
        .join(m.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit(1).alias("kept"))
    )
    return flagged.unionByName(solo)


SQL_DEDUP_KEEP = f"""
WITH RECURSIVE {DUCK_CORPUS.strip()},
{DUCK_EDGE_CTES},
{DUCK_LABELED_CTES}
SELECT doc_id, CASE WHEN doc_id = keeper THEN 1 ELSE 0 END AS kept
FROM labeled JOIN k USING (comp)
UNION ALL
SELECT doc_id, 1 AS kept FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM labels)
"""


# --------------------------------------------------------------------------
# dedup_stats — the telemetry relation a dedup run publishes: the
# cluster-size HISTOGRAM (how many dup clusters of each size, how many
# docs they hold) plus the singleton mass (docs no candidate ever
# matched).  This is what a 100 TB ingest dashboard actually plots —
# a sudden fat tail means a mirror site entered the crawl; a collapsed
# singleton share means the banding thresholds broke.
#
# Scale shape: component labels aggregate to (comp, size) with
# map-side combine; the histogram is a second tiny agg over
# cluster-count-sized input; the singleton row is ONE anti-join
# aggregate — nothing corpus-sized survives the first groupBy.
# --------------------------------------------------------------------------


def dedup_stats(spark, sf_dir):
    comp = dedup_components(spark, sf_dir)
    cs = comp.groupBy("comp").agg(F.count("*").alias("cluster_size"))
    hist = cs.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"),
        F.sum("cluster_size").alias("n_docs"),
    )
    singles = (
        _near_dup_corpus(spark, sf_dir)
        .select("doc_id")
        .join(comp, "doc_id", "left_anti")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit(1).cast("bigint").alias("cluster_size"),
            F.col("n").alias("n_clusters"),
            F.col("n").alias("n_docs"),
        )
    )
    # components have size >= 2 by construction (every labeled node
    # carries an edge), so the singleton row cannot collide with a
    # histogram row — the union needs no re-aggregation
    return hist.unionByName(singles)


SQL_DEDUP_STATS = f"""
WITH RECURSIVE {DUCK_CORPUS.strip()},
{DUCK_EDGE_CTES},
{DUCK_LABELED_CTES},
cs AS (SELECT comp, count(*) AS cluster_size FROM labels GROUP BY comp)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(sum(cluster_size) AS BIGINT) AS n_docs
FROM cs GROUP BY cluster_size
UNION ALL
SELECT CAST(1 AS BIGINT), count(*), count(*) FROM corpus
WHERE doc_id NOT IN (SELECT doc_id FROM labels)
"""


# --------------------------------------------------------------------------
# dup_span_detect — exact duplicated-SUBSTRING detection (the
# suffix-array dedup of Lee et al., "Deduplicating Training Data Makes
# Language Models Better", approximated distributably): any word-span
# duplicated across >= 2 documents and >= DUPSPAN_N words long produces
# DUPSPAN_N-gram hits at every interior position, so merging runs of
# overlapping hits recovers the MAXIMAL duplicated intervals — the
# pieces exact-substring dedup cuts out of training text.  Two distinct
# duplicated regions closer than DUPSPAN_N words coalesce (conservative
# over-merge, same as span-coalescing in the original).
#
# Scale shape (100 TB): shingling is a narrow flat-map; the dup-shingle
# set comes from a partial-agg'd distinct-doc count on the 32-bit
# shingle hash; marking hits back is a hash LEFT SEMI join on that hash
# (hot boilerplate shingles are AQE-skew-splittable); interval merging
# is the gaps-and-islands double window at doc grain — one Exchange,
# same pattern as q_sessionize_batch.
# --------------------------------------------------------------------------

DUPSPAN_N = 8


def dup_span_detect(spark, sf_dir):
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", toks(F.col("text")).alias("w"))
        .filter(F.size("w") >= DUPSPAN_N)
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - (DUPSPAN_N - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    # 60-bit hash: 32 bits ALREADY collide at sf0.1
                    # (224,694 distinct shingles -> 5 collisions -> 9
                    # false duplicate hits, measured), and at 10^13
                    # corpus shingles the 2^32 space saturates and
                    # marks everything duplicated.  At 60 bits the
                    # expected false-hit RATE at 10^13 shingles is
                    # ~4e-6 (birthday bound) — negligible against the
                    # conservative over-merge this op already accepts.
                    md5i60(F.concat_ws(" ", F.slice("w", i, DUPSPAN_N))).alias("h"),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.h")
    dup_h = (
        sh.groupBy("h")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    hits = sh.join(dup_h, "h", "left_semi")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    is_new = F.when(
        F.lag("pos").over(w).isNull()
        | (F.col("pos") > F.lag("pos").over(w) + DUPSPAN_N),
        1,
    ).otherwise(0)
    grp = F.sum("is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.withColumn("is_new", is_new)
        .withColumn("grp", grp.cast("int"))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (DUPSPAN_N - 1)).alias("span_end"),
            F.count("*").alias("n_hits"),
        )
    )


_DUCK_SH_HASH = DUCK_MD5I60.format(
    x=f"array_to_string(ws[p:p+{DUPSPAN_N - 1}], ' ')"
)

# the ONE SQL mirror of tokenization -> dup-hash election -> island
# merge -> maximal spans (shared by SQL_DUP_SPAN and
# SQL_DUP_SPAN_REMOVE so the interval semantics can't drift)
DUCK_DUPSPAN_CTES = f"""w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
g AS (
  SELECT doc_id, CAST(p AS INT) AS pos, {_DUCK_SH_HASH} AS h
  FROM w, unnest(range(1, len(ws) - {DUPSPAN_N - 2})) t(p)
  WHERE len(ws) >= {DUPSPAN_N}
),
dup AS (
  SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
),
hits AS (
  SELECT doc_id, pos FROM g WHERE h IN (SELECT h FROM dup)
),
marked AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos > lag(pos) OVER w + {DUPSPAN_N}
              THEN 1 ELSE 0 END AS is_new
  FROM hits
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
islands AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS grp
  FROM marked
),
spans AS (
  SELECT doc_id, grp, min(pos) AS span_start,
         max(pos) + {DUPSPAN_N - 1} AS span_end, count(*) AS n_hits
  FROM islands GROUP BY doc_id, grp
)"""

SQL_DUP_SPAN = f"""
WITH {DUCK_DUPSPAN_CTES}
SELECT doc_id, grp, span_start, span_end, n_hits FROM spans
"""


def dup_span_remove(spark, sf_dir):
    """The cut step of exact-substring dedup (Lee et al. remove the
    duplicated substring from all but... in fact from every occurrence
    — this mirror cuts every detected interval, the conservative
    variant): one row per document with the duplicated word intervals
    of dup_span_detect excised and the survivors re-joined.

    Scale shape (100 TB): detection reuses dup_span_detect's plan
    (partial-agg'd dup-hash election, left-semi hit marking, one
    doc-grain window); the interval list per doc is tiny (merged
    maximal spans, not hits) and joins back to the corpus on doc_id —
    with the corpus bucketed by doc_id (the io.py storage convention)
    that join is co-located and the text never shuffles; the cut
    itself is a narrow array pass (positions filtered against the
    bound interval list, O(n_tok x n_ivl) per doc)."""
    ivl = (
        dup_span_detect(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("a"), F.col("span_end").alias("b")
                )
            ).alias("ivl")
        )
    )
    d = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", toks(F.col("text")).alias("w"))
    )
    empty = F.array().cast("array<struct<a:int,b:int>>")
    j = d.join(ivl, "doc_id", "left").select(
        "doc_id", "w", F.coalesce(F.col("ivl"), empty).alias("_ivl")
    )
    kept = j.select(
        "doc_id",
        "w",
        F.filter(
            F.sequence(F.lit(1), F.size("w")),
            lambda i: ~F.exists(
                F.col("_ivl"), lambda s: (i >= s["a"]) & (i <= s["b"])
            ),
        ).alias("_kp"),
    )
    return kept.select(
        "doc_id",
        F.concat_ws(
            " ", F.transform("_kp", lambda i: F.element_at("w", i))
        ).alias("clean_text"),
        (F.size("w") - F.size("_kp")).cast("int").alias("n_cut"),
    )


SQL_DUP_SPAN_REMOVE = f"""
WITH {DUCK_DUPSPAN_CTES},
ivls AS (
  SELECT doc_id, list({{'a': span_start, 'b': span_end}}) AS ivl
  FROM spans GROUP BY doc_id
),
cut AS (
  SELECT w.doc_id AS doc_id, ws, coalesce(ivl, []) AS ivl
  FROM w LEFT JOIN ivls ON w.doc_id = ivls.doc_id
),
kept AS (
  SELECT doc_id, ws,
         list_filter(range(1, len(ws) + 1),
                     i -> len(list_filter(ivl, s -> i >= s.a AND i <= s.b)) = 0)
           AS kp
  FROM cut
)
SELECT doc_id,
       -- array_to_string([]) is NULL in DuckDB (the DUCK_MUTATED
       -- precedent); concat_ws on the Spark side yields ''
       coalesce(array_to_string(list_transform(kp, i -> ws[i]), ' '), '')
         AS clean_text,
       CAST(len(ws) - len(kp) AS INT) AS n_cut
FROM kept
"""


# --------------------------------------------------------------------------
# paragraph_dedup — CCNet-style corpus-wide paragraph deduplication
# (Wenzek et al. 2020): split every document into paragraphs, hash
# each, keep only the FIRST occurrence of each paragraph corpus-wide
# (ordered by (doc_id, position)), and reassemble the surviving text.
# Paragraph = fixed 4-token chunk here (the synthetic corpus has no
# newlines); the mutated near-dup corpus guarantees real cross-doc
# duplicate paragraphs (mutants share chunk-aligned prefixes with
# their originals), and the small vocabulary adds natural collisions.
#
# Scale shape (100 TB): chunking is a zero-Exchange flat map; the
# first-occurrence election is ONE partial-aggregated groupBy on the
# 60-bit hash (never text); the keep decision is a hash equi-join
# (AQE-skew-splittable — boilerplate paragraphs are exactly the skew
# case); reassembly is a per-doc groupBy whose state is bounded by
# document length.  Text shuffles at paragraph grain once — the same
# shape CCNet runs at web scale.
# --------------------------------------------------------------------------

PARA_W = 4  # tokens per paragraph


def _first_occurrence(e: DataFrame):
    """First-occurrence election over an exploded frame with columns
    (doc_id, pos, h, ...): returns (e joined with its per-hash winner,
    kept int flag).  Lexicographic struct min over (doc_id, pos) — a
    partial-aggregating ordinal with no capacity cliff (a folded bigint
    key ``doc_id * K + pos`` silently mis-elects once any document has
    >= K paragraphs; mega-docs in this corpus make that a real input
    class, and a folded oracle would agree on the wrong answer).  Same
    pattern as dedup_canonical's keeper; unit-tested past the old
    fold's collision point in tests/test_ml_ops.py."""
    ordinal = F.struct(F.col("doc_id").alias("d"), F.col("pos").alias("p"))
    win = e.groupBy("h").agg(F.min(ordinal).alias("wmin"))
    kept = (
        (F.col("doc_id") == F.col("wmin.d")) & (F.col("pos") == F.col("wmin.p"))
    ).cast("int")
    return e.join(win, "h"), kept


def paragraph_dedup(spark, sf_dir):
    # tokens bound first — the chunking lambda slices the token array
    # per paragraph, and an unmaterialized split() there re-splits the
    # whole text per chunk (O(n^2) per doc, the CLAUDE.md HOF rule)
    c = _near_dup_corpus(spark, sf_dir).select(
        "doc_id", toks(F.col("text")).alias("_tk")
    )
    tk = F.col("_tk")
    n_chunks = F.expr(f"(size(_tk) + {PARA_W - 1}) DIV {PARA_W}")
    paras = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.concat_ws(" ", F.slice(tk, (i - 1) * PARA_W + 1, PARA_W)),
    )
    e = c.select("doc_id", F.posexplode(paras).alias("pos", "para")).withColumn(
        "h", md5i60(F.col("para"))
    )
    joined, kept = _first_occurrence(e)
    return (
        joined
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_paras"),
            F.sum(kept).cast("int").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(kept == 1, F.struct("pos", "para"))
                        )
                    ),
                    lambda s: s["para"],
                ),
                " ",
            ).alias("text_kept"),
        )
    )


SQL_PARAGRAPH_DEDUP = f"""
WITH {DUCK_CORPUS.strip().rstrip()},
t AS (SELECT doc_id, string_split(text, ' ') AS l FROM corpus),
p AS (
  SELECT doc_id, l,
         unnest(range(1, (len(l) + {PARA_W - 1}) // {PARA_W} + 1)) AS i
  FROM t
),
q AS (
  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         array_to_string(l[(i-1)*{PARA_W}+1:(i-1)*{PARA_W}+{PARA_W}], ' ') AS para
  FROM p
),
q2 AS (
  SELECT doc_id, pos, para,
         {DUCK_MD5I60.format(x="para")} AS h
  FROM q
),
-- first occurrence by true (doc_id, pos) tuple order; deliberately a
-- window rank (NOT the Spark side's struct-min) so the two engines
-- reach the election independently
r AS (
  SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
  FROM q2
)
SELECT doc_id,
       CAST(count(*) AS INT) AS n_paras,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS INT) AS n_kept,
       coalesce(string_agg(para, ' ' ORDER BY pos)
                  FILTER (WHERE rn = 1), '') AS text_kept
FROM r
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# cdc_chunks — content-defined chunking (the FastCDC / LBFS rolling-
# hash family, Muthitacharoen et al. 2001): chunk boundaries fall
# where a hash of the trailing CDC_W-token window hits a divisor
# residue, so an insertion early in a document shifts ONLY the chunk
# it lands in — fixed-width chunking (chunk_sliding) re-aligns every
# downstream chunk and loses all sharing.  This is THE storage/
# transfer dedup mechanism (rsync, restic, content stores) and the
# byte-level complement to span-grain `dup_span_detect`: emits the
# chunk table plus cross-document sharing counts per chunk hash.
#
# Chunking is a ZERO-Exchange narrow map: boundary positions come
# from one O(n) filter over the bound token array (HOF rule: _tk/_n/
# _bp bound as columns before any lambda reads them), chunk spans are
# a closed-form transform over the boundary-position array (NEVER a
# per-position prefix sum — that is the measured O(n^2) HOF trap),
# and each chunk's text is sliced once.  The only Exchange is the
# chunk-hash sharing rollup (distinct-then-count partial-aggregates);
# the chunk table is checkpointed (text dropped) before its
# two-consumer fan-out (the dist_drift rule).  Chunk ids are md5i60 —
# 32-bit shingle keys already collided at sf0.1 (the dup_span lesson).
# --------------------------------------------------------------------------

CDC_W = 3  # rolling-window tokens feeding the boundary hash
CDC_DIV = 8  # boundary ⇔ hash % DIV == 0 → mean chunk ≈ DIV tokens


def _cdc_chunk_table(spark, sf_dir) -> DataFrame:
    """(doc_id, chunk_no, n_tokens, chunk_hash) — narrow, no text."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", toks(F.col("text")).alias("_tk")
    )
    d = d.select("doc_id", "_tk", F.size("_tk").alias("_n"))
    bp = F.filter(
        F.sequence(F.lit(1), F.col("_n")),
        lambda p: (p >= CDC_W)
        & (
            md5i32(F.concat_ws(" ", F.slice(F.col("_tk"), p - CDC_W + 1, CDC_W)))
            % CDC_DIV
            == 0
        ),
    )
    d = d.select("doc_id", "_tk", "_n", bp.alias("_bp"))
    chunks = F.filter(
        F.transform(
            F.sequence(F.lit(0), F.size("_bp")),
            lambda k: F.struct(
                k.cast("int").alias("chunk_no"),
                F.when(k == 0, F.lit(1))
                .otherwise(F.element_at(F.col("_bp"), k) + 1)
                .alias("s"),
                F.when(k == F.size("_bp"), F.col("_n"))
                .otherwise(F.element_at(F.col("_bp"), k + 1))
                .alias("e"),
            ),
        ),
        lambda c: c["s"] <= c["e"],  # a final boundary at _n leaves an
    )  # empty tail chunk — the only start>end case; drop it
    ch = d.select(
        "doc_id", "_tk", F.explode(chunks).alias("c")
    ).select(
        "doc_id",
        F.col("c.chunk_no").alias("chunk_no"),
        (F.col("c.e") - F.col("c.s") + 1).cast("int").alias("n_tokens"),
        md5i60(
            F.concat_ws(
                " ", F.slice(F.col("_tk"), F.col("c.s"), F.col("c.e") - F.col("c.s") + 1)
            )
        ).alias("chunk_hash"),
    )
    return ch


def cdc_chunks(spark, sf_dir):
    ch = _cdc_chunk_table(spark, sf_dir).localCheckpoint()
    freq = (
        ch.select("chunk_hash", "doc_id")
        .distinct()
        .groupBy("chunk_hash")
        .agg(F.count("*").cast("bigint").alias("n_docs_sharing"))
    )
    return ch.join(freq, "chunk_hash").select(
        "doc_id",
        "chunk_no",
        "n_tokens",
        "chunk_hash",
        "n_docs_sharing",
        (F.col("n_docs_sharing") > 1).cast("int").alias("is_shared"),
    )


def _sql_cdc() -> str:
    bh = DUCK_MD5I32.format(
        x=f"array_to_string(tk[p - {CDC_W - 1} : p], ' ')"
    )
    chash = DUCK_MD5I60.format(x="array_to_string(tk[s : e], ' ')")
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk, len(string_split(text, ' ')) AS n
  FROM documents
),
b AS (
  SELECT doc_id, tk, n,
         list_filter(range(1, n + 1),
                     p -> p >= {CDC_W} AND {bh} % {CDC_DIV} = 0) AS bp
  FROM t
),
z AS (
  SELECT doc_id, tk, n, bp,
         unnest(range(0, len(bp) + 1)) AS k
  FROM b
),
spans AS (
  SELECT doc_id, tk, CAST(k AS INT) AS chunk_no,
         CASE WHEN k = 0 THEN 1 ELSE bp[CAST(k AS INT)] + 1 END AS s,
         CASE WHEN k = len(bp) THEN n ELSE bp[CAST(k + 1 AS INT)] END AS e
  FROM z
),
ch AS (
  SELECT doc_id, chunk_no, CAST(e - s + 1 AS INT) AS n_tokens,
         {chash} AS chunk_hash
  FROM spans WHERE s <= e
),
freq AS (
  SELECT chunk_hash, CAST(count(*) AS BIGINT) AS n_docs_sharing
  FROM (SELECT DISTINCT chunk_hash, doc_id FROM ch) GROUP BY 1
)
SELECT ch.doc_id, ch.chunk_no, ch.n_tokens, ch.chunk_hash,
       freq.n_docs_sharing,
       CASE WHEN freq.n_docs_sharing > 1 THEN 1 ELSE 0 END AS is_shared
FROM ch JOIN freq ON ch.chunk_hash = freq.chunk_hash
"""


SQL_CDC_CHUNKS = _sql_cdc()


# --------------------------------------------------------------------------
# merge_upsert — CDC MERGE application (the Iceberg/Delta MERGE INTO /
# merge-on-read compaction semantics): apply a multi-version changelog
# of upserts and DELETE TOMBSTONES onto a base snapshot, latest
# version wins per key.  snapshot_diff classifies two snapshots;
# scd2_history builds validity intervals; THIS op is the third CDC
# primitive — materializing the current snapshot from base + log,
# which is what a reader of a merge-on-read table does on every scan.
#
# The winner election is a partial-aggregable groupBy-max over a
# (version, is_del, text_hash) struct — NOT a row_number window: the
# struct max combines map-side, so a key's versions collapse before
# the shuffle and the Exchange carries one row per key per upstream
# partition, where a window would sort-shuffle every log row.
# Version is unique per key (changelog grain), so the lexicographic
# struct order reduces to version order.  Tombstones are filtered
# AFTER the election — filtering them first would resurrect older
# versions (the classic MERGE bug: a delete must beat, not vanish).
#
# Changelog synthesized deterministically: v1 updates (%9==2), v1
# tombstones (%9==4), v1 inserts (+1000000 — the next free id slot
# per the corpus_prep offset convention), v2 second updates (%18==2:
# multi-version supersede), v2 re-inserts after delete (%27==4: the
# delete-then-reinsert key case).  All five lifecycle shapes land in
# the output and the pytest pins each.
#
# Scale shape (100 TB): base and log reduce to (key, version, is_del,
# hash) narrow rows before the ONE key-grain Exchange; text never
# shuffles.  With base and log bucketed by doc_id (io.py convention)
# the agg is co-located, zero Exchange.
# --------------------------------------------------------------------------

UPSERT_OFFSET = 1_000_000  # insert slot: +100000..+900000 are taken


def _merge_log(d: DataFrame) -> DataFrame:
    """base(v0) ∪ changelog(v1, v2) as (doc_id, version, is_del, text)."""
    base = d.select(
        "doc_id", F.lit(0).alias("version"), F.lit(False).alias("is_del"),
        "text",
    )
    upd1 = d.filter(F.col("doc_id") % 9 == 2).select(
        "doc_id", F.lit(1).alias("version"), F.lit(False).alias("is_del"),
        F.concat(F.lit("u1 "), F.col("text")).alias("text"),
    )
    del1 = d.filter(F.col("doc_id") % 9 == 4).select(
        "doc_id", F.lit(1).alias("version"), F.lit(True).alias("is_del"),
        F.lit("").alias("text"),
    )
    ins1 = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + UPSERT_OFFSET).alias("doc_id"),
        F.lit(1).alias("version"), F.lit(False).alias("is_del"),
        F.concat(F.lit("ins "), F.col("text")).alias("text"),
    )
    upd2 = d.filter(F.col("doc_id") % 18 == 2).select(
        "doc_id", F.lit(2).alias("version"), F.lit(False).alias("is_del"),
        F.concat(F.lit("u2 "), F.col("text")).alias("text"),
    )
    reins2 = d.filter(F.col("doc_id") % 27 == 4).select(
        "doc_id", F.lit(2).alias("version"), F.lit(False).alias("is_del"),
        F.concat(F.lit("back "), F.col("text")).alias("text"),
    )
    return base.unionByName(upd1).unionByName(del1).unionByName(
        ins1
    ).unionByName(upd2).unionByName(reins2)


def merge_upsert(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    log = _merge_log(d).select(
        "doc_id", "version", "is_del", md5i60(F.col("text")).alias("thash")
    )
    won = log.groupBy("doc_id").agg(
        F.max(F.struct("version", "is_del", "thash")).alias("w"),
        F.count("*").cast("bigint").alias("n_versions"),
    )
    return won.filter(~F.col("w.is_del")).select(
        "doc_id",
        F.col("w.version").cast("int").alias("version"),
        F.col("w.thash").alias("text_hash"),
        "n_versions",
    )


def _sql_merge() -> str:
    th = DUCK_MD5I60.format(x="text")
    return f"""
WITH d AS (SELECT doc_id, text FROM documents),
log AS (
  SELECT doc_id, 0 AS version, FALSE AS is_del, text FROM d
  UNION ALL
  SELECT doc_id, 1, FALSE, 'u1 ' || text FROM d WHERE doc_id % 9 = 2
  UNION ALL
  SELECT doc_id, 1, TRUE, '' FROM d WHERE doc_id % 9 = 4
  UNION ALL
  SELECT doc_id + {UPSERT_OFFSET}, 1, FALSE, 'ins ' || text
  FROM d WHERE doc_id < 20
  UNION ALL
  SELECT doc_id, 2, FALSE, 'u2 ' || text FROM d WHERE doc_id % 18 = 2
  UNION ALL
  SELECT doc_id, 2, FALSE, 'back ' || text FROM d WHERE doc_id % 27 = 4
),
h AS (
  SELECT doc_id, version, is_del, {th} AS thash FROM log
),
won AS (
  SELECT doc_id,
         max(version) AS version,
         arg_max(is_del, version) AS is_del,
         arg_max(thash, version) AS thash,
         CAST(count(*) AS BIGINT) AS n_versions
  FROM h GROUP BY doc_id
)
SELECT doc_id, CAST(version AS INT) AS version, thash AS text_hash,
       n_versions
FROM won WHERE NOT is_del
"""


SQL_MERGE_UPSERT = _sql_merge()


# --------------------------------------------------------------------------
# inbatch_collisions — contrastive-training false-negative telemetry:
# in-batch negatives assume the rest of the batch is UNRELATED to the
# anchor, so a near-duplicate pair landing in one batch poisons the
# loss (its "negative" is a positive).  Before training an embedding
# model on a corpus you measure exactly this: assign documents to
# batches the way the loader will (deterministic hash — random
# batching), intersect the minhash candidate pairs with co-batched
# pairs, and report per-batch collision counts + the collision rate
# against the batch's pair capacity.  The rate drives the batch-size
# / dedup-threshold tradeoff (birthday bound: collisions grow with
# batch size even at a fixed dup rate).
#
# Scale shape (100 TB): candidate pairs come from the banded minhash
# index (never all-pairs; mh checkpointed before the self-join — the
# dedup_minhash_lsh rule); batch assignment is a narrow hash; the
# pair→batch intersection is two id-grain equi-joins; per-batch
# rollups partial-aggregate.  Bigint headroom: the pair capacity
# n·(n−1) is quadratic in batch size and _ppm_exact's staging needs
# den ≤ ~9.2e15, so n is CLAMPED at INBATCH_N_CAP = 3e6 for the
# capacity term (clamped² ≈ 9e12 — in range with 1000x staging to
# spare).  Real loader batches are 1e2–1e4 docs (loader-bounded, not
# corpus-bounded); a synthetic batch past the clamp reports against
# the saturated capacity instead of wrapping in Spark / raising in
# DuckDB (the doremi_weights divergent-engine rule).
# --------------------------------------------------------------------------

INBATCH_N = 8  # loader batches (small so fixture collisions occur)
INBATCH_N_CAP = 3_000_000  # capacity-term clamp: see headroom note


def inbatch_collisions(spark, sf_dir):
    c = _near_dup_corpus(spark, sf_dir)
    mh = _with_minhash(c).localCheckpoint()
    pairs = _band_pairs(_bands(mh))
    asg = c.select(
        "doc_id",
        (md5i32(F.col("doc_id").cast("string")) % INBATCH_N).alias("batch_id"),
    )
    a1 = asg.select(
        F.col("doc_id").alias("a"), F.col("batch_id").alias("_ba")
    )
    a2 = asg.select(
        F.col("doc_id").alias("b"), F.col("batch_id").alias("_bb")
    )
    coll = (
        pairs.join(a1, "a")
        .join(a2, "b")
        .filter(F.col("_ba") == F.col("_bb"))
        .groupBy(F.col("_ba").alias("batch_id"))
        .agg(F.count("*").cast("bigint").alias("n_collisions"))
    )
    sizes = asg.groupBy("batch_id").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    nc = f"least(n_docs, {INBATCH_N_CAP})"
    return sizes.join(coll, "batch_id", "left").select(
        "batch_id",
        "n_docs",
        F.coalesce("n_collisions", F.lit(0).cast("bigint")).alias(
            "n_collisions"
        ),
        F.expr(
            _ppm_exact(
                "(coalesce(n_collisions, 0) * 2)",
                f"greatest({nc} * ({nc} - 1), 1)",
                "div",
            )
        )
        .cast("bigint")
        .alias("collision_ppm"),
    )


def _sql_inbatch() -> str:
    bh = DUCK_MD5I32.format(x="CAST(doc_id AS VARCHAR)")
    nc = f"least(s.n_docs, {INBATCH_N_CAP})"
    return (
        _MH_CTES
        + f""",
asg AS (
  SELECT doc_id, {bh} % {INBATCH_N} AS batch_id FROM corpus
),
coll AS (
  SELECT aa.batch_id, CAST(count(*) AS BIGINT) AS n_collisions
  FROM pairs p
  JOIN asg aa ON p.a = aa.doc_id
  JOIN asg ab ON p.b = ab.doc_id
  WHERE aa.batch_id = ab.batch_id
  GROUP BY 1
),
sizes AS (
  SELECT batch_id, CAST(count(*) AS BIGINT) AS n_docs FROM asg GROUP BY 1
)
SELECT s.batch_id, s.n_docs,
       coalesce(c.n_collisions, 0) AS n_collisions,
       CAST({_ppm_exact('(coalesce(c.n_collisions, 0) * 2)',
                        f'greatest({nc} * ({nc} - 1), 1)', '//')}
            AS BIGINT) AS collision_ppm
FROM sizes s LEFT JOIN coll c ON s.batch_id = c.batch_id
"""
    )


SQL_INBATCH_COLLISIONS = _sql_inbatch()


QUERIES = {
    "dedup_containment": dedup_containment,
    "domain_dup_rate": domain_dup_rate,
    "cdc_chunks": cdc_chunks,
    "merge_upsert": merge_upsert,
    "inbatch_collisions": inbatch_collisions,
    "dedup_exact": dedup_exact,
    "paragraph_dedup": paragraph_dedup,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_eval": dedup_eval,
    "dup_verify_edit": dup_verify_edit,
    "dedup_incremental": dedup_incremental,
    "snapshot_diff": snapshot_diff,
    "scd2_history": scd2_history,
    "dedup_simhash": dedup_simhash,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_semantic": dedup_semantic,
    "dedup_components": dedup_components,
    "cc_bigstar": cc_bigstar,
    "dedup_canonical": dedup_canonical,
    "dedup_keep": dedup_keep,
    "dedup_stats": dedup_stats,
    "dup_span_detect": dup_span_detect,
    "dup_span_remove": dup_span_remove,
}

ORACLE_SQL = {
    "dedup_containment": SQL_DEDUP_CONTAINMENT,
    "domain_dup_rate": SQL_DOMAIN_DUP_RATE,
    "cdc_chunks": SQL_CDC_CHUNKS,
    "merge_upsert": SQL_MERGE_UPSERT,
    "inbatch_collisions": SQL_INBATCH_COLLISIONS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "paragraph_dedup": SQL_PARAGRAPH_DEDUP,
    "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
    "dedup_eval": SQL_DEDUP_EVAL,
    "dup_verify_edit": SQL_DUP_VERIFY_EDIT,
    "dedup_incremental": SQL_DEDUP_INCREMENTAL,
    "snapshot_diff": SQL_SNAPSHOT_DIFF,
    "scd2_history": SQL_SCD2_HISTORY,
    "dedup_simhash": SQL_DEDUP_SIMHASH,
    "dedup_ngram_jaccard": SQL_DEDUP_JACCARD,
    "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING,
    "dedup_semantic": SQL_DEDUP_SEMANTIC,
    "dedup_components": SQL_DEDUP_COMPONENTS,
    # same contract, same closed-form truth: the star-contraction
    # algorithm must land on the identical min-label components
    "cc_bigstar": SQL_DEDUP_COMPONENTS,
    "dedup_canonical": SQL_DEDUP_CANONICAL,
    "dedup_keep": SQL_DEDUP_KEEP,
    "dedup_stats": SQL_DEDUP_STATS,
    "dup_span_detect": SQL_DUP_SPAN,
    "dup_span_remove": SQL_DUP_SPAN_REMOVE,
}
