"""Approximate-nearest-neighbor search over an embedding column
(array<float>): brute-force cosine top-k as the correctness baseline,
and a random-hyperplane LSH-bucketed variant as the scale path.

Scale notes (10^9+ vectors): brute-force is O(probes × corpus) — fine
for a broadcast probe set, unusable corpus × corpus.  The LSH variant
assigns every vector a signature bucket (one narrow pass), then joins
probe↔candidate *within buckets only*: the shuffle key is the bucket
id, candidate sets are bucket-sized, and recall is tuned by the number
of planes / probing neighboring buckets.  Hyperplanes are derived from
md5 (deterministic, reproducible cluster-wide, and exactly mirrored in
the DuckDB oracle — no RNG state to ship).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

from .common import DUCK_MD5I32, _ppm_exact

N_PLANES = 6
N_PROBES = 8
TOP_K = 5

# Hyperplane weights are DATA-INDEPENDENT (a function of (plane, dim)
# only), so they are derived once here at import time — the exact same
# md5 construction the DuckDB mirror (DUCK_PLANE_W) re-derives in SQL —
# and shipped into the plan as array literals.  Evaluating the md5
# expression per row (the old form) cost N_PLANES×dim md5 calls for
# every corpus vector: ~6×dim×10^12 redundant hashes at target scale.
LSH_MAX_DIM = 256


def _plane_weight(p: int, j: int) -> float:
    return (int(hashlib.md5(f"{p},{j}".encode()).hexdigest()[:8], 16) % 2001 - 1000) / 1000.0


_PLANE_W = [[_plane_weight(p, j) for j in range(LSH_MAX_DIM)] for p in range(N_PLANES)]


def _emb(spark, sf_dir) -> DataFrame:
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"),
        )
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def ann_topk_bruteforce(spark, sf_dir):
    em = _emb(spark, sf_dir)
    probes = em.filter(F.col("vec_id") < N_PROBES).alias("p")
    corpus = em.alias("c")
    cos = F.round(
        _dot(F.col("p.v"), F.col("c.v"))
        / (_norm(F.col("p.v")) * _norm(F.col("c.v"))),
        5,
    )
    # broadcast the tiny probe set; corpus side streams (scale path)
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        F.col("p.vec_id").alias("q_id"),
        F.col("c.vec_id").alias("vec_id"),
        cos.alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )


SQL_ANN_BRUTEFORCE = f"""
WITH em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS j FROM em
),
scored AS (
  SELECT p.vec_id AS q_id, c.vec_id AS vec_id,
         round(sum(p.x * c.x) / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.x * c.x))), 5) AS cos
  FROM ex p JOIN ex c ON p.j = c.j
  WHERE p.vec_id < {N_PROBES}
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INT)
            AS rnk
  FROM scored
)
SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


def _bucket(v):
    """Random-hyperplane LSH bucket: plane p weight at dim j is a
    deterministic md5-derived value in [-1, 1], precomputed as a plan
    literal (see _PLANE_W) — zero md5 calls per row.  Vectors wider
    than LSH_MAX_DIM fail loudly: a silent weight shortfall would
    null the dot products and bucket everything together."""

    def plane_dot(p):
        return _dot(v, F.slice(F.lit(_PLANE_W[p]), 1, F.size(v)))

    total = F.lit(0).cast("long")
    for p in range(N_PLANES):
        total = total + F.when(
            plane_dot(p) > 0, F.lit(1 << p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return F.when(F.size(v) <= LSH_MAX_DIM, total).otherwise(
        F.raise_error(
            f"embedding dim exceeds LSH_MAX_DIM={LSH_MAX_DIM}; widen _PLANE_W"
        ).cast("long")
    )


def ann_lsh_bucketed(spark, sf_dir):
    """LSH-bucketed top-k with MULTI-PROBE recall: each probe searches
    its own bucket plus the N_PLANES neighboring buckets reachable by
    flipping one signature bit (the standard multi-probe LSH recall
    lever — the nearest misses live one hyperplane away).  The probed
    bucket keys are all distinct, and every candidate has exactly one
    bucket, so no pair is scored twice.  Only the tiny probe side fans
    out (x(N_PLANES+1)); the corpus is touched through the bucket
    equi-join alone."""
    em = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("v"))).persist()
    probes = em.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("qv"),
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p))
                    for p in range(N_PLANES)
                ],
            )
        ).alias("bucket"),
    ).alias("p")
    cand = em.alias("c")
    cos = F.round(
        _dot(F.col("p.qv"), F.col("c.v"))
        / (_norm(F.col("p.qv")) * _norm(F.col("c.v"))),
        5,
    )
    scored = probes.join(cand, F.col("p.bucket") == F.col("c.bucket")).select(
        F.col("p.q_id").alias("q_id"),
        F.col("c.vec_id").alias("vec_id"),
        cos.alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )


# DuckDB mirror of the _bucket hyperplane weight at (plane p, dim j);
# j is 1-based generate_subscripts, Spark's sequence index is 0-based.
# Shared with dedup_embedding_cosine's oracle.
DUCK_PLANE_W = DUCK_MD5I32.format(x="p || ',' || (j - 1)")
_W = DUCK_PLANE_W

# The em→ex→pd→buckets random-hyperplane pipeline every _bucket oracle
# shares (ANN LSH, kNN graph, bitext mining).  Single-sourced so a
# change to the bucket math (the N_PLANES dial, the DUCK_PLANE_W
# formula) cannot drift the oracles apart.  dedup_embedding's copy in
# dedup.py legitimately differs — its `ex` unnests the mutant-union
# corpus, not the raw table — so it stays separate.
_LSH_BUCKET_CTES = f"""em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS j FROM em
),
pd AS (
  SELECT vec_id, p.p AS p, sum(x * (({_W} % 2001 - 1000) / 1000.0)) AS dot
  FROM ex, (SELECT unnest(range(0, {N_PLANES})) AS p) p
  GROUP BY vec_id, p.p
),
buckets AS (
  SELECT vec_id,
         CAST(sum(CASE WHEN dot > 0 THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END) AS BIGINT)
           AS bucket
  FROM pd GROUP BY vec_id
)"""

SQL_ANN_LSH = f"""
WITH {_LSH_BUCKET_CTES},
pbuckets AS (
  SELECT vec_id,
         unnest([bucket] || list_transform(range(0, {N_PLANES}),
                                           p -> xor(bucket, CAST(1 << p AS BIGINT))))
           AS bucket
  FROM buckets WHERE vec_id < {N_PROBES}
),
scored AS (
  SELECT bp.vec_id AS q_id, bc.vec_id AS vec_id,
         round(sum(p.x * c.x) / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.x * c.x))), 5) AS cos
  FROM pbuckets bp
  JOIN buckets bc ON bp.bucket = bc.bucket
  JOIN ex p ON p.vec_id = bp.vec_id
  JOIN ex c ON c.vec_id = bc.vec_id AND c.j = p.j
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INT)
            AS rnk
  FROM scored
)
SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


# --------------------------------------------------------------------------
# lsh_bucket_stats — bucket-occupancy telemetry for the LSH family
# (the skew monitor every production ANN index publishes: hyperplane
# degeneration or correlated embeddings show up as a fat occupancy
# tail, and since bucket-join cost is Σ n_b², one hot bucket is the
# whole job's straggler).  Occupancy histogram buckets are log2 via
# integer bit-length (`length(bin(n))` — the corpus_stats idiom,
# integer-exact in both engines, no floor(log2) float boundary risk);
# max occupancy rides each histogram row so the alert threshold
# needs no second pass.
#
# Scale shape (10^12 vectors): the bucket hash is the ANN family's
# own narrow per-row expression; two map-side-combined Exchanges —
# bucket grain (the index build's own grain), then the ~64-row
# occupancy histogram.  No window, no join, no python (plan-audited).
# --------------------------------------------------------------------------


def lsh_bucket_stats(spark, sf_dir):
    em = _emb(spark, sf_dir)
    occ = (
        em.select(_bucket(F.col("v")).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    return occ.groupBy(
        F.length(F.bin(F.col("n"))).cast("int").alias("occ_bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum("n").alias("n_vecs"),
        F.max("n").alias("max_occ"),
    )


SQL_LSH_BUCKET_STATS = f"""
WITH {_LSH_BUCKET_CTES},
occ AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM buckets GROUP BY 1
)
SELECT CAST(length(bin(n)) AS INT) AS occ_bucket,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(n) AS BIGINT) AS n_vecs,
       max(n) AS max_occ
FROM occ GROUP BY 1
"""


# --------------------------------------------------------------------------
# IVF-flat: inverted-file index with a coarse quantizer
# --------------------------------------------------------------------------

N_CENTROIDS = 16
CENTROID_BASE = 100  # centroids = embeddings of vec_id in [100, 100+K)
N_LISTS_PROBED = 4


def _ivf_cents(em) -> "DataFrame":
    return em.filter(
        (F.col("vec_id") >= CENTROID_BASE)
        & (F.col("vec_id") < CENTROID_BASE + N_CENTROIDS)
    ).select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"))


def ivf_assign(spark, sf_dir) -> "DataFrame":
    """Inverted-list assignment as a NARROW map: the K centroids are
    folded into ONE broadcast row (array of structs) and each vector
    takes an argmax over that array in a single JVM expression — no
    window, no K× row expansion, zero shuffle of the corpus.  The
    argmax is ``array_max`` over ``struct(ccos, -cent_id)``: struct
    ordering is lexicographic, so ties in the rounded cosine break to
    the smallest cent_id, exactly mirroring the oracle's
    ``row_number() ORDER BY ccos DESC, cent_id``."""
    return _assign_lists(_emb(spark, sf_dir))


def _assign_lists(em: DataFrame, with_ccos: bool = False) -> DataFrame:
    """Core of ``ivf_assign`` over any (vec_id, v) frame (also drives
    ``dedup_semantic``'s union corpus): returns (vec_id, v, list_id)
    via the broadcast-argmax narrow map documented above.  Centroids
    are the seed-id subset of ``em`` (``_ivf_cents`` — rows outside
    [CENTROID_BASE, CENTROID_BASE+K) never become centroids, so
    synthetic >=100000 ids in a derived corpus cannot pollute them).

    ``with_ccos=True`` additionally emits the cosine to the ASSIGNED
    centroid — it is already the other field of the argmax struct, so
    consumers that need it (semantic_pack's core-outward ordering)
    must NOT re-join centroids to recompute it: Catalyst pushes the
    join condition through the projection and re-evaluates the whole
    O(K·dim) argmax expression per condition term (measured: a
    BroadcastNestedLoopJoin whose Cross condition inlined the argmax
    three times)."""
    cents_arr = _ivf_cents(em).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("cent_id"), F.col("cv")))
        ).alias("cents")
    )
    ccand = F.transform(
        "cents",
        lambda c: F.struct(
            F.round(
                _dot(F.col("v"), c["cv"]) / (_norm(F.col("v")) * _norm(c["cv"])), 5
            ).alias("ccos"),
            (-c["cent_id"]).alias("neg_id"),
        ),
    )
    out = em.crossJoin(F.broadcast(cents_arr)).withColumn(
        "best", F.array_max(ccand)
    )
    cols = ["vec_id", "v", (-F.col("best")["neg_id"]).alias("list_id")]
    if with_ccos:
        cols.append(F.col("best")["ccos"].alias("ccos"))
    return out.select(*cols)


def ann_ivf_flat(spark, sf_dir):
    """IVF-flat search: every vector is assigned to the inverted list of
    its nearest coarse centroid (``ivf_assign`` — one narrow argmax
    pass over a broadcast centroid array); a probe scores only the
    vectors in its ``N_LISTS_PROBED`` nearest lists.

    Scale shape (10^9+ vectors): the centroid set is tiny → broadcast;
    assignment is a narrow map producing a ``list_id`` partition key;
    search is an equi-join on ``list_id`` touching nprobe/K of the
    corpus instead of all of it.  The ranking window exists only on the
    probe side (probes × K rows).  Centroids here are a deterministic
    seed subset of the corpus (reproducible cluster-wide and exactly
    mirrored in the DuckDB oracle); production would train them offline
    with k-means — the search dataflow is identical either way.
    """
    em = _emb(spark, sf_dir)
    cents = _ivf_cents(em)
    assigned = ivf_assign(spark, sf_dir)

    cos_vc = F.round(
        _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv"))), 5
    )
    probe_lists = (
        em.filter(F.col("vec_id") < N_PROBES)
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cent_id", cos_vc.alias("ccos"))
        .withColumn(
            "crnk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("crnk") <= N_LISTS_PROBED)
        .select(F.col("vec_id").alias("q_id"), F.col("cent_id").alias("list_id"))
    )
    probes = em.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    cand = probe_lists.join(assigned, "list_id").join(probes, "q_id")
    cos = F.round(
        _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v"))), 5
    )
    scored = cand.select("q_id", "vec_id", cos.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )


# shared IVF CTE chain (assignment of every vector to its nearest
# centroid's inverted list) — one definition feeding both the search
# oracle and the standalone ivf_assign oracle, so they cannot desync
_IVF_CTES = f"""em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS j FROM em
),
ccos AS (
  SELECT e.vec_id, c.vec_id AS cent_id,
         round(sum(e.x * c.x) / (sqrt(sum(e.x * e.x)) * sqrt(sum(c.x * c.x))), 5)
           AS ccos
  FROM ex e JOIN ex c ON e.j = c.j
  WHERE c.vec_id >= {CENTROID_BASE} AND c.vec_id < {CENTROID_BASE + N_CENTROIDS}
  GROUP BY 1, 2
),
ranked_c AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crnk
  FROM ccos
),
assigned AS (
  SELECT vec_id, cent_id AS list_id FROM ranked_c WHERE crnk = 1
)"""


K_OUTLIERS = 5


def embed_outliers(spark, sf_dir) -> "DataFrame":
    """Per-inverted-list embedding outliers: the K_OUTLIERS members
    FARTHEST from their assigned centroid (lowest cosine), ranked
    ascending — the candidate noise/mislabel set a SemDeDup-style
    curation pass reviews before pruning, and the quantizer-health
    telemetry beside lsh_bucket_stats (a list whose tail cosines are
    very low is under-clustered).

    Scale shape: assignment is ivf_assign's broadcast-argmax narrow
    map (zero shuffle, the assigned-centroid cosine is already the
    other argmax struct field — never re-joined, see _assign_lists);
    the bottom-K ranking window partitions on the K-list key, but
    WindowGroupLimit pushes the per-list limit below the Exchange, so
    the shuffle carries only ~K_OUTLIERS rows per list per input
    partition — not the corpus (plan-audited)."""
    a = _assign_lists(_emb(spark, sf_dir), with_ccos=True)
    w = Window.partitionBy("list_id").orderBy(
        F.asc("ccos"), F.asc("vec_id")
    )
    return (
        a.withColumn("out_rank", F.row_number().over(w))
        .filter(F.col("out_rank") <= K_OUTLIERS)
        .select("list_id", "vec_id", "ccos", "out_rank")
    )


SQL_EMBED_OUTLIERS = f"""
WITH {_IVF_CTES}
SELECT list_id, vec_id, ccos, out_rank FROM (
  SELECT cent_id AS list_id, vec_id, ccos,
         row_number() OVER (PARTITION BY cent_id
                            ORDER BY ccos ASC, vec_id) AS out_rank
  FROM ranked_c WHERE crnk = 1
)
WHERE out_rank <= {K_OUTLIERS}
"""


def q_ivf_assign(spark, sf_dir) -> "DataFrame":
    """Registry surface for the inverted-list assignment itself (the
    narrow broadcast-argmax map) so its (vec_id -> list_id) VALUES are
    oracle-checked, not just its plan shape (tools/explain_audit.py
    11b)."""
    return ivf_assign(spark, sf_dir).select("vec_id", "list_id")


SQL_IVF_ASSIGN = f"""
WITH {_IVF_CTES}
SELECT vec_id, list_id FROM assigned
"""


# --------------------------------------------------------------------------
# k-means (Lloyd) update step — trains the IVF coarse quantizer
# in-engine instead of assuming offline centroids
# --------------------------------------------------------------------------

KMEANS_SCALE = 1_000_000  # fixed-point quantum: 1e-6 per coordinate unit


def kmeans_update(spark, sf_dir) -> "DataFrame":
    """One Lloyd k-means UPDATE step over the inverted-list assignment
    (assign = ``ivf_assign``'s broadcast-argmax narrow map; update =
    this): per (list, dimension), the exact fixed-point coordinate sum
    and the member count of the list.  New centroid j-th coordinate =
    ``sum_q / (n_members * KMEANS_SCALE)`` — sums and counts are
    emitted instead of the mean so the result is integer-exact in both
    engines (bigint sums have one value; a cross-engine double mean or
    integer division would hang correctness on rounding/truncation
    semantics the consumer may not want anyway when re-broadcasting
    centroids for the next iteration).

    Scale shape (10^9+ vectors, dim d, K lists): the per-dimension
    posexplode is a NARROW d-fanout of (list_id, j, xq) triples —
    no text, no vectors — and the groupBy partial-aggregates map-side,
    so the single Exchange carries only ~tasks x K x d partial rows
    (plan-audited: partial_sum below the Exchange).  Iterating Lloyd =
    re-broadcast the K x d sums (tiny) as the next centroid array and
    rerun; production would iterate on a sample then freeze."""
    assigned = _assign_lists(_emb(spark, sf_dir))
    e = assigned.select("list_id", F.posexplode("v").alias("pos", "x")).select(
        "list_id",
        (F.col("pos") + 1).cast("int").alias("j"),
        F.round(F.col("x") * KMEANS_SCALE, 0).cast("bigint").alias("xq"),
    )
    return e.groupBy("list_id", "j").agg(
        F.sum("xq").alias("sum_q"),
        F.count("*").cast("int").alias("n_members"),
    )


SQL_KMEANS_UPDATE = f"""
WITH {_IVF_CTES},
q AS (
  SELECT a.list_id, CAST(e.j AS INT) AS j,
         CAST(round(e.x * {KMEANS_SCALE}) AS BIGINT) AS xq
  FROM assigned a JOIN ex e ON a.vec_id = e.vec_id
)
SELECT list_id, j, CAST(sum(xq) AS BIGINT) AS sum_q,
       CAST(count(*) AS INT) AS n_members
FROM q GROUP BY list_id, j
"""
# CAST(sum(..) AS BIGINT): DuckDB sum(BIGINT) returns HUGEINT, which
# the driver's pandas canonicalization converts to float64 — hashing
# `21.0` against Spark's bigint `21` (CORRECTNESS_r04 red).  Every
# integer sum that reaches an oracle's OUTPUT must be cast back.

SQL_ANN_IVF = f"""
WITH {_IVF_CTES},
probe_lists AS (
  SELECT vec_id AS q_id, cent_id AS list_id FROM ranked_c
  WHERE vec_id < {N_PROBES} AND crnk <= {N_LISTS_PROBED}
),
scored AS (
  SELECT pl.q_id, a.vec_id,
         round(sum(p.x * c.x) / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.x * c.x))), 5) AS cos
  FROM probe_lists pl
  JOIN assigned a ON a.list_id = pl.list_id
  JOIN ex p ON p.vec_id = pl.q_id
  JOIN ex c ON c.vec_id = a.vec_id AND c.j = p.j
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INT)
            AS rnk
  FROM scored
)
SELECT q_id, vec_id, cos, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


# --------------------------------------------------------------------------
# int8 scalar quantization — the memory-bandwidth lever for brute-force
# scans at scale: a 10^12-vector corpus in float32 is 4x the scan IO of
# int8, and quantized search is the standard refine-candidates baseline
# (FAISS SQ8).  Quantization is per-vector symmetric: scale =
# max|x|/127, q = floor(x/scale + 0.5) clamped to [-127, 127] — integer
# values, bit-identical across engines (floor-of-double, no bankers'
# rounding anywhere).
# --------------------------------------------------------------------------

QUANT_LEVELS = 127


def _q_scale(v):
    return F.aggregate(
        F.transform(v, lambda x: F.abs(x)), F.lit(0.0), lambda a, x: F.greatest(a, x)
    ) / F.lit(float(QUANT_LEVELS))


def _q_apply(v, scale):
    """Quantize with `scale` as a BOUND column: referencing the
    max-abs aggregate directly inside the per-element lambda would
    make interpreted HOF eval recompute it per element — O(d^2) per
    vector (the CLAUDE.md HOF rule), a 64x waste at dim 64."""
    return F.when(
        scale == 0, F.transform(v, lambda x: F.lit(0).cast("long"))
    ).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-QUANT_LEVELS).cast("long"),
                F.least(
                    F.lit(QUANT_LEVELS).cast("long"),
                    F.floor(x / scale + F.lit(0.5)).cast("long"),
                ),
            ),
        )
    )


def ann_topk_quantized(spark, sf_dir):
    """Brute-force top-k over int8-quantized vectors: quantization is a
    narrow per-row map, probes broadcast, and the ranking cosine is
    computed from INTEGER dot products / integer norms (then one
    rounded double per candidate).  Same dataflow as
    ``ann_topk_bruteforce`` at a quarter of the scan bytes; at 10^12
    vectors this composes with the IVF lists (quantized scan inside
    each probed list, exact re-rank of the shortlist)."""
    em = (
        _emb(spark, sf_dir)
        .select("vec_id", "v", _q_scale(F.col("v")).alias("_qs"))
        .select("vec_id", _q_apply(F.col("v"), F.col("_qs")).alias("q"))
    )
    probes = em.filter(F.col("vec_id") < N_PROBES).alias("p")
    corpus = em.alias("c")
    qdot = F.aggregate(
        F.zip_with(F.col("p.q"), F.col("c.q"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    qn = lambda side: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(F.col(side), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    cos = F.round(qdot.cast("double") / (qn("p.q") * qn("c.q")), 5)
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        F.col("p.vec_id").alias("q_id"),
        F.col("c.vec_id").alias("vec_id"),
        cos.alias("qcos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("qcos"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )


_DUCK_QUANT = f"""
qem AS (
  SELECT vec_id,
         CASE WHEN s = 0
              THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v, x -> greatest(CAST(-{QUANT_LEVELS} AS BIGINT),
                     least(CAST({QUANT_LEVELS} AS BIGINT),
                           CAST(floor(x / s + 0.5) AS BIGINT))))
         END AS q
  FROM (SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) / {QUANT_LEVELS}.0 AS s
        FROM em)
)
"""

SQL_ANN_QUANTIZED = f"""
WITH em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_DUCK_QUANT.strip()},
qex AS (
  SELECT vec_id, unnest(q) AS x, generate_subscripts(q, 1) AS j FROM qem
),
scored AS (
  SELECT p.vec_id AS q_id, c.vec_id AS vec_id,
         round(CAST(sum(p.x * c.x) AS DOUBLE)
               / (sqrt(CAST(sum(p.x * p.x) AS DOUBLE))
                  * sqrt(CAST(sum(c.x * c.x) AS DOUBLE))), 5) AS qcos
  FROM qex p JOIN qex c ON p.j = c.j
  WHERE p.vec_id < {N_PROBES}
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id ORDER BY qcos DESC, vec_id) AS INT)
            AS rnk
  FROM scored
)
SELECT q_id, vec_id, qcos, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


# ---- product quantization (FAISS PQ-style) ---------------------------------

PQ_M = 8  # subvectors per vector
PQ_SUB_DIM = 8  # dims per subvector (PQ_M * PQ_SUB_DIM = embedding dim 64)
PQ_K = 16  # codewords per subvector codebook
PQ_CODEBOOK_BASE = 200  # codewords = subvectors of vec_id in [200, 200+K)


def _pq_codebook(em) -> "DataFrame":
    """Codebook rows: one corpus vector per codeword id.  Deterministic
    seed subset (reproducible cluster-wide, exactly mirrored in the
    DuckDB oracle); production trains per-subvector k-means offline —
    the encode/search dataflow is identical either way (same reason as
    ``_ivf_cents``)."""
    return em.filter(
        (F.col("vec_id") >= PQ_CODEBOOK_BASE)
        & (F.col("vec_id") < PQ_CODEBOOK_BASE + PQ_K)
    ).select((F.col("vec_id") - PQ_CODEBOOK_BASE).alias("code_id"), F.col("v").alias("cw"))


def _sub(col, s):
    """1-based slice of subvector s."""
    return F.slice(col, s * PQ_SUB_DIM + 1, PQ_SUB_DIM)


def _l2sq(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_cb_row(em) -> "DataFrame":
    """The m×K codebook folded into ONE row (array of structs) for
    broadcasting — built once and shared by encode and search."""
    return _pq_codebook(em).agg(
        F.array_sort(F.collect_list(F.struct("code_id", "cw"))).alias("cb")
    )


def _pq_codes(em, cb_row) -> "DataFrame":
    def best_code(s):
        cand = F.transform(
            "cb",
            lambda c: F.struct(
                F.round(_l2sq(_sub(F.col("v"), s), _sub(c["cw"], s)), 6).alias("d2"),
                c["code_id"].alias("code_id"),
            ),
        )
        return F.array_min(cand)["code_id"].cast("int").alias(f"c{s}")

    return em.crossJoin(F.broadcast(cb_row)).select(
        "vec_id", "v", *[best_code(s) for s in range(PQ_M)]
    )


def pq_encode(spark, sf_dir) -> "DataFrame":
    """Product-quantization encode as a NARROW map: the m×K codebook is
    folded into ONE broadcast row and each vector takes m independent
    argmins over it in a single JVM expression — no window, no K× row
    expansion, zero shuffle of the corpus (same mechanism as
    ``ivf_assign``).  Each 64-float vector compresses to m=8 4-bit
    codes: 256 B → 8 B of scan payload per vector, the storage/scan
    win PQ exists for.  Distances are rounded to 6 dp before the
    argmin so the Spark left-fold and the oracle's unordered sum
    cannot disagree in the last bit; ties break to the smaller code id
    via lexicographic struct ordering (``array_min`` over
    ``struct(d2, code_id)``)."""
    em = _emb(spark, sf_dir)
    return _pq_codes(em, _pq_cb_row(em))


def q_pq_encode(spark, sf_dir):
    return pq_encode(spark, sf_dir).drop("v")


# shared PQ CTE chain: codebook + per-(vector, subvector) nearest
# codeword — one definition feeding both the encode oracle and the
# ADC-search oracle, so they cannot desync
_PQ_CTES = f"""em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS j FROM em
),
cb AS (
  SELECT vec_id - {PQ_CODEBOOK_BASE} AS code_id, x, j,
         CAST((j - 1) // {PQ_SUB_DIM} AS INT) AS s
  FROM ex
  WHERE vec_id >= {PQ_CODEBOOK_BASE} AND vec_id < {PQ_CODEBOOK_BASE + PQ_K}
),
dist AS (
  SELECT e.vec_id, c.s, c.code_id, round(sum((e.x - c.x) * (e.x - c.x)), 6) AS d2
  FROM ex e JOIN cb c ON e.j = c.j
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, s, code_id
  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id, s
                                     ORDER BY d2, code_id) AS rn
        FROM dist)
  WHERE rn = 1
)"""

SQL_PQ_ENCODE = f"""
WITH {_PQ_CTES}
SELECT vec_id,
       {", ".join(
           f"CAST(max(CASE WHEN s = {s} THEN code_id END) AS INT) AS c{s}"
           for s in range(PQ_M)
       )}
FROM best GROUP BY vec_id
"""


def ann_topk_pq(spark, sf_dir):
    """ANN search over PQ codes via asymmetric distance (ADC): each
    candidate's distance to the exact query is the L2 distance between
    the query and the candidate's codebook RECONSTRUCTION — computed
    on the fly from the 8-byte code and the broadcast codebook, never
    from the original vector.  Scale shape: the corpus side scans only
    ``(vec_id, c0..c7)`` (8 B payload/vector, 32× less than raw
    floats), reconstruction + distance is one narrow codegen'd
    expression, probes broadcast, and the only shuffle is the tiny
    per-probe top-k window.  At 10^12 vectors this composes with the
    IVF lists (``ann_ivf_flat``) exactly as FAISS IVF-PQ does: probe a
    few lists, ADC-scan their codes, exact re-rank of the shortlist
    (``ann_topk_bruteforce`` shape over ~k·nprobe candidates)."""
    em = _emb(spark, sf_dir)
    cb = _pq_cb_row(em)  # ONE codebook subtree, shared by encode + ADC
    codes = _pq_codes(em, cb).drop("v")
    recon = F.flatten(
        F.array(
            *[
                _sub(F.element_at("cb", F.col(f"c{s}") + 1)["cw"], s)
                for s in range(PQ_M)
            ]
        )
    )
    corpus = codes.crossJoin(F.broadcast(cb)).select(
        "vec_id", recon.alias("rv")
    )
    probes = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < N_PROBES)
        .select(F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    )
    scored = corpus.crossJoin(F.broadcast(probes)).select(
        "q_id",
        "vec_id",
        F.round(_l2sq(F.col("qv"), F.col("rv")), 5).alias("adc_d2"),
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_d2"), F.asc("vec_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= TOP_K
    )


SQL_ANN_PQ = f"""
WITH {_PQ_CTES},
recon AS (
  SELECT b.vec_id, c.j, c.x
  FROM best b JOIN cb c ON c.code_id = b.code_id AND c.s = b.s
),
scored AS (
  SELECT p.vec_id AS q_id, r.vec_id AS vec_id,
         round(sum((p.x - r.x) * (p.x - r.x)), 5) AS adc_d2
  FROM ex p JOIN recon r ON p.j = r.j
  WHERE p.vec_id < {N_PROBES}
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY q_id
                                    ORDER BY adc_d2, vec_id) AS INT) AS rnk
  FROM scored
)
SELECT q_id, vec_id, adc_d2, rnk FROM ranked WHERE rnk <= {TOP_K}
"""


# ---- k-NN graph construction ------------------------------------------------

KNN_GRAPH_K = 3


def knn_graph(spark, sf_dir):
    """k-NN GRAPH construction — every corpus vector is a query (the
    all-corpus pattern behind embedding clustering, near-dup mining,
    and graph-based label propagation), so a broadcast probe side does
    not exist.  Candidates come from the LSH bucket equi-join: each
    vector scores only its same-bucket peers, then keeps its top
    ``KNN_GRAPH_K`` directed edges.

    Scale shape: the join key is the bucket id, so work is
    sum-over-buckets of |bucket|² instead of n² — the number of planes
    is the dial (more planes → smaller buckets → cheaper and lower
    recall), a hot bucket is AQE-skew-splittable, and the ranking
    window partitions on vec_id (full corpus cardinality).  Vectors
    alone in their bucket get no edges (documented recall property of
    single-bucket candidates; multi-probe would raise it at join-fanout
    cost — see ``ann_lsh_bucketed``)."""
    em = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("v"))).persist()
    a, b = em.alias("a"), em.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v"))
        / (_norm(F.col("a.v")) * _norm(F.col("b.v"))),
        5,
    )
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("nbr_id"),
            cos.alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= KNN_GRAPH_K
    )


SQL_KNN_GRAPH = f"""
WITH {_LSH_BUCKET_CTES},
pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS nbr_id
  FROM buckets a JOIN buckets b
    ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
),
scored AS (
  SELECT pr.vec_id, pr.nbr_id,
         round(sum(pa.x * pb.x)
               / (sqrt(sum(pa.x * pa.x)) * sqrt(sum(pb.x * pb.x))), 5) AS cos
  FROM pairs pr
  JOIN ex pa ON pa.vec_id = pr.vec_id
  JOIN ex pb ON pb.vec_id = pr.nbr_id AND pb.j = pa.j
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, nbr_id) AS INT) AS rnk
  FROM scored
)
SELECT vec_id, nbr_id, cos, rnk FROM ranked WHERE rnk <= {KNN_GRAPH_K}
"""


# --------------------------------------------------------------------------
# semantic_pack — in-context-pretraining packing layout (Shi et al.
# 2023, "In-Context Pretraining": LMs train better when the documents
# sharing a context window are RELATED, not i.i.d.-shuffled).  The
# full paper builds a global max-similarity traveling path; the
# scalable standard practice it reduces to is cluster-then-pack:
# assign each doc to its nearest coarse centroid (the ivf_assign
# narrow broadcast-argmax map, reused verbatim), order each cluster
# from its semantic core outward (cosine-to-centroid descending — so
# a context window holds docs that are mutually close, not just
# co-clustered), then cut the per-cluster layout into SEQ_LEN-token
# training sequences with the pack_sequences start/offset/straddle
# convention.  Sequences never span clusters by construction.
#
# Scale shape (100 TB): centroids broadcast; assignment + the
# cosine-to-assigned-centroid are one narrow pass; the token-count
# join (embeddings ↔ documents on id) is co-located under the io.py
# id-bucketing convention; the only windows partition on list_id,
# whose cardinality GROWS with the corpus (K ≈ n / target cluster
# size — unlike a language key, per-cluster work is bounded), so
# window parallelism scales.  Oracle shares _IVF_CTES with ivf_assign
# so the assignment rule cannot drift.
# --------------------------------------------------------------------------

from .corpus_prep import DUCK_SEQ_LAYOUT, seq_layout_cols  # noqa: E402


def semantic_pack(spark, sf_dir):
    em = _emb(spark, sf_dir)
    a = _assign_lists(em, with_ccos=True).select("vec_id", "list_id", "ccos")
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    j = a.join(d, a.vec_id == d.doc_id).select(
        "doc_id", "list_id", "ccos", "n_tokens"
    )
    w = Window.partitionBy("list_id").orderBy(F.desc("ccos"), F.asc("doc_id"))
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return (
        j.withColumn("crank", F.row_number().over(w).cast("int"))
        .withColumn("_start", start)
        .select(
            "doc_id",
            "list_id",
            "crank",
            "n_tokens",
            *seq_layout_cols(F.col("_start"), F.col("n_tokens")),
        )
    )


SQL_SEMANTIC_PACK = f"""
WITH {_IVF_CTES},
cc AS (
  SELECT a.vec_id, a.list_id, c.ccos
  FROM assigned a
  JOIN ccos c ON c.vec_id = a.vec_id AND c.cent_id = a.list_id
),
t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
  FROM documents
),
o AS (
  SELECT cc.vec_id AS doc_id, cc.list_id, cc.ccos, t.n_tokens,
         row_number() OVER (PARTITION BY list_id
                            ORDER BY ccos DESC, cc.vec_id) AS crank,
         sum(t.n_tokens) OVER (PARTITION BY list_id
                               ORDER BY ccos DESC, cc.vec_id)
           - t.n_tokens AS start
  FROM cc JOIN t ON t.doc_id = cc.vec_id
)
SELECT doc_id, list_id, CAST(crank AS INT) AS crank, n_tokens,
       {DUCK_SEQ_LAYOUT}
FROM o
"""


# --------------------------------------------------------------------------
# bitext_mine — margin-based parallel-pair mining (Artetxe & Schwenk
# 2019, the LASER/CCMatrix recipe that mined billions of translation
# pairs from web crawls): a source/target pair is kept not when its
# cosine is high in absolute terms but when it BEATS the average of
# each side's k-nearest-neighborhood — margin(x, y) =
# cos(x, y) / (½·(avgₖ cos(x, NNₖ(x, Y)) + avgₖ cos(y, NNₖ(y, X)))) —
# which cancels the hubness that plain thresholds drown in.  Graft
# version: source = even vec_ids, target = odd (a deterministic split
# of the one embedding table), candidates and the kNN neighborhoods
# both come from the random-hyperplane LSH bucket equi-join (the same
# `_bucket` the ANN family uses — the faiss-ANN role in CCMatrix),
# k = 4, and a pair is emitted when it is its source's best candidate
# by margin AND margin > 1 (strictly better than its neighborhood).
#
# Float discipline: cosine rounds once to integer 1e-5 units (cos_u);
# neighborhood averages stay EXACT bigint sums — margin_ppm =
# cos_u·2e6·nf·nb div (sumf·nb + sumb·nf), so no cross-engine float
# reassociation can move a margin (max magnitude 1e5·2e6·16 ≈ 3.2e12,
# well inside bigint).  Spark `div` truncates where DuckDB `//`
# floors, which differ only on NEGATIVE margins — those can never win
# best-rank over a >1e6 survivor (positive beats negative in both
# orderings) and never pass the filter, so emitted rows are identical.
#
# Scale shape (10^12 docs): one narrow bucket pass per side, ONE
# bucket equi-join (expected bucket size n/2^N_PLANES — N_PLANES is
# the scale dial, like dedup_embedding_cosine), and the kNN/best
# windows partition on src_id/tgt_id whose cardinality grows with the
# corpus over bucket-bounded candidate lists.  No all-pairs plan
# anywhere (plan-audited: no CartesianProduct/BroadcastNestedLoop).
# --------------------------------------------------------------------------

BITEXT_K = 4
BITEXT_MARGIN_MIN_PPM = 1_000_000  # margin > 1.0


def _bitext_pairs(spark, sf_dir):
    """Pre-checkpoint candidate stage: LSH-bucket equi-join + one
    O(dim) cosine per candidate.  Split out so the plan audit can
    assert the no-all-pairs shape on the stage the checkpoint in
    bitext_mine hides from the downstream plan."""
    em = _emb(spark, sf_dir).withColumn("bucket", _bucket(F.col("v")))
    src = em.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("src_id"), F.col("v").alias("sv"), "bucket"
    )
    tgt = em.filter(F.col("vec_id") % 2 == 1).select(
        F.col("vec_id").alias("tgt_id"), F.col("v").alias("tv"), "bucket"
    )
    cos_u = F.round(
        _dot(F.col("sv"), F.col("tv"))
        / (_norm(F.col("sv")) * _norm(F.col("tv")))
        * 100000
    ).cast("bigint")
    return src.join(tgt, "bucket").select(
        "src_id", "tgt_id", cos_u.alias("cos_u")
    )


def bitext_mine(spark, sf_dir):
    # eager localCheckpoint: pairs feeds THREE consumers (fwd, bwd and
    # the margin join) — only the deepest bucket Exchange is deduped by
    # ReuseExchange, so without materialization the bucket join plus
    # the per-candidate O(dim) cosine (the op's dominant cost) would
    # re-execute per consumer (the preference_pairs/dedup_incremental
    # multi-branch-reuse precedent)
    pairs = _bitext_pairs(spark, sf_dir).localCheckpoint()
    wf = Window.partitionBy("src_id").orderBy(
        F.desc("cos_u"), F.asc("tgt_id")
    )
    wb = Window.partitionBy("tgt_id").orderBy(
        F.desc("cos_u"), F.asc("src_id")
    )
    fwd = (
        pairs.withColumn("rnk", F.row_number().over(wf))
        .filter(F.col("rnk") <= BITEXT_K)
        .groupBy("src_id")
        .agg(F.sum("cos_u").alias("sumf"), F.count("*").alias("nf"))
    )
    bwd = (
        pairs.withColumn("rnk", F.row_number().over(wb))
        .filter(F.col("rnk") <= BITEXT_K)
        .groupBy("tgt_id")
        .agg(F.sum("cos_u").alias("sumb"), F.count("*").alias("nb"))
    )
    m = (
        pairs.join(fwd, "src_id")
        .join(bwd, "tgt_id")
        .filter(F.col("sumf") * F.col("nb") + F.col("sumb") * F.col("nf") > 0)
        .withColumn(
            "margin_ppm",
            F.expr("cos_u * 2000000 * nf * nb div (sumf * nb + sumb * nf)"),
        )
    )
    wbest = Window.partitionBy("src_id").orderBy(
        F.desc("margin_ppm"), F.asc("tgt_id")
    )
    return (
        m.withColumn("brnk", F.row_number().over(wbest))
        .filter(
            (F.col("brnk") == 1)
            & (F.col("margin_ppm") > BITEXT_MARGIN_MIN_PPM)
        )
        .select("src_id", "tgt_id", "cos_u", "margin_ppm")
    )


SQL_BITEXT_MINE = f"""
WITH {_LSH_BUCKET_CTES},
pairs AS (
  SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
         CAST(round(sum(p.x * c.x)
                    / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.x * c.x)))
                    * 100000, 0) AS BIGINT) AS cos_u
  FROM buckets s
  JOIN buckets t ON s.bucket = t.bucket
  JOIN ex p ON p.vec_id = s.vec_id
  JOIN ex c ON c.vec_id = t.vec_id AND c.j = p.j
  WHERE s.vec_id % 2 = 0 AND t.vec_id % 2 = 1
  GROUP BY 1, 2
),
fwd AS (
  SELECT src_id, CAST(sum(cos_u) AS BIGINT) AS sumf,
         CAST(count(*) AS BIGINT) AS nf
  FROM (SELECT *, row_number() OVER (PARTITION BY src_id
                                     ORDER BY cos_u DESC, tgt_id) AS rnk
        FROM pairs)
  WHERE rnk <= {BITEXT_K} GROUP BY 1
),
bwd AS (
  SELECT tgt_id, CAST(sum(cos_u) AS BIGINT) AS sumb,
         CAST(count(*) AS BIGINT) AS nb
  FROM (SELECT *, row_number() OVER (PARTITION BY tgt_id
                                     ORDER BY cos_u DESC, src_id) AS rnk
        FROM pairs)
  WHERE rnk <= {BITEXT_K} GROUP BY 1
),
m AS (
  SELECT p.src_id, p.tgt_id, p.cos_u,
         CAST(p.cos_u * 2000000 * f.nf * b.nb
              // (f.sumf * b.nb + b.sumb * f.nf) AS BIGINT) AS margin_ppm
  FROM pairs p
  JOIN fwd f USING (src_id)
  JOIN bwd b USING (tgt_id)
  WHERE f.sumf * b.nb + b.sumb * f.nf > 0
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY src_id
                               ORDER BY margin_ppm DESC, tgt_id) AS brnk
  FROM m
)
SELECT src_id, tgt_id, cos_u, margin_ppm
FROM best WHERE brnk = 1 AND margin_ppm > {BITEXT_MARGIN_MIN_PPM}
"""


# --------------------------------------------------------------------------
# preference_pairs — reward-model / DPO training-pair assembly: pairs
# of (chosen, rejected) documents that are SEMANTICALLY CLOSE (same
# IVF cluster — so the preference signal is about quality, not topic)
# but land on opposite sides of the quality_vote ensemble.  This is
# the data-assembly step behind every "rank good vs bad continuations
# of the same kind of content" dataset; pairing across topics teaches
# the reward model topic bias instead of quality.  Per cluster: top
# PREF_TOPN keepers by votes × bottom PREF_TOPN rejects by votes
# (≤ 9 pairs), vote_gap = votes_chosen − votes_rejected ≥ 1 by
# construction (keep ⇔ votes ≥ 2).
#
# Cluster assignment and quality scores are both single-sourced
# (ivf_assign's broadcast-argmax / quality_vote's ensemble — shared
# _IVF_CTES and SQL_QUALITY_VOTE on the oracle side), so the pairs
# can never disagree with the curation ops.
#
# Scale shape (100 TB): scoring is the two component ops' own plans;
# the pairing layer adds champion-list windows on list_id (cardinality
# grows with the corpus, per-cluster work bounded) and a 3×3-bounded
# within-cluster join — no all-pairs anywhere.
# --------------------------------------------------------------------------

PREF_TOPN = 3


def preference_pairs(spark, sf_dir):
    from .text_analysis import quality_vote

    a = q_ivf_assign(spark, sf_dir)
    qv = quality_vote(spark, sf_dir).select("doc_id", "votes", "keep")
    # eager localCheckpoint: j feeds BOTH the chosen and rejected
    # branches — without it the whole ivf+quality lineage computes
    # once per branch, and Catalyst inlines the O(K·dim) centroid
    # argmax into each branch's join condition (the exact pathology
    # semantic_pack's with_ccos re-join note documents; the
    # dedup_incremental precedent for multi-branch reuse)
    j = (
        a.join(qv, a.vec_id == qv.doc_id)
        .select("doc_id", "list_id", "votes", "keep")
        .localCheckpoint()
    )
    wc = Window.partitionBy("list_id").orderBy(
        F.desc("votes"), F.asc("doc_id")
    )
    wr = Window.partitionBy("list_id").orderBy(
        F.asc("votes"), F.asc("doc_id")
    )
    chosen = (
        j.filter(F.col("keep") == 1)
        .withColumn("rnk", F.row_number().over(wc))
        .filter(F.col("rnk") <= PREF_TOPN)
        .select(
            "list_id",
            F.col("doc_id").alias("chosen_id"),
            F.col("votes").alias("cv"),
        )
    )
    rejected = (
        j.filter(F.col("keep") == 0)
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= PREF_TOPN)
        .select(
            "list_id",
            F.col("doc_id").alias("rejected_id"),
            F.col("votes").alias("rv"),
        )
    )
    return chosen.join(rejected, "list_id").select(
        "list_id",
        "chosen_id",
        "rejected_id",
        (F.col("cv") - F.col("rv")).alias("vote_gap"),
    )


def _sql_preference_pairs() -> str:
    from .text_analysis import SQL_QUALITY_VOTE

    return f"""
WITH {_IVF_CTES},
qv AS ({SQL_QUALITY_VOTE}),
j AS (
  SELECT q.doc_id, a.list_id, q.votes, q.keep
  FROM assigned a JOIN qv q ON q.doc_id = a.vec_id
),
ch AS (
  SELECT list_id, doc_id AS chosen_id, votes AS cv,
         row_number() OVER (PARTITION BY list_id
                            ORDER BY votes DESC, doc_id) AS rnk
  FROM j WHERE keep = 1
),
rj AS (
  SELECT list_id, doc_id AS rejected_id, votes AS rv,
         row_number() OVER (PARTITION BY list_id
                            ORDER BY votes, doc_id) AS rnk
  FROM j WHERE keep = 0
)
SELECT ch.list_id, chosen_id, rejected_id, cv - rv AS vote_gap
FROM ch JOIN rj ON ch.list_id = rj.list_id
WHERE ch.rnk <= {PREF_TOPN} AND rj.rnk <= {PREF_TOPN}
"""


SQL_PREFERENCE_PAIRS = _sql_preference_pairs()


# --------------------------------------------------------------------------
# mrl_recall — Matryoshka-truncation evaluation (Kusupati et al.
# 2022): modern embedding models are trained so PREFIX dimensions
# carry most of the signal, and serving stacks retrieve with
# truncated vectors (half the dims = half the memory/bandwidth) then
# re-rank with full ones.  Before flipping that switch you measure
# exactly this: per probe, top-K under the full dimension count vs
# top-K under the first MRL_DIM dims, overlap and recall.  Same
# rounded-cosine + vec_id tie-break discipline as
# ann_topk_bruteforce (round to 5dp BEFORE ranking — float sum-order
# differs across engines, ranking must see canonical scores).
#
# Scale shape: both rankings broadcast the tiny probe set and stream
# the corpus once EACH over the same scan (two narrow passes + two
# q_id-grain windows over probe-bounded rows); the overlap join is
# (q_id, vec_id)-grain over 2·P·K rows.  Truncation is a zero-cost
# array slice — no second embedding table.
# --------------------------------------------------------------------------

MRL_DIM = 32  # prefix dims for the truncated ranking (full = 64)


def _topk_ids(em, vcol, label):
    probes = em.select(
        F.col("vec_id").alias("q_id"), F.col(vcol).alias("pv")
    ).filter(F.col("q_id") < N_PROBES)
    cos = F.round(
        _dot(F.col("pv"), F.col(vcol))
        / (_norm(F.col("pv")) * _norm(F.col(vcol))),
        5,
    )
    scored = em.crossJoin(F.broadcast(probes)).select(
        "q_id", "vec_id", cos.alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .select("q_id", "vec_id", F.lit(label).alias("_side"))
    )


def mrl_recall(spark, sf_dir):
    em = _emb(spark, sf_dir).select(
        "vec_id", "v", F.slice("v", 1, MRL_DIM).alias("vt")
    )
    full = _topk_ids(em, "v", "full")
    half = _topk_ids(em, "vt", "trunc")
    # the full ranking feeds TWO consumers (overlap join + base) — it
    # is P*K rows, so the checkpoint is free and the corpus-wide
    # rank subtree plans once (the dist_drift rule)
    full = full.localCheckpoint()
    hits = full.join(half, ["q_id", "vec_id"]).groupBy("q_id").agg(
        F.count("*").cast("bigint").alias("n_overlap")
    )
    base = full.groupBy("q_id").agg(F.count("*").cast("bigint").alias("k"))
    return base.join(hits, "q_id", "left").select(
        "q_id",
        "k",
        F.coalesce("n_overlap", F.lit(0).cast("bigint")).alias("n_overlap"),
        F.expr(
            _ppm_exact("coalesce(n_overlap, 0)", "k", "div")
        ).cast("bigint").alias("recall_ppm"),
    )


def _sql_mrl() -> str:
    def ranked(tbl, dim_pred, name):
        return f"""
{name}_s AS (
  SELECT p.vec_id AS q_id, c.vec_id AS vec_id,
         round(sum(p.x * c.x) / (sqrt(sum(p.x * p.x)) * sqrt(sum(c.x * c.x))), 5) AS cos
  FROM {tbl} p JOIN {tbl} c ON p.j = c.j
  WHERE p.vec_id < {N_PROBES} {dim_pred}
  GROUP BY 1, 2
),
{name} AS (
  SELECT q_id, vec_id
  FROM (SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rnk
        FROM {name}_s)
  WHERE rnk <= {TOP_K}
)"""

    return f"""
WITH em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS j FROM em
),{ranked('ex', '', 'tfull')},{ranked('ex', f'AND p.j <= {MRL_DIM} AND c.j <= {MRL_DIM}', 'ttrunc')},
hits AS (
  SELECT tfull.q_id, CAST(count(*) AS BIGINT) AS n_overlap
  FROM tfull JOIN ttrunc
    ON tfull.q_id = ttrunc.q_id AND tfull.vec_id = ttrunc.vec_id
  GROUP BY 1
),
base AS (
  SELECT q_id, CAST(count(*) AS BIGINT) AS k FROM tfull GROUP BY 1
)
SELECT base.q_id, base.k,
       coalesce(hits.n_overlap, 0) AS n_overlap,
       CAST({_ppm_exact('coalesce(hits.n_overlap, 0)', 'base.k', '//')}
            AS BIGINT) AS recall_ppm
FROM base LEFT JOIN hits ON base.q_id = hits.q_id
"""


SQL_MRL_RECALL = _sql_mrl()


# --------------------------------------------------------------------------
# cluster_labels — c-TF-IDF distinguishing terms per IVF cluster
# (Grootendorst 2022, BERTopic's class-based TF-IDF): after clustering
# the corpus, NAME each cluster by the terms that are frequent inside
# it but rare across clusters — the topic-labeling step every
# embedding-clustered curation run needs before a human can decide
# which clusters to up/down-weight in the pretraining mixture.
# score(t, c) = tf_c(t) · ln(K / cdf(t)) with cdf = the number of
# clusters containing t (class-grain idf: a term in every cluster
# scores 0 and can never label anything).
#
# Cross-engine determinism: the ln() score is floored to integer
# micros per (cluster, term) — written as the token-identical tree
# floor(ln(K.0 / cdf) * tf * 1000000.0) in both engines (the BM25
# association rule) — and ties break by term string.
#
# Scale shape (100 TB): cluster assignment is ivf_assign's broadcast-
# argmax narrow map (zero corpus shuffle); the (list_id, term) rollup
# and the term-grain cdf rollup both partial-aggregate map-side; the
# cdf join is vocabulary-grain; the ranking window partitions on
# list_id (cluster cardinality GROWS with the corpus — SemDeDup runs
# 50k-100k lists — so window parallelism scales) and the rank
# predicate triggers WindowGroupLimit map-side pruning.
# --------------------------------------------------------------------------

CLUSTER_LABEL_TOPK = 5
CLABEL_TF_CLAMP = 3_000_000_000_000  # ln(16)·3e12·1e6 < 2^63 (see below)


def cluster_labels(spark, sf_dir):
    from .common import toks
    from .corpus_prep import _docs

    a = ivf_assign(spark, sf_dir).select("vec_id", "list_id")
    d = _docs(spark, sf_dir).select(
        "doc_id", toks(F.col("text")).alias("_tk")
    )
    j = a.join(d, a.vec_id == d.doc_id).select("list_id", "_tk")
    # eager localCheckpoint: the (list_id, term) count table feeds TWO
    # consumers (the cdf rollup and the scored join) — without the cut
    # each replans the corpus tokenization + the ivf broadcast-argmax
    # from the raw scans (the dist_drift rule)
    tf = (
        j.select("list_id", F.explode("_tk").alias("term"))
        .groupBy("list_id", "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    cdf = tf.groupBy("term").agg(F.count("*").alias("cdf"))
    # bigint headroom (the doremi_weights rule): ln(K/1) ≤ ln(16) ≈
    # 2.773, so tf enters the micro product clamped at 3e12 —
    # 2.773·3e12·1e6 ≈ 8.3e18 < 2^63; past the clamp Spark's non-ANSI
    # cast would saturate silently while DuckDB raises (divergent
    # engine failures).  The reported tf column stays unclamped.
    scored = tf.join(cdf, "term").select(
        "list_id",
        "term",
        "tf",
        "cdf",
        F.floor(
            F.log(F.lit(float(N_CENTROIDS)) / F.col("cdf"))
            * F.least(F.col("tf"), F.lit(CLABEL_TF_CLAMP))
            * F.lit(1000000.0)
        )
        .cast("bigint")
        .alias("score_micro"),
    )
    w = Window.partitionBy("list_id").orderBy(
        F.desc("score_micro"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= CLUSTER_LABEL_TOPK)
        .select("list_id", "term", "tf", "cdf", "score_micro", "rk")
    )


SQL_CLUSTER_LABELS = f"""
WITH {_IVF_CTES},
d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
jt AS (
  SELECT a.list_id, unnest(d.tk) AS term
  FROM assigned a JOIN d ON a.vec_id = d.doc_id
),
tf AS (SELECT list_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM jt GROUP BY 1, 2),
cdf AS (SELECT term, CAST(count(*) AS BIGINT) AS cdf FROM tf GROUP BY 1),
scored AS (
  SELECT list_id, term, tf, cdf,
         CAST(floor(ln({N_CENTROIDS}.0 / cdf)
                    * least(tf, {CLABEL_TF_CLAMP}) * 1000000.0)
              AS BIGINT) AS score_micro
  FROM tf JOIN cdf USING (term)
)
SELECT list_id, term, tf, cdf, score_micro, CAST(rk AS INT) AS rk
FROM (SELECT *, row_number() OVER (PARTITION BY list_id
                                   ORDER BY score_micro DESC, term) AS rk
      FROM scored)
WHERE rk <= {CLUSTER_LABEL_TOPK}
"""


# --------------------------------------------------------------------------
# kcenter_coreset — greedy k-center coreset selection (Sener &
# Savarese 2018, "Active Learning for CNNs: A Core-Set Approach"; the
# Gonzalez 1985 2-approximation): pick the data point FARTHEST from
# the current center set, repeat — the diversity-maximizing data-
# selection rule that complements quality filters (a quality filter
# keeps good docs, k-center keeps *different* ones).  Distances are
# cosine-based: the next center is the vector whose MAXIMUM cosine to
# any selected center is MINIMAL (max-min distance == min-max
# similarity), seed = vec_id 0, ties → smallest vec_id.
#
# The iterative-algorithm representative done Spark-first: the center
# set is a 1-ROW DataFrame carrying an array of (id, vector) structs —
# each round is ONE narrow pass over the corpus (broadcast the 1-row
# set, array_max over a ≤K-element per-row transform — the ivf_assign
# argmax shape) + ONE constant-size min_by aggregate; NO driver-side
# .collect() anywhere (the tfidf_topk rule).  The 1-row set is
# localCheckpointed per round, so round r never replans rounds
# 1..r−1's corpus scans (total scans = rounds + 1, the irreducible
# iterative shape).  Cosines land on the integer 1e-5 grid
# (round(cos·1e5), the ann rounded-cosine rule) BEFORE any max/min/
# rank, so cross-engine float summation order cannot flip a pick.
#
# Output = the coreset ASSIGNMENT relation: every vector, its nearest
# center, the cosine (1e-5 units), and the is_center flag — what a
# diversity-sampling job joins against.
# --------------------------------------------------------------------------

KC_ROUNDS = 3  # greedy picks beyond the seed -> 4 centers total
KC_SEED_ID = 0


def _c5(v, cv):
    """round(cos(v, cv) · 1e5) as bigint — the integer cosine grid."""
    return F.round(
        _dot(v, cv) / (_norm(v) * _norm(cv)) * 100000, 0
    ).cast("bigint")


def kcenter_coreset(spark, sf_dir):
    em = _emb(spark, sf_dir)
    sel = em.filter(F.col("vec_id") == KC_SEED_ID).agg(
        F.collect_list(
            F.struct(F.col("vec_id").alias("id"), F.col("v").alias("cv"))
        ).alias("cents")
    ).localCheckpoint()
    for _ in range(KC_ROUNDS):
        scored = em.crossJoin(F.broadcast(sel)).select(
            "vec_id",
            "v",
            F.array_max(
                F.transform("cents", lambda c: _c5(F.col("v"), c["cv"]))
            ).alias("cmax5"),
            F.exists(
                "cents", lambda c: c["id"] == F.col("vec_id")
            ).alias("_in"),
        )
        pick = scored.filter(~F.col("_in")).agg(
            F.min_by(
                F.struct(F.col("vec_id").alias("id"), F.col("v").alias("cv")),
                F.struct(F.col("cmax5"), F.col("vec_id")),
            ).alias("p")
        )
        sel = (
            sel.crossJoin(pick)
            .select(F.concat("cents", F.array("p")).alias("cents"))
            .localCheckpoint()
        )
    best = F.array_max(
        F.transform(
            "cents",
            lambda c: F.struct(
                _c5(F.col("v"), c["cv"]).alias("c5"),
                (-c["id"]).alias("nid"),
            ),
        )
    )
    return (
        em.crossJoin(F.broadcast(sel))
        .withColumn("best", best)
        .select(
            "vec_id",
            (-F.col("best")["nid"]).alias("center_id"),
            F.col("best")["c5"].alias("cos5"),
            F.exists("cents", lambda c: c["id"] == F.col("vec_id"))
            .cast("int")
            .alias("is_center"),
        )
    )


def _sql_kcenter() -> str:
    rounds = []
    for r in range(1, KC_ROUNDS + 1):
        prev = f"s{r - 1}"
        rounds.append(f"""
m{r} AS (
  SELECT ac.i, max(ac.c5) AS cmax5
  FROM ac JOIN {prev} ON ac.j = {prev}.id GROUP BY 1
),
p{r} AS (
  SELECT i AS id FROM m{r}
  WHERE i NOT IN (SELECT id FROM {prev})
  ORDER BY cmax5, i LIMIT 1
),
s{r} AS (SELECT id FROM {prev} UNION ALL SELECT id FROM p{r})""")
    steps = ",".join(rounds)
    last = f"s{KC_ROUNDS}"
    return f"""
WITH em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, unnest(v) AS x, generate_subscripts(v, 1) AS j FROM em
),
ac AS (
  SELECT a.vec_id AS i, b.vec_id AS j,
         CAST(round(sum(a.x * b.x)
                    / (sqrt(sum(a.x * a.x)) * sqrt(sum(b.x * b.x)))
                    * 100000, 0) AS BIGINT) AS c5
  FROM ex a JOIN ex b ON a.j = b.j
  GROUP BY 1, 2
),
s0 AS (SELECT CAST({KC_SEED_ID} AS BIGINT) AS id),{steps},
nearest AS (
  SELECT ac.i AS vec_id, ac.j AS center_id, ac.c5,
         row_number() OVER (PARTITION BY ac.i
                            ORDER BY ac.c5 DESC, ac.j) AS rk
  FROM ac JOIN {last} ON ac.j = {last}.id
)
SELECT vec_id, center_id, c5 AS cos5,
       CAST(CASE WHEN vec_id IN (SELECT id FROM {last})
            THEN 1 ELSE 0 END AS INT) AS is_center
FROM nearest WHERE rk = 1
"""


SQL_KCENTER_CORESET = _sql_kcenter()


# --------------------------------------------------------------------------
# colbert_maxsim — late-interaction retrieval scoring (Khattab &
# Zaharia 2020, ColBERT): instead of one vector per document, each
# side carries MULTIPLE token vectors and the score is
# MaxSim(q, d) = Σ_i max_j cos(q_i, d_j) — every query sub-vector
# finds its best match independently, which is what lets late
# interaction beat single-vector retrieval on multi-aspect queries.
# The fixture's 64-dim embeddings stand in for per-token vectors by
# deterministic slicing into MAXSIM_BLOCKS 16-dim blocks (the honest
# multi-vector stand-in — real ColBERT stores actual token vectors;
# the MECHANISM is what's exercised).
#
# Cross-engine determinism: every sub-cosine lands on the integer
# 1e-5 grid (round(cos·1e5), the ann rule) BEFORE the max and the
# sum, so MaxSim is an exact bigint in both engines.
#
# Scale shape (10^9 docs): the probe set broadcasts (the
# ann_topk_bruteforce shape); MaxSim is ONE narrow per-pair
# expression — an aggregate over the query's blocks of an array_max
# over the doc's blocks, both bound as array-of-array columns (the
# HOF materialization rule) — no explode to sub-vector grain, no
# shuffle of anything but the final probe-grain ranking window.
# --------------------------------------------------------------------------

MAXSIM_BLOCKS = 4
MAXSIM_DIM = 16


def _subvecs(v):
    return F.array(
        *[
            F.slice(v, i * MAXSIM_DIM + 1, MAXSIM_DIM)
            for i in range(MAXSIM_BLOCKS)
        ]
    )


def colbert_maxsim(spark, sf_dir):
    em = _emb(spark, sf_dir).select(
        "vec_id", _subvecs(F.col("v")).alias("sub")
    )
    probes = em.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("q_id"), F.col("sub").alias("qsub")
    )
    pair = em.crossJoin(F.broadcast(probes))
    maxsim = F.aggregate(
        "qsub",
        F.lit(0).cast("bigint"),
        lambda acc, q: acc
        + F.array_max(F.transform("sub", lambda d: _c5(q, d))),
    )
    scored = pair.select(
        "q_id", "vec_id", maxsim.alias("maxsim5")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("maxsim5"), F.asc("vec_id")
    )
    return scored.withColumn(
        "rnk", F.row_number().over(w).cast("int")
    ).filter(F.col("rnk") <= TOP_K)


SQL_COLBERT_MAXSIM = f"""
WITH em AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
ex AS (
  SELECT vec_id, unnest(v) AS x,
         (generate_subscripts(v, 1) - 1) // {MAXSIM_DIM} AS blk,
         (generate_subscripts(v, 1) - 1) % {MAXSIM_DIM} AS pi
  FROM em
),
bc AS (
  SELECT q.vec_id AS q_id, d.vec_id AS vec_id, q.blk AS qb, d.blk AS db,
         CAST(round(sum(q.x * d.x)
                    / (sqrt(sum(q.x * q.x)) * sqrt(sum(d.x * d.x)))
                    * 100000, 0) AS BIGINT) AS c5
  FROM ex q JOIN ex d ON q.pi = d.pi
  WHERE q.vec_id < {N_PROBES}
  GROUP BY 1, 2, 3, 4
),
best AS (
  SELECT q_id, vec_id, qb, max(c5) AS m FROM bc GROUP BY 1, 2, 3
),
ms AS (
  SELECT q_id, vec_id, CAST(sum(m) AS BIGINT) AS maxsim5
  FROM best GROUP BY 1, 2
)
SELECT q_id, vec_id, maxsim5,
       CAST(rnk AS INT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY q_id
                                   ORDER BY maxsim5 DESC, vec_id) AS rnk
      FROM ms)
WHERE rnk <= {TOP_K}
"""


# --------------------------------------------------------------------------
# embedding_dim_stats — per-dimension embedding-health telemetry (the
# "dead dims / scale drift" report every embedding-pipeline rollout
# watches: a dimension whose mean-square collapses to ~0 is dead
# weight in the index; a mean drifting off 0 signals a normalization
# bug upstream): per dim — count, Σq, Σq² over milli-quantized
# components, mean_micro and rms_micro.
#
# Determinism + headroom: components quantize to q = ⌊x·1e3⌋ (milli;
# float32 → double conversion is exact and the one multiply+floor is
# correctly rounded identically in both engines), so Σq / Σq² are
# exact bigints.  Milli (not micro) is deliberate: |q| ≤ 1e3 for
# unit-normalized inputs keeps Σq² ≤ n·1e6 — under 2^63 to n ≈ 9e12
# vectors with NO clamp and NO n·Σq² product (the zipf_fit x-in-milli
# lesson); mean_micro is the pass-21 sign form (Σq is SIGNED), and
# rms_micro applies one token-identical float expression
# (⌊√(Σq²/n)·1000⌋ — the sparse_cosine rule).
#
# Scale shape: ONE scan → posexplode (dim is a constant-cardinality
# key) → dim-grain partial agg; no window, no join, no python.
# --------------------------------------------------------------------------


def embedding_dim_stats(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.posexplode("embedding").alias("dim", "x")
    )
    q = e.select(
        "dim",
        F.floor(F.col("x").cast("double") * F.lit(1000.0))
        .cast("bigint")
        .alias("q"),
    )
    s = q.groupBy("dim").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("q").cast("bigint").alias("sum_q_milli"),
        F.sum(F.col("q") * F.col("q")).cast("bigint").alias("sum_sq_milli"),
    )
    return s.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        "sum_q_milli",
        "sum_sq_milli",
        F.expr(
            "CASE WHEN sum_q_milli < 0"
            "     THEN -((-sum_q_milli) * 1000 div n)"
            "     ELSE (sum_q_milli * 1000) div n END"
        )
        .cast("bigint")
        .alias("mean_micro"),
        F.floor(
            F.sqrt(
                F.col("sum_sq_milli").cast("double")
                / F.col("n").cast("double")
            )
            * F.lit(1000.0)
        )
        .cast("bigint")
        .alias("rms_micro"),
    )


SQL_EMBEDDING_DIM_STATS = """
WITH e AS (
  -- DuckDB 1.0.0 has no WITH ORDINALITY; index via an unnested range
  SELECT CAST(i - 1 AS BIGINT) AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000.0) AS BIGINT) AS q
  FROM (SELECT embedding, unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings)
),
s AS (
  SELECT dim, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(q) AS BIGINT) AS sum_q_milli,
         CAST(sum(q * q) AS BIGINT) AS sum_sq_milli
  FROM e GROUP BY dim
)
SELECT CAST(dim AS INT) AS dim, n, sum_q_milli, sum_sq_milli,
       CAST(CASE WHEN sum_q_milli < 0
                 THEN -((-sum_q_milli) * 1000 // n)
                 ELSE (sum_q_milli * 1000) // n END AS BIGINT) AS mean_micro,
       CAST(floor(sqrt(CAST(sum_sq_milli AS DOUBLE) / CAST(n AS DOUBLE))
                  * 1000.0) AS BIGINT) AS rms_micro
FROM s
"""


QUERIES = {
    "embedding_dim_stats": embedding_dim_stats,
    "kcenter_coreset": kcenter_coreset,
    "colbert_maxsim": colbert_maxsim,
    "cluster_labels": cluster_labels,
    "mrl_recall": mrl_recall,
    "bitext_mine": bitext_mine,
    "preference_pairs": preference_pairs,
    "ann_topk_bruteforce": ann_topk_bruteforce,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "lsh_bucket_stats": lsh_bucket_stats,
    "ann_ivf_flat": ann_ivf_flat,
    "ivf_assign": q_ivf_assign,
    "embed_outliers": embed_outliers,
    "ann_topk_quantized": ann_topk_quantized,
    "pq_encode": q_pq_encode,
    "ann_topk_pq": ann_topk_pq,
    "knn_graph": knn_graph,
    "kmeans_update": kmeans_update,
    "semantic_pack": semantic_pack,
}

ORACLE_SQL = {
    "embedding_dim_stats": SQL_EMBEDDING_DIM_STATS,
    "kcenter_coreset": SQL_KCENTER_CORESET,
    "colbert_maxsim": SQL_COLBERT_MAXSIM,
    "cluster_labels": SQL_CLUSTER_LABELS,
    "mrl_recall": SQL_MRL_RECALL,
    "bitext_mine": SQL_BITEXT_MINE,
    "preference_pairs": SQL_PREFERENCE_PAIRS,
    "semantic_pack": SQL_SEMANTIC_PACK,
    "ann_topk_bruteforce": SQL_ANN_BRUTEFORCE,
    "ann_lsh_bucketed": SQL_ANN_LSH,
    "lsh_bucket_stats": SQL_LSH_BUCKET_STATS,
    "ann_ivf_flat": SQL_ANN_IVF,
    "ivf_assign": SQL_IVF_ASSIGN,
    "embed_outliers": SQL_EMBED_OUTLIERS,
    "ann_topk_quantized": SQL_ANN_QUANTIZED,
    "pq_encode": SQL_PQ_ENCODE,
    "ann_topk_pq": SQL_ANN_PQ,
    "knn_graph": SQL_KNN_GRAPH,
    "kmeans_update": SQL_KMEANS_UPDATE,
}
