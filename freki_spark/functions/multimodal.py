"""Multimodal (image/audio/video) column plumbing: opaque ``binary``
content + typed metadata, with decode / feature-extract / resize /
frame-sample implemented as Arrow-batched pandas UDFs over
``mapInPandas``.

The actual codecs (PIL / torchaudio / ffmpeg) are NOT in this
container, so — as the spec requires — the decode step is STUBBED:
``decode_image`` raises ``NotImplementedError`` with a clear message,
and the pipeline runs on ``fake_features`` (a deterministic
sha256-derived feature vector) instead.  Everything Spark-side is
real and tested: the binary column synthesis, the schema, the
mapInPandas batch shape, and the partitioning, so swapping the stub
for a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("content_len", T.IntegerType()),
        T.StructField("feat0", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def media_dims(k):
    """THE synthetic media dimension FORMULA (width 64..575 from the
    low 9 key bits, height 64..319 from the next 8 — decorrelated so a
    height-only bug can't hide behind a width check).  Shared by
    synth_media_table (keyed by doc_id) and queries.q_media_span_join
    (keyed by md5i32(media_ref)): the two dims use different key
    spaces, so their VALUES differ for the same ref — what is unified
    is the formula and its SQL mirrors."""
    return (
        (64 + F.pmod(k, F.lit(512))).cast("int"),
        (64 + F.pmod(F.shiftright(k, 9), F.lit(256))).cast("int"),
    )


def synth_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic opaque media rows for every 5th document: content
    bytes are unhex(sha256(media_ref)) — a stand-in for real image
    bytes with a stable value per ref."""
    d = documents.filter(F.col("doc_id") % 5 == 0)
    ref = F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/0"))
    width, height = media_dims(F.col("doc_id"))
    return d.select(
        "doc_id",
        ref.alias("media_ref"),
        F.unhex(F.sha2(ref, 256)).alias("content"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            width.alias("width"),
            height.alias("height"),
            (1 + F.col("doc_id") % 16).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(content: bytes):
    """Real image decode — requires PIL/libjpeg, which this container
    does not ship.  STUB (spec-mandated): swap in PIL.Image.open here
    when the dependency is available."""
    raise NotImplementedError(
        "image decode requires PIL/libjpeg (not available in this container); "
        "use fake_features() for the deterministic stand-in path"
    )


def _fake_feature_vector(content: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image feature extractor.
    Hashes the hex form of the bytes (DuckDB's sha256 is VARCHAR-only,
    so the oracle can mirror this exactly)."""
    h = hashlib.sha256(bytes(content).hex().encode()).digest()
    return [h[i] / 255.0 for i in range(dims)]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "content_len": content.map(len).astype("int32"),
                    "feat0": pdf["media_ref"].map(
                        lambda r: int(hashlib.sha256(r.encode()).hexdigest()[:8], 16)
                    ),
                    "features": content.map(_fake_feature_vector),
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def resize_meta(media: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize planning (pure metadata math; the pixel op is the stub)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side))
        / F.greatest(F.col("meta.width"), F.col("meta.height")),
    )
    return media.select(
        "doc_id",
        "media_ref",
        F.round(F.col("meta.width") * scale).cast("int").alias("new_w"),
        F.round(F.col("meta.height") * scale).cast("int").alias("new_h"),
    )


def frame_sample(media: DataFrame, stride: int = 4) -> DataFrame:
    """Deterministic frame sampling from n_frames metadata."""
    return media.select(
        "doc_id",
        "media_ref",
        F.sequence(
            F.lit(0), F.col("meta.n_frames") - 1, F.lit(stride)
        ).alias("frame_idx"),
    )


# ---- queries() entries ------------------------------------------------------


def q_media_features(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = extract_features(synth_media_table(docs))
    return feats.select(
        "doc_id",
        "media_ref",
        "content_len",
        "feat0",
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f1"),
    )


# content = unhex(sha256(ref)) -> 32 bytes; feat0 = first 4 bytes of
# sha256(ref) as int; f1 = first byte of sha256(content) / 255.
# The features column is float32 (realistic embedding storage), so the
# oracle must mirror the quantization: CAST(... AS REAL) before the
# final round, else byte values whose float32 neighbor crosses the
# 6-decimal boundary disagree (found at sf0.1: 131/255).
SQL_MEDIA_FEATURES = """
WITH m AS (
  SELECT doc_id, 'img://' || doc_id || '/0' AS media_ref
  FROM documents WHERE doc_id % 5 = 0
)
SELECT doc_id, media_ref,
       32 AS content_len,
       CAST('0x' || substr(sha256(media_ref), 1, 8) AS BIGINT) AS feat0,
       round(CAST(CAST(CAST(('0x' || substr(sha256(sha256(media_ref)), 1, 2))
                            AS BIGINT) / 255.0 AS REAL) AS DOUBLE), 6) AS f1
FROM m
"""


def q_media_resize(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return resize_meta(synth_media_table(docs))


SQL_MEDIA_RESIZE = """
WITH m AS (
  SELECT doc_id, 'img://' || doc_id || '/0' AS media_ref,
         CAST(64 + doc_id % 512 AS INT) AS w,
         CAST(64 + (doc_id >> 9) % 256 AS INT) AS h
  FROM documents WHERE doc_id % 5 = 0
),
s AS (
  SELECT *, least(1.0, 128.0 / greatest(w, h)) AS scale FROM m
)
SELECT doc_id, media_ref,
       CAST(round(w * scale, 0) AS INT) AS new_w,
       CAST(round(h * scale, 0) AS INT) AS new_h
FROM s
"""


def q_media_frame_sample(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = frame_sample(synth_media_table(docs))
    return m.select(
        "doc_id", "media_ref", F.posexplode("frame_idx").alias("pos", "frame")
    )


SQL_MEDIA_FRAME_SAMPLE = """
WITH m AS (
  SELECT doc_id, 'img://' || doc_id || '/0' AS media_ref,
         CAST(1 + doc_id % 16 AS INT) AS n_frames
  FROM documents WHERE doc_id % 5 = 0
)
SELECT doc_id, media_ref,
       CAST(generate_subscripts(range(0, n_frames, 4), 1) - 1 AS INT) AS pos,
       CAST(unnest(range(0, n_frames, 4)) AS INT) AS frame
FROM m
"""


MEDIA_CONTENT_GROUPS = 100


def synth_media_dup_table(documents: DataFrame) -> DataFrame:
    """Media rows where distinct refs share bytes: content is keyed by
    ``doc_id % MEDIA_CONTENT_GROUPS``, so every 5th doc carries a blob
    drawn from a small pool of distinct payloads — the re-hosted /
    re-crawled-asset shape binary dedup exists for."""
    d = documents.filter(F.col("doc_id") % 5 == 0)
    ref = F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/0"))
    blob_key = F.concat(
        F.lit("blob://"), (F.col("doc_id") % MEDIA_CONTENT_GROUPS).cast("string")
    )
    return d.select(
        "doc_id", ref.alias("media_ref"), F.unhex(F.sha2(blob_key, 256)).alias("content")
    )


def media_dedup(spark, sf_dir):
    """Exact binary dedup over an opaque media column: hash the BYTES
    (sha256 over the binary — never the ref, which differs per copy),
    elect min(media_ref) per digest as canonical, flag the rest.

    Scale shape: one narrow map computes the 32-byte digest, the blob
    itself is projected away BEFORE the shuffle (only digest + ref
    move), and one window over the digest partitions both elects the
    canonical and flags duplicates — a single Exchange whose payload is
    ~70 B/row regardless of asset size.  The oracle mirrors the
    synthetic content construction (content is a function of
    doc_id % groups), the same convention as SQL_MEDIA_FEATURES."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = synth_media_dup_table(docs).select(
        "media_ref", F.sha2("content", 256).alias("ck")
    )
    w = Window.partitionBy("ck")
    return m.select(
        "media_ref",
        F.min("media_ref").over(w).alias("canonical_ref"),
    ).select(
        "media_ref",
        "canonical_ref",
        (F.col("media_ref") != F.col("canonical_ref")).cast("int").alias("is_dup"),
    )


SQL_MEDIA_DEDUP = f"""
WITH m AS (
  SELECT 'img://' || doc_id || '/0' AS media_ref,
         doc_id % {MEDIA_CONTENT_GROUPS} AS ck
  FROM documents WHERE doc_id % 5 = 0
)
SELECT media_ref,
       min(media_ref) OVER (PARTITION BY ck) AS canonical_ref,
       CAST(media_ref <> min(media_ref) OVER (PARTITION BY ck) AS INT) AS is_dup
FROM m
"""


# --------------------------------------------------------------------------
# media_phash_dedup — PERCEPTUAL near-dup detection over media (the
# image-dedup stage of LAION-style multimodal pipelines: re-encoded /
# re-compressed copies have different bytes, so sha256 exact dedup
# misses them, but their perceptual hash differs in only a few bits).
# In production the 64-bit hash is dHash/pHash of the DECODED pixels;
# the decoder is this container's spec-mandated stub, so the stand-in
# derives a 60-bit hash from the content bytes and synthesizes
# "re-encoded" copies by flipping 2 deterministic bits — the banding +
# verify machinery (the part that scales) is real and value-checked.
#
# Candidate generation is Manku-style banding, like dedup_simhash: the
# 60-bit hash splits into 4 × 15-bit bands; any pair within Hamming
# distance 3 agrees on >= 1 whole band (pigeonhole), so a band
# equi-join has guaranteed recall to distance 3.  Random far pairs
# share a band with p ~ 4/2^15 and are killed by the exact
# bit_count(xor) verify.
#
# Scale shape (100 TB of images): the blob never enters this op's
# shuffle — the narrow map reduces each asset to (ref, 60-bit hash)
# before the 4x band explode, the band join is an AQE-skew-splittable
# equi-join on 15-bit keys, and the verify is integer bit math.  Band
# width is the precision dial (wider bands = fewer false candidates,
# lower guaranteed Hamming radius).
# --------------------------------------------------------------------------

PHASH_BITS = 60
PHASH_BANDS = 4
PHASH_BAND_BITS = 15  # 4 x 15 = 60: distance <= 3 shares >= 1 band
PHASH_MAX_HAMMING = 3


def _phash_media(spark, sf_dir) -> DataFrame:
    """(media_ref, phash) for base assets ∪ 2-bit-flipped re-encodes
    (every 3rd asset) ∪ unrelated far copies (every 5th asset)."""
    from .common import md5i32, md5i60

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    m = synth_media_table(docs).select("doc_id", "media_ref", "content")
    base = m.select(
        "doc_id",
        "media_ref",
        md5i60(F.concat(F.lit("phash:"), F.hex("content"))).alias("phash"),
    )
    mut = (
        base.filter(F.col("doc_id") % 15 == 0)
        .select(
            F.concat(F.col("media_ref"), F.lit("/re")).alias("media_ref"),
            "phash",
            (md5i32(F.concat(F.col("media_ref"), F.lit(":f1")))
             % PHASH_BITS).cast("int").alias("p1"),
            (md5i32(F.concat(F.col("media_ref"), F.lit(":f2")))
             % PHASH_BITS).cast("int").alias("p2"),
        )
        .select(
            "media_ref",
            F.expr(
                "phash ^ shiftleft(CAST(1 AS BIGINT), p1)"
                " ^ shiftleft(CAST(1 AS BIGINT), p2)"
            ).alias("phash"),
        )
    )
    far_ref = F.concat(F.col("media_ref"), F.lit("/far"))
    far = m.filter(F.col("doc_id") % 25 == 0).select(
        far_ref.alias("media_ref"),
        md5i60(
            F.concat(F.lit("phash:"), F.hex(F.unhex(F.sha2(far_ref, 256))))
        ).alias("phash"),
    )
    return base.select("media_ref", "phash").unionAll(mut).unionAll(far)


def media_phash_dedup(spark, sf_dir):
    c = _phash_media(spark, sf_dir)
    bands = c.select(
        "media_ref",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.pmod(
                            F.shiftright(F.col("phash"), b * PHASH_BAND_BITS),
                            F.lit(1 << PHASH_BAND_BITS),
                        ).alias("bv"),
                    )
                    for b in range(PHASH_BANDS)
                ]
            )
        ).alias("x"),
    ).select("media_ref", "phash", "x.band", "x.bv")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.media_ref") < F.col("b.media_ref")),
        )
        .select(
            F.col("a.media_ref").alias("a_ref"),
            F.col("b.media_ref").alias("b_ref"),
            F.col("a.phash").alias("pa"),
            F.col("b.phash").alias("pb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return pairs.select(
        "a_ref", "b_ref", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= PHASH_MAX_HAMMING)


from .common import DUCK_MD5I32 as _DUCK32  # noqa: E402
from .common import DUCK_MD5I60 as _DUCK60  # noqa: E402

_PH_BASE = _DUCK60.format(x="'phash:' || upper(sha256(media_ref))")
_PH_FAR = _DUCK60.format(x="'phash:' || upper(sha256(media_ref || '/far'))")
_PH_P1 = _DUCK32.format(x="media_ref || ':f1'")
_PH_P2 = _DUCK32.format(x="media_ref || ':f2'")

SQL_MEDIA_PHASH_DEDUP = f"""
WITH m AS (
  SELECT doc_id, 'img://' || doc_id || '/0' AS media_ref
  FROM documents WHERE doc_id % 5 = 0
),
base AS (SELECT doc_id, media_ref, {_PH_BASE} AS phash FROM m),
mut AS (
  SELECT media_ref || '/re' AS media_ref,
         xor(xor(phash, CAST(1 AS BIGINT) << ({_PH_P1} % {PHASH_BITS})),
             CAST(1 AS BIGINT) << ({_PH_P2} % {PHASH_BITS})) AS phash
  FROM base WHERE doc_id % 15 = 0
),
far AS (SELECT media_ref || '/far' AS media_ref, {_PH_FAR} AS phash
        FROM m WHERE doc_id % 25 = 0),
c AS (
  SELECT media_ref, phash FROM base
  UNION ALL SELECT * FROM mut
  UNION ALL SELECT * FROM far
),
bands AS (
  SELECT media_ref, phash, b,
         (phash >> (b * {PHASH_BAND_BITS})) % {1 << PHASH_BAND_BITS} AS bv
  FROM c CROSS JOIN (SELECT unnest(range(0, {PHASH_BANDS})) AS b)
),
pairs AS (
  SELECT DISTINCT a.media_ref AS a_ref, b.media_ref AS b_ref,
         a.phash AS pa, b.phash AS pb
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.bv = b.bv AND a.media_ref < b.media_ref
)
SELECT a_ref, b_ref, CAST(bit_count(xor(pa, pb)) AS INT) AS hamming
FROM pairs WHERE bit_count(xor(pa, pb)) <= {PHASH_MAX_HAMMING}
"""


# --------------------------------------------------------------------------
# clip_filter — image-text pair filtering by embedding similarity (the
# LAION curation rule, Schuhmann et al. 2021: keep a candidate pair
# only if CLIP cosine similarity clears a threshold; the filter is
# what turned 50B raw pairs into the 400M/5B training sets).  The
# encoders are this container's spec-mandated stub — image and text
# vectors are deterministic sha256-derived byte vectors — but the
# decision machinery is real and INTEGER-EXACT cross-engine:
#     keep  ⟺  cos(a,b) >= 3/4  ⟺  16·dot(a,b)² >= 9·|a|²·|b|²
# (components are non-negative so dot > 0 and squaring is monotone).
# A float cosine would hit the cross-engine reassociation trap BM25
# hit; the squared-integer form cannot.
#
# Scale shape (100 TB of pairs): each candidate pair is one row
# (media rides with its host document's text — the caption_mine output
# shape), the vectors are fixed 8-int arrays built in the same narrow
# pass, and the verdict is per-row integer math — zero Exchange
# (plan-audited).  The media columns derive from the host row itself
# (the synth_media_table formula inlined), so no join materializes at
# all; with a separate media table, the pair join is doc_id-grain and
# co-located under the io.py bucket convention.
# --------------------------------------------------------------------------

CLIP_DIMS = 8
CLIP_THR_NUM = 3  # threshold = 3/4; 16·dot² >= 9·|a|²·|b|²
CLIP_THR_DEN = 4


def _hash_vec(hex_col):
    """First CLIP_DIMS bytes of a sha256 hex string as a bigint array."""
    return F.array(
        *[
            F.conv(F.substring(hex_col, 2 * i + 1, 2), 16, 10).cast("bigint")
            for i in range(CLIP_DIMS)
        ]
    )


def clip_filter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # synth_media_table's ref/content formula inlined on the host row:
    # pair construction stays a single narrow pass (no self-join)
    ref = F.concat(F.lit("img://"), F.col("doc_id").cast("string"), F.lit("/0"))
    pairs = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id",
        ref.alias("media_ref"),
        F.unhex(F.sha2(ref, 256)).alias("content"),
        "text",
    )
    # image encoder stub: sha256 of the lowercase content hex (the
    # _fake_feature_vector convention); text encoder stub: sha256(text)
    img_hex = F.sha2(F.lower(F.hex("content")), 256)
    txt_hex = F.sha2(F.col("text"), 256)
    v = pairs.select(
        "doc_id",
        "media_ref",
        _hash_vec(img_hex).alias("iv"),
        _hash_vec(txt_hex).alias("tv"),
    )
    dot = F.aggregate(
        F.zip_with("iv", "tv", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    sq = lambda c: F.aggregate(  # noqa: E731
        F.transform(c, lambda a: a * a),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = v.select(
        "doc_id",
        "media_ref",
        dot.alias("dot"),
        sq("iv").alias("na2"),
        sq("tv").alias("nb2"),
    )
    keep = (
        F.lit(CLIP_THR_DEN * CLIP_THR_DEN) * F.col("dot") * F.col("dot")
        >= F.lit(CLIP_THR_NUM * CLIP_THR_NUM) * F.col("na2") * F.col("nb2")
    )
    return scored.select(
        "doc_id", "media_ref", "dot", "na2", "nb2", keep.cast("int").alias("keep")
    )


def _duck_vec_terms(hex_expr, f):
    """Σ f(byte_i) over the first CLIP_DIMS bytes of a hex string."""
    return " + ".join(
        f(f"CAST('0x' || substr({hex_expr}, {2 * i + 1}, 2) AS BIGINT)")
        for i in range(CLIP_DIMS)
    )


_CLIP_IMG = "sha256(sha256(media_ref))"  # content hex IS sha256(ref), lowercase
_CLIP_TXT = "sha256(text)"

SQL_CLIP_FILTER = f"""
WITH m AS (
  SELECT doc_id, 'img://' || doc_id || '/0' AS media_ref, text
  FROM documents WHERE doc_id % 5 = 0
),
s AS (
  SELECT doc_id, media_ref,
         {_duck_vec_terms(_CLIP_IMG, lambda a: f"({a}) * ({a})")} AS na2,
         {_duck_vec_terms(_CLIP_TXT, lambda b: f"({b}) * ({b})")} AS nb2,
         {" + ".join(
             f"(CAST('0x' || substr({_CLIP_IMG}, {2 * i + 1}, 2) AS BIGINT)"
             f" * CAST('0x' || substr({_CLIP_TXT}, {2 * i + 1}, 2) AS BIGINT))"
             for i in range(CLIP_DIMS)
         )} AS dot
  FROM m
)
SELECT doc_id, media_ref, dot, na2, nb2,
       CAST({CLIP_THR_DEN * CLIP_THR_DEN} * dot * dot
            >= {CLIP_THR_NUM * CLIP_THR_NUM} * na2 * nb2 AS INT) AS keep
FROM s
"""


# --------------------------------------------------------------------------
# audio_vad_windows — voice-activity segmentation plumbing (the
# audio-modality counterpart of media_frame_sample): per media asset,
# per-frame energy is thresholded and CONSECUTIVE active frames merge
# into segments (start frame, end frame, length) — the relation every
# speech pipeline cuts transcription batches from (webrtcvad /
# silero-style gating; decode is environment-stubbed like
# decode_image, so energy is a deterministic md5 stand-in per
# (media_ref, frame) — the Spark-side plumbing is the real artifact:
# frame explode bounded by the asset's own meta.n_frames, the
# gaps-and-islands merge, the asset-grain windows).
#
# Scale shape: the frame fan-out is bounded per row by meta.n_frames
# (an asset's own length, never corpus-grain); both islands windows
# share one hash(doc_id, media_ref) partitioning — the ASSET grain, so
# multi-asset docs can never merge segments across assets (the
# q_sessionize_batch rule); the segment rollup aggregates in place on
# the same key (a superset-keyed groupBy reuses the window Exchange).
# --------------------------------------------------------------------------

VAD_ENERGY_MAX = 1000  # synthetic per-frame energy in [0, 1000)
VAD_THRESHOLD = 400  # frames >= threshold are "speech" (~60%)


def _vad_media(spark, sf_dir):
    """(doc_id, media_ref, n_frames) media assets — shared spine of
    audio_vad_windows and transcript_vad_align."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return synth_media_table(docs).select(
        "doc_id", "media_ref", F.col("meta.n_frames").alias("n_frames")
    )


def _energized_frames(media):
    """Deterministic per-frame energy stream from a media spine — the
    ONE Spark-side frame synthesis, shared by audio_vad_windows and
    transcript_vad_align (mirrored once in _duck_vad_ctes)."""
    from .common import md5i32

    return media.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1)
        ).alias("f"),
    ).withColumn(
        "energy",
        (
            md5i32(
                F.concat(
                    F.col("media_ref"), F.lit(":e"), F.col("f").cast("string")
                )
            )
            % VAD_ENERGY_MAX
        ).cast("int"),
    )


def audio_vad_windows(spark, sf_dir):
    return _vad_segments(_energized_frames(_vad_media(spark, sf_dir)))


def _vad_segments(frames):
    """Gaps-and-islands merge over a (doc_id, media_ref, f, energy)
    frame table.  Windows partition on (doc_id, media_ref) — the ASSET
    grain — so frames from different assets of one doc can never
    interleave or merge across assets, and the frame index f is unique
    within each partition (no nondeterministic lag ties).  Factored out
    so the multi-asset contract is testable independently of
    synth_media_table's current one-asset-per-doc shape."""
    from pyspark.sql import Window

    speech = frames.filter(F.col("energy") >= VAD_THRESHOLD)
    w = Window.partitionBy("doc_id", "media_ref").orderBy("f")
    seg_no = F.sum(
        F.when(
            F.lag("f").over(w).isNull()
            | (F.col("f") > F.lag("f").over(w) + 1),
            1,
        ).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        speech.withColumn("seg_no", seg_no.cast("int"))
        .groupBy("doc_id", "media_ref", "seg_no")
        .agg(
            F.min("f").cast("int").alias("f_start"),
            F.max("f").cast("int").alias("f_end"),
            F.count("*").cast("int").alias("n_frames_seg"),
        )
    )


def _duck_vad_ctes() -> str:
    """media→frames→energized→speech→islands→vseg — the ONE SQL
    mirror of the frame synthesis + island merge, shared by
    SQL_AUDIO_VAD_WINDOWS and SQL_TRANSCRIPT_VAD_ALIGN."""
    from .common import DUCK_MD5I32

    h = DUCK_MD5I32.format(
        x="media_ref || ':e' || CAST(f AS VARCHAR)"
    )
    return f"""media AS (
  SELECT doc_id,
         'img://' || CAST(doc_id AS VARCHAR) || '/0' AS media_ref,
         1 + doc_id % 16 AS n_frames
  FROM documents WHERE doc_id % 5 = 0
),
frames AS (
  SELECT doc_id, media_ref, unnest(range(0, n_frames)) AS f
  FROM media
),
energized AS (
  SELECT doc_id, media_ref, f,
         CAST({h} % {VAD_ENERGY_MAX} AS INT) AS energy
  FROM frames
),
speech AS (
  SELECT * FROM energized WHERE energy >= {VAD_THRESHOLD}
),
marked AS (
  SELECT *, CASE WHEN lag(f) OVER w IS NULL OR f > lag(f) OVER w + 1
                 THEN 1 ELSE 0 END AS is_new
  FROM speech
  WINDOW w AS (PARTITION BY doc_id, media_ref ORDER BY f)
),
islands AS (
  SELECT *, CAST(sum(is_new) OVER (PARTITION BY doc_id, media_ref ORDER BY f
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT)
            AS seg_no
  FROM marked
),
vseg AS (
  SELECT doc_id, media_ref, seg_no,
         CAST(min(f) AS INT) AS f_start,
         CAST(max(f) AS INT) AS f_end,
         CAST(count(*) AS INT) AS n_frames_seg
  FROM islands GROUP BY 1, 2, 3
)"""


SQL_AUDIO_VAD_WINDOWS = f"""
WITH {_duck_vad_ctes()}
SELECT doc_id, media_ref, seg_no, f_start, f_end, n_frames_seg
FROM vseg
"""


# --------------------------------------------------------------------------
# transcript_vad_align — transcript-to-speech alignment (the
# multimodal-prep step that decides which transcript segments carry
# actual speech before they become training pairs): deterministic
# per-asset transcript tiling (1 + doc_id % 3 equal-length segments
# covering the frame range) interval-joined against the VAD speech
# segments; a pair is emitted per (speech segment, transcript
# segment) with >= 1 overlapping frame, carrying the exact overlap
# frame count.  Both relations are SINGLE-SOURCED with
# audio_vad_windows (_energized_frames/_vad_segments on the Spark
# side, _duck_vad_ctes on the SQL side), so alignment audits the same
# segments the VAD op reports.
#
# Scale shape: the interval join is an EQUI-join on (doc_id,
# media_ref) — the asset grain — with the overlap predicate applied
# inside each asset's ≤16-frame segment sets (bounded per asset, the
# media_span_join posture); all integer frame arithmetic.
# --------------------------------------------------------------------------


def transcript_vad_align(spark, sf_dir):
    # localCheckpoint: the media spine feeds TWO consumers (the VAD
    # segment branch and the transcript tiling) — the dist_drift rule
    media = _vad_media(spark, sf_dir).localCheckpoint()
    vseg = _vad_segments(_energized_frames(media))
    ntr = (F.lit(1) + F.col("doc_id") % 3).cast("int")
    length = F.expr("CAST((n_frames + n_tr - 1) div n_tr AS INT)")
    tr = (
        media.withColumn("n_tr", ntr)
        .withColumn("seg_len", length)
        .select(
            "doc_id",
            "media_ref",
            "n_frames",
            "seg_len",
            F.explode(F.sequence(F.lit(0), F.col("n_tr") - 1)).alias(
                "tr_no"
            ),
        )
        .select(
            "doc_id",
            "media_ref",
            F.col("tr_no").cast("int").alias("tr_no"),
            (F.col("tr_no") * F.col("seg_len")).cast("int").alias("t_start"),
            F.least(
                (F.col("tr_no") + 1) * F.col("seg_len") - 1,
                F.col("n_frames") - 1,
            ).cast("int").alias("t_end"),
        )
    )
    j = vseg.join(tr, ["doc_id", "media_ref"])
    ov = F.least("f_end", "t_end") - F.greatest("f_start", "t_start") + 1
    return (
        j.withColumn("overlap_frames", ov.cast("int"))
        .filter(F.col("overlap_frames") >= 1)
        .select(
            "doc_id",
            "media_ref",
            "seg_no",
            "tr_no",
            "f_start",
            "f_end",
            "t_start",
            "t_end",
            "overlap_frames",
        )
    )


SQL_TRANSCRIPT_VAD_ALIGN = f"""
WITH {_duck_vad_ctes()},
tr AS (
  SELECT doc_id, media_ref, CAST(tr_no AS INT) AS tr_no,
         CAST(tr_no * seg_len AS INT) AS t_start,
         CAST(least((tr_no + 1) * seg_len - 1, n_frames - 1) AS INT)
           AS t_end
  FROM (SELECT doc_id, media_ref, n_frames,
               (n_frames + n_tr - 1) // n_tr AS seg_len,
               unnest(range(0, n_tr)) AS tr_no
        FROM (SELECT doc_id, media_ref, n_frames,
                     CAST(1 + doc_id % 3 AS INT) AS n_tr
              FROM media))
)
SELECT v.doc_id, v.media_ref, v.seg_no, tr.tr_no,
       v.f_start, v.f_end, tr.t_start, tr.t_end,
       CAST(least(v.f_end, tr.t_end) - greatest(v.f_start, tr.t_start) + 1
            AS INT) AS overlap_frames
FROM vseg v
JOIN tr ON v.doc_id = tr.doc_id AND v.media_ref = tr.media_ref
WHERE least(v.f_end, tr.t_end) - greatest(v.f_start, tr.t_start) + 1 >= 1
"""


QUERIES = {
    "audio_vad_windows": audio_vad_windows,
    "transcript_vad_align": transcript_vad_align,
    "media_features": q_media_features,
    "media_phash_dedup": media_phash_dedup,
    "clip_filter": clip_filter,
    "media_resize": q_media_resize,
    "media_frame_sample": q_media_frame_sample,
    "media_dedup": media_dedup,
}

ORACLE_SQL = {
    "audio_vad_windows": SQL_AUDIO_VAD_WINDOWS,
    "transcript_vad_align": SQL_TRANSCRIPT_VAD_ALIGN,
    "media_features": SQL_MEDIA_FEATURES,
    "media_phash_dedup": SQL_MEDIA_PHASH_DEDUP,
    "clip_filter": SQL_CLIP_FILTER,
    "media_resize": SQL_MEDIA_RESIZE,
    "media_frame_sample": SQL_MEDIA_FRAME_SAMPLE,
    "media_dedup": SQL_MEDIA_DEDUP,
}
