"""WARC-style crawl-archive source: distributed record framing parser.

Web-scale corpora arrive as WARC archives (one file = many
length-framed records), so the engine needs a source that turns raw
archive bytes into rows WITHOUT trusting separators: real payloads can
contain ``WARC/1.0`` or blank lines, and the only correct framing is
the ``Content-Length`` byte count (ISO 28500 §4).  The parser here
walks byte offsets exactly that way.

Test/bench shape: archives are synthesized deterministically from the
driver's ``documents`` table (10 records per chunk, JVM-side string
assembly — pure function of (doc_id, source, text)), then parsed back
by the distributed parser.  The oracle reconstructs the expected rows
directly from ``documents`` — so the gate value-checks the full
synth→parse round trip (URI, byte length, and payload all hash-equal).

Scale shape (10^12 docs): synthesis is one partial-agg'd groupBy per
chunk; parsing is ``mapInPandas`` over whole archive blobs —
embarrassingly parallel, one task per batch of archives, no shuffle.
Arrow-batched Python is the sanctioned edge for source decoding (same
tier as documents_raw's TETML synthesis); records stream out per
archive, so memory is bounded by one archive, not one partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_DOCS = 10
WARC_DATE = "2026-01-01T00:00:00Z"  # fixed, deterministic

OUT_SCHEMA = (
    "doc_id long, uri string, content_length int, payload string"
)

# Header fragment literals — SINGLE SOURCE for the synthesizer, the
# parser's magic check, and the index oracle's fixed-byte constant
# (warc_index's oracle reconstructs record byte lengths closed-form;
# deriving the constant from these exact strings means an edit to the
# framing cannot silently desync the oracle).
FRAG_MAGIC = "WARC/1.0\r\n"
FRAG_TYPE = "WARC-Type: response\r\n"
FRAG_RID = "WARC-Record-ID: <urn:uuid:doc-"
FRAG_RID_END = ">\r\n"
FRAG_URI = "WARC-Target-URI: "
FRAG_CRLF = "\r\n"
FRAG_DATE = f"WARC-Date: {WARC_DATE}\r\n"
FRAG_CTYPE = "Content-Type: text/plain\r\n"
FRAG_CLEN = "Content-Length: "
FRAG_HDR_END = "\r\n\r\n"
FRAG_REC_END = "\r\n\r\n"

# per-record bytes that do NOT depend on the document: every literal
# fragment above, in synthesis order (all ASCII, so len == octets)
RECORD_FIXED_BYTES = sum(
    len(s.encode("utf-8"))
    for s in (
        FRAG_MAGIC, FRAG_TYPE, FRAG_RID, FRAG_RID_END, FRAG_URI,
        FRAG_CRLF, FRAG_DATE, FRAG_CTYPE, FRAG_CLEN, FRAG_HDR_END,
        FRAG_REC_END,
    )
)


def synth_warc_chunks(d: DataFrame) -> DataFrame:
    """(chunk_id, blob) WARC-style archives, 10 records per chunk.
    Record framing matches what the parser consumes: CRLF headers,
    Content-Length in BYTES (octet_length, not char count), blank
    line, payload, blank separator."""
    uri = F.concat(
        F.lit("http://"),
        F.col("source"),
        F.lit("-site.example/page/"),
        F.col("doc_id").cast("string"),
    )
    # loud NULL guard: concat null-propagates and array_join silently
    # SKIPS null elements, so a NULL text/source would otherwise make
    # the document vanish from the archive without an error.  When the
    # condition holds assert_true is NULL → coalesce '' → no-op; when
    # it fails the job throws at synthesis.
    guard = F.coalesce(
        F.assert_true(
            F.col("text").isNotNull() & F.col("source").isNotNull(),
            F.lit("warc synth: NULL text/source would silently drop the doc"),
        ).cast("string"),
        F.lit(""),
    )
    rec = F.concat(
        guard,
        F.lit(FRAG_MAGIC),
        F.lit(FRAG_TYPE),
        F.lit(FRAG_RID),
        F.col("doc_id").cast("string"),
        F.lit(FRAG_RID_END),
        F.lit(FRAG_URI),
        uri,
        F.lit(FRAG_CRLF),
        F.lit(FRAG_DATE),
        F.lit(FRAG_CTYPE),
        F.lit(FRAG_CLEN),
        F.octet_length("text").cast("string"),
        F.lit(FRAG_HDR_END),
        F.col("text"),
        F.lit(FRAG_REC_END),
    )
    recs = d.select(
        F.expr(f"doc_id div {CHUNK_DOCS}").alias("chunk_id"),
        F.struct("doc_id", rec.alias("rec")).alias("s"),
    )
    # collect_list order is nondeterministic — sort by the embedded
    # doc_id before joining so the blob is byte-deterministic
    return recs.groupBy("chunk_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("s")), lambda s: s["rec"]
            ),
            "",
        ).alias("blob")
    )


def _walk_records(b: bytes):
    """Length-framed record walk over the archive BYTES — the ONE
    framing implementation behind both the payload parser and the
    byte-offset indexer.  Never splits on separators — a payload
    containing 'WARC/1.0\\r\\n' or blank lines parses correctly
    because the cursor advances by the declared Content-Length octets.

    Yields (rec_start, rec_end, headers, payload_bytes) where
    [rec_start, rec_end) is the full record extent INCLUDING the
    trailing blank-line terminator — so extents tile the archive and
    ``b[rec_start:rec_end]`` is a complete re-parseable record."""
    magic = FRAG_MAGIC.encode("utf-8")
    hdr_end = FRAG_HDR_END.encode("utf-8")
    i, n = 0, len(b)
    while i < n:
        if b.startswith(b"\r\n", i):
            i += 2
            continue
        if not b.startswith(magic, i):
            raise ValueError(f"bad record frame at byte {i}")
        j = b.index(hdr_end, i)
        headers = dict(
            line.split(": ", 1)
            for line in b[i + len(magic) : j].decode("utf-8").split("\r\n")
        )
        clen = int(headers["Content-Length"])
        payload = b[j + 4 : j + 4 + clen]
        rec_end = min(j + 4 + clen + len(FRAG_REC_END), n)
        yield i, rec_end, headers, payload
        i = j + 4 + clen


def parse_warc_records(blob: str) -> list[tuple[int, str, int, str]]:
    """Decoded rows (doc_id, uri, content_length, payload) per record."""
    rid_prefix = FRAG_RID.removeprefix("WARC-Record-ID: ")
    out: list[tuple[int, str, int, str]] = []
    for _s, _e, headers, payload in _walk_records(blob.encode("utf-8")):
        rid = headers["WARC-Record-ID"]
        out.append(
            (
                int(rid.removeprefix(rid_prefix).removesuffix(">")),
                headers["WARC-Target-URI"],
                int(headers["Content-Length"]),
                payload.decode("utf-8"),
            )
        )
    return out


def parse_warc(chunks: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "uri", "content_length", "payload"]
        for pdf in batches:
            # one output frame PER ARCHIVE, not per Arrow batch: a
            # batch can carry thousands of blobs (arrow
            # maxRecordsPerBatch), and holding every decoded payload
            # of the whole batch at once is exactly the mega-doc OOM
            # the docstring's memory bound promises away
            for blob in pdf["blob"]:
                yield pd.DataFrame(parse_warc_records(blob), columns=cols)

    return chunks.mapInPandas(gen, OUT_SCHEMA)


def q_warc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    return parse_warc(synth_warc_chunks(d))


# the oracle RECONSTRUCTS the expected rows straight from documents —
# the gate therefore value-checks the whole synth→parse round trip
SQL_WARC_SCAN = """
SELECT doc_id,
       'http://' || source || '-site.example/page/' || CAST(doc_id AS VARCHAR)
         AS uri,
       CAST(octet_length(encode(text)) AS INT) AS content_length,
       text AS payload
FROM documents
"""


# --------------------------------------------------------------------------
# warc_index — CDX-style random-access index over the archives (the
# artifact real crawl pipelines ship beside every WARC: per record,
# WHERE it lives — archive + byte offset + record length — plus a
# payload digest, so a fetcher can range-read one record out of a
# 1 GB archive without parsing it).  Built by the SAME length-framed
# walker the scan op uses; record extents tile the archive exactly
# (asserted per archive), so offset/length are provably range-read
# correct, not best-effort.
#
# Scale shape: identical to q_warc_scan — mapInPandas over whole
# archive blobs, embarrassingly parallel, no shuffle; the index rows
# (~100 B each) are the only output.
# --------------------------------------------------------------------------

INDEX_SCHEMA = (
    "chunk_id long, doc_id long, uri string, offset long, rlength long, "
    "digest string"
)


def index_warc_records(
    chunk_id: int, blob: str
) -> list[tuple[int, int, str, int, int, str]]:
    import hashlib

    b = blob.encode("utf-8")
    rid_prefix = FRAG_RID.removeprefix("WARC-Record-ID: ")
    out = []
    prev_end = 0
    for s, e, headers, payload in _walk_records(b):
        # extents must TILE the archive — any gap/overlap means the
        # (offset, rlength) pairs are not range-read safe
        if s != prev_end:
            raise ValueError(f"record extent gap: {prev_end} != {s}")
        prev_end = e
        out.append(
            (
                chunk_id,
                int(headers["WARC-Record-ID"]
                    .removeprefix(rid_prefix).removesuffix(">")),
                headers["WARC-Target-URI"],
                s,
                e - s,
                hashlib.md5(payload).hexdigest(),
            )
        )
    if prev_end != len(b):
        raise ValueError(f"trailing bytes: {prev_end} != {len(b)}")
    return out


def index_warc(chunks: DataFrame) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["chunk_id", "doc_id", "uri", "offset", "rlength", "digest"]
        for pdf in batches:
            for cid, blob in zip(pdf["chunk_id"], pdf["blob"]):
                yield pd.DataFrame(
                    index_warc_records(int(cid), blob), columns=cols
                )

    return chunks.mapInPandas(gen, INDEX_SCHEMA)


def warc_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    return index_warc(synth_warc_chunks(d))


# closed-form record geometry from `documents` alone: rlength =
# RECORD_FIXED_BYTES (derived from the very literals the synthesizer
# concatenates) + the document-dependent byte counts; offset = the
# exclusive running sum over doc_id order within the chunk.  A hash
# match therefore proves the synth→walk→index chain computes the
# exact byte layout, not merely consistent values.
SQL_WARC_INDEX = f"""
WITH r AS (
  SELECT doc_id,
         doc_id // {CHUNK_DOCS} AS chunk_id,
         'http://' || source || '-site.example/page/'
           || CAST(doc_id AS VARCHAR) AS uri,
         octet_length(encode(text)) AS clen,
         md5(text) AS digest
  FROM documents
),
s AS (
  SELECT *,
         {RECORD_FIXED_BYTES}
           + length(CAST(doc_id AS VARCHAR))
           + octet_length(encode(uri))
           + length(CAST(clen AS VARCHAR))
           + clen AS rlength
  FROM r
)
SELECT CAST(chunk_id AS BIGINT) AS chunk_id, doc_id, uri,
       CAST(coalesce(sum(rlength) OVER (
              PARTITION BY chunk_id ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS offset,
       CAST(rlength AS BIGINT) AS rlength,
       digest
FROM s
"""

QUERIES = {"q_warc_scan": q_warc_scan, "warc_index": warc_index}
ORACLE_SQL = {"q_warc_scan": SQL_WARC_SCAN, "warc_index": SQL_WARC_INDEX}
