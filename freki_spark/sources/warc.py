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
        F.lit("WARC/1.0\r\n"),
        F.lit("WARC-Type: response\r\n"),
        F.lit("WARC-Record-ID: <urn:uuid:doc-"),
        F.col("doc_id").cast("string"),
        F.lit(">\r\n"),
        F.lit("WARC-Target-URI: "),
        uri,
        F.lit("\r\n"),
        F.lit(f"WARC-Date: {WARC_DATE}\r\n"),
        F.lit("Content-Type: text/plain\r\n"),
        F.lit("Content-Length: "),
        F.octet_length("text").cast("string"),
        F.lit("\r\n\r\n"),
        F.col("text"),
        F.lit("\r\n\r\n"),
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


def parse_warc_records(blob: str) -> list[tuple[int, str, int, str]]:
    """Length-framed record walk over the archive BYTES.  Never splits
    on separators — a payload containing 'WARC/1.0\\r\\n' or blank
    lines parses correctly because the cursor advances by the declared
    Content-Length octets."""
    b = blob.encode("utf-8")
    out: list[tuple[int, str, int, str]] = []
    i, n = 0, len(b)
    while i < n:
        if b.startswith(b"\r\n", i):
            i += 2
            continue
        if not b.startswith(b"WARC/1.0\r\n", i):
            raise ValueError(f"bad record frame at byte {i}")
        j = b.index(b"\r\n\r\n", i)
        headers = dict(
            line.split(": ", 1)
            for line in b[i + 10 : j].decode("utf-8").split("\r\n")
        )
        clen = int(headers["Content-Length"])
        payload = b[j + 4 : j + 4 + clen]
        rid = headers["WARC-Record-ID"]
        doc_id = int(rid.removeprefix("<urn:uuid:doc-").removesuffix(">"))
        out.append(
            (
                doc_id,
                headers["WARC-Target-URI"],
                clen,
                payload.decode("utf-8"),
            )
        )
        i = j + 4 + clen
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

QUERIES = {"q_warc_scan": q_warc_scan}
ORACLE_SQL = {"q_warc_scan": SQL_WARC_SCAN}
