"""JSONL ingest for the span-shaped document table.

Web-scale corpora commonly arrive as newline-delimited JSON exports
(one span or one document per line).  This source reads span-per-line
JSONL into the pipeline's canonical ``(doc_id, spans)`` shape with an
EXPLICIT schema — schema inference is a full extra pass over the data
and is never acceptable at 100 TB, so the reader refuses to infer.

Layout read here (span per line, the shape of
``tests/golden/fixture_inputs-style`` exports):

    {"doc_id": "...", "kind": "...", "text": "...",
     "media_ref": "...", "offset": 0}

Grouping back to one row per document is one hash shuffle on doc_id
(unavoidable for a line-oriented export; the parquet/Iceberg path in
io.py has no such shuffle because documents arrive whole).  The spans
array is rebuilt in offset order via array_sort on the leading struct
field, then field-reordered to the canonical struct layout
(SURVEY.md §7 hard-part g).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPAN_LINE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)


def read_span_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Span-per-line JSONL -> canonical (doc_id, spans) document table."""
    lines = spark.read.schema(SPAN_LINE_SCHEMA).json(path)
    return (
        lines.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
            ).alias("s")
        )
        .select(
            "doc_id",
            F.transform(
                "s",
                lambda x: F.struct(
                    x["kind"].alias("kind"),
                    x["text"].alias("text"),
                    x["media_ref"].alias("media_ref"),
                    x["offset"].alias("offset"),
                ),
            ).alias("spans"),
        )
    )


def write_span_jsonl(docs: DataFrame, path: str) -> None:
    """Canonical document table -> span-per-line JSONL export."""
    (
        docs.select("doc_id", F.posexplode("spans").alias("pos", "s"))
        .select(
            "doc_id",
            F.col("s.kind").alias("kind"),
            F.col("s.text").alias("text"),
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.offset").alias("offset"),
        )
        .write.mode("overwrite")
        .json(path)
    )
