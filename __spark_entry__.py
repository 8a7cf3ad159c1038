"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: synthesize the span-shaped input table
from the sf0.001 ``documents`` parquet (distributed, mapInPandas), run
the full freki extraction pipeline (FrekiSpec v1: glyph-XML parse,
line clustering, column/block detection, freki-format serialization,
media interleaving), and return the exploded output spans.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2 (P-ops + Q-ops), oracle-backed wherever the
semantics are ANSI-SQL-expressible; pipeline P-ops are oracle-checked
against the committed golden spans produced by the independent
single-node oracle (tests/golden/fixture_spans.jsonl).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from freki_spark.pipeline import extract
    from freki_spark.sources.documents_raw import synthesize_raw

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw = synthesize_raw(docs)
    out = extract(raw)
    return (
        out.filter(F.col("error").isNull())
        .select("doc_id", F.explode("spans").alias("s"))
        .select("doc_id", "s.kind", "s.text", "s.media_ref", "s.offset")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from freki_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from freki_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
