"""The Spark extraction pipeline (P1–P13 of SURVEY.md §2.2).

Dataflow (north-star lifecycle, SURVEY.md §3.2):

    scan (doc_id, spans)                      -- columnar, pruned
      ├─ size(spans) <= τ : mapInPandas(extract)        -- NO shuffle
      └─ size(spans) >  τ : salted mega-doc path (S7)
           stage 1  mapInPandas: regex page-split + media anchoring
           stage 2  groupBy(doc_id, salt).applyInPandas: per-page
                    layout with group-local numbering   -- 1 shuffle
           stage 3  pure Spark: per-doc meta fold (bases + font ids
                    from one __meta__ row per shard) + JVM-side
                    string rendering + per-doc reassembly
    union → (doc_id, spans, error)

Design notes for 100 TB / 10^12-doc scale:

- The input table stores one row per document, so the common path is a
  *narrow* transformation: ``mapInPandas`` runs the numpy kernel
  directly on Arrow batches with zero shuffles and zero driver
  involvement.  ``applyInPandas over doc_id`` (mode='group') is kept
  for exploded inputs; it computes the same thing with one hash
  shuffle.
- Catalyst cannot split a skewed group inside applyInPandas (AQE skew
  handling does not apply there), so mega-documents are salted
  *explicitly*: pages are sharded into at most SALT_MAX_GROUPS groups
  per doc and renumbered afterwards with broadcast-joined window bases
  — all rendering in stage 3 is JVM-side concat (whole-stage codegen),
  no Python.
- Corrupt XML never fails a task: quarantined docs come back with
  spans=[] and a non-null error column (split with
  ``split_quarantine``).

Reference parity: this file replaces freki/main.py's single-process
eager loop [U]; layout semantics live in freki_spark.kernel.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import kernel, spec

# --------------------------------------------------------------------------
# schemas
# --------------------------------------------------------------------------

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)

EXTRACTED_SCHEMA = T.StructType(
    [*DOC_SCHEMA.fields, T.StructField("error", T.StringType())]
)

_STAGE1_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("page_pos", T.IntegerType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("item_type", T.StringType()),  # page | media | error
        T.StructField("payload", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("dialect", T.StringType()),
    ]
)

_STAGE2_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("seq_l", T.LongType()),
        T.StructField("kind", T.StringType()),  # block|line|media|__font__|__error__
        T.StructField("page", T.IntegerType()),
        T.StructField("block_k", T.IntegerType()),
        T.StructField("line_start_l", T.LongType()),
        T.StructField("line_end_l", T.LongType()),
        T.StructField("line_no_l", T.LongType()),
        T.StructField("fonts_keys", T.ArrayType(T.StringType())),
        T.StructField("body", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("n_lines", T.LongType()),
        T.StructField("n_spans", T.LongType()),
    ]
)


# --------------------------------------------------------------------------
# unsalted fast path
# --------------------------------------------------------------------------


def _extract_docs_batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        out_spans: list[list[dict]] = []
        errors: list[str | None] = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            rows, err = kernel.extract_document_rows(doc_id, list(spans))
            out_spans.append(rows)
            errors.append(err)
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "spans": out_spans, "error": errors}
        )


def _extract_docs_group(pdf: pd.DataFrame) -> pd.DataFrame:
    return next(_extract_docs_batch(iter([pdf])))


def _extract_docs_arrow(batches):
    """mapInArrow fast path: assemble the output span column as Arrow
    List<Struct> arrays directly — ~200 spans/doc as python dicts per
    row is the dominant serialization cost in the pandas path."""
    import pyarrow as pa

    for rb in batches:
        doc_ids = rb.column("doc_id").to_pylist()
        spans_in = rb.column("spans").to_pylist()
        kinds: list[str] = []
        texts: list[str] = []
        refs: list[str] = []
        offs: list[int] = []
        list_offsets = [0]
        errors: list[str | None] = []
        for doc_id, spans in zip(doc_ids, spans_in):
            rows, err = kernel.extract_document_rows(doc_id, spans or [])
            for r in rows:
                kinds.append(r["kind"])
                texts.append(r["text"])
                refs.append(r["media_ref"])
                offs.append(r["offset"])
            list_offsets.append(len(kinds))
            errors.append(err)
        struct = pa.StructArray.from_arrays(
            [
                pa.array(kinds, pa.string()),
                pa.array(texts, pa.string()),
                pa.array(refs, pa.string()),
                pa.array(offs, pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        spans_out = pa.ListArray.from_arrays(pa.array(list_offsets, pa.int32()), struct)
        yield pa.RecordBatch.from_arrays(
            [pa.array(doc_ids, pa.string()), spans_out, pa.array(errors, pa.string())],
            names=["doc_id", "spans", "error"],
        )


def extract_simple(df: DataFrame, mode: str = "map") -> DataFrame:
    """Unsalted whole-document extraction.

    mode='map'  : mapInPandas — narrow, zero-shuffle (input already has
                  one row per doc_id).
    mode='group': applyInPandas over doc_id partitions — for inputs
                  where a doc's spans may be split across rows.
    """
    if mode == "map":
        return df.mapInArrow(_extract_docs_arrow, EXTRACTED_SCHEMA)
    if mode == "map_pandas":
        return df.mapInPandas(_extract_docs_batch, EXTRACTED_SCHEMA)
    if mode == "group":
        exploded = df.select("doc_id", F.explode("spans").alias("s")).select(
            "doc_id", "s.*"
        )
        regrouped = exploded.groupBy("doc_id").agg(
            F.collect_list(F.struct("kind", "text", "media_ref", "offset")).alias(
                "spans"
            )
        )
        return regrouped.groupBy("doc_id").applyInPandas(
            _extract_docs_group, EXTRACTED_SCHEMA
        )
    raise ValueError(f"unknown mode {mode!r}")


# --------------------------------------------------------------------------
# salted mega-doc path (S7)
# --------------------------------------------------------------------------


def _stage1_split(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per mega-doc: well-formedness check (same expat parser the
    kernel's acceptance uses — the salted path must quarantine exactly
    the docs the unsalted path quarantines), then regex page split +
    media→page anchoring (no tree parse of the whole doc)."""
    import xml.etree.ElementTree as ET

    from . import fastparse

    for pdf in it:
        rows: list[tuple] = []
        for doc_id, spans in zip(pdf["doc_id"], pdf["spans"]):
            spans = sorted(list(spans), key=lambda s: s["offset"])
            chunks = [s for s in spans if s["kind"] in spec.XML_KINDS]
            media = [s for s in spans if s["kind"] == spec.KIND_MEDIA]
            if not chunks:
                for j, m in enumerate(media):
                    rows.append((doc_id, 0, -1, j, "media", m["text"], m["media_ref"], ""))
                continue
            dialect = chunks[0]["kind"]
            xml = "".join(c["text"] for c in chunks)
            try:
                fastparse.validate(xml)
            except ET.ParseError as e:
                rows.append(
                    (doc_id, 0, 0, 0, "error", f"xml-parse-error: {e}", "", dialect)
                )
                continue
            pieces, starts = kernel.split_pages(xml, dialect)
            if not pieces:
                # valid XML with zero page elements: the kernel emits
                # just the media spans (all anchored to the prologue) —
                # mirror that, never quarantine
                for j, m in enumerate(media):
                    rows.append(
                        (doc_id, 0, -1, j, "media", m["text"], m["media_ref"], dialect)
                    )
                continue
            n_groups = min(spec.SALT_MAX_GROUPS, len(pieces))
            per_group = math.ceil(len(pieces) / n_groups)
            mpos = kernel.media_page_positions(
                [c["offset"] for c in chunks],
                [len(c["text"]) for c in chunks],
                starts,
                [m["offset"] for m in media],
            )
            decls = kernel.collect_xmlns(xml[: starts[0]])
            for p, piece in enumerate(pieces):
                rows.append(
                    (
                        doc_id,
                        p // per_group,
                        p,
                        0,
                        "page",
                        kernel.repair_page_piece(piece, dialect, decls),
                        "",
                        dialect,
                    )
                )
            ranks: dict[int, int] = {}
            for m, p in zip(media, mpos):
                salt = 0 if p < 0 else min(p, len(pieces) - 1) // per_group
                r = ranks.get(p, 0) + 1
                ranks[p] = r
                rows.append((doc_id, salt, p, r, "media", m["text"], m["media_ref"], dialect))
        yield pd.DataFrame(rows, columns=[f.name for f in _STAGE1_SCHEMA.fields])


def _stage2_layout(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per (doc_id, salt) group: lay out the page shard with group-local
    numbering.  Emits the block/line/media records plus exactly one
    ``__meta__`` row carrying (fonts in first-appearance order, n_lines,
    n_spans, error-or-'') — everything stage 3 needs to renumber."""
    pdf = pdf.sort_values(["page_pos", "rank"], kind="stable")
    doc_id = pdf["doc_id"].iloc[0]
    salt = int(pdf["salt"].iloc[0])
    cols = [f.name for f in _STAGE2_SCHEMA.fields]

    def meta_only(err: str) -> pd.DataFrame:
        return pd.DataFrame(
            [[doc_id, salt, 0, "__meta__", 0, 0, 0, 0, 0, [], err, "", 0, 0]],
            columns=cols,
        )

    err_rows = pdf[pdf["item_type"] == "error"]
    if len(err_rows):
        return meta_only(err_rows["payload"].iloc[0])

    dialects = [d for d in pdf["dialect"] if d]
    dialect = dialects[0] if dialects else spec.KIND_TETML
    items = [
        {
            "item_type": it,
            "payload": pl,
            "media_ref": mr,
            "page_pos": pp,
            "rank": rk,
        }
        for it, pl, mr, pp, rk in zip(
            pdf["item_type"], pdf["payload"], pdf["media_ref"], pdf["page_pos"], pdf["rank"]
        )
    ]
    records, doc_fonts, n_lines, n_spans, err = kernel.extract_group_records(
        doc_id, items, dialect
    )
    if err is not None:
        return meta_only(err)
    rows = [
        [
            doc_id,
            salt,
            r["seq"],
            r["kind"],
            r["page"],
            r["block_k"],
            r["line_start"],
            r["line_end"],
            r["line_no"],
            r["fonts_keys"],
            r["body"],
            r["media_ref"],
            0,
            0,
        ]
        for r in records
    ]
    fonts_order = [k for k, _ in sorted(doc_fonts.items(), key=lambda kv: kv[1])]
    rows.append(
        [doc_id, salt, 0, "__meta__", 0, 0, 0, 0, 0, fonts_order, "", "", n_lines, n_spans]
    )
    return pd.DataFrame(rows, columns=cols)


def _font_label_col(font_map: Column, key: Column) -> Column:
    """JVM-side equivalent of grammar.font_label."""
    return F.concat(
        F.lit("F"),
        F.element_at(font_map, key).cast("string"),
        F.lit("-"),
        F.substring_index(key, spec.FONT_KEY_SEP, -1),
    )


def extract_salted(df: DataFrame) -> DataFrame:
    """Mega-document path: page-parallel layout + distributed renumber.

    Plan shape (3 shuffles total, all over per-doc metadata or rendered
    records — never raw XML bytes twice):

      1. ``groupBy(doc_id, salt).applyInPandas`` — the page-shard layout;
      2. ``groupBy(doc_id)`` over the one ``__meta__`` row per shard —
         builds each doc's salt→(line_base, span_base) map, global
         font-id map (first-appearance order = per-shard order
         concatenated in salt order), and quarantine error, all with
         JVM array expressions (no window functions);
      3. records ⋈ meta on doc_id (AQE picks broadcast vs shuffle — the
         meta side grows with the number of mega-docs, so it must NOT
         be force-broadcast at 10^12-doc scale) + the final per-doc
         assembly, which reuses the same hash partitioning.

    All line/header rendering stays JVM-side (whole-stage codegen) so
    the per-span work fans out with executors; Python only ever touches
    a page shard.
    """
    st1 = df.mapInPandas(_stage1_split, _STAGE1_SCHEMA)
    st2 = st1.groupBy("doc_id", "salt").applyInPandas(_stage2_layout, _STAGE2_SCHEMA)
    st2 = st2.persist()

    # one row per (doc, salt): fonts in first-appearance order + sizes
    meta = (
        st2.filter(F.col("kind") == "__meta__")
        .groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("salt").alias("salt"),
                        F.col("n_lines").alias("nl"),
                        F.col("n_spans").alias("ns"),
                        F.col("fonts_keys").alias("fks"),
                        F.col("body").alias("err"),
                    )
                )
            ).alias("ms")
        )
    )

    # exclusive running (line, span) bases per salt, via one array fold
    zero = F.struct(
        F.expr(
            "cast(array() as array<struct<salt:int,lb:bigint,sb:bigint>>)"
        ).alias("arr"),
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("s"),
    )

    def _acc_bases(acc: Column, m: Column) -> Column:
        return F.struct(
            F.concat(
                acc["arr"],
                F.array(
                    F.struct(
                        m["salt"].alias("salt"),
                        acc["l"].alias("lb"),
                        acc["s"].alias("sb"),
                    )
                ),
            ).alias("arr"),
            (acc["l"] + m["nl"]).alias("l"),
            (acc["s"] + m["ns"]).alias("s"),
        )

    bases_map = F.map_from_entries(
        F.transform(
            F.aggregate("ms", zero, _acc_bases)["arr"],
            lambda x: F.struct(
                x["salt"].alias("key"),
                F.struct(x["lb"].alias("lb"), x["sb"].alias("sb")).alias("value"),
            ),
        )
    )
    # global font ids: shards are disjoint, ordered slices of the doc,
    # so concatenating per-shard first-appearance lists in salt order
    # and keeping first occurrences IS global first-appearance order
    fonts_arr = F.array_distinct(F.flatten(F.transform("ms", lambda m: m["fks"])))
    font_map = F.map_from_entries(
        F.transform(fonts_arr, lambda k, i: F.struct(k.alias("key"), i.alias("value")))
    )
    errs_arr = F.filter("ms", lambda m: m["err"] != F.lit(""))
    error = F.when(F.size(errs_arr) > 0, F.element_at(errs_arr, 1)["err"])

    meta_doc = meta.select(
        "doc_id",
        error.alias("error"),
        bases_map.alias("bases_map"),
        font_map.alias("font_map"),
    )

    sp = (
        st2.filter(F.col("kind").isin(spec.KIND_BLOCK, spec.KIND_LINE, spec.KIND_MEDIA))
        .join(meta_doc, "doc_id")
        .filter(F.col("error").isNull())
        .withColumn("base", F.element_at(F.col("bases_map"), F.col("salt")))
        .withColumn("line_base", F.col("base")["lb"])
        .withColumn("span_base", F.col("base")["sb"])
    )
    line_no = (F.col("line_no_l") + F.col("line_base")).cast("long")
    text = (
        F.when(
            F.col("kind") == spec.KIND_LINE,
            F.concat(
                F.lit("line="),
                line_no.cast("string"),
                F.lit(" fonts="),
                F.array_join(
                    F.transform(
                        "fonts_keys", lambda k: _font_label_col(F.col("font_map"), k)
                    ),
                    ",",
                ),
                F.lit(":"),
                F.col("body"),
            ),
        )
        .when(
            F.col("kind") == spec.KIND_BLOCK,
            F.concat(
                F.lit("doc_id="),
                F.col("doc_id"),
                F.lit(" page="),
                F.col("page").cast("string"),
                F.lit(" block_id="),
                F.col("page").cast("string"),
                F.lit("-"),
                F.col("block_k").cast("string"),
                F.lit(" bbox="),
                F.col("body"),
                F.lit(" "),
                (F.col("line_start_l") + F.col("line_base")).cast("long").cast("string"),
                F.lit(" "),
                (F.col("line_end_l") + F.col("line_base")).cast("long").cast("string"),
            ),
        )
        .otherwise(F.col("body"))
    )
    offset = (F.col("span_base") + F.col("seq_l")).cast("int")

    assembled = (
        sp.select(
            "doc_id",
            F.struct(
                offset.alias("offset"),
                F.col("kind").alias("kind"),
                text.alias("text"),
                F.col("media_ref").alias("media_ref"),
            ).alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("s")),
                lambda s: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ).alias("spans")
        )
        .withColumn("error", F.lit(None).cast("string"))
    )
    quarantined = meta_doc.filter(F.col("error").isNotNull()).select(
        "doc_id",
        F.lit([]).cast(T.ArrayType(SPAN_STRUCT)).alias("spans"),
        "error",
    )
    # docs whose shards produced zero span records (all-empty pages,
    # media-less docs with no page matches) have a null-error meta row
    # but no rows in `sp` — without this anti-join they would vanish,
    # while the unsalted path emits (doc_id, [], null) for them.  The
    # join runs over per-mega-doc metadata only (tiny).
    empty_ok = (
        meta_doc.filter(F.col("error").isNull())
        .join(assembled.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit([]).cast(T.ArrayType(SPAN_STRUCT)).alias("spans"),
            F.lit(None).cast("string").alias("error"),
        )
    )
    return assembled.unionByName(empty_ok).unionByName(quarantined)


# --------------------------------------------------------------------------
# top-level entry
# --------------------------------------------------------------------------


def extract(
    df: DataFrame,
    salt_threshold: int = spec.SALT_SPAN_THRESHOLD,
    mode: str = "map",
) -> DataFrame:
    """Full pipeline: route each doc by input-span count (P13), extract,
    union.  Returns (doc_id, spans, error).

    Routing details:
    - NULL ``spans`` counts as empty (the doc must surface in the
      output as (doc_id, [], null), never silently vanish);
    - docs whose XML may contain comments / CDATA / processing
      instructions (any ``<!``, or ``<?`` beyond the position-0 XML
      declaration) take the UNSALTED path regardless of size: the
      salted path's regex page split cannot see markup context, so a
      ``<Page`` inside a comment would create phantom piece boundaries
      there — whole-document parsing defines the semantics, so risky
      docs go where the whole document is parsed.  All checks are
      JVM-side string scans (codegen, narrow);
    - docs carrying any ``kind='html'`` span (the HtmlSpec
      main-content dialect) always take the unsalted path: boilerplate
      classification is a whole-document DOM property and HTML has no
      page structure to shard, while the narrow ``mapInArrow`` path is
      already shuffle-free — one web page per task item is the right
      unit of parallelism at 10^12 docs (html_kernel docstring).
    """
    n = F.coalesce(F.size("spans"), F.lit(0))
    has_html = F.coalesce(
        F.exists("spans", lambda s: s["kind"] == F.lit(spec.KIND_HTML)),
        F.lit(False),
    )
    xml_chunks = F.filter("spans", lambda s: s["kind"].isin(*spec.XML_KINDS))
    minoff = F.array_min(F.transform(xml_chunks, lambda s: s["offset"]))

    def _pi_or_markup_decl(s: Column) -> Column:
        # the only exempt '<?' is a true XML declaration: '<?xml' +
        # whitespace at byte 0 of the first XML chunk ('xml' is a
        # forbidden PI target, so this prefix is unambiguous); a
        # document-leading PI like '<?pi <Page ?>' must still flag
        head_pi = F.when(
            (s["offset"] == minoff)
            & s["text"].rlike(r"^<\?xml[ \t\r\n]"),
            F.locate("<?", s["text"], 2) > 0,
        ).otherwise(F.locate("<?", s["text"], 1) > 0)
        # a chunk ending in '<' may complete to '<!'/'<?' in the NEXT
        # chunk (chunk boundaries are arbitrary byte splits) — the
        # per-chunk contains() can't see across, so flag it risky too
        return s["text"].contains("<!") | head_pi | s["text"].endswith("<")

    risky = F.coalesce(F.exists(xml_chunks, _pi_or_markup_decl), F.lit(False))
    small = df.filter((n <= salt_threshold) | risky | has_html)
    mega = df.filter((n > salt_threshold) & ~risky & ~has_html)
    return extract_simple(small, mode=mode).unionByName(extract_salted(mega))


def split_quarantine(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good docs (doc_id, spans), quarantine (doc_id, error))."""
    good = extracted.filter(F.col("error").isNull()).select("doc_id", "spans")
    bad = extracted.filter(F.col("error").isNotNull()).select("doc_id", "error")
    return good, bad
