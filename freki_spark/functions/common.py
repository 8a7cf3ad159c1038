"""Cross-engine-deterministic primitives shared by the dedup /
similarity / text-analysis operators.

All hashing goes through md5 hex → int so Spark and the DuckDB oracle
compute bit-identical values:
    Spark : conv(substr(md5(x), 1, 8), 16, 10)           (< 2^32)
    DuckDB: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD31 = 2147483647


def md5i32(col: Column) -> Column:
    """Deterministic 32-bit-range hash of a string column (bigint)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


DUCK_MD5I32 = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"


def md5i60(col: Column) -> Column:
    """Deterministic 60-bit-range hash (15 md5 hex chars < 2^60 — exact
    in a signed bigint in both engines; 16 chars could overflow)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


DUCK_MD5I60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


def toks(col) -> Column:
    return F.split(col, " ")


SHINGLE_N = 3  # single source of truth — DUCK_SHINGLES below encodes it


def shingles(tok_col: Column, n: int = SHINGLE_N) -> Column:
    """Distinct n-token shingles (short docs degrade to one shingle)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(tok_col) - (n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)),
        )
    )


def bigrams(tok_col: Column) -> Column:
    """All adjacent-token bigrams WITH multiplicity (unlike shingles:
    no distinct), short docs degrading to one single-token "bigram".
    Callers must bind the token array as a named column first — an
    unmaterialized split() here re-splits the text per element
    (the CLAUDE.md HOF rule)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tok_col) - 1, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tok_col, i, 2)),
    )


def duck_bigrams(l: str) -> str:
    """DuckDB mirror of ``bigrams(col)`` over a token list `l` —
    single source of the slice/degenerate-doc convention so the two
    engines can never desync (same contract as duck_shingles)."""
    return (
        f"list_transform(range(1, greatest(len({l}) - 1, 1) + 1), "
        f"i -> array_to_string({l}[i:i+1], ' '))"
    )


def duck_shingles(l: str, n: int = SHINGLE_N) -> str:
    """DuckDB mirror of ``shingles(col, n)`` over a token list `l`
    (1-based slicing, inclusive bounds: l[i:i+n-1] is n elements),
    including the short-doc degenerate shingle."""
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len({l}) - {n - 2}, 2)), "
        f"i -> array_to_string({l}[i:i+{n - 1}], ' ')))"
    )


# width-SHINGLE_N template (callers .format(l=...)) — defined THROUGH
# duck_shingles so the two can never desync
DUCK_SHINGLES = duck_shingles("{l}")


def _ppm_exact(num: str, den: str, div: str) -> str:
    """floor(num * 1_000_000 / den) without ever forming num*1e6:
    q*1e6 + (r*1e3 div den)*1e3 + ((r*1e3 mod den)*1e3 div den), with
    r = num mod den.  Exact for non-negative bigints PROVIDED
    den ≤ ~9.2e15: the staging forms r*1000 with r < den, so den*1000
    must stay under 2^63 — callers with corpus-grain denominators must
    clamp (the doremi_weights headroom rule).  Truncating div == floor
    div on non-negatives, so Spark `div` and DuckDB `//` agree; pass
    the engine's integer-division operator as `div`.  Lives in common (no
    intra-package imports) so every functions/ module can build its
    module-level oracle SQL without the corpus_prep→text_analysis→
    dedup→similarity→corpus_prep import cycle."""
    q = f"({num} {div} {den})"
    r = f"({num} % {den})"
    return (
        f"{q} * 1000000 + ({r} * 1000 {div} {den}) * 1000"
        f" + (({r} * 1000 % {den}) * 1000 {div} {den})"
    )


# --------------------------------------------------------------------------
# near-dup variant builder — lives in common (no intra-package imports)
# because THREE modules consume it: dedup (its corpus + DUCK_CORPUS),
# text_analysis (rouge_ngram_stats' ref/cand pairing), and search
# (sparse_cosine_topk via dedup's corpus).  Moving it here broke the
# text_analysis→dedup→similarity→text_analysis import cycle that a
# top-level dedup import would otherwise re-create (the pass-14
# common.py precedent).
# --------------------------------------------------------------------------


def _mutated(d):
    """Near-dup mutations of the first 50 docs (last 3 tokens cut),
    re-keyed at +100000."""
    tk = toks(F.col("text"))
    return d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        # greatest(.., 0): slice() raises on negative length; a
        # <=3-token doc degrades to '' — DUCK_MUTATED mirrors both the
        # greatest() clamp and the ''-for-empty-list rendering
        F.concat_ws(
            " ", F.slice(tk, 1, F.greatest(F.size(tk) - 3, F.lit(0)))
        ).alias("text"),
    )


# the ONE SQL mirror of _mutated (used by dedup's DUCK_CORPUS, the
# incremental op's inc CTE, and rouge_ngram_stats' pair spine).
# greatest(len-3, 0) matches Spark's clamped slice on <4-token docs
# (a bare l[1:len-3] returns the FULL list at len=2 — negative ends
# count from the back — and NULL at len 1/3), and coalesce(...,'')
# matches concat_ws's '' on the empty slice (array_to_string([]) is
# NULL in DuckDB).
DUCK_MUTATED = """SELECT doc_id + 100000 AS doc_id,
         coalesce(array_to_string(l[1:greatest(len(l) - 3, 0)], ' '), '') AS text
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
  WHERE doc_id < 50"""
