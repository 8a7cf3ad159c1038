"""Text-analysis operators for training-data pipelines: language-ID
(marker-token heuristic), quality scoring (length / stopword ratios),
token counting (whitespace + BPE-ish regex split), and document
fingerprinting (position-salted rolling hash).

All JVM-side built-ins (no Python in the hot path), all with exact
DuckDB oracles: ratios are int/int divisions rounded identically, the
fingerprint is pure integer math via the shared md5 hash.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import (
    DUCK_MD5I32,
    DUCK_MD5I60,
    MOD31,
    _ppm_exact,
    bigrams,
    duck_bigrams,
    md5i32,
    md5i60,
    toks,
)
from .common import DUCK_MUTATED, _mutated

# fixed marker-token lists (the corpus is synthetic; the *mechanism* —
# n-gram/markers scoring with deterministic tie-break — is what scales)
MARKERS = {
    "en": ["the", "a", "fast", "order", "key"],
    "es": ["data", "row", "line"],
    "de": ["group", "batch", "stream"],
    "fr": ["query", "value", "filter"],
    "zh": ["spark", "join", "merge"],
}
LANG_PRIORITY = ["en", "es", "de", "fr", "zh"]


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _langid_cols():
    """Marker scores + first-match-wins predicted language over the
    `text` column — the ONE Spark-side builder of the lang-ID decision
    (lang_id_ngram and langid_confusion both consume it; `_duck_pred`
    is the oracle mirror, so a tie-break change touches exactly two
    single-sourced sites)."""
    tk = F.array_distinct(toks(F.col("text")))
    scores = {
        lang: F.size(F.array_intersect(tk, F.array(*[F.lit(w) for w in words])))
        for lang, words in MARKERS.items()
    }
    # first-match-wins CASE: a language wins if it strictly beats every
    # earlier-priority language and ties-or-beats every later one —
    # exactly the tie-break the DuckDB oracle encodes
    pred = None
    for i, lang in enumerate(LANG_PRIORITY):
        cond = F.lit(True)
        for j, other in enumerate(LANG_PRIORITY):
            if j == i:
                continue
            c = scores[lang] > scores[other] if j < i else scores[lang] >= scores[other]
            cond = cond & c
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return scores, pred


def lang_id_ngram(spark, sf_dir):
    d = _docs(spark, sf_dir)
    scores, pred = _langid_cols()
    sel = [F.col("doc_id")]
    sel += [scores[lang].alias(f"s_{lang}") for lang in LANG_PRIORITY]
    sel += [
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("int").alias("is_correct"),
    ]
    return d.select(*sel)


def _duck_score(lang):
    words = ", ".join(f"'{w}'" for w in MARKERS[lang])
    return (
        f"CAST(len(list_intersect(list_distinct(string_split(text, ' ')), "
        f"[{words}])) AS INT)"
    )


def _duck_pred():
    # same priority tie-break: earlier language wins ties
    conds = []
    for i, lang in enumerate(LANG_PRIORITY):
        parts = []
        for j, other in enumerate(LANG_PRIORITY):
            if i == j:
                continue
            op = ">" if j < i else ">="
            parts.append(f"s_{lang} {op} s_{other}")
        conds.append(f"WHEN {' AND '.join(parts)} THEN '{lang}'")
    return "CASE " + " ".join(conds) + " END"


SQL_LANG_ID = f"""
WITH s AS (
  SELECT doc_id, lang,
         {", ".join(f"{_duck_score(lang)} AS s_{lang}" for lang in LANG_PRIORITY)}
  FROM documents
)
SELECT doc_id, {", ".join(f"s_{lang}" for lang in LANG_PRIORITY)},
       {_duck_pred()} AS pred_lang,
       CAST(({_duck_pred()}) = lang AS INT) AS is_correct
FROM s
"""

# --------------------------------------------------------------------------
# langid_confusion — the confusion matrix of the lang-ID heuristic
# against the corpus's labeled `lang` column: per (true, predicted)
# cell, the doc count and its exact-ppm share of the true language's
# row — the eval every classifier swap in a curation pipeline reads
# before shipping (which languages bleed into which, and how much of
# each label survives).  Decision logic single-sourced from
# `_langid_cols` / `_duck_pred` — this op can never disagree with the
# classifier it evaluates.
#
# Scale shape: ONE corpus scan into a (lang, pred)-grain partial agg;
# the row-share window runs over the ≤|langs|² cell table (a bounded
# handful of rows), never corpus-grain.
# --------------------------------------------------------------------------


def langid_confusion(spark, sf_dir):
    d = _docs(spark, sf_dir)
    _, pred = _langid_cols()
    cells = (
        d.select(F.col("lang"), pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang")
    return (
        cells.withColumn("tot", F.sum("n").over(w))
        .select(
            "lang",
            "pred_lang",
            F.col("n").cast("bigint").alias("n"),
            F.expr(_ppm_exact("n", "tot", "div"))
            .cast("bigint")
            .alias("share_ppm"),
        )
    )


SQL_LANGID_CONFUSION = f"""
WITH s AS (
  SELECT doc_id, lang,
         {", ".join(f"{_duck_score(lang)} AS s_{lang}" for lang in LANG_PRIORITY)}
  FROM documents
),
p AS (SELECT lang, {_duck_pred()} AS pred_lang FROM s),
c AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
t AS (SELECT lang, sum(n) AS tot FROM c GROUP BY 1)
SELECT c.lang, pred_lang, CAST(n AS BIGINT) AS n,
       CAST({_ppm_exact('n', 'tot', '//')} AS BIGINT) AS share_ppm
FROM c JOIN t ON c.lang = t.lang
"""


STOPWORDS = ["the", "a", "of", "to", "and", "row", "data", "key"]


def quality_score(spark, sf_dir):
    d = _docs(spark, sf_dir)
    tk = toks(F.col("text"))
    n_tok = F.size(tk)
    stop_hits = F.size(
        F.filter(tk, lambda t: t.isin(STOPWORDS))
    )
    # floor-scaling instead of round(): Spark rounds doubles via their
    # shortest decimal representation (BigDecimal HALF_UP) while DuckDB
    # rounds the binary value — they disagree on decimal-boundary
    # values like 0.53975.  floor() of the identical double is safe.
    def f4(x):
        return F.floor(x * 10000) / 10000.0

    stop_ratio = f4(stop_hits / n_tok)
    avg_tok_len = f4((F.length("text") - (n_tok - 1)) / n_tok)
    score = f4(
        F.least(F.col("n_chars") / 500.0, F.lit(1.0)) * 0.5 + stop_hits / n_tok * 0.5
    )
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        avg_tok_len.alias("avg_tok_len"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality"),
    )


_STOP_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)

SQL_QUALITY = f"""
WITH t AS (
  SELECT doc_id, n_chars, length(text) AS lc,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_filter(string_split(text, ' '),
             x -> list_contains([{_STOP_LIST}], x))) AS stop_hits
  FROM documents
)
SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       floor(((lc - (n_tokens - 1)) / n_tokens) * 10000) / 10000.0 AS avg_tok_len,
       floor((stop_hits / n_tokens) * 10000) / 10000.0 AS stop_ratio,
       floor((least(n_chars / 500.0, 1.0) * 0.5 + stop_hits / n_tokens * 0.5) * 10000)
         / 10000.0 AS quality
FROM t
"""


def token_count_bpe(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(toks(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks(F.col("text")))).alias("n_distinct"),
        F.size(F.regexp_extract_all("text", F.lit(r"[aeiou]+|[^aeiou\s]+"), 0)).alias(
            "n_subword"
        ),
    )


SQL_TOKEN_COUNT = r"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
       CAST(len(regexp_extract_all(text, '[aeiou]+|[^aeiou\s]+')) AS INT) AS n_subword
FROM documents
"""


# --------------------------------------------------------------------------
# readability_fk — Flesch–Kincaid-style grade-level scoring (Kincaid et
# al. 1975), the readability gate legal/medical/edu corpus curation
# runs beside the Gopher rules: grade = 0.39·(words/sentences) +
# 11.8·(syllables/word) − 15.59.  Deterministic proxies (the MARKERS
# convention — the corpus is synthetic; the *mechanism* scales):
# syllables = vowel-group count over the whole text ('[aeiou]+' runs,
# the classic syllable estimator), sentences = 1 + (words−1) div
# SENT_WINDOW (the corpus carries no terminal punctuation, so a fixed
# token window stands in for '[.!?]' splitting — swap the expression,
# keep the plan, on a punctuated corpus).
#
# Integer-exact cross-engine: grade·100 is computed as ONE integer
# quotient (39·W² + 1180·Syl·S − 1559·S·W) div (S·W), clamped at 0
# before dividing so truncating div == floor div in both engines.
# Bigint headroom (the doremi_weights rule): W and Syl are clamped at
# FK_CLAMP = 1e8, making S ≤ ~8.4e6 and every term ≤ ~1.3e18 — the
# sum stays under 2^63 for any document whatsoever.
#
# Scale shape: pure narrow map — zero Exchange, zero explode, one
# corpus scan; whole-stage codegen end to end (plan-audited).
# --------------------------------------------------------------------------

SENT_WINDOW = 12  # synthetic sentence stand-in (tokens per "sentence")
FK_CLAMP = 100_000_000  # bigint-headroom clamp on words/syllables


def readability_fk(spark, sf_dir):
    d = _docs(spark, sf_dir)
    t = d.select(
        "doc_id",
        F.size(toks(F.col("text"))).alias("n_words"),
        F.size(F.regexp_extract_all("text", F.lit("[aeiou]+"), 0)).alias(
            "n_syll"
        ),
    )
    # n_sent derives from the CLAMPED wc, not raw n_words: the stated
    # headroom proof (S <= ~8.4e6, every term <= ~1.3e18) assumes it,
    # and an unclamped ~1e9-token doc would push 1180*yc*n_sent past
    # 2^63 with divergent engine behavior (round-3 ADVICE).
    s = t.select(
        "doc_id",
        "n_words",
        "n_syll",
        F.expr(f"least(cast(n_words as bigint), {FK_CLAMP})").alias("wc"),
        F.expr(f"least(cast(n_syll as bigint), {FK_CLAMP})").alias("yc"),
    ).withColumn("n_sent", F.expr(f"1 + (wc - 1) div {SENT_WINDOW}"))
    n = s.withColumn(
        "num",
        F.expr("39 * wc * wc + 1180 * yc * n_sent - 1559 * n_sent * wc"),
    )
    return n.select(
        "doc_id",
        F.col("n_words").cast("int").alias("n_words"),
        F.col("n_sent").cast("int").alias("n_sentences"),
        F.col("n_syll").cast("int").alias("n_syllables"),
        F.expr("CASE WHEN num < 0 THEN 0 ELSE num div (n_sent * wc) END")
        .cast("bigint")
        .alias("fk_grade_c"),
    )


SQL_READABILITY_FK = f"""
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(regexp_extract_all(text, '[aeiou]+')) AS n_syll
  FROM documents
),
s AS (
  SELECT doc_id, n_words, n_syll,
         1 + (wc - 1) // {SENT_WINDOW} AS n_sent, wc, yc
  FROM (SELECT doc_id, n_words, n_syll,
               least(n_words, {FK_CLAMP}) AS wc,
               least(n_syll, {FK_CLAMP}) AS yc
        FROM t)
),
n AS (
  SELECT *, 39 * wc * wc + 1180 * yc * n_sent - 1559 * n_sent * wc AS num
  FROM s
)
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       CAST(n_sent AS INT) AS n_sentences,
       CAST(n_syll AS INT) AS n_syllables,
       CAST(CASE WHEN num < 0 THEN 0
                 ELSE num // (n_sent * wc) END AS BIGINT) AS fk_grade_c
FROM n
"""


def doc_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    e = d.select(
        "doc_id", F.posexplode(toks(F.col("text"))).alias("pos", "tok")
    )
    h = md5i32(F.concat((F.col("pos") + 1).cast("string"), F.lit("|"), F.col("tok")))
    return e.groupBy("doc_id").agg(
        (F.sum(h) % MOD31).cast("bigint").alias("fingerprint")
    )


SQL_FINGERPRINT = f"""
WITH e AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT doc_id,
       CAST(sum({DUCK_MD5I32.format(x="pos || '|' || tok")}) % {MOD31} AS BIGINT)
         AS fingerprint
FROM e GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# gopher_repetition — repetition-based quality filter in the
# Gopher/MassiveText style (Rae et al. 2021, App. A1.1): documents
# dominated by one repeated bigram, or with a large duplicated-bigram
# mass, are flagged.  ALL math is integer (counts + cross-multiplied
# threshold comparisons) — zero float rounding to desync engines.
# --------------------------------------------------------------------------

# thresholds as exact rationals: flag when top_cnt/n_bigrams > 1/10 or
# dup_cnt/n_bigrams > 1/5 (dup_cnt = occurrences of bigrams seen >= 2x)
REP_TOP_DEN = 10
REP_DUP_DEN = 5


def gopher_repetition(spark, sf_dir):
    """Per-doc bigram repetition stats + flag.

    Scale shape (100 TB): the bigram explode is a flat-map; both
    aggregations are partial-agg-friendly groupBys (map-side combine)
    on high-cardinality keys ((doc_id, bigram), then doc_id) — no skew
    pileup, no window over the whole corpus."""
    # tokens bound first — the shared bigram lambda slices the token
    # array per element, and an unmaterialized split() there re-splits
    # the whole text per bigram (O(n^2) per doc, the CLAUDE.md HOF rule)
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    per = (
        d.select("doc_id", F.explode(bigrams(F.col("_tk"))).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("cnt"))
    )
    agg = per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_bigrams"),
        F.max("cnt").alias("top_cnt"),
        F.count("*").alias("n_distinct"),
        F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0))).alias(
            "dup_cnt"
        ),
    )
    flagged = (
        (F.col("top_cnt") * REP_TOP_DEN > F.col("n_bigrams"))
        | (F.col("dup_cnt") * REP_DUP_DEN > F.col("n_bigrams"))
    ).cast("int")
    return agg.select(
        "doc_id", "n_bigrams", "top_cnt", "n_distinct", "dup_cnt",
        flagged.alias("flagged"),
    )


# --------------------------------------------------------------------------
# gopher_ngram_flags — the FULL Gopher/MassiveText repetition table
# (Rae et al. 2021, App. A1.1, Table A1): per doc and per n, the
# char-mass fraction held by the TOP n-gram (n = 2..4) or by ALL
# duplicated n-grams (n = 5..10), flagged against the paper's
# per-n thresholds (0.20/0.18/0.16; 0.15 down to 0.10).  Char mass of
# a gram = occurrences x rendered length (each occurrence counts its
# full width); denominator = total n-gram char mass.  ALL math is
# integer — fractions compare by cross-multiplication, and "mass of
# the most frequent gram" folds into ONE aggregation via a packed
# max key (cnt * 2^31 + mass, decoded with %), so no per-(doc, n)
# ranking window exists anywhere.
#
# Scale shape (100 TB): the 9-way n expansion is a narrow flat-map
# (token array duplicated 9x inside the row, never shuffled); the
# only Exchanges are the two partial-agg'd groupBys on
# high-cardinality keys ((doc_id, n, gram) then (doc_id, n)).
# --------------------------------------------------------------------------

GOPHER_NS = list(range(2, 11))
# threshold PERCENT by n (index n-2): top-gram mass for n=2..4,
# dup-gram mass for n=5..10 — Gopher Table A1
GOPHER_NGRAM_THR = [20, 18, 16, 15, 14, 13, 12, 11, 10]
_PACK = 1 << 31  # cnt * _PACK + mass: exact while mass < 2^31


def gopher_ngram_flags(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    dn = d.select(
        "doc_id", "_tk",
        F.explode(F.array(*[F.lit(n) for n in GOPHER_NS])).alias("n"),
    )
    grams = F.transform(
        F.sequence(
            F.lit(1), F.greatest(F.size("_tk") - (F.col("n") - 1), F.lit(1))
        ),
        lambda i: F.concat_ws(" ", F.slice("_tk", i, F.col("n"))),
    )
    per = (
        dn.select("doc_id", "n", F.explode(grams).alias("g"))
        .groupBy("doc_id", "n", "g")
        .agg(F.count("*").alias("cnt"))
        .select(
            "doc_id", "n", "cnt",
            (F.col("cnt") * F.length("g")).alias("mass"),
        )
    )
    agg = per.groupBy("doc_id", "n").agg(
        F.sum("mass").alias("total_mass"),
        F.max(F.col("cnt") * _PACK + F.col("mass")).alias("_topkey"),
        F.sum(
            F.when(F.col("cnt") >= 2, F.col("mass")).otherwise(F.lit(0))
        ).alias("dup_mass"),
    )
    thr = F.element_at(
        F.array(*[F.lit(t) for t in GOPHER_NGRAM_THR]), F.col("n") - 1
    )
    top_mass = F.col("_topkey") % _PACK
    flagged = F.when(
        F.col("n") <= 4, top_mass * 100 > thr * F.col("total_mass")
    ).otherwise(F.col("dup_mass") * 100 > thr * F.col("total_mass"))
    return agg.select(
        "doc_id",
        F.col("n").cast("int").alias("n"),
        "total_mass",
        top_mass.alias("top_mass"),
        "dup_mass",
        flagged.cast("int").alias("flagged"),
    )


_DUCK_THR = "[" + ", ".join(str(t) for t in GOPHER_NGRAM_THR) + "]"

SQL_GOPHER_NGRAM_FLAGS = f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
dn AS (SELECT doc_id, tk, n FROM d, UNNEST(range(2, 11)) t(n)),
e AS (
  SELECT doc_id, n,
         unnest(list_transform(
           range(1, greatest(len(tk) - (n - 1), 1) + 1),
           i -> array_to_string(tk[i:i+n-1], ' '))) AS g
  FROM dn),
per AS (
  SELECT doc_id, n, count(*) AS cnt,
         CAST(count(*) * length(g) AS BIGINT) AS mass
  FROM e GROUP BY doc_id, n, g),
agg AS (
  SELECT doc_id, n,
         CAST(sum(mass) AS BIGINT) AS total_mass,
         CAST(max(cnt * {_PACK} + mass) AS BIGINT) AS topkey,
         CAST(sum(CASE WHEN cnt >= 2 THEN mass ELSE 0 END) AS BIGINT)
           AS dup_mass
  FROM per GROUP BY doc_id, n)
SELECT doc_id, CAST(n AS INT) AS n, total_mass,
       CAST(topkey % {_PACK} AS BIGINT) AS top_mass, dup_mass,
       CASE WHEN n <= 4
            THEN CASE WHEN (topkey % {_PACK}) * 100
                          > {_DUCK_THR}[CAST(n - 1 AS INT)] * total_mass
                      THEN 1 ELSE 0 END
            ELSE CASE WHEN dup_mass * 100
                          > {_DUCK_THR}[CAST(n - 1 AS INT)] * total_mass
                      THEN 1 ELSE 0 END
       END AS flagged
FROM agg
"""


SQL_GOPHER_REPETITION = f"""
WITH bg AS (
  SELECT doc_id, unnest({duck_bigrams("l")}) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents)
),
per AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
agg AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         max(cnt) AS top_cnt,
         count(*) AS n_distinct,
         CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup_cnt
  FROM per GROUP BY doc_id
)
SELECT doc_id, n_bigrams, top_cnt, n_distinct, dup_cnt,
       CASE WHEN top_cnt * {REP_TOP_DEN} > n_bigrams
              OR dup_cnt * {REP_DUP_DEN} > n_bigrams
            THEN 1 ELSE 0 END AS flagged
FROM agg
"""


# ---- real byte-pair-merge tokenizer -----------------------------------------

# A valid BPE merge sequence (every side of a merge is a character or a
# token produced by an EARLIER merge).  In production this table is the
# artifact of an offline training job on a corpus sample, shipped to
# executors as a broadcast/literal — exactly how it is used here.  The
# alphabet is scoped to [a-z] (byte-level vocab is out of scope for the
# demo; non-letters act as word boundaries).
BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("in", "g"), ("a", "n"),
    ("an", "d"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("e", "s"), ("e", "d"), ("i", "s"),
    ("i", "t"), ("o", "u"), ("a", "l"), ("s", "t"), ("t", "o"),
]


def _validate_merges(merges) -> None:
    """Import-time pin of the structural properties the once-through
    replace chain's equivalence to classic BPE rests on (see the
    comment below): every operand is a single [a-z] char or the output
    of an EARLIER merge, and no two merges produce the same token.  A
    violating edit would silently diverge from real BPE while Spark
    and the DuckDB oracle still agreed with each other (both implement
    the same chain), so the oracle gate alone cannot catch it."""
    produced: set[str] = set()
    for r, (a, b) in enumerate(merges):
        for side in (a, b):
            assert (len(side) == 1 and "a" <= side <= "z") or side in produced, (
                f"merge #{r} ({a!r},{b!r}): operand {side!r} is neither a "
                f"[a-z] char nor an earlier merge's output"
            )
        out = a + b
        assert out not in produced, f"merge #{r}: duplicate output {out!r}"
        produced.add(out)


_validate_merges(BPE_MERGES)

# Tokens travel as a single string: each token wrapped in \x01
# sentinels, tokens separated by one space.  Merging rank r's pair
# (a, b) is then ONE literal string replacement
# "\x01a\x01 \x01b\x01" -> "\x01ab\x01": the sentinels make token
# boundaries unambiguous (no merge can match across a token's interior)
# and adjacent occurrences share no characters, so the engines' native
# leftmost non-overlapping replace IS the BPE merge step.  Applying the
# table once-through in rank order equals the classic
# repeat-lowest-rank loop because a merge can only create pairs that
# involve its own output token, and any rule consuming that token sits
# later in a valid merge sequence.
_S = "\x01"


def _bpe_encode_expr(word):
    """Narrow JVM expression: word -> sentinel-wrapped token string."""
    s = F.rtrim(F.regexp_replace(word, "(.)", f"{_S}$1{_S} "))
    for a, b in BPE_MERGES:
        s = F.replace(s, F.lit(f"{_S}{a}{_S} {_S}{b}{_S}"), F.lit(f"{_S}{a}{b}{_S}"))
    return s


def _bpe_encode_sql(var: str) -> str:
    s = f"rtrim(regexp_replace({var}, '(.)', e'\\x01\\\\1\\x01 ', 'g'), ' ')"
    for a, b in BPE_MERGES:
        s = f"replace({s}, e'\\x01{a}\\x01 \\x01{b}\\x01', e'\\x01{a}{b}\\x01')"
    return s


def _bpe_words(text):
    """The BPE pre-tokenizer: lowercase, non-letters are word
    boundaries, empty fragments dropped.  Single-sourced for
    bpe_encode and vocab_coverage (Spark side; `_BPE_WORDS_SQL` is the
    oracle mirror) so the word universe the vocab is measured against
    cannot drift from the one it encodes."""
    clean = F.trim(F.regexp_replace(F.lower(text), "[^a-z]+", " "))
    return F.filter(F.split(clean, " "), lambda w: w != "")


_BPE_WORDS_SQL = (
    "list_filter(string_split(trim(regexp_replace(lower(text), "
    "'[^a-z]+', ' ', 'g')), ' '), x -> x <> '')"
)


def bpe_encode(spark, sf_dir):
    """Real BPE tokenization as a ZERO-SHUFFLE codegen'd map — no
    Python, no UDF: per document, lowercase, split on non-letters,
    encode every word by the merge table, and emit token totals plus
    the first word's token sequence (a value-level witness that real
    merging happened, not just counting).

    Scale shape: one narrow pass over the corpus; the merge table is a
    plan literal (broadcast-equivalent); cost is O(len(text) ·
    n_merges) per row with no exchange anywhere — the same plan at
    100 TB.  Contrast ``token_count_bpe``, which only approximates
    token counts with a split regex."""
    d = _docs(spark, sf_dir)
    words = _bpe_words(F.col("text"))
    per_word = F.transform(words, lambda w: F.size(F.split(_bpe_encode_expr(w), " ")))
    n_tokens = F.aggregate(per_word, F.lit(0), lambda acc, x: acc + x)
    first_tokens = F.when(F.size(words) > 0, F.translate(
        _bpe_encode_expr(F.element_at(words, 1)), _S, ""
    )).otherwise(F.lit(""))
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        n_tokens.alias("n_tokens"),
        first_tokens.alias("first_tokens"),
    )


SQL_BPE_ENCODE = f"""
WITH w AS (
  SELECT doc_id, {_BPE_WORDS_SQL} AS words
  FROM documents
)
SELECT doc_id,
       CAST(len(words) AS INT) AS n_words,
       CAST(coalesce(list_sum(list_transform(words,
            w -> len(string_split({_bpe_encode_sql('w')}, ' ')))), 0) AS INT)
         AS n_tokens,
       CASE WHEN len(words) > 0
            THEN replace({_bpe_encode_sql('words[1]')}, chr(1), '')
            ELSE '' END AS first_tokens
FROM w
"""


# --------------------------------------------------------------------------
# bpe_ids — materialize the data-loader-facing training tensor: the
# document's BPE token sequence mapped into the integer id space and
# padded to a fixed shape (the array a training job memory-maps;
# Megatron/GPT-NeoX .bin shards are exactly this relation).  Id space
# is deterministic from the merge table alone: 0 = PAD, 1..26 = a-z,
# 27.. = merge outputs in rank order — shipped as a plan literal, the
# same artifact discipline as BPE_MERGES.  Encode chain and word
# universe single-sourced with bpe_encode (_bpe_words /
# _bpe_encode_expr), so the ids always correspond to the tokenizer's
# actual output.
#
# Scale shape (100 TB): one narrow codegen'd pass — encode, flatten,
# truncate to BPE_IDS_LEN, map through the 46-entry literal, pad;
# zero Exchange (plan-audited), no python anywhere.
# --------------------------------------------------------------------------

BPE_IDS_LEN = 32
BPE_VOCAB = {c: i + 1 for i, c in enumerate("abcdefghijklmnopqrstuvwxyz")}
for _a, _b in BPE_MERGES:
    BPE_VOCAB[_a + _b] = len(BPE_VOCAB) + 1


def bpe_ids(spark, sf_dir):
    """Registry surface: the id tensor rendered as a CSV string
    (``ids_csv``).  The driver canonicalizes result sets through a
    pandas sort, which raises ``unhashable type: 'list'`` on
    list-typed columns (CORRECTNESS_r04's bpe_ids crash) — so the
    registry entry scalarizes; library consumers (tests, loaders)
    take the true ``array<int>`` from ``_bpe_ids_from``."""
    e = _bpe_ids_from(_docs(spark, sf_dir))
    return e.select(
        "doc_id",
        "n_tokens",
        F.array_join(
            F.transform(F.col("ids"), lambda x: x.cast("string")), ","
        ).alias("ids_csv"),
    )


def _bpe_ids_from(docs):
    """The id-tensor projection over any (doc_id, text) relation —
    split out so tests can drive the padding branch with a short
    synthetic doc (every corpus fixture doc exceeds BPE_IDS_LEN
    tokens, so the pad path never fires on parquet input)."""
    d = docs.select("doc_id", _bpe_words(F.col("text")).alias("_w"))
    toks_per_word = F.transform(
        F.col("_w"),
        lambda w: F.split(F.translate(_bpe_encode_expr(w), _S, ""), " "),
    )
    vocab = F.create_map(
        *[F.lit(x) for t, i in sorted(BPE_VOCAB.items()) for x in (t, i)]
    )
    flat = F.flatten(toks_per_word)
    e = d.select("doc_id", flat.alias("_t")).select(
        "doc_id",
        F.size("_t").alias("n_tokens"),
        F.transform(
            F.slice(
                F.concat(
                    F.col("_t"),
                    F.array_repeat(F.lit(""), BPE_IDS_LEN),
                ),
                1,
                BPE_IDS_LEN,
            ),
            lambda t: F.coalesce(
                F.element_at(vocab, t), F.lit(0)
            ).cast("int"),
        ).alias("ids"),
    )
    return e


def _bpe_id_case(var: str) -> str:
    whens = " ".join(
        f"WHEN '{t}' THEN {i}" for t, i in sorted(BPE_VOCAB.items())
    )
    return f"CASE {var} {whens} ELSE 0 END"


SQL_BPE_IDS = f"""
WITH w AS (
  SELECT doc_id, {_BPE_WORDS_SQL} AS words FROM documents
),
t AS (
  SELECT doc_id,
         flatten(list_transform(words,
             w -> string_split(replace({_bpe_encode_sql('w')}, chr(1), ''),
                               ' '))) AS tk
  FROM w
)
SELECT doc_id, CAST(len(tk) AS INT) AS n_tokens,
       array_to_string(list_transform(
           list_slice(list_concat(tk,
               [{", ".join("''" for _ in range(BPE_IDS_LEN))}]),
               1, {BPE_IDS_LEN}),
           x -> CAST({_bpe_id_case('x')} AS INT)), ',') AS ids_csv
FROM t
"""
# array_to_string: list-typed oracle outputs crash the driver's
# pandas canonicalization (unhashable 'list', CORRECTNESS_r04) —
# array outputs get a scalar CSV rendering on BOTH engine sides.
# pad-then-slice (concat + slice) mirrors the Spark side's
# concat/array_repeat/slice formula exactly AND avoids DuckDB 1.0.0's
# list_resize, whose vectorized path raises std::bad_array_new_length
# on large row batches (reproduced at sf0.1: full-table query crashes,
# any single row succeeds, sf0.01 succeeds — batch-size-dependent
# allocator bug, not a data issue)


# --------------------------------------------------------------------------
# vocab_coverage — per-language tokenizer-fit telemetry: fertility
# (tokens per word — THE cross-lingual tokenizer-quality metric, Rust
# et al. 2021) and the single-token word rate ("vocab hit rate" — the
# complement of the continued-word rate).  A language whose fertility
# runs hot is under-served by the merge table and will eat a larger
# training-compute share per unit text; tokenizer teams publish
# exactly this table next to every vocab release.  The word universe
# and the encode chain are single-sourced with bpe_encode
# (_bpe_words / _bpe_encode_expr), so the measurement can never
# disagree with the tokenizer it measures.
#
# Scale shape (100 TB): one narrow codegen'd pass (the per-word token
# counts bind as a column, then two O(n_words) integer HOFs over the
# bound array — never re-encoding), then ONE map-side-combined
# Exchange to language grain; all ratios exact bigint ppm.
#
# Bigint headroom (the doremi_weights/temperature_sample rule): unlike
# the doc-count ppm ops, the fertility numerator is a per-language
# TOKEN sum — ~2.5e13 tokens at 100 TB, so a naive `n_tokens * 1e6`
# already wraps bigint (9.2e18) with DIVERGENT engine failures (Spark
# non-ANSI wraps silently, DuckDB raises).  _ppm_exact computes the
# same floor(num*1e6/den) EXACTLY via quotient/remainder staging:
# every intermediate is bounded by den*1000 (safe to 9.2e15 words per
# language ≈ 4 PB of text in ONE language) or by quotient*1e6
# (quotient = avg tokens-per-word resp. a ≤1 rate — never large).
# --------------------------------------------------------------------------


# _ppm_exact lives in common.py (import-cycle-free home) and is
# imported in this module's top import block; many modules and oracles
# re-import it from here, so the name is part of this module's surface.


def vocab_coverage(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "lang", _bpe_words(F.col("text")).alias("_w")
    )
    per_word = F.transform(
        F.col("_w"), lambda w: F.size(F.split(_bpe_encode_expr(w), " "))
    )
    e = d.select("lang", F.size("_w").alias("nw"), per_word.alias("_pw")).select(
        "lang",
        "nw",
        F.aggregate("_pw", F.lit(0), lambda a, x: a + x).alias("nt"),
        F.size(F.filter("_pw", lambda s: s == 1)).alias("ns"),
    )
    g = e.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("nw").alias("n_words"),
        F.sum("nt").alias("n_tokens"),
        F.sum("ns").alias("n_single"),
    )
    guard = lambda num: F.when(  # noqa: E731
        F.col("n_words") > 0, F.expr(num)
    ).otherwise(F.lit(0).cast("bigint"))
    return g.select(
        "lang",
        "n_docs",
        "n_words",
        "n_tokens",
        guard(_ppm_exact("n_tokens", "n_words", "div")).alias("fertility_ppm"),
        guard(_ppm_exact("n_single", "n_words", "div")).alias("single_token_ppm"),
    )


SQL_VOCAB_COVERAGE = f"""
WITH w AS (
  SELECT lang, {_BPE_WORDS_SQL} AS words FROM documents
),
e AS (
  SELECT lang, len(words) AS nw,
         coalesce(list_sum(pw), 0) AS nt,
         len(list_filter(pw, s -> s = 1)) AS ns
  FROM (SELECT lang, words,
               list_transform(words,
                   t -> len(string_split({_bpe_encode_sql('t')}, ' '))) AS pw
        FROM w)
),
g AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS n_words,
         CAST(sum(nt) AS BIGINT) AS n_tokens,
         CAST(sum(ns) AS BIGINT) AS n_single
  FROM e GROUP BY 1
)
SELECT lang, n_docs, n_words, n_tokens,
       CASE WHEN n_words > 0
            THEN {_ppm_exact('n_tokens', 'n_words', '//')}
            ELSE 0 END AS fertility_ppm,
       CASE WHEN n_words > 0
            THEN {_ppm_exact('n_single', 'n_words', '//')}
            ELSE 0 END AS single_token_ppm
FROM g
"""


# --------------------------------------------------------------------------
# gopher_quality — the document-level Gopher/MassiveText quality rule
# set (Rae et al. 2021, App. A1.1), adapted to this corpus's feature
# space: word-count bounds, mean-word-length bounds, minimum stop-word
# hits, and a maximum top-unigram fraction.  All comparisons are
# integer (cross-multiplied rationals) — zero float rounding to desync
# engines; thresholds were chosen so every rule discriminates on the
# driver corpus (sf0.01: 106 docs under min words, 20 under stop
# floor, 73 over the top-word cap).
#
# Scale shape (100 TB): one narrow pass, zero Exchange.  The
# most-common-word count is computed per row as a sorted-run scan
# (array_sort + aggregate, O(n log n) in DOC length, independent of
# corpus size) instead of an explode+groupBy — the whole rule set
# stays inside whole-stage codegen.  mean word length uses the
# single-space invariant: char_sum = length(text) - (n_words - 1).
# --------------------------------------------------------------------------

GOPHER_MIN_WORDS = 30
GOPHER_MAX_WORDS = 100000
GOPHER_MEANLEN_LO = 3  # mean word length bounds, exact via cross-multiply
GOPHER_MEANLEN_HI = 10
GOPHER_MIN_STOP = 2
GOPHER_TOPWORD_DEN = 8  # top unigram must be <= 1/8 of all words


def _top_run_count(tk):
    """Most-common-element count of a string array as a NARROW
    expression: sort, then scan counting the longest equal run.
    \\x00 init sentinel cannot equal a real token."""
    merged = F.aggregate(
        F.array_sort(tk),
        F.struct(
            F.lit("\x00").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return merged.best


def _gopher_stats_cols(tk):
    """Stage-1 columns of the Gopher rule set.  Two-stage select:
    lambda-bearing higher-order expressions (filter, aggregate) are
    excluded from Spark's subexpression elimination (SPARK-35410), so
    referencing them from multiple output columns would evaluate the
    O(n log n) scans once PER REFERENCE.  Stage 1 computes each
    expensive stat exactly once; stage 2 (_gopher_flags) derives the
    rule flags from plain column refs (cheap comparisons
    CollapseProject is free to inline).  Shared by gopher_quality and
    the fused curate_keep.  ``tk`` must be a BOUND token-array column
    (the CLAUDE.md HOF rule): an unbound split() here re-tokenizes
    the text once per stat — measured ~1.25x wall on the fused gate
    over 100k-token docs."""
    n_words = F.size(tk)
    return [
        n_words.alias("n_words"),
        (F.length("text") - (n_words - 1)).alias("char_sum"),
        F.size(F.filter(tk, lambda t: t.isin(STOPWORDS))).alias("stop_hits"),
        _top_run_count(tk).alias("top_cnt"),
    ]


def _gopher_flags():
    """(ok_words, ok_meanlen, ok_stop, ok_topword) over stage-1 refs
    — the ONE Spark-side source of the Gopher thresholds."""
    ok_words = (F.col("n_words") >= GOPHER_MIN_WORDS) & (
        F.col("n_words") <= GOPHER_MAX_WORDS
    )
    ok_meanlen = (F.col("char_sum") >= GOPHER_MEANLEN_LO * F.col("n_words")) & (
        F.col("char_sum") <= GOPHER_MEANLEN_HI * F.col("n_words")
    )
    ok_stop = F.col("stop_hits") >= GOPHER_MIN_STOP
    ok_topword = F.col("top_cnt") * GOPHER_TOPWORD_DEN <= F.col("n_words")
    return ok_words, ok_meanlen, ok_stop, ok_topword


def gopher_quality(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", "text", toks(F.col("text")).alias("_tk")
    )
    stats = d.select("doc_id", *_gopher_stats_cols(F.col("_tk")))
    ok_words, ok_meanlen, ok_stop, ok_topword = _gopher_flags()
    keep = ok_words & ok_meanlen & ok_stop & ok_topword
    return stats.select(
        "doc_id",
        "n_words",
        "char_sum",
        "stop_hits",
        "top_cnt",
        ok_words.cast("int").alias("ok_words"),
        ok_meanlen.cast("int").alias("ok_meanlen"),
        ok_stop.cast("int").alias("ok_stop"),
        ok_topword.cast("int").alias("ok_topword"),
        keep.cast("int").alias("keep"),
    )


SQL_GOPHER_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS INT)
           AS char_sum,
         CAST(len(list_filter(string_split(text, ' '),
              x -> list_contains([{_STOP_LIST}], x))) AS INT) AS stop_hits
  FROM documents
),
u AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
c AS (
  SELECT doc_id, CAST(max(cnt) AS INT) AS top_cnt
  FROM (SELECT doc_id, w, count(*) AS cnt FROM u GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT doc_id, n_words, char_sum, stop_hits, top_cnt,
  CASE WHEN n_words >= {GOPHER_MIN_WORDS}
        AND n_words <= {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS ok_words,
  CASE WHEN char_sum >= {GOPHER_MEANLEN_LO} * n_words
        AND char_sum <= {GOPHER_MEANLEN_HI} * n_words
       THEN 1 ELSE 0 END AS ok_meanlen,
  CASE WHEN stop_hits >= {GOPHER_MIN_STOP} THEN 1 ELSE 0 END AS ok_stop,
  CASE WHEN top_cnt * {GOPHER_TOPWORD_DEN} <= n_words
       THEN 1 ELSE 0 END AS ok_topword,
  CASE WHEN n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
        AND char_sum >= {GOPHER_MEANLEN_LO} * n_words
        AND char_sum <= {GOPHER_MEANLEN_HI} * n_words
        AND stop_hits >= {GOPHER_MIN_STOP}
        AND top_cnt * {GOPHER_TOPWORD_DEN} <= n_words
       THEN 1 ELSE 0 END AS keep
FROM t JOIN c USING (doc_id)
"""


# --------------------------------------------------------------------------
# badword_filter — blocklist filtering (the C4/RefinedWeb "bad words"
# step, adapted to this corpus's vocabulary).  Three rule classes:
# a HARD word whose presence alone flags the doc, a ratio rule over
# soft blocklist hits (hits * BAD_DEN > n_words), and a two-token
# PHRASE counted at token-bigram positions — computed narrowly via
# zip_with(tokens, tokens[2:]) so no explode, no shuffle, and
# overlapping occurrences are each counted (position semantics, not
# greedy substring replace, which undercounts adjacent hits).
#
# Scale shape (100 TB): one narrow pass, zero Exchange, entirely
# inside whole-stage codegen.  A real blocklist (thousands of terms)
# would swap the isin() literal for a broadcast set — same plan shape.
# --------------------------------------------------------------------------

BAD_WORDS = ("slow", "corrupt")
BAD_HARD = "dup"
BAD_PHRASE = ("slow", "scan")
BAD_DEN = 24


def _badword_stats_cols(tk):
    """Stage-1 columns of the blocklist rules (same CSE and bound-``tk``
    discipline as _gopher_stats_cols).  n_words is intentionally NOT
    emitted — callers share one n_words column.  Shared by
    badword_filter and the fused curate_keep."""
    n_words = F.size(tk)
    n_bad = F.size(F.filter(tk, lambda t: t.isin(*BAD_WORDS)))
    # token bigrams: zip the array with itself shifted by one; the
    # final element pairs with NULL, which can never equal the phrase
    nxt = F.slice(tk, 2, F.greatest(n_words - 1, F.lit(0)))
    n_phrase = F.size(
        F.filter(
            F.zip_with(tk, nxt, lambda a, b: (a == BAD_PHRASE[0]) & (b == BAD_PHRASE[1])),
            lambda hit: hit,
        )
    )
    has_hard = F.array_contains(tk, BAD_HARD)
    return [
        n_bad.alias("n_bad"),
        n_phrase.alias("n_phrase"),
        has_hard.cast("int").alias("has_hard"),
    ]


def _badword_rule_flags():
    """(hard, phrase, ratio) over stage-1 refs — the ONE Spark-side
    source of the blocklist thresholds (both the flag and
    curate_keep's reject_reason derive from these)."""
    return (
        F.col("has_hard") == 1,
        F.col("n_phrase") > 0,
        F.col("n_bad") * BAD_DEN > F.col("n_words"),
    )


def _badword_flagged():
    hard, phrase, ratio = _badword_rule_flags()
    return hard | phrase | ratio


def badword_filter(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    tk = F.col("_tk")
    stats = d.select(
        "doc_id",
        F.size(tk).alias("n_words"),
        *_badword_stats_cols(tk),
    )
    flagged = _badword_flagged()
    return stats.select(
        "doc_id",
        "n_words",
        "n_bad",
        "n_phrase",
        "has_hard",
        flagged.cast("int").alias("flagged"),
    )


_BAD_LIST = ", ".join(f"'{w}'" for w in BAD_WORDS)

SQL_BADWORD_FILTER = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
s AS (
  SELECT doc_id,
         CAST(len(l) AS INT) AS n_words,
         CAST(len(list_filter(l, x -> x IN ({_BAD_LIST}))) AS INT) AS n_bad,
         CAST(len(list_filter(range(1, len(l)),
              i -> l[i] = '{BAD_PHRASE[0]}' AND l[i+1] = '{BAD_PHRASE[1]}'))
           AS INT) AS n_phrase,
         CASE WHEN list_contains(l, '{BAD_HARD}') THEN 1 ELSE 0 END AS has_hard
  FROM t
)
SELECT doc_id, n_words, n_bad, n_phrase, has_hard,
  CASE WHEN has_hard = 1 OR n_phrase > 0 OR n_bad * {BAD_DEN} > n_words
       THEN 1 ELSE 0 END AS flagged
FROM s
"""


def curate_keep(spark, sf_dir):
    """The composed curation gate — every Gopher rule and every
    blocklist rule evaluated in ONE narrow select over ONE corpus scan
    (keep flag + first-failing reject_reason, hard rules first).  This
    is the table a curation pipeline semi-joins training input
    against, and the fused form is the 100 TB point: at 10^12 docs,
    running gopher_quality and badword_filter as separate jobs reads
    the corpus twice; here Catalyst collapses both rule sets plus the
    verdict into a single whole-stage-codegen'd pass — zero Exchange,
    one scan (plan-audited)."""
    return curate_relation(_docs(spark, sf_dir))


def curate_relation(docs):
    """The gate as a relation over any (doc_id, text) frame — shared
    by the batch entry above and streaming.q_stream_curate (stateless
    narrow transform, so it applies to a streaming frame unchanged)."""
    d = docs.select(
        "doc_id", "text", toks(F.col("text")).alias("_tk")
    )
    tk = F.col("_tk")
    stats = d.select("doc_id", *_gopher_stats_cols(tk), *_badword_stats_cols(tk))
    ok_words, ok_meanlen, ok_stop, ok_topword = _gopher_flags()
    hard, phrase, ratio = _badword_rule_flags()
    keep = ok_words & ok_meanlen & ok_stop & ok_topword & ~_badword_flagged()
    reason = (
        F.when(hard, "hard_word")
        .when(phrase, "bad_phrase")
        .when(ratio, "bad_ratio")
        .when(~ok_words, "n_words")
        .when(~ok_meanlen, "mean_word_len")
        .when(~ok_stop, "stop_words")
        .when(~ok_topword, "top_word")
    )
    return stats.select(
        "doc_id",
        keep.cast("int").alias("keep"),
        reason.alias("reject_reason"),
    )


# the oracle composes the two component oracles verbatim (nested WITH
# in CTE bodies), so curate_keep is value-checked against the SAME SQL
# that checks gopher_quality and badword_filter individually
SQL_CURATE_KEEP = f"""
WITH g AS ({SQL_GOPHER_QUALITY}), b AS ({SQL_BADWORD_FILTER})
SELECT g.doc_id AS doc_id,
  CAST(CASE WHEN g.keep = 1 AND b.flagged = 0 THEN 1 ELSE 0 END AS INT)
    AS keep,
  CASE WHEN b.has_hard = 1 THEN 'hard_word'
       WHEN b.n_phrase > 0 THEN 'bad_phrase'
       WHEN b.n_bad * {BAD_DEN} > b.n_words THEN 'bad_ratio'
       WHEN g.ok_words = 0 THEN 'n_words'
       WHEN g.ok_meanlen = 0 THEN 'mean_word_len'
       WHEN g.ok_stop = 0 THEN 'stop_words'
       WHEN g.ok_topword = 0 THEN 'top_word'
       ELSE NULL END AS reject_reason
FROM g JOIN b ON g.doc_id = b.doc_id
"""


# --------------------------------------------------------------------------
# lexical_diversity — vocabulary-richness stats used by corpus quality
# filters: type/token ratio and Simpson's repeat index, both as exact
# integers (fixed-point TTR via integer division; Simpson's index kept
# as an exact numerator/denominator pair plus a fixed-point quotient)
# so no float summation order can desync engines.
#
# Scale shape (100 TB): one narrow pass, zero Exchange.  The repeat
# mass Σ cnt·(cnt−1) is computed per row by a sorted-run scan over the
# token array (O(n log n) in DOC length, independent of corpus size)
# — the same pattern as gopher_quality's top-run count — instead of an
# explode + groupBy shuffle.
# --------------------------------------------------------------------------


def _repeat_mass(tk):
    """Σ cnt·(cnt−1) over token multiplicities as a NARROW expression:
    sort, scan runs, close each run's cnt·(cnt−1) at its boundary.
    \\x00 init sentinel cannot equal a real token."""
    return F.aggregate(
        F.array_sort(tk),
        F.struct(
            F.lit("\x00").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("rep"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1).cast("bigint")).alias(
                "run"
            ),
            F.when(x == acc.prev, acc.rep)
            .otherwise(acc.rep + acc.run * (acc.run - 1))
            .alias("rep"),
        ),
        lambda acc: acc.rep + acc.run * (acc.run - 1),
    )


def lexical_diversity(spark, sf_dir):
    d = _docs(spark, sf_dir)
    tk = toks(F.col("text"))
    # lambda-bearing scans are CSE-excluded (SPARK-35410, see
    # gopher_quality) — stage 1 computes each once, stage 2 derives
    stats = d.select(
        "doc_id",
        F.size(tk).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(tk)).cast("bigint").alias("n_distinct"),
        _repeat_mass(tk).alias("rep_mass"),
    )
    n = F.col("n_tokens")
    return stats.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        "rep_mass",
        F.expr("n_distinct * 10000 DIV n_tokens").alias("ttr_x1e4"),
        (n * (n - 1)).alias("pairs"),
        F.when(n > 1, F.expr("rep_mass * 10000 DIV (n_tokens * (n_tokens - 1))"))
        .otherwise(F.lit(0).cast("bigint"))
        .alias("simpson_x1e4"),
    )


SQL_LEXICAL_DIVERSITY = """
WITH u AS (
  SELECT doc_id, w, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1, 2
),
a AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_distinct,
         CAST(sum(cnt * (cnt - 1)) AS BIGINT) AS rep_mass
  FROM u GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_distinct, rep_mass,
       (n_distinct * 10000) // n_tokens AS ttr_x1e4,
       n_tokens * (n_tokens - 1) AS pairs,
       CASE WHEN n_tokens > 1
            THEN (rep_mass * 10000) // (n_tokens * (n_tokens - 1))
            ELSE 0 END AS simpson_x1e4
FROM a
"""


# --------------------------------------------------------------------------
# fastText-style linear quality classifier (hashing trick)
# --------------------------------------------------------------------------

QC_BUCKETS = 4096  # feature-hash space (fastText's `-bucket`)
QC_BIAS = 0


def _qc_weight_py(b: int) -> int:
    import hashlib

    return int(hashlib.md5(f"qw,{b}".encode()).hexdigest()[:8], 16) % 2001 - 1000


# the weight table is DATA-INDEPENDENT (a stand-in for trained model
# weights — the container has no fastText, and a real .bin would be an
# external artifact), so it ships as ONE array literal in the plan:
# zero per-row md5 for the weight lookup, exactly the import-time
# discipline of similarity._PLANE_W.  The DuckDB oracle re-derives the
# same md5 construction per feature instead (it has no cheap way to
# carry a 4096-literal, and the oracle is not the perf path).
_QC_W = [_qc_weight_py(b) for b in range(QC_BUCKETS)]


def quality_classifier(spark, sf_dir):
    """Model-based quality scoring, the DCLM / FineWeb-Edu-style gate:
    a fastText-shaped LINEAR classifier over hashed unigram + word-
    bigram features (the hashing trick — token -> md5 bucket ->
    weight), score = sum of feature weights + bias, keep = score > 0.
    Weights here are a deterministic md5 stand-in for trained
    parameters; swapping in a real trained table changes one literal
    array, not the dataflow.

    Scale shape: one narrow shuffle-free pass — tokens and bigrams
    stay inside per-row JVM array expressions (transform + aggregate;
    higher-order functions are CodegenFallback but never leave the
    JVM), the weight table is a plan literal, and nothing shuffles
    (plan-audited zero Exchange).  The token array is materialized as
    a named column FIRST: interpreted HOF eval re-evaluates lambda-
    body subtrees per element, so an unmaterialized split() inside
    the bigram lambda would re-split the whole document per bigram —
    O(n^2) per doc (measured) — while a bound column read is O(1).
    This is the economics that make classifier-filtering 100 TB
    feasible: embarrassingly parallel, IO-bound, no Python."""
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("tk"))
    score = _classifier_score(F.col("tk"))
    return d.select(
        "doc_id",
        score.alias("score"),
        (score > 0).cast("int").alias("keep"),
    )


def _classifier_score(tk):
    """The linear-classifier score expression over a BOUND token-array
    column (shared by quality_classifier and the quality_vote
    ensemble — the CLAUDE.md HOF rule applies to ``tk``)."""
    bigrams_ = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tk, i), F.element_at(tk, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(tk, bigrams_)
    w_of = lambda f: F.element_at(  # noqa: E731
        F.lit(_QC_W), (md5i32(f) % QC_BUCKETS + 1).cast("int")
    ).cast("bigint")
    return F.aggregate(
        F.transform(feats, w_of), F.lit(QC_BIAS).cast("bigint"), lambda a, x: a + x
    )


_QC_B = f"({DUCK_MD5I32.format(x='f')} % {QC_BUCKETS})"
_QC_FEAT = "'qw,' || CAST(" + _QC_B + " AS VARCHAR)"
_QC_WEIGHT = f"({DUCK_MD5I32.format(x=_QC_FEAT)} % 2001 - 1000)"

SQL_QUALITY_CLASSIFIER = f"""
WITH q AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
feats AS (
  SELECT doc_id,
         unnest(l || list_transform(range(1, greatest(len(l), 1)),
                                    i -> l[i] || ' ' || l[i + 1])) AS f
  FROM q
),
scored AS (
  SELECT doc_id, CAST({QC_BIAS} + sum({_QC_WEIGHT}) AS BIGINT) AS score
  FROM feats GROUP BY doc_id
)
SELECT doc_id, score, CASE WHEN score > 0 THEN 1 ELSE 0 END AS keep
FROM scored
"""


# --------------------------------------------------------------------------
# perplexity_bucket — CCNet-style LM-perplexity filtering (Wenzek et
# al. 2020): score every document under a language model trained on
# the corpus itself, then route it to a head / middle / tail bucket by
# per-language thresholds.  The LM here is an add-one-smoothed token
# bigram model (KenLM stands in for it in production; the *pipeline
# shape* — train counts on the corpus, broadcast the model, score
# narrowly, bucket by precomputed per-lang cutoffs — is identical and
# is what this operator demonstrates).
#
# Scale shape (100 TB): two partial-agg-friendly groupBys build the
# count model (map-side combine on bigram / first-token keys); the
# vocabulary-size scalar is a 1-row aggregate folded into the plan
# (crossJoin broadcast, no driver action); scoring is one equi-join of
# bigram occurrences against the (bigram → surprise) table followed by
# a per-doc partial agg.  Bucket thresholds are constants (CCNet's
# production design: cutoffs are precomputed per language from a
# sample, shipped as literals) — no global sort, no quantile window.
#
# Cross-engine determinism: the surprise of a bigram type is
# floor(ln((c1 + V) / (c2 + 1)) * 1e6) — ONE integer-exact division,
# ONE ln of an identical double (bit-identical per the tfidf_topk
# precedent), scaled and floored to a bigint BEFORE any summation, so
# per-doc sums are integer and order-independent.  c1 >= c2 and V >= 1
# make every surprise non-negative, so bigint `div` (truncation) is
# floor division in both engines.
# --------------------------------------------------------------------------

PPL_SCALE = 1_000_000
# per-lang (head_max, middle_max) cutoffs in µ-nats/bigram, set at the
# lang's observed ~q25/~q75 on the synthetic corpus (in production:
# measured on a sample per language, shipped as constants)
PPL_CUTOFFS = {
    "en": (3_368_000, 3_405_000),
    "es": (3_362_000, 3_400_000),
    "de": (3_356_000, 3_405_000),
    "fr": (3_373_000, 3_402_000),
    "zh": (3_370_000, 3_405_000),
}


def perplexity_bucket(spark, sf_dir):
    """Per-doc bigram-LM surprise score + CCNet head/middle/tail bucket."""
    return _perplexity_scored(_docs(spark, sf_dir))


def _perplexity_scored(docs):
    """Score a (doc_id, lang, text) DataFrame; split out so tests can
    pin the LM semantics on constructed corpora."""
    # tokens bound as a column first (CLAUDE.md HOF rule)
    d = docs.select("doc_id", "lang", toks(F.col("text")).alias("_tk"))
    occ = d.select(
        "doc_id", "lang", F.explode(bigrams(F.col("_tk"))).alias("bg")
    )

    # ONE corpus-sized aggregation builds the whole model: first-token
    # counts and the successor-vocabulary scalar both derive exactly
    # from the vocabulary-sized c2 table (c1(w) = Σ c2 over bigrams
    # starting w; distinct successors of occurrences == distinct
    # successors of bigram types), so the corpus scans twice total
    # (model + scoring), never four times
    c2 = occ.groupBy("bg").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy(F.split("bg", " ")[0].alias("_w1")).agg(
        F.sum("c2").alias("c1")
    )
    # vocabulary size for add-one smoothing: distinct successor tokens,
    # folded into the plan as a broadcast 1-row aggregate
    # F.get (0-based) is NULL-safe out of bounds under ANSI mode, so a
    # degenerate single-token "bigram" contributes no successor (the
    # DuckDB list_extract mirror also yields NULL there)
    vsz = c2.agg(
        F.countDistinct(F.get(F.split("bg", " "), 1)).alias("vsz")
    )
    # assemble the (bigram → surprise) model table: equi-join the two
    # partial-agg'd count tables (both vocabulary-, not corpus-sized)
    surp_tbl = (
        c2.crossJoin(F.broadcast(vsz))
        .join(c1, F.split(c2["bg"], " ")[0] == F.col("_w1"))
        .select(
            "bg",
            F.floor(
                F.log((F.col("c1") + F.col("vsz")) / (F.col("c2") + F.lit(1.0)))
                * PPL_SCALE
            )
            .cast("bigint")
            .alias("s"),
        )
    )
    scored = (
        occ.join(surp_tbl, "bg")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("s").alias("sum_surp"),
        )
        .withColumn("score", F.expr("sum_surp div n_bigrams"))
    )
    head = F.create_map(
        *[x for l, (h, _) in sorted(PPL_CUTOFFS.items()) for x in (F.lit(l), F.lit(h))]
    )
    mid = F.create_map(
        *[x for l, (_, m) in sorted(PPL_CUTOFFS.items()) for x in (F.lit(l), F.lit(m))]
    )
    bucket = (
        F.when(F.col("score") < head[F.col("lang")], F.lit("head"))
        .when(F.col("score") < mid[F.col("lang")], F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return scored.select(
        "doc_id", "lang", "n_bigrams", "sum_surp", "score", bucket.alias("bucket")
    )


def _ppl_cutoff_case(which: int) -> str:
    return (
        "CASE lang "
        + " ".join(
            f"WHEN '{l}' THEN {cut[which]}" for l, cut in sorted(PPL_CUTOFFS.items())
        )
        + " END"
    )


# CTE chain t..scored mirrors _perplexity_scored exactly and is shared
# by the perplexity_bucket and doremi_weights oracles (single-sourced
# like DUCK_BM25_AGG_CTES, so the LM scoring rule cannot drift)
DUCK_PPL_SCORED_CTES = f"""t AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
occ AS (
  SELECT doc_id, lang, unnest({duck_bigrams("l")}) AS bg FROM t
),
c2 AS (SELECT bg, count(*) AS c2 FROM occ GROUP BY bg),
c1 AS (SELECT list_extract(string_split(bg, ' '), 1) AS w1,
              CAST(sum(c2) AS BIGINT) AS c1
       FROM c2 GROUP BY 1),
v AS (SELECT count(DISTINCT list_extract(string_split(bg, ' '), 2)) AS vsz
      FROM c2),
surp AS (
  SELECT c2.bg,
         CAST(floor(ln((c1.c1 + v.vsz) / (c2.c2 + 1.0)) * {PPL_SCALE})
              AS BIGINT) AS s
  FROM c2 CROSS JOIN v
  JOIN c1 ON list_extract(string_split(c2.bg, ' '), 1) = c1.w1
),
scored AS (
  SELECT doc_id, lang,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(s) AS BIGINT) AS sum_surp,
         CAST(sum(s) AS BIGINT) // CAST(count(*) AS BIGINT) AS score
  FROM occ JOIN surp USING (bg)
  GROUP BY doc_id, lang
)"""

SQL_PERPLEXITY_BUCKET = f"""
WITH {DUCK_PPL_SCORED_CTES}
SELECT doc_id, lang, n_bigrams, sum_surp, score,
       CASE WHEN score < ({_ppl_cutoff_case(0)}) THEN 'head'
            WHEN score < ({_ppl_cutoff_case(1)}) THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored
"""


# --------------------------------------------------------------------------
# doremi_weights — DoReMi-style domain reweighting (Xie et al. 2023):
# domains whose proxy-model loss EXCEEDS the reference get upweighted
# exponentially, so the next training mix spends more tokens where the
# model is furthest behind.  Graft version: domain = lang, per-doc
# loss = the perplexity_bucket bigram-LM surprise (single-sourced via
# _perplexity_scored / DUCK_PPL_SCORED_CTES), reference loss = the
# corpus-wide mean, excess_d = max(0, L_d - L_ref), and the new weight
# alpha_d ∝ baseline_d · exp(excess_d / τ) with baseline_d = the
# domain's current doc share.  All shares are integer ppm via bigint
# cross-multiplied division; exp() runs on one identical double per
# DOMAIN (5 rows) and is floored to micros before the normalizing sum,
# so cross-engine float reassociation cannot move a weight.
#
# Scale shape (100 TB): the per-doc scoring is perplexity_bucket's
# partial-agg'd plan; everything after is a DOMAIN-cardinality rollup
# (one 5-row agg, a 1-row broadcast reference, a 1-row broadcast
# normalizer) — the reweighting layer adds zero corpus-grain work.
# --------------------------------------------------------------------------

DOREMI_TAU = 10_000  # temperature in µ-nats (0.01 nats)
# The exp argument is clamped to 16 so alpha_micro ≤ 1e6·exp(16) ≈
# 8.9e12 — which keeps BOTH the per-domain alpha and the downstream
# `alpha_micro * 1000000` ppm cross-multiplication inside bigint.
# Without the clamp a domain ~0.44 nats above the reference (routine
# for a low-resource language under add-one smoothing) pushes
# base·exp(excess/τ) past 2^63, where the engines fail DIFFERENTLY:
# Spark's non-ANSI double→long cast saturates silently, DuckDB's CAST
# raises.  Past the clamp the mix is already maximally skewed
# (exp(16) ≈ 8.9e6× the base share), so clipping loses nothing.
DOREMI_EXCESS_CAP = 16 * DOREMI_TAU  # µ-nats


def doremi_weights(spark, sf_dir):
    scored = _perplexity_scored(_docs(spark, sf_dir))
    dom = scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.expr("sum(score) div count(*)").alias("loss_micro"),
    )
    ref = scored.agg(F.expr("sum(score) div count(*)").alias("ref_micro"))
    tot = dom.agg(F.sum("n_docs").alias("n_total"))
    d = dom.crossJoin(F.broadcast(ref)).crossJoin(F.broadcast(tot))
    excess = F.greatest(F.lit(0), F.col("loss_micro") - F.col("ref_micro"))
    capped = F.least(excess, F.lit(DOREMI_EXCESS_CAP))
    base_ppm = F.expr("n_docs * 1000000 div n_total")
    alpha = F.floor(
        base_ppm.cast("double")
        * F.exp(capped.cast("double") / F.lit(float(DOREMI_TAU)))
    ).cast("bigint")
    a = d.select(
        "lang",
        "n_docs",
        "loss_micro",
        excess.alias("excess_micro"),
        alpha.alias("alpha_micro"),
    )
    asum = a.agg(F.sum("alpha_micro").alias("alpha_sum"))
    return a.crossJoin(F.broadcast(asum)).select(
        "lang",
        "n_docs",
        "loss_micro",
        "excess_micro",
        F.expr("alpha_micro * 1000000 div alpha_sum").alias("weight_ppm"),
    )


SQL_DOREMI_WEIGHTS = f"""
WITH {DUCK_PPL_SCORED_CTES},
dom AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(score) AS BIGINT) // CAST(count(*) AS BIGINT)
           AS loss_micro
  FROM scored GROUP BY lang
),
ref AS (
  SELECT CAST(sum(score) AS BIGINT) // CAST(count(*) AS BIGINT)
           AS ref_micro
  FROM scored
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total FROM dom),
a AS (
  SELECT lang, n_docs, loss_micro,
         greatest(0, loss_micro - ref_micro) AS excess_micro,
         CAST(floor(
           CAST(n_docs * 1000000 // n_total AS DOUBLE)
           * exp(CAST(least(greatest(0, loss_micro - ref_micro),
                            {DOREMI_EXCESS_CAP}) AS DOUBLE)
                 / {float(DOREMI_TAU)})
         ) AS BIGINT) AS alpha_micro
  FROM dom, ref, tot
),
asum AS (SELECT CAST(sum(alpha_micro) AS BIGINT) AS alpha_sum FROM a)
SELECT lang, n_docs, loss_micro, excess_micro,
       alpha_micro * 1000000 // alpha_sum AS weight_ppm
FROM a, asum
"""


# --------------------------------------------------------------------------
# quality_vote — the multi-signal ensemble gate (the FineWeb-Edu /
# DCLM pattern: no single quality signal decides alone).  Three
# independent signal families vote — the Gopher RULE gate, the linear
# CLASSIFIER, and the perplexity LM (doc not in the 'tail' bucket) —
# and a document survives on a 2-of-3 majority.  Each component is
# the single-sourced builder its standalone op uses (_gopher_stats_
# cols/_gopher_flags, _classifier_score, perplexity_bucket), so the
# ensemble cannot drift from the component ops.
#
# Scale shape (100 TB): the two narrow signals (rules + classifier)
# FUSE into one zero-shuffle pass over one corpus scan sharing one
# bound token array — adding the classifier to the rule scan is free
# at the IO level.  The perplexity signal inherently needs its own
# count-model aggregations (it trains ON the corpus); its per-doc
# relation then equi-joins the narrow relation at doc_id grain
# (co-located under the io.py bucket convention).  The vote itself is
# arithmetic on three ints.
# --------------------------------------------------------------------------

QVOTE_MIN = 2  # 2-of-3 majority


def quality_vote(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", "text", toks(F.col("text")).alias("_tk")
    )
    stats = d.select(
        "doc_id",
        *_gopher_stats_cols(F.col("_tk")),
        _classifier_score(F.col("_tk")).alias("cls_score"),
    )
    ok_words, ok_meanlen, ok_stop, ok_topword = _gopher_flags()
    narrow = stats.select(
        "doc_id",
        (ok_words & ok_meanlen & ok_stop & ok_topword)
        .cast("int")
        .alias("gopher_ok"),
        (F.col("cls_score") > 0).cast("int").alias("cls_ok"),
    )
    ppl = perplexity_bucket(spark, sf_dir).select(
        "doc_id", (F.col("bucket") != "tail").cast("int").alias("ppl_ok")
    )
    j = narrow.join(ppl, "doc_id")
    votes = F.col("gopher_ok") + F.col("cls_ok") + F.col("ppl_ok")
    return j.select(
        "doc_id",
        "gopher_ok",
        "cls_ok",
        "ppl_ok",
        votes.alias("votes"),
        (votes >= QVOTE_MIN).cast("int").alias("keep"),
    )


SQL_QUALITY_VOTE = f"""
WITH g AS ({SQL_GOPHER_QUALITY}),
c AS ({SQL_QUALITY_CLASSIFIER}),
p AS ({SQL_PERPLEXITY_BUCKET})
SELECT g.doc_id,
       g.keep AS gopher_ok,
       c.keep AS cls_ok,
       CASE WHEN p.bucket <> 'tail' THEN 1 ELSE 0 END AS ppl_ok,
       g.keep + c.keep
         + CASE WHEN p.bucket <> 'tail' THEN 1 ELSE 0 END AS votes,
       CASE WHEN g.keep + c.keep
                 + CASE WHEN p.bucket <> 'tail' THEN 1 ELSE 0 END
                 >= {QVOTE_MIN}
            THEN 1 ELSE 0 END AS keep
FROM g
JOIN c ON g.doc_id = c.doc_id
JOIN p ON g.doc_id = p.doc_id
"""


# --------------------------------------------------------------------------
# filter_funnel — curation-funnel telemetry: the per-stage kill report
# every production pipeline publishes next to its dataset (how many
# docs entered each filter, how many it removed, what survived).
# Stages run in cheap-to-expensive order — Gopher rules, blocklist,
# classifier, perplexity tail — and a doc is attributed to the FIRST
# stage that kills it (the funnel convention: later stages never see
# it).  Every stage predicate is the single-sourced builder its
# standalone op uses (_gopher_flags, _badword_flagged,
# _classifier_score, perplexity_bucket), so the telemetry can never
# disagree with the filters it describes.
#
# Scale shape (100 TB): the three narrow signals fuse into ONE
# zero-shuffle pass over one bound token array (the quality_vote scan
# shape); perplexity joins at doc grain; the funnel math then runs on
# a 5-row stage spine (4 filters + a synthetic survivor stage) —
# histogram, then total and cumulative-kill as window sums over that
# same tiny relation.  The telemetry layer adds zero corpus-grain work
# beyond the one fused scan.
# --------------------------------------------------------------------------

FUNNEL_STAGES = ("gopher_rules", "badwords", "classifier", "ppl_tail")


def filter_funnel(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id", "text", toks(F.col("text")).alias("_tk")
    )
    tk = F.col("_tk")
    stats = d.select(
        "doc_id",
        *_gopher_stats_cols(tk),
        *_badword_stats_cols(tk),
        _classifier_score(tk).alias("cls_score"),
    )
    ok_words, ok_meanlen, ok_stop, ok_topword = _gopher_flags()
    narrow = stats.select(
        "doc_id",
        (ok_words & ok_meanlen & ok_stop & ok_topword).alias("g"),
        (~_badword_flagged()).alias("b"),
        (F.col("cls_score") > 0).alias("c"),
    )
    ppl = perplexity_bucket(spark, sf_dir).select(
        "doc_id", (F.col("bucket") != "tail").alias("p")
    )
    survivor = len(FUNNEL_STAGES) + 1
    killed = (
        F.when(~F.col("g"), 1)
        .when(~F.col("b"), 2)
        .when(~F.col("c"), 3)
        .when(~F.col("p"), 4)
        .otherwise(survivor)
    )
    j = narrow.join(ppl, "doc_id").select(killed.alias("stage"))
    hist = j.groupBy("stage").agg(F.count("*").alias("cnt"))
    # Survivors ride the histogram as a synthetic last stage, so
    # n_total is a window sum over the SAME 5-row spine relation and
    # the corpus-grain lineage executes exactly once.  A separate
    # j.agg(count) / hist.agg(sum) branch re-runs the whole scoring
    # subtree (measured: 2x the parquet scans; AQE reuse only
    # recovered 2 exchanges at runtime).
    spine = spark.range(1, survivor + 1).select(
        F.col("id").cast("int").alias("stage")
    )
    h = spine.join(F.broadcast(hist), "stage", "left").select(
        "stage", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("n_killed")
    )
    w_before = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy("stage").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    o = (
        h.withColumn("n_total", F.sum("n_killed").over(w_all))
        .withColumn(
            "_before",
            F.coalesce(
                F.sum("n_killed").over(w_before), F.lit(0).cast("bigint")
            ),
        )
        .where(F.col("stage") <= len(FUNNEL_STAGES))
        .withColumn("n_in", F.col("n_total") - F.col("_before"))
    )
    name = F.element_at(
        F.array(*[F.lit(s) for s in FUNNEL_STAGES]), F.col("stage")
    )
    survive = F.when(F.col("n_in") == 0, F.lit(0).cast("bigint")).otherwise(
        F.expr("(n_in - n_killed) * 1000000 div n_in")
    )
    return o.select(
        "stage",
        name.alias("stage_name"),
        "n_in",
        "n_killed",
        survive.alias("survive_ppm"),
    )


_FUNNEL_NAME_CASE = "CASE stage " + " ".join(
    f"WHEN {i + 1} THEN '{s}'" for i, s in enumerate(FUNNEL_STAGES)
) + " END"

SQL_FILTER_FUNNEL = f"""
WITH g AS ({SQL_GOPHER_QUALITY}),
b AS ({SQL_BADWORD_FILTER}),
c AS ({SQL_QUALITY_CLASSIFIER}),
p AS ({SQL_PERPLEXITY_BUCKET}),
k AS (
  SELECT g.doc_id,
         CASE WHEN g.keep = 0 THEN 1
              WHEN b.flagged = 1 THEN 2
              WHEN c.keep = 0 THEN 3
              WHEN p.bucket = 'tail' THEN 4
              ELSE 0 END AS stage
  FROM g
  JOIN b ON g.doc_id = b.doc_id
  JOIN c ON g.doc_id = c.doc_id
  JOIN p ON g.doc_id = p.doc_id
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM k),
hist AS (SELECT stage, CAST(count(*) AS BIGINT) AS cnt FROM k GROUP BY 1),
spine AS (SELECT CAST(stage AS INT) AS stage
          FROM UNNEST(range(1, {len(FUNNEL_STAGES) + 1})) t(stage)),
h AS (SELECT s.stage, CAST(coalesce(hist.cnt, 0) AS BIGINT) AS n_killed
      FROM spine s LEFT JOIN hist ON s.stage = hist.stage),
o AS (SELECT stage, n_killed,
             CAST(coalesce(sum(n_killed) OVER (ORDER BY stage
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS before
      FROM h)
SELECT stage, {_FUNNEL_NAME_CASE} AS stage_name,
       CAST(n_total - before AS BIGINT) AS n_in,
       n_killed,
       CASE WHEN n_total - before = 0 THEN 0
            ELSE (n_total - before - n_killed) * 1000000
                   // (n_total - before) END AS survive_ppm
FROM o, tot
"""


# --------------------------------------------------------------------------
# bpe_train — one distributed iteration of byte-pair-encoding merge
# learning (Sennrich et al. 2016): count adjacent symbol pairs across
# the corpus and rank the merge candidates.  Production BPE training is
# a driver loop over exactly this step (count pairs → pick argmax →
# apply merge → recount), the same one-distributed-update-per-iteration
# shape as kmeans_update; bpe_encode above consumes the learned table.
#
# Scale shape (100 TB): the classic compression — aggregate the corpus
# to its unique-word frequency table FIRST (partial-agg groupBy; the
# word table is vocabulary-sized, not corpus-sized), then pair-count
# over unique words weighted by frequency.  The pair table is bounded
# by symbol-vocab², not corpus size, so the final ranking window runs
# over at most a few thousand rows.
# --------------------------------------------------------------------------

BPE_TRAIN_TOPK = 16


def bpe_train(spark, sf_dir):
    d = _docs(spark, sf_dir)
    words = (
        d.select(F.explode(toks(F.lower(F.col("text")))).alias("w"))
        # \z, not $: Java's non-MULTILINE $ also matches just before a
        # trailing newline, which full-match semantics (the DuckDB
        # regexp_full_match oracle) do not — a token like 'abc\n'
        # would desync the engines
        .filter(F.col("w").rlike(r"^[a-z][a-z]+\z"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    # adjacent char pairs per unique word: explode positions then
    # substr of the bound word column — a pure flat-map, and each
    # substr is O(1) per element (CLAUDE.md HOF rule)
    pos = words.select(
        "w",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
    )
    pc = (
        pos.select(
            F.expr("substr(w, i, 1)").alias("left"),
            F.expr("substr(w, i + 1, 1)").alias("right"),
            "freq",
        )
        .groupBy("left", "right")
        .agg(F.sum("freq").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("left"), F.asc("right"))
    return (
        pc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BPE_TRAIN_TOPK)
        .select("rank", "left", "right", "cnt")
    )


SQL_BPE_TRAIN = f"""
WITH words AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE regexp_full_match(w, '[a-z][a-z]+')
  GROUP BY w
),
pos AS (
  SELECT w, freq, unnest(range(1, len(w))) AS i FROM words
),
pc AS (
  SELECT w[i:i] AS "left", w[i+1:i+1] AS "right",
         CAST(sum(freq) AS BIGINT) AS cnt
  FROM pos GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY cnt DESC, "left", "right") AS INT)
         AS rank,
       "left", "right", cnt
FROM pc
QUALIFY rank <= {BPE_TRAIN_TOPK}
"""


# --------------------------------------------------------------------------
# winnow_fingerprint — winnowing document fingerprints (Schleimer,
# Wilkerson & Aiken 2003 — the MOSS algorithm): hash every K-token
# k-gram, slide a W-hash window over the hash sequence, select the
# minimum hash of each window (rightmost occurrence on ties), distinct
# the (position, hash) selections.  The winnowing guarantee: any shared
# run of >= W+K-1 tokens across two documents yields at least one
# SHARED fingerprint, and selection is position-local (an edit only
# perturbs fingerprints within W windows of it) — unlike "hash % p ==
# 0" sampling, whose density drifts with content.  The fingerprint
# relation is the candidate-generation key for copy detection: join
# docs on fp exactly like dedup_minhash_lsh joins on band keys.
#
# Scale shape (100 TB): entirely per-row array expressions — tokens
# and the gram-hash array each bound as named columns in their own
# projection BEFORE any lambda reads them (the CLAUDE.md HOF rule;
# same chain as dedup._with_minhash, pinned linear by the mega-doc
# canary test), so the whole op is O(n·W) per doc with zero Exchange
# (plan-audited).  W is the density dial: expected fingerprint density
# is 2/(W+1) of positions.
# --------------------------------------------------------------------------

WINNOW_K = 3  # tokens per k-gram (the shingle slice convention)
WINNOW_W = 4  # hashes per winnowing window


def winnow_fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("_tk") - (WINNOW_K - 1), F.lit(1))),
        lambda i: md5i60(F.concat_ws(" ", F.slice(F.col("_tk"), i, WINNOW_K))),
    )
    h = d.select("doc_id", gram_hashes.alias("_hs"))

    def _select(i):
        sl = F.slice(F.col("_hs"), i, WINNOW_W)
        mn = F.array_min(sl)
        # rightmost occurrence of the window minimum = first position
        # in the reversed window, mirrored verbatim by the oracle
        rpos = F.size(sl) - F.array_position(F.reverse(sl), mn)
        return F.struct((i + rpos).cast("int").alias("pos"), mn.alias("fp"))

    sel = h.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(
                    F.lit(1), F.greatest(F.size("_hs") - (WINNOW_W - 1), F.lit(1))
                ),
                _select,
            )
        ).alias("fps"),
    )
    return sel.select("doc_id", F.explode("fps").alias("u")).select(
        "doc_id", "u.pos", "u.fp"
    )


# DuckDB 1.0 has no list_distinct over structs (histogram-backed), so
# the oracle distincts relationally after unnest — same set either way
_WIN_SL = f"hs[i:i+{WINNOW_W - 1}]"
_WIN_GRAM = DUCK_MD5I60.format(
    x=f"array_to_string(tk[i:i+{WINNOW_K - 1}], ' ')"
)

SQL_WINNOW_FINGERPRINT = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(tk) - {WINNOW_K - 1}, 1) + 1),
                        i -> {_WIN_GRAM}) AS hs
  FROM t
),
sel AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(hs) - {WINNOW_W - 1}, 1) + 1),
           i -> struct_pack(
             pos := i + (len({_WIN_SL})
                         - list_position(list_reverse({_WIN_SL}),
                                         list_min({_WIN_SL}))),
             fp := list_min({_WIN_SL}))) AS fps
  FROM h
)
SELECT DISTINCT doc_id, CAST(u.pos AS INT) AS pos, u.fp AS fp
FROM (SELECT doc_id, unnest(fps) AS u FROM sel)
"""


# --------------------------------------------------------------------------
# bleu_stats — per-document BLEU sufficient statistics (Papineni et al.
# 2002): for n = 1..4, CLIPPED n-gram matches (each candidate gram type
# credits at most its reference count — the modified-precision rule
# that kills "the the the"), raw (unclipped) matches, and the candidate
# gram total.  This is exactly the decomposition distributed eval uses
# (sacrebleu's corpus BLEU sums per-segment counts, then applies the
# precision product + brevity penalty ONCE at the end) — so the per-doc
# relation here is the partial-aggregable form: corpus BLEU = a
# constant-size rollup over it, and the float exp/log happens on 4
# numbers at the driver, never per row.  The driver corpus carries no
# paired eval data, so candidate/reference are synthesized
# deterministically as two overlapping token windows of each document
# (offset BLEU_REF_OFF, width BLEU_WIN): guaranteed-high but imperfect
# overlap, and natural token repetition exercises the clipping rule
# (pinned by pytest).
#
# Scale shape (100 TB): entirely per-row array expressions — windows
# and every n-gram array bound as named columns BEFORE any lambda reads
# them (the CLAUDE.md HOF rule), nested least/filter counting is
# O(W^2) with W = BLEU_WIN constant; zero Exchange (plan-audited).
# --------------------------------------------------------------------------

BLEU_MAX_N = 4
BLEU_WIN = 40  # candidate/reference window width (the per-row cost cap)
BLEU_REF_OFF = 3  # reference window starts this many tokens later
BLEU_MIN_TOKENS = 8  # below this the n=4 reference side vanishes


def _ngrams_mult(tok_col, n: int):
    """All adjacent n-grams WITH multiplicity (unlike shingles: no
    distinct, no short-doc degenerate — callers must filter to
    len >= n).  Callers must bind `tok_col` as a named column first."""
    return F.transform(
        F.sequence(F.lit(1), F.size(tok_col) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(tok_col, i, n)),
    )


def bleu_stats(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", toks(F.col("text")).alias("_tk"))
    w = d.filter(F.size("_tk") >= BLEU_MIN_TOKENS).select(
        "doc_id",
        F.slice(F.col("_tk"), 1, BLEU_WIN).alias("cand"),
        F.slice(F.col("_tk"), 1 + BLEU_REF_OFF, BLEU_WIN).alias("ref"),
    )
    ns = range(1, BLEU_MAX_N + 1)
    g = w.select(
        "doc_id",
        *[_ngrams_mult(F.col("cand"), n).alias(f"_c{n}") for n in ns],
        *[_ngrams_mult(F.col("ref"), n).alias(f"_r{n}") for n in ns],
    )
    def _stat(n):
        # per-n closure scope: pyspark's HOF builder introspects lambda
        # arity, so captures must come from the enclosing function, not
        # default args
        c, r = F.col(f"_c{n}"), F.col(f"_r{n}")
        clip = F.aggregate(
            F.array_distinct(c),  # argument position: evaluates once
            F.lit(0).cast("bigint"),
            lambda acc, gr: acc
            + F.least(
                F.size(F.filter(c, lambda x: x == gr)),
                F.size(F.filter(r, lambda x: x == gr)),
            ).cast("bigint"),
        )
        raw = F.size(F.filter(c, lambda x: F.array_contains(r, x))).cast(
            "bigint"
        )
        return F.struct(
            F.lit(n).cast("int").alias("n"),
            clip.alias("clip_matches"),
            raw.alias("raw_matches"),
            F.size(c).cast("bigint").alias("cand_total"),
        )

    return g.select(
        "doc_id", F.explode(F.array(*[_stat(n) for n in ns])).alias("s")
    ).select(
        "doc_id", "s.n", "s.clip_matches", "s.raw_matches", "s.cand_total"
    )


def _duck_ngrams_mult(l: str, n: int) -> str:
    """DuckDB mirror of ``_ngrams_mult`` (1-based inclusive slicing)."""
    return (
        f"list_transform(range(1, len({l}) - {n - 1} + 1), "
        f"i -> array_to_string({l}[i:i+{n - 1}], ' '))"
    )


def _sql_bleu_stats() -> str:
    # the oracle is deliberately RELATIONAL (explode + group + left
    # join) where Spark counts inside per-row lambdas — two genuinely
    # independent computations of the same clipping rule
    blocks, unions = [], []
    for n in range(1, BLEU_MAX_N + 1):
        blocks.append(
            f"""cc{n} AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({_duck_ngrams_mult('cand', n)}) AS g FROM w)
  GROUP BY 1, 2),
rc{n} AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({_duck_ngrams_mult('ref', n)}) AS g FROM w)
  GROUP BY 1, 2),
m{n} AS (
  SELECT doc_id, CAST({n} AS INT) AS n,
         CAST(sum(least(cc.c, coalesce(rc.c, 0))) AS BIGINT) AS clip_matches,
         CAST(sum(CASE WHEN rc.c IS NOT NULL THEN cc.c ELSE 0 END) AS BIGINT)
           AS raw_matches,
         CAST(sum(cc.c) AS BIGINT) AS cand_total
  FROM cc{n} cc LEFT JOIN rc{n} rc USING (doc_id, g)
  GROUP BY 1)"""
        )
        unions.append(f"SELECT * FROM m{n}")
    return (
        f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
w AS (SELECT doc_id, tk[1:{BLEU_WIN}] AS cand,
             tk[{1 + BLEU_REF_OFF}:{BLEU_REF_OFF + BLEU_WIN}] AS ref
      FROM d WHERE len(tk) >= {BLEU_MIN_TOKENS}),
"""
        + ",\n".join(blocks)
        + "\n"
        + "\nUNION ALL\n".join(unions)
    )


SQL_BLEU_STATS = _sql_bleu_stats()


# --------------------------------------------------------------------------
# code_detect — code-vs-prose classification (The Stack / StarCoder
# corpus assembly, and the "code fraction" dial every pretraining mix
# tunes): score each document on three independent character/line/
# keyword signals and vote.  The driver corpus is symbol-free word
# soup, so (decontaminate_ngram precedent) a code-shaped variant is
# synthesized deterministically from every (doc_id % CODE_MOD ==
# CODE_REM) document — its first CODE_NWORDS words rendered as an
# indented assignment body under a `def main():` header — and the
# corpus under test is the union.  What is verified cross-engine is
# the detection mechanism: symbol density, indented-line fraction,
# and keyword hits, with a 2-of-3 vote.
#
# Integer discipline: both ppm ratios are PER-DOCUMENT (numerator
# <= chars-per-doc * 1e6 — a 1 GB single doc is still only 1e15,
# far inside bigint), so no quotient staging is needed; `div`/`//`
# agree on the non-negative operands.
#
# Scale shape (100 TB): ONE narrow pass — the union is two
# projections of the same scan, every signal is a per-row JVM
# expression (regexp counts, one bounded HOF over the line array),
# no Exchange, no Python, no join (plan-audited).  All lambdas
# touch only their lambda var; arrays enter HOFs in argument
# position (evaluated once — the CLAUDE.md HOF rule).
# --------------------------------------------------------------------------

CODE_MOD = 17
CODE_REM = 4
CODE_OFFSET = 300_000
CODE_NWORDS = 12
CODE_KEYWORDS_RE = r"\bdef\b|\breturn\b|\bimport\b|\bclass\b|\bvoid\b"
CODE_SYM_MIN_PPM = 20_000  # >= 2% of chars are code symbols
CODE_INDENT_MIN_PPM = 250_000  # >= 25% of lines indented
CODE_KW_MIN = 1
CODE_VOTES_MIN = 2  # 2-of-3 signals


def _code_variant_text():
    """The synthesized code rendering of a document: first
    CODE_NWORDS words as `    {w} = call({w});` lines under a
    `def main():` header."""
    w = F.slice(F.split(F.col("text"), " "), 1, CODE_NWORDS)
    line = lambda x: F.concat(  # noqa: E731
        F.lit("    "), x, F.lit(" = call("), x, F.lit(");")
    )
    return F.concat(
        F.lit("def main():\n"), F.array_join(F.transform(w, line), "\n")
    )


def code_detect(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    coded = d.filter(F.col("doc_id") % CODE_MOD == CODE_REM).select(
        (F.col("doc_id") + CODE_OFFSET).alias("doc_id"),
        _code_variant_text().alias("text"),
    )
    corpus = d.unionByName(coded)
    n_chars = F.length("text")
    sym = n_chars - F.length(F.regexp_replace("text", r"[(){};=:#<>]", ""))
    lines = F.split(F.col("text"), "\n")
    ind = F.size(F.filter(lines, lambda ln: ln.startswith("    ")))
    kw = F.size(F.regexp_extract_all("text", F.lit(CODE_KEYWORDS_RE), F.lit(0)))
    s = corpus.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        sym.cast("bigint").alias("sym"),
        F.size(lines).cast("bigint").alias("n_lines"),
        ind.cast("bigint").alias("ind"),
        kw.cast("int").alias("kw_hits"),
    )
    sym_ppm = F.expr(
        "CASE WHEN n_chars > 0 THEN sym * 1000000 div n_chars ELSE 0 END"
    )
    ind_ppm = F.expr("ind * 1000000 div n_lines")  # split() is never empty
    out = s.select(
        "doc_id",
        sym_ppm.alias("sym_ppm"),
        ind_ppm.alias("indent_ppm"),
        "kw_hits",
    )
    votes = (
        (F.col("sym_ppm") >= CODE_SYM_MIN_PPM).cast("int")
        + (F.col("indent_ppm") >= CODE_INDENT_MIN_PPM).cast("int")
        + (F.col("kw_hits") >= CODE_KW_MIN).cast("int")
    )
    return out.withColumn(
        "is_code", (votes >= CODE_VOTES_MIN).cast("int")
    )


SQL_CODE_DETECT = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {CODE_OFFSET},
         'def main():' || chr(10) || array_to_string(
           list_transform(string_split(text, ' ')[1:{CODE_NWORDS}],
                          w -> '    ' || w || ' = call(' || w || ');'),
           chr(10))
  FROM documents WHERE doc_id % {CODE_MOD} = {CODE_REM}
),
s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(regexp_replace(text, '[(){{}};=:#<>]', '', 'g'))
              AS BIGINT) AS sym,
         CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
         CAST(len(list_filter(string_split(text, chr(10)),
                              l -> l LIKE '    %')) AS BIGINT) AS ind,
         CAST(len(regexp_extract_all(text, '{CODE_KEYWORDS_RE}')) AS INT)
           AS kw_hits
  FROM corpus
),
p AS (
  SELECT doc_id,
         CASE WHEN n_chars > 0 THEN sym * 1000000 // n_chars ELSE 0 END
           AS sym_ppm,
         ind * 1000000 // n_lines AS indent_ppm,
         kw_hits
  FROM s
)
SELECT doc_id, sym_ppm, indent_ppm, kw_hits,
       CASE WHEN (CASE WHEN sym_ppm >= {CODE_SYM_MIN_PPM} THEN 1 ELSE 0 END)
               + (CASE WHEN indent_ppm >= {CODE_INDENT_MIN_PPM} THEN 1 ELSE 0 END)
               + (CASE WHEN kw_hits >= {CODE_KW_MIN} THEN 1 ELSE 0 END)
              >= {CODE_VOTES_MIN}
            THEN 1 ELSE 0 END AS is_code
FROM p
"""


# --------------------------------------------------------------------------
# ocr_garble — OCR-corruption / character-damage detection, the doc-
# quality gate specific to PDF-heavy pipelines (this engine's own
# upstream): scanned-PDF text arrives with classic OCR confusions
# (o→0, l→1, e→3, a→@) that word-level quality rules never see.
# Three character-grain signals vote 2-of-3: letter↔digit-mix tokens,
# non-[a-z ] character mass, and vowel-free tokens.  The clean driver
# corpus gets deterministic damaged variants — every (doc_id %
# GARBLE_MOD == GARBLE_REM) document re-emitted through the confusion
# `translate` — so the vote has both classes to separate (the
# decontaminate_ngram / code_detect synthesis precedent).
#
# Per-token regexes inside the HOF lambdas touch ONLY the lambda var
# (O(len(token)) per element); the token array enters in argument
# position (evaluated once — the CLAUDE.md HOF rule).  Ratios are
# per-document integer ppm: numerators <= per-doc counts * 1e6, far
# inside bigint, `div`/`//` agree on non-negative operands.
#
# Scale shape (100 TB): ONE narrow pass over the two-projection
# union — zero Exchange, zero Python, zero join (plan-audited).
# --------------------------------------------------------------------------

GARBLE_MOD = 19
GARBLE_REM = 7
GARBLE_OFFSET = 400_000
GARBLE_FROM = "aeilo"
GARBLE_TO = "@3110"
GARBLE_MIX_RE = "[a-z][0-9@]|[0-9@][a-z]"
GARBLE_MIX_MIN_PPM = 100_000  # >= 10% of tokens mix letters and digits
GARBLE_NONALPHA_MIN_PPM = 50_000  # >= 5% of chars outside [a-z ]
GARBLE_VOWELFREE_MIN_PPM = 500_000  # >= 50% of tokens have no vowel
GARBLE_VOTES_MIN = 2  # 2-of-3 signals


def ocr_garble(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    damaged = d.filter(F.col("doc_id") % GARBLE_MOD == GARBLE_REM).select(
        (F.col("doc_id") + GARBLE_OFFSET).alias("doc_id"),
        F.translate("text", GARBLE_FROM, GARBLE_TO).alias("text"),
    )
    corpus = d.unionByName(damaged)
    tk = F.split(F.col("text"), " ")
    n_chars = F.length("text")
    nonalpha = n_chars - F.length(F.regexp_replace("text", "[^a-z ]", ""))
    mixed = F.size(F.filter(tk, lambda t: t.rlike(GARBLE_MIX_RE)))
    vfree = F.size(F.filter(tk, lambda t: ~t.rlike("[aeiou]")))
    s = corpus.select(
        "doc_id",
        n_chars.cast("bigint").alias("n_chars"),
        nonalpha.cast("bigint").alias("nonalpha"),
        F.size(tk).cast("bigint").alias("n_tokens"),
        mixed.cast("bigint").alias("mixed"),
        vfree.cast("bigint").alias("vfree"),
    )
    out = s.select(
        "doc_id",
        F.expr("mixed * 1000000 div n_tokens").alias("mixed_ppm"),
        F.expr(
            "CASE WHEN n_chars > 0 THEN nonalpha * 1000000 div n_chars"
            " ELSE 0 END"
        ).alias("nonalpha_ppm"),
        F.expr("vfree * 1000000 div n_tokens").alias("vowelfree_ppm"),
    )
    votes = (
        (F.col("mixed_ppm") >= GARBLE_MIX_MIN_PPM).cast("int")
        + (F.col("nonalpha_ppm") >= GARBLE_NONALPHA_MIN_PPM).cast("int")
        + (F.col("vowelfree_ppm") >= GARBLE_VOWELFREE_MIN_PPM).cast("int")
    )
    return out.withColumn(
        "ocr_bad", (votes >= GARBLE_VOTES_MIN).cast("int")
    )


SQL_OCR_GARBLE = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {GARBLE_OFFSET},
         translate(text, '{GARBLE_FROM}', '{GARBLE_TO}')
  FROM documents WHERE doc_id % {GARBLE_MOD} = {GARBLE_REM}
),
s AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[^a-z ]', '', 'g'))
              AS BIGINT) AS nonalpha,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> regexp_matches(t, '{GARBLE_MIX_RE}')))
              AS BIGINT) AS mixed,
         CAST(len(list_filter(string_split(text, ' '),
                              t -> NOT regexp_matches(t, '[aeiou]')))
              AS BIGINT) AS vfree
  FROM corpus
),
p AS (
  SELECT doc_id,
         mixed * 1000000 // n_tokens AS mixed_ppm,
         CASE WHEN n_chars > 0 THEN nonalpha * 1000000 // n_chars
              ELSE 0 END AS nonalpha_ppm,
         vfree * 1000000 // n_tokens AS vowelfree_ppm
  FROM s
)
SELECT doc_id, mixed_ppm, nonalpha_ppm, vowelfree_ppm,
       CASE WHEN (CASE WHEN mixed_ppm >= {GARBLE_MIX_MIN_PPM}
                       THEN 1 ELSE 0 END)
               + (CASE WHEN nonalpha_ppm >= {GARBLE_NONALPHA_MIN_PPM}
                       THEN 1 ELSE 0 END)
               + (CASE WHEN vowelfree_ppm >= {GARBLE_VOWELFREE_MIN_PPM}
                       THEN 1 ELSE 0 END)
              >= {GARBLE_VOTES_MIN}
            THEN 1 ELSE 0 END AS ocr_bad
FROM p
"""


# --------------------------------------------------------------------------
# mojibake_fix — encoding-damage detection and repair (the ftfy stage
# of web-corpus cleaning): UTF-8 text decoded as Latin-1 somewhere in
# a crawl/ETL hop turns every accented character into a 2-character
# digraph ('á' → 'Ã¡', 'é' → 'Ã©', 'ñ' → 'Ã±') — the single most
# common encoding pathology in CommonCrawl-scale corpora.  The repair
# is the exact inverse: a chained literal replace of each canonical
# digraph back to its intended code point.  The digraphs are chosen
# non-overlapping (all share lead byte 'Ã' with distinct trail
# chars), so left-to-right literal replacement is order-independent
# and both engines produce identical output.
#
# Fixture synthesis (the ocr_garble precedent): the ASCII driver
# corpus gets deterministic damaged variants — every (doc_id %
# MOJI_MOD == MOJI_REM) document re-emitted as its accented
# re-spelling double-encoded (a→Ã¡, e→Ã©, n→Ã±), so the detector has
# both classes and the repair target (the accented single-encoded
# form) is closed-form.  Variant offset clears the largest sf's id
# space (the CLAUDE.md offset rule).
#
# Per-pattern occurrence counts are length-difference quotients
# ((len(x) − len(replace(x,p,''))) div len(p)) — integer-exact, and
# `length()` counts code points in both engines so the non-ASCII
# digraphs measure identically.
#
# Scale shape (100 TB): ONE narrow pass over the two-projection
# union — zero Exchange, zero Python, zero join (plan-audited).
# --------------------------------------------------------------------------

MOJI_MOD = 17
MOJI_REM = 3
# +900000: the next free synthetic-id slot — +100000..+600000 are
# taken (snapshot_diff re-keys at +500000) and recrawl_schedule holds
# +700000/+800000; slot uniqueness keeps synthesized ids attributable
# to their op during debugging (the corpus_prep offset convention)
MOJI_OFFSET = 900_000
# (damaged digraph, intended character, ASCII source in the fixture)
MOJI_PAIRS = [("Ã¡", "á", "a"), ("Ã©", "é", "e"), ("Ã±", "ñ", "n")]


def mojibake_fix(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    damaged_text = F.col("text")
    for bad, _good, src in MOJI_PAIRS:
        damaged_text = F.replace(damaged_text, F.lit(src), F.lit(bad))
    damaged = d.filter(F.col("doc_id") % MOJI_MOD == MOJI_REM).select(
        (F.col("doc_id") + MOJI_OFFSET).alias("doc_id"),
        damaged_text.alias("text"),
    )
    corpus = d.unionByName(damaged)
    counts = []
    for i, (bad, _good, _src) in enumerate(MOJI_PAIRS):
        counts.append(
            (
                (
                    F.length("text")
                    - F.length(F.replace(F.col("text"), F.lit(bad)))
                )
                / F.lit(len(bad))
            )
            .cast("bigint")
            .alias(f"_c{i}")
        )
    fixed = F.col("text")
    for bad, good, _src in MOJI_PAIRS:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    s = corpus.select("doc_id", "text", *counts, fixed.alias("text_fixed"))
    total = None
    for i in range(len(MOJI_PAIRS)):
        c = F.col(f"_c{i}")
        total = c if total is None else total + c
    return s.select(
        "doc_id",
        total.cast("bigint").alias("n_moji"),
        (total > 0).cast("int").alias("moji_bad"),
        "text_fixed",
    )


def _sql_mojibake() -> str:
    dmg = "text"
    for bad, _good, src in MOJI_PAIRS:
        dmg = f"replace({dmg}, '{src}', '{bad}')"
    fixed = "text"
    for bad, good, _src in MOJI_PAIRS:
        fixed = f"replace({fixed}, '{bad}', '{good}')"
    counts = " + ".join(
        f"((length(text) - length(replace(text, '{bad}', ''))) // {len(bad)})"
        for bad, _good, _src in MOJI_PAIRS
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {MOJI_OFFSET}, {dmg}
  FROM documents WHERE doc_id % {MOJI_MOD} = {MOJI_REM}
)
SELECT doc_id,
       CAST({counts} AS BIGINT) AS n_moji,
       CASE WHEN {counts} > 0 THEN 1 ELSE 0 END AS moji_bad,
       {fixed} AS text_fixed
FROM corpus
"""


SQL_MOJIBAKE = _sql_mojibake()


# --------------------------------------------------------------------------
# dist_drift — corpus-refresh drift telemetry: the top-K tokens whose
# relative frequency moved most between two crawl snapshots (every
# production corpus refresh ships next to exactly this dashboard —
# distribution drift is how template floods, spam waves, and encoding
# regressions get caught before a training run eats them).  Snapshot B
# is the SAME deterministic mutation snapshot_diff/scd2_history use
# (`_snapshot_b`, single-sourced), so the drift report can never
# disagree with the CDC ops about what changed; its injected `new` /
# `rev2` tokens must surface at the top of the report with a_ppm = 0.
#
# Bigint headroom (the vocab_coverage rule): per-token counts are
# corpus-grain (~2.5e13 tokens at 100 TB), so cnt * 1e6 would wrap
# bigint with divergent engine failures — both frequency ratios go
# through the exact quotient/remainder staging of _ppm_exact.
#
# Scale shape (100 TB): per-side token counts partial-aggregate
# map-side before ONE vocabulary-grain Exchange each (vocabulary ≪
# corpus), then checkpoint before their two-consumer fan-out so the
# corpus tokenizes exactly once per side (plan-audited: zero raw
# scans downstream); totals are 1-row condition-free broadcast
# crosses over the checkpointed counts (the semantic_pack
# convention); the full-outer join is vocabulary-sized; the top-K is
# distributed (TakeOrderedAndProject — never a global sort); the
# only Window ranks the K survivors (plan-audited).
# --------------------------------------------------------------------------

DRIFT_TOPK = 20


def dist_drift(spark, sf_dir):
    from .dedup import _snapshot_b

    a = _docs(spark, sf_dir).select("doc_id", "text")
    b = _snapshot_b(a)

    def freq(side, col):
        t = side.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        # the vocabulary-grain count table feeds TWO consumers (the
        # frequency projection and the side total), and each reference
        # replans from the raw scan — without materialization the
        # tokenize+explode pass, the op's dominant cost, runs twice
        # per side (measured: 6 parquet scans vs 0 after; the
        # dedup_minhash_lsh multi-branch-reuse precedent).  The
        # checkpointed table is vocabulary-sized, not corpus-sized.
        cnt = (
            t.groupBy("token")
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .localCheckpoint()
        )
        # the side's token total is the sum of the counts just built —
        # re-aggregating `t` would re-scan and re-explode the corpus
        tot = cnt.agg(F.sum("cnt").alias("tot"))
        return cnt.crossJoin(F.broadcast(tot)).select(
            "token", F.expr(_ppm_exact("cnt", "tot", "div")).alias(col)
        )

    j = (
        freq(a, "a_ppm")
        .join(freq(b, "b_ppm"), "token", "full_outer")
        .select(
            "token",
            F.coalesce("a_ppm", F.lit(0)).alias("a_ppm"),
            F.coalesce("b_ppm", F.lit(0)).alias("b_ppm"),
        )
        .withColumn("drift_ppm", F.abs(F.col("a_ppm") - F.col("b_ppm")))
    )
    top = j.orderBy(F.desc("drift_ppm"), F.asc("token")).limit(DRIFT_TOPK)
    w = Window.orderBy(F.desc("drift_ppm"), F.asc("token"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def _sql_dist_drift() -> str:
    from .dedup import _DUCK_SNAPSHOT_B

    return f"""
WITH a AS (SELECT doc_id, text FROM documents),
b AS ({_DUCK_SNAPSHOT_B}),
ta AS (SELECT unnest(string_split(text, ' ')) AS token FROM a),
tb AS (SELECT unnest(string_split(text, ' ')) AS token FROM b),
ca AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM ta GROUP BY 1),
cb AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tb GROUP BY 1),
na AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM ca),
nb AS (SELECT CAST(sum(cnt) AS BIGINT) AS tot FROM cb),
fa AS (SELECT token, {_ppm_exact('cnt', 'tot', '//')} AS a_ppm FROM ca, na),
fb AS (SELECT token, {_ppm_exact('cnt', 'tot', '//')} AS b_ppm FROM cb, nb),
j AS (
  SELECT coalesce(fa.token, fb.token) AS token,
         coalesce(a_ppm, 0) AS a_ppm,
         coalesce(b_ppm, 0) AS b_ppm,
         abs(coalesce(a_ppm, 0) - coalesce(b_ppm, 0)) AS drift_ppm
  FROM fa FULL OUTER JOIN fb ON fa.token = fb.token
)
SELECT token, a_ppm, b_ppm, drift_ppm,
       CAST(row_number() OVER (ORDER BY drift_ppm DESC, token) AS INT) AS rank
FROM j
ORDER BY drift_ppm DESC, token
LIMIT {DRIFT_TOPK}
"""


SQL_DIST_DRIFT = _sql_dist_drift()


# --------------------------------------------------------------------------
# colloc_dice — collocation / phrase mining via the Dice association
# score 2·c(ab) / (c(a) + c(b)) (Smadja 1993; the count-based score
# family word2vec's phrase detection ships — chosen over PMI because
# it is a ratio of INTEGER counts, so the whole statistic stays in
# exact bigint ppm cross-engine where PMI's log would reopen the
# float-association trap).  Candidate phrases = adjacent-token
# bigrams with multiplicity (the shared `bigrams` builder; degenerate
# single-token rows from 1-token docs are filtered), floor-gated at
# COLLOC_MIN_COUNT occurrences (word2vec's min_count), top-K by Dice.
#
# Bigint headroom: c(ab) is corpus-grain (~2.5e13 at 100 TB) so
# 2·c_ab·1e6 would wrap — the ratio goes through _ppm_exact.
#
# Scale shape (100 TB): bigram and unigram counts partial-aggregate
# map-side into vocabulary-grain Exchanges; the unigram table is
# checkpointed before its two-consumer fan-out (c_a and c_b joins —
# each reference would otherwise replan the corpus explode; the
# dist_drift precedent), so the final plan holds ONE raw scan (the
# bigram side, plan-audited); the scoring joins are vocabulary-grain;
# the top-K is distributed (TakeOrderedAndProject) and the only
# Window ranks the K survivors.
# --------------------------------------------------------------------------

COLLOC_MIN_COUNT = 5
COLLOC_TOPK = 20


def colloc_dice(spark, sf_dir):
    t = _docs(spark, sf_dir).select(toks(F.col("text")).alias("_tk"))
    bg = t.select(F.explode(bigrams(F.col("_tk"))).alias("bigram")).filter(
        F.size(F.split(F.col("bigram"), " ")) == 2
    )
    cb = (
        bg.groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("c_ab"))
        .filter(F.col("c_ab") >= COLLOC_MIN_COUNT)
    )
    cu = (
        t.select(F.explode("_tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
        .localCheckpoint()
    )
    j = (
        cb.withColumn("w1", F.split("bigram", " ").getItem(0))
        .withColumn("w2", F.split("bigram", " ").getItem(1))
        .join(cu.select(F.col("w").alias("w1"), F.col("c").alias("c_a")), "w1")
        .join(cu.select(F.col("w").alias("w2"), F.col("c").alias("c_b")), "w2")
    )
    scored = j.select(
        "bigram",
        "c_ab",
        "c_a",
        "c_b",
        F.expr(
            _ppm_exact("(2 * c_ab)", "(c_a + c_b)", "div")
        ).alias("dice_ppm"),
    )
    top = scored.orderBy(F.desc("dice_ppm"), F.asc("bigram")).limit(
        COLLOC_TOPK
    )
    w = Window.orderBy(F.desc("dice_ppm"), F.asc("bigram"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


SQL_COLLOC_DICE = f"""
WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
bg AS (SELECT unnest({duck_bigrams('tk')}) AS bigram FROM t),
cb AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab
  FROM bg WHERE len(string_split(bigram, ' ')) = 2
  GROUP BY 1 HAVING count(*) >= {COLLOC_MIN_COUNT}
),
cu AS (
  SELECT w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1
),
j AS (
  SELECT cb.bigram, cb.c_ab, ca.c AS c_a, cbb.c AS c_b
  FROM cb
  JOIN cu ca ON ca.w = string_split(cb.bigram, ' ')[1]
  JOIN cu cbb ON cbb.w = string_split(cb.bigram, ' ')[2]
),
s AS (
  SELECT bigram, c_ab, c_a, c_b,
         {_ppm_exact('(2 * c_ab)', '(c_a + c_b)', '//')} AS dice_ppm
  FROM j
)
SELECT bigram, c_ab, c_a, c_b, dice_ppm,
       CAST(row_number() OVER (ORDER BY dice_ppm DESC, bigram) AS INT)
         AS rank
FROM s
ORDER BY dice_ppm DESC, bigram
LIMIT {COLLOC_TOPK}
"""


# --------------------------------------------------------------------------
# slop_filter — model-generated-boilerplate detection (the modern
# curation gate: post-2023 crawls carry LLM output, and training on
# it degrades models — "self-consuming" contamination; production
# pipelines now screen for assistant-register phrases the way C4
# screened for lorem ipsum).  Detection = occurrence counts of a
# fixed phrase list over lowercased text via the length-difference
# quotient (the mojibake idiom — exact integers, no regex engine
# variance), flag at SLOP_MIN_HITS+ distinct-phrase families or any
# hard marker.  Phrases are matched on the LOWERCASED text so casing
# variants collapse (lower() is ASCII-stable cross-engine; the
# fixture is ASCII — the dup_verify_edit byte-vs-char rule).
#
# Markers are injected deterministically by doc-id residue (the
# license_detect precedent): hard refusal boilerplate, hedging
# closers, and double markers, so the hit-count gate and both
# verdicts fire; the GENERIC detector never sees the residue rule.
#
# Scale shape (100 TB): one narrow pass — zero Exchange, zero join,
# zero python (plan-audited).  At scale the phrase list is a few
# hundred literals: still a single fused projection, no broadcast
# needed because the list compiles into the plan.
# --------------------------------------------------------------------------

SLOP_PHRASES = [
    "as an ai language model",
    "i cannot assist with that",
    "certainly! here is",
    "i hope this helps",
    "it is important to note that",
]
SLOP_MOD = 13  # residues 1..6 pick injected marker combinations
SLOP_MIN_HITS = 2  # soft phrases flag only in combination


def _slop_corpus(spark, sf_dir):
    """documents with assistant-register markers appended by residue:
    1..5 → phrase i appended once; 6 → phrases 4+5 appended (the
    combination case that trips the SLOP_MIN_HITS gate)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    marker = F.lit("")
    for i, p in enumerate(SLOP_PHRASES):
        marker = F.when(
            F.col("doc_id") % SLOP_MOD == i + 1, F.lit(" " + p.capitalize())
        ).otherwise(marker)
    marker = F.when(
        F.col("doc_id") % SLOP_MOD == len(SLOP_PHRASES) + 1,
        F.lit(" " + SLOP_PHRASES[3] + ". " + SLOP_PHRASES[4]),
    ).otherwise(marker)
    return d.select("doc_id", F.concat("text", marker).alias("text"))


def slop_filter(spark, sf_dir):
    c = _slop_corpus(spark, sf_dir)
    low = F.lower(F.col("text"))
    c = c.select("doc_id", low.alias("_low"))
    counts = [
        (
            (
                F.length("_low")
                - F.length(F.replace(F.col("_low"), F.lit(p)))
            )
            / F.lit(len(p))
        )
        .cast("bigint")
        .alias(f"_c{i}")
        for i, p in enumerate(SLOP_PHRASES)
    ]
    s = c.select("doc_id", *counts)
    total = None
    hard = F.col("_c0") + F.col("_c1")  # refusal markers: one hit flags
    for i in range(len(SLOP_PHRASES)):
        col = F.col(f"_c{i}")
        total = col if total is None else total + col
    return s.select(
        "doc_id",
        total.cast("bigint").alias("n_slop"),
        ((hard > 0) | (total >= SLOP_MIN_HITS)).cast("int").alias("is_slop"),
    )


def _sql_slop() -> str:
    marker = "''"
    for i, p in enumerate(SLOP_PHRASES):
        cap = p[0].upper() + p[1:]
        marker = (
            f"CASE WHEN doc_id % {SLOP_MOD} = {i + 1} "
            f"THEN ' {cap}' ELSE {marker} END"
        )
    combo = SLOP_PHRASES[3] + ". " + SLOP_PHRASES[4]
    marker = (
        f"CASE WHEN doc_id % {SLOP_MOD} = {len(SLOP_PHRASES) + 1} "
        f"THEN ' {combo}' ELSE {marker} END"
    )

    def cnt(p):
        return (
            f"((length(low) - length(replace(low, '{p}', ''))) // {len(p)})"
        )

    total = " + ".join(cnt(p) for p in SLOP_PHRASES)
    hard = " + ".join(cnt(p) for p in SLOP_PHRASES[:2])
    return f"""
WITH c AS (
  SELECT doc_id, lower(text || ({marker})) AS low FROM documents
)
SELECT doc_id,
       CAST({total} AS BIGINT) AS n_slop,
       CASE WHEN ({hard}) > 0 OR ({total}) >= {SLOP_MIN_HITS}
            THEN 1 ELSE 0 END AS is_slop
FROM c
"""


SQL_SLOP_FILTER = _sql_slop()


# --------------------------------------------------------------------------
# entropy_filter — character-entropy corpus gate: Shannon entropy of
# the per-document character distribution, in exact integer
# micro-nats.  The two tails are the two classic garbage classes a
# text-quality stack cannot catch with word rules: NEAR-ZERO entropy
# = degenerate repetition (padding, cursor spam, "aaaa..."), HIGH
# entropy ≈ alphabet-uniform = encoded blobs (base64/hex dumps inside
# scraped pages) whose "words" look fine to length/stopword rules.
#
# Exactness: H = Σ_c (k_c/n)·ln(n/k_c) is float, so each character's
# term is floored to micro-nats with the token-identical tree
# floor(ln(n/k)·k·1e6/n) in both engines (the BM25 association rule)
# and only the integer terms are summed.  Counts come from the
# length-difference idiom (the mojibake precedent) over a fixed
# 37-symbol alphabet literal — one narrow projection, no explode, no
# groupBy, zero Exchange.
#
# Deterministic variants make both flags fire on the all-natural
# fixture: every doc_id % 31 == 6 re-emitted as ~uniform base-36 text
# (md5 chunks through conv(·,16,36) — 36-symbol uniform has
# H = ln 36 ≈ 3.58 nats; natural text sits near 2.8-3.0) at the
# +1_100_000 id slot, and every doc_id % 37 == 9 as a single-char run
# (H = 0) at +1_200_000 (collision-proof offsets — the recrawl rule;
# +1_000_000 is taken by merge_upsert's insert slot).
# --------------------------------------------------------------------------

ENT_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
ENT_LOW_MICRO = 1_000_000  # < 1 nat -> degenerate repetition
ENT_HIGH_MICRO = 3_300_000  # > 3.3 nats -> encoded-blob suspicion
ENT_RND_MOD, ENT_RND_REM, ENT_RND_OFFSET = 31, 6, 1_100_000
ENT_REP_MOD, ENT_REP_REM, ENT_REP_OFFSET = 37, 9, 1_200_000
# 12 chunks ≈ 144 chars: the EMPIRICAL entropy of a small uniform
# sample undershoots ln(36) (singleton bias) — measured at sf0.001:
# 5 chunks bottom out at 3.03 nats (below the gate), 12 chunks at
# 3.38 vs a natural-text max of 2.94 — clean separation either side
# of the 3.3 threshold
ENT_RND_CHUNKS = 12
ENT_REP_LEN = 400


def _ent_term(ch: str) -> str:
    """One character's micro-nat entropy term — shared SQL text for
    both engines (identical float tree)."""
    q = "''" if ch != "'" else "''''"
    k = f"(length(text) - length(replace(text, '{ch}', {q})))"
    return (
        f"CASE WHEN {k} > 0 THEN CAST(floor(ln(n_chars / {k}) * {k}"
        f" * 1000000.0 / n_chars) AS BIGINT) ELSE 0 END"
    )


_ENT_H_EXPR = " + ".join(_ent_term(c) for c in ENT_ALPHABET)


def _ent_spark_rnd():
    chunks = [
        F.lower(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("text"), F.lit(str(k)))), 1, 15
                ),
                16,
                36,
            )
        )
        for k in range(ENT_RND_CHUNKS)
    ]
    return F.concat_ws("", *chunks)


def entropy_filter(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    rnd = d.filter(
        F.col("doc_id") % ENT_RND_MOD == ENT_RND_REM
    ).select(
        (F.col("doc_id") + ENT_RND_OFFSET).alias("doc_id"),
        _ent_spark_rnd().alias("text"),
    )
    rep = d.filter(
        F.col("doc_id") % ENT_REP_MOD == ENT_REP_REM
    ).select(
        (F.col("doc_id") + ENT_REP_OFFSET).alias("doc_id"),
        F.repeat(F.lit("a"), ENT_REP_LEN).alias("text"),
    )
    corpus = d.unionByName(rnd).unionByName(rep)
    s = corpus.select(
        "doc_id", "text", F.length("text").cast("bigint").alias("n_chars")
    )
    return s.select(
        "doc_id",
        "n_chars",
        F.expr(_ENT_H_EXPR).cast("bigint").alias("h_micro"),
    ).select(
        "doc_id",
        "n_chars",
        "h_micro",
        (F.col("h_micro") < ENT_LOW_MICRO).cast("int").alias("flag_low"),
        (F.col("h_micro") > ENT_HIGH_MICRO).cast("int").alias("flag_high"),
    )


def _sql_ent_rnd() -> str:
    chunks = " || ".join(
        "lower(to_base(CAST('0x' || substr(md5(text || '"
        f"{k}'), 1, 15) AS BIGINT), 36))"
        for k in range(ENT_RND_CHUNKS)
    )
    return chunks


SQL_ENTROPY_FILTER = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {ENT_RND_OFFSET}, {_sql_ent_rnd()}
  FROM documents WHERE doc_id % {ENT_RND_MOD} = {ENT_RND_REM}
  UNION ALL
  SELECT doc_id + {ENT_REP_OFFSET}, repeat('a', {ENT_REP_LEN})
  FROM documents WHERE doc_id % {ENT_REP_MOD} = {ENT_REP_REM}
),
s AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n_chars
  FROM corpus
),
h AS (
  SELECT doc_id, n_chars, CAST({_ENT_H_EXPR} AS BIGINT) AS h_micro
  FROM s
)
SELECT doc_id, n_chars, h_micro,
       CAST(CASE WHEN h_micro < {ENT_LOW_MICRO} THEN 1 ELSE 0 END AS INT)
         AS flag_low,
       CAST(CASE WHEN h_micro > {ENT_HIGH_MICRO} THEN 1 ELSE 0 END AS INT)
         AS flag_high
FROM h
"""


# --------------------------------------------------------------------------
# rouge_ngram_stats — ROUGE-1/2 precision/recall/F1 between each
# original document (reference) and its truncated mutant (candidate),
# the recall-oriented complement to bleu_stats' precision view: the
# summary/extraction-quality measure a data pipeline reports when
# comparing an extracted/compressed text against its source.  The
# (ref, cand) pairing is SINGLE-SOURCED from the dedup corpus's
# _mutated builder (oracle mirrors DUCK_MUTATED), so the pairs are the
# same ones the near-dup family ranks.
#
# Determinism: clipped n-gram overlap counts are exact integers (the
# bleu_stats clipping rule); precision/recall are _ppm_exact with a
# greatest(·,1) zero-denominator guard (a fully-truncated <=3-token
# mutant has an EMPTY candidate side — cand_total 0 for n=2, [''] for
# n=1); F1 = (2·p·r) div (p+r) with the 0/0 branch pinned to 0.
#
# Scale shape: the pair spine is the 50-row mutant set (a broadcast
# join against documents), per-pair work is the O(L·distinct) clip
# lambda over bound columns (the HOF rule) — corpus-wide ROUGE would
# ride the BLEU_WIN window cap convention instead.
# --------------------------------------------------------------------------

ROUGE_NS = (1, 2)


def rouge_ngram_stats(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    cand = _mutated(d).select(
        (F.col("doc_id") - 100000).alias("doc_id"),
        F.col("text").alias("ctext"),
    )
    p = (
        d.filter(F.col("doc_id") < 50)
        .join(F.broadcast(cand), "doc_id")
        .select(
            "doc_id",
            toks(F.col("text")).alias("_ref"),
            toks(F.col("ctext")).alias("_cand"),
        )
    )
    g = p.select(
        "doc_id",
        *[_ngrams_mult(F.col("_cand"), n).alias(f"_c{n}") for n in ROUGE_NS],
        *[_ngrams_mult(F.col("_ref"), n).alias(f"_r{n}") for n in ROUGE_NS],
    )

    def _stat(n):
        # bound-column closure per the bleu_stats / HOF rule
        c, r = F.col(f"_c{n}"), F.col(f"_r{n}")
        clip = F.aggregate(
            F.array_distinct(c),
            F.lit(0).cast("bigint"),
            lambda acc, gr: acc
            + F.least(
                F.size(F.filter(c, lambda x: x == gr)),
                F.size(F.filter(r, lambda x: x == gr)),
            ).cast("bigint"),
        )
        return F.struct(
            F.lit(n).cast("int").alias("n"),
            clip.alias("clip_matches"),
            F.size(r).cast("bigint").alias("ref_total"),
            F.size(c).cast("bigint").alias("cand_total"),
        )

    s = g.select(
        "doc_id", F.explode(F.array(*[_stat(n) for n in ROUGE_NS])).alias("s")
    ).select("doc_id", "s.n", "s.clip_matches", "s.ref_total", "s.cand_total")
    pr = s.select(
        "doc_id",
        "n",
        "clip_matches",
        "ref_total",
        "cand_total",
        F.expr(_ppm_exact("clip_matches", "greatest(cand_total, 1L)", "div"))
        .cast("bigint")
        .alias("prec_ppm"),
        F.expr(_ppm_exact("clip_matches", "greatest(ref_total, 1L)", "div"))
        .cast("bigint")
        .alias("recall_ppm"),
    )
    return pr.withColumn(
        "f1_ppm",
        F.expr(
            "CASE WHEN prec_ppm + recall_ppm = 0 THEN 0"
            " ELSE (2 * prec_ppm * recall_ppm) div (prec_ppm + recall_ppm)"
            " END"
        ).cast("bigint"),
    )


def _sql_rouge_stats() -> str:
    # deliberately RELATIONAL (unnest + group + left join) where Spark
    # clips inside per-row lambdas — the bleu_stats two-independent-
    # computations convention
    blocks, unions = [], []
    for n in ROUGE_NS:
        blocks.append(
            f"""cc{n} AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({_duck_ngrams_mult('cand', n)}) AS g FROM p)
  GROUP BY 1, 2),
rc{n} AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({_duck_ngrams_mult('ref', n)}) AS g FROM p)
  GROUP BY 1, 2),
cl{n} AS (
  SELECT doc_id,
         CAST(sum(least(cc.c, coalesce(rc.c, 0))) AS BIGINT) AS clip,
         CAST(sum(cc.c) AS BIGINT) AS ct
  FROM cc{n} cc LEFT JOIN rc{n} rc USING (doc_id, g)
  GROUP BY 1),
rt{n} AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS rt
          FROM rc{n} GROUP BY 1),
m{n} AS (
  SELECT p.doc_id, CAST({n} AS INT) AS n,
         CAST(coalesce(cl.clip, 0) AS BIGINT) AS clip_matches,
         CAST(coalesce(rt.rt, 0) AS BIGINT) AS ref_total,
         CAST(coalesce(cl.ct, 0) AS BIGINT) AS cand_total
  FROM p LEFT JOIN cl{n} cl USING (doc_id)
         LEFT JOIN rt{n} rt USING (doc_id))"""
        )
        unions.append(f"SELECT * FROM m{n}")
    u = "\nUNION ALL\n".join(unions)
    return (
        f"""
WITH m AS ({DUCK_MUTATED}),
p AS (SELECT o.doc_id, string_split(o.text, ' ') AS ref,
             string_split(m.text, ' ') AS cand
      FROM documents o JOIN m ON m.doc_id = o.doc_id + 100000),
"""
        + ",\n".join(blocks)
        + f""",
u AS ({u}),
pr AS (
  SELECT doc_id, n, clip_matches, ref_total, cand_total,
         CAST({_ppm_exact('clip_matches', 'greatest(cand_total, 1)', '//')}
           AS BIGINT) AS prec_ppm,
         CAST({_ppm_exact('clip_matches', 'greatest(ref_total, 1)', '//')}
           AS BIGINT) AS recall_ppm
  FROM u)
SELECT doc_id, n, clip_matches, ref_total, cand_total, prec_ppm, recall_ppm,
       CAST(CASE WHEN prec_ppm + recall_ppm = 0 THEN 0
                 ELSE (2 * prec_ppm * recall_ppm) // (prec_ppm + recall_ppm)
            END AS BIGINT) AS f1_ppm
FROM pr
"""
    )


SQL_ROUGE_NGRAM_STATS = _sql_rouge_stats()


QUERIES = {
    "rouge_ngram_stats": rouge_ngram_stats,
    "entropy_filter": entropy_filter,
    "slop_filter": slop_filter,
    "lang_id_ngram": lang_id_ngram,
    "langid_confusion": langid_confusion,
    "winnow_fingerprint": winnow_fingerprint,
    "lexical_diversity": lexical_diversity,
    "quality_score": quality_score,
    "badword_filter": badword_filter,
    "curate_keep": curate_keep,
    "token_count_bpe": token_count_bpe,
    "readability_fk": readability_fk,
    "doc_fingerprint": doc_fingerprint,
    "gopher_repetition": gopher_repetition,
    "gopher_ngram_flags": gopher_ngram_flags,
    "gopher_quality": gopher_quality,
    "bpe_encode": bpe_encode,
    "quality_classifier": quality_classifier,
    "perplexity_bucket": perplexity_bucket,
    "quality_vote": quality_vote,
    "bpe_train": bpe_train,
    "bleu_stats": bleu_stats,
    "doremi_weights": doremi_weights,
    "filter_funnel": filter_funnel,
    "vocab_coverage": vocab_coverage,
    "bpe_ids": bpe_ids,
    "code_detect": code_detect,
    "mojibake_fix": mojibake_fix,
    "ocr_garble": ocr_garble,
    "dist_drift": dist_drift,
    "colloc_dice": colloc_dice,
}

ORACLE_SQL = {
    "entropy_filter": SQL_ENTROPY_FILTER,
    "slop_filter": SQL_SLOP_FILTER,
    "bleu_stats": SQL_BLEU_STATS,
    "rouge_ngram_stats": SQL_ROUGE_NGRAM_STATS,
    "doremi_weights": SQL_DOREMI_WEIGHTS,
    "filter_funnel": SQL_FILTER_FUNNEL,
    "vocab_coverage": SQL_VOCAB_COVERAGE,
    "bpe_ids": SQL_BPE_IDS,
    "code_detect": SQL_CODE_DETECT,
    "mojibake_fix": SQL_MOJIBAKE,
    "ocr_garble": SQL_OCR_GARBLE,
    "dist_drift": SQL_DIST_DRIFT,
    "colloc_dice": SQL_COLLOC_DICE,
    "lang_id_ngram": SQL_LANG_ID,
    "langid_confusion": SQL_LANGID_CONFUSION,
    "winnow_fingerprint": SQL_WINNOW_FINGERPRINT,
    "lexical_diversity": SQL_LEXICAL_DIVERSITY,
    "quality_score": SQL_QUALITY,
    "token_count_bpe": SQL_TOKEN_COUNT,
    "readability_fk": SQL_READABILITY_FK,
    "doc_fingerprint": SQL_FINGERPRINT,
    "gopher_repetition": SQL_GOPHER_REPETITION,
    "gopher_ngram_flags": SQL_GOPHER_NGRAM_FLAGS,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "badword_filter": SQL_BADWORD_FILTER,
    "curate_keep": SQL_CURATE_KEEP,
    "bpe_encode": SQL_BPE_ENCODE,
    "quality_classifier": SQL_QUALITY_CLASSIFIER,
    "perplexity_bucket": SQL_PERPLEXITY_BUCKET,
    "quality_vote": SQL_QUALITY_VOTE,
    "bpe_train": SQL_BPE_TRAIN,
}
