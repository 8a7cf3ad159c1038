"""Semantic tests for the training-data pipeline operators (dedup,
similarity, text analysis, multimodal plumbing, streaming).  The
cross-engine value equality is covered by tools/verify_queries.py and
the driver's DuckDB gate; these tests pin the *semantics* (near-dups
found, ANN recall, stub behavior, streaming == batch)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# measured mean recall@5 of ann_topk_pq vs brute force on the fixture:
# 0.25 (random unit vectors + a 16-sample codebook are PQ's worst case
# — nothing for the codebook to exploit; a real corpus clusters).  The
# floor is set so an encode/reconstruct regression (wrong slice,
# off-by-one code index), which craters recall to ~TOP_K/N ≈ 0.01,
# fails loudly, while codebook-quality noise does not.
RECALL_FLOOR_PQ = 0.15


def test_minhash_finds_mutated_near_dups(spark):
    from freki_spark.functions.dedup import dedup_minhash_lsh

    rows = dedup_minhash_lsh(spark, SF).collect()
    pairs = {(r.a, r.b): r.est_sim for r in rows}
    # every mutated copy must be caught as a near-dup of its original
    hits = [(a, b) for (a, b) in pairs if b == a + 100000]
    assert len(hits) >= 40  # 50 mutated docs, LSH recall high but not 1.0
    assert all(pairs[p] >= 0.5 for p in hits)


def test_dup_verify_edit_scores_match_python_dp(spark):
    """The verify stage's scoring columns must equal an independent
    python Levenshtein DP over the same common-prefix windows, every
    planted mutant pair must confirm with edit_dist 0 (the mutant is a
    strict prefix of its original, so the shared window is identical),
    and at least one banding collision pair must be rejected — the
    whole point of the confirm stage."""
    from freki_spark.functions.dedup import (
        EDIT_DUP_MIN_PPM,
        EDIT_PREFIX,
        dup_verify_edit,
    )

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (cs != ct),
                    )
                )
            prev = cur
        return prev[-1]

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for d in sorted(texts):
        if d < 50:
            tk = texts[d].split(" ")
            texts[d + 100000] = " ".join(tk[: max(len(tk) - 3, 0)])

    rows = dup_verify_edit(spark, SF).collect()
    assert rows
    rejected = 0
    mutant_pairs = set()
    for r in rows:
        w = min(len(texts[r.a]), len(texts[r.b]), EDIT_PREFIX)
        d = lev(texts[r.a][:w], texts[r.b][:w])
        assert (r.w, r.edit_dist) == (w, d), (r.a, r.b)
        assert r.sim_ppm == (w - d) * 1_000_000 // max(w, 1)
        assert r.is_dup == int(r.sim_ppm >= EDIT_DUP_MIN_PPM)
        if r.b == r.a + 100000:
            mutant_pairs.add(r.a)
            assert r.edit_dist == 0 and r.is_dup == 1
        elif r.is_dup == 0:
            rejected += 1
    assert len(mutant_pairs) >= 40  # LSH recall high but not 1.0
    assert rejected >= 1


def test_dup_verify_levenshtein_parity_on_non_ascii(spark):
    """Spark `levenshtein` counts CHARACTER edits while DuckDB counts
    BYTE edits ('héllo'→'hello' is 1 vs 2 — é is two UTF-8 bytes), so
    the verify stage ASCII-projects both comparison windows first.
    This pins the mechanism: both engines' exact projected
    expressions must agree on adversarial non-ASCII pairs, and the
    unprojected forms must be SHOWN to diverge (the trap is real)."""
    import duckdb

    from pyspark.sql import functions as F

    from freki_spark.functions.dedup import EDIT_PREFIX

    cases = [
        ("héllo wörld", "hello world"),
        ("Ã¡ Ã© Ã± mojibake", "a e n mojibake"),
        ("ñañaña" * 40, "nananana" * 30),  # windows hit EDIT_PREFIX
        ("plain ascii text", "plain ascii t3xt"),
    ]
    df = spark.createDataFrame(cases, "t1 string, t2 string")
    w = F.least(F.length("t1"), F.length("t2"), F.lit(EDIT_PREFIX))

    def win(c, proj):
        s = F.substring(c, F.lit(1), w)
        return F.regexp_replace(s, "[^\\x00-\\x7F]", "?") if proj else s

    got = df.select(
        F.levenshtein(win(F.col("t1"), True), win(F.col("t2"), True)).alias("d"),
        F.levenshtein(win(F.col("t1"), False), win(F.col("t2"), False)).alias("raw"),
    ).collect()

    con = duckdb.connect()
    diverged = 0
    for (t1, t2), r in zip(cases, got):
        wd = f"least(length(a), length(b), {EDIT_PREFIX})"
        dd, rawd = con.execute(
            f"""SELECT levenshtein(
                  regexp_replace(substr(a, 1, {wd}), '[^\\x00-\\x7f]', '?', 'g'),
                  regexp_replace(substr(b, 1, {wd}), '[^\\x00-\\x7f]', '?', 'g')),
                levenshtein(substr(a, 1, {wd}), substr(b, 1, {wd}))
                FROM (SELECT ? AS a, ? AS b)""",
            [t1, t2],
        ).fetchone()
        assert r.d == dd, (t1, t2, r.d, dd)  # projected: engines agree
        diverged += int(r.raw != rawd)
    assert diverged >= 2  # unprojected byte-vs-char semantics differ


def test_jaccard_scores_high_for_mutated(spark):
    from freki_spark.functions.dedup import dedup_ngram_jaccard

    rows = dedup_ngram_jaccard(spark, SF).collect()
    mut = [r.jaccard for r in rows if r.b == r.a + 100000]
    assert len(mut) >= 45
    assert min(mut) > 0.5


def test_simhash_banding_discovers_mutated_pairs(spark):
    from freki_spark.functions.dedup import (
        SIM_HAMMING_MAX,
        _near_dup_corpus,
        _with_simhash,
        dedup_simhash,
    )

    rows = dedup_simhash(spark, SF).collect()
    pairs = {(r.a, r.b): r.hamming for r in rows}
    # the banded bucket join must DISCOVER the mutated near-dup pairs
    # (they are never joined by construction) — block-combination LSH
    # recall over the 50 planted mutants is guaranteed only up to
    # Hamming 6-SIM_MATCH_BANDS and probabilistic beyond; measured 36
    # reportable (h<=8) discoveries at m=2 on this deterministic corpus
    hits = [(a, b) for (a, b) in pairs if b == a + 100000]
    assert len(hits) >= 35
    # recompute Hamming INDEPENDENTLY (python popcount over the raw
    # fingerprints): asserting the operator's own filter output against
    # the operator's own constant would be tautological — a regressed
    # xor/bit_count would pass its own filter
    fp = {
        r.doc_id: r.simhash
        for r in _with_simhash(_near_dup_corpus(spark, SF)).collect()
    }
    assert pairs  # guard: empty output would vacuously pass the loop
    for (a, b), h in pairs.items():
        assert h == bin(fp[a] ^ fp[b]).count("1")
        assert h <= SIM_HAMMING_MAX


def test_embedding_cosine_catches_scaled_copies(spark):
    from freki_spark.functions.dedup import dedup_embedding_cosine

    rows = dedup_embedding_cosine(spark, SF).collect()
    matches = {r.probe_id: r.match_id for r in rows if r.cos >= 0.999}
    for probe, match in matches.items():
        assert match == probe - 100000  # scaled copy matches its original


def test_ann_bruteforce_self_is_top1(spark):
    from freki_spark.functions.similarity import ann_topk_bruteforce

    rows = ann_topk_bruteforce(spark, SF).collect()
    top1 = {r.q_id: r.vec_id for r in rows if r.rnk == 1}
    assert top1 == {q: q for q in range(8)}  # self-similarity = 1.0


def test_ann_lsh_contains_self_and_subsets_bruteforce_buckets(spark):
    from freki_spark.functions.similarity import ann_lsh_bucketed

    rows = ann_lsh_bucketed(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(8))
    for q, rs in by_q.items():
        assert any(r.vec_id == q and r.rnk == 1 for r in rs)


def test_ann_lsh_multiprobe_recall_floor(spark):
    """Multi-probe LSH recall@k vs the brute-force ground truth.  The
    fixture embeddings are random vectors (worst case for LSH — true
    neighbors have low cosine), where 6 planes + 1-bit multi-probe
    measure ~0.40 mean recall@5; pin a 0.30 floor so a recall
    regression (e.g. losing the neighboring-bucket probes) fails."""
    from freki_spark.functions.similarity import (
        TOP_K,
        ann_lsh_bucketed,
        ann_topk_bruteforce,
    )

    bf, ls = {}, {}
    for r in ann_topk_bruteforce(spark, SF).collect():
        bf.setdefault(r.q_id, set()).add(r.vec_id)
    for r in ann_lsh_bucketed(spark, SF).collect():
        ls.setdefault(r.q_id, set()).add(r.vec_id)
    recalls = [len(bf[q] & ls.get(q, set())) / TOP_K for q in bf]
    assert sum(recalls) / len(recalls) >= 0.30


def test_ann_quantized_recall_near_exact(spark):
    """int8 scalar quantization barely perturbs 64-d cosine ranking:
    measured recall@5 = 1.0 vs the exact brute force on the fixture;
    pin 0.9 so a quantization bug (scale, clamp, rounding) fails."""
    from freki_spark.functions.similarity import (
        TOP_K,
        ann_topk_bruteforce,
        ann_topk_quantized,
    )

    bf, qz = {}, {}
    for r in ann_topk_bruteforce(spark, SF).collect():
        bf.setdefault(r.q_id, set()).add(r.vec_id)
    for r in ann_topk_quantized(spark, SF).collect():
        qz.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(qz) == set(bf)
    recalls = [len(bf[q] & qz[q]) / TOP_K for q in bf]
    assert sum(recalls) / len(recalls) >= 0.9


def test_multimodal_stub_and_plumbing(spark):
    from freki_spark.functions import multimodal as mm

    with pytest.raises(NotImplementedError, match="PIL"):
        mm.decode_image(b"\x00\x01")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = mm.synth_media_table(docs)
    feats = mm.extract_features(media).collect()
    assert len(feats) == 100
    for r in feats[:5]:
        assert r.content_len == 32
        assert len(r.features) == 8
        assert all(0.0 <= f <= 1.0 for f in r.features)

    rs = mm.resize_meta(media).collect()
    assert all(max(r.new_w, r.new_h) <= 128 for r in rs)


def test_streaming_matches_batch(spark):
    from freki_spark.streaming.jobs import stream_hourly_counts

    from pyspark.sql import functions as F

    out = {
        r.hour_epoch: (r.n, r.total)
        for r in stream_hourly_counts(spark, SF, "t_hourly").collect()
    }
    e = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        r.hour_epoch: (r.n, r.total)
        for r in e.groupBy(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("bigint")
            .alias("hour_epoch")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert out == batch


def test_stream_enrich_join_matches_batch_and_keeps_dim_misses(spark):
    """The stream-static enrichment must equal the same left-join
    aggregation run in batch, and — with a dimension truncated to half
    the user universe — events whose user misses the dim must SURVIVE
    as segment='UNKNOWN' with their counts intact (a dim gap must
    never delete events)."""
    from pyspark.sql import functions as F

    from freki_spark.streaming.jobs import stream_enrich_agg

    out = {
        (r.hour_epoch, r.segment): (r.n, r.total)
        for r in stream_enrich_agg(spark, SF, "t_enrich").collect()
    }
    e = spark.read.parquet(f"{SF}/events.parquet")
    dim = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    batch = {
        (r.hour_epoch, r.segment): (r.n, r.total)
        for r in e.join(dim, "user_id", "left")
        .groupBy(
            (F.floor(F.unix_timestamp("ts") / 3600) * 3600)
            .cast("bigint")
            .alias("hour_epoch"),
            F.coalesce("segment", F.lit("UNKNOWN")).alias("segment"),
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert out == batch
    assert out and all(s != "UNKNOWN" for _, s in out), (
        "full dim should cover every event user"
    )

    half = dim.filter(F.col("user_id") % 2 == 0)
    miss = {
        (r.hour_epoch, r.segment): r.n
        for r in stream_enrich_agg(spark, SF, "t_enrich_half", dim=half)
        .filter(F.col("segment") == "UNKNOWN")
        .collect()
    }
    n_odd = e.filter(F.col("user_id") % 2 == 1).count()
    assert sum(miss.values()) == n_odd > 0
    total_rows = sum(
        r.n for r in stream_enrich_agg(spark, SF, "t_enrich_half2", dim=half)
        .collect()
    )
    assert total_rows == e.count()


def test_stream_cms_matches_python_and_bounds_state(spark):
    """Recompute the per-hour Count-Min cells in plain python (hashlib
    md5 cells over the events table, epoch-hour buckets) — the
    streaming relation must match exactly, and the per-(window, row)
    occupied-cell count must be bounded by min(M, distinct keys) —
    the constant-state claim that justifies a sketch in a stream."""
    import hashlib
    from collections import Counter, defaultdict

    from freki_spark.functions.search import CMS_K, CMS_M
    from freki_spark.streaming.jobs import stream_cms

    events = spark.read.parquet(f"{SF}/events.parquet").collect()
    exp = Counter()
    keys_per_hour = defaultdict(set)
    for r in events:
        hour = int(r.ts.timestamp()) // 3600 * 3600
        keys_per_hour[hour].add(r.event_type)
        for k in range(CMS_K):
            m = (
                int(
                    hashlib.md5(
                        f"cms{k}|{r.event_type}".encode()
                    ).hexdigest()[:8],
                    16,
                )
                % CMS_M
            )
            exp[(hour, k, m)] += 1
    got = {
        (r.hour_epoch, r.k, r.m): r.cell_cnt
        for r in stream_cms(spark, SF, "t_cms").collect()
    }
    assert got == dict(exp)
    occupied = defaultdict(int)
    for hour, k, _ in got:
        occupied[(hour, k)] += 1
    assert all(
        n <= min(CMS_M, len(keys_per_hour[h])) for (h, _), n in occupied.items()
    )


def test_stream_sessionize_counts(spark):
    from freki_spark.streaming.jobs import stream_sessionize

    rows = stream_sessionize(spark, SF, "t_sess").collect()
    assert len(rows) >= 10
    assert all(r.n_sessions >= 1 for r in rows)


def test_ann_ivf_self_top1_and_recall(spark):
    """IVF-flat: the probe's own list always contains it (self top-1),
    and probing 4 of 16 lists recovers most of the brute-force top-k."""
    from freki_spark.functions.similarity import (
        TOP_K,
        ann_ivf_flat,
        ann_topk_bruteforce,
    )

    ivf = ann_ivf_flat(spark, SF).collect()
    by_q = {}
    for r in ivf:
        by_q.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(by_q) == set(range(8))
    for q, rs in by_q.items():
        assert q in rs  # self is always in its own list

    bf = ann_topk_bruteforce(spark, SF).collect()
    bf_by_q = {}
    for r in bf:
        bf_by_q.setdefault(r.q_id, set()).add(r.vec_id)
    hits = sum(len(by_q[q] & bf_by_q[q]) for q in bf_by_q)
    total = sum(len(v) for v in bf_by_q.values())
    assert hits / total >= 0.5, f"IVF recall {hits}/{total} vs brute force"


# ---------------------------------------------------------------------------
# corpus-prep family (functions/corpus_prep.py)
# ---------------------------------------------------------------------------


def test_pii_scrub_removes_every_pattern(spark):
    import re

    from freki_spark.functions.corpus_prep import (
        EMAIL_RE,
        IP_RE,
        PHONE_RE,
        pii_scrub,
    )

    rows = pii_scrub(spark, SF).collect()
    assert len(rows) == 500
    for r in rows:
        # the synthesized augmentation guarantees at least one of each
        assert r.n_emails >= 1 and r.n_ips >= 1 and r.n_phones >= 1
        assert re.search(EMAIL_RE, r.scrubbed) is None
        assert re.search(IP_RE, r.scrubbed) is None
        assert re.search(PHONE_RE, r.scrubbed) is None
        assert "<EMAIL>" in r.scrubbed and "<IP>" in r.scrubbed


def test_chunk_sliding_matches_naive_python(spark):
    from freki_spark.functions.corpus_prep import (
        CHUNK_STRIDE,
        CHUNK_WORDS,
        chunk_sliding,
    )

    got = {
        (r.doc_id, r.chunk_id): (r.n_words, r.chunk_text)
        for r in chunk_sliding(spark, SF).collect()
    }
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    want = {}
    for d in docs:
        words = d.text.split(" ")
        for ci, s in enumerate(range(0, len(words), CHUNK_STRIDE)):
            chunk = words[s : s + CHUNK_WORDS]
            want[(d.doc_id, ci)] = (len(chunk), " ".join(chunk))
    assert got == want


def test_chunk_sliding_covers_every_word(spark):
    from freki_spark.functions.corpus_prep import CHUNK_STRIDE, chunk_sliding

    # stride < window -> consecutive chunks overlap; first chunk always
    # starts at word 0 and last chunk reaches the final word
    last = {}
    first = {}
    for r in chunk_sliding(spark, SF).collect():
        first.setdefault(r.doc_id, set()).add(r.chunk_id)
        end = r.chunk_id * CHUNK_STRIDE + r.n_words
        last[r.doc_id] = max(last.get(r.doc_id, 0), end)
    docs = {d.doc_id: len(d.text.split(" ")) for d in
            spark.read.parquet(f"{SF}/documents.parquet").collect()}
    for doc_id, n_words in docs.items():
        assert 0 in first[doc_id]
        assert last[doc_id] == n_words


def test_sample_stratified_deterministic_and_rate(spark):
    from freki_spark.functions.corpus_prep import SAMPLE_RATES, sample_stratified

    a = sorted(r.doc_id for r in sample_stratified(spark, SF).collect())
    b = sorted(r.doc_id for r in sample_stratified(spark, SF).collect())
    assert a == b  # hash sampling: identical across runs
    rows = sample_stratified(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    totals = {
        r.lang: r.n
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for lang, kept in by_lang.items():
        rate = SAMPLE_RATES[lang] / 100
        # md5 buckets are uniform; allow generous tolerance at n~100
        assert kept <= totals[lang]
        assert abs(kept / totals[lang] - rate) < 0.15, (lang, kept, totals[lang])


def test_train_split_is_deterministic_and_independent(spark):
    """Recompute every assignment in python (same md5 rule), verify
    the relation exactly, check all three splits occur with the
    valid/test minorities bounded, and prove INDEPENDENCE from
    sample_stratified's bucket: the two md5 streams must not be
    identical (a shared bucket would split-bias every sampled
    subset)."""
    import hashlib

    from freki_spark.functions.corpus_prep import train_split

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = train_split(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)
    exp = {}
    for r in docs:
        b = h(f"split|{r.doc_id}") % 100
        exp[r.doc_id] = (
            r.lang, b, "valid" if b < 1 else "test" if b < 2 else "train"
        )
    for r in rows:
        assert (r.lang, r.bucket, r.split) == exp[r.doc_id]
    splits = {r.split for r in rows}
    assert splits == {"train", "valid", "test"}
    n = len(rows)
    n_minor = sum(1 for r in rows if r.split != "train")
    assert n_minor < n * 0.10, "valid+test unexpectedly large"
    # independence: the split bucket stream must behave like an
    # INDEPENDENT md5 stream vs the unsalted doc_id buckets
    # sample_stratified uses — two independent uniform streams agree
    # on ~1% of docs, so require ~the full corpus to differ (a
    # constant-shift or partial salt would agree far more often)
    n_diff = sum(
        h(f"split|{r.doc_id}") % 100 != h(str(r.doc_id)) % 100 for r in docs
    )
    assert n_diff > 0.9 * len(docs)


def test_zorder_plan_interleave_matches_python_bit_math(spark):
    """Recompute the Morton key in plain python bit ops for every doc
    (independent of the generated mask/multiply terms), verify the
    full relation, and prove the key is INVERTIBLE — de-interleaving
    zval recovers (zx, zy) exactly, which is the property multi-
    dimensional data skipping rests on.  The plan must also actually
    spread docs across multiple file bins."""
    from freki_spark.functions.corpus_prep import (
        _Z_BIN,
        ZORDER_BITS,
        zorder_plan,
    )

    rows = zorder_plan(spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(rows) == n_docs
    for r in rows:
        z = 0
        for i in range(ZORDER_BITS):
            z |= ((r.zx >> i) & 1) << (2 * i)
            z |= ((r.zy >> i) & 1) << (2 * i + 1)
        assert r.zval == z
        assert r.file_id == z // _Z_BIN
        # invertibility: even bits -> zx, odd bits -> zy
        xi = sum(((r.zval >> (2 * i)) & 1) << i for i in range(ZORDER_BITS))
        yi = sum(
            ((r.zval >> (2 * i + 1)) & 1) << i for i in range(ZORDER_BITS)
        )
        assert (xi, yi) == (r.zx, r.zy)
    assert len({r.file_id for r in rows}) > 1, "all docs in one z bin"


def test_dedup_stats_partitions_the_corpus_exactly(spark):
    """The telemetry histogram must ACCOUNT for every corpus document
    exactly once: recompute the histogram in python from the
    components labeling + corpus size, compare every row, and check
    the partition identity Σ n_docs == |corpus| and Σ(size·n_clusters)
    == Σ n_docs; both dup clusters and the singleton mass must be
    non-empty on the fixture."""
    from collections import Counter

    from freki_spark.functions.dedup import (
        _near_dup_corpus,
        dedup_components,
        dedup_stats,
    )

    comp = dedup_components(spark, SF).collect()
    n_corpus = _near_dup_corpus(spark, SF).count()
    sizes = Counter(r.comp for r in comp)
    hist = Counter(sizes.values())
    exp = {(s, c, s * c) for s, c in hist.items()}
    exp.add((1, n_corpus - len(comp), n_corpus - len(comp)))
    got = {
        (r.cluster_size, r.n_clusters, r.n_docs)
        for r in dedup_stats(spark, SF).collect()
    }
    assert got == exp
    assert sum(n for _, _, n in got) == n_corpus
    assert all(s * c == n for s, c, n in got)
    assert any(s >= 2 for s, _, _ in got), "no dup clusters on fixture"
    assert any(s == 1 and n > 0 for s, _, n in got), "no singleton mass"


def test_gopher_ngram_flags_matches_python_recompute(spark):
    """Full independent recompute of the Gopher Table-A1 repetition
    relation in plain python (Counter grams, top = max (cnt, mass),
    integer cross-multiplied thresholds) — all 9 n-bands of every doc
    must match exactly."""
    from collections import Counter

    from freki_spark.functions.text_analysis import (
        GOPHER_NGRAM_THR,
        GOPHER_NS,
        gopher_ngram_flags,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    exp = set()
    for r in docs:
        tk = r.text.split(" ")
        for n in GOPHER_NS:
            upper = max(len(tk) - (n - 1), 1)
            grams = Counter(
                " ".join(tk[i : i + n]) for i in range(upper)
            )
            masses = {g: c * len(g) for g, c in grams.items()}
            total = sum(masses.values())
            top = max((grams[g], masses[g]) for g in grams)[1]
            dup = sum(m for g, m in masses.items() if grams[g] >= 2)
            thr = GOPHER_NGRAM_THR[n - 2]
            flagged = int(
                (top if n <= 4 else dup) * 100 > thr * total
            )
            exp.add((r.doc_id, n, total, top, dup, flagged))
    got = {
        (r.doc_id, r.n, r.total_mass, r.top_mass, r.dup_mass, r.flagged)
        for r in gopher_ngram_flags(spark, SF).collect()
    }
    assert got == exp


def test_gopher_ngram_flags_fire_on_crafted_docs(spark):
    """Both flag families must actually fire: a top-bigram-dominated
    doc trips the n<=4 top-mass rule, a doc with a repeated 12-token
    passage trips the n>=5 dup-mass rules, and an all-unique doc trips
    nothing."""
    import os
    import tempfile

    from freki_spark.functions.text_analysis import gopher_ngram_flags

    uniq = " ".join(f"w{i}" for i in range(120))
    passage = " ".join(f"p{i}" for i in range(12))
    rows = [
        (1, ("spam ham " * 40).strip()),                  # top 2-gram rules
        (2, f"{uniq} {passage} {passage} {passage}"),     # dup 5..10 rules
        (3, " ".join(f"u{i}" for i in range(200))),       # clean
    ]
    tmp = tempfile.mkdtemp(prefix="freki_gnf_")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(tmp, "documents.parquet")
    )
    out = {
        (r.doc_id, r.n): r.flagged
        for r in gopher_ngram_flags(spark, tmp).collect()
    }
    assert out[(1, 2)] == 1 and out[(1, 3)] == 1 and out[(1, 4)] == 1
    assert all(out[(2, n)] == 1 for n in range(5, 11)), "dup band silent"
    assert all(out[(3, n)] == 0 for n in range(2, 11)), "clean doc flagged"


def test_inverted_postings_matches_python_recompute(spark):
    """Full independent recompute of the impact-ordered index in plain
    python (Counter tf, df cutoff, (-tf, doc_id) champion-list sort)
    — the flat posting relation must match exactly, and the cap must
    actually bite on at least one term."""
    from collections import Counter

    from freki_spark.functions.search import (
        DF_MIN,
        POSTINGS_CAP,
        inverted_postings,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    tf = Counter()
    for r in docs:
        for t, n in Counter(r.text.split(" ")).items():
            tf[(t, r.doc_id)] = n
    df = Counter(t for t, _ in tf)
    exp = set()
    capped = False
    for term in df:
        if df[term] < DF_MIN:
            continue
        postings = sorted(
            ((d, n) for (t, d), n in tf.items() if t == term),
            key=lambda p: (-p[1], p[0]),
        )
        capped = capped or len(postings) > POSTINGS_CAP
        for rk, (d, n) in enumerate(postings[:POSTINGS_CAP], 1):
            exp.add((term, df[term], d, n, rk))
    got = {
        (r.term, r.df, r.doc_id, r.tf, r.rk)
        for r in inverted_postings(spark, SF).collect()
    }
    assert got == exp
    assert capped, "fixture never exercises the champion-list cap"


def test_bm25_topk_matches_python_recompute(spark):
    """Full independent BM25 recompute in plain python (math.log,
    float micros floored per term, integer sums) — the ranked top-k
    relation must match exactly across every query (an exact match on
    score_micro also pins that JVM ln/double math agrees with python's
    libm under the floor-to-micros discipline)."""
    import math
    from collections import Counter

    from freki_spark.functions.search import (
        BM25_SCALE,
        BM25_TOPK,
        N_QTERMS,
        QSTART,
        bm25_topk,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf = {d: Counter(t) for d, t in toks.items()}
    df, cf = Counter(), Counter()
    for d, c in tf.items():
        for term, n in c.items():
            df[term] += 1
            cf[term] += n
    ranked = sorted(cf, key=lambda t: (-cf[t], t))
    qterms = ranked[QSTART - 1 : QSTART - 1 + N_QTERMS]
    exp = set()
    for qi in range(len(qterms) // 2):
        scores = Counter()
        for term in qterms[2 * qi : 2 * qi + 2]:
            idf = math.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            for d, c in tf.items():
                if term in c:
                    t = c[term]
                    tfs = (t * 2.2) / (
                        t + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl)
                    )
                    scores[d] += math.floor(idf * tfs * BM25_SCALE)
        top = sorted(scores.items(), key=lambda p: (-p[1], p[0]))[:BM25_TOPK]
        for rk, (d, s) in enumerate(top, 1):
            exp.add((qi + 1, d, s, rk))
    got = {
        (r.query_id, r.doc_id, r.score_micro, r.rk)
        for r in bm25_topk(spark, SF).collect()
    }
    assert got == exp
    assert len({q for q, *_ in got}) == N_QTERMS // 2


def test_hard_negatives_matches_python_recompute(spark):
    """Full independent recompute of the DPR-style miner in plain
    python on top of the same BM25 math the bm25 test pins: candidates
    scoring on ONE of a query's two terms, ranked by score, top NEG_K,
    margin = weakest-positive minus own score; queries with no
    2-term positive dropped.  Must match the Spark relation exactly,
    and the fixture must actually exercise the interesting regime —
    at least one NEGATIVE margin (a lexical trap outscoring a true
    positive)."""
    import math
    from collections import Counter

    from freki_spark.functions.search import (
        BM25_SCALE,
        N_QTERMS,
        NEG_K,
        QSTART,
        hard_negatives,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    toks = {r.doc_id: r.text.split(" ") for r in docs}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf = {d: Counter(t) for d, t in toks.items()}
    df, cf = Counter(), Counter()
    for d, c in tf.items():
        for term, n in c.items():
            df[term] += 1
            cf[term] += n
    ranked = sorted(cf, key=lambda t: (-cf[t], t))
    qterms = ranked[QSTART - 1 : QSTART - 1 + N_QTERMS]
    exp = set()
    for qi in range(len(qterms) // 2):
        scores, n_terms = Counter(), Counter()
        for term in qterms[2 * qi : 2 * qi + 2]:
            idf = math.log((n_docs - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
            for d, c in tf.items():
                if term in c:
                    t = c[term]
                    tfs = (t * 2.2) / (
                        t + 1.2 * (0.25 + 0.75 * len(toks[d]) / avgdl)
                    )
                    scores[d] += math.floor(idf * tfs * BM25_SCALE)
                    n_terms[d] += 1
        pos = [scores[d] for d in scores if n_terms[d] == 2]
        if not pos:
            continue
        pos_min = min(pos)
        negs = sorted(
            ((d, scores[d]) for d in scores if n_terms[d] < 2),
            key=lambda p: (-p[1], p[0]),
        )[:NEG_K]
        for rk, (d, s) in enumerate(negs, 1):
            exp.add((qi + 1, d, s, pos_min - s, rk))
    got = {
        (r.query_id, r.doc_id, r.score_micro, r.margin_micro, r.neg_rk)
        for r in hard_negatives(spark, SF).collect()
    }
    assert got == exp
    assert got, "fixture mined no negatives at all"
    assert any(m < 0 for *_, m, _rk in got), (
        "no lexical trap outscored a positive — the hard-negative "
        "regime is untested by this fixture"
    )


def test_bleu_stats_matches_python_recompute(spark):
    """Full independent recompute of the BLEU sufficient statistics in
    plain python Counters (clipped matches = sum of per-type min
    counts, raw = unclipped) — the relation must match exactly, the
    BLEU invariant clip <= raw <= total must hold everywhere, and the
    fixture must actually exercise the CLIPPING regime (some doc where
    a repeated candidate gram exceeds its reference count)."""
    from collections import Counter

    from freki_spark.functions.text_analysis import (
        BLEU_MAX_N,
        BLEU_MIN_TOKENS,
        BLEU_REF_OFF,
        BLEU_WIN,
        bleu_stats,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    exp = set()
    clipped_somewhere = False
    for r in docs:
        tk = r.text.split(" ")
        if len(tk) < BLEU_MIN_TOKENS:
            continue
        cand = tk[:BLEU_WIN]
        ref = tk[BLEU_REF_OFF : BLEU_REF_OFF + BLEU_WIN]
        for n in range(1, BLEU_MAX_N + 1):
            cc = Counter(
                " ".join(cand[i : i + n]) for i in range(len(cand) - n + 1)
            )
            rc = Counter(
                " ".join(ref[i : i + n]) for i in range(len(ref) - n + 1)
            )
            clip = sum(min(c, rc[g]) for g, c in cc.items())
            raw = sum(c for g, c in cc.items() if g in rc)
            clipped_somewhere = clipped_somewhere or clip < raw
            exp.add((r.doc_id, n, clip, raw, sum(cc.values())))
    got = {
        (x.doc_id, x.n, x.clip_matches, x.raw_matches, x.cand_total)
        for x in bleu_stats(spark, SF).collect()
    }
    assert got == exp
    assert all(c <= rw <= t for *_, c, rw, t in got)
    assert clipped_somewhere, (
        "no candidate gram ever exceeded its reference count — the "
        "clipping rule is untested by this fixture"
    )


def test_span_corruption_matches_python_and_is_nonoverlapping(spark):
    """Recompute the whole T5 mask plan in plain python (hashlib md5
    jitters, closed-form slot boundaries) — the relation must match
    exactly, spans must be non-overlapping and in-bounds per doc, and
    the realized corruption rate over the slotted region must sit near
    the designed 15% (mean span 3 per 20-token slot)."""
    import hashlib

    from freki_spark.functions.corpus_prep import (
        SC_GRID,
        SC_LEN_MIN,
        SC_LEN_MOD,
        span_corruption,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    exp = set()
    masked = slotted = 0
    for r in docs:
        tk = r.text.split(" ")
        slots = len(tk) // SC_GRID
        if len(tk) < SC_GRID:
            continue
        prev_end = 0
        for i in range(1, slots + 1):
            ln = h(f"{r.doc_id}L{i}") % SC_LEN_MOD + SC_LEN_MIN
            st = (i - 1) * SC_GRID + 1 + h(f"{r.doc_id}O{i}") % (
                SC_GRID - ln + 1
            )
            assert st > prev_end and st + ln - 1 <= len(tk)
            prev_end = st + ln - 1
            exp.add(
                (r.doc_id, i, st, ln, " ".join(tk[st - 1 : st - 1 + ln]))
            )
            masked += ln
        slotted += slots * SC_GRID
    got = {
        (x.doc_id, x.sentinel_id, x.span_start, x.span_len, x.masked_text)
        for x in span_corruption(spark, SF).collect()
    }
    assert got == exp
    assert 0.12 <= masked / slotted <= 0.18, masked / slotted


def test_weighted_sample_matches_python_and_favors_heavy_docs(spark):
    """Recompute the A-ES keys for every doc in plain python (hashlib
    md5 u, math.log, floor to micros) — the global top-K must match
    exactly, and the sample's mean token weight must exceed the corpus
    mean (the point of weighting by training-token mass)."""
    import hashlib
    import math

    from freki_spark.functions.corpus_prep import WS_K, weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    keys = []
    for r in docs:
        w = len(r.text.split(" "))
        u = (
            int(hashlib.md5(f"ws|{r.doc_id}".encode()).hexdigest()[:8], 16)
            + 0.5
        ) / 4294967296.0
        keys.append((r.doc_id, w, math.floor(math.log(u) / w * 1000000.0)))
    top = sorted(keys, key=lambda t: (-t[2], t[0]))[:WS_K]
    exp = {(d, w, k, rk) for rk, (d, w, k) in enumerate(top, 1)}
    got = {
        (x.doc_id, x.w_tokens, x.key_micro, x.rk)
        for x in weighted_sample(spark, SF).collect()
    }
    assert got == exp
    corpus_mean = sum(w for _, w, _ in keys) / len(keys)
    sample_mean = sum(w for _, w, _, _ in got) / len(got)
    assert sample_mean > corpus_mean, (sample_mean, corpus_mean)


def test_semantic_pack_layout_and_cluster_coherence(spark):
    """Three claims pinned: (1) the layout is EXACTLY ivf_assign's
    clustering (same list per doc, every doc exactly once); (2) the
    pack columns are internally consistent — replaying the per-cluster
    crank order and accumulating n_tokens reproduces every seq_id /
    seq_offset / straddles value; (3) the packing is SEMANTIC — the
    per-cluster majority-label fraction over the fixture embeddings
    beats the best any label-blind split can do in expectation (the
    corpus max label share)."""
    from collections import Counter, defaultdict

    from freki_spark.functions.corpus_prep import SEQ_LEN
    from freki_spark.functions.similarity import q_ivf_assign, semantic_pack

    rows = semantic_pack(spark, SF).collect()
    assign = {
        r.vec_id: r.list_id for r in q_ivf_assign(spark, SF).collect()
    }
    assert sorted(r.doc_id for r in rows) == sorted(assign)
    assert all(assign[r.doc_id] == r.list_id for r in rows)

    by_cluster = defaultdict(list)
    for r in rows:
        by_cluster[r.list_id].append(r)
    for rs in by_cluster.values():
        rs.sort(key=lambda r: r.crank)
        assert [r.crank for r in rs] == list(range(1, len(rs) + 1))
        start = 0
        for r in rs:
            assert r.seq_id == start // SEQ_LEN
            assert r.seq_offset == start % SEQ_LEN
            assert r.straddles == (
                start // SEQ_LEN != (start + r.n_tokens - 1) // SEQ_LEN
            )
            start += r.n_tokens

    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    agree = sum(
        Counter(labels[r.doc_id] for r in rs).most_common(1)[0][1]
        for rs in by_cluster.values()
    )
    base = Counter(labels.values()).most_common(1)[0][1]
    assert agree / len(rows) > 1.2 * base / len(labels), (
        agree / len(rows),
        base / len(labels),
    )


def test_doremi_weights_matches_python_and_upweights_lossy_domains(spark):
    """Recompute the reweighting layer in plain python from the
    per-doc scores of perplexity_bucket (whose LM semantics its own
    oracle + tests pin): integer div means/shares, math.exp on the
    per-domain excess, floor to micros, integer-ppm normalization —
    the 5-row relation must match exactly.  Also pins the DoReMi
    semantics: weights sum to ~1e6, every positive-excess domain
    beats its base doc share, and the max-excess domain gains the
    most relative to base."""
    import math
    from collections import defaultdict

    from freki_spark.functions.text_analysis import (
        DOREMI_EXCESS_CAP,
        DOREMI_TAU,
        doremi_weights,
        perplexity_bucket,
    )

    # bigint-headroom invariant behind the excess clamp: the largest
    # possible alpha (base share = 1e6 ppm at the cap) and its ppm
    # cross-multiplication must both fit a signed 64-bit in BOTH
    # engines (Spark would saturate silently, DuckDB would raise)
    alpha_max = math.floor(1_000_000 * math.exp(DOREMI_EXCESS_CAP / DOREMI_TAU))
    assert alpha_max * 1_000_000 < 2**63

    per_doc = perplexity_bucket(spark, SF).collect()
    by_lang = defaultdict(list)
    for r in per_doc:
        by_lang[r.lang].append(r.score)
    n_total = len(per_doc)
    ref = sum(r.score for r in per_doc) // n_total
    alphas = {}
    stats = {}
    for lang, scores in by_lang.items():
        loss = sum(scores) // len(scores)
        excess = max(0, loss - ref)
        base = len(scores) * 1000000 // n_total
        alphas[lang] = math.floor(
            float(base)
            * math.exp(
                float(min(excess, DOREMI_EXCESS_CAP)) / float(DOREMI_TAU)
            )
        )
        stats[lang] = (len(scores), loss, excess, base)
    asum = sum(alphas.values())
    exp = {
        (lang, stats[lang][0], stats[lang][1], stats[lang][2],
         alphas[lang] * 1000000 // asum)
        for lang in alphas
    }
    got = {
        (r.lang, r.n_docs, r.loss_micro, r.excess_micro, r.weight_ppm)
        for r in doremi_weights(spark, SF).collect()
    }
    assert got == exp
    tot = sum(w for *_, w in got)
    assert 1000000 - len(got) <= tot <= 1000000, tot
    gains = {}
    for lang, _, _, excess, w in got:
        base = stats[lang][3]
        if excess > 0:
            assert w > base, (lang, w, base)
        gains[lang] = w / base
    assert any(e > 0 for *_, e, _ in got), "no domain ever exceeded ref"
    max_excess_lang = max(got, key=lambda t: t[3])[0]
    assert gains[max_excess_lang] == max(gains.values())


def test_filter_funnel_matches_component_ops_and_chains(spark):
    """The funnel must agree with the standalone filters it describes:
    rebuild killed-at-first-failing-stage attribution from the four
    component ops' own outputs and compare the whole relation.  Also
    pins the funnel algebra — n_in chains (each stage's intake is the
    previous intake minus its kills), stage 1 sees the whole corpus,
    and the fixture actually kills at every stage grain checked."""
    from freki_spark.functions.text_analysis import (
        FUNNEL_STAGES,
        badword_filter,
        filter_funnel,
        gopher_quality,
        perplexity_bucket,
        quality_classifier,
    )

    g = {r.doc_id: r.keep for r in gopher_quality(spark, SF).collect()}
    b = {r.doc_id: r.flagged for r in badword_filter(spark, SF).collect()}
    c = {r.doc_id: r.keep for r in quality_classifier(spark, SF).collect()}
    p = {
        r.doc_id: r.bucket for r in perplexity_bucket(spark, SF).collect()
    }
    kills = {s: 0 for s in range(0, 5)}
    for d in g:
        if g[d] == 0:
            kills[1] += 1
        elif b[d] == 1:
            kills[2] += 1
        elif c[d] == 0:
            kills[3] += 1
        elif p[d] == "tail":
            kills[4] += 1
        else:
            kills[0] += 1
    n_total = len(g)
    exp = set()
    before = 0
    for s in range(1, 5):
        n_in = n_total - before
        exp.add(
            (
                s,
                FUNNEL_STAGES[s - 1],
                n_in,
                kills[s],
                (n_in - kills[s]) * 1000000 // n_in if n_in else 0,
            )
        )
        before += kills[s]
    got = {
        (r.stage, r.stage_name, r.n_in, r.n_killed, r.survive_ppm)
        for r in filter_funnel(spark, SF).collect()
    }
    assert got == exp
    rows = sorted(got)
    assert rows[0][2] == n_total
    for (s1, _, in1, k1, _), (_, _, in2, _, _) in zip(rows, rows[1:]):
        assert in2 == in1 - k1, (s1, in1, k1, in2)
    assert sum(k for *_, k, _ in rows) > 0, "fixture kills nothing"


def test_vocab_coverage_matches_python_bpe_recompute(spark):
    """The per-language relation must equal a plain-python recompute
    of the full pipeline (regex word split, sentinel replace-chain
    BPE, integer ppm ratios), and the metrics must discriminate on the
    fixture: every fertility >= 1e6 (a word is at least one token),
    some single-token words exist, and some multi-token words exist."""
    import re as _re
    from collections import defaultdict

    from freki_spark.functions.text_analysis import (
        BPE_MERGES,
        vocab_coverage,
    )

    def enc_len(word):
        s = " ".join(f"\x01{c}\x01" for c in word)
        for a, b in BPE_MERGES:
            s = s.replace(f"\x01{a}\x01 \x01{b}\x01", f"\x01{a}{b}\x01")
        return len(s.split(" "))

    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, words, tokens, single
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        words = [
            w
            for w in _re.sub("[^a-z]+", " ", r.text.lower()).strip().split(" ")
            if w != ""
        ]
        a = agg[r.lang]
        a[0] += 1
        a[1] += len(words)
        for w in words:
            n = enc_len(w)
            a[2] += n
            a[3] += 1 if n == 1 else 0
    exp = {
        (
            lang,
            d,
            w,
            t,
            t * 1000000 // w if w else 0,
            s * 1000000 // w if w else 0,
        )
        for lang, (d, w, t, s) in agg.items()
    }
    got = {
        (
            r.lang,
            r.n_docs,
            r.n_words,
            r.n_tokens,
            r.fertility_ppm,
            r.single_token_ppm,
        )
        for r in vocab_coverage(spark, SF).collect()
    }
    assert got == exp
    assert all(f >= 1000000 for *_, f, _ in got)
    assert any(s > 0 for *_, s in got), "no single-token words"
    assert any(s < 1000000 for *_, s in got), "vocab never split a word"


def test_preference_pairs_matches_components_and_is_bounded(spark):
    """Pairs must be exactly the cross of each cluster's top-N keepers
    and bottom-N rejects, rebuilt from the two component ops' own
    (independently verified) outputs; every pair is same-cluster with
    vote_gap >= 1, at most N^2 pairs per cluster, and the fixture
    yields pairs in more than one cluster."""
    from freki_spark.functions.similarity import (
        PREF_TOPN,
        preference_pairs,
        q_ivf_assign,
    )
    from freki_spark.functions.text_analysis import quality_vote

    lists = {
        r.vec_id: r.list_id for r in q_ivf_assign(spark, SF).collect()
    }
    qv = {
        r.doc_id: (r.votes, r.keep)
        for r in quality_vote(spark, SF).collect()
    }
    by_list = {}
    for doc, lid in lists.items():
        if doc in qv:
            by_list.setdefault(lid, []).append(doc)
    exp = set()
    for lid, docs in by_list.items():
        keepers = sorted(
            (d for d in docs if qv[d][1] == 1),
            key=lambda d: (-qv[d][0], d),
        )[:PREF_TOPN]
        rejects = sorted(
            (d for d in docs if qv[d][1] == 0),
            key=lambda d: (qv[d][0], d),
        )[:PREF_TOPN]
        for c in keepers:
            for r in rejects:
                exp.add((lid, c, r, qv[c][0] - qv[r][0]))

    got = {
        (r.list_id, r.chosen_id, r.rejected_id, r.vote_gap)
        for r in preference_pairs(spark, SF).collect()
    }
    assert got == exp
    assert got, "fixture assembled no pairs"
    assert all(g >= 1 for *_, g in got)
    per_cluster = {}
    for lid, *_ in got:
        per_cluster[lid] = per_cluster.get(lid, 0) + 1
    assert all(n <= PREF_TOPN * PREF_TOPN for n in per_cluster.values())
    assert len(per_cluster) > 1, "pairs confined to one cluster"


def test_scd2_history_matches_python_and_interval_algebra(spark):
    """The history relation must equal a python recompute of the three
    snapshot definitions + run-building rule, and the interval algebra
    must hold: per doc, intervals are disjoint and ordered, exactly one
    current version iff the doc is live in the last snapshot, changed
    docs carry >= 2 versions, and the RE-ADDED docs (dropped at t=1,
    re-crawled unchanged at t=2) get a NEW interval despite an
    identical digest — the presence-gap rule."""
    import hashlib

    from freki_spark.functions.dedup import SCD2_T_MAX, scd2_history

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    A = dict(docs)
    B = {
        d: (t + " rev2" if d % 7 == 1 else t)
        for d, t in A.items()
        if d % 11 != 2
    }
    B.update({d + 500000: "new " + t for d, t in A.items() if d < 30})
    C = {
        d: (t + " rev3" if d % 5 == 2 else t)
        for d, t in B.items()
        if d % 13 != 3
    }
    C.update({d + 600000: "v3 " + t for d, t in A.items() if d < 20})
    C.update({d: t for d, t in A.items() if d % 11 == 2 and d < 60})
    snaps = [A, B, C]

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    exp = set()
    for doc in set().union(*snaps):
        runs, prev_h, prev_t = [], None, None
        for t in range(SCD2_T_MAX + 1):
            if doc not in snaps[t]:
                continue
            h = md5(snaps[t][doc])
            if prev_h is None or prev_h != h or prev_t != t - 1:
                runs.append([h, t, t])
            else:
                runs[-1][2] = t
            prev_h, prev_t = h, t
        for h, vf, ls in runs:
            exp.add(
                (
                    doc,
                    h,
                    vf,
                    ls + 1 if ls < SCD2_T_MAX else None,
                    ls == SCD2_T_MAX,
                )
            )

    rows = scd2_history(spark, SF).collect()
    got = {
        (r.doc_id, r.digest, r.valid_from, r.valid_to, r.is_current)
        for r in rows
    }
    assert got == exp

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, vs in by_doc.items():
        vs.sort(key=lambda r: r.valid_from)
        for v, nxt in zip(vs, vs[1:]):
            assert v.valid_to is not None and v.valid_to <= nxt.valid_from
        n_cur = sum(1 for v in vs if v.is_current)
        assert n_cur == (1 if doc in C else 0), doc
    changed = [d for d in A if d % 11 != 2 and d % 7 == 1 and d % 13 != 3]
    assert changed and all(len(by_doc[d]) >= 2 for d in changed)
    readded = [d for d in A if d % 11 == 2 and d < 60]
    assert readded, "fixture has no re-added docs"
    for d in readded:
        vs = by_doc[d]
        assert len(vs) == 2 and vs[0].digest == vs[1].digest
        assert (vs[0].valid_from, vs[0].valid_to) == (0, 1)
        assert vs[1].valid_from == 2 and vs[1].is_current


def test_bpe_ids_roundtrip_and_fixed_shape(spark):
    """The id tensor must equal a plain-python recompute, every row
    must have the fixed BPE_IDS_LEN shape, the vocab must be a
    bijection (decodable), and decoding the unpadded prefix must
    reproduce the tokenizer's own token stream (the round-trip a
    training job depends on)."""
    import re as _re

    from freki_spark.functions.text_analysis import (
        BPE_IDS_LEN,
        BPE_MERGES,
        BPE_VOCAB,
        bpe_ids,
    )

    ids_to_tok = {i: t for t, i in BPE_VOCAB.items()}
    assert len(ids_to_tok) == len(BPE_VOCAB), "vocab ids not unique"
    assert 0 not in ids_to_tok, "PAD id collides with a token"

    def enc(word):
        s = " ".join(f"\x01{c}\x01" for c in word)
        for a, b in BPE_MERGES:
            s = s.replace(f"\x01{a}\x01 \x01{b}\x01", f"\x01{a}{b}\x01")
        return s.replace("\x01", "").split(" ")

    exp = {}
    stream = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        words = [
            w
            for w in _re.sub("[^a-z]+", " ", r.text.lower()).strip().split(" ")
            if w != ""
        ]
        tk = [t for w in words for t in enc(w)]
        ids = [BPE_VOCAB[t] for t in tk[:BPE_IDS_LEN]]
        exp[r.doc_id] = (len(tk), ids + [0] * (BPE_IDS_LEN - len(ids)))
        stream[r.doc_id] = tk[:BPE_IDS_LEN]

    # registry surface scalarizes (ids_csv — the driver's pandas
    # canon can't sort list columns); parse it back for the checks
    # and pin that the csv is exactly the joined array
    got = {
        r.doc_id: (r.n_tokens, [int(x) for x in r.ids_csv.split(",")])
        for r in bpe_ids(spark, SF).collect()
    }
    assert got == exp
    for doc_id, (n, ids) in got.items():
        assert len(ids) == BPE_IDS_LEN
        real = ids[: min(n, BPE_IDS_LEN)]
        assert all(i > 0 for i in real) and all(
            i == 0 for i in ids[len(real):]
        )
        assert [ids_to_tok[i] for i in real] == stream[doc_id]
    assert any(n > BPE_IDS_LEN for n, _ in got.values()), "no truncation hit"

    # every fixture doc exceeds BPE_IDS_LEN tokens, so drive the
    # padding branch through the same projection with a short doc
    from freki_spark.functions.text_analysis import _bpe_ids_from

    short = _bpe_ids_from(
        spark.createDataFrame([(1, "the and!")], ["doc_id", "text"])
    ).collect()[0]
    assert short.n_tokens == 2
    assert list(short.ids) == [
        BPE_VOCAB["the"],
        BPE_VOCAB["and"],
    ] + [0] * (BPE_IDS_LEN - 2)


def test_cms_estimates_are_one_sided_and_collision_exact(spark):
    """Recompute the whole Count-Min pipeline in plain python (md5
    cells, true Counter, min-over-rows estimate) — the 20-row relation
    must match exactly, every estimate must satisfy the CMS one-sided
    bound est >= truth, and every estimate must equal truth + the
    candidate's MINIMUM colliding mass (i.e. the sketch semantics, not
    merely a lucky inequality).  The fixture vocabulary is only ~31
    tokens (collisions in 1024 columns are unlikely organically), so
    collision behavior is exercised separately on a crafted corpus
    whose vocabulary exceeds the sketch width several times over."""
    import hashlib
    from collections import Counter

    from freki_spark.functions.search import (
        CMS_K,
        CMS_M,
        CMS_TOP,
        heavy_hitters_cms,
    )

    def cell(k, tok):
        return (
            int(hashlib.md5(f"cms{k}|{tok}".encode()).hexdigest()[:8], 16)
            % CMS_M
        )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    true = Counter(t for r in docs for t in r.text.split(" "))
    cells = Counter()
    for tok, n in true.items():
        for k in range(CMS_K):
            cells[(k, cell(k, tok))] += n
    cand = sorted(true.items(), key=lambda p: (-p[1], p[0]))[:CMS_TOP]
    exp = {
        (tok, n, min(cells[(k, cell(k, tok))] for k in range(CMS_K)))
        for tok, n in cand
    }
    got = {
        (r.tok, r.true_cnt, r.est_cnt)
        for r in heavy_hitters_cms(spark, SF).collect()
    }
    assert got == exp
    assert all(est >= n for _, n, est in got)


def test_cms_overestimates_under_collisions(spark):
    """On a corpus whose vocabulary (4096 distinct tokens) exceeds the
    1024-column sketch several times over, collisions are structural:
    at least one heavy hitter must OVERESTIMATE (est > truth), every
    estimate still satisfies est >= truth, and the python recompute
    still matches cell-for-cell — i.e. the sketch degrades exactly as
    CMS theory says, never undercounting."""
    import hashlib
    import os
    import tempfile
    from collections import Counter

    from freki_spark.functions.search import (
        CMS_K,
        CMS_M,
        heavy_hitters_cms,
    )

    def cell(k, tok):
        return (
            int(hashlib.md5(f"cms{k}|{tok}".encode()).hexdigest()[:8], 16)
            % CMS_M
        )

    # 64 docs x 64 unique rare tokens + per-doc heavy hitters
    rows = []
    for d in range(64):
        rare = [f"t{d}_{i}" for i in range(64)]
        heavy = [f"hh{d % 8}"] * 20
        rows.append((d, " ".join(heavy + rare)))
    tmp = tempfile.mkdtemp(prefix="freki_cms_")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        os.path.join(tmp, "documents.parquet")
    )
    true = Counter(t for _, text in rows for t in text.split(" "))
    cells = Counter()
    for tok, n in true.items():
        for k in range(CMS_K):
            cells[(k, cell(k, tok))] += n
    got = {r.tok: (r.true_cnt, r.est_cnt)
           for r in heavy_hitters_cms(spark, tmp).collect()}
    assert {f"hh{i}" for i in range(8)} <= set(got)
    for tok, (n, est) in got.items():
        assert n == true[tok]
        assert est == min(cells[(k, cell(k, tok))] for k in range(CMS_K))
        assert est >= n
    assert any(est > n for n, est in got.values()), "no collision observed"


def test_ngram_topk_ranks_and_counts(spark):
    from freki_spark.functions.corpus_prep import NGRAM_TOPK, ngram_topk

    rows = ngram_topk(spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.cnt)
    assert set(by_lang) == {"en", "es", "de", "fr", "zh"}
    for lang, cnts in by_lang.items():
        assert len(cnts) == NGRAM_TOPK
        assert cnts == sorted(cnts, reverse=True)


def test_snapshot_diff_classifies_every_doc(spark):
    """Every doc_id across both snapshots appears exactly once with
    the right status, recomputed in python from the synthesis rules;
    all four classes must be exercised by the fixture."""
    from freki_spark.functions.dedup import snapshot_diff

    a = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    b = {}
    for d, t in a.items():
        if d % 11 == 2:
            continue
        b[d] = t + " rev2" if d % 7 == 1 else t
    for d, t in a.items():
        if d < 30:
            b[d + 500000] = "new " + t
    exp = {}
    for d in set(a) | set(b):
        if d not in a:
            exp[d] = "added"
        elif d not in b:
            exp[d] = "removed"
        elif a[d] != b[d]:
            exp[d] = "changed"
        else:
            exp[d] = "same"
    got = {r.doc_id: r.status for r in snapshot_diff(spark, SF).collect()}
    assert got == exp
    assert set(exp.values()) == {"added", "removed", "changed", "same"}


def test_curate_keep_composes_component_verdicts(spark):
    """The fused gate must agree doc-for-doc with the two component
    ops (keep == gopher.keep AND NOT badword.flagged) and emit the
    first-failing reason in the documented hard-rules-first precedence
    — recomputed here from the component outputs, not the fused op."""
    from freki_spark.functions.text_analysis import (
        BAD_DEN,
        badword_filter,
        curate_keep,
        gopher_quality,
    )

    g = {r.doc_id: r for r in gopher_quality(spark, SF).collect()}
    b = {r.doc_id: r for r in badword_filter(spark, SF).collect()}
    got = {r.doc_id: r for r in curate_keep(spark, SF).collect()}
    assert set(got) == set(g) == set(b)
    reasons = set()
    for d, r in got.items():
        want_keep = 1 if (g[d].keep == 1 and b[d].flagged == 0) else 0
        assert r.keep == want_keep
        if b[d].has_hard == 1:
            want = "hard_word"
        elif b[d].n_phrase > 0:
            want = "bad_phrase"
        elif b[d].n_bad * BAD_DEN > b[d].n_words:
            want = "bad_ratio"
        elif not g[d].ok_words:
            want = "n_words"
        elif not g[d].ok_meanlen:
            want = "mean_word_len"
        elif not g[d].ok_stop:
            want = "stop_words"
        elif not g[d].ok_topword:
            want = "top_word"
        else:
            want = None
        assert r.reject_reason == want
        assert (r.reject_reason is None) == (r.keep == 1)
        reasons.add(want)
    assert None in reasons and len(reasons) >= 3  # both verdicts + variety


def test_pack_layouts_are_contiguous_and_budgeted(spark):
    """Both packing layouts must tile each language stream exactly:
    doc k's (seq_id, seq_offset) equals the running token sum of its
    predecessors (no gaps, no overlaps), straddles iff the doc crosses
    a SEQ_LEN boundary — recomputed in python.  pack_interleaved must
    additionally charge (1 + doc_id % 16) * IMG_TOKENS placeholder
    tokens to exactly the media-bearing (doc_id % 5 == 0) docs."""
    from freki_spark.functions.corpus_prep import (
        IMG_TOKENS,
        SEQ_LEN,
        pack_interleaved,
        pack_sequences,
    )

    docs = sorted(
        spark.read.parquet(f"{SF}/documents.parquet").collect(),
        key=lambda r: r.doc_id,
    )

    def layout_check(rows, budget):
        got = {r.doc_id: r for r in rows}
        assert set(got) == {d.doc_id for d in docs}
        starts = {}
        for d in docs:
            s = starts.setdefault(d.lang, 0)
            r = got[d.doc_id]
            assert (r.seq_id, r.seq_offset) == (s // SEQ_LEN, s % SEQ_LEN)
            n = budget(d)
            assert r.n_tokens == n
            assert r.straddles == (s // SEQ_LEN != (s + n - 1) // SEQ_LEN)
            starts[d.lang] = s + n

    def text_tokens(d):
        return len(d.text.split(" "))

    def media_tokens(d):
        return (1 + d.doc_id % 16) * IMG_TOKENS if d.doc_id % 5 == 0 else 0

    layout_check(pack_sequences(spark, SF).collect(), text_tokens)
    rows = pack_interleaved(spark, SF).collect()
    layout_check(rows, lambda d: text_tokens(d) + media_tokens(d))
    for r in rows:
        assert r.n_media_tokens == (
            (1 + r.doc_id % 16) * IMG_TOKENS if r.doc_id % 5 == 0 else 0
        )
    assert any(r.n_media_tokens for r in rows)  # media docs must exist
    assert any(r.straddles for r in rows)  # boundary case exercised


def test_decontaminate_bloom_prefilter_mechanism(spark):
    """The Bloom path must (a) produce EXACTLY the exact-overlap
    relation, (b) prefilter to a candidate set that is a superset of
    the hit docs but far smaller than the corpus, and (c) run the
    prefilter as a zero-Exchange narrow plan (the 100 TB point: the
    non-candidate majority never explodes into shingle rows)."""
    from freki_spark.functions.corpus_prep import (
        _bloom_candidates,
        _bloom_literal,
        _decon_bench,
        _decon_tokens,
        decontaminate_bloom,
        decontaminate_ngram,
    )

    exact = {tuple(r) for r in decontaminate_ngram(spark, SF).collect()}
    bloom = {tuple(r) for r in decontaminate_bloom(spark, SF).collect()}
    assert bloom == exact and exact  # identical relation, non-empty

    d = _decon_tokens(spark, SF)
    lit = _bloom_literal(_decon_bench(d))
    assert set(lit) <= {"0", "1"} and "1" in lit
    cand = _bloom_candidates(d, lit)
    cand_ids = {r.doc_id for r in cand.select("doc_id").collect()}
    hit_ids = {t[0] for t in exact}
    assert hit_ids <= cand_ids  # no false negatives, ever
    n_docs = d.count()
    assert len(cand_ids) < n_docs / 10  # the prefilter actually filters

    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cand.explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_decontaminate_flags_benchmark_seed_docs(spark):
    """Every doc that seeded a benchmark window must be reported as
    contaminated (it contains all of its own window's n-grams); docs
    sharing no 5-gram with any window are absent from the output."""
    from freki_spark.functions.corpus_prep import (
        DECON_BENCH_MOD,
        DECON_BENCH_REM,
        DECON_HIT_MIN,
        DECON_NGRAM,
        DECON_WIN_START,
        DECON_WINDOW,
        decontaminate_ngram,
    )

    rows = {r.doc_id: r for r in decontaminate_ngram(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    # independent python replica of the benchmark + hit count
    bench = set()
    for d in docs:
        if d.doc_id % DECON_BENCH_MOD != DECON_BENCH_REM:
            continue
        w = d.text.split(" ")[DECON_WIN_START - 1 : DECON_WIN_START - 1 + DECON_WINDOW]
        if len(w) == DECON_WINDOW:
            for i in range(len(w) - DECON_NGRAM + 1):
                bench.add(" ".join(w[i : i + DECON_NGRAM]))
    assert bench  # fixture must actually seed a benchmark
    seeds = 0
    for d in docs:
        tk = d.text.split(" ")
        grams = {
            " ".join(tk[i : i + DECON_NGRAM])
            for i in range(max(len(tk) - DECON_NGRAM + 1, 1))
        }
        n_hits = len(grams & bench)
        if n_hits == 0:
            assert d.doc_id not in rows
            continue
        r = rows[d.doc_id]
        assert r.n_hits == n_hits
        assert r.contaminated == int(n_hits >= DECON_HIT_MIN)
        if d.doc_id % DECON_BENCH_MOD == DECON_BENCH_REM and len(tk) >= (
            DECON_WIN_START + DECON_WINDOW - 1
        ):
            assert r.contaminated == 1
            seeds += 1
    assert seeds >= 1


def test_gopher_repetition_matches_naive_python(spark):
    from collections import Counter

    from freki_spark.functions.text_analysis import (
        REP_DUP_DEN,
        REP_TOP_DEN,
        gopher_repetition,
    )

    got = {r.doc_id: r for r in gopher_repetition(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(got) == len(docs)
    for d in docs:
        tk = d.text.split(" ")
        bgs = (
            [" ".join(tk[i : i + 2]) for i in range(len(tk) - 1)]
            if len(tk) > 1
            else [tk[0]]
        )
        c = Counter(bgs)
        n, top = len(bgs), max(c.values())
        dup = sum(v for v in c.values() if v >= 2)
        r = got[d.doc_id]
        assert (r.n_bigrams, r.top_cnt, r.n_distinct, r.dup_cnt) == (
            n, top, len(c), dup,
        )
        assert r.flagged == int(top * REP_TOP_DEN > n or dup * REP_DUP_DEN > n)


def test_dedup_components_cluster_mutants_with_originals(spark):
    from freki_spark.functions.dedup import dedup_components

    comp = {r.doc_id: r.comp for r in dedup_components(spark, SF).collect()}
    # every mutated copy (X+100000) appearing in the graph shares its
    # original's component
    linked = [d for d in comp if d >= 100000 and d - 100000 in comp]
    assert len(linked) >= 40
    assert all(comp[d] == comp[d - 100000] for d in linked)
    # label = the minimum member id of the component (fixed point)
    by_comp = {}
    for d, c in comp.items():
        by_comp.setdefault(c, []).append(d)
    for c, members in by_comp.items():
        assert c == min(members)


def test_pq_encode_codes_valid_and_compress(spark):
    """Every PQ code is a valid codebook index, and the codebook
    vectors themselves encode to (near-)zero reconstruction error on
    their own subvectors (their nearest codeword is themselves)."""
    from freki_spark.functions.similarity import (
        PQ_CODEBOOK_BASE,
        PQ_K,
        PQ_M,
        pq_encode,
    )

    rows = pq_encode(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        for s in range(PQ_M):
            assert 0 <= r[f"c{s}"] < PQ_K
    own = {r.vec_id: r for r in rows if PQ_CODEBOOK_BASE <= r.vec_id < PQ_CODEBOOK_BASE + PQ_K}
    assert len(own) == PQ_K
    for vid, r in own.items():
        for s in range(PQ_M):
            assert r[f"c{s}"] == vid - PQ_CODEBOOK_BASE


def test_ann_pq_recall_floor(spark):
    """ADC over 8x4-bit codes with a 16-sample codebook on random
    unit vectors is the hardest case for PQ (no cluster structure to
    exploit); measured recall@5 vs exact brute force on the fixture is
    recorded in the assertion floor — a regression in encode/
    reconstruct (wrong slice, off-by-one code index) craters it to
    ~1/N and fails loudly."""
    from freki_spark.functions.similarity import (
        TOP_K,
        ann_topk_bruteforce,
        ann_topk_pq,
    )

    bf, pq = {}, {}
    for r in ann_topk_bruteforce(spark, SF).collect():
        bf.setdefault(r.q_id, set()).add(r.vec_id)
    for r in ann_topk_pq(spark, SF).collect():
        pq.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(pq) == set(bf)
    recalls = [len(bf[q] & pq[q]) / TOP_K for q in bf]
    assert sum(recalls) / len(recalls) >= RECALL_FLOOR_PQ


def test_bpe_encode_matches_reference_encoder(spark):
    """The narrow replace-chain BPE must equal a classic
    repeat-lowest-rank BPE encoder (independent implementation) on the
    real corpus: token totals per doc and the first word's token
    sequence."""
    import re

    from freki_spark.functions.text_analysis import BPE_MERGES, bpe_encode

    ranks = {pair: i for i, pair in enumerate(BPE_MERGES)}

    def ref_encode(word):
        toks = list(word)
        while True:
            best = min(
                (ranks[p] for p in zip(toks, toks[1:]) if p in ranks),
                default=None,
            )
            if best is None:
                return toks
            a, b = BPE_MERGES[best]
            out, i = [], 0
            while i < len(toks):
                if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {r.doc_id: r for r in bpe_encode(spark, SF).collect()}
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        words = [w for w in re.sub(r"[^a-z]+", " ", text.lower()).split() if w]
        exp_tokens = sum(len(ref_encode(w)) for w in words)
        r = got[doc_id]
        assert r.n_words == len(words)
        assert r.n_tokens == exp_tokens
        exp_first = " ".join(ref_encode(words[0])) if words else ""
        assert r.first_tokens == exp_first


def test_media_dedup_flags_shared_bytes(spark):
    """Duplicate flags must reflect BYTE equality: refs sharing a blob
    group collapse to one canonical (the min ref), all others flagged."""
    from freki_spark.functions.multimodal import (
        MEDIA_CONTENT_GROUPS,
        media_dedup,
    )

    rows = media_dedup(spark, SF).collect()
    assert len(rows) > 0

    def group(ref):  # img://<doc_id>/0 -> blob group
        return int(ref.split("//")[1].split("/")[0]) % MEDIA_CONTENT_GROUPS

    by_group = {}
    for r in rows:
        by_group.setdefault(group(r.media_ref), []).append(r)
    assert any(len(v) > 1 for v in by_group.values())  # dups exist
    for grp in by_group.values():
        canon = min(r.media_ref for r in grp)
        for r in grp:
            assert r.canonical_ref == canon
            assert r.is_dup == int(r.media_ref != canon)


def test_sessionize_batch_matches_naive_python(spark):
    from datetime import timedelta

    from freki_spark.queries import q_sessionize_batch

    events = sorted(
        spark.read.parquet(f"{SF}/events.parquet").collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    exp = {}
    last_ts, sess_no = {}, {}
    for r in events:
        u = r.user_id
        if u not in last_ts or r.ts > last_ts[u] + timedelta(minutes=30):
            sess_no[u] = sess_no.get(u, 0) + 1
        last_ts[u] = r.ts
        key = (u, sess_no[u])
        st = exp.setdefault(key, {"n": 0, "v": 0.0, "lo": r.ts, "hi": r.ts})
        st["n"] += 1
        st["v"] += r.value
        st["lo"], st["hi"] = min(st["lo"], r.ts), max(st["hi"], r.ts)

    got = {(r.user_id, r.sess_no): r for r in q_sessionize_batch(spark, SF).collect()}
    assert set(got) == set(exp)
    for key, st in exp.items():
        r = got[key]
        assert (r.sess_start, r.sess_end, r.n_events) == (st["lo"], st["hi"], st["n"])
        assert abs(r.sess_value - st["v"]) < 1e-6


def test_salted_join_equals_unsalted(spark):
    """Salting must be result-invisible: the salted join's rows equal
    the plain unsalted join's."""
    from pyspark.sql import functions as F

    from freki_spark.queries import q_salted_join

    e = spark.read.parquet(f"{SF}/events.parquet")
    dim = e.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("user_total"))
    plain = {
        r.event_id: (r.user_total, r.value_share)
        for r in e.join(dim, "user_id")
        .select(
            "event_id",
            "user_total",
            F.round(F.col("value") / F.col("user_total"), 5).alias("value_share"),
        )
        .collect()
    }
    got = {r.event_id: (r.user_total, r.value_share) for r in q_salted_join(spark, SF).collect()}
    assert got == plain


def test_funnel_conversion_matches_naive_python(spark):
    """The 3-row funnel report must equal a brute-force per-user
    recompute of first-touch stage times (first view, first click
    strictly after it, first purchase strictly after that), and the
    funnel must be monotone non-increasing."""
    from freki_spark.queries import funnel_conversion

    users = {}
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        users.setdefault(r.user_id, []).append((r.ts, r.event_type))
    n1 = n2 = n3 = 0
    for evs in users.values():
        evs.sort()
        t1 = min((t for t, k in evs if k == "view"), default=None)
        t2 = (
            min((t for t, k in evs if k == "click" and t > t1), default=None)
            if t1
            else None
        )
        t3 = (
            min(
                (t for t, k in evs if k == "purchase" and t > t2),
                default=None,
            )
            if t2
            else None
        )
        n1 += t1 is not None
        n2 += t2 is not None
        n3 += t3 is not None
    n_total = len(users)

    got = {r.stage_no: r for r in funnel_conversion(spark, SF).collect()}
    assert [got[i].stage for i in (1, 2, 3)] == ["view", "click", "purchase"]
    assert [got[i].n_users for i in (1, 2, 3)] == [n1, n2, n3]
    assert got[1].conv_total_ppm == n1 * 1_000_000 // max(n_total, 1)
    assert got[2].conv_prev_ppm == n2 * 1_000_000 // max(n1, 1)
    assert got[3].conv_prev_ppm == n3 * 1_000_000 // max(n2, 1)
    assert n_total >= n1 >= n2 >= n3 > 0


def test_retention_cohort_matches_naive_python(spark):
    """Every (cohort_week, week_offset) cell must equal a brute-force
    python recompute (cohort = week of first event, activity = distinct
    user-weeks), offset 0 must retain 100% of every cohort, and offsets
    are never negative."""
    from freki_spark.queries import retention_cohort

    EPOCH = __import__("datetime").date(1970, 1, 1)
    weeks = {}
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        w = (r.ts.date() - EPOCH).days // 7
        weeks.setdefault(r.user_id, set()).add(w)
    cohort = {u: min(ws) for u, ws in weeks.items()}
    sizes = {}
    for c in cohort.values():
        sizes[c] = sizes.get(c, 0) + 1
    exp = {}
    for u, ws in weeks.items():
        for w in ws:
            key = (cohort[u], w - cohort[u])
            exp[key] = exp.get(key, 0) + 1

    rows = retention_cohort(spark, SF).collect()
    got = {(r.cohort_week, r.week_offset): r for r in rows}
    assert {k: r.n_active for k, r in got.items()} == exp
    for (cw, off), r in got.items():
        assert off >= 0
        assert r.cohort_size == sizes[cw]
        assert r.retention_ppm == r.n_active * 1_000_000 // max(
            r.cohort_size, 1
        )
        if off == 0:
            assert r.n_active == r.cohort_size  # week 0 retains everyone


def test_event_transitions_matches_naive_python(spark):
    """The transition matrix must equal a brute-force recompute over
    per-user (ts, event_id)-sorted streams, and each from-state's
    floor-ppm probabilities must sum to within |fanout| of 10^6."""
    from freki_spark.queries import event_transitions

    users = {}
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        users.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    exp = {}
    for evs in users.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            exp[(a, b)] = exp.get((a, b), 0) + 1
    totals = {}
    for (a, _), n in exp.items():
        totals[a] = totals.get(a, 0) + n

    rows = event_transitions(spark, SF).collect()
    got = {(r.from_type, r.to_type): r for r in rows}
    assert {k: r.n for k, r in got.items()} == exp
    by_from = {}
    for (a, _), r in got.items():
        assert r.from_total == totals[a]
        assert r.prob_ppm == r.n * 1_000_000 // r.from_total
        by_from.setdefault(a, []).append(r.prob_ppm)
    for a, ppms in by_from.items():
        assert 1_000_000 - len(ppms) < sum(ppms) <= 1_000_000


def test_rfm_segments_matches_naive_python(spark):
    """Every user's metrics and quartile scores must equal a
    brute-force recompute (numpy linear-interpolation percentiles —
    the same definition as Spark's exact `percentile` and DuckDB's
    `quantile_cont`), and all three score distributions must use the
    full 1–4 range on the fixture."""
    import numpy as np

    from freki_spark.queries import rfm_segments

    users = {}
    EPOCH = __import__("datetime").date(1970, 1, 1)
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        u = users.setdefault(r.user_id, {"days": [], "p": []})
        u["days"].append((r.ts.date() - EPOCH).days)
        if r.event_type == "purchase":
            u["p"].append(r.value)
    gday = max(d for u in users.values() for d in u["days"])
    met = {
        uid: (
            gday - max(u["days"]),
            len(u["p"]),
            int(round(sum(u["p"]) * 100)),
        )
        for uid, u in users.items()
    }
    qr = np.percentile([m[0] for m in met.values()], [25, 50, 75])
    qf = np.percentile([m[1] for m in met.values()], [25, 50, 75])
    qm = np.percentile([m[2] for m in met.values()], [25, 50, 75])

    rows = rfm_segments(spark, SF).collect()
    assert len(rows) == len(met)
    seen = {"r": set(), "f": set(), "m": set()}
    for r in rows:
        rec, freq, cents = met[r.user_id]
        assert (r.recency_days, r.frequency, r.monetary_cents) == (
            rec,
            freq,
            cents,
        )
        r_s = 1 + (rec <= qr[2]) + (rec <= qr[1]) + (rec <= qr[0])
        f_s = 1 + (freq >= qf[0]) + (freq >= qf[1]) + (freq >= qf[2])
        m_s = 1 + (cents >= qm[0]) + (cents >= qm[1]) + (cents >= qm[2])
        assert (r.r_score, r.f_score, r.m_score) == (r_s, f_s, m_s)
        assert r.segment == 100 * r_s + 10 * f_s + m_s
        seen["r"].add(r_s)
        seen["f"].add(f_s)
        seen["m"].add(m_s)
    # quartile ties on the 15-user fixture can merge adjacent buckets,
    # but each metric must still discriminate and stay in range
    assert all(len(s) >= 2 and s <= {1, 2, 3, 4} for s in seen.values())


def test_percentile_agg_matches_numpy(spark):
    import numpy as np

    from freki_spark.queries import q_percentile_agg

    rows = spark.read.parquet(f"{SF}/events.parquet").collect()
    vals = {}
    for r in rows:
        vals.setdefault(r.event_type, []).append(r.value)
    got = {r.event_type: r for r in q_percentile_agg(spark, SF).collect()}
    assert set(got) == set(vals)
    for et, v in vals.items():
        r = got[et]
        assert r.n == len(v)
        for col, q in (("p25", 25), ("p50", 50), ("p75", 75)):
            assert abs(r[col] - np.percentile(v, q)) < 1e-3


def test_knn_graph_matches_numpy_reference(spark):
    """Edge set must equal an independent numpy recompute: same-bucket
    candidates, cosine ranking, top-K directed edges."""
    import numpy as np

    from freki_spark.functions.similarity import (
        KNN_GRAPH_K,
        N_PLANES,
        _PLANE_W,
        knn_graph,
    )

    em = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    dim = len(next(iter(em.values())))
    planes = np.array([w[:dim] for w in _PLANE_W], dtype=np.float64)
    bucket = {
        vid: sum(1 << p for p in range(N_PLANES) if planes[p] @ v > 0)
        for vid, v in em.items()
    }
    by_bucket = {}
    for vid, b in bucket.items():
        by_bucket.setdefault(b, []).append(vid)

    exp = set()
    for vid, v in em.items():
        cands = [c for c in by_bucket[bucket[vid]] if c != vid]
        scored = sorted(
            (
                (-round(float(v @ em[c] / (np.linalg.norm(v) * np.linalg.norm(em[c]))), 5), c)
                for c in cands
            ),
        )[:KNN_GRAPH_K]
        exp.update((vid, c) for _, c in scored)

    got = {(r.vec_id, r.nbr_id) for r in knn_graph(spark, SF).collect()}
    assert got == exp
    assert all(a != b for a, b in got)  # no self-edges


def test_bitext_mine_matches_numpy_margin_recompute(spark):
    """The mined pair relation must equal an independent numpy/python
    recompute of the whole margin pipeline: hyperplane buckets,
    even x odd within-bucket candidates, HALF_UP integer micro-cosine,
    exact-bigint k=4 neighborhood sums, truncating margin division
    (Spark `div` semantics), best-per-source, margin > 1 gate.  Also
    proves the gate is non-vacuous on the fixture (some sources are
    rejected) and no source appears twice."""
    import math

    import numpy as np

    from freki_spark.functions.similarity import (
        BITEXT_K,
        BITEXT_MARGIN_MIN_PPM,
        N_PLANES,
        _PLANE_W,
        bitext_mine,
    )

    em = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    dim = len(next(iter(em.values())))
    planes = np.array([w[:dim] for w in _PLANE_W], dtype=np.float64)
    by_bucket = {}
    for vid, v in em.items():
        b = sum(1 << p for p in range(N_PLANES) if planes[p] @ v > 0)
        by_bucket.setdefault(b, []).append(vid)

    def cos_u(a, b):
        c = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))) * 100000
        return (
            int(math.floor(c + 0.5))
            if c >= 0
            else -int(math.floor(-c + 0.5))
        )

    pairs, fwd, bwd = {}, {}, {}
    for vids in by_bucket.values():
        srcs = [v for v in vids if v % 2 == 0]
        tgts = [v for v in vids if v % 2 == 1]
        for s in srcs:
            for t in tgts:
                cu = cos_u(em[s], em[t])
                pairs[(s, t)] = cu
                fwd.setdefault(s, []).append((cu, t))
                bwd.setdefault(t, []).append((cu, s))

    def knn(lst):
        top = sorted(lst, key=lambda x: (-x[0], x[1]))[:BITEXT_K]
        return sum(c for c, _ in top), len(top)

    def tdiv(a, b):  # Spark `div`: truncate toward zero (b > 0 here)
        return a // b if a >= 0 else -((-a) // b)

    margins = {}
    for (s, t), cu in pairs.items():
        sumf, nf = knn(fwd[s])
        sumb, nb = knn(bwd[t])
        den = sumf * nb + sumb * nf
        if den > 0:
            margins[(s, t)] = tdiv(cu * 2_000_000 * nf * nb, den)
    exp, rejected = set(), set()
    for s in {s for s, _ in margins}:
        cands = sorted(
            ((m, t) for (ss, t), m in margins.items() if ss == s),
            key=lambda x: (-x[0], x[1]),
        )
        m, t = cands[0]
        if m > BITEXT_MARGIN_MIN_PPM:
            exp.add((s, t, pairs[(s, t)], m))
        else:
            rejected.add(s)

    got = {
        (r.src_id, r.tgt_id, r.cos_u, r.margin_ppm)
        for r in bitext_mine(spark, SF).collect()
    }
    assert got == exp
    assert got, "fixture mined nothing"
    assert rejected, "margin gate never fired on the fixture"
    srcs = [s for s, *_ in got]
    assert len(srcs) == len(set(srcs))
    assert all(s % 2 == 0 and t % 2 == 1 for s, t, *_ in got)


def test_url_normalize_canonical_form(spark):
    """Every canonical URL must drop the fragment, tracking params,
    default port and www, lowercase the host, and preserve path case;
    per-domain counts must sum to the corpus."""
    from freki_spark.functions.corpus_prep import url_normalize

    docs = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    rows = url_normalize(spark, SF).collect()
    assert len(rows) == len(docs)
    dom_count = {}
    for src in docs.values():
        d = f"{src.lower()}.example.com"
        dom_count[d] = dom_count.get(d, 0) + 1
    for r in rows:
        src = docs[r.doc_id]
        assert r.domain == f"{src.lower()}.example.com"
        assert r.url_canon == (
            f"https://{src.lower()}.example.com/Articles/{r.doc_id}/?id={r.doc_id % 7}"
        )
        assert r.n_urls == dom_count[r.domain]


def test_url_dedup_collapses_all_variants(spark):
    """Every crawled variant (WWW-host, utm-decorated, fragment-
    carrying) of the same article must collapse to ONE closed-form
    canonical URL, and the keeper must be the lowest doc_id of the
    article's variant set — recomputed independently in python."""
    from freki_spark.functions.corpus_prep import URL_DEDUP_ARTICLES, url_dedup

    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    by_article = {}
    for did in doc_ids:
        by_article.setdefault(did % URL_DEDUP_ARTICLES, []).append(did)
    assert any(len(v) > 1 for v in by_article.values()), "no URL collisions"

    rows = url_dedup(spark, SF).collect()
    assert len(rows) == len(doc_ids)
    n_kept = 0
    for r in rows:
        art = r.doc_id % URL_DEDUP_ARTICLES
        # all decoration must be gone: the canonical form is closed-form
        assert r.url_canon == f"https://site{art % 17}.example.com/a/{art}"
        assert r.keeper_id == min(by_article[art])
        assert r.kept == (1 if r.doc_id == r.keeper_id else 0)
        n_kept += r.kept
    assert n_kept == len(by_article)


def test_corpus_stats_rollup_levels_consistent(spark):
    """Detail rows must sum to their lang subtotal, lang subtotals to
    the grand total, buckets must equal the python bit-length of
    n_chars, and min/max must bracket every detail bucket."""
    from freki_spark.functions.corpus_prep import corpus_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    rows = corpus_stats(spark, SF).collect()
    detail = [r for r in rows if r.lvl == 0]
    langs = {r.lang: r for r in rows if r.lvl == 1}
    grand = [r for r in rows if r.lvl == 3]
    assert len(grand) == 1 and grand[0].lang == "(all)"
    assert grand[0].n_docs == len(docs)
    assert grand[0].sum_chars == sum(d.n_chars for d in docs)
    exp_buckets = {}
    for d in docs:
        exp_buckets.setdefault((d.lang, d.n_chars.bit_length()), []).append(
            d.n_chars
        )
    assert {(r.lang, r.len_bucket) for r in detail} == set(exp_buckets)
    for r in detail:
        vals = exp_buckets[(r.lang, r.len_bucket)]
        assert (r.n_docs, r.sum_chars) == (len(vals), sum(vals))
        assert (r.min_chars, r.max_chars) == (min(vals), max(vals))
    for lang, sub in langs.items():
        ds = [r for r in detail if r.lang == lang]
        assert sub.n_docs == sum(r.n_docs for r in ds)
        assert sub.sum_chars == sum(r.sum_chars for r in ds)
    assert sum(r.n_docs for r in langs.values()) == grand[0].n_docs


def test_quality_vote_composes_component_ops(spark):
    """The ensemble must equal a python recombination of the three
    STANDALONE component ops' outputs (2-of-3 majority over gopher
    keep, classifier keep, bucket != 'tail') — pinning that the fused
    Spark side cannot drift from the components; the vote must also
    actually change verdicts vs each single signal."""
    from freki_spark.functions.text_analysis import (
        QVOTE_MIN,
        gopher_quality,
        perplexity_bucket,
        quality_classifier,
        quality_vote,
    )

    g = {r.doc_id: r.keep for r in gopher_quality(spark, SF).collect()}
    c = {r.doc_id: r.keep for r in quality_classifier(spark, SF).collect()}
    p = {
        r.doc_id: int(r.bucket != "tail")
        for r in perplexity_bucket(spark, SF).collect()
    }
    rows = {r.doc_id: r for r in quality_vote(spark, SF).collect()}
    assert set(rows) == set(g) & set(c) & set(p)
    disagree = 0
    for did, r in rows.items():
        assert (r.gopher_ok, r.cls_ok, r.ppl_ok) == (g[did], c[did], p[did])
        assert r.votes == g[did] + c[did] + p[did]
        assert r.keep == int(r.votes >= QVOTE_MIN)
        if r.keep not in (g[did], c[did], p[did]):
            disagree += 1  # unreachable for majority vote; keep honest
        if (g[did], c[did], p[did]) not in ((0, 0, 0), (1, 1, 1)):
            disagree += 1
    assert disagree > 0, "signals never disagree — ensemble is vacuous"
    kept = {d for d, r in rows.items() if r.keep}
    assert kept != {d for d in rows if g[d]}, "vote == gopher alone"
    assert kept != {d for d in rows if c[d]}, "vote == classifier alone"
    assert kept != {d for d in rows if p[d]}, "vote == perplexity alone"


def test_caption_mine_matches_golden_walk(spark):
    """Walk the committed golden spans per doc in offset order in
    python and recompute each media span's nearest line body before
    and after; every mined pair must match, every media span must be
    mined, and both empty-caption edges (media first/last in doc)
    must be exercised by the fixtures or explicitly absent."""
    import json
    import re as _re

    from freki_spark.queries import GOLDEN_JSONL, _SPACING_RE, q_caption_mine

    spans = [json.loads(line) for line in open(GOLDEN_JSONL)]
    by_doc = {}
    for s in spans:
        if s["kind"] in ("media", "line"):
            by_doc.setdefault(s["doc_id"], []).append(s)
    exp = {}
    for did, ss in by_doc.items():
        ss.sort(key=lambda s: (s["offset"], s["kind"]))
        for i, s in enumerate(ss):
            if s["kind"] != "media":
                continue
            cb = ca = ""
            for t in reversed(ss[:i]):
                if t["kind"] == "line":
                    cb = _re.sub(_SPACING_RE, "", t["text"])
                    break
            for t in ss[i + 1 :]:
                if t["kind"] == "line":
                    ca = _re.sub(_SPACING_RE, "", t["text"])
                    break
            exp[(did, s["media_ref"], s["offset"])] = (cb, ca)

    got = {
        (r.doc_id, r.media_ref, r.offset): (r.cap_before, r.cap_after)
        for r in q_caption_mine(spark, None).collect()
    }
    assert got == exp
    assert exp, "no media spans in goldens"
    assert any(cb for cb, _ in exp.values()), "no before-captions"
    assert any(ca for _, ca in exp.values()), "no after-captions"


def test_robots_filter_matches_naive_python(spark):
    """Independent recompute of the robots verdicts: re-derive each
    domain's ruleset from raw hashlib md5 (not the op's table), apply
    prefix matching in python, and compare every verdict.  All three
    outcomes must occur: blocked by /private/, blocked by /archive/
    (hash-gated), and /archive/ ALLOWED on domains without the rule."""
    import hashlib

    from freki_spark.functions.corpus_prep import robots_filter

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = robots_filter(spark, SF).collect()
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    assert len(rows) == len(docs)
    srcs = {r.doc_id: r.source for r in docs}
    outcomes = set()
    for r in rows:
        did = r.doc_id
        tld = ["com", "org", "net"][did % 3]
        exp_domain = f"{srcs[did]}-site.{tld}"
        assert r.domain == exp_domain
        prefix = ["/page/", "/private/", "/archive/"][did % 3]
        assert r.path == f"{prefix}{did}"
        has_archive = h32(f"rob/{r.domain}") % 2 == 0
        assert r.n_rules == (2 if has_archive else 1)
        exp_allowed = 0 if (
            r.path.startswith("/private/")
            or (has_archive and r.path.startswith("/archive/"))
        ) else 1
        assert r.allowed == exp_allowed
        if r.path.startswith("/private/"):
            outcomes.add("private_blocked")
        elif r.path.startswith("/archive/"):
            outcomes.add(
                "archive_blocked" if not r.allowed else "archive_allowed"
            )
    assert outcomes == {"private_blocked", "archive_blocked", "archive_allowed"}


def test_link_graph_matches_python_re_extraction(spark):
    """Rebuild every page's HTML in python, re-extract hrefs with
    python `re` (independent of both the Spark regex and the
    closed-form oracle), resolve and aggregate — edge sets and counts
    must match exactly; internal and external edges must both occur."""
    import re as _re

    from freki_spark.functions.corpus_prep import LINK_HREF_RE, link_graph

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    exp = {}
    for r in docs:
        tld = ["com", "org", "net"][r.doc_id % 3]
        src = f"{r.source}-site.{tld}"
        html = (
            '<html><body><nav><a href="/">Home</a> '
            '<a href="/about">About</a></nav><p>' + r.text
        )
        for j in (1, 2, 3):
            if r.doc_id % 3 + 1 >= j:
                html += (
                    f'<a href="http://dst{(r.doc_id + j * 31) % 23}'
                    f'-hub.com/p/{j}">ref {j}</a>'
                )
        html += "</p></body></html>"
        for href in _re.findall(LINK_HREF_RE, html):
            dst = (
                src
                if href.startswith("/")
                else _re.match(r"^https?://([^/]+)", href).group(1)
            )
            exp[(src, dst)] = exp.get((src, dst), 0) + 1

    got = {
        (r.src_domain, r.dst_domain): r.n_links
        for r in link_graph(spark, SF).collect()
    }
    assert got == exp
    assert any(s == d for s, d in got), "no internal edges"
    assert any(d.endswith("-hub.com") for _, d in got), "no external edges"


def test_anchor_text_matches_python_re_extraction(spark):
    """Rebuild every page's HTML in python, re-extract (href, anchor)
    PAIRS with python `re` (independent of both the Spark two-group
    zip and the closed-form oracle), resolve, aggregate, and rank —
    the top-3-per-destination relation must match exactly; internal
    nav anchors and external ref anchors must both survive ranking."""
    import re as _re

    from freki_spark.functions.corpus_prep import (
        ANCHOR_RE,
        ANCHOR_TOPK,
        anchor_text,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    counts = {}
    for r in docs:
        tld = ["com", "org", "net"][r.doc_id % 3]
        src = f"{r.source}-site.{tld}"
        html = (
            '<html><body><nav><a href="/">Home</a> '
            '<a href="/about">About</a></nav><p>' + r.text
        )
        for j in (1, 2, 3):
            if r.doc_id % 3 + 1 >= j:
                lbl = f"ref {j}" if r.doc_id % 2 == 0 else f"link {j}"
                html += (
                    f'<a href="http://dst{(r.doc_id + j * 31) % 23}'
                    f'-hub.com/p/{j}">{lbl}</a>'
                )
        html += "</p></body></html>"
        for href, anchor in _re.findall(ANCHOR_RE, html):
            dst = (
                src
                if href.startswith("/")
                else _re.match(r"^https?://([^/]+)", href).group(1)
            )
            counts[(dst, anchor)] = counts.get((dst, anchor), 0) + 1

    exp = set()
    by_dst = {}
    for (dst, anchor), n in counts.items():
        by_dst.setdefault(dst, []).append((anchor, n))
    capped = False
    for dst, lst in by_dst.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        capped = capped or len(lst) > ANCHOR_TOPK
        for rk, (anchor, n) in enumerate(lst[:ANCHOR_TOPK], 1):
            exp.add((dst, anchor, n, rk))
    assert capped, "fixture never exercises the top-k anchor cap"

    got = {
        (r.dst_domain, r.anchor, r.n, r.rk)
        for r in anchor_text(spark, SF).collect()
    }
    assert got == exp
    assert any(a in ("Home", "About") for _, a, _, _ in got), "no nav anchors"
    assert any(a.startswith("ref ") for _, a, _, _ in got), "no ref anchors"


def test_line_dedup_matches_naive_python(spark):
    """Full independent recompute of the within-doc repetition removal:
    synthesize the line structure in plain python (fixed-width lines,
    footer cadence, dup-of-line-1), dedup preserving first occurrence,
    and compare every output column; both keep verdicts must occur."""
    from freki_spark.functions.corpus_prep import (
        LINEDUP_MAX_REMOVED_PCT,
        LINEDUP_W,
        line_dedup,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    rows = {r.doc_id: r for r in line_dedup(spark, SF).collect()}
    assert set(rows) == set(docs)
    verdicts = set()
    for did, tk in docs.items():
        fe = 3 + did % 5
        footer = f"copyright site{did % 7} all rights reserved"
        n0 = -(-len(tk) // LINEDUP_W)
        lines = []
        for i in range(1, n0 + 1):
            lines.append(" ".join(tk[(i - 1) * LINEDUP_W : i * LINEDUP_W]))
            if i % fe == 0:
                lines.append(footer)
        if did % 11 == 0:
            lines.append(" ".join(tk[:LINEDUP_W]))
        seen, kept = set(), []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        r = rows[did]
        assert r.n_lines == len(lines)
        assert r.n_removed == len(lines) - len(kept)
        exp_keep = int(
            r.n_removed * 100 <= LINEDUP_MAX_REMOVED_PCT * len(lines)
        )
        assert r.keep == exp_keep
        assert r.text_out == " | ".join(kept)
        verdicts.add(r.keep)
        if n0 >= fe:  # at least one footer injected → repeats exist
            assert r.n_removed >= n0 // fe - 1
    assert verdicts == {0, 1}, "threshold must split the corpus"


def test_dup_span_detect_matches_naive_python(spark):
    """Maximal duplicated word-spans must equal a naive recompute that
    uses RAW SHINGLE STRINGS (no hashing) — independently pinning the
    flat-map positions, the cross-doc dup set, and the interval merge."""
    from freki_spark.functions.dedup import DUPSPAN_N, dup_span_detect

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    occ = {}
    for doc_id, ws in docs.items():
        for p in range(len(ws) - DUPSPAN_N + 1):
            occ.setdefault(" ".join(ws[p : p + DUPSPAN_N]), set()).add(doc_id)
    dup = {s for s, ds in occ.items() if len(ds) >= 2}
    exp = set()
    for doc_id, ws in docs.items():
        hits = [
            p + 1  # 1-based, as the operator emits
            for p in range(len(ws) - DUPSPAN_N + 1)
            if " ".join(ws[p : p + DUPSPAN_N]) in dup
        ]
        start = prev = None
        n = 0
        for p in hits:
            if prev is None or p > prev + DUPSPAN_N:
                if prev is not None:
                    exp.add((doc_id, start, prev + DUPSPAN_N - 1, n))
                start, n = p, 0
            prev = p
            n += 1
        if prev is not None:
            exp.add((doc_id, start, prev + DUPSPAN_N - 1, n))

    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_hits)
        for r in dup_span_detect(spark, SF).collect()
    }
    assert got == exp
    assert exp  # fixture must actually contain cross-doc duplicates


def test_dup_span_remove_cuts_exactly_the_detected_intervals(spark):
    """clean_text must equal the raw tokens with every dup_span_detect
    interval excised (recomputed in python from the detect output +
    the raw text — independent of the op's array kernel), n_cut must
    account for them, and docs with no interval must pass through
    byte-identical.  Fully-cut docs yield '' (never NULL)."""
    from freki_spark.functions.dedup import dup_span_detect, dup_span_remove

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    ivls = {}
    for r in dup_span_detect(spark, SF).collect():
        ivls.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    got = {r.doc_id: r for r in dup_span_remove(spark, SF).collect()}
    assert set(got) == set(docs)  # one row per document, always
    touched = full_cut = 0
    for doc_id, ws in docs.items():
        keep = [
            w
            for i, w in enumerate(ws, start=1)
            if not any(a <= i <= b for a, b in ivls.get(doc_id, []))
        ]
        r = got[doc_id]
        assert r.clean_text == " ".join(keep)
        assert r.n_cut == len(ws) - len(keep)
        if doc_id in ivls:
            touched += 1
            if not keep:
                full_cut += 1
                assert r.clean_text == ""
    assert touched  # fixture must exercise real cuts
    assert full_cut  # ... including the everything-duplicated doc


def test_canon_url_mechanism_adversarial(spark):
    """The canonicalization mechanism on inputs the synthesized corpus
    never produces: consecutive leading utm params, all-utm queries,
    no query, utm-only trailing, mixed positions — no dangling '?',
    no eaten delimiters (prior review found both bugs)."""
    from pyspark.sql import functions as F

    from freki_spark.functions.corpus_prep import canon_url

    cases = {
        "https://x.com/?utm_a=1&utm_b=2&id=3": "https://x.com/?id=3",
        "https://x.com/?utm_a=1&utm_b=2": "https://x.com/",
        "https://x.com/?utm_a=1": "https://x.com/",
        "https://x.com/?id=3&utm_a=1&id2=4": "https://x.com/?id=3&id2=4",
        "https://x.com/path": "https://x.com/path",
        "HTTPS://WWW.X.com:443/CaseKept?id=1#f": "https://x.com/CaseKept?id=1",
        "http://x.com:80": "http://x.com",
        "http://x.com:8080/a?utm_z=9&b=2": "http://x.com:8080/a?b=2",
    }
    df = spark.createDataFrame([(u,) for u in cases], ["url"])
    got = {r.url: r.canon for r in df.select("url", canon_url(F.col("url")).alias("canon")).collect()}
    assert got == cases

    # idempotence: canonicalizing a canonical URL is a no-op (the
    # property that makes url_dedup keys stable across re-crawls of
    # already-canonical URLs)
    twice = {
        r.url: r.c2
        for r in df.select(
            "url", canon_url(canon_url(F.col("url"))).alias("c2")
        ).collect()
    }
    assert twice == cases

    # cross-engine: the DuckDB mirror (_sql_canon, shared by the
    # url_normalize and url_dedup oracles) must agree on every
    # adversarial input, not just on the synthesized corpus
    import duckdb

    from freki_spark.functions.corpus_prep import _sql_canon

    vals = ", ".join(f"('{u}')" for u in cases)
    duck = dict(
        duckdb.sql(
            f"SELECT u, {_sql_canon('u')} FROM (VALUES {vals}) t(u)"
        ).fetchall()
    )
    assert duck == cases


def test_gopher_quality_matches_naive_python(spark):
    """Every stat and rule flag recomputed naively (Counter over the
    raw text), including the narrow sorted-run top-unigram count —
    the one expression a regression (off-by-one run reset, sentinel
    collision) would silently skew."""
    from collections import Counter

    from freki_spark.functions.text_analysis import (
        GOPHER_MEANLEN_HI,
        GOPHER_MEANLEN_LO,
        GOPHER_MIN_STOP,
        GOPHER_MIN_WORDS,
        GOPHER_MAX_WORDS,
        GOPHER_TOPWORD_DEN,
        STOPWORDS,
        gopher_quality,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {r.doc_id: r for r in gopher_quality(spark, SF).collect()}
    assert set(got) == set(docs)
    kept, dropped = 0, 0
    for doc_id, text in docs.items():
        words = text.split(" ")
        n = len(words)
        char_sum = sum(len(w) for w in words)
        stop = sum(1 for w in words if w in STOPWORDS)
        top = max(Counter(words).values())
        r = got[doc_id]
        assert (r.n_words, r.char_sum, r.stop_hits, r.top_cnt) == (
            n, char_sum, stop, top,
        )
        exp_keep = int(
            GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS
            and GOPHER_MEANLEN_LO * n <= char_sum <= GOPHER_MEANLEN_HI * n
            and stop >= GOPHER_MIN_STOP
            and top * GOPHER_TOPWORD_DEN <= n
        )
        assert r.keep == exp_keep
        assert r.keep == (r.ok_words and r.ok_meanlen and r.ok_stop and r.ok_topword)
        kept += exp_keep
        dropped += 1 - exp_keep
    # the filter must actually split the corpus, else the test is vacuous
    assert kept > 0 and dropped > 0


def test_shuffle_deterministic_is_bijective_permutation(spark, monkeypatch):
    """pos must be a dense permutation 0..n-1 equal to the GLOBAL rank
    of the seeded hash — the shard decomposition must be invisible:
    re-running with a different shard count (monkeypatched bits) must
    produce the identical permutation."""
    import hashlib

    import freki_spark.functions.corpus_prep as cp

    rows = cp.shuffle_deterministic(spark, SF).collect()
    n = len(rows)
    assert sorted(r.pos for r in rows) == list(range(n))
    # independent recompute: python md5 ranks, NO shard term — the
    # contract is the pure (key, doc_id) order
    def key(doc_id):
        h = hashlib.md5(f"shuffle:{cp.SHUFFLE_SEED}:{doc_id}".encode()).hexdigest()
        return int(h[:8], 16)

    exp_order = sorted((r.doc_id for r in rows), key=lambda d: (key(d), d))
    got_order = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
    assert got_order == exp_order
    for r in rows:
        assert r.shuffle_key == key(r.doc_id)
        assert r.shard == key(r.doc_id) >> (32 - cp.SHUFFLE_SHARD_BITS)
    # shard count is a parallelism dial, not a semantics dial: 8
    # shards must yield the same doc_id -> pos map as 64
    monkeypatch.setattr(cp, "SHUFFLE_SHARD_BITS", 3)
    alt = {r.doc_id: r.pos for r in cp.shuffle_deterministic(spark, SF).collect()}
    assert alt == {r.doc_id: r.pos for r in rows}


def test_star_contract_long_chain_and_agreement(spark):
    """large-star/small-star must label a 96-node CHAIN — the graph
    shape where min-label propagation needs O(n) rounds — within the
    O(log^2 n) iteration cap, and cc_bigstar must agree label-for-label
    with dedup_components on the corpus graph (same min-id contract)."""
    from freki_spark.functions.dedup import (
        cc_bigstar,
        dedup_components,
        star_contract,
    )

    # chain 0-1-2-...-95 plus a disjoint triangle {500, 501, 502}
    chain = [(i, i + 1) for i in range(95)]
    tri = [(500, 501), (501, 502), (500, 502)]
    edges = spark.createDataFrame(chain + tri, ["a", "b"])
    lab = {r.doc_id: r.comp for r in star_contract(edges).collect()}
    assert all(lab[i] == 0 for i in range(96))
    assert all(lab[i] == 500 for i in (500, 501, 502))
    assert len(lab) == 99

    want = {(r.doc_id, r.comp) for r in dedup_components(spark, SF).collect()}
    got = {(r.doc_id, r.comp) for r in cc_bigstar(spark, SF).collect()}
    assert got == want


def test_badword_filter_matches_naive(spark):
    """Unigram hits, bigram-position phrase counts (overlap-safe), hard
    word, and the ratio rule all recomputed naively per doc."""
    from freki_spark.functions.text_analysis import (
        BAD_DEN,
        BAD_HARD,
        BAD_PHRASE,
        BAD_WORDS,
        badword_filter,
    )

    docs = {
        r.doc_id: r.text.split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = {r.doc_id: r for r in badword_filter(spark, SF).collect()}
    assert set(got) == set(docs)
    n_flag = n_hard = n_phr = 0
    for doc_id, words in docs.items():
        n_bad = sum(1 for w in words if w in BAD_WORDS)
        n_phrase = sum(
            1
            for i in range(len(words) - 1)
            if (words[i], words[i + 1]) == BAD_PHRASE
        )
        has_hard = int(BAD_HARD in words)
        flagged = int(
            has_hard or n_phrase > 0 or n_bad * BAD_DEN > len(words)
        )
        r = got[doc_id]
        assert (r.n_words, r.n_bad, r.n_phrase, r.has_hard, r.flagged) == (
            len(words), n_bad, n_phrase, has_hard, flagged,
        )
        n_flag += flagged
        n_hard += has_hard
        n_phr += int(n_phrase > 0)
    # every rule class must fire somewhere, and the filter must split
    assert n_hard > 0 and n_phr > 0 and 0 < n_flag < len(docs)


def test_mixture_sample_exact_and_balanced(spark):
    """The kept set is exactly the closed-form rule (md5 % n_lang <
    min-lang count) and every language lands at ~target size."""
    import hashlib
    from collections import Counter

    from freki_spark.functions.corpus_prep import MIX_SEED, mixture_sample

    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    langs = {r.doc_id: r.lang for r in base.collect()}
    n_lang = Counter(langs.values())
    target = min(n_lang.values())

    def key(doc_id):
        return int(hashlib.md5(f"{MIX_SEED}{doc_id}".encode()).hexdigest()[:8], 16)

    exp = {
        d: key(d) % n_lang[l]
        for d, l in langs.items()
        if key(d) % n_lang[l] < target
    }
    got = {r.doc_id: r for r in mixture_sample(spark, SF).collect()}
    assert {d: r.bucket for d, r in got.items()} == exp
    kept = Counter(langs[d] for d in got)
    # the smallest language is kept whole; every language is sampled
    # (non-empty, never above its corpus count) and the biggest
    # language really was downsampled
    assert kept[min(n_lang, key=n_lang.get)] == target
    for lang, k in kept.items():
        assert 0 < k <= n_lang[lang]
    big = max(n_lang, key=n_lang.get)
    assert kept[big] < n_lang[big]


def test_dedup_keep_partitions_the_corpus(spark):
    """dedup_keep must emit exactly one row per corpus doc; within
    every dup cluster exactly the canonical keeper is kept; every doc
    outside the pair graph is kept; dropped docs are precisely the
    non-keeper cluster members."""
    from freki_spark.functions.dedup import (
        _near_dup_corpus,
        dedup_canonical,
        dedup_components,
        dedup_keep,
    )

    corpus_ids = {r.doc_id for r in _near_dup_corpus(spark, SF).collect()}
    rows = dedup_keep(spark, SF).collect()
    assert len(rows) == len(corpus_ids)
    kept = {r.doc_id: r.kept for r in rows}
    assert set(kept) == corpus_ids
    comp_of = {r.doc_id: r.comp for r in dedup_components(spark, SF).collect()}
    keepers = {r.keeper for r in dedup_canonical(spark, SF).collect()}
    for d in corpus_ids:
        if d not in comp_of:
            assert kept[d] == 1  # untouched docs always survive
        else:
            assert kept[d] == (1 if d in keepers else 0)
    assert 0 in kept.values()  # the fixture must exercise drops


def test_dedup_canonical_keeps_longest_member(spark):
    """Per component: keeper = member with max tokens (min doc_id on
    ties), membership counts and token sums recomputed naively from
    the components output and the near-dup corpus."""
    from freki_spark.functions.dedup import (
        _near_dup_corpus,
        dedup_canonical,
        dedup_components,
    )

    # len(''.split(' ')) == 1 matches both engines' size(split(...))
    # semantics for empty text — no special-casing
    ntok = {
        r.doc_id: len(r.text.split(" "))
        for r in _near_dup_corpus(spark, SF).collect()
    }
    comp_of = {r.doc_id: r.comp for r in dedup_components(spark, SF).collect()}
    members = {}
    for d, c in comp_of.items():
        members.setdefault(c, []).append(d)
    got = {r.comp: r for r in dedup_canonical(spark, SF).collect()}
    assert set(got) == set(members)
    for c, mem in members.items():
        best = max(mem, key=lambda d: (ntok[d], -d))
        r = got[c]
        assert r.keeper == best
        assert r.n_members == len(mem)
        assert r.kept_tokens == max(ntok[d] for d in mem)
        assert r.dropped_tokens == sum(ntok[d] for d in mem) - r.kept_tokens
    # at least one component must have a genuine length difference,
    # else the longest-member rule is untested
    assert any(
        len({ntok[d] for d in mem}) > 1 for mem in members.values()
    )


def test_pagerank_matches_naive_integer_reference(spark):
    """Exact integer fixed-point PageRank recomputed in pure python
    from the same deterministic edge rule — every rank must match
    bit-for-bit (no float tolerance: the op is all-integer)."""
    import hashlib

    from freki_spark.functions.graph import (
        PR_BASE,
        PR_D_DEN,
        PR_D_NUM,
        PR_FANOUT,
        PR_ITERS,
        PR_SCALE,
        pagerank_iter,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(docs)
    targets = {
        d: [
            t
            for t in dict.fromkeys(
                h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
            )
            if t != d
        ]
        for d in docs
    }
    rank = {d: PR_SCALE for d in docs}
    for _ in range(PR_ITERS):
        insum = {d: 0 for d in docs}
        for d, ts in targets.items():
            if ts:
                c = rank[d] // len(ts)
                for t in ts:
                    insum[t] += c
        rank = {d: PR_BASE + PR_D_NUM * insum[d] // PR_D_DEN for d in docs}

    rows = pagerank_iter(spark, SF).collect()
    assert len(rows) == n
    for r in rows:
        assert r.rank == rank[r.doc_id], r.doc_id
        assert r.out_deg == len(targets[r.doc_id])
    # the graph must actually discriminate (not all equal ranks)
    assert len({r.rank for r in rows}) > n // 2


def test_lexical_diversity_matches_naive_python(spark):
    from collections import Counter

    from freki_spark.functions.text_analysis import lexical_diversity

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    for r in lexical_diversity(spark, SF).collect():
        cnt = Counter(texts[r.doc_id].split(" "))
        n = sum(cnt.values())
        u = len(cnt)
        rep = sum(c * (c - 1) for c in cnt.values())
        assert r.n_tokens == n
        assert r.n_distinct == u
        assert r.rep_mass == rep
        assert r.ttr_x1e4 == u * 10000 // n
        assert r.pairs == n * (n - 1)
        assert r.simpson_x1e4 == (rep * 10000 // (n * (n - 1)) if n > 1 else 0)


def test_paragraph_dedup_first_occurrence_semantics(spark):
    """Naive recompute of the CCNet keep-first rule over the near-dup
    corpus; also asserts real cross-doc duplicate paragraphs exist
    (mutant copies guarantee them), else the op is untested."""
    from freki_spark.functions.dedup import (
        PARA_W,
        _near_dup_corpus,
        paragraph_dedup,
    )

    texts = {r.doc_id: r.text for r in _near_dup_corpus(spark, SF).collect()}
    paras = {}  # doc -> [para]
    for d, t in texts.items():
        tk = t.split(" ")
        paras[d] = [
            " ".join(tk[i : i + PARA_W]) for i in range(0, len(tk), PARA_W)
        ]
    first = {}  # para -> (doc, pos)
    for d in sorted(paras):
        for p, para in enumerate(paras[d]):
            if para not in first or (d, p) < first[para]:
                first[para] = (d, p)
    got = {r.doc_id: r for r in paragraph_dedup(spark, SF).collect()}
    assert set(got) == set(texts)
    cross_doc_dups = 0
    for d, plist in paras.items():
        kept = [p for i, p in enumerate(plist) if first[p] == (d, i)]
        r = got[d]
        assert r.n_paras == len(plist)
        assert r.n_kept == len(kept)
        assert r.text_kept == " ".join(kept)
        cross_doc_dups += len(plist) - len(kept)
    assert cross_doc_dups > 50  # mutants share chunk-aligned prefixes


def test_text_normalize_nfc_and_whitespace(spark):
    """Recompute the dirty->clean transform with python unicodedata;
    also asserts the dirty variant really contains combining marks and
    NBSP/ZWSP (mechanism exercised, not a no-op)."""
    import re
    import unicodedata

    from freki_spark.functions.corpus_prep import (
        COMB_ACUTE,
        NBSP,
        ZWSP,
        text_normalize,
    )

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def dirty(t):
        d = t.replace(" a ", f" a{COMB_ACUTE} ")
        return d.replace(" row ", f"{NBSP}row{ZWSP} ")

    saw_acute = saw_nbsp = 0
    for r in text_normalize(spark, SF).collect():
        d = dirty(texts[r.doc_id])
        saw_acute += COMB_ACUTE in d
        saw_nbsp += NBSP in d
        clean = unicodedata.normalize("NFC", d)
        clean = clean.replace(NBSP, " ").replace(ZWSP, "")
        clean = re.sub(" +", " ", clean).strip()
        assert r.n_chars_dirty == len(d)
        assert r.n_chars_clean == len(clean)
        assert r.text_clean == clean
        assert COMB_ACUTE not in clean and NBSP not in clean
    assert saw_acute > 20 and saw_nbsp > 20


def test_first_occurrence_election_no_capacity_cliff(spark):
    """The first-occurrence election must follow true (doc_id, pos)
    tuple order with no fold-key collisions.  (7, 100000) vs (8, 0) is
    exactly the pair the old ``doc_id * 100_000 + pos`` fold mapped to
    the SAME key (both 800000) — a mega-doc with >= 100k paragraphs —
    which tied the election and flagged both rows kept."""
    from pyspark.sql import functions as F

    from freki_spark.functions.dedup import _first_occurrence

    e = spark.createDataFrame(
        [(7, 100_000, 42), (8, 0, 42), (9, 1, 42), (5, 3, 99)],
        "doc_id long, pos int, h long",
    )
    joined, kept = _first_occurrence(e)
    rows = joined.select("doc_id", "pos", kept.alias("kept")).collect()
    kept_rows = sorted((r.doc_id, r.pos) for r in rows if r.kept == 1)
    assert kept_rows == [(5, 3), (7, 100_000)]
    assert sum(r.kept for r in rows) == 2  # exactly one winner per hash


def _naive_dehyph(lines):
    """Python reference of the generic dehyphenation kernel (same
    rules as corpus_prep._dehyph_pieces, independently written)."""
    n = len(lines)

    def mrg(i):  # 1-based: line i merges into line i+1
        if not (1 <= i < n):
            return False
        cur, nxt = lines[i - 1], lines[i]
        head = nxt[:1]
        return (
            cur.endswith("-")
            and len(cur.split(" ")[-1]) >= 2
            and head != ""
            and "a" <= head <= "z"
        )

    pieces = []
    for i in range(1, n + 1):
        base = lines[i - 1]
        if mrg(i - 1):
            parts = base.split(" ")
            base = " ".join(parts[1:]) if len(parts) > 1 else ""
        if mrg(i):
            base = base[:-1] + lines[i].split(" ")[0]
        if base != "":
            pieces.append(base)
    return " ".join(pieces), sum(mrg(i) for i in range(1, n))


def test_dehyphenate_corpus_identity_and_repair_counts(spark):
    """On the synthesized corpus every split is repairable, so the
    output text must equal the original document text; repairs must
    actually happen (non-zero) and match the synthesis rule count."""
    from freki_spark.functions.corpus_prep import (
        HYPH_MIN_TOKEN,
        LINE_W,
        dehyphenate,
    )

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    total_rep = 0
    for r in dehyphenate(spark, SF).collect():
        t = texts[r.doc_id]
        tk = t.split(" ")
        n_lines = (len(tk) + LINE_W - 1) // LINE_W
        expect_rep = sum(
            1
            for i in range(1, n_lines)
            if i % 2 == 1 and len(tk[i * LINE_W - 1]) >= HYPH_MIN_TOKEN
        )
        assert r.text_out == t
        assert r.n_lines == n_lines
        assert r.n_repairs == expect_rep
        total_rep += r.n_repairs
    assert total_rep > 100


def test_dehyphenate_kernel_adversarial(spark):
    """The generic repair kernel against pathological line arrays a
    closed-form corpus never exercises: bare '-' tokens, uppercase
    next lines, terminal hyphens, single-token consumed lines, and
    chained merges."""
    from pyspark.sql import functions as F

    from freki_spark.functions.corpus_prep import _dehyph_pieces, _mrg

    cases = [
        ["alpha beta-", "gamma delta"],
        ["x-"],
        ["foo -", "bar"],
        ["pre-", "Big"],
        ["ab-", "cd", "ef"],
        ["a xy-", "zw-", "qr"],
        ["z-", "a b-", "c"],
        ["one two", "three four"],
        ["tail-", ""],
        [],  # zero extracted lines: sequence(1, 0) would go descending
        [""],
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, hlines array<string>"
    )
    hl, n = F.col("hlines"), F.size("hlines")
    out = df.select(
        "id",
        F.array_join(_dehyph_pieces(hl, n), " ").alias("text_out"),
        F.size(
            F.filter(F.sequence(F.lit(1), n - 1), lambda i: _mrg(hl, n, i))
        ).alias("n_repairs"),
    ).collect()
    for r in out:
        want_text, want_rep = _naive_dehyph(cases[r.id])
        assert r.text_out == want_text, (cases[r.id], r.text_out, want_text)
        assert r.n_repairs == want_rep, (cases[r.id], r.n_repairs, want_rep)


def _half_up(v: float, digits: int = 0) -> float:
    """Spark ROUND on a double: Java BigDecimal.valueOf(d) parses the
    SHORTEST round-trip decimal (== python repr), then HALF_UP (away
    from zero).  Python's round() is banker's and floor(v+0.5) breaks
    at float-representability edges, so mirror the real semantics."""
    import decimal

    q = decimal.Decimal(1).scaleb(-digits)
    return float(
        decimal.Decimal(repr(v)).quantize(q, rounding=decimal.ROUND_HALF_UP)
    )


def _fold_dot(a, b) -> float:
    """Sequential left-fold dot product — the exact summation order of
    Spark's aggregate(zip_with(...)), unlike numpy's pairwise/SIMD
    reduction which can differ in the last ulp."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def test_embed_outliers_matches_python_recompute(spark):
    """The per-list farthest members must equal an independent python
    recompute of the whole chain — ivf_assign's argmax contract
    (left-fold dot, HALF_UP round-5 cosine, smallest-centroid
    tie-break), then bottom-K ascending (ccos, vec_id) per list — and
    every reported ccos must be strictly below its list's best."""
    import math

    from freki_spark.functions.similarity import (
        CENTROID_BASE,
        K_OUTLIERS,
        N_CENTROIDS,
        embed_outliers,
    )

    em = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    cents = {
        c: em[c]
        for c in em
        if CENTROID_BASE <= c < CENTROID_BASE + N_CENTROIDS
    }

    def ccos(v, c):
        return _half_up(
            _fold_dot(v, c)
            / (math.sqrt(_fold_dot(v, v)) * math.sqrt(_fold_dot(c, c))),
            5,
        )

    lists = {}
    for vid, v in em.items():
        best = max(((ccos(v, cv), -cid) for cid, cv in cents.items()))
        lists.setdefault(-best[1], []).append((best[0], vid))
    exp = {}
    for lid, members in lists.items():
        for rank, (cc, vid) in enumerate(sorted(members)[:K_OUTLIERS], 1):
            exp[(lid, vid)] = (cc, rank)

    rows = embed_outliers(spark, SF).collect()
    got = {(r.list_id, r.vec_id): (r.ccos, r.out_rank) for r in rows}
    assert got == exp
    worst = {lid: max(cc for cc, _ in members) for lid, members in lists.items()}
    assert all(
        cc < worst[lid]
        for (lid, _), (cc, _) in got.items()
        if len(lists[lid]) > K_OUTLIERS
    )


def test_stickiness_wau_matches_naive_python(spark):
    """Per-day DAU/WAU must equal a brute-force recompute of distinct
    users over the trailing 7-day window, WAU must dominate DAU, and
    ppm must use floor division."""
    from freki_spark.queries import STICKY_WINDOW, stickiness_wau

    EPOCH = __import__("datetime").date(1970, 1, 1)
    by_day = {}
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        d = (r.ts.date() - EPOCH).days
        by_day.setdefault(d, set()).add(r.user_id)

    rows = stickiness_wau(spark, SF).collect()
    assert {r.day for r in rows} == set(by_day)
    for r in rows:
        dau = len(by_day[r.day])
        wau = len(
            set().union(
                *(
                    by_day.get(d, set())
                    for d in range(r.day - STICKY_WINDOW + 1, r.day + 1)
                )
            )
        )
        assert (r.dau, r.wau) == (dau, wau)
        assert r.stickiness_ppm == dau * 1_000_000 // wau
        assert wau >= dau > 0


def test_kmeans_update_matches_numpy(spark):
    """One Lloyd update: per-(list, dim) fixed-point sums and member
    counts must equal an independent python recompute of the full
    assign-then-sum (argmax over round-5 cosines, smallest-centroid
    tie-break — the exact ivf_assign contract, including Spark's
    left-fold summation order and HALF_UP rounding)."""
    import math

    import pyarrow.parquet as pq

    from freki_spark.functions.similarity import (
        CENTROID_BASE,
        KMEANS_SCALE,
        N_CENTROIDS,
        kmeans_update,
    )

    rows = kmeans_update(spark, SF).collect()
    got = {(r.list_id, r.j): (r.sum_q, r.n_members) for r in rows}

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pydict()
    emb = {v: [float(x) for x in e] for v, e in zip(t["vec_id"], t["embedding"])}
    cents = {
        v: e for v, e in emb.items() if CENTROID_BASE <= v < CENTROID_BASE + N_CENTROIDS
    }
    dim = len(next(iter(emb.values())))
    sums = {}
    counts = {}
    for v, x in emb.items():
        nx = math.sqrt(_fold_dot(x, x))
        best = max(
            (_half_up(_fold_dot(x, c) / (nx * math.sqrt(_fold_dot(c, c))), 5), -cid)
            for cid, c in cents.items()
        )
        lid = -best[1]
        counts[lid] = counts.get(lid, 0) + 1
        acc = sums.setdefault(lid, [0] * dim)
        for j in range(dim):
            acc[j] += int(_half_up(x[j] * KMEANS_SCALE))
    want = {
        (lid, j + 1): (acc[j], counts[lid])
        for lid, acc in sums.items()
        for j in range(dim)
    }
    assert got == want
    assert sum(counts.values()) == len(emb)


def test_semantic_dedup_flags_scaled_copies(spark):
    from freki_spark.functions.dedup import dedup_semantic

    rows = dedup_semantic(spark, SF).collect()
    lists = {r.vec_id: r.list_id for r in rows}
    dups = {r.vec_id: r.keeper for r in rows if r.is_dup == 1}
    # every scaled copy is a dup of exactly its original (cos = 1.0,
    # same cluster — scaling never moves a vector across a boundary)
    mut = {v: k for v, k in dups.items() if v >= 100000}
    assert len(mut) == 20
    assert all(k == v - 100000 for v, k in mut.items())
    assert all(lists[v] == lists[v - 100000] for v in mut)
    # the natural corpus has no 0.99-cosine pairs at dim 64
    assert all(v >= 100000 for v in dups)
    assert len(rows) == 520


def test_quality_classifier_matches_hashlib(spark):
    """Independent recompute: hash every unigram/bigram and re-derive
    the md5 weight DIRECTLY (not via the operator's _QC_W table), so a
    table-construction bug and a lookup bug both fail the test."""
    import hashlib

    import pyarrow.parquet as pq

    from freki_spark.functions.text_analysis import QC_BUCKETS, quality_classifier

    rows = quality_classifier(spark, SF).collect()
    got = {r.doc_id: (r.score, r.keep) for r in rows}
    assert len(got) == 500

    def h32(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    checked = 0
    t = pq.read_table(f"{SF}/documents.parquet").to_pydict()
    for doc_id, text in zip(t["doc_id"], t["text"]):
        if doc_id % 25:
            continue  # spot-check; full value equality is the oracle's job
        tk = text.split(" ")
        feats = tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]
        score = sum(h32(f"qw,{h32(f) % QC_BUCKETS}") % 2001 - 1000 for f in feats)
        assert got[doc_id] == (score, int(score > 0)), doc_id
        checked += 1
    assert checked >= 15
    keeps = sum(k for _, k in got.values())
    assert 0 < keeps < len(got)  # the gate actually separates the corpus


def test_c4_line_filter_rules_fire(spark):
    import hashlib

    from freki_spark.functions.corpus_prep import c4_line_filter

    rows = c4_line_filter(spark, SF).collect()
    assert len(rows) == 500
    assert any(r.keep == 0 for r in rows) and any(r.keep == 1 for r in rows)
    # line rules drop real lines (no-punct ~30%, short, javascript)
    assert sum(r.n_lines - r.n_kept for r in rows) > 200
    # every retained line honors every line rule
    for r in rows:
        if not r.text_kept:
            continue
        for line in r.text_kept.split(" | "):
            assert line.endswith(".") and len(line.split(" ")) >= 5, (r.doc_id, line)
            assert "javascript" not in line
    # page rule: lorem-flagged docs are dropped no matter their lines
    lorem = [
        r
        for r in rows
        if int(hashlib.md5(f"lorem/{r.doc_id}".encode()).hexdigest()[:8], 16) % 29 == 0
    ]
    assert lorem and all(r.keep == 0 for r in lorem)


def test_shingle_paths_stay_linear_on_mega_docs(spark):
    """Canary for the CLAUDE.md HOF rule: the minhash shingling path
    must be O(n) in doc length.  With the token array bound as a
    column this runs ~0.6s on a 76.8k-token doc; the old form (raw
    split() referenced inside shingles' slice lambda) re-split the
    text per shingle — measured ~95s at HALF this length, i.e. ~380s
    here.  The 45s bound leaves wide headroom for this host's 10x
    noise waves while failing any reintroduced quadratic by ~8x."""
    import time

    from pyspark.sql import functions as F

    from freki_spark.functions.dedup import _with_minhash

    text = " ".join(f"w{i % 97}" for i in range(76_800))
    d = spark.createDataFrame([(1, text)], "doc_id long, text string")
    _with_minhash(d.limit(1)).collect()  # warm the codepaths
    t0 = time.time()
    rows = _with_minhash(d).collect()
    wall = time.time() - t0
    assert len(rows) == 1 and len(rows[0].mh) > 0
    assert wall < 45, f"mega-doc minhash took {wall:.1f}s — quadratic regression?"


def test_perplexity_bucket_lm_semantics(spark):
    """A document that is one bigram repeated must score LOWER surprise
    than a same-length document of corpus-unique bigrams under the
    corpus-trained bigram LM (repetition = high bigram count = low
    -ln P), and the bucket must be a pure threshold function of
    (lang, score)."""
    from freki_spark.functions.text_analysis import (
        PPL_CUTOFFS,
        _perplexity_scored,
        perplexity_bucket,
    )

    rep = " ".join(["spark lake"] * 40)
    uniq = " ".join(f"tok{i}" for i in range(80))
    filler = [(100 + i, "en", f"common words {i % 3} appear common words") for i in range(6)]
    d = spark.createDataFrame(
        [(1, "en", rep), (2, "en", uniq)] + filler,
        "doc_id long, lang string, text string",
    )
    rows = {r.doc_id: r for r in _perplexity_scored(d).collect()}
    assert rows[1].score < rows[2].score
    for r in rows.values():
        assert r.score == r.sum_surp // r.n_bigrams
        head, mid = PPL_CUTOFFS[r.lang]
        want = "head" if r.score < head else ("middle" if r.score < mid else "tail")
        assert r.bucket == want

    # corpus smoke: every doc scored, buckets only from the enum
    docs_n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    out = perplexity_bucket(spark, "/root/testdata/sf0.001").collect()
    assert len(out) == docs_n
    assert {r.bucket for r in out} <= {"head", "middle", "tail"}


def test_dsir_select_prefers_target_sources(spark):
    """Docs drawn from the DSIR target strata must average a higher
    importance weight than the rest of the corpus (their hashed-bigram
    features define the target distribution), and `selected` must be
    exactly weight > 0."""
    from freki_spark.functions.corpus_prep import DSIR_TARGET_SOURCES, dsir_select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = {r.doc_id: r.source for r in docs.select("doc_id", "source").collect()}
    rows = dsir_select(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == len(src)
    tgt_w = [r.weight / r.n_feats for r in rows if src[r.doc_id] in DSIR_TARGET_SOURCES]
    rest_w = [r.weight / r.n_feats for r in rows if src[r.doc_id] not in DSIR_TARGET_SOURCES]
    assert tgt_w and rest_w
    assert sum(tgt_w) / len(tgt_w) > sum(rest_w) / len(rest_w)
    for r in rows:
        assert r.selected == int(r.weight > 0)


def test_bpe_train_matches_naive_python(spark):
    """Top merge candidates (pair counts over unique lowercase words
    weighted by word frequency, ties broken by pair) must equal a
    direct Python recount of the same corpus."""
    import re
    from collections import Counter

    import duckdb

    from freki_spark.functions.text_analysis import BPE_TRAIN_TOPK, bpe_train

    texts = [
        r[0]
        for r in duckdb.sql(
            "SELECT text FROM '/root/testdata/sf0.001/documents.parquet'"
        ).fetchall()
    ]
    words = Counter()
    for t in texts:
        for w in t.lower().split(" "):
            if re.fullmatch("[a-z][a-z]+", w):
                words[w] += 1
    pairs = Counter()
    for w, f in words.items():
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += f
    want = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:BPE_TRAIN_TOPK]

    rows = bpe_train(spark, "/root/testdata/sf0.001").collect()
    got = [((r.left, r.right), r.cnt) for r in sorted(rows, key=lambda r: r.rank)]
    assert got == want


def test_domain_stats_rollup_consistency(spark):
    """Domain shares, means, and ranks must be internally consistent
    and the doc counts must partition the corpus exactly."""
    from freki_spark.functions.corpus_prep import domain_stats

    docs_n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    rows = domain_stats(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_docs for r in rows)
    assert total == docs_n
    for r in rows:
        assert r.domain.endswith((".com", ".org", ".net"))
        assert "-site." in r.domain and not r.domain.startswith(("www.", "cdn."))
        assert r.share_ppm == r.n_docs * 1_000_000 // total
        assert r.mean_chars == r.sum_chars // r.n_docs
    ranked = sorted(rows, key=lambda r: (-r.n_docs, r.domain))
    assert [r.rank for r in ranked] == list(range(1, len(rows) + 1))


def test_crawl_frontier_politeness_cap(spark):
    """Every domain keeps at most FRONTIER_CAP URLs, ranks are
    contiguous from 1, and the kept set per domain is EXACTLY the
    top-priority prefix of that domain's full frontier — recomputed
    independently in python (hashlib md5 + the URL formula) from the
    raw documents parquet, not from the op's own columns."""
    import hashlib
    import re

    import pyarrow.parquet as pq

    from freki_spark.functions.corpus_prep import (
        DOMAIN_RE,
        FRONTIER_CAP,
        crawl_frontier,
        domain_stats,
    )

    # independent full-frontier recompute
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "source"]
    ).to_pylist()
    full = {}
    for row in t:
        did, src = row["doc_id"], row["source"]
        url = "http://{}{}-site.{}/page/{}".format(
            "www." if did % 2 == 0 else "cdn.",
            src,
            ["com", "org", "net"][did % 3],
            did,
        )
        pri = int(hashlib.md5(f"pri/{did}".encode()).hexdigest()[:8], 16)
        dom = re.match(DOMAIN_RE, url).group(1)
        full.setdefault(dom, []).append((url, pri))
    expected = {
        dom: {
            u
            for u, _ in sorted(urls, key=lambda up: (-up[1], up[0]))[:FRONTIER_CAP]
        }
        for dom, urls in full.items()
    }

    rows = crawl_frontier(spark, "/root/testdata/sf0.001").collect()
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(r)
    assert by_dom, "frontier is empty"
    for dom, rs in by_dom.items():
        assert len(rs) <= FRONTIER_CAP
        rs.sort(key=lambda r: r.fetch_rank)
        assert [r.fetch_rank for r in rs] == list(range(1, len(rs) + 1))
        pris = [r.priority for r in rs]
        assert pris == sorted(pris, reverse=True)
        for r in rs:
            assert re.match(DOMAIN_RE, r.url).group(1) == dom
        # the politeness cap keeps the exact top-K of the FULL frontier
        assert {r.url for r in rs} == expected[dom]
    assert set(by_dom) == set(expected)
    # same URL-synthesis formula as domain_stats → same domain universe
    stat_doms = {
        r.domain for r in domain_stats(spark, "/root/testdata/sf0.001").collect()
    }
    assert set(by_dom) == stat_doms


def test_bpe_train_word_regex_rejects_trailing_newline(spark):
    """Java's non-MULTILINE '$' matches before a trailing newline but
    DuckDB's regexp_full_match does not — the op must use \\z so both
    engines reject a token like 'abc\\n' identically."""
    import duckdb

    from pyspark.sql import functions as F

    bad = "abc\n"
    df = spark.createDataFrame([(bad,), ("abc",)], "w string")
    got = {
        r.w: r.m
        for r in df.select(
            "w", F.col("w").rlike(r"^[a-z][a-z]+\z").alias("m")
        ).collect()
    }
    duck = {
        w: duckdb.sql(
            "SELECT regexp_full_match(?, '[a-z][a-z]+')", params=[w]
        ).fetchone()[0]
        for w in (bad, "abc")
    }
    # the buggy '$' anchor accepts 'abc\n' on the Spark side only
    dollar = df.select(
        "w", F.col("w").rlike("^[a-z][a-z]+$").alias("m")
    ).collect()
    assert {r.w: r.m for r in dollar}[bad] is True  # the trap is real
    assert got == duck == {bad: False, "abc": True}


def test_dedup_incremental_hits_and_misses(spark):
    """Mutated new docs must be flagged as duplicates of a corpus doc
    at least as minhash-similar as their own source (the corpus
    contains some mutually-near-identical docs, so the elected match
    may legitimately be a lower-id twin of the source); md5-fresh new
    docs must never be flagged."""
    from freki_spark.functions.dedup import (
        N_MINHASH,
        _fresh_batch,
        _mutated,
        _t,
        _with_minhash,
        dedup_incremental,
    )

    rows = {r.new_id: r for r in dedup_incremental(spark, SF).collect()}
    mut = [r for nid, r in rows.items() if 100000 <= nid < 200000]
    fresh = [r for nid, r in rows.items() if nid >= 300000]
    assert len(mut) == 50 and len(fresh) == 20

    d = _t(spark, SF, "documents").select("doc_id", "text")
    base_sig = {r.doc_id: tuple(r.mh) for r in _with_minhash(d).collect()}
    inc_sig = {
        r.doc_id: tuple(r.mh)
        for r in _with_minhash(
            _mutated(d).unionByName(_fresh_batch(d))
        ).collect()
    }

    def match(a, b):
        return sum(x == y for x, y in zip(a, b))

    dup_hits = [r for r in mut if r.is_dup == 1]
    # LSH recall is high but not 1.0 (same contract as the batch op)
    assert len(dup_hits) >= 40
    for r in dup_hits:
        got = match(inc_sig[r.new_id], base_sig[r.best_old])
        src = match(inc_sig[r.new_id], base_sig[r.new_id - 100000])
        assert got == r.n_match  # the op's count is the real count
        assert got >= src  # elected match is never worse than the source
        assert r.n_match * 2 >= N_MINHASH
    for r in fresh:
        assert r.is_dup == 0
    for r in rows.values():
        assert r.is_dup == int(r.n_match * 2 >= N_MINHASH)
        assert (r.best_old is None) == (r.n_match == 0)


def test_stream_incremental_dedup_equals_batch(spark):
    """The streamed increment (4 micro-batches probing the static
    corpus index) must produce exactly the batch operator's rows —
    micro-batching is invisible in the result."""
    from freki_spark.functions.dedup import dedup_incremental
    from freki_spark.streaming.jobs import stream_incremental_dedup

    # sorted LISTS, not sets: a set compare would mask duplicated rows,
    # the exact failure a replayed/double-admitted micro-batch produces
    def key(r):
        return (r[0], r[1] if r[1] is not None else -1, r[2], r[3])

    batch = sorted((tuple(r) for r in dedup_incremental(spark, SF).collect()), key=key)
    stream = sorted(
        (tuple(r) for r in stream_incremental_dedup(spark, SF).collect()), key=key
    )
    assert stream == batch
    assert len(stream) == 70


def test_warc_parser_is_length_framed_not_separator_split(spark):
    """The WARC parser must frame records by Content-Length BYTES:
    payloads containing 'WARC/1.0\\r\\n', blank CRLF lines, and
    multi-byte UTF-8 (where byte length != char length) must all
    round-trip exactly."""
    from freki_spark.functions.dedup import _t
    from freki_spark.sources.warc import (
        parse_warc_records,
        q_warc_scan,
        synth_warc_chunks,
    )
    from pyspark.sql import functions as F

    evil = "before WARC/1.0\r\n\r\n\r\nafter"      # fake frame inside payload
    uni = "héllo wörld é中文"          # multi-byte UTF-8
    d = spark.createDataFrame(
        [(1, "srcX", evil), (2, "srcY", uni), (3, "srcZ", "plain")],
        "doc_id long, source string, text string",
    )
    blobs = [r.blob for r in synth_warc_chunks(d).collect()]
    recs = sorted(r for b in blobs for r in parse_warc_records(b))
    assert [r[0] for r in recs] == [1, 2, 3]
    assert recs[0][3] == evil
    assert recs[1][3] == uni
    assert recs[1][2] == len(uni.encode("utf-8"))  # byte, not char, count
    assert recs[1][2] != len(uni)

    # corpus smoke: every document round-trips through the archive
    docs_n = _t(spark, SF, "documents").count()
    out = q_warc_scan(spark, SF)
    assert out.count() == docs_n
    assert out.filter(F.col("payload").isNull()).count() == 0


def test_warc_index_offsets_are_range_read_exact(spark):
    """The CDX-style index's whole point is RANGE READS: for every
    indexed record, slicing the archive bytes at [offset, offset +
    rlength) must yield a complete record that re-parses alone to
    exactly the original document — and the extents must tile each
    archive with no gap (offsets strictly cumulative, Σ rlength =
    archive bytes).  Includes the adversarial payloads (fake frames,
    multi-byte UTF-8) so the byte geometry is proven on the cases
    where char offsets would diverge."""
    from freki_spark.sources.warc import (
        index_warc_records,
        parse_warc_records,
        synth_warc_chunks,
    )

    evil = "before WARC/1.0\r\n\r\n\r\nafter"
    uni = "héllo wörld é中文"
    d = spark.createDataFrame(
        [(1, "srcX", evil), (2, "srcY", uni), (3, "srcZ", "plain"),
         (11, "srcQ", "second chunk row")],
        "doc_id long, source string, text string",
    )
    chunks = {r.chunk_id: r.blob for r in synth_warc_chunks(d).collect()}
    assert set(chunks) == {0, 1}
    texts = {1: evil, 2: uni, 3: "plain", 11: "second chunk row"}

    n_checked = 0
    for cid, blob in chunks.items():
        b = blob.encode("utf-8")
        idx = index_warc_records(cid, blob)
        assert [e[3] for e in idx] == sorted(e[3] for e in idx)
        assert sum(e[4] for e in idx) == len(b)
        assert idx[0][3] == 0
        for _cid, doc_id, uri, off, rlen, digest in idx:
            rec = b[off : off + rlen].decode("utf-8")
            (rdoc, ruri, rclen, rpayload), = parse_warc_records(rec)
            assert rdoc == doc_id and ruri == uri
            assert rpayload == texts[doc_id]
            assert rclen == len(texts[doc_id].encode("utf-8"))
            import hashlib
            assert digest == hashlib.md5(rpayload.encode()).hexdigest()
            n_checked += 1
    assert n_checked == 4


def test_csv_round_trip_newlines_and_padding(spark):
    """The CSV source must round-trip exactly the text classes the
    fixture corpus lacks: embedded newlines (multiLine read), leading/
    trailing whitespace (no silent trim on either side), quotes and
    commas."""
    import tempfile, os

    from freki_spark.queries import _read_csv_docs, _write_csv

    rows = [
        (1, "line1\nline2\nline3", "en", "s1", 17),
        (2, "  padded  ", "es", "s2", 10),
        (3, 'quote " and, comma', "de", "s3", 18),
        (4, "\ttab lead and trail\t", "fr", "s4", 20),
        (5, "plain", "zh", "s5", 5),
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    path = os.path.join(tempfile.mkdtemp(prefix="freki_csvrt_"), "docs")
    _write_csv(d, path)
    back = sorted(tuple(r) for r in _read_csv_docs(spark, path).collect())
    assert back == sorted(rows)


def test_evolved_scan_null_fills_old_generation(spark):
    """The explicit-superset-schema read must null-fill EXACTLY the
    columns absent from generation-1 footers: every even doc_id (gen
    1) reads back with NULL n_chars/quality but intact text/lang;
    every odd doc_id (gen 2) carries both; no row is lost or
    duplicated across the mixed directory."""
    from pyspark.sql import functions as F

    from freki_spark.queries import q_scan_evolved

    out = q_scan_evolved(spark, SF)
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    g1 = out.filter(F.col("doc_id") % 2 == 0)
    g2 = out.filter(F.col("doc_id") % 2 == 1)
    assert g1.filter(
        F.col("n_chars").isNotNull() | F.col("quality").isNotNull()
    ).count() == 0
    assert g2.filter(
        F.col("n_chars").isNull() | F.col("quality").isNull()
    ).count() == 0
    assert out.filter(F.col("text").isNull() | F.col("lang").isNull()).count() == 0


def test_orc_round_trip_nested_nulls(spark):
    """The ORC source must round-trip the nested doc shape exactly:
    null media_ref inside a struct, an empty spans array, a NULL spans
    array, empty-string text, and multi-byte unicode — the null-bitmap
    / length-stream cases of ORC's nested encoding."""
    import os
    import tempfile

    from freki_spark.pipeline import DOC_SCHEMA
    from freki_spark.queries import _read_orc_docs, _write_orc_docs

    rows = [
        ("d1", [("text", "héllo — ünicode", None, 0), ("media", "", "img://1/0", 1)]),
        ("d2", []),
        ("d3", None),
        ("d4", [("text", "", None, 0)]),
    ]
    d = spark.createDataFrame(rows, DOC_SCHEMA)
    path = os.path.join(tempfile.mkdtemp(prefix="freki_orcrt_"), "docs")
    _write_orc_docs(d, path)
    back = _read_orc_docs(spark, path)
    assert back.schema == d.schema
    canon = lambda df: sorted(
        (r.doc_id, None if r.spans is None else [tuple(s) for s in r.spans])
        for r in df.collect()
    )
    assert canon(back) == canon(d)


def test_warc_synth_raises_on_null_text(spark):
    """A NULL text must fail the synthesis job loudly, never silently
    drop the document from the archive."""
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    from freki_spark.sources.warc import parse_warc, synth_warc_chunks

    d = spark.createDataFrame(
        [(1, "s1", "ok"), (2, "s2", None)],
        "doc_id long, source string, text string",
    )
    with _pytest.raises(SparkRuntimeException, match="silently drop"):
        parse_warc(synth_warc_chunks(d)).collect()


def test_winnow_fingerprint_matches_python_and_covers(spark):
    """Every doc's fingerprint set equals an independent hashlib-md5
    winnowing recompute (k-gram hash, W-window min, rightmost tie),
    and the winnowing coverage guarantee holds: every W-window of the
    hash sequence contains a selected position (consecutive selected
    positions never gap by more than W)."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprint,
    )

    def winnow_py(text):
        tk = text.split(" ")
        m = max(len(tk) - WINNOW_K + 1, 1)
        hs = [
            int(
                hashlib.md5(
                    " ".join(tk[i : i + WINNOW_K]).encode()
                ).hexdigest()[:15],
                16,
            )
            for i in range(m)
        ]
        sel = set()
        for i in range(max(len(hs) - WINNOW_W + 1, 1)):
            sl = hs[i : i + WINNOW_W]
            mn = min(sl)
            rpos = len(sl) - 1 - sl[::-1].index(mn)  # rightmost min
            sel.add((i + rpos + 1, mn))  # 1-based position
        return sel

    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    got = defaultdict(set)
    for r in winnow_fingerprint(spark, SF).collect():
        got[r.doc_id].add((r.pos, r.fp))
    assert set(got) == set(texts)
    for d, text in texts.items():
        assert got[d] == winnow_py(text), f"doc {d}"
        pos = sorted(p for p, _ in got[d])
        gaps = [b - a for a, b in zip(pos, pos[1:])]
        assert all(g <= WINNOW_W for g in gaps), f"doc {d}: gap > W"


def test_winnow_rightmost_tie_break(spark, tmp_path):
    """All-identical tokens make every window a pure tie: the rule must
    select the RIGHTMOST minimal position of each window (classic
    winnowing), never the leftmost."""
    import hashlib

    from freki_spark.functions.text_analysis import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprint,
    )

    spark.createDataFrame(
        [(1, "w w w w w w w w", "en", "src", 15)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = winnow_fingerprint(spark, str(tmp_path)).collect()
    h = int(hashlib.md5(("w " * WINNOW_K).strip().encode()).hexdigest()[:15], 16)
    # 8 tokens -> 6 identical gram hashes -> windows i=1..3, rightmost
    # of each window = i + W - 1 -> positions {4, 5, 6}
    assert {(r.pos, r.fp) for r in rows} == {(p, h) for p in (4, 5, 6)}


def test_temperature_sample_matches_closed_form(spark):
    """Per-doc repeat counts equal the integer closed form (alpha=1/2
    temperature weights via exact isqrt, hash-elected fractional
    repeats); the head language is downsampled (some docs dropped) and
    at least one tail-language doc repeats; the realized budget stays
    within one max-language count of N."""
    import hashlib
    import math
    from collections import Counter

    from freki_spark.functions.corpus_prep import (
        TEMP_SCALE,
        TEMP_SEED,
        temperature_sample,
    )

    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "lang")
        .collect()
    }
    n_lang = Counter(langs.values())
    n_total = sum(n_lang.values())
    w = {l: math.isqrt(n * TEMP_SCALE) for l, n in n_lang.items()}
    w_total = sum(w.values())
    target = {l: n_total * w[l] // w_total for l in n_lang}

    def key(doc_id):
        return int(
            hashlib.md5(f"{TEMP_SEED}{doc_id}".encode()).hexdigest()[:8], 16
        )

    exp = {}
    for d, l in langs.items():
        r = target[l] // n_lang[l] + (
            1 if key(d) % n_lang[l] < target[l] % n_lang[l] else 0
        )
        if r > 0:
            exp[d] = r
    got = {r.doc_id: r.n_repeats for r in temperature_sample(spark, SF).collect()}
    assert got == exp
    big = max(n_lang, key=n_lang.get)
    small = min(n_lang, key=n_lang.get)
    assert any(d not in exp for d, l in langs.items() if l == big)
    assert any(exp.get(d, 0) > 1 for d, l in langs.items() if l == small)
    assert abs(sum(exp.values()) - n_total) <= max(n_lang.values())


def test_shard_manifest_matches_hashlib(spark):
    """The whole manifest relation — shard assignment, counts, doc_id
    range, and the order-independent sum digest — equals a pure-python
    recompute, and the shards partition the corpus exactly."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.corpus_prep import (
        N_SHARDS,
        SHARD_SEED,
        shard_manifest,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0, None, None, 0])
    for r in docs:
        s = (
            int(
                hashlib.md5(f"{SHARD_SEED}{r.doc_id}".encode()).hexdigest()[:8],
                16,
            )
            % N_SHARDS
        )
        st = per[s]
        st[0] += 1
        st[1] += len(r.text.split(" "))
        st[2] = r.doc_id if st[2] is None else min(st[2], r.doc_id)
        st[3] = r.doc_id if st[3] is None else max(st[3], r.doc_id)
        st[4] += int(
            hashlib.md5(f"{r.doc_id}:{r.text}".encode()).hexdigest()[:8], 16
        )
    got = {
        r.shard: (r.n_docs, r.n_tokens, r.doc_min, r.doc_max, r.digest)
        for r in shard_manifest(spark, SF).collect()
    }
    assert got == {s: tuple(st) for s, st in per.items()}
    assert sum(v[0] for v in got.values()) == len(docs)


def test_media_phash_dedup_bands_find_flipped_copies(spark):
    """Every 2-bit-flipped re-encode must be discovered via banding
    (guaranteed: Hamming <= 3 shares a band), far copies must never
    pair with their base, and the whole relation equals a pure-python
    recompute of the banding + Hamming-verify pipeline."""
    import hashlib
    from itertools import combinations

    from freki_spark.functions.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        PHASH_BITS,
        PHASH_MAX_HAMMING,
        media_phash_dedup,
    )

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    ph = {}
    for d in doc_ids:
        if d % 5:
            continue
        ref = f"img://{d}/0"
        content_hex = hashlib.sha256(ref.encode()).hexdigest().upper()
        base = h60(f"phash:{content_hex}")
        ph[ref] = base
        if d % 15 == 0:
            p1, p2 = h32(f"{ref}:f1") % PHASH_BITS, h32(f"{ref}:f2") % PHASH_BITS
            ph[f"{ref}/re"] = base ^ (1 << p1) ^ (1 << p2)
        if d % 25 == 0:
            far_hex = hashlib.sha256(f"{ref}/far".encode()).hexdigest().upper()
            ph[f"{ref}/far"] = h60(f"phash:{far_hex}")

    def bandvals(x):
        return [
            (b, (x >> (b * PHASH_BAND_BITS)) % (1 << PHASH_BAND_BITS))
            for b in range(PHASH_BANDS)
        ]

    exp = {}
    for a, b in combinations(sorted(ph), 2):
        if set(bandvals(ph[a])) & set(bandvals(ph[b])):
            hm = bin(ph[a] ^ ph[b]).count("1")
            if hm <= PHASH_MAX_HAMMING:
                exp[(a, b)] = hm

    got = {(r.a_ref, r.b_ref): r.hamming for r in media_phash_dedup(spark, SF).collect()}
    assert got == exp
    # every synthesized re-encode is discovered against its base…
    for ref in ph:
        if ref.endswith("/re"):
            base = ref[: -len("/re")]
            pair = (min(base, ref), max(base, ref))
            assert pair in got and got[pair] <= 2
        # …and no far copy survives the Hamming verify against its base
        if ref.endswith("/far"):
            base = ref[: -len("/far")]
            assert (min(base, ref), max(base, ref)) not in got


def test_clip_filter_integer_cosine_rule(spark):
    """Pair scores and verdicts equal a pure-python recompute of the
    integer cosine rule (16·dot² >= 9·|a|²·|b|²) over the sha256 stub
    encoders, and the threshold actually separates the population
    (both keep classes occur)."""
    import hashlib

    from freki_spark.functions.multimodal import (
        CLIP_DIMS,
        CLIP_THR_DEN,
        CLIP_THR_NUM,
        clip_filter,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }

    def vec(hexstr):
        return [int(hexstr[2 * i : 2 * i + 2], 16) for i in range(CLIP_DIMS)]

    exp = {}
    for d, text in docs.items():
        if d % 5:
            continue
        ref = f"img://{d}/0"
        content_hex = hashlib.sha256(ref.encode()).hexdigest()  # lowercase
        iv = vec(hashlib.sha256(content_hex.encode()).hexdigest())
        tv = vec(hashlib.sha256(text.encode()).hexdigest())
        dot = sum(a * b for a, b in zip(iv, tv))
        na2 = sum(a * a for a in iv)
        nb2 = sum(b * b for b in tv)
        keep = int(
            CLIP_THR_DEN**2 * dot * dot >= CLIP_THR_NUM**2 * na2 * nb2
        )
        exp[(d, ref)] = (dot, na2, nb2, keep)

    got = {
        (r.doc_id, r.media_ref): (r.dot, r.na2, r.nb2, r.keep)
        for r in clip_filter(spark, SF).collect()
    }
    assert got == exp
    keeps = [v[3] for v in got.values()]
    assert 0 < sum(keeps) < len(keeps)


def test_stream_curate_equals_batch(spark):
    """The streaming curation gate (stateless narrow transform in
    append mode, one file per micro-batch) must produce exactly the
    batch operator's relation — same verdicts, same reject reasons,
    across micro-batch boundaries."""
    from freki_spark.functions.text_analysis import curate_keep
    from freki_spark.streaming.jobs import stream_curate

    batch = {
        r.doc_id: (r.keep, r.reject_reason)
        for r in curate_keep(spark, SF).collect()
    }
    stream = {
        r.doc_id: (r.keep, r.reject_reason)
        for r in stream_curate(spark, SF, "t_stream_curate").collect()
    }
    assert stream == batch
    assert 0 < sum(k for k, _ in stream.values()) < len(stream)


def test_code_detect_matches_python_recompute(spark):
    """The full relation must equal a plain-python recompute of the
    three signals (symbol-char count, indented-line fraction, keyword
    regex hits) over the same unioned corpus, and the vote must
    discriminate perfectly on the fixture: every synthesized code
    variant is flagged, no prose document is."""
    import re as _re

    from freki_spark.functions.text_analysis import (
        CODE_INDENT_MIN_PPM,
        CODE_KEYWORDS_RE,
        CODE_KW_MIN,
        CODE_MOD,
        CODE_NWORDS,
        CODE_OFFSET,
        CODE_REM,
        CODE_SYM_MIN_PPM,
        CODE_VOTES_MIN,
        code_detect,
    )

    def signals(doc_id, text):
        n_chars = len(text)
        sym = sum(c in "(){};=:#<>" for c in text)
        lines = text.split("\n")
        ind = sum(ln.startswith("    ") for ln in lines)
        kw = len(_re.findall(CODE_KEYWORDS_RE, text))
        sym_ppm = sym * 1_000_000 // n_chars if n_chars else 0
        ind_ppm = ind * 1_000_000 // len(lines)
        votes = (
            (sym_ppm >= CODE_SYM_MIN_PPM)
            + (ind_ppm >= CODE_INDENT_MIN_PPM)
            + (kw >= CODE_KW_MIN)
        )
        return (sym_ppm, ind_ppm, kw, int(votes >= CODE_VOTES_MIN))

    exp = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        exp[r.doc_id] = signals(r.doc_id, r.text)
        if r.doc_id % CODE_MOD == CODE_REM:
            words = r.text.split(" ")[:CODE_NWORDS]
            code = "def main():\n" + "\n".join(
                f"    {w} = call({w});" for w in words
            )
            exp[r.doc_id + CODE_OFFSET] = signals(r.doc_id, code)

    got = {
        r.doc_id: (r.sym_ppm, r.indent_ppm, r.kw_hits, r.is_code)
        for r in code_detect(spark, SF).collect()
    }
    assert got == exp
    assert all(v[3] == 1 for k, v in got.items() if k >= CODE_OFFSET)
    assert all(v[3] == 0 for k, v in got.items() if k < CODE_OFFSET)
    assert sum(v[3] for v in got.values()) > 0


def test_ocr_garble_matches_python_recompute(spark):
    """The full relation must equal a plain-python recompute of the
    three character-grain signals (letter-digit-mix tokens, non-[a-z ]
    char mass, vowel-free tokens) over the same unioned corpus, and
    the vote must discriminate perfectly on the fixture: every
    confusion-damaged variant is flagged, no clean document is."""
    import re as _re

    from freki_spark.functions.text_analysis import (
        GARBLE_FROM,
        GARBLE_MIX_MIN_PPM,
        GARBLE_MIX_RE,
        GARBLE_MOD,
        GARBLE_NONALPHA_MIN_PPM,
        GARBLE_OFFSET,
        GARBLE_REM,
        GARBLE_TO,
        GARBLE_VOTES_MIN,
        GARBLE_VOWELFREE_MIN_PPM,
        ocr_garble,
    )

    def signals(text):
        n_chars = len(text)
        nonalpha = sum(not (c.islower() or c == " ") for c in text)
        tk = text.split(" ")
        mixed = sum(bool(_re.search(GARBLE_MIX_RE, t)) for t in tk)
        vfree = sum(not _re.search("[aeiou]", t) for t in tk)
        mixed_ppm = mixed * 1_000_000 // len(tk)
        nonalpha_ppm = nonalpha * 1_000_000 // n_chars if n_chars else 0
        vfree_ppm = vfree * 1_000_000 // len(tk)
        votes = (
            (mixed_ppm >= GARBLE_MIX_MIN_PPM)
            + (nonalpha_ppm >= GARBLE_NONALPHA_MIN_PPM)
            + (vfree_ppm >= GARBLE_VOWELFREE_MIN_PPM)
        )
        return (mixed_ppm, nonalpha_ppm, vfree_ppm, int(votes >= GARBLE_VOTES_MIN))

    trans = str.maketrans(GARBLE_FROM, GARBLE_TO)
    exp = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        exp[r.doc_id] = signals(r.text)
        if r.doc_id % GARBLE_MOD == GARBLE_REM:
            exp[r.doc_id + GARBLE_OFFSET] = signals(r.text.translate(trans))

    got = {
        r.doc_id: (r.mixed_ppm, r.nonalpha_ppm, r.vowelfree_ppm, r.ocr_bad)
        for r in ocr_garble(spark, SF).collect()
    }
    assert got == exp
    assert all(v[3] == 1 for k, v in got.items() if k >= GARBLE_OFFSET)
    assert all(v[3] == 0 for k, v in got.items() if k < GARBLE_OFFSET)
    assert sum(v[3] for v in got.values()) > 0


def test_mojibake_fix_matches_python_recompute(spark):
    """The full relation must equal a plain-python recompute (digraph
    occurrence counts + chained literal repair) over the same unioned
    corpus; every double-encoded variant must be flagged and repaired
    to the accented single-encoded form; no clean document changes."""
    from freki_spark.functions.text_analysis import (
        MOJI_MOD,
        MOJI_OFFSET,
        MOJI_PAIRS,
        MOJI_REM,
        mojibake_fix,
    )

    def score(text):
        n = sum(text.count(bad) for bad, _good, _src in MOJI_PAIRS)
        fixed = text
        for bad, good, _src in MOJI_PAIRS:
            fixed = fixed.replace(bad, good)
        return (n, int(n > 0), fixed)

    exp = {}
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        exp[r.doc_id] = score(r.text)
        if r.doc_id % MOJI_MOD == MOJI_REM:
            dmg = r.text
            for bad, _good, src in MOJI_PAIRS:
                dmg = dmg.replace(src, bad)
            exp[r.doc_id + MOJI_OFFSET] = score(dmg)
            # the repair target is closed-form: the accented
            # single-encoded re-spelling of the original
            want = r.text
            for (_bad, good, src) in MOJI_PAIRS:
                want = want.replace(src, good)
            assert exp[r.doc_id + MOJI_OFFSET][2] == want

    got = {
        r.doc_id: (r.n_moji, r.moji_bad, r.text_fixed)
        for r in mojibake_fix(spark, SF).collect()
    }
    assert got == exp
    assert all(v[1] == 1 for k, v in got.items() if k >= MOJI_OFFSET)
    assert all(v[1] == 0 for k, v in got.items() if k < MOJI_OFFSET)
    assert sum(v[1] for v in got.values()) > 0
    # clean documents pass through the repair untouched
    assert all(
        got[k][2] == exp[k][2] and got[k][0] == 0
        for k in got
        if k < MOJI_OFFSET
    )


def test_dist_drift_matches_python_recompute(spark):
    """The top-K drift report must equal a plain-python recompute
    (token histograms over snapshot A and the _snapshot_b mutation,
    exact integer ppm, abs-diff ranking with token tie-break), and the
    injected mutation tokens must surface: 'rev2' and 'new' appear in
    the report with a_ppm = 0."""
    from collections import Counter

    from freki_spark.functions.text_analysis import DRIFT_TOPK, dist_drift

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    snap_a = dict(docs)
    snap_b = {
        d: (t + " rev2" if d % 7 == 1 else t)
        for d, t in docs.items()
        if d % 11 != 2
    }
    snap_b.update(
        {d + 500000: "new " + t for d, t in docs.items() if d < 30}
    )

    def freqs(snap):
        c = Counter()
        for t in snap.values():
            c.update(t.split(" "))
        tot = sum(c.values())
        return {w: n * 1_000_000 // tot for w, n in c.items()}

    fa, fb = freqs(snap_a), freqs(snap_b)
    drift = sorted(
        (
            (w, fa.get(w, 0), fb.get(w, 0), abs(fa.get(w, 0) - fb.get(w, 0)))
            for w in set(fa) | set(fb)
        ),
        key=lambda x: (-x[3], x[0]),
    )[:DRIFT_TOPK]
    exp = [
        (w, a, b, d, i + 1) for i, (w, a, b, d) in enumerate(drift)
    ]

    got = [
        (r.token, r.a_ppm, r.b_ppm, r.drift_ppm, r.rank)
        for r in dist_drift(spark, SF).collect()
    ]
    assert got == exp
    by_token = {t: (a, b) for t, a, b, _, _ in got}
    assert by_token["rev2"][0] == 0 and by_token["rev2"][1] > 0
    assert by_token["new"][0] == 0 and by_token["new"][1] > 0


def test_recrawl_schedule_matches_python_recompute(spark):
    """The schedule must equal a plain-python recompute (epoch-second
    truncation, integer mean-gap, banding, next-due), and every
    scheduler branch must fire on the fixture: hourly (compressed hot
    pages), daily (natural cadence), slow and unknown (sparse
    pages)."""
    from freki_spark.functions.corpus_prep import (
        RECRAWL_DAILY_MAX_S,
        RECRAWL_DEFAULT_GAP_S,
        RECRAWL_HOT_COMPRESS,
        RECRAWL_HOT_OFFSET,
        RECRAWL_HOURLY_MAX_S,
        RECRAWL_SPARSE_EVERY,
        RECRAWL_SPARSE_OFFSET,
        recrawl_schedule,
    )

    obs = {}
    for r in spark.read.parquet(f"{SF}/events.parquet").collect():
        ts_s = int(r.ts.replace(tzinfo=__import__("datetime").timezone.utc).timestamp())
        obs.setdefault(r.user_id, []).append(ts_s)
        obs.setdefault(r.user_id + RECRAWL_HOT_OFFSET, []).append(
            ts_s // RECRAWL_HOT_COMPRESS
        )
        if r.event_id % RECRAWL_SPARSE_EVERY == 0:
            obs.setdefault(r.user_id + RECRAWL_SPARSE_OFFSET, []).append(ts_s)

    exp = {}
    for pid, ts in obs.items():
        n, first, last = len(ts), min(ts), max(ts)
        gap = (last - first) // (n - 1) if n >= 2 else RECRAWL_DEFAULT_GAP_S
        band = (
            "unknown"
            if n < 2
            else "hourly"
            if gap <= RECRAWL_HOURLY_MAX_S
            else "daily"
            if gap <= RECRAWL_DAILY_MAX_S
            else "slow"
        )
        exp[pid] = (n, gap, band, last + gap)

    got = {
        r.page_id: (r.n_obs, r.gap_s, r.band, r.next_due_s)
        for r in recrawl_schedule(spark, SF).collect()
    }
    assert got == exp
    bands = {v[2] for v in got.values()}
    assert bands == {"hourly", "daily", "slow", "unknown"}


def test_split_leakage_consistent_with_components(spark):
    """Leakage pairs must be exactly the minhash candidate pairs
    (same single-sourced band index as dedup_minhash_lsh) labeled with
    exactly train_split's assignments, the leak flag must equal
    label inequality, and the fixture must contain BOTH leaking and
    non-leaking near-dup pairs."""
    from freki_spark.functions.corpus_prep import split_leakage, train_split
    from freki_spark.functions.dedup import dedup_minhash_lsh

    mh_pairs = {
        (r.a, r.b) for r in dedup_minhash_lsh(spark, SF).collect()
    }
    splits = {
        r.doc_id: r.split for r in train_split(spark, SF).collect()
    }

    def split_of(doc_id):
        # mutant ids (+100000) are not in the documents table;
        # recompute their label with the same salted bucket rule
        if doc_id in splits:
            return splits[doc_id]
        import hashlib

        b = (
            int(hashlib.md5(f"split|{doc_id}".encode()).hexdigest()[:8], 16)
            % 100
        )
        return "valid" if b < 1 else ("test" if b < 2 else "train")

    rows = split_leakage(spark, SF).collect()
    assert {(r.a, r.b) for r in rows} == mh_pairs
    for r in rows:
        assert r.split_a == split_of(r.a)
        assert r.split_b == split_of(r.b)
        assert r.leak == int(r.split_a != r.split_b)
    leaks = sum(r.leak for r in rows)
    assert 0 < leaks < len(rows)


def test_hybrid_rrf_matches_python_fusion(spark):
    """The fused list must equal a plain-python RRF recompute over the
    two component retrievers' own outputs plus the static prior
    (integer reciprocal micros, rank tie-break by doc_id), and the
    multi-source summation branch must fire on the fixture."""
    from freki_spark.functions.search import (
        HYBRID_N_QUERIES,
        HYBRID_TOPK,
        PRIOR_K,
        RRF_K,
        bm25_topk,
        hybrid_rrf,
    )
    from freki_spark.functions.similarity import ann_lsh_bucketed

    contrib = {}

    def add(q, d, rank):
        key = (q, d)
        s, n = contrib.get(key, (0, 0))
        contrib[key] = (s + 1_000_000 // (RRF_K + rank), n + 1)

    for r in bm25_topk(spark, SF).collect():
        add(r.query_id, r.doc_id, r.rk)
    for r in ann_lsh_bucketed(spark, SF).collect():
        if 1 <= r.q_id <= HYBRID_N_QUERIES:
            add(int(r.q_id), r.vec_id, r.rnk)
    for q in range(1, HYBRID_N_QUERIES + 1):
        for d in range(1, PRIOR_K + 1):
            add(q, d, d)

    exp = []
    for q in range(1, HYBRID_N_QUERIES + 1):
        cand = sorted(
            ((d, s, n) for (qq, d), (s, n) in contrib.items() if qq == q),
            key=lambda x: (-x[1], x[0]),
        )[:HYBRID_TOPK]
        exp += [(q, d, s, n, i + 1) for i, (d, s, n) in enumerate(cand)]

    got = sorted(
        (r.query_id, r.doc_id, r.rrf_micro, r.n_sources, r.rk)
        for r in hybrid_rrf(spark, SF).collect()
    )
    assert got == sorted(exp)
    assert any(n >= 2 for _, _, _, n, _ in got)


def test_lsh_bucket_stats_matches_python_recompute(spark):
    """The occupancy histogram must equal a plain-python recompute of
    the hyperplane buckets (same md5 plane weights, same left-to-right
    dot-product order, bit-length histogram), and the invariants must
    hold: Σ n_vecs = corpus size, max_occ within its power-of-two
    band."""
    from collections import Counter

    from freki_spark.functions.similarity import (
        N_PLANES,
        _plane_weight,
        lsh_bucket_stats,
    )

    occ = Counter()
    rows = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    for r in rows:
        v = [float(x) for x in r.embedding]
        b = 0
        for p in range(N_PLANES):
            dot = 0.0
            for j, x in enumerate(v):
                dot += x * _plane_weight(p, j)
            if dot > 0:
                b |= 1 << p
        occ[b] += 1

    exp = {}
    for n in occ.values():
        k = n.bit_length()
        nb, nv, mx = exp.get(k, (0, 0, 0))
        exp[k] = (nb + 1, nv + n, max(mx, n))

    got = {
        r.occ_bucket: (r.n_buckets, r.n_vecs, r.max_occ)
        for r in lsh_bucket_stats(spark, SF).collect()
    }
    assert got == exp
    assert sum(v[1] for v in got.values()) == len(rows)
    for k, (_, _, mx) in got.items():
        assert 2 ** (k - 1) <= mx < 2**k


def test_colloc_dice_matches_python_recompute(spark):
    """The top-K collocations must equal a plain-python recompute
    (multiset bigram counts, unigram counts, exact integer Dice ppm,
    min-count gate, (score desc, bigram) ordering)."""
    from collections import Counter

    from freki_spark.functions.text_analysis import (
        COLLOC_MIN_COUNT,
        COLLOC_TOPK,
        colloc_dice,
    )

    cb, cu = Counter(), Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").collect():
        tk = r.text.split(" ")
        cu.update(tk)
        if len(tk) >= 2:
            cb.update(f"{a} {b}" for a, b in zip(tk, tk[1:]))

    def dice_ppm(num, den):
        q, r_ = divmod(num, den)
        return q * 1_000_000 + (r_ * 1000 // den) * 1000 + (
            (r_ * 1000 % den) * 1000 // den
        )

    cand = sorted(
        (
            (bg, n, cu[bg.split(" ")[0]], cu[bg.split(" ")[1]])
            for bg, n in cb.items()
            if n >= COLLOC_MIN_COUNT
        ),
        key=lambda x: (-dice_ppm(2 * x[1], x[2] + x[3]), x[0]),
    )[:COLLOC_TOPK]
    exp = [
        (bg, n, ca, cbn, dice_ppm(2 * n, ca + cbn), i + 1)
        for i, (bg, n, ca, cbn) in enumerate(cand)
    ]

    got = [
        (r.bigram, r.c_ab, r.c_a, r.c_b, r.dice_ppm, r.rank)
        for r in colloc_dice(spark, SF).collect()
    ]
    assert got == exp
    assert all(0 < d <= 1_000_000 for *_, d, _ in got)


def test_domain_authority_consistent_with_link_graph(spark):
    """Degrees, link masses, self shares, and the authority flag must
    equal a plain-python rollup of the link_graph relation itself, and
    the fixture must contain both flagged authorities (hub domains
    cited by many sources) and excluded self-linkers."""
    from freki_spark.functions.corpus_prep import (
        AUTH_MIN_SOURCES,
        domain_authority,
        link_graph,
    )

    edges = link_graph(spark, SF).collect()
    exp = {}
    for e in edges:
        for d in (e.src_domain, e.dst_domain):
            exp.setdefault(d, [set(), 0, set(), 0, 0])
        o = exp[e.src_domain]
        o[0].add(e.dst_domain)
        o[1] += e.n_links
        i = exp[e.dst_domain]
        i[2].add(e.src_domain)
        i[3] += e.n_links
        if e.src_domain == e.dst_domain:
            exp[e.src_domain][4] += e.n_links

    def row(d):
        od, ol, ids, il, sl = exp[d]
        share = sl * 1_000_000 // il if il > 0 else 0
        auth = int(len(ids) >= AUTH_MIN_SOURCES and share < 500_000)
        return (len(od), ol, len(ids), il, sl, share, auth)

    got = {
        r.domain: (
            r.out_degree,
            r.out_links,
            r.in_degree,
            r.in_links,
            r.self_links,
            r.self_share_ppm,
            r.is_authority,
        )
        for r in domain_authority(spark, SF).collect()
    }
    assert got == {d: row(d) for d in exp}
    flags = [v[6] for v in got.values()]
    assert 0 < sum(flags) < len(flags)
    assert any(v[4] > 0 and v[6] == 0 for v in got.values())


def test_hits_matches_naive_integer_reference(spark):
    """Exact integer max-normalized HITS recomputed in pure python
    from the same deterministic edge rule — every hub/authority score
    must match bit-for-bit (no float tolerance: the op is all-integer,
    and python's unbounded floor-div reproduces the staged quotient
    exactly).  Max-norm, not L1: per-node ppm resolution must not
    shrink with corpus size (L1-to-1e6 floors every share to 0 beyond
    ~1e6 nodes)."""
    import hashlib

    from freki_spark.functions.graph import (
        HITS_ITERS,
        HITS_SCALE,
        PR_FANOUT,
        hits_scores,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(docs)
    targets = {
        d: [
            t
            for t in dict.fromkeys(
                h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
            )
            if t != d
        ]
        for d in docs
    }

    def max_ppm(raw):
        tot = max(raw.values())
        return {k: v * 1_000_000 // tot for k, v in raw.items()}

    auth = {d: HITS_SCALE for d in docs}
    hub = {}
    for _ in range(HITS_ITERS):
        hr = {}
        for u, ts in targets.items():
            s = sum(auth.get(v, 0) for v in ts)
            if ts:
                hr[u] = s
        hub = max_ppm(hr)
        ar = {}
        for u, ts in targets.items():
            hu = hub.get(u, 0)
            for v in ts:
                ar[v] = ar.get(v, 0) + hu
        auth = max_ppm(ar)
    exp = {d: (hub.get(d, 0), auth.get(d, 0)) for d in docs}

    got = {
        r.doc_id: (r.hub_ppm, r.auth_ppm)
        for r in hits_scores(spark, SF).collect()
    }
    assert got == exp
    # max norm: the top node of each vector sits exactly at 1e6, and
    # the scale never collapses with corpus size
    assert max(v[0] for v in got.values()) == 1_000_000
    assert max(v[1] for v in got.values()) == 1_000_000
    assert all(0 <= v[0] <= 1_000_000 and 0 <= v[1] <= 1_000_000
               for v in got.values())
    # hubs and authorities genuinely dissociate on the md5 graph
    assert any(h > 0 and a == 0 for h, a in got.values()) or any(
        a > 0 and h == 0 for h, a in got.values()
    )


def test_site_boilerplate_matches_naive_python(spark):
    """Brute-force recompute of the cross-page template detection:
    lines from raw text + injected chrome, per-(domain, line) distinct
    page counts, ≥60%-of-pages gate on domains with ≥3 pages, per-page
    chrome rollup and 30% drop gate — every output column must match,
    both verdicts must occur, and the injected banner (100% of pages)
    and footer (90%) must be flagged on every eligible domain while
    the corpus keeps at least one sub-gate natural line."""
    from freki_spark.functions.corpus_prep import (
        BP_DROP_PCT,
        BP_LINE_W,
        BP_MIN_PAGES,
        BP_PCT,
        site_boilerplate,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    pages = {}
    for r in docs:
        tk = r.text.split(" ")
        body = [
            " ".join(tk[i * BP_LINE_W : (i + 1) * BP_LINE_W])
            for i in range((len(tk) + BP_LINE_W - 1) // BP_LINE_W)
        ]
        lines = [f"nav {r.source} home"] + body
        if r.doc_id % 10 != 0:
            lines.append(f"copyright {r.source} legal")
        pages[r.doc_id] = (r.source, lines)

    from collections import defaultdict

    line_pages = defaultdict(set)
    domain_pages = defaultdict(set)
    for d, (dom, lines) in pages.items():
        domain_pages[dom].add(d)
        for ln in lines:
            line_pages[(dom, ln)].add(d)
    bp = {
        (dom, ln)
        for (dom, ln), ds in line_pages.items()
        if len(domain_pages[dom]) >= BP_MIN_PAGES
        and len(ds) * 100 >= BP_PCT * len(domain_pages[dom])
    }

    got = {r.doc_id: r for r in site_boilerplate(spark, SF).collect()}
    assert set(got) == set(pages)
    dropped = kept = 0
    for d, (dom, lines) in pages.items():
        n_boiler = sum(1 for ln in lines if (dom, ln) in bp)
        r = got[d]
        assert (r.domain, r.n_lines, r.n_boiler) == (dom, len(lines), n_boiler)
        assert r.keep_ratio_ppm == (len(lines) - n_boiler) * 1_000_000 // len(lines)
        assert r.is_dropped == int(n_boiler * 100 > BP_DROP_PCT * len(lines))
        dropped += r.is_dropped
        kept += 1 - r.is_dropped
    assert dropped >= 1 and kept >= 1
    # the injected chrome is actually caught: the banner sits on 100%
    # of pages of every eligible domain; the footer only where the
    # domain's footer-carrying share actually clears the gate (small
    # domains can fall below 60% when their %10==0 pages cluster)
    footer_flagged = 0
    for dom, ds in domain_pages.items():
        if len(ds) >= BP_MIN_PAGES:
            assert (dom, f"nav {dom} home") in bp
            with_footer = sum(1 for d in ds if d % 10 != 0)
            if with_footer * 100 >= BP_PCT * len(ds):
                assert (dom, f"copyright {dom} legal") in bp
                footer_flagged += 1
            else:
                assert (dom, f"copyright {dom} legal") not in bp
    assert footer_flagged >= 1
    # and the gate is selective: some natural line stays unflagged
    assert any(
        (dom, ln) not in bp
        for d, (dom, lines) in pages.items()
        for ln in lines
    )


def test_k_anonymity_matches_naive_python(spark):
    """Brute-force recompute of the equivalence-class audit: group by
    (lang, n_chars div 256), class size k, distinct-source
    l-diversity, and both risk flags — bit-exact, with both flag
    states present at this sf (k=2 singleton-source classes exist in
    the sf0.001 fixture)."""
    from collections import defaultdict

    from freki_spark.functions.corpus_prep import (
        KANON_BUCKET,
        KANON_K_MIN,
        KANON_L_MIN,
        k_anonymity,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "lang", "n_chars", "source"
    ).collect()
    cls = defaultdict(list)
    for r in docs:
        cls[(r.lang, r.n_chars // KANON_BUCKET)].append(r.source)
    exp = {
        q: (len(srcs), len(set(srcs)))
        for q, srcs in cls.items()
    }
    got = {(r.lang, r.size_bucket): r for r in k_anonymity(spark, SF).collect()}
    assert set(got) == set(exp)
    for q, (k, ld) in exp.items():
        r = got[q]
        assert (r.k, r.l_distinct) == (k, ld), q
        assert r.at_risk_k == int(k < KANON_K_MIN)
        assert r.at_risk_l == int(ld < KANON_L_MIN)
    assert any(r.at_risk_k for r in got.values())
    assert any(r.at_risk_l for r in got.values())
    assert any(not r.at_risk_k and not r.at_risk_l for r in got.values())


def test_dialog_assemble_matches_naive_python(spark):
    """Brute-force recompute of the conversation assembly: 30-min gap
    sessionization, event-type role mapping, consecutive same-role
    coalescing, and ordered 'role: text' turn arrays — every thread
    must match exactly, real coalescing must occur (n_msgs > n_turns
    somewhere), and some user must produce multiple threads."""
    from collections import defaultdict
    from datetime import timedelta

    from freki_spark.queries import DIALOG_USER_TYPES, dialog_assemble

    ev = defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "event_id", "ts", "event_type")
        .collect()
    ):
        ev[r.user_id].append((r.ts, r.event_id, r.event_type))

    exp = {}
    gap = timedelta(minutes=30)
    for u, rows in ev.items():
        rows.sort()
        sess_no = 0
        prev_ts = None
        prev_role = None
        turns = None
        for ts, eid, et in rows:
            role = "user" if et in DIALOG_USER_TYPES else "assistant"
            txt = f"{et}#{eid}"
            if prev_ts is None or ts > prev_ts + gap:
                sess_no += 1
                exp[(u, sess_no)] = turns = []
                prev_role = None
            if role != prev_role:
                turns.append([role, []])
            turns[-1][1].append(txt)
            prev_ts, prev_role = ts, role

    got = {(r.user_id, r.sess_no): r for r in dialog_assemble(spark, SF).collect()}
    assert set(got) == set(exp)
    coalesced = multi_thread_users = 0
    for k, turns in exp.items():
        r = got[k]
        assert r.turns == " | ".join(
            f"{role}: {' '.join(ms)}" for role, ms in turns
        ), k
        assert r.n_turns == len(turns)
        assert r.n_msgs == sum(len(ms) for _, ms in turns)
        coalesced += int(r.n_msgs > r.n_turns)
    by_user = defaultdict(int)
    for u, _s in exp:
        by_user[u] += 1
    multi_thread_users = sum(1 for n in by_user.values() if n > 1)
    assert coalesced >= 1  # same-role runs really merge
    assert multi_thread_users >= 1  # the gap rule really splits


def test_license_detect_matches_naive_python(spark):
    """Brute-force recompute of the precedence-ordered license
    detector over the marker-injected corpus: every class and both
    train_ok verdicts must occur, the detector must run on the
    clamped 256-char tail (short docs exist at this sf), and the
    cc-by-nc docs must ALSO match the broader cc-by pattern — proving
    the precedence ordering is load-bearing, not decorative."""
    import re

    from freki_spark.functions.corpus_prep import (
        LICENSE_MOD,
        LICENSE_RULES,
        LICENSE_TAIL,
        license_detect,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    exp = {}
    nc_also_by = 0
    for r in docs:
        text = r.text
        res = r.doc_id % LICENSE_MOD
        if 1 <= res <= len(LICENSE_RULES):
            text += " " + LICENSE_RULES[res - 1][2]
        tail = text[max(len(text) - LICENSE_TAIL, 0):]
        lic, ok = "none", 1
        for cls, rx, _m, redis in LICENSE_RULES:
            if re.search(rx, tail):
                lic, ok = cls, redis
                break
        if lic == "cc-by-nc":
            nc_also_by += int(re.search(r"cc[- ]by", tail) is not None)
        exp[r.doc_id] = (lic, ok)

    got = {r.doc_id: (r.license, r.train_ok) for r in license_detect(spark, SF).collect()}
    assert got == exp
    seen = {v[0] for v in exp.values()}
    assert seen == {c for c, *_ in LICENSE_RULES} | {"none"}
    assert {v[1] for v in exp.values()} == {0, 1}
    assert nc_also_by >= 1  # precedence decided at least one doc
    assert any(len(r.text) < LICENSE_TAIL for r in docs)  # clamp path live


def test_cdc_chunks_matches_naive_python(spark):
    """Brute-force recompute of the content-defined chunking: rolling
    md5-window boundary rule, closed-form span assembly, empty-tail
    drop, md5i60 chunk ids, and distinct-page sharing counts — every
    chunk row must match, and both sharing verdicts must occur."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.dedup import CDC_DIV, CDC_W, cdc_chunks

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    exp = {}
    by_hash = defaultdict(set)
    for r in docs:
        tk = r.text.split(" ")
        n = len(tk)
        bp = [
            p
            for p in range(CDC_W, n + 1)
            if h32(" ".join(tk[p - CDC_W : p])) % CDC_DIV == 0
        ]
        bounds = [1] + [b + 1 for b in bp]
        ends = bp + [n]
        for k, (s, e) in enumerate(zip(bounds, ends)):
            if s > e:
                continue  # final boundary at n → empty tail
            h = h60(" ".join(tk[s - 1 : e]))
            exp[(r.doc_id, k)] = (e - s + 1, h)
            by_hash[h].add(r.doc_id)

    got = {(r.doc_id, r.chunk_no): r for r in cdc_chunks(spark, SF).collect()}
    assert set(got) == set(exp)
    shared = unshared = 0
    for key, (nt, h) in exp.items():
        r = got[key]
        assert (r.n_tokens, r.chunk_hash) == (nt, h), key
        assert r.n_docs_sharing == len(by_hash[h])
        assert r.is_shared == int(len(by_hash[h]) > 1)
        shared += r.is_shared
        unshared += 1 - r.is_shared
    assert shared >= 1 and unshared >= 1


def test_cdc_chunks_survive_early_insertion(spark):
    """THE content-defined-chunking property (vs fixed-width): insert
    a token near the head of a document and most chunk hashes must
    survive, because boundaries re-synchronize after the edit —
    fixed-width chunking re-aligns everything downstream and loses
    (nearly) all sharing.  Pure-python check of the same rule on the
    fixture's longest doc."""
    import hashlib

    from freki_spark.functions.dedup import CDC_DIV, CDC_W

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def chunks(tk):
        n = len(tk)
        bp = [
            p
            for p in range(CDC_W, n + 1)
            if h32(" ".join(tk[p - CDC_W : p])) % CDC_DIV == 0
        ]
        bounds = [1] + [b + 1 for b in bp]
        ends = bp + [n]
        return {
            " ".join(tk[s - 1 : e])
            for s, e in zip(bounds, ends)
            if s <= e
        }

    text = max(
        (
            r.text
            for r in spark.read.parquet(f"{SF}/documents.parquet")
            .select("text")
            .collect()
        ),
        key=len,
    )
    tk = text.split(" ")
    assert len(tk) >= 60
    mutated = tk[:3] + ["INSERTED"] + tk[3:]
    a, b = chunks(tk), chunks(mutated)
    # cdc: the edit disturbs only the chunk(s) around position 3
    assert len(a & b) / len(a) >= 0.6

    def fixed(tk, w=8):
        return {
            " ".join(tk[i : i + w]) for i in range(0, len(tk), w)
        }

    fa, fb = fixed(tk), fixed(mutated)
    # fixed-width: the same edit re-aligns every downstream chunk
    assert len(fa & fb) / len(fa) < len(a & b) / len(a)


def test_slop_filter_matches_naive_python(spark):
    """Brute-force recompute of the assistant-boilerplate gate over
    the marker-injected corpus: exact occurrence totals (substring
    counts on lowercased text) and the hard-phrase-or-2+-hits flag —
    all four gate branches (clean, soft-single unflagged, hard-single
    flagged, combo flagged) must occur."""
    from freki_spark.functions.text_analysis import (
        SLOP_MIN_HITS,
        SLOP_MOD,
        SLOP_PHRASES,
        slop_filter,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).collect()
    exp = {}
    branches = set()
    for r in docs:
        text = r.text
        res = r.doc_id % SLOP_MOD
        if 1 <= res <= len(SLOP_PHRASES):
            p = SLOP_PHRASES[res - 1]
            text += " " + p[0].upper() + p[1:]
        elif res == len(SLOP_PHRASES) + 1:
            text += " " + SLOP_PHRASES[3] + ". " + SLOP_PHRASES[4]
        low = text.lower()
        counts = [low.count(p) for p in SLOP_PHRASES]
        total = sum(counts)
        hard = counts[0] + counts[1]
        flag = int(hard > 0 or total >= SLOP_MIN_HITS)
        exp[r.doc_id] = (total, flag)
        if total == 0:
            branches.add("clean")
        elif hard > 0 and total == 1:
            branches.add("hard-single")
        elif flag == 0:
            branches.add("soft-single")
        else:
            branches.add("combo")

    got = {r.doc_id: (r.n_slop, r.is_slop) for r in slop_filter(spark, SF).collect()}
    assert got == exp
    assert branches == {"clean", "soft-single", "hard-single", "combo"}


def test_mrl_recall_matches_numpy_recompute(spark):
    """Matryoshka-truncation recall vs a full numpy recompute of both
    rankings (exact doubles, (cos desc, vec_id) tie-break): overlap
    counts and ppm must match per probe, the probe itself must survive
    truncation (self-cosine is 1.0 under any prefix), and truncation
    must genuinely cost recall somewhere on the random fixture."""
    import numpy as np

    from freki_spark.functions.similarity import (
        MRL_DIM,
        N_PROBES,
        TOP_K,
        mrl_recall,
    )

    rows = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    ).collect()
    ids = [r.vec_id for r in rows]
    M = np.array([r.embedding for r in rows], dtype=np.float64)

    def topk(mat):
        out = {}
        norms = np.linalg.norm(mat, axis=1)
        for q in range(N_PROBES):
            qi = ids.index(q)
            cos = (mat @ mat[qi]) / (norms * norms[qi])
            order = sorted(zip(-np.round(cos, 5), ids))[:TOP_K]
            out[q] = {v for _c, v in order}
        return out

    full, trunc = topk(M), topk(M[:, :MRL_DIM])
    got = {r.q_id: r for r in mrl_recall(spark, SF).collect()}
    assert set(got) == set(range(N_PROBES))
    for q in range(N_PROBES):
        exp_overlap = len(full[q] & trunc[q])
        r = got[q]
        assert r.k == TOP_K
        assert r.n_overlap == exp_overlap, q
        assert r.recall_ppm == exp_overlap * 1_000_000 // TOP_K
        assert q in full[q] and q in trunc[q]  # self survives truncation
        assert r.n_overlap >= 1
    assert any(r.n_overlap < TOP_K for r in got.values())  # truncation bites


def test_merge_upsert_matches_naive_python_and_lifecycle(spark):
    """Brute-force recompute of the CDC merge (latest version wins,
    tombstones beat older rows) plus a pin on each lifecycle shape:
    untouched v0, single update, superseded double update, tombstoned
    key absent, delete-then-reinsert present, and fresh inserts."""
    import hashlib

    from freki_spark.functions.dedup import UPSERT_OFFSET, merge_upsert

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    docs = {r.doc_id: r.text for r in spark.read.parquet(
        f"{SF}/documents.parquet").select("doc_id", "text").collect()}
    exp = {}
    for d, text in docs.items():
        versions = [(0, False, text)]
        if d % 9 == 2:
            versions.append((1, False, "u1 " + text))
        if d % 9 == 4:
            versions.append((1, True, ""))
        if d % 18 == 2:
            versions.append((2, False, "u2 " + text))
        if d % 27 == 4:
            versions.append((2, False, "back " + text))
        v, is_del, t = max(versions)
        if not is_del:
            exp[d] = (v, h60(t), len(versions))
        if d < 20:
            exp[d + UPSERT_OFFSET] = (1, h60("ins " + text), 1)

    got = {
        r.doc_id: (r.version, r.text_hash, r.n_versions)
        for r in merge_upsert(spark, SF).collect()
    }
    assert got == exp
    # every lifecycle shape occurred in the fixture
    ds = set(docs)
    assert any(d % 9 not in (2, 4) and d >= 20 for d in ds)          # untouched
    assert any(d % 9 == 2 and d % 18 != 2 for d in ds)               # u1 wins
    assert any(d % 18 == 2 for d in ds)                              # u2 supersedes
    tomb = [d for d in ds if d % 9 == 4 and d % 27 != 4]
    assert tomb and all(d not in got for d in tomb)                  # tombstoned
    reins = [d for d in ds if d % 27 == 4]
    assert reins and all(got[d][0] == 2 for d in reins)              # reinserted
    assert any(d + UPSERT_OFFSET in got for d in ds if d < 20)       # inserts


def test_token_budget_cap_matches_naive_python(spark):
    """Brute-force recompute of the per-source token-budget cap:
    md5-ordered running totals, prior-rows-only straddle test,
    boundary-doc truncation — every row must match, each source must
    truncate exactly one doc (budget < source total in the fixture),
    and kept token mass per source must equal the budget."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.corpus_prep import (
        BUDGET_TOKENS,
        token_budget_cap,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rows = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "text"
    ).collect()
    by_src = defaultdict(list)
    for r in rows:
        by_src[r.source].append(
            (h32(str(r.doc_id)), r.doc_id, len(r.text.split(" ")))
        )
    exp = {}
    for src, docs in by_src.items():
        docs.sort()
        cum = 0
        for _h, d, n in docs:
            kept = max(min(BUDGET_TOKENS - cum, n), 0)
            status = (
                "drop" if cum >= BUDGET_TOKENS
                else "keep" if cum + n <= BUDGET_TOKENS
                else "truncate"
            )
            exp[d] = (src, n, cum, kept, status)
            cum += n

    got = {
        r.doc_id: (r.source, r.n_tokens, r.cum_before, r.kept_tokens, r.status)
        for r in token_budget_cap(spark, SF).collect()
    }
    assert got == exp
    per_src_kept = defaultdict(int)
    per_src_trunc = defaultdict(int)
    for d, (src, _n, _c, kept, status) in exp.items():
        per_src_kept[src] += kept
        per_src_trunc[src] += status == "truncate"
    for src in by_src:
        assert per_src_kept[src] == BUDGET_TOKENS  # budgets are exact
        assert per_src_trunc[src] == 1  # fixture totals exceed budget
    assert {s for *_x, s in exp.values()} == {"keep", "truncate", "drop"}


def test_inbatch_collisions_matches_naive_python(spark):
    """Brute-force recompute of the contrastive false-negative
    telemetry: hash batch assignment over the near-dup corpus,
    band-candidate pairs intersected with co-batched pairs, per-batch
    counts and pair-capacity ppm — with real collisions present
    (mutant pairs land co-batched at ~1/8 rate)."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.dedup import (
        INBATCH_N,
        _bands,
        _near_dup_corpus,
        _with_minhash,
        inbatch_collisions,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    ids = [r.doc_id for r in _near_dup_corpus(spark, SF).select("doc_id").collect()]
    batch = {d: h32(str(d)) % INBATCH_N for d in ids}
    # candidate pairs from the op's own (already oracle-checked)
    # banding stage — this test pins the batching/intersection layer
    pair_rows = (
        _bands(_with_minhash(_near_dup_corpus(spark, SF)))
        .groupBy("band", "bv")
        .agg(__import__("pyspark").sql.functions.collect_list("doc_id").alias("ds"))
        .collect()
    )
    pairs = set()
    for r in pair_rows:
        ds = sorted(set(r.ds))
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs.add((ds[i], ds[j]))
    coll = defaultdict(int)
    for a, b in pairs:
        if batch[a] == batch[b]:
            coll[batch[a]] += 1
    sizes = defaultdict(int)
    for d in ids:
        sizes[batch[d]] += 1

    got = {r.batch_id: r for r in inbatch_collisions(spark, SF).collect()}
    assert set(got) == set(range(INBATCH_N))
    for b in got:
        r = got[b]
        assert r.n_docs == sizes[b]
        assert r.n_collisions == coll[b], b
        cap = max(sizes[b] * (sizes[b] - 1), 1)
        assert r.collision_ppm == r.n_collisions * 2 * 1_000_000 // cap
    assert sum(coll.values()) >= 1  # the telemetry has signal


def test_attribution_last_touch_matches_naive_python(spark):
    """Brute-force LOCF recompute: per user in (ts, event_id) order,
    carry the latest view channel/timestamp forward and read it at
    every purchase — channel, lag, and the no-prior-view 'none'
    branch must all match, with both branches present."""
    import json
    from collections import defaultdict

    from freki_spark.queries import ATTR_CHANNELS, attribution_last_touch

    ev = defaultdict(list)
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "user_id", "ts", "event_type", "props")
        .collect()
    ):
        ev[r.user_id].append(r)
    exp = {}
    for u, rows in ev.items():
        rows.sort(key=lambda r: (r.ts, r.event_id))
        last_ch, last_vts = None, None
        for r in rows:
            ts_s = int(r.ts.timestamp())
            if r.event_type == "view":
                k = int(json.loads(r.props)["k"])
                last_ch, last_vts = f"ch{k % ATTR_CHANNELS}", ts_s
            if r.event_type == "purchase":
                exp[r.event_id] = (
                    u,
                    ts_s,
                    last_ch or "none",
                    ts_s - last_vts if last_vts is not None else -1,
                )

    got = {
        r.event_id: (r.user_id, r.ts_s, r.channel, r.lag_s)
        for r in attribution_last_touch(spark, SF).collect()
    }
    assert got == exp
    assert any(c == "none" for _u, _t, c, _l in exp.values())
    assert any(c != "none" for _u, _t, c, _l in exp.values())
    assert all(l >= 0 for _u, _t, c, l in exp.values() if c != "none")


def test_path_rollup_matches_naive_python_and_contains(spark):
    """Brute-force recompute of the prefix rollup plus the hierarchy
    containment invariant: every non-leaf prefix's doc count and char
    total must equal the sum over its children — the property that
    makes the rollup navigable."""
    from collections import defaultdict

    from freki_spark.functions.corpus_prep import path_rollup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    ).collect()
    exp = defaultdict(lambda: [0, 0])
    for r in docs:
        s1 = f"/cat{r.doc_id % 5}"
        s2 = f"{s1}/sub{r.doc_id % 50}"
        s3 = f"{s2}/page-{r.doc_id}"
        for depth, p in ((1, s1), (2, s2), (3, s3)):
            e = exp[(r.source, depth, p)]
            e[0] += 1
            e[1] += r.n_chars

    got = {
        (r.domain, r.depth, r.prefix): (r.n_docs, r.total_chars)
        for r in path_rollup(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in exp.items()}
    # containment: parent == Σ children, at both levels
    for (dom, depth, p), (n, ch) in got.items():
        if depth == 3:
            continue
        kids = [
            v
            for (d2, dep2, p2), v in got.items()
            if d2 == dom and dep2 == depth + 1 and p2.startswith(p + "/")
        ]
        assert sum(k[0] for k in kids) == n, (dom, p)
        assert sum(k[1] for k in kids) == ch, (dom, p)


def test_gap_fill_calendar_matches_naive_python(spark):
    """Brute-force recompute of the densification: per-user dense
    [first, last] day grid, zero rows on silent days, running
    lifetime totals carrying across gaps — exact match, with real
    gaps present and the dense-grid invariants pinned (contiguous
    days per user, final cum == user's event count)."""
    from collections import Counter, defaultdict

    from freki_spark.queries import gap_fill_calendar

    days = defaultdict(Counter)
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "ts")
        .collect()
    ):
        days[r.user_id][(r.ts.date() - __import__("datetime").date(1970, 1, 1)).days] += 1

    exp = {}
    for u, cnt in days.items():
        cum = 0
        for d in range(min(cnt), max(cnt) + 1):
            n = cnt.get(d, 0)
            cum += n
            exp[(u, d)] = (n, cum, int(n == 0))

    got = {
        (r.user_id, r.day): (r.n_events, r.cum_events, r.is_filled)
        for r in gap_fill_calendar(spark, SF).collect()
    }
    assert got == exp
    assert any(f for _n, _c, f in exp.values())  # real gaps exist
    for u, cnt in days.items():
        user_days = sorted(d for (uu, d) in exp if uu == u)
        assert user_days == list(range(user_days[0], user_days[-1] + 1))
        assert exp[(u, user_days[-1])][1] == sum(cnt.values())


def test_anomaly_mad_matches_naive_python(spark):
    """Brute-force recompute of the per-type median/MAD outlier flag
    in exact integer cents (dyadic doubled medians), with both
    verdicts present and the robustness property pinned: the flag
    threshold a whale purchase would drag a mean/stddev cutoff past
    stays put under MAD."""
    import statistics
    from collections import defaultdict

    from freki_spark.queries import MAD_K2, anomaly_mad

    vals = defaultdict(list)
    rows = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "event_type", "value"
    ).collect()
    cents = {}
    for r in rows:
        c = round(r.value * 100)
        cents[r.event_id] = (r.event_type, c)
        vals[r.event_type].append(c)
    med2 = {t: int(2 * statistics.median(v)) for t, v in vals.items()}
    dev2 = {
        e: abs(2 * c - med2[t]) for e, (t, c) in cents.items()
    }
    devs_by_t = defaultdict(list)
    for e, (t, _c) in cents.items():
        devs_by_t[t].append(dev2[e])
    mad2 = {t: int(2 * statistics.median(v)) for t, v in devs_by_t.items()}

    got = {r.event_id: r for r in anomaly_mad(spark, SF).collect()}
    assert set(got) == set(cents)
    flags = defaultdict(set)
    for e, (t, c) in cents.items():
        r = got[e]
        assert (r.event_type, r.cents, r.dev2, r.mad2) == (
            t, c, dev2[e], mad2[t],
        ), e
        assert r.is_anomaly == int(2 * dev2[e] > MAD_K2 * mad2[t])
        flags[t].add(r.is_anomaly)
    assert all({0, 1} <= f for f in flags.values())  # both verdicts per type


def test_changepoint_cusum_matches_naive_python(spark):
    """Brute-force recompute of the CUSUM closed form against the
    textbook RECURSION S_t = max(0, S_{t-1} + (x_t - ref)) — proving
    the prefix-min identity, not just mirroring the window math —
    plus detection pins: the boosted type alarms only at/after its
    injected changepoint, stationary types never alarm."""
    from collections import Counter, defaultdict

    from freki_spark.queries import (
        CUSUM_ALARM_MULT,
        CUSUM_BOOST_DEN,
        CUSUM_BOOST_NUM,
        changepoint_cusum,
    )

    daily = defaultdict(Counter)
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_type", "ts")
        .collect()
    ):
        d = (r.ts.date() - __import__("datetime").date(1970, 1, 1)).days
        daily[r.event_type][d] += 1

    exp = {}
    alarm_days = defaultdict(list)
    for t, cnt in daily.items():
        days = sorted(cnt)
        ref = sum(cnt.values()) // len(days)
        bf = (CUSUM_BOOST_NUM * len(days)) // CUSUM_BOOST_DEN
        s = 0
        for i, d in enumerate(days, 1):
            n = cnt[d]
            if t == "click" and i >= bf:
                n += 2 * ref
            s = max(0, s + (n - ref))  # the RECURSION, not the identity
            alarm = int(s > CUSUM_ALARM_MULT * ref)
            exp[(t, d)] = (n, s, alarm)
            if alarm:
                alarm_days[t].append(i)

    got = {
        (r.event_type, r.day): (r.n, r.cusum, r.is_alarm)
        for r in changepoint_cusum(spark, SF).collect()
    }
    assert got == exp
    # detection story: only the boosted type alarms, and only at or
    # after its injected changepoint
    assert set(alarm_days) == {"click"}
    bf_click = (CUSUM_BOOST_NUM * len(daily["click"])) // CUSUM_BOOST_DEN
    assert min(alarm_days["click"]) >= bf_click
    assert len(alarm_days["click"]) >= 3


def test_item_cooccurrence_matches_naive_python(spark):
    """Brute-force recompute of the capped bipartite projection:
    md5-ranked per-user item cap, within-user pair generation, pair
    counts — exact match, with the cap genuinely binding for at least
    one user (the quadratic-bound mechanism is live)."""
    import hashlib
    from collections import Counter, defaultdict

    from freki_spark.queries import COOC_CAP, item_cooccurrence

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    import json

    items = defaultdict(set)
    for r in (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("user_id", "props")
        .collect()
    ):
        items[r.user_id].add(int(json.loads(r.props)["k"]))

    pairs = Counter()
    capped_any = False
    for u, its in items.items():
        ranked = sorted(its, key=lambda i: (h32(f"{u}:{i}"), i))[:COOC_CAP]
        capped_any = capped_any or len(its) > COOC_CAP
        ranked = sorted(ranked)
        for x in range(len(ranked)):
            for y in range(x + 1, len(ranked)):
                pairs[(ranked[x], ranked[y])] += 1

    got = {(r.a, r.b): r.n_users for r in item_cooccurrence(spark, SF).collect()}
    assert got == dict(pairs)
    assert capped_any  # the contribution bound is exercised
    assert max(pairs.values()) >= 2  # real co-engagement signal


def test_vocab_dense_ids_matches_naive_python_and_is_permutation(spark):
    """Brute-force recompute of the two-pass shard rebase (bucket by
    md5, rank by (count desc, token), base = running bucket sizes) —
    and THE invariant that makes dictionary encoding usable: the ids
    are exactly a permutation of 0..V−1, dense and collision-free."""
    import hashlib
    from collections import Counter, defaultdict

    from freki_spark.functions.corpus_prep import (
        VOCAB_BUCKETS,
        vocab_dense_ids,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    cnt = Counter()
    for r in spark.read.parquet(f"{SF}/documents.parquet").select("text").collect():
        cnt.update(r.text.split(" "))
    by_bucket = defaultdict(list)
    for tok, c in cnt.items():
        by_bucket[h32(tok) % VOCAB_BUCKETS].append((tok, c))
    exp = {}
    base = 0
    for b in sorted(by_bucket):
        toks_sorted = sorted(by_bucket[b], key=lambda tc: (-tc[1], tc[0]))
        for i, (tok, c) in enumerate(toks_sorted):
            exp[tok] = (c, b, base + i)
        base += len(toks_sorted)

    got = {
        r.token: (r.cnt, r.bucket, r.vocab_id)
        for r in vocab_dense_ids(spark, SF).collect()
    }
    assert got == exp
    ids = sorted(v for _c, _b, v in got.values())
    assert ids == list(range(len(got)))  # dense permutation 0..V-1
    assert len(by_bucket) >= 2  # the shard rebase actually sharded


def test_two_hop_reach_matches_naive_python(spark):
    """Brute-force recompute of the friend-of-friend expansion on the
    shared md5 link graph: 2-hop neighbors minus self minus direct
    out-links, with zero-reach nodes preserved."""
    import hashlib

    from freki_spark.functions.graph import PR_FANOUT, two_hop_reach

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(docs)
    out = {
        d: [
            t
            for t in dict.fromkeys(
                h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
            )
            if t != d
        ]
        for d in docs
    }
    exp = {}
    for d in docs:
        two = set()
        for mid in out[d]:
            two.update(out.get(mid, ()))
        fresh = two - {d} - set(out[d])
        exp[d] = (len(out[d]), len(fresh))

    got = {
        r.doc_id: (r.n_1hop, r.n_2hop)
        for r in two_hop_reach(spark, SF).collect()
    }
    assert got == exp
    assert any(v[1] > 0 for v in exp.values())


def test_phrase_query_matches_naive_scan(spark):
    """The positional-index phrase execution must equal a plain python
    scan for consecutive-token matches of the same mined workload, and
    the fixture must actually exercise multi-occurrence docs."""
    from collections import Counter

    import duckdb

    from freki_spark.functions.search import (
        N_PHRASES,
        PHRASE_START,
        phrase_query,
    )

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    cnt = Counter()
    for t in texts.values():
        tk = t.split(" ")
        for i in range(max(len(tk) - 2, 1)):
            tri = " ".join(tk[i : i + 3])
            if len(tri.split(" ")) == 3:
                cnt[tri] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    workload = {
        " ".join(p.split(" ")): pid + 1
        for pid, (p, _) in enumerate(
            ranked[PHRASE_START - 1 : PHRASE_START + N_PHRASES - 1]
        )
    }
    want = {}
    for doc_id, t in texts.items():
        tk = t.split(" ")
        for phrase, pid in workload.items():
            w = phrase.split(" ")
            hits = [
                i + 1
                for i in range(len(tk) - 2)
                if tk[i : i + 3] == w
            ]
            if hits:
                want[(pid, phrase, doc_id)] = (len(hits), min(hits))
    got = {
        (r.phrase_id, r.phrase, r.doc_id): (r.n_occur, r.first_pos)
        for r in phrase_query(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0
    # the adjacency joins must handle >1 occurrence in one doc
    assert any(n > 1 for (n, _) in want.values()) or len(want) >= N_PHRASES


def test_triangle_count_matches_naive_python(spark):
    """Per-node triangle counts must equal a brute-force python
    recompute over the same md5 link graph, the corner explode must
    triple-count exactly (sum % 3 == 0), and the fixture graph must
    contain real triangles."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from freki_spark.functions.graph import PR_FANOUT, triangle_count

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    n = len(ids)

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    nbr = defaultdict(set)
    for v in ids:
        ts = []
        for k in range(1, PR_FANOUT + 1):
            t = h32(f"{v}:{k}") % n
            if t != v and t not in ts:
                ts.append(t)
        for t in ts:
            nbr[v].add(t)
            nbr[t].add(v)
    tri = defaultdict(int)
    seen_edges = {
        (min(a, b), max(a, b)) for a in nbr for b in nbr[a]
    }
    for a, b in seen_edges:
        for c in nbr[a] & nbr[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    want = {v: tri.get(v, 0) // 3 for v in ids}
    deg_want = {v: len(nbr.get(v, ())) for v in ids}
    rows = triangle_count(spark, SF).collect()
    got = {r.doc_id: r.n_tri for r in rows}
    assert got == want
    assert {r.doc_id: r.deg for r in rows} == deg_want
    total = sum(got.values())
    assert total % 3 == 0
    assert total > 0  # the fixture graph really has triangles


def test_cluster_labels_matches_python_ctfidf(spark):
    """c-TF-IDF labels must equal a python recompute over ivf_assign's
    own (oracle-checked) assignment: per-cluster term counts, cluster
    df, floor(ln(K/cdf)·tf·1e6) scoring, (-score, term) top-5."""
    import math
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.functions.similarity import (
        N_CENTROIDS,
        CLUSTER_LABEL_TOPK,
        cluster_labels,
        ivf_assign,
    )

    assign = {
        r.vec_id: r.list_id
        for r in ivf_assign(spark, SF).select("vec_id", "list_id").collect()
    }
    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    tf = defaultdict(Counter)
    for doc_id, t in texts.items():
        if doc_id in assign:
            tf[assign[doc_id]].update(t.split(" "))
    cdf = Counter()
    for c in tf.values():
        for term in c:
            cdf[term] += 1
    want = {}
    for lid, c in tf.items():
        scored = [
            (
                term,
                n,
                cdf[term],
                math.floor(math.log(N_CENTROIDS / cdf[term]) * n * 1e6),
            )
            for term, n in c.items()
        ]
        scored.sort(key=lambda r: (-r[3], r[0]))
        for rk, (term, n, df_, s) in enumerate(
            scored[:CLUSTER_LABEL_TOPK], 1
        ):
            want[(lid, term)] = (n, df_, s, rk)
    got = {
        (r.list_id, r.term): (r.tf, r.cdf, r.score_micro, r.rk)
        for r in cluster_labels(spark, SF).collect()
    }
    assert got == want
    # every cluster that has docs gets labels, and a term present in
    # every cluster scores exactly 0 (ln(K/K)) — the class-idf point
    assert set(l for l, _ in got) == set(tf)
    ubiquitous = [t for t, d in cdf.items() if d == len(tf)]
    if ubiquitous:
        assert all(
            s == 0
            for (lid, t), (_, _, s, _) in want.items()
            if t in ubiquitous
        )


def test_skyline_pareto_matches_bruteforce(spark):
    """The two-pass bucketed skyline must equal the O(n²) strict-
    dominance brute force on the raw metrics — i.e. bucketing must be
    invisible — and the frontier must contain both axis extremes."""
    import duckdb

    from freki_spark.functions.corpus_prep import skyline_pareto

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()

    def ppm(num, den):
        return num * 1_000_000 // den

    pts = {}
    for doc_id, t in rows:
        tk = t.split(" ")
        pts[doc_id] = (len(tk), ppm(len(set(tk)), len(tk)))
    want = set()
    for d, (x, y) in pts.items():
        dominated = any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for d2, (x2, y2) in pts.items()
            if d2 != d
        )
        if not dominated:
            want.add((d, x, y))
    got = {
        (r.doc_id, r.n_tok, r.div_ppm)
        for r in skyline_pareto(spark, SF).collect()
    }
    assert got == want
    assert len(got) >= 2
    max_x = max(x for x, _ in pts.values())
    max_y = max(y for _, y in pts.values())
    assert any(x == max_x for _, x, _ in got)
    assert any(y == max_y for _, _, y in got)


def test_stream_ss_join_matches_python_bruteforce(spark):
    """The watermarked stream-stream interval join must emit exactly
    the view→purchase pairs a python scan finds (same user, purchase
    in [view_ts, view_ts+1h]), with integer-second lags in bounds."""
    import duckdb

    from freki_spark.streaming.jobs import q_stream_ss_join

    # the JOIN window applies to RAW microsecond timestamps (exactly
    # what the engine and the oracle join on — fixture timestamps are
    # sub-second-fractional); only the reported lag floors each epoch
    evs = duckdb.sql(
        f"SELECT event_id, epoch_us(ts), CAST(floor(epoch(ts)) AS BIGINT),"
        f" user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    views = [(e, us, fl, u) for (e, us, fl, u, k) in evs if k == "view"]
    purch = [(e, us, fl, u) for (e, us, fl, u, k) in evs if k == "purchase"]
    want = {
        (u, ve, pe, pfl - vfl)
        for (ve, vus, vfl, u) in views
        for (pe, pus, pfl, pu) in purch
        if pu == u and vus <= pus <= vus + 3_600_000_000
    }
    got = {
        (r.user_id, r.view_id, r.purch_id, r.lag_s)
        for r in q_stream_ss_join(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0
    # p ∈ [v, v+3600s] on raw timestamps bounds the floored lag too
    assert all(0 <= l <= 3600 for (_, _, _, l) in got)


def test_recommend_topk_matches_python_cf(spark):
    """Item-based CF recommendations must equal a python recompute
    (cap -> cooc -> symmetric score -> already-seen anti-join ->
    top-3), and the anti-join must actually suppress at least one
    already-owned candidate."""
    import hashlib
    import json
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.queries import COOC_CAP, REC_K, recommend_topk

    rows = duckdb.sql(
        f"SELECT user_id, props FROM '{SF}/events.parquet'"
    ).fetchall()

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    ui = defaultdict(set)
    for u, props in rows:
        k = json.loads(props).get("k")
        if k is not None:
            ui[u].add(int(k))
    capped = {
        u: set(
            sorted(items, key=lambda i: (h32(f"{u}:{i}"), i))[:COOC_CAP]
        )
        for u, items in ui.items()
    }
    # the anti-join must exclude the FULL owned set, not the capped one
    cooc = Counter()
    for items in capped.values():
        s = sorted(items)
        for x in range(len(s)):
            for y in range(x + 1, len(s)):
                cooc[(s[x], s[y])] += 1
    sym = defaultdict(list)
    for (a, b), n in cooc.items():
        sym[a].append((b, n))
        sym[b].append((a, n))
    want = {}
    suppressed_any = False
    for u, items in capped.items():
        score = Counter()
        paths = Counter()
        for i in items:
            for (j, n) in sym.get(i, ()):
                if j in ui[u]:
                    suppressed_any = True
                    continue
                score[j] += n
                paths[j] += 1
        ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))
        for rk, (j, s) in enumerate(ranked[:REC_K], 1):
            want[(u, j)] = (s, paths[j], rk)
    got = {
        (r.user_id, r.item): (r.score, r.n_paths, r.rk)
        for r in recommend_topk(spark, SF).collect()
    }
    assert got == want
    assert len(got) > 0
    assert suppressed_any


def test_session_path_topk_matches_python_bruteforce(spark):
    """Top navigation paths must equal a python recompute (30-min
    sessionize -> ordered type sequence -> capped trigrams -> global
    top-10), and multi-event sessions must actually contribute."""
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.queries import (
        PATH_SESS_CAP,
        PATH_TOPK,
        session_path_topk,
    )

    evs = duckdb.sql(
        f"SELECT user_id, epoch_us(ts), event_id, event_type"
        f" FROM '{SF}/events.parquet' ORDER BY user_id, 2, event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for u, us, e, k in evs:
        by_user[u].append((us, e, k))
    cnt = Counter()
    n_multi = 0
    for u, rows in by_user.items():
        sessions = []
        for us, e, k in rows:
            if not sessions or us > sessions[-1][-1][0] + 1800_000_000:
                sessions.append([])
            sessions[-1].append((us, e, k))
        for s in sessions:
            seq = [k for (_, _, k) in s][:PATH_SESS_CAP]
            if len(seq) >= 3:
                n_multi += 1
                for i in range(len(seq) - 2):
                    cnt[">".join(seq[i : i + 3])] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    want = {
        (p, n, rk) for rk, (p, n) in enumerate(ranked[:PATH_TOPK], 1)
    }
    got = {
        (r.path, r.n, r.rk) for r in session_path_topk(spark, SF).collect()
    }
    assert got == want
    assert n_multi > 0 and len(got) > 0


def test_community_lpa_matches_python_and_coarsens(spark):
    """Synchronous 3-round LPA must equal a python recompute with the
    same (count desc, label asc) adoption rule, and must produce real
    communities (some multi-member label) without collapsing to one."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.functions.graph import (
        LPA_ROUNDS,
        PR_FANOUT,
        community_lpa,
    )

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    n = len(ids)

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    nbr = defaultdict(set)
    for v in ids:
        ts = []
        for k in range(1, PR_FANOUT + 1):
            t = h32(f"{v}:{k}") % n
            if t != v and t not in ts:
                ts.append(t)
        for t in ts:
            nbr[v].add(t)
            nbr[t].add(v)
    lab = {v: v for v in ids}
    for _ in range(LPA_ROUNDS):
        new = {}
        for v in ids:
            if not nbr[v]:
                new[v] = lab[v]
                continue
            c = Counter(lab[u] for u in nbr[v])
            new[v] = min(c, key=lambda l: (-c[l], l))
        lab = new
    sizes = Counter(lab.values())
    want = {v: (lab[v], sizes[lab[v]]) for v in ids}
    got = {
        r.doc_id: (r.community, r.comm_size)
        for r in community_lpa(spark, SF).collect()
    }
    assert got == want
    assert max(sizes.values()) >= 2  # real communities formed
    assert len(sizes) >= 2  # and the graph did not collapse to one


def test_kcenter_coreset_matches_python_greedy(spark):
    """The no-collect iterative k-center must equal a python greedy
    recompute on the integer cosine grid (seed 0, min-max-cos picks,
    (cmax, id) ties), centers must self-assign at cos5=1e5, and the
    worst-case coverage must improve monotonically with each pick."""
    import math

    import duckdb
    import numpy as np

    from freki_spark.functions.similarity import (
        KC_ROUNDS,
        KC_SEED_ID,
        kcenter_coreset,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    ids = [r[0] for r in rows]
    V = {r[0]: np.array(r[1], dtype=np.float64) for r in rows}

    def r5(x):
        # HALF-UP away from zero, matching Spark/DuckDB round()
        return (
            int(math.floor(x * 1e5 + 0.5))
            if x >= 0
            else -int(math.floor(-x * 1e5 + 0.5))
        )

    def c5(u, w):
        a, b = V[u], V[w]
        return r5(
            float(a @ b) / (math.sqrt(a @ a) * math.sqrt(b @ b))
        )

    sel = [KC_SEED_ID]
    radii = []
    for _ in range(KC_ROUNDS):
        cmax = {
            v: max(c5(v, s) for s in sel) for v in ids if v not in sel
        }
        pick = min(cmax, key=lambda v: (cmax[v], v))
        radii.append(cmax[pick])
        sel.append(pick)
    want = {}
    for v in ids:
        best = max(((c5(v, s), -s) for s in sel))
        want[v] = (-best[1], best[0], int(v in sel))
    got = {
        r.vec_id: (r.center_id, r.cos5, r.is_center)
        for r in kcenter_coreset(spark, SF).collect()
    }
    assert got == want
    centers = {v for v, (_, _, isc) in got.items() if isc}
    assert len(centers) == KC_ROUNDS + 1 and KC_SEED_ID in centers
    assert all(got[s] == (s, 100000, 1) for s in centers)
    # each pick's min-max cos is >= the previous (coverage tightens)
    assert radii == sorted(radii)


def test_ab_chi2_matches_python_exact(spark):
    """The 2x2 chi-square gate must equal an exact python-int
    recompute (unbounded ints stand in for DECIMAL38/HUGEINT), the
    confounded synthetic metric must flag significant, and the random
    parity split must leave at least one real metric flat."""
    from collections import defaultdict

    import duckdb

    from freki_spark.queries import (
        CHI2_CELL_CLAMP,
        CHI2_CRIT_MILLI,
        ab_chi2,
    )

    evs = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    users = {u for _, u in evs}
    na = sum(1 for u in users if u % 2 == 0)
    nb = len(users) - na
    conv = defaultdict(set)
    for k, u in evs:
        conv[k].add(u)
    tables = {
        m: (
            sum(1 for u in s if u % 2 == 0),
            sum(1 for u in s if u % 2 == 1),
        )
        for m, s in conv.items()
    }
    tables["synthetic_ab"] = (na, 0)
    want = {}
    for m, (a, c) in tables.items():
        b, d = na - a, nb - c
        ca, cb, cc, cd = (
            min(x, CHI2_CELL_CLAMP) for x in (a, b, c, d)
        )
        diff = ca * cd - cb * cc
        n = ca + cb + cc + cd
        sig = int(
            1000 * n * diff * diff
            > CHI2_CRIT_MILLI * (ca + cb) * (cc + cd) * (ca + cc) * (cb + cd)
        )
        want[m] = (
            a, b, c, d,
            a * 1_000_000 // (a + b),
            c * 1_000_000 // (c + d),
            sig,
        )
    got = {
        r.metric: (
            r.a, r.b, r.c, r.d, r.conv_a_ppm, r.conv_b_ppm, r.significant
        )
        for r in ab_chi2(spark, SF).collect()
    }
    assert got == want
    assert got["synthetic_ab"][-1] == 1
    assert any(v[-1] == 0 for m, v in got.items() if m != "synthetic_ab")


def test_colbert_maxsim_matches_numpy(spark):
    """MaxSim top-k must equal a numpy recompute over the 16-dim
    block decomposition (per-block cosines on the integer 1e-5 grid,
    max per query block, summed), with every probe's own vector at
    rank 1 with the perfect score."""
    import math

    import duckdb
    import numpy as np

    from freki_spark.functions.similarity import (
        MAXSIM_BLOCKS,
        MAXSIM_DIM,
        N_PROBES,
        TOP_K,
        colbert_maxsim,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    V = {r[0]: np.array(r[1], dtype=np.float64) for r in rows}

    def r5(x):
        return (
            int(math.floor(x * 1e5 + 0.5))
            if x >= 0
            else -int(math.floor(-x * 1e5 + 0.5))
        )

    def blocks(v):
        return [
            v[i * MAXSIM_DIM : (i + 1) * MAXSIM_DIM]
            for i in range(MAXSIM_BLOCKS)
        ]

    def maxsim(q, d):
        s = 0
        for qb in blocks(V[q]):
            s += max(
                r5(
                    float(qb @ db)
                    / (math.sqrt(qb @ qb) * math.sqrt(db @ db))
                )
                for db in blocks(V[d])
            )
        return s

    want = {}
    for q in range(N_PROBES):
        scored = sorted(
            ((maxsim(q, d), d) for d in V), key=lambda t: (-t[0], t[1])
        )
        for rk, (s, d) in enumerate(scored[:TOP_K], 1):
            want[(q, d)] = (s, rk)
    got = {
        (r.q_id, r.vec_id): (r.maxsim5, r.rnk)
        for r in colbert_maxsim(spark, SF).collect()
    }
    assert got == want
    for q in range(N_PROBES):
        assert got[(q, q)] == (MAXSIM_BLOCKS * 100000, 1)


def test_skipgram_pairs_matches_python(spark):
    """The SGNS pair relation must equal a python recompute —
    windowed positives, md5 negative draws resolved through the
    identical shard-rebased interval layout — and the negative mass
    must be exactly SG_NEG_K per token occurrence."""
    import hashlib
    from bisect import bisect_right
    from collections import Counter

    import duckdb

    from freki_spark.functions.corpus_prep import (
        SG_BUCKETS,
        SG_NEG_K,
        SG_WINDOW,
        skipgram_pairs,
    )

    texts = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    cnt = Counter()
    for _, t in texts:
        cnt.update(t.split(" "))
    # interval layout: md5 bucket, in-bucket (center asc) cumsum,
    # bucket bases in bk order
    by_bk = {}
    for tok, w in cnt.items():
        by_bk.setdefault(h32(tok) % SG_BUCKETS, []).append(tok)
    lo = {}
    base = 0
    for bk in sorted(by_bk):
        for tok in sorted(by_bk[bk]):
            lo[tok] = base
            base += cnt[tok]
    wtot = base
    bounds = sorted((l, t) for t, l in lo.items())
    starts = [b[0] for b in bounds]

    def sample(r):
        return bounds[bisect_right(starts, r) - 1][1]

    pos = Counter()
    neg = Counter()
    n_tok = 0
    for doc_id, t in texts:
        tk = t.split(" ")
        for i, c in enumerate(tk):
            n_tok += 1
            for o in range(-SG_WINDOW, SG_WINDOW + 1):
                if o != 0 and 0 <= i + o < len(tk):
                    pos[(c, tk[i + o])] += 1
            for k in range(1, SG_NEG_K + 1):
                r = h60(f"{doc_id}:{i}:{k}") % wtot
                neg[(c, sample(r))] += 1
    want = {(c, x, 1): n for (c, x), n in pos.items()}
    want |= {(c, x, 0): n for (c, x), n in neg.items()}
    got = {
        (r.center, r.context, r.label): r.n_pairs
        for r in skipgram_pairs(spark, SF).collect()
    }
    assert got == want
    assert sum(n for (_, _, l), n in got.items() if l == 0) == (
        SG_NEG_K * n_tok
    )


def test_session_window_native_equals_islands(spark):
    """Spark's built-in session_window() must produce exactly the
    sessions the manual gaps-and-islands operator finds: same count,
    same (user, start, n_events) triples, end = last event + gap."""
    from freki_spark.queries import q_session_window, q_sessionize_batch

    native = {
        (r.user_id, r.start_epoch): (r.end_epoch, r.n_events, r.sess_value)
        for r in q_session_window(spark, SF).collect()
    }
    manual = {
        (r.user_id, int(r.sess_start.timestamp() // 1)): (
            int(r.sess_end.timestamp() // 1) + 1800,
            r.n_events,
            r.sess_value,
        )
        for r in q_sessionize_batch(spark, SF).collect()
    }
    assert set(native) == set(manual)
    for k in native:
        assert native[k][1:] == manual[k][1:]
        assert native[k][0] == manual[k][0]  # end = last event + 30 min


def test_sliding_window_double_counts_exactly(spark):
    """Every event must land in exactly 2 sliding windows (1h window,
    30min slide), window starts must sit on the 30-min grid, and the
    per-window counts must match a python recompute."""
    from collections import Counter

    import duckdb

    from freki_spark.queries import q_sliding_window

    rows = q_sliding_window(spark, SF).collect()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    assert sum(r.n for r in rows) == 2 * n_events
    assert all(r.win_epoch % 1800 == 0 for r in rows)
    evs = duckdb.sql(
        f"SELECT CAST(floor(epoch(ts)) AS BIGINT), event_type"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    want = Counter()
    for t, k in evs:
        base = t // 1800 * 1800
        want[(base, k)] += 1
        want[(base - 1800, k)] += 1
    got = {(r.win_epoch, r.event_type): r.n for r in rows}
    assert got == dict(want)


def test_scan_binary_round_trips_media_bytes(spark):
    """The binaryFile source must read back exactly the staged media
    blobs: one file per synthesized asset, 32 bytes each, content
    hex equal to the synthesis rule sha256(media_ref)."""
    import hashlib

    import duckdb

    from freki_spark.queries import q_scan_binary

    rows = q_scan_binary(spark, SF).collect()
    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
            f" WHERE doc_id % 5 = 0"
        ).fetchall()
    ]
    assert {r.fname for r in rows} == {f"m{i}.bin" for i in ids}
    assert all(r.n_bytes == 32 for r in rows)
    for r in rows:
        did = int(r.fname[1:-4])
        want = hashlib.sha256(f"img://{did}/0".encode()).hexdigest().upper()
        assert r.content_hex == want


def test_entropy_filter_matches_python_and_separates(spark):
    """Integer micro-nat entropies must equal a python recompute with
    the same per-character floor staging, and the three populations
    must separate: naturals unflagged, base-36 variants flag_high,
    repetition variants flag_low."""
    import hashlib
    import math

    import duckdb

    from freki_spark.functions.text_analysis import (
        ENT_ALPHABET,
        ENT_HIGH_MICRO,
        ENT_LOW_MICRO,
        ENT_REP_LEN,
        ENT_REP_MOD,
        ENT_REP_OFFSET,
        ENT_REP_REM,
        ENT_RND_CHUNKS,
        ENT_RND_MOD,
        ENT_RND_OFFSET,
        ENT_RND_REM,
        entropy_filter,
    )

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )

    def b36(n):
        digs = "0123456789abcdefghijklmnopqrstuvwxyz"
        out = ""
        while n:
            out = digs[n % 36] + out
            n //= 36
        return out or "0"

    corpus = dict(texts)
    for d, t in texts.items():
        if d % ENT_RND_MOD == ENT_RND_REM:
            corpus[d + ENT_RND_OFFSET] = "".join(
                b36(
                    int(
                        hashlib.md5(f"{t}{k}".encode()).hexdigest()[:15],
                        16,
                    )
                )
                for k in range(ENT_RND_CHUNKS)
            )
        if d % ENT_REP_MOD == ENT_REP_REM:
            corpus[d + ENT_REP_OFFSET] = "a" * ENT_REP_LEN

    def h_micro(t):
        n = len(t)
        tot = 0
        for ch in ENT_ALPHABET:
            k = t.count(ch)
            if k > 0:
                tot += math.floor(math.log(n / k) * k * 1e6 / n)
        return tot

    want = {
        d: (len(t), h_micro(t)) for d, t in corpus.items()
    }
    rows = entropy_filter(spark, SF).collect()
    got = {r.doc_id: (r.n_chars, r.h_micro) for r in rows}
    assert got == want
    flags = {r.doc_id: (r.flag_low, r.flag_high) for r in rows}
    for d in texts:
        assert flags[d] == (0, 0), f"natural doc {d} flagged"
    rnd_ids = [
        d + ENT_RND_OFFSET for d in texts if d % ENT_RND_MOD == ENT_RND_REM
    ]
    rep_ids = [
        d + ENT_REP_OFFSET for d in texts if d % ENT_REP_MOD == ENT_REP_REM
    ]
    assert rnd_ids and all(flags[d] == (0, 1) for d in rnd_ids)
    assert rep_ids and all(flags[d] == (1, 0) for d in rep_ids)
    assert all(got[d][1] < ENT_HIGH_MICRO for d in texts)
    assert all(got[d][1] >= ENT_LOW_MICRO for d in texts)


def test_decile_bins_matches_global_sort(spark):
    """The range-rebased decile assignment must equal the naive
    global-sort deciles exactly (equal-frequency to within 1), with
    bins ordered by value and partitioning the order count."""
    import duckdb

    from freki_spark.queries import decile_bins

    cents = sorted(
        (int(round(p * 100)), k)
        for k, p in duckdb.sql(
            f"SELECT o_orderkey, o_totalprice FROM '{SF}/orders.parquet'"
        ).fetchall()
    )
    n = len(cents)
    want = {}
    for i, (c, _) in enumerate(cents):
        d = i * 10 // n
        a = want.setdefault(d, [0, c, c, 0])
        a[0] += 1
        a[1] = min(a[1], c)
        a[2] = max(a[2], c)
        a[3] += c
    got = {
        r.decile: [r.n_orders, r.cents_min, r.cents_max, r.cents_sum]
        for r in decile_bins(spark, SF).collect()
    }
    assert got == want
    assert set(got) == set(range(10))
    sizes = [got[d][0] for d in range(10)]
    assert max(sizes) - min(sizes) <= 1  # equal-frequency
    assert sum(sizes) == n
    for d in range(9):  # bins ordered by value
        assert got[d][2] <= got[d + 1][1]


def test_xml_functions_round_trip_and_escaping(spark):
    """to_xml∘from_xml must be the identity on metadata structs —
    including XML-hostile field values — and the schema-less xpath
    extraction must agree with the schema-full parse."""
    from pyspark.sql import functions as F

    from freki_spark.queries import q_xml_functions

    rows = q_xml_functions(spark, SF).collect()
    assert len(rows) == 500
    assert all(r.id_ok == 1 for r in rows)
    assert all(r.lang_rt.endswith("<&>") for r in rows)
    assert all(r.xp_lang == r.lang_rt for r in rows)
    # harder adversarial payload than the fixture carries
    nasty = 'a<&>"\'\tz & <tag> ]]>'
    df = spark.range(1).select(
        F.to_xml(F.struct(F.lit(nasty).alias("s"))).alias("x")
    )
    back = df.select(F.from_xml("x", "s STRING").alias("p")).collect()
    assert back[0].p.s == nasty


def test_variant_json_typed_paths(spark):
    """VARIANT path extraction must agree with plain JSON parsing,
    missing paths must be null (not an error), and the variant
    schema must be the constant object shape."""
    import json

    import duckdb

    from freki_spark.queries import q_variant_json

    want = {
        e: json.loads(p)["k"]
        for e, p in duckdb.sql(
            f"SELECT event_id, props FROM '{SF}/events.parquet'"
        ).fetchall()
    }
    rows = q_variant_json(spark, SF).collect()
    assert {r.event_id: r.k_int for r in rows} == want
    assert all(r.k_missing is None for r in rows)
    assert {r.v_schema for r in rows} == {"OBJECT<k: BIGINT>"}


def test_unpivot_inverts_pivot(spark):
    """pivot∘unpivot must be the identity on the long aggregate, and
    the NULL-cell drop must be exercised (some user misses a type)."""
    from collections import Counter

    import duckdb

    from freki_spark.queries import EVENT_TYPES, q_unpivot

    evs = duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    want = Counter(evs)
    got = {
        (r.user_id, r.event_type): r.n
        for r in q_unpivot(spark, SF).collect()
    }
    assert got == dict(want)
    # the fixture is dense (every user has every type), so drive the
    # NULL-cell drop with a synthetic sparse frame through the same
    # pivot -> unpivot chain
    import pyspark.sql.functions as F

    sparse = spark.createDataFrame(
        [(1, "view"), (1, "click"), (2, "view")], "user_id int, et string"
    )
    wide = sparse.groupBy("user_id").pivot("et", ["view", "click"]).agg(
        F.count(F.lit(1))
    )
    back = wide.unpivot(["user_id"], ["view", "click"], "et", "n")
    assert {(r.user_id, r.et): r.n for r in back.collect()}[(2, "click")] is None
    kept = back.filter(F.col("n").isNotNull()).collect()
    assert {(r.user_id, r.et) for r in kept} == {
        (1, "view"), (1, "click"), (2, "view")
    }


def test_pack_lpt_balances_shards(spark):
    """The size-ranked round-robin deal must equal the naive global
    recompute and bound shard imbalance by one document's mass."""
    import duckdb

    from freki_spark.queries import LPT_SHARDS, pack_lpt

    docs = sorted(
        (-len(t.split(" ")), k)
        for k, t in duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    want = {}
    for rk, (negtok, _) in enumerate(docs, 1):
        s = (rk - 1) % LPT_SHARDS
        a = want.setdefault(s, [0, 0])
        a[0] += 1
        a[1] += -negtok
    got = {
        r.shard: [r.n_docs, r.tok_sum] for r in pack_lpt(spark, SF).collect()
    }
    assert got == want
    loads = [v[1] for v in got.values()]
    max_item = max(-n for n, _ in docs)
    assert max(loads) - min(loads) <= max_item
    counts = [v[0] for v in got.values()]
    assert max(counts) - min(counts) <= 1


def test_prefix_cache_stats_matches_python(spark):
    """Per-depth shared-prefix savings must equal a python recompute,
    savings must shrink monotonically with depth on organic text, and
    depth-1 sharing must actually exist."""
    from collections import Counter

    import duckdb

    from freki_spark.functions.corpus_prep import (
        PREFIX_KS,
        prefix_cache_stats,
    )

    texts = [
        t.split(" ")
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    total = sum(len(t) for t in texts)
    want = {}
    for k in PREFIX_KS:
        grp = Counter(
            " ".join(t[:k]) for t in texts if len(t) >= k
        )
        shared = {p: n for p, n in grp.items() if n >= 2}
        saved = sum((n - 1) * k for n in shared.values())
        want[k] = (
            len(grp),
            sum(shared.values()),
            saved,
            saved * 1_000_000 // total,
        )
    got = {
        r.k: (r.n_groups, r.n_shared_docs, r.saved_tokens, r.saved_ppm)
        for r in prefix_cache_stats(spark, SF).collect()
    }
    assert got == want
    assert got[1][1] > 0  # depth-1 sharing exists (small vocab)
    # organic (non-templated) corpus: shared-doc mass non-increasing in k
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[a][1] >= got[b][1]


def test_feature_label_pit_matches_python_and_no_leakage(spark):
    """The PIT assembly must equal a python recompute, every feature
    must come strictly from before the cutoff (recency > 0 — the
    leakage witness), and both label classes must be present."""
    from collections import defaultdict

    import duckdb

    from freki_spark.queries import feature_label_pit

    evs = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT), event_type,"
        f" CAST(round(value * 100, 0) AS BIGINT)"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    t0 = min(fe for _, fe, _, _ in evs)
    t1 = max(fe for _, fe, _, _ in evs)
    tcut = t0 + (t1 - t0) * 9 // 10
    pre = defaultdict(list)
    post_purch = set()
    for u, fe, k, cents in evs:
        if fe < tcut:
            pre[u].append((fe, k, cents))
        elif k == "purchase":
            post_purch.add(u)
    want = {}
    for u, rows in pre.items():
        want[u] = (
            len(rows),
            sum(1 for _, k, _ in rows if k == "purchase"),
            sum(c for _, _, c in rows),
            tcut - max(fe for fe, _, _ in rows),
            len({fe // 86400 for fe, _, _ in rows}),
            int(u in post_purch),
        )
    got = {
        r.user_id: (
            r.n_events, r.n_purch, r.cents_sum, r.recency_s,
            r.active_days, r.label,
        )
        for r in feature_label_pit(spark, SF).collect()
    }
    assert got == want
    assert all(v[3] > 0 for v in got.values())  # strictly pre-cutoff
    labels = {v[5] for v in got.values()}
    assert labels == {0, 1}


def test_rank_agreement_matches_component_ops(spark):
    """The agreement relation must be derivable from the two
    retrievers' own outputs (single-sourcing witness), overlap must
    be a true Jaccard in ppm, and the fixture must exercise partial
    (non-total, non-empty) agreement."""
    from freki_spark.functions.search import rank_agreement
    from freki_spark.functions.search import bm25_topk, hybrid_rrf

    lex = {}
    for r in bm25_topk(spark, SF).collect():
        lex.setdefault(r.query_id, {})[r.doc_id] = r.rk
    fus = {}
    for r in hybrid_rrf(spark, SF).collect():
        fus.setdefault(r.query_id, {})[r.doc_id] = r.rk
    want = {}
    for q in set(lex) | set(fus):
        l, f = lex.get(q, {}), fus.get(q, {})
        common = set(l) & set(f)
        union = set(l) | set(f)
        want[q] = (
            len(common),
            sum((l[d] - f[d]) ** 2 for d in common),
            len(common) * 1_000_000 // len(union),
        )
    got = {
        r.query_id: (r.n_common, r.sum_d2, r.overlap_ppm)
        for r in rank_agreement(spark, SF).collect()
    }
    assert got == want
    assert any(0 < v[0] < 5 for v in got.values()) or any(
        v[1] > 0 for v in got.values()
    )


def test_bfs_landmarks_matches_python_bfs(spark):
    """Min-plus propagation must equal a plain python BFS from the
    seed set (bounded at BFS_ROUNDS hops, unreached = -1), with every
    hop count 0..BFS_ROUNDS actually present in the fixture."""
    import hashlib
    from collections import defaultdict, deque

    import duckdb

    from freki_spark.functions.graph import (
        BFS_N_SEEDS,
        BFS_ROUNDS,
        PR_FANOUT,
        bfs_landmarks,
    )

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    n = len(ids)

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    nbr = defaultdict(set)
    for v in ids:
        ts = []
        for k in range(1, PR_FANOUT + 1):
            t = h32(f"{v}:{k}") % n
            if t != v and t not in ts:
                ts.append(t)
        for t in ts:
            nbr[v].add(t)
            nbr[t].add(v)
    dist = {v: 0 for v in ids if v < BFS_N_SEEDS}
    q = deque(dist)
    while q:
        v = q.popleft()
        if dist[v] >= BFS_ROUNDS:
            continue
        for u in nbr[v]:
            if u not in dist:
                dist[u] = dist[v] + 1
                q.append(u)
    want = {v: dist.get(v, -1) for v in ids}
    got = {r.doc_id: r.dist for r in bfs_landmarks(spark, SF).collect()}
    assert got == want
    assert set(range(BFS_ROUNDS + 1)) <= set(got.values())


def test_python_datasource_contract(spark):
    """The custom source must deliver exactly the synthesized rows,
    fan out into SYNTH_PARTS planner partitions, and respect the
    per-partition ownership rule part = doc_id % SYNTH_PARTS."""
    import hashlib

    from freki_spark.queries import q_python_datasource
    from freki_spark.sources.pysource import SYNTH_N, SYNTH_PARTS

    df = q_python_datasource(spark, SF)
    assert df.rdd.getNumPartitions() == SYNTH_PARTS
    rows = df.collect()
    assert len(rows) == SYNTH_N
    for r in rows:
        assert r.part == r.doc_id % SYNTH_PARTS
        assert (
            r.payload
            == hashlib.md5(str(r.doc_id).encode()).hexdigest()
        )
    assert {r.doc_id for r in rows} == set(range(SYNTH_N))


def test_recursive_bfs_equals_dataflow_twin(spark):
    """Spark's native WITH RECURSIVE must produce exactly the same
    (doc_id, dist) relation as the iterative min-plus dataflow op —
    the two surfaces are contract twins."""
    from freki_spark.functions.graph import (
        BFS_N_SEEDS,
        BFS_ROUNDS,
        bfs_landmarks,
        q_recursive_bfs,
    )

    # scale-note pin: the recursive form materializes PATHS with
    # deg^depth multiplicity (its docstring's declared caveat), so the
    # depth/seed bounds must stay small — widening either silently
    # changes the op from "bounded ad-hoc surface" to a blow-up.
    assert BFS_ROUNDS <= 3 and BFS_N_SEEDS <= 4

    rec = {r.doc_id: r.dist for r in q_recursive_bfs(spark, SF).collect()}
    it = {r.doc_id: r.dist for r in bfs_landmarks(spark, SF).collect()}
    assert rec == it
    assert 0 in rec.values() and max(rec.values()) >= 2


def test_lateral_topk_matches_python(spark):
    """The correlated LATERAL limit must equal a python top-2-per-
    nation recompute with the same (balance desc, custkey) order, and
    every nation must be represented."""
    from collections import defaultdict

    import duckdb

    from freki_spark.queries import LATERAL_TOPK, q_lateral_topk

    cust = duckdb.sql(
        f"SELECT c_nationkey, c_custkey, c_acctbal"
        f" FROM '{SF}/customer.parquet'"
    ).fetchall()
    nations = dict(
        duckdb.sql(
            f"SELECT n_nationkey, n_name FROM '{SF}/nation.parquet'"
        ).fetchall()
    )
    by_n = defaultdict(list)
    for nk, ck, bal in cust:
        by_n[nk].append((-bal, ck))
    want = set()
    for nk, rows in by_n.items():
        for negbal, ck in sorted(rows)[:LATERAL_TOPK]:
            want.add((nk, nations[nk], ck, -negbal))
    got = {
        (r.n_nationkey, r.n_name, r.c_custkey, r.c_acctbal)
        for r in q_lateral_topk(spark, SF).collect()
    }
    assert got == want
    assert {nk for nk, _, _, _ in got} == set(by_n)


def test_audio_vad_windows_matches_python(spark):
    """VAD segments must equal a python recompute of the md5 energy
    gate + consecutive-frame merge, segments must be maximal (gaps on
    both sides), and multi-segment assets must exist."""
    import hashlib
    from collections import defaultdict

    import duckdb

    from freki_spark.functions.multimodal import (
        VAD_ENERGY_MAX,
        VAD_THRESHOLD,
        audio_vad_windows,
    )

    ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
            f" WHERE doc_id % 5 = 0"
        ).fetchall()
    ]

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    want = {}
    per_asset = defaultdict(int)
    for d in ids:
        ref = f"img://{d}/0"
        nf = 1 + d % 16
        speech = [
            f
            for f in range(nf)
            if h32(f"{ref}:e{f}") % VAD_ENERGY_MAX >= VAD_THRESHOLD
        ]
        seg = 0
        prev = None
        for f in speech:
            if prev is None or f > prev + 1:
                seg += 1
            want.setdefault((d, ref, seg), []).append(f)
            prev = f
        per_asset[d] = seg
    want = {
        k: (min(fs), max(fs), len(fs)) for k, fs in want.items()
    }
    got = {
        (r.doc_id, r.media_ref, r.seg_no): (
            r.f_start, r.f_end, r.n_frames_seg
        )
        for r in audio_vad_windows(spark, SF).collect()
    }
    assert got == want
    # maximality: each segment spans exactly its frames
    assert all(e - s + 1 == n for (s, e, n) in got.values())
    assert any(n >= 2 for n in per_asset.values())  # real merging


def test_vad_segments_asset_grain_no_cross_asset_merge(spark):
    """Islands windows partition on (doc_id, media_ref): a doc with
    TWO assets whose active frame ranges touch must produce separate
    per-asset segments (and per-asset seg_no numbering), never one
    merged island — the multi-asset contract behind the docstring,
    independent of synth_media_table's one-asset-per-doc shape."""
    from freki_spark.functions.multimodal import (
        VAD_THRESHOLD,
        _vad_segments,
    )

    hot = VAD_THRESHOLD  # >= threshold → speech
    rows = [
        # asset A: frames 0-2 active (one island)
        *[(1, "a://1/0", f, hot) for f in (0, 1, 2)],
        # asset B: frames 3-4 active — consecutive with A's last frame,
        # so a doc_id-only window would merge them into A's island
        *[(1, "a://1/1", f, hot) for f in (3, 4)],
        # asset B second island after a gap
        *[(1, "a://1/1", f, hot) for f in (7, 8)],
    ]
    frames = spark.createDataFrame(
        rows, "doc_id int, media_ref string, f int, energy int"
    )
    got = {
        (r.media_ref, r.seg_no): (r.f_start, r.f_end, r.n_frames_seg)
        for r in _vad_segments(frames).collect()
    }
    assert got == {
        ("a://1/0", 1): (0, 2, 3),
        ("a://1/1", 1): (3, 4, 2),
        ("a://1/1", 2): (7, 8, 2),
    }


def test_readability_fk_matches_python(spark):
    """FK centigrade scores must equal a python recompute of the
    vowel-group syllable proxy + windowed sentence stand-in + the
    single-quotient integer formula, and the clamp-at-zero floor must
    hold everywhere."""
    import re as _re

    import duckdb

    from freki_spark.functions.text_analysis import (
        FK_CLAMP,
        SENT_WINDOW,
        readability_fk,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    want = {}
    for d, text in docs:
        w = len(text.split(" "))
        syl = len(_re.findall(r"[aeiou]+", text))
        sent = 1 + (w - 1) // SENT_WINDOW
        wc, yc = min(w, FK_CLAMP), min(syl, FK_CLAMP)
        num = 39 * wc * wc + 1180 * yc * sent - 1559 * sent * wc
        grade = 0 if num < 0 else num // (sent * wc)
        want[d] = (w, sent, syl, grade)
    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.fk_grade_c)
        for r in readability_fk(spark, SF).collect()
    }
    assert got == want
    assert all(g >= 0 for (_, _, _, g) in got.values())
    # the corpus must exercise real spread, not a constant column
    assert len({g for (_, _, _, g) in got.values()}) >= 5


def test_pack_stats_consistent_with_layout(spark):
    """Per-lang packing stats must equal a direct recompute over the
    pack_sequences layout rows: token mass, closed-form sequence count
    and tail waste, and the straddler count."""
    from collections import defaultdict

    from freki_spark.functions.corpus_prep import (
        SEQ_LEN,
        pack_sequences,
        pack_stats,
    )

    rows = pack_sequences(spark, SF).collect()
    mass = defaultdict(int)
    docs = defaultdict(int)
    straddlers = defaultdict(int)
    for r in rows:
        mass[r.lang] += r.n_tokens
        docs[r.lang] += 1
        straddlers[r.lang] += int(r.straddles)
    got = {r.lang: r for r in pack_stats(spark, SF).collect()}
    assert set(got) == set(mass) and len(got) >= 2
    for lang, r in got.items():
        assert r.n_docs == docs[lang]
        assert r.total_tokens == mass[lang]
        assert r.n_straddlers == straddlers[lang]
        assert r.n_seqs == (mass[lang] + SEQ_LEN - 1) // SEQ_LEN
        assert r.tail_waste == (SEQ_LEN - mass[lang] % SEQ_LEN) % SEQ_LEN
        assert 0 <= r.straddle_ppm <= 1_000_000
    # packing straddles must actually occur on this corpus
    assert sum(straddlers.values()) > 0


def test_join_skew_diag_matches_python(spark):
    """The skew report must equal a python recompute: exact top-K by
    (count desc, user_id), exact ppm share, ceil salt factor — and the
    corpus must contain at least one key heavy enough to need salt."""
    from collections import Counter

    import duckdb

    from freki_spark.queries import (
        SKEW_TARGET_ROWS,
        SKEW_TOPK,
        join_skew_diag,
    )

    users = [
        r[0]
        for r in duckdb.sql(
            f"SELECT user_id FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    c = Counter(users)
    tot = len(users)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:SKEW_TOPK]

    def ppm(n, d):
        q, r = divmod(n, d)
        return q * 10**6 + (r * 1000 // d) * 1000 + ((r * 1000 % d) * 1000 // d)

    want = {
        u: (n, ppm(n, tot), -(-n // SKEW_TARGET_ROWS)) for u, n in ranked
    }
    got = {
        r.user_id: (r.cnt, r.share_ppm, r.salt_factor)
        for r in join_skew_diag(spark, SF).collect()
    }
    assert got == want
    assert any(sf > 1 for (_, _, sf) in got.values())


def test_dedup_eval_matches_pair_recount(spark):
    """The eval row must equal a direct recount over the minhash pair
    relation and the planted-mutant convention, and banding recall on
    the planted set must clear the known floor (the
    test_minhash_finds_mutated_near_dups threshold, as exact ppm)."""
    import duckdb

    from freki_spark.functions.dedup import (
        DEDUP_PLANT_MAX,
        DEDUP_PLANT_OFFSET,
        dedup_eval,
        dedup_minhash_lsh,
    )

    found = {
        (r.a, r.b) for r in dedup_minhash_lsh(spark, SF).collect()
    }
    n_docs_planted = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
        f" WHERE doc_id < {DEDUP_PLANT_MAX}"
    ).fetchone()[0]
    planted = {
        (a, a + DEDUP_PLANT_OFFSET)
        for a in range(DEDUP_PLANT_MAX)
    }

    def ppm(n, d):
        d = max(d, 1)
        q, r = divmod(n, d)
        return q * 10**6 + (r * 1000 // d) * 1000 + ((r * 1000 % d) * 1000 // d)

    hit = len(found & planted)
    r = dedup_eval(spark, SF).collect()[0]
    assert r.n_planted == n_docs_planted == DEDUP_PLANT_MAX
    assert r.n_found == len(found)
    assert r.n_hit == hit
    assert r.recall_ppm == ppm(hit, r.n_planted)
    assert r.precision_ppm == ppm(hit, r.n_found)
    assert r.recall_ppm >= 800_000  # 40/50 — the minhash-test floor


def test_langid_confusion_matches_classifier_twin(spark):
    """Confusion cells must equal a recount over the lang_id_ngram
    relation joined to the labeled lang column, shares must sum to
    ~1e6 per true language, and off-diagonal bleed must exist (the
    marker heuristic is deliberately imperfect)."""
    from collections import Counter

    import duckdb

    from freki_spark.functions.text_analysis import (
        lang_id_ngram,
        langid_confusion,
    )

    true_lang = dict(
        duckdb.sql(
            f"SELECT doc_id, lang FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    pred = {
        r.doc_id: r.pred_lang for r in lang_id_ngram(spark, SF).collect()
    }
    cells = Counter((true_lang[d], p) for d, p in pred.items())
    rows = langid_confusion(spark, SF).collect()
    got = {(r.lang, r.pred_lang): (r.n, r.share_ppm) for r in rows}
    assert {k: v[0] for k, v in got.items()} == dict(cells)
    by_lang = Counter()
    for (lang, _), (n, _) in got.items():
        by_lang[lang] += n
    for (lang, _), (n, share) in got.items():
        d = by_lang[lang]
        q, r = divmod(n, d)
        assert share == q * 10**6 + (r * 1000 // d) * 1000 + (
            (r * 1000 % d) * 1000 // d
        )
    # per-lang shares sum to 1e6 up to the floor truncation per cell
    for lang in by_lang:
        s = sum(sh for (lg, _), (_, sh) in got.items() if lg == lang)
        assert 1_000_000 - len(got) * 3 <= s <= 1_000_000
    assert any(lang != p for (lang, p) in got)  # real off-diagonal mass


def test_python_udtf_matches_split(spark):
    """The UDTF expansion must equal python's split with positions
    over exactly the capped doc slice — schema contract, lateral
    correlation, and row ownership in one check."""
    import duckdb

    from freki_spark.queries import UDTF_DOC_CAP, q_python_udtf

    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
            f" WHERE doc_id < {UDTF_DOC_CAP}"
        ).fetchall()
    )
    want = {
        (d, i, t)
        for d, text in docs.items()
        for i, t in enumerate(text.split(" "))
    }
    got = {
        (r.doc_id, r.pos, r.token)
        for r in q_python_udtf(spark, SF).collect()
    }
    assert got == want
    assert {d for d, _, _ in got} == set(docs)


def test_collation_merges_case_variants(spark):
    """Collated grouping must equal a python recount of the md5 case
    mangle under lower()-equivalence, and the collation must have
    merged real multi-form classes (n_forms >= 2 somewhere) — i.e.
    distinct binary strings landed in one collated group."""
    import hashlib
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.queries import COLLATION_TOPK, q_collation

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    cnt = Counter()
    forms = defaultdict(set)
    for d, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        for i, t in enumerate(text.split(" ")):
            m = h32(f"{d}:{i}") % 3
            tok = t.upper() if m == 0 else (t.capitalize() if m == 1 else t)
            cnt[tok.lower()] += 1
            forms[tok.lower()].add(tok)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[
        :COLLATION_TOPK
    ]
    want = {t: (n, len(forms[t])) for t, n in ranked}
    got = {
        r.token_lc: (r.n, r.n_forms)
        for r in q_collation(spark, SF).collect()
    }
    assert got == want
    assert any(nf >= 2 for (_, nf) in got.values())


def test_dq_checks_fires_planted_rules_only(spark):
    """The DQ report must show exactly the planted violations
    (nchars_mismatch + invalid_lang on the +DQ_OFFSET variants) and
    hard zeros on every other rule — both firing and non-firing rules
    verified against a python recount."""
    import duckdb

    from freki_spark.functions.corpus_prep import (
        DQ_CORRUPT_MOD,
        dq_checks,
    )

    n_docs, n_corrupt = duckdb.sql(
        f"SELECT count(*), sum(CASE WHEN doc_id % {DQ_CORRUPT_MOD} = 0"
        f" THEN 1 ELSE 0 END) FROM '{SF}/documents.parquet'"
    ).fetchone()
    n_rows = n_docs + n_corrupt
    got = {r.rule: (r.n_rows, r.n_viol) for r in dq_checks(spark, SF).collect()}
    assert got == {
        "null_text": (n_rows, 0),
        "empty_text": (n_rows, 0),
        "nchars_mismatch": (n_rows, n_corrupt),
        "invalid_lang": (n_rows, n_corrupt),
        "negative_doc_id": (n_rows, 0),
    }
    assert n_corrupt > 0  # the planted rules actually fired


def test_ref_integrity_clean_edges_and_planted_orphans(spark):
    """All four real FK edges must audit clean (the fixture generator's
    contract), and the planted edge must report exactly the
    event_id-mod orphans."""
    import duckdb

    from freki_spark.queries import REF_ORPHAN_MOD, ref_integrity

    n_events, n_planted = duckdb.sql(
        f"SELECT count(*), sum(CASE WHEN event_id % {REF_ORPHAN_MOD} = 0"
        f" THEN 1 ELSE 0 END) FROM '{SF}/events.parquet'"
    ).fetchone()
    got = {
        r.relation: (r.n_child, r.n_orphans)
        for r in ref_integrity(spark, SF).collect()
    }
    assert len(got) == 5
    for rel in (
        "lineitem->orders",
        "orders->customer",
        "customer->nation",
        "supplier->nation",
    ):
        assert got[rel][1] == 0, rel
    assert got["events->users (planted)"] == (n_events, n_planted)
    assert n_planted > 0


def test_ewma_dyadic_matches_python(spark):
    """Dyadic-EWMA must equal a python recompute over (ts, event_id)-
    ordered per-user histories, with renormalized weights on short
    prefixes (first event smooths to itself)."""
    from collections import defaultdict

    import duckdb

    from freki_spark.queries import ewma_dyadic

    rows = duckdb.sql(
        f"SELECT user_id, ts, event_id, CAST(round(value*100) AS BIGINT)"
        f" FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    hist = defaultdict(list)
    want = {}
    for u, ts, eid, v in rows:
        h = hist[u]
        lags = h[::-1][:3]
        num = 8 * v + sum(w * x for w, x in zip((4, 2, 1), lags))
        den = 8 + sum(w for w, _ in zip((4, 2, 1), lags))
        want[eid] = (u, v, num // den)
        h.append(v)
    got = {
        r.event_id: (r.user_id, r.v_cents, r.ewma_cents)
        for r in ewma_dyadic(spark, SF).collect()
    }
    assert got == want
    # first event per user smooths to itself
    firsts = {}
    for u, ts, eid, v in rows:
        firsts.setdefault(u, (eid, v))
    assert all(got[eid][2] == v for (eid, v) in firsts.values())


def test_value_histogram_matches_python(spark):
    """Equi-width bins must equal a python recount: boundaries,
    counts summing to the table, exact-ppm shares."""
    from collections import Counter

    import duckdb

    from freki_spark.queries import HIST_BIN_CENTS, value_histogram

    vals = [
        r[0]
        for r in duckdb.sql(
            f"SELECT CAST(round(value*100) AS BIGINT)"
            f" FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    c = Counter(v // HIST_BIN_CENTS for v in vals)
    tot = len(vals)

    def ppm(n, d):
        q, r = divmod(n, d)
        return q * 10**6 + (r * 1000 // d) * 1000 + ((r * 1000 % d) * 1000 // d)

    got = {
        r.bin: (r.lo_cents, r.hi_cents, r.n, r.share_ppm)
        for r in value_histogram(spark, SF).collect()
    }
    assert got == {
        b: (
            b * HIST_BIN_CENTS,
            (b + 1) * HIST_BIN_CENTS - 1,
            n,
            ppm(n, tot),
        )
        for b, n in c.items()
    }
    assert sum(n for (_, _, n, _) in got.values()) == tot
    assert len(got) >= 3  # real spread across bins


def test_trend_ols_matches_python(spark):
    """The normal-equation rational and the signed micro-slope must
    equal a python recompute over per-day counts, and both slope signs
    must occur on the fixture (rising and falling event types)."""
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.queries import TREND_NUM_CLAMP, trend_ols

    rows = duckdb.sql(
        f"SELECT event_type,"
        f" date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    daily = Counter(rows)
    by_type = defaultdict(list)
    for (et, d), y in daily.items():
        by_type[et].append((d, y))
    want = {}
    for et, pts in by_type.items():
        d0 = min(d for d, _ in pts)
        xs = [(d - d0, y) for d, y in pts]
        n = len(xs)
        sx = sum(x for x, _ in xs)
        sy = sum(y for _, y in xs)
        sxy = sum(x * y for x, y in xs)
        sxx = sum(x * x for x, _ in xs)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        if den == 0:
            micro = 0
        else:
            sgn = -1 if num < 0 else 1
            micro = sgn * (min(abs(num), TREND_NUM_CLAMP) * 10**6 // den)
        want[et] = (n, num, den, micro)
    got = {
        r.event_type: (r.n, r.num, r.den, r.slope_micro)
        for r in trend_ols(spark, SF).collect()
    }
    assert got == want
    signs = {m > 0 for (_, _, _, m) in got.values() if m != 0}
    assert signs == {True, False}  # both rising and falling types


def test_stream_dq_equals_batch(spark):
    """The streaming DQ gate must equal the batch dq_checks relation
    exactly — same landing batch, same rule sums, same report (all
    three single-sourced), evaluated through the streaming global
    aggregate instead of a batch .agg()."""
    from freki_spark.functions.corpus_prep import dq_checks
    from freki_spark.streaming.jobs import q_stream_dq

    batch = {
        r.rule: (r.n_rows, r.n_viol, r.viol_ppm)
        for r in dq_checks(spark, SF).collect()
    }
    stream = {
        r.rule: (r.n_rows, r.n_viol, r.viol_ppm)
        for r in q_stream_dq(spark, SF).collect()
    }
    assert stream == batch
    assert stream["nchars_mismatch"][1] > 0  # planted rules fired


def test_observe_metrics_equal_ground_truth(spark):
    """In-flight observed metrics must equal a direct relational
    recompute over the same table — the no-second-pass metrics
    channel reports the truth."""
    import duckdb

    from freki_spark.queries import q_observe_metrics

    want = duckdb.sql(
        f"SELECT CAST(count(*) AS BIGINT), CAST(sum(n_chars) AS BIGINT),"
        f" CAST(max(n_chars) AS BIGINT),"
        f" CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
        f" FROM '{SF}/documents.parquet'"
    ).fetchone()
    r = q_observe_metrics(spark, SF).collect()[0]
    assert (r.n_docs, r.chars_total, r.chars_max, r.null_texts) == want
    assert r.n_docs == 500 and r.null_texts == 0


def test_dedup_exact_finds_planted_exact_copies(spark):
    """dedup_exact must return a NON-EMPTY relation on the fixture sf
    (the round-3 verdict found its driver pass vacuous at 0 rows: the
    _mutated variants are truncated, never identical).  Every planted
    +1100000 exact copy must land in a dup group whose keeper is the
    original doc and whose size is exactly 2 for docs that are unique
    among the originals."""
    from freki_spark.functions.dedup import dedup_exact

    rows = dedup_exact(spark, SF).collect()
    assert rows, "dedup_exact returned no dup groups — vacuous again"
    by_keeper = {r.keeper: r for r in rows}
    # the 30 planted copies: originals 0..29 are each a keeper
    planted = [r for k, r in by_keeper.items() if k < 30]
    assert len(planted) == 30
    assert all(r.n_copies >= 2 for r in rows)


def test_resume_antijoin_is_nonempty_and_correct(spark):
    """resume_antijoin must return a NON-EMPTY survivor set (round-3
    verdict: anti-joining against ALL orders is empty at every sf,
    making the driver hash check prove only 'both engines agree on
    empty').  Survivors = customers with no order in the done split
    (o_custkey % 3 = 0) — recomputed here independently via DuckDB."""
    import duckdb

    from freki_spark.queries import q_resume_antijoin

    got = sorted(r.c_custkey for r in q_resume_antijoin(spark, SF).collect())
    want = [
        r[0]
        for r in duckdb.sql(
            f"SELECT c_custkey FROM '{SF}/customer.parquet' c "
            f"WHERE NOT EXISTS (SELECT 1 FROM '{SF}/orders.parquet' o "
            f"  WHERE o.o_custkey = c.c_custkey AND o.o_custkey % 3 = 0) "
            f"ORDER BY c_custkey"
        ).fetchall()
    ]
    assert got == want
    assert len(got) > 0, "survivor set empty — the check is vacuous"


def test_signed_division_forms_match_duckdb_on_negatives(spark):
    """The pass-21 signed-division rule, mechanism-tested on NEGATIVE
    inputs (fixture events are all >= 0, so this is the only place the
    negative branch runs).  Measured round-4 fact: DuckDB 1.0.0's
    integer // TRUNCATES toward zero exactly like Spark's div — so
    parity needs both engines to carry the SAME explicit form, not to
    rely on either native convention.  Pins (a) value_histogram's
    remainder-corrected bin == DuckDB's mirror == python floor-div,
    and (b) ewma's sign-carrying quotient == DuckDB's mirror."""
    import duckdb

    from pyspark.sql import functions as F

    from freki_spark.queries import HIST_BIN_CENTS

    vals = [-10001, -5000, -4999, -1, 0, 1, 4999, 5000, 10001]
    df = spark.createDataFrame([(v,) for v in vals], "v_cents bigint")
    got = {
        r.v_cents: (r.bin, r.q)
        for r in df.select(
            "v_cents",
            F.expr(
                f"(v_cents div {HIST_BIN_CENTS})"
                f" - (CASE WHEN v_cents % {HIST_BIN_CENTS} < 0"
                f"     THEN 1 ELSE 0 END)"
            ).alias("bin"),
            F.expr(
                "CASE WHEN v_cents < 0 THEN -((-v_cents) div 7)"
                "     ELSE v_cents div 7 END"
            ).alias("q"),
        ).collect()
    }
    for v in vals:
        want_bin = duckdb.sql(
            f"SELECT (({v}) // {HIST_BIN_CENTS})"
            f" - (CASE WHEN ({v}) % {HIST_BIN_CENTS} < 0 THEN 1 ELSE 0 END)"
        ).fetchone()[0]
        want_q = duckdb.sql(
            f"SELECT CASE WHEN {v} < 0 THEN -((-({v})) // 7)"
            f"            ELSE {v} // 7 END"
        ).fetchone()[0]
        assert got[v] == (want_bin, want_q), (v, got[v], (want_bin, want_q))
        assert got[v][0] == v // HIST_BIN_CENTS  # python floor-div oracle


def test_distinct_approx_estimate_within_rsd_envelope(spark):
    """Value pin for the rows-only q_distinct_approx driver entry
    (round-3 verdict item 5): approx_count_distinct's default relative
    standard deviation is 0.05, so the HLL++ estimate must sit within
    a 4·rsd envelope of the exact count (deterministic for a fixed
    input — this is a hard bound for this fixture, not a flaky
    statistical assertion)."""
    from freki_spark.queries import q_distinct_approx

    r = q_distinct_approx(spark, SF).collect()[0]
    assert r.exact_users > 0
    rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
    assert rel_err <= 4 * 0.05, (r.approx_users, r.exact_users, rel_err)


def test_textrank_matches_python_power_iteration(spark):
    """textrank_keywords must equal an independent python recompute of
    the integer fixed-point damped power iteration (same SCALE/BASE/
    iteration count), bit-for-bit — the pagerank determinism contract
    applied to the word co-occurrence graph."""
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.functions.graph import (
        TR_BASE,
        TR_ITERS,
        TR_SCALE,
        TR_TOPK,
        textrank_keywords,
    )

    rows = textrank_keywords(spark, SF).collect()
    docs = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    sym = set()
    for t in docs:
        tk = t.split(" ")
        for a, b in zip(tk, tk[1:]):
            if a != b:
                sym.add((a, b))
                sym.add((b, a))
    deg = Counter(src for src, _ in sym)
    rank = {u: TR_SCALE for u in deg}
    for _ in range(TR_ITERS):
        s = defaultdict(int)
        for u, v in sym:
            s[v] += rank[u] // deg[u]
        rank = {u: TR_BASE + 85 * s[u] // 100 for u in deg}
    want = sorted(rank.items(), key=lambda kv: (-kv[1], kv[0]))[:TR_TOPK]
    got = [
        (r.term, r.rank, r.deg) for r in sorted(rows, key=lambda r: r.rk)
    ]
    assert got == [(t, rv, deg[t]) for t, rv in want]
    assert len(rows) == TR_TOPK


def test_sparse_cosine_finds_mutated_pairs(spark):
    """Every ranked pair obeys a < b and the Cauchy-Schwarz ppm bound;
    the planted truncated mutants must surface as high-cosine
    neighbors of their originals (champion pruning costs some recall
    — the documented contract — but never precision)."""
    from freki_spark.functions.search import sparse_cosine_topk

    rows = sparse_cosine_topk(spark, SF).collect()
    assert rows and all(r.a < r.b for r in rows)
    assert all(0 <= r.cos_ppm <= 1_000_000 for r in rows)
    hits = {
        (r.a, r.b): r for r in rows if r.b == r.a + 100000
    }
    # measured on the fixture: 43/50 mutants surface (the rest are
    # short docs whose 3-token truncation removes most idf mass),
    # every one as its original's TOP neighbor
    assert len(hits) >= 40
    assert all(r.rk == 1 for r in hits.values())
    assert all(r.cos_ppm >= 850_000 for r in hits.values())


def test_ndcg_matches_python_recompute(spark):
    """ndcg_eval must equal a python recompute of DCG/IDCG from the
    SAME candidate relation (exact integer discounts), and the
    discount literals must equal floor(1e6 / log2(r+1))."""
    import math
    from collections import defaultdict

    from freki_spark.functions.search import (
        BM25_TOPK,
        NDCG_DISC,
        _bm25_scores,
        ndcg_eval,
    )

    for r, d in enumerate(NDCG_DISC, 1):
        assert d == math.floor(1_000_000 / math.log2(r + 1))

    by_q = defaultdict(list)
    for r in _bm25_scores(spark, SF).collect():
        by_q[r.query_id].append(r)
    want = {}
    for q, rs in by_q.items():
        ranked = sorted(rs, key=lambda r: (-r.score_micro, r.doc_id))
        dcg = sum(
            r.n_terms * NDCG_DISC[i] for i, r in enumerate(ranked[:BM25_TOPK])
        )
        ideal = sorted(
            rs, key=lambda r: (-r.n_terms, -r.score_micro, r.doc_id)
        )
        idcg = sum(
            r.n_terms * NDCG_DISC[i] for i, r in enumerate(ideal[:BM25_TOPK])
        )
        want[q] = (dcg, idcg, dcg * 1_000_000 // idcg)
    got = {
        r.query_id: (r.dcg_micro, r.idcg_micro, r.ndcg_ppm)
        for r in ndcg_eval(spark, SF).collect()
    }
    assert got == want
    assert all(v[2] <= 1_000_000 for v in got.values())  # dcg <= idcg


def test_rouge_matches_python_recompute(spark):
    """rouge_ngram_stats must equal an independent python clipped-
    overlap recompute on every (original, mutant) pair, including the
    empty-candidate degenerate (<=3-token docs truncate to '')."""
    from collections import Counter

    import duckdb

    from freki_spark.functions.text_analysis import rouge_ngram_stats

    rows = rouge_ngram_stats(spark, SF).collect()
    assert len(rows) == 100  # 50 pairs x n in (1, 2)
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
            f" WHERE doc_id < 50"
        ).fetchall()
    )
    for r in rows:
        ref = docs[r.doc_id].split(" ")
        # mirror the concat_ws+split round trip exactly ([] -> [''])
        cand = " ".join(ref[: max(len(ref) - 3, 0)]).split(" ")
        n = r.n
        cg = [" ".join(cand[i : i + n]) for i in range(len(cand) - n + 1)]
        rg = [" ".join(ref[i : i + n]) for i in range(len(ref) - n + 1)]
        cc, rc = Counter(cg), Counter(rg)
        clip = sum(min(c, rc.get(g, 0)) for g, c in cc.items())
        assert (r.clip_matches, r.ref_total, r.cand_total) == (
            clip,
            len(rg),
            len(cg),
        ), r
        p = clip * 1_000_000 // max(len(cg), 1)
        rr = clip * 1_000_000 // max(len(rg), 1)
        f1 = 0 if p + rr == 0 else (2 * p * rr) // (p + rr)
        assert (r.prec_ppm, r.recall_ppm, r.f1_ppm) == (p, rr, f1), r
    assert any(r.f1_ppm > 900_000 for r in rows)  # near-identical pairs


def test_redirect_resolve_matches_python_walk(spark):
    """Pointer doubling (3 rounds) must equal a python single-step
    walk capped at 8 hops on every doc — including the planted
    %101∈{55,56} 2-cycles and the chains that feed INTO them (57..59
    neighborhoods), which must come back resolved=0 / -1 / -1."""
    from freki_spark.functions.graph import RD_ROUNDS, redirect_resolve

    rows = {r.doc_id: r for r in redirect_resolve(spark, SF).collect()}
    n = max(rows) + 1
    cap = 2 ** RD_ROUNDS

    def ptr(d):
        if d % 101 == 55 and d + 1 <= n - 1:
            return d + 1
        if d % 101 == 56:
            return d - 1
        if d % 4 != 0:
            return d - 1
        return None

    unresolved = 0
    for d in range(n):
        cur, hops = d, 0
        while ptr(cur) is not None and hops < cap:
            cur = ptr(cur)
            hops += 1
        done = ptr(cur) is None
        want = (cur, hops, 1) if done else (-1, -1, 0)
        got = (rows[d].final_id, rows[d].hops, rows[d].resolved)
        assert got == want, (d, got, want)
        unresolved += 0 if done else 1
    assert unresolved >= 6  # the 55/56 cycle + its feeder chains exist
    assert any(r.resolved == 1 and r.hops == 3 for r in rows.values())


def test_redirect_doubling_resolves_exactly_pow2_hops(spark):
    """The 2^RD_ROUNDS boundary the round-4 ADVICE flagged: done-aware
    doubling alone certifies only 2^k − 1 hops, so the final
    terminal-check join must close the gap — a chain of EXACTLY
    2^RD_ROUNDS hops resolves with exact hops, 2^RD_ROUNDS + 1 does
    not, and a planted 2-cycle never does."""
    from freki_spark.functions.graph import RD_ROUNDS, _resolve_ptrs

    cap = 2 ** RD_ROUNDS
    # node i points to i-1 for 1..cap+1 (chain of cap+1 hops into the
    # terminal 0); nodes 100/101 form a 2-cycle; 102 feeds the cycle
    ptrs = (
        [(0, None)]
        + [(i, i - 1) for i in range(1, cap + 2)]
        + [(100, 101), (101, 100), (102, 100)]
    )
    p = spark.createDataFrame(ptrs, "doc_id: bigint, ptr: bigint")
    got = {r.doc_id: r for r in _resolve_ptrs(p).collect()}
    for i in range(cap + 1):  # 0..cap hops all resolve, exact hops
        assert (got[i].final_id, got[i].hops, got[i].resolved) == (0, i, 1), i
    for d in (cap + 1, 100, 101, 102):  # beyond-cap + cycles don't
        assert (got[d].final_id, got[d].hops, got[d].resolved) == (-1, -1, 0), d


def test_cocitation_matches_python_recompute(spark):
    """Co-citation jaccard recomputed in pure python from the same
    md5 edge rule — exact integer equality, and the pair set must be
    bounded by the out-degree cap (C(3,2) pairs per source page)."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.graph import PR_FANOUT, cocitation_sim

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(docs)
    targets = {
        d: [
            t
            for t in dict.fromkeys(
                h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
            )
            if t != d
        ]
        for d in docs
    }
    indeg = defaultdict(int)
    shared = defaultdict(int)
    for d, ts in targets.items():
        for t in ts:
            indeg[t] += 1
        ts_sorted = sorted(ts)
        for i in range(len(ts_sorted)):
            for j in range(i + 1, len(ts_sorted)):
                shared[(ts_sorted[i], ts_sorted[j])] += 1
    want = {
        (a, b): (
            s,
            indeg[a],
            indeg[b],
            s * 1_000_000 // (indeg[a] + indeg[b] - s),
        )
        for (a, b), s in shared.items()
    }
    got = {
        (r.a, r.b): (r.shared, r.din_a, r.din_b, r.jaccard_ppm)
        for r in cocitation_sim(spark, SF).collect()
    }
    assert got == want
    assert len(got) <= 3 * n  # C(fanout, 2) pairs per source page


def test_harmonic_matches_python_bfs(spark):
    """Landmark harmonic centrality recomputed with a python BFS over
    the same symmetric md5 graph — exact integer equality (discount
    literals 1e6/d for d = 1..3)."""
    import hashlib
    from collections import defaultdict, deque

    from freki_spark.functions.graph import (
        BFS_N_SEEDS,
        BFS_ROUNDS,
        PR_FANOUT,
        harmonic_centrality,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(docs)
    nbrs = defaultdict(set)
    for d in docs:
        for t in dict.fromkeys(
            h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
        ):
            if t != d:
                nbrs[d].add(t)
                nbrs[t].add(d)
    disc = {1: 1_000_000, 2: 500_000, 3: 333_333}
    want = defaultdict(lambda: [0, 0])
    for seed in range(BFS_N_SEEDS):
        dist = {seed: 0}
        q = deque([seed])
        while q:
            u = q.popleft()
            if dist[u] == BFS_ROUNDS:
                continue
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        for v, dd in dist.items():
            if dd >= 1:
                want[v][0] += 1
                want[v][1] += disc[dd]
    got = {
        r.doc_id: (r.n_seeds_reached, r.harmonic_micro)
        for r in harmonic_centrality(spark, SF).collect()
    }
    assert got == {d: tuple(want.get(d, (0, 0))) for d in docs}
    assert any(v != (0, 0) for v in got.values())


def test_sitemap_round_trip_is_lossless(spark):
    """The render→xpath round trip must preserve every page exactly:
    one output row per document, chunk sizes <= SITEMAP_CAP, pos
    dense per chunk, and the url/lastmod of a sampled source equal to
    a direct python recompute (no XML involved)."""
    import datetime
    from collections import defaultdict

    import duckdb

    from freki_spark.functions.corpus_prep import SITEMAP_CAP, sitemap_parse

    rows = sitemap_parse(spark, SF).collect()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert len(rows) == n_docs
    per_chunk = defaultdict(list)
    for r in rows:
        per_chunk[(r.source, r.chunk)].append(r.pos)
    for (src, ch), ps in per_chunk.items():
        assert len(ps) <= SITEMAP_CAP
        assert sorted(ps) == list(range(len(ps)))  # dense positions
    src0 = dict(
        duckdb.sql(
            f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
            f" WHERE source = 'src0' ORDER BY doc_id"
        ).fetchall()
    )
    got0 = sorted(
        (r.url, r.lastmod) for r in rows if r.source == "src0"
    )
    want0 = sorted(
        (
            "http://"
            + ("www." if d % 2 == 0 else "cdn.")
            + f"src0-site.{['com', 'org', 'net'][d % 3]}/page/{d}",
            (
                datetime.date(2025, 1, 1) + datetime.timedelta(days=d % 365)
            ).isoformat(),
        )
        for d in src0
    )
    assert got0 == want0


def _py_shingles(tk, n=3):
    """Python mirror of common.shingles: distinct n-token windows,
    short docs degrade to one (possibly short) shingle."""
    out = []
    for i in range(max(len(tk) - (n - 1), 1)):
        out.append(" ".join(tk[i : i + n]))
    return list(dict.fromkeys(out))


def test_containment_matches_python_and_flags_subsets(spark):
    """dedup_containment recomputed in python over the same rare-band
    candidate edges — exact integers; the planted truncated mutants
    are shingle-set SUBSETS of their originals, so their mutant-side
    containment must dominate their jaccard-style symmetric overlap."""
    from collections import defaultdict

    import duckdb

    from freki_spark.functions.dedup import (
        JACCARD_DF_MAX,
        JACCARD_DF_MIN,
        dedup_containment,
    )

    rows = {(r.a, r.b): r for r in dedup_containment(spark, SF).collect()}
    assert rows
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    corpus = dict(docs)
    for d, t in docs.items():
        if d < 50:
            tk = t.split(" ")
            corpus[d + 100000] = " ".join(tk[: max(len(tk) - 3, 0)])
    sh = {d: set(_py_shingles(t.split(" "))) for d, t in corpus.items()}
    df = defaultdict(int)
    for d, ss in sh.items():
        for g in ss:
            df[g] += 1
    rare = {g for g, c in df.items() if JACCARD_DF_MIN <= c <= JACCARD_DF_MAX}
    want = {}
    ids = sorted(sh)
    by_sh = defaultdict(list)
    for d in ids:
        for g in sh[d]:
            if g in rare:
                by_sh[g].append(d)
    commons = defaultdict(set)
    for g, ds_ in by_sh.items():
        for i in range(len(ds_)):
            for j in range(i + 1, len(ds_)):
                commons[(ds_[i], ds_[j])].add(g)
    for (a, b), gs in commons.items():
        if len(gs) >= 3:
            na, nb = len(sh[a]), len(sh[b])
            want[(a, b)] = (
                len(gs),
                na,
                nb,
                len(gs) * 1_000_000 // na,
                len(gs) * 1_000_000 // nb,
            )
    got = {
        k: (r.common, r.n_sh_a, r.n_sh_b, r.contain_a_ppm, r.contain_b_ppm)
        for k, r in rows.items()
    }
    assert got == want
    # subset structure: for mutant pairs the mutant-side containment
    # is >= the original-side one (|B| <= |A|)
    mut = [r for (a, b), r in rows.items() if b == a + 100000]
    assert len(mut) >= 20
    assert all(r.contain_b_ppm >= r.contain_a_ppm for r in mut)


def test_zipf_fit_slope_is_sane_and_near_python_fit(spark):
    """zipf_fit must produce a single negative-slope row over exactly
    TOPV terms, and agree with an independent python float OLS on the
    same top terms to within 0.001 (the op floors ln to integers, so
    exact float equality is not the contract — cross-engine exactness
    is the DuckDB oracle's job)."""
    import math
    from collections import Counter

    import duckdb

    from freki_spark.functions.corpus_prep import ZIPF_TOPV, zipf_fit

    r = zipf_fit(spark, SF).collect()[0]
    cf = Counter()
    for (t,) in duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall():
        cf.update(t.split(" "))
    # the word-soup fixture has a SMALL vocabulary (31 terms at
    # sf0.001) — n_terms is min(V, vocab) and the near-uniform
    # frequencies give a shallow (but still negative) slope
    assert r.n_terms == min(ZIPF_TOPV, len(cf)) and r.den > 0
    assert -4_000_000 < r.slope_micro < 0
    top = sorted(cf.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOPV]
    xs = [math.log(i + 1) for i in range(len(top))]
    ys = [math.log(c) for _, c in top]
    n = len(top)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    assert abs(r.slope_micro / 1e6 - num / den) < 1e-3


def test_fano_matches_python_recompute(spark):
    """burstiness_fano recomputed with python integers from
    duckdb-derived (type, hour) counts — exact equality, and every
    fano is non-negative (Cauchy-Schwarz)."""
    import duckdb

    from freki_spark.queries import FANO_CAP, burstiness_fano

    got = {
        r.event_type: (r.n_buckets, r.sum_c, r.sum_c2, r.fano_ppm)
        for r in burstiness_fano(spark, SF).collect()
    }
    counts = duckdb.sql(
        f"SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hb,"
        f" count(*) AS c FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for t, _, c in counts:
        per[t].append(min(c, FANO_CAP))
    want = {}
    for t, cs in per.items():
        n, sc, sc2 = len(cs), sum(cs), sum(c * c for c in cs)
        want[t] = (n, sc, sc2, (n * sc2 - sc * sc) * 1_000_000 // (n * sc))
    assert got == want
    assert all(v[3] >= 0 for v in got.values())


def test_h_index_matches_python_recompute(spark):
    """h_index_domains recomputed in python from the same md5 edge
    rule and source map — exact, with the h-index property checked
    directly (h pages with indeg >= h, no h+1 such pages)."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.graph import PR_FANOUT, h_index_domains

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    src = {
        r.doc_id: r.source
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "source")
        .collect()
    }
    n = len(src)
    indeg = defaultdict(int)
    for d in src:
        for t in dict.fromkeys(
            h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
        ):
            if t != d:
                indeg[t] += 1
    per = defaultdict(list)
    for d, s_ in src.items():
        per[s_].append(indeg.get(d, 0))
    want = {}
    for s_, degs in per.items():
        degs.sort(reverse=True)
        h = 0
        for i, dg in enumerate(degs, 1):
            if dg >= i:
                h = i
        want[s_] = (len(degs), h)
    got = {
        r.source: (r.n_pages, r.h_index)
        for r in h_index_domains(spark, SF).collect()
    }
    assert got == want
    assert any(h > 0 for _, h in got.values())


def test_ppr_matches_python_recompute_and_trust_shape(spark):
    """Personalized PageRank recomputed in pure python from the same
    md5 edge rule — bit-for-bit; non-seed mass must be strictly below
    seed mass (trust decays along paths) and unreached nodes score 0."""
    import hashlib
    from collections import defaultdict

    from freki_spark.functions.graph import (
        PPR_N_SEEDS,
        PR_BASE,
        PR_D_DEN,
        PR_D_NUM,
        PR_FANOUT,
        PR_ITERS,
        PR_SCALE,
        ppr_seeds,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(docs)
    targets = {
        d: [
            t
            for t in dict.fromkeys(
                h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
            )
            if t != d
        ]
        for d in docs
    }
    rank = {d: (PR_SCALE if d < PPR_N_SEEDS else 0) for d in docs}
    for _ in range(PR_ITERS):
        insum = defaultdict(int)
        for d, ts in targets.items():
            if ts and rank[d]:
                c = rank[d] // len(ts)
                for t in ts:
                    insum[t] += c
        rank = {
            d: (PR_BASE if d < PPR_N_SEEDS else 0)
            + PR_D_NUM * insum[d] // PR_D_DEN
            for d in docs
        }
    got = {r.doc_id: (r.rank, r.is_seed) for r in ppr_seeds(spark, SF).collect()}
    assert got == {d: (rank[d], int(d < PPR_N_SEEDS)) for d in docs}
    seeds_min = min(v for d, (v, s) in got.items() if s)
    assert all(v < seeds_min for d, (v, s) in got.items() if not s)
    assert any(v == 0 for d, (v, s) in got.items() if not s)  # unreached


def test_assortativity_matches_python_recompute(spark):
    """Exact integer moments recomputed in python; r_micro within 1
    ulp-of-floor of the same float expression (the float quotient is
    cross-engine-pinned by the DuckDB oracle, not this test)."""
    import hashlib
    import math
    from collections import defaultdict

    from freki_spark.functions.graph import (
        DEG_CLAMP,
        PR_FANOUT,
        degree_assortativity,
    )

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    docs = [
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]
    n = len(docs)
    edges = []
    for d in docs:
        ts = [
            t
            for t in dict.fromkeys(
                h32(f"{d}:{k}") % n for k in range(1, PR_FANOUT + 1)
            )
            if t != d
        ]
        for t in ts:
            edges.append((d, t, len(ts)))
    indeg = defaultdict(int)
    for _, t, _ in edges:
        indeg[t] += 1
    xs = [min(od, DEG_CLAMP) for _, _, od in edges]
    ys = [min(indeg[t], DEG_CLAMP) for _, t, _ in edges]
    ne = len(edges)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
    r = degree_assortativity(spark, SF).collect()[0]
    assert (r.n_edges, r.sx, r.sy, r.sxy, r.sxx, r.syy) == (
        ne, sx, sy, sxy, sxx, syy,
    )
    want = math.floor(
        ((float(ne) * float(sxy) - float(sx) * float(sy)) * 1_000_000.0)
        / (
            math.sqrt(max(float(ne) * float(sxx) - float(sx) ** 2, 1.0))
            * math.sqrt(max(float(ne) * float(syy) - float(sy) ** 2, 1.0))
        )
    )
    assert abs(r.r_micro - want) <= 1
    assert -1_000_000 <= r.r_micro <= 1_000_000


def test_range_frame_matches_python_recompute(spark):
    """The trailing-hour RANGE frame recomputed naively in python —
    including the peer rule (duplicate timestamps enter the frame
    together regardless of row order)."""
    import duckdb
    from collections import defaultdict

    from freki_spark.queries import q_window_range_frame

    raw = duckdb.sql(
        f"SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT),"
        f" CAST(round(value * 100) AS BIGINT)"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()
    per = defaultdict(list)
    for eid, uid, ts, vc in raw:
        per[uid].append((eid, ts, vc))
    want = {}
    for uid, evs in per.items():
        for eid, ts, _ in evs:
            inwin = [(t, v) for _, t, v in evs if ts - 3600 <= t <= ts]
            want[eid] = (len(inwin), sum(v for _, v in inwin))
    got = {
        r.event_id: (r.n_1h, r.cents_1h)
        for r in q_window_range_frame(spark, SF).collect()
    }
    assert got == want
    assert any(v[0] > 1 for v in got.values())  # frames actually overlap


def test_domain_dup_rate_attributes_planted_copies(spark):
    """Per-source dup counts recomputed in python — exact; every
    source holding one of the first 30 docs must show dups (the
    planted +1100000 copies inherit their original's source)."""
    from collections import Counter, defaultdict

    import duckdb

    from freki_spark.functions.dedup import domain_dup_rate

    docs = duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    corpus = [(t, s) for _, t, s in docs] + [
        (t, s) for d, t, s in docs if d < 30
    ]
    sizes = Counter(t for t, _ in corpus)
    per = defaultdict(lambda: [0, 0])
    for t, s in corpus:
        per[s][0] += 1
        if sizes[t] >= 2:
            per[s][1] += 1
    want = {
        s: (nd, dd, dd * 1_000_000 // nd) for s, (nd, dd) in per.items()
    }
    got = {
        r.source: (r.n_docs, r.n_dup_docs, r.dup_ppm)
        for r in domain_dup_rate(spark, SF).collect()
    }
    assert got == want
    with_planted = {s for d, _, s in docs if d < 30}
    assert all(got[s][1] >= 2 for s in with_planted)


def test_embedding_dim_stats_matches_python_recompute(spark):
    """Per-dim milli-quantized sums recomputed with python integers —
    exact; rms within 1 of the python float expression; every dim of
    the unit-normalized fixture is alive (rms > 0)."""
    import math

    import duckdb

    from freki_spark.functions.similarity import embedding_dim_stats

    vecs = [
        v
        for (v,) in duckdb.sql(
            f"SELECT embedding FROM '{SF}/embeddings.parquet'"
        ).fetchall()
    ]
    dims = len(vecs[0])
    want = {}
    for dim in range(dims):
        qs = [math.floor(float(v[dim]) * 1000.0) for v in vecs]
        n, sq, sq2 = len(qs), sum(qs), sum(q * q for q in qs)
        mean = -((-sq) * 1000 // n) if sq < 0 else (sq * 1000) // n
        rms = math.floor(math.sqrt(sq2 / n) * 1000.0)
        want[dim] = (n, sq, sq2, mean, rms)
    got = {
        r.dim: (r.n, r.sum_q_milli, r.sum_sq_milli, r.mean_micro, r.rms_micro)
        for r in embedding_dim_stats(spark, SF).collect()
    }
    assert set(got) == set(want)
    for dim in want:
        assert got[dim][:4] == want[dim][:4], dim
        assert abs(got[dim][4] - want[dim][4]) <= 1, dim
    assert all(v[4] > 0 for v in got.values())  # no dead dims in fixture


def test_kwic_matches_python_recompute(spark):
    """Concordance lines recomputed in python over the same workload
    terms — exact, including the edge-of-document context truncation
    and the per-term cap."""
    from collections import defaultdict

    import duckdb

    from freki_spark.functions.search import (
        KWIC_CAP,
        KWIC_CTX,
        kwic_concordance,
    )

    rows = kwic_concordance(spark, SF).collect()
    terms = {(r.term, r.query_id) for r in rows}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    occ = defaultdict(list)
    for did, text in docs:
        tk = text.split(" ")
        for pos, w in enumerate(tk):
            if any(w == t for t, _ in terms):
                left = " ".join(tk[max(pos - KWIC_CTX, 0) : pos])
                right = " ".join(tk[pos + 1 : pos + 1 + KWIC_CTX])
                occ[w].append((did, pos, left, right))
    want = set()
    for (t, qid) in terms:
        for rk, (did, pos, left, right) in enumerate(
            sorted(occ[t])[:KWIC_CAP], 1
        ):
            want.add((qid, t, did, pos, left, right, rk))
    got = {
        (r.query_id, r.term, r.doc_id, r.pos, r.left_ctx, r.right_ctx, r.rk)
        for r in rows
    }
    assert got == want
    assert any(r.pos == 0 and r.left_ctx == "" for r in rows) or all(
        r.pos > 0 for r in rows
    )  # edge truncation well-defined either way


def test_transcript_align_covers_speech_exactly(spark):
    """Every VAD speech segment must appear in the alignment with its
    full frame range covered by transcript overlaps (the tiling spans
    the whole asset), and each (segment, transcript) overlap must
    equal the python interval intersection."""
    from collections import defaultdict

    from freki_spark.functions.multimodal import (
        audio_vad_windows,
        transcript_vad_align,
    )

    segs = audio_vad_windows(spark, SF).collect()
    rows = transcript_vad_align(spark, SF).collect()
    by_seg = defaultdict(list)
    for r in rows:
        by_seg[(r.doc_id, r.media_ref, r.seg_no)].append(r)
    assert set(by_seg) == {(s.doc_id, s.media_ref, s.seg_no) for s in segs}
    for s in segs:
        parts = by_seg[(s.doc_id, s.media_ref, s.seg_no)]
        # transcripts tile the asset, so overlaps sum to the segment
        assert sum(p.overlap_frames for p in parts) == (
            s.f_end - s.f_start + 1
        ), s
        for p in parts:
            assert p.overlap_frames == min(p.f_end, p.t_end) - max(
                p.f_start, p.t_start
            ) + 1
            n_tr = 1 + p.doc_id % 3
            assert 0 <= p.tr_no < n_tr


def test_explode_outer_preserves_empty_docs(spark):
    """explode_outer must keep every document: empty-array docs come
    back as one NULL row (is_empty_doc=1), and the doc_id set equals
    the full corpus — the silent-loss bug a plain explode would have."""
    import duckdb

    from freki_spark.queries import EXPLODE_OUTER_MINLEN, q_explode_outer

    rows = q_explode_outer(spark, SF).collect()
    all_ids = {
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    }
    assert {r.doc_id for r in rows} == all_ids
    empties = [r for r in rows if r.is_empty_doc == 1]
    assert empties and all(r.tok is None for r in empties)
    toks_ = [r for r in rows if r.tok is not None]
    assert toks_ and all(
        len(r.tok) >= EXPLODE_OUTER_MINLEN for r in toks_
    )
