"""Dedup / text-analysis operators vs brute-force ground truth on the
driver's documents table + synthetic near-dups."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geotile import textops


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


def _mutate(text: str, n: int = 2) -> str:
    toks = text.split()
    for i in range(n):
        toks[(i * 13) % len(toks)] = "zzz"
    return " ".join(toks)


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    rows = docs.limit(40).collect()
    extra = []
    for r in rows[:10]:
        extra.append((r["doc_id"] + 100000, r["text"], r["lang"], r["source"], r["n_chars"]))
    for r in rows[10:20]:
        extra.append((r["doc_id"] + 200000, _mutate(r["text"]), r["lang"], r["source"], r["n_chars"]))
    return docs.unionByName(spark.createDataFrame(extra, docs.schema))


def test_exact_dedup(spark, docs_with_dups):
    n_before = docs_with_dups.count()
    out = textops.exact_dedup(docs_with_dups)
    assert out.count() == n_before - 10
    # survivors are the lowest ids
    assert out.where(F.col("doc_id") >= 100000).where(F.col("doc_id") < 200000).count() == 0


def test_minhash_lsh_finds_planted_dups(docs_with_dups):
    pairs = textops.minhash_lsh_pairs(docs_with_dups, threshold=0.5).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    # all 10 exact copies must be found (jaccard 1.0)
    exact = {(i, i + 100000) for i in range(10)}
    assert exact <= found
    for r in pairs:
        if (r["a"], r["b"]) in exact:
            assert r["est_jaccard"] == 1.0


def test_minhash_estimates_track_true_jaccard(spark):
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a.replace("fox", "cat").replace("dog", "pig")
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    pairs = textops.minhash_lsh_pairs(df, threshold=0.1, bands=32).collect()
    assert len(pairs) == 1
    est = pairs[0]["est_jaccard"]

    def shingles(t):
        return {t[i:i + 5] for i in range(len(t) - 4)}

    true_j = len(shingles(a) & shingles(b)) / len(shingles(a) | shingles(b))
    assert abs(est - true_j) < 0.2


def test_simhash_pairs_exact_copies(docs_with_dups):
    pairs = textops.simhash_pairs(docs_with_dups, max_hamming=3).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert {(i, i + 100000) for i in range(10)} <= found
    for r in pairs:
        assert r["hamming"] <= 3


def test_ngram_jaccard_pairs(spark):
    a = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    b = "w1 w2 w3 w4 w5 w6 w7 w8 zz w10"   # differs in 1 token
    c = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"   # disjoint
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], "doc_id long, text string")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in textops.ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()}
    assert set(got) == {(0, 1)}
    # trigrams: 8 each; shared = 6 (positions 0-5 minus those touching slot 8)
    a_g = {tuple(a.split()[i:i + 3]) for i in range(8)}
    b_g = {tuple(b.split()[i:i + 3]) for i in range(8)}
    expect = len(a_g & b_g) / len(a_g | b_g)
    assert got[(0, 1)] == pytest.approx(expect)


def test_lang_scores(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog of the house"),
         (1, "el gato y la casa de el perro"),
         (2, "der hund und die katze und der")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"] for r in textops.lang_scores(df).collect()}
    assert got == {0: "en", 1: "es", 2: "de"}


def test_quality_and_tokens(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat on a mat and looked to the door in peace"),
         (1, "x")],
        "doc_id long, text string")
    q = {r["doc_id"]: r for r in textops.quality_features(df).collect()}
    assert q[0]["quality"] == 1.0 and q[1]["quality"] == 0.0
    assert q[0]["n_tokens"] == 13
    t = {r["doc_id"]: r["n_tokens"] for r in textops.token_count(df).collect()}
    assert t[0] == 14  # 13 words + 1 subword split for 'looked' (6 chars)
    assert t[1] == 1


def test_winnow_fingerprints_shared_substring(spark):
    base = "abcdefghijklmnopqrstuvwxyz0123456789"
    df = spark.createDataFrame(
        [(0, "XX" + base + "YY"), (1, "AA" + base + "BB"), (2, "totally different")],
        "doc_id long, text string")
    fps = {r["doc_id"]: set(r["fingerprints"])
           for r in textops.winnow_fingerprints(df).collect()}
    # guarantee: shared substring of length >= k + window - 1 = 10
    assert fps[0] & fps[1]
    assert not (fps[0] & fps[2])


def test_minhash_deterministic_across_runs(docs):
    s1 = textops.minhash_signatures(docs.limit(20)).select("doc_id", "minhash").collect()
    s2 = textops.minhash_signatures(docs.limit(20).repartition(5)).select("doc_id", "minhash").collect()
    assert {r["doc_id"]: tuple(r["minhash"]) for r in s1} == \
           {r["doc_id"]: tuple(r["minhash"]) for r in s2}


def test_verified_near_dup_pairs(spark, docs_with_dups):
    """Two-stage dedup: exact copies verify at jaccard 1.0; every
    reported pair's jaccard is the true exact n-gram jaccard (checked
    against the brute-force exact op on the same corpus subset)."""
    got = textops.verified_near_dup_pairs(docs_with_dups).collect()
    by_pair = {(r["a"], r["b"]): r["jaccard"] for r in got}
    # exact copies (ids +100000) must all be found with jaccard 1.0
    exact = {p for p in by_pair if p[1] == p[0] + 100000}
    assert len(exact) == 10
    assert all(by_pair[p] == 1.0 for p in exact)
    # reported jaccards agree with the exact all-pairs op (verify stage
    # is exact, so every reported pair must match the brute-force value)
    brute = {(r["a"], r["b"]): r["jaccard"]
             for r in textops.ngram_jaccard_pairs(
                 docs_with_dups, n=3, threshold=0.25).collect()}
    for p, j in by_pair.items():
        assert p in brute and abs(brute[p] - j) < 1e-12


def test_verified_pairs_subset_of_exact(spark, docs_with_dups):
    """LSH candidates can MISS pairs (false negatives) but the verified
    output can never contain a pair the exact op rejects."""
    got = {(r["a"], r["b"]) for r in
           textops.verified_near_dup_pairs(docs_with_dups).collect()}
    exact = {(r["a"], r["b"]) for r in
             textops.ngram_jaccard_pairs(
                 docs_with_dups, n=3, threshold=0.25).collect()}
    assert got <= exact


def test_kmv_distinct_estimates(spark, docs):
    """KMV sketch: groups with < k distinct hashes report the exact
    count; k-saturated groups estimate within standard KMV error
    (~1/sqrt(k) -> assert a generous 5-sigma band)."""
    out = {r["lang"]: r for r in
           textops.kmv_distinct(docs, group="lang", k=256).collect()}
    ex = (docs.select("lang", F.explode(
        textops.token_hash_udf()(F.col("text"))).alias("h"))
        .groupBy("lang").agg(F.count_distinct("h").alias("nd")))
    exact = {r["lang"]: r["nd"] for r in ex.collect()}
    for lang, r in out.items():
        if r["n_in_sketch"] < 256:
            assert r["est_distinct"] == float(exact[lang])
        else:
            rel = abs(r["est_distinct"] - exact[lang]) / exact[lang]
            assert rel < 5.0 / (256 ** 0.5), (lang, r["est_distinct"], exact[lang])


def test_deterministic_sample_stability(spark, docs):
    """Hash-sample membership is a pure key function: invariant across
    partitionings AND across corpus growth (a doc's split assignment
    never changes when more docs arrive); fraction lands near target;
    disjoint seeds give different (independent) splits."""
    full = {r["doc_id"] for r in
            textops.deterministic_sample(docs, 0.2, seed=7).select("doc_id").collect()}
    repart = {r["doc_id"] for r in
              textops.deterministic_sample(docs.repartition(13), 0.2, seed=7)
              .select("doc_id").collect()}
    assert full == repart
    subset = {r["doc_id"] for r in
              textops.deterministic_sample(docs.where("doc_id < 200"), 0.2, seed=7)
              .select("doc_id").collect()}
    assert subset == {d for d in full if d < 200}
    n = docs.count()
    assert abs(len(full) / n - 0.2) < 0.08
    other = {r["doc_id"] for r in
             textops.deterministic_sample(docs, 0.2, seed=8).select("doc_id").collect()}
    assert other != full
    # edge fractions
    assert textops.deterministic_sample(docs, 0.0).count() == 0
    assert textops.deterministic_sample(docs, 1.0).count() == n


def test_ngram_jaccard_edge_whitespace_and_short_docs(spark):
    """Leading/trailing whitespace must not create empty tokens (the
    DuckDB oracle trims), and docs with fewer than n tokens must not
    build a descending F.sequence (slice throws at runtime)."""
    df = spark.createDataFrame(
        [(0, "alpha beta gamma delta"),
         (1, "  alpha beta gamma delta  "),   # same grams after trim
         (2, "too short"),                     # < n tokens: guarded out
         (3, "x")],
        "doc_id long, text string")
    got = {(r["a"], r["b"]): r["jaccard"]
           for r in textops.ngram_jaccard_pairs(df, n=3, threshold=0.1).collect()}
    assert got == {(0, 1): 1.0}


def test_verified_near_dup_edge_docs_no_crash(spark):
    """verified_near_dup_pairs survives whitespace-padded and sub-n-token
    docs end-to-end (trim + short-doc guard on the verify stage)."""
    base = "the quick brown fox jumps over the lazy dog again and again " * 3
    df = spark.createDataFrame(
        [(0, base), (1, "  " + base + "  "), (2, "tiny doc"), (3, "q")],
        "doc_id long, text string")
    got = {(r["a"], r["b"]) for r in textops.verified_near_dup_pairs(
        df, candidate_threshold=0.1, jaccard_threshold=0.5).collect()}
    assert (0, 1) in got
    assert all(a not in (2, 3) and b not in (2, 3) for a, b in got)


def test_text_embedding_deterministic_and_normalized(spark):
    """Hashed-token embedding: L2-normalized, partitioning-invariant,
    and components are exact integer/norm ratios."""
    import numpy as np

    rows = [(i, f"alpha beta gamma doc{i} token{i % 7} the the") for i in range(40)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df7 = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    e1 = {r["doc_id"]: r["embedding"]
          for r in textops.text_embedding(df1, dim=32).collect()}
    e7 = {r["doc_id"]: r["embedding"]
          for r in textops.text_embedding(df7, dim=32).collect()}
    assert e1 == e7  # bit-identical across partitionings
    for v in e1.values():
        a = np.asarray(v)
        assert abs(float(a @ a) - 1.0) < 1e-12
    # identical texts -> identical vectors; disjoint texts -> dissimilar
    ra, rb = e1[0], e1[7]  # doc0 vs doc7 share token7-class and statics
    pair = spark.createDataFrame(
        [(0, "x y z"), (1, "x y z"), (2, "p q r s t u v w")],
        "doc_id long, text string")
    pe = {r["doc_id"]: np.asarray(r["embedding"])
          for r in textops.text_embedding(pair, dim=32).collect()}
    assert np.array_equal(pe[0], pe[1])
    assert float(pe[0] @ pe[2]) < 0.9


def test_text_embedding_feeds_cosine_near_dup(spark):
    """End-to-end documents -> vectors -> near-dup pairs: exact dup
    texts surface as cosine-1 pairs."""
    from geotile import simsearch

    base = "the quick brown fox jumps over the lazy dog " * 4
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, "completely different words entirely " * 6),
         (3, "unrelated corpus text with other tokens " * 5)],
        "doc_id long, text string")
    emb = textops.text_embedding(df, dim=64)
    got = {(r["a"], r["b"]): r["cosine"]
           for r in simsearch.cosine_near_dup_pairs(
               emb.select("doc_id", "embedding"), threshold=0.95,
               id_col="doc_id").collect()}
    assert (0, 1) in got and got[(0, 1)] == pytest.approx(1.0, abs=1e-12)
    assert all({a, b} == {0, 1} for a, b in got)


def test_synth_docs_skew_deterministic_and_capped(spark):
    """Zipf-boilerplate corpus: deterministic across partitionings, hot
    fingerprints far above the winnow cap, and winnow_pairs still
    completes with bounded output under that skew."""
    from geotile import synth

    a = sorted(r["text"] for r in synth.synth_docs_skew(spark, 300, partitions=1).collect())
    b = sorted(r["text"] for r in synth.synth_docs_skew(spark, 300, partitions=5).collect())
    assert a == b
    skew = synth.synth_docs_skew(spark, 300, partitions=4)
    hot = (textops.winnow_fingerprints(skew)
           .select(F.explode("fingerprints").alias("f"))
           .groupBy("f").count().agg(F.max("count").alias("mx")).first())
    assert hot["mx"] > 50  # hottest block fingerprint lands in ~1/3 of docs
    wp = textops.winnow_pairs(skew)
    n = wp.count()
    textops.release(wp)
    assert 0 < n < 300 * 299 / 2  # bounded: nowhere near all-pairs


def test_text_embedding_capped_suppresses_boilerplate(spark):
    """df-capped embedding: a token present in every doc is dropped, so
    docs that differ only in distinctive content become orthogonal-ish,
    while the uncapped embedding sees them as similar; all-capped docs
    embed as the zero vector."""
    import numpy as np

    rows = [(i, "common filler words everywhere " + t) for i, t in
            [(0, "apples oranges pears"), (1, "apples oranges pears"),
             (2, "zebras yaks gnus"), (3, "")]]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {r["doc_id"]: np.asarray(r["embedding"]) for r in
              textops.text_embedding_capped(df, dim=32, max_df=3).collect()}
    # identical distinctive content -> identical vectors
    assert np.array_equal(capped[0], capped[1])
    # doc3 has only capped tokens -> zero vector
    assert not capped[3].any()
    # distinctive-only vectors: different content nearly orthogonal
    cos = float(capped[0] @ capped[2])
    uncapped = {r["doc_id"]: np.asarray(r["embedding"]) for r in
                textops.text_embedding(df, dim=32).collect()}
    cos_unc = float(uncapped[0] @ uncapped[2])
    assert abs(cos) < cos_unc  # cap strictly improves separation here
    # partitioning invariance
    b = {r["doc_id"]: list(r["embedding"]) for r in
         textops.text_embedding_capped(df.repartition(7), dim=32, max_df=3).collect()}
    assert b == {k: list(v) for k, v in capped.items()}


def test_text_embedding_capped_non_pow2_dim_unsigned_bucketing(spark):
    """Bucketing must follow the UNSIGNED 64-bit hash for any dim (the
    oracle computes HUGEINT % dim): verify dim=100 against a pure-python
    unsigned reference built from the validated xxhash64 replica."""
    import numpy as np

    dim, seed = 100, 11
    texts = ["alpha beta gamma delta", "epsilon zeta eta"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r["embedding"] for r in
           textops.text_embedding_capped(df, dim=dim, seed=seed).collect()}
    hs, per = textops._token_hashes_flat(pd.Series(texts))
    off = 0
    for d, cnt in enumerate(per):
        vec = np.zeros(dim)
        for h in hs[off:off + cnt]:
            u = textops.xxhash64_long(int(h) ^ seed) & ((1 << 64) - 1)
            vec[u % dim] += -1.0 if u >> 63 else 1.0
        off += cnt
        nrm = float(np.sqrt((vec * vec).sum()))
        want = (vec / nrm if nrm > 0 else vec).tolist()
        assert got[d] == want, d


def test_bm25_topk_matches_reference_formula(spark):
    import math

    from geotile import textops

    docs = [(1, "apple banana apple"), (2, "apple cherry"),
            (3, "banana banana banana durian"), (4, "cherry durian elder fig")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: (r["score_nano"], r["n_terms"])
           for r in textops.bm25_topk(df, ["apple", "banana"], k=4).collect()}

    texts = {d: t.split() for d, t in docs}
    N = 4
    sum_dl = sum(len(w) for w in texts.values())
    dfreq = {t: sum(1 for w in texts.values() if t in w) for t in ("apple", "banana")}
    expect = {}
    for d, w in texts.items():
        nano = 0
        nt = 0
        for t in ("apple", "banana"):
            tf = w.count(t)
            if not tf:
                continue
            nt += 1
            idf = math.log(1.0 + (N - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            norm = 1.0 - 0.75 + 0.75 * (len(w) * N) / sum_dl
            nano += math.floor(idf * (tf * 2.2) / (tf + 1.2 * norm) * 1e9 + 0.5)
        if nt:
            expect[d] = (nano, nt)
    assert out == expect


def test_repetition_features_flags_repetitive_doc(spark):
    from geotile import textops

    docs = [(1, "spam spam spam spam spam ham"),
            (2, "one two three four five six seven eight")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r.asDict() for r in textops.repetition_features(df).collect()}
    # doc 1: 6 words, top word 5/6; bigrams 5 total 2 distinct -> 0.6 dup
    assert rows[1]["keep"] == 0
    assert rows[1]["topw_nano"] == round(5 / 6 * 1e9)
    assert rows[1]["dup2_nano"] == round(3 / 5 * 1e9)
    # doc 2: all distinct -> everything zero, kept
    assert rows[2] == {"doc_id": 2, "n_words": 8, "dup2_nano": 0,
                       "dup3_nano": 0, "topw_nano": 125000000, "keep": 1}


# ---------------------------------------------------------------------------
# chunk-level global dedup
# ---------------------------------------------------------------------------


def test_chunk_dedup_keeps_first_occurrence_only(spark):
    rows = [
        (0, "a b c d e f g h"),          # chunks: "a b c d e", "f g h"
        (1, "a b c d e x y"),            # first chunk duplicates doc 0
        (2, "f g h q r s t u v w"),      # no 5-token chunk collision
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.chunk_dedup(df, n=5).collect()}
    assert out[0]["n_chunks"] == 2 and out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == "a b c d e f g h"
    # doc 1 loses its first chunk (doc 0 owns it), keeps the tail
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "x y"
    assert out[2]["n_kept"] == 2
    assert out[2]["clean_text"] == "f g h q r s t u v w"


def test_chunk_dedup_fully_duplicated_doc_empties(spark):
    rows = [(0, "p q r s t"), (1, "p q r s t")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.chunk_dedup(df, n=5).collect()}
    assert out[0]["clean_text"] == "p q r s t"
    assert out[1]["n_kept"] == 0 and out[1]["clean_text"] == ""


def test_chunk_dedup_within_doc_repeat(spark):
    # the same chunk twice in ONE doc: second occurrence dropped
    df = spark.createDataFrame([(5, "m n o p q m n o p q")],
                               "doc_id long, text string")
    r = textops.chunk_dedup(df, n=5).collect()[0]
    assert r["n_chunks"] == 2 and r["n_kept"] == 1
    assert r["clean_text"] == "m n o p q"


def test_source_quota_caps_and_ranks(spark, docs):
    """Quota respected per source; ranks are 1..min(quota, group size);
    selection = the quota best by (score desc, doc_id) ground truth."""
    out = textops.source_quota(docs, quota=5).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    qf = textops.quality_features(docs)
    truth = qf.select(
        "source", "doc_id",
        (F.floor(F.col("stopword_ratio") * 1e9 + F.lit(0.5))
         - F.floor(F.col("punct_ratio") * 1e9 + F.lit(0.5)))
        .cast("long").alias("s")).collect()
    want = {}
    for r in truth:
        want.setdefault(r["source"], []).append((-r["s"], r["doc_id"]))
    for src, rows in by_src.items():
        assert len(rows) <= 5
        assert sorted(r["rank"] for r in rows) == list(range(1, len(rows) + 1))
        top = [d for _, d in sorted(want[src])[:5]]
        assert sorted(r["doc_id"] for r in rows) == sorted(top)


def test_collocations_matches_local_counts(spark):
    """Tiny corpus with a planted collocation: counts and integer lift
    match a pure-Python computation."""
    texts = ["new york is big", "i love new york", "new york new york",
             "york new haven", "big is big"] * 3
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = textops.collocations(df, min_count=2, k=10).collect()
    from collections import Counter
    uni, big = Counter(), Counter()
    for t in texts:
        w = t.split()
        uni.update(w)
        big.update(zip(w, w[1:]))
    nu, nb = sum(uni.values()), sum(big.values())
    want = []
    for (x, y), c in big.items():
        if c >= 2:
            want.append((x, y, c, c * nu * nu * 10**9 // (nb * uni[x] * uni[y])))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    got = [(r["x"], r["y"], r["c_xy"], r["lift_nano"]) for r in out]
    assert got == want[:10]
    # the planted bigram survives the count floor and ranks above its
    # reversal (PMI-style lift rewards rare exclusive pairs like
    # "i love" even more — that's correct)
    pairs = [g[:2] for g in got]
    assert ("new", "york") in pairs
    assert pairs.index(("new", "york")) < pairs.index(("york", "new"))


def test_kmv_merge_equals_direct_global_sketch(spark, docs):
    """Mergeability: re-minning per-source partial sketches reproduces
    the sketch computed directly over the whole corpus."""
    sk = textops.kmv_sketch_rows(docs, group="source", k=128)
    merged = textops.kmv_merge(sk, k=128).collect()[0]
    direct = (textops.kmv_distinct(
        docs.withColumn("_g", F.lit("all")), group="_g", k=128)
        .collect()[0])
    assert merged["kth_hash"] == direct["kth_hash"]
    assert merged["n_in_sketch"] == direct["n_in_sketch"]
    assert merged["est_distinct"] == direct["est_distinct"]


def test_source_quota_salted_pre_thin_identical(spark, docs):
    plain = sorted(map(tuple, textops.source_quota(docs, quota=7).collect()))
    salted = sorted(map(tuple,
                        textops.source_quota(docs, quota=7, salt_mod=4).collect()))
    assert plain == salted


def test_char_entropy_known_values(spark):
    import math

    from geotile import textops

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["ent_nano"], r["n_distinct_chars"])
           for r in textops.char_entropy(df).collect()}
    assert 4 not in got                      # empty doc excluded
    assert got[1] == (0, 1)                  # single-char text: zero bits
    assert got[2] == (-2 * math.floor(0.5 * math.log2(0.5) * 1e9), 2)
    assert got[3] == (-4 * math.floor(0.25 * math.log2(0.25) * 1e9), 4)


def test_winsorize_doc_lengths_exact_kth(spark):
    from geotile import textops

    rows = [(i, "s1", " ".join(["w"] * n)) for i, n in
            enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])]
    rows += [(100 + i, "s2", " ".join(["w"] * n)) for i, n in
             enumerate([5, 50])]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["n_capped"])
           for r in textops.winsorize_doc_lengths(df).collect()}
    # s1: n=10, k = (95*10+99)//100 = 10 -> cap = 100 (no capping)
    assert out[9] == (100, 100)
    # s2: n=2, k = (95*2+99)//100 = 2 -> cap = 50
    assert out[101] == (50, 50)
    assert out[100] == (5, 5)
    # force capping: s1 with k=9 via pct=90 -> cap 9, the 100 capped
    out90 = {r["doc_id"]: r["n_capped"] for r in
             textops.winsorize_doc_lengths(df, pct=90).collect()}
    assert out90[9] == 9


def test_heavy_hitters_exact_and_partition_independent(spark):
    from geotile import textops

    # "hot" is 49% of tokens, "warm" ~10%, the rest are singletons
    rows = [(i, "hot " * 5 + "warm " + f"rare{i} x{i} y{i} z{i}")
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from geotile import cache

    expect = {("hot", 1500), ("warm", 300)}
    for parts in (1, 7, 32):
        hh = textops.heavy_hitter_tokens(df.repartition(parts), phi=0.05)
        out = {(r["token"], r["n"]) for r in hh.collect()}
        cache.release(hh)
        assert out == expect
    # tight sketch: k floored at 8 counters still captures >1/8-share
    hh = textops.heavy_hitter_tokens(df.repartition(13), phi=0.3, sketch_k=8)
    out = {(r["token"], r["n"]) for r in hh.collect()}
    cache.release(hh)
    assert out == {("hot", 1500)}
    # the MG pass must tokenize exactly like the exact pass: a token
    # glued by a UNICODE space (one \s+ token to Spark) stays heavy
    df2 = spark.createDataFrame(
        [(i, "a\u00a0b " * 3 + f"r{i}") for i in range(100)],
        "doc_id long, text string")
    hh2 = textops.heavy_hitter_tokens(df2.repartition(9), phi=0.5)
    got = {(r["token"], r["n"]) for r in hh2.collect()}
    cache.release(hh2)
    assert got == {("a\u00a0b", 300)}


def test_bigram_logprob_known_values(spark):
    import math

    from geotile import cache, textops

    # corpus bigrams: (a b) x3, (b a) x2, (a c) x1 -> U(a)=4, U(b)=2
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a c"), (3, "x")],
        "doc_id long, text string")
    out = textops.bigram_logprob(df)
    got = {r["doc_id"]: (r["n_bigrams"], r["lp_micro"]) for r in out.collect()}
    cache.release(out)
    t_ab = math.floor(math.log(3 / 4) * 1e6)
    t_ba = math.floor(math.log(2 / 2) * 1e6)
    t_ac = math.floor(math.log(1 / 4) * 1e6)
    assert got[1] == (3, 2 * t_ab + t_ba)
    assert got[2] == (3, t_ab + t_ba + t_ac)
    assert got[3] == (0, 0)          # single-token doc: no bigrams


def test_bigram_logprob_min_count_floor(spark):
    import math

    from geotile import cache, textops

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b a c"), (3, "x")],
        "doc_id long, text string")
    # min_count=1 must be bit-identical to the exact model
    exact = textops.bigram_logprob(df)
    want = {r["doc_id"]: (r["n_bigrams"], r["lp_micro"]) for r in exact.collect()}
    cache.release(exact)
    same = textops.bigram_logprob(df, min_count=1)
    got = {r["doc_id"]: (r["n_bigrams"], r["lp_micro"]) for r in same.collect()}
    cache.release(same)
    assert got == want
    # min_count=2 prunes the singleton (a c); survivors renormalize:
    # U(a) = 3 (only a->b survives), U(b) = 2
    floored = textops.bigram_logprob(df, min_count=2)
    got2 = {r["doc_id"]: (r["n_bigrams"], r["lp_micro"]) for r in floored.collect()}
    cache.release(floored)
    t_ab = math.floor(math.log(3 / 3) * 1e6)
    t_ba = math.floor(math.log(2 / 2) * 1e6)
    assert got2[1] == (3, 2 * t_ab + t_ba)
    assert got2[2] == (2, t_ab + t_ba)   # (a c) no longer modeled
    assert got2[3] == (0, 0)


def test_redact_pii_counts_and_strings(spark):
    from geotile import textops

    df = spark.createDataFrame(
        [(1, "mail me at bob.smith+x@my-site.co.uk or 10.0.0.1 ok"),
         (2, "no pii here, just 1234 and a.dot."),
         (3, "a@b.io b@c.org 255.255.255.255 1.2.3.4")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_emails"], r["n_ipv4"], r["redacted"])
           for r in textops.redact_pii(df).collect()}
    assert got[1] == (1, 1, "mail me at <EMAIL> or <IP> ok")
    assert got[2] == (0, 0, "no pii here, just 1234 and a.dot.")
    assert got[3] == (2, 2, "<EMAIL> <EMAIL> <IP> <IP>")


def test_decontaminate_exact_counts(spark):
    from geotile import textops

    train = spark.createDataFrame(
        [(0, "a b c d e"),       # shares gram 'a b c' and 'b c d'
         (1, "x y z w"),         # clean
         (2, "c d e a b c"),     # shares 'c d e' and 'a b c'
         (3, "a b")],            # shorter than n -> no grams -> clean
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a b c d e q r s")], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in textops.decontaminate(train, bench, n=3).collect()}
    assert got == {0: (3, 1), 1: (0, 0), 2: (2, 1), 3: (0, 0)}


def test_decontaminate_never_shuffles_corpus(spark):
    """The corpus-side plan must show only broadcast joins — no
    shuffle Exchange sourced from the training table."""
    from geotile import textops

    train = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(50)],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "tok1 tok2 tok3")], "doc_id long, text string")
    out = textops.decontaminate(train, bench, n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # docs 0 and 1 both contain the bench trigram 'tok1 tok2 tok3'
    assert sum(1 for r in out.collect() if r["contaminated"]) == 2


def test_boilerplate_ngrams_known_counts(spark):
    # source A (12 docs, screened): 10 docs end with the same 4-token
    # footer ("all rights reserved here" -> two 3-grams), 2 docs are
    # clean; source B (2 docs < min_docs): identical docs, never
    # screened.
    rows = []
    for i in range(10):
        rows.append((i, "A", f"unique{i} words body{i} all rights reserved here"))
    rows.append((10, "A", "totally clean document body text"))
    rows.append((11, "A", "short"))
    rows.extend([(12, "B", "same text twice over"), (13, "B", "same text twice over")])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["n_grams"], r["n_boiler"]) for r in
           textops.boilerplate_ngrams(df, n=3, df_frac=0.5, min_docs=10).collect()}
    assert len(out) == 14
    # footer docs: 7 tokens -> 5 grams; boiler grams are the two footer
    # 3-grams ("all rights reserved", "rights reserved here"), df=10 >=
    # ceil(0.5*12)=6
    for i in range(10):
        assert out[i] == (5, 2), (i, out[i])
    assert out[10] == (3, 0)      # 5 tokens -> 3 grams, none template
    assert out[11] == (0, 0)      # 1 token < n -> empty gram set
    # source B: df=2 >= ceil(0.5*2)=1 but nd=2 < min_docs -> unscreened
    assert out[12] == (2, 0) and out[13] == (2, 0)


def test_pack_sequences_known_layout(spark):
    # source A stream: 3 + 4 + 1 tokens, ctx=4 -> doc 2 straddles the
    # first chunk boundary; source B packs independently; empty text
    # tokenizes to one empty token (split('') -> [''] — the engine-wide
    # q14/q100 tokenizer convention).
    rows = [(1, "A", "a b c"), (2, "A", "d e f g"), (3, "A", "h"),
            (4, "B", "x y z w"), (5, "B", "")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["start_tok"], r["chunk_first"],
                         r["chunk_last"], r["split_doc"])
           for r in textops.pack_sequences(df, ctx=4).collect()}
    assert out == {1: (3, 0, 0, 0, False),
                   2: (4, 3, 0, 1, True),
                   3: (1, 7, 1, 1, False),
                   4: (4, 0, 0, 0, False),
                   5: (1, 4, 1, 1, False)}


def test_pack_sequences_ctx1_splits_every_multitoken_doc(spark):
    rows = [(1, "A", "a b c"), (2, "A", "d")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["split_doc"]
           for r in textops.pack_sequences(df, ctx=1).collect()}
    assert out == {1: True, 2: False}
    with pytest.raises(ValueError):
        textops.pack_sequences(df, ctx=0)


def test_source_mixing_weights_exact_ppm(spark):
    rows = [(i, "A", "t") for i in range(9)] + [(100 + i, "B", "t") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in
           textops.source_mixing_weights(df, alpha=0.5).collect()}
    # sqrt(9)=3, sqrt(4)=2 exactly -> pow_micro 3e6 / 2e6, tp 5e6
    assert (out["A"]["n_docs"], out["A"]["pow_micro"]) == (9, 3_000_000)
    assert (out["B"]["n_docs"], out["B"]["pow_micro"]) == (4, 2_000_000)
    assert out["A"]["weight_ppm"] == 600_000 and out["B"]["weight_ppm"] == 400_000
    # tn = 13 -> floor(0.6*13) = 7, floor(0.4*13) = 5
    assert out["A"]["docs_per_epoch"] == 7 and out["B"]["docs_per_epoch"] == 5
    # alpha=1 (pow path) degenerates to natural frequency
    nat = {r["source"]: r["weight_ppm"] for r in
           textops.source_mixing_weights(df, alpha=1.0).collect()}
    assert nat == {"A": 9_000_000 * 1_000_000 // 13_000_000,
                   "B": 4_000_000 * 1_000_000 // 13_000_000}
    assert sum(nat.values()) <= 1_000_000


def test_cell_top_terms_known_scores(spark):
    import math

    rows = [("c1", "a a b"), ("c2", "a c")]
    df = spark.createDataFrame(rows, "cell string, text string")
    out = {(r["cell"], r["rank"]): (r["t"], r["tf"], r["df_t"], r["score_nano"])
           for r in textops.cell_top_terms(df, k=2).collect()}
    ln2 = int(math.floor(math.log(2.0) * 1e9 + 0.5))  # idf of a 1-of-2-cells term
    assert out == {("c1", 1): ("b", 1, 1, ln2),
                   ("c1", 2): ("a", 2, 2, 0),   # idf ln(2/2)=0; beats nothing else
                   ("c2", 1): ("c", 1, 1, ln2),
                   ("c2", 2): ("a", 1, 2, 0)}
    with pytest.raises(ValueError):
        textops.cell_top_terms(df, k=0)


def test_source_kl_drift_zero_for_identical_sources(spark):
    rows = [(1, "A", "a a b"), (2, "B", "a a b")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: (r["n_terms"], r["kl_nano"])
           for r in textops.source_kl_drift(df).collect()}
    # both sources match the corpus distribution exactly -> every ln
    # term is ln(1)=0 -> floor(0.5)=0
    assert out == {"A": (2, 0), "B": (2, 0)}


def test_source_kl_drift_matches_reference_formula(spark):
    import math

    rows = [(1, "A", "a a a b"), (2, "B", "b b c"), (3, "B", "c a")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r["kl_nano"]
           for r in textops.source_kl_drift(df).collect()}
    # brute-force the identical floored-nano formula
    toks = {"A": "a a a b".split(), "B": ("b b c".split() + "c a".split())}
    c_t: dict[str, int] = {}
    for ws in toks.values():
        for w in ws:
            c_t[w] = c_t.get(w, 0) + 1
    tt = sum(c_t.values())
    want = {}
    for s, ws in toks.items():
        c_st: dict[str, int] = {}
        for w in ws:
            c_st[w] = c_st.get(w, 0) + 1
        t_s = len(ws)
        want[s] = sum(
            math.floor((c / t_s) * math.log((c * tt) / (t_s * c_t[w])) * 1e9 + 0.5)
            for w, c in c_st.items())
    assert got == want
    # true KL is >= 0; the per-term floor can move the sum by < 0.5
    # nano-nats per term only
    assert all(v >= -len(set(toks[s])) for s, v in got.items())


def test_dsir_weights_known_values(spark):
    import math

    rows = [(1, "T", "a b a b"), (2, "T", "a b"),
            (3, "R", "a b c"), (4, "R", "x")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: (r["n_modeled"], r["logw_micro"])
           for r in textops.dsir_weights(df, target=F.col("source") == "T").collect()}
    # target: Bt(a,b)=3 Ut(a)=3; Bt(b,a)=1 Ut(b)=1.  base: Bb(a,b)=4
    # Ub(a)=4; Bb(b,a)=1 Ub(b)=2 ((b,c) exists in base but is not
    # target vocab, so doc 3 scores only its (a,b) bigram).
    # term(a,b) = 0 - 0; term(b,a) = 0 - floor(ln(0.5)*1e6)
    lnhalf = math.floor(math.log(0.5) * 1e6)
    assert out == {1: (3, -lnhalf), 2: (1, 0), 3: (1, 0), 4: (0, 0)}


def test_pack_sequences_conservation(docs):
    # chunk accounting over the real corpus: per source the stream is
    # gapless (max(start_tok + n_tokens) == sum(n_tokens)), chunk
    # indices are consistent with the offsets, and split_doc is
    # exactly "spans a boundary"
    out = textops.pack_sequences(docs, ctx=256).collect()
    import collections
    per = collections.defaultdict(list)
    for r in out:
        per[r["source"]].append(r)
        assert r["chunk_first"] == r["start_tok"] // 256
        end = r["start_tok"] + max(r["n_tokens"] - 1, 0)
        assert r["chunk_last"] == end // 256
        assert r["split_doc"] == (r["chunk_last"] > r["chunk_first"])
    for rows in per.values():
        total = sum(r["n_tokens"] for r in rows)
        assert max(r["start_tok"] + r["n_tokens"] for r in rows) == total
        rows.sort(key=lambda r: r["doc_id"])
        run = 0
        for r in rows:
            assert r["start_tok"] == run
            run += r["n_tokens"]


def test_hll_registers_match_numpy_replica(spark):
    rows = [(i, f"s{i % 3}", f"tok{i} tok{i % 7} shared word{i % 11}")
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["source"], r["bucket"]): r["reg"]
           for r in textops.hll_registers(df, group="source", p=6).collect()}
    # numpy replica: same Horner+splitmix hash, bucket = top 6 bits,
    # rank = leading zeros of the 58-bit suffix + 1
    expect = {}
    for g in ("s0", "s1", "s2"):
        texts = pd.Series([t for i, s, t in rows if s == g])
        hs, _ = textops._token_hashes_flat(texts)
        for h in hs:
            h = int(h)
            bucket, sfx = h >> 58, h & ((1 << 58) - 1)
            rank = 59 - sfx.bit_length() if sfx else 59
            k = (g, bucket)
            expect[k] = max(expect.get(k, 0), rank)
    assert got == expect


def test_hll_merge_equals_direct(docs):
    per_src = textops.hll_registers(docs, group="source", p=6)
    merged = {(r["bucket"]): r["reg"]
              for r in per_src.groupBy("bucket")
              .agg(F.max("reg").alias("reg")).collect()}
    direct = {(r["bucket"]): r["reg"]
              for r in textops.hll_registers(
                  docs.withColumn("_g", F.lit("x")), group="_g", p=6).collect()}
    assert merged == direct


def test_hll_estimate_tracks_true_distinct(spark):
    # 500 distinct tokens, one per doc, p=8 (m=256): HLL standard
    # error is ~1.04/sqrt(m) ~ 6.5%; assert a loose 3-sigma band
    df = spark.createDataFrame(
        [(i, f"u{i:04d}") for i in range(500)], "doc_id long, text string")
    regs = [(r["bucket"], r["reg"])
            for r in textops.hll_registers(
                df.withColumn("_g", F.lit("x")), group="_g", p=8).collect()]
    est = textops.hll_estimate(regs, p=8)
    assert 500 * 0.8 <= est <= 500 * 1.2
    # tiny range exercises linear counting exactly
    df2 = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    regs2 = [(r["bucket"], r["reg"])
             for r in textops.hll_registers(
                 df2.withColumn("_g", F.lit("x")), group="_g", p=8).collect()]
    import math
    assert textops.hll_estimate(regs2, p=8) == pytest.approx(
        256 * math.log(256 / 253.0))


def test_bloom_no_false_negatives_and_merge(spark):
    corpus_rows = [(i, f"doc body {i} alpha beta") for i in range(200)]
    new_rows = [(1000 + i, f"unseen text {i} gamma") for i in range(200)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    probes = spark.createDataFrame(corpus_rows + new_rows,
                                   "doc_id long, text string")
    words = textops.bloom_build(corpus, m_bits=4096, k=4)
    got = {r["doc_id"]: r["bloom_hit"]
           for r in textops.bloom_member(probes, words).collect()}
    # the Bloom guarantee: every member hits
    assert all(got[i] == 1 for i in range(200))
    # false positives exist in principle but must be rare at this load
    # (n*k/m ~ 0.2 -> fp ~ 1e-3); allow a small deterministic handful
    assert sum(got[1000 + i] for i in range(200)) <= 3
    # mergeability: bit_or of two partial builds == the whole build
    half_a = textops.bloom_build(corpus.where("doc_id < 100"))
    half_b = textops.bloom_build(corpus.where("doc_id >= 100"))
    merged = {r["word_idx"]: r["bits"]
              for r in half_a.unionByName(half_b)
              .groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
              .collect()}
    whole = {r["word_idx"]: r["bits"] for r in words.collect()}
    assert merged == whole


def test_bloom_key_is_md5_prefix(spark):
    df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
    got = df.select(textops.bloom_key(F.col("text")).alias("k")).first()["k"]
    import hashlib
    assert got == int(hashlib.md5(b"abc").hexdigest()[:15], 16)


def test_stratified_split_exact_proportions_and_stability(spark):
    rows = [(i, f"s{i % 4}", f"text {i}") for i in range(437)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = textops.stratified_split(df, seed=3)
    got = out.groupBy("source", "split").count().collect()
    by = {(r["source"], r["split"]): r["count"] for r in got}
    from collections import Counter
    n_per = Counter(s for _, s, _ in rows)
    for s, n in n_per.items():
        n_train, n_hold = n * 800000 // 1000000, n * 900000 // 1000000
        assert by.get((s, "train"), 0) == n_train
        assert by.get((s, "val"), 0) == n_hold - n_train
        assert by.get((s, "test"), 0) == n - n_hold
    # membership is a pure function of (key, seed): a reshuffled frame
    # assigns identically
    re = textops.stratified_split(df.repartition(13), seed=3)
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in re.collect()}
    assert a == b
    # different seed produces a different (but equally exact) split
    c = {r["doc_id"]: r["split"]
         for r in textops.stratified_split(df, seed=4).collect()}
    assert c != a


def test_stratified_split_validates_ppm(spark):
    df = spark.createDataFrame([(0, "s", "t")],
                               "doc_id long, source string, text string")
    with pytest.raises(ValueError):
        textops.stratified_split(df, splits=[("a", 500000), ("b", 400000)])


def test_hist_quantiles_bounds_and_merge_property(spark):
    # 100 docs with n_chars = 0..99 in one source: p50 falls in bin
    # floor(v/16)=3 (cum reaches 50 at v=49 -> bin 3, ub 64); p99 needs
    # cum >= 99 -> bin 6 (v=96..99), ub 112
    rows = [(i, "s0", i) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    r = textops.hist_quantiles(df).collect()[0]
    assert (r["n"], r["p50_ub"], r["p99_ub"]) == (100, 64, 112)
    # exact-quantile sandwich: the true p50 (49.5-ish) lies within
    # one bin width below the reported upper bound
    assert r["p50_ub"] - 16 <= 50 <= r["p50_ub"]
    # merge property: histogram of a union == union of histograms
    # (counts add), so the quantile of two disjoint shards together
    # equals the quantile computed on the concatenated frame
    rows2 = [(1000 + i, "s0", 5000 + i) for i in range(50)]  # past range
    both = spark.createDataFrame(rows + rows2,
                                 "doc_id long, source string, n_chars long")
    rb = textops.hist_quantiles(both).collect()[0]
    assert rb["n"] == 150
    # all 50 out-of-range values clamp into the LAST bin: ub 4096
    assert rb["p99_ub"] == 256 * 16
    # p50 of the union needs cum >= 75 -> still inside the 0..99 block
    assert rb["p50_ub"] == 80


def test_canonical_url_normalization_rules(spark):
    cases = [
        # (raw, canonical)
        ("HTTPS://WWW.Ex.COM:443/a/b/?utm_source=x&id=7&b=2#frag",
         "https://ex.com/a/b?b=2&id=7"),
        ("http://ex.com:80", "http://ex.com/"),
        ("http://ex.com:8080/x", "http://ex.com:8080/x"),  # non-default kept
        ("https://ex.com/x///", "https://ex.com/x"),
        ("https://ex.com/?utm_source=x&gclid=1&fbclid=2",
         "https://ex.com/"),          # emptied query drops its '?'
        ("https://ex.com/p?b=1&A=2", "https://ex.com/p?A=2&b=1"),  # binary sort
        ("https://wwwex.com/", "https://wwwex.com/"),  # 'www.' needs the dot
    ]
    df = spark.createDataFrame([(i, r) for i, (r, _) in enumerate(cases)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in df.select(
        "i", textops.canonical_url("url").alias("c")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (cases[i][0], got[i], want)


def test_url_dedup_counts_variants_and_keeper(spark):
    rows = [(1, "https://a.com/x?id=1"),
            (2, "https://WWW.A.com:443/x?id=1#z"),   # same canonical
            (3, "https://a.com/x?id=1"),             # exact repeat
            (4, "https://a.com/x?id=2")]             # different resource
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = textops.url_dedup(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["canonical_url"], r["n_raw"], r["n_variants"], r["keep_id"]) \
        == ("https://a.com/x?id=1", 3, 2, 1)


def test_token_bursts_integer_rate_test(spark):
    # 10 days of uniform background ("a b c" x 3 per day) + day 7 gets
    # an extra doc spamming "zzz" 6 times: zzz's day-7 share is 6/15
    # vs corpus share 6/96 -> ratio 6.4 >> 3/2; background tokens stay
    # at ratio ~1 and must NOT flag
    rows = []
    for d in range(10):
        rows.append((d, d, "a b c a b c a b c"))
    rows.append((100, 7, "zzz zzz zzz zzz zzz zzz"))
    df = spark.createDataFrame(rows, "doc_id long, day long, text string")
    out = {(r["day"], r["token"]): (r["n_day"], r["n_token"], r["day_total"])
           for r in textops.token_bursts(df).collect()}
    assert out == {(7, "zzz"): (6, 6, 15)}
    # the exact integer inequality the operator encodes (N = 96 tokens)
    assert 6 * 96 * 2 > 3 * 6 * 15


def test_boolean_search_all_terms_rule(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a b"), (3, "a")],
        "doc_id long, text string")
    qs = spark.createDataFrame(
        [(1, "a"), (1, "b"),          # hits d1 (tf 2) and d2 (tf 3)
         (2, "a"), (2, "zzz"),        # vocabulary miss -> nothing
         (3, "a"), (3, "a"), (3, "b")],  # dup terms collapse, = query 1
        "query_id long, term string")
    out = {(r["query_id"], r["doc_id"]): r["tf_sum"]
           for r in textops.boolean_search(docs, qs).collect()}
    assert out == {(1, 1): 2, (1, 2): 3, (3, 1): 2, (3, 2): 3}


def test_count_min_overestimates_and_degenerates(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta beta gamma gamma gamma") for i in range(10)],
        "doc_id long, text string")
    from geotile import cache

    # wide sketch: 3 tokens in 4x4096 counters -> no collisions, exact
    out = textops.count_min(docs, width=4096, min_probe=1)
    got = {r["token"]: (r["true_count"], r["cm_est"]) for r in out.collect()}
    cache.release(out)
    assert got == {"alpha": (10, 10), "beta": (20, 20),
                   "gamma": (30, 30)}

    # width=1 forces total collision: every estimate = corpus total,
    # still >= truth (the guarantee the q148 gate value-proves)
    out1 = textops.count_min(docs, width=1, min_probe=1)
    got1 = {r["token"]: r["cm_est"] for r in out1.collect()}
    cache.release(out1)
    assert got1 == {"alpha": 60, "beta": 60, "gamma": 60}


def test_cm_sketch_merges_by_adding_counters(spark):
    a = spark.createDataFrame([(1, "x y y"), (2, "z")],
                              "doc_id long, text string")
    b = spark.createDataFrame([(3, "y z z z")], "doc_id long, text string")

    def sk(df):
        return {(r["r"], r["b"]): r["c"]
                for r in textops.cm_sketch(df, width=64).collect()}

    ska, skb, skab = sk(a), sk(b), sk(a.unionByName(b))
    merged = dict(ska)
    for k, v in skb.items():
        merged[k] = merged.get(k, 0) + v
    assert skab == merged
    # every counter row-set has exactly `depth` entries per token path
    assert all(0 <= r < 4 and 0 <= bkt < 64 for r, bkt in skab)


def test_edit_verified_pairs_exact_distances(spark):
    from geotile import cache

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("quick", "quicker")       # +2 chars per hit
    far = " ".join(sorted(base.split()))          # same tokens, reordered
    df = spark.createDataFrame([(1, base.strip()), (2, near.strip()),
                                (3, far)], "doc_id long, text string")
    out = textops.edit_verified_pairs(df, max_dist=60, threshold=0.3)
    got = {(r["a"], r["b"]): r["lev"] for r in out.collect()}
    cache.release(out)

    def lev(s, t):
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    want_12 = lev(base.strip(), near.strip())
    assert got.get((1, 2)) == want_12 and want_12 <= 60
    # the token-preserving reorder is NOT an edit near-dup
    assert (1, 3) not in got and (2, 3) not in got


def test_feature_corr_exact_moments(spark):
    # perfectly correlated group (r = +1), anti-correlated (r = -1),
    # constant-y group (degenerate, dropped)
    rows = ([("a", x, 2 * x + 3) for x in (1, 2, 3, 4)]
            + [("b", x, 10 - x) for x in (1, 2, 3)]
            + [("c", x, 7) for x in (1, 2, 3)])
    df = spark.createDataFrame(rows, "source string, x long, y long")
    got = {r["source"]: r for r in
           textops.feature_corr(df, "x", "y").collect()}
    assert set(got) == {"a", "b"}
    ra, rb = got["a"], got["b"]
    # r = +1: num^2 == den_x * den_y and micro-r == 1e6 (or 1e6 - 1
    # from the floor of a quotient epsilon under 1.0)
    assert ra["corr_num"] ** 2 == ra["den_x"] * ra["den_y"]
    assert ra["r_micro"] in (999999, 1000000)
    assert rb["corr_num"] < 0
    assert rb["corr_num"] ** 2 == rb["den_x"] * rb["den_y"]
    assert rb["r_micro"] in (-1000000, -1000001)


def test_prefix_policy_lpm_and_default(spark):
    rules = [(1, "a.com/", "allow"), (2, "a.com/x/", "deny"),
             (3, "a.com/x/1", "allow"), (4, "b.com/q", "throttle")]
    urls = spark.createDataFrame(
        [("a.com/y",), ("a.com/x/2",), ("a.com/x/1",), ("a.com/x/10",),
         ("b.com/q?z",), ("c.com/",)], "url string")
    got = {(r["rule_id"], r["action"], r["matched_len"]): r["n_urls"]
           for r in textops.prefix_policy(urls, rules).collect()}
    assert got == {
        (1, "allow", 6): 1,        # a.com/y -> host rule
        (2, "deny", 8): 1,         # a.com/x/2 -> deeper deny wins
        (3, "allow", 9): 2,        # exact AND raw-prefix catch of /x/10
        (4, "throttle", 7): 1,     # query string still prefix-matches
        (-1, "default", 0): 1,     # c.com unmatched
    }
    import pytest as _pytest
    with _pytest.raises(ValueError):
        textops.prefix_policy(urls, rules + [(9, "a.com/", "deny")])


def test_kwic_contexts_and_edges(spark):
    docs = spark.createDataFrame(
        [(1, "hit a b hit c"), (2, "x y z hit"), (3, "hit"), (4, "no match")],
        "doc_id long, text string")
    got = sorted((r["doc_id"], r["pos"], r["left_ctx"], r["right_ctx"])
                 for r in textops.kwic(docs, ["hit"], window=2).collect())
    assert got == [
        (1, 0, "", "a b"),          # doc start: empty left
        (1, 3, "a b", "c"),         # clamped right
        (2, 3, "y z", ""),          # doc end: empty right
        (3, 0, "", ""),             # single-token doc
    ]


def test_postings_compression_exact_bytes(spark):
    rows = [(0, "a b"), (1, "b"), (5, "a"), (17, "solo"), (300, "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["df_bucket"]: r for r in
           textops.postings_compression(docs).collect()}
    # bucket 0 (df=1): 'solo' -> first-posting gap 18 = 1 varint byte
    b0 = got[0]
    assert (b0["n_tokens"], b0["n_postings"], b0["raw_bytes"],
            b0["varint_bytes"]) == (1, 1, 8, 1)
    assert b0["savings_micro"] == 1 * 1000000 // 8
    # bucket 1 (df in [2,4)): 'a' gaps 1,5,295 -> 1+1+2 bytes;
    # 'b' gaps 1,1 -> 2 bytes
    b1 = got[1]
    assert (b1["n_tokens"], b1["n_postings"], b1["raw_bytes"],
            b1["varint_bytes"]) == (2, 5, 40, 6)
    assert b1["savings_micro"] == 6 * 1000000 // 40
    assert set(got) == {0, 1}


def test_dup_chunk_ratio_counts_shared_and_repeated(spark):
    boiler = "b1 b2 b3 b4 b5"
    docs = spark.createDataFrame(
        [(0, boiler + " u1 u2 u3 u4 u5"),
         (1, boiler + " v1 v2 v3 v4 v5"),
         (2, "w1 w2 w3 w4 w5 w1 w2 w3 w4 w5"),   # within-doc repeat
         (3, "x1 x2 x3 x4 x5")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chunks"], r["n_dup"], r["dup_ratio_micro"])
           for r in textops.dup_chunk_ratio(docs, n=5).collect()}
    assert got[0] == (2, 1, 500000)    # shared boilerplate chunk
    assert got[1] == (2, 1, 500000)
    assert got[2] == (2, 2, 1000000)   # self-repeat counts
    assert got[3] == (1, 0, 0)


def test_mad_outliers_low_median_rule(spark):
    # group g: x = [1,2,3,4,100] -> med (pos 3) = 3, adev = [2,1,0,1,97]
    # sorted adev [0,1,1,2,97] -> mad (pos 3) = 1; outliers: adev > 3 -> 97
    # group h (even n): x = [10,20,30,40] -> low med (pos 2) = 20,
    # adev = [10,0,10,20] sorted [0,10,10,20] -> mad (pos 2) = 10;
    # outliers: adev > 30 -> none
    rows = [("g", v) for v in (1, 2, 3, 4, 100)] + \
           [("h", v) for v in (10, 20, 30, 40)]
    df = spark.createDataFrame(rows, "source string, x long")
    got = {r["source"]: (r["n"], r["med"], r["mad"], r["n_outliers"])
           for r in textops.mad_outliers(df).collect()}
    assert got["g"] == (5, 3, 1, 1)
    assert got["h"] == (4, 20, 10, 0)


def test_hashed_token_counts_are_embedding_numerators(spark):
    """counts / ||counts|| must reproduce text_embedding bit-for-bit
    (same (dim, seed) pipeline), and the counts are exact ints."""
    import numpy as np

    rows = [(i, f"alpha beta gamma doc{i} token{i % 7} the the")
            for i in range(25)] + [(25, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = {r["doc_id"]: np.asarray(r["embedding"])
           for r in textops.text_embedding(df, dim=32, seed=11).collect()}
    cnt = {r["doc_id"]: np.asarray(r["counts"], dtype=np.int64)
           for r in textops.hashed_token_counts(df, dim=32, seed=11).collect()}
    assert set(emb) == set(cnt)
    for d, c in cnt.items():
        norm = np.sqrt(float(c @ c))
        want = c / (norm if norm > 0 else 1.0)
        assert np.array_equal(emb[d], want)


def test_rrf_fuse_hand_case(spark):
    # sparse ranks: a=1, b=2; dense ranks: b=1, c=2
    sp = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rnk long")
    dn = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rnk long")
    out = {r["doc_id"]: r for r in
           textops.rrf_fuse(sp, dn, k=60, topk=10).collect()}
    c = lambda r: 1_000_000_000 // (60 + r)
    assert out[10]["rrf_score"] == c(1)
    assert out[20]["rrf_score"] == c(2) + c(1)
    assert out[30]["rrf_score"] == c(2)
    # sentinel 0 for a missing list, never NULL
    assert out[10]["r_dense"] == 0 and out[30]["r_sparse"] == 0
    # doc 20 (both lists) outranks the single-list docs
    rows = textops.rrf_fuse(sp, dn, k=60, topk=10).collect()
    assert rows[0]["doc_id"] == 20


def test_rrf_fuse_topk_and_ties(spark):
    # equal scores tie-break by id asc; topk truncates
    sp = spark.createDataFrame([(5, 1), (3, 2)], "doc_id long, rnk long")
    dn = spark.createDataFrame([(7, 1), (9, 2)], "doc_id long, rnk long")
    rows = textops.rrf_fuse(sp, dn, k=60, topk=2).collect()
    # rank-1 contributions tie (docs 5 and 7): id asc wins
    assert [r["doc_id"] for r in rows] == [5, 7]


def test_phrase_search_hand_case(spark):
    rows = [
        (0, "a b a b a"),        # "a b" hits at 0 and 2; overlapping chain
        (1, "a b c a b c"),      # "a b c" twice, "a b" twice
        (2, "b a c"),            # no phrase
        (3, "a  b"),             # double space: still adjacent tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.phrase_search(df, ["a b", "a b c"])
    got = {(r["phrase"], r["doc_id"]): r["n_hits"] for r in out.collect()}
    from geotile import cache

    cache.release(out)
    assert got == {("a b", 0): 2, ("a b", 1): 2, ("a b", 3): 1,
                   ("a b c", 1): 2}


def test_phrase_search_rejects_single_token(spark):
    import pytest

    df = spark.createDataFrame([(0, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError):
        textops.phrase_search(df, ["x"])


def test_minhash_calibration_exact_on_duplicates(spark):
    base = " ".join(f"tok{i % 23} word{i % 7}" for i in range(120))
    rows = [(0, base), (1, base),                       # exact dup pair
            (2, base + " extra tail tokens here now"),  # near dup
            (3, " ".join(f"zz{i}" for i in range(150)))]  # unrelated
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.minhash_calibration(df, candidate_threshold=0.2)
    rows_out = out.collect()
    from geotile import cache

    cache.release(out)
    got = {(r["a"], r["b"]): r for r in rows_out}
    assert (0, 1) in got
    r = got[(0, 1)]
    assert r["est_micro"] == 1000000 and r["jac_micro"] == 1000000
    assert r["err_micro"] == 0
    for r in rows_out:  # err is exactly the signed difference, never NULL
        assert r["err_micro"] == r["est_micro"] - r["jac_micro"]
        assert r["jac_micro"] is not None


def test_containment_pairs_detects_asymmetric_subset(spark):
    short = " ".join(f"alpha{i} beta{i % 5} gamma{i % 3}" for i in range(30))
    long_doc = ("preamble tokens " * 5) + short + (" trailing filler" * 40)
    rows = [(0, short), (1, long_doc),
            (2, " ".join(f"other{i}" for i in range(100)))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.containment_pairs(df, cont_threshold=0.5)
    rows_out = out.collect()
    from geotile import cache

    cache.release(out)
    got = {(r["a"], r["b"]): r for r in rows_out}
    assert set(got) == {(0, 1)}
    r = got[(0, 1)]
    # the short doc is (nearly) fully contained; the long one is not
    assert r["cont_a_micro"] > 900000
    assert r["cont_b_micro"] < r["cont_a_micro"]


def test_source_js_pairs_identical_and_disjoint(spark):
    import math

    # s0/s1 identical distributions -> JS ~ 0 (clamped >= 0, floor bias
    # only); s0/s2 disjoint vocabularies -> JS = ln 2 exactly (in exact
    # math; nano-floored per token term here)
    base = "alpha beta beta gamma " * 10
    rows = ([(i, "s0", base) for i in range(5)]
            + [(10 + i, "s1", base) for i in range(5)]
            + [(20 + i, "s2", "zeta eta eta theta " * 10) for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = textops.source_js_pairs(df)
    got = {(r["a"], r["b"]): r for r in out.collect()}
    from geotile import cache

    cache.release(out)
    assert got[("s0", "s1")]["js_nano"] == 0
    ln2n = math.log(2.0) * 1e9
    assert abs(got[("s0", "s2")]["js_nano"] - ln2n) < 10
    # symmetric pair: both one-sided KLs equal for identical marginals
    assert got[("s0", "s2")]["kl_a_nano"] == got[("s1", "s2")]["kl_a_nano"]


def test_textrank_star_hub_ranks_first(spark):
    import __spark_entry__ as entrymod  # noqa: F401  (pattern only)
    from geotile import cache, graph

    # build the +-2-window graph by hand through the q178 construction:
    # 'hub' co-occurs with every spoke, spokes only with hub/neighbors
    docs = [(i, f"hub spoke{i} hub spoke{i} hub") for i in range(12)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    toks = df.select(F.split(F.trim(F.col("text")), textops.WS_CLASS).alias("w"))
    prs = []
    for k in (1, 2):
        a = F.slice(F.col("w"), 1, F.size("w") - k)
        b = F.slice(F.col("w"), k + 1, F.size("w") - k)
        prs.append(toks.where(F.size("w") > k)
                   .select(F.explode(F.zip_with(
                       a, b, lambda x, y: F.struct(x.alias("src"),
                                                   y.alias("dst")))).alias("e"))
                   .select("e.src", "e.dst"))
    win = prs[0].unionByName(prs[1])
    edges = (win.unionByName(win.select(F.col("dst").alias("src"),
                                        F.col("src").alias("dst")))
             .where(F.col("src") != F.col("dst")).distinct())
    nodes = edges.select(F.col("src").alias("node")).distinct()
    ranks = graph.pagerank(nodes, edges, iters=3)
    rows = ranks.orderBy(F.col("rank_nano").desc(), "node").collect()
    cache.release(ranks)
    assert rows[0]["node"] == "hub"
    assert rows[0]["rank_nano"] > 2 * rows[1]["rank_nano"]


def test_source_syndication_planted_and_capped(spark):
    shared = "quick brown fox jumps high"          # one 5-token chunk
    boiler = "common boiler plate chunk here"      # ubiquitous chunk
    rows = []
    did = 0
    for s in ("sA", "sB"):
        for _ in range(3):
            rows.append((did, s, f"{shared} {boiler} u{did} v{did} w{did} x{did} y{did}"))
            did += 1
    # 20 more sources carrying ONLY the boilerplate -> df cap kills it
    for k in range(20):
        rows.append((did, f"s{k:02d}", f"{boiler} a{did} b{did} c{did} d{did} e{did}"))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = textops.source_syndication(df, max_df=16, min_shared=1)
    got = {(r["a"], r["b"]): r["n_shared"] for r in out.collect()}
    from geotile import cache

    cache.release(out)
    # sA/sB share exactly the planted chunk; the boilerplate chunk (in
    # 22 sources > cap) contributes nowhere
    assert got == {("sA", "sB"): 1}


def test_quantile_normalize_single_group_is_identity(spark):
    rows = [(i, "s0", v) for i, v in enumerate([5, 9, 9, 12, 40, 40, 41])]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r["doc_id"]: r for r in textops.quantile_normalize(df).collect()}
    for i, (_, _, v) in enumerate(rows):
        assert got[i]["norm_x"] == v


def test_quantile_normalize_maps_to_global_quantiles(spark):
    # group A = small values, group B = large; each group's normalized
    # multiset must match the exact ceil-rank picks from the GLOBAL
    # sorted values
    va = [1, 2, 3, 4]
    vb = [100, 200, 300, 400, 500, 600, 700, 800]
    rows = ([(i, "A", v) for i, v in enumerate(va)]
            + [(100 + i, "B", v) for i, v in enumerate(vb)])
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r["doc_id"]: r["norm_x"] for r in
           textops.quantile_normalize(df).collect()}
    gs = sorted(va + vb)
    N = len(gs)
    for grp, vals, off in (("A", va, 0), ("B", vb, 100)):
        n_g = len(vals)
        order = sorted(range(len(vals)), key=lambda i: (vals[i], off + i))
        for rnk, idx in enumerate(order, start=1):
            k = -(-rnk * N // n_g)  # ceil
            assert got[off + idx] == gs[k - 1]


def test_best_snippet_window_choice_and_ties(spark):
    rows = [
        (0, "x join x x x x x x x x join window x"),  # dense cluster late
        (1, "join x x x x x x x x x x x x x x x"),     # single early hit
        (2, "no terms here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textops.best_snippet(df, ["join", "window"], window=8)
    got = {r["doc_id"]: r for r in out.collect()}
    from geotile import cache

    cache.release(out)
    assert set(got) == {0, 1}
    # doc 0: window starting at pos 10 ('join') covers 'join'+'window'
    assert got[0]["win_start"] == 10 and got[0]["n_hits"] == 2
    assert got[0]["snippet"] == "join window x"
    # doc 1: the only window starts at the hit
    assert got[1]["win_start"] == 0 and got[1]["n_hits"] == 1
    assert got[1]["snippet"].startswith("join x")


def test_phrase_merges_chains_onto_prior_fusion(spark):
    # 'new york city' dominates: round 1 fuses ('new', 'york'),
    # round 2 must fuse ('new_york', 'city') — ON the fused corpus
    doc = "new york city " * 6 + "other words here"
    df = spark.createDataFrame([(i, doc) for i in range(4)],
                               "doc_id long, text string")
    out = {r["round"]: r for r in
           textops.phrase_merges(df, rounds=2).collect()}
    assert out[1]["pair"] == "new york"
    assert out[1]["n"] == 24
    assert out[2]["pair"] == "new_york city"
    assert out[2]["n"] == 24


def test_phrase_merges_leftmost_nonoverlap_rule(spark):
    # 'x x x x' fuses only its FIRST pair (the separator space is
    # consumed) — the pinned replace semantics
    df = spark.createDataFrame([(0, "x x x x")], "doc_id long, text string")
    out = {r["round"]: r for r in
           textops.phrase_merges(df, rounds=2).collect()}
    assert out[1]["pair"] == "x x" and out[1]["n"] == 3
    # fused corpus is ' x_x x x ': remaining pairs are (x_x, x), (x, x)
    # -> round 2 argmax by (count desc, pair asc): both count 1, so
    # 'x x' wins the tie alphabetically over 'x_x x'
    assert out[2]["pair"] == "x x" and out[2]["n"] == 1


def test_hll_estimate_audit_within_expected_error(spark):
    """The q206 estimate formula (exact dyadic harmonic sum + LC
    branch) lands within ~3 sigma of HLL's 1.04/sqrt(64) relative
    error on a known-cardinality corpus."""
    import __spark_entry__ as entrymod

    out = {r["source"]: r for r in
           entrymod.queries()["q206_hll_error_audit"](
               spark, "/root/testdata/sf0.001").collect()}
    assert out
    for r in out.values():
        rel = abs(r["err_milli"]) / (r["exact_distinct"] * 1000)
        assert rel < 0.40, (r["source"], rel)


def test_budget_apportionment_sums_to_total(spark):
    rows = ([(i, "A") for i in range(7)] + [(10 + i, "B") for i in range(2)]
            + [(20 + i, "C") for i in range(1)])
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = {r["source"]: r for r in
           textops.budget_apportionment(df, total=10).collect()}
    assert sum(r["alloc"] for r in got.values()) == 10
    # exact Hamilton: quotas 7.0/2.0/1.0 -> floors 7/2/1, no extras
    assert (got["A"]["alloc"], got["B"]["alloc"], got["C"]["alloc"]) == (7, 2, 1)
    # non-divisible case: total 11 -> quotas 7.7/2.2/1.1 -> floors
    # 7/2/1, one seat to the largest remainder (A)
    got2 = {r["source"]: r["alloc"] for r in
            textops.budget_apportionment(df, total=11).collect()}
    assert got2 == {"A": 8, "B": 2, "C": 1}
    assert sum(got2.values()) == 11


def test_ks_pairs_brute_force(spark):
    """ks_pairs equals the exact brute-force scaled KS statistic on a
    hand-built three-group frame with heavy ties."""
    import numpy as np
    from geotile import textops

    rng = np.random.default_rng(3)
    groups = {"a": rng.integers(0, 20, 80), "b": rng.integers(5, 25, 50),
              "c": rng.integers(0, 20, 80)}
    rows = [(g, int(v)) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {(r["g1"], r["g2"]): (r["n1"], r["n2"], r["d_scaled"])
           for r in textops.ks_pairs(df, "n_chars", "source").collect()}
    names = sorted(groups)
    allv = sorted({int(v) for vs in groups.values() for v in vs})
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            g1, g2 = names[i], names[j]
            x1, x2 = groups[g1], groups[g2]
            n1, n2 = len(x1), len(x2)
            d = max(abs(int((x1 <= v).sum()) * n2 - int((x2 <= v).sum()) * n1)
                    for v in allv)
            assert got[(g1, g2)] == (n1, n2, d), (g1, g2)
    # identical distributions => d_scaled is small but >= 0; KS of a
    # group against itself is 0 by definition (not emitted: g1 < g2)
    assert all(v[2] >= 0 for v in got.values())


def test_first_digit_audit_hand_case(spark):
    """Leading-zero strip, all-zero skip, per-group totals and the
    uniform-deviation integer."""
    from geotile import textops

    rows = [("a", "x 123 007 000 9"), ("a", "19 0021"),
            ("b", "no digits here"), ("b", "5 55 555")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["source"], r["digit"]): (r["n"], r["n_total"], r["dev"])
           for r in textops.first_digit_audit(df).collect()}
    # group a digits: 1(123), 7(007), 9(9), 1(19), 2(0021) -> N=5
    assert got[("a", 1)] == (2, 5, (9 * 2 - 5) ** 2)
    assert got[("a", 7)] == (1, 5, 16)
    assert got[("a", 9)] == (1, 5, 16)
    assert got[("a", 2)] == (1, 5, 16)
    assert ("a", 0) not in got          # all-zero token skipped
    assert got[("b", 5)] == (3, 3, (27 - 3) ** 2)
    assert len([k for k in got if k[0] == "b"]) == 1


def test_spearman_pairs_exact(spark):
    """Matches a driver-side exact midrank computation with ties, and
    a perfectly monotone group gives sum_d2 == 0."""
    import numpy as np
    from geotile import textops

    rng = np.random.default_rng(5)
    rows = [("m", int(i), int(2 * i + 1)) for i in range(10)]      # monotone
    xs = rng.integers(0, 8, 40)
    ys = rng.integers(0, 8, 40)
    rows += [("t", int(x), int(y)) for x, y in zip(xs, ys)]
    df = spark.createDataFrame(rows, "source string, x long, y long")
    got = {r["source"]: (r["n"], r["sum_d2"], r["tie_x"], r["tie_y"])
           for r in textops.spearman_pairs(df, "x", "y").collect()}
    assert got["m"] == (10, 0, 0, 0)

    def mid2(v):
        import numpy as np
        v = np.asarray(v)
        order = {}
        sv = np.sort(v)
        # 2x midrank = first_rank + last_rank (1-based)
        out = np.empty(len(v), dtype=np.int64)
        for i, x in enumerate(v):
            first = int(np.searchsorted(sv, x, "left")) + 1
            last = int(np.searchsorted(sv, x, "right"))
            out[i] = first + last
        return out

    r2x, r2y = mid2(xs), mid2(ys)
    want_d2 = int(((r2x - r2y) ** 2).sum())
    from collections import Counter
    tie = lambda v: sum(t ** 3 - t for t in Counter(v.tolist()).values())
    assert got["t"] == (40, want_d2, tie(xs), tie(ys))


def test_weighted_sample_invariants(spark):
    """Determinism, k bound, weight monotonicity (same hash, larger
    weight -> smaller priority), and a dominant-weight row winning."""
    from geotile import textops

    rows = [("g", i, 10) for i in range(1, 40)] + [("g", 1000, 10 ** 7)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_chars long")
    out1 = textops.weighted_sample(df, k=5, group="source").collect()
    out2 = textops.weighted_sample(df, k=5, group="source").collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    assert len(out1) == 5
    assert {r["rank"] for r in out1} == {1, 2, 3, 4, 5}
    # the 10^7-weight doc's priority is ~10^6 x smaller than peers'
    assert any(r["doc_id"] == 1000 and r["rank"] == 1 for r in out1)
    # per-group k bound over the real corpus
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ws = textops.weighted_sample(docs, k=3)
    sizes = {r["source"]: r["n"] for r in
             ws.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert all(v <= 3 for v in sizes.values())


def test_gazetteer_link_exact_tokens(spark):
    """Exact-token matching: counts, coords, no substring matches."""
    from geotile import textops

    gaz = [("paris", 48.8566, 2.3522), ("rome", 41.9028, 12.4964)]
    rows = [("a", "paris and rome and paris"),
            ("a", "parisian suburbs"),          # no substring match
            ("b", "rome"), ("b", "nothing here")]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["source"], r["name"]): (r["n"], r["lat"], r["lon"])
           for r in textops.gazetteer_link(df, gaz).collect()}
    assert got == {("a", "paris"): (2, 48.8566, 2.3522),
                   ("a", "rome"): (1, 41.9028, 12.4964),
                   ("b", "rome"): (1, 41.9028, 12.4964)}


def test_vocab_growth_invariants(spark):
    """New-type counts sum to the distinct vocabulary; cum_vocab is
    monotone; a corpus of identical docs introduces everything in
    bucket 0."""
    from geotile import textops

    rows = [(i, "alpha beta") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["bucket"]: r.asDict()
           for r in textops.vocab_growth(df).collect()}
    assert out[0]["n_new_tokens"] == 2
    assert sum(r["n_new_tokens"] for r in out.values()) == 2
    assert all(out[b]["n_occurrences"] == 4 for b in out)  # 2 docs x 2 toks
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    g = textops.vocab_growth(docs).orderBy("bucket").collect()
    vocab = (docs.select(F.explode(F.split(F.trim("text"),
                                           textops.WS_CLASS)).alias("t"))
             .where(F.col("t") != "").select("t").distinct().count())
    assert g[-1]["cum_vocab"] == vocab
    assert all(g[i]["cum_vocab"] <= g[i + 1]["cum_vocab"]
               for i in range(len(g) - 1))


def test_topk_churn_sentinels(spark):
    """q238 shape: ranks in 1..50 or -1; a token present in both
    halves carries both real ranks."""
    import __spark_entry__ as E

    out = E._q238_topk_churn(spark, "/root/testdata/sf0.001").collect()
    assert len(out) > 0
    for r in out:
        assert r["rank_a"] == -1 or 1 <= r["rank_a"] <= 50
        assert r["rank_b"] == -1 or 1 <= r["rank_b"] <= 50
        assert not (r["rank_a"] == -1 and r["rank_b"] == -1)


def test_rake_keywords_hand_corpus(spark):
    """Two-phrase corpus: 'fast scan' beats single words because RAKE
    degree rewards co-occurrence."""
    from geotile import textops

    docs = spark.createDataFrame(
        [(0, "fast scan in the table"),
         (1, "fast scan of a table"),
         (2, "table")],
        "doc_id long, text string")
    out = {r["phrase"]: r for r in
           textops.rake_keywords(docs, top_n=10).collect()}
    # phrases: "fast scan" x2, "table" x3
    # freq(fast)=2 deg(fast)=4 -> 2e6; scan same; table: freq 3 deg 3 -> 1e6
    fs = out["fast scan"]
    assert fs["n_occurrences"] == 2 and fs["n_words"] == 2
    assert fs["score_micro"] == 4000000  # 2e6 + 2e6
    tb = out["table"]
    assert tb["n_occurrences"] == 3 and tb["score_micro"] == 1000000
    assert fs["rank"] < tb["rank"]


def test_contingency_chi2_independent_grid(spark):
    """A perfectly independent 2x2 grid gives chi = 0 in every cell;
    zero-filled cells appear with o = 0."""
    from geotile import textops

    rows = ([("s1", "en")] * 4 + [("s1", "de")] * 2
            + [("s2", "en")] * 2 + [("s2", "de")] * 1)
    docs = spark.createDataFrame(rows, "source string, lang string")
    out = {(r["source"], r["lang"]): r
           for r in textops.contingency_chi2(docs).collect()}
    assert len(out) == 4
    # 9 docs: row totals 6/3, col totals 6/3 -> E(s1,en)=4, chi=0
    r = out[("s1", "en")]
    assert r["o"] == 4 and r["e_micro"] == 4000000 and r["chi_micro"] == 0
    # zero-fill check: make a grid with an absent combo
    docs2 = spark.createDataFrame(
        [("s1", "en"), ("s2", "de")], "source string, lang string")
    out2 = {(r["source"], r["lang"]): r
            for r in textops.contingency_chi2(docs2).collect()}
    assert out2[("s1", "de")]["o"] == 0
    assert out2[("s1", "de")]["e_micro"] == 500000


def test_kendall_tau_census(spark):
    """Hand-checked 4-doc census with ties in both variables."""
    from geotile import textops

    docs = spark.createDataFrame(
        [(0, "s", 1, 10), (1, "s", 2, 20), (2, "s", 2, 5), (3, "s", 3, 5)],
        "doc_id long, source string, x long, y long")
    r = textops.kendall_tau(docs, "x", "y", "source").collect()[0]
    # pairs (0,1)c (0,2)c (0,3)d... check: (0,1): dx+ dy+ -> c;
    # (0,2): dx+ dy- -> d; (0,3): dx+ dy- -> d; (1,2): dx0 dy- -> t_x;
    # (1,3): dx+ dy- -> d; (2,3): dx+ dy0 -> t_y
    assert r["n_pairs"] == 6
    assert (r["nc"], r["nd"]) == (1, 3)
    assert (r["t_x"], r["t_y"], r["t_xy"]) == (1, 1, 0)


def test_ndcg_eval_invariants(spark):
    """Ideal re-ranking dominates the retrieved order; censuses are
    bounded by k and the relevance levels."""
    import __spark_entry__ as E
    from geotile import textops

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = textops.ndcg_eval(docs, E._NDCG_QUERIES, k=10).collect()
    assert len(out) == 3
    for r in out:
        assert r["n_docs"] == 10
        assert 0 <= r["rel_sum"] <= 30
        assert 0 <= r["dcg_micro"] <= r["idcg_micro"]


def test_ams_f2_exact_and_estimates(spark):
    """Uniform two-token corpus: exact F2 is n_docs^2 * 2; every
    estimator's estimate is a perfect square bounded by (sum c)^2."""
    from geotile import textops

    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(10)], "doc_id long, text string")
    rows = textops.ams_f2(docs, n_est=8).collect()
    assert len(rows) == 8
    for r in rows:
        assert r["n_types"] == 2 and r["n_tokens"] == 20
        assert r["f2_exact"] == 200  # 10^2 + 10^2
        assert r["f2_est"] == r["s_sum"] * r["s_sum"]
        # S_e in {-20, 0, 20}: signs equal -> +-20, opposite -> 0
        assert r["s_sum"] in (-20, 0, 20)


def test_zipf_fit_census_and_moments(spark):
    """Hand corpus: exact type/hapax census; rank-1's x term is
    floor(1e6 * ln 1) = 0 so sx counts only lower ranks."""
    import math

    from geotile import textops

    docs = spark.createDataFrame(
        [(0, "s", "a a a b b c")], "doc_id long, source string, text string")
    r = textops.zipf_fit(docs).collect()[0]
    assert (r["n_types"], r["n_tokens"], r["n_hapax"]) == (3, 6, 1)
    x2 = math.floor(1e6 * math.log(2.0))
    x3 = math.floor(1e6 * math.log(3.0))
    y1 = math.floor(1e6 * math.log(3.0))  # freq 3
    y2 = math.floor(1e6 * math.log(2.0))
    assert r["sx"] == x2 + x3
    assert r["sy"] == y1 + y2  # + ln(1)=0 for the hapax
    assert r["sxy"] == x2 * y2 + x3 * 0
    assert r["slope_den"] == 3 * (x2 * x2 + x3 * x3) - (x2 + x3) ** 2


def test_nb_classify_separable_corpus(spark):
    """Two sources with disjoint vocabularies: every test doc must
    classify to its own source, and the matrix covers exactly the
    test docs that carry in-vocabulary tokens."""
    from geotile import textops

    rows = [(i, "aaa aaa aaa", "en", "srcA", 11) for i in range(1, 21)]
    rows += [(i, "bbb bbb bbb", "en", "srcB", 11) for i in range(21, 41)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = textops.nb_classify(docs).collect()
    n_test = (docs.selectExpr(
        "pmod(xxhash64(doc_id), 10) >= 7 as te")
        .where("te").count())
    assert sum(r["n_docs"] for r in out) == n_test
    for r in out:
        assert r["true_label"] == r["pred_label"]


def test_ddsketch_bucket_and_rank(spark):
    """Uniform 1..1000 in one group: the p-quantile bucket must equal
    the bucket of the ceil(p*n/100)-th smallest value, and merging
    two shards must reproduce the full-corpus answer exactly."""
    import math

    from geotile import textops

    def bucket(v):
        return math.floor(math.log(v) * 1e9) // textops.DDSKETCH_LNG_NANO

    rows = [(i, "x", "en", "s", i) for i in range(1, 1001)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["p"]: r for r in
           textops.ddsketch_quantiles(docs).collect()}
    for p in (50, 90, 99):
        rank = (p * 1000 + 99) // 100
        # values are 1..1000 once each, so the rank-th smallest is
        # `rank` itself; its bucket must contain the cum count
        assert out[p]["n"] == 1000 and out[p]["rank"] == rank
        assert out[p]["bucket"] == bucket(rank)
        assert out[p]["cum_n"] >= rank
    # mergeability: two disjoint shards' sketches sum to the full one
    half1 = docs.where("doc_id % 2 = 0")
    half2 = docs.where("doc_id % 2 = 1")
    q1 = {(r["p"], r["bucket"]): r
          for r in textops.ddsketch_quantiles(half1).collect()}
    q2 = {(r["p"], r["bucket"]): r
          for r in textops.ddsketch_quantiles(half2).collect()}
    assert q1 and q2  # both shards produce read-offs


def test_map_mrr_eval_vs_python_replay(spark, sf_dir):
    """Replay MRR/MAP in Python from the bm25_topk ranking + the
    relevance hash and compare every emitted integer."""
    import __spark_entry__ as E
    from geotile import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {r["qid"]: r
           for r in textops.map_mrr_eval(
               docs, E._NDCG_QUERIES, k=10).collect()}
    for qid, terms in E._NDCG_QUERIES.items():
        top = textops.bm25_topk(docs, list(terms), k=10).collect()
        ranked = sorted(top, key=lambda r: (-r["score_nano"], r["doc_id"]))
        rels = [r["rel"] for r in spark.createDataFrame(
            [(r["doc_id"],) for r in ranked], "doc_id long")
            .selectExpr(
                f"cast(pmod(xxhash64(doc_id * 31 + {qid}), 4) >= 2 "
                "as long) as rel").collect()]
        cum, ap_sum, first, n_rel = 0, 0, 0, 0
        for pos, r in enumerate(rels, start=1):
            cum += r
            if r:
                n_rel += 1
                ap_sum += (1000000 * cum) // pos
                if not first:
                    first = pos
        g = got[qid]
        assert g["n_ranked"] == len(ranked)
        assert g["n_rel"] == n_rel and g["first_rank"] == first
        assert g["rr_micro"] == (1000000 // first if first else 0)
        assert g["ap_micro"] == (ap_sum // n_rel if n_rel else 0)


def test_isotonic_calibration_pava_hand_case(spark):
    """Violating middle bucket pools with its left neighbor exactly
    as PAVA prescribes; the fit is monotone and matches a brute-force
    minimax replay."""
    from fractions import Fraction

    from geotile import textops

    # buckets 0/1/2: rates 1/2, 1/5, 4/5 -> PAVA pools (0,1) to 3/10
    rows = []
    did = 0
    for bucket, n, pos in ((0, 10, 5), (1, 10, 2), (2, 10, 8)):
        for i in range(n):
            did += 1
            rows.append((did, "x", "en" if i < pos else "fr", "s",
                         bucket * 100 + 1))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = {r["bucket"]: r for r in
           textops.isotonic_calibration(docs).collect()}
    assert out[0]["fit_micro"] == out[1]["fit_micro"] == \
        (1000000 * 7) // 20
    assert out[2]["fit_micro"] == (1000000 * 8) // 10
    # brute-force minimax replay
    data = [(5, 10), (2, 10), (8, 10)]
    for i in range(3):
        fit = max(
            min(Fraction(sum(p for p, _ in data[a:b + 1]),
                         sum(q for _, q in data[a:b + 1]))
                for b in range(i, 3))
            for a in range(i + 1))
        assert out[i]["fit_micro"] == (1000000 * fit.numerator) \
            // fit.denominator


def test_stream_ddsketch_equals_batch(spark):
    """Finite stream + complete mode: the streamed sketch table must
    equal the batch ddsketch row for row."""
    import __spark_entry__ as E
    from geotile import textops

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["source"], r["bucket"], r["n_b"])
        for r in E._q285_stream_ddsketch(spark, sf).collect())
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    exp = sorted((r["source"], r["bucket"], r["n_b"])
                 for r in textops.ddsketch(docs).collect())
    assert got == exp and len(exp) > 0


def test_kmv_intersect_small_vocab_exact(spark):
    """k larger than every vocabulary: sketches are the full token
    sets, so the pair counts are exact set sizes."""
    from geotile import cache, textops

    rows = [(1, "a b c", "en", "sA", 5), (2, "b c d", "en", "sB", 5),
            (3, "e", "en", "sC", 1)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = textops.kmv_intersect(docs, k=64)
    got = {(r["ga"], r["gb"]): r for r in out.collect()}
    cache.release(out)
    assert got[("sA", "sB")]["k_used"] == 4
    assert got[("sA", "sB")]["n_both"] == 2
    assert got[("sA", "sC")]["k_used"] == 4
    assert got[("sA", "sC")]["n_both"] == 0
    assert got[("sB", "sC")]["n_both"] == 0


def test_perm_test_consistency(spark, sf_dir):
    """21 rows; the observed row matches a direct aggregate; every
    perm row's ge flag equals the integer cross-product rule."""
    from geotile import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = textops.perm_test(docs).collect()
    assert len(rows) == 21
    obs = [r for r in rows if r["perm_id"] == -1][0]
    direct = docs.selectExpr(
        "sum(case when lang = 'en' then 1 else 0 end) as n",
        "sum(case when lang = 'en' then n_chars else 0 end) as s"
    ).collect()[0]
    assert (obs["n"], obs["s"], obs["ge"]) == (direct["n"], direct["s"], 1)
    for r in rows:
        if r["perm_id"] >= 0:
            assert r["ge"] == (1 if r["s"] * obs["n"] >= obs["s"] * r["n"]
                               else 0)


def test_curation_funnel_hand_corpus(spark):
    """Dup pair collapses, one non-en drops, one long doc drops, and
    quota=1 keeps one per source."""
    from geotile import textops

    rows = [(1, "same text here copy", "en", "sA", 200),
            (2, "same text here copy", "en", "sA", 200),   # dup of 1
            (3, "other text", "fr", "sA", 200),             # lang drop
            (4, "x" * 10, "en", "sA", 600),                 # length drop
            (5, "keep a", "en", "sA", 150),
            (6, "keep b", "en", "sB", 150)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    got = {r["stage_name"]: r["n_docs"]
           for r in textops.curation_funnel(docs, quota=1).collect()}
    assert got == {"raw": 6, "dedup": 5, "lang": 4, "length": 3,
                   "quota": 2}


def test_eb_shrunk_rates_hand_groups(spark):
    """A 2-doc 100% group shrinks well below a 10-doc 50% group's
    distance to the global rate; exact integer expectations."""
    from geotile import textops

    rows = [(i, "t", "en" if i <= 5 else "fr", "gA", 10)
            for i in range(1, 11)]
    rows += [(100 + i, "t", "en", "gB", 10) for i in range(1, 3)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    got = {r["source"]: r for r in
           textops.eb_shrunk_rates(docs).collect()}
    assert got["gA"]["raw_micro"] == 500000
    assert got["gB"]["raw_micro"] == 1000000
    assert got["gA"]["shrunk_micro"] == ((5 * 12 + 20 * 7) * 1000000) \
        // (30 * 12)
    assert got["gB"]["shrunk_micro"] == ((2 * 12 + 20 * 7) * 1000000) \
        // (22 * 12)


def test_fdr_screen_rejects_extreme_groups(spark):
    """Two groups with wildly longer docs get k=1 p-values and BH
    rejects exactly a rank prefix; normal groups survive."""
    from geotile import textops

    rows = []
    did = 0
    for g in ("gA", "gB", "gC", "gD"):
        big = g in ("gA", "gB")
        for _ in range(50):
            did += 1
            rows.append((did, "t", "en", g, 100000 if big else 100))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")
    out = sorted(textops.fdr_screen(docs).collect(),
                 key=lambda r: r["rank"])
    ranks_rejected = [r["rank"] for r in out if r["rejected"] == 1]
    # rejections are a prefix of the ranks
    assert ranks_rejected == list(range(1, len(ranks_rejected) + 1))
    rejected_groups = {r["source"] for r in out if r["rejected"] == 1}
    assert rejected_groups == {"gA", "gB"}
    for r in out:
        if r["source"] in ("gA", "gB"):
            assert r["k"] == 1   # no pseudo-group beats an extreme mean


def test_cdc_chunks_partition_and_shift_robustness(spark):
    """Chunks partition every doc exactly (sum_len == total chars),
    and a single-character insertion re-syncs the chunking — most
    chunk contents are shared between the two versions, which is the
    whole point of content-defined over fixed-width."""
    import random

    from geotile import textops

    rng = random.Random(7)
    base = "".join(rng.choice("abcdefgh ") for _ in range(600))
    shifted = "X" + base
    docs = spark.createDataFrame(
        [(1, base, "en", "s", len(base)),
         (2, shifted, "en", "s", len(shifted))],
        "doc_id long, text string, lang string, source string,"
        " n_chars long")
    r = textops.cdc_chunks(docs).collect()[0]
    assert r["n_docs"] == 2
    assert r["sum_len"] == len(base) + len(shifted)
    # the insertion perturbs only the first chunk(s); boundaries
    # re-sync immediately after, so shared content dominates
    assert r["n_shared"] >= 3
    assert r["max_df"] == 2
