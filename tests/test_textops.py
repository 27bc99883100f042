"""BPE-ish token counting and winnowed rolling-hash fingerprints."""

from practicum2_nof1_adhd_bd_spark.operators import textops


def test_bpe_token_stats_known_string(spark):
    df = spark.createDataFrame(
        [(1, "Hello world, it's 2024! foo-bar baz99")],
        "doc_id long, text string",
    )
    r = textops.bpe_token_stats(df).first()
    # Hello | world | , | it | 's | 2024 | ! | foo | - | bar | baz | 99
    assert r["n_bpe_tokens"] == 12
    assert r["n_ws_tokens"] == 6
    assert abs(r["bpe_per_word"] - 2.0) < 1e-9


def test_winnow_fingerprints_edit_robust(spark):
    base = "the quick brown fox jumps over the lazy dog " * 4
    edited = base.replace("lazy dog", "lazy cat", 1)  # one local edit
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "completely unrelated text here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.winnow_fingerprints(df).collect()}
    # identical prefix/suffix -> most fingerprints shared; fetch sets to compare
    assert out[1]["n_grams"] == len(base.strip()) - 4
    assert 0 < out[1]["n_fingerprints"] < out[1]["n_grams"]
    # deterministic: same text -> same set hash
    again = {r["doc_id"]: r for r in textops.winnow_fingerprints(df).collect()}
    assert again[1]["fp_set_md5"] == out[1]["fp_set_md5"]
    assert out[1]["fp_set_md5"] != out[3]["fp_set_md5"]


def test_winnow_short_doc_degenerates_gracefully(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, "abcdef")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textops.winnow_fingerprints(df, k=5, window=4).collect()}
    assert out[1]["n_grams"] == 0 and out[1]["n_fingerprints"] == 0
    # 2 grams < window -> all distinct gram hashes kept
    assert out[2]["n_grams"] == 2 and out[2]["n_fingerprints"] == 2


def test_gopher_flags_repetition_and_bounds(spark):
    good = "the quick brown fox jumps over a lazy dog and runs far " * 6  # 66 words
    repetitive = "the cat " * 40  # top bigram dominates
    short = "the end"
    df = spark.createDataFrame(
        [(1, good), (2, repetitive), (3, short)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textops.gopher_quality_flags(df).collect()}
    assert out[1]["keep"] is True
    # repetitive doc: n_words fine (80) but top bigram covers most chars
    assert out[2]["n_words"] == 80
    assert out[2]["top_bigram_char_frac"] > 0.2 and out[2]["keep"] is False
    # short doc fails the word-count bound
    assert out[3]["n_words"] == 2 and out[3]["keep"] is False


def test_pii_redact_matches_and_hashes(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or call (555) 123-4567 now"),
            (2, "ssn 123-45-6789 leaked"),
            (3, "clean text, nothing here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.pii_redact(df).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["n_ssn"] == 1 and out[2]["n_emails"] == 0
    assert out[3]["n_emails"] == out[3]["n_ssn"] == out[3]["n_phones"] == 0
    # redaction is applied (hash differs from raw md5) only when PII present
    import hashlib
    raw3 = hashlib.md5(b"clean text, nothing here").hexdigest()
    assert out[3]["redacted_md5"] == raw3
    raw1 = hashlib.md5(
        b"mail bob@example.com or call (555) 123-4567 now"
    ).hexdigest()
    assert out[1]["redacted_md5"] != raw1


def test_ngram_decontaminate_flags_overlap(spark):
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares the 5-gram "alpha beta gamma delta epsilon" (and one more)
            (1, "xx alpha beta gamma delta epsilon zeta yy"),
            # shares words but no 5-gram run
            (2, "alpha beta gamma nope delta epsilon zeta"),
            (3, "totally different words here entirely now"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in textops.ngram_decontaminate(train, eval_df, n=5).collect()
    }
    assert out == {1: 2}  # docs 2 and 3 are clean -> absent


def test_source_mixture_weights_temperature(spark):
    df = spark.createDataFrame(
        [(i, "w " * (10 if i % 10 else 1000), f"s{i % 2}") for i in range(10)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in textops.source_mixture_weights(df, alpha=0.7).collect()}
    assert out["s0"]["n_tokens"] == 1000 + 4 * 10
    assert out["s1"]["n_tokens"] == 5 * 10
    # weights normalize to 1 and alpha<1 up-weights the small source
    total = out["s0"]["mix_weight"] + out["s1"]["mix_weight"]
    assert abs(total - 1.0) < 1e-5
    raw_share = out["s1"]["n_tokens"] / (out["s0"]["n_tokens"] + out["s1"]["n_tokens"])
    assert out["s1"]["mix_weight"] > raw_share


def test_pack_sequences_offsets_and_spans(spark):
    # budget 10: doc0 tokens 0-5, doc1 tokens 6-13 (spans seqs 0-1), doc2 14-16
    df = spark.createDataFrame(
        [(0, "a " * 6), (1, "b " * 8), (2, "c " * 3)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in textops.pack_sequences(df, budget=10, bucket_size=2).collect()
    }
    assert (out[0]["start_offset"], out[0]["first_seq"], out[0]["last_seq"]) == (0, 0, 0)
    assert (out[1]["start_offset"], out[1]["first_seq"], out[1]["last_seq"]) == (6, 0, 1)
    assert out[1]["n_seqs"] == 2
    assert (out[2]["start_offset"], out[2]["first_seq"]) == (14, 1)
    # bucket boundary (bucket_size=2 splits doc2 into its own bucket) did not
    # break the global stream offsets
    assert sum(r["n_tokens"] for r in out.values()) == 17


def test_dup_ngram_profile_repetition(spark):
    df = spark.createDataFrame(
        [(1, "the cat the cat the cat"), (2, "all words differ here now")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.dup_ngram_profile(df).collect()}
    # "the cat"x3 + "cat the"x2 -> 5 bigrams, 2 distinct -> 3/5 duplicated
    assert out[1]["n_2grams"] == 5
    assert abs(out[1]["dup_2gram_frac"] - 3 / 5) < 1e-5
    assert out[2]["dup_2gram_frac"] == 0.0 and out[2]["dup_3gram_frac"] == 0.0


def test_hash_split_deterministic_and_stable(spark):
    df = spark.createDataFrame([(i, "x") for i in range(200)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in textops.hash_split(df).collect()}
    # deterministic: same assignment on a second run
    again = {r["doc_id"]: r["split"] for r in textops.hash_split(df).collect()}
    assert {k: v["split"] for k, v in out.items()} == again
    # stable under corpus growth: adding docs never moves existing ones
    bigger = spark.createDataFrame(
        [(i, "x") for i in range(400)], "doc_id long, text string"
    )
    grown = {r["doc_id"]: r["split"] for r in textops.hash_split(bigger).collect()}
    assert all(grown[k] == v["split"] for k, v in out.items())
    # all three splits materialize and u stays in [0, 1)
    assert {v["split"] for v in out.values()} == {"train", "val", "test"}
    assert all(0.0 <= v["split_u"] < 1.0 for v in out.values())


def test_unigram_surprisal_rare_tokens_cost_more(spark):
    # 'common' appears 9x, 'rare' once -> the rare-token doc scores higher
    df = spark.createDataFrame(
        [(i, "common") for i in range(9)] + [(9, "rare")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.unigram_surprisal(df).collect()}
    import math

    assert abs(out[0]["bits_per_token"] - (-math.log2(9 / 10))) < 1e-5
    assert abs(out[9]["bits_per_token"] - (-math.log2(1 / 10))) < 1e-5
    assert out[9]["bits_per_token"] > out[0]["bits_per_token"]


def test_bigram_surprisal_closed_form(spark):
    # corpus: "a b" (x2), "a c", "solo" -> bigrams (a,b) x2, (a,c) x1.
    # V = 4 distinct tokens (a b c solo), context c(a) = 3, alpha = 0.1:
    #   p(b|a) = (2 + 0.1) / (3 + 0.4),  p(c|a) = (1 + 0.1) / (3 + 0.4)
    import math

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo"), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.bigram_surprisal(df).collect()}
    assert abs(out[1]["bits_per_bigram"] - (-math.log2(2.1 / 3.4))) < 1e-5
    assert abs(out[3]["bits_per_bigram"] - (-math.log2(1.1 / 3.4))) < 1e-5
    # the rarer continuation costs more bits
    assert out[3]["bits_per_bigram"] > out[1]["bits_per_bigram"]
    # docs with < 2 tokens (or NULL text) keep a row: 0 bigrams, NULL score
    assert out[4]["n_bigrams"] == 0 and out[4]["bits_per_bigram"] is None
    assert out[5]["n_bigrams"] == 0 and out[5]["bits_per_bigram"] is None
    assert set(out) == {1, 2, 3, 4, 5}


def test_repetition_profile_closed_form(spark):
    # doc 1: "x x x y z x x" (13 chars, 7 tokens)
    #   top2 = "x x" count 3 * len 3 = 9 -> 9/13; top3 = any trigram
    #   count 1 * len 5 -> 5/13; top4 -> 7/13; no repeated 6-gram.
    # doc 2: "a b c d e f" x3 (35 chars, 18 tokens): every 6-gram
    #   repeats -> ONE merged span covering all 18 tokens (frac 1.0);
    #   top2 = 3*3/35, top3 = 3*5/35, top4 = 3*7/35.
    # doc 3: single token -> no grams anywhere, zeros all the way.
    df = spark.createDataFrame(
        [
            (1, "x x x y z x x"),
            (2, "a b c d e f a b c d e f a b c d e f"),
            (3, "hi"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.repetition_profile(df).collect()}
    r1 = out[1]
    assert r1["n_tokens"] == 7
    assert abs(r1["top2_char_frac"] - 9 / 13) < 1e-5
    assert abs(r1["top3_char_frac"] - 5 / 13) < 1e-5
    assert abs(r1["top4_char_frac"] - 7 / 13) < 1e-5
    assert r1["dup6_spans"] == 0 and r1["dup6_token_frac"] == 0.0
    r2 = out[2]
    assert r2["n_tokens"] == 18
    assert abs(r2["top2_char_frac"] - 9 / 35) < 1e-5
    assert abs(r2["top3_char_frac"] - 15 / 35) < 1e-5
    assert abs(r2["top4_char_frac"] - 21 / 35) < 1e-5
    assert r2["dup6_spans"] == 1 and r2["dup6_token_frac"] == 1.0
    r3 = out[3]
    assert r3["n_tokens"] == 1
    assert r3["top2_char_frac"] == 0.0 and r3["dup6_token_frac"] == 0.0


def test_tfidf_top_terms_ranks_distinctive_terms(spark):
    df = spark.createDataFrame(
        [
            (1, "shared shared alpha alpha alpha", "s0"),
            (2, "shared beta", "s1"),
            (3, "shared beta beta", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    out = textops.tfidf_top_terms(df, k=2).collect()
    top = {r["source"]: r["term"] for r in out if r["rank"] == 1}
    # 'shared' occurs in every doc -> idf = ln(4/4) = 0 -> never outranks
    # the source-specific terms
    assert top == {"s0": "alpha", "s1": "beta"}
    assert all(r["tfidf"] >= 0 for r in out)


def test_char_ngram_entropy_bounds(spark):
    df = spark.createDataFrame(
        [(1, "aaaaaa"), (2, "abcdefgh"), (3, "ab"), (4, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.char_ngram_entropy(df, n=3).collect()}
    # uniform repetition -> one distinct gram -> zero entropy
    assert out[1]["n_grams"] == 4 and out[1]["entropy_bits"] == 0.0
    # all-distinct grams -> entropy == log2(n_grams)
    import math

    assert out[2]["n_grams"] == 6
    assert abs(out[2]["entropy_bits"] - math.log2(6)) < 1e-5
    # shorter than n / NULL -> zero grams, zero entropy (not missing rows)
    assert out[3]["n_grams"] == 0 and out[3]["entropy_bits"] == 0.0
    assert out[4]["n_grams"] == 0 and out[4]["entropy_bits"] == 0.0


def test_stratified_sample_k_deterministic_fixed_size(spark):
    df = spark.createDataFrame(
        [(i, "x", f"s{i % 3}") for i in range(100)],
        "doc_id long, text string, source string",
    )
    out = textops.stratified_sample_k(df, k=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r["doc_id"])
    assert set(per) == {"s0", "s1", "s2"}
    assert all(len(v) == 5 for v in per.values())
    again = {
        (r["source"], r["sample_rank"]): r["doc_id"]
        for r in textops.stratified_sample_k(df, k=5).collect()
    }
    assert {(r["source"], r["sample_rank"]): r["doc_id"] for r in out} == again


def test_apply_mixture_sample_quota_and_determinism(spark):
    """Per-source quotas follow w ∝ tokens^0.7 (big source down-weighted
    relative to its raw share), every source keeps >= 1 doc, and the draw
    is identical across runs (md5 rank, no RNG)."""
    from practicum2_nof1_adhd_bd_spark.operators import textops

    rows = [(i, "a " * 50, "big") for i in range(90)] + [
        (100 + i, "b " * 50, "small") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = textops.apply_mixture_sample(docs, target_docs=20, alpha=0.7)
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    # temperature sampling: big has 9x the tokens but only 9^0.7 ~ 4.66x
    # the weight -> quota ratio well under 9
    assert len(by_src["small"]) >= 1
    assert len(by_src["big"]) / len(by_src["small"]) < 9
    again = {
        (r["doc_id"], r["sample_rank"])
        for r in textops.apply_mixture_sample(docs, target_docs=20, alpha=0.7).collect()
    }
    assert {(r["doc_id"], r["sample_rank"]) for r in got} == again


def test_duplicate_spans_merge_and_within_doc(spark):
    """Position-level span semantics: overlapping hits merge, adjacent
    (gap-0) hits merge, within-doc repeats count as duplicates, clean
    docs report zeros."""
    A = "a b c d e f g h x1 x2 a b c d e f g h"   # same 8-gram twice
    B = "q w e r t y u i o p"                      # clean
    C = "z a b c d e f g h i j"                    # overlapping hits 2,3
    E = "a b c d e f g h i"                        # exact pair with F
    G = ("s1 s2 s3 s4 s5 s6 s7 s8 "
         "t1 t2 t3 t4 t5 t6 t7 t8")                # two ADJACENT spans
    H = "s1 s2 s3 s4 s5 s6 s7 s8"
    I = "t1 t2 t3 t4 t5 t6 t7 t8"
    df = spark.createDataFrame(
        [(0, A), (1, B), (2, C), (3, E), (4, E), (5, G), (6, H), (7, I)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.duplicate_spans(df, k=8).collect()}
    assert len(out) == 8
    # A: hits at p=1 and p=11 -> gap -> TWO spans of 8
    assert (out[0]["n_dup_spans"], out[0]["dup_tokens"],
            out[0]["longest_dup_span"]) == (2, 16, 8)
    assert abs(out[0]["dup_token_frac"] - 16 / 18) < 1e-5
    # B: clean
    assert (out[1]["n_dup_spans"], out[1]["dup_tokens"]) == (0, 0)
    assert out[1]["dup_token_frac"] == 0.0
    # C: hits at p=2 [2,9] and p=3 [3,10] OVERLAP -> one 9-token span
    assert (out[2]["n_dup_spans"], out[2]["dup_tokens"],
            out[2]["longest_dup_span"]) == (1, 9, 9)
    # E/F exact pair: both fully covered by one merged span
    for d in (3, 4):
        assert (out[d]["n_dup_spans"], out[d]["dup_tokens"]) == (1, 9)
        assert out[d]["dup_token_frac"] == 1.0
    # G: [1,8] and [9,16] are ADJACENT (p = prev_end + 1) -> merge to one
    assert (out[5]["n_dup_spans"], out[5]["dup_tokens"],
            out[5]["longest_dup_span"]) == (1, 16, 16)
    # short docs (< k tokens) would report n_tokens but no grams; H/I are
    # exactly k tokens -> single gram each, duplicated inside G
    for d in (6, 7):
        assert (out[d]["n_dup_spans"], out[d]["dup_tokens"]) == (1, 8)


def test_duplicate_spans_short_doc_graceful(spark):
    df = spark.createDataFrame(
        [(1, "only three tokens"), (2, "")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textops.duplicate_spans(df, k=8).collect()}
    assert out[1]["n_tokens"] == 3 and out[1]["n_dup_spans"] == 0
    assert out[2]["n_tokens"] == 0 and out[2]["dup_token_frac"] == 0.0


def test_duplicate_span_cut_keeps_first_occurrence(spark):
    """Span-cut semantics: the corpus-order FIRST occurrence of a
    duplicated 8-gram survives, later occurrences are cut; clean docs
    pass through untouched; original case is preserved while matching is
    case-folded; a within-doc repeat cuts only the second copy."""
    shared = "A b c d e f g h"                      # 8 tokens, mixed case
    d0 = f"{shared} tail0 tail1"                    # first occurrence
    d1 = f"lead0 lead1 {shared.lower()} end0"       # later, case-folded
    d2 = "u1 u2 u3 u4 u5 u6 u7 u8 u9"               # clean
    d3 = f"{shared} mid {shared}"                   # within-doc repeat
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r for r in textops.duplicate_span_cut(df, k=8).collect()
    }
    # doc 0 holds the canonical occurrence -> nothing cut, case intact
    assert out[0]["cut_tokens"] == 0
    assert out[0]["cut_text"] == d0
    # doc 1's copy is cut (case-folded match); its unique tokens survive
    assert out[1]["cut_tokens"] == 8
    assert out[1]["cut_text"] == "lead0 lead1 end0"
    # clean doc unchanged
    assert out[2]["cut_tokens"] == 0 and out[2]["cut_text"] == d2
    # doc 3: grams spanning "... g h mid A b ..." also duplicate doc 0's?
    # no — they contain 'mid', unique. Canonical of the shared gram is
    # doc 0, so BOTH of doc 3's copies are cut, 'mid' survives.
    assert out[3]["cut_text"] == "mid"
    assert out[3]["kept_tokens"] == 1


def test_duplicate_span_cut_totals_consistent(spark, sf_dir):
    """kept + cut == n_tokens and cut_text token count == kept_tokens on
    real corpus data."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textops.duplicate_span_cut(docs, k=8)
    bad = out.filter(
        (F.col("kept_tokens") + F.col("cut_tokens") != F.col("n_tokens"))
        | (
            F.size(F.regexp_extract_all(F.col("cut_text"), F.lit(r"\S+"), 0))
            != F.col("kept_tokens")
        )
    ).count()
    assert bad == 0


def test_heavy_hitter_tokens_exact_output(spark):
    """CMS prefilter + exact verify returns exactly GROUP BY ... HAVING:
    heavy tokens with true counts, light tokens absent."""
    rows = [(i, "alpha beta alpha") for i in range(30)] + [
        (100, "gamma delta"), (101, "gamma epsilon zeta")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["token"]: r["n_occurrences"]
        for r in textops.heavy_hitter_tokens(df, min_count=10).collect()
    }
    assert out == {"alpha": 60, "beta": 30}


def test_heavy_hitter_survives_total_collision(spark):
    """width=1 forces EVERY token into the same sketch cell — the
    prefilter passes everything (estimate = total occurrences) and the
    exact verify alone must produce the right answer. Pins the
    no-false-negative/exact-verify division of labor."""
    rows = [(i, "hot cold") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["token"]: r["n_occurrences"]
        for r in textops.heavy_hitter_tokens(
            df, min_count=15, depth=2, width=1
        ).collect()
    }
    assert out == {"cold": 20, "hot": 20}


def test_bm25_scores_and_ranking(spark):
    """BM25 hand-check on a 3-doc corpus: a doc without any query term
    never appears; higher tf at equal length ranks higher; the score
    matches the closed-form Robertson formula."""
    import math

    df = spark.createDataFrame(
        [(0, "spark spark join"), (1, "spark filter scan"),
         (2, "window lag lead")],
        "doc_id long, text string",
    )
    out = textops.bm25_topk(df, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in out] == [0, 1]
    # closed form: N=3, df=2, dl=3 for every doc, avgdl=3
    idf = math.log(1.0 + (3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf):
        return round(idf * tf * (1.2 + 1.0) / (tf + 1.2 * (0.25 + 0.75)), 6)
    assert out[0]["bm25"] == s(2.0)
    assert out[1]["bm25"] == s(1.0)


def test_rrf_fuse_partial_overlap(spark):
    """RRF sums 1/(60+rank) per list; docs on one list only get the
    single contribution; ties broken by id."""
    from practicum2_nof1_adhd_bd_spark.operators import similarity as sim

    a = spark.createDataFrame(
        [(1, 0.9), (2, 0.8), (3, 0.7)], "doc_id long, s1 double"
    )
    b = spark.createDataFrame(
        [(2, 0.99), (4, 0.5)], "doc_id long, s2 double"
    )
    out = {r["doc_id"]: r["rrf"] for r in
           sim.rrf_fuse([(a, "s1"), (b, "s2")], k=10).collect()}
    assert out[2] == round(1 / 62 + 1 / 61, 6)   # rank 2 in a, rank 1 in b
    assert out[1] == round(1 / 61, 6)
    assert out[3] == round(1 / 63, 6)
    assert out[4] == round(1 / 62, 6)


def test_trigram_surprisal_stupid_backoff_closed_form(spark):
    """Every backoff level hit once (Brants et al. 2007 stupid backoff):
    model = docs 2/4 -> trigram counts {(a b c): 1, (b c d): 1}, bigram
    counts {(a,b):1, (b,c):1, (c,d):1, (x,y):1}, unigrams
    {a,b,c,d:1, x,y:1} with N=6, V=6. Scored doc "a b c q x y d":
      pos (a,b,c):  in the trigram model           -> s = 1/1
      pos (b,c,q):  unseen tri, unseen bigram (c,q), q OOV
                    -> s = 0.4 * 0.4 * (0 + 0.1)/(6 + 0.6)
      pos (c,q,x):  unseen tri, unseen bigram (q,x), x seen
                    -> s = 0.4 * 0.4 * (1 + 0.1)/(6 + 0.6)
      pos (q,x,y):  unseen tri, bigram (x,y) seen: c23/c2 = 1/1
                    -> s = 0.4 * 1.0
      pos (x,y,d):  unseen tri, unseen bigram (y,d), d seen
                    -> s = 0.4 * 0.4 * 1.1/6.6
    """
    import math

    from practicum2_nof1_adhd_bd_spark.operators import textops

    docs = spark.createDataFrame(
        [(1, "a b c q x y d"), (2, "a b c d"), (3, "zz"), (4, "x y")],
        "doc_id long, text string",
    )
    model = docs.filter("doc_id % 2 = 0")
    out = {
        r["doc_id"]: r
        for r in textops.trigram_surprisal(docs, model_df=model).collect()
    }
    uni = lambda c: (c + 0.1) / (6 + 0.1 * 6)
    expected = [
        1.0,
        0.4 * 0.4 * uni(0),
        0.4 * 0.4 * uni(1),
        0.4 * 1.0,
        0.4 * 0.4 * uni(1),
    ]
    want = sum(-math.log2(s) for s in expected) / len(expected)
    assert out[1]["n_trigrams"] == 5
    assert abs(out[1]["bits_per_trigram"] - want) < 1e-5
    # model doc scored too: its own trigrams are all in the model
    assert out[2]["n_trigrams"] == 2
    w2 = (-math.log2(1.0) - math.log2(1.0)) / 2
    assert abs(out[2]["bits_per_trigram"] - w2) < 1e-9
    # < 3 tokens -> row kept, 0 trigrams, NULL score
    assert out[3]["n_trigrams"] == 0 and out[3]["bits_per_trigram"] is None
    assert out[4]["n_trigrams"] == 0 and out[4]["bits_per_trigram"] is None


def test_fuzzy_decontaminate_report_closed_form(spark):
    """Near-copy of an eval doc is flagged (Jaccard >= threshold via the
    LSH candidate path), an unrelated doc is not, and the per-source
    report carries exact counts/rates. Doc 1 shares 8 of its 3-shingles
    with the eval doc (one appended token changes the tail shingles):
    jaccard = |inter| / |union| is high; doc 2 shares nothing."""
    from practicum2_nof1_adhd_bd_spark.operators import textops

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima"
    )
    train = spark.createDataFrame(
        [
            (1, base + " extra", "web"),
            (2, "totally different words about other topics entirely", "web"),
            (3, "unrelated content from the books corpus here", "books"),
        ],
        "doc_id long, text string, source string",
    )
    ev = spark.createDataFrame(
        [(100, base, "eval")], "doc_id long, text string, source string"
    )
    out = {
        r["source"]: r
        for r in textops.fuzzy_decontaminate(
            train, ev, threshold=0.5
        ).collect()
    }
    assert out["web"]["n_docs"] == 2
    assert out["web"]["n_contaminated"] == 1
    assert abs(out["web"]["contamination_rate"] - 0.5) < 1e-9
    # 10 shared shingles of 11 union... exact: base has 10 3-shingles,
    # base+" extra" has 11; intersection 10, union 11
    assert abs(out["web"]["max_jaccard"] - round(10 / 11, 6)) < 1e-6
    assert out["books"]["n_docs"] == 1
    assert out["books"]["n_contaminated"] == 0
    assert out["books"]["max_jaccard"] is None


def test_dsir_importance_closed_form(spark):
    """Hand-check of the DSIR log-ratio: target = "a a b", pool doc 1 =
    "a a", doc 2 = "c c", doc 3 = "" (kept with NULL score). Union vocab
    {a, b, c} (V=3), N_t=3, N_c=4, alpha=0.1:
      lr(a) = ln(2.1/3.3) - ln(2.1/4.3)
      lr(c) = ln(0.1/3.3) - ln(2.1/4.3)
    Doc 1 scores lr(a) (mean of two equal terms); doc 2 scores lr(c) —
    the target-like doc must outrank the off-domain one."""
    import math

    from practicum2_nof1_adhd_bd_spark.operators import textops

    pool = spark.createDataFrame(
        [(1, "a a"), (2, "c c"), (3, "")], "doc_id long, text string"
    )
    target = spark.createDataFrame([(100, "a a b")], "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textops.dsir_importance(pool, target).collect()
    }
    lr_a = math.log(2.1 / 3.3) - math.log(2.1 / 4.3)
    lr_c = math.log(0.1 / 3.3) - math.log(2.1 / 4.3)
    assert out[1]["n_tokens"] == 2
    assert abs(out[1]["logratio_per_token"] - lr_a) < 1e-5
    assert abs(out[2]["logratio_per_token"] - lr_c) < 1e-5
    assert out[1]["logratio_per_token"] > out[2]["logratio_per_token"]
    assert out[3]["n_tokens"] == 0 and out[3]["logratio_per_token"] is None


def test_quality_classifier_nb_closed_form(spark):
    """Hand-check the NBSVM scoring path on a 4-doc corpus small enough
    to compute by hand: bucket indicators binarize, weights are the
    smoothed log-count ratios, OOV buckets get the nonzero smoothed
    weight, bias = ln(npos/nneg), and the sigmoid ranks a
    positive-vocabulary doc above a negative-vocabulary one."""
    import math

    from pyspark.sql import functions as F

    from practicum2_nof1_adhd_bd_spark.operators import textops

    B = 64
    train = spark.createDataFrame(
        [
            (0, "good fine good", 1),
            (2, "good solid", 1),
            (4, "bad awful", 0),
            (6, "bad bad spam", 0),
        ],
        "doc_id long, text string, label int",
    )
    score = spark.createDataFrame(
        [(1, "good fine"), (3, "bad spam"), (5, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in textops.quality_classifier_nb(
            train, score, n_buckets=B
        ).collect()
    }
    # replicate in pure python
    def buckets(t):
        ws = t.lower().split()
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        import hashlib

        return {
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            for g in grams
        }

    pos_docs = [("good fine good", 1), ("good solid", 1)]
    neg_docs = [("bad awful", 0), ("bad bad spam", 0)]
    from collections import Counter

    pos_c, neg_c = Counter(), Counter()
    for t, _ in pos_docs:
        pos_c.update(buckets(t))
    for t, _ in neg_docs:
        neg_c.update(buckets(t))
    post, negt = sum(pos_c.values()), sum(neg_c.values())

    def wgt(j):
        return math.log((pos_c.get(j, 0) + 1.0) / (post + B)) - math.log(
            (neg_c.get(j, 0) + 1.0) / (negt + B)
        )

    for doc_id, text in [(1, "good fine"), (3, "bad spam")]:
        s = sum(wgt(j) for j in buckets(text)) + math.log(2 / 2)
        want = round(1 / (1 + math.exp(-s)), 6)
        assert abs(out[doc_id]["quality_prob"] - want) < 1e-6, doc_id
        assert out[doc_id]["n_feats"] == len(buckets(text))
    assert out[1]["quality_prob"] > 0.5 and out[1]["keep"]
    assert out[3]["quality_prob"] < 0.5 and not out[3]["keep"]
    # token-less doc: no features, bias-only score
    assert out[5]["n_feats"] == 0 and out[5]["quality_prob"] == 0.5


def test_logistic_fit_hashed_matches_numpy_reference(spark):
    """The distributed full-batch GD trainer must match a pure-numpy
    implementation run on the same binarized hashed indicators, same
    iterations, same learning rate — gradient exchange is exact modulo
    float-sum order, so weights agree to rounding tolerance, and the
    learned model must separate the training labels."""
    import hashlib
    import math

    import numpy as np

    from practicum2_nof1_adhd_bd_spark.operators import textops

    B, iters, lr = 32, 12, 0.5
    rows = [
        (0, "good fine good solid", 1),
        (1, "good nice fine", 1),
        (2, "bad awful spam", 0),
        (3, "bad spam junk junk", 0),
        (4, "solid nice good", 1),
        (5, "awful junk spam bad", 0),
    ]
    train = spark.createDataFrame(rows, "doc_id long, text string, label int")
    got = {
        r["bucket"]: r["weight"]
        for r in textops.logistic_fit_hashed(
            train, n_buckets=B, n_iters=iters, lr=lr
        ).collect()
    }

    def buckets(t):
        ws = t.lower().split()
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        return sorted(
            {
                int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
                for g in grams
            }
        )

    X = np.zeros((len(rows), B))
    y = np.array([r[2] for r in rows], dtype=float)
    for i, (_, t, _l) in enumerate(rows):
        for j in buckets(t):
            X[i, j] = 1.0
    w = np.zeros(B)
    b = 0.0
    for _ in range(iters):
        p = 1 / (1 + np.exp(-(X @ w + b)))
        r = p - y
        w -= lr * (X.T @ r) / len(rows)
        b -= lr * r.sum() / len(rows)
    for j in range(B):
        assert abs(got[j] - round(float(w[j]), 6)) < 2e-6, j
    assert abs(got[-1] - round(b, 6)) < 2e-6
    # and the learned weights actually separate the training set
    p = 1 / (1 + np.exp(-(X @ w + b)))
    assert all((p[i] >= 0.5) == (y[i] == 1.0) for i in range(len(rows)))


def test_boilerplate_strip_context_smoothing(spark):
    """Pins the jusText two-pass semantics on a hand-built page: nav and
    copyright lines die as BAD, the stopword-bearing heading survives
    ONLY because it neighbors good content (context rule), 'click here'
    dies because both neighbors are bad, link lines always die, and the
    kept text preserves line order."""
    from practicum2_nof1_adhd_bd_spark.operators import textops

    heading = "A Review of Topic 9"
    good1 = "the value of the table is in the row and the part was on it"
    good2 = "it was a value of the row and the table is on the part too"
    doc = "\n".join(
        [
            "HOME | PRODUCTS | ABOUT | CONTACT",  # bad: zero stopwords
            heading,                               # short -> kept via next good
            good1,
            good2,
            "(c) 2024 example corp",               # bad: zero stopwords
            "click here for more",                 # short, both neighbors bad
            "HOME | PRIVACY | TERMS http://example.com",  # bad: link
        ]
    )
    # control doc: the same heading with NO adjacent content must die
    lonely = "\n".join(
        [
            "HOME | PRODUCTS | ABOUT | CONTACT",
            heading,
            "(c) 2024 example corp",
        ]
    )
    df = spark.createDataFrame(
        [(1, doc), (2, lonely)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textops.boilerplate_strip(df).collect()}
    assert out[1]["kept_text"] == "\n".join([heading, good1, good2])
    assert out[1]["n_lines"] == 7 and out[1]["n_kept"] == 3
    assert abs(out[1]["boilerplate_frac"] - round(4 / 7, 6)) < 1e-9
    assert out[2]["kept_text"] == "" and out[2]["n_kept"] == 0


def test_pmi_collocations_closed_form(spark):
    """Hand-checkable corpus: 'new york' co-occurs always; 'the dog'
    co-occurs once among independent uses of 'the'."""
    import math

    df = spark.createDataFrame(
        [
            (1, "new york new york new york"),
            (2, "the dog the cat the bird"),
            (3, "new york"),
        ],
        "doc_id long, text string",
    )
    out = {(r["w1"], r["w2"]): r for r in
           textops.pmi_collocations(df, min_count=2, k=10).collect()}
    # corpus: tokens N=14; c(new)=c(york)=4; pairs NB=11; c12(new,york)=4
    r = out[("new", "york")]
    assert r["pair_count"] == 4
    expect = math.log2((4 / 11) / ((4 / 14) * (4 / 14)))
    assert abs(r["pmi"] - round(expect, 6)) < 1e-9
    # (york, new) adjacent within doc 1 (3 times) -> present at min_count=2
    assert ("york", "new") in out
    # pairs under min_count are dropped: ('the','dog') occurs once
    assert ("the", "dog") not in out


def test_pmi_collocations_deterministic_cut(spark):
    df = spark.createDataFrame(
        [(i, "a b c d a b c d") for i in range(6)], "doc_id long, text string"
    )
    a = textops.pmi_collocations(df, min_count=2, k=3).collect()
    b = textops.pmi_collocations(df, min_count=2, k=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 3


def test_weighted_sample_matches_pure_python(spark, sf_dir):
    """A-ES draw == a driver-side pure-python replay of -ln(u)/w top-k:
    pins hash coordinate, offset, key formula, and tie-break."""
    import hashlib
    import math

    from practicum2_nof1_adhd_bd_spark.operators import textops

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = [
        (r["sample_rank"], r["doc_id"])
        for r in textops.weighted_sample_topk(docs, k=10).collect()
    ]
    keys = []
    for d, w in docs.select("doc_id", "n_chars").collect():
        if w and w > 0:
            h = int(hashlib.md5(f"w42{d}".encode()).hexdigest()[:8], 16)
            keys.append((-math.log((h + 0.5) / 2**32) / w, d))
    keys.sort()
    assert got == [(i + 1, d) for i, (_, d) in enumerate(keys[:10])]


def test_weighted_sample_weight_monotone(spark):
    """Same u coordinate, heavier weight -> smaller key -> earlier rank:
    a row whose weight dominates by 1000x must enter a k=1 sample
    ahead of its unit-weight twin under every seed tried."""
    from practicum2_nof1_adhd_bd_spark.operators import textops

    for seed in ("a", "b", "c"):
        df = spark.createDataFrame(
            [(1, 1000000), (2, 1)], "doc_id long, n_chars long"
        )
        # doc 1 carries ~all the weight; with a single slot it should
        # win unless its u-draw is astronomically unlucky vs doc 2's
        top = textops.weighted_sample_topk(df, k=2, seed=seed).collect()
        key = {r["doc_id"]: r["sample_key"] for r in top}
        assert key[1] < key[2] * 1000, (seed, key)


def test_containment_finds_pasted_snippet_jaccard_misses(spark):
    """The operator's reason to exist: a short benchmark item pasted
    into a long page has near-zero Jaccard but containment 1.0 —
    the containment screen must flag it; full-containment arithmetic
    and the no-hit case are checked alongside."""
    from practicum2_nof1_adhd_bd_spark.operators import dedup, textops

    bench = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i}" for i in range(200))
    train = spark.createDataFrame(
        [(1, filler + " " + bench), (2, filler)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, bench)], "doc_id long, text string")
    out = textops.containment_decontaminate(train, ev, k=3).collect()
    # only doc 1 hits; its containment on the 6 bench shingles is 1.0
    assert [(r["doc_id"], r["eval_id"], r["containment"]) for r in out] == [
        (1, 100, 1.0)
    ]
    assert out[0]["n_eval_shingles"] == 6
    # the symmetric rule really would have missed it
    from pyspark.sql import functions as F

    both = train.unionByName(
        ev.select(F.lit(100).cast("long").alias("doc_id"), "text")
    ).withColumn("lang", F.lit("en"))
    jac = dedup.ngram_jaccard_pairs(
        both, bucket_cols=["lang"], k=3, threshold=0.5, length_bucket=False
    )
    assert jac.filter("id_a = 1 AND id_b = 100").count() == 0


def test_containment_keeps_worst_hit_deterministically(spark):
    """Two eval items above threshold for one train doc: keep the max
    containment; on exact ties keep the smaller eval id."""
    from practicum2_nof1_adhd_bd_spark.operators import textops

    doc = "a b c d e f g h i j"
    train = spark.createDataFrame([(1, doc)], "doc_id long, text string")
    ev = spark.createDataFrame(
        [(20, "a b c d e f g h i j"), (10, "a b c d e f g h i j"),
         (30, "a b c d e f g h")],
        "doc_id long, text string",
    )
    out = textops.containment_decontaminate(train, ev, k=3).collect()
    assert len(out) == 1
    # 10 and 20 both have containment 1.0 -> tie-break to eval_id 10
    assert (out[0]["eval_id"], out[0]["containment"]) == (10, 1.0)


def test_zipf_fit_matches_numpy_ols(spark):
    """Closed-form regression parity: the distributed moment
    aggregation must reproduce numpy's polyfit slope and correlation
    on a crafted frequency table."""
    import math

    import numpy as np

    from practicum2_nof1_adhd_bd_spark.operators import textops

    # craft a corpus with an exact frequency ladder: token t_i appears
    # freq_i times within one source
    freqs = {"aa": 32, "bb": 16, "cc": 8, "dd": 4, "ee": 2, "ff": 1}
    text = " ".join(t for t, f in freqs.items() for _ in range(f))
    df = spark.createDataFrame([(1, text, "s1")], "doc_id long, text string, source string")
    row = textops.zipf_law_fit(df).collect()[0]
    assert row["n_tokens"] == 6
    x = np.log(np.arange(1, 7, dtype=float))
    y = np.log(np.array(sorted(freqs.values(), reverse=True), dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    r = np.corrcoef(x, y)[0, 1]
    assert math.isclose(row["zipf_alpha"], -slope, abs_tol=5e-6)
    assert math.isclose(row["r2"], r * r, abs_tol=5e-6)


def test_zipf_fit_single_token_group_null_r2(spark):
    """A one-token group has zero x-variance... one token gives rank=1
    only; guard: two tokens with EQUAL freq -> vary == 0 -> r2 null,
    alpha 0 (flat)."""
    df = spark.createDataFrame(
        [(1, "aa bb", "s1")], "doc_id long, text string, source string"
    )
    from practicum2_nof1_adhd_bd_spark.operators import textops

    row = textops.zipf_law_fit(df).collect()[0]
    assert row["zipf_alpha"] == 0.0
    assert row["r2"] is None


def test_langid_classifier_nb_closed_form(spark):
    """Hand-check the multiclass NB langid scorer on a corpus small
    enough to compute by hand: char-trigram indicators binarize,
    per-class weights are smoothed multinomial log-likelihoods, unseen
    (bucket, class) pairs get the per-class OOV weight, the prior is
    ln(n_c/N), and the argmax runs over ROUNDED scores with the class
    name as tie-break."""
    import hashlib
    import math

    from practicum2_nof1_adhd_bd_spark.operators import textops

    B = 64
    train = spark.createDataFrame(
        [
            (0, "aaab aaba", "aa"),
            (2, "abaa baaa", "aa"),
            (4, "zzzy zyzz", "zz"),
            (6, "yzzz zzyz", "zz"),
        ],
        "doc_id long, text string, lang string",
    )
    score = spark.createDataFrame(
        [(1, "aaba baaa"), (3, "zyzz yzzz"), (5, "q")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in textops.langid_classifier_nb(
            train, score, n_buckets=B
        ).collect()
    }

    def buckets(t):
        t = t.lower()
        grams = [t[i : i + 3] for i in range(len(t) - 2)] if len(t) >= 3 else []
        return {
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B
            for g in grams
        }

    from collections import Counter

    cls_docs = {
        "aa": ["aaab aaba", "abaa baaa"],
        "zz": ["zzzy zyzz", "yzzz zzyz"],
    }
    counts = {c: Counter() for c in cls_docs}
    for c, docs in cls_docs.items():
        for t in docs:
            counts[c].update(buckets(t))
    totals = {c: sum(v.values()) for c, v in counts.items()}

    def score_doc(t, c):
        bs = buckets(t)
        s = math.log(2 / 4)  # uniform priors: 2 docs per class
        for j in bs:
            s += math.log((counts[c].get(j, 0) + 1.0) / (totals[c] + B))
        return round(s, 6)

    for doc_id, text, want_lang in [(1, "aaba baaa", "aa"), (3, "zyzz yzzz", "zz")]:
        exp = {c: score_doc(text, c) for c in cls_docs}
        assert out[doc_id]["lang_pred"] == want_lang, doc_id
        assert abs(out[doc_id]["score"] - max(exp.values())) < 1e-6, doc_id
        assert out[doc_id]["n_feats"] == len(buckets(text))
    # featureless doc: every class scores its bare prior (equal here),
    # so the tie-break picks the lexicographically-first class name
    assert out[5]["n_feats"] == 0
    assert out[5]["lang_pred"] == "aa"


def test_langid_classifier_learns_on_signal_bearing_corpus(spark):
    """The sf* documents fixture draws every lang's text from one
    shared vocabulary (labels uncorrelated with text), where collapsing
    to the majority prior is Bayes-optimal — so the discrimination
    proof lives here: on a corpus whose languages have disjoint
    character distributions, held-out accuracy must exceed 90%."""
    from practicum2_nof1_adhd_bd_spark.operators import textops

    vocab = {
        "aa": ["alba", "banda", "cabal", "dabba", "abacad"],
        "mm": ["mono", "nomon", "ommon", "minim", "momnon"],
        "zz": ["zyxy", "xyzzy", "yzzyx", "zxyzx", "xyxzy"],
    }
    langs = sorted(vocab)
    rows = []
    for i in range(120):
        lang = langs[i % 3]
        ws = vocab[lang]
        text = " ".join(ws[(i + j) % len(ws)] for j in range(8))
        rows.append((i, text, lang))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = docs.filter("doc_id % 2 = 0")
    held = docs.filter("doc_id % 2 = 1")
    pred = textops.langid_classifier_nb(train, held, n_buckets=256)
    joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    correct = joined.filter("lang_pred = lang").count()
    assert n == 60
    assert correct / n > 0.9, f"{correct}/{n}"


# Real natural-language sentences (everyday prose, varied topics) for the
# text-correlated langid pin — the sf fixture's labels are uncorrelated
# with text by construction, so THIS is where model quality (not just
# oracle parity) is asserted on genuinely distinguishable languages.
_REAL_LANG_SENTENCES = {
    "en": [
        "The weather this morning was cold and the streets were quiet.",
        "She finished reading the book before the train arrived.",
        "Our neighbors planted tomatoes and herbs in their garden.",
        "The museum opens at nine and closes after sunset.",
        "He could not remember where he had left his keys.",
        "Children were playing football in the park all afternoon.",
        "The bakery on the corner sells fresh bread every day.",
        "We should leave early because the roads will be busy.",
        "The meeting was postponed until next Thursday morning.",
        "A small boat drifted slowly across the calm lake.",
        "They have been friends since their first year of school.",
        "The recipe calls for two eggs and a cup of flour.",
        "I forgot my umbrella so I waited under the bridge until the rain stopped.",
        "The old clock in the kitchen has not worked for many years.",
        "Please write your name and address at the top of the page.",
        "The mountain path becomes dangerous when the snow begins to melt.",
        "My grandmother always told us stories before we went to sleep.",
        "The price of vegetables has gone up again at the market this week.",
        "He opened the window to let some fresh air into the room.",
        "The library was full of students preparing for their final exams.",
    ],
    "de": [
        "Das Wetter war heute Morgen kalt und die Straßen waren leer.",
        "Sie hat das Buch gelesen, bevor der Zug angekommen ist.",
        "Unsere Nachbarn haben Tomaten und Kräuter im Garten gepflanzt.",
        "Das Museum öffnet um neun Uhr und schließt nach Sonnenuntergang.",
        "Er konnte sich nicht erinnern, wo er seine Schlüssel gelassen hatte.",
        "Die Kinder spielten den ganzen Nachmittag Fußball im Park.",
        "Die Bäckerei an der Ecke verkauft jeden Tag frisches Brot.",
        "Wir sollten früh losfahren, weil die Straßen voll sein werden.",
        "Die Besprechung wurde auf nächsten Donnerstag verschoben.",
        "Ein kleines Boot trieb langsam über den ruhigen See.",
        "Sie sind seit dem ersten Schuljahr gute Freunde.",
        "Das Rezept braucht zwei Eier und eine Tasse Mehl.",
        "Ich habe meinen Regenschirm vergessen und wartete unter der Brücke, bis der Regen aufhörte.",
        "Die alte Uhr in der Küche funktioniert seit vielen Jahren nicht mehr.",
        "Bitte schreiben Sie Ihren Namen und Ihre Adresse oben auf die Seite.",
        "Der Bergweg wird gefährlich, wenn der Schnee zu schmelzen beginnt.",
        "Meine Großmutter hat uns immer Geschichten erzählt, bevor wir schlafen gingen.",
        "Die Preise für Gemüse sind diese Woche auf dem Markt wieder gestiegen.",
        "Er öffnete das Fenster, um frische Luft ins Zimmer zu lassen.",
        "Die Bibliothek war voller Studenten, die sich auf ihre Prüfungen vorbereiteten.",
    ],
    "fr": [
        "Le temps était froid ce matin et les rues étaient calmes.",
        "Elle a fini de lire le livre avant l'arrivée du train.",
        "Nos voisins ont planté des tomates et des herbes dans leur jardin.",
        "Le musée ouvre à neuf heures et ferme après le coucher du soleil.",
        "Il ne se souvenait plus où il avait laissé ses clés.",
        "Les enfants ont joué au football dans le parc tout l'après-midi.",
        "La boulangerie du coin vend du pain frais tous les jours.",
        "Nous devrions partir tôt parce que les routes seront chargées.",
        "La réunion a été reportée à jeudi matin prochain.",
        "Un petit bateau dérivait lentement sur le lac tranquille.",
        "Ils sont amis depuis leur première année d'école.",
        "La recette demande deux œufs et une tasse de farine.",
        "J'ai oublié mon parapluie alors j'ai attendu sous le pont que la pluie s'arrête.",
        "La vieille horloge de la cuisine ne fonctionne plus depuis des années.",
        "Veuillez écrire votre nom et votre adresse en haut de la page.",
        "Le sentier de montagne devient dangereux quand la neige commence à fondre.",
        "Ma grand-mère nous racontait toujours des histoires avant de dormir.",
        "Le prix des légumes a encore augmenté au marché cette semaine.",
        "Il a ouvert la fenêtre pour laisser entrer un peu d'air frais.",
        "La bibliothèque était pleine d'étudiants qui préparaient leurs examens.",
    ],
    "es": [
        "El tiempo estaba frío esta mañana y las calles estaban tranquilas.",
        "Ella terminó de leer el libro antes de que llegara el tren.",
        "Nuestros vecinos plantaron tomates y hierbas en su jardín.",
        "El museo abre a las nueve y cierra después del atardecer.",
        "Él no podía recordar dónde había dejado sus llaves.",
        "Los niños jugaron al fútbol en el parque toda la tarde.",
        "La panadería de la esquina vende pan fresco todos los días.",
        "Deberíamos salir temprano porque las carreteras estarán llenas.",
        "La reunión fue aplazada hasta el próximo jueves por la mañana.",
        "Un pequeño barco flotaba despacio por el lago tranquilo.",
        "Son amigos desde su primer año de escuela.",
        "La receta lleva dos huevos y una taza de harina.",
        "Olvidé mi paraguas así que esperé bajo el puente hasta que dejó de llover.",
        "El viejo reloj de la cocina lleva muchos años sin funcionar.",
        "Por favor escriba su nombre y su dirección en la parte superior de la página.",
        "El sendero de la montaña se vuelve peligroso cuando la nieve empieza a derretirse.",
        "Mi abuela siempre nos contaba cuentos antes de dormir.",
        "El precio de las verduras ha subido otra vez en el mercado esta semana.",
        "Abrió la ventana para dejar entrar un poco de aire fresco.",
        "La biblioteca estaba llena de estudiantes preparando sus exámenes finales.",
    ],
    "it": [
        "Il tempo stamattina era freddo e le strade erano tranquille.",
        "Ha finito di leggere il libro prima che arrivasse il treno.",
        "I nostri vicini hanno piantato pomodori ed erbe nel loro giardino.",
        "Il museo apre alle nove e chiude dopo il tramonto.",
        "Non riusciva a ricordare dove avesse lasciato le chiavi.",
        "I bambini hanno giocato a calcio nel parco tutto il pomeriggio.",
        "La panetteria all'angolo vende pane fresco ogni giorno.",
        "Dovremmo partire presto perché le strade saranno piene.",
        "La riunione è stata rinviata a giovedì mattina prossimo.",
        "Una piccola barca andava lentamente alla deriva sul lago calmo.",
        "Sono amici dal loro primo anno di scuola.",
        "La ricetta richiede due uova e una tazza di farina.",
        "Ho dimenticato l'ombrello così ho aspettato sotto il ponte finché la pioggia non è finita.",
        "Il vecchio orologio della cucina non funziona da molti anni.",
        "Per favore scrivete il vostro nome e il vostro indirizzo in cima alla pagina.",
        "Il sentiero di montagna diventa pericoloso quando la neve comincia a sciogliersi.",
        "Mia nonna ci raccontava sempre delle storie prima di dormire.",
        "Il prezzo delle verdure è aumentato di nuovo al mercato questa settimana.",
        "Ha aperto la finestra per far entrare un po' d'aria fresca.",
        "La biblioteca era piena di studenti che preparavano gli esami finali.",
    ],
    "pt": [
        "O tempo estava frio esta manhã e as ruas estavam tranquilas.",
        "Ela terminou de ler o livro antes de o comboio chegar.",
        "Os nossos vizinhos plantaram tomates e ervas no jardim.",
        "O museu abre às nove e fecha depois do pôr do sol.",
        "Ele não conseguia lembrar onde tinha deixado as chaves.",
        "As crianças jogaram futebol no parque toda a tarde.",
        "A padaria da esquina vende pão fresco todos os dias.",
        "Devíamos sair cedo porque as estradas vão estar cheias.",
        "A reunião foi adiada para a próxima quinta-feira de manhã.",
        "Um pequeno barco flutuava devagar pelo lago calmo.",
        "São amigos desde o primeiro ano de escola.",
        "A receita leva dois ovos e uma chávena de farinha.",
        "Esqueci o meu guarda-chuva por isso esperei debaixo da ponte até a chuva parar.",
        "O velho relógio da cozinha não funciona há muitos anos.",
        "Por favor escreva o seu nome e a sua morada no topo da página.",
        "O caminho da montanha torna-se perigoso quando a neve começa a derreter.",
        "A minha avó contava-nos sempre histórias antes de dormirmos.",
        "O preço dos legumes subiu outra vez no mercado esta semana.",
        "Ele abriu a janela para deixar entrar um pouco de ar fresco.",
        "A biblioteca estava cheia de estudantes a preparar os exames finais.",
    ],
}


def test_langid_classifier_real_languages_above_90pct(spark):
    """Model QUALITY pin on real text (r13 verdict #6): six natural
    languages, twenty genuine sentences each, 15/5 train/held-out split
    per language — held-out accuracy of the char-trigram NB scorer must
    exceed 90%. This includes the hard pairs (es/pt/it share romance
    orthography), so passing means the scorer discriminates on actual
    character distributions, not fixture artifacts. The synthetic
    signal-bearing pin (disjoint vocabularies) remains alongside; the
    langid_confusion ORACLE is untouched — this test asserts quality,
    parity stays with the driver gate."""
    from practicum2_nof1_adhd_bd_spark.operators import textops

    rows = []
    i = 0
    for lang in sorted(_REAL_LANG_SENTENCES):
        for s in _REAL_LANG_SENTENCES[lang]:
            rows.append((i, s, lang))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    # per-language 15/5 split, held-out spread across the block
    train = docs.filter("doc_id % 4 != 3")
    held = docs.filter("doc_id % 4 = 3")
    pred = textops.langid_classifier_nb(train, held, n_buckets=4096)
    joined = pred.join(docs.select("doc_id", "lang"), "doc_id")
    n = joined.count()
    correct = joined.filter("lang_pred = lang").count()
    assert n == 30
    assert correct / n > 0.9, f"{correct}/{n}"
