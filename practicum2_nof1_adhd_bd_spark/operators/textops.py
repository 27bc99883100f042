"""Text-analysis operators for training-data pipelines (brief §"Beyond").

Language ID, quality scoring, token counting, fingerprinting — all pure
Catalyst expressions over a `documents(doc_id, text, ...)` table, so they
scan-scale at 100 TB (no Python in the hot path, filters/projections push
down to parquet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..sources.readers import fan_out

# Small English function-word list for the n-gram/stopword heuristic.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "this",
]


def tokens(col: Column) -> Column:
    """Whitespace tokenization with empty-string hygiene.

    Expressed as one regexp scan (maximal non-whitespace runs) rather than
    split+filter: higher-order-function lambdas are evaluated interpreted
    per array element, while regexp_extract_all stays inside whole-stage
    codegen. Output is identical (incl. ''/' '/NULL edge cases)."""
    return F.regexp_extract_all(col, F.lit(r"\S+"), 0)


def _pos_grams(toks: Column, k: int) -> Column:
    """Positional (non-distinct) k-word grams as a zip_with chain over k
    clamped slices of the token array (r17, guide §4 — the word_shingles
    fix): zip_with's inputs are plain arguments evaluated once per call,
    while the former transform(sequence(positions)) lambda re-evaluated
    the captured tokenize expression per ELEMENT (no subexpression
    elimination inside HOF lambdas) — O(len^2) per document. Element i
    is token_i .. token_{i+k-1} joined by single spaces (tokens are \\S+
    runs, never null/empty, so concat == concat_ws); short and NULL
    docs keep the exact empty array the guarded form produced."""
    n = F.size(toks)
    np_ = F.greatest(n - (k - 1), F.lit(0))
    sh = F.slice(toks, 1, np_)
    for i in range(1, k):
        sh = F.zip_with(
            sh,
            F.slice(toks, i + 1, np_),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: n_tokens, n_chars, avg token length, distinct ratio."""
    toks = tokens(F.col(text_col))
    # sum(length(token)) == count of non-whitespace chars: one regexp_replace
    # instead of an interpreted aggregate() lambda over the token array.
    tok_chars = F.length(F.regexp_replace(F.col(text_col), r"\s", ""))
    return fan_out(df, 'doc_id').select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length(text_col).alias("n_chars_measured"),
        F.round(
            tok_chars / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("avg_token_len"),
        F.round(
            F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("distinct_token_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: share of tokens that are English function
    words; >= 2% -> 'en', else 'und'. (n-gram heuristic per the brief; the
    reference has no multilingual corpus so the stopword variant is the
    deterministic, oracle-checkable choice.)"""
    toks = tokens(F.lower(F.col(text_col)))
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    # Count hits with multiplicity via explode -> sum (codegen) instead of a
    # filter() lambda (interpreted per token). fan_out hash-partitions on
    # doc_id, which satisfies the groupBy's distribution — no extra shuffle,
    # and the partial agg collapses each doc map-side.
    ex = fan_out(df, "doc_id").select(
        "doc_id",
        F.size(toks).alias("_n"),
        F.explode_outer(toks).alias("_t"),
    )
    agg = ex.groupBy("doc_id", "_n").agg(
        F.coalesce(
            F.sum(F.array_contains(sw, F.col("_t")).cast("int")), F.lit(0)
        ).alias("_hits")
    )
    ratio = F.col("_hits") / F.greatest(F.col("_n"), F.lit(1))
    return agg.select(
        "doc_id",
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when(ratio >= 0.02, F.lit("en")).otherwise(F.lit("und")).alias("lang_pred"),
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    extra_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Document quality scoring: length score, alpha ratio, stopword ratio,
    repetition penalty -> composite in [0,1]. Mirrors C4/Gopher-style rules
    expressed as column algebra.

    ``extra_cols`` (output name -> expression) threads additional doc-grain
    columns through the aggregate, letting composites stay one-scan instead
    of re-scanning the corpus and joining on doc_id."""
    out_names = list(extra_cols or {})
    extras = [c.alias(f"_x{i}") for i, c in enumerate((extra_cols or {}).values())]
    extra_names = [f"_x{i}" for i in range(len(extras))]
    toks = tokens(F.lower(F.col(text_col)))
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    # Same explode->sum rewrite as language_id; per-doc scalars ride along
    # as grouping keys (functionally dependent on doc_id, so the fan_out
    # doc_id hash partitioning still satisfies the groupBy — no shuffle).
    ex = fan_out(df, "doc_id").select(
        "doc_id",
        F.size(toks).alias("_n"),
        F.size(F.array_distinct(toks)).alias("_nd"),
        F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")).alias("_alpha"),
        F.length(text_col).alias("_len"),
        *extras,
        F.explode_outer(toks).alias("_t"),
    )
    agg = ex.groupBy("doc_id", "_n", "_nd", "_alpha", "_len", *extra_names).agg(
        F.coalesce(
            F.sum(F.array_contains(sw, F.col("_t")).cast("int")), F.lit(0)
        ).alias("_hits")
    )
    n_tok = F.col("_n")
    stop_ratio = F.col("_hits") / F.greatest(n_tok, F.lit(1))
    alpha_ratio = F.col("_alpha") / F.greatest(F.col("_len"), F.lit(1))
    distinct_ratio = F.col("_nd") / F.greatest(n_tok, F.lit(1))
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    composite = (
        F.lit(0.3) * len_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * F.least(stop_ratio * 10, F.lit(1.0))
        + F.lit(0.2) * distinct_ratio
    )
    return agg.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(composite, 6).alias("quality_score"),
        *[F.col(g).alias(o) for g, o in zip(extra_names, out_names)],
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercase text
    (stable across engines), plus length and first token."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    toks = tokens(F.col(text_col))
    return fan_out(df, 'doc_id').select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.length(norm).alias("fp_len"),
        F.element_at(toks, 1).alias("first_token"),
    )


# GPT-2-style pre-tokenizer regex: contractions, letter runs, digit runs,
# punctuation runs (each optionally preceded by one space). Pure RE2-safe
# syntax (no lookarounds) so Java regex (Spark) and RE2 (DuckDB) produce the
# IDENTICAL token stream.
BPE_PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}']+"


def bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting with a BPE-ish pre-tokenizer (brief §"Beyond": token
    counting = whitespace + a BPE-ish regex).

    Counts BPE-style pre-tokens (the unit a GPT-2-family tokenizer would
    split further), whitespace tokens, and their ratio — the standard
    tokens-per-word expansion estimate used for corpus budgeting.
    """
    bpe = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PRETOKEN_RE), 0)
    ws = tokens(F.col(text_col))
    return fan_out(df, "doc_id").select(
        "doc_id",
        F.size(bpe).cast("int").alias("n_bpe_tokens"),
        F.size(ws).cast("int").alias("n_ws_tokens"),
        F.round(
            F.size(bpe) / F.greatest(F.size(ws), F.lit(1)), 6
        ).alias("bpe_per_word"),
    )


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopwords: int = 2,
    max_top_bigram_frac: float = 0.20,
) -> DataFrame:
    """Gopher-style quality rules (Rae et al. 2021, appendix A1) as column
    algebra: word-count bounds, mean word length bounds, symbol-to-word
    ratio, alphabetic-word fraction, stopword presence, and the repetition
    rule (fraction of characters covered by the most repetitive 2-gram).

    The repetition scalar is max over bigrams of count*len(bigram) — a
    deterministic formulation (no tie-break needed across engines) of
    Gopher's "characters in most frequent 2-gram".

    Plan shape: one fan-out scan, one posexplode; the per-token work is a
    codegen'd lead window + two aggregations that both ride the doc_id hash
    partitioning (bigram counts collapse map-side per doc). Doc-grain
    frames join broadcast-free on the same key. No interpreted HOF lambdas.
    """
    from pyspark.sql.window import Window

    toks = tokens(F.lower(F.col(text_col)))
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    ex = fan_out(df, "doc_id").select(
        "doc_id",
        F.size(toks).alias("_n"),
        F.length(text_col).alias("_chars"),
        F.length(F.regexp_replace(F.col(text_col), r"\s", "")).alias("_nonspace"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(r"#|\.\.\."), 0)
        ).alias("_nsym"),
        F.size(F.array_intersect(F.array_distinct(toks), sw)).alias("_nsw"),
        F.posexplode_outer(toks).alias("_pos", "_t"),
    )
    w = Window.partitionBy("doc_id").orderBy("_pos")
    ex = ex.withColumn("_bg", F.concat_ws(" ", "_t", F.lead("_t").over(w)))
    keys = ["doc_id", "_n", "_chars", "_nonspace", "_nsym", "_nsw"]
    base = ex.groupBy(*keys).agg(
        F.coalesce(
            F.sum(F.col("_t").rlike("[a-z]").cast("int")), F.lit(0)
        ).alias("_alpha_words")
    )
    top = (
        ex.filter(F.col("_bg").contains(" "))  # drop last token's dangling bg
        .groupBy("doc_id", "_bg")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("doc_id")
        .agg(F.max(F.col("_c") * F.length("_bg")).alias("_top_chars"))
    )
    m = base.join(top, "doc_id", "left")
    n_words = F.col("_n")
    mean_len = F.col("_nonspace") / F.greatest(n_words, F.lit(1))
    sym_ratio = F.col("_nsym") / F.greatest(n_words, F.lit(1))
    alpha_frac = F.col("_alpha_words") / F.greatest(n_words, F.lit(1))
    bg_frac = F.coalesce(F.col("_top_chars"), F.lit(0)) / F.greatest(
        F.col("_chars"), F.lit(1)
    )
    keep = (
        n_words.between(min_words, max_words)
        & mean_len.between(min_mean_len, max_mean_len)
        & (sym_ratio <= max_symbol_ratio)
        & (alpha_frac >= min_alpha_word_frac)
        & (F.col("_nsw") >= min_stopwords)
        & (bg_frac <= max_top_bigram_frac)
    )
    return m.select(
        "doc_id",
        n_words.cast("int").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(sym_ratio, 6).alias("symbol_ratio"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.col("_nsw").cast("int").alias("n_stopwords_present"),
        F.round(bg_frac, 6).alias("top_bigram_char_frac"),
        keep.alias("keep"),
    )


# PII patterns — RE2-safe (no lookarounds) so Java regex (Spark) and RE2
# (DuckDB) match identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
PHONE_RE = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: count + redact emails, SSNs, and
    US-style phone numbers (applied in that order, so an SSN never
    re-matches as a phone). Pure regexp column algebra — scan-parallel,
    nothing leaves the JVM. Output carries the redacted text's md5 so the
    transform itself is value-attestable."""
    t = F.col(text_col)
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, SSN_RE, "<SSN>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return fan_out(df, "doc_id").select(
        "doc_id",
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(SSN_RE), 0)).alias("n_ssn"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0)).alias("n_phones"),
        F.length(t).alias("len_before"),
        F.length(red).alias("len_after"),
        F.md5(red).alias("redacted_md5"),
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (brief §"Beyond";
    Schleimer et al., MOSS): hash every char k-gram of the normalized text,
    then keep the minimum hash of each sliding window of ``window``
    consecutive k-grams. The distinct minima are the document's fingerprint
    set — robust to local edits, standard for plagiarism/near-dup detection.

    The k-gram hashes are md5-derived (oracle-reproducible); a true
    incremental Rabin-Karp rolling hash is an implementation optimization
    the declarative form doesn't need — the column algebra expresses the
    same fingerprint-set semantics and stays in the JVM.
    Output: per doc, gram/fingerprint counts + md5 of the sorted
    fingerprint set (compact, hash-comparable).
    """
    from ..functions.scalars import hash64_md5

    p = F.lit((1 << 31) - 1).cast("bigint")
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    out = fan_out(df, "doc_id").select("doc_id", norm.alias("_norm"))
    n = F.length("_norm")
    gram_idx = F.sequence(F.lit(1), n - (k - 1))
    hashes = F.transform(
        gram_idx, lambda i: hash64_md5(F.col("_norm").substr(i, F.lit(k))) % p
    )
    out = out.select(
        "doc_id",
        F.when(n >= k, hashes).otherwise(F.array().cast("array<bigint>")).alias("_h"),
    )
    m = F.size("_h")
    win_idx = F.sequence(F.lit(1), m - (window - 1))
    fps = F.array_distinct(
        F.transform(win_idx, lambda i: F.array_min(F.slice("_h", i, window)))
    )
    fps = F.when(m >= window, fps).otherwise(F.array_distinct("_h"))
    return out.select(
        "doc_id",
        m.cast("int").alias("n_grams"),
        F.size(fps).cast("int").alias("n_fingerprints"),
        F.md5(
            F.concat_ws(",", F.transform(F.array_sort(fps), lambda x: x.cast("string")))
        ).alias("fp_set_md5"),
    )


# ---------------------------------------------------------------------------
# corpus-level training-data ops: decontamination, mixing, packing, repetition
# ---------------------------------------------------------------------------


def ngram_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    n-word shingle with an eval/benchmark set (the n-gram-overlap rule used
    to scrub test-set leakage from pretraining corpora).

    Scale shape: eval sets are tiny relative to the corpus (MBs vs 100 TB),
    so the distinct eval-gram table BROADCASTS and the training side is a
    single scan + explode + map-side-combinable count — no shuffle of
    training text, no all-pairs comparison. Output has one row per
    contaminated training doc with the count of distinct shared n-grams.
    """
    from .dedup import word_shingles

    ev = (
        eval_docs.select(F.explode(word_shingles(F.col(text_col), n)).alias("g"))
        .distinct()
    )
    tr = fan_out(train, id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("g")
    )
    # word_shingles is distinct-per-doc, so count(*) == distinct shared grams.
    return (
        tr.join(F.broadcast(ev), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_ngrams"))
    )


def zipf_law_fit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Zipf power-law fit per group: OLS of ln(freq) on ln(rank) over the
    group's token frequency table — alpha (the negated slope) and R^2,
    the corpus-health diagnostic that flags template/boilerplate-heavy
    or deduplication-damaged slices (natural text sits near alpha ~ 1;
    a flat curve means synthetic repetition, a cliff means over-pruned
    vocabulary).

    Engine-exactness design (the part worth copying): the five OLS
    moments (n, Σx, Σy, Σxx, Σxy, Σyy) are summed as DECIMAL(28,12) —
    each ln() term is cast once, so the SUM is order-invariant and a
    1000-partition Spark aggregation produces the same bytes as
    DuckDB's sequential one — and only the final slope/R^2 arithmetic
    runs in double, on five scalars. Summing raw doubles here would
    hash-mismatch the oracle on partial-aggregation order alone.

    One corpus scan -> (group, token) count -> per-group rank window ->
    one tiny per-group moment aggregation; output is group-cardinality
    rows.
    """
    from pyspark.sql import Window

    tok = df.select(
        F.col(group_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    freq = tok.groupBy(group_col, "token").agg(F.count(F.lit(1)).alias("freq"))
    w = Window.partitionBy(group_col).orderBy(
        F.col("freq").desc(), F.col("token").asc()
    )
    ranked = freq.withColumn("rank", F.row_number().over(w))
    # x, y and their PRODUCTS are computed in double (both engines do
    # identical IEEE arithmetic per term); each term is cast to decimal
    # ONCE at the sum, because decimal*decimal would trigger Spark's
    # precision-loss re-scaling, which DuckDB does not mirror.
    dec = "decimal(28,12)"
    xy = ranked.select(
        group_col,
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
    )
    m = xy.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).cast("double").alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).cast("double").alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).cast("double").alias("syy"),
    )
    cov = m["n"] * m["sxy"] - m["sx"] * m["sy"]
    varx = m["n"] * m["sxx"] - m["sx"] * m["sx"]
    vary = m["n"] * m["syy"] - m["sy"] * m["sy"]
    return m.select(
        group_col,
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(-cov / varx, 6).alias("zipf_alpha"),
        F.round(
            F.when(vary > 0, cov * cov / (varx * vary)).otherwise(F.lit(None)), 6
        ).alias("r2"),
    )


def containment_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    k: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Containment-based decontamination: flag training docs that CONTAIN
    an eval/benchmark item — containment C(train, ev) =
    |shingles(train) ∩ shingles(ev)| / |shingles(ev)| >= t.

    Why a third rule next to the exact any-n-gram flag
    (ngram_decontaminate) and the fuzzy Jaccard scrub
    (decontaminate_fuzzy): a 50-token benchmark item pasted into a
    5,000-token web page has Jaccard ~0.01 — the symmetric rule can
    never see it — while containment is 1.0. Normalizing by the EVAL
    side only is what makes the screen length-asymmetric, which is the
    actual contamination geometry (long train doc, short benchmark
    item).

    Scale shape: the eval shingle table is benchmark-sized and
    BROADCASTS; the training side is one scan + explode; and because
    word_shingles is distinct-per-doc, |∩| is simply count(*) per
    (train, eval) pair after the hash join — map-side combinable, no
    arrays shuffled, no all-pairs stage. The threshold is rational and
    cross-multiplied (den * inter >= num * n_ev), so no float boundary
    can disagree with the oracle; per train doc the worst (max
    containment) eval hit is kept with a deterministic (containment
    desc, eval id asc) tie-break.
    """
    from .dedup import word_shingles

    num, den = int(threshold_num), int(threshold_den)
    ev = eval_docs.select(
        F.col(id_col).alias("eval_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("g"),
    )
    ev_sz = ev.groupBy("eval_id").agg(F.count(F.lit(1)).alias("n_ev"))
    ev = ev.join(ev_sz, "eval_id")
    tr = fan_out(train, id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("g")
    )
    hits = (
        tr.join(F.broadcast(ev), "g")
        .groupBy(id_col, "eval_id", "n_ev")
        .agg(F.count(F.lit(1)).alias("inter"))
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("n_ev"))
    )
    # best eval hit per train doc as a map-side-combinable min_by argmin
    # over (-containment, eval_id) — same deterministic pick as the
    # former row_number window without its per-doc sort; float negation
    # is exact, so the ordering is identical (r16)
    best = hits.groupBy(id_col).agg(
        F.min_by(
            F.struct("eval_id", "inter", "n_ev"),
            F.struct(
                (-(F.col("inter") / F.col("n_ev"))).alias("_nc"),
                F.col("eval_id").alias("_e"),
            ),
        ).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b.eval_id").alias("eval_id"),
        F.col("_b.inter").alias("n_shared"),
        F.col("_b.n_ev").alias("n_eval_shingles"),
        F.round(F.col("_b.inter") / F.col("_b.n_ev"), 6).alias("containment"),
    )


def source_mixture_weights(
    df: DataFrame,
    alpha: float = 0.7,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Domain-mixing weights: per-source token counts raised to a
    temperature exponent alpha and normalized (the w_i ∝ n_i^alpha
    sampling rule used to up-weight small high-quality sources when
    composing a pretraining mixture).

    One map-side-combined aggregate over the corpus; the normalization
    window runs on the aggregated frame (one row per source — dozens, not
    billions), so the unpartitioned window is a no-op at any scale.

    The pow terms are cast to DECIMAL before the normalizing sum: a double
    sum over an unordered window is order-sensitive and can wobble an ulp
    between runs, flipping round(…, 6) at a tie (r04 hash flake). Decimal
    addition is exact and associative, so the denominator is bit-stable.
    """
    from pyspark.sql import Window

    s = df.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        # greatest(size, 0) pins the legacy sizeOfNull corner: under
        # non-ANSI semantics size(NULL) is -1, which would silently skew
        # the corpus total; greatest(NULL, 0) is 0, which sum() treats
        # identically to the NULL it replaces (r16 ADVICE).
        F.sum(F.greatest(F.size(tokens(F.col(text_col))), F.lit(0))).alias(
            "n_tokens"
        ),
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha))).cast(
        "decimal(38,12)"
    )
    return s.select(
        group_col,
        "n_docs",
        "n_tokens",
        F.round(
            w.cast("double")
            / F.sum(w).over(Window.partitionBy()).cast("double"),
            6,
        ).alias("mix_weight"),
    )


def apply_mixture_sample(
    df: DataFrame,
    target_docs: int = 200,
    alpha: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """APPLY the temperature mixture: draw a deterministic subsample whose
    per-source composition follows w_i ∝ tokens_i^alpha — the operator
    that turns source_mixture_weights' report into an actual training-set
    draw. Per-source quota = max(1, floor(target_docs * w_i)); within a
    source the quota keeps the docs with the smallest md5(id) — the
    RNG-free unbiased draw shared with hash_split/stratified_sample_k, so
    re-running (or re-attesting) selects the identical documents.

    Scale shape: weights aggregate map-side to one row per source and
    broadcast back; ranking is one window per source. Quota ranking of a
    pathologically hot source concentrates its rank in one partition —
    the stratified_sample_k caveat: for quota << source size, pre-filter
    by an md5-prefix threshold slightly above quota/|source| and rank
    only the survivors, making the sorted partition O(quota)."""
    from pyspark.sql import Window

    w = source_mixture_weights(df, alpha, text_col, group_col).select(
        group_col, "mix_weight"
    )
    wq = w.select(
        group_col,
        F.greatest(
            F.lit(1),
            F.floor(F.lit(target_docs) * F.col("mix_weight")).cast("int"),
        ).alias("_quota"),
    )
    ranked = df.select(F.col(id_col), F.col(group_col)).withColumn(
        "sample_rank",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.md5(F.col(id_col).cast("string")), id_col
            )
        ),
    )
    return (
        ranked.join(F.broadcast(wq), group_col)
        .filter(F.col("sample_rank") <= F.col("_quota"))
        .select(id_col, group_col, "sample_rank")
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    bucket_size: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing: place documents (in id order) into a single
    concatenated token stream and chop it into fixed-size training
    sequences; emit each doc's stream offset and the first/last sequence
    it lands in (GPT-style packing, where docs may span context windows).

    A naive global running sum is a single-task window at 100 TB. Instead:
    per-bucket token subtotals (tiny frame) -> exclusive prefix sum over
    buckets (window on the tiny frame) -> broadcast the offsets back and
    run the cumulative sum WITHIN each bucket, partitioned and parallel.
    Doc ids drive bucketing, so the plan shuffles once on the bucket key.
    """
    from pyspark.sql import Window

    t = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        F.floor(F.col(id_col) / bucket_size).alias("_bkt"),
    )
    bs = t.groupBy("_bkt").agg(F.sum("n_tokens").alias("_btot"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = bs.select(
        "_bkt", F.coalesce(F.sum("_btot").over(w_off), F.lit(0)).alias("_boff")
    )
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        t.join(F.broadcast(off), "_bkt")
        .withColumn("_end", F.col("_boff") + F.sum("n_tokens").over(w_in))
        .withColumn("start_offset", F.col("_end") - F.col("n_tokens"))
        .withColumn("first_seq", F.expr(f"start_offset div {budget}"))
        # empty docs occupy no tokens: clamp so last_seq == first_seq
        .withColumn("last_seq", F.expr(f"greatest(_end - 1, start_offset) div {budget}"))
    )
    return out.select(
        id_col,
        "n_tokens",
        "start_offset",
        "first_seq",
        "last_seq",
        (F.col("last_seq") - F.col("first_seq") + F.lit(1)).alias("n_seqs"),
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    seed: str = "s42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(seed || doc_id) mapped
    to [0, 1) and cut at the cumulative weight boundaries. Reproducible
    across runs/engines without RNG state, and stable under corpus growth
    (a doc's split never changes when other docs are added) — the property
    a 100-TB pipeline needs so eval sets stay frozen across re-crawls.

    Pure per-row expressions over the id column only — scan-scales, text
    is never read, nothing shuffles.
    """
    u = _split_u(seed, id_col)
    return fan_out(df, id_col).select(
        id_col,
        F.round(u, 6).alias("split_u"),
        _split_expr(weights, seed, id_col).alias("split"),
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Per-document unigram LM score: mean -log2 p(token) under the
    corpus's own unigram distribution (the CCNet/KenLM-style perplexity
    filter, reduced to the unigram model that stays closed-form and
    oracle-checkable — low bits/token = repetitive/common text, high =
    rare-token soup).

    Two passes: (1) one explode -> map-side-combined count builds the
    vocabulary frame; the corpus token TOTAL comes from a separate
    explode-free size() scan (see below). (2) the corpus explodes again
    and equi-joins token->logp.

    ``broadcast_vocab`` (default) force-broadcasts the vocab side, making
    the scoring pass shuffle-free — valid only while the vocabulary fits
    the broadcast ceiling (~10^6-10^7 distinct tokens; a curated or
    hash-bucketed vocab). A raw web-scale vocabulary runs to ~10^8 rows,
    past Spark's 8 GB broadcast limit and typical driver memory — pass
    ``broadcast_vocab=False`` there: the join falls back to a shuffle
    hash/sort-merge join on the token key (one extra corpus-token
    exchange, still map-side combined into the per-doc aggregate).
    """
    tok = fan_out(df, id_col).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_t")
    )
    # vocab has two consumers (the total re-aggregation and the scoring
    # join) whose pruned/filtered subtrees are non-canonical — without
    # materialization each re-ran the explode+groupBy chain (the r15
    # verdict-#4 regression). One lazy localCheckpoint of the vocab-sized
    # frame lets the corpus token TOTAL come from a vocab re-aggregation
    # (sum of counts == sum(size(tokens)), the same BIGINT exactly)
    # instead of the r16 interim explode-free size() scan — one corpus
    # pass fewer, -log2(_n/_tot) bit-identical.
    vocab = (
        tok.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_n"))
        .localCheckpoint(eager=False)
    )
    total = vocab.agg(F.sum("_n").alias("_tot"))
    vocab = vocab.crossJoin(F.broadcast(total)).select(
        "_t", (-F.log2(F.col("_n") / F.col("_tot"))).alias("_bits")
    )
    vside = F.broadcast(vocab) if broadcast_vocab else vocab
    return (
        tok.join(vside, "_t")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_bits") / F.count(F.lit(1)), 6).alias("bits_per_token"),
        )
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dup_k: int = 6,
) -> DataFrame:
    """The rest of the Gopher repetition battery (Rae et al. 2021,
    appendix A1), WITHIN-document: fraction of characters covered by the
    single most frequent {2,3,4}-gram, plus the fraction of tokens
    inside duplicated ``dup_k``-grams (k-grams occurring >= 2 times in
    the SAME document), overlapping hits merged to maximal spans via
    gaps-and-islands. Complements ``gopher_quality_flags`` (which keeps
    only the top-2-gram rule as a flag) and ``duplicate_spans`` (the
    CORPUS-wide cross-document span profile — Gopher's within-doc
    metric answers a different question: self-repetition, the
    boilerplate/listicle signal).

    Plan shape: ONE posexplode + one per-doc lead window materializes
    every gram column in a single pass; the top-n fractions melt the
    three gram columns into (n, gram) rows for ONE count aggregate
    (conditional-max back to columns, no pivot scan), while the dup-k
    branch re-reads the explode for its per-(doc, gram) occurrence
    count — two token-grain passes total, each shuffling only
    doc-key-partitioned partial counts. The island window sees only
    duplicate hits, bounded by document length.
    """
    from pyspark.sql.window import Window

    tok_layer = fan_out(df, id_col).select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
        F.length(text_col).alias("_chars"),
    )
    base = tok_layer.select(
        id_col, F.size("_toks").cast("long").alias("n_tokens"), "_chars"
    )
    # posexplode the token expression INLINE, not the aliased "_toks":
    # InferFiltersFromGenerate infers size>0 only over attribute children,
    # and that filter pushes below fan_out's exchange into a serial
    # pre-parallelism tokenize of the corpus (r16, the setsim lesson).
    # The fan_out subtree is identical to tok_layer's, so the repartition
    # exchange is still reused at runtime.
    ex = fan_out(df, id_col).select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("_pos", "_t"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    leads = [F.col("_t")] + [
        F.lead("_t", i).over(w) for i in range(1, dup_k)
    ]
    for n in (2, 3, 4):
        ex = ex.withColumn(
            f"_g{n}",
            F.when(
                leads[n - 1].isNotNull(), F.concat_ws(" ", *leads[:n])
            ),
        )
    ex = ex.withColumn(
        f"_g{dup_k}",
        F.when(leads[dup_k - 1].isNotNull(), F.concat_ws(" ", *leads)),
    )

    melted = ex.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"), F.col(f"_g{n}").alias("g")
                    )
                    for n in (2, 3, 4)
                ]
            )
        ).alias("_m"),
    ).filter(F.col("_m.g").isNotNull())
    top = (
        melted.groupBy(id_col, "_m.n", "_m.g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col, "n")
        .agg(F.max(F.col("_c") * F.length("g")).alias("_v"))
        .groupBy(id_col)
        .agg(
            *[
                F.max(F.when(F.col("n") == n, F.col("_v"))).alias(
                    f"_top{n}"
                )
                for n in (2, 3, 4)
            ]
        )
    )

    g6 = ex.filter(F.col(f"_g{dup_k}").isNotNull()).select(
        id_col,
        (F.col("_pos") + 1).alias("p"),
        F.col(f"_g{dup_k}").alias("_g"),
    )
    dup_grams = (
        g6.groupBy(id_col, "_g")
        .agg(F.count(F.lit(1)).alias("_occ"))
        .filter(F.col("_occ") > 1)
        .select(id_col, "_g")
    )
    hits = g6.join(dup_grams, [id_col, "_g"], "left_semi").select(
        id_col, "p", (F.col("p") + F.lit(dup_k - 1)).alias("e")
    )
    wi = Window.partitionBy(id_col).orderBy("p")
    prev_end = F.max("e").over(wi.rowsBetween(Window.unboundedPreceding, -1))
    spans = (
        hits.withColumn(
            "_new",
            F.when(prev_end.isNull() | (F.col("p") > prev_end + 1), 1)
            .otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(wi))
        .groupBy(id_col, "_isl")
        .agg(F.min("p").alias("s"), F.max("e").alias("e"))
    )
    dup = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("_cov"),
    )

    return (
        base.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            *[
                F.round(
                    F.coalesce(F.col(f"_top{n}"), F.lit(0))
                    / F.greatest(F.col("_chars"), F.lit(1)),
                    6,
                ).alias(f"top{n}_char_frac")
                for n in (2, 3, 4)
            ],
            F.coalesce(F.col("dup_spans"), F.lit(0))
            .cast("long")
            .alias(f"dup{dup_k}_spans"),
            F.round(
                F.coalesce(F.col("_cov"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias(f"dup{dup_k}_token_frac"),
        )
    )


def bigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document bigram LM score: mean -log2 p(w2|w1) under the
    corpus's own add-alpha-smoothed bigram model — the conditional step
    up from ``unigram_surprisal`` toward the CCNet/KenLM perplexity
    filter. p(w2|w1) = (c(w1,w2) + a) / (c(w1) + a*V) with V = distinct
    token count; every observed bigram is in the model (trained on the
    corpus it scores), so scoring is an inner equi-join that drops
    nothing. Docs with < 2 tokens carry n_bigrams=0 and a NULL score
    (left join from the id spine) instead of vanishing.

    Shuffle budget: ONE corpus-token explode feeds both the bigram frame
    and the (tiny, 1-row) vocab-size aggregate; bigram counts come out of
    one map-side-combined groupBy; context counts c(w1) re-aggregate the
    bigram-vocabulary frame (vocab-sized, not corpus-sized). With
    ``broadcast_model`` (default) the scoring join is map-side — same
    ceiling/fallback contract as ``unigram_surprisal``: at web-scale
    bigram vocabularies (~10^9 rows) pass False and the join falls back
    to a shuffle join on (w1, w2).

    The adjacent-pair construction is two ``slice`` calls zipped
    JVM-side; ``zip_with`` is an interpreted higher-order expression but
    runs once per token (no Python, no shuffle) — the codegen-safe
    regexp devices used elsewhere don't extend to pairing."""
    base = fan_out(df, id_col).select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_w")
    )
    # slice length guarded to >= 0 so the size(_w) >= 2 pre-filter can go:
    # exploding an empty pair array drops the same rows, and the explicit
    # filter was not free — Catalyst pushed it through fan_out's
    # repartition down to the single-split scan, paying a serial
    # pre-exchange tokenize of the whole corpus (r16, the
    # setsim_prefix_join lesson; plans/r16/bigram_surprisal_before.txt
    # shows the regexp filter under the Exchange).
    n1 = F.greatest(F.size("_w") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(F.col("_w"), 1, n1),
        F.slice(F.col("_w"), 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    # each doc additionally emits ONE null-padded edge row (null, t1):
    # pair w2's cover tokens 2..n, the edge row token 1, so V (distinct
    # tokens) derives from the count frame alone — the former third
    # corpus tokenize (base.filter(size == 1)) is gone, and the edge
    # rows drop out of the scoring inner join on the null key (r16).
    edge_uni = F.when(
        F.size("_w") >= 1,
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("w1"),
                F.element_at("_w", 1).alias("w2"),
            )
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    big = (
        base.select(
            F.col(id_col), F.explode(F.concat(pairs, edge_uni)).alias("_p")
        )
        .select(
            F.col(id_col),
            F.col("_p.w1").alias("_w1"),
            F.col("_p.w2").alias("_w2"),
        )
    )
    # c12g feeds c1, vsize and the model join; the join-key null filters
    # Catalyst pushes below each consumer's exchange make the subtrees
    # non-canonical, so without materialization the bigram explode+count
    # chain executed FOUR times (executed-plan evidence in
    # plans/r16/bigram_surprisal_after.txt). One lazy localCheckpoint of
    # the vocab-sized frame collapses them (r16, guide SS3.3).
    c12g = (
        big.groupBy("_w1", "_w2")
        .agg(F.count(F.lit(1)).alias("_c12"))
        .localCheckpoint(eager=False)
    )
    c12 = c12g.filter(F.col("_w1").isNotNull())
    # c(w1) = occurrences of w1 as a context == sum over the bigram-vocab
    # frame — no second corpus pass.
    c1 = c12.groupBy("_w1").agg(F.sum("_c12").alias("_c1"))
    # V = distinct tokens over the count frame's w2 column (edge rows
    # included): exactly the same integer as the former
    # w1-keys ∪ w2-keys ∪ single-token-docs union.
    vsize = c12g.agg(F.count_distinct("_w2").alias("_v"))
    model = (
        c12.join(c1, "_w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "_w1",
            "_w2",
            (
                -F.log2(
                    (F.col("_c12") + F.lit(alpha))
                    / (F.col("_c1") + F.lit(alpha) * F.col("_v"))
                )
            ).alias("_bits"),
        )
    )
    mside = F.broadcast(model) if broadcast_model else model
    scored = (
        big.join(mside, ["_w1", "_w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("_bits") / F.count(F.lit(1)), 6).alias(
                "bits_per_bigram"
            ),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "bits_per_bigram",
        )
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Top-k characteristic terms per source by tf-idf (corpus curation
    view: what each domain actually contains). tf = term occurrences
    within the source; idf = ln((N_docs + 1) / (docfreq + 1)) with
    docfreq = number of docs containing the term.

    Both aggregates are one explode + map-side combine; the rank window
    partitions by source over the (source x vocab)-sized frame — bounded
    by vocabulary, not corpus. N_docs is a broadcast scalar frame, not a
    collected literal.
    """
    from pyspark.sql import Window

    tok = fan_out(df, id_col).select(
        F.col(id_col), F.col(group_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    # ONE corpus pass: tf and per-source distinct-doc counts come out of the
    # same (source, term) aggregate. A doc has exactly one source, so
    # term-grain docfreq = sum of the per-source distinct counts — a window
    # over the vocab-bounded frame, not a second scan of the corpus.
    tf = tok.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct(F.col(id_col)).alias("_df_src"),
    )
    tf = tf.withColumn(
        "docfreq", F.sum("_df_src").over(Window.partitionBy("term"))
    )
    n_docs = df.select(F.count(F.lit(1)).alias("_nd"))
    scored = tf.crossJoin(F.broadcast(n_docs)).withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * F.log((F.col("_nd") + 1) / (F.col("docfreq") + 1).cast("double")),
            6,
        ),
    )
    w = Window.partitionBy(group_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(group_col, "rank", "term", "tf", "docfreq", "tfidf")
    )


def char_ngram_entropy(
    df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document character n-gram Shannon entropy (bits): low entropy
    flags templated/repetitive text, degenerate high entropy flags
    byte-soup — a standard gibberish/boilerplate quality signal.

    Grams explode to (doc, gram) rows and combine twice (doc+gram counts,
    then per-doc entropy) — both aggregates are map-side combinable and
    the ALIGNED id partitioning keeps both combines co-located, so the
    plan is one text shuffle + one explode + local aggs. align=True is
    load-bearing (r16, caught by the full 10x probe): with enough input
    splits the conditional fan_out no-oped, the partitioning went
    undeclared, and Catalyst shuffled the near-all-distinct (doc, gram)
    frame instead — ~20x the bytes of the text exchange it saved.
    """
    # ONE codegen'd regexp scan per doc (r17, guide §4 — the
    # hashed_char_ngram_buckets device): the zero-width lookahead
    # captures the n chars ahead at every position, (?s) so
    # newline-spanning grams keep substring semantics. The former
    # transform-over-positions lambda evaluated INTERPRETED per element
    # AND CollapseProject inlined lower(text) into every element's
    # evaluation — O(len^2) per document, which the 10x probe exposed as
    # a 4.9x data-scaling ratio (the r16 align fix removed the gram
    # shuffle but not this per-doc tax). Same gram values in the same
    # order: positions with < n chars left yield no match, so short/NULL
    # docs produce the same empty/NULL array explode_outer keeps as a
    # null row.
    grams = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(f"(?s)(?=(.{{{n}}}))"), 1
    )
    ex = fan_out(df, id_col, align=True).select(
        F.col(id_col), F.explode_outer(grams).alias("_g")
    )
    cnt = ex.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
    return cnt.groupBy(id_col).agg(
        F.coalesce(F.sum(F.when(F.col("_g").isNotNull(), F.col("_c"))), F.lit(0))
        .cast("long")
        .alias("n_grams"),
        F.coalesce(
            F.round(
                F.log2(F.sum("_c"))
                - F.sum(F.col("_c") * F.log2(F.col("_c"))) / F.sum("_c"),
                6,
            ),
            F.lit(0.0),
        ).alias("entropy_bits"),
    )


def pretraining_split_report(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    seed: str = "s42",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The end-to-end curation dashboard: per train/val/test split, doc
    count, distinct-content count (exact-dup pressure), total token budget,
    and mean quality — the numbers a pretraining run is provisioned from.

    ONE corpus scan: the split expression and content hash ride through
    quality_score's aggregate as doc-grain extras (no re-scan, no doc_id
    join), then a second tiny aggregate folds doc-grain rows to the three
    split rows. count_distinct on the 16-byte hash is the only
    corpus-cardinality shuffle."""
    per_doc = quality_score(
        df,
        text_col,
        extra_cols={
            "split": _split_expr(weights, seed, id_col),
            "content_md5": F.md5(F.trim(F.lower(F.col(text_col)))),
        },
    )
    return per_doc.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("content_md5")).alias("n_unique_contents"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens_total"),
        F.round(F.avg("quality_score"), 6).alias("mean_quality"),
    )


def stratified_sample_k(
    df: DataFrame,
    k: int = 50,
    group_col: str = "source",
    seed: str = "s42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic fixed-k sample per group: rank docs within each group
    by their md5(seed||id) coordinate and keep the k smallest — the
    reproducible per-domain sample a curation review or eval-set draw
    needs (same docs every run, any cluster, no RNG state).

    One shuffle on the group key; the rank window partitions per group.
    Skew note: a group's window is single-task — for web-scale groups cut
    first with a threshold on the hash coordinate (k/n_group quantile),
    which needs only the group counts, then rank the survivors.
    """
    from pyspark.sql import Window

    u = _split_u(seed, id_col)
    w = Window.partitionBy(group_col).orderBy(
        F.col("_u").asc(), F.col(id_col).asc()
    )
    return (
        df.select(id_col, group_col, u.alias("_u"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(
            group_col,
            F.col("sample_rank").cast("bigint").alias("sample_rank"),
            id_col,
            F.round("_u", 6).alias("sample_u"),
        )
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int = 50,
    weight_col: str = "n_chars",
    seed: str = "w42",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling without replacement in ONE distributed pass
    (Efraimidis & Spirakis 2006, A-ES): each row draws a deterministic
    uniform u from md5(seed||id) and enters the race with exponential
    key e = -ln(u)/w — the k SMALLEST keys are exactly a weighted
    sample without replacement (the monotone transform of the paper's
    u^(1/w) top-k form). No RNG state, no sequential reservoir: the
    same draw on any cluster, any partitioning.

    Scale shape: orderBy(key).limit(k) compiles to TakeOrdered — each
    partition surfaces only its local top-k and the driver merges k
    rows per partition, which IS the published distributed-reservoir
    merge. Contrast apply_mixture_sample (per-source quotas) and
    stratified_sample_k (fixed-k per group, unweighted): this is the
    corpus-wide draw where selection probability must track a weight
    column (tokens, quality score) — the sampler behind
    temperature-free data mixing.

    u is offset to (0,1): u = (h32 + 0.5) / 2^32, so ln never sees 0
    and no row gets key 0 for free.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(float(2**32))
    ekey = -F.log(u) / F.col(weight_col)
    top = (
        df.filter(F.col(weight_col) > 0)
        .select(F.col(id_col), F.col(weight_col), ekey.alias("_ekey"))
        .orderBy(F.col("_ekey").asc(), F.col(id_col).asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("_ekey").asc(), F.col(id_col).asc())
    return top.select(
        F.row_number().over(w).cast("bigint").alias("sample_rank"),
        id_col,
        weight_col,
        F.round("_ekey", 6).alias("sample_key"),
    )


def _split_u(seed: str, id_col: str) -> Column:
    """md5(seed || id) mapped to [0, 1) — the shared split coordinate."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        / F.lit(float(2**32))
    )


def _split_expr(
    weights: dict[str, float] | None, seed: str, id_col: str
) -> Column:
    """The hash_split CASE expression as a bare column (shared rule)."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    u = _split_u(seed, id_col)
    expr: Column | None = None
    cum = 0.0
    for name, wt in weights.items():
        cum += wt / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(list(weights)[-1]))


def dup_ngram_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Within-document repetition profile: fraction of 2-gram / 3-gram
    occurrences that are repeats (RefinedWeb/Gopher-style duplication
    signals used to drop templated or boilerplate text). Pure per-row
    Catalyst expressions — scan-scales, nothing shuffles."""
    toks = tokens(F.lower(F.col(text_col)))

    def grams(k: int) -> Column:
        return _pos_grams(toks, k)

    def dup_frac(g: Column) -> Column:
        return F.round(
            (F.size(g) - F.size(F.array_distinct(g)))
            / F.greatest(F.size(g), F.lit(1)),
            6,
        )

    g2, g3 = grams(2), grams(3)
    return fan_out(df, id_col).select(
        id_col,
        F.size(g2).alias("n_2grams"),
        dup_frac(g2).alias("dup_2gram_frac"),
        F.size(g3).alias("n_3grams"),
        dup_frac(g3).alias("dup_3gram_frac"),
    )


def ngram_novelty(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-order novelty: for each document, the fraction of its
    distinct k-grams that appear in NO earlier document (id order stands
    in for ingest order) — the per-doc contribution signal a curriculum
    or dedup-priority pass ranks by: near-1 docs bring new content,
    near-0 docs restate the corpus.

    Plan: one explode to distinct (gram, doc_id) pairs, one map-side-
    combined min-aggregate per gram (the first-seer), one hash join back,
    one per-doc count — every shuffle carries (gram-hash, id)-width rows,
    never text. Linear in total gram occurrences at any corpus size.
    """
    toks = tokens(F.lower(F.col(text_col)))
    grams = F.array_distinct(_pos_grams(toks, k))
    dg = (
        fan_out(df, id_col)
        .select(F.col(id_col), F.explode_outer(grams).alias("g"))
    )
    first = (
        dg.filter(F.col("g").isNotNull())
        .groupBy("g")
        .agg(F.min(id_col).alias("_first"))
    )
    marked = dg.join(first, "g", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("g").alias("n_distinct_grams"),
            F.coalesce(
                F.sum((F.col("_first") == F.col(id_col)).cast("long")), F.lit(0)
            ).alias("n_novel_grams"),
        )
        .select(
            id_col,
            "n_distinct_grams",
            "n_novel_grams",
            F.round(
                F.col("n_novel_grams")
                / F.greatest(F.col("n_distinct_grams"), F.lit(1)),
                6,
            ).alias("novelty_frac"),
        )
    )


def duplicate_spans(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Position-level cross-document duplicate-SPAN profile (ExactSubstr
    refined: Lee et al. 2021 find verbatim shared substrings, not just
    shared fixed chunks).

    A token position belongs to a duplicated span when some k-gram
    covering it occurs anywhere else in the corpus (another document OR
    another offset of the same document). Overlapping k-gram hits are
    merged into MAXIMAL spans — the unit an actual dedup pass would cut
    out — via gaps-and-islands over the hit positions: a hit at position
    p covers tokens [p, p+k-1]; a new span starts when p jumps past the
    running covered end + 1 (running max because nested intervals can
    end before an earlier, longer one).

    Per doc: ``n_tokens``, ``n_dup_spans``, ``dup_tokens`` (tokens inside
    any span), ``longest_dup_span``, ``dup_token_frac`` — the removal
    cost-model a RefinedWeb-style pipeline reads before choosing between
    doc-drop and span-cut.

    Scale: the sliding k-gram layer is one transform over the token
    array (no shuffle, text never leaves the scan); duplicate marking is
    a count-per-hash aggregate + LEFT SEMI join, both shuffling only
    (id, pos, 16-byte md5) rows; the island window partitions by doc_id
    over ONLY the surviving duplicate hits (sparse in clean corpora) and
    is bounded by document length, never corpus size. Contrast
    `chunk_dedup_profile` (non-overlapping chunk grain, cheaper but
    offset-sensitive): this catches duplicates at ANY alignment.

    Perf notes (both measured at sf0.1, the corpus_clean CSE trap
    striking twice): (1) md5 is computed AFTER posexplode, not inside
    the transform lambda — HOF lambdas evaluate interpreted per element
    and md5-in-lambda measured 17x slower than the codegen'd
    post-explode hash; (2) the gram transform runs over a MATERIALIZED
    token column (`_toks` projected first), never over the raw
    regexp-tokenize expression — projecting n_tokens next to a
    transform whose lambda references the tokenize expression defeats
    subexpression elimination and re-tokenizes per element (6.3 s vs
    0.2 s for the same explode).
    """
    from pyspark.sql.window import Window

    tok_layer = fan_out(df, id_col).select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_toks")
    )
    tl = F.col("_toks")
    n = F.size(tl)
    pos = F.sequence(F.lit(1), n - (k - 1))
    gs = F.when(
        n >= k,
        F.transform(pos, lambda i: F.concat_ws(" ", F.slice(tl, i, k))),
    ).otherwise(F.array().cast("array<string>"))
    base = tok_layer.select(F.col(id_col), n.cast("long").alias("n_tokens"))
    ex = tok_layer.select(id_col, F.posexplode(gs)).select(
        id_col,
        (F.col("pos") + 1).alias("p"),
        F.md5("col").alias("h"),
    )
    dup_hashes = (
        ex.groupBy("h")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > 1)
        .select("h")
    )
    hits = ex.join(dup_hashes, "h", "left_semi").select(
        id_col, "p", (F.col("p") + F.lit(k - 1)).alias("e")
    )
    w = Window.partitionBy(id_col).orderBy("p")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = hits.withColumn(
        "new_span",
        F.when(prev_end.isNull() | (F.col("p") > prev_end + 1), 1).otherwise(0),
    ).withColumn("isl", F.sum("new_span").over(w))
    spans = flagged.groupBy(id_col, "isl").agg(
        F.min("p").alias("s"), F.max("e").alias("e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_tokens"),
        F.max(F.col("e") - F.col("s") + 1).alias("longest_dup_span"),
    )
    return (
        base.select(id_col, "n_tokens")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.coalesce("longest_dup_span", F.lit(0))
            .cast("long")
            .alias("longest_dup_span"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)),
                6,
            ).alias("dup_token_frac"),
        )
    )


def duplicate_span_cut(
    df: DataFrame, k: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The span-CUT intervention `duplicate_spans` is the cost model for
    (ExactSubstr, Lee et al. 2021 "Deduplicating Training Data Makes
    Language Models Better"): emit the cleaned corpus with every
    duplicated span cut, keeping ONE canonical occurrence corpus-wide.

    Canonical = the corpus-order FIRST occurrence of each duplicated
    k-gram (min (doc_id, position)); every LATER occurrence is a cut
    hit, and overlapping cut hits merge into maximal spans exactly as in
    `duplicate_spans` (gaps-and-islands, running-max covered end). The
    first occurrence of every duplicated k-gram therefore survives
    somewhere in the corpus (it may still lose flanking tokens to a
    NEIGHBORING duplicate's span — the standard ExactSubstr property;
    the guarantee is gram-level, not span-level).

    Output per doc: ``n_tokens``, ``kept_tokens``, ``cut_tokens``, and
    ``cut_text`` — the surviving tokens of the ORIGINAL-case text joined
    with single spaces (token-grain cut normalizes whitespace by
    construction; matching is case-folded, emission is not, and the two
    index identically because lowercasing never moves a \\S+ boundary).

    Scale shape: one tokenize pass; the gram layer hashes AFTER
    posexplode (codegen md5, the 17x lambda lesson); shuffles carry only
    (id, pos, md5) rows; the canonical pick is a count+min-struct
    aggregate on the gram hash; the island window sees only cut hits.
    The final cut joins a per-doc SPAN ARRAY (collect_list over few
    spans) back to the token layer and filters tokens with an
    index-aware lambda — per-token work is O(spans-in-doc), bounded by
    document length, never corpus size.
    """
    from pyspark.sql.window import Window

    from ..sources.readers import fan_out

    tok_layer = fan_out(df, id_col).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    tl = F.col("_toks")
    n = F.size(tl)
    pos = F.sequence(F.lit(1), n - (k - 1))
    gs = F.when(
        n >= k,
        F.transform(pos, lambda i: F.concat_ws(" ", F.slice(tl, i, k))),
    ).otherwise(F.array().cast("array<string>"))
    ex = tok_layer.select(id_col, F.posexplode(gs)).select(
        F.col(id_col),
        (F.col("pos") + 1).alias("p"),
        F.md5(F.lower(F.col("col"))).alias("h"),
    )
    canon = (
        ex.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("occ"),
            F.min(F.struct(F.col(id_col).alias("cd"), F.col("p").alias("cp"))).alias("c"),
        )
        .filter(F.col("occ") > 1)
        .select("h", "c.cd", "c.cp")
    )
    hits = (
        ex.join(canon, "h")
        .filter(~((F.col(id_col) == F.col("cd")) & (F.col("p") == F.col("cp"))))
        .select(id_col, "p", (F.col("p") + F.lit(k - 1)).alias("e"))
    )
    w = Window.partitionBy(id_col).orderBy("p")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = hits.withColumn(
        "new_span",
        F.when(prev_end.isNull() | (F.col("p") > prev_end + 1), 1).otherwise(0),
    ).withColumn("isl", F.sum("new_span").over(w))
    spans = flagged.groupBy(id_col, "isl").agg(
        F.min("p").alias("s"), F.max("e").alias("e")
    )
    doc_spans = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("s", "e")).alias("_spans")
    )
    joined = tok_layer.join(doc_spans, id_col, "left")
    kept = F.when(F.col("_spans").isNull(), tl).otherwise(
        F.filter(
            tl,
            lambda x, i: ~F.exists(
                F.col("_spans"),
                lambda sp: (i + 1 >= sp["s"]) & (i + 1 <= sp["e"]),
            ),
        )
    )
    return joined.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("kept_tokens"),
        (n - F.size(kept)).cast("long").alias("cut_tokens"),
        F.concat_ws(" ", kept).alias("cut_text"),
    )


def heavy_hitter_tokens(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 100,
    depth: int = 4,
    width: int = 16384,
) -> DataFrame:
    """Exact heavy-hitter tokens via a Count-Min-Sketch prefilter — the
    bounded-memory two-pass recipe (Cormode & Muthukrishnan 2005) that
    makes corpus-scale vocabulary statistics shuffle only the heavy tail.

    The naive plan (groupBy(token).count over every occurrence) shuffles
    the ENTIRE vocabulary — at 100 TB that is billions of distinct rare
    tokens crossing the wire to be counted once and discarded. Instead:

    1. CMS pass: each occurrence increments ``depth`` counters at
       ``pmod(xxhash64(tok, j), width)``. Expressed as a groupBy over
       (j, position): map-side partial aggregation bounds the exchange at
       ``partitions x depth x width`` rows regardless of corpus size,
       and the driver collects exactly the ``depth x width`` sketch —
       the bounded-merge-state argument again.
    2. Filter pass: every occurrence's estimate = min over j of its
       sketch cell (depth broadcast map-side joins of the tiny per-row
       sketch slices — zero Python, zero shuffle). CMS never
       underestimates, so estimate < min_count is *proof* the token is
       light: only candidate occurrences reach the exact groupBy.
    3. Exact verify: groupBy(token) over survivors, HAVING the true
       count >= min_count — false positives from sketch collisions die
       here, so the output is EXACTLY the true heavy hitters (the SQL
       oracle replays plain GROUP BY ... HAVING semantics).

    Candidate-occurrence fraction is measured in SCALING §2g; collision
    behavior is pinned in tests (a light token sharing cells with heavy
    ones survives the prefilter but not the verify).
    """
    spark = df.sparkSession
    ex = fan_out(df.select(text_col)).select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok")
    )

    def pos(j: int) -> Column:
        return F.pmod(F.xxhash64(F.col("tok"), F.lit(j)), F.lit(width))

    sketch_pd = (
        ex.select(
            F.posexplode(F.array(*[pos(j) for j in range(depth)])).alias(
                "j", "p"
            )
        )
        .groupBy("j", "p")
        .agg(F.count(F.lit(1)).alias("cms_n"))
        .toPandas()
    )
    est = ex.select("tok", *[pos(j).alias(f"p{j}") for j in range(depth)])
    mins = []
    for j in range(depth):
        part = sketch_pd[sketch_pd["j"] == j][["p", "cms_n"]]
        cms_j = spark.createDataFrame(
            part.rename(columns={"p": f"p{j}", "cms_n": f"cms_n{j}"}),
            f"p{j} bigint, cms_n{j} bigint",
        )
        est = est.join(F.broadcast(cms_j), f"p{j}")
        mins.append(F.col(f"cms_n{j}"))
    cand = est.filter(F.least(*mins) >= min_count)
    return (
        cand.groupBy(F.col("tok").alias("token"))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("token"))
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact BM25 (Robertson-Sparck Jones) lexical retrieval top-k — the
    keyword side of a retrieval pipeline, complementing the ANN stack's
    embedding side.

    Scale shape: the heavy pass explodes tokens but filters to the query
    terms MAP-SIDE before any aggregation, so the (doc, term) frequency
    shuffle carries only matching occurrences — O(query hits), not
    O(corpus tokens). Document length rides through that same explode
    (size computed pre-explode), so no second join against a length
    table; the corpus stats (N, avgdl) fold to ONE row, broadcast via
    crossJoin; per-term document frequencies are a query-terms-sized
    frame, broadcast into the scoring join. Total: one token-bearing
    scan + one tiny length scan, zero corpus-sized joins.

    Scores are rounded to 6dp (the accepted float boundary class shared
    with the cosine oracles).
    """
    toks = tokens(F.lower(F.col(text_col)))
    dl = df.select(F.col(id_col), F.size(toks).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    occ = (
        df.select(F.col(id_col), F.size(toks).alias("dl"),
                  F.explode(toks).alias("tok"))
        .filter(F.col("tok").isin([str(t) for t in query_terms]))
    )
    # tf feeds BOTH the df_t broadcast branch and the scoring branch;
    # without materialization the corpus explode runs twice (the
    # no-subplan-sharing gotcha, same as Q15). The frame is query-hits
    # sized, so the eager checkpoint is cheap and releases with scope.
    tf = (
        occ.groupBy(id_col, "tok")
        .agg(
            F.count(F.lit(1)).cast("double").alias("tf"),
            F.first("dl").alias("dl"),
        )
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("df_t")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_s",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df_t") + 0.5)
                / (F.col("df_t") + 0.5)
            )
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def trigram_surprisal(
    df: DataFrame,
    model_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff: float = 0.4,
    alpha: float = 0.1,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document trigram LM score with STUPID BACKOFF (Brants et al.
    2007) — the order-3 step from ``bigram_surprisal`` toward the
    KenLM-class perplexity filter, and the first of the family where the
    model can be trained on a DIFFERENT corpus than it scores
    (``model_df``; CCNet trains on Wikipedia, scores the crawl). Score
    per position:

        S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)        if the trigram is
                                                       in the model
                      = backoff * S(w3 | w2)           else
        S(w3 | w2)    = c(w2 w3) / c(w2)               if the bigram is
                      = backoff * S(w3)                else
        S(w3)         = (c(w3) + alpha) / (N + alpha*V)

    — pure count ratios at the trigram/bigram levels (stupid backoff
    uses no discounting), with one add-alpha pseudo-count at the unigram
    floor so out-of-vocabulary words score finitely instead of -inf
    (Brants leaves OOV handling to the application). Contexts are
    re-aggregations of the gram frames (c(w1 w2) = occurrences as a
    trigram context), so the model build is ONE token explode over the
    model corpus feeding three map-side-combined groupBys; scoring is
    ONE explode over the scored corpus and three broadcast left joins
    (same web-scale fallback contract as ``bigram_surprisal``:
    ``broadcast_model=False`` switches to shuffle joins). Docs with
    < 3 tokens keep n_trigrams=0 and a NULL score.
    """
    model_df = df if model_df is None else model_df

    def _grams(frame):
        base = fan_out(frame, id_col).select(
            F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_w")
        )
        # slice lengths clamped to >= 0: short docs yield empty gram
        # arrays (explode drops them), so the size(_w) >= {2,3} filters
        # are unnecessary — and they were not free: Catalyst pushed each
        # through fan_out's repartition to the single-split scan, paying
        # a serial pre-exchange tokenize per consumer (r16, the
        # setsim_prefix_join lesson).
        n2 = F.greatest(F.size("_w") - 1, F.lit(0))
        n3 = F.greatest(F.size("_w") - 2, F.lit(0))
        p23 = F.zip_with(
            F.slice(F.col("_w"), 2, n3),
            F.slice(F.col("_w"), 3, n3),
            lambda b, c: F.struct(b.alias("w2"), c.alias("w3")),
        )
        tri = F.zip_with(
            F.slice(F.col("_w"), 1, n3),
            p23,
            lambda a, bc: F.struct(
                a.alias("w1"),
                bc["w2"].alias("w2"),
                bc["w3"].alias("w3"),
            ),
        )
        pair = F.zip_with(
            F.slice(F.col("_w"), 1, n2),
            F.slice(F.col("_w"), 2, n2),
            lambda a, b: F.struct(a.alias("w2"), b.alias("w3")),
        )
        return base, tri, pair

    mbase, mtri, _mpair = _grams(model_df)
    # ONE model-corpus explode builds all three gram grains (r16):
    # alongside the trigram structs, each doc emits two null-padded edge
    # rows — (null, t1, t2) for n>=2 and (null, null, t1) for n>=1 — so
    # the finest-grain count frame g123 derives the LOWER orders exactly:
    #   trigrams  = rows with w1 IS NOT NULL                 (j = 1..n-2)
    #   bigrams   = (w2, w3) of rows with w2 IS NOT NULL     (trigram rows
    #               cover positions 2..n-1, the edge row position 1)
    #   unigrams  = w3 of EVERY row (trigram rows cover t3..tn, edge rows
    #               t2 and t1 — each token exactly once)
    # Counts are integer sums, bit-identical to the former three separate
    # corpus explodes; only the pass count changes (3 tokenizes -> 1).
    _null_s = F.lit(None).cast("string")
    _empty3 = F.array().cast(
        "array<struct<w1:string,w2:string,w3:string>>"
    )
    _n = F.size("_w")
    edge_bi = F.when(
        _n >= 2,
        F.array(
            F.struct(
                _null_s.alias("w1"),
                F.element_at("_w", 1).alias("w2"),
                F.element_at("_w", 2).alias("w3"),
            )
        ),
    ).otherwise(_empty3)
    edge_uni = F.when(
        _n >= 1,
        F.array(
            F.struct(
                _null_s.alias("w1"),
                _null_s.alias("w2"),
                F.element_at("_w", 1).alias("w3"),
            )
        ),
    ).otherwise(_empty3)
    g123 = (
        mbase.select(
            F.explode(F.concat(mtri, edge_bi, edge_uni)).alias("_t")
        )
        .select(
            F.col("_t.w1").alias("_w1"),
            F.col("_t.w2").alias("_w2"),
            F.col("_t.w3").alias("_w3"),
        )
        .groupBy("_w1", "_w2", "_w3")
        .agg(F.count(F.lit(1)).alias("_c123"))
        # five consumers with different pushed filters/prunings below
        # the exchange (no reuse): materialize the vocab-sized frame once
        .localCheckpoint(eager=False)
    )
    tri_counts = g123.filter(F.col("_w1").isNotNull())
    tri_ctx = tri_counts.groupBy("_w1", "_w2").agg(
        F.sum("_c123").alias("_c12")
    )
    tri_model = tri_counts.join(tri_ctx, ["_w1", "_w2"]).select(
        "_w1", "_w2", "_w3", (F.col("_c123") / F.col("_c12")).alias("_s3")
    )
    big_counts = (
        g123.filter(F.col("_w2").isNotNull())
        .groupBy("_w2", "_w3")
        .agg(F.sum("_c123").alias("_c23"))
    )
    big_ctx = big_counts.groupBy("_w2").agg(F.sum("_c23").alias("_c2"))
    big_model = big_counts.join(big_ctx, "_w2").select(
        "_w2", "_w3", (F.col("_c23") / F.col("_c2")).alias("_s2")
    )
    uni_counts = g123.groupBy("_w3").agg(F.sum("_c123").alias("_c3"))
    # N and V from the VOCAB-sized unigram frame (r16, the
    # unigram_surprisal lesson): both are re-aggregations of g123, so no
    # corpus pass exists beyond the single explode above.
    totals = uni_counts.agg(
        F.sum("_c3").alias("_n"),
        F.count(F.lit(1)).alias("_v"),
    )

    def _m(frame):
        return F.broadcast(frame) if broadcast_model else frame

    sbase, stri, _sp = _grams(df)
    pos = (
        sbase.select(F.col(id_col), F.explode(stri).alias("_t"))
        .select(
            F.col(id_col),
            F.col("_t.w1").alias("_w1"),
            F.col("_t.w2").alias("_w2"),
            F.col("_t.w3").alias("_w3"),
        )
    )
    uni_s = (F.coalesce(F.col("_c3"), F.lit(0)) + F.lit(alpha)) / (
        F.col("_n") + F.lit(alpha) * F.col("_v")
    )
    scored = (
        pos.join(_m(tri_model), ["_w1", "_w2", "_w3"], "left")
        .join(_m(big_model), ["_w2", "_w3"], "left")
        .join(_m(uni_counts), ["_w3"], "left")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_s",
            F.coalesce(
                F.col("_s3"),
                F.lit(backoff)
                * F.coalesce(F.col("_s2"), F.lit(backoff) * uni_s),
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(
                F.sum(-F.log2(F.col("_s"))) / F.count(F.lit(1)), 6
            ).alias("bits_per_trigram"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_trigrams"), F.lit(0)).alias("n_trigrams"),
            "bits_per_trigram",
        )
    )


def fuzzy_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """FUZZY benchmark decontamination report: per-source rates of
    training documents that are NEAR-duplicates of an eval/benchmark doc
    (exact k-shingle Jaccard >= threshold) — the companion to
    ``ngram_decontaminate`` for leakage that survives a paraphrase or
    reformat, where no single long n-gram matches verbatim but most of
    the shingle set does (the fuzzy dedup rule the Llama/GPT corpus
    reports describe for eval scrubbing).

    Scale shape: candidate generation is the LSH band equijoin of
    ``dedup.incremental_near_dup`` with the EVAL set as the index side —
    eval sets are tiny, so their signature/band frames broadcast and the
    training corpus is one signature pass; the exact-Jaccard verify
    re-shingles only candidate docs on both sides. Output grain is the
    SOURCE (the curation decision unit): docs, contaminated docs, rate,
    and the worst observed similarity — the audit view a corpus owner
    reads before cutting a source or tightening the threshold.
    """
    from .dedup import incremental_near_dup

    pairs = incremental_near_dup(
        train, eval_docs, text_col, id_col, n_hashes, bands, k,
        threshold=threshold, broadcast_index=True,
    )
    flagged = pairs.groupBy(F.col("id_a").alias(id_col)).agg(
        F.max("jaccard").alias("_best")
    )
    per_doc = train.select(id_col, group_col).join(flagged, id_col, "left")
    return (
        per_doc.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("_best").alias("n_contaminated"),
            F.round(
                F.count("_best") / F.count(F.lit(1)), 6
            ).alias("contamination_rate"),
            F.max("_best").alias("max_jaccard"),
        )
        .orderBy(group_col)
    )


def dsir_importance(
    pool: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    broadcast_model: bool = True,
) -> DataFrame:
    """DSIR-style importance scores for data selection (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score each pool document by how much more likely its tokens are
    under the TARGET domain's unigram LM than under the pool's own —
    log p_t(w) - log p_c(w) summed over the doc, reported per token so
    the score ranks content, not length. Both LMs are add-alpha
    smoothed over the UNION vocabulary, so out-of-domain tokens get a
    finite penalty instead of -inf. (DSIR proper hashes n-grams into
    buckets and Gumbel-samples; the unigram exact form keeps the same
    importance-weight structure SQL-replayable, and selection downstream
    is the deterministic top-k — a TakeOrdered, not a global window.)

    Scale shape: one token explode per side; the two count frames merge
    with a full-outer join into ONE vocab-sized log-ratio model that
    broadcasts into the scoring join (``broadcast_model=False`` for
    open-vocabulary corpora switches to a shuffle join on the token —
    same contract as the surprisal family). Scalars (N_t, N_c, V) ride
    a 1-row broadcast crossJoin; nothing collects.
    """
    ptok = fan_out(pool, id_col).select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_w")
    )
    ttok = target.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_w")
    )
    cc = ptok.groupBy("_w").agg(F.count(F.lit(1)).alias("_cc"))
    ct = ttok.groupBy("_w").agg(F.count(F.lit(1)).alias("_ct"))
    # consumed by both scalars and model: materialize the vocab-sized
    # count frame once or the two explode+count passes re-run per
    # consumer (column pruning defeats exchange reuse; r16, guide §3.3)
    counts = cc.join(ct, "_w", "full_outer").select(
        "_w",
        F.coalesce("_cc", F.lit(0)).alias("_cc"),
        F.coalesce("_ct", F.lit(0)).alias("_ct"),
    ).localCheckpoint(eager=False)
    scalars = counts.agg(
        F.sum("_cc").alias("_nc"),
        F.sum("_ct").alias("_nt"),
        F.count(F.lit(1)).alias("_v"),
    )
    model = counts.crossJoin(F.broadcast(scalars)).select(
        "_w",
        (
            F.log((F.col("_ct") + F.lit(alpha)) / (F.col("_nt") + F.lit(alpha) * F.col("_v")))
            - F.log((F.col("_cc") + F.lit(alpha)) / (F.col("_nc") + F.lit(alpha) * F.col("_v")))
        ).alias("_lr"),
    )
    mside = F.broadcast(model) if broadcast_model else model
    scored = (
        ptok.join(mside, "_w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("_lr") / F.count(F.lit(1)), 6).alias(
                "logratio_per_token"
            ),
        )
    )
    # every pool doc keeps a row: token-less docs score 0 tokens, NULL
    return (
        pool.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "logratio_per_token",
        )
    )


def hashed_gram_buckets(
    text_col: Column, n_buckets: int = 4096, binarized: bool = False
) -> Column:
    """Hashing-trick feature ids for a document: unigrams AND word
    bigrams hashed into a FIXED ``n_buckets``-dimensional space — the
    fastText / CCNet quality-classifier feature map (Joulin et al. 2016;
    Wenzek et al. 2020 use exactly this family to score crawl text
    against a clean corpus). Collisions are intended: the model size is
    bounded by the bucket count, never the vocabulary, which is what
    lets the weight vector broadcast at 100-TB corpus scale.

    The hash is md5-prefix mod buckets, NOT Spark's murmur `hash()` —
    md5 is bit-identical across engines, so a DuckDB oracle can replay
    bucket assignment exactly (the `('0x'||substr(md5(g),1,8))::BIGINT`
    device). Returns an array<bigint> of bucket ids, one per gram
    occurrence; ``binarized=True`` returns the distinct bucket set
    instead. Binarized callers should prefer the flag over their own
    ``array_distinct``: the per-gram hash lambda is an INTERPRETED
    higher-order expression, so deduplicating the gram STRINGS first
    (native codegen) cuts its evaluations by the text's duplication
    factor, and distinct(hash(distinct(grams))) == distinct(hash(grams))
    exactly (r16)."""
    w = tokens(F.lower(text_col))
    pair_len = F.greatest(F.size(w) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(w, F.lit(1), pair_len),
        F.slice(w, F.lit(2), pair_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(w, bigrams)
    if binarized:
        grams = F.array_distinct(grams)
    out = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast(
            "bigint"
        )
        % F.lit(n_buckets),
    )
    return F.array_distinct(out) if binarized else out


def _with_buckets(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) pairs, BINARIZED per document (NBSVM indicators:
    Wang & Manning 2012 measure presence, not count — binarized NB
    features are the stronger text-classification baseline)."""
    return df.select(
        F.col(id_col),
        F.explode(
            hashed_gram_buckets(F.col(text_col), n_buckets, binarized=True)
        ).alias("bucket"),
    )


def hashed_char_ngram_buckets(
    text_col: Column, n: int = 3, n_buckets: int = 4096,
    binarized: bool = False,
) -> Column:
    """Hashing-trick feature ids over CHARACTER n-grams — the fastText
    langid feature family (Joulin et al. 2016): char n-grams carry the
    orthographic signal (accents, digraphs, script) that word features
    miss, and the fixed bucket space bounds the model by bucket count,
    never vocabulary. Same md5-prefix bucket device as
    hashed_gram_buckets so a DuckDB oracle replays assignment exactly.

    Overlapping grams come from ONE codegen'd regexp scan — a
    zero-width lookahead ``(?s)(?=(.{n}))`` captures the n chars ahead
    at every position ((?s) so newline-spanning grams match the
    oracle's substr semantics). The obvious alternative — a transform
    lambda doing ``substr(text, i, n)`` over a position sequence —
    evaluates INTERPRETED per element AND inlines any composed outer
    expression (e.g. ``lower(text)``) into every element's evaluation
    (CollapseProject folds an upstream projection back in), going
    O(len^2) per document: measured 7.3 s vs 3.4 s warm at sf0.1 on
    the langid scorer. Only the per-gram hash transform remains a
    lambda, and it references nothing but its own element (binarization
    must dedup at BUCKET level per document, which array_distinct does
    row-locally — exploding grams and hashing at row grain would need a
    (doc, bucket) distinct shuffle instead). ``binarized=True`` dedups
    the gram STRINGS before that interpreted hash lambda (native
    codegen, ~2x fewer evaluations on this corpus) and returns the
    distinct bucket set — distinct(hash(distinct(g))) ==
    distinct(hash(g)) exactly (r16)."""
    grams = F.regexp_extract_all(
        F.lower(text_col), F.lit(f"(?s)(?=(.{{{n}}}))"), 1
    )
    if binarized:
        grams = F.array_distinct(grams)
    out = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint")
        % F.lit(n_buckets),
    )
    return F.array_distinct(out) if binarized else out


def langid_classifier_nb(
    train: DataFrame,
    score: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    ngram: int = 3,
) -> DataFrame:
    """Learned language-ID SCORING path (the fastText-langid shape the
    CCNet pipeline pairs with its quality filter; Joulin et al. 2016 /
    Wenzek et al. 2020): multiclass multinomial Naive Bayes over
    binarized hashed char-``ngram`` indicators. Per class c and bucket
    j the frozen weight is w_cj = ln((c_cj + a) / (T_c + aB)) with
    class prior ln(n_c / N) and per-class OOV weight ln(a / (T_c + aB))
    for buckets a document has but class c never saw — analytic counts,
    so the ENTIRE path (training counts -> weights -> per-class scores
    -> argmax) is SQL-replayable, like quality_classifier_nb.

    Prediction is argmax over ROUNDED (6dp) per-class scores with the
    class name as tie-break — rounding before the argmax is what makes
    the pick engine-exact (raw double sums can differ in the last bits
    across summation orders).

    Scale shape (r16): ONE gram pass per side. The score half explodes
    once, with the per-document indicator count riding the exploded
    rows (explode_outer keeps gram-less docs), so neither a second
    n_feats explode nor a spine re-scan of the corpus exists; the one
    heavy (id, class) aggregate is localCheckpointed (narrow
    docs x classes metadata — the guide's "decide on small rows"
    frame) because its two consumers (per-doc spine, per-class
    presence) prune different columns and would otherwise each re-run
    the explode. Training counts checkpoint the same way (<= n_buckets
    * n_classes rows) so weights/totals/meta share one train pass. The
    final argmax is a map-side min_by over (-score, class) — the
    window shuffle is gone. Values are bit-identical to the r15
    two-pass form (same aggregation grains, same rounding before
    argmax). Returns one row per scored document:
    (id, lang_pred, score, n_feats)."""
    aB = alpha * n_buckets

    lab = train.select(F.col(id_col), F.col(label_col).alias("_c"))
    counts = (
        train.select(
            F.col(id_col),
            F.explode(
                hashed_char_ngram_buckets(
                    F.col(text_col), ngram, n_buckets, binarized=True
                )
            ).alias("bucket"),
        )
        .join(lab, id_col)
        .groupBy("_c", "bucket")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("_c").agg(
        F.sum("_cnt").cast("double").alias("_tc")
    )
    weights = counts.join(totals, "_c").select(
        "_c",
        "bucket",
        F.log((F.col("_cnt") + F.lit(alpha)) / (F.col("_tc") + F.lit(aB))).alias(
            "_w"
        ),
    )
    nclass = lab.groupBy("_c").agg(F.count(F.lit(1)).alias("_nc"))
    ntot = nclass.agg(F.sum("_nc").cast("double").alias("_n"))
    meta = (
        nclass.join(totals, "_c")
        .crossJoin(F.broadcast(ntot))
        .select(
            "_c",
            F.log(F.col("_nc") / F.col("_n")).alias("_prior"),
            F.log(F.lit(alpha) / (F.col("_tc") + F.lit(aB))).alias("_oov"),
        )
    )
    # one explode of the score half; n_feats (the distinct-bucket count)
    # rides every exploded row, explode_outer keeps gram-less docs as a
    # null-bucket row so no corpus spine re-scan is needed
    sb = (
        score.select(
            F.col(id_col),
            hashed_char_ngram_buckets(
                F.col(text_col), ngram, n_buckets, binarized=True
            ).alias("_b"),
        )
        .select(
            F.col(id_col),
            F.greatest(F.size("_b"), F.lit(0)).alias("n_feats"),
            F.explode_outer("_b").alias("bucket"),
        )
    )
    per_class = (
        sb.join(F.broadcast(weights), "bucket", "left")
        .groupBy(id_col, "_c")
        .agg(
            F.sum("_w").alias("_sw"),
            F.count("_w").alias("_np"),
            F.max("n_feats").alias("n_feats"),
        )
        .localCheckpoint(eager=False)
    )
    nf = per_class.groupBy(id_col).agg(F.max("n_feats").alias("n_feats"))
    present = per_class.filter(F.col("_c").isNotNull()).select(
        id_col, "_c", "_sw", "_np"
    )
    spine = nf.crossJoin(F.broadcast(meta))
    scored = spine.join(present, [id_col, "_c"], "left").select(
        id_col,
        "_c",
        "n_feats",
        F.round(
            F.col("_prior")
            + F.coalesce("_sw", F.lit(0.0))
            + (F.col("n_feats") - F.coalesce("_np", F.lit(0))) * F.col("_oov"),
            6,
        ).alias("score"),
    )
    best = scored.groupBy(id_col).agg(
        F.min_by(
            F.struct("_c", "score", "n_feats"),
            F.struct((-F.col("score")).alias("_s"), F.col("_c").alias("_t")),
        ).alias("_b")
    )
    return best.select(
        id_col,
        F.col("_b._c").alias("lang_pred"),
        F.col("_b.score").alias("score"),
        F.col("_b.n_feats").alias("n_feats"),
    )


def quality_classifier_nb(
    train: DataFrame,
    score: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    alpha: float = 1.0,
    broadcast_model: bool = True,
) -> DataFrame:
    """Learned quality-filter SCORING path (CCNet, Wenzek et al. 2020):
    train per-bucket log-odds weights from a labeled corpus half, then
    score held-out documents with a logistic link over the hashed-gram
    indicators. The weights are the closed-form Naive-Bayes log-count
    ratios of NBSVM (Wang & Manning 2012) —
    w_j = ln((pos_j+a)/(POS+aB)) - ln((neg_j+a)/(NEG+aB)), bias =
    ln(n_pos/n_neg) — i.e. the logistic-regression scoring form with
    analytically-frozen weights, which keeps the whole path (train
    counts -> weights -> sigmoid scores) SQL-replayable the way
    `dsir_importance` replays its LM. For iteratively-TRAINED weights
    see `logistic_fit_hashed` (the rows-only twin).

    Scale shape: one gram explode per side; training is two hash
    aggregations to a ≤n_buckets weight frame that BROADCASTS into the
    scoring join (the fixed bucket space is the point — vocabulary
    growth never inflates the model); class totals ride a 1-row
    broadcast crossJoin; buckets unseen in training score the smoothed
    OOV weight (never silently 0). Nothing collects.
    """
    tb = _with_buckets(train, text_col, id_col, n_buckets)
    lab = train.select(F.col(id_col), F.col(label_col).cast("int").alias("_y"))
    # counts is consumed by both scalars and weights, and scalars by three
    # downstream joins; column pruning makes each consumer's subtree
    # non-canonical (no exchange reuse), so without materialization the
    # train-side gram explode executes three times. localCheckpoint the
    # <= n_buckets-row frame once (r16, guide §3.3).
    counts = (
        tb.join(lab, id_col)
        .groupBy("bucket")
        .agg(
            F.sum("_y").alias("_pos"),
            F.sum(1 - F.col("_y")).alias("_neg"),
        )
        .localCheckpoint(eager=False)
    )
    scalars = (
        counts.agg(
            F.sum("_pos").alias("_post"), F.sum("_neg").alias("_negt")
        )
        .crossJoin(
            F.broadcast(
                lab.agg(
                    F.sum("_y").alias("_npos"),
                    F.sum(1 - F.col("_y")).alias("_nneg"),
                )
            )
        )
        .localCheckpoint(eager=False)
    )
    aB = alpha * n_buckets

    def _w(pos, neg):
        return F.log((pos + F.lit(alpha)) / (F.col("_post") + F.lit(aB))) - F.log(
            (neg + F.lit(alpha)) / (F.col("_negt") + F.lit(aB))
        )

    weights = counts.crossJoin(F.broadcast(scalars)).select(
        "bucket", _w(F.col("_pos"), F.col("_neg")).alias("_w")
    )
    sb = _with_buckets(score, text_col, id_col, n_buckets)
    wside = F.broadcast(weights) if broadcast_model else weights
    # scalars again for the OOV weight + bias; 1 row, broadcast
    summed = (
        sb.join(wside, "bucket", "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            F.coalesce(F.col("_w"), _w(F.lit(0), F.lit(0))).alias("_wv"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("_wv").alias("_s"),
        )
    )
    bias = F.log(F.col("_npos") / F.col("_nneg"))
    return (
        score.select(id_col)
        .join(summed, id_col, "left")
        .crossJoin(F.broadcast(scalars))
        .select(
            F.col(id_col),
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.round(
                F.lit(1)
                / (F.lit(1) + F.exp(-(F.coalesce(F.col("_s"), F.lit(0.0)) + bias))),
                6,
            ).alias("quality_prob"),
        )
        .withColumn("keep", F.col("quality_prob") >= 0.5)
    )


def logistic_fit_hashed(
    train: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    n_iters: int = 20,
    lr: float = 0.5,
) -> DataFrame:
    """Distributed logistic-regression TRAINING over hashed-gram
    indicators — full-batch gradient descent where the DATA never moves
    and only the O(n_buckets) weight vector does. Each iteration:
    broadcast w into a margin join (per-doc score = b + sum w_j), one
    aggregation for the per-doc residual (sigma(s) - y), one join+agg
    back to bucket grain for the gradient, and a driver-side update of
    the <=n_buckets-row weight array. That is the scalable shape for a
    trained quality filter at 100 TB: K passes over distributed
    indicators, never a collected design matrix. Iterative training is
    genuinely non-SQL-expressible, so this is a rows-only surface
    (pytest-verified against a pure-numpy reference on the same data);
    the frozen-weight SCORING path with the analytic NBSVM weights is
    the oracle-attested twin (`quality_classifier_nb`).

    Returns (bucket, weight) rows plus a bucket=-1 row carrying the
    bias, rounded 6dp.
    """
    import numpy as np

    feats = _with_buckets(train, text_col, id_col, n_buckets).persist()
    lab = (
        train.select(F.col(id_col), F.col(label_col).cast("double").alias("_y"))
        .persist()
    )
    n_docs = lab.count()
    feats.count()
    spark = train.sparkSession
    w = np.zeros(n_buckets)
    b = 0.0
    try:
        for _ in range(n_iters):
            wdf = F.broadcast(
                spark.createDataFrame(
                    [(int(j), float(w[j])) for j in range(n_buckets)],
                    "bucket bigint, _w double",
                )
            )
            resid = (
                feats.join(wdf, "bucket")
                .groupBy(id_col)
                .agg(F.sum("_w").alias("_s"))
                .join(lab, id_col, "right")
                .select(
                    F.col(id_col),
                    (
                        F.lit(1)
                        / (
                            F.lit(1)
                            + F.exp(-(F.coalesce(F.col("_s"), F.lit(0.0)) + F.lit(b)))
                        )
                        - F.col("_y")
                    ).alias("_r"),
                )
            )
            grad_rows = (
                feats.join(resid, id_col)
                .groupBy("bucket")
                .agg(F.sum("_r").alias("_g"))
                .collect()  # bounded: <= n_buckets rows
            )
            gb = resid.agg(F.sum("_r")).collect()[0][0]  # 1 scalar
            g = np.zeros(n_buckets)
            for r in grad_rows:
                g[r["bucket"]] = r["_g"]
            w -= lr * g / n_docs
            b -= lr * float(gb) / n_docs
    finally:
        feats.unpersist()
        lab.unpersist()
    rows = [(int(j), round(float(w[j]), 6)) for j in range(n_buckets)]
    rows.append((-1, round(b, 6)))
    return spark.createDataFrame(rows, "bucket bigint, weight double")


_BPE_MARK = "·"  # symbol-boundary marker for the string-shape device


def _bpe_shape(col: Column) -> Column:
    """A word as its BPE symbol-shape string: every symbol wrapped in
    its OWN marker pair ('low' -> '·l··o··w·' — a DOUBLE marker between
    symbols, single at the ends). A merge (a, b) is then ONE codegen'd
    global regexp_replace of '·a··b·' with '·ab·': each match consumes
    one marker from each side's double boundary, so two ADJACENT
    occurrences still both match ('s e s e s' + merge (e,s) ->
    [s, es, es], the greedy leftmost pass of the reference algorithm —
    a single-marker scheme would silently skip the second occurrence
    because the shared boundary is consumed by the first match, and
    lookahead is off the table: DuckDB's RE2 oracle side has none)."""
    return F.concat(
        F.lit(_BPE_MARK),
        F.array_join(
            F.filter(F.split(col, ""), lambda c: c != ""),
            _BPE_MARK + _BPE_MARK,
        ),
        F.lit(_BPE_MARK),
    )


def _bpe_merge_expr(col: Column, left: str, right: str) -> Column:
    """Apply one learned merge to a shape column (regex-escaped via
    java.util-compatible re.escape; replacement escapes \\ and $)."""
    import re

    pat = (
        _BPE_MARK
        + re.escape(left)
        + _BPE_MARK
        + _BPE_MARK
        + re.escape(right)
        + _BPE_MARK
    )
    rep = (
        _BPE_MARK
        + (left + right).replace("\\", "\\\\").replace("$", "\\$")
        + _BPE_MARK
    )
    return F.regexp_replace(col, pat, rep)


def bpe_fit(
    df: DataFrame,
    text_col: str = "text",
    k: int = 16,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table (Sennrich et al. 2016) with the
    distributed merge loop: K rounds, each one pair-count aggregation
    over the corpus + a deterministic argmax (count desc, then pair asc
    — the tie-break that makes training reproducible across engines and
    partitionings) + one merge applied to the working shapes.

    Scale shape — the classic BPE optimization made distributed: merges
    operate on the DISTINCT word shapes weighted by word frequency
    (`groupBy(word).count()`), so per-round work is bounded by
    vocabulary, not corpus; the corpus text is read ONCE. Each round
    moves exactly one (pair, count) row to the driver (TakeOrdered 1),
    the merge is a codegen'd regexp_replace over the shape strings (see
    `_bpe_shape`), and the shape frame is eagerly checkpointed per round
    so lineage stays flat across K rounds. Word-internal merges only
    (the GPT-2 pre-tokenize-then-merge convention; no end-of-word
    symbol). Training is inherently iterative — the ENCODE path with the
    frozen merge table is the oracle-attestable surface
    (`bpe_encode_merges`); `tests/test_properties.py` pins this trainer
    to a pure-Python reference implementation on randomized corpora.

    Returns the learned merges as [(left, right), ...] in rank order.
    """
    shapes = (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select(_bpe_shape(F.col("_w")).alias("_s"), "_n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        arr = F.filter(F.split(F.col("_s"), _BPE_MARK), lambda x: x != "")
        n1 = F.greatest(F.size(arr) - 1, F.lit(0))
        pairs = (
            shapes.select(
                F.explode(
                    F.zip_with(
                        F.slice(arr, F.lit(1), n1),
                        F.slice(arr, F.lit(2), n1),
                        lambda a, b: F.struct(
                            a.alias("l"), b.alias("r")
                        ),
                    )
                ).alias("_p"),
                "_n",
            )
            .groupBy("_p.l", "_p.r")
            .agg(F.sum("_n").alias("_c"))
            .orderBy(F.desc("_c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()  # exactly one row per round
        )
        if not pairs:
            break
        left, right = pairs[0]["l"], pairs[0]["r"]
        merges.append((left, right))
        shapes = shapes.select(
            _bpe_merge_expr(F.col("_s"), left, right).alias("_s"), "_n"
        ).localCheckpoint(eager=True)
    return merges


def bpe_encode_merges(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a FROZEN merge table: lowercase whitespace
    pre-tokenization, each word to its symbol shape, then the merges
    applied in rank order as a chain of codegen'd global
    regexp_replaces (word boundaries are plain spaces, which no '·a·b·'
    pattern can cross, so merges stay word-internal). The scoring twin
    of `bpe_fit`: a pure projection — no joins, no shuffles, no Python
    — so encoding at 100 TB is scan-speed.

    Output per document: the encoded text (space-joined subword
    tokens), subword count, and the subwords-per-word expansion ratio
    (the corpus-budgeting statistic `bpe_token_stats` estimates with a
    regex; this is the learned-tokenizer exact form).
    """
    ws = tokens(F.lower(F.col(text_col)))
    shaped = F.array_join(
        F.transform(ws, lambda w: _bpe_shape(w)), " "
    )
    for left, right in merges:
        shaped = _bpe_merge_expr(shaped, left, right)
    encoded = F.trim(
        F.regexp_replace(shaped, f"[{_BPE_MARK} ]+", " ")
    )
    n_sub = F.when(encoded == "", F.lit(0)).otherwise(
        F.size(F.split(encoded, " "))
    )
    return df.select(
        F.col(id_col),
        encoded.alias("encoded"),
        n_sub.cast("int").alias("n_subwords"),
        F.round(
            n_sub / F.greatest(F.size(ws), F.lit(1)), 6
        ).alias("subwords_per_word"),
    )


def boilerplate_strip(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_content_words: int = 8,
    min_stop_frac: float = 0.15,
    max_upper_frac: float = 0.3,
) -> DataFrame:
    """Line-grain boilerplate removal — the jusText/trafilatura-family
    content-extraction step every web-crawl curation pipeline runs
    before quality filtering (Pomikálek 2011; CCNet strips boilerplate
    before its LM filter). Two passes, both pure column algebra:

    1. BASE class per line: GOOD when it reads like prose (>= ``min_
       content_words`` words, stopword fraction >= ``min_stop_frac``,
       no link marker, uppercase fraction < ``max_upper_frac``); BAD
       when it cannot be (under 3 words, a link, or near-zero stopword
       density — nav bars, copyright lines, button text); SHORT
       otherwise.
    2. CONTEXT smoothing, the jusText idea that separates it from a
       plain threshold: a SHORT line adjacent to a GOOD line is kept
       (it is usually a heading or a continuation), one lag/lead window
       per document.

    Plan shape: one posexplode (line order preserved by position), all
    features codegen'd, one per-doc window for the smoothing, one
    groupBy back to doc grain with the kept lines re-joined in
    position order. Shuffles carry (doc, pos, class) — never more than
    the line table. Returns (id, kept_text, n_lines, n_kept,
    boilerplate_frac)."""
    from pyspark.sql import Window

    lines = fan_out(df, id_col).select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    ws = tokens(F.lower(F.col("line")))
    n_words = F.size(ws)
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(sw, w)))
    stop_frac = n_stop / F.greatest(n_words, F.lit(1))
    n_alpha = F.length(F.regexp_replace(F.col("line"), r"[^A-Za-z]", ""))
    n_upper = F.length(F.regexp_replace(F.col("line"), r"[^A-Z]", ""))
    upper_frac = n_upper / F.greatest(n_alpha, F.lit(1))
    has_link = F.col("line").contains("http")
    base = (
        F.when(
            (n_words < 3) | has_link | (stop_frac < 0.05), F.lit("bad")
        )
        .when(
            (n_words >= min_content_words)
            & (stop_frac >= min_stop_frac)
            & (upper_frac < max_upper_frac),
            F.lit("good"),
        )
        .otherwise(F.lit("short"))
    )
    classified = lines.select(id_col, "pos", "line", base.alias("_cls"))
    w = Window.partitionBy(id_col).orderBy("pos")
    kept = classified.withColumn(
        "_keep",
        (F.col("_cls") == "good")
        | (
            (F.col("_cls") == "short")
            & (
                (F.lag("_cls").over(w) == "good")
                | (F.lead("_cls").over(w) == "good")
            )
        ),
    )
    return (
        kept.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("kept_text"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("_keep").cast("int")).alias("n_kept"),
            F.round(
                1 - F.sum(F.col("_keep").cast("int")) / F.count(F.lit(1)), 6
            ).alias("boilerplate_frac"),
        )
        .orderBy(id_col)
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 3,
    k: int = 50,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-k bigram collocations by pointwise mutual information — the
    phrase-mining pass (word2phrase, Mikolov et al. 2013) a pretraining
    pipeline runs to promote multi-word units ("new york", "machine
    learning") to vocabulary entries before tokenizer training.

    PMI(w1,w2) = log2( p(w1,w2) / (p(w1) p(w2)) ) with p(w1,w2) =
    c12/NB over adjacent pairs and p(w) = c/N over the full token
    stream; pairs below ``min_count`` joint occurrences are dropped
    (PMI's classic low-count pathology: a hapax pair of two hapax words
    maxes the score). Output is the top ``k`` by (pmi desc, pair asc) —
    the tie-break makes the cut deterministic on both engines.

    Shuffle budget: ONE corpus-token explode feeds the unigram counts
    and the token total; ONE pair explode (two JVM-side slices zipped,
    as in ``bigram_surprisal``) feeds the map-side-combined pair counts.
    The unigram frame is vocabulary-sized and joins onto the pair frame
    twice — broadcast under ``broadcast_vocab`` (default), else a
    shuffle join on the token key (the web-scale regime, same contract
    as ``unigram_surprisal``). Totals are 1-row broadcasts. The final
    top-k is a TakeOrdered over the surviving (>= min_count) pair frame
    — never a global sort of the corpus.
    """
    base = fan_out(df, id_col).select(
        F.col(id_col), tokens(F.lower(F.col(text_col))).alias("_w")
    )
    # token explode INLINE and pair slice lengths clamped to >= 0 with
    # the size(_w) >= 2 filter dropped (empty pair arrays explode to
    # nothing): both the inferred size(_t-expr)>0 filter and the explicit
    # one pushed below fan_out's repartition into serial pre-exchange
    # tokenizes of the corpus (r16, the setsim_prefix_join lesson).
    tok = fan_out(df, id_col).select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("_t")
    )
    # uni joins onto the pair frame twice (w1 and w2): the different
    # pushed isnotnull filters make the subtrees non-canonical, so the
    # token explode+count ran once per consumer — materialize the
    # vocab-sized frame once (r16, the bigram_surprisal lesson)
    uni = (
        tok.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .localCheckpoint(eager=False)
    )
    # N and NB as explode-free columnar scans (r15 unigram lesson):
    # sum(size(tokens)) / sum(size-1 clamped) are the same BIGINTs the
    # explode-and-count form pays a full corpus pass each for
    # greatest(size, 0) pins the legacy sizeOfNull corner (size(NULL) is
    # -1 under non-ANSI semantics, subtracting 1 per null-text row from
    # the corpus total); greatest(NULL, 0) is 0, which sum() treats
    # identically to a skipped NULL — result unchanged under ANSI, and
    # no longer wrong if a caller overrides ansi.enabled (r16 ADVICE).
    tot = df.agg(
        F.sum(
            F.greatest(F.size(tokens(F.lower(F.col(text_col)))), F.lit(0))
        ).alias("_n")
    )
    np = F.greatest(F.size("_w") - 1, F.lit(0))
    pairs = F.zip_with(
        F.slice(F.col("_w"), 1, np),
        F.slice(F.col("_w"), 2, np),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bp = (
        base.select(F.explode(pairs).alias("_p"))
        .select(F.col("_p.w1").alias("w1"), F.col("_p.w2").alias("w2"))
    )
    c12 = (
        bp.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    nb = df.agg(
        F.sum(
            F.greatest(
                F.size(tokens(F.lower(F.col(text_col)))) - 1, F.lit(0)
            )
        ).alias("_nb")
    )
    uside = F.broadcast(uni) if broadcast_vocab else uni
    scored = (
        c12.join(uside.select(F.col("_t").alias("w1"), F.col("_c").alias("_c1")), "w1")
        .join(uside.select(F.col("_t").alias("w2"), F.col("_c").alias("_c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            "pair_count",
            F.round(
                F.log2(
                    (F.col("pair_count") / F.col("_nb"))
                    / ((F.col("_c1") / F.col("_n")) * (F.col("_c2") / F.col("_n")))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(
        F.col("pmi").desc(), F.col("w1"), F.col("w2")
    ).limit(k)
