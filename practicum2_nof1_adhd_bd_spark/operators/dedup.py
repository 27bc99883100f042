"""Deduplication operators for training-data pipelines (brief §"Beyond").

Exact dedup, MinHash+LSH, SimHash, and n-gram Jaccard over a
`documents(doc_id, text)` table. Design notes for 100 TB:

- Exact dedup is a hash-groupBy on a fingerprint column — one shuffle of
  (hash, id), never of full text.
- MinHash signatures are computed per-row with array expressions (no UDF,
  no explode of shingles through a shuffle); LSH banding turns the O(n^2)
  pair problem into a bucket-equijoin, and only candidate pairs are
  Jaccard-verified.
- All hashes are md5-derived (functions.hash64_md5) so the DuckDB oracle can
  reproduce them bit-exactly — xxhash64 would be Spark-only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalars import hash64_md5
from ..sources.readers import fan_out
from .textops import tokens


def exact_dedup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via hash-groupBy: one row per distinct normalized text,
    keeping the smallest id as canonical and counting duplicates."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return (
        df.select(F.md5(norm).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """k-word shingles as an array of strings (distinct).

    Built as a zip_with chain over k clamped slices of the token array
    (r17, guide §4): the former transform(sequence(positions)) lambda
    referenced the tokenize EXPRESSION, and expressions captured by a
    higher-order-function lambda are re-evaluated per element (no
    subexpression elimination reaches inside the lambda) — the text
    re-tokenized once per shingle POSITION, O(len^2) per document (the
    duplicate_spans docstring's measured 6.3 s vs 0.2 s disease, live
    in every minhash/simhash/decontaminate caller of this helper).
    zip_with's inputs are plain arguments, evaluated once per call, so
    the tokenize runs k times per row instead of n. Values unchanged:
    element i is token_i .. token_{i+k-1} joined by single spaces
    (tokens are \\S+ runs — never null/empty, so concat == concat_ws),
    clamped slices make short docs empty, and the n >= k guard keeps
    the NULL-text result the exact empty array it always was.
    """
    toks = tokens(F.lower(col))
    n = F.size(toks)
    np_ = F.greatest(n - (k - 1), F.lit(0))
    sh = F.slice(toks, 1, np_)
    for i in range(1, k):
        sh = F.zip_with(
            sh,
            F.slice(toks, i + 1, np_),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    return F.when(n >= k, F.array_distinct(sh)).otherwise(
        F.array().cast("array<string>")
    )


_SENTINEL = 1 << 62

# Universal hash family over the Mersenne prime 2^31 - 1: h_i(s) =
# (A_i * base(s) + B_i) mod P where base = hash64_md5(s) mod P. One md5 per
# shingle (the expensive part); each extra hash function is two integer ops.
# Products stay < P^2 < 2^62 — no int64 overflow, and DuckDB reproduces the
# arithmetic bit-exactly.
MINHASH_P = (1 << 31) - 1


def minhash_coeffs(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (A_i, B_i) pairs, A_i != 0 mod P (Knuth-style LCG
    constants; shared with the SQL oracle builder)."""
    return [
        ((i * 2654435761 + 1) % MINHASH_P, (i * 40503 + 9973) % MINHASH_P)
        for i in range(n_hashes)
    ]


def signature_from_shingles(sh_col: Column, n_hashes: int) -> Column:
    """One-pass MinHash signature from a shingle-array column.

    The md5-derived base hash is computed ONCE per shingle; the n hash
    functions are affine transforms of it (see minhash_coeffs). Folded with
    an elementwise-min so the shingle expression is referenced exactly once —
    n separate array_min(transform(..)) columns would make Catalyst
    recompute tokenization n times per row.
    """
    coeffs = minhash_coeffs(n_hashes)
    p = F.lit(MINHASH_P).cast("bigint")

    # two nested transforms: the outer one materializes the md5 base hash
    # exactly once per shingle (CSE inside lambda bodies is not guaranteed)
    bases = F.transform(sh_col, lambda s: hash64_md5(s) % p)
    per_shingle = F.transform(
        bases,
        lambda h: F.array(
            *[(h * F.lit(a).cast("bigint") + F.lit(b)) % p for a, b in coeffs]
        ),
    )
    sentinel = F.array_repeat(F.lit(_SENTINEL).cast("bigint"), n_hashes)
    return F.aggregate(
        per_shingle,
        sentinel,
        lambda acc, hs: F.zip_with(acc, hs, lambda a, b: F.least(a, b)),
    )


def minhash_signature(col: Column, n_hashes: int = 16, k: int = 3) -> Column:
    """MinHash signature of a text column; empty-shingle docs get null."""
    sh = word_shingles(col, k)
    return F.when(F.size(sh) > 0, signature_from_shingles(sh, n_hashes))


def minhash_signatures_df(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    k: int = 3,
) -> DataFrame:
    """Frame-level MinHash signatures via explode + hash-aggregate.

    Bit-identical to ``signature_from_shingles`` but 3-4x faster: Spark
    evaluates higher-order-function lambdas (transform/aggregate) INTERPRETED
    per array element, while explode -> md5 -> 8x min() runs entirely inside
    whole-stage codegen. The groupBy shuffle is map-side-combined down to one
    row of 8 longs per document, and since the input is fanned out hashed on
    ``id_col`` the exchange is usually reused (no extra shuffle).

    Documents with no shingles (< k tokens) produce no rows.
    """
    coeffs = minhash_coeffs(n_hashes)
    p = F.lit(MINHASH_P).cast("bigint")
    ex = fan_out(df, id_col).select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), k)).alias("_s")
    ).select(id_col, (hash64_md5(F.col("_s")) % p).alias("_h"))
    aggs = [
        F.min((F.col("_h") * F.lit(a).cast("bigint") + F.lit(b)) % p).alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    return (
        ex.groupBy(id_col)
        .agg(*aggs)
        .select(
            id_col,
            F.array(*[F.col(f"_m{i}") for i in range(n_hashes)]).alias("sig"),
        )
    )


def _banded_buckets(
    sig_df: DataFrame, id_col: str, n_hashes: int, bands: int
) -> DataFrame:
    """Explode a signature frame into (id, band, bucket=md5(band slice))."""
    rows_per_band = n_hashes // bands
    return sig_df.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs_verified(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified. The corpus-dedup flow:

    shingles -> signature (one fused pass over the corpus) -> band buckets
    (bucket = md5 of the band's signature slice) -> self-equijoin on
    (band, bucket) -> exact shingle-Jaccard verify of the candidates.

    Scale notes: the full corpus is tokenized exactly ONCE (the signature
    pass); the verify stage re-shingles only the documents that appear in a
    candidate pair (a semi-join — at healthy thresholds a tiny fraction of
    the corpus). Caching the corpus-wide shingle arrays instead costs more
    than the recompute (columnar cache build of the string arrays measured
    4x the shingle pass itself). The join key (band, bucket) is uniform
    md5 — shuffle-friendly, no skew.
    """
    # materialize the BAND BUCKETS (bands rows of (id, band, md5) per doc —
    # tiny), never the shingle string arrays (columnar-caching those
    # measured 4x the cost of the shingle pass itself). The self-join's two
    # sides then read the checkpoint directly and the one tokenize+hash
    # pass is reused. localCheckpoint, not persist: an eager checkpoint's
    # blocks are released with the frame's reference, while a persist()
    # entry parks in the session cache manager for the session's lifetime
    # (the r07-flagged leak class). Placement measured r09 (sf0.1, warm,
    # median-of-5): band-ckpt 2.08 s vs sig-ckpt 2.01-3.08 s vs none
    # 2.29 s — all within host noise of each other; the r08-flagged
    # 1.89->2.14 s "regression" was CPU-steal noise, not the checkpoint
    # (the same box shows 2.1-4.5 s spreads on identical code).
    banded = _banded_buckets(
        minhash_signatures_df(df, text_col, id_col, n_hashes, k),
        id_col, n_hashes, bands,
    ).localCheckpoint(eager=True)
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    # verify only candidate documents: semi-join then re-shingle the few.
    # No distinct on the id union — the semi-join tolerates duplicates, so
    # that shuffle is pure overhead.
    cand_ids = pairs.select(F.col("id_a").alias(id_col)).union(
        pairs.select(F.col("id_b").alias(id_col))
    )
    cand_sh = (
        df.join(cand_ids, id_col, "left_semi")
        .select(F.col(id_col), word_shingles(F.col(text_col), k).alias("sh"))
    )
    return jaccard_verify(pairs, cand_sh, id_col=id_col, threshold=threshold,
                          precomputed_shingles=True)


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs (no verify step). The
    signature frame is eagerly localCheckpointed (tiny — n_hashes longs
    per doc) so the self-join reuses one tokenize+hash pass without a
    session-lifetime cache entry."""
    sig_df = minhash_signatures_df(
        df, text_col, id_col, n_hashes, k
    ).localCheckpoint(eager=True)
    banded = _banded_buckets(sig_df, id_col, n_hashes, bands)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.0,
    precomputed_shingles: bool = False,
) -> DataFrame:
    """Verify candidate pairs with exact k-shingle Jaccard similarity.

    ``docs`` is either the raw document table or (if
    ``precomputed_shingles``) a frame with an ``sh`` shingle-array column.
    """
    if precomputed_shingles:
        sh = docs.select(id_col, "sh")
    else:
        sh = docs.select(
            F.col(id_col), word_shingles(F.col(text_col), k).alias("sh")
        )
    a = sh.alias("da")
    b = sh.alias("db")
    joined = (
        pairs.join(a, pairs.id_a == F.col(f"da.{id_col}"))
        .join(b, pairs.id_b == F.col(f"db.{id_col}"))
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("da.sh", "db.sh")).alias("n_inter"),
            F.size(F.array_union("da.sh", "db.sh")).alias("n_union"),
        )
    )
    jac = F.col("n_inter") / F.col("n_union")
    return joined.withColumn("jaccard", F.round(jac, 6)).filter(
        F.col("jaccard") >= threshold
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    features: str = "words",
) -> DataFrame:
    """28-bit SimHash over distinct features, one fingerprint per doc.

    ``features="words"`` (default, the attested simhash_fingerprints
    form) hashes distinct word tokens; ``features="shingles"`` hashes
    distinct 3-word shingles — the published corpus-dedup grain
    (Charikar/Manku et al. use shingle-like features), and the one that
    stays discriminative when the word vocabulary is tiny: on this
    synthetic corpus the word-grain fingerprint space collapses (every
    doc shares most of the 31-word vocab) while the shingle grain
    tracks the planted near-dups.

    Per feature: 28-bit md5-derived hash; for each bit position, sum
    +1/-1 over features; the fingerprint sets the bits whose sum is
    positive.

    Shaped like the MinHash path (explode -> md5 -> grouped sums) rather
    than nested higher-order lambdas: HOF lambdas evaluate interpreted per
    token x 28 bits, while this form is all whole-stage codegen. Each bit's
    +/-1 sum is a separate agg column with a literal shift, map-side
    combined to one row per doc; fan_out's doc_id hash partitioning
    satisfies the groupBy, so no extra shuffle. Docs with no/NULL text get
    fingerprint 0 (explode_outer + the NULL-token guard), matching the
    lambda form bit-for-bit.
    """
    if features == "shingles":
        # shingle grain EXCLUDES featureless docs (no rows -> no
        # fingerprint): a <3-token doc has no shingle evidence, and a
        # fingerprint-0 placeholder would pair all such docs at
        # hamming 0. The words grain keeps its fingerprint-0 contract.
        toks = word_shingles(F.col(text_col), 3)
        explode_fn = F.explode
    else:
        toks = F.array_distinct(tokens(F.lower(F.col(text_col))))
        explode_fn = F.explode_outer
    ex = fan_out(df, id_col).select(
        F.col(id_col), explode_fn(toks).alias("_t")
    ).withColumn(
        "_h", F.conv(F.substring(F.md5(F.col("_t")), 1, 7), 16, 10).cast("bigint")
    )
    sums = [
        F.sum(
            F.when(F.col("_t").isNull(), F.lit(0))
            .when(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1)) == 1, F.lit(1))
            .otherwise(F.lit(-1))
        ).alias(f"_s{b}")
        for b in range(28)
    ]
    agg = ex.groupBy(id_col).agg(*sums)
    fp: Column = F.lit(0).cast("bigint")
    for b in range(28):
        fp = fp + F.when(
            F.col(f"_s{b}") > 0, F.lit(2**b).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    features: str = "words",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Candidate generation: 4 bands of 7 bits each (pigeonhole: any pair with
    <= 3 differing bits shares at least one exact band) — bucket equijoin,
    then exact hamming filter via bit_count(xor). At ``max_hamming <= 3``
    the banding is therefore EXACT (blocked == brute force); wider radii
    trade recall like any banding.
    """
    fp = simhash_fingerprints(df, text_col, id_col, features=features)
    banded = fp.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("simhash"), b * 7)
                        .bitwiseAND(F.lit(0x7F))
                        .alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def corpus_clean_summary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    jaccard_threshold: float = 0.5,
    quality_threshold: float = 0.5,
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """End-to-end corpus cleaning: the training-data pipeline composite.

    exact dedup (keep min-id per normalized text) -> MinHash-LSH near-dup
    removal (drop the larger id of every verified pair with jaccard >=
    threshold) -> quality gate (composite score >= threshold), reported as
    per-language survivor counts at each stage.

    ONE fused text pass (the streaming/corpus_ingest._batch_signatures
    idea taken further): a single explode-aggregate derives, per document,
    the normalized-text md5 (exact stage), the MinHash signature (near
    stage), AND the quality features (gate stage). Tokens and k-shingles
    ride the same explode — each exploded position carries (token,
    shingle-at-position); stopword hits sum over tokens while the n
    affine MinHash mins fold over shingle hashes (min over the
    non-distinct shingle multiset == min over the distinct set, so the
    signature is bit-identical to minhash_signatures_df's). Downstream
    stages join only this doc-grain profile frame; the only later text
    touch is the exact-Jaccard verify, which re-shingles just the
    LSH-candidate docs through a semi-join (at healthy thresholds a tiny
    fraction — at 100 TB that is a pruned scan, not a corpus pass). The
    profile is eagerly localCheckpoint'ed: one corpus pass feeds all
    stage counts, with no session-lifetime cache entries left behind
    (the r06 persist-leak fix).

    Quality formula mirrors textops.quality_score exactly (same rounding,
    same composite weights) — the SQL oracle replays both, so drift
    between the two implementations turns the attestation red.
    """
    from ..functions.scalars import hash64_md5
    from .textops import EN_STOPWORDS

    coeffs = minhash_coeffs(n_hashes)
    p = F.lit(MINHASH_P).cast("bigint")
    toks = tokens(F.lower(F.col(text_col)))
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")

    # layer 1: materialize the token array ONCE per doc. Expressions
    # referenced inside transform() lambdas are NOT common-subexpression-
    # eliminated, so shingling directly off `toks` would re-tokenize the
    # whole text per position — O(n^2) per doc (measured 3.7x slower than
    # the unfused version before this split).
    prep = fan_out(df, id_col).select(
        F.col(id_col),
        F.col(lang_col),
        F.md5(norm).alias("_th"),
        F.length(
            F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", "")
        ).alias("_alpha"),
        F.length(text_col).alias("_len"),
        toks.alias("_tk"),
    )
    # layer 2: non-distinct shingles, position-aligned with tokens (the
    # distinct() in word_shingles is irrelevant under a min-fold);
    # sequence(1, 0) is DESCENDING in Spark, hence the n >= k guard.
    # arrays_zip is codegen'd and pads the shorter shingle array with
    # nulls; explode_outer keeps a null row for empty docs (matching
    # quality_score's explode_outer semantics).
    tk = F.col("_tk")
    n = F.size(tk)
    idx = F.sequence(F.lit(1), n - (k - 1))
    sh_nd = F.when(
        n >= k,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tk, i, k))),
    ).otherwise(F.array().cast("array<string>"))
    ex = prep.select(
        F.col(id_col), F.col(lang_col), "_th",
        n.alias("_n"),
        F.size(F.array_distinct(tk)).alias("_nd"),
        "_alpha", "_len",
        F.explode_outer(
            F.arrays_zip(tk, sh_nd.alias("_sh"))
        ).alias("_ps"),
    ).select(
        id_col, lang_col, "_th", "_n", "_nd", "_alpha", "_len",
        F.col("_ps._tk").alias("_t"),
        (hash64_md5(F.col("_ps._sh")) % p).alias("_h"),
    )
    sw = F.array([F.lit(w) for w in EN_STOPWORDS])
    prof = ex.groupBy(id_col, lang_col, "_th", "_n", "_nd", "_alpha", "_len").agg(
        F.coalesce(
            F.sum(F.array_contains(sw, F.col("_t")).cast("int")), F.lit(0)
        ).alias("_hits"),
        *[
            F.min(
                (F.col("_h") * F.lit(a).cast("bigint") + F.lit(b)) % p
            ).alias(f"_m{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
    )
    stop_ratio = F.col("_hits") / F.greatest(F.col("_n"), F.lit(1))
    alpha_ratio = F.col("_alpha") / F.greatest(F.col("_len"), F.lit(1))
    distinct_ratio = F.col("_nd") / F.greatest(F.col("_n"), F.lit(1))
    len_score = F.least(F.col("_n") / F.lit(50.0), F.lit(1.0))
    composite = (
        F.lit(0.3) * len_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.2) * F.least(stop_ratio * 10, F.lit(1.0))
        + F.lit(0.2) * distinct_ratio
    )
    prof = prof.select(
        id_col,
        lang_col,
        "_th",
        F.when(
            F.col("_m0").isNotNull(),
            F.array(*[F.col(f"_m{i}") for i in range(n_hashes)]),
        ).alias("sig"),
        F.round(composite, 6).alias("_q"),
    ).localCheckpoint(eager=True)

    # exact stage: min id per normalized-text hash survives — a window
    # flag on the profile (one shuffle on the uniform md5 key), not a
    # groupBy+join round trip
    from pyspark.sql import Window

    flagged = prof.withColumn(
        "_e", F.col(id_col) == F.min(id_col).over(Window.partitionBy("_th"))
    )
    surv1 = flagged.filter(F.col("_e"))

    # near stage: band buckets from the fused signatures, candidate pair
    # equijoin, exact-Jaccard verify re-shingling ONLY candidate docs
    banded = _banded_buckets(
        surv1.filter(F.col("sig").isNotNull()), id_col, n_hashes, bands
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
        # consumed three times (both cand_ids branches + the verify join):
        # materialize once instead of re-running the band self-join
        .localCheckpoint(eager=True)
    )
    cand_ids = pairs.select(F.col("id_a").alias(id_col)).union(
        pairs.select(F.col("id_b").alias(id_col))
    )
    cand_sh = df.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), word_shingles(F.col(text_col), k).alias("sh")
    )
    verified = jaccard_verify(
        pairs, cand_sh, id_col=id_col, threshold=jaccard_threshold,
        precomputed_shingles=True,
    )
    # consumed exactly once (the broadcast flag join below), so no
    # materialization barrier — the verify subtree executes lazily with
    # the final aggregation
    drop_ids = verified.select(F.col("id_b").alias(id_col)).distinct()

    # all four stage counts in ONE pass over the flagged profile: the
    # tiny drop-id frame broadcasts in as a flag, and survival at each
    # stage is a conditional sum — no per-stage groupBy+join chain, and
    # n_docs comes from the profile (one row per doc) instead of a
    # second raw-table scan
    counted = flagged.join(
        F.broadcast(drop_ids.withColumn("_dropn", F.lit(True))),
        id_col,
        "left",
    )
    near_ok = F.col("_e") & F.col("_dropn").isNull()
    one = F.lit(1).cast("bigint")
    return counted.groupBy(lang_col).agg(
        F.count(one).alias("n_docs"),
        F.coalesce(F.sum(F.when(F.col("_e"), one)), F.lit(0).cast("bigint")).alias(
            "n_exact_survivors"
        ),
        F.coalesce(F.sum(F.when(near_ok, one)), F.lit(0).cast("bigint")).alias(
            "n_near_survivors"
        ),
        F.coalesce(
            F.sum(F.when(near_ok & (F.col("_q") >= quality_threshold), one)),
            F.lit(0).cast("bigint"),
        ).alias("n_quality_survivors"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cols: list[str] | None = None,
    k: int = 3,
    threshold: float = 0.1,
    length_bucket: bool = True,
) -> DataFrame:
    """n-gram Jaccard near-dup pairs within blocking buckets.

    Contract: this operator is the exact-verify TAIL behind MinHash/SimHash
    candidate generation — feed it a candidate-restricted or blocked input,
    never a raw 100-TB corpus. Within a bucket the join is quadratic, so
    the bucket key must keep buckets small.

    With ``length_bucket`` (the default) a shingle-count bucket
    ``floor(log2(n_shingles)) + 1`` is folded into the key: one language /
    source dominating the corpus no longer yields one near-global quadratic
    bucket — docs only pair within a 2x length band, so a bucket holds the
    docs of one (lang, …, size-octave) cell and pair work is
    sum_b C(|b|, 2), bounded by the largest single octave, not n². Pairs
    with Jaccard >= t require size ratio >= t, so for t >= 0.5 banding
    loses nothing; below that it can drop extreme-ratio true pairs —
    acceptable for a verify tail (MinHash banding has the same property).
    A result-preserving size-ratio prune (J >= t implies
    min(|A|,|B|) >= t * max(|A|,|B|)) drops unmatchable pairs before any
    set intersection is computed.
    """
    bucket_cols = list(bucket_cols) if bucket_cols else ["lang"]
    sh = fan_out(df, id_col).select(
        F.col(id_col),
        *[F.col(c) for c in bucket_cols],
        word_shingles(F.col(text_col), k).alias("sh"),
    ).filter(F.size("sh") > 0)
    if length_bucket:
        # floor(log2(n)) + 1 as binary-string length: exact integer
        # arithmetic (float log2 of a power of two can land an ulp off),
        # and the same bin() formula the SQL oracle uses.
        sh = sh.withColumn("_len_bucket", F.length(F.bin(F.size("sh"))))
        bucket_cols = bucket_cols + ["_len_bucket"]
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for c in bucket_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    sa, sb = F.size("a.sh"), F.size("b.sh")
    cond = cond & (
        F.least(sa, sb).cast("double") >= F.lit(float(threshold)) * F.greatest(sa, sb)
    )
    n_union = F.size(F.array_union("a.sh", "b.sh"))
    # when() guard: ANSI mode errors on 0/0, and predicate pushdown may
    # evaluate the division before the id/bucket conjuncts.
    jac = F.when(
        n_union > 0, F.size(F.array_intersect("a.sh", "b.sh")) / n_union
    )
    joined = a.join(b, cond).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        jac.alias("jac"),
    )
    return joined.filter(F.col("jac") >= threshold).select(
        "id_a", "id_b", F.round("jac", 6).alias("jaccard")
    )


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over the near-dup pair graph — the step that
    turns verified pairs into dedup CLUSTERS (cluster id = min doc id in
    the component; the canonical keeper is the representative).

    Pregel-style min-label propagation: each iteration every node takes the
    minimum of its own label and its neighbors' labels (one join + one
    map-side-combined min aggregate per round), stopping when no label
    changes. Rounds needed = graph diameter — near-dup clusters are
    shallow, so this is a handful of small shuffles; only the per-round
    changed-count scalar crosses the driver. Labels are min-ids, so the
    result is deterministic regardless of execution order. (Large-star/
    small-star is the known accelerant for adversarially long chains; the
    propagation loop is the same shape.)
    """
    lab = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("lab"))
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    prev = None
    for _ in range(max_iter):
        nbr = edges.alias("e").join(
            lab.alias("l"), F.col("e.dst") == F.col("l.node")
        ).select(F.col("e.src").alias("node"), F.col("l.lab").alias("lab"))
        new_lab = (
            lab.unionByName(nbr).groupBy("node").agg(F.min("lab").alias("lab"))
        ).persist()
        changed = (
            new_lab.alias("n")
            .join(lab.alias("o"), "node")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .count()
        )
        if prev is not None:
            prev.unpersist()
        prev, lab = new_lab, new_lab
        if changed == 0:
            break
    edges.unpersist()
    out = lab.select(
        F.col("node").alias(id_col),
        F.col("lab").alias("cluster_id"),
        (F.col("node") == F.col("lab")).alias("is_canonical"),
    )
    return out


def incremental_exact_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental ingest dedup: admit only the new-batch documents whose
    normalized content hash appears neither in the existing corpus index
    nor earlier in the batch itself (min-id wins within the batch) — the
    daily-crawl-vs-historical-index pattern, where re-deduping the whole
    corpus per ingest is a non-starter.

    Plan: both sides reduce to (hash, id) frames; the index side carries
    ONLY hashes (its text never reshuffles, and in production it is the
    stored hash/signature table, not the raw corpus). The batch dedups
    with one hash-groupBy, then one anti-join against the index hashes —
    shuffle cost scales with the BATCH, while the index side streams
    map-side into the join. Output keeps batch id order determinism
    (min id per content).
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    batch = (
        new_docs.select(F.md5(norm).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_batch_copies"))
    )
    seen = index.select(F.md5(norm).alias("text_hash")).distinct()
    return (
        batch.join(seen, "text_hash", "left_anti")
        .select(id_col, "text_hash", "n_batch_copies")
    )


def bloom_bitmap_from_hashes(
    hash_df: DataFrame,
    hash_col: str = "text_hash",
    n_bits: int = 1 << 20,
    n_probes: int = 4,
) -> bytes:
    """Distributed Bloom-filter build over a hash column: each executor
    partition ORs its hashes' probe positions into a local ``n_bits``-bit
    numpy bitmap, the bitmaps fold through a two-level OR merge — a
    repartition to <=32 groups ORs executor-side first, then the driver
    ORs the group bitmaps. Driver traffic is ``32 * n_bits/8`` bytes,
    flat in BOTH the data and the partition count (a one-level merge
    ships partitions x n_bits/8 — ~12 GB to the driver at 100k input
    partitions and the default 1 MB bitmap); the shuffle moves the same
    bytes but spread across the cluster. Same bounded-merge-state
    argument as ``snapshot_provenance``'s digests.

    Probe positions are JVM-side ``pmod(xxhash64(hash, j), n_bits)`` —
    computed identically at build and query time, deterministic across
    runs and partitionings.
    """
    import numpy as np
    import pandas as pd

    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    pos = hash_df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(hash_col), F.lit(j)), F.lit(n_bits)
                    )
                    for j in range(n_probes)
                ]
            )
        ).alias("pos")
    )

    def part_bitmap(it):
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        for pdf in it:
            p = pdf["pos"].to_numpy()
            np.bitwise_or.at(bm, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    def or_group(it):
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        for pdf in it:
            for b in pdf["bm"]:
                bm |= np.frombuffer(b, dtype=np.uint8)
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    n_groups = min(
        32, max(1, hash_df.sparkSession.sparkContext.defaultParallelism)
    )
    grouped = (
        pos.mapInPandas(part_bitmap, "bm binary")
        .repartition(n_groups)
        .mapInPandas(or_group, "bm binary")
    )
    out = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in grouped.collect():
        out |= np.frombuffer(row["bm"], dtype=np.uint8)
    return out.tobytes()


def bloom_member_expr(
    df_or_spark,
    bitmap: bytes,
    hash_col: str = "text_hash",
    n_bits: int = 1 << 20,
    n_probes: int = 4,
):
    """Boolean Column testing ``hash_col`` against a broadcast Bloom
    bitmap: positions are JVM-side ``pmod(xxhash64(hash, j), n_bits)``
    (identical to the build in ``bloom_bitmap_from_hashes``), membership
    is an Arrow-batched numpy bit test. True = maybe-seen; False =
    PROVABLY absent (no false negatives)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession
    from pyspark.sql.functions import pandas_udf

    spark = (
        df_or_spark
        if isinstance(df_or_spark, SparkSession)
        else df_or_spark.sparkSession
    )
    bc = spark.sparkContext.broadcast(bitmap)

    # no type hints: pandas_udf cannot infer an eval type from a *varargs
    # signature, so the returnType string + default SCALAR kind carry it
    @pandas_udf("boolean")
    def _maybe_seen(*pos):
        bm = np.frombuffer(bc.value, dtype=np.uint8)
        acc = np.ones(len(pos[0]), dtype=bool)
        for p in pos:
            pn = p.to_numpy()
            acc &= ((bm[pn >> 3] >> (pn & 7)) & 1).astype(bool)
        return pd.Series(acc)

    return _maybe_seen(
        *[
            F.pmod(F.xxhash64(F.col(hash_col), F.lit(j)), F.lit(n_bits))
            for j in range(n_probes)
        ]
    )


def bloom_screen_exact_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 1 << 20,
    n_probes: int = 4,
) -> DataFrame:
    """``incremental_exact_dedup`` with a broadcast Bloom prefilter — the
    100 TB shape of the daily-crawl screen. The anti-join against the
    stored index hashes is the per-batch cost that grows with the CORPUS;
    a Bloom bitmap over the index (built once per ingest epoch, ~n_bits/8
    bytes broadcast to every executor) screens the batch map-side:
    bloom-NEGATIVE rows are *guaranteed* new (no false negatives) and
    skip the join entirely; only bloom-positive rows (true dups + the
    false-positive rate) reach the exact anti-join. Decisions are
    therefore IDENTICAL to the plain exact screen — the oracle replays
    exact-screen semantics, and the Bloom stage is pure join-avoidance
    (measured in SCALING §2g; tests assert decision-equality and a
    nonzero skipped fraction).

    In production the bitmap is a stored artifact refreshed on append
    (like the vector-index artifact); here it is built in-query from the
    index side, which the eager localCheckpoint scans exactly once for
    both the build and the verify join.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    idx_hashes = (
        index.select(F.md5(norm).alias("text_hash"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bitmap = bloom_bitmap_from_hashes(
        idx_hashes, "text_hash", n_bits=n_bits, n_probes=n_probes
    )
    batch = (
        new_docs.select(F.md5(norm).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_batch_copies"),
        )
    )
    flagged = batch.withColumn(
        "_maybe_seen",
        bloom_member_expr(
            new_docs, bitmap, "text_hash", n_bits=n_bits, n_probes=n_probes
        ),
    )
    fresh = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    suspects = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    verified = suspects.join(idx_hashes, "text_hash", "left_anti")
    return fresh.unionByName(verified).select(
        id_col, "text_hash", "n_batch_copies"
    )


def incremental_near_dup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.0,
    broadcast_index: bool = False,
) -> DataFrame:
    """Incremental near-dup screen: batch documents LSH-banded against the
    existing corpus index, Jaccard-verified — the companion to
    incremental_exact_dedup for the daily-crawl flow (is this new doc a
    near-copy of ANYTHING already ingested?).

    In production the index side's signature/band table is the STORED
    artifact (built once per corpus, appended per ingest), so per-batch
    work is: signature pass over the batch, band equijoin of batch buckets
    against the index bucket table, and a verify re-shingle restricted to
    candidate docs on BOTH sides — all scaling with the batch and its
    candidate fan-out, never the full corpus. Ids across sides are assumed
    disjoint (enforced by ingest), so no ordering predicate is needed.
    """
    sig_b = minhash_signatures_df(new_docs, text_col, id_col, n_hashes, k)
    sig_i = minhash_signatures_df(index, text_col, id_col, n_hashes, k)
    bb = _banded_buckets(sig_b, id_col, n_hashes, bands).alias("a")
    bi = _banded_buckets(sig_i, id_col, n_hashes, bands).alias("b")
    # broadcast_index: when the index side is KNOWN tiny (an eval set in
    # fuzzy_decontaminate), say so explicitly — the optimizer cannot see
    # through the signature derivation's filter selectivity, and at
    # corpus scale a mis-planned sort-merge join here would shuffle every
    # training signature for a benchmark measured in megabytes.
    if broadcast_index:
        bi = F.broadcast(bi)
    # Each signature frame feeds the band join exactly once, so only the
    # candidate-pair id frame is worth materializing: it has three
    # consumers (two cand_ids legs + the verify join). An eager
    # localCheckpoint runs the signature scans once and releases its
    # blocks with the frame's reference — no corpus-width signature
    # partitions in the cache (r04) and no session-lifetime cache-manager
    # entry (r07).
    pairs = (
        bb.join(
            bi,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    cand_ids = pairs.select(F.col("id_a").alias(id_col)).union(
        pairs.select(F.col("id_b").alias(id_col))
    )
    both = new_docs.select(id_col, text_col).unionByName(
        index.select(id_col, text_col)
    )
    cand_sh = both.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), word_shingles(F.col(text_col), k).alias("sh")
    )
    return jaccard_verify(
        pairs, cand_sh, id_col=id_col, threshold=threshold,
        precomputed_shingles=True,
    )


def chunk_dedup_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 10,
) -> DataFrame:
    """Cross-document exact-substring dedup profile at the token-chunk grain.

    ExactSubstr-style dedup (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better") finds verbatim spans shared between
    documents; the suffix-array construction doesn't distribute naturally,
    so the Spark-native form is the standard chunk approximation: cut each
    document into non-overlapping ``chunk_tokens``-token spans, hash each
    span, and mark a span duplicated when its hash occurs anywhere else in
    the corpus (another document OR another position in the same document —
    matching the substring semantics, unlike doc-level exact dedup).

    Per doc: ``n_chunks``, ``n_dup_chunks``, ``dup_chunk_frac`` — the score
    RefinedWeb-style pipelines threshold to drop mostly-duplicated docs.

    Scale: chunking is one codegen'd transform over the token array (no
    shuffle); the duplicate marking is one groupBy on the chunk hash
    (map-side combined counts) + one hash-keyed join back — both shuffle
    only (doc_id, hash) pairs, never text. Reference parity: the reference
    has no substring dedup; this is part of the brief's training-data
    layer alongside exact/minhash/simhash dedup.
    """
    toks = tokens(F.col(text_col))
    n_full = F.floor(F.size(toks) / chunk_tokens).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_full - 1),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens))),
    )
    doc_chunks = (
        fan_out(df, id_col)
        .select(id_col, F.when(n_full > 0, chunks).otherwise(
            F.array().cast("array<string>")).alias("chunks"))
        .select(id_col, F.explode_outer("chunks").alias("h"))
    )
    # occurrences of each chunk hash across the whole corpus
    occ = doc_chunks.filter(F.col("h").isNotNull()).groupBy("h").agg(
        F.count(F.lit(1)).alias("occ")
    )
    marked = doc_chunks.join(occ, "h", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count("h").alias("n_chunks"),
            F.coalesce(
                F.sum(F.when(F.col("occ") > 1, 1).otherwise(0)), F.lit(0)
            ).alias("n_dup_chunks"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_dup_chunks",
            F.round(
                F.col("n_dup_chunks") / F.greatest(F.col("n_chunks"), F.lit(1)), 6
            ).alias("dup_chunk_frac"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus snapshot diff: per-document status between two corpus
    versions — ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (id in both, content hash differs), ``unchanged``.

    The engine's immutable-snapshot doctrine (SURVEY.md §2.1 S11, ref
    run_full_pipeline.py snapshot dirs) means curation iterations produce
    full new corpus versions; the diff is what a pipeline audits before
    retraining ("this filter change touched 3% of documents").

    Plan: each side reduces to (id, content_md5) — text never shuffles —
    then ONE full-outer hash join on the id. Both projections are map-side;
    the join shuffles two narrow frames on the same key, so cost is linear
    in corpus card at any scale. In production both sides read stored hash
    columns (the exact-dedup index), skipping even the text scan.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    o = old.select(F.col(id_col), F.md5(norm).alias("old_md5"))
    n = new.select(F.col(id_col), F.md5(norm).alias("new_md5"))
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def lsh_batch_pairs(
    docs: DataFrame,
    batch_ids: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 3,
    threshold: float = 0.0,
    index_banded: DataFrame | None = None,
) -> DataFrame:
    """Jaccard-verified near-dup pairs TOUCHING a batch: the incremental
    complement of `minhash_lsh_pairs_verified` — the band join runs
    batch-side x full-side instead of full x full, so candidate work
    scales with the batch's bucket collisions, never corpus². Together
    with the stored side's own historical pairs this reproduces exactly
    the full-run pair set (every band collision either lies inside the
    history or touches the batch), which is what makes incremental
    cluster maintenance provably equal to a batch recompute
    (`merge_components`). Pairs are canonicalized (least, greatest) so
    batch-internal pairs are emitted once.

    ``index_banded`` (optional): the STORED side's band buckets,
    precomputed — the production form, where history signatures live in
    a signature index (corpus_ingest's layout) and never re-derive from
    text. With it, only the BATCH is tokenized/hashed here; without it,
    one banding pass over ``docs`` derives both sides (fine for
    correctness runs, corpus-scale for continuous ingest)."""
    if index_banded is not None:
        bb = _banded_buckets(
            minhash_signatures_df(
                docs.join(
                    F.broadcast(batch_ids.select(id_col)),
                    id_col, "left_semi",
                ),
                text_col, id_col, n_hashes, k,
            ),
            id_col, n_hashes, bands,
        ).localCheckpoint(eager=True)
        banded = index_banded.unionByName(bb)
    else:
        banded = _banded_buckets(
            minhash_signatures_df(docs, text_col, id_col, n_hashes, k),
            id_col, n_hashes, bands,
        ).localCheckpoint(eager=True)
        bb = banded.join(
            F.broadcast(batch_ids.select(id_col)), id_col, "left_semi"
        )
    a, b = bb.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias("id_a"),
            F.greatest(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias("id_b"),
        )
        .distinct()
    )
    cand_ids = pairs.select(F.col("id_a").alias(id_col)).union(
        pairs.select(F.col("id_b").alias(id_col))
    )
    cand_sh = docs.join(cand_ids, id_col, "left_semi").select(
        F.col(id_col), word_shingles(F.col(text_col), k).alias("sh")
    )
    return jaccard_verify(
        pairs, cand_sh, id_col=id_col, threshold=threshold,
        precomputed_shingles=True,
    )


def merge_components(
    assign: DataFrame,
    new_pairs: DataFrame,
    new_nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Incremental connected-components maintenance: merge a batch's new
    nodes and new pairs into STORED cluster assignments without
    re-clustering the corpus. `connected_components` from scratch is
    O(corpus) per round; at 100 TB continuous ingest needs per-batch
    work that scales with the batch.

    The contraction argument that makes this EXACT: stored labels are
    min-ids of the old graph's components, so contracting every node to
    its label preserves connectivity; new pairs therefore become edges
    of a LABEL GRAPH whose size is bounded by 2x the batch's pair count
    (old clusters appear as single vertices, new nodes as their own
    ids). Min-label propagation on that batch-sized graph yields, per
    merged group, min over member labels == min over all member node
    ids (each label already IS its component's min) — identical to a
    full recompute over (all nodes, all pairs). The remap frame (old
    label -> merged label, changed rows only) is batch-sized and
    BROADCASTS back over the stored assignment: one scan of the store,
    zero store shuffles, propagation cost bounded by batch diameter.

    `assign` carries (id_col, cluster_id); returns the updated full
    assignment in `connected_components`' schema (id, cluster_id,
    is_canonical)."""
    base = assign.select(
        F.col(id_col).alias("node"), F.col("cluster_id").alias("lab")
    )
    newn = (
        new_nodes.select(F.col(id_col).alias("node"))
        .join(base.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("lab"))
    )
    lookup = base.unionByName(newn)
    pe = new_pairs.select(
        F.col(a_col).alias("_na"), F.col(b_col).alias("_nb")
    )
    # contract endpoints to labels: the pair side is batch-sized, so it
    # broadcasts and the corpus-sized lookup streams past it twice
    lab_edges = (
        F.broadcast(pe)
        .join(
            lookup.select(
                F.col("node").alias("_na"), F.col("lab").alias("_la")
            ),
            "_na",
        )
        .join(
            lookup.select(
                F.col("node").alias("_nb"), F.col("lab").alias("_lb")
            ),
            "_nb",
        )
        .filter(F.col("_la") != F.col("_lb"))
        .select(F.col("_la").alias("id_a"), F.col("_lb").alias("id_b"))
        .distinct()
        .localCheckpoint(eager=True)  # batch-sized; feeds nodes + CC loop
    )
    lnodes = (
        lab_edges.select(F.col("id_a").alias("lab"))
        .union(lab_edges.select("id_b"))
        .distinct()
    )
    comp = connected_components(
        lab_edges, lnodes, id_col="lab", a_col="id_a", b_col="id_b",
        max_iter=max_iter,
    )
    remap = comp.filter(F.col("lab") != F.col("cluster_id")).select(
        F.col("lab").alias("_old"), F.col("cluster_id").alias("_new")
    )
    return (
        lookup.join(
            F.broadcast(remap), lookup["lab"] == F.col("_old"), "left"
        )
        .select(
            F.col("node").alias(id_col),
            F.coalesce("_new", "lab").alias("cluster_id"),
        )
        .withColumn(
            "is_canonical", F.col(id_col) == F.col("cluster_id")
        )
    )


def _prefix_filter_parts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    num: int,
    den: int,
) -> tuple[DataFrame, DataFrame]:
    """Shared preprocessing for the prefix-filtered set-similarity join:
    returns ``(docs, cand)`` where ``docs`` is the per-doc sorted
    global-rarity rank array (+ its size ``n``) and ``cand`` is the
    distinct prefix-collision candidate pair set (id_a < id_b), already
    size-ratio pruned with exact integer cross-multiplication."""
    from pyspark.sql import Window

    # The shingle array is exploded INLINE — no ``.alias("toks")``
    # projection, no size(toks)>0 filter. Explode drops empty arrays
    # anyway, and the two-step form is not free: InferFiltersFromGenerate
    # infers ``size(toks) > 0`` over the aliased ATTRIBUTE, projection
    # collapse substitutes the full shingle transform into it, and
    # Catalyst pushes that filter through fan_out's repartition Exchange
    # down to the single-split scan — evaluating the whole interpreted
    # shingle expression on ONE core before any parallelism exists (r16
    # measured two 5.4 s single-task stages gating the critical path at
    # sf0.1; guide §4.4's duplicated-expensive-expression pathology in
    # pure-SQL form). With the expression inline the rule does not fire.
    tok = fan_out(df, id_col).select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), k)).alias("token"),
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # global rarity rank: vocab-sized single-partition window — the
    # dictionary, not the corpus, flows through it (the published
    # All-Pairs preprocessing step); ties broken by token so both
    # engines order identically.
    rk = dfreq.select(
        "token", F.row_number().over(Window.orderBy("df", "token")).alias("rnk")
    )
    dr = tok.join(F.broadcast(rk), "token").select(id_col, "rnk")
    docs = dr.groupBy(id_col).agg(
        F.sort_array(F.collect_list("rnk")).alias("ranks"),
        F.count(F.lit(1)).alias("n"),
    )
    # NOTE measured, not assumed: docs feeds several consumers (prefix
    # explode + both verify sides) and its lineage does re-execute for
    # each — but an eager localCheckpoint here is ~1.3x SLOWER at sf0.1
    # (13.7s vs 10.5s warm median): the rank arrays are cheap to
    # recompute and expensive to materialize. Leave the plan lazy.
    # prefix length p = n - ceil(t*n) + 1, all-integer:
    # ceil(num*n/den) = (num*n + den - 1) DIV den
    p = F.expr(f"CAST(n - ({num} * n + {den - 1}) DIV {den} + 1 AS INT)")
    pre = docs.select(
        F.col(id_col),
        F.col("n"),
        F.explode(F.slice("ranks", F.lit(1), p)).alias("rnk"),
    )
    a, b = pre.alias("a"), pre.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.rnk") == F.col("b.rnk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # size-ratio prune, cross-multiplied: J>=t needs
            # den*min(|a|,|b|) >= num*max(|a|,|b|)
            & (
                F.lit(den) * F.least("a.n", "b.n")
                >= F.lit(num) * F.greatest("a.n", "b.n")
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    return docs, cand


def prefix_jaccard_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Prefix-filtered set-similarity self-join (SSJoin / All-Pairs /
    PPJoin: Chaudhuri et al. ICDE'06, Bayardo et al. WWW'07, Xiao et
    al. WWW'08) over k-word shingle sets — the published scalable
    alternative to attribute blocking for Jaccard joins.

    Principle: order every doc's shingles by GLOBAL rarity (document
    frequency asc, token asc). For Jaccard >= t = num/den a matching
    pair must overlap in o >= ceil(t*|x|) elements for EACH side x, and
    the classic prefix lemma then guarantees the two docs share a token
    within their first ``|x| - ceil(t*|x|) + 1`` rarest shingles. So
    only the (1-t) rarest slice of each doc is exploded as join keys —
    rare tokens fan out to few docs, so candidate pairs collapse from
    C(n,2) to nearly the true-pair count (SCALING §2p measures the
    ratio), with NO false negatives (unlike MinHash banding, which is
    probabilistic, and unlike size-octave blocking, which prunes only
    by length).

    Scale shape: the rank dictionary is vocab-sized (<< corpus) and
    broadcast; the only corpus-grain shuffles are the doc-frequency
    groupBy, the per-doc rank collect, and the prefix-token equi-join.
    Verification joins candidates back to the integer rank arrays by
    id — set intersection on sorted int arrays, never a second pass
    over text. The threshold is a rational num/den and every prune and
    the final accept use exact integer cross-multiplication, so no
    float boundary can disagree between engines.
    """
    num, den = int(threshold_num), int(threshold_den)
    docs, cand = _prefix_filter_parts(df, text_col, id_col, k, num, den)
    da = docs.select(
        F.col(id_col).alias("id_a"),
        F.col("ranks").alias("ranks_a"),
        F.col("n").alias("n_a"),
    )
    db = docs.select(
        F.col(id_col).alias("id_b"),
        F.col("ranks").alias("ranks_b"),
        F.col("n").alias("n_b"),
    )
    # |A ∪ B| = |A| + |B| − |A ∩ B|: ranks arrays are SETS (distinct
    # shingles × injective rank map) with their sizes already carried as
    # ``n``, so the array_union allocation per candidate pair is pure
    # waste — one array_intersect does all the set work (r16, guide §2.3
    # "don't compute things you throw away"). n >= 1 for every doc that
    # reaches ``docs``, so uni >= 1 and the old uni > 0 guard is vacuous.
    ver = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ranks_a", "ranks_b")))
        .withColumn("uni", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .filter(F.lit(den) * F.col("inter") >= F.lit(num) * F.col("uni"))
    )
    return ver.select(
        "id_a",
        "id_b",
        F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard"),
    )


def prefix_join_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold_num: int = 1,
    threshold_den: int = 2,
) -> DataFrame:
    """Candidate pairs only (pre-verify) from the prefix filter — the
    probe surface for measuring candidate reduction vs C(n,2)."""
    _, cand = _prefix_filter_parts(
        df, text_col, id_col, k, int(threshold_num), int(threshold_den)
    )
    return cand
