"""Scalar column-expression helpers (SURVEY.md §2.8).

Everything here is a pure Catalyst expression — no Python UDFs — so it stays
inside whole-stage codegen. Each helper re-expresses a scalar pattern from
the reference pipeline:

- clip            <- np.clip to [-3,3]/[0,100] (ref build_pbsi.py:143,152,162)
- safe_div        <- ratio with +-inf -> NaN (ref postjoin_enricher.py:39-51)
- pipe_split      <- "Happy | Content" -> array (ref som_from_autoexport.py:171-183)
- sorted_set_join <- ", ".join(sorted(set(x))) (ref meds_from_extracted.py:328)
- hash64_md5      <- deterministic 60-bit int hash, engine-portable (used by
                     MinHash/SimHash so the DuckDB oracle can reproduce it)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clip(col: Column, lo: float, hi: float) -> Column:
    """least(greatest(col, lo), hi) — np.clip equivalent."""
    return F.least(F.greatest(col, F.lit(float(lo))), F.lit(float(hi)))


def safe_div(num: Column, den: Column) -> Column:
    """num/den with den==0 (or null) -> null instead of +-inf."""
    return F.when(den.isNotNull() & (den != 0), num / den)


def pipe_split(col: Column) -> Column:
    """Split 'A | B | C' into a trimmed, de-duplicated string array."""
    parts = F.split(col, r"\|")
    trimmed = F.transform(parts, lambda x: F.trim(x))
    return F.array_distinct(F.filter(trimmed, lambda x: x != F.lit("")))


def sorted_set_join(col: Column, sep: str = ", ") -> Column:
    """Aggregate expression: comma-joined sorted set of values."""
    return F.array_join(F.array_sort(F.collect_set(col)), sep)


def tz_cutover_localize(
    ts_col: Column, cutover_date: str, tz_before: str, tz_after: str
) -> Column:
    """Timezone cutover rule — the source switches home timezone at a date,
    so UTC events localize differently before/after the cutover
    (ref src/domains/extract_screen_time.py:20-32)."""
    return F.when(
        F.to_date(ts_col) < F.lit(cutover_date),
        F.from_utc_timestamp(ts_col, tz_before),
    ).otherwise(F.from_utc_timestamp(ts_col, tz_after))


def parse_timestamp_multi(col: Column, formats: list[str]) -> Column:
    """Multi-format timestamp parse: first format that parses wins, null if
    none do (ref som_from_autoexport.py:132-168 probes format candidates)."""
    return F.coalesce(*[F.try_to_timestamp(col, F.lit(f)) for f in formats])


def hash64_md5(col: Column) -> Column:
    """Deterministic 60-bit integer hash of a string.

    First 15 hex chars of md5 parsed base-16 (fits in int64: 16^15 = 2^60).
    Chosen over xxhash64 because DuckDB can reproduce it exactly
    (``('0x' || substr(md5(x),1,15))::BIGINT``), giving dedup/LSH operators
    an exact SQL oracle.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash_bits_md5(col: Column, n_hex: int = 7) -> Column:
    """Small deterministic int hash (n_hex hex chars = 4*n_hex bits)."""
    return F.conv(F.substring(F.md5(col), 1, n_hex), 16, 10).cast("bigint")
