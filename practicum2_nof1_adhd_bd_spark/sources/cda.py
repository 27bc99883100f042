"""CDA XML probe — SURVEY.md §2.1 S10.

The reference streams a clinical CDA export with ElementTree.iterparse,
counting namespace-stripped ``section`` / ``observation`` end tags and the
``code=`` attribute of each observation's first ``<code>`` child
(ref src/domains/cda/parse_cda.py:20-260).

Spark-native shape: a ``lineSep='<'`` text scan turns EVERY element start
tag into one row (closing tags start with '/' and fall out of the tag
regex), so tag counting is a plain distributed aggregate. The only
sequential part of the reference — associating a ``<code>`` element with
its parent observation — becomes a per-file running count over element
order: CDA convention puts ``code`` as the observation's first child, so a
code row belongs to the nearest preceding observation row. The window is
partitioned by input file: one CDA document is one coherent sequence (the
reference parses it strictly sequentially anyway), while a directory of
documents fans out file-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# leading namespace prefix (ns:) is stripped by the capture group; rows for
# closing tags ("/observation") or prolog text never match at ^.
_TAG_RE = r"^(?:[A-Za-z_][\w.-]*:)?([A-Za-z_][\w.-]*)"


def cda_elements(spark: SparkSession, path: str) -> DataFrame:
    """One row per XML element start tag: (file, blk, ord, tag, code,
    display).

    ``tag`` is lower-cased and namespace-stripped. Document order is
    (blk, ord): ``blk`` is the split's byte offset within the file
    (``_metadata.file_block_start``) and ``ord`` a
    monotonically_increasing_id, which increases with read order INSIDE
    a split but whose partition-index high bits follow task scheduling —
    so on a file large enough to split, ordering by ``ord`` alone would
    depend on which split got which partition index (Spark orders splits
    by size, not offset). The explicit block offset pins document order
    at any file size."""
    raw = spark.read.option("lineSep", "<").text(path)
    return (
        raw.select(
            F.input_file_name().alias("file"),
            F.col("_metadata.file_block_start").alias("blk"),
            F.monotonically_increasing_id().alias("ord"),
            F.lower(F.regexp_extract("value", _TAG_RE, 1)).alias("tag"),
            F.regexp_extract("value", r'\bcode="([^"]*)"', 1).alias("code_attr"),
            F.regexp_extract("value", r'\bdisplayName="([^"]*)"', 1).alias(
                "display"
            ),
        )
        .filter(F.col("tag") != "")
    )


def cda_probe(spark: SparkSession, path: str) -> DataFrame:
    """Tag + observation-code summary of a CDA export.

    Output rows (long form, mirrors the reference's summary dict):
      ('n_section', NULL, total sections)
      ('n_observation', NULL, total observations)
      ('code', <code>, observations whose first code child carries <code>)

    Code value resolution mirrors the reference: code= attribute, else
    displayName=, else 'unknown'.
    """
    el = cda_elements(spark, path)

    is_obs = F.col("tag").endswith("observation")
    is_sec = F.col("tag").endswith("section")

    totals = el.agg(
        F.sum(is_sec.cast("long")).alias("n_section"),
        F.sum(is_obs.cast("long")).alias("n_observation"),
    ).select(
        F.explode(
            F.map_from_arrays(
                F.array(F.lit("n_section"), F.lit("n_observation")),
                F.array(F.col("n_section"), F.col("n_observation")),
            )
        ).alias("metric", "n")
    ).select("metric", F.lit(None).cast("string").alias("code"), "n")

    # running observation counter = parent id for every subsequent element;
    # a code row only attaches when the nearest enclosing container element
    # (observation or section) is an observation — a section's own <code>
    # must not leak into the previous observation.
    w = Window.partitionBy("file").orderBy("blk", "ord")
    seq = el.withColumn("obs_id", F.sum(is_obs.cast("long")).over(w)).withColumn(
        "container",
        F.last(F.when(is_obs | is_sec, F.col("tag")), ignorenulls=True).over(w),
    )
    first_codes = (
        seq.filter(
            (F.col("tag") == "code")
            & (F.col("obs_id") > 0)
            & F.col("container").endswith("observation")
        )
        .groupBy("file", "obs_id")
        .agg(
            F.min_by(
                F.struct("code_attr", "display"), F.struct("blk", "ord")
            ).alias("c")
        )
        .select(
            F.coalesce(
                F.nullif(F.col("c.code_attr"), F.lit("")),
                F.nullif(F.col("c.display"), F.lit("")),
                F.lit("unknown"),
            ).alias("code")
        )
    )
    code_counts = first_codes.groupBy("code").agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("code").alias("metric"), "code", "n")

    return totals.unionByName(code_counts)
