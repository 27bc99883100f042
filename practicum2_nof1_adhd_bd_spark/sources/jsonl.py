"""JSONL corpus source/sink — the interchange format of pretraining data.

The reference ingests its corpora from CSV/XML exports (SURVEY.md §2.1
S3-S6); a training-data pipeline's equivalent bulk format is JSON Lines —
one document object per line, gzip-splittable at the file level. This
module gives the engine a defensive JSONL read (explicit schema, PERMISSIVE
mode, corrupt-line capture — the same contract as
readers.read_csv_permissive, ref stage_csv_aggregation.py:848-871) and a
sharded JSONL sink for handing curated corpora to a trainer.

Scale notes:
- An explicit schema is mandatory: schema inference reads the whole corpus
  TWICE (one inference pass, one real pass) — at 100 TB that is the
  difference between one scan and two.
- Plain-text JSONL is byte-splittable, so one huge file still fans out
  across executors; gzip members are not splittable, so sharded writes
  (maxRecordsPerFile / repartition) keep read parallelism at the file
  grain.
- Corrupt lines land in ``_corrupt_record`` instead of failing the job; a
  curation run over web-scraped JSONL always contains some.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Canonical corpus-document schema (matches the testdata `documents`
#: table, plus an optional free-form metadata map).
DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, "
    "n_chars int, meta map<string,string>"
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str = DOC_SCHEMA,
    drop_corrupt: bool = True,
) -> DataFrame:
    """Defensive JSONL read: explicit schema, PERMISSIVE, corrupt capture.

    Returns the typed document frame. With ``drop_corrupt`` (default) bad
    lines are silently filtered out; callers that need the audit trail
    pass ``drop_corrupt=False`` and inspect ``_corrupt_record``
    themselves.

    Caveat (SPARK-21610): on a raw JSON read Spark disallows queries whose
    only referenced column is the internal corrupt-record column, so a
    bare ``.count()`` / ``.isEmpty()`` directly on the ``drop_corrupt``
    result — where the filter is the sole column reference — raises
    AnalysisException. Reference a data column first (any select/agg over
    real fields, which every registry consumer does), or cache the frame
    before counting if you genuinely need the raw row count.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if "_corrupt_record" not in schema.fieldNames():
        schema = schema.add("_corrupt_record", "string")
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    if drop_corrupt:
        df = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    return df


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 100_000,
    compression: str | None = "gzip",
) -> None:
    """Sharded JSONL sink for curated corpora.

    maxRecordsPerFile bounds shard size WITHOUT a repartition shuffle (each
    task rolls to a new file at the limit), so write parallelism equals the
    upstream plan's and downstream read parallelism is at least
    total/max_records files. Gzip per-shard keeps members small enough
    that non-splittability doesn't matter.
    """
    w = df.write.mode("overwrite").option("maxRecordsPerFile", max_records_per_file)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
