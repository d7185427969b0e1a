"""Batch file ingest for corpus pipelines: JSONL with corrupt-record
quarantine — the batch twin of the streaming JSON-ERROR fallback
(sources/kafka.parse_transactions re-expresses the reference's
TransactionDeserializationSchema.java:28-49 "never fail on a bad record"
rule; this module applies the same policy to file-based corpus drops).

Malformed lines are not dropped and not fatal: they land in a quarantine
frame carrying the raw line, so ingest is lossless and auditable (the
ratio of quarantined lines is itself a data-quality signal).

Scale notes: JSON line parsing is JVM-side (Jackson) and splittable —
each task parses its own byte range, so ingest parallelism is file-size
bound, not file-count bound. The corrupt-record column is PERMISSIVE
mode's standard mechanism; Spark refuses queries that select ONLY the
corrupt column from the raw parse (it would have to re-parse — see
SPARK-21610), which `read_jsonl` sidesteps by materializing the split
eagerly when asked to quarantine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    quarantine: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """(good, quarantine) from a JSONL drop.

    `good` has exactly the caller's schema; `quarantine` is (raw_line)
    for every line Jackson could not bind to it. PERMISSIVE mode parses
    what it can and fills the corrupt column for the rest; rows where the
    corrupt column is set are routed to quarantine with their raw text
    intact.

    ``quarantine=True`` stages the parsed frame through a LAZY
    localCheckpoint so both splits read one materialized parse — nothing
    runs until the caller's first action, but that action does
    materialize the parse into the block manager. For corpus-scale
    ingest where the bad-line audit isn't needed, ``quarantine=False``
    skips the checkpoint entirely (returns ``(good, None)``): the filter
    runs straight off the splittable JSON scan with zero staged state."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # fresh StructType: .add() would MUTATE a caller-owned schema object
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    bad = F.col(CORRUPT_COL).isNotNull()
    if not quarantine:
        # filtering on the corrupt column while selecting OTHER columns is
        # allowed (SPARK-21610 only bars referencing solely that column)
        return df.filter(~bad).drop(CORRUPT_COL), None
    # SPARK-21610: filtering/selecting only the corrupt column straight
    # off the scan is disallowed — stage the parsed frame first so both
    # splits read the same materialized parse (lazily: the checkpoint
    # executes at the caller's first action, not at ingest-declare time)
    df = df.localCheckpoint(eager=False)
    good = df.filter(~bad).drop(CORRUPT_COL)
    quarantined = df.filter(bad).select(F.col(CORRUPT_COL).alias("raw_line"))
    return good, quarantined


def read_delimited(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    sep: str = ",",
    header: bool = True,
    quarantine: bool = True,
    multiline: bool = False,
) -> tuple[DataFrame, DataFrame | None]:
    """(good, quarantine) from a CSV/TSV drop — the delimited twin of
    :func:`read_jsonl`, same lossless-ingest policy: a row whose fields
    cannot bind to the schema (wrong arity, type mismatch under the CSV
    parser) lands in the quarantine frame with its raw text intact
    instead of failing the job or vanishing.

    Scale notes: Spark's CSV reader (Univocity) is JVM-side and
    splittable for single-line records, so parallelism is byte-range
    bound exactly like JSONL. ``multiline=True`` (quoted newlines)
    makes files non-splittable — one task per file — so corpus drops
    that need it should arrive pre-sharded; the flag is surfaced rather
    than defaulted for that reason. The same SPARK-21610 corrupt-column
    staging discipline as JSONL applies.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        .option("enforceSchema", "false")
        .csv(path)
    )
    bad = F.col(CORRUPT_COL).isNotNull()
    if not quarantine:
        return df.filter(~bad).drop(CORRUPT_COL), None
    df = df.localCheckpoint(eager=False)
    good = df.filter(~bad).drop(CORRUPT_COL)
    quarantined = df.filter(bad).select(F.col(CORRUPT_COL).alias("raw_line"))
    return good, quarantined
