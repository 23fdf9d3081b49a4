"""Ingest: document loading + span→match-text projection.

The span sequence is NEVER mutated — the per-row invariant (driver
``input_hint``) is span-sequence equality (kind, text, media_ref, order).
Match text is a *derived* column built with higher-order functions
(filter/array_sort/transform/array_join), all Catalyst built-ins, so the
projection is JVM-side, codegen-able, and prunable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# text spans in offset order, joined by spaces
_MATCH_TEXT_EXPR = """
array_join(
  transform(
    array_sort(
      filter(spans, s -> s.kind = 'text' AND s.text IS NOT NULL),
      (l, r) -> CASE WHEN l.offset < r.offset THEN -1
                     WHEN l.offset > r.offset THEN 1 ELSE 0 END
    ),
    s -> s.text
  ),
  ' '
)
"""


def _looks_like_parquet(path: str) -> bool:
    """True when the local path is plausibly parquet output: a .parquet
    file, or a directory containing part/.parquet files, a _SUCCESS
    marker, or hive-style ``key=value`` partition subdirectories (what
    Spark/DuckDB/pyarrow writers produce — partitioned datasets may have
    ONLY ``date=.../part-0.parquet`` below the root, no top-level files)."""
    if os.path.isfile(path):
        return path.endswith(".parquet")
    try:
        names = os.listdir(path)
    except OSError:
        return False
    return any(
        n == "_SUCCESS"
        or n.endswith(".parquet")
        or n.startswith("part-")
        or ("=" in n and os.path.isdir(os.path.join(path, n)))
        for n in names
    )


def load_documents(
    spark: SparkSession, source: str, source_format: str = "auto"
) -> DataFrame:
    """Load the document table from a filesystem path OR a catalog table.

    ``source_format``:
    - ``"auto"`` (default): a source containing a path separator, or one
      that exists as a local file/directory (bare relative paths like
      ``docs_out``), is read as parquet; anything else is treated as a
      catalog table identifier (``catalog.db.docs``) and read through
      ``spark.read.table`` — the
      DSv2 entry point Iceberg tables are addressed by, so on a cluster
      with the Iceberg catalog configured the same call gets snapshot
      isolation, partition pruning, and hidden-partition pushdown with no
      code change here.
    - ``"parquet"`` / ``"table"``: force one side of the dispatch.
    - anything else: passed to ``spark.read.format(...).load(source)``
      (e.g. ``"iceberg"`` for path-addressed Iceberg tables, ``"orc"``).

    Schema is identical in all cases (driver ``input_hint``):
    ``doc_id string, spans array<struct<kind,text,media_ref,offset>>``.
    """
    if source_format == "auto" and "/" not in source and "\\" not in source:
        # bare name: a catalog identifier — unless it exists on the local
        # filesystem AND actually looks like parquet data (a .parquet
        # file, or a directory holding part files / _SUCCESS). A cwd
        # directory that merely shares the name of a catalog table must
        # not silently shadow it — that's a data misroute, not a
        # convenience. Force one side with source_format='table'/'parquet'.
        if os.path.exists(source) and _looks_like_parquet(source):
            return spark.read.parquet(os.path.abspath(source))
        if os.path.exists(source):
            import warnings

            warnings.warn(
                f"load_documents: '{source}' exists locally but does not "
                f"look like parquet data; treating it as a catalog table. "
                f"Pass source_format='parquet' to read the local path."
            )
    elif source_format == "auto":
        return spark.read.parquet(source)
    if source_format == "parquet":
        return spark.read.parquet(source)
    if source_format in ("auto", "table"):
        return spark.read.table(source)
    return spark.read.format(source_format).load(source)


def with_match_text(docs: DataFrame, normalize: bool = True) -> DataFrame:
    """Adds derived text columns without touching ``spans``:

    - ``match_text``: text spans joined in offset order (raw)
    - ``norm_text``:  lowercased, punctuation collapsed
    - ``canon_text``: norm_text with tokens sorted (canonical key —
      invariant to token reorder; scoring uses BOTH norm and canon so a
      typo that re-sorts a token is caught by the norm pass and a reorder
      by the canon pass)
    """
    out = docs.withColumn("match_text", F.expr(_MATCH_TEXT_EXPR))
    if normalize:
        norm = F.trim(
            F.regexp_replace(F.lower(F.col("match_text")), r"[^\p{L}\p{N}]+", " ")
        )
        out = out.withColumn("norm_text", norm).withColumn(
            "canon_text",
            F.array_join(F.array_sort(F.split("norm_text", r"\s+")), " "),
        )
    return out
