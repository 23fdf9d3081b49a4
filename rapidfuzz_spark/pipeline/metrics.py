"""Evaluation + metrics/lineage tables.

- pairwise_f1_vs_oracle: the BASELINE gate — on the SAME candidate pairs
  (same blocking key), compare the pipeline's match decisions against the
  reference-parity scalar oracle decisions (rapidfuzz_spark.api, itself
  locked to the reference's unit-test vectors). Target >= 0.99.
- cluster_pairwise_f1: predicted same-entity pairs vs truth labels.
- Both are pure joins/aggregations (distributed; no driver loops).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from .. import api


def pairwise_f1_vs_oracle(
    scored: DataFrame, metric: str = "ratio", threshold: float = 0.85
) -> dict:
    """scored must carry text_1, text_2 and nullable ``score`` (the
    pipeline decision is score IS NOT NULL). The oracle decision is the
    scalar API run per pair (independent code path: Python-int kernels,
    no batching/NumPy), Arrow-shipped via a pandas UDF."""

    def oracle(c1: pd.Series, c2: pd.Series) -> pd.Series:
        if metric == "ratio":
            fn = lambda a, b: api.fuzz.ratio(a, b) >= threshold  # noqa: E731
        elif metric in ("jaro", "jaro_winkler"):
            mod = getattr(api, metric)
            fn = lambda a, b: mod.similarity(a, b) >= threshold  # noqa: E731
        else:
            mod = getattr(api, metric)
            fn = (  # noqa: E731
                lambda a, b: mod.normalized_similarity(a, b) >= threshold
            )
        return pd.Series([bool(fn(a, b)) for a, b in zip(c1, c2)])

    from pyspark.sql.functions import pandas_udf

    oracle_udf = pandas_udf(oracle, BooleanType())
    cmp = scored.select(
        F.col("score").isNotNull().alias("pred"),
        oracle_udf("text_1", "text_2").alias("truth"),
    )
    agg = cmp.agg(
        F.sum(F.when(F.col("pred") & F.col("truth"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("truth"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("truth"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = agg.tp or 0, agg.fp or 0, agg.fn or 0
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}


def _pairs_within(entities: DataFrame, id_col: str) -> DataFrame:
    a, b = entities.alias("a"), entities.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") == F.col(f"b.{id_col}"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_1"), F.col("b.doc_id").alias("doc_id_2")
        )
    )


def cluster_pairwise_f1(predicted: DataFrame, truth: DataFrame) -> dict:
    """predicted/truth: (doc_id, entity_id). Pairwise P/R/F1 over
    same-cluster pairs (cluster sizes bounded, so pair expansion is safe)."""
    p = _pairs_within(predicted, "entity_id")
    t = _pairs_within(truth, "entity_id")
    tp = p.join(t, ["doc_id_1", "doc_id_2"]).count()
    fp = p.count() - tp
    fn = t.count() - tp
    prec = tp / (tp + fp) if tp + fp else 1.0
    rec = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {"tp": tp, "fp": fp, "fn": fn, "precision": prec, "recall": rec, "f1": f1}


def write_run_metrics(
    spark: SparkSession, out_dir: str, run_id: str, rows: dict
) -> None:
    """Lineage/metrics table: one row per run stage-metric."""
    import os

    df = spark.createDataFrame(
        [(run_id, k, float(v)) for k, v in rows.items() if isinstance(v, (int, float))],
        "run_id string, metric string, value double",
    )
    df.write.mode("append").parquet(os.path.join(out_dir, "metrics"))
