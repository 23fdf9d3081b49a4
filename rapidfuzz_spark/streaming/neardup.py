"""Streaming near-duplicate candidate discovery: a foreachBatch loop over
the incremental MinHash-LSH band join, with the accumulated band
signatures as the (idempotent, batch_id-partitioned) streaming state.

Each micro-batch's documents are banded once; candidates come from the
bucket join of the new bands against every PRIOR batch's bands plus the
within-batch self-join. Because signatures are a pure per-doc function of
text, a pair (i, j) is emitted exactly once — at the batch where its
later member arrives — and the CUMULATIVE pair output equals the batch
``minhash_lsh_candidates`` pair set over the union corpus exactly
(driver query ``stream_neardup`` locks this against the full-corpus SQL
oracle).

foreachBatch is the right Spark shape here (same reasoning as
pipeline/incremental.stream_link): the work per micro-batch is a join
against a large, growing table — a batch join, not per-key state-store
logic. Delivery is at-least-once, so BOTH outputs are partitioned by
batch_id and dynamically overwritten: a replayed batch rewrites its own
pairs partition and its own bands partition, and the accumulated-bands
read excludes the current batch_id so a replay never joins against its
own earlier attempt.

At 10^12 docs the bands table is the scale knob: ~n_hashes/rows_per_band
rows of 36 bytes per document. As written, each micro-batch's bucket
join shuffles the accumulated state on (band, sig); the documented scale
upgrade is to keep the state in a (band, sig)-bucketed catalog table
(bucketBy needs a table catalog, which plain parquet paths don't have)
so the join is co-located and only the increment moves.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textops import dedup

__all__ = ["stream_neardup"]


def stream_neardup(
    stream_docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    n_hashes: int = 16,
    rows_per_band: int = 4,
    k: int = 5,
    broadcast_increment: bool = True,
    trigger_available_now: bool = True,
):
    """Start the streaming near-dup query over a STREAMING (doc_id, text)
    DataFrame. Writes candidate pairs to ``out_dir``/pairs and band
    signatures (the state) to ``out_dir``/bands, both partitioned by
    batch_id. Returns the StreamingQuery (caller awaits termination).

    ``broadcast_increment``: micro-batches are small by construction, so
    shipping the batch's bands to the state's partitions is the default.
    Set False when batches can be huge (an availableNow backlog drain
    packs the whole queue into few batches) — a forced broadcast past the
    driver's memory would fail the batch, and a replay re-runs the same
    plan, so the query would never progress.

    No bucket_cap here by design: a cap decision depends on the bucket's
    final size, which streaming cannot know early — pairs emitted before
    a bucket crosses the cap could never be un-emitted, so the cumulative
    output would diverge from the batch run. Degenerate hot buckets on a
    stream are a compaction-time concern: re-run the capped/salted batch
    operator over the accumulated corpus."""
    bands_dir = os.path.join(out_dir, "bands")
    pairs_dir = os.path.join(out_dir, "pairs")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new_bands = dedup.lsh_band_signatures(
            dedup.minhash_signatures(batch_df, text_col, n_hashes, k),
            rows_per_band,
        ).localCheckpoint(eager=True)  # banded once, used by 3 consumers
        from pyspark.errors import AnalysisException

        try:
            base_bands = (
                spark.read.parquet(bands_dir)
                .where(F.col("batch_id") != batch_id)
                .drop("batch_id")
            )
        except AnalysisException as e:
            # only a missing state dir means "first batch"; corrupt or
            # unreadable state must fail the batch, not silently restart
            # from empty state (which would drop every cross-batch pair)
            if e.getCondition() != "PATH_NOT_FOUND":
                raise
            # empty base: incremental_band_pairs degenerates to exactly
            # the within-batch self-join — one code path for pair
            # semantics instead of a re-implementation here
            base_bands = spark.createDataFrame([], new_bands.schema)
        pairs = dedup.incremental_band_pairs(
            base_bands,
            new_bands,
            bucket_cap=None,
            broadcast_increment=broadcast_increment,
        )
        (
            pairs.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(pairs_dir)
        )
        (
            new_bands.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(bands_dir)
        )

    writer = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
