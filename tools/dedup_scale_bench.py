"""N-vs-4N scaling evidence for the DEDUP path (supplementary to
tools/scaling_bench.py, which measures the north-rule scoring stage).

Job: the full near-duplicate discovery composite over a synthesized
near-dup corpus — MinHash signatures -> LSH band join (bucket_cap census)
-> exact n-gram-Jaccard verification on the candidate pairs — i.e. the
`near_duplicate_prune` pipeline up to (not including) connected
components, whose fixpoint rounds are measured separately in the ER
pipeline benches. Same methodology as scaling_bench.py: real executor
JVMs via `local-cluster[N,4,mem]`, input materialized at a FIXED 128
partitions before the clock (strong scaling, identical tasks both
levels).

    DEDUP_ENTITIES=120000 python tools/dedup_scale_bench.py 1   # N
    DEDUP_ENTITIES=120000 python tools/dedup_scale_bench.py 4   # 4N

Prints one JSON line per run; results recorded in BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

PARTS = 128


def main() -> None:
    argv = sys.argv[1:]
    n_exec = int(argv[0]) if argv else 4
    cores = int(os.environ.get("SCALING_CORES_PER_EXEC", "4"))
    mem_mb = int(os.environ.get("SCALING_EXEC_MB", "8192"))
    spark = (
        SparkSession.builder.master(
            f"local-cluster[{n_exec},{cores},{mem_mb}]"
        )
        .config("spark.executor.memory", f"{mem_mb}m")
        .appName(f"rf-dedup-scaling-{n_exec}x{cores}")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.driver.memory", "8g")
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rapidfuzz_spark.pipeline import ingest, synth
    from rapidfuzz_spark.textops import dedup

    n_entities = int(os.environ.get("DEDUP_ENTITIES", "120000"))
    # the synth ER corpus IS a near-dup corpus: each entity's documents
    # are perturbed copies of one canonical record, so LSH has real work
    corpus = (
        ingest.with_match_text(
            synth.synth_documents(spark, n_entities=n_entities, seed=42)
            .drop("entity_id")
        )
        .select("doc_id", F.col("norm_text").alias("text"))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n_docs = corpus.count()

    def job() -> int:
        cand = dedup.minhash_lsh_candidates(
            corpus, n_hashes=16, rows_per_band=4, k=5, bucket_cap=5000
        )
        texts = corpus.select("doc_id", F.col("text").alias("__t"))
        pairs = (
            cand.join(texts.withColumnRenamed("doc_id", "id_1"), "id_1")
            .withColumnRenamed("__t", "t1")
            .join(texts.withColumnRenamed("doc_id", "id_2"), "id_2")
            .withColumnRenamed("__t", "t2")
        )
        verified = pairs.where(
            dedup.ngram_jaccard(pairs, "t1", "t2", n=3) >= 0.6
        )
        row = verified.agg(
            F.count("*").alias("n_edges"),
        ).collect()[0]
        return int(row["n_edges"])

    job()  # warm-up: Python workers, codegen, Arrow channels
    t0 = time.perf_counter()
    n_edges = job()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": "neardup",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_docs": n_docs,
                "n_verified_edges": n_edges,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1),
                "partitions": PARTS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
