"""N-vs-4N scaling evidence for the TRAINING-EXPORT path (supplementary
to tools/scaling_bench.py — scoring stage — and dedup_scale_bench.py —
near-dup path).

Job: the full last-mile composite over a synthesized corpus —
13-gram eval-set decontamination (broadcast probe), language-temperature
resampling (broadcast rates), token-budget packing (sharded window
streams), shard shuffling — plus the corpus-unigram log-prob scorer,
whose token-key join is the heaviest shuffle any of the new operators
owns. Same methodology as the sibling benches: real executor JVMs via
``local-cluster[N,cores,mem]``, input materialized at a FIXED 128
partitions before the clock (strong scaling, identical tasks at both
parallelism levels).

    TRAIN_ENTITIES=120000 python tools/training_scale_bench.py 1   # N
    TRAIN_ENTITIES=120000 python tools/training_scale_bench.py 4   # 4N

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
        .appName(f"rf-training-scaling-{n_exec}x{cores}")
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
    from rapidfuzz_spark.textops import training
    from rapidfuzz_spark.textops.quality import unigram_logprob
    from rapidfuzz_spark.textops.sampling import md5_uniform

    n_entities = int(os.environ.get("TRAIN_ENTITIES", "120000"))
    # synthetic language mix (Zipf-ish: one dominant group to give the
    # temperature resampler real thinning work), derived from the doc_id
    # hash so the corpus is deterministic
    u_lang = md5_uniform("doc_id", "lang")
    lang = (
        F.when(u_lang < 0.5, "en")
        .when(u_lang < 0.7, "zh")
        .when(u_lang < 0.8, "fr")
        .when(u_lang < 0.9, "es")
        .otherwise("de")
    )
    corpus = (
        ingest.with_match_text(
            synth.synth_documents(spark, n_entities=n_entities, seed=42)
            .drop("entity_id")
        )
        .select("doc_id", F.col("norm_text").alias("text"), lang.alias("lang"))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n_docs = corpus.count()
    # eval set: a 1% deterministic draw — benchmark-sized relative to the
    # corpus, exercising the broadcast-probe path
    ev = corpus.where(md5_uniform("doc_id", "eval") < 0.01)

    def job() -> tuple[int, int]:
        exported = training.training_export(
            corpus, ev, decontam_n=8, alpha=0.7, budget=2048, n_shards=64
        )
        n_exported = exported.count()
        n_scored = unigram_logprob(corpus).where(
            F.col("mean_logprob").isNotNull()
        ).count()
        return n_exported, n_scored

    job()  # warm-up: Python workers, codegen, broadcast builds
    t0 = time.perf_counter()
    n_exported, n_scored = job()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": "training_export",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_docs": n_docs,
                "n_exported": n_exported,
                "n_unigram_scored": n_scored,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n_docs / wall, 1),
                "partitions": PARTS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
