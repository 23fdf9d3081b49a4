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

    TRAIN_DOCS=120000 python tools/training_scale_bench.py 1   # N
    TRAIN_DOCS=120000 python tools/training_scale_bench.py 4   # 4N
    TRAIN_MODE=decon TRAIN_DOCS=240000 ... # isolate the decon compute

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
    from rapidfuzz_spark.textops import training
    from rapidfuzz_spark.textops.quality import unigram_logprob
    from rapidfuzz_spark.textops.sampling import md5_uniform

    # Corpus: web-document-shaped, NOT the 3-4-token ER entity records
    # (those have zero 8-grams, which would make the decontamination
    # stage vacuous). Each doc is 80-239 tokens drawn deterministically
    # from a 50k vocabulary via xxhash64(doc_id, position) — pure
    # Catalyst, reproducible at any parallelism, and every 8-gram is
    # (w.h.p.) unique to its document, so decontamination must flag
    # exactly the eval-set docs themselves: a built-in correctness
    # invariant checked below alongside the timing.
    n_docs_target = int(os.environ.get("TRAIN_DOCS", "120000"))
    u_lang = md5_uniform("doc_id", "lang")
    lang = (
        F.when(u_lang < 0.5, "en")
        .when(u_lang < 0.7, "zh")
        .when(u_lang < 0.8, "fr")
        .when(u_lang < 0.9, "es")
        .otherwise("de")
    )
    n_tok = (
        F.lit(80) + (md5_uniform("doc_id", "len") * 160).cast("int")
    )
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(50000)),
            ),
        ),
        " ",
    )
    corpus = (
        spark.range(n_docs_target)
        .select(F.concat(F.lit("d"), F.col("id")).alias("doc_id"))
        .select("doc_id", text.alias("text"), lang.alias("lang"))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n_docs = corpus.count()
    # eval set: a 1% deterministic draw — benchmark-sized relative to the
    # corpus, exercising the broadcast-probe path
    ev = corpus.where(md5_uniform("doc_id", "eval") < 0.01)
    n_eval = ev.count()

    mode = os.environ.get("TRAIN_MODE", "composite")

    def job() -> tuple[int, int]:
        if mode == "decon":
            # compute-isolating variant: the corpus-side gram explode +
            # md5 probe alone (the composite's only all-rows compute);
            # n-grams per doc ≈ tokens, so this is ~tokens×md5 of work
            d = training.decontaminate(corpus, ev, n=8)
            return d.where(F.col("contaminated")).count(), 0
        exported = training.training_export(
            corpus, ev, decontam_n=8, alpha=0.7, budget=2048, n_shards=64,
            pack_shards=64,
        )
        n_exported = exported.count()
        n_scored = unigram_logprob(corpus).where(
            F.col("mean_logprob").isNotNull()
        ).count()
        return n_exported, n_scored

    # correctness invariant at bench scale: unique-gram corpus ⇒ the
    # contaminated set is exactly the eval docs (every doc ≥ 8 tokens)
    n_contam = (
        training.decontaminate(corpus, ev, n=8)
        .where(F.col("contaminated"))
        .count()
    )
    assert n_contam == n_eval, (n_contam, n_eval)

    job()  # warm-up: Python workers, codegen, broadcast builds
    t0 = time.perf_counter()
    n_exported, n_scored = job()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_docs": n_docs,
                "n_eval": n_eval,
                "n_contaminated": n_contam,
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
