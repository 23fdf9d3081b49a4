"""N-vs-4N scaling evidence for the SemDeDup composite (supplementary to
tools/dedup_scale_bench.py, which measures text-space near-dup; this
measures the EMBEDDING-space path: IVF cell assignment -> in-cell cosine
pairs -> large/small-star connected components -> keep-list).

Methodology mirrors BENCH.md §11b: real executor JVMs via
``local-cluster[N,4,mem]``, input materialized at a FIXED 128 partitions
before the clock (strong scaling — identical task set at both levels),
min-of-1 after a full warm-up run. The synthetic corpus plants real
duplicate structure: vectors are drawn per GROUP (a shared unit base
vector plus small per-member noise), so in-cell cosine actually merges
groups and the CC stage has non-trivial components.

Determinism check: the keep-list must be BIT-IDENTICAL across
parallelism levels (hash-order centroids, threshold compares on rounded
doubles, min-id canonicals — nothing partition-dependent), reported as
an md5 over the sorted kept ids.

    SEMDEDUP_VECS=100000 python tools/semdedup_scale_bench.py 1   # N
    SEMDEDUP_VECS=100000 python tools/semdedup_scale_bench.py 4   # 4N

Prints one JSON line per run; results recorded in BENCH.md §18.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

PARTS = 128


def synth_embeddings(n_vecs: int, dim: int = 32, group_size: int = 4):
    """Deterministic grouped embeddings: n_vecs/group_size groups, each a
    random unit base + N(0, 0.02) member noise — members of a group sit
    at cosine ~0.999, across groups ~0 (random directions in R^32)."""
    rng = np.random.default_rng(42)
    n_groups = n_vecs // group_size
    bases = rng.standard_normal((n_groups, dim))
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    reps = np.repeat(bases, group_size, axis=0)[:n_vecs]
    vecs = reps + 0.02 * rng.standard_normal((n_vecs, dim))
    return pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": [row.astype(float).tolist() for row in vecs],
        }
    )


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
        .appName(f"rf-semdedup-scaling-{n_exec}x{cores}")
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
    from rapidfuzz_spark.textops import ann

    n_vecs = int(os.environ.get("SEMDEDUP_VECS", "100000"))
    n_cells = int(os.environ.get("SEMDEDUP_CELLS", "256"))
    emb = (
        spark.createDataFrame(synth_embeddings(n_vecs))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n = emb.count()

    def job():
        out = ann.semantic_dedup(
            emb, n_cells=n_cells, threshold=0.9, assign="pandas"
        )
        row = (
            out.where(F.col("keep"))
            .agg(
                F.count("*").alias("n_keep"),
                F.md5(
                    F.concat_ws(
                        ",",
                        F.sort_array(F.collect_list("vec_id")),
                    ).cast("binary")
                ).alias("keep_md5"),
            )
            .collect()[0]
        )
        return int(row["n_keep"]), row["keep_md5"]

    job()  # warm-up: Python workers, codegen, Arrow channels
    t0 = time.perf_counter()
    n_keep, keep_md5 = job()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": "semdedup",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_vecs": n,
                "n_cells": n_cells,
                "n_keep": n_keep,
                "keep_md5": keep_md5,
                "wall_sec": round(wall, 3),
                "vecs_per_sec": round(n / wall, 1),
                "partitions": PARTS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
