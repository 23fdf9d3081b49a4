"""N-vs-4N scaling evidence for the SimHash Hamming<=k near-duplicate
join (textops/dedup.py:simhash_near_duplicates) — the pigeonhole-banded
companion to MinHash LSH (BENCH.md §11b) and SemDeDup (§19).

Methodology mirrors §19: real executor JVMs via ``local-cluster[N,4,mem]``,
input materialized at a FIXED 128 partitions before the clock (strong
scaling — identical task set at both levels), min-of-1 after a full
warm-up run. The synthetic corpus plants real near-dup structure: docs
come in GROUPS sharing a 30-token base drawn from a 50k-token vocabulary,
each member perturbing 1-2 tokens — group members land within a few
sketch bits of each other while cross-group sketches are ~32 bits apart,
so the banded join finds real clusters and the Hamming verify has real
work to reject.

Determinism check: the pair list must be BIT-IDENTICAL across
parallelism levels (md5 of the joined and duplicate-dropped sorted
``id_1:id_2:hamming`` triples) — nothing in the operator is
partition-order-dependent.

    SIMHASH_DOCS=60000 python tools/simhash_scale_bench.py 1   # N
    SIMHASH_DOCS=60000 python tools/simhash_scale_bench.py 4   # 4N

Prints one JSON line per run; results recorded in BENCH.md §21.
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


def synth_docs(n_docs: int, group_size: int = 4, base_len: int = 30):
    """Deterministic grouped word-soup: n_docs/group_size groups, each a
    30-token base from a 50k vocab; member j of a group swaps j tokens
    for fresh ones (so hamming(member_0, member_j) is small but nonzero
    and grows with j; cross-group sketches are independent)."""
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(50_000)])
    n_groups = n_docs // group_size
    texts = []
    for g in range(n_groups):
        base = rng.choice(vocab, size=base_len, replace=False)
        for j in range(group_size):
            doc = base.copy()
            if j:
                pos = rng.choice(base_len, size=min(j, 2), replace=False)
                doc[pos] = rng.choice(vocab, size=len(pos), replace=False)
            texts.append(" ".join(doc))
    texts = texts[:n_docs]
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
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
        .appName(f"rf-simhash-scaling-{n_exec}x{cores}")
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
    from rapidfuzz_spark.textops import dedup

    n_docs = int(os.environ.get("SIMHASH_DOCS", "60000"))
    max_hamming = int(os.environ.get("SIMHASH_MAX_HAMMING", "3"))
    docs = (
        spark.createDataFrame(synth_docs(n_docs))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n = docs.count()

    def job():
        out = dedup.simhash_near_duplicates(
            docs, bits=64, max_hamming=max_hamming
        )
        row = out.agg(
            F.count("*").alias("n_pairs"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(
                                ":", "id_1", "id_2", "hamming"
                            )
                        )
                    ),
                ).cast("binary")
            ).alias("pairs_md5"),
        ).collect()[0]
        return int(row["n_pairs"]), row["pairs_md5"]

    job()  # warm-up: Python workers, codegen, checkpoint caches
    t0 = time.perf_counter()
    n_pairs, pairs_md5 = job()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": "simhash_neardup",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_docs": n,
                "max_hamming": max_hamming,
                "n_pairs": n_pairs,
                "pairs_md5": pairs_md5,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n / wall, 1),
                "partitions": PARTS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
