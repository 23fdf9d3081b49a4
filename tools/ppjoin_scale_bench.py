"""N-vs-4N scaling evidence for the prefix-filtered exact Jaccard
self-join (textops/dedup.py:prefix_filter_jaccard_join, T64) — the
EXACT set-similarity join companion to the probabilistic families
(MinHash §11b, SimHash §21, SemDeDup §19).

Methodology mirrors §19/§21: real executor JVMs via
``local-cluster[N,4,mem]``, input materialized at a FIXED 128
partitions before the clock (strong scaling — identical task set at
both levels), min-of-1 after a full warm-up run. The corpus plants
real Jaccard structure AND a Zipf-style stopword head: docs come in
groups sharing a token base (members above the threshold vs their
siblings), and every doc additionally carries 3 stopwords drawn from a
10-token head — the quadratic hazard that plain token blocking would
hit and that the prefix filter must exclude by construction (the head
tokens have the highest df, so they sort LAST and out of the prefix
for any doc with rarer tokens).

Determinism check: the pair list must be BIT-IDENTICAL across
parallelism levels (md5 of the sorted ``id:id:inter:union`` rows).

    PPJOIN_DOCS=60000 python tools/ppjoin_scale_bench.py 1   # N
    PPJOIN_DOCS=60000 python tools/ppjoin_scale_bench.py 4   # 4N

Prints one JSON line per run; results recorded in BENCH.md §23.
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


def synth_docs(n_docs: int, group_size: int = 4, base_len: int = 12):
    """Deterministic grouped word-soup with a planted stopword head:
    member j of a group swaps j of the 12 base tokens (j=0..3 -> Jaccard
    vs member_0 of 1.0, ~0.85, ~0.71, ~0.6 over the 12+3-token sets),
    then every doc appends the SAME-position 3 stopwords from a 10-token
    head -- df(head) ~ n_docs while df(body) ~ group_size."""
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(50_000)])
    head = np.array([f"the{i}" for i in range(10)])
    n_groups = n_docs // group_size
    texts = []
    for g in range(n_groups):
        base = rng.choice(vocab, size=base_len, replace=False)
        stop = rng.choice(head, size=3, replace=False)
        for j in range(group_size):
            doc = base.copy()
            if j:
                pos = rng.choice(base_len, size=min(j, 3), replace=False)
                doc[pos] = rng.choice(vocab, size=len(pos), replace=False)
            texts.append(" ".join(np.concatenate([doc, stop])))
    texts = texts[:n_docs]
    return pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
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
        .appName(f"rf-ppjoin-scaling-{n_exec}x{cores}")
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

    n_docs = int(os.environ.get("PPJOIN_DOCS", "60000"))
    docs = (
        spark.createDataFrame(synth_docs(n_docs))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n = docs.count()

    def job():
        out = dedup.prefix_filter_jaccard_join(
            docs, threshold_num=3, threshold_den=5
        )
        row = out.agg(
            F.count("*").alias("n_pairs"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(
                                ":",
                                "doc_id_1",
                                "doc_id_2",
                                "inter_sz",
                                "union_sz",
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
                "mode": "ppjoin_jaccard",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_docs": n,
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
