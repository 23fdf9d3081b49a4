"""N-vs-4N scaling evidence for the exact edit-distance self-join
(textops/edjoin.py:edit_distance_join) — the Ed-Join companion to the
PPJoin measurement (§23).

Methodology mirrors §19/§21/§23: real executor JVMs via
``local-cluster[N,4,mem]``, input materialized at a FIXED 128
partitions before the clock (strong scaling — identical task set at
both levels), min-of-1 after a full warm-up run.

Corpus: Zipf-sampled word strings (4 words from a 50k random-word
vocabulary, Zipf exponent 1.05) — so the positional q-gram df
distribution has the real-text shape: a hot head (grams of the top
words appear in a large fraction of docs — the quadratic hazard) and a
long rare tail (what the rarest-first prefix actually joins on). Each
group of 3 plants ed<=2 structure: base, 1-char mutant, 2-char mutant.

Determinism check: the verified pair list must be BIT-IDENTICAL across
parallelism levels (md5 of the sorted ``id:id:dist`` rows).

    EDJOIN_DOCS=120000 python tools/edjoin_scale_bench.py 1   # N
    EDJOIN_DOCS=120000 python tools/edjoin_scale_bench.py 4   # 4N

Prints one JSON line per run; results recorded in BENCH.md §25.
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


def synth_docs(n_docs: int, group_size: int = 3):
    """Deterministic Zipf word-soup with planted ed<=2 groups: member j
    of a group applies j random single-char edits (sub/del/ins) to the
    base string, so (base, m1) is ed<=1, (base, m2) ed<=2, (m1, m2)
    ed<=3 — the k=2 join must find the first two and judge the third
    exactly."""
    rng = np.random.default_rng(42)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.array(
        [
            "".join(rng.choice(letters, size=rng.integers(4, 9)))
            for _ in range(50_000)
        ]
    )
    # Zipf ranks over the vocab (real-text df shape for the grams)
    ranks = rng.zipf(1.05, size=n_docs * 4).astype(np.int64) % len(vocab)
    words = vocab[ranks].reshape(-1, 4)
    n_groups = n_docs // group_size
    texts = []
    for g in range(n_groups):
        base = " ".join(words[g])
        texts.append(base)
        for j in range(1, group_size):
            s = list(base)
            for _ in range(j):
                p = int(rng.integers(0, len(s)))
                op = int(rng.integers(0, 3))
                if op == 0 and len(s) > 1:
                    del s[p]
                elif op == 1:
                    s[p] = str(rng.choice(letters))
                else:
                    s.insert(p, str(rng.choice(letters)))
            texts.append("".join(s))
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
        .appName(f"rf-edjoin-scaling-{n_exec}x{cores}")
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
    from rapidfuzz_spark.textops.edjoin import edit_distance_join

    n_docs = int(os.environ.get("EDJOIN_DOCS", "120000"))
    k = int(os.environ.get("EDJOIN_K", "2"))
    q = int(os.environ.get("EDJOIN_Q", "3"))
    docs = (
        spark.createDataFrame(synth_docs(n_docs))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n = docs.count()

    def job():
        out = edit_distance_join(docs, "text", k=k, q=q)
        row = out.agg(
            F.count("*").alias("n_pairs"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(":", "doc_id_1", "doc_id_2", "dist")
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
                "mode": "edjoin",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_docs": n,
                "k": k,
                "q": q,
                "n_pairs": n_pairs,
                "pairs_md5": pairs_md5,
                "wall_sec": round(wall, 3),
                "docs_per_sec": round(n / wall, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
