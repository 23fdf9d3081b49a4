"""Measures T61's two claims about meta-blocking WEP
(pipeline/blocking.py:meta_block_wep):

1. "The CBS weights are FREE": the weight aggregation
   groupBy(pair).count() is the same hash exchange the plain pipeline
   pays for pair dedup (dropDuplicates(pair)) — so wall(meta_block) /
   wall(dedup) should be ~1 (the extra scalar mean + broadcast flag is
   noise).
2. The WEP cut: fraction of candidate pairs pruned at the mean-weight
   threshold on a redundancy-positive (token-key) blocking graph.

Also measures the node-centric schemes on the same graph (T67/T68):
WNP's per-node thresholds (one node aggregation + two join-backs on
top of the shared CBS exchange) and CNP's k=2 top-k window, with their
kept fractions — quantifying what the recall-preserving / budgeted
variants cost over the edge-threshold baseline.

Corpus: grouped word-soup (the ppjoin_scale_bench generator) — docs in
groups of 4 sharing most of an 8-token base from a sized vocab, so
same-group pairs share many keys (high CBS) and cross-group collisions
share one (CBS 1): the structure WEP exists to separate.

    METABLOCK_DOCS=200000 python tools/metablock_bench.py

Prints one JSON line; recorded in BENCH.md §24.
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


def synth_keys(n_docs: int, group_size: int = 4, base_len: int = 8,
               vocab_n: int = 100_000) -> pd.DataFrame:
    rng = np.random.default_rng(42)
    vocab = np.array([f"w{i}" for i in range(vocab_n)])
    n_groups = n_docs // group_size
    doc_ids, toks = [], []
    for g in range(n_groups):
        base = rng.choice(vocab, size=base_len, replace=False)
        for j in range(group_size):
            doc = base.copy()
            if j:
                pos = rng.choice(base_len, size=min(j, 2), replace=False)
                doc[pos] = rng.choice(vocab, size=len(pos), replace=False)
            d = g * group_size + j
            doc_ids.extend([d] * base_len)
            toks.extend(doc.tolist())
    return pd.DataFrame({"block_key": toks, "doc_id": doc_ids})


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .appName("rf-metablock-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rapidfuzz_spark.pipeline import blocking

    n_docs = int(os.environ.get("METABLOCK_DOCS", "200000"))
    keys = (
        spark.createDataFrame(synth_keys(n_docs))
        .repartition(cpus)
        .localCheckpoint(eager=True)
    )
    n_keys = keys.count()

    left = keys.select("block_key", F.col("doc_id").alias("doc_id_1"))
    right = keys.select("block_key", F.col("doc_id").alias("doc_id_2"))
    raw_pairs = left.join(right, "block_key").where(
        F.col("doc_id_1") < F.col("doc_id_2")
    )

    def timed(fn, trials=3):
        best, val = float("inf"), None
        for _ in range(trials):
            t0 = time.perf_counter()
            v = fn()
            best = min(best, time.perf_counter() - t0)
            val = v
        return best, val

    # mode A: the plain pipeline's pair dedup (what candidate_pairs ends in)
    dedup_wall, n_dedup = timed(
        lambda: raw_pairs.select("doc_id_1", "doc_id_2")
        .dropDuplicates(["doc_id_1", "doc_id_2"])
        .count()
    )
    # mode B: meta-blocking — same exchange + count + mean + flag
    def run_meta():
        out = blocking.meta_block_wep(keys)
        row = out.agg(
            F.count("*").alias("n_edges"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        ).collect()[0]
        return int(row["n_edges"]), int(row["n_kept"])

    meta_wall, (n_edges, n_kept) = timed(run_meta)

    # modes C/D: the node-centric schemes — WNP pays one node-keyed
    # aggregation + two threshold join-backs on top of the shared CBS
    # exchange; CNP swaps the aggregation for a node-partitioned top-k
    # window + two survivor join-backs
    def run_scheme(fn):
        def go():
            out = fn(keys)
            row = out.agg(
                F.count("*").alias("n_edges"),
                F.sum(F.col("kept").cast("long")).alias("n_kept"),
            ).collect()[0]
            return int(row["n_edges"]), int(row["n_kept"])

        return go

    wnp_wall, (wnp_edges, wnp_kept) = timed(
        run_scheme(blocking.meta_block_wnp)
    )
    cnp_wall, (cnp_edges, cnp_kept) = timed(
        run_scheme(lambda kk: blocking.meta_block_cnp(kk, k=2))
    )

    print(
        json.dumps(
            {
                "mode": "metablock_wep",
                "n_docs": n_docs,
                "n_key_rows": n_keys,
                "n_candidate_pairs": n_edges,
                "dedup_only_wall_sec": round(dedup_wall, 3),
                "meta_block_wall_sec": round(meta_wall, 3),
                "overhead_ratio": round(meta_wall / dedup_wall, 3),
                "wep_kept": n_kept,
                "wep_kept_frac": round(n_kept / n_edges, 4),
                "wnp_wall_sec": round(wnp_wall, 3),
                "wnp_overhead_ratio": round(wnp_wall / dedup_wall, 3),
                "wnp_kept": wnp_kept,
                "wnp_kept_frac": round(wnp_kept / wnp_edges, 4),
                "cnp_wall_sec": round(cnp_wall, 3),
                "cnp_overhead_ratio": round(cnp_wall / dedup_wall, 3),
                "cnp_k": 2,
                "cnp_kept": cnp_kept,
                "cnp_kept_frac": round(cnp_kept / cnp_edges, 4),
                "dedup_pairs_equal": n_dedup == n_edges
                and wnp_edges == n_edges
                and cnp_edges == n_edges,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
