"""O(batch) evidence for incremental connected-components maintenance
(pipeline/cluster.py:incremental_connected_components) — the clustering
analogue of the maintained-LSH increment contract (BENCH §11b+).

Claim under test: folding a FIXED batch of new match edges into an
existing assignment table costs O(|batch| + |touched clusters|), NOT
O(|base|): the base is consumed by two broadcast-probe scans only
(plan-locked in tests/test_plans.py), so increment wall should stay
near-flat as the base grows 4x, while a full re-cluster grows with the
base. Run at two base sizes and compare:

    INCCC_BASE=1000000 python tools/inccc_scale_bench.py
    INCCC_BASE=4000000 python tools/inccc_scale_bench.py

Determinism/equivalence: the updated assignment's content hash
(sum of crc32(doc_id:entity_id), order-independent) must equal the
full-recompute hash on the same base+batch (checked in-run at the
small size via INCCC_CHECK=1).

Prints one JSON line; results recorded in BENCH.md §26.
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

PARTS = 64


def synth_assign(n_docs: int, cluster_size: int = 5) -> pd.DataFrame:
    """Deterministic base clustering: doc i belongs to cluster
    i // cluster_size, entity = min doc of the cluster (the invariant
    assign_entities maintains)."""
    ids = np.arange(n_docs, dtype=np.int64)
    ent = (ids // cluster_size) * cluster_size
    return pd.DataFrame({"doc_id": ids, "entity_id": ent})


def synth_batch(n_docs: int, n_edges: int, seed: int = 7) -> pd.DataFrame:
    """Batch edges: half merge random existing clusters, half attach
    brand-new docs (ids above the base range)."""
    rng = np.random.default_rng(seed)
    half = n_edges // 2
    a = rng.integers(0, n_docs, size=half)
    b = rng.integers(0, n_docs, size=half)
    new_ids = n_docs + np.arange(n_edges - half, dtype=np.int64)
    c = rng.integers(0, n_docs, size=n_edges - half)
    return pd.DataFrame(
        {
            "doc_id_1": np.concatenate([a, new_ids]),
            "doc_id_2": np.concatenate([b, c]),
        }
    )


def content_hash(assign_df) -> int:
    return int(
        assign_df.select(
            F.sum(
                F.crc32(
                    F.concat_ws(
                        ":",
                        F.col("doc_id").cast("string"),
                        F.col("entity_id").cast("string"),
                    ).cast("binary")
                )
            ).alias("h")
        ).collect()[0]["h"]
    )


def main() -> None:
    n_base = int(os.environ.get("INCCC_BASE", "1000000"))
    n_edges = int(os.environ.get("INCCC_EDGES", "10000"))
    check = os.environ.get("INCCC_CHECK", "0") == "1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"rf-inccc-{n_base}")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rapidfuzz_spark.pipeline import cluster

    base_path = f"/tmp/rf_inccc_base_{n_base}"
    spark.createDataFrame(synth_assign(n_base)).repartition(PARTS).write.mode(
        "overwrite"
    ).parquet(base_path)
    assign = spark.read.parquet(base_path)
    batch = spark.createDataFrame(synth_batch(n_base, n_edges)).coalesce(
        4
    ).localCheckpoint(eager=True)

    def job() -> int:
        out = cluster.incremental_connected_components(assign, batch)
        return content_hash(out)

    h_warm = job()  # warm-up (workers, codegen)
    t0 = time.perf_counter()
    h_inc = job()
    wall_inc = time.perf_counter() - t0
    assert h_inc == h_warm

    rec = {
        "mode": "incremental_cc",
        "n_base": n_base,
        "n_batch_edges": n_edges,
        "wall_increment_sec": round(wall_inc, 3),
        "inc_hash": h_inc,
    }
    if check:
        star = assign.where(F.col("doc_id") != F.col("entity_id")).select(
            F.col("doc_id").alias("doc_id_1"),
            F.col("entity_id").alias("doc_id_2"),
        )
        t0 = time.perf_counter()
        comps = cluster.connected_components(star.unionByName(batch))
        docs = (
            assign.select("doc_id")
            .unionByName(batch.select(F.col("doc_id_1").alias("doc_id")))
            .unionByName(batch.select(F.col("doc_id_2").alias("doc_id")))
            .distinct()
        )
        full = cluster.assign_entities(docs, comps)
        h_full = content_hash(full)
        rec["wall_full_recluster_sec"] = round(time.perf_counter() - t0, 3)
        rec["full_hash"] = h_full
        rec["hashes_equal"] = h_full == h_inc
    print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
