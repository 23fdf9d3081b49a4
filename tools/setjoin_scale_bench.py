"""N-vs-4N scaling evidence for the generalized prefix-filter set-
similarity join (textops/dedup.py:prefix_filter_set_join, cosine
measure) — companion to the Jaccard PPJoin run in BENCH §23, same
methodology: real executor JVMs via ``local-cluster[N,4,mem]``, input
materialized at a FIXED 128 partitions before the clock (strong
scaling), min-of-1 after a full warm-up, and a BIT-IDENTICAL pair-list
check across parallelism levels (md5 of the sorted rows). The corpus
is §23's grouped word-soup with a planted Zipf stopword head (imported
from ppjoin_scale_bench), which the rarity-ordered prefix must exclude
by construction.

    SETJOIN_DOCS=60000 python tools/setjoin_scale_bench.py 1   # N
    SETJOIN_DOCS=60000 python tools/setjoin_scale_bench.py 4   # 4N

Prints one JSON line per run; results recorded in BENCH.md §26.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tools.ppjoin_scale_bench import PARTS, synth_docs


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
        .appName(f"rf-setjoin-scaling-{n_exec}x{cores}")
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

    n_docs = int(os.environ.get("SETJOIN_DOCS", "60000"))
    docs = (
        spark.createDataFrame(synth_docs(n_docs))
        .repartition(PARTS)
        .localCheckpoint(eager=True)
    )
    n = docs.count()

    def job():
        out = dedup.prefix_filter_set_join(
            docs, measure="cosine", threshold_num=7, threshold_den=10
        )
        row = out.agg(
            F.count("*").alias("n_pairs"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.sort_array(
                        F.collect_list(
                            F.concat_ws(
                                ":", "doc_id_1", "doc_id_2", "inter_sz",
                                "n1", "n2",
                            )
                        )
                    ),
                ).cast("binary")
            ).alias("pairs_md5"),
        ).collect()[0]
        return int(row["n_pairs"]), row["pairs_md5"]

    job()  # warm-up
    t0 = time.perf_counter()
    n_pairs, pairs_md5 = job()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": "setjoin_cosine",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_docs": n,
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
