"""Pure-exchange control for the single-host scaling decomposition:
how well does a Spark shuffle WITH NO USER COMPUTE strong-scale from
1 to 4 executors on this machine?

On a real cluster, 4x executors means 4x DRAM buses and 4x NIC/disk
lanes, so exchange throughput scales with the machines. On a single
host, every executor JVM shares ONE memory bus — shuffle write,
shuffle fetch, and row (de)serialization are all memory-bandwidth
bound, so a pure shuffle sets the CEILING any exchange-heavy phase can
reach at 4x parallelism here. Comparing a pipeline phase's 1->4
efficiency against this control separates "our plan serializes work"
(phase scales worse than the control) from "the host ran out of DRAM
bandwidth" (phase matches the control).

    SHUFFLE_ROWS=40000000 python tools/shuffle_dram_bench.py 1
    SHUFFLE_ROWS=40000000 python tools/shuffle_dram_bench.py 4

Prints one JSON line; recorded in BENCH.md §16.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

PARTS = 128


def main() -> None:
    n_exec = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cores = int(os.environ.get("SCALING_CORES_PER_EXEC", "4"))
    mem_mb = int(os.environ.get("SCALING_EXEC_MB", "8192"))
    n_rows = int(os.environ.get("SHUFFLE_ROWS", "40000000"))
    spark = (
        SparkSession.builder.master(f"local-cluster[{n_exec},{cores},{mem_mb}]")
        .config("spark.executor.memory", f"{mem_mb}m")
        .appName(f"rf-shuffle-dram-{n_exec}x{cores}")
        .config("spark.sql.shuffle.partitions", str(PARTS))
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # ~32 bytes/row of shuffle payload (two longs + a 16-char string),
    # hash-partitioned on a uniform key: all-to-all exchange, no skew,
    # and the "aggregation" after the exchange is a count — i.e. the
    # wall is the exchange itself (serialize, write, fetch, deserialize)
    df = (
        spark.range(n_rows, numPartitions=PARTS)
        .select(
            F.col("id"),
            F.xxhash64("id").alias("k"),
            F.md5(F.col("id").cast("string")).substr(1, 16).alias("pad"),
        )
        .localCheckpoint(eager=True)  # input materialized off the clock
    )
    df.count()

    def job() -> int:
        return (
            df.repartition(PARTS, "k")
            .groupBy(F.pmod("k", F.lit(1024)).alias("b"))
            .agg(F.count("*").alias("n"), F.max("pad").alias("m"))
            .count()
        )

    job()  # warm-up
    t0 = time.perf_counter()
    n = job()
    wall = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": "pure_shuffle",
                "executors": n_exec,
                "cores_per_executor": cores,
                "n_rows": n_rows,
                "out_groups": n,
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(n_rows / wall, 1),
                "partitions": PARTS,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
