"""Measures what the round-5 decontamination fusion actually buys: the
wall of ONE `decontamination_report` pass vs the composition of the four
standalone rules (min-hit + fraction + substring + excision) over the
same corpus and eval set — the composition re-explodes the corpus gram
stream once per rule, the fused pass once total.

Corpus: the web-shaped synthetic generator from BENCH §11c (80–239
tokens per doc, so the 13-gram stream is ~100–200 grams/doc — the
explode genuinely dominates, as it does at 100 TB). Eval = 5% md5 draw.
Each variant consumes its frames with one count+sum aggregate per output
so every rule's full result materializes. min-of-N wall per variant.

    DECON_DOCS=60000 python tools/decon_fusion_bench.py

Prints one JSON line; recorded in BENCH.md §20.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("DECON_DOCS", "60000"))
    trials = int(os.environ.get("DECON_TRIALS", "3"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rf-decon-fusion-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from rapidfuzz_spark.textops import training
    from rapidfuzz_spark.textops.sampling import md5_uniform

    # web-shaped docs (same generator family as training_scale_bench):
    # 80-239 tokens drawn from a doc_id-seeded md5 stream so near-by ids
    # share no grams, and every ~9th doc quotes a contiguous slice of a
    # "benchmark" doc so every rule has real positives
    i = F.col("id")
    n_tok = (F.pmod(F.xxhash64(i), F.lit(160)) + 80).cast("int")
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_tok),
            lambda j: F.concat(
                F.lit("w"),
                F.pmod(F.xxhash64(i * 100000 + j), F.lit(50000)).cast("string"),
            ),
        ),
        " ",
    )
    quote = F.when(
        i % 9 == 0,
        F.concat(
            F.lit(" "),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(20)),
                    lambda j: F.concat(
                        F.lit("q"),
                        F.pmod(
                            F.xxhash64((i % 37) * 1000 + j), F.lit(500)
                        ).cast("string"),
                    ),
                ),
                " ",
            ),
        ),
    ).otherwise(F.lit(""))
    docs = (
        spark.range(n_docs)
        .select(i.alias("doc_id"), F.concat(body, quote).alias("text"))
        .localCheckpoint(eager=True)
    )
    docs.count()
    ev = docs.where(md5_uniform("doc_id", "eval") < 0.05)

    def consume(df):
        num = [f.name for f in df.schema.fields
               if f.dataType.typeName() in ("long", "integer", "double")]
        return df.agg(
            F.count("*"), *[F.sum(c) for c in num[:4]]
        ).collect()[0][0]

    def fused():
        consume(training.decontamination_report(
            docs, ev, n=13, min_hits=1, max_frac=0.05))

    def composed():
        consume(training.decontaminate(docs, ev, n=13, min_hits=1))
        consume(training.decontaminate_fraction(docs, ev, n=13, max_frac=0.05))
        consume(training.substring_contamination(docs, ev, anchor_n=13))
        consume(training.excise_contaminated_spans(docs, ev, n=13))

    out = {}
    for name, fn in [("fused_report", fused), ("composed_4_rules", composed)]:
        fn()  # warm-up
        walls = []
        for _ in range(trials):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 2))
        out[name] = {"min_wall_sec": min(walls), "trials": walls}
    out.update(
        n_docs=n_docs,
        cpus=cpus,
        speedup=round(
            out["composed_4_rules"]["min_wall_sec"]
            / out["fused_report"]["min_wall_sec"],
            2,
        ),
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
