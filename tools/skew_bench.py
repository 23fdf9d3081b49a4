"""Adversarial-skew stress bench: does hot-key salting actually bound
max task time on a Zipf-token corpus at >=1M docs? (north_rule: "explicit
skew salting on hot blocking keys"; VERDICT r2 asked for adversarial-scale
MEASUREMENT, not just unit-tested machinery.)

Corpus: N docs whose tokens are drawn from a Zipf-like distribution
(token id = floor(V * u^4), u uniform — top tokens appear in 10^4-10^5
docs), so token blocking keys are catastrophically hot. Both runs use the
same drop_cap (keys above it are dropped as stopword-grade in either
mode); the salted run spreads every surviving hot key over
G = ceil(count/hot_cap) salt buckets, the unsalted run (hot_cap = 2^62)
computes each hot block's pairs in ONE join task.

Reported per run: pair count (must be EQUAL — salting is a partitioning
choice, not a semantic one), wall, and the max/p75/median task duration
of the pair-join stage from the Spark status REST API — the skew claim
is max-task-time, which is what stragglers on a 1000-executor cluster
are made of.

    python tools/skew_bench.py            # both modes, 1M docs
    SKEW_DOCS=2000000 python tools/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N_DOCS = int(os.environ.get("SKEW_DOCS", "1000000"))
VOCAB = int(os.environ.get("SKEW_VOCAB", "50000"))
TOKS_PER_DOC = 5
HOT_CAP = 200
DROP_CAP = int(os.environ.get("SKEW_DROP_CAP", "8000"))
UNSALTED_HOT_CAP = 1 << 62


def zipf_corpus(spark, n_docs: int, seed: int = 7):
    """(doc_id, text): TOKS_PER_DOC tokens, token id = floor(V * u^4) —
    a heavy-tailed (Zipf-ish) frequency profile where the hottest tokens
    land in ~V^(-1/4) of all docs."""
    cols = [
        F.concat(
            F.lit("t"),
            F.floor(F.pow(F.rand(seed + j), 4) * VOCAB).cast("long").cast("string"),
        )
        for j in range(TOKS_PER_DOC)
    ]
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *cols).alias("norm_text"),
    )


def stage_task_stats(ui_base: str):
    """Top stages by max task duration from the status REST API:
    [(stage_id, name, num_tasks, max_ms, p75_ms, median_ms)]."""
    apps = json.load(urllib.request.urlopen(f"{ui_base}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )
    out = []
    for s in stages:
        q = (
            f"{ui_base}/api/v1/applications/{app_id}/stages/{s['stageId']}/"
            f"{s['attemptId']}/taskSummary?quantiles=0.5,0.75,1.0"
        )
        try:
            ts = json.load(urllib.request.urlopen(q))
        except Exception:
            continue
        dur = ts.get("duration") or [0, 0, 0]
        out.append(
            (
                s["stageId"],
                s.get("name", "")[:60],
                s.get("numCompleteTasks", 0),
                dur[2],
                dur[1],
                dur[0],
            )
        )
    out.sort(key=lambda r: -r[3])
    return out


def run_mode(spark, corpus, hot_cap: int, label: str):
    from rapidfuzz_spark.pipeline import blocking

    # token keys only: the skew carrier (affix/SN keys are near-uniform)
    keys = corpus.select(
        F.explode(
            F.array_distinct(F.split("norm_text", r"\s+"))
        ).alias("block_key"),
        "doc_id",
    )
    caches: list = []
    t0 = time.perf_counter()
    n_pairs = blocking.candidate_pairs(
        keys, hot_cap=hot_cap, drop_cap=DROP_CAP, cache_out=caches
    ).count()
    wall = time.perf_counter() - t0
    for c in caches:
        c.unpersist()
    stats = stage_task_stats(spark.sparkContext.uiWebUrl)
    top = [
        {
            "stage": sid,
            "tasks": n,
            "max_task_ms": mx,
            "p75_task_ms": p75,
            "median_task_ms": med,
            "name": name,
        }
        for sid, name, n, mx, p75, med in stats[:3]
    ]
    rec = {
        "mode": label,
        "hot_cap": hot_cap,
        "drop_cap": DROP_CAP,
        "n_docs": N_DOCS,
        "n_pairs": n_pairs,
        "wall_sec": round(wall, 2),
        "top_stages_by_max_task": top,
    }
    print(json.dumps(rec))
    return rec


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rf-skew-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        # AQE's own skew-join splitting would mask what the EXPLICIT
        # salting contributes; the north rule demands explicit salting,
        # so measure it unassisted
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4057")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = zipf_corpus(spark, N_DOCS).localCheckpoint(eager=True)
    n = corpus.count()
    hottest = (
        corpus.select(F.explode(F.split("norm_text", r"\s+")).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"))
        .limit(5)
        .collect()
    )
    print(
        json.dumps(
            {
                "corpus_docs": n,
                "hottest_tokens": {r.t: r["count"] for r in hottest},
            }
        )
    )
    # salted first, then unsalted (stage stats accumulate; top-by-max of
    # the second run dominates regardless of order — label by wall too)
    salted = run_mode(spark, corpus, HOT_CAP, "salted")
    unsalted = run_mode(spark, corpus, UNSALTED_HOT_CAP, "unsalted")
    assert salted["n_pairs"] == unsalted["n_pairs"], "salting changed pairs!"
    print(
        json.dumps(
            {
                "pairs_equal": True,
                "max_task_ms_salted": salted["top_stages_by_max_task"][0][
                    "max_task_ms"
                ],
                "max_task_ms_unsalted": unsalted["top_stages_by_max_task"][0][
                    "max_task_ms"
                ],
                "wall_salted": salted["wall_sec"],
                "wall_unsalted": unsalted["wall_sec"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
