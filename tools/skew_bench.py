"""Adversarial-skew stress bench: does hot-key salting actually bound
max task time at >=1M docs? (north_rule: "explicit skew salting on hot
blocking keys"; VERDICT r2 asked for adversarial-scale MEASUREMENT, not
just unit-tested machinery.)

Corpus (deterministic, 1M docs): every doc carries 3 globally-unique
tokens (zero pair contribution) and docs with doc_id % M < N_HOT carry
the planted hot token ``hot<doc_id % M>`` — N_HOT hot blocking keys of
exactly H = n_docs / M members each. Block sizes are set just under
``drop_cap`` so neither mode drops them: the ENTIRE pair volume
(N_HOT * H^2 / 2) flows through N_HOT hot keys. This is the adversarial
shape: a real Zipf tail adds noise but the stragglers come from exactly
these near-cap keys.

Salted mode spreads each hot key over G = ceil(H / hot_cap) salt
buckets; unsalted mode (hot_cap = 2^62) computes each hot block's pairs
in ONE join task. Reported per mode: pair count (must be EQUAL — salting
is a partitioning choice, not a semantic one), wall, and the max/p75/
median task duration of the heaviest stages from the Spark status REST
API — max-task-time is what stragglers on a 1000-executor cluster are
made of. Stage stats are diffed per mode (only stages submitted by that
mode count).

    python tools/skew_bench.py                 # 1M docs, 24 hot keys x 2000
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
N_HOT = int(os.environ.get("SKEW_N_HOT", "24"))
HOT_MEMBERS = int(os.environ.get("SKEW_HOT_MEMBERS", "2000"))
HOT_CAP = 200
DROP_CAP = int(os.environ.get("SKEW_DROP_CAP", str(HOT_MEMBERS * 2)))
UNSALTED_HOT_CAP = 1 << 62


def skew_corpus(spark, n_docs: int):
    """(doc_id, norm_text): 3 unique tokens per doc + a planted hot token
    on n_docs/M * N_HOT docs (each hot key has exactly HOT_MEMBERS
    members)."""
    m = n_docs // HOT_MEMBERS
    i = F.col("id")
    return spark.range(n_docs).select(
        i.alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("ua"), i),
            F.concat(F.lit("ub"), i),
            F.concat(F.lit("uc"), i),
            F.when(
                (i % m) < N_HOT, F.concat(F.lit("hot"), (i % m))
            ).otherwise(F.concat(F.lit("ud"), i)),
        ).alias("norm_text"),
    )


def _stages(ui_base: str):
    apps = json.load(urllib.request.urlopen(f"{ui_base}/api/v1/applications"))
    app_id = apps[0]["id"]
    return app_id, json.load(
        urllib.request.urlopen(
            f"{ui_base}/api/v1/applications/{app_id}/stages?status=complete"
        )
    )


def stage_task_stats(ui_base: str, exclude: set):
    """Top NEW stages (not in ``exclude``) by max task duration."""
    app_id, stages = _stages(ui_base)
    out = []
    for s in stages:
        if s["stageId"] in exclude:
            continue
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
            {
                "stage": s["stageId"],
                "tasks": s.get("numCompleteTasks", 0),
                "median_task_ms": dur[0],
                "p75_task_ms": dur[1],
                "max_task_ms": dur[2],
            }
        )
    out.sort(key=lambda r: -r["max_task_ms"])
    return out


def run_mode(spark, corpus, hot_cap: int, label: str):
    from rapidfuzz_spark.pipeline import blocking

    ui = spark.sparkContext.uiWebUrl
    _, pre = _stages(ui)
    seen = {s["stageId"] for s in pre}
    keys = corpus.select(
        F.explode(F.array_distinct(F.split("norm_text", r"\s+"))).alias(
            "block_key"
        ),
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
    top = stage_task_stats(ui, seen)[:3]
    rec = {
        "mode": label,
        "hot_cap": hot_cap,
        "drop_cap": DROP_CAP,
        "n_docs": N_DOCS,
        "n_pairs": n_pairs,
        "wall_sec": round(wall, 2),
        "top_stages_by_max_task": top,
    }
    print(json.dumps(rec), flush=True)
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
    corpus = skew_corpus(spark, N_DOCS).localCheckpoint(eager=True)
    n = corpus.count()
    print(
        json.dumps(
            {
                "corpus_docs": n,
                "hot_keys": N_HOT,
                "hot_members_each": HOT_MEMBERS,
                "expected_hot_pairs": N_HOT * HOT_MEMBERS * (HOT_MEMBERS - 1) // 2,
            }
        ),
        flush=True,
    )
    unsalted = run_mode(spark, corpus, UNSALTED_HOT_CAP, "unsalted")
    salted = run_mode(spark, corpus, HOT_CAP, "salted")
    assert salted["n_pairs"] == unsalted["n_pairs"], "salting changed pairs!"
    print(
        json.dumps(
            {
                "pairs_equal": True,
                "max_task_ms_unsalted": unsalted["top_stages_by_max_task"][0][
                    "max_task_ms"
                ],
                "max_task_ms_salted": salted["top_stages_by_max_task"][0][
                    "max_task_ms"
                ],
                "wall_unsalted": unsalted["wall_sec"],
                "wall_salted": salted["wall_sec"],
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
