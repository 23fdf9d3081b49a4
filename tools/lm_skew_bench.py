"""Zipf-head skew stress bench for the LM-scorer token-key joins
(VERDICT r4 #4: unigram/bigram_logprob's c1/vocab joins rely on AQE
alone; measure the head, then show the explicit fix).

Corpus (deterministic, >=1M docs): every doc carries 9 planted stopword
tokens (3x each of "the"/"of"/"and") plus one globally-unique token — a
3-key Zipf head owning 90% of a 10M-row token stream, the adversarial
shape of a web corpus's stopword head. The vocabulary (~1M distinct
tokens) is forced past the broadcast threshold, as it is at web scale,
so the probe stream genuinely hash-partitions on the token key.

Three modes over the SAME input, all producing identical results
(checksummed):

  unsalted_noaqe — static plan: every "the" row lands in ONE task
  unsalted_aqe   — AQE skew-join split (the reactive backstop)
  salted_noaqe   — salt_hot_tokens explicit head split (the plan-level
                   fix; measured unassisted, AQE off)

Reported per mode: wall + max/p75/median task duration of the heaviest
new stages (Spark status REST API) — max-task-time is what stragglers
on a 1000-executor cluster are made of.

    python tools/lm_skew_bench.py                 # 1M docs
    LM_SKEW_DOCS=2000000 python tools/lm_skew_bench.py

Prints one JSON line per mode; results recorded in BENCH.md §17.
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

N_DOCS = int(os.environ.get("LM_SKEW_DOCS", "1000000"))
N_SALTS = int(os.environ.get("LM_SKEW_SALTS", "16"))
HOT_MIN = int(os.environ.get("LM_SKEW_HOT_MIN", "100000"))


def skew_corpus(spark, n_docs: int):
    i = F.col("id")
    return spark.range(n_docs).select(
        i.alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("the of and the of and the of and"),
            F.concat(F.lit("u"), i),
        ).alias("text"),
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


def run_mode(spark, corpus, label: str, aqe: bool, salt):
    from rapidfuzz_spark.textops import quality

    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    ui = spark.sparkContext.uiWebUrl
    _, pre = _stages(ui)
    seen = {s["stageId"] for s in pre}
    t0 = time.perf_counter()
    out = quality.unigram_logprob(corpus, salt_hot=salt)
    row = out.agg(
        F.sum("n_tokens").alias("tok_sum"),
        F.round(F.sum("mean_logprob"), 3).alias("lp_sum"),
        F.count("*").alias("n"),
    ).collect()[0]
    wall = time.perf_counter() - t0
    rec = {
        "mode": label,
        "aqe": aqe,
        "salt": salt,
        "n_docs": int(row["n"]),
        "tok_sum": int(row["tok_sum"]),
        "lp_sum": float(row["lp_sum"]),
        "wall_sec": round(wall, 2),
        "top_stages_by_max_task": stage_task_stats(ui, seen)[:3],
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("rf-lm-skew-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.driver.memory", "24g")
        # a web-scale vocabulary cannot broadcast; force the shuffled
        # join regime the operator actually faces at 10^12 docs
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4058")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    corpus = skew_corpus(spark, N_DOCS).localCheckpoint(eager=True)
    n = corpus.count()
    print(json.dumps({"corpus_docs": n, "n_salts": N_SALTS}), flush=True)
    a = run_mode(spark, corpus, "unsalted_noaqe", aqe=False, salt=None)
    b = run_mode(spark, corpus, "unsalted_aqe", aqe=True, salt=None)
    c = run_mode(
        spark, corpus, "salted_noaqe", aqe=False, salt=(N_SALTS, HOT_MIN)
    )
    assert a["tok_sum"] == b["tok_sum"] == c["tok_sum"]
    assert a["lp_sum"] == b["lp_sum"] == c["lp_sum"]
    print(
        json.dumps(
            {
                "results_equal": True,
                "max_task_ms": {
                    "unsalted_noaqe": a["top_stages_by_max_task"][0]["max_task_ms"],
                    "unsalted_aqe": b["top_stages_by_max_task"][0]["max_task_ms"],
                    "salted_noaqe": c["top_stages_by_max_task"][0]["max_task_ms"],
                },
                "wall_sec": {
                    "unsalted_noaqe": a["wall_sec"],
                    "unsalted_aqe": b["wall_sec"],
                    "salted_noaqe": c["wall_sec"],
                },
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
