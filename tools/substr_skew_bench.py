"""Planted-skew straggler profile for ExactSubstr dedup (r9, VERDICT r8
done-criterion: >= 30% of docs sharing one window, straggler ratio < 2x
vs the uniform case).

Builds two corpora at the same volume:
  - skewed:  35% of docs lead with one shared 8-token boilerplate window
             (site chrome), unique tails;
  - uniform: every doc fully unique.
and times the duplicated-window-start resolution under
  - new:     the r9 groupBy-partial-agg + semi-join plan (the operator);
  - control: the r8 count-over-Window plan, reconstructed inline.
For each run the max/median task duration of the heaviest stage is read
from the REST status API.  Appends one JSON line per (corpus, plan) to
BENCH/substr_skew_r09.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from web_content_extraction_benchmark_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_SKEW_DOCS", "400000"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "substr_skew_r09.jsonl")


def corpus(spark, skewed: bool):
    base = spark.range(0, N_DOCS, 1, CPUS * 2).select(
        F.col("id").alias("doc_id"))
    # unique 24-token tail per doc
    tail = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(0), F.lit(23)),
        lambda i: F.concat(F.lit("u"), F.col("doc_id").cast("string"),
                           F.lit("x"), i.cast("string")),
    ))
    chrome = F.lit("nav home about contact login search footer copyright")
    if skewed:
        text = F.when(
            F.col("doc_id") % 100 < 35, F.concat(chrome, F.lit(" "), tail)
        ).otherwise(tail)
    else:
        text = tail
    return base.select("doc_id", text.alias("text"))


def starts_new(docs):
    from web_content_extraction_benchmark_spark.operators.substr_dedup import (
        dedup_exact_substrings,
    )

    return dedup_exact_substrings(docs).agg(
        F.sum("n_dup_windows"), F.sum("n_tokens_removed"))


def starts_control(docs, window: int = 8):
    """The r8 count-over-Window occurrence plan, reconstructed."""
    toks = F.split(F.col("text"), " ")
    hashed = docs.select(
        F.col("doc_id"),
        F.transform(toks, lambda x: F.xxhash64(x)).alias("_th"),
    )
    th = F.col("_th")
    n = F.size(th)
    idx = F.when(n >= window, F.sequence(F.lit(0), n - window)).otherwise(
        F.array().cast("array<int>"))
    keys = F.transform(
        idx, lambda i: F.xxhash64(*[F.get(th, i + j) for j in range(window)]))
    occ = hashed.select(F.col("doc_id"), F.posexplode(keys).alias("pos", "_k"))
    w = Window.partitionBy("_k")
    starts = (
        occ.withColumn("_c", F.count("*").over(w))
        .filter(F.col("_c") >= 2)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("_starts"))
    )
    return starts.agg(F.sum(F.size("_starts")))


def task_skew(ui: str, since_stage: int) -> dict:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    worst = {"stage": None, "max_ms": 0, "median_ms": 0, "ratio": None}
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages"))
    for st in stages:
        if st["status"] != "COMPLETE" or st["stageId"] < since_stage:
            continue
        sid = st["stageId"]
        try:
            detail = json.load(urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
                f"?withSummaries=false&details=true"))
        except Exception:
            continue
        for att in detail:
            tasks = att.get("tasks") or {}
            durs = sorted(
                t.get("duration", 0) for t in tasks.values()
                if t.get("status") == "SUCCESS")
            if len(durs) < 4:
                continue
            med = durs[len(durs) // 2]
            if durs[-1] > worst["max_ms"]:
                worst = {
                    "stage": sid, "max_ms": durs[-1], "median_ms": med,
                    "ratio": round(durs[-1] / max(med, 1), 2),
                    "n_tasks": len(durs),
                }
    return worst


def main() -> None:
    spark = get_spark("wceb-substr-skew", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    results = []
    for corpus_kind in ("uniform", "skewed"):
        docs = corpus(spark, skewed=(corpus_kind == "skewed"))
        for plan, fn in (("new", starts_new), ("control_window",
                                               starts_control)):
            since = spark.sparkContext.statusTracker().getJobIdsForGroup(
                None)
            first_stage = 0
            # track stages created from here on via a marker job count
            stages_before = json.load(urllib.request.urlopen(
                f"{ui}/api/v1/applications"))
            app_id = stages_before[0]["id"]
            seen = json.load(urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages"))
            first_stage = max((s["stageId"] for s in seen), default=-1) + 1
            spark.sparkContext.setJobDescription(
                f"substr_skew {corpus_kind} {plan}")
            t0 = time.perf_counter()
            fn(docs).collect()
            wall = round(time.perf_counter() - t0, 3)
            skew = task_skew(ui, first_stage)
            row = {"corpus": corpus_kind, "plan": plan, "wall_s": wall,
                   "n_docs": N_DOCS, "cpus": CPUS, **skew,
                   "ts": int(time.time())}
            results.append(row)
            print(json.dumps(row))
    with open(OUT, "a") as f:
        for row in results:
            f.write(json.dumps(row) + "\n")
    # headline criterion: new-plan straggler ratio on the skewed corpus
    # vs the uniform corpus
    new = {r["corpus"]: r for r in results if r["plan"] == "new"}
    if new.get("skewed") and new.get("uniform"):
        print(json.dumps({
            "criterion": "skewed/uniform straggler ratio (new plan)",
            "skewed_ratio": new["skewed"]["ratio"],
            "uniform_ratio": new["uniform"]["ratio"],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
