"""Skewed-host stress for quota_per_key (VERDICT r4 next #7): one host
owns 50% of a multi-million-row corpus; the per-host quota must cut it
MAP-SIDE (WindowGroupLimit's Partial pass runs per input partition
before the exchange), so no single task drags the stage.

Evidence captured: wall time, row counts, and the per-task
executorRunTime quantiles of every stage in the job (Spark status REST
API taskSummary) — the straggler ratio (max/median task time of the
heaviest stage) is the number the 100 TB story needs.  A quota operator
that shuffled the hot host's rows to one reducer would show max/median
>> 2; the map-side cut keeps tasks balanced.

Usage: python tools/quota_skew_stress.py [sf_dir] [replicate] [quota]
Defaults: /root/testdata/sf0.1, 400 (-> 2M rows), 1000.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _parse_api_ts(ts: str) -> float:
    """'2026-08-17T03:21:05.576GMT' -> epoch ms (0 if unparseable)."""
    from datetime import datetime, timezone

    try:
        dt = datetime.strptime(ts.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
        return dt.replace(tzinfo=timezone.utc).timestamp() * 1000
    except ValueError:
        return 0.0


def _stage_summaries(spark, since_ms: int) -> list[dict]:
    try:
        ui = spark.sparkContext.uiWebUrl
        with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=5) as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=10,
        ) as r:
            stages = json.load(r)
        out = []
        for s in stages:
            sub = s.get("submissionTime", "")
            if s.get("firstTaskLaunchedTime") is None:
                continue
            # only stages submitted INSIDE the timed window: without
            # this, the 'heaviest stage' pick can bind to an untimed
            # corpus-build/warm-up stage and report its skew instead
            if _parse_api_ts(sub) < since_ms:
                continue
            sid, att = s["stageId"], s["attemptId"]
            try:
                with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app_id}/stages/{sid}/{att}"
                    "/taskSummary?quantiles=0.5,0.9,1.0",
                    timeout=10,
                ) as r:
                    q = json.load(r)
                run = q.get("executorRunTime", [0, 0, 0])
                out.append(
                    {
                        "stage": sid,
                        "name": s.get("name", "")[:60],
                        "n_tasks": s.get("numCompleteTasks"),
                        "task_ms_p50": run[0],
                        "task_ms_p90": run[1],
                        "task_ms_max": run[2],
                        "submitted": sub,
                    }
                )
            except Exception:
                continue
        return out
    except Exception as exc:
        return [{"error": str(exc)}]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    quota = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    from web_content_extraction_benchmark_spark.operators.sampling import (
        quota_per_key,
    )
    from web_content_extraction_benchmark_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()))
    spark = get_spark("quota-skew-stress", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(replicate - 1)))
    ).select(
        (
            F.col("doc_id")
            + F.col("copy").cast("long") * F.lit(10_000_000).cast("long")
        ).alias("doc_id"),
        # 50% of ALL rows land on one hot host; the rest spread over 997
        F.when(F.col("doc_id") % 2 == 0, F.lit("hot.example")).otherwise(
            F.concat(F.lit("host"), (F.col("doc_id") % 997).cast("string"),
                     F.lit(".example"))
        ).alias("host"),
        "text",
    ).persist()
    n_rows = corpus.count()
    hot_rows = corpus.filter(F.col("host") == "hot.example").count()

    started_ms = int(time.time() * 1000)
    t0 = time.perf_counter()
    capped = quota_per_key(corpus, quota, key_col="host")
    out_rows = capped.count()
    hot_out = capped.filter(F.col("host") == "hot.example").count()
    wall = time.perf_counter() - t0

    stages = _stage_summaries(spark, started_ms)
    # heaviest stage = largest p50 task time with >= 2 tasks
    heavy = max(
        (s for s in stages if s.get("n_tasks", 0) and s["n_tasks"] >= 2),
        key=lambda s: s.get("task_ms_p50", 0),
        default=None,
    )
    straggler = (
        round(heavy["task_ms_max"] / max(1.0, heavy["task_ms_p50"]), 2)
        if heavy
        else None
    )
    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "hot_fraction": round(hot_rows / n_rows, 4),
                "quota": quota,
                "out_rows": out_rows,
                "hot_out_rows": hot_out,
                "wall_sec": round(wall, 2),
                "heaviest_stage": heavy,
                "straggler_max_over_median": straggler,
                "stages": stages[-8:],
                "cpus": cpus,
                "loadavg_at_start": os.getloadavg()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
