"""ExactSubstr at paper-faithful scale (VERDICT r8 #5): window=50
tokens over a >= 1M-doc corpus (the q17 shape x5), with shuffle volume
and straggler profile recorded from the REST status API.  Also runs
window=8 on the same corpus so the dedup fractions can be sanity-
checked against each other.  Appends to BENCH/substr_volume_r09.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from web_content_extraction_benchmark_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REP = int(os.environ.get("SPARK_GRAFT_SUBSTR_REP", "5"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "BENCH", "substr_volume_r09.jsonl")


def main() -> None:
    spark = get_spark("wceb-substr-volume", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    pages = spark.read.parquet("/tmp/wceb_bench/sf0.1_x40/pages")
    # 5 distinct-url copies -> 1M docs; q17 mix (even xxhash64 ids keep
    # gold -> full duplicates; odd ids word-salted -> unique)
    rep = pages.select(
        F.explode(F.sequence(F.lit(0), F.lit(REP - 1))).alias("c"), "url",
        "gold",
    ).select(
        F.concat("url", F.lit("?c="), F.col("c").cast("string")).alias("url"),
        "gold",
    ).repartition(CPUS * 2)
    words = F.split(F.col("gold"), " ")
    docs = rep.select(
        F.xxhash64("url").alias("doc_id"),
        F.when(F.xxhash64("url") % 2 == 0, F.col("gold")).otherwise(
            F.concat_ws(" ", F.transform(
                words, lambda w: F.concat(w, F.lit("~"), F.xxhash64("url"))))
        ).alias("text"),
    ).localCheckpoint()
    n_docs = docs.count()
    n_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]

    from web_content_extraction_benchmark_spark.operators.substr_dedup import (
        dedup_exact_substrings,
    )

    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def stage_stats(since: int) -> dict:
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages"))
        rows = [s for s in stages
                if s["status"] == "COMPLETE" and s["stageId"] >= since]
        total_sw = sum(s.get("shuffleWriteBytes", 0) for s in rows)
        total_sr = sum(s.get("shuffleReadBytes", 0) for s in rows)
        worst = {"ratio": None}
        for s in rows:
            sid = s["stageId"]
            try:
                det = json.load(urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{sid}"
                    "?details=true"))
            except Exception:
                continue
            for att in det:
                durs = sorted(t.get("duration", 0)
                              for t in (att.get("tasks") or {}).values()
                              if t.get("status") == "SUCCESS")
                if len(durs) >= 4:
                    med = max(durs[len(durs) // 2], 1)
                    r = durs[-1] / med
                    if worst["ratio"] is None or durs[-1] > worst.get("max_ms", 0):
                        worst = {"stage": sid, "max_ms": durs[-1],
                                 "median_ms": med, "ratio": round(r, 2)}
        return {"shuffle_write_mb": round(total_sw / 1e6, 1),
                "shuffle_read_mb": round(total_sr / 1e6, 1), **worst}

    for window in (50, 8):
        seen = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages"))
        since = max((s["stageId"] for s in seen), default=-1) + 1
        spark.sparkContext.setJobDescription(f"substr_volume w={window}")
        t0 = time.perf_counter()
        agg = dedup_exact_substrings(docs, window=window).agg(
            F.sum("n_dup_windows"), F.sum("n_tokens_removed"),
            F.count("*")).collect()[0]
        wall = round(time.perf_counter() - t0, 3)
        rec = {
            "window": window, "n_docs": n_docs, "n_tokens": int(n_tokens),
            "wall_s": wall,
            "n_dup_windows": int(agg[0]), "n_tokens_removed": int(agg[1]),
            "removed_frac": round(agg[1] / n_tokens, 4),
            "docs_per_sec": round(n_docs / wall, 1),
            "cpus": CPUS,
            **stage_stats(since),
            "loadavg": float(open("/proc/loadavg").read().split()[0]),
            "ts": int(time.time()),
        }
        print(json.dumps(rec))
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
