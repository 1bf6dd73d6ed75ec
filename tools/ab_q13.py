"""Interleaved A/B of bench q13 in a fresh session (one run per process).

Usage: python tools/ab_q13.py {warm|cold}
Prints one line: {"mode": ..., "q13": sec}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

mode = sys.argv[1]
if mode == "cold":
    os.environ["SPARK_GRAFT_WARM_SESSION"] = "0"

from pyspark.sql import functions as F  # noqa: E402

from web_content_extraction_benchmark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CACHE_ROOT = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/wceb_bench")
TAG = f"{os.path.basename(SF_DIR.rstrip('/'))}_x40"
PAGES_PATH = os.path.join(CACHE_ROOT, TAG, "pages")


def main() -> None:
    spark = get_spark("wceb-ab-q13", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(PAGES_PATH)
    pages.count()

    from web_content_extraction_benchmark_spark.operators.dedup import (
        decontaminate,
        drop_exact_duplicates,
        drop_near_duplicates,
        minhash_lsh_pairs,
    )
    from web_content_extraction_benchmark_spark.operators.packing import (
        pack_sequences,
    )
    from web_content_extraction_benchmark_spark.operators.sampling import (
        deterministic_sample,
        quota_per_key,
    )
    from web_content_extraction_benchmark_spark.plans.pipeline import (
        extract_answers,
    )

    # bench-identical python-worker warm-up
    extract_answers(pages.limit(2048), ["main_content"]).agg(
        F.sum(F.length("plaintext"))).collect()

    t0 = time.perf_counter()
    answers = extract_answers(pages.select("url", "html"), ["main_content"])
    docs = answers.select(
        F.xxhash64("url").alias("doc_id"),
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.col("plaintext").alias("text"),
    ).filter(F.length("text") > 0)
    d1 = drop_exact_duplicates(docs).persist()
    pairs = minhash_lsh_pairs(d1, num_hashes=128, bands=16,
                              jaccard_threshold=0.8, hash_fn="oph")
    d2 = drop_near_duplicates(d1, pairs)
    bench_set = d2.orderBy("doc_id").limit(1).select("text")
    d3 = decontaminate(d2, bench_set)
    capped = quota_per_key(d3, 100, key_col="host")
    sampled = deterministic_sample(capped, 0.5, key_col="doc_id")
    counted = sampled.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    pack_sequences(counted, 4096, n_shards=64).agg(
        F.count("*"), F.max("chunk"), F.sum("chunk_fill")).collect()
    d1.unpersist()
    dt = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "q13": round(dt, 3),
                      "loadavg": float(
                          open("/proc/loadavg").read().split()[0])}))
    spark.stop()


if __name__ == "__main__":
    main()
