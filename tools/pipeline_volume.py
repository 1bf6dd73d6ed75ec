"""The FULL seven-stage corpus chain at >=1M pages (VERDICT r5 next
#7): extract -> exact dedup -> OPH MinHash-LSH near-dup drop ->
benchmark decontamination -> per-host quota -> deterministic sample ->
sequence packing, with PER-STAGE wall and shuffle read/write deltas
(Spark status REST API) — the chain-level scale point the per-stage
stress runs don't give.

Each stage is materialized (persist + count) so the stage boundaries
are real and the shuffle deltas attribute to one stage; the chain
total therefore slightly OVERSTATES a fused production run (which
would pipeline stages without persisting extract output).

Usage: python tools/pipeline_volume.py [sf_dir] [replicate]
Defaults: /root/testdata/sf0.1 200  (-> 1M pages).  Prints one JSON
line with a per-stage table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from neardup_stress import _rest_shuffle_totals  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import bench
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
    from web_content_extraction_benchmark_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()))
    spark = get_spark("pipeline-volume", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    loadavg = os.getloadavg()[0]

    pages_path, was_cold = bench._pages_parquet(spark, sf_dir, replicate, cpus)
    pages = spark.read.parquet(pages_path).select("url", "html")

    stages: list[dict] = []
    prev_shuffle = _rest_shuffle_totals(spark)
    live = []  # persisted frames to release at the end

    def stage(name: str, build, count_of=None):
        nonlocal prev_shuffle
        t = time.perf_counter()
        df = build()
        if hasattr(df, "persist"):
            df = df.persist()
            n = df.count()
        else:  # terminal collect result
            n = df
        wall = time.perf_counter() - t
        cur = _rest_shuffle_totals(spark)
        rec = {"stage": name, "rows": n, "wall_sec": round(wall, 2)}
        if "error" not in cur and "error" not in prev_shuffle:
            rec["shuffle_write_mb"] = round(
                (cur["shuffle_write_bytes"] - prev_shuffle["shuffle_write_bytes"])
                / 1e6, 1)
            rec["shuffle_read_mb"] = round(
                (cur["shuffle_read_bytes"] - prev_shuffle["shuffle_read_bytes"])
                / 1e6, 1)
        prev_shuffle = cur
        stages.append(rec)
        if hasattr(df, "persist"):
            live.append(df)
        return df

    t_total = time.perf_counter()
    answers = stage("extract", lambda: extract_answers(
        pages, ["main_content"]))
    docs = stage("docs_project", lambda: answers.select(
        F.xxhash64("url").alias("doc_id"),
        F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
        F.col("plaintext").alias("text"),
    ).filter(F.length("text") > 0))
    d1 = stage("exact_dedup", lambda: drop_exact_duplicates(docs))
    pairs = stage("lsh_pairs_oph128", lambda: minhash_lsh_pairs(
        d1, num_hashes=128, bands=16, jaccard_threshold=0.8, hash_fn="oph"))
    d2 = stage("neardup_drop", lambda: drop_near_duplicates(d1, pairs))
    # ONE benchmark doc: the synthetic corpus draws from a ~31-word
    # vocabulary, so 3-gram collisions across DISTINCT texts run ~28%
    # per benchmark doc — a few hundred benchmark rows would
    # (correctly) decontaminate the whole corpus to zero and the tail
    # stages would measure nothing.  One doc keeps the leak realistic
    # (~28% drop) while quota/sample/pack still see real rows.
    bench_set = d2.orderBy("doc_id").limit(1).select("text")
    d3 = stage("decontaminate", lambda: decontaminate(d2, bench_set))
    capped = stage("quota_100_per_host", lambda: quota_per_key(
        d3, 100, key_col="host"))
    sampled = stage("sample_0.5", lambda: deterministic_sample(
        capped, 0.5, key_col="doc_id"))
    counted = sampled.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    stage("pack_4096", lambda: pack_sequences(
        counted, 4096, n_shards=64
    ).agg(F.count("*")).collect()[0][0])
    total_sec = time.perf_counter() - t_total

    n_pages = pages.count()
    print(json.dumps({
        "n_pages": n_pages,
        "replicate": replicate,
        "pages_cache_cold": was_cold,
        "total_sec": round(total_sec, 2),
        "pages_per_sec": round(n_pages / total_sec),
        "stages": stages,
        "cpus": cpus,
        "loadavg_at_start": loadavg,
    }), flush=True)
    for df in live:
        try:
            df.unpersist()
        except Exception:
            pass


if __name__ == "__main__":
    main()
