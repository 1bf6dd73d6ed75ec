"""Round-9 optimization profiling harness (guide §1: measure first).

Isolates the expensive bench queries into sub-stage probes, each timed
against the noop sink so the computation is priced without the collect
tail.  Reads the SAME cached pages parquet bench.py uses — run bench.py
once first so the cache is warm.  Serialized by design: never run
concurrently with a bench (CLAUDE.md).

Usage: python tools/profile_r09.py [probe ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from web_content_extraction_benchmark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "40"))
CACHE_ROOT = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/wceb_bench")
TAG = f"{os.path.basename(SF_DIR.rstrip('/'))}_x{REPLICATE}"
PAGES_PATH = os.path.join(CACHE_ROOT, TAG, "pages")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    wanted = set(sys.argv[1:])
    spark = get_spark("wceb-profile-r09", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    pages = spark.read.parquet(PAGES_PATH)

    from web_content_extraction_benchmark_spark.plans.pipeline import (
        extract_answers,
        repartition_salted,
    )

    # warm-up python workers
    extract_answers(pages.limit(2048), ["main_content"]).agg(
        F.sum(F.length("plaintext"))).collect()

    timings: dict[str, float] = {}

    def timed(name: str, fn, n: int = 1) -> None:
        if wanted and not any(name.startswith(w) for w in wanted):
            return
        best = None
        for _ in range(n):
            sc.setJobDescription(name)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"  {name}: {best:.3f}s", file=sys.stderr)
        sc.setJobDescription(None)

    # ---- q1 decomposition -------------------------------------------
    def q1_shuffle_only():
        noop(repartition_salted(pages.select("url", "html"), CPUS * 2))

    def q1_extract_presalted():
        noop(extract_answers(pages.select("url", "html"), ["main_content"]))

    def q1_full():
        noop(extract_answers(
            repartition_salted(pages.select("url", "html"), CPUS * 2),
            ["main_content"]))

    timed("q1a_shuffle_only", q1_shuffle_only, 2)
    timed("q1b_extract_presalted", q1_extract_presalted, 2)
    timed("q1c_full", q1_full, 2)

    # ---- q4 decomposition (unique_docs like bench) -------------------
    from web_content_extraction_benchmark_spark.operators.dedup import (
        PROD_BANDS,
        PROD_NUM_HASHES,
        drop_exact_duplicates,
        lsh_band_keys,
        minhash_lsh_pairs,
    )

    docs = pages.select(
        F.col("url").alias("doc_id"), F.col("gold").alias("text")
    ).filter(F.length("text") > 0)
    unique_docs = drop_exact_duplicates(docs, id_col="doc_id").persist()
    n_unique = unique_docs.count()
    print(f"  n_unique={n_unique}, partitions="
          f"{unique_docs.rdd.getNumPartitions()}", file=sys.stderr)

    def q4_bands_md5():
        noop(lsh_band_keys(unique_docs, id_col="doc_id"))

    def q4_full_md5():
        minhash_lsh_pairs(unique_docs, id_col="doc_id",
                          jaccard_threshold=0.8).count()

    def q4b_bands_xx128():
        noop(lsh_band_keys(unique_docs, id_col="doc_id",
                           num_hashes=PROD_NUM_HASHES, bands=PROD_BANDS,
                           hash_fn="xxhash64"))

    def q4c_bands_oph128():
        noop(lsh_band_keys(unique_docs, id_col="doc_id",
                           num_hashes=PROD_NUM_HASHES, bands=PROD_BANDS,
                           hash_fn="oph"))

    timed("q4_bands_md5", q4_bands_md5, 2)
    timed("q4_full_md5", q4_full_md5, 2)
    timed("q4b_bands_xx128", q4b_bands_xx128, 2)
    timed("q4c_bands_oph128", q4c_bands_oph128, 2)

    # ---- q13 decomposition ------------------------------------------
    from web_content_extraction_benchmark_spark.operators.dedup import (
        decontaminate,
        drop_near_duplicates,
    )
    from web_content_extraction_benchmark_spark.operators.packing import (
        pack_sequences,
    )
    from web_content_extraction_benchmark_spark.operators.sampling import (
        deterministic_sample,
        quota_per_key,
    )

    def q13_stage_extract():
        answers = extract_answers(pages.select("url", "html"),
                                  ["main_content"])
        noop(answers.select(
            F.xxhash64("url").alias("doc_id"),
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
            F.col("plaintext").alias("text"),
        ).filter(F.length("text") > 0))

    timed("q13_stage_extract", q13_stage_extract)

    def _q13_docs():
        answers = extract_answers(pages.select("url", "html"),
                                  ["main_content"])
        return answers.select(
            F.xxhash64("url").alias("doc_id"),
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("host"),
            F.col("plaintext").alias("text"),
        ).filter(F.length("text") > 0)

    def q13_full():
        docs13 = _q13_docs()
        d1 = drop_exact_duplicates(docs13).persist()
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

    # sub-stage splits: materialize d1 once, then time tails separately
    def q13_stage_d1_persist():
        d1 = drop_exact_duplicates(_q13_docs()).persist()
        d1.count()
        globals()["_d1"] = d1

    timed("q13_stage_d1_persist", q13_stage_d1_persist)
    d1 = globals().get("_d1")
    if d1 is not None:
        def q13_stage_pairs():
            minhash_lsh_pairs(d1, num_hashes=128, bands=16,
                              jaccard_threshold=0.8, hash_fn="oph").count()

        timed("q13_stage_pairs_oph128", q13_stage_pairs, 2)

        pairs = minhash_lsh_pairs(d1, num_hashes=128, bands=16,
                                  jaccard_threshold=0.8, hash_fn="oph")

        def q13_stage_dropnear():
            noop(drop_near_duplicates(d1, pairs))

        timed("q13_stage_dropnear", q13_stage_dropnear, 2)

        d2 = drop_near_duplicates(d1, pairs).persist()
        d2.count()

        def q13_stage_decontam():
            bench_set = d2.orderBy("doc_id").limit(1).select("text")
            noop(decontaminate(d2, bench_set))

        timed("q13_stage_decontam", q13_stage_decontam, 2)

        d3 = decontaminate(
            d2, d2.orderBy("doc_id").limit(1).select("text")).persist()
        d3.count()

        def q13_stage_tail():
            capped = quota_per_key(d3, 100, key_col="host")
            sampled = deterministic_sample(capped, 0.5, key_col="doc_id")
            counted = sampled.select(
                "doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
            pack_sequences(counted, 4096, n_shards=64).agg(
                F.count("*"), F.max("chunk"), F.sum("chunk_fill")).collect()

        timed("q13_stage_quota_sample_pack", q13_stage_tail, 2)
        d2.unpersist()
        d3.unpersist()

    timed("q13_full", q13_full)

    # ---- q14 decomposition ------------------------------------------
    from web_content_extraction_benchmark_spark.operators.dedup import (
        contaminated_ids,
        shingle_col,
    )

    corpus = pages.select(
        F.xxhash64("url").alias("doc_id"), F.col("gold").alias("text"))
    bench_words = F.split(F.col("text"), " ")
    salted = unique_docs.limit(2000).select(
        F.concat_ws(
            " ",
            F.transform(
                bench_words,
                lambda w: F.concat(w, F.lit("~"), F.col("doc_id")),
            ),
        ).alias("text"))
    bench_set = salted.unionByName(unique_docs.limit(50).select("text"))

    def q14_corpus_grams_only():
        noop(corpus.select(
            F.col("doc_id").alias("id"),
            F.explode(shingle_col(F.col("text"))).alias("gram"),
        ))

    def q14_full():
        contaminated_ids(corpus, bench_set).count()

    timed("q14_corpus_grams_only", q14_corpus_grams_only, 2)
    timed("q14_full", q14_full, 2)

    # ---- q17 decomposition ------------------------------------------
    from web_content_extraction_benchmark_spark.operators.substr_dedup import (
        dedup_exact_substrings,
    )

    words = F.split(F.col("gold"), " ")
    docs17 = pages.select(
        F.xxhash64("url").alias("doc_id"),
        F.when(
            F.xxhash64("url") % 2 == 0, F.col("gold")
        ).otherwise(
            F.concat_ws(
                " ",
                F.transform(
                    words,
                    lambda w: F.concat(w, F.lit("~"), F.xxhash64("url")),
                ),
            )
        ).alias("text"),
    )

    def q17_full():
        dedup_exact_substrings(docs17).agg(
            F.sum("n_dup_windows"), F.sum("n_tokens_removed"),
            F.sum(F.length("kept_text")),
        ).collect()

    timed("q17_full", q17_full, 2)

    # ---- q18/q19 -----------------------------------------------------
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        anchor_corpus,
        anchors_from_page_links,
        extract_outlinks_raw,
        host_edges,
        page_links_raw,
        pagerank_hosts,
    )

    def q18_outlinks_only():
        noop(extract_outlinks_raw(pages))

    def q18_full():
        edges = host_edges(extract_outlinks_raw(pages))
        pagerank_hosts(edges, iterations=5).agg(
            F.count("*"), F.sum("rank_micro")).collect()

    timed("q18_outlinks_only", q18_outlinks_only, 2)
    timed("q18_full", q18_full, 2)

    def q19_bundle_only():
        noop(page_links_raw(pages))

    def q19_full():
        anchor_corpus(
            anchors_from_page_links(page_links_raw(pages))
        ).agg(F.count("*"), F.sum("n_anchors")).collect()

    timed("q19_bundle_only", q19_bundle_only, 2)
    timed("q19_full", q19_full, 2)

    # ---- q3 scoring decomposition -----------------------------------
    from web_content_extraction_benchmark_spark.plans.pipeline import (
        aggregate_scores,
        score_answers,
    )

    def q3_full():
        df = repartition_salted(pages, CPUS * 2)
        answers = extract_answers(df, ["plain"])
        truth = pages.select(
            "url", "dataset", F.col("gold").alias("plaintext"))
        scores = score_answers(answers, truth).persist()
        aggregate_scores(scores, score_cols=("dist", "f1")).collect()
        scores.unpersist()

    def q3_score_only():
        answers = extract_answers(pages.select("url", "html"), ["plain"])
        truth = pages.select(
            "url", "dataset", F.col("gold").alias("plaintext"))
        noop(score_answers(answers, truth))

    timed("q3_score_only", q3_score_only, 2)
    timed("q3_full", q3_full, 2)

    unique_docs.unpersist()
    print(json.dumps({"profile": timings, "n_unique": n_unique,
                      "loadavg": float(open("/proc/loadavg").read().split()[0]),
                      "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
