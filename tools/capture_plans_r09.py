"""Capture .explain("formatted") for the bench queries touched in r9.

Writes plans/r09/<name>_<suffix>.txt (suffix from argv[1], default
"before").  Uses the bench's cached pages parquet.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from web_content_extraction_benchmark_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "40"))
CACHE_ROOT = os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/wceb_bench")
TAG = f"{os.path.basename(SF_DIR.rstrip('/'))}_x{REPLICATE}"
PAGES_PATH = os.path.join(CACHE_ROOT, TAG, "pages")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r09")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("wceb-plans-r09", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(PAGES_PATH)

    from web_content_extraction_benchmark_spark.operators.dedup import (
        contaminated_ids,
        drop_exact_duplicates,
        minhash_lsh_pairs,
    )
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        extract_outlinks_raw,
        host_edges,
        pagerank_hosts,
    )
    from web_content_extraction_benchmark_spark.operators.substr_dedup import (
        dedup_exact_substrings,
    )
    from web_content_extraction_benchmark_spark.plans.pipeline import (
        extract_answers,
        repartition_salted,
    )

    plans: dict[str, object] = {}

    # q1: salted repartition + extraction
    plans["q1_extract_main"] = extract_answers(
        repartition_salted(pages.select("url", "html"), CPUS * 2),
        ["main_content"],
    ).agg(F.sum(F.length("plaintext")))

    # q4: minhash md5 fixture width over exact-deduped docs
    docs = pages.select(
        F.col("url").alias("doc_id"), F.col("gold").alias("text")
    ).filter(F.length("text") > 0)
    unique_docs = drop_exact_duplicates(docs, id_col="doc_id")
    plans["q4_minhash_lsh"] = minhash_lsh_pairs(
        unique_docs, id_col="doc_id", jaccard_threshold=0.8)

    # exact-dedup plan itself (used by q4 warmup, q13)
    plans["drop_exact_duplicates"] = unique_docs

    # q14: decontamination gram join
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
    plans["q14_decontam_100kgrams"] = contaminated_ids(corpus, bench_set)

    # q17: exact-substring dedup
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
    plans["q17_substr_dedup"] = dedup_exact_substrings(docs17).agg(
        F.sum("n_dup_windows"), F.sum("n_tokens_removed"),
        F.sum(F.length("kept_text")))

    # q18: host edges (the data-sized part; the rank loop is iterative)
    plans["q18_host_edges"] = host_edges(extract_outlinks_raw(pages))
    plans["q18_pagerank_1iter"] = pagerank_hosts(
        host_edges(extract_outlinks_raw(pages)), iterations=1)

    for name, df in plans.items():
        if only and name not in only:
            continue
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted")))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
