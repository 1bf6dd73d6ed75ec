"""A/B the OPH signature kernels (VERDICT r5 next #8): Arrow pandas-UDF
lattice ("oph") vs the bit-identical pure-Catalyst twin ("oph_sql") vs
the xxhash64 remix path, at production width (128/16) on a ~175k-doc
chain corpus.  Times the SIGNATURE+BANDING stage only (band keys fully
materialized via an aggregate that cannot prune the key column) — the
downstream band join is identical across variants.

Usage: python tools/oph_ab.py [sf_dir] [replicate] [variants_csv]
Defaults: /root/testdata/sf0.1 25 oph,oph_sql,xxhash64
Prints one JSON line per variant (2 runs each, min kept) plus a
bit-identity check line for oph vs oph_sql.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from neardup_stress import build_chain_corpus  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    variants = (
        sys.argv[3] if len(sys.argv) > 3 else "oph,oph_sql,xxhash64"
    ).split(",")

    from web_content_extraction_benchmark_spark.operators.dedup import (
        PROD_BANDS,
        PROD_NUM_HASHES,
        lsh_band_keys,
    )
    from web_content_extraction_benchmark_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()))
    spark = get_spark("oph-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # rebalance the ~4-split parquet read or the signature stages run
    # 4-wide (and 4 fat partitions of text can blow the 8g heap)
    corpus = build_chain_corpus(
        spark, sf_dir, replicate, chain_mod=4, chain_len=4
    ).repartition(cpus * 2).persist()
    n_docs = corpus.count()

    def run(hash_fn: str) -> float:
        banded = lsh_band_keys(
            corpus, num_hashes=PROD_NUM_HASHES, bands=PROD_BANDS,
            hash_fn=hash_fn,
        )
        t = time.perf_counter()
        # min(key) forces every band key to be computed — a bare count
        # would let Catalyst prune the signature expressions entirely
        banded.agg(F.count("key"), F.min("key")).collect()
        return time.perf_counter() - t

    for hash_fn in variants:
        best = min(run(hash_fn) for _ in range(2))
        print(
            json.dumps(
                {
                    "variant": hash_fn,
                    "n_docs": n_docs,
                    "num_hashes": PROD_NUM_HASHES,
                    "bands": PROD_BANDS,
                    "sign_band_sec": round(best, 2),
                    "docs_per_sec": round(n_docs / best),
                    "cpus": cpus,
                    "loadavg": os.getloadavg()[0],
                }
            ),
            flush=True,
        )

    if {"oph", "oph_sql"} <= set(variants):
        # bit-identity on a subsample (full corpus would double-run the
        # slow variant): band keys must agree row-for-row
        sample = corpus.filter(F.abs(F.xxhash64("doc_id")) % 50 == 0)
        a = lsh_band_keys(sample, num_hashes=PROD_NUM_HASHES,
                          bands=PROD_BANDS, hash_fn="oph")
        b = lsh_band_keys(sample, num_hashes=PROD_NUM_HASHES,
                          bands=PROD_BANDS, hash_fn="oph_sql")
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        print(json.dumps({
            "check": "oph_vs_oph_sql_band_keys",
            "n_sample_docs": sample.count(),
            "mismatched_rows": diff,
        }), flush=True)


if __name__ == "__main__":
    main()
