"""Incremental near-dup dedup cost evidence (VERDICT r5 next #1): a
second batch against a committed NearDupIndex must cost O(batch), not
O(corpus) — the signature stage (the measured cost center, ~368 s/1M
docs OPH) runs only over the batch, the committed band store streams
through a broadcast join unshuffled, and label resolution scales with
the dup graph.

Protocol: build the chain corpus (same planted prefix-mutant structure
as tools/neardup_stress.py), split it ~(1-1/split_mod : 1/split_mod)
by id hash so chains STRADDLE the split (the batch-2 run must discover
new-vs-stored pairs, not just new-vs-new), then measure

  add1_sec : add_batch(big batch)     — the "existing corpus" commit
  add2_sec : add_batch(small batch)   — the incremental append
  scratch_sec : from-scratch minhash_lsh_pairs + connected_components
                over the union (what a non-incremental pipeline pays
                EVERY run)

and assert label equality between the incremental index and the
from-scratch run.  The claim is add2_sec << scratch_sec, tracking the
batch fraction rather than the corpus.

Usage:
    python tools/incremental_stress.py [sf_dir] [replicate] [split_mod]
                                       [hash_fn] [chain_mod]
Defaults: /root/testdata/sf0.1 40 10 oph 4.  ``chain_mod`` sets the
planted dup rate (every chain_mod-th doc gets mutants): 4 is the
dup-HEAVY shape shared with neardup_stress; 20 approximates a
realistic corpus (~13% of docs in chains).  Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from neardup_stress import build_chain_corpus  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    split_mod = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    hash_fn = sys.argv[4] if len(sys.argv) > 4 else "oph"
    chain_mod = int(sys.argv[5]) if len(sys.argv) > 5 else 4

    from web_content_extraction_benchmark_spark.operators.dedup import (
        PROD_BANDS,
        PROD_NUM_HASHES,
        connected_components,
        minhash_lsh_pairs,
    )
    from web_content_extraction_benchmark_spark.operators.incremental_dedup import (
        NearDupIndex,
    )
    from web_content_extraction_benchmark_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count()))
    spark = get_spark("incremental-stress", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    loadavg = os.getloadavg()[0]

    # the sf parquet reads as ~4 splits — rebalance or every signature
    # stage runs 4-wide on a 32-core box (the CLAUDE.md .limit/partition
    # gotcha family)
    corpus = (
        build_chain_corpus(spark, sf_dir, replicate, chain_mod=chain_mod,
                           chain_len=4)
        .repartition(cpus * 2)
        .persist()
    )
    n_total = corpus.count()
    # id-hash split so prefix-mutant chains straddle the boundary:
    # ~1/split_mod of docs (bases AND mutants alike) land in batch 2
    in_batch2 = F.abs(F.xxhash64("doc_id")) % split_mod == 0
    batch1 = corpus.filter(~in_batch2).persist()
    batch2 = corpus.filter(in_batch2).persist()
    n_b1, n_b2 = batch1.count(), batch2.count()

    index_path = tempfile.mkdtemp(prefix="wceb_incr_stress_")
    try:
        idx = NearDupIndex(
            index_path,
            num_hashes=PROD_NUM_HASHES,
            bands=PROD_BANDS,
            jaccard_threshold=0.85,
            hash_fn=hash_fn,
        )
        add1_phases: dict = {}
        t0 = time.perf_counter()
        p1 = idx.add_batch(batch1, timings=add1_phases)
        n_pairs_1 = p1.count()
        add1_sec = time.perf_counter() - t0
        p1.unpersist()

        add2_phases: dict = {}
        t1 = time.perf_counter()
        p2 = idx.add_batch(batch2, timings=add2_phases)
        n_pairs_2 = p2.count()
        add2_sec = time.perf_counter() - t1
        p2.unpersist()

        incr_labels = idx.labels(spark).persist()
        n_nodes_incr = incr_labels.count()

        t2 = time.perf_counter()
        scratch_pairs = minhash_lsh_pairs(
            corpus,
            num_hashes=PROD_NUM_HASHES,
            bands=PROD_BANDS,
            jaccard_threshold=0.85,
            hash_fn=hash_fn,
        ).persist()
        n_pairs_scratch = scratch_pairs.count()
        scratch_labels = connected_components(scratch_pairs).persist()
        n_nodes_scratch = scratch_labels.count()
        scratch_sec = time.perf_counter() - t2

        mismatches = (
            incr_labels.join(
                scratch_labels.withColumnRenamed("component", "c2"),
                "id",
                "full",
            )
            .filter(
                F.col("component").isNull()
                | F.col("c2").isNull()
                | (F.col("component") != F.col("c2"))
            )
            .count()
        )

        print(
            json.dumps(
                {
                    "n_total": n_total,
                    "n_batch1": n_b1,
                    "n_batch2": n_b2,
                    "batch2_frac": round(n_b2 / n_total, 4),
                    "add1_sec": round(add1_sec, 2),
                    "add2_sec": round(add2_sec, 2),
                    "add1_phases": add1_phases,
                    "add2_phases": add2_phases,
                    "scratch_sec": round(scratch_sec, 2),
                    "add2_vs_scratch": round(add2_sec / scratch_sec, 3),
                    "n_pairs_batch1": n_pairs_1,
                    "n_pairs_batch2": n_pairs_2,
                    "n_pairs_scratch": n_pairs_scratch,
                    "n_nodes_incremental": n_nodes_incr,
                    "n_nodes_scratch": n_nodes_scratch,
                    "label_mismatches": mismatches,
                    "hash_fn": hash_fn,
                    "num_hashes": PROD_NUM_HASHES,
                    "bands": PROD_BANDS,
                    "split_mod": split_mod,
                    "replicate": replicate,
                    "chain_mod": chain_mod,
                    "cpus": cpus,
                    "loadavg_at_start": loadavg,
                }
            )
        )
        if mismatches:
            raise SystemExit(
                f"incremental != from-scratch: {mismatches} label "
                "mismatches — the evidence line above records a BROKEN "
                "incremental path"
            )
    finally:
        shutil.rmtree(index_path, ignore_errors=True)


if __name__ == "__main__":
    main()
