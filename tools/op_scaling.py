"""Two-parallelism-level scaling evidence for individual operators
(north_rule: same job, two cluster sizes, report both + efficiency).

Each (arm, cpus) measurement runs in a fresh subprocess (fresh JVM),
interleaved A/B so host drift hits both levels equally; within each JVM
a warm-up pass excludes Python-worker spawn + JIT.  The host is shared —
run only in a quiet window (the script refuses above load 5, same as
bench.py) and never concurrently with another Spark job.

Usage: python tools/op_scaling.py [arm ...]           (default: all arms)
Arms: substr pagerank.  Reads the bench-cached sf0.1 x40 pages parquet;
run `python bench.py` once first if /tmp/wceb_bench is cold.
Appends one JSON line per arm to BENCH/op_scaling_r8.jsonl and prints it.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAGES = "/tmp/wceb_bench/sf0.1_x40/pages"

_ARMS = {
    # ExactSubstr dedup at the q17 bench shape (half duplicated, half
    # salted-unique) — prices the keyed explode + one window-count
    # shuffle + per-doc coverage tail.
    "substr": r"""
docs = pages.select(
    F.xxhash64("url").alias("doc_id"),
    F.when(F.xxhash64("url") % 2 == 0, F.col("gold")).otherwise(
        F.concat_ws(" ", F.transform(
            F.split(F.col("gold"), " "),
            lambda w: F.concat(w, F.lit("~"), F.xxhash64("url")),
        ))
    ).alias("text"),
)
from web_content_extraction_benchmark_spark.operators.substr_dedup import (
    dedup_exact_substrings)

def run():
    dedup_exact_substrings(docs).agg(
        F.sum("n_dup_windows"), F.sum("n_tokens_removed"),
        F.sum(F.length("kept_text"))).collect()
""",
    # host link graph at the q18 bench shape — decode + outlink regex
    # over the full volume, then the O(hosts) PageRank tail.
    "pagerank": r"""
from web_content_extraction_benchmark_spark.functions.udfs import (
    decode_html_udf)
from web_content_extraction_benchmark_spark.operators.linkgraph import (
    extract_outlinks, host_edges, pagerank_hosts)
corpus = pages.select("url", decode_html_udf(F.col("html")).alias("html_str"))

def run():
    edges = host_edges(extract_outlinks(corpus))
    pagerank_hosts(edges, iterations=5).agg(
        F.count("*"), F.sum("rank_micro")).collect()
""",
}

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from web_content_extraction_benchmark_spark.session import get_spark

cpus = {cpus}
spark = get_spark("op-scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(32, cpus))
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({pages!r})
rep = {rep}
if rep > 1:
    # distinct urls per copy so dedup/graph keys don't collapse
    pages = pages.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.lit(rep - 1)))
    ).withColumn(
        "url", F.concat("url", F.lit("?c="), F.col("copy").cast("string"))
    ).drop("copy").repartition({cpus} * 2)
n = pages.count()
{body}
run()  # warm-up: Python workers, JIT, parquet footer cache
best = None
for _ in range({rounds}):
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"cpus": cpus, "n_pages": n, "sec": round(best, 3),
                   "docs_per_sec": round(n / best, 1)}}))
spark.stop()
"""


def run_level(arm: str, cpus: int, rounds: int = 2) -> dict:
    rep = int(os.environ.get("SPARK_GRAFT_OPSCALE_REP", "1"))
    code = _CHILD.format(repo=REPO, cpus=cpus, pages=PAGES, rep=rep,
                         body=_ARMS[arm], rounds=rounds)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=REPO, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    arms = sys.argv[1:] or list(_ARMS)
    unknown = set(arms) - set(_ARMS)
    if unknown:
        raise SystemExit(f"unknown arms: {sorted(unknown)}")
    load = os.getloadavg()[0]
    if load > 5:
        raise SystemExit(f"host busy (loadavg {load:.1f}) — refusing")
    if not os.path.isdir(PAGES):
        raise SystemExit(f"{PAGES} missing — run `python bench.py` first")
    n_small, n_big = 8, 32
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    for arm in arms:
        # interleave small/big twice (A-B-A-B) so drift cancels
        small = [run_level(arm, n_small)]
        big = [run_level(arm, n_big)]
        small.append(run_level(arm, n_small))
        big.append(run_level(arm, n_big))
        s = min(r["sec"] for r in small)
        b = min(r["sec"] for r in big)
        eff = (s / b) / (n_big / n_small)
        rec = {
            "arm": arm,
            "cpus_small": n_small, "sec_small": s,
            "docs_per_sec_small": round(small[0]["n_pages"] / s, 1),
            "cpus_big": n_big, "sec_big": b,
            "docs_per_sec_big": round(small[0]["n_pages"] / b, 1),
            "speedup": round(s / b, 3),
            "scaling_efficiency": round(eff, 3),
            "loadavg_at_start": round(load, 2),
        }
        line = json.dumps(rec)
        with open(os.path.join(REPO, "BENCH", "op_scaling_r8.jsonl"),
                  "a") as fh:
            fh.write(line + "\n")
        print(line)


if __name__ == "__main__":
    main()
