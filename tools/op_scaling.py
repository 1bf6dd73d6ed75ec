"""Two-parallelism-level scaling evidence for individual operators
(north_rule: same job, two cluster sizes, report both + efficiency).

Each (arm, cpus) measurement runs in a fresh subprocess (fresh JVM),
interleaved A/B so host drift hits both levels equally; within each JVM
a warm-up pass excludes Python-worker spawn + JIT.  The host is shared —
run only in a quiet window (the script refuses above load 5, same as
bench.py) and never concurrently with another Spark job.

Usage: python tools/op_scaling.py [arm ...]           (default: all arms)
Arms: substr linkgraph watbundle pagerank_tail (+ linkgraph_pool
control).  Reads the bench-cached sf0.1 x40
pages parquet; run `python bench.py` once first if /tmp/wceb_bench is
cold.  Appends one JSON line per arm to BENCH/op_scaling_r8.jsonl.

Levels are 2 -> 8 cores, matching the container-bench protocol: the
shared host cannot supply 4x the cpus above ~8-16 procs even to a
zero-framework pool (BENCH/BASELINE.md pool table: 8->32 pool
efficiency ~0.32), so 8->32 efficiencies measure the host, not the
engine.  The pagerank_tail arm is O(hosts) — constant-sized by design,
independent of corpus volume — so it reports absolute seconds at both
levels, not an efficiency claim.
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
    # host link graph, data-sized layer — fused decode+href scan over
    # the raw page bytes, then edge aggregation.  This is the part that
    # grows with corpus size; the rank loop is measured separately.
    "linkgraph": r"""
from web_content_extraction_benchmark_spark.operators.linkgraph import (
    extract_outlinks_raw, host_edges)

def run():
    host_edges(extract_outlinks_raw(pages)).agg(
        F.count("*"), F.sum("n_links")).collect()
""",
    # WAT-bundle kernel (r8): the fused decode + hrefs + anchor-pairs +
    # title + head-meta scan (page_links_udf) plus the anchor-resolution
    # tail — prices the full link-metadata extraction a WAT/anchor-corpus
    # export runs, vs the href-only "linkgraph" arm above.
    "watbundle": r"""
from web_content_extraction_benchmark_spark.operators.linkgraph import (
    anchors_from_page_links, page_links_raw)

def run():
    links = page_links_raw(pages)
    anchors_from_page_links(links).agg(
        F.count("*"), F.sum(F.length("anchor_text"))).collect()
""",
    # frozen bigram-LM scoring — explode to bigrams, two broadcast
    # joins against the vocab-sized frozen tables, map-side sum.
    "lm": r"""
from web_content_extraction_benchmark_spark.operators.lm import lm_score
docs = pages.select(F.xxhash64("url").alias("doc_id"),
                    F.col("gold").alias("text"))

def run():
    lm_score(docs).agg(
        F.sum("lm_score_micro"), F.sum("lm_bigrams")).collect()
""",
    # passage splitting — per-row flatMap (split + filtered sequence +
    # posexplode + slice), no shuffle besides the final count agg.
    "passages": r"""
from web_content_extraction_benchmark_spark.operators.packing import (
    passage_split)
docs = pages.select(F.xxhash64("url").alias("doc_id"),
                    F.col("gold").alias("text"))

def run():
    passage_split(docs, window=64, stride=48).agg(
        F.count("*"), F.sum("n_tokens")).collect()
""",
    # PageRank iteration loop alone — O(hosts + host-pairs), constant in
    # corpus volume (41 hosts here).  Reported as absolute seconds: two
    # tiny exchanges per iteration are scheduler-latency-bound, and that
    # is the correct 100 TB shape (host cardinality ~1e8 << pages).
    "pagerank_tail": r"""
from web_content_extraction_benchmark_spark.operators.linkgraph import (
    extract_outlinks_raw, host_edges, pagerank_hosts)
edges = host_edges(extract_outlinks_raw(pages)).localCheckpoint()

def run():
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
# materialize the input once: the arm must price the OPERATOR, not the
# parquet re-read + replicate shuffle, on every measured round
pages = pages.localCheckpoint()
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


_POOL_CHILD = r"""
import json, multiprocessing as mp, re, sys, time
sys.path.insert(0, {repo!r})

def _kernel(raw):
    from web_content_extraction_benchmark_spark.encoding import decode_html
    from web_content_extraction_benchmark_spark.operators.linkgraph import (
        HREF_PATTERN)
    return len(re.findall(HREF_PATTERN, decode_html(raw)))

def main():
    import pandas as pd
    cpus = {cpus}
    pages = pd.read_parquet({pages!r}, columns=["html"])["html"].tolist()
    pages = pages * {rep}
    with mp.get_context("spawn").Pool(cpus) as pool:
        n_links = sum(pool.imap_unordered(_kernel, pages[:2000],
                                          chunksize=256))  # warm-up
        best = None
        for _ in range({rounds}):
            t0 = time.perf_counter()
            n_links = sum(pool.imap_unordered(_kernel, pages,
                                              chunksize=256))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
    print(json.dumps({{"cpus": cpus, "n_pages": len(pages),
                       "n_links": n_links, "sec": round(best, 3),
                       "docs_per_sec": round(len(pages) / best, 1)}}))

if __name__ == "__main__":
    main()
"""


# Matched zero-framework pool controls for the lm / passages arms
# (VERDICT r8 advisory: their 0.56 efficiencies at 0.7-5 s windows had
# no same-kernel control bounding the attainable ceiling).  Each runs
# the operator's per-doc WORK (tokenize -> bigram dict lookups -> sum;
# tokenize -> passage slices -> join) in an mp.Pool over the same gold
# texts — the in-RAM ceiling the Spark arm is judged against.
_GENERIC_POOL_CHILD = r"""
import json, multiprocessing as mp, sys, time
sys.path.insert(0, {repo!r})

{kernel}

def main():
    import pandas as pd
    cpus = {cpus}
    texts = pd.read_parquet({pages!r}, columns=["gold"])["gold"].tolist()
    texts = texts * {rep}
    with mp.get_context("spawn").Pool(cpus) as pool:
        total = sum(pool.imap_unordered(_kernel, texts[:2000],
                                        chunksize=256))  # warm-up
        best = None
        for _ in range({rounds}):
            t0 = time.perf_counter()
            total = sum(pool.imap_unordered(_kernel, texts,
                                            chunksize=256))
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
    print(json.dumps({{"cpus": cpus, "n_pages": len(texts),
                       "total": total, "sec": round(best, 3),
                       "docs_per_sec": round(len(texts) / best, 1)}}))

if __name__ == "__main__":
    main()
"""

_POOL_KERNELS = {
    "lm_pool": r"""
from web_content_extraction_benchmark_spark.operators.lm import (
    DEFAULT_SCORE, FROZEN_BACKOFF, FROZEN_BIGRAM)

def _kernel(text):
    toks = text.split(" ")
    bi = FROZEN_BIGRAM
    bo = FROZEN_BACKOFF
    s = 0
    for w1, w2 in zip(toks, toks[1:]):
        v = bi.get((w1, w2))
        if v is None:
            v = bo.get(w1, DEFAULT_SCORE)
        s += v
    return s
""",
    "passages_pool": r"""
WINDOW, STRIDE = 64, 48
KEEP_GAP = WINDOW - STRIDE

def _kernel(text):
    toks = text.split(" ")
    n = len(toks)
    total = 0
    for s in range(0, n, STRIDE):
        if s > 0 and not (s + KEEP_GAP < n):
            continue
        passage = " ".join(toks[s:s + WINDOW])
        total += min(WINDOW, n - s)
    return total
""",
}


def run_level(arm: str, cpus: int, rounds: int = 2) -> dict:
    import tempfile

    rep = int(os.environ.get("SPARK_GRAFT_OPSCALE_REP", "1"))
    if arm == "linkgraph_pool":
        code = _POOL_CHILD.format(repo=REPO, cpus=cpus, pages=PAGES,
                                  rep=rep, rounds=rounds)
    elif arm in _POOL_KERNELS:
        code = _GENERIC_POOL_CHILD.format(
            repo=REPO, cpus=cpus, pages=PAGES, rep=rep, rounds=rounds,
            kernel=_POOL_KERNELS[arm],
        )
    else:
        code = _CHILD.format(repo=REPO, cpus=cpus, pages=PAGES, rep=rep,
                             body=_ARMS[arm], rounds=rounds)
    # the child must be a real FILE, not `python -c`: the pool arm's
    # multiprocessing spawn re-imports __main__, which deadlocks the
    # workers for a -c program (parent and children were measured
    # parked at 0% CPU forever)
    with tempfile.NamedTemporaryFile(
        "w", suffix="_opscale.py", delete=False
    ) as f:
        f.write(code)
        script = f.name
    try:
        out = subprocess.run(
            [sys.executable, script], capture_output=True, text=True,
            cwd=REPO, check=True,
        )
    finally:
        os.unlink(script)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    # linkgraph_pool = zero-framework mp.Pool control for the linkgraph
    # kernel (decode+findall over the same bytes): the attainable host
    # ceiling the Spark arm's efficiency is judged against.
    arms = sys.argv[1:] or list(_ARMS) + ["linkgraph_pool"]
    unknown = set(arms) - set(_ARMS) - {"linkgraph_pool"} - set(_POOL_KERNELS)
    if unknown:
        raise SystemExit(f"unknown arms: {sorted(unknown)}")
    load = os.getloadavg()[0]
    if load > 5:
        raise SystemExit(f"host busy (loadavg {load:.1f}) — refusing")
    if not os.path.isdir(PAGES):
        raise SystemExit(f"{PAGES} missing — run `python bench.py` first")
    n_small, n_big = 2, 8
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
            # efficiency is not a meaningful claim for the O(hosts)
            # fixed-cost tail — keep the raw number but flag the arm
            "scaling_efficiency": round(eff, 3),
            "fixed_cost_arm": arm == "pagerank_tail",
            "loadavg_at_start": round(load, 2),
        }
        rec["rep"] = int(os.environ.get("SPARK_GRAFT_OPSCALE_REP", "1"))
        line = json.dumps(rec)
        out_name = os.environ.get("SPARK_GRAFT_OPSCALE_OUT",
                                  "op_scaling_r9.jsonl")
        with open(os.path.join(REPO, "BENCH", out_name), "a") as fh:
            fh.write(line + "\n")
        print(line)


if __name__ == "__main__":
    main()
