"""Two-cluster-size scaling evidence (north_rule): run the flagship
extraction job at local[N] and local[4N] on the SAME pre-materialized
input, report throughput at both plus scaling efficiency.

Each parallelism level runs in a fresh subprocess (fresh JVM) so no warm
JIT/caches leak between measurements; within each JVM a warm-up pass runs
first so Python-worker spawn cost is excluded from the measured window.

Usage: python tools/scaling_bench.py [sf_dir] [replicate] [N]
Writes BENCH/scaling_latest.md (raw latest run; BENCH/BASELINE.md is hand-curated) and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from web_content_extraction_benchmark_spark.session import get_spark
from web_content_extraction_benchmark_spark.plans.pipeline import (
    extract_answers, repartition_salted)

cpus = {cpus}
spark = get_spark("scaling", master=f"local[{{cpus}}]",
                  shuffle_partitions=max(32, cpus))
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet({pages_path!r}).select("url", "html")
n = pages.count()

def run():
    df = repartition_salted(pages, cpus * 2)
    answers = extract_answers(df, ["main_content"])
    answers.agg(F.sum(F.length("plaintext"))).collect()

# warm-up: spin up Python workers + JIT on a slice
extract_answers(pages.limit(2048), ["main_content"]).agg(
    F.sum(F.length("plaintext"))).collect()

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


def run_level(cpus: int, pages_path: str, rounds: int = 2) -> dict:
    code = _CHILD.format(repo=REPO, cpus=cpus, pages_path=pages_path,
                         rounds=rounds)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=1200,
    )
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from local[{cpus}]:\n{out.stderr[-2000:]}")


def run_interleaved(cpus_a: int, cpus_b: int, pages_path: str,
                    alternations: int = 3) -> tuple[dict, dict]:
    """A/B/A/B measurement: fresh JVM per round, levels alternated so
    slow drift in background tenant load hits both levels equally; best
    round wins per level."""
    best: dict[int, dict] = {}
    for _ in range(alternations):
        for cpus in (cpus_a, cpus_b):
            res = run_level(cpus, pages_path, rounds=2)
            if cpus not in best or res["sec"] < best[cpus]["sec"]:
                best[cpus] = res
    return best[cpus_a], best[cpus_b]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    # materialize the shared input once via bench.py's cache
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_REPLICATE=str(replicate))
    tag = f"{os.path.basename(sf_dir.rstrip('/'))}_x{replicate}"
    pages_path = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_CACHE", "/tmp/wceb_bench"),
        tag, "pages",
    )
    if not os.path.exists(os.path.join(os.path.dirname(pages_path), "_done")):
        # materialization failure must surface here, not as a confusing
        # "no result from local[N]" later
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=dict(env, SPARK_GRAFT_WAIT_QUIET="0"),
            capture_output=True, text=True, timeout=1800,
        )
        if proc.returncode != 0 or not os.path.exists(
            os.path.join(os.path.dirname(pages_path), "_done")
        ):
            raise RuntimeError(
                "pages-cache materialization via bench.py failed:\n"
                + proc.stderr[-2000:]
            )

    with open("/proc/loadavg") as f:
        load_before = f.read().split()[0]
    small, large = run_interleaved(n_small, n_small * 4, pages_path)
    with open("/proc/loadavg") as f:
        load_after = f.read().split()[0]
    speedup = large["docs_per_sec"] / small["docs_per_sec"]
    efficiency = round(speedup / 4.0, 3)
    result = {
        "n_small": small,
        "n_large": large,
        "speedup": round(speedup, 3),
        "scaling_efficiency": efficiency,
        "target": 0.8,
        "pass": efficiency >= 0.8,
        "machine_load_other_tenants": [load_before, load_after],
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # raw latest-run report; the curated summary lives in BENCH/BASELINE.md
    with open(os.path.join(REPO, "BENCH", "scaling_latest.md"), "w") as f:
        f.write(
            "# BENCH/scaling_latest — raw latest scaling run\n\n""(curated summary: BENCH/BASELINE.md)\n\n"
            "Flagship job: salted-url-hash repartition -> decode(binary html:"
            " gzip/BOM/charset) -> main-content extraction (density/"
            "link-density/tag-weight block classifier), Arrow-batched pandas"
            " UDF, measured on a pre-materialized parquet pages table.\n\n"
            f"- input: `{pages_path}` ({small['n_pages']} pages,"
            f" synthesized from {sf_dir} x{replicate})\n"
            f"- local[{small['cpus']}]:  **{small['docs_per_sec']} docs/sec**"
            f" ({small['sec']} s)\n"
            f"- local[{large['cpus']}]: **{large['docs_per_sec']} docs/sec**"
            f" ({large['sec']} s)\n"
            f"- speedup {small['cpus']}->{large['cpus']} cores:"
            f" **{result['speedup']}x** of 4x ideal\n"
            f"- scaling efficiency: **{efficiency}** (target >= 0.8:"
            f" {'PASS' if result['pass'] else 'FAIL'})\n\n"
            "local[8] vs local[32] is the sandbox proxy for N vs 4N"
            " executors (single machine, no real cluster available); the"
            " fresh-JVM-per-level + warm-up methodology isolates steady-state"
            " throughput.\n"
        )


if __name__ == "__main__":
    main()
