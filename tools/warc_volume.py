"""WARC volume stability: materialize a 1M-record Common-Crawl-style
corpus (executor-side write_warc), then ingest it — container walk +
HTTP/chunked parse — and run the flagship extraction straight off the
container, recording wall / throughput / error counts.

The read path's memory claim (O(record) per member walk, bounded Arrow
batches) is what a 10^12-document crawl needs; a crash or OOM here
fails the round's evidence.

Usage: python tools/warc_volume.py [sf_dir] [replicate] [cpus]
Appends one JSON line to BENCH/warc_volume_r08.jsonl and prints it.
r8: the read side is PATH-STREAMED (paths-only scan, chunked open()
inside the kernel) — this run is the within-noise-of-r7 evidence.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from web_content_extraction_benchmark_spark.plans.pipeline import (
        extract_answers,
    )
    from web_content_extraction_benchmark_spark.session import get_spark
    from web_content_extraction_benchmark_spark.sources.pages import (
        synthesize_pages,
    )
    from web_content_extraction_benchmark_spark.sources.warc import (
        read_warc, write_warc,
    )

    spark = get_spark("warc-volume", master=f"local[{cpus}]",
                      shuffle_partitions=max(32, cpus))
    spark.sparkContext.setLogLevel("ERROR")
    loadavg = float(open("/proc/loadavg").read().split()[0])

    out_dir = f"/tmp/wceb_warc_volume_x{replicate}"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.perf_counter()
    pages = synthesize_pages(spark, sf_dir, replicate=replicate,
                             partitions=cpus * 4)
    manifest = write_warc(pages.select("url", "warc_ts", "html"), out_dir)
    write_sec = time.perf_counter() - t0
    n_written = sum(m["n_records"] for m in manifest)
    gz_bytes = sum(os.path.getsize(os.path.join(out_dir, f))
                   for f in os.listdir(out_dir))

    # synthetic files are small; real crawl files are file==task under
    # the default split conf (see read_warc docstring)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")

    t1 = time.perf_counter()
    ingest = read_warc(spark, out_dir).agg(
        F.count("*").alias("n"), F.sum(F.length("html")).alias("bytes")
    ).collect()[0]
    ingest_sec = time.perf_counter() - t1

    t2 = time.perf_counter()
    ans = extract_answers(
        read_warc(spark, out_dir), ["main_content"]
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.length("plaintext")).alias("chars"),
        F.sum(F.col("error").cast("long")).alias("errors"),
    ).collect()[0]
    chain_sec = time.perf_counter() - t2

    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot_id = f.read().strip()
    except OSError:
        boot_id = None
    result = {
        "ts": time.time(), "sf_dir": sf_dir, "replicate": replicate,
        "cpus": cpus, "loadavg_at_start": loadavg, "boot_id": boot_id,
        "n_records": int(ingest["n"]), "n_written": n_written,
        "warc_gz_mb": round(gz_bytes / 1e6, 1),
        "n_files": len(manifest),
        "write_sec": round(write_sec, 1),
        "ingest_sec": round(ingest_sec, 1),
        "ingest_docs_per_sec": round(ingest["n"] / ingest_sec, 1),
        "chain_sec": round(chain_sec, 1),
        "chain_docs_per_sec": round(ans["n"] / chain_sec, 1),
        "extract_chars": int(ans["chars"]),
        "extract_errors": int(ans["errors"]),
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/warc_volume_r08.jsonl", "a") as f:
        f.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
