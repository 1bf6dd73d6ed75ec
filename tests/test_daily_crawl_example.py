"""examples/daily_crawl.py — the end-to-end daily-crawl operator story
(streaming WARC ingest -> extract_mixed -> NearDupIndex -> maintenance
-> pack), pinned against from-scratch dedup over the same corpus."""

import importlib.util
import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.sources import warc as W
from web_content_extraction_benchmark_spark.sources.pdf_synth import encode_pdf
from web_content_extraction_benchmark_spark.sources.pages import build_page_html

TS = datetime(2023, 3, 4, 5, 6, 7, tzinfo=timezone.utc)

_spec = importlib.util.spec_from_file_location(
    "daily_crawl",
    os.path.join(os.path.dirname(__file__), "..", "examples",
                 "daily_crawl.py"),
)
daily_crawl = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and daily_crawl)


def _page(doc_id: int, text: str, pdf: bool) -> dict:
    url = f"https://crawl.example/doc/{doc_id}"
    if pdf:
        return {"url": url, "ts": TS, "body": encode_pdf(doc_id, text),
                "content_type": "application/pdf"}
    return {"url": url, "ts": TS,
            "body": build_page_html(doc_id, f"s{doc_id}",
                                    text).encode("utf-8")}


def test_daily_crawl_two_microbatches_equal_scratch(spark, tmp_path):
    """Two WARC drop files (maxFilesPerTrigger=1 -> two micro-batches,
    mixed html+pdf, one corrupt PDF) through run_daily_crawl: the
    index labels must equal one from-scratch dedup over the batch-read
    union of the SAME extracted corpus, errors counted not fatal, and
    the packed handoff produced."""
    from web_content_extraction_benchmark_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from web_content_extraction_benchmark_spark.operators.incremental_dedup import (
        NearDupIndex,
    )
    from web_content_extraction_benchmark_spark.plans.pipeline import (
        extract_mixed,
    )

    words = [f"tok{i}" for i in range(30)]
    texts = {
        # 1-2 near-dups (shifted window), 3 distinct; 11-12 near-dups
        # ACROSS the two files, 13 distinct
        1: " ".join(words[0:14]),
        2: " ".join(words[1:15]),
        3: " ".join(words[15:29]),
        11: " ".join(words[0:13]),
        12: " ".join(words[15:28]),
        13: " ".join(f"only{i}" for i in range(12)),
    }
    drop = tmp_path / "drop"
    drop.mkdir()
    W.write_warc_gz(str(drop / "day1.warc.gz"), [
        _page(1, texts[1], pdf=False),
        _page(2, texts[2], pdf=True),
        _page(3, texts[3], pdf=False),
    ])
    bad = _page(4, "irrelevant", pdf=True)
    bad["body"] = b"%PDF-1.4\ntotal garbage, no objects"
    W.write_warc_gz(str(drop / "day2.warc.gz"), [
        _page(11, texts[11], pdf=True),
        _page(12, texts[12], pdf=False),
        _page(13, texts[13], pdf=False),
        bad,
    ])

    index_dir = str(tmp_path / "index")
    stats = daily_crawl.run_daily_crawl(
        spark, str(drop), index_dir, str(tmp_path / "ckpt"),
        jaccard_threshold=0.5, bands=8, n_buckets=4, maint_every=2,
    )
    assert stats["batches"] == 2
    assert stats["rows"] == 6
    assert stats["errors"] == 1
    assert stats["packed_chunks"] >= 1
    # clean fixture text sails over the permissive LM floor
    assert stats["lm_dropped"] == 0

    # from-scratch truth over the SAME pipeline output, batch-read
    src = F.regexp_extract("url", r"/(\d+)$", 1)
    corpus = (
        extract_mixed(W.read_warc(spark, str(drop)))
        .filter(F.col("error").isNull())
        .select(src.cast("long").alias("doc_id"),
                F.regexp_replace(F.col("plaintext"), r"\s+", " ")
                .alias("text"))
    )
    assert corpus.count() == 6
    scratch = connected_components(
        minhash_lsh_pairs(corpus, jaccard_threshold=0.5, bands=8)
        .select("id_a", "id_b"))
    idx = NearDupIndex.open(index_dir)
    got = {(r[0], r[1]) for r in idx.labels(spark).collect()}
    want = {(r[0], r[1]) for r in scratch.collect()}
    assert got == want and len(want) >= 4  # {1,2,11} and {3,12} cluster
    # maintenance ran (maint_every=2 over 2 batches) and kept the
    # three stores at one consistent version
    idx.assert_consistent()


def test_lm_gate_keeps_no_evidence_docs(spark):
    """ADVICE r8: a doc with fewer than two tokens produces no lm_score
    row; the permissive floor must KEEP it (no evidence = keep), not
    silently drop it through coalesce(False)."""
    from pyspark.sql import functions as F

    from examples.daily_crawl import LM_FLOOR_MICRO
    from web_content_extraction_benchmark_spark.operators.lm import (
        lm_score,
    )

    uniq = spark.createDataFrame(
        [(1, "ok"), (2, "the cat sat on the mat")],
        "doc_id long, text string",
    )
    lm = lm_score(uniq).select(
        F.col("id").alias("doc_id"),
        (F.col("lm_score_micro") / F.col("lm_bigrams")).alias("_avg"),
    )
    gated = uniq.join(lm, "doc_id", "left").filter(
        F.coalesce(F.col("_avg") >= LM_FLOOR_MICRO, F.lit(True))
    )
    assert {r.doc_id for r in gated.collect()} >= {1}
