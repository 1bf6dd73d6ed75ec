"""Snapshot-log commit semantics + checkpoint/resume (north_rule)."""

from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.plans.pipeline import extract_answers
from web_content_extraction_benchmark_spark.sources.pages import synthesize_pages
from web_content_extraction_benchmark_spark.sources.snapshots import (
    SnapshotTable,
    remaining_pages,
)


def test_append_commit_read(spark, sf_dir, tmp_path):
    table = SnapshotTable(str(tmp_path / "t"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    s1 = table.append(docs.filter(F.col("doc_id") < 100))
    assert s1.snapshot_id == 1
    assert table.read(spark).count() == 100
    s2 = table.append(docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 150)))
    assert s2.snapshot_id == 2
    assert table.read(spark).count() == 150
    # time travel
    assert table.read(spark, snapshot_id=1).count() == 100


def test_uncommitted_files_invisible(spark, sf_dir, tmp_path):
    table = SnapshotTable(str(tmp_path / "t"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table.append(docs.filter(F.col("doc_id") < 10))
    # crash-before-commit: parquet lands, manifest does not
    table.write_uncommitted(docs.filter(F.col("doc_id") >= 10))
    assert table.read(spark).count() == 10


def test_resume_no_duplicates_no_missing(spark, sf_dir, tmp_path):
    """Kill-and-restart: first run commits a partial answers snapshot,
    then crashes mid-write; the restart anti-joins committed urls and
    finishes.  No url may be duplicated or missing."""
    pages = synthesize_pages(spark, sf_dir).cache()
    n_total = pages.count()
    answers_table = SnapshotTable(str(tmp_path / "answers"))

    # run 1: process ~40% of pages, commit, then 'crash' mid-second-batch
    first = pages.filter(F.col("doc_id") % 5 < 2)
    answers_table.append(extract_answers(first, ["main_content"]))
    answers_table.write_uncommitted(
        extract_answers(pages.filter(F.col("doc_id") % 5 == 2), ["main_content"])
    )

    # restart: resume from last committed snapshot
    todo = remaining_pages(pages, answers_table, model="main_content")
    assert todo.count() == pages.filter(F.col("doc_id") % 5 >= 2).count()
    answers_table.append(extract_answers(todo, ["main_content"]))

    final = answers_table.read(spark)
    assert final.count() == n_total
    assert final.select("url").distinct().count() == n_total
    # and the merged result is still byte-identical to gold
    joined = final.alias("a").join(
        pages.select("url", "gold").alias("p"), "url"
    )
    assert joined.filter(F.expr("a.plaintext != p.gold")).count() == 0
