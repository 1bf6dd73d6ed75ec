"""Incremental near-dup dedup (operators/incremental_dedup.py): N
batches against the persisted signature store must produce labels
byte-identical to one from-scratch run over the union — including
cross-batch transitive merges — with atomic snapshot commits."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from web_content_extraction_benchmark_spark.operators.incremental_dedup import (
    NearDupIndex,
)


@pytest.fixture()
def index_path():
    path = tempfile.mkdtemp(prefix="wceb_neardup_index_")
    yield path
    shutil.rmtree(path, ignore_errors=True)


def _chain_corpus(spark, sf_dir, mod=20):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter((F.col("doc_id") % mod == 0) & F.col("text").isNotNull())
    )

    def prefix(frac, tag):
        words = F.split("text", " ")
        cut = F.floor(F.size(words) * frac).cast("int")
        return docs.select(
            (-(F.col("doc_id") * 2 + tag)).alias("doc_id"),
            F.concat_ws(" ", F.slice(words, 1, cut)).alias("text"),
        )

    return docs, prefix(0.9, 1).unionByName(prefix(0.81, 2))


def _labels_set(df):
    return {(r[0], r[1]) for r in df.collect()}


def _scratch_labels(corpus, threshold, hash_fn="md5", bands=4):
    pairs = minhash_lsh_pairs(
        corpus, jaccard_threshold=threshold, hash_fn=hash_fn, bands=bands
    )
    return connected_components(pairs.select("id_a", "id_b"))


@pytest.mark.parametrize("hash_fn", ["md5", "oph"])
def test_two_batches_equal_from_scratch(spark, sf_dir, index_path, hash_fn):
    base, mutants = _chain_corpus(spark, sf_dir)
    idx = NearDupIndex(
        index_path + "/" + hash_fn, jaccard_threshold=0.6, hash_fn=hash_fn
    )
    p1 = idx.add_batch(base)
    p2 = idx.add_batch(mutants)
    got = _labels_set(idx.labels(spark).select("id", "component"))
    want = _labels_set(
        _scratch_labels(
            base.unionByName(mutants), 0.6, hash_fn
        ).select("id", "component")
    )
    assert got == want and len(want) > 50
    # batch-2 pairs all involve a batch-2 (negative) id
    assert p2.filter(
        (F.col("id_a") >= 0) & (F.col("id_b") >= 0)
    ).count() == 0
    # within-batch pairs existed in batch 1 only if base self-sims occur;
    # cross-batch pairs must exist (the mutants pair with their bases)
    assert p2.count() > 0
    p1.unpersist()
    p2.unpersist()


def test_cross_batch_transitive_merge(spark, index_path):
    """A bridge doc in batch 3 links one cluster committed in batch 1
    with another committed in batch 2: all five docs must collapse to
    ONE component — the case a per-batch (non-incremental) dedup
    cannot see."""
    w = [f"w{i}" for i in range(40)]
    a = " ".join(w[:20])
    a2 = " ".join(w[:18])
    b = " ".join(w[20:40])
    b2 = " ".join(w[20:38])
    bridge = " ".join(w[8:32])
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    # 8 bands x 1 row: the bridge pairs sit at J ~ 0.33, so candidate
    # recall needs single-hash bands (deterministic either way — md5 —
    # but 2-row bands would deterministically MISS moderate-J pairs)
    idx = NearDupIndex(index_path, jaccard_threshold=0.25, bands=8)
    idx.add_batch(mk([(1, a), (2, a2)]))
    idx.add_batch(mk([(3, b), (4, b2)]))
    mid = idx.labels(spark)
    assert {r.component for r in mid.collect()} == {1, 3}  # two clusters
    idx.add_batch(mk([(5, bridge)]))
    final = _labels_set(idx.labels(spark))
    assert final == {(1, 1), (2, 1), (3, 1), (4, 1), (5, 1)}
    # from-scratch equivalence on the union
    union = mk([(1, a), (2, a2), (3, b), (4, b2), (5, bridge)])
    assert final == _labels_set(_scratch_labels(union, 0.25, bands=8))


def test_no_pair_batch_and_unique_docs(spark, index_path):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = NearDupIndex(index_path, jaccard_threshold=0.6)
    idx.add_batch(mk([(1, "alpha beta gamma delta epsilon"),
                      (2, "one two three four five six")]))
    assert idx.labels(spark).count() == 0
    assert idx.unique_docs(spark).count() == 2
    # a later batch duplicating doc 1 shrinks the unique view
    idx.add_batch(mk([(3, "alpha beta gamma delta epsilon")]))
    uniq = {r.doc_id for r in idx.unique_docs(spark).select("doc_id").collect()}
    assert uniq == {1, 2}


def test_commits_are_snapshots_with_time_travel(spark, index_path):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = NearDupIndex(index_path, jaccard_threshold=0.6, bands=8)
    common = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    idx.add_batch(mk([(1, common + " lambda")]))
    idx.add_batch(mk([(2, common + " mu")]))
    # labels table: v1 (batch 1, no pairs) is still readable; v2 holds
    # the pair-resolved labels (replace semantics, not append)
    v1 = idx.labels_table.read(spark, snapshot_id=1)
    assert v1 is None or v1.count() == 0
    assert _labels_set(idx.labels(spark)) == {(1, 1), (2, 1)}
    # docs table accumulated both batches via append
    assert idx.committed_docs(spark).count() == 2


def test_assert_consistent_detects_commit_skew(spark, index_path):
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    idx = NearDupIndex(index_path, jaccard_threshold=0.6)
    idx.add_batch(mk([(1, "alpha beta gamma delta epsilon")]))
    assert idx.assert_consistent() == 1
    # simulate a crash after the docs commit of batch 2: docs moves to
    # v2, bands/labels stay at v1
    idx.docs_table.append(mk([(9, "one two three four five")]))
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="commit skew"):
        idx.assert_consistent()


def test_meta_lifecycle_guards(spark, index_path):
    """Config-persistence edges (review r6): read-only opens never
    stamp a meta file; committed tables WITHOUT a meta refuse (the
    config is unknown — guessing would silently miss duplicates);
    unknown stored keys are tolerated by open()."""
    import json
    import os

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    # 1. constructing (a read-only open) writes NO meta
    idx = NearDupIndex(index_path, jaccard_threshold=0.6)
    assert not os.path.exists(NearDupIndex.meta_path(index_path))
    # 2. the first MUTATION stamps it
    idx.add_batch(mk([(1, "alpha beta gamma delta epsilon")]))
    assert os.path.exists(NearDupIndex.meta_path(index_path))
    # 3. a future-version meta with extra keys still opens fine
    meta = json.load(open(NearDupIndex.meta_path(index_path)))
    meta["format_version"] = 99
    json.dump(meta, open(NearDupIndex.meta_path(index_path), "w"))
    idx2 = NearDupIndex.open(index_path)
    assert idx2.jaccard_threshold == 0.6
    # 4. committed tables with a LOST meta refuse outright
    os.remove(NearDupIndex.meta_path(index_path))
    with pytest.raises(ValueError, match="no\\s+index_meta"):
        NearDupIndex(index_path)
    # 5. and open() with fresh_defaults must NOT resurrect it as fresh
    with pytest.raises(ValueError, match="no\\s+index_meta"):
        NearDupIndex.open(index_path, fresh_defaults={"hash_fn": "oph"})
