"""The three reference ensemble variants over Spark answers
(extractors.py:174-209: majority / best / weighted)."""

import pytest
from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.plans.pipeline import (
    ENSEMBLE_VARIANTS,
    ensemble_variant_answers,
    extract_answers,
)
from web_content_extraction_benchmark_spark.sources.pages import (
    synthesize_pages,
    truth_table,
)

ALL_MODELS = ["main_content", "plain", "readability", "bte"]


@pytest.fixture(scope="module")
def setup(spark, sf_dir):
    pages = synthesize_pages(spark, sf_dir).limit(60).cache()
    answers = extract_answers(pages, ALL_MODELS).cache()
    return pages, answers


@pytest.mark.parametrize("variant", sorted(ENSEMBLE_VARIANTS))
def test_variant_runs_and_votes(spark, setup, variant):
    pages, answers = setup
    voted = ensemble_variant_answers(variant, answers, ALL_MODELS)
    rows = voted.collect()
    assert len(rows) == pages.count()
    assert all(r.model == variant for r in rows)
    # gold tokens must survive a vote among extractors that all contain them
    golds = {r.url: r.plaintext for r in truth_table(pages).collect()}
    nonempty = 0
    for r in rows:
        gold_tokens = set(golds[r.url].split())
        if gold_tokens:
            nonempty += 1
            assert gold_tokens <= set(r.plaintext.split()), r.url
    assert nonempty > 0


def test_weighted_differs_from_majority_threshold(spark, setup):
    pages, answers = setup
    weighted = ensemble_variant_answers(
        "ensemble_weighted", answers, ALL_MODELS
    )
    majority = ensemble_variant_answers(
        "ensemble_majority", answers, ALL_MODELS
    )
    # both deterministic
    assert weighted.collect() == weighted.collect()
    assert majority.count() == weighted.count()
