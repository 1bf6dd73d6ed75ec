"""Template/gold lockstep for the per-extractor oracle formulas.

Each gold_* function in sources/pages.py (and its SQL mirror used by the
driver's DuckDB oracle) claims to predict what the real extractor emits on
every synthesized template variant.  This test runs the actual extractors
over the full corpus at two scale factors and asserts byte equality —
if a template or an extractor changes, this fails before the driver gate
does."""

import pyarrow.parquet as pq
import pytest

from web_content_extraction_benchmark_spark.extractors import EXTRACTORS
from web_content_extraction_benchmark_spark.sources.pages import (
    build_page_html,
    gold_bte,
    gold_justext,
    gold_main_text,
    gold_readability,
    gold_tag_blacklist,
    gold_xpath_text,
    plain_full_text,
)

GOLDS = {
    "main_content": gold_main_text,
    "plain": plain_full_text,
    "xpath_text": gold_xpath_text,
    "tag_blacklist": gold_tag_blacklist,
    "readability": gold_readability,
    "bte": gold_bte,
    "stopword_density": gold_justext,
}


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_gold_formulas_match_extractors_corpus_wide(sf):
    docs = pq.read_table(
        f"/root/testdata/{sf}/documents.parquet",
        columns=["doc_id", "source", "text"],
    ).to_pylist()
    assert len(docs) >= 500
    mismatches = []
    for row in docs:
        doc_id, source, text = row["doc_id"], row["source"], row["text"]
        html = "" if doc_id % 101 == 0 else build_page_html(doc_id, source, text)
        for model, gold_fn in GOLDS.items():
            got = EXTRACTORS[model](html)
            want = gold_fn(doc_id, source, text)
            if got != want:
                mismatches.append((model, doc_id, got[:80], want[:80]))
    assert not mismatches, mismatches[:5]


def test_gold_edge_rows_are_empty():
    for gold_fn in GOLDS.values():
        assert gold_fn(101, "src", "some text here") == ""


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_ensemble_vote_formulas_corpus_wide(sf):
    """The oracle formulas for both ensemble thresholds, checked against
    the actual voting kernel on every page: threshold 1 == plain full
    text; threshold 2 == per-variant boilerplate-stripped formula."""
    from web_content_extraction_benchmark_spark.extractors.baseline import (
        extract_plain,
    )
    from web_content_extraction_benchmark_spark.extractors.ensemble import (
        majority_vote,
        normalize_answer,
    )

    models = ["main_content", "plain", "readability"]
    docs = pq.read_table(
        f"/root/testdata/{sf}/documents.parquet",
        columns=["doc_id", "source", "text"],
    ).to_pylist()
    best_models = ["main_content", "readability", "bte"]
    mismatches = []
    for row in docs:
        d, s, t = row["doc_id"], row["source"], row["text"]
        html = "" if d % 101 == 0 else build_page_html(d, s, t)
        norm = {m: normalize_answer(EXTRACTORS[m](html)) for m in models}
        norm_b = {m: normalize_answer(EXTRACTORS[m](html)) for m in best_models}
        full = extract_plain(html)
        out1 = majority_vote(full, norm, vote_threshold=1)
        out2 = majority_vote(full, norm, vote_threshold=2)
        out_best = majority_vote(full, norm_b, vote_threshold=1)
        out_wt = majority_vote(
            full, norm_b,
            weights={"main_content": 2, "readability": 2, "bte": 1},
            vote_threshold=2,
        )
        want1 = plain_full_text(d, s, t)
        from web_content_extraction_benchmark_spark.sources.pages import (
            host_for,
        )

        if d % 101 == 0:
            want2 = want_best = want_wt = ""
        elif d % 5 == 0:
            want2 = want_wt = f"Article {s} Article {s} {t}"
            want_best = (
                f"Article {s} Article {s} {t} © 2023 {host_for(d)} "
                "— All rights reserved"
            )
        elif d % 5 == 4:
            want2 = want_best = want_wt = f"Article {s} Article {s} {t}"
        else:
            want2 = want_best = want_wt = t
        if (out1, out2, out_best, out_wt) != (want1, want2, want_best, want_wt):
            mismatches.append(d)
    assert not mismatches, mismatches[:5]
