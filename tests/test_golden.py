"""Golden-file regression gate: committed byte-exact extraction outputs.

Mirrors the reference's committed-artifact strategy (its study outputs are
committed tarballs diffable against re-runs, README.md:57,114).  Any
change to an extractor's whitespace rules, DOM handling, or classification
shows up here as a byte diff — regenerate deliberately via
``python tests/golden/regen.py`` and review the diff.
"""

import json
import os

import pandas as pd

from web_content_extraction_benchmark_spark.encoding import decode_html
from web_content_extraction_benchmark_spark.extractors import (
    EXTRACTORS,
    safe_extract,
)
from web_content_extraction_benchmark_spark.sources.pages import (
    build_page_html,
    encode_page_html,
    url_for,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "extractions.jsonl")


def test_extraction_outputs_match_committed_golden(sf_dir):
    with open(GOLDEN) as f:
        golden = [json.loads(line) for line in f]
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    docs = docs[docs.doc_id < 40].sort_values("doc_id")
    assert len(golden) == len(docs)
    for record, (_, row) in zip(golden, docs.iterrows()):
        doc_id = int(row.doc_id)
        assert record["doc_id"] == doc_id
        assert record["url"] == url_for(doc_id, row.source)
        raw = encode_page_html(
            doc_id, build_page_html(doc_id, row.source, row.text)
        )
        html = decode_html(raw)
        for name in sorted(EXTRACTORS):
            assert record[name] == safe_extract(name, html), (
                f"extractor {name!r} drifted on doc {doc_id}"
            )
