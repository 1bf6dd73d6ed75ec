"""Import gates for the third-party extractor wrappers: none of the
packages exist in this sandbox, so the registry must hold exactly the
from-scratch families — and the gating must be what keeps it that way."""

import pytest

from web_content_extraction_benchmark_spark.extractors import EXTRACTORS
from web_content_extraction_benchmark_spark.extractors.third_party import (
    discover_third_party,
    extract_boilernet,
    extract_go_domdistiller,
    extract_web2text,
    third_party_status,
)

FROM_SCRATCH = {
    "plain", "xpath_text", "tag_blacklist", "bte", "main_content",
    "readability", "stopword_density",
}


def test_sandbox_has_no_third_party_extractors():
    assert discover_third_party() == {}
    assert set(EXTRACTORS) == FROM_SCRATCH


def test_status_lists_every_candidate_family():
    status = third_party_status()
    assert len(status) == 15
    assert not any(status.values())
    assert {"trafilatura", "boilerpipe", "goose3", "dragnet",
            "justext_pkg", "resiliparse"} <= set(status)


def test_model_dependent_wrappers_raise_with_guidance():
    for fn in (extract_boilernet, extract_web2text, extract_go_domdistiller):
        with pytest.raises(NotImplementedError):
            fn("<p>x</p>")


def test_sidecar_pipe_roundtrip(spark, sf_dir):
    """E6 external-binary pattern: pages piped through a per-partition
    sidecar process (JSONL protocol) come back byte-identical to the
    in-process plain extractor, edge rows (empty/gzip/BOM) included."""
    from web_content_extraction_benchmark_spark.extractors.sidecar import (
        sidecar_extract,
        stub_sidecar_command,
    )
    from web_content_extraction_benchmark_spark.plans.pipeline import (
        extract_answers,
    )
    from web_content_extraction_benchmark_spark.sources.pages import (
        synthesize_pages,
    )

    pages = synthesize_pages(spark, sf_dir).limit(120).cache()
    command, env = stub_sidecar_command()
    piped = {
        r.url: r.plaintext
        for r in sidecar_extract(pages, command, env=env).collect()
    }
    inproc = {
        r.url: r.plaintext
        for r in extract_answers(pages, ["plain"]).collect()
    }
    assert piped == inproc
