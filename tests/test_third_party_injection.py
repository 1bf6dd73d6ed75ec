"""Install-free proof of the third-party wrapper path (VERDICT r3, next
#8): a fake `inscriptis` module injected via PYTHONPATH must make
``discover_third_party()`` register the E7 wrapper AND run it end-to-end
through the Arrow extraction kernel (driver import + worker import both
resolve the package, exactly as a real pip install would).

Runs in a subprocess with its own SparkSession because package discovery
happens at extractors-package import time in BOTH the driver and the
reused Python workers — the session-scoped test JVM has already frozen
its registry without the fake."""

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FAKE_INSCRIPTIS = '''\
"""Test-only stand-in for the PyPI `inscriptis` package (PYTHONPATH
injection by test_third_party_injection.py).  Delegates to the repo's
plain extractor so the end-to-end assertion has an exact expectation."""


def get_text(html):
    from web_content_extraction_benchmark_spark.extractors.baseline import (
        extract_plain,
    )

    return extract_plain(html)
'''

DRIVER = '''\
from web_content_extraction_benchmark_spark.extractors import EXTRACTORS
from web_content_extraction_benchmark_spark.extractors.third_party import (
    discover_third_party,
    third_party_status,
)

assert "inscriptis" in discover_third_party(), "wrapper did not register"
assert "inscriptis" in EXTRACTORS, "registry did not pick up the wrapper"
assert third_party_status()["inscriptis"] is True

from web_content_extraction_benchmark_spark.plans.pipeline import (
    extract_answers,
)
from web_content_extraction_benchmark_spark.session import get_spark
from web_content_extraction_benchmark_spark.sources.pages import (
    synthesize_pages,
)

spark = get_spark("wceb-injection-test", master="local[2]",
                  shuffle_partitions=4)
spark.sparkContext.setLogLevel("ERROR")
pages = synthesize_pages(spark, "/root/testdata/sf0.001").limit(60).cache()
answers = extract_answers(pages, ["inscriptis"]).cache()
assert answers.filter("error").count() == 0, "wrapper errored in the kernel"
got = {r.url: r.plaintext for r in answers.collect()}
want = {
    r.url: r.plaintext for r in extract_answers(pages, ["plain"]).collect()
}
assert len(got) == 60 and got == want, "kernel output mismatch"
print("INJECTION OK")
spark.stop()
'''


def test_fake_package_registers_and_runs_through_kernel(tmp_path):
    site = tmp_path / "fake_site"
    site.mkdir()
    (site / "inscriptis.py").write_text(FAKE_INSCRIPTIS)
    script = tmp_path / "driver.py"
    script.write_text(DRIVER)

    env = os.environ.copy()
    env["PYTHONPATH"] = (
        f"{site}{os.pathsep}{REPO_ROOT}{os.pathsep}"
        + env.get("PYTHONPATH", "")
    )
    proc = subprocess.run(
        [sys.executable, str(script)], env=env, capture_output=True,
        text=True, timeout=420, cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "INJECTION OK" in proc.stdout
