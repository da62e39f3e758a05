"""Suite-count pin enforcement: the docs' test count cannot drift again.

Round-3 advisor finding: the docs pinned "315 tests" while collection said
316 — a pin nothing enforced. This test extracts every pinned count from
the docs (``N tests`` / ``N-test suite``) and compares each against a real
``pytest --collect-only`` of this suite, so adding a test without
re-pinning fails here instead of aging silently.
"""

import os
import re
import subprocess
import sys

import pytest

from conftest import REPO_ROOT, cli_env

pytestmark = pytest.mark.slow  # one subprocess collection pass

PINNED_DOCS = ["CLAUDE.md", os.path.join("docs", "COMPONENTS.md"),
               os.path.join("docs", "MIGRATION.md")]
PIN_RE = re.compile(r"(\d{3,4})(?:\s+tests\b|-test suite)")


def test_documented_suite_counts_match_collection():
    pins = {}
    for doc in PINNED_DOCS:
        text = open(os.path.join(REPO_ROOT, doc)).read()
        for m in PIN_RE.finditer(text):
            pins.setdefault(doc, set()).add(int(m.group(1)))
    assert pins, "doc parse broke: no pinned suite counts found"

    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        capture_output=True, text=True, timeout=600, env=cli_env(),
        cwd=REPO_ROOT)
    m = re.search(r"(\d+) tests collected", r.stdout)
    assert m, r.stdout[-500:]
    collected = int(m.group(1))

    problems = [f"{doc}: pins {sorted(counts)}"
                for doc, counts in pins.items()
                if counts != {collected}]
    assert not problems, (
        f"suite collects {collected} tests but docs pin differently: "
        f"{problems} — re-pin the count in every doc")
