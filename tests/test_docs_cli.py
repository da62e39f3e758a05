"""README/MIGRATION CLI drift guard: documented flags exist in --help.

The quickstart (README.md) and the migration guide (docs/MIGRATION.md) are
command-line recipes a reference user copy-pastes (successor to the
reference's README run instructions, /root/reference/README.md:24-130).
Every ``--flag`` shown on a documented ``python -m ab_line_classifier_tpu.*``
/ ``ablc-*`` / ``bench.py`` command line must be accepted by that CLI —
parsed out of the docs and checked against the CLI's real ``--help`` so a
renamed or removed option can't linger in the docs.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

from conftest import cli_env

pytestmark = pytest.mark.slow  # one subprocess (jax import) per CLI

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ["README.md", os.path.join("docs", "MIGRATION.md")]

def _scripts():
    """console-script name -> runnable module, read from pyproject's
    [project.scripts] so the map can't drift from the real entry points
    (``pkg.cli.__main__:main`` runs as ``python -m pkg.cli``)."""
    scripts = {}
    section = None
    for line in open(os.path.join(REPO_ROOT, "pyproject.toml")):
        line = line.strip()
        if line.startswith("["):
            section = line
            continue
        if section == "[project.scripts]" and "=" in line:
            name, target = (s.strip().strip('"') for s in line.split("=", 1))
            module = target.split(":")[0]
            scripts[name] = re.sub(r"\.__main__$", "", module)
    return scripts


SCRIPTS = _scripts()

CMD_RE = re.compile(
    r"(?:python(?:3)?(?: -u)? -m (ab_line_classifier_tpu[.\w]*)"
    r"|(ablc-[\w-]+)"
    r"|python(?:3)?(?: -u)? (bench\.py))"
    r"([^\n]*)")
FLAG_RE = re.compile(r"(--[a-z][\w-]*)")


def documented_flags():
    """{module: set of flags} from every documented command line."""
    flags = {}
    for doc in DOCS:
        text = open(os.path.join(REPO_ROOT, doc)).read()
        # Join explicit line continuations so a wrapped command line keeps
        # its flags attached to the right CLI.
        text = text.replace("\\\n", " ")
        for m in CMD_RE.finditer(text):
            module = m.group(1) or SCRIPTS.get(m.group(2)) or m.group(3)
            assert module, f"{doc} mentions unknown script {m.group(2)!r}"
            rest = m.group(4)
            flags.setdefault(module, set()).update(FLAG_RE.findall(rest))
    return flags


def test_documented_cli_flags_exist():
    flags = documented_flags()
    assert flags, "doc parse broke: no command lines found"
    # The multihost dryrun is in the README with flags; make sure parsing
    # reached at least the four main CLIs.
    assert len(flags) >= 4, sorted(flags)

    problems = []
    for module, wanted in sorted(flags.items()):
        if module == "bench.py":
            # bench.py is env-var configured and parses no flags; any flag
            # a doc shows on its command line is a doc bug (extend the
            # guard if bench.py ever grows an argparser).
            if wanted:
                problems.append(f"bench.py: docs show flags {sorted(wanted)} "
                                f"but bench.py parses none")
            continue
        if not wanted:
            continue
        r = subprocess.run([sys.executable, "-m", module, "--help"],
                           capture_output=True, text=True, timeout=300,
                           env=cli_env(), cwd=REPO_ROOT)
        helptext = r.stdout + r.stderr
        if r.returncode != 0:
            problems.append(f"{module} --help failed: {helptext[-300:]}")
            continue
        for flag in sorted(wanted):
            # Word-boundary match: a documented --foo must not pass just
            # because --help lists --foo-bar.
            if not re.search(re.escape(flag) + r"(?![\w-])", helptext):
                problems.append(f"{module}: documented {flag} not in --help")
    assert not problems, problems
