"""docs/API.md drift guard: every documented API symbol resolves.

The API reference (docs/API.md) is the migration surface a reference user
reads first (successor to the reference's README API walkthrough,
/root/reference/README.md:60-130); a renamed or deleted symbol that the
doc still advertises is doc rot this test turns into a failure. Each
table row's API cell is parsed for backticked tokens and every token must
resolve against the real package — as a module, a dotted attribute chain,
or (for bare names listed beside their module) an EXACT attribute in one
of the row's or the doc's namespaces. The only fuzzy form allowed is an
explicit shorthand marker: a token ending in ``_`` resolves as a name
prefix (``average_`` for ``average_clip_probs``); anything else must
resolve exactly, so a renamed or deleted symbol cannot keep "resolving"
through an accidental substring hit.
"""

from __future__ import annotations

import importlib
import os
import re

PKG = "ab_line_classifier_tpu"

#: Parent packages tried when a dotted token starts at a submodule rather
#: than the package root (`mesh.make_mesh` -> parallel.mesh.make_mesh).
PARENTS = ["", "config", "graph", "export", "data", "models", "train",
           "parallel", "predict", "explain", "viz", "ops", "utils"]

#: Modules searched for bare tokens beyond those the doc names as modules
#: (classes documented in a sibling's row, e.g. the concrete ETL creator).
EXTRA_MODULES = ["data.ab_line_dataset_creator"]

API_MD = os.path.join(os.path.dirname(__file__), os.pardir, "docs",
                      "API.md")


def _api_cells():
    """First (API) cell of every data row of every table in API.md."""
    with open(API_MD) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("|"):
                continue
            if set(line) <= {"|", "-", " "}:  # separator row
                continue
            cell = line.split("|")[1].strip()
            if cell in ("API", ""):
                continue
            yield cell


def _tokens(cell):
    """Backticked tokens, call-args/index suffixes stripped, `/`-groups
    split (``init_/update_/compute_metrics`` documents three names)."""
    for tok in re.findall(r"`([^`]+)`", cell):
        tok = re.sub(r"\(.*?\)", "", tok)
        tok = re.sub(r"\[.*?\]", "", tok)
        if tok.endswith(".py"):
            yield ("module", tok[:-3].replace("/", "."))
            continue
        for part in tok.split("/"):
            part = part.strip().rstrip(",")
            if (not part or part.startswith(".") or " " in part
                    or "…" in part or "{" in part or "$" in part):
                continue  # method-on-previous-class shorthand / prose
            yield ("name", part)


def _try_import(modname):
    try:
        return importlib.import_module(modname)
    except ImportError:
        return None


def _resolve_dotted(dotted, namespaces):
    """Resolve ``a.b.c`` as module-prefix + getattr chain under any parent
    package; record every module touched so bare tokens in the same doc
    can resolve against it."""
    parts = dotted.split(".")
    for parent in PARENTS:
        base = ".".join(p for p in (PKG, parent) if p)
        for i in range(len(parts), -1, -1):
            mod = _try_import(".".join([base] + parts[:i]))
            if mod is None:
                continue
            namespaces.setdefault(mod.__name__, mod)
            obj = mod
            try:
                for attr in parts[i:]:
                    obj = getattr(obj, attr)
            except AttributeError:
                continue
            return True
    return False


def _resolve_bare(name, namespaces):
    """Exact attribute anywhere; a trailing ``_`` is the one explicit
    prefix-shorthand marker (``average_`` resolves iff some public name
    starts with it). No substring fallback — a stale documented ``load``
    must not "resolve" via ``load_config``."""
    mods = list(namespaces.values())
    for mod in mods:
        if hasattr(mod, name):
            return True
    if name.endswith("_"):
        for mod in mods:
            for public in dir(mod):
                if not public.startswith("_") and public.startswith(name):
                    return True
    return False


def test_every_documented_api_symbol_resolves():
    namespaces = {}
    for parent in PARENTS + EXTRA_MODULES:
        mod = _try_import(".".join(p for p in (PKG, parent) if p))
        if mod is not None:
            namespaces[mod.__name__] = mod

    tokens = [t for cell in _api_cells() for t in _tokens(cell)]
    assert len(tokens) > 100, "API.md parse broke: %d tokens" % len(tokens)

    # Two passes: dotted tokens first so the modules they import are
    # available as namespaces for the bare shorthand names.
    missing = []
    bare = []
    for kind, tok in tokens:
        if kind == "module":
            if _try_import(f"{PKG}.{tok}") is None:
                missing.append(tok + ".py")
            else:
                namespaces.setdefault(
                    f"{PKG}.{tok}", importlib.import_module(f"{PKG}.{tok}"))
        elif "." in tok:
            if not _resolve_dotted(tok, namespaces):
                missing.append(tok)
        else:
            bare.append(tok)
    for tok in bare:
        if not _resolve_bare(tok, namespaces):
            missing.append(tok)

    assert not missing, (
        "docs/API.md documents symbols that do not resolve against the "
        "package (rename the doc or restore the API): %r" % sorted(set(
            missing)))
