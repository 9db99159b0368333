"""Mechanical rotation hygiene (VERDICT r8 finding 1).

The verification-window contract (registry.py) requires hand-adding a
query's name to ``rotation.json["changed"]`` whenever an
implementation BACKING it is edited after its last driver stamp. The
r8 round violated that rule silently — an edit to
``sources/delta_log.py`` (which the lakehouse gates exercise but do
not import directly) left ``changed`` empty. This module makes the
rule checkable instead of remembered:

- ``fold_rotation.py`` records an md5 per package module at each fold
  (``rotation.json["module_hashes"]`` — the state the driver last
  verified);
- ``stale_unflagged()`` diffs those hashes against the working tree,
  maps each edited module to every registered query whose TRANSITIVE
  package-import closure reaches it (ast-parsed, so
  gate-query-in-lakehouse.py → sources/hudi_table.py edges exist),
  and returns the affected queries missing from ``changed``;
- ``tests/test_registry.py`` asserts that list is empty, so an edit
  that should re-front a gate fails the suite until ``changed`` is
  honest (or the fold re-stamps).

A widely-imported util flags many queries — that is the honest
semantics, not a false positive: an edit there can affect all of
them.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_PKG_NAME = os.path.basename(_PKG_DIR)


def package_files() -> list[str]:
    """Relative paths of every .py module in the package."""
    out = []
    for root, dirs, files in os.walk(_PKG_DIR):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in files:
            if fn.endswith(".py"):
                out.append(os.path.relpath(
                    os.path.join(root, fn), _PKG_DIR
                ).replace(os.sep, "/"))
    return sorted(out)


def module_hashes() -> dict[str, str]:
    return {
        rel: hashlib.md5(
            open(os.path.join(_PKG_DIR, rel), "rb").read()
        ).hexdigest()
        for rel in package_files()
    }


def _module_name(rel: str) -> str:
    """'operators/dedup.py' -> 'fda..._spark.operators.dedup'."""
    parts = rel[:-3].split("/")
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join([_PKG_NAME] + parts)


def _rel_of_module(dotted: str) -> str | None:
    """Package-internal dotted module -> relative file path."""
    if not dotted.startswith(_PKG_NAME):
        return None
    tail = dotted[len(_PKG_NAME):].lstrip(".")
    base = tail.replace(".", "/") if tail else ""
    for cand in (f"{base}.py" if base else "__init__.py",
                 f"{base}/__init__.py" if base else "__init__.py"):
        if os.path.isfile(os.path.join(_PKG_DIR, cand)):
            return cand
    return None


# Modules whose outgoing imports are REGISTRATION side-effects, not
# behavioral dependencies: every operator module imports registry.py
# (for @register) and registry.all_queries() imports every operator
# module back — without this cut the graph is one cycle and every
# query "depends on" every file, which drowns the signal the check
# exists to give.
_HUB_MODULES = {"registry.py", "__main__.py", "api.py"}


def import_graph() -> dict[str, set[str]]:
    """rel path -> set of package-internal rel paths it imports
    (hub modules contribute no outgoing edges — see _HUB_MODULES)."""
    graph: dict[str, set[str]] = {}
    for rel in package_files():
        deps: set[str] = set()
        if rel in _HUB_MODULES:
            graph[rel] = deps
            continue
        src = open(os.path.join(_PKG_DIR, rel)).read()
        try:
            tree = ast.parse(src)
        except SyntaxError:  # pragma: no cover
            graph[rel] = deps
            continue
        pkg_parts = ([_PKG_NAME] + rel.split("/")[:-1])
        for node in ast.walk(tree):
            names: list[str] = []
            if isinstance(node, ast.Import):
                names = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                if node.level:  # relative import
                    anchor = pkg_parts[: len(pkg_parts)
                                       - (node.level - 1)]
                    mod = ".".join(
                        anchor + ([node.module] if node.module else [])
                    )
                    names = [mod] + [f"{mod}.{a.name}"
                                     for a in node.names]
                elif node.module:
                    names = [node.module]
            for name in names:
                dep = _rel_of_module(name)
                if dep and dep != rel:
                    deps.add(dep)
        graph[rel] = deps
    return graph


def _closure(start: str, graph: dict[str, set[str]]) -> set[str]:
    seen, stack = {start}, [start]
    while stack:
        for dep in graph.get(stack.pop(), ()):
            if dep not in seen:
                seen.add(dep)
                stack.append(dep)
    return seen


def query_dependencies() -> dict[str, set[str]]:
    """query name -> transitive package-file closure of its module."""
    from .registry import all_queries

    graph = import_graph()
    out: dict[str, set[str]] = {}
    for name, q in all_queries().items():
        mod = q.fn.__module__
        rel = _rel_of_module(mod)
        out[name] = _closure(rel, graph) if rel else set()
    return out


def stale_unflagged() -> dict[str, list[str]]:
    """Edited-since-last-fold package files whose dependent registered
    queries are NOT flagged in rotation.json["changed"]:
    {query_name: [edited files it depends on]}. Empty = honest."""
    rot_path = os.path.join(_PKG_DIR, "rotation.json")
    rot = json.load(open(rot_path))
    recorded = rot.get("module_hashes")
    if recorded is None:
        return {}  # pre-seeding state: nothing to compare yet
    current = module_hashes()
    edited = {
        rel for rel, h in current.items()
        if recorded.get(rel) != h
    } | (set(recorded) - set(current))
    if not edited:
        return {}
    flagged = set(rot.get("changed", []))
    out: dict[str, list[str]] = {}
    for name, deps in query_dependencies().items():
        hits = sorted(deps & edited)
        if hits and name not in flagged:
            out[name] = hits
    return out
