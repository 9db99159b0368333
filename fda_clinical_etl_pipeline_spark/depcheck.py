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

r13 refinement — FUNCTION granularity: file-level hashing over-flags
(the r12 window burned slots re-verifying 88 names because an ADTS
edit in multimodal.py re-fronted every multimodal gate, and any
_util.py touch re-fronted everything). Modules now also hash per
top-level definition (``unit_hashes``), queries map to the units
their code TRANSITIVELY reaches (intra-module name references +
import edges at alias precision: ``from .delta_log import
merge_precombine`` depends on that one unit, ``from . import x`` /
``import pkg.x`` conservatively on all of x), and ``stale_unflagged``
flags only queries whose unit closure intersects the edited units.
Everything unresolvable stays conservative: module-level statements
pool into a ``<preamble>`` unit every unit of the file depends on,
and unmatched import names widen to the whole target file.
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


# ------------------------------------------------ unit granularity

_PREAMBLE = "<preamble>"


def _parse(rel: str):
    src = open(os.path.join(_PKG_DIR, rel)).read()
    try:
        return src, ast.parse(src)
    except SyntaxError:  # pragma: no cover
        return src, None


def module_units(rel: str) -> dict[str, str]:
    """Per-top-level-definition source hashes for one module:
    {unit_name: md5}. Each top-level function/class is a unit (its
    segment includes decorators); every other top-level statement
    (imports, constants, registration calls, docstring) pools into
    the ``<preamble>`` unit that all of the file's units depend on."""
    src, tree = _parse(rel)
    if tree is None:
        return {_PREAMBLE: hashlib.md5(src.encode()).hexdigest()}
    lines = src.splitlines(keepends=True)

    def segment(node) -> str:
        start = min(
            [node.lineno] + [d.lineno for d in getattr(
                node, "decorator_list", [])]
        ) - 1
        return "".join(lines[start:node.end_lineno])

    units: dict[str, str] = {}
    preamble: list[str] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            units[node.name] = hashlib.md5(
                segment(node).encode()
            ).hexdigest()
        else:
            preamble.append(segment(node))
    units[_PREAMBLE] = hashlib.md5(
        "".join(preamble).encode()
    ).hexdigest()
    return units


def unit_hashes() -> dict[str, str]:
    """'rel::unit' -> md5 across the whole package."""
    out: dict[str, str] = {}
    for rel in package_files():
        for unit, h in module_units(rel).items():
            out[f"{rel}::{unit}"] = h
    return out


def _import_edges(node, pkg_parts, unit_names_of) -> set[tuple]:
    """One Import/ImportFrom node -> {(rel, unit)} edges; unit '*'
    means every unit of the file (conservative widening)."""
    edges: set[tuple] = set()
    if isinstance(node, ast.Import):
        for a in node.names:
            dep = _rel_of_module(a.name)
            if dep:
                edges.add((dep, "*"))
    elif isinstance(node, ast.ImportFrom):
        if node.level:
            anchor = pkg_parts[: len(pkg_parts) - (node.level - 1)]
            mod = ".".join(
                anchor + ([node.module] if node.module else [])
            )
        elif node.module:
            mod = node.module
        else:
            return edges
        base = _rel_of_module(mod)
        for a in node.names:
            sub = _rel_of_module(f"{mod}.{a.name}")
            if sub:  # `from .sources import hudi_table`
                edges.add((sub, "*"))
            elif base is not None:
                if a.name in unit_names_of.get(base, ()):
                    edges.add((base, a.name))  # alias precision
                else:
                    edges.add((base, "*"))
    return edges


def unit_graph() -> dict[tuple, set[tuple]]:
    """(rel, unit) -> dependency edges: intra-module top-level name
    references, the file's <preamble>, and import edges (unit-local
    imports attach to their unit; module-level ones to the preamble).
    Hub modules contribute no outgoing edges, same cut as
    import_graph()."""
    unit_names_of = {
        rel: set(module_units(rel)) - {_PREAMBLE}
        for rel in package_files()
    }
    graph: dict[tuple, set[tuple]] = {}
    for rel in package_files():
        src, tree = _parse(rel)
        names = unit_names_of[rel]
        if tree is None or rel in _HUB_MODULES:
            for u in names | {_PREAMBLE}:
                graph[(rel, u)] = set()
            continue
        pkg_parts = [_PKG_NAME] + rel.split("/")[:-1]

        def edges_of(nodes) -> set[tuple]:
            out: set[tuple] = set()
            for n in nodes:
                for sub in ast.walk(n):
                    if isinstance(sub, (ast.Import, ast.ImportFrom)):
                        out |= _import_edges(
                            sub, pkg_parts, unit_names_of
                        )
                    elif isinstance(sub, ast.Name) and isinstance(
                        sub.ctx, ast.Load
                    ) and sub.id in names:
                        out.add((rel, sub.id))
            return out

        pre_nodes = [
            n for n in tree.body
            if not isinstance(n, (ast.FunctionDef,
                                  ast.AsyncFunctionDef, ast.ClassDef))
        ]
        graph[(rel, _PREAMBLE)] = edges_of(pre_nodes) - {
            (rel, _PREAMBLE)
        }
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef,
                                 ast.AsyncFunctionDef, ast.ClassDef)):
                deps = edges_of([node]) | {(rel, _PREAMBLE)}
                deps.discard((rel, node.name))
                graph[(rel, node.name)] = deps
    # expand '*' edges to every unit of the target file
    all_units: dict[str, set[str]] = {}
    for rel, u in graph:
        all_units.setdefault(rel, set()).add(u)
    for key, deps in graph.items():
        widened = set()
        for rel, u in deps:
            if u == "*":
                widened |= {(rel, x) for x in all_units.get(rel, ())}
            else:
                widened.add((rel, u))
        graph[key] = widened
    return graph


def query_unit_dependencies() -> dict[str, set[str]]:
    """query name -> transitive '(rel)::(unit)' closure of its
    registered function."""
    from .registry import all_queries

    graph = unit_graph()
    out: dict[str, set[str]] = {}
    for name, q in all_queries().items():
        rel = _rel_of_module(q.fn.__module__)
        if rel is None:
            out[name] = set()
            continue
        unit = q.fn.__qualname__.split(".")[0]
        start = (rel, unit) if (rel, unit) in graph else (
            rel, _PREAMBLE
        )
        seen, stack = {start}, [start]
        while stack:
            for dep in graph.get(stack.pop(), ()):
                if dep not in seen:
                    seen.add(dep)
                    stack.append(dep)
        out[name] = {f"{r}::{u}" for r, u in seen}
    return out


def stale_unflagged(rot: dict | None = None) -> dict[str, list[str]]:
    """Edited-since-last-fold units whose dependent registered
    queries are NOT flagged in rotation.json["changed"]:
    {query_name: [edited units it depends on]}. Empty = honest.
    Unit granularity when the fold recorded ``unit_hashes``;
    file-level fallback against ``module_hashes`` otherwise.
    ``rot`` injects a rotation state for tests."""
    if rot is None:
        rot_path = os.path.join(_PKG_DIR, "rotation.json")
        rot = json.load(open(rot_path))
    flagged = set(rot.get("changed", []))
    recorded_units = rot.get("unit_hashes")
    if recorded_units is not None:
        current = unit_hashes()
        edited = {
            key for key, h in current.items()
            if recorded_units.get(key) != h
        } | (set(recorded_units) - set(current))
        if not edited:
            return {}
        out: dict[str, list[str]] = {}
        for name, deps in query_unit_dependencies().items():
            hits = sorted(deps & edited)
            if hits and name not in flagged:
                out[name] = hits
        return out
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
    out = {}
    for name, deps in query_dependencies().items():
        hits = sorted(deps & edited)
        if hits and name not in flagged:
            out[name] = hits
    return out
