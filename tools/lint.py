#!/usr/bin/env python
"""Stdlib AST linter: the fallback `make lint` backend for environments
without ruff/mypy (this image bakes in no lint tooling). Checks a pragmatic
subset of the rules the pyproject [tool.ruff] config selects:

- F401  unused import (module scope; `__init__.py` imports count as re-exports)
- F821  undefined name (conservative: whole-module name universe, so scope
        violations are missed but false positives are rare)
- E501  line longer than --max-line-length (default 120)
- E722  bare `except:`
- B006  mutable default argument
- W191/W291  tabs / trailing whitespace
- SYNTAX  file fails to parse

Exit status 1 when any violation is found. Usage:
    python tools/lint.py [paths...] [--max-line-length N]
"""

from __future__ import annotations

import argparse
import ast
import builtins
import sys
from pathlib import Path

MUTABLE_CALLS = {"list", "dict", "set", "bytearray"}


def _iter_py_files(paths: list[str]) -> list[Path]:
    files: list[Path] = []
    for p in paths:
        path = Path(p)
        if path.is_dir():
            files.extend(sorted(path.rglob("*.py")))
        elif path.suffix == ".py":
            files.append(path)
    return files


class _NameUniverse(ast.NodeVisitor):
    """Every name the module could legally bind anywhere (module globals,
    function params/locals, comprehension targets, imports, class names)."""

    def __init__(self) -> None:
        self.bound: set[str] = set()

    def visit_Name(self, node: ast.Name) -> None:
        if isinstance(node.ctx, (ast.Store, ast.Del)):
            self.bound.add(node.id)
        self.generic_visit(node)

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._bind_func(node)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._bind_func(node)

    def _bind_func(self, node: ast.FunctionDef | ast.AsyncFunctionDef) -> None:
        self.bound.add(node.name)
        args = node.args
        for a in [*args.posonlyargs, *args.args, *args.kwonlyargs]:
            self.bound.add(a.arg)
        if args.vararg:
            self.bound.add(args.vararg.arg)
        if args.kwarg:
            self.bound.add(args.kwarg.arg)
        self.generic_visit(node)

    def visit_Lambda(self, node: ast.Lambda) -> None:
        args = node.args
        for a in [*args.posonlyargs, *args.args, *args.kwonlyargs]:
            self.bound.add(a.arg)
        if args.vararg:
            self.bound.add(args.vararg.arg)
        if args.kwarg:
            self.bound.add(args.kwarg.arg)
        self.generic_visit(node)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self.bound.add(node.name)
        self.generic_visit(node)

    def visit_Import(self, node: ast.Import) -> None:
        for alias in node.names:
            self.bound.add((alias.asname or alias.name).split(".")[0])

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        for alias in node.names:
            if alias.name == "*":
                continue
            self.bound.add(alias.asname or alias.name)

    def visit_ExceptHandler(self, node: ast.ExceptHandler) -> None:
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)

    def visit_Global(self, node: ast.Global) -> None:
        self.bound.update(node.names)

    def visit_Nonlocal(self, node: ast.Nonlocal) -> None:
        self.bound.update(node.names)

    def visit_NamedExpr(self, node: ast.NamedExpr) -> None:
        if isinstance(node.target, ast.Name):
            self.bound.add(node.target.id)
        self.generic_visit(node)

    def visit_MatchAs(self, node: ast.MatchAs) -> None:  # pragma: no cover
        if node.name:
            self.bound.add(node.name)
        self.generic_visit(node)


def _module_import_names(tree: ast.Module) -> dict[str, int]:
    """name -> lineno for top-level imports (the F401 candidates)."""
    out: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for alias in node.names:
                out[(alias.asname or alias.name).split(".")[0]] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            for alias in node.names:
                if alias.name != "*":
                    out[alias.asname or alias.name] = node.lineno
    return out


def _used_names(tree: ast.Module) -> set[str]:
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            # `a.b.c` loads `a`; walk already visits the inner Name, but
            # string annotations below need the textual form too
            pass
    # names referenced inside string annotations / __all__ entries
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)
    return used


def lint_file(path: Path, max_line_length: int) -> list[str]:
    problems: list[str] = []
    text = path.read_text(encoding="utf-8")
    lines = text.splitlines()

    for i, line in enumerate(lines, 1):
        if len(line) > max_line_length:
            problems.append(f"{path}:{i}: E501 line too long ({len(line)} > {max_line_length})")
        if line != line.rstrip():
            problems.append(f"{path}:{i}: W291 trailing whitespace")
        if "\t" in line:
            problems.append(f"{path}:{i}: W191 tab in source")

    try:
        tree = ast.parse(text, filename=str(path))
    except SyntaxError as exc:
        problems.append(f"{path}:{exc.lineno}: SYNTAX {exc.msg}")
        return problems

    # F401 — unused top-level imports (skip __init__.py: imports there are the
    # public re-export surface, same convention ruff applies with F401 in
    # per-file-ignores for package inits)
    if path.name != "__init__.py":
        used = _used_names(tree)
        for name, lineno in _module_import_names(tree).items():
            if name not in used and not name.startswith("_"):
                problems.append(f"{path}:{lineno}: F401 unused import `{name}`")

    universe = _NameUniverse()
    universe.visit(tree)
    known = universe.bound | set(dir(builtins)) | {"__file__", "__name__", "__doc__", "__all__", "__version__"}
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load) and node.id not in known:
            problems.append(f"{path}:{node.lineno}: F821 undefined name `{node.id}`")
        elif isinstance(node, ast.ExceptHandler) and node.type is None:
            problems.append(f"{path}:{node.lineno}: E722 bare except")
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in [*node.args.defaults, *[d for d in node.args.kw_defaults if d is not None]]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)) or (
                    isinstance(default, ast.Call)
                    and isinstance(default.func, ast.Name)
                    and default.func.id in MUTABLE_CALLS
                ):
                    problems.append(f"{path}:{default.lineno}: B006 mutable default argument in `{node.name}`")
    return problems


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("paths", nargs="*", default=["rectools_tpu"])
    parser.add_argument("--max-line-length", type=int, default=120)
    args = parser.parse_args()

    files = _iter_py_files(args.paths or ["rectools_tpu"])
    all_problems: list[str] = []
    for f in files:
        all_problems.extend(lint_file(f, args.max_line_length))
    for p in all_problems:
        print(p)
    print(f"lint: {len(files)} files checked, {len(all_problems)} problems")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
