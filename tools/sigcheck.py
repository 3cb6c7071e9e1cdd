"""Static call-signature checker (stdlib-only) — the mypy slice this image
can actually run.

The reference CI gates on mypy/pylint (reference .github/workflows/test.yml:
12-60); this environment has no mypy and no way to install it, so `make
lint` runs this checker instead. It resolves call sites that are statically
unambiguous and verifies them against the callee's def:

* calls to functions defined in the same module
* ``self.method(...)`` / ``cls.method(...)`` against the defining class and
  its same-repo base classes
* ``from <repo module> import name`` direct imports
* ``ClassName(...)`` constructor calls against ``__init__``

Reported defects (each would be a TypeError at runtime):
* unexpected keyword argument (callee has no ``**kwargs``)
* too many positional arguments (callee has no ``*args``)
* missing required argument (call has no ``*``/``**`` unpacking)

Anything dynamic — attribute chains through instances, decorators that
change signatures (except the known-benign set), ``functools.partial`` —
is skipped, keeping the checker zero-false-positive by construction.
"""

from __future__ import annotations

import ast
import sys
from dataclasses import dataclass, field
from pathlib import Path

# decorators that preserve the visible call signature
_BENIGN_DECORATORS = {
    "staticmethod", "classmethod", "property", "abstractmethod", "override",
    "tp.overload", "typing.overload", "functools.wraps", "nn.compact",
}
# decorators that change or wrap the signature -> skip checking the callee
_SKIP_IF_DECORATED_MARKERS = {"partial", "jit", "custom_vjp", "validator", "root_validator", "field_validator"}


@dataclass
class Sig:
    name: str
    pos_names: list  # positional (args incl. posonly), in order
    defaults: int  # count of trailing positional params with defaults
    kwonly: dict  # name -> has_default
    has_vararg: bool
    has_kwarg: bool
    is_method: bool  # first param consumed by binding (self/cls)
    lineno: int


@dataclass
class ClassInfo:
    name: str
    bases: list
    methods: dict = field(default_factory=dict)  # name -> Sig


def _sig_of(node: ast.FunctionDef | ast.AsyncFunctionDef, is_method: bool) -> Sig | None:
    for dec in node.decorator_list:
        text = ast.unparse(dec)
        if any(marker in text for marker in _SKIP_IF_DECORATED_MARKERS):
            return None
        base = text.split("(")[0]
        if base not in _BENIGN_DECORATORS and not base.endswith((".setter", ".getter")):
            # unknown decorator: be conservative, skip
            return None
    a = node.args
    pos = [p.arg for p in a.posonlyargs + a.args]
    return Sig(
        name=node.name,
        pos_names=pos,
        defaults=len(a.defaults),
        kwonly={p.arg: d is not None for p, d in zip(a.kwonlyargs, a.kw_defaults)},
        has_vararg=a.vararg is not None,
        has_kwarg=a.kwarg is not None,
        is_method=is_method and not any(
            ast.unparse(d).split("(")[0] == "staticmethod" for d in node.decorator_list
        ),
        lineno=node.lineno,
    )


def _index_module(tree: ast.Module):
    funcs: dict = {}
    classes: dict = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            sig = _sig_of(node, is_method=False)
            if sig:
                funcs[node.name] = sig
        elif isinstance(node, ast.ClassDef):
            info = ClassInfo(
                name=node.name,
                bases=[ast.unparse(b) for b in node.bases],
            )
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    sig = _sig_of(item, is_method=True)
                    if sig:
                        info.methods[item.name] = sig
            classes[node.name] = info
    return funcs, classes


def _check_call(call: ast.Call, sig: Sig, label: str, bound: bool) -> list:
    problems = []
    if any(isinstance(a, ast.Starred) for a in call.args) or any(k.arg is None for k in call.keywords):
        return problems  # *args / **kwargs unpacking at the call site: skip
    pos_names = sig.pos_names[1:] if (sig.is_method and bound) else sig.pos_names
    n_pos_params = len(pos_names)
    if len(call.args) > n_pos_params and not sig.has_vararg:
        problems.append(
            f"too many positional arguments to {label} "
            f"({len(call.args)} given, {n_pos_params} accepted)"
        )
    kw_given = {k.arg for k in call.keywords}
    if not sig.has_kwarg:
        legal = set(pos_names) | set(sig.kwonly)
        for name in sorted(kw_given - legal):
            problems.append(f"unexpected keyword argument '{name}' to {label}")
    # missing required
    required_pos = pos_names[: n_pos_params - sig.defaults]
    covered = set(pos_names[: len(call.args)]) | kw_given
    for name in required_pos:
        if name not in covered:
            problems.append(f"missing required argument '{name}' to {label}")
    for name, has_default in sig.kwonly.items():
        if not has_default and name not in kw_given:
            problems.append(f"missing required keyword argument '{name}' to {label}")
    return problems


class _Checker(ast.NodeVisitor):
    def __init__(self, path: Path, funcs: dict, classes: dict, imported: dict):
        self.path = path
        self.funcs = funcs
        self.classes = classes
        self.imported = imported  # local name -> Sig (cross-module function)
        self.problems: list = []
        self._class_stack: list = []

    def _resolve_method(self, cls: ClassInfo, name: str) -> Sig | None:
        seen = set()
        queue = [cls]
        while queue:
            c = queue.pop(0)
            if c.name in seen:
                continue
            seen.add(c.name)
            if name in c.methods:
                return c.methods[name]
            for b in c.bases:
                base = self.classes.get(b.split("[")[0])
                if base:
                    queue.append(base)
                else:
                    return None  # base outside this module: can't prove absence
        return None

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self._class_stack.append(node.name)
        self.generic_visit(node)
        self._class_stack.pop()

    def visit_Call(self, node: ast.Call) -> None:
        sig = None
        label = None
        bound = False
        f = node.func
        if isinstance(f, ast.Name):
            if f.id in self.funcs:
                sig, label = self.funcs[f.id], f.id
            elif f.id in self.imported:
                sig, label = self.imported[f.id], f.id
            elif f.id in self.classes:
                ctor = self._resolve_method(self.classes[f.id], "__init__")
                if ctor:
                    sig, label, bound = ctor, f"{f.id}()", True
        elif (
            isinstance(f, ast.Attribute)
            and isinstance(f.value, ast.Name)
            and f.value.id in ("self", "cls")
            and self._class_stack
        ):
            cls = self.classes.get(self._class_stack[-1])
            if cls:
                m = self._resolve_method(cls, f.attr)
                if m:
                    sig, label, bound = m, f"self.{f.attr}", True
        if sig:
            for msg in _check_call(node, sig, label, bound):
                self.problems.append(f"{self.path}:{node.lineno}: {msg}")
        self.generic_visit(node)


def check_paths(roots: list) -> list:
    files = []
    for root in roots:
        p = Path(root)
        files.extend(sorted(p.rglob("*.py")) if p.is_dir() else [p])

    module_index = {}  # dotted module -> (funcs, classes)
    trees = {}
    for path in files:
        try:
            tree = ast.parse(path.read_text())
        except SyntaxError as exc:
            return [f"{path}: syntax error: {exc}"]
        trees[path] = tree
        dotted = ".".join(path.with_suffix("").parts)
        module_index[dotted] = _index_module(tree)

    problems = []
    for path, tree in trees.items():
        funcs, classes = module_index[".".join(path.with_suffix("").parts)]
        imported = {}
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
                target = module_index.get(node.module)
                if target:
                    for alias in node.names:
                        if alias.name in target[0]:
                            imported[alias.asname or alias.name] = target[0][alias.name]
        checker = _Checker(path, funcs, classes, imported)
        checker.visit(tree)
        problems.extend(checker.problems)
    return problems


def main() -> int:
    roots = sys.argv[1:] or ["rectools_tpu"]
    problems = check_paths(roots)
    for p in problems:
        print(p)
    n_files = sum(1 for r in roots for _ in (Path(r).rglob("*.py") if Path(r).is_dir() else [r]))
    print(f"sigcheck: {n_files} files, {len(problems)} problem(s)")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
