#!/usr/bin/env python
"""AST-based static lint for the pre-commit gate (tools/run_checks.sh).

The image ships no ruff/pyflakes/mypy and pip installs are forbidden, so this
implements the highest-value subset of those tools' checks natively:

  * F401 unused imports           (module scope; ``as _`` and __init__ re-exports exempt)
  * F821-lite undefined names     (only names *used at module scope* are checked —
                                   full scope analysis without a real resolver would
                                   false-positive on comprehensions/closures)
  * W191 tabs in indentation
  * T201 stray debug prints       (``print(`` in gance_tpu/ library code only; CLIs,
                                   tools, tests, and benches legitimately print)
  * E999 syntax errors            (parse failure)

Mirrors the *intent* of the reference's pylint/black gate
(/root/reference/.circleci/config.yml:39-55) at the fidelity this environment allows.
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__", "__package__", "__spec__", "__builtins__", "__debug__"}


def _collect_defined(tree: ast.Module) -> set[str]:
    """Names bound at module scope (imports, defs, classes, assignments, etc.)."""
    defined: set[str] = set()
    for node in tree.body:
        for sub in ast.walk(node):
            if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                defined.add(sub.name)
            elif isinstance(sub, ast.Import):
                for a in sub.names:
                    defined.add((a.asname or a.name).split(".")[0])
            elif isinstance(sub, ast.ImportFrom):
                for a in sub.names:
                    if a.name == "*":
                        return defined | {"*"}  # star import: give up on F821
                    defined.add(a.asname or a.name)
            elif isinstance(sub, (ast.Name, ast.Attribute)) and isinstance(getattr(sub, "ctx", None), ast.Store):
                if isinstance(sub, ast.Name):
                    defined.add(sub.id)
            elif isinstance(sub, ast.arg):
                defined.add(sub.arg)
            elif isinstance(sub, ast.alias):
                defined.add((sub.asname or sub.name).split(".")[0])
            elif isinstance(sub, (ast.For, ast.AsyncFor)):
                for t in ast.walk(sub.target):
                    if isinstance(t, ast.Name):
                        defined.add(t.id)
            elif isinstance(sub, (ast.With, ast.AsyncWith)):
                for item in sub.items:
                    if item.optional_vars is not None:
                        for t in ast.walk(item.optional_vars):
                            if isinstance(t, ast.Name):
                                defined.add(t.id)
            elif isinstance(sub, ast.ExceptHandler) and sub.name:
                defined.add(sub.name)
            elif isinstance(sub, (ast.GeneratorExp, ast.ListComp, ast.SetComp, ast.DictComp)):
                for gen in sub.generators:
                    for t in ast.walk(gen.target):
                        if isinstance(t, ast.Name):
                            defined.add(t.id)
            elif isinstance(sub, ast.Lambda):
                for a in sub.args.args + sub.args.kwonlyargs + sub.args.posonlyargs:
                    defined.add(a.arg)
                if sub.args.vararg:
                    defined.add(sub.args.vararg.arg)
                if sub.args.kwarg:
                    defined.add(sub.args.kwarg.arg)
            elif isinstance(sub, (ast.MatchAs, ast.MatchStar)) and getattr(sub, "name", None):
                defined.add(sub.name)
            elif isinstance(sub, ast.NamedExpr) and isinstance(sub.target, ast.Name):
                defined.add(sub.target.id)
            elif isinstance(sub, ast.TypeAlias):
                if isinstance(sub.name, ast.Name):
                    defined.add(sub.name.id)
    return defined


def _module_scope_loads(tree: ast.Module):
    """(name, lineno) for Name loads executed directly at module scope."""
    loads = []

    def scan(stmts):
        for node in stmts:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Lambda)):
                continue  # deferred scope — not executed at import time
            if isinstance(node, (ast.If, ast.Try, ast.With, ast.For, ast.While)):
                # statement headers execute at module scope; bodies recurse
                for field in ("test", "iter", "subject"):
                    expr = getattr(node, field, None)
                    if expr is not None:
                        for sub in ast.walk(expr):
                            if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                                loads.append((sub.id, sub.lineno))
                for body_field in ("body", "orelse", "finalbody"):
                    scan(getattr(node, body_field, []) or [])
                for h in getattr(node, "handlers", []) or []:
                    scan(h.body)
                for item in getattr(node, "items", []) or []:
                    for sub in ast.walk(item.context_expr):
                        if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                            loads.append((sub.id, sub.lineno))
                continue
            for sub in ast.walk(node):
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Lambda)):
                    break
                if isinstance(sub, ast.Name) and isinstance(sub.ctx, ast.Load):
                    loads.append((sub.id, sub.lineno))

    scan(tree.body)
    return loads


def _used_names(tree: ast.Module) -> set[str]:
    used = set()
    for sub in ast.walk(tree):
        if isinstance(sub, ast.Name):
            used.add(sub.id)
        elif isinstance(sub, ast.Attribute):
            # pick up dotted roots like `os.path` where `os` is the Name child
            pass
    # string annotations / __all__ entries count as uses
    for sub in ast.walk(tree):
        if isinstance(sub, ast.Constant) and isinstance(sub.value, str) and sub.value.isidentifier():
            used.add(sub.value)
    return used


def lint_file(path: Path) -> list[str]:
    errors: list[str] = []
    src = path.read_text(encoding="utf-8")
    try:
        tree = ast.parse(src, filename=str(path))
    except SyntaxError as exc:  # E999
        return [f"{path}:{exc.lineno}: E999 syntax error: {exc.msg}"]

    lines = src.splitlines()
    noqa_lines = {i for i, line in enumerate(lines, 1) if "# noqa" in line}
    for i, line in enumerate(lines, 1):
        stripped_len = len(line) - len(line.lstrip("\t "))
        if "\t" in line[:stripped_len] and i not in noqa_lines:
            errors.append(f"{path}:{i}: W191 tab in indentation")

    is_init = path.name == "__init__.py"
    is_library = "gance_tpu" in path.parts and "tests" not in path.parts and "cli" not in path.parts

    used = _used_names(tree)
    # F401: module-scope imports never referenced anywhere in the file
    if not is_init:  # __init__.py imports are intentional re-exports
        for node in tree.body:
            if node.lineno in noqa_lines:
                continue
            if isinstance(node, ast.Import):
                for a in node.names:
                    bound = (a.asname or a.name).split(".")[0]
                    if not bound.startswith("_") and bound not in used:
                        errors.append(f"{path}:{node.lineno}: F401 unused import '{bound}'")
            elif isinstance(node, ast.ImportFrom):
                if node.module == "__future__":
                    continue
                for a in node.names:
                    if a.name == "*":
                        continue
                    bound = a.asname or a.name
                    if not bound.startswith("_") and bound not in used:
                        errors.append(f"{path}:{node.lineno}: F401 unused import '{bound}'")

    defined = _collect_defined(tree)
    if "*" not in defined:
        for name, lineno in _module_scope_loads(tree):
            if name not in defined and name not in BUILTINS and lineno not in noqa_lines:
                errors.append(f"{path}:{lineno}: F821 undefined name '{name}' at module scope")

    if is_library:
        for sub in ast.walk(tree):
            if (
                isinstance(sub, ast.Call)
                and isinstance(sub.func, ast.Name)
                and sub.func.id == "print"
                and sub.lineno not in noqa_lines
            ):
                errors.append(f"{path}:{sub.lineno}: T201 print() in library code (use utils.logging)")

    return errors


def main(argv: list[str]) -> int:
    targets: list[Path] = []
    for arg in argv:
        p = Path(arg)
        if p.is_dir():
            targets.extend(sorted(p.rglob("*.py")))
        elif p.suffix == ".py":
            targets.append(p)
    all_errors: list[str] = []
    for f in targets:
        all_errors.extend(lint_file(f))
    for e in all_errors:
        print(e)
    print(f"lint: {len(targets)} files, {len(all_errors)} findings")
    return 1 if all_errors else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
