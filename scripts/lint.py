"""Stdlib linter: syntax, unused imports, line length.

The reference lints every module with pylint (`script/pylint_script.sh`);
this environment ships no linter packages, so this script implements the
always-available subset with ast/compile alone.  Where ruff is installed,
`python -m ruff check .` picks up the [tool.ruff] config in pyproject.toml
instead.

Usage: python scripts/lint.py  (exit 0 = clean)
"""

from __future__ import annotations

import ast
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
MAX_LINE = 100
# names imported for re-export or intentional side effects
REEXPORT_FILES = {"__init__.py"}


def unused_imports(tree, source):
    imported = {}  # local name -> (lineno, display)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = (node.lineno, a.name)
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = (node.lineno, a.name)
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            used.add(node.value.id)
    # names referenced in __all__ strings or noqa'd lines count as used
    lines = source.splitlines()
    for name, (lineno, _) in list(imported.items()):
        if name in used:
            continue
        if f'"{name}"' in source or f"'{name}'" in source:
            continue
        if lineno <= len(lines) and "noqa" in lines[lineno - 1]:
            continue
        yield lineno, name


def lint_file(path):
    issues = []
    source = path.read_text()
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as e:
        return [(e.lineno or 0, f"syntax error: {e.msg}")]
    if path.name not in REEXPORT_FILES:
        for lineno, name in unused_imports(tree, source):
            issues.append((lineno, f"unused import: {name}"))
    for i, line in enumerate(source.splitlines(), 1):
        if len(line) > MAX_LINE:
            issues.append((i, f"line too long ({len(line)} > {MAX_LINE})"))
    return issues


def main():
    failures = 0
    targets = sorted(
        list((ROOT / "vmlmf_tpu").rglob("*.py"))
        + list((ROOT / "tests").rglob("*.py"))
        + list((ROOT / "scripts").glob("*.py"))
        + [ROOT / "bench.py", ROOT / "__graft_entry__.py"]
    )
    for path in targets:
        for lineno, msg in lint_file(path):
            print(f"{path.relative_to(ROOT)}:{lineno}: {msg}")
            failures += 1
    if failures:
        print(f"\n{failures} issue(s)")
        return 1
    print(f"clean ({len(targets)} files)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
