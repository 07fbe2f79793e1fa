#!/usr/bin/env python
"""Build the HTML documentation site into docs/_build/.

Capability parity with the reference's Sphinx build
(`/root/reference/Makefile:1-20`, `docs/source/*.rst` — automodule stubs):
this renders the repo's markdown docs to HTML and auto-generates an API
reference page from the package's module/class/function docstrings (the
automodule equivalent), with zero dependencies beyond the baked-in
`markdown` package.

Usage:  python scripts/build_docs.py  [outdir]
"""

from __future__ import annotations

import html
import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

import markdown

REPO = Path(__file__).resolve().parent.parent

PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title} — vmlmf_tpu</title>
<style>
body {{ font-family: sans-serif; max-width: 60rem; margin: 2rem auto; padding: 0 1rem;
       line-height: 1.5; color: #1a1a1a; }}
pre {{ background: #f6f6f4; padding: .8rem; overflow-x: auto; border-radius: 4px; }}
code {{ background: #f6f6f4; padding: .08rem .25rem; border-radius: 3px; }}
table {{ border-collapse: collapse; }} td, th {{ border: 1px solid #ccc; padding: .3rem .6rem; }}
nav a {{ margin-right: 1rem; }}
h1, h2, h3 {{ line-height: 1.2; }}
</style></head><body>
<nav>{nav}</nav>
<hr>
{body}
</body></html>
"""


def _nav(pages):
    return " ".join(f'<a href="{dst}">{title}</a>' for title, dst in pages)


def _api_markdown(pkg_name="vmlmf_tpu"):
    """One markdown page of module docstrings + public signatures
    (the automodule-stub equivalent)."""
    lines = [f"# API reference — `{pkg_name}`", ""]
    pkg = importlib.import_module(pkg_name)
    mods = [pkg_name] + sorted(
        m.name for m in pkgutil.walk_packages(pkg.__path__, prefix=f"{pkg_name}.")
        if not m.name.rsplit(".", 1)[-1].startswith("_"))
    for name in mods:
        try:
            mod = importlib.import_module(name)
        except Exception as e:  # optional deps (e.g. orbax) may be absent
            lines += [f"## `{name}`", "", f"*(import skipped: {e})*", ""]
            continue
        lines += [f"## `{name}`", ""]
        if mod.__doc__:
            lines += [mod.__doc__.strip().splitlines()[0], ""]
        for attr, obj in sorted(vars(mod).items()):
            if attr.startswith("_") or getattr(obj, "__module__", None) != name:
                continue
            if inspect.isclass(obj) or inspect.isfunction(obj):
                try:
                    sig = str(inspect.signature(obj))
                except (TypeError, ValueError):
                    sig = "(...)"
                doc = inspect.getdoc(obj) or ""
                first = doc.splitlines()[0] if doc else ""
                lines.append(f"* **`{attr}{sig}`** — {first}")
        lines.append("")
    return "\n".join(lines)


def build(outdir=None):
    out = Path(outdir) if outdir else REPO / "docs" / "_build"
    out.mkdir(parents=True, exist_ok=True)
    sources = [("Home", REPO / "README.md", "index.html")]
    for f in sorted((REPO / "docs").glob("*.md")):
        title = f.stem.replace("_", " ").title()
        sources.append((title, f, f"{f.stem}.html"))

    md = markdown.Markdown(extensions=["tables", "fenced_code"])
    nav_pages = [(t, d) for t, _, d in sources] + [("Api Reference", "api_reference.html")]
    nav = _nav(nav_pages)
    for title, src, dst in sources:
        body = md.reset().convert(src.read_text(encoding="utf-8"))
        (out / dst).write_text(
            PAGE.format(title=html.escape(title), nav=nav, body=body),
            encoding="utf-8")
    api_md = _api_markdown()
    (out / "api_reference.html").write_text(
        PAGE.format(title="API reference", nav=nav,
                    body=md.reset().convert(api_md)),
        encoding="utf-8")
    print(f"built {len(sources) + 1} pages -> {out}")
    return out


if __name__ == "__main__":
    sys.path.insert(0, str(REPO))
    build(sys.argv[1] if len(sys.argv) > 1 else None)
