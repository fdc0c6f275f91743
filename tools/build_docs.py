"""Build the rendered HTML documentation site into ``docs/html/``.

The reference ships a sphinx tree plus a sphinx-gallery of executable
examples (``/root/reference/docs/src/``, ``examples/*.py``); this repo's
environment has no sphinx, but the stdlib-adjacent ``markdown`` +
``pygments`` packages are available, so the same presentation axis is
covered by this generator:

* every page under ``docs/*.md`` (guide + generated API reference),
* ``README.md`` and ``CHANGELOG.md``,
* a gallery page per ``examples/*.py`` (module docstring rendered as the
  intro, source highlighted below — the sphinx-gallery analog; the
  examples themselves are executed by ``tests/test_examples.py``).

Run ``python tools/build_docs.py`` from the repo root; the output is
self-contained static HTML (no network assets, one stylesheet).
``tests/test_docs_site.py`` builds the site into a tmpdir and checks the
structure, so the site cannot silently rot.
"""

from __future__ import annotations

import ast
import html
import re
import shutil
import sys
from pathlib import Path

import markdown
from pygments import highlight
from pygments.formatters import HtmlFormatter
from pygments.lexers import PythonLexer

REPO = Path(__file__).resolve().parent.parent

# nav order: (source, output stem, title)
GUIDE_PAGES = [
    (REPO / "docs" / "index.md", "index", "Overview"),
    (REPO / "docs" / "getting_started.md", "getting_started", "Getting started"),
    (REPO / "docs" / "theory.md", "theory", "Theory"),
    (REPO / "docs" / "performance.md", "performance", "Performance"),
    (REPO / "docs" / "multichip.md", "multichip", "Multi-chip"),
    (REPO / "docs" / "api.md", "api", "API reference"),
    (REPO / "README.md", "readme", "README"),
    (REPO / "CHANGELOG.md", "changelog", "Changelog"),
]

_MD = markdown.Markdown(
    extensions=["tables", "fenced_code", "codehilite", "toc"],
    extension_configs={"codehilite": {"guess_lang": False}},
)

_MATH_ROLE = re.compile(r":(?:math|class|mod|func|meth|attr|obj):`([^`]*)`")
_MD_LINK = re.compile(r"\(([\w./-]+)\.md(#[\w-]*)?\)")


def _preprocess(text: str) -> str:
    """Markdown-level rewrites: RST roles from docstrings -> inline code,
    cross-page ``*.md`` links -> the rendered ``*.html`` names."""
    text = _MATH_ROLE.sub(r"`\1`", text)

    def _link(m: re.Match) -> str:
        stem = Path(m.group(1)).name
        return f"({stem}.html{m.group(2) or ''})"

    return _MD_LINK.sub(_link, text)


def _render_markdown(text: str) -> str:
    _MD.reset()
    return _MD.convert(_preprocess(text))


_CSS = """
:root { --ink: #1a1d23; --dim: #5c6470; --line: #e3e6ea; --bg: #ffffff;
        --side: #f6f7f9; --accent: #0b63c4; --code-bg: #f3f4f6; }
* { box-sizing: border-box; }
body { margin: 0; color: var(--ink); background: var(--bg);
       font: 16px/1.6 system-ui, -apple-system, "Segoe UI", sans-serif; }
.layout { display: flex; min-height: 100vh; }
nav.side { width: 240px; flex: none; background: var(--side);
           border-right: 1px solid var(--line); padding: 1.2rem 1rem; }
nav.side h1 { font-size: 1.05rem; margin: 0 0 1rem; }
nav.side h1 a { color: var(--ink); text-decoration: none; }
nav.side .group { margin: 1rem 0 0.25rem; font-size: 0.72rem;
                  text-transform: uppercase; letter-spacing: 0.08em;
                  color: var(--dim); }
nav.side a.item { display: block; padding: 0.18rem 0.4rem; border-radius: 5px;
                  color: var(--ink); text-decoration: none; font-size: 0.92rem; }
nav.side a.item:hover { background: #eceef1; }
nav.side a.item.active { background: var(--accent); color: #fff; }
main { flex: 1; min-width: 0; padding: 2rem 3rem 4rem; max-width: 60rem; }
main h1, main h2, main h3 { line-height: 1.25; }
main h1 { margin-top: 0; }
main h2 { border-bottom: 1px solid var(--line); padding-bottom: 0.3rem;
          margin-top: 2.2rem; }
main a { color: var(--accent); }
main code { background: var(--code-bg); padding: 0.1em 0.32em;
            border-radius: 4px; font-size: 0.88em; }
main pre { background: var(--code-bg); border: 1px solid var(--line);
           border-radius: 8px; padding: 0.85rem 1rem; overflow-x: auto;
           line-height: 1.45; }
main pre code { background: none; padding: 0; font-size: 0.85rem; }
main table { border-collapse: collapse; margin: 1rem 0; font-size: 0.92rem;
             display: block; overflow-x: auto; }
main th, main td { border: 1px solid var(--line); padding: 0.4rem 0.7rem;
                   text-align: left; }
main th { background: var(--side); }
main blockquote { border-left: 3px solid var(--line); margin: 1rem 0;
                  padding: 0.1rem 1rem; color: var(--dim); }
.gallery-grid { display: grid; gap: 0.7rem;
                grid-template-columns: repeat(auto-fill, minmax(20rem, 1fr)); }
.gallery-grid a.card { border: 1px solid var(--line); border-radius: 8px;
                       padding: 0.8rem 1rem; text-decoration: none;
                       color: var(--ink); background: var(--bg); }
.gallery-grid a.card:hover { border-color: var(--accent); }
.gallery-grid .name { color: var(--accent); font-family: ui-monospace,
                      monospace; font-size: 0.85rem; }
.gallery-grid .blurb { font-size: 0.88rem; color: var(--dim);
                       margin-top: 0.3rem; }
footer { color: var(--dim); font-size: 0.8rem; margin-top: 3rem;
         border-top: 1px solid var(--line); padding-top: 0.8rem; }
@media (max-width: 760px) { .layout { display: block; }
  nav.side { width: auto; } main { padding: 1.2rem; } }
"""


def _nav(pages, gallery, active: str) -> str:
    out = ['<nav class="side"><h1><a href="index.html">torchpme_tpu</a></h1>']
    out.append('<div class="group">Guide</div>')
    for _, stem, title in pages:
        cls = "item active" if stem == active else "item"
        out.append(f'<a class="{cls}" href="{stem}.html">{html.escape(title)}</a>')
    out.append('<div class="group">Examples</div>')
    cls = "item active" if active == "gallery" else "item"
    out.append(f'<a class="{cls}" href="gallery.html">Gallery index</a>')
    for stem, title, _ in gallery:
        cls = "item active" if stem == active else "item"
        out.append(
            f'<a class="{cls}" href="{stem}.html">{html.escape(title)}</a>'
        )
    out.append("</nav>")
    return "\n".join(out)


def _page(title: str, nav: str, body: str) -> str:
    return f"""<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{html.escape(title)} — torchpme_tpu</title>
<link rel="stylesheet" href="style.css"></head>
<body><div class="layout">
{nav}
<main>
{body}
<footer>torchpme_tpu — TPU-native long-range interactions.
Built by <code>tools/build_docs.py</code>; every example on this site runs
as a test.</footer>
</main></div></body></html>
"""


def _example_meta(path: Path) -> tuple[str, str, str]:
    """(title, first-paragraph blurb, docstring) of an example module."""
    tree = ast.parse(path.read_text())
    doc = ast.get_docstring(tree) or path.stem
    first = doc.strip().splitlines()[0].rstrip(".")
    para = doc.strip().split("\n\n")[0].replace("\n", " ")
    return first, para, doc


def _split_docstring(source: str) -> str:
    """Source with the module docstring removed (it becomes the page intro)."""
    tree = ast.parse(source)
    if (
        tree.body
        and isinstance(tree.body[0], ast.Expr)
        and isinstance(tree.body[0].value, ast.Constant)
        and isinstance(tree.body[0].value.value, str)
    ):
        lines = source.splitlines(keepends=True)
        return "".join(lines[tree.body[0].end_lineno :]).lstrip("\n")
    return source


def build(out_dir: Path) -> list[Path]:
    out_dir.mkdir(parents=True, exist_ok=True)
    formatter = HtmlFormatter(nowrap=False, cssclass="codehilite")

    examples = sorted((REPO / "examples").glob("*.py"))
    gallery = []  # (stem, title, path)
    for ex in examples:
        title, _, _ = _example_meta(ex)
        gallery.append((f"example_{ex.stem}", title, ex))

    written = []

    # guide pages
    for src, stem, title in GUIDE_PAGES:
        nav = _nav(GUIDE_PAGES, gallery, stem)
        body = _render_markdown(src.read_text())
        (out_dir / f"{stem}.html").write_text(_page(title, nav, body))
        written.append(out_dir / f"{stem}.html")

    # gallery index
    cards = ['<h1>Example gallery</h1>', "<p>Every example runs as a test "
             "(<code>tests/test_examples.py</code>); the source shown is the "
             "executed source.</p>", '<div class="gallery-grid">']
    for stem, title, ex in gallery:
        _, blurb, _ = _example_meta(ex)
        cards.append(
            f'<a class="card" href="{stem}.html">'
            f'<div class="name">{html.escape(ex.name)}</div>'
            f'<div class="blurb">{html.escape(blurb[:220])}</div></a>'
        )
    cards.append("</div>")
    nav = _nav(GUIDE_PAGES, gallery, "gallery")
    (out_dir / "gallery.html").write_text(
        _page("Example gallery", nav, "\n".join(cards))
    )
    written.append(out_dir / "gallery.html")

    # gallery pages
    for stem, title, ex in gallery:
        _, _, doc = _example_meta(ex)
        source = _split_docstring(ex.read_text())
        code_html = highlight(source, PythonLexer(), formatter)
        body = (
            f"<h1>{html.escape(title)}</h1>\n"
            + _render_markdown(doc)
            + f'<h2>Source — <code>examples/{html.escape(ex.name)}</code></h2>\n'
            + code_html
        )
        nav = _nav(GUIDE_PAGES, gallery, stem)
        (out_dir / f"{stem}.html").write_text(_page(title, nav, body))
        written.append(out_dir / f"{stem}.html")

    css = _CSS + "\n" + formatter.get_style_defs(".codehilite")
    (out_dir / "style.css").write_text(css)
    written.append(out_dir / "style.css")
    return written


if __name__ == "__main__":
    target = REPO / "docs" / "html"
    if target.exists():
        shutil.rmtree(target)
    files = build(target)
    print(f"wrote {len(files)} files to {target}", file=sys.stderr)
