"""The rendered docs site builds and is structurally sound.

The reference ships a sphinx tree + sphinx-gallery
(``/root/reference/docs/src/``); here the same presentation axis is a
dependency-light static generator (``tools/build_docs.py``).  This test
rebuilds the site into a tmpdir and checks pages, navigation, highlighted
code, and that no internal link dangles — so the committed ``docs/html/``
cannot silently rot.
"""

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))


def test_docs_site_builds_and_links_resolve(tmp_path):
    import build_docs

    written = build_docs.build(tmp_path)
    names = {p.name for p in written}

    # one page per guide source + gallery index + one per example + css
    for _, stem, _ in build_docs.GUIDE_PAGES:
        assert f"{stem}.html" in names
    examples = sorted((REPO / "examples").glob("*.py"))
    assert examples, "examples/ is empty?"
    for ex in examples:
        assert f"example_{ex.stem}.html" in names
    assert "gallery.html" in names and "style.css" in names

    pages = {p.name for p in tmp_path.glob("*.html")}
    for page in tmp_path.glob("*.html"):
        text = page.read_text()
        # self-contained: no external assets
        assert "http://" not in text.split("</main>")[0].split("<main>")[0]
        for m in re.finditer(r'href="([^"#]+)(#[^"]*)?"', text):
            target = m.group(1)
            if target.startswith(("http", "mailto")) or target.endswith(".css"):
                continue
            assert target in pages, f"{page.name} links to missing {target}"

    # gallery pages carry highlighted source and the rendered intro
    sample = (tmp_path / f"example_{examples[0].stem}.html").read_text()
    assert 'class="codehilite"' in sample
    assert "<h1" in sample

    # the API reference rendered its tables and code roles
    api = (tmp_path / "api.html").read_text()
    assert "<code>" in api and ":math:" not in api


def test_committed_site_is_current():
    """docs/html/ in the repo matches what the generator produces now."""
    import build_docs

    committed = REPO / "docs" / "html"
    assert committed.is_dir(), "run `python tools/build_docs.py`"
    expected = {p.name for p in committed.iterdir()}
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        written = build_docs.build(Path(td))
        fresh = {p.name for p in written}
        assert fresh == expected, (
            "docs/html/ is stale — re-run `python tools/build_docs.py`"
        )
        # content spot-check on the API page (regenerated from docs/api.md)
        assert (committed / "api.html").read_text() == (
            Path(td) / "api.html"
        ).read_text()
