"""MediaWiki XML dump ingestion (native convert_db.sh + parse_text.py
replacement: /root/reference/kb/parse_text.py:34-88)."""

import bz2
import json
from pathlib import Path

import pytest

from kbner_tpu.retrieval.dump import (
    DumpPage,
    build_redirects,
    dump_to_jsonl,
    iter_dump_pages,
    normalize_title,
    resolve_redirect,
    wikitext_to_paragraphs,
)

MW = "http://www.mediawiki.org/xml/export-0.10/"


def _page(title, text, ns=0, redirect=None):
    red = f'<redirect title="{redirect}" />' if redirect else ""
    return (f"<page><title>{title}</title><ns>{ns}</ns>{red}"
            f"<id>1</id><revision><id>2</id>"
            f"<text xml:space=\"preserve\">{text}</text>"
            f"</revision></page>")


def _dump_xml(pages):
    return (f'<mediawiki xmlns="{MW}" xml:lang="en">'
            + "".join(pages) + "</mediawiki>").encode("utf-8")


ARTICLE = """{{Infobox album
| name = Anthology
| type = [[Compilation album|compilation]]
}}
'''''Anthology''''' is a [[compilation album]] by [[Bic Runga]].&lt;ref name="a"&gt;cite&lt;/ref&gt;

== Background ==
It was released in [[New Zealand]].&lt;ref&gt;another cite&lt;/ref&gt; See [http://example.com/x the site] for details.
[[File:Cover.jpg|thumb|Album cover with [[Bic Runga|Runga]]]]
* [[Track listing|Tracks]] are short.
{| class="wikitable"
|-
| ignored || table
|}
[[Category:2012 albums]]
[[fr:Anthologie]]
"""


@pytest.fixture(scope="module")
def dump_file(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dump")
    pages = [
        _page("Anthology (Bic Runga album)", ARTICLE),
        _page("Compilation album",
              "A '''compilation album''' collects tracks from many "
              "records. It is common in pop music."),
        _page("Bic Runga", "Briolette Kah Bic Runga is a New Zealand "
              "singer. She records in English."),
        _page("Comp album", "#REDIRECT [[Compilation album]]",
              redirect="Compilation album"),
        _page("Talk:Ignored", "talk page text here", ns=1),
    ]
    p = tmp / "mini.xml"
    p.write_bytes(_dump_xml(pages))
    pbz = tmp / "mini.xml.bz2"
    pbz.write_bytes(bz2.compress(_dump_xml(pages)))
    return p, pbz


# -- streaming parse -----------------------------------------------------------

def test_iter_dump_pages(dump_file):
    p, pbz = dump_file
    pages = list(iter_dump_pages(p))
    assert [pg.title for pg in pages] == [
        "Anthology (Bic Runga album)", "Compilation album", "Bic Runga",
        "Comp album", "Talk:Ignored"]
    assert pages[3].redirect == "Compilation album"
    assert pages[4].ns == 1
    assert "compilation album" in pages[0].text
    # bz2 path parses identically
    assert [pg.title for pg in iter_dump_pages(pbz)] == \
        [pg.title for pg in pages]


# -- wikitext conversion -------------------------------------------------------

def test_wikitext_paragraphs_and_anchors():
    paras = wikitext_to_paragraphs(
        "'''X''' is a [[compilation album]] by [[Bic Runga|the artist]].")
    assert len(paras) == 1
    text, anchors = paras[0]
    assert text == "X is a compilation album by the artist."
    spans = {t: text[s:e] for t, s, e in anchors}
    assert spans == {"Compilation album": "compilation album",
                     "Bic Runga": "the artist"}


def test_wikitext_cleanup():
    paras = wikitext_to_paragraphs(ARTICLE.replace("&lt;", "<")
                                   .replace("&gt;", ">"))
    texts = [t for t, _ in paras]
    joined = "\n".join(texts)
    # templates, tables, refs, categories, interlang, file links gone
    assert "Infobox" not in joined
    assert "wikitable" not in joined and "ignored" not in joined
    assert "cite" not in joined
    assert "Category" not in joined and "Anthologie" not in joined
    assert "Cover.jpg" not in joined
    # headings dropped, list marker stripped, external label kept
    assert "Background" not in joined
    assert any(t.startswith("Tracks are short") for t in texts)
    assert "the site" in joined and "example.com" not in joined
    # anchors survive the cleanup with correct spans
    text0, anchors0 = paras[0]
    for title, s, e in anchors0:
        assert text0[s:e]
    assert {"Compilation album", "Bic Runga"} <= {
        t for p in paras for t, _, _ in p[1]}


def test_nested_strip_and_title_norm():
    assert wikitext_to_paragraphs(
        "{{a|{{b}}|c}}Plain text stays here.")[0][0] == \
        "Plain text stays here."
    assert normalize_title("compilation_album#Section") == \
        "Compilation album"


# -- redirects -----------------------------------------------------------------

def test_redirects(dump_file):
    p, _ = dump_file
    red = build_redirects(p)
    assert red == {"Comp album": "Compilation album"}
    assert resolve_redirect("Comp album", red) == "Compilation album"
    assert resolve_redirect("Nope", red) == "Nope"
    # cycles terminate
    assert resolve_redirect("A", {"A": "B", "B": "A"}) in ("A", "B")


# -- full pipeline -------------------------------------------------------------

def test_dump_to_jsonl_schema(dump_file, tmp_path):
    p, _ = dump_file
    out = tmp_path / "en.jsonl"
    n = dump_to_jsonl(p, out, lang="en")
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == n > 3
    assert set(recs[0]) == {"title", "p_id", "s_id", "sentence",
                            "paragraph", "url"}
    # redirect pages and non-main namespaces are excluded
    titles = {r["title"] for r in recs}
    assert "Comp album" not in titles and "Talk:Ignored" not in titles
    # anchors re-inserted as <e:Title> markup in the paragraph
    anth = [r for r in recs if r["title"].startswith("Anthology")]
    assert any("<e:Compilation album>" in r["paragraph"] for r in anth)
    assert all(r["url"].startswith("https://en.wikipedia.org/wiki/")
               for r in recs)


def test_jsonl_feeds_kb_build(dump_file, tmp_path):
    """The emitted JSONL is directly consumable by the KB builder and
    retrieval returns the expected page for an on-topic query."""
    from kbner_tpu.retrieval import RetrievalEngine
    from kbner_tpu.retrieval.pipeline import build_kb_from_jsonl

    p, _ = dump_file
    out = tmp_path / "en.jsonl"
    dump_to_jsonl(p, out, lang="en")
    text_idx, store, title_idx = build_kb_from_jsonl(out, lang="en")
    eng = RetrievalEngine(text_idx, store=store, title_index=title_idx,
                          use_pallas=False)
    docs = eng.search(["anthology compilation album bic runga"], k=3)[0]
    assert docs and "Anthology" in docs[0].title or any(
        "Anthology" in d.title for d in docs)


def test_cli_ingest_dump(dump_file, tmp_path):
    from kbner_tpu import cli

    p, _ = dump_file
    out = tmp_path / "cli.jsonl"
    cli.main(["ingest-dump", "--dump", str(p), "--out", str(out),
              "--lang", "en"])
    assert out.exists() and out.read_text().count("\n") > 3
