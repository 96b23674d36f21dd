"""Unit tests of the pinned HTML extraction semantics (hand-computed
expectations — mirrors the reference's element-semantics unit tests,
tests/services/test_docling_service_comprehensive.py:720-786, but against
real bytes instead of mocks)."""

from __future__ import annotations

import pytest

from pdf_document_extractor_spark.core.dispatch import extract_document, url_hash
from pdf_document_extractor_spark.core.html_extract import extract_html
from pdf_document_extractor_spark.core.taxonomy import (
    EmptyContentError,
    UnsupportedFormatError,
)


def test_boilerplate_stripped_article_kept():
    html = (
        b"<html><head><title>T</title><style>x{}</style></head><body>"
        b"<nav><a href='/'>home</a> <a href='/a'>about</a></nav>"
        b"<header><h1>banner</h1></header>"
        b"<article><p>alpha beta gamma</p><p>delta epsilon</p></article>"
        b"<footer>copyright</footer></body></html>"
    )
    r = extract_document("u", html)
    page = r.pages[0]
    assert page.content == "alpha beta gamma\ndelta epsilon"
    assert page.word_count == 5
    assert [e.label for e in page.elements] == ["block", "block"]
    # exact char spans into content
    assert (page.elements[0].char_start, page.elements[0].char_end) == (0, 16)
    assert (page.elements[1].char_start, page.elements[1].char_end) == (17, 30)
    assert page.content[17:30] == "delta epsilon"


def test_linkfarm_block_rejected_by_link_density():
    html = (
        b"<html><body>"
        b"<div><a href='/1'>one two three four</a> x</div>"  # ~90% anchor
        b"<p>real content stays here</p>"
        b"</body></html>"
    )
    r = extract_document("u", html)
    assert r.pages[0].content == "real content stays here"


def test_half_link_block_kept_at_boundary():
    # link density exactly <= 0.5 is kept (pinned rule 5)
    html = b"<html><body><p><a href='/x'>abcde</a> abcde</p></body></html>"
    r = extract_document("u", html)
    # text "abcde abcde" = 11 chars, link chars = 5 -> density 5/11 < 0.5
    assert r.pages[0].content == "abcde abcde"


def test_whitespace_normalization():
    html = b"<html><body><p>  a \t b\n\nc  </p></body></html>"
    r = extract_document("u", html)
    assert r.pages[0].content == "a b c"
    assert r.pages[0].word_count == 3


def test_empty_body_is_hard_failure():
    with pytest.raises(EmptyContentError):
        extract_html(b"<html><body></body></html>", "h")
    r = extract_document("u", b"<html><body></body></html>")
    assert r.status == "hard_failure"
    assert r.error_type == "EmptyContentError"


def test_zero_length_payload_is_hard_failure():
    r = extract_document("u", b"")
    assert r.status == "hard_failure"


def test_bad_bytes_decode_replace_is_deterministic():
    html = b"<html><body><p>ok \xff\xfe tail</p></body></html>"
    r1 = extract_document("u", html)
    r2 = extract_document("u", html)
    assert r1.pages[0].content == r2.pages[0].content
    assert "ok" in r1.pages[0].content and "tail" in r1.pages[0].content


def test_binary_junk_is_hard_failure():
    r = extract_document("u", bytes(range(256)) * 4)
    assert r.status == "hard_failure"
    assert r.error_type == "UnsupportedFormatError"


def test_nested_blocks_flush_correctly():
    html = (
        b"<html><body><div>outer before"
        b"<p>inner paragraph</p>outer after</div></body></html>"
    )
    r = extract_document("u", html)
    assert r.pages[0].content == "outer before\ninner paragraph\nouter after"


def test_html_table_extracted_not_in_content():
    html = (
        b"<html><body><p>before table</p>"
        b"<table><tr><th>h1</th><th>h2</th></tr>"
        b"<tr><td>a</td><td>b</td></tr></table>"
        b"<p>after table</p></body></html>"
    )
    r = extract_document("https://x/t", html)
    page = r.pages[0]
    assert page.content == "before table\nafter table"
    assert len(page.tables) == 1
    t = page.tables[0]
    assert t.headers == ("h1", "h2")
    assert t.num_rows == 2 and t.num_cols == 2 and t.cell_count == 4
    assert t.csv == "h1,h2\na,b\n"
    assert t.table_id == f"{url_hash('https://x/t')}_table_0"


def test_figures_from_img_alt():
    html = (
        b"<html><body><p>text body here</p>"
        b"<img src='x.png' alt='a chart'><img src='y.png'></body></html>"
    )
    r = extract_document("https://x/f", html)
    figs = r.pages[0].figures
    assert len(figs) == 2
    # <img alt> is ALT TEXT (reference FigureMetadata.alt_text); caption
    # is reserved for a figcaption construct
    assert figs[0].alt_text == "a chart" and figs[1].alt_text is None
    assert figs[0].caption is None and figs[1].caption is None
    assert figs[0].figure_id == f"{url_hash('https://x/f')}_figure_0"
    assert figs[0].label == "picture"


def test_figcaption_and_table_caption_and_merged_cells():
    html = (
        b"<html><body><p>body text</p>"
        b"<figure><img src='x.png' alt='alt a'>"
        b"<figcaption>fig cap</figcaption></figure>"
        b"<img src='y.png' alt='alt b'>"
        b"<table><caption>tbl cap</caption>"
        b"<tr><th colspan='2'>h</th></tr><tr><td>a</td><td>b</td></tr>"
        b"</table>"
        b"<table><tr><td>plain</td></tr></table>"
        b"</body></html>"
    )
    r = extract_document("https://x/fc", html)
    page = r.pages[0]
    figs = page.figures
    assert figs[0].caption == "fig cap" and figs[0].alt_text == "alt a"
    assert figs[1].caption is None and figs[1].alt_text == "alt b"
    # figcaption text is visible page text: it stays in content
    assert page.content == "body text\nfig cap"
    t0, t1 = page.tables
    assert t0.caption == "tbl cap" and t0.has_merged_cells
    assert t1.caption is None and not t1.has_merged_cells
    # caption text never leaks into cells
    assert t0.headers == ("h",) and t0.cell_count == 3


def test_entity_decoding():
    html = b"<html><body><p>a &amp; b &lt;c&gt;</p></body></html>"
    r = extract_document("u", html)
    assert r.pages[0].content == "a & b <c>"


def test_anchor_inside_kept_block_counts_link_chars_only():
    # mostly-text block with a small link is kept
    html = (
        b"<html><body><p>plenty of regular words here with "
        b"<a href='/l'>one link</a> embedded</p></body></html>"
    )
    r = extract_document("u", html)
    assert "one link" in r.pages[0].content


def test_unclosed_anchor_does_not_poison_following_blocks():
    """An unclosed <a> (ubiquitous crawl HTML) must not mark every later
    block as link text: anchor depth resets at block boundaries."""
    html = (
        b"<html><body><p><a href='/x'>home</p>"
        b"<p>this is the real article body text that must survive</p>"
        b"</body></html>"
    )
    r = extract_document("u", html)
    assert r.status == "success"
    assert "real article body" in r.pages[0].content


# --------------------------------------------------------------------------
# Charset detection (pinned rule 1: BOM > meta charset > utf-8 replace)
# --------------------------------------------------------------------------


def test_charset_meta_windows1252():
    html = (
        '<html><head><meta charset="windows-1252"></head>'
        "<body><p>café crème</p></body></html>"
    ).encode("cp1252")
    r = extract_document("u", html)
    assert r.pages[0].content == "café crème"


def test_charset_http_equiv_gbk():
    html = (
        '<html><head><meta http-equiv="Content-Type" '
        'content="text/html; charset=gbk"></head>'
        "<body><p>中文 content here</p></body></html>"
    ).encode("gbk")
    r = extract_document("u", html)
    assert r.pages[0].content == "中文 content here"


def test_charset_utf16_bom():
    html = "<html><body><p>utf sixteen page body</p></body></html>"
    import codecs as _codecs

    for bom, enc in ((_codecs.BOM_UTF16_LE, "utf-16-le"),
                     (_codecs.BOM_UTF16_BE, "utf-16-be")):
        r = extract_document("u", bom + html.encode(enc))
        assert r.pages[0].content == "utf sixteen page body", enc


def test_charset_utf8_bom_stripped():
    html = b"\xef\xbb\xbf<html><body><p>bom page</p></body></html>"
    r = extract_document("u", html)
    assert r.pages[0].content == "bom page"


def test_charset_unknown_label_falls_back_to_utf8():
    html = (
        b'<html><head><meta charset="no-such-enc"></head>'
        b"<body><p>plain ascii body</p></body></html>"
    )
    r = extract_document("u", html)
    assert r.pages[0].content == "plain ascii body"


def test_charset_absent_still_utf8_replace():
    # invalid utf-8 byte -> U+FFFD, exactly the pre-sniff behavior
    html = b"<html><body><p>bad \xff byte</p></body></html>"
    r = extract_document("u", html)
    assert r.pages[0].content == "bad � byte"


# --------------------------------------------------------------------------
# Fast-scanner differential guarantee: wherever the fast path engages it
# must be EVENT-IDENTICAL to html.parser; everything else falls back.
# --------------------------------------------------------------------------


def _both_paths(text):
    from pdf_document_extractor_spark.core.html_extract import (
        _BlockCollector,
        _collect,
        _fast_events,
        _FallBack,
    )

    try:
        _fast_events(text)
    except _FallBack:
        return None  # fell back: nothing to compare
    fast = _collect(text)
    ref = _BlockCollector()
    ref.feed(text)
    ref.close()
    return fast, ref


def _state(c):
    return (c.blocks, c.tables_raw, c.figures_raw)


def test_fast_scanner_differential_handcases():
    cases = [
        "<html><body><p>plain</p></body></html>",
        "<HTML><BODY><P>upper tags</P></BODY></HTML>",
        "<body><p>self closing<br/>here</p><img src='/x' alt='cap'/></body>",
        "<body><p>bare attr <img alt></p></body>",
        "<body><table><tr><th>h1</th><th>h2</th></tr>"
        "<tr><td>a</td><td>b</td></tr></table><p>after</p></body>",
        "<body><p><a href='/x'>link text</a> plus body words here</p></body>",
        "<body><p>unclosed <a href='/y'>anchor</p><p>next block</p></body>",
        "<body><div><ul><li>one</li><li>two</li></ul></div></body>",
        "text before any tag <p>then a block</p> text after",
        "<body><p>whitespace   runs\t\tand\nnewlines</p></body>",
        "<body><img src='/a.png' alt='fig one'><img src='/b.png'></body>",
        "<p>nested <span>inline <b>bold</b></span> tail</p>",
        "<p id='x' class=\"y\" data-z>attr soup</p>",
        "<body><figure><img src='/a' alt='fa'>"
        "<figcaption>cap text</figcaption></figure></body>",
        "<body><table><caption>tc</caption><tr><th colspan='2'>h</th></tr>"
        "<tr><td>a</td><td rowspan=\"3\">b</td></tr></table></body>",
        "<body><table><tr><td colspan='x'>bad span</td></tr></table></body>",
        # unquoted attr value swallowing a trailing '/' (html.parser
        # semantics): colspan becomes '2/', NOT a self-closed cell
        "<body><table><tr><td colspan=2/>a</td><td>b</td></tr>"
        "<tr><td>c</td><td>d</td></tr></table></body>",
        "<body><p>self close<br/>unquoted <img src=/a.png alt=x></p></body>",
    ]
    for text in cases:
        res = _both_paths(text)
        assert res is not None, f"expected fast path to engage: {text!r}"
        fast, ref = res
        assert _state(fast) == _state(ref), text


def test_fast_scanner_fallback_cases():
    from pdf_document_extractor_spark.core.html_extract import (
        _FallBack,
        _fast_events,
    )
    import pytest as _pytest

    for text in [
        "<p>a &amp; b</p>",            # charref
        "<!DOCTYPE html><p>x</p>",      # markup declaration
        "<!-- comment --><p>x</p>",     # comment
        "<script>var a = 1 < 2;</script><p>x</p>",  # CDATA element
        "<p>3 < 4 bare less-than</p>",  # bare '<'
        "<p>trailing unterminated <div",
        "<p foo='a>b'>quoted angle soup</p>",
        "</p extra>end tag with attrs",
    ]:
        with _pytest.raises(_FallBack):
            _fast_events(text)


def test_fast_scanner_differential_fuzz():
    """Random tag soup: wherever the fast path accepts, its collector state
    must equal html.parser's, fragment for fragment."""
    import random

    rng = random.Random(42)
    tags = ["p", "div", "a", "b", "img", "li", "ul", "table", "tr", "td",
            "nav", "article", "footer", "br", "span", "h1"]
    words = ["alpha", "bravo", "link", "text", "words", "x<y", "z&w", "50%"]

    def gen():
        parts = []
        for _ in range(rng.randint(1, 30)):
            r = rng.random()
            t = rng.choice(tags)
            if r < 0.35:
                attr = rng.choice(
                    ["", " href='/x'", ' alt="cap"', " alt", " class=c",
                     # round-4 semantic attrs + unquoted-value edge soup
                     " colspan=2", " colspan='2'", " rowspan=3", " colspan=2/",
                     " colspan=x", " src=/a.png", " colspan", ' rowspan=""']
                )
                parts.append(f"<{t}{attr}{'/' if rng.random() < 0.2 else ''}>")
            elif r < 0.6:
                parts.append(f"</{t}>")
            else:
                parts.append(" ".join(
                    rng.choice(words) for _ in range(rng.randint(1, 5))
                ))
        return "".join(parts)

    engaged = 0
    for _ in range(400):
        text = gen()
        res = _both_paths(text)
        if res is None:
            continue
        engaged += 1
        fast, ref = res
        assert _state(fast) == _state(ref), text
    assert engaged >= 40  # the fuzz must actually exercise the fast path


def test_charset_utf16_meta_label_is_ignored():
    """WHATWG prescan: a readable utf-16 meta label proves the page is NOT
    utf-16 — honoring it would decode ASCII byte-pairs as CJK garbage."""
    for label in ("utf-16", "UTF-16LE", "utf_16be"):
        html = (
            f'<html><head><meta charset="{label}"></head>'
            "<body><p>ascii body text</p></body></html>"
        ).encode("ascii")
        r = extract_document("u", html)
        assert r.pages[0].content == "ascii body text", label


def test_fast_scanner_differential_hypothesis():
    """Property form of the differential guarantee with shrinking: any
    composition of fragments the scanner accepts must produce collector
    state identical to html.parser's."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    fragment = st.one_of(
        st.sampled_from(
            [
                "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
                "<img alt='c'/>", "<img alt>", "<br/>", "<br>", "<table>",
                "</table>", "<tr>", "</tr>", "<td>", "</td>", "<nav>",
                "</nav>", "<P CLASS=u>", "</P >", "<span id='s' data-x>",
                "</span>", "<li>", "</li>", "<hr/>",
                # fallback-forcing fragments (must not crash either path)
                "&amp;", "<!--c-->", "<script>x</script>", "< p>", "<",
                "<p foo='a>b'>", "</p junk>", "<?pi?>",
            ]
        ),
        st.text(
            alphabet="abc XY.;-_09\t\n%'\"=/", min_size=0, max_size=12
        ),
    )

    @settings(max_examples=300, deadline=None, derandomize=True,
              database=None)
    @given(st.lists(fragment, min_size=1, max_size=25))
    def check(parts):
        text = "".join(parts)
        res = _both_paths(text)
        if res is not None:
            fast, ref = res
            assert _state(fast) == _state(ref), text

    check()


def test_nested_figure_captions_stay_scoped():
    """A nested <figure>'s figcaption must caption ONLY its own images —
    never leak onto the outer figure's images (round-4 review finding).
    Multiple figcaptions in one figure: first wins (same rule as table
    <caption>)."""
    html = (
        b"<html><body><p>text body</p>"
        b"<figure><img src='a' alt='outer-img'>"
        b"<figure><img src='b' alt='inner-img'>"
        b"<figcaption>inner cap</figcaption></figure>"
        b"</figure>"
        b"<figure><img src='c' alt='two-caps'>"
        b"<figcaption>first</figcaption><figcaption>second</figcaption>"
        b"</figure>"
        b"</body></html>"
    )
    r = extract_document("https://x/nf", html)
    figs = r.pages[0].figures
    assert [(f.alt_text, f.caption) for f in figs] == [
        ("outer-img", None),
        ("inner-img", "inner cap"),
        ("two-caps", "first"),
    ]


def test_figure_opening_inside_figcaption_keeps_outer_caption():
    """figcaption allows flow content: a figure opening INSIDE an open
    figcaption must not steal the caption text collected so far — it
    belongs to the outer figure (round-4 second-review finding)."""
    html = (
        b"<html><body><p>body</p>"
        b"<figure><img src='a' alt='x'>"
        b"<figcaption>Cap<figure><img src='b' alt='y'></figure>"
        b"</figcaption></figure>"
        b"</body></html>"
    )
    r = extract_document("https://x/ff", html)
    figs = r.pages[0].figures
    assert [(f.alt_text, f.caption) for f in figs] == [
        ("x", "Cap"),
        ("y", None),
    ]
