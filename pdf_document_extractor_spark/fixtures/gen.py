"""Seeded deterministic fixture-corpus generator (FIXTURES.md §2).

Generates the `pages` input table rows (url, warc_ts, html, text, lang) for
every document class in FIXTURES.md: html_simple, html_linkfarm,
html_minimal, html_empty, html_badbytes, pdf_onepage, pdf_multipage,
pdf_table, pdf_corrupt, oversize, unknown_magic. SEED is fixed; ids derive
from the url — never uuid4 or wall-clock (determinism policy).

The scale corpus draws the same classes with Zipf-like host skew (top host
~20% of rows) to exercise salting, at any target row count.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass

from ..core.pdf_write import (
    PdfPageSpec,
    TextShow,
    simple_doc,
    table_grid,
    write_pdf,
)

SEED = 42
EPOCH = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

_VOCAB = (
    "the quick brown fox jumps over lazy dog spark query scan filter join "
    "group sort merge shuffle page table row column data web crawl text "
    "extract content main article boiler plate density link host bucket "
    "salt heavy light commit snapshot resume lineage batch arrow vector"
).split()

_HOSTS = [
    "hot.example.com",  # the skewed host
    "news.example.org",
    "blog.example.net",
    "docs.example.io",
    "shop.example.co",
    "wiki.example.edu",
    "forum.example.dev",
    "mail.example.app",
]

HEAVY_BYTES_TEST = 64 * 1024  # oversize-class padding target for tests


@dataclass
class FixtureDoc:
    url: str
    warc_ts: dt.datetime
    html: bytes  # raw payload (pdf or html — dispatch is by magic bytes)
    text: str
    lang: str
    doc_class: str


def _words(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_VOCAB) for _ in range(n))


def _sentence(rng: random.Random) -> str:
    return _words(rng, rng.randint(5, 14))


def _html_simple(rng: random.Random) -> bytes:
    paras = [f"<p>{_sentence(rng)}</p>" for _ in range(rng.randint(5, 20))]
    return (
        "<html><head><title>fixture</title><style>p{color:red}</style></head>"
        "<body><nav><a href='/'>home</a> <a href='/a'>about</a> "
        "<a href='/c'>contact</a></nav>"
        "<header><h1>site banner</h1></header>"
        f"<article>{''.join(paras)}</article>"
        "<footer><a href='/tos'>terms</a> all rights reserved</footer>"
        "</body></html>"
    ).encode("utf-8")


def _html_linkfarm(rng: random.Random) -> bytes:
    main = f"<article><p>{_sentence(rng)}</p><p>{_sentence(rng)}</p></article>"
    links = " ".join(
        f"<a href='/{i}'>{_words(rng, 3)}</a>" for i in range(12)
    )
    sidebar = f"<div class='side'><p>{links} ad</p></div>"
    return (
        f"<html><body>{sidebar}{main}{sidebar}</body></html>"
    ).encode("utf-8")


def _html_minimal(rng: random.Random) -> bytes:
    return f"<p>{_sentence(rng)}</p><p>{_sentence(rng)}</p>".encode("utf-8")


def _html_empty(variant: int) -> bytes:
    return b"<html><body></body></html>" if variant == 0 else b""


def _html_badbytes(rng: random.Random) -> bytes:
    good = _sentence(rng)
    return (
        b"<html><body><p>" + good.encode() + b" \xff\xfe\x80 tail</p></body></html>"
    )


def _pdf_onepage(rng: random.Random, compress: bool) -> bytes:
    header = _words(rng, rng.randint(2, 5))
    body = [_sentence(rng) for _ in range(rng.randint(3, 8))]
    return simple_doc([(header, body)], compress=compress)


def _pdf_multipage(rng: random.Random) -> bytes:
    n = rng.randint(3, 5)
    pages = [
        (_words(rng, 3), [_sentence(rng) for _ in range(rng.randint(2, 6))])
        for _ in range(n)
    ]
    return simple_doc(pages, compress=rng.random() < 0.5)


def _pdf_table(rng: random.Random) -> bytes:
    header_row = ["name", "count", "ratio", "note"]
    rows = [header_row] + [
        [_words(rng, 1), str(rng.randint(0, 99)), f"0.{rng.randint(10,99)}",
         _words(rng, 1)]
        for _ in range(3)
    ]
    shows = [TextShow(72.0, 720.0, 18.0, _words(rng, 3))]
    shows += [TextShow(72.0, 700.0, 10.0, _sentence(rng))]
    shows += table_grid(rows, y0=640.0)
    return write_pdf([PdfPageSpec(shows=shows)])


def _pdf_corrupt(rng: random.Random, variant: int) -> bytes:
    good = _pdf_onepage(rng, compress=False)
    if variant == 0:
        return good[: len(good) // 2]  # truncated xref
    return b"%PDF-1.4\n" + bytes(rng.getrandbits(8) for _ in range(200))


def _oversize(rng: random.Random, variant: int) -> bytes:
    if variant == 0:  # big HTML: real content + padding comment
        body = _html_simple(rng)
        pad = b"<!--" + b"x" * HEAVY_BYTES_TEST + b"-->"
        return body.replace(b"</body>", pad + b"</body>")
    # big PDF: many body lines
    lines = [_sentence(rng) for _ in range(2000)]
    return simple_doc([("big document", lines)], compress=False)


def _unknown_magic(rng: random.Random) -> bytes:
    return bytes(rng.getrandbits(8) for _ in range(512))


def gen_unit_corpus() -> list[FixtureDoc]:
    """The 36-document unit corpus of FIXTURES.md §2, fully seeded."""
    rng = random.Random(SEED)
    docs: list[FixtureDoc] = []
    counter = 0

    def add(doc_class: str, payload: bytes, lang: str = "en") -> None:
        nonlocal counter
        host = _HOSTS[counter % len(_HOSTS)]
        url = f"https://{host}/{doc_class}-{counter}"
        docs.append(
            FixtureDoc(
                url=url,
                warc_ts=EPOCH + dt.timedelta(seconds=counter),
                html=payload,
                text="",
                lang=lang,
                doc_class=doc_class,
            )
        )
        counter += 1

    for _ in range(8):
        add("html_simple", _html_simple(rng))
    for _ in range(4):
        add("html_linkfarm", _html_linkfarm(rng))
    for i in range(2):
        add("html_minimal", _html_minimal(rng), lang="de" if i else "en")
    for i in range(2):
        add("html_empty", _html_empty(i))
    for _ in range(2):
        add("html_badbytes", _html_badbytes(rng))
    for i in range(6):
        add("pdf_onepage", _pdf_onepage(rng, compress=i % 2 == 1))
    for _ in range(4):
        add("pdf_multipage", _pdf_multipage(rng))
    for _ in range(3):
        add("pdf_table", _pdf_table(rng))
    for i in range(2):
        add("pdf_corrupt", _pdf_corrupt(rng, i))
    for i in range(2):
        add("oversize", _oversize(rng, i))
    add("unknown_magic", _unknown_magic(rng))
    assert len(docs) == 36
    return docs


_SCALE_CLASSES = (
    # (class, weight, generator-lambda name) — corrupt/junk kept rare
    ("html_simple", 55),
    ("html_linkfarm", 10),
    ("html_minimal", 5),
    ("pdf_onepage", 18),
    ("pdf_multipage", 6),
    ("pdf_table", 3),
    ("pdf_corrupt", 2),
    ("unknown_magic", 1),
)


def gen_scale_corpus(n_rows: int, seed: int = SEED) -> list[FixtureDoc]:
    """Scale corpus with hot-host skew: top host ~20% of rows (FIXTURES.md);
    used by pipeline tests and the bench harness."""
    rng = random.Random(seed)
    classes, weights = zip(*_SCALE_CLASSES)
    docs: list[FixtureDoc] = []
    for i in range(n_rows):
        doc_class = rng.choices(classes, weights=weights, k=1)[0]
        if doc_class == "html_simple":
            payload = _html_simple(rng)
        elif doc_class == "html_linkfarm":
            payload = _html_linkfarm(rng)
        elif doc_class == "html_minimal":
            payload = _html_minimal(rng)
        elif doc_class == "pdf_onepage":
            payload = _pdf_onepage(rng, compress=rng.random() < 0.5)
        elif doc_class == "pdf_multipage":
            payload = _pdf_multipage(rng)
        elif doc_class == "pdf_table":
            payload = _pdf_table(rng)
        elif doc_class == "pdf_corrupt":
            payload = _pdf_corrupt(rng, rng.randint(0, 1))
        else:
            payload = _unknown_magic(rng)
        # Zipf-ish host skew: ~20% on the hot host.
        host = _HOSTS[0] if rng.random() < 0.20 else rng.choice(_HOSTS[1:])
        docs.append(
            FixtureDoc(
                url=f"https://{host}/{doc_class}-{i}",
                warc_ts=EPOCH + dt.timedelta(seconds=i),
                html=payload,
                text="",
                lang=rng.choice(["en", "en", "en", "de"]),
                doc_class=doc_class,
            )
        )
    return docs
