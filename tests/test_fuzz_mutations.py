"""Seeded byte-level mutation fuzz of the container parsers (round-4
verdict task 4).

Round-4 fuzz covered attr-soup differentials and the dispatch routers;
this module mutates VALID container fixtures (PDF classic / PDF
xref-stream / RC4-encrypted PDF / CID-ToUnicode PDF / OLE2 doc /
OLE2 xls / zip docx / zip epub) at the byte level — flips, deletes, inserts, splices, truncations,
chunk swaps — with a deterministic seeded generator.

Invariants per mutation (no-crash / no-silent-wrong):

1. TOTAL: extraction returns rows (success or typed hard failure) —
   never an unhandled exception. Hard-failure rows carry an error_type.
2. DETERMINISTIC: extracting the same mutated bytes twice produces
   identical rows.
3. NO SILENT WRONG on identical bytes: a mutation that lands as a no-op
   (mutated bytes == original bytes) must reproduce the unmutated
   oracle rows exactly — a parser keying on anything but the bytes
   (caches, shared state) would diverge here. The per-credential
   decryptor cache and parser worker state are exercised across
   thousands of near-identical documents in one process.
4. COHERENT success rows: content is a str, word_count matches the
   pinned str.split() semantics, status/error fields are consistent.

19,968 mutations total (13 fixtures x 1536 seeds), each checked twice
(determinism), in a few seconds of pure-Python wall time.
"""

from __future__ import annotations

import random
import zlib

from pdf_document_extractor_spark.core.model import (
    STATUS_HARD_FAILURE,
    STATUS_SUCCESS,
    word_count,
)
from pdf_document_extractor_spark.operators.extract import extract_rows_py

ALLOWED = {STATUS_SUCCESS, STATUS_HARD_FAILURE}
# the closed failure taxonomy MINUS InternalError: classify_error maps
# unknown exception classes to InternalError (closed-set discipline for
# the at-scale failure manifest), so an InternalError row in this fuzz
# IS an unclassified-exception escape and fails the test (this check
# caught a live ValueError from float('F1') on corrupted content-stream
# operands the day it landed)
TYPED = {
    "CorruptedFileError",
    "UnsupportedFormatError",
    "EmptyContentError",
    "ValidationError",
    "OversizeDocumentError",
    "ScannedPdfNoTextError",
}
SEEDS_PER_FIXTURE = 1536


def _fixtures() -> dict[str, bytes]:
    from pdf_document_extractor_spark.core.docx_write import write_docx
    from pdf_document_extractor_spark.core.ole_write import (
        write_doc,
        write_xls,
    )
    from pdf_document_extractor_spark.core.pdf_write import (
        PdfPageSpec,
        TextShow,
        write_pdf,
        write_pdf_15,
        write_pdf_cid,
        write_pdf_rc4,
    )
    from pdf_document_extractor_spark.fixtures.foreign import (
        foreign_pdf_ghostscript,
    )
    from pdf_document_extractor_spark.sources.pages import synth_payload

    spec = [
        PdfPageSpec(
            shows=[
                TextShow(72.0, 720.0, 18.0, "header line"),
                TextShow(72.0, 692.0, 10.0, "body text one"),
            ]
        )
    ]
    return {
        "pdf_classic": write_pdf(spec),
        "pdf_xrefstream": write_pdf_15(spec),
        "pdf_rc4": write_pdf_rc4(spec),
        # CID/ToUnicode CMap parser + its round-5 worker-global cache:
        # near-identical mutated CMaps stress the cache's byte-exact
        # keying (a sloppy key would surface as the no-op divergence or
        # nondeterminism failures below)
        "pdf_cid": write_pdf_cid(spec),
        # the round-5 foreign Ghostscript dialect: content-first object
        # order, octal literals, CRLF xref rows — a different byte
        # surface than our own writer
        "pdf_foreign_gs": foreign_pdf_ghostscript(
            "alpha bravo charlie delta echo foxtrot golf hotel india x"
        ),
        "ole_doc": write_doc(["first paragraph", "second paragraph"]),
        "ole_xls": write_xls([("Sheet1", [["k", "v"], ["lang", "en"]])]),
        "zip_docx": write_docx(["alpha paragraph", "beta paragraph"]),
        "zip_epub": synth_payload(
            7, "alpha bravo charlie delta echo foxtrot golf hotel india x",
            "epub",
        ),
        "rtf": synth_payload(
            7, "alpha bravo charlie delta echo foxtrot golf hotel india x",
            "rtf",
        ),
        "zip_odt": synth_payload(
            7, "alpha bravo charlie delta echo foxtrot golf hotel india x",
            "odt",
        ),
        # the two highest-volume crawl paths: full-feature HTML (tables
        # + figures + charset meta) and the gzip transport unwrap
        "html_rich": synth_payload(
            3, "alpha bravo charlie delta echo foxtrot golf hotel india x",
            "html_table",
        ),
        "gzip_html": synth_payload(
            7, "alpha bravo charlie delta echo foxtrot golf hotel india x",
            "gzip_html",
        ),
    }


def _mutate(data: bytes, seed: int) -> bytes:
    """One deterministic byte-level mutation. Mutation kind and site are
    drawn from the seed; kinds cover the corruption classes crawls and
    truncated transfers actually produce."""
    rng = random.Random(seed)
    buf = bytearray(data)
    kind = rng.randrange(7)
    if not buf:
        return bytes(buf)
    if kind == 0:  # single byte flip
        i = rng.randrange(len(buf))
        buf[i] ^= 1 << rng.randrange(8)
    elif kind == 1:  # byte delete
        del buf[rng.randrange(len(buf))]
    elif kind == 2:  # byte insert
        buf.insert(rng.randrange(len(buf) + 1), rng.randrange(256))
    elif kind == 3:  # splice 2-16 random bytes over a region
        n = rng.randrange(2, 17)
        i = rng.randrange(len(buf))
        buf[i : i + n] = bytes(rng.randrange(256) for _ in range(n))
    elif kind == 4:  # truncate tail
        buf = buf[: rng.randrange(len(buf))]
    elif kind == 5:  # duplicate a chunk in place
        n = rng.randrange(1, 65)
        i = rng.randrange(len(buf))
        buf[i:i] = buf[i : i + n]
    else:  # swap two chunks
        n = rng.randrange(1, 33)
        i = rng.randrange(len(buf))
        j = rng.randrange(len(buf))
        a, b = buf[i : i + n], buf[j : j + n]
        buf[i : i + n], buf[j : j + n] = b, a
    return bytes(buf)


def _canon(rows: list[dict]) -> list[dict]:
    return [{k: v for k, v in r.items() if k != "partition_id"} for r in rows]


def test_seeded_mutations_no_crash_no_silent_wrong():
    fixtures = _fixtures()
    total = 0
    failures: list[str] = []
    for name, base in fixtures.items():
        url = f"https://fuzz.example/{name}"
        baseline = _canon(extract_rows_py(url, base))
        name_salt = zlib.crc32(name.encode())  # stable across processes
        for seed in range(SEEDS_PER_FIXTURE):
            mutated = _mutate(base, seed * 7919 + name_salt)
            total += 1
            try:
                rows = _canon(extract_rows_py(url, mutated))
            except Exception as exc:  # noqa: BLE001 — the invariant
                failures.append(f"{name}/seed{seed}: raised {exc!r}")
                if len(failures) > 5:
                    break
                continue
            # determinism on identical bytes
            rows2 = _canon(extract_rows_py(url, mutated))
            if rows != rows2:
                failures.append(f"{name}/seed{seed}: nondeterministic rows")
            # no-op mutation must reproduce the oracle exactly
            if mutated == base and rows != baseline:
                failures.append(f"{name}/seed{seed}: no-op bytes diverged")
            for r in rows:
                if r["status"] not in ALLOWED:
                    failures.append(f"{name}/seed{seed}: status {r['status']}")
                elif (
                    r["status"] == STATUS_HARD_FAILURE
                    and r["error_type"] not in TYPED
                ):
                    failures.append(
                        f"{name}/seed{seed}: untyped failure "
                        f"{r['error_type']!r}"
                    )
                elif r["status"] == STATUS_SUCCESS:
                    if not isinstance(r["content"], str):
                        failures.append(f"{name}/seed{seed}: non-str content")
                    elif r["word_count"] != word_count(r["content"]):
                        failures.append(
                            f"{name}/seed{seed}: word_count mismatch"
                        )
            if len(failures) > 5:
                break
    assert not failures, f"{len(failures)}+ of {total} mutations: {failures[:6]}"
    assert total >= 10_000, f"only {total} mutations exercised"


def test_png_codec_mutations_fail_typed():
    """The round-5 stdlib PNG codec gets the same discipline: 2,000
    seeded mutations of a valid RGB PNG must decode or raise a TYPED
    error (corrupt/unsupported/oversize) — never ValueError/struct.error
    /zlib.error escapes, and no output larger than the declared dims."""
    from pdf_document_extractor_spark.core.png_codec import (
        png_decode,
        png_encode,
    )
    from pdf_document_extractor_spark.core.taxonomy import (
        CorruptedFileError,
        OversizeDocumentError,
        UnsupportedFormatError,
    )

    rng = random.Random(23)
    raw = bytes(rng.randrange(256) for _ in range(24 * 16 * 3))
    base = png_encode(raw, 24, 16, 3)
    typed = (CorruptedFileError, UnsupportedFormatError, OversizeDocumentError)
    for seed in range(2000):
        mutated = _mutate(base, seed * 104729 + 7)
        try:
            out, w, h, c = png_decode(mutated)
        except typed:
            continue
        assert len(out) == w * h * c
        if mutated == base:
            assert (out, w, h, c) == (raw, 24, 16, 3)


def test_stacked_mutations_no_crash():
    """Compound damage: three sequential mutations per document reach
    states single mutations cannot (a 207k-doc round-5 soak of both
    shapes ran clean after four fixes). CI keeps a 13k-doc stacked leg."""
    fixtures = _fixtures()
    failures: list[str] = []
    for name, base in fixtures.items():
        name_salt = zlib.crc32(name.encode())
        for seed in range(1000):
            m = base
            for j in range(3):
                m = _mutate(m, (seed * 3 + j) * 6101 + name_salt)
            try:
                rows = _canon(extract_rows_py("u", m))
            except Exception as exc:  # noqa: BLE001 — the invariant
                failures.append(f"{name}/seed{seed}: raised {exc!r}")
                break
            for r in rows:
                if r["status"] == STATUS_HARD_FAILURE and (
                    r["error_type"] not in TYPED
                ):
                    failures.append(
                        f"{name}/seed{seed}: untyped {r['error_type']!r}"
                    )
            if failures:
                break
        if failures:
            break
    assert not failures, failures[:3]
