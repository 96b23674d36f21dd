"""Corpus-cleaning operators: C4-style global line dedup, PII redaction,
host/word blocklist filtering.

These are the standard web-corpus cleanup passes between extraction and
training (C4: Raffel et al. 2020 §2.2 dedupes exact lines across the
corpus; RefinedWeb/Gopher apply URL blocklists and document filters).
All pure Catalyst — regexes live in whole-stage codegen, the only
shuffles are the two the line-dedup semantics force.

PINNED SEMANTICS:

line_dedup_c4:
 1. Lines split on '\\n'; a line's dedup KEY is its exact text (already
    whitespace-normalized upstream by extraction).
 2. Blank lines are never deduped (they are structure, not content).
 3. Of all occurrences of the same line across the corpus, the one with
    the smallest (doc_id, line_idx) survives; every other occurrence is
    dropped.
 4. Documents reassemble from surviving lines in original order;
    documents losing every line disappear from the output.

redact_pii (cross-engine regexes — Java AND RE2 compatible):
 5. emails  [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}  -> <EMAIL>
 6. IPv4    \\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b     -> <IP>
 7. 16-digit runs (card-shaped)  \\b\\d{16}\\b               -> <NUM>
    Applied in that order, global replace.

blocklist_filter:
 8. host_blocked iff registered_host(url) is in the host blocklist
    (broadcast join — the list is dimension-sized).
 9. word_blocked iff any whitespace token of text equals a blocked word
    (exact token match, not substring — 'class' never blocks 'classic').
 10. keep = NOT (host_blocked OR word_blocked).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import Window
from pyspark.sql import functions as F  # noqa: N812

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
CARD_RE = r"\b\d{16}\b"


def line_dedup_c4(docs: "DataFrame") -> "DataFrame":
    """Global exact-line dedup (pinned rules 1-4).

    Plan shape: posexplode (narrow) -> ONE window shuffle keyed on the
    line text -> ONE groupBy(doc_id) reassembly shuffle. No text moves
    twice. Blank lines never enter the window (rule 2 says they always
    survive, and at 10^12 docs the "" key would be the single worst skew
    partition — it is excluded by construction, not by AQE luck); the
    remaining boilerplate-line skew reduces to a min, not a
    materialization, and AQE skew-split absorbs it.
    Output: (doc_id, text, kept_lines, dropped_lines).
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split("text", "\n")).alias("line_idx", "line"),
    )
    blanks = lines.filter(F.col("line") == "").withColumn(
        "keep", F.lit(True)
    )
    w = Window.partitionBy("line").orderBy("doc_id", "line_idx")
    ranked = (
        lines.filter(F.col("line") != "")
        .withColumn("keep", F.row_number().over(w) == 1)
        .unionByName(blanks)
    )
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("keep"),
                        F.struct("line_idx", "line"),
                    )
                )
            ).alias("_kept"),
            F.count("*").alias("_total"),
        )
        .select(
            "doc_id",
            F.array_join(
                F.transform("_kept", lambda s: s["line"]), "\n"
            ).alias("text"),
            F.size("_kept").cast("long").alias("kept_lines"),
            (F.col("_total") - F.size("_kept")).cast("long").alias(
                "dropped_lines"
            ),
        )
        .filter(F.col("kept_lines") > 0)
    )


def redact_pii(docs: "DataFrame", text_col: str = "text") -> "DataFrame":
    """Email/IPv4/card-number redaction (pinned rules 5-7). One codegen
    stage, no shuffle, regexes pushdown-neutral."""
    red = F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, CARD_RE, "<NUM>")
    return docs.withColumn("redacted", red)


def blocklist_filter(
    docs: "DataFrame",
    blocked_hosts: "DataFrame",
    blocked_words: "DataFrame",
) -> "DataFrame":
    """Host + word blocklist flags (pinned rules 8-10).

    ``blocked_hosts``: one column ``host``; ``blocked_words``: one column
    ``word``. Plan shape: the corpus is scanned ONCE with zero fact-side
    shuffles — hosts flag via one broadcast left join on the host key
    (host blocklists run to millions of rows), words flag via an
    ``arrays_overlap`` against a collected literal array (word blocklists
    are hundreds of entries; same driver-side-dimension pattern as
    skew.hot_hosts). Output keeps all rows with the flags, so callers can
    audit removal rates before filtering (the C4 paper reports them)."""
    from ..functions.url import registered_host

    words = [r["word"] for r in blocked_words.select("word").collect()]
    word_hit = (
        F.arrays_overlap(
            F.split(F.trim("text"), r"\s+"),
            F.array(*[F.lit(w) for w in words]),
        )
        if words
        else F.lit(False)
    )
    hosts_dim = F.broadcast(
        blocked_hosts.select(
            F.col("host").alias("_host"), F.lit(True).alias("_hb")
        )
    )
    return (
        docs.withColumn("_host", registered_host(F.col("url")))
        .join(hosts_dim, "_host", "left")
        .select(
            "doc_id",
            F.col("_host").alias("host"),
            F.coalesce("_hb", F.lit(False)).alias("host_blocked"),
            word_hit.alias("word_blocked"),
        )
        .withColumn(
            "keep", ~(F.col("host_blocked") | F.col("word_blocked"))
        )
    )
