"""Cross-engine deterministic text primitives.

Everything here is a pure Catalyst expression (whole-stage codegen,
JVM-side — the fast path per the 100 TB mandate) with an EXACT DuckDB SQL
twin, so the driver's oracle can replay it:

  h64(s)      Spark: conv(substring(md5(s),1,15),16,10)::long
              Duck : ('0x' || substr(md5(s),1,15))::bigint
  tokens(s)   Spark: split(trim(s),'\\s+')   Duck: regexp_split_to_array
  integer division everywhere a ratio is emitted (float-free outputs, so
  value hashes can never drift on formatting/precision).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: N812

# 60-bit md5-prefix hash — the one hash primitive shared with the DuckDB
# oracles (DuckDB's hash() and Spark's xxhash64 are NOT cross-compatible).
H64_MOD = 1_000_003
FP_MOD = 1_000_000_007


def h64(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h64_duck(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def tokens(col: Column) -> Column:
    return F.split(F.trim(col), r"\s+")


TOKENS_DUCK = "regexp_split_to_array(trim({expr}), '\\s+')"

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# Language marker words (tiny deterministic stopword sets for n-gram-free
# language ID; alphabetical tie-break de<en<es<fr<zh encoded as ids 5..1).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "en": ["the", "and", "of", "to", "a", "in", "is"],
    "es": ["el", "la", "de", "que", "los", "una", "es"],
    "fr": ["le", "la", "et", "les", "des", "une", "est"],
    "zh": ["de", "shi", "le", "zai", "wo", "you", "he"],
}
LANG_IDS = {"de": 5, "en": 4, "es": 3, "fr": 2, "zh": 1}
ID_TO_LANG = {v: k for k, v in LANG_IDS.items()}

# English stopwords for quality scoring.
EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on", "with",
]


def _array_lit(words: list[str]) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"array({inner})"


def _list_lit_duck(words: list[str]) -> str:
    inner = ", ".join("'" + w.replace("'", "''") + "'" for w in words)
    return f"[{inner}]"


def marker_score(tokens_col: str, lang: str) -> Column:
    """Count of distinct token matches against the language's marker set
    (Spark: array_intersect on distinct tokens — codegen'd)."""
    markers = _array_lit(LANG_MARKERS[lang])
    return F.expr(
        f"size(array_intersect(array_distinct({tokens_col}), {markers}))"
    )


def marker_score_duck(tokens_expr: str, lang: str) -> str:
    markers = _list_lit_duck(LANG_MARKERS[lang])
    return f"len(list_intersect(list_distinct({tokens_expr}), {markers}))"


def stopword_count(tokens_col: str) -> Column:
    stops = _array_lit(EN_STOPWORDS)
    return F.expr(
        f"size(filter({tokens_col}, t -> array_contains({stops}, t)))"
    )


def stopword_count_duck(tokens_expr: str) -> str:
    stops = _list_lit_duck(EN_STOPWORDS)
    return f"len(list_filter({tokens_expr}, t -> list_contains({stops}, t)))"
