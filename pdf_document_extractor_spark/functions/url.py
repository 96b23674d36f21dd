"""URL functions for web-scale corpora — pure Catalyst column expressions.

Zero Python UDFs: every function composes built-in expressions, so they
run inside whole-stage codegen and their predicates stay pushdown-eligible.
Canonicalization is the standard crawl-dedup pre-step (two urls differing
only in fragment/param-order/default-port are the same fetch).

PINNED canonicalization rules (the oracle in __spark_entry__.py mirrors
them exactly):
 1. scheme and host lowercased; path/query untouched (case-significant).
 2. fragment ('#...') stripped.
 3. default ports stripped (':80' for http, ':443' for https).
 4. query parameters sorted bytewise ('a=1&b=2'); empty query ('?') dropped.
 5. empty path becomes '/'.
 6. urls that don't parse (scheme-less/relative, e.g. 'example.com/x') pass
    through UNCHANGED — collapsing them all to ':///' would merge every
    malformed url into one dedup record.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: N812

_SPLIT_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def host_of(url) -> Column:
    """Lowercased host (with port if present)."""
    return F.lower(F.regexp_extract(url, _SPLIT_RE, 2))


def registered_host(url) -> Column:
    """Host without port and without a leading 'www.' — the grouping key
    for host-level skew/politeness stats."""
    bare = F.regexp_replace(host_of(url), r":\d+$", "")
    return F.regexp_replace(bare, r"^www\.", "")


def canonicalize_url(url) -> Column:
    """Apply the pinned rules 1-6. Composes ~10 Catalyst expressions;
    stays JVM-side and codegen-friendly."""
    url = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(url, _SPLIT_RE, 1))
    host = F.lower(F.regexp_extract(url, _SPLIT_RE, 2))
    path = F.regexp_extract(url, _SPLIT_RE, 3)
    query = F.regexp_extract(url, _SPLIT_RE, 4)  # includes leading '?'

    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).otherwise(
        F.when(
            (scheme == "https") & host.endswith(":443"),
            F.regexp_replace(host, r":443$", ""),
        ).otherwise(host)
    )

    path = F.when(path == "", F.lit("/")).otherwise(path)

    qbody = F.substring(query, 2, 1 << 30)
    sorted_q = F.array_join(F.array_sort(F.split(qbody, "&")), "&")
    query_out = F.when(F.length(query) > 1, F.concat(F.lit("?"), sorted_q)).otherwise(
        F.lit("")
    )

    built = F.concat(scheme, F.lit("://"), host, path, query_out)
    # pinned rule 6: unparseable url -> identity, never ':///'
    return F.when(scheme == "", url).otherwise(built)
