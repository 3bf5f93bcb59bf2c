"""URL canonicalization — the normalization kernel behind URL-level
deduplication, the cheapest first stage of every web-corpus pipeline
(C4, CCNet, RefinedWeb all dedup fetched pages by normalized URL
before touching content).

All steps are codegen'd string built-ins (regexp_replace / split /
array_sort — no UDFs), so canonicalization rides the scan: the
operator's only shuffle is whatever the caller groups on afterwards.

Normalization contract (documented trade-offs, mirrored literally by
the DuckDB oracle in queries/web.py):

- fragment dropped (never reaches the server);
- scheme dropped (http/https serve the same page on the modern web);
- leading ``www.`` dropped;
- host AND path lowercased — the C4-style trade: case-sensitive
  paths exist but are rare, and content-level dedup downstream
  catches what this over-merges;
- tracking query parameters removed (utm_*, fbclid, gclid);
- remaining query parameters sorted (param order never changes the
  resource);
- trailing slashes stripped.

Assumes at most one ``?`` per URL (guaranteed by RFC 3986 syntax —
later ``?`` characters are legal only inside the query itself, where
splitting on the FIRST one would be wrong anyway; this implementation
splits on the first).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def canonical_url(url: Column | str) -> Column:
    """Canonical form of ``url`` per the module contract."""
    u = F.regexp_replace(url, "#.*$", "")
    u = F.regexp_replace(u, "^[Hh][Tt][Tt][Pp][Ss]?://", "")
    u = F.lower(u)
    u = F.regexp_replace(u, r"^www\.", "")
    # Path and query must split on the SAME (first) '?':
    # substring_index(u, '?', -1) would take text after the LAST '?',
    # silently losing the middle segment of a URL with two '?'s.
    path = F.substring_index(u, "?", 1)
    query = F.when(
        F.instr(u, "?") > 0,
        F.substring(u, F.instr(u, "?") + F.lit(1), F.length(u)),
    ).otherwise(F.lit(""))
    keep = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.startswith(TRACKING_PREFIXES[0])
            & ~p.startswith(TRACKING_PREFIXES[1])
            & ~p.startswith(TRACKING_PREFIXES[2]),
        )
    )
    return F.concat(
        F.regexp_replace(path, "/+$", ""),
        F.when(
            F.size(keep) > 0,
            F.concat(F.lit("?"), F.array_join(keep, "&")),
        ).otherwise(F.lit("")),
    )
