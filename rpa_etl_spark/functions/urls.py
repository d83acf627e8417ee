"""URL canonicalization for web-corpus curation (URL-keyed dedup, domain
quotas). Pure column expressions — narrow, scan-speed at any scale.

Rules (the standard crawl-dedup set):
- scheme and host lowercase; the DEFAULT port for the scheme dropped
  (https:443, http:80) while a non-default port is KEPT — two servers on
  different ports are different origins;
- userinfo (``user:pw@``) dropped — never identity-bearing for a crawl;
- fragment dropped (``parse_url`` never returns it);
- tracking parameters (``utm_*``) removed, OTHER query params kept in
  their original order — ``?ref=x`` is identity-bearing, ``?utm_source=x``
  is not;
- trailing slash stripped from the path (``/page/7/`` == ``/page/7``;
  the root path collapses to no path at all).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module rules; null-safe (null in,
    null out — parse_url of a null URL is null through every branch)."""
    scheme = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    # parse_url HOST strips userinfo AND every port; recover the port from
    # AUTHORITY and keep it unless it is the scheme default — otherwise
    # distinct origins (host:8080 vs host) would merge under dedup
    port = F.regexp_extract(F.parse_url(url, F.lit("AUTHORITY")), r":(\d+)$", 1)
    default_port = (
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
    )
    host = F.concat(
        F.lower(F.parse_url(url, F.lit("HOST"))),
        F.when((port != "") & ~default_port, F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
    )
    path = F.regexp_replace(F.parse_url(url, F.lit("PATH")), "/+$", "")
    q = F.parse_url(url, F.lit("QUERY"))
    kept = F.filter(
        F.split(q, "&"),
        lambda p: ~p.startswith("utm_") & (p != ""),
    )
    q_part = F.when(
        q.isNotNull() & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, path, q_part)
