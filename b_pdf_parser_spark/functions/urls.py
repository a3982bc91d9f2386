"""URL canonicalization as pure Catalyst column expressions.

Crawl dedup starts BEFORE content dedup: ``HTTP://Host.Example:80/p#frag``
and ``http://host.example/p`` are the same fetch, and a frontier that
doesn't canonicalize re-crawls (and re-stores) every casing/port/fragment
variant. The rules here are the standard safe subset (RFC 3986 §6.2.2-6.2.3
syntax-based normalization): lowercase scheme+host, strip the fragment,
strip default ports (http:80 / https:443), and give host-only URLs the
``/`` root path.

Everything is regexp/CASE over strings — whole-stage codegen, no UDF, and
the same expressions run verbatim in the DuckDB oracle. Strings without a
``scheme://`` prefix pass through trimmed (opaque ids stay stable keys).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = ["url_host", "canonical_url"]

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)"


def url_host(c: Column) -> Column:
    """Lowercased authority (host[:port]); '' for non-URL strings."""
    return F.lower(F.regexp_extract(c, _HOST, 1))


def canonical_url(c: Column) -> Column:
    c = F.trim(c)
    scheme = F.lower(F.regexp_extract(c, _SCHEME, 1))
    host = url_host(c)
    # default-port strip is scheme-aware: :8080 on http must survive
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, ":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, ":443$", ""),
    ).otherwise(host)
    rest = F.regexp_extract(c, _REST, 1)  # path+query, fragment dropped
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.when(scheme == "", c).otherwise(
        F.concat(scheme, F.lit("://"), host, rest)
    )
