"""URL parsing expressions for domain-level corpus curation — the
first stage of any crawl pipeline (group/cap/block documents by
origin). Pure Catalyst expressions (regexp + array ops), evaluated
inside whole-stage codegen: no UDF, no Python in the per-row path, and
each helper has an exact DuckDB-SQL mirror so curation plans built on
them stay oracle-checkable.

``registrable_domain`` implements the public-suffix rule with a small
built-in set of multi-label suffixes (the full Mozilla PSL is a data
file a deployment would load into the same expression via a join or a
generated literal map; the ALGORITHM — longest matching suffix plus
one label — is what is implemented here).

No reference-repo counterpart: the reference ingests only uploaded
files (backend/main.py:305); URL provenance enters with the WARC/WET
crawl surface (sources/warc.py), where per-origin curation is the
first pipeline stage."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Multi-label public suffixes recognized by :func:`registrable_domain`.
#: Deployments with broader crawls generate this tuple from the PSL.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "gov.uk", "ac.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "co.in", "co.kr", "com.cn",
)

#: host := authority minus userinfo and port; scheme optional so bare
#: "example.com/path" inputs (common in crawl seed lists) still parse.
_HOST_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)"


def url_host(url: Column) -> Column:
    """Lowercased host of a URL (port, userinfo, path stripped); NULL
    for NULL input, empty string when nothing host-like is present."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def url_host_sql(expr: str) -> str:
    """DuckDB mirror of :func:`url_host` (RE2 and Java agree on this
    pattern class)."""
    return f"lower(regexp_extract({expr}, '{_HOST_RE}', 1))"


def registrable_domain(host: Column) -> Column:
    """eTLD+1: the last two labels of the host, or the last three when
    the trailing two labels form a known multi-label public suffix
    (``bbc.co.uk`` → ``bbc.co.uk``, ``www.example.com`` →
    ``example.com``). Hosts with fewer labels pass through unchanged
    (IP literals and single-label hosts have no registrable domain to
    extract)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    multi = last2.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when((n >= 3) & multi, last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def registrable_domain_sql(expr: str) -> str:
    """DuckDB mirror of :func:`registrable_domain` (negative list
    indexes count from the end in DuckDB, as element_at does in Spark)."""
    suffixes = ", ".join(f"'{s}'" for s in MULTI_LABEL_SUFFIXES)
    parts = f"string_split({expr}, '.')"
    return f"""
        CASE
            WHEN len({parts}) >= 3
                 AND ({parts}[-2] || '.' || {parts}[-1]) IN ({suffixes})
            THEN {parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1]
            WHEN len({parts}) >= 2
            THEN {parts}[-2] || '.' || {parts}[-1]
            ELSE {expr}
        END
    """
