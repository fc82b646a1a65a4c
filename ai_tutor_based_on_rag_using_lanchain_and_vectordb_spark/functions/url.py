"""URL parsing expressions for domain-level corpus curation — the
first stage of any crawl pipeline (group/cap/block documents by
origin). Pure Catalyst expressions (regexp + array ops), evaluated
inside whole-stage codegen: no UDF, no Python in the per-row path, and
each helper has an exact DuckDB-SQL mirror so curation plans built on
them stay oracle-checkable.

``registrable_domain`` implements the public-suffix rule (longest
matching suffix plus one label) against a CHECKED-IN snapshot of the
public suffix list (public_suffix_snapshot.dat, parsed once at import):
2- and 3-label normal rules are supported, so ``*.github.io``-class
private-domain origins group per site instead of collapsing into one
giant pseudo-domain. Deployments refresh the snapshot file; the loader
rejects wildcard/exception rules loudly rather than mis-applying them.
Two equivalent consumers: the inline expression (suffix set as a
literal IN list — fine up to a few hundred rules) and
:func:`registrable_domain_join`, the broadcast-joined table form a real
crawl uses (the suffix table is a bounded policy table, exactly like
the curation blocklist).

No reference-repo counterpart: the reference ingests only uploaded
files (backend/main.py:305); URL provenance enters with the WARC/WET
crawl surface (sources/warc.py), where per-origin curation is the
first pipeline stage."""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SNAPSHOT_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "public_suffix_snapshot.dat"
)


def _load_psl_snapshot(path: str = _SNAPSHOT_PATH) -> tuple[str, ...]:
    """Normal rules from the checked-in PSL snapshot, lowercased.
    Wildcard ("*.") and exception ("!") rules raise: the expression
    mirror cannot honor them, and silently dropping a rule would
    mis-group every origin under it."""
    out = []
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!") or "*" in line:
                raise ValueError(
                    f"unsupported PSL rule {line!r} in {path}: only normal "
                    "rules are supported by the expression mirror"
                )
            n = line.count(".") + 1
            if n < 2 or n > 3:
                raise ValueError(
                    f"PSL rule {line!r} has {n} labels; the snapshot layer "
                    "supports 2- and 3-label rules (single-label TLDs are "
                    "the default rule)"
                )
            out.append(line.lower())
    return tuple(sorted(set(out)))


#: All multi-label public suffixes from the snapshot (2- and 3-label).
MULTI_LABEL_SUFFIXES: tuple[str, ...] = _load_psl_snapshot()
#: Split by label count — the rule precedence is longest-match-first.
SUFFIXES_2: tuple[str, ...] = tuple(
    s for s in MULTI_LABEL_SUFFIXES if s.count(".") == 1
)
SUFFIXES_3: tuple[str, ...] = tuple(
    s for s in MULTI_LABEL_SUFFIXES if s.count(".") == 2
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


def _last_k(parts: Column, k: int) -> Column:
    """Last k labels joined by '.'. try_element_at, not element_at:
    the join form evaluates these for EVERY row (no short-circuiting
    CASE guard), and ANSI element_at throws on hosts with < k labels.
    Short hosts yield a degenerate shorter string that can never equal
    a k-label suffix and sits behind an n >= guard in every consumer."""
    return F.concat_ws(
        ".", *[F.try_element_at(parts, F.lit(-(k - i))) for i in range(k)]
    )


def registrable_domain(host: Column) -> Column:
    """eTLD+1 against the snapshot: the last two labels of the host, or
    last three / last four when the trailing two / three labels form a
    known multi-label public suffix, longest rule first
    (``bbc.co.uk`` → ``bbc.co.uk``, ``a.b.github.io`` → ``b.github.io``,
    ``x.pvt.k12.ma.us`` → ``x.pvt.k12.ma.us``). Hosts with fewer labels
    pass through unchanged (IP literals and single-label hosts have no
    registrable domain to extract)."""
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2, last3, last4 = _last_k(parts, 2), _last_k(parts, 3), _last_k(parts, 4)
    hit3 = (
        (n >= 4) & last3.isin(*SUFFIXES_3) if SUFFIXES_3 else F.lit(False)
    )
    return (
        F.when(hit3, last4)
        .when((n >= 3) & last2.isin(*SUFFIXES_2), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def registrable_domain_sql(expr: str) -> str:
    """DuckDB mirror of :func:`registrable_domain` (negative list
    indexes count from the end in DuckDB, as element_at does in Spark);
    the IN lists are GENERATED from the same checked-in snapshot the
    Spark side loads, so both engines apply the identical rule set."""
    s2 = ", ".join(f"'{s}'" for s in SUFFIXES_2)
    s3 = ", ".join(f"'{s}'" for s in SUFFIXES_3)
    parts = f"string_split({expr}, '.')"
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    last3 = f"({parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1])"
    last4 = (
        f"({parts}[-4] || '.' || {parts}[-3] || '.' || {parts}[-2]"
        f" || '.' || {parts}[-1])"
    )
    three = (
        f"WHEN len({parts}) >= 4 AND {last3} IN ({s3}) THEN {last4}\n"
        if s3
        else ""
    )
    return f"""
        CASE
            {three}WHEN len({parts}) >= 3
                 AND {last2} IN ({s2})
            THEN {last3}
            WHEN len({parts}) >= 2
            THEN {last2}
            ELSE {expr}
        END
    """


def suffix_table(spark) -> DataFrame:
    """The snapshot as a DataFrame (suffix, n_labels) — the bounded
    policy table the broadcast-join form consumes."""
    return spark.createDataFrame(
        [(s, s.count(".") + 1) for s in MULTI_LABEL_SUFFIXES],
        "suffix string, n_labels int",
    )


def registrable_domain_join(
    df: DataFrame, host_col: str, out_col: str = "domain"
) -> DataFrame:
    """Table-driven eTLD+1: the same longest-match rule as the inline
    expression, but the suffix set arrives as a BROADCAST-JOINED table
    (``suffix_table``) instead of a literal IN list — the form a real
    crawl uses once the rule set outgrows an expression (the full PSL
    is ~10k rules). Two left joins (one per supported suffix length,
    both against the same bounded broadcast side), then the precedence
    CASE. Semantics are identical to :func:`registrable_domain` by
    construction — equivalence-tested in tests/test_url.py."""
    spark = df.sparkSession
    suf = suffix_table(spark)
    s2 = suf.where(F.col("n_labels") == 2).select(
        F.col("suffix").alias("_s2"), F.lit(1).alias("_h2")
    )
    s3 = suf.where(F.col("n_labels") == 3).select(
        F.col("suffix").alias("_s3"), F.lit(1).alias("_h3")
    )
    parts = F.split(F.col(host_col), r"\.")
    n = F.size(parts)
    tagged = df.withColumn("_l2", _last_k(parts, 2)).withColumn(
        "_l3", _last_k(parts, 3)
    ).withColumn("_l4", _last_k(parts, 4)).withColumn("_n", n)
    joined = tagged.join(
        F.broadcast(s2), F.col("_l2") == F.col("_s2"), "left"
    ).join(F.broadcast(s3), F.col("_l3") == F.col("_s3"), "left")
    domain = (
        F.when((F.col("_n") >= 4) & F.col("_h3").isNotNull(), F.col("_l4"))
        .when((F.col("_n") >= 3) & F.col("_h2").isNotNull(), F.col("_l3"))
        .when(F.col("_n") >= 2, F.col("_l2"))
        .otherwise(F.col(host_col))
    )
    return joined.withColumn(out_col, domain).select(
        *df.columns, out_col
    )
