"""URL parsing expressions (functions/url.py) and the domain-level
curation plan (plans/pipeline.py domain_curation)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.url import (
    registrable_domain,
    registrable_domain_sql,
    url_host,
    url_host_sql,
)

URLS = [
    "https://www.example.com/path?q=1",
    "http://EXAMPLE.ORG",
    "https://user:pw@blog.example.co.uk:8443/a/b#frag",
    "ftp://cdn.media.example.net/file.bin",
    "example.com/bare",
    "https://single",
    "https://a.b.c.gov.uk/x",
    "https://127.0.0.1:8080/health",
    None,
]


def test_host_and_domain_expressions(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = (
        df.select(
            "url",
            url_host(F.col("url")).alias("host"),
            registrable_domain(url_host(F.col("url"))).alias("domain"),
        )
        .collect()
    )
    got = {r.url: (r.host, r.domain) for r in rows}
    assert got["https://www.example.com/path?q=1"] == ("www.example.com", "example.com")
    assert got["http://EXAMPLE.ORG"] == ("example.org", "example.org")
    assert got["https://user:pw@blog.example.co.uk:8443/a/b#frag"] == (
        "blog.example.co.uk",
        "example.co.uk",
    )
    assert got["ftp://cdn.media.example.net/file.bin"] == (
        "cdn.media.example.net",
        "example.net",
    )
    assert got["example.com/bare"] == ("example.com", "example.com")
    assert got["https://single"] == ("single", "single")
    assert got["https://a.b.c.gov.uk/x"] == ("a.b.c.gov.uk", "c.gov.uk")
    # IPv4 literal: "registrable domain" degrades to last two octets —
    # callers route IPs separately; the expression must just not crash
    assert got["https://127.0.0.1:8080/health"][0] == "127.0.0.1"
    assert got[None] == (None, None)


def test_sql_mirrors_agree_with_spark(spark):
    df = spark.createDataFrame([(u,) for u in URLS if u], "url string")
    srows = sorted(
        (r.url, r.host, r.domain)
        for r in df.select(
            "url",
            url_host(F.col("url")).alias("host"),
            registrable_domain(url_host(F.col("url"))).alias("domain"),
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE u(url VARCHAR); INSERT INTO u VALUES "
        + ", ".join("(?)" for _ in URLS if _),
        [u for u in URLS if u],
    )
    host = url_host_sql("url")
    orows = sorted(
        tuple(r)
        for r in con.sql(
            f"SELECT url, {host} AS host, "
            f"{registrable_domain_sql(host)} AS domain FROM u"
        ).fetchall()
    )
    assert srows == orows


def test_domain_curation_invariants(spark, sf_dir):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import (
        CURATION_BLOCKLIST,
        DOMAIN_CAP,
        domain_curation,
    )

    out = domain_curation(spark, sf_dir)
    rows = out.collect()
    assert rows, "curation produced no rows"
    domains = {r.domain for r in rows}
    assert not domains & set(CURATION_BLOCKLIST)
    per_dom = {}
    for r in rows:
        per_dom[r.domain] = max(per_dom.get(r.domain, 0), r.dom_rank)
        assert r.dom_rank <= DOMAIN_CAP
        assert r.host.endswith(r.domain)
    # the multi-label suffix path is actually exercised
    assert "example.co.uk" in domains
