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


def test_psl_snapshot_private_domains_group_per_site(spark):
    # the *.github.io class: with the table-driven snapshot each user
    # site is its own registrable domain instead of one giant
    # pseudo-domain "github.io"
    hosts = [
        ("alice.github.io",),
        ("bob.github.io",),
        ("www.docs.alice.github.io",),
        ("myapp.herokuapp.com",),
        ("en.blog.wordpress.com",),
        ("act-school.act.edu.au",),        # 3-label ICANN rule
        ("deep.sub.act.edu.au",),
        ("github.io",),                    # the bare suffix itself
    ]
    df = spark.createDataFrame(hosts, "host string")
    got = {
        r.host: r.domain
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("domain")
        ).collect()
    }
    assert got["alice.github.io"] == "alice.github.io"
    assert got["bob.github.io"] == "bob.github.io"
    assert got["www.docs.alice.github.io"] == "alice.github.io"
    assert got["myapp.herokuapp.com"] == "myapp.herokuapp.com"
    assert got["en.blog.wordpress.com"] == "blog.wordpress.com"
    assert got["act-school.act.edu.au"] == "act-school.act.edu.au"
    assert got["deep.sub.act.edu.au"] == "sub.act.edu.au"
    # a host equal to the suffix has no +1 label: passes through
    assert got["github.io"] == "github.io"


def test_join_form_equals_expression_form(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.url import (
        MULTI_LABEL_SUFFIXES,
        registrable_domain_join,
    )

    hosts = (
        [(f"sub{i}.example{i % 7}.com",) for i in range(40)]
        + [(f"u{i}.github.io",) for i in range(10)]
        + [("x.y.z.act.edu.au",), ("single",), ("a.co.uk",), ("co.uk",),
           ("127.0.0.1",), ("",)]
        + [("www.ck",), ("foo.www.ck",), ("a.b.ck",), ("b.ck",), ("ck",),
           ("x.city.kawasaki.jp",), ("a.b.kawasaki.jp",),
           ("svc.a.b.kawasaki.jp",), ("kawasaki.jp",)]
        + [(s,) for s in MULTI_LABEL_SUFFIXES[:20]]
    )
    df = spark.createDataFrame(hosts, "host string")
    expr = {
        r.host: r.d
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    join = {
        r.host: r.domain
        for r in registrable_domain_join(df, "host").collect()
    }
    assert expr == join


def test_psl_loader_parses_all_rule_kinds_and_rejects_malformed(tmp_path):
    import pytest

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.url import (
        _load_psl_snapshot,
    )

    good = tmp_path / "ok.dat"
    good.write_text("// c\nco.uk\ngithub.io\n*.ck\n!www.ck\n")
    assert _load_psl_snapshot(str(good)) == (
        ("co.uk", "github.io"), ("ck",), ("www.ck",)
    )
    # the REAL list's deep rules parse (any label count is supported)
    deep = tmp_path / "deep.dat"
    deep.write_text("pvt.k12.ma.us\n*.compute.amazonaws.com\n!a.b.c.d\n")
    assert _load_psl_snapshot(str(deep)) == (
        ("pvt.k12.ma.us",), ("compute.amazonaws.com",), ("a.b.c.d",)
    )
    # single-label normal rules ("com") are the default rule: dropped
    tld = tmp_path / "tld.dat"
    tld.write_text("com\nco.uk\n")
    assert _load_psl_snapshot(str(tld)) == (("co.uk",), (), ())
    embedded = tmp_path / "embedded.dat"
    embedded.write_text("foo.*.bar\n")
    with pytest.raises(ValueError, match="embedded"):
        _load_psl_snapshot(str(embedded))
    single_exc = tmp_path / "se.dat"
    single_exc.write_text("!foo\n")
    with pytest.raises(ValueError, match="exception"):
        _load_psl_snapshot(str(single_exc))


def test_psl_wildcard_and_exception_rules(spark):
    # the public list's algorithm: exceptions beat wildcards; wildcard
    # children are public suffixes
    hosts = [
        ("www.ck",),           # exception: IS the registrable domain
        ("foo.www.ck",),       # ends in the exception -> www.ck
        ("a.b.ck",),           # wildcard *.ck: suffix b.ck -> a.b.ck
        ("deep.a.b.ck",),      # suffix b.ck -> a.b.ck
        ("b.ck",),             # a bare wildcard child: no +1 label
        ("x.city.kawasaki.jp",),   # 3-label exception -> city.kawasaki.jp
        ("city.kawasaki.jp",),
        ("a.b.kawasaki.jp",),  # *.kawasaki.jp -> suffix b.kawasaki.jp
        ("svc.a.b.kawasaki.jp",),
    ]
    df = spark.createDataFrame(hosts, "host string")
    got = {
        r.host: r.domain
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("domain")
        ).collect()
    }
    assert got["www.ck"] == "www.ck"
    assert got["foo.www.ck"] == "www.ck"
    assert got["a.b.ck"] == "a.b.ck"
    assert got["deep.a.b.ck"] == "a.b.ck"
    assert got["b.ck"] == "b.ck"
    assert got["x.city.kawasaki.jp"] == "city.kawasaki.jp"
    assert got["city.kawasaki.jp"] == "city.kawasaki.jp"
    assert got["a.b.kawasaki.jp"] == "a.b.kawasaki.jp"
    assert got["svc.a.b.kawasaki.jp"] == "a.b.kawasaki.jp"


def test_bare_three_label_suffix_passes_through(spark):
    # a host that IS a 3-label public suffix (normal rule or a child
    # of a 2-label wildcard parent) has no +1 label: it must pass
    # through, not truncate onto its parent
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.url import (
        registrable_domain_join,
    )

    hosts = [("s3.amazonaws.com",), ("b.kawasaki.jp",),
             ("act.edu.au",), ("x.s3.amazonaws.com",)]
    df = spark.createDataFrame(hosts, "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got["s3.amazonaws.com"] == "s3.amazonaws.com"
    assert got["b.kawasaki.jp"] == "b.kawasaki.jp"
    assert got["act.edu.au"] == "act.edu.au"
    assert got["x.s3.amazonaws.com"] == "x.s3.amazonaws.com"
    join = {
        r.host: r.domain
        for r in registrable_domain_join(df, "host").collect()
    }
    assert join == got
    # and the SQL mirror agrees
    import duckdb

    sql_got = {
        h: d
        for h, d in duckdb.sql(
            "SELECT host, "
            + registrable_domain_sql("host")
            + " AS d FROM (SELECT unnest(['s3.amazonaws.com',"
            "'b.kawasaki.jp','act.edu.au','x.s3.amazonaws.com']) AS host)"
        ).fetchall()
    }
    assert sql_got == got


def test_deep_k_label_rules(spark):
    # the real list's deep rules, now in the snapshot: a 4-label
    # normal rule (pvt.k12.ma.us) and a 3-label wildcard parent
    # (*.compute.amazonaws.com) — the generated tiers must handle
    # suffix lengths 4 (registrable = last 5) and bare pass-throughs
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.url import (
        registrable_domain_join,
    )

    hosts = [
        ("myschool.pvt.k12.ma.us",),        # suffix + 1 label
        ("www.myschool.pvt.k12.ma.us",),    # deeper: still last 5
        ("pvt.k12.ma.us",),                 # bare 4-label suffix
        ("vm1.uswest.compute.amazonaws.com",),   # wildcard child + 1
        ("a.vm1.uswest.compute.amazonaws.com",),
        ("uswest.compute.amazonaws.com",),  # bare wildcard child
        ("compute.amazonaws.com",),         # the parent itself is NOT
                                            # a suffix: default rule
    ]
    df = spark.createDataFrame(hosts, "host string")
    got = {
        r.host: r.d
        for r in df.select(
            "host", registrable_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got["myschool.pvt.k12.ma.us"] == "myschool.pvt.k12.ma.us"
    assert got["www.myschool.pvt.k12.ma.us"] == "myschool.pvt.k12.ma.us"
    assert got["pvt.k12.ma.us"] == "pvt.k12.ma.us"
    assert got["vm1.uswest.compute.amazonaws.com"] == (
        "vm1.uswest.compute.amazonaws.com"
    )
    assert got["a.vm1.uswest.compute.amazonaws.com"] == (
        "vm1.uswest.compute.amazonaws.com"
    )
    assert got["uswest.compute.amazonaws.com"] == (
        "uswest.compute.amazonaws.com"
    )
    assert got["compute.amazonaws.com"] == "amazonaws.com"
    # join form and SQL mirror agree on the deep tiers
    join = {
        r.host: r.domain
        for r in registrable_domain_join(df, "host").collect()
    }
    assert join == got
    lst = ", ".join(f"'{h}'" for (h,) in hosts)
    sql_got = {
        h: d
        for h, d in duckdb.sql(
            "SELECT host, " + registrable_domain_sql("host")
            + f" AS d FROM (SELECT unnest([{lst}]) AS host)"
        ).fetchall()
    }
    assert sql_got == got


def test_psl_loader_rejects_empty_labels(tmp_path):
    import pytest

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.url import (
        _load_psl_snapshot,
    )

    for bad, match in [("*.\n", "wildcard"), ("a..b\n", "labels"),
                       ("!www..ck\n", "exception"), ("co.uk.\n", "labels")]:
        f = tmp_path / "bad.dat"
        f.write_text(bad)
        with pytest.raises(ValueError, match=match):
            _load_psl_snapshot(str(f))
