"""Physical-plan regression tests: the scale properties the engine is
designed around — broadcast dims, filter/limit pushdown, column pruning,
JVM-only hot paths — asserted on the actual Catalyst output so a later
edit can't silently trade them away. These are the `.explain` audits of
the build brief, frozen as tests.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import bench
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark import plans


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


_BENCH_LOCAL: dict = {}


def _q(name, spark, sf_dir):
    reg = plans.all_queries()
    if name in reg:
        return reg[name](spark, sf_dir)
    # Bench-local queries (not in the registry): reconstruct the same
    # shape bench.py uses so the plan assertions still cover them.
    if name == "knn_ivfpq_search":
        if "ivfpq_searcher" not in _BENCH_LOCAL:
            import tempfile

            from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (
                load_table,
            )
            from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators import (
                pq_index as PI,
            )

            idx_path = tempfile.mkdtemp(prefix="planshape_ivfpq_")
            emb = load_table(spark, sf_dir, "embeddings")
            PI.build_ivfpq_index(emb, idx_path, n_cells=4, m=8, kc=16)
            _BENCH_LOCAL["ivfpq_searcher"] = PI.open_ivfpq_index(
                spark, idx_path, emb
            )
        from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (
            load_table,
        )

        q = load_table(spark, sf_dir, "embeddings").where("vec_id < 5")
        return _BENCH_LOCAL["ivfpq_searcher"].search(q, k=5)
    raise KeyError(name)


def test_topk_uses_window_group_limit(spark, sf_dir):
    # row_number<=k must rewrite to WindowGroupLimit (partial top-k
    # before the shuffle) — the pattern that keeps "history limit 10"
    # scalable at any cardinality.
    assert "WindowGroupLimit" in _plan(_q("chat_history_topk", spark, sf_dir))


def test_dim_filters_push_to_scan(spark, sf_dir):
    p = _plan(_q("shipping_priority", spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # segment + date predicates must reach the parquet scans
    assert "EqualTo(c_mktsegment,BUILDING)" in p
    assert "LessThan(o_orderdate" in p


def test_small_dims_broadcast_in_multiway_join(spark, sf_dir):
    p = _plan(_q("local_supplier_volume", spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_agg_then_broadcast_join(spark, sf_dir):
    assert "BroadcastHashJoin" in _plan(_q("top_customers", spark, sf_dir))


def test_column_pruning_reaches_scan(spark, sf_dir):
    # documents has 5 columns; doc_previews touches 4 — n_chars must not
    # be read.
    p = _plan(_q("doc_previews", spark, sf_dir))
    reads = [l for l in p.splitlines() if "ReadSchema" in l]
    assert reads and all("n_chars" not in l for l in reads)


def test_string_predicate_pushdown(spark, sf_dir):
    p = _plan(_q("doc_text_search", spark, sf_dir))
    assert "StringContains(text" in p
    assert "EqualTo(lang,en)" in p


def test_knn_broadcasts_and_stays_jvm_side(spark, sf_dir):
    p = _plan(_q("knn_exact", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p  # no row-at-a-time Python
    assert "ArrowEvalPython" not in p  # fully expression-based scoring


def test_neardup_pairs_default_has_no_fulltable_broadcast(spark, sf_dir):
    # The scale-safe default partitions both sides on (label, salt):
    # either the salted shuffled-hash self-join (expression engine) or
    # the cogrouped numpy kernel (default engine — shows up as
    # FlatMapCoGroupsInPandas over two hash exchanges). Broadcasting the
    # whole embeddings table as build side dies at 100 TB, so its
    # presence here is a regression, as is a cartesian product.
    p = _plan(_q("embedding_neardup_pairs", spark, sf_dir))
    assert "BroadcastExchange" not in p
    assert (
        "FlatMapCoGroupsInPandas" in p
        or "ShuffledHashJoin" in p
        or "SortMergeJoin" in p
    )
    assert "CartesianProduct" not in p

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.vectors import (
        embedding_neardup_pairs_df,
    )

    # the expression engine stays available and keeps its join shape
    pe = _plan(
        embedding_neardup_pairs_df(
            load_table(spark, sf_dir, "embeddings"), engine="expr"
        )
    )
    assert "BroadcastExchange" not in pe
    assert "ShuffledHashJoin" in pe or "SortMergeJoin" in pe


@pytest.mark.parametrize("name", bench.HEADLINE)
def test_headline_queries_have_no_python_rows_path(spark, sf_dir, name):
    # Every benchmarked query must stay inside the JVM: no row-at-a-time
    # Python UDFs anywhere in the hot set.
    assert "BatchEvalPython" not in _plan(_q(name, spark, sf_dir))


# The r5 verdict flagged forced broadcasts of sf-scaled tables (part,
# supplier, per-part aggregates, counts-per-doc) as the last
# scale-killers: a forced hint bypasses the size threshold, so at the
# 100 TB point the driver would try to collect a multi-GB build side.
# These tests freeze the fix — no broadcast hint may reappear in the
# ANALYZED plan of the affected queries except on fixed-cardinality
# inputs (nation=25, region=5 rows, 1-row scalar aggregates).

SCALED_NO_HINT = [
    "brand_supplier_counts",  # part, bad-supplier list
    "small_qty_avg_revenue",  # part, per-part averages
    "promotable_part_suppliers",  # part semi-join
    "promo_revenue_share",  # part (r8: hint removed)
    "disjunctive_predicate_revenue",  # part (r8: hint removed)
    "shipping_priority",  # segment-filtered customer (r8: hint removed)
]


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("name", SCALED_NO_HINT)
def test_no_forced_broadcast_on_scaled_tables(spark, sf_dir, name):
    a = _analyzed(_q(name, spark, sf_dir))
    assert "strategy=broadcast" not in a, name


def test_ngram_counts_join_is_size_gated(spark, sf_dir, monkeypatch):
    # The per-doc shingle-count side is broadcast only below a MEASURED
    # cardinality bound (Catalyst's static estimate statically
    # broadcasts the corpus² pairs side otherwise — AQE can't demote
    # it). Small corpus: counts broadcast. Above the gate: shuffle_hash
    # on counts, no broadcast hint anywhere.
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans import documents as D

    a_small = _analyzed(_q("ngram_jaccard_pairs", spark, sf_dir))
    assert a_small.count("strategy=broadcast") == 2  # ca + cb only

    monkeypatch.setattr(D, "MAX_BROADCAST_COUNTS", 0)
    a_big = _analyzed(_q("ngram_jaccard_pairs", spark, sf_dir))
    assert "strategy=broadcast" not in a_big
    assert "strategy=shuffle_hash" in a_big


def test_fixed_dims_keep_their_hint(spark, sf_dir):
    # product_type_profit joins part+supplier (scaled, unhinted) and
    # nation (fixed, hinted): exactly the nation hint survives.
    a = _analyzed(_q("product_type_profit", spark, sf_dir))
    assert a.count("strategy=broadcast") == 1


def test_scaled_tables_still_broadcast_at_bench_scale(spark, sf_dir):
    # Dropping the forced hint must not cost the small-scale plan:
    # Catalyst's size estimate (or AQE at runtime) still picks broadcast
    # for part/avg_qty at test scale.
    p = _plan(_q("small_qty_avg_revenue", spark, sf_dir))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_entire_registry_has_no_cartesian_or_row_python(spark, sf_dir):
    # Registry-wide freeze (one pass, all 98 queries): no plan may
    # contain a CartesianProduct (unbounded pair blowup at scale) or
    # BatchEvalPython (row-at-a-time Python UDF — the slow path the
    # engine is designed to avoid; Arrow stages show as *InPandas
    # nodes, which are allowed).
    flagged = []
    for name, fn in plans.all_queries().items():
        p = _plan(fn(spark, sf_dir))
        if "CartesianProduct" in p:
            flagged.append((name, "CartesianProduct"))
        if "BatchEvalPython" in p:
            flagged.append((name, "BatchEvalPython"))
    assert not flagged, flagged


def test_keep_best_uses_window_group_limit(spark, sf_dir):
    # The per-cluster argmax must rewrite to WindowGroupLimit so a
    # million-doc near-dup cluster contributes one row to the final
    # shuffle, not a million.
    p = _plan(_q("neardup_keep_best", spark, sf_dir))
    assert "WindowGroupLimit" in p
    assert "CartesianProduct" not in p


def test_minhash_candidates_are_join_free(spark, sf_dir):
    # The r6 sweep fix: candidate pairs come from per-bucket posting
    # lists (groupBy + capped explode), never a banded self-join — a
    # join here reintroduces the O(bucket²) build the 992 s regression
    # came from.
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.dedup import (
        minhash_candidates,
    )

    docs = load_table(spark, sf_dir, "documents")
    p = _plan(minhash_candidates(docs))
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in p, node


def test_quartiles_has_no_unpartitioned_window(spark, sf_dir):
    # customer_spend_quartiles formerly ran ntile(4) over a global
    # (unpartitioned) sort — the single-task straggler at 100×. The
    # bucketed rewrite must leave no window without a partition spec
    # and no ntile at all.
    p = _plan(_q("customer_spend_quartiles", spark, sf_dir))
    assert "ntile" not in p
    for line in p.splitlines():
        if "windowspecdefinition(" in line:
            assert "_gbkt" in line  # every window partitioned by bucket


def test_duplicate_spans_window_only_keys_on_doc(spark, sf_dir):
    # the duplicate-gram count must be a two-phase groupBy + semi-join
    # (map-side combinable, AQE-splittable), never a count window
    # partitioned by the corpus-cardinality gram key
    p = _plan(_q("duplicate_spans", spark, sf_dir))
    for line in p.splitlines():
        if "windowspecdefinition(" in line:
            assert "doc_id" in line and " g#" not in line


def test_no_global_window_over_scaled_input_in_sources():
    # static guard: an unpartitioned Window.orderBy over corpus-scaled
    # input must not reappear anywhere in plans/. The two whitelisted
    # sites are windows over BOUNDED inputs (a ≤256-row merged quantile
    # sketch; a calendar-bounded daily aggregate).
    import glob
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(bench.__file__),
        "ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark",
    )
    allowed = {
        ("plans/pipeline.py", "quantile sketch"),
        ("plans/misc.py", "daily revenue"),
        # neardup_pagerank's rank ordinals: the window input is the
        # 20-row output of a TakeOrdered limit, not a scaled table
        ("plans/vectors.py", "pagerank top-20 over limit(20)"),
        # pca_projection_gate's non-increasing check: the window input
        # is the PCA_COMPONENTS-row (=8) per-component aggregate, a
        # constant bound independent of corpus size
        ("plans/vectors.py", "pca gate over <=8 component rows"),
    }
    hits = []
    for f in glob.glob(os.path.join(pkg, "plans", "*.py")):
        for i, line in enumerate(open(f).read().splitlines(), 1):
            if re.search(r"Window\.orderBy\(", line):
                hits.append((os.path.relpath(f, pkg), i))
    assert {h[0] for h in hits} <= {a[0] for a in allowed}, hits
    assert len(hits) <= 4, hits


def test_brand_supplier_counts_dedupes_pairs_before_joins(spark, sf_dir):
    # the (partkey, suppkey) pair distinct must sit BELOW the part join
    # in the plan: the aggregate that feeds the join reads only the two
    # lineitem link keys (partial map-side agg collapses the fact table
    # to partsupp cardinality before any join shuffles it)
    p = _plan(_q("brand_supplier_counts", spark, sf_dir))
    agg_keys = [
        l for l in p.splitlines()
        if "Keys" in l and "l_partkey" in l and "l_suppkey" in l
        and "p_brand" not in l
    ]
    assert agg_keys, "pair-level distinct missing from plan"
