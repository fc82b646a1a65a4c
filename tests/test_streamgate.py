"""The driver-visible streaming equivalence gate (plans/streamgate):
every ST operator's availableNow drain must equal its batch
formulation on the fixture. The per-operator semantics are proven in
tests/test_streaming.py etc.; this asserts the GATE itself reports
them green (it is what the driver's correctness sample sees)."""

from __future__ import annotations

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.streamgate import (
    streaming_equivalence_gate,
)


def test_streaming_equivalence_gate_all_green(spark):
    rows = streaming_equivalence_gate(spark, "/root/testdata/sf0.001").collect()
    ops = {r["operator"]: r for r in rows}
    assert set(ops) == {
        "st1_rate_limit", "st2_session_expiry", "st3_active_gauge",
        "st4_retention_eviction", "st5_ingest_dedup", "join_attribution",
        "st7_heavy_hitters", "st8_bm25_index", "st9_kmv_sketch",
        "st10_cms_sketch", "st11_gk_quantiles",
        "st12_incremental_components", "st13_bloom_dedup",
        "st14_covariance_moments", "st15_incremental_agg_view",
        "st16_semdedup", "st17_dsir_sample",
    }
    for name, r in ops.items():
        assert r["matched"], (name, r["n_stream"], r["n_batch"])
        assert r["n_stream"] > 0 or name in ("st1_rate_limit",
                                             "st4_retention_eviction"), name


def test_gate_guard_raises_on_mismatch_row(spark):
    # the in-plan assert_true guard: a matched=false row must make the
    # COLLECT raise (the driver's rows-only check alone would pass it),
    # and all-true rows must flow through value-unchanged
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.streamgate import (
        _assert_all_matched,
    )

    schema = "operator string, n_stream long, n_batch long, matched boolean"
    ok = spark.createDataFrame(
        [("st1", 5, 5, True), ("st2", 0, 0, True)], schema
    )
    got = sorted(tuple(r) for r in _assert_all_matched(ok).collect())
    assert got == [("st1", 5, 5, True), ("st2", 0, 0, True)]

    bad = spark.createDataFrame([("stX", 5, 4, False)], schema)
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        _assert_all_matched(bad).collect()
    assert "streaming gate mismatch: stX" in str(ei.value)
