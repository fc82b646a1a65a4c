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
        "st16_semdedup",
    }
    for name, r in ops.items():
        assert r["matched"], (name, r["n_stream"], r["n_batch"])
        assert r["n_stream"] > 0 or name in ("st1_rate_limit",
                                             "st4_retention_eviction"), name
