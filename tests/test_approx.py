"""Approximate aggregates: the 100 TB substitutes for exact distinct /
exact percentiles, bounded against their exact counterparts on the
fixture data so the error knobs are demonstrably honest."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import load_table


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    exact, approx = events.agg(
        F.countDistinct("user_id"),
        F.approx_count_distinct("user_id", 0.02),
    ).first()
    # HLL++ rsd=0.02 ⇒ generous 3-sigma band
    assert abs(approx - exact) <= max(3, 0.06 * exact)


def test_approx_percentile_within_tolerance(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    row = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_p50"),
        F.expr("percentile(value, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(value, 0.99, 10000)").alias("approx_p99"),
    ).first()
    spread = (
        events.agg(F.max("value") - F.min("value")).first()[0] or 1.0
    )
    assert abs(row.approx_p50 - row.exact_p50) <= 0.02 * spread
    assert abs(row.approx_p99 - row.exact_p99) <= 0.02 * spread


def test_approx_count_distinct_groupwise(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    pdf = (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", 0.02).alias("approx"),
        )
        .toPandas()
    )
    assert len(pdf) > 0
    assert ((pdf["approx"] - pdf["exact"]).abs() <= (0.06 * pdf["exact"]).clip(lower=3)).all()


def test_hll_rollup_gate_passes(spark, sf_dir):
    """Merged per-day HLL sketches must estimate total distinct users
    within the gate's 5% bound."""
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import (
        hll_rollup_gate,
    )

    row = hll_rollup_gate(spark, sf_dir).first()
    assert row["passed"] is True, row.asDict()
    assert row["n_days"] > 1  # actually merged across days
