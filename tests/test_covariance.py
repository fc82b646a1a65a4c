"""operators/covariance.py — exact distributed covariance + PCA.

Cross-validated against numpy's own np.cov on the identically quantized
data (an independent implementation of the same math), plus contract
guards (input domain, null handling) and the projection kernel.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.covariance import (
    QUANT_DIGITS,
    covariance_matrix,
    pca_components,
    project,
    second_moments,
)

SCALE = 10 ** QUANT_DIGITS


def _df(spark, mat, extra_null=False):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(mat)]
    if extra_null:
        rows.append((len(rows), None))
    return spark.createDataFrame(rows, "id long, embedding array<double>")


def _np_cov(mat):
    q = np.floor(np.asarray(mat, dtype=np.float64) * SCALE + 0.5) / SCALE
    return np.cov(q, rowvar=False, bias=True)  # population (divide by n)


def test_matches_numpy_cov(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(scale=0.3, size=(40, 5))
    got = covariance_matrix(_df(spark, mat)).collect()
    want = _np_cov(mat)
    assert len(got) == 5 * 6 // 2
    for r in got:
        assert r["n_rows"] == 40
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], abs=1e-12)


def test_nulls_filtered_and_counted_out(spark):
    mat = np.eye(3) * 0.5
    got = covariance_matrix(_df(spark, mat, extra_null=True)).collect()
    assert all(r["n_rows"] == 3 for r in got)


def test_moments_exact_integers(spark):
    mat = [[0.1, -0.2], [0.3, 0.4]]
    m = {(r["i"], r["j"]): int(r["s"]) for r in second_moments(_df(spark, mat)).collect()}
    q = np.floor(np.asarray(mat) * SCALE + 0.5).astype(np.int64)
    assert m[(0, -1)] == q[:, 0].sum()
    assert m[(1, -1)] == q[:, 1].sum()
    assert m[(0, 1)] == int((q[:, 0] * q[:, 1]).sum())
    assert m[(0, 0)] == int((q[:, 0] ** 2).sum())


def test_input_domain_guard_is_loud(spark):
    bad = _df(spark, [[3.5, 0.0]])
    with pytest.raises(Exception, match="input domain"):
        covariance_matrix(bad).collect()


def test_pca_components_orthonormal_and_sorted(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(scale=0.2, size=(60, 4))
    rows = [r.asDict() for r in covariance_matrix(_df(spark, mat)).collect()]
    w, v = pca_components(rows, 4)
    assert all(w[i] >= w[i + 1] - 1e-12 for i in range(3))
    assert np.allclose(v @ v.T, np.eye(4), atol=1e-9)


def test_project_matches_numpy(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(scale=0.2, size=(10, 4))
    comps = np.linalg.qr(rng.normal(size=(4, 4)))[0]
    out = (
        project(_df(spark, mat), comps, n_components=2)
        .orderBy("id")
        .collect()
    )
    want = np.asarray(mat) @ comps[:2].T
    got = np.array([r["pca"] for r in out])
    assert np.allclose(got, want, atol=1e-12)
    assert [r["id"] for r in out] == list(range(10))


def test_plan_is_arrow_not_row_python(spark):
    mat = np.eye(3) * 0.1
    plan = covariance_matrix(_df(spark, mat))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInPandas" in plan


def test_grouped_matches_per_group_numpy(spark):
    rng = np.random.default_rng(5)
    rows = []
    mats = {}
    for g in ("a", "b"):
        m = rng.normal(scale=0.25, size=(30, 3))
        mats[g] = m
        rows += [(g, [float(v) for v in r]) for r in m]
    df = spark.createDataFrame(rows, "grp string, embedding array<double>")
    got = covariance_matrix(df, key_col="grp").collect()
    assert len(got) == 2 * 3 * 4 // 2
    for r in got:
        want = _np_cov(mats[r["grp"]])
        assert r["n_rows"] == 30
        assert r["cov"] == pytest.approx(want[r["i"], r["j"]], abs=1e-12)


def test_grouped_null_keys_dropped(spark):
    df = spark.createDataFrame(
        [("a", [0.1, 0.2]), (None, [0.3, 0.4]), ("a", [0.5, 0.6])],
        "grp string, embedding array<double>",
    )
    got = covariance_matrix(df, key_col="grp").collect()
    assert {r["grp"] for r in got} == {"a"}
    assert all(r["n_rows"] == 2 for r in got)


def test_mahalanobis_gate_green_at_sf0001(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.vectors import (
        mahalanobis_outlier_gate,
    )

    rows = mahalanobis_outlier_gate(spark, "/root/testdata/sf0.001").collect()
    assert rows, "gate emitted no labels"
    for r in rows:
        assert r["ok_trace_identity"], (r["label"], r["avg_md2"], r["rank"])
        assert 0 < r["rank"] < r["n"] + 1


def test_chunked_fold_equals_unchunked(spark, monkeypatch):
    """Tiny _CHUNK_ROWS must not change the merged moments (integer
    sums are associative; the chunking exists only for int64 headroom)."""
    import ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.covariance as C

    rng = np.random.default_rng(9)
    mat = rng.normal(scale=0.3, size=(25, 4))
    want = {(r["i"], r["j"]): (int(r["s"]), r["n_rows"])
            for r in second_moments(_df(spark, mat)).collect()}
    monkeypatch.setattr(C, "_CHUNK_ROWS", 3)
    got = {(r["i"], r["j"]): (int(r["s"]), r["n_rows"])
           for r in C.second_moments(_df(spark, mat)).collect()}
    assert got == want


def test_sxy_is_exact_digit_string(spark):
    # sxy is reported as the digit string of the exact decimal so the
    # column stays integer-exact past int64 AND renders identically on
    # both comparator engines (DuckDB decimals come back float64)
    mat = [[0.1, -0.2], [0.3, 0.4]]
    rows = {(r["i"], r["j"]): r["sxy"] for r in covariance_matrix(_df(spark, mat)).collect()}
    q = np.floor(np.asarray(mat) * SCALE + 0.5).astype(np.int64)
    assert rows[(0, 1)] == str(int((q[:, 0] * q[:, 1]).sum()))
    assert isinstance(rows[(0, 0)], str)
