from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Long-running suites deselected from a plain ``pytest tests/`` run so
# the default gate finishes inside a CI/driver window (the r13 driver's
# pytest run was cut off at ~22% of the ~75-minute full suite — an
# invisible-failure risk). Two tiers, both measured (r14, per-test
# --durations over the whole suite):
#   - media decoders / codec cross-validation / fuzzers (~282 tests),
#   - the index-maintenance integration tier (persistent IVF/PQ/BM25
#     build-upsert-delete-stream cycles; ~25-90 s per test because each
#     rebuilds parquet layouts repeatedly).
# Coverage is NOT deleted: run the slow set with ``-m slow``, or
# everything with SPARK_GRAFT_FULL_TESTS=1 (or any explicit -m
# expression, which disables this default entirely). Default subset:
# ~18 min; full suite: ~75 min.
SLOW_MODULES = {
    "test_mediadecode",
    "test_minidecode",
    "test_flac",
    "test_mpeg1",
    "test_mpegps",
    "test_decoder_fuzz",
    "test_libjpeg_crossval",
    "test_property_fuzz",
    "test_multimodal",
    # index-maintenance integration tier (measured 76-271 s per module)
    "test_index_delete",
    "test_ann_index",
    "test_chat",
    "test_filtered_ann",
    "test_pq_index",
    "test_stream_exactly_once",
    "test_streamgate",
}

# Individual long-running tests inside otherwise-fast modules
# (measured 55-281 s each): the registry-wide plan sweep builds all
# 214 query plans, and these two parity tests are themselves
# index/stream integration cycles.
SLOW_TESTS = {
    "test_plan_shape.py::test_entire_registry_has_no_cartesian_or_row_python",
    "test_oracle_parity.py::test_query_matches_oracle[purge_document_gate]",
    "test_oracle_parity.py::test_query_matches_oracle[streaming_equivalence_gate]",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running decode/fuzz/crossval suites, deselected from "
        'plain runs (select with -m slow, or run all with -m "slow or '
        'not slow" / SPARK_GRAFT_FULL_TESTS=1)',
    )


def pytest_collection_modifyitems(config, items):
    for it in items:
        mod = it.nodeid.split("::", 1)[0].rsplit("/", 1)[-1].removesuffix(".py")
        tail = "::".join(
            [it.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]]
            + it.nodeid.split("::")[1:]
        )
        if mod in SLOW_MODULES or tail in SLOW_TESTS:
            it.add_marker(pytest.mark.slow)
    if os.environ.get("SPARK_GRAFT_FULL_TESTS") == "1":
        return
    if config.getoption("-m"):
        return  # an explicit -m expression takes full control
    selected = [it for it in items if "slow" not in it.keywords]
    deselected = [it for it in items if "slow" in it.keywords]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ai-tutor-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
