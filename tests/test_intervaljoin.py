"""Grid-bucketed interval-overlap join + triangle census."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from pyspark.sql import functions as F

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.components import (
    triangle_count,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.intervaljoin import (
    interval_overlap_join,
)

_T0 = dt.datetime(2024, 1, 1)


def _iv(spark, rows, s, e):
    return spark.createDataFrame(
        [(i, _T0 + dt.timedelta(seconds=a), _T0 + dt.timedelta(seconds=b))
         for i, (a, b) in enumerate(rows)],
        f"id_{s} long, {s} timestamp, {e} timestamp",
    )


def _join(spark, left_rows, right_rows, width):
    l = _iv(spark, left_rows, "a0", "a1")
    r = _iv(spark, right_rows, "b0", "b1")
    out = interval_overlap_join(l, r, "a0", "a1", "b0", "b1", bucket_width_s=width)
    return sorted((row["id_a0"], row["id_b0"]) for row in out.collect())


def _naive(left_rows, right_rows):
    return sorted(
        (i, j)
        for i, (a0, a1) in enumerate(left_rows)
        for j, (b0, b1) in enumerate(right_rows)
        if a0 <= b1 and b0 <= a1
    )


def test_basic_overlap_and_disjoint(spark):
    left = [(0, 100), (500, 600)]
    right = [(50, 80), (90, 120), (200, 300), (599, 700)]
    assert _join(spark, left, right, 60) == [(0, 0), (0, 1), (1, 3)]


def test_pair_spanning_many_cells_emitted_once(spark):
    # both intervals cover dozens of grid cells; the responsibility
    # rule must emit the pair exactly once, not once per shared cell
    left = [(0, 10_000)]
    right = [(5, 9_000)]
    assert _join(spark, left, right, 60) == [(0, 0)]


def test_touching_endpoints_inclusive(spark):
    # closed intervals: meeting exactly at an endpoint counts
    assert _join(spark, [(0, 100)], [(100, 200)], 3600) == [(0, 0)]
    assert _join(spark, [(0, 100)], [(101, 200)], 3600) == []


def test_cell_boundary_pairs_survive(spark):
    # overlap happens exactly at a bucket boundary: the owner cell is
    # the one containing max(starts); integer-floor bucketing must not
    # drop or double it for any width
    for width in (10, 60, 3600):
        left = [(0, width), (width, 2 * width - 1)]
        right = [(width, width), (2 * width - 1, 3 * width)]
        assert _join(spark, left, right, width) == _naive(left, right)


def test_randomized_against_naive(spark):
    rng = random.Random(7)
    left = [(a, a + rng.randrange(0, 500)) for a in
            (rng.randrange(0, 20_000) for _ in range(60))]
    right = [(a, a + rng.randrange(0, 500)) for a in
             (rng.randrange(0, 20_000) for _ in range(60))]
    for width in (97, 1000):
        assert _join(spark, left, right, width) == _naive(left, right)


def test_extra_cond_filters_pairs(spark):
    rows = [(0, 100), (50, 150), (120, 200)]
    l = _iv(spark, rows, "a0", "a1")
    r = _iv(spark, rows, "b0", "b1")
    out = interval_overlap_join(
        l, r, "a0", "a1", "b0", "b1", bucket_width_s=60,
        extra_cond=lambda df: F.col("id_a0") < F.col("id_b0"),
    )
    got = sorted((row["id_a0"], row["id_b0"]) for row in out.collect())
    assert got == [(0, 1), (1, 2)]


# --- triangle census ------------------------------------------------------


def _census(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    return row["n_triangles"], row["n_wedges"]


def _naive_tri(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in es:
            continue
        es.add((a, b))
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for (a, b) in es
        for c in adj[a] & adj[b]
        if c > b
    )
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    return tri, wedges


def test_triangle_simple(spark):
    assert _census(spark, [(1, 2), (2, 3), (1, 3)]) == (1, 3)


def test_square_has_no_triangle(spark):
    assert _census(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == (0, 4)


def test_k4_all_triangles(spark):
    edges = list(itertools.combinations(range(4), 2))
    assert _census(spark, edges) == (4, 12)


def test_duplicate_and_reversed_edges_collapse(spark):
    assert _census(
        spark, [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1)]
    ) == (1, 3)


def test_star_skew_hub(spark):
    # celebrity hub: naive wedge generation would be Θ(deg²) at the hub;
    # orientation keeps it exact regardless
    edges = [(0, i) for i in range(1, 30)] + [(1, 2), (3, 4)]
    assert _census(spark, edges) == _naive_tri(edges)


def test_randomized_triangles_vs_naive(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(18), rng.randrange(18)) for _ in range(70)]
    assert _census(spark, edges) == _naive_tri(edges)


# --- ROC-AUC (Mann–Whitney) --------------------------------------------


def test_event_value_auc_matches_pairwise(spark):
    import random

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.curation import (
        event_value_auc,
    )

    rng = random.Random(5)
    # ties on purpose: scores drawn from a tiny grid
    rows = [
        (i, "2024-01-01 00:00:00", i % 10, 
         "purchase" if rng.random() < 0.3 + (0.04 * (i % 9)) else "click",
         float(rng.randrange(12)), "{}")
        for i in range(800)
    ]
    import os, tempfile
    d = tempfile.mkdtemp(prefix="auc_")
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = event_value_auc(spark, d).collect()[0]

    pos = [v for (_, _, _, t, v, _) in rows if t == "purchase"]
    neg = [v for (_, _, _, t, v, _) in rows if t != "purchase"]
    wins = sum(1.0 if p > q else 0.5 if p == q else 0.0 for p in pos for q in neg)
    want = wins / (len(pos) * len(neg))
    assert got["n_pos"] == len(pos) and got["n_neg"] == len(neg)
    assert abs(got["auc"] - want) < 1e-6


# --- compression-ratio quality signal ------------------------------------


def test_doc_compression_ratio_invariants(spark):
    import os, tempfile, zlib

    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.documents import (
        doc_compression_ratio,
    )

    texts = {
        1: "all work and no play " * 200,          # filler: compresses hard
        2: "The quick brown fox jumps over the lazy dog. " * 40,
        3: "".join(
            chr(33 + r)
            for r in (lambda g: [g.randrange(90) for _ in range(4000)])(
                random.Random(41)
            )
        ),  # pseudo-random junk: barely compresses
        4: "",                                      # empty -> NULL ratio
    }
    d = tempfile.mkdtemp(prefix="zr_")
    spark.createDataFrame(
        [(k, v, "en", "t", len(v)) for k, v in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r["zlib_ratio"] for r in doc_compression_ratio(spark, d).collect()}

    assert got[4] is None
    # exact agreement with local zlib at the same level
    for k in (1, 2, 3):
        raw = texts[k].encode()
        assert abs(got[k] - round(len(zlib.compress(raw, 6)) / len(raw), 6)) < 1e-9
    # ordering: repetitive texts compress far below pseudo-random junk
    assert got[1] < got[3] and got[2] < got[3]
    assert 0 < got[1] and got[3] < 1.2


def test_pathological_interval_raises_clear_error(spark):
    import pytest

    l = _iv(spark, [(0, 100)], "a0", "a1")
    r = _iv(spark, [(0, 40_000_000)], "b0", "b1")  # ~463 days of 1s cells
    out = interval_overlap_join(
        l, r, "a0", "a1", "b0", "b1", bucket_width_s=1,
        max_cells_per_interval=1000,
    )
    with pytest.raises(Exception, match="max_cells_per_interval"):
        out.collect()
    # same data passes with a sane width
    ok = interval_overlap_join(
        l, r, "a0", "a1", "b0", "b1", bucket_width_s=86_400,
        max_cells_per_interval=1000,
    )
    assert [(x["id_a0"], x["id_b0"]) for x in ok.collect()] == [(0, 0)]


def test_local_clustering_vs_naive(spark):
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.operators.components import (
        local_clustering,
    )

    rng = random.Random(17)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["local_cc"])
        for r in local_clustering(df).collect()
    }

    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for n, nb in adj.items():
        if len(nb) < 2:
            assert n not in got
            continue
        t = sum(1 for u in nb for v in nb if u < v and v in adj[u])
        cc = 2.0 * t / (len(nb) * (len(nb) - 1))
        assert got[n][0] == len(nb) and got[n][1] == t, n
        assert abs(got[n][2] - cc) < 1e-6, n
