"""100x distinct-content scale probe: one command, one artifact.

The per-round sf1 probe (tools/bench_sf1.py) measures growth at 10x;
the 100 TB design claims deserve a second decade. This builds (once,
cached) a genuine 100x directory from sf0.1 with the same --distinct
semantics — payloads and join keys vary per replica, so DISTINCT
cardinality grows 100x too — and times the ~12 most expensive headline
queries at sf0.1 and at 100x (1 run each; this is a growth-factor
probe, not a latency gate). Writes ``BENCH_SF10_r{N}.json`` with
per-query growth factors and the superlinear list (growth > K).

    python tools/bench_sf10.py            # round auto-detected
    python tools/bench_sf10.py --round 10
    python tools/bench_sf10.py --rebuild  # force re-scale of the data
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED_DIR = os.path.join(REPO, ".bench", "sf10d")
K = 100

# the heaviest headline queries — one per expensive operator family
# (pair fan-outs, iterative convergence, distributed selection, index
# probe, wide agg); the cheap scans add probe time without adding
# scale information
PROBE_QUERIES = (
    "pricing_summary",
    "brand_supplier_counts",
    "ngram_jaccard_pairs",
    "neardup_components",
    "copurchase_pairs",
    "session_overlap_counts",
    "hybrid_rrf_fusion",
    "knn_ivfpq_search",
    "exact_price_quantiles",
    "sequence_packing",
    "event_heavy_hitters",
    "gk_quantile_gate",
    # round-10 operators: their 100x growth is evidence the new
    # surface scales, not just the inherited one
    "semdedup_production",
    "bloom_novel_docs",
    "corpus_shuffle",
    "domain_curation",
    # round-10 second wave: moments sweep, bounded-vocab pair mining,
    # iterative BFS, distributed selection, per-key kernel smoothing
    "embedding_covariance",
    "term_pmi_pairs",
    # the PRODUCTION (cell-blocked, linear) BFS form — the exact-edge
    # semantic_bfs_hops is the oracle hook whose same-label all-pairs
    # edge definition is quadratic per block by construction, which
    # this probe demonstrated at 100x before the swap
    "semantic_bfs_production",
    "value_mad_outliers",
    "user_value_ewma",
    # round-11 operators. NOTE on reading their ratios: both queries'
    # sf0.1 runtimes (~1 s) are job-scheduling-overhead-dominated, so
    # the 100x ratio overstates the asymptotic slope — the informative
    # check is the 10x→100x slope (~linear) and the absolute 100x wall
    # (tens of seconds for 100x corpora on one box). The probe exists
    # to catch SUPERLINEAR shapes, which would show as ratios > K.
    "dsir_importance_sample",
    "doc_span_scrubbed",
    # round-12 operators: the extents scrub adds a second islands
    # window + per-doc interval join over the same gram stream; MMR is
    # per-query bounded work (pool C=16) above the knn_exact-shaped
    # scoring scan
    "doc_span_scrubbed_sa",
    "knn_mmr_rerank",
    "retrieval_eval",
    "bm25_prf_search",
)


def detect_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 1


def ensure_scaled(rebuild: bool) -> None:
    marker = os.path.join(SCALED_DIR, "_SCALE_OK")
    if os.path.exists(marker) and not rebuild:
        return
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "make_scaled_sf.py"),
         SRC_SF, SCALED_DIR, str(K), "--distinct"],
        check=True, cwd=REPO,
    )
    with open(marker, "w") as f:
        f.write(f"src={SRC_SF} k={K} distinct=1\n")


# memory-headroom evidence (VERDICT r10 #6): the probe JVM runs under
# an explicit 12 GiB heap cap — ~10x below the sandbox's 128 GiB — so
# "no driver-side bottleneck at 100x data" is measured, not argued.
# bench.py records per-query JVM heap peaks (50 ms used-heap sampler;
# local mode: driver and executors share the JVM) plus the python
# driver's RSS. Lower caps were probed: 4 GiB OOMs in the BFS frontier
# joins (32 threads x ~250 MiB/task is below the real working set) and
# 8 GiB passes 2 of 3 runs (GC-timing-dependent margin). 12 GiB /
# 32 threads = 384 MiB per concurrent task at 100x data — the
# spark.executor.memory-per-core sizing a real cluster would use.
PROBE_HEAP = "12g"


def run_bench(sf_dir: str, queries=PROBE_QUERIES, heap=PROBE_HEAP,
              check=True):
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_ONLY=",".join(queries),
        SPARK_GRAFT_BENCH_MEM="1",
        SPARK_GRAFT_BENCH_NO_PERSIST="1",
        SPARK_DRIVER_MEM=heap,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        if check:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(
                f"bench.py failed (rc={proc.returncode}) at {sf_dir}"
            )
        return None
    return json.loads([l for l in proc.stdout.splitlines() if l.strip()][-1])


# live-set evidence (VERDICT r11 #3): four probe queries peak within
# ~2% of the 12 GiB cap at 100x — indistinguishable from lazy GC (a
# JVM grows toward its cap under allocation pressure whether or not
# the live set needs it). Re-running exactly those four under a
# REDUCED cap separates the cases: passing at 8 GiB proves the ≥11 GiB
# "peaks" were garbage + headroom, not resident state.
NEAR_CAP_QUERIES = (
    "brand_supplier_counts",
    "semantic_bfs_production",
    "copurchase_pairs",
    "neardup_components",
)
HEADROOM_HEAP = "8g"


def run_headroom(sf_dir: str) -> dict:
    rec = run_bench(sf_dir, queries=NEAR_CAP_QUERIES, heap=HEADROOM_HEAP,
                    check=False)
    if rec is not None:
        return {
            "heap": HEADROOM_HEAP,
            "ok": True,
            "queries_sec": rec["queries"],
            "peak_heap_mb": rec.get("peak_heap_mb"),
            "heap_cap_mb": rec.get("heap_cap_mb"),
        }
    # attribute the failure: one process per query
    per = {}
    for q in NEAR_CAP_QUERIES:
        r = run_bench(sf_dir, queries=(q,), heap=HEADROOM_HEAP, check=False)
        per[q] = (
            {"ok": False}
            if r is None
            else {"ok": True, "sec": r["queries"][q],
                  "peak_heap_mb": (r.get("peak_heap_mb") or {}).get(q)}
        )
    return {"heap": HEADROOM_HEAP, "ok": False, "per_query": per}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()
    rnd = args.round if args.round is not None else detect_round()

    ensure_scaled(args.rebuild)
    base = run_bench(SRC_SF)
    scaled = run_bench(SCALED_DIR)

    growth = {
        q: (round(scaled["queries"][q] / base["queries"][q], 2)
            if base["queries"].get(q) else None)
        for q in scaled["queries"]
    }
    artifact = {
        "metric": "sf10_distinct_growth",
        "round": rnd,
        "k": K,
        "src": SRC_SF,
        "queries": list(PROBE_QUERIES),
        "sf0_1_total_s": base["value"],
        "sf10_total_s": scaled["value"],
        "total_growth_x": round(scaled["value"] / base["value"], 2),
        "sf0_1_queries": base["queries"],
        "sf10_queries": scaled["queries"],
        "growth_x": growth,
        "superlinear": sorted(
            [q for q, g in growth.items() if g is not None and g > K],
            key=lambda q: -growth[q],
        ),
        "heap_cap_mb": scaled.get("heap_cap_mb"),
        "sf0_1_peak_heap_mb": base.get("peak_heap_mb"),
        "sf10_peak_heap_mb": scaled.get("peak_heap_mb"),
        "sf0_1_python_rss_mb": base.get("python_driver_rss_mb"),
        "sf10_python_rss_mb": scaled.get("python_driver_rss_mb"),
        # live-set evidence: the near-cap queries re-run at 8 GiB —
        # passing here proves the ~12 GiB peaks were GC laziness, not
        # resident state (see NEAR_CAP_QUERIES)
        "headroom_8g": run_headroom(SCALED_DIR),
    }
    path = os.path.join(REPO, f"BENCH_SF10_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("round", "k", "sf0_1_total_s", "sf10_total_s",
                       "total_growth_x", "superlinear")}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
