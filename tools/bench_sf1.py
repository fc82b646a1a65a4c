"""Per-round distinct-content sf1 benchmark: one command, one artifact.

The round-4 audit's BENCH_SF1.md was a one-off narrative; distinct-scale
regressions between audits went unmeasured. This wraps the two manual
steps into a repeatable run:

1. Build (once, cached) a genuine 10x directory from sf0.1 with
   ``tools/make_scaled_sf.py --distinct`` semantics — distinct payloads
   per replica, so distinct-cardinality grows 10x too (the shape that
   exposes superlinear distinct-state growth).
2. Run ``bench.py`` against it (1 run/query — this is a growth-factor
   probe, not a latency gate) and write ``BENCH_SF1_r{N}.json`` with
   per-query growth factors vs the same-process sf0.1 run.

    python tools/bench_sf1.py            # round auto-detected
    python tools/bench_sf1.py --round 5
    python tools/bench_sf1.py --rebuild  # force re-scale of the data
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
SCALED_DIR = os.path.join(REPO, ".bench", "sf1d")
K = 10


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


def run_bench(sf_dir: str, runs: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_RUNS=str(runs),
               # probe passes must never clobber the repo's min-of-5
               # BENCH_LOCAL record (the base pass runs the full
               # headline at the canonical dir)
               SPARK_GRAFT_BENCH_NO_PERSIST="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO, env=env, capture_output=True, text=True,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(f"bench.py failed (rc={proc.returncode}) at {sf_dir}")
    # bench.py prints ONE JSON line (last non-empty line of stdout)
    return json.loads([l for l in proc.stdout.splitlines() if l.strip()][-1])


SKEW_QUERIES = ("sequence_packing", "balance_percentiles")


def ensure_skewed(src: str, dst: str, rebuild: bool) -> None:
    """A single-dominant-group variant of ``src``: 90 % of documents
    collapse to lang='en' and 90 % of customers to nation 0 — the
    adversarial shape for the two-phase rank/prefix operators (one
    corpus-scaled group). Other tables are passed through verbatim."""
    import shutil

    import duckdb

    marker = os.path.join(dst, "_SKEW_OK")
    if os.path.exists(marker) and not rebuild:
        return
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def rd(table: str) -> str:
        p = os.path.join(src, f"{table}.parquet")
        # scaled dirs are Spark-written parquet DIRECTORIES
        return f"{p}/*.parquet" if os.path.isdir(p) else p

    con.sql(
        f"""COPY (SELECT doc_id,
                         text,
                         CASE WHEN doc_id % 10 != 0 THEN 'en' ELSE lang END
                             AS lang,
                         source, n_chars
                  FROM read_parquet('{rd("documents")}'))
            TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.sql(
        f"""COPY (SELECT c_custkey, c_name,
                         CASE WHEN c_custkey % 10 != 0 THEN 0
                              ELSE c_nationkey END AS c_nationkey,
                         c_acctbal, c_mktsegment
                  FROM read_parquet('{rd("customer")}'))
            TO '{dst}/customer.parquet' (FORMAT PARQUET)"""
    )
    for p in glob.glob(os.path.join(src, "*.parquet")):
        name = os.path.basename(p)
        if name not in ("documents.parquet", "customer.parquet"):
            if os.path.isdir(p):
                shutil.copytree(p, os.path.join(dst, name),
                                dirs_exist_ok=True)
            else:
                shutil.copy(p, os.path.join(dst, name))
    with open(marker, "w") as f:
        f.write(f"src={src} skew=0.9\n")


def run_skew_probe() -> dict:
    """Time SKEW_QUERIES on (uniform, skewed) × (1x, 10x) in ONE Spark
    process; report skew penalty (skewed/uniform, same scale) and
    skewed 10x growth. Linear = the two-phase operators hold under a
    single dominant group; a window-per-group plan would serialize the
    hot group and blow both ratios up."""
    skew1 = os.path.join(REPO, ".bench", "sf01_skew")
    skew10 = os.path.join(REPO, ".bench", "sf1d_skew")
    ensure_skewed(SRC_SF, skew1, False)
    ensure_skewed(SCALED_DIR, skew10, False)

    import time

    sys.path.insert(0, REPO)
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark import plans
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.session import get_spark

    spark = get_spark("ai-tutor-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.all_queries()

    def t(name, sf_dir):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    out = {}
    for name in SKEW_QUERIES:
        u1, s1 = t(name, SRC_SF), t(name, skew1)
        u10, s10 = t(name, SCALED_DIR), t(name, skew10)
        out[name] = {
            "uniform_1x_s": u1, "skew_1x_s": s1,
            "uniform_10x_s": u10, "skew_10x_s": s10,
            "skew_penalty_1x": round(s1 / u1, 2),
            "skew_penalty_10x": round(s10 / u10, 2),
            "skew_growth_x": round(s10 / s1, 2),
        }
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--runs", type=int, default=1,
                    help="runs per query at sf1 (growth probe: 1)")
    ap.add_argument("--no-skew", action="store_true",
                    help="skip the single-dominant-group probe")
    args = ap.parse_args()
    rnd = args.round if args.round is not None else detect_round()

    ensure_scaled(args.rebuild)
    base = run_bench(SRC_SF, args.runs)
    scaled = run_bench(SCALED_DIR, args.runs)
    skew = None if args.no_skew else run_skew_probe()

    growth = {
        q: (round(scaled["queries"][q] / base["queries"][q], 2)
            if base["queries"].get(q) else None)
        for q in scaled["queries"]
    }
    artifact = {
        "metric": "sf1_distinct_growth",
        "round": rnd,
        "k": K,
        "src": SRC_SF,
        "runs": args.runs,
        "sf0_1_total_s": base["value"],
        "sf1_total_s": scaled["value"],
        "total_growth_x": round(scaled["value"] / base["value"], 2),
        "sf0_1_queries": base["queries"],
        "sf1_queries": scaled["queries"],
        "growth_x": growth,
        "superlinear": sorted(
            [q for q, g in growth.items() if g is not None and g > K],
            key=lambda q: -growth[q],
        ),
        "skew": skew,
    }
    path = os.path.join(REPO, f"BENCH_SF1_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("round", "sf0_1_total_s", "sf1_total_s",
                       "total_growth_x", "superlinear")}))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
