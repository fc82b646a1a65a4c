"""Capture ``explain("formatted")`` for headline queries into
plans/<tag>/<query>_<suffix>.txt — the before/after plan evidence the
optimization rounds commit (the judge checks plan claims against these).

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
       (no query args = the full bench HEADLINE list)
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
    outdir = os.path.join(_REPO_ROOT, "plans", tag)
    os.makedirs(outdir, exist_ok=True)

    import bench
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark import plans
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.session import (
        get_spark,
    )

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    all_queries = plans.all_queries()
    names = sys.argv[3:] or bench.HEADLINE
    for name in names:
        if name not in all_queries:
            print(f"skip {name} (bench-only wiring)", file=sys.stderr)
            continue
        df = all_queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
