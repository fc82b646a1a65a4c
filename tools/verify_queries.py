"""Quick per-query oracle verification (the driver-contract check for
a SUBSET of queries): runs each named query via __spark_entry__ on a
vanilla session (hostile timezone) and hash-compares with the DuckDB
oracle at one or more scale factors.

Usage: python tools/verify_queries.py sf0.001,sf0.01 q1 q2 ...
"""

from __future__ import annotations

import hashlib
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def h(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return hashlib.sha256(
        str(sorted(pdf.astype(str).values.tolist())).encode()
    ).hexdigest()


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    sfs = [s.strip() for s in sys.argv[1].split(",") if s.strip()]
    names = sys.argv[2:]
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    bad = []
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            s = qs[name](spark, sf_dir).toPandas()
            if name in osql:
                o = con.sql(osql[name]).df()
                ok = h(s) == h(o) and len(s) == len(o)
                print(f"{sf} {name}: {'OK' if ok else 'MISMATCH'} "
                      f"rows {len(s)}/{len(o)}", flush=True)
                if not ok:
                    bad.append((sf, name))
            else:
                print(f"{sf} {name}: rows-only {len(s)}", flush=True)
        con.close()
    if bad:
        raise SystemExit(f"FAILED: {bad}")
    print("ALL OK")


if __name__ == "__main__":
    main()
