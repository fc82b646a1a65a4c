"""Measure the eTLD+1 expression-vs-broadcast-join crossover for
Q(domain_curation) (round-12 VERDICT ask #2).

Both forms implement the identical public-suffix algorithm over the
checked-in ~100-rule snapshot (functions/url.py, equivalence-tested);
they differ only physically: literal IN lists inside one codegen span
vs one small broadcast left join per (kind, label-count) tier. This
tool isolates exactly that step: the WARC-landed host frame is
materialized ONCE per scale (the roundtrip is common to both forms),
then each form runs the full downstream curation (domain → blocklist
anti-join → per-domain cap) min-of-N to a noop sink.

    python tools/bench_psl_forms.py                 # sf0.1 + .bench/sf1d
    python tools/bench_psl_forms.py /path/to/sf ... # explicit dirs
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.catalog import (  # noqa: E402
    load_table,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.functions.url import (  # noqa: E402
    registrable_domain,
    registrable_domain_join,
    url_host,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.plans.pipeline import (  # noqa: E402
    CURATION_BLOCKLIST,
    DOMAIN_CAP,
    _curation_url_col,
)
from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.session import (  # noqa: E402
    get_spark,
)

RUNS = 3


def _downstream(spark, parsed):
    from pyspark.sql import Window

    blocklist = spark.createDataFrame(
        [(d,) for d in CURATION_BLOCKLIST], "domain string"
    )
    allowed = parsed.join(F.broadcast(blocklist), "domain", "left_anti")
    w = Window.partitionBy("domain").orderBy("doc_id")
    return (
        allowed.withColumn("dom_rank", F.row_number().over(w).cast("long"))
        .where(F.col("dom_rank") <= DOMAIN_CAP)
        .select("doc_id", "host", "domain", "dom_rank")
    )


def _time(df) -> float:
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.monotonic()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return round(best, 3)


def bench_dir(spark, sf_dir: str) -> dict:
    from ai_tutor_based_on_rag_using_lanchain_and_vectordb_spark.sources import (
        warc as W,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "url", _curation_url_col()
    )
    out_dir = tempfile.mkdtemp(prefix="psl_bench_warc_")
    host_dir = tempfile.mkdtemp(prefix="psl_bench_hosts_")
    try:
        W.write_warc_shards(docs, out_dir, n_shards=4, shard_key="doc_id",
                            url_col="url")
        landed = W.wet_documents(spark, out_dir, with_uri=True)
        landed.select(
            "doc_id", url_host(F.col("url")).alias("host")
        ).write.mode("overwrite").parquet(host_dir)
        hosts = spark.read.parquet(host_dir)
        n = hosts.count()

        expr_df = _downstream(
            spark,
            hosts.withColumn("domain", registrable_domain(F.col("host"))),
        )
        join_df = _downstream(
            spark, registrable_domain_join(hosts, "host", "domain")
        )
        r = {
            "sf_dir": sf_dir,
            "rows": n,
            "expression_sec": _time(expr_df),
            "join_sec": _time(join_df),
        }
        r["ratio_join_over_expr"] = round(
            r["join_sec"] / max(r["expression_sec"], 1e-9), 3
        )
        return r
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(host_dir, ignore_errors=True)


def main() -> None:
    dirs = sys.argv[1:] or [
        "/root/testdata/sf0.1",
        os.path.join(REPO, ".bench", "sf1d"),
    ]
    spark = get_spark()
    out = [bench_dir(spark, d) for d in dirs if os.path.isdir(d)]
    print(json.dumps({"psl_forms": out}))


if __name__ == "__main__":
    main()
