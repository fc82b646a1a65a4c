"""Query plans: each module exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE: dict[str, str]`` — DuckDB-ANSI SQL equivalents (subset; ops
  that aren't SQL-expressible get rows-only checks from the driver).

Column names are aliased identically on both sides (the driver's
comparator sorts columns by name before hashing). Float aggregates are
rounded identically on both sides so value-hashes match despite
summation-order differences.
"""

from . import curation, documents, misc, pipeline, relational, tpch_extra, vectors

ALL_MODULES = (relational, documents, vectors, misc, curation, pipeline, tpch_extra)


def all_queries():
    out = {}
    for m in ALL_MODULES:
        out.update(m.QUERIES)
    return out


def all_oracle_sql():
    out = {}
    for m in ALL_MODULES:
        out.update(m.ORACLE)
    return out
