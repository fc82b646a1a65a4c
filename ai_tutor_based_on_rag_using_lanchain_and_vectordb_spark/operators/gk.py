"""Mergeable rank/quantile summaries (Greenwald–Khanna-style).

The fourth mergeable-summary family next to KMV (distinct/overlap),
Misra-Gries (heavy hitters) and Count-Min (point frequency): an
ε-approximate quantile SUMMARY that can be persisted per
partition/day/shard and merged later — the one thing
``percentile_approx`` cannot do (its sketch lives only inside a single
aggregation). At the 100 TB design point this is the difference
between re-scanning a year of data for every quantile refresh and
merging 365 tiny daily summaries.

Representation: entries ``(v, g, Δ)`` sorted by value, where
``r_min(i) = Σ_{j≤i} g_j`` and ``r_max(i) = r_min(i) + Δ_i`` bound the
rank of ``v_i`` in the summarized multiset (Greenwald & Khanna,
SIGMOD'01).  Every transformation here keeps those bounds VALID (they
are conservative rank intervals, never estimates):

- **summarize** a sorted block: keep every ⌈εn⌉-th element with its
  exact rank (g = gap, Δ = 0) plus both extremes — error ≤ ε.
- **merge** two summaries: interleave by value; a surviving entry's
  r_min adds the r_min of its predecessor from the other summary, its
  r_max adds the r_max of its successor's predecessor side
  (Agarwal et al., "Mergeable Summaries", PODS'12 combine rule) — the
  result bounds ranks in the union exactly as required, with error
  max(ε_a, ε_b).
- **compress**: greedily drop entries while the rank-interval gap
  between surviving neighbors stays ≤ 2·ε·n; dropped entries fold
  their g into the next survivor, so r_min/r_max of survivors are
  unchanged (still exact bounds).

Plan shape: values hash nothing and shuffle nothing — each input
partition folds its Arrow batches into one bounded summary
(mapInPandas, state O(1/ε) per partition regardless of partition
size), and the ≤ partitions·O(1/ε) summary rows reduce to one final
summary.  Queries then read off the summary alone.

No reference-repo counterpart (the reference has no quantile surface);
engine-side training-pipeline addition, same family as operators/kmv.py.
"""

from __future__ import annotations

import math
from typing import Iterator, List, Tuple

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# entry: (value, g, delta)
Entry = Tuple[float, int, int]


def summarize_sorted(vals: np.ndarray, eps: float) -> List[Entry]:
    """ε-summary of a sorted array with exact ranks (Δ = 0)."""
    n = len(vals)
    if n == 0:
        return []
    stride = max(1, int(math.floor(eps * n)))
    idx = list(range(0, n, stride))
    if idx[-1] != n - 1:
        idx.append(n - 1)
    out: List[Entry] = []
    prev_rank = 0
    for i in idx:
        rank = i + 1
        out.append((float(vals[i]), rank - prev_rank, 0))
        prev_rank = rank
    return out


def merge_two(a: List[Entry], b: List[Entry]) -> List[Entry]:
    """Combine two summaries; rank bounds stay valid for the union."""
    if not a:
        return list(b)
    if not b:
        return list(a)

    def prefix(entries):
        rmin, out = 0, []
        for v, g, d in entries:
            rmin += g
            out.append((v, rmin, rmin + d))
        return out  # (v, r_min, r_max)

    pa, pb = prefix(a), prefix(b)
    merged = []  # (v, r_min, r_max) in the union
    ia = ib = 0
    # last seen (r_min, r_max) of the OTHER summary strictly below v
    while ia < len(pa) or ib < len(pb):
        take_a = ib >= len(pb) or (ia < len(pa) and pa[ia][0] <= pb[ib][0])
        if take_a:
            v, rmin, rmax = pa[ia]
            ia += 1
            below_min = pb[ib - 1][1] if ib > 0 else 0
            # successor's r_max - 1 bounds how many other-side elements
            # can precede v; if no successor, all of B precedes
            above_max = (pb[ib][2] - 1) if ib < len(pb) else pb[-1][2]
        else:
            v, rmin, rmax = pb[ib]
            ib += 1
            below_min = pa[ia - 1][1] if ia > 0 else 0
            above_max = (pa[ia][2] - 1) if ia < len(pa) else pa[-1][2]
        merged.append((v, rmin + below_min, rmax + above_max))
    # back to (v, g, delta); enforce monotone r_min (interleaving can
    # give equal-value entries in either order)
    out: List[Entry] = []
    prev_rmin = 0
    for v, rmin, rmax in merged:
        rmin = max(rmin, prev_rmin + 1)
        rmax = max(rmax, rmin)
        out.append((v, rmin - prev_rmin, rmax - rmin))
        prev_rmin = rmin
    return out


def total_count(entries: List[Entry]) -> int:
    return sum(g for _, g, _ in entries)


def compress(entries: List[Entry], eps: float) -> List[Entry]:
    """Drop entries while surviving neighbors' rank-interval gap stays
    ≤ 2εn; survivors keep their exact r_min/r_max (dropped g folds
    into the next survivor)."""
    n = total_count(entries)
    if n == 0 or len(entries) <= 2:
        return list(entries)
    bound = max(1, int(math.floor(2 * eps * n)))
    out: List[Entry] = [entries[0]]
    pending_g = 0
    rmin_prev_kept = entries[0][1]
    rmin = entries[0][1]
    for i in range(1, len(entries) - 1):
        v, g, d = entries[i]
        rmin += g
        nxt = entries[i + 1]
        # if we drop entry i, the gap spans from the last kept entry's
        # r_min to the NEXT entry's r_max
        nxt_rmax = rmin + nxt[1] + nxt[2]
        if nxt_rmax - rmin_prev_kept <= bound:
            pending_g += g
        else:
            out.append((v, g + pending_g, d))
            pending_g = 0
            rmin_prev_kept = rmin
    last = entries[-1]
    out.append((last[0], last[1] + pending_g, last[2]))
    return out


def query(entries: List[Entry], q: float) -> float:
    """Value whose rank is within the summary's gap bound of ⌈q·n⌉."""
    n = total_count(entries)
    if n == 0:
        return float("nan")
    target = max(1, int(math.ceil(q * n)))
    rmin = 0
    best_v, best_err = entries[0][0], float("inf")
    for v, g, d in entries:
        rmin += g
        mid_err = abs((rmin + rmin + d) / 2.0 - target)
        if mid_err < best_err:
            best_err, best_v = mid_err, v
    return best_v


def max_gap(entries: List[Entry]) -> int:
    """max_i (g_i + Δ_i) — the GK invariant and query-error
    certificate: r_max(i+1) − r_min(i) = g_{i+1} + Δ_{i+1}, so any
    rank query is answered within max_gap/2 + 1 ranks."""
    return max((g + d for _, g, d in entries), default=0)


def _fold_batches(eps: float):
    """Per-partition bounded-state fold: summarize each Arrow batch,
    merge into the running summary, compress — state stays O(1/ε)
    however large the partition is."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        acc: List[Entry] = []
        for pdf in batches:
            vals = pdf["v"].to_numpy(dtype=np.float64)
            vals = np.sort(vals[~np.isnan(vals)])
            if not len(vals):
                continue
            acc = compress(merge_two(acc, summarize_sorted(vals, eps / 2)), eps / 2)
        yield pd.DataFrame(
            {
                "v": [e[0] for e in acc],
                "g": [e[1] for e in acc],
                "delta": [e[2] for e in acc],
            }
        )

    return run


def gk_sketch(df: DataFrame, col: str, eps: float) -> DataFrame:
    """Final merged ε-summary of ``df[col]`` as rows (v, g, delta) in
    value order. One pass, no shuffle of the data: partition folds →
    ≤ partitions·O(1/ε) summary rows → single bounded merge task."""
    vals = df.select(F.col(col).cast("double").alias("v")).where(
        F.col(col).isNotNull()
    )
    partials = vals.withColumn("_pid", F.spark_partition_id()).mapInPandas(
        _part_fold(eps), "v double, g long, delta long, _pid int"
    )

    import pandas as pd

    def merge_all(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc: List[Entry] = []
        for _, sub in pdf.groupby("_pid", sort=True):
            sub = sub.sort_values("v", kind="mergesort")
            entries = list(
                zip(sub["v"].tolist(), sub["g"].tolist(), sub["delta"].tolist())
            )
            acc = compress(merge_two(acc, entries), eps / 2)
        return pd.DataFrame(
            {
                "v": [e[0] for e in acc],
                "g": [e[1] for e in acc],
                "delta": [e[2] for e in acc],
            }
        )

    # single bounded merge task: input is ≤ partitions·O(1/ε) rows by
    # construction (each partition already folded), never corpus rows
    return (
        partials.groupBy(F.lit(0).alias("_k"))
        .applyInPandas(merge_all, "v double, g long, delta long")
    )


def _part_fold(eps: float):
    import pandas as pd

    inner = _fold_batches(eps)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pid = [None]

        def strip(bs):
            for pdf in bs:
                if len(pdf) and pid[0] is None:
                    pid[0] = int(pdf["_pid"].iloc[0])
                yield pdf

        for out in inner(strip(batches)):
            out["_pid"] = pid[0] if pid[0] is not None else 0
            yield out

    return run


def _group_fold(eps: float):
    """Per-partition per-GROUP bounded fold (the grouped analogue of
    ``_fold_batches``): state is O(groups-seen-in-partition · 1/ε)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        state: dict = {}
        pid = [0]
        for pdf in batches:
            if len(pdf):
                pid[0] = int(pdf["_pid"].iloc[0])
            for gval, sub in pdf.groupby("_g", sort=False):
                vals = sub["v"].to_numpy(dtype=np.float64)
                vals = np.sort(vals[~np.isnan(vals)])
                if not len(vals):
                    continue
                acc = state.get(gval, [])
                state[gval] = compress(
                    merge_two(acc, summarize_sorted(vals, eps / 2)), eps / 2
                )
        rows = {"_g": [], "v": [], "g": [], "delta": [], "_pid": []}
        for gval, entries in state.items():
            for v, g, d in entries:
                rows["_g"].append(gval)
                rows["v"].append(v)
                rows["g"].append(g)
                rows["delta"].append(d)
                rows["_pid"].append(pid[0])
        yield pd.DataFrame(rows)

    return run


def gk_sketch_grouped(
    df: DataFrame, group_col: str, col: str, eps: float
) -> DataFrame:
    """Per-group ε-summaries: rows (group, v, g, delta) — the grouped
    analogue of :func:`gk_sketch`, same shape as
    ``operators/kmv.kmv_sketch_grouped``. Partition folds keep bounded
    per-group state; the final per-group merge is an ``applyInPandas``
    over the group key whose input is ≤ partitions·O(1/ε) rows per
    group by construction (each partition already folded). Persisting
    these rows per day/shard gives re-aggregatable quantile rollups:
    any group's summary for any day-range is one merge away, no
    re-scan."""
    import pandas as pd

    gtype = df.schema[group_col].dataType.simpleString()
    vals = df.select(
        F.col(group_col).alias("_g"),
        F.col(col).cast("double").alias("v"),
        F.spark_partition_id().alias("_pid"),
    ).where(F.col(col).isNotNull() & F.col(group_col).isNotNull())
    partials = vals.mapInPandas(
        _group_fold(eps), f"_g {gtype}, v double, g long, delta long, _pid int"
    )

    def merge_group(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        acc: List[Entry] = []
        for _, sub in pdf.groupby("_pid", sort=True):
            sub = sub.sort_values("v", kind="mergesort")
            entries = list(
                zip(sub["v"].tolist(), sub["g"].tolist(), sub["delta"].tolist())
            )
            acc = compress(merge_two(acc, entries), eps / 2)
        return pd.DataFrame(
            {
                "_g": [key[0]] * len(acc),
                "v": [e[0] for e in acc],
                "g": [e[1] for e in acc],
                "delta": [e[2] for e in acc],
            }
        )

    return (
        partials.groupBy("_g")
        .applyInPandas(merge_group, f"_g {gtype}, v double, g long, delta long")
        .withColumnRenamed("_g", group_col)
    )
