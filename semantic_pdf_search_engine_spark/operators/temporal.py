"""Temporal joins over event streams — the as-of join.

`asof_join` matches every left row to the LATEST right row with
right.ts ≤ left.ts within the same key — the canonical hypertable /
market-data operation (DuckDB ships it as ASOF JOIN, which is exactly
the oracle twin used by the registry).

Spark-first plan (no native asof operator): the classic union-tag
composition —

  1. tag right rows _side=0, left rows _side=1, union;
  2. ONE shuffle: window partitionBy(key) orderBy(ts, _side, tiebreak);
  3. last(right payload, ignorenulls=True) over rows UNBOUNDED
     PRECEDING..CURRENT carries the latest right value forward;
  4. keep left rows.

At equal timestamps the right row sorts FIRST (_side 0 < 1), giving the
inclusive (≥) semantics ASOF uses; among duplicate right timestamps the
highest tiebreak column wins (deterministic). Cost: one shuffle+sort of
|L|+|R| rows per key — the same asymptotics as a sort-merge join, with
no range-explosion (a naive range join would fan out |L|×|matching R|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: tuple[str, ...] = ("event_id", "value"),
    tiebreak: str | None = None,
) -> DataFrame:
    """Left rows + `r_<col>` columns from the latest right row with
    right.ts ≤ left.ts in the same `by` group (nulls where no right row
    precedes). `tiebreak` orders duplicate right timestamps
    deterministically (defaults to the first right_cols entry)."""
    tiebreak = tiebreak or right_cols[0]
    l = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        *by,
        ts_col,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col(f"r_{tiebreak}").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # all carries in ONE projection against the original columns (a
    # sequential withColumn would re-window over already-carried values)
    keep = [c for c in u.columns if c != "_side" and not c.startswith("r_")]
    carried = [
        F.last(f"r_{c}", ignorenulls=True).over(w).alias(f"r_{c}")
        for c in right_cols
    ]
    return (
        u.select(*keep, "_side", *carried)
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    window_sec: int = 300,
    right_cols: tuple[str, ...] = ("event_id", "value"),
) -> DataFrame:
    """All (left, right) pairs in the same `by` group with
    |right.ts − left.ts| ≤ window_sec — a RANGE join done scale-safe.

    A naive theta join (l.user = r.user AND abs(Δt) ≤ w) degenerates to
    a per-key cartesian product in Spark (BroadcastNestedLoop at best).
    The standard fix: bin timestamps to window-sized buckets and
    equality-join on (key, bin) with the right side EXPLODED to its
    bin ± 1 — every qualifying pair shares one of those bins, so the
    join is a plain hash join with ≤3× right-side duplication, then an
    exact |Δt| filter and no dedup needed (bins partition pairs:
    exactly one right-bin copy matches each left bin)."""
    lbin = (F.unix_timestamp(F.col(ts_col)) / window_sec).cast("long")
    l = left.withColumn("_bin", lbin)
    r = right.select(
        *by,
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
        F.explode(
            F.array(
                (F.unix_timestamp(F.col(ts_col)) / window_sec).cast("long") - 1,
                (F.unix_timestamp(F.col(ts_col)) / window_sec).cast("long"),
                (F.unix_timestamp(F.col(ts_col)) / window_sec).cast("long") + 1,
            )
        ).alias("_bin"),
    )
    return (
        l.join(r, [*by, "_bin"])
        .filter(
            F.abs(
                F.unix_timestamp(F.col("_rts")) - F.unix_timestamp(F.col(ts_col))
            )
            <= window_sec
        )
        .drop("_bin", "_rts")
    )
