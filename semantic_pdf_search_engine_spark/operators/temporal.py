"""Temporal joins over event streams — as-of join and range join.

`asof_join` matches every left row to the LATEST right row with
right.ts ≤ left.ts within the same key — the canonical hypertable /
market-data operation (DuckDB ships it as ASOF JOIN, which is exactly
the oracle twin used by the registry).

Spark-first plan (no native asof operator): the classic union-tag
composition —

  1. tag right rows _side=0, left rows _side=1, union;
  2. ONE shuffle: window partitionBy(key) orderBy(ts, _side, tiebreak);
  3. last(right payload STRUCT, ignorenulls=True) over rows UNBOUNDED
     PRECEDING..CURRENT carries the latest right ROW forward — the
     payload travels as one struct so a NULL field inside the matched
     row stays NULL (per-column carries would backfill it from an
     older row, fabricating a row that never existed);
  4. keep left rows, unpack the struct.

At equal timestamps the right row sorts FIRST (_side 0 < 1), giving the
inclusive (≥) semantics ASOF uses. Duplicate right (key, ts) rows
resolve DETERMINISTICALLY to the highest tiebreak value (DuckDB ASOF
leaves the pick unspecified — oracle parity needs unique (key, ts) on
the right, or the same dedup applied on both sides). Right rows with a
NULL key are excluded (SQL join equality never matches NULL; the window
partitioner would). Cost: one shuffle+sort of |L|+|R| rows per key —
sort-merge-join asymptotics, no range fan-out.
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
    reserved = {"_payload", "_side"}
    collisions = [
        c for c in left.columns if c.startswith("r_") or c in reserved
    ]
    if collisions:
        raise ValueError(
            f"left columns {collisions} collide with reserved names "
            "(r_*/_payload/_side); rename them first"
        )
    tiebreak = tiebreak or right_cols[0]
    l = left.withColumn("_side", F.lit(1))
    # SQL comparison semantics: a NULL key never matches (the window
    # partitioner would group them) and a NULL right ts never satisfies
    # right.ts <= left.ts (asc-null-first ordering would carry it as a
    # phantom match for every early left row)
    r = right.filter(F.col(ts_col).isNotNull())
    for key in by:
        r = r.filter(F.col(key).isNotNull())
    r = r.select(
        *by,
        ts_col,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(f"r_{c}") for c in right_cols]).alias("_payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*by)
        .orderBy(
            F.col(ts_col).asc(),
            F.col("_side").asc(),
            F.col(f"_payload.r_{tiebreak}").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = [c for c in left.columns]
    carried = F.last("_payload", ignorenulls=True).over(w).alias("_payload")
    return (
        u.select(*keep, "_side", carried)
        .filter(F.col("_side") == 1)
        .select(*keep, *[F.col(f"_payload.r_{c}").alias(f"r_{c}") for c in right_cols])
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
    exactly one right-bin copy matches each left bin).

    Time arithmetic is FRACTIONAL epoch seconds (timestamp cast to
    double — microsecond precision), matching DuckDB's epoch(); a
    whole-second floor (unix_timestamp) would admit pairs whose true
    |Δt| lies in (window, window+1) and break both the documented
    contract and the oracle."""
    reserved = {"_bin", "_repoch"}
    collisions = [
        c for c in left.columns if c.startswith("r_") or c in reserved
    ]
    if collisions:
        raise ValueError(
            f"left columns {collisions} collide with reserved names "
            "(r_*/_bin/_repoch); rename them first"
        )
    # NTZ timestamps cannot cast to double directly; route through
    # TIMESTAMP (session tz pinned UTC) — same instant DuckDB's naive
    # epoch() sees, with microsecond fraction preserved
    def _epoch(c):
        return F.col(c).cast("timestamp").cast("double")

    epoch_l = _epoch(ts_col)
    l = left.withColumn("_bin", F.floor(epoch_l / window_sec))
    rbin = F.floor(_epoch(ts_col) / window_sec)
    r = right.select(
        *by,
        _epoch(ts_col).alias("_repoch"),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
        F.explode(F.array(rbin - 1, rbin, rbin + 1)).alias("_bin"),
    )
    return (
        l.join(r, [*by, "_bin"])
        .filter(F.abs(F.col("_repoch") - epoch_l) <= window_sec)
        .drop("_bin", "_repoch")
    )
