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


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    right_cols: tuple[str, ...] = ("event_id", "value"),
    tiebreak: str | None = None,
    bucket_sec: int = 3600,
) -> DataFrame:
    """`asof_join` with HOT-KEY SKEW handling: identical output (pinned
    by test), but each key's rows are split into time buckets so a
    celebrity key is sorted by MANY tasks instead of one.

    The plain union-tag plan sorts each key group in a single task —
    at 100 TB a hot user serializes. Here:

      1. right rows get `_tbk = floor(epoch/bucket_sec)`; per
         (key, bucket) the LATEST right payload is an aggregate
         (max of struct(ts, tiebreak, payload) — the same dedup order
         the base window uses);
      2. a bucket spine (distinct (key, bucket) from BOTH sides) gets a
         running carry-in: last non-null per-bucket payload over
         STRICTLY EARLIER buckets (a window over per-bucket rows — rows
         per key = #buckets, not #events);
      3. the carry-in is injected as a SEED row (null ts → sorts first)
         into each (key, bucket) group, and the base union-tag window
         runs partitioned by (key, bucket) — task size is now
         O(rows per key per bucket_sec).

    Left rows with a NULL ts land in the null bucket, which precedes
    every bucket in the carry ordering and so carries nothing — same
    null-payload result as the base plan. Cost: one extra aggregate +
    one tiny spine window over the 1-shuffle base plan; use when key
    skew is real, the base `asof_join` otherwise."""
    reserved = {"_payload", "_side", "_tbk", "_bp", "_carry"}
    collisions = [c for c in left.columns if c.startswith("r_") or c in reserved]
    if collisions:
        raise ValueError(
            f"left columns {collisions} collide with reserved names "
            "(r_*/_payload/_side/_tbk); rename them first"
        )
    tiebreak = tiebreak or right_cols[0]

    def _epoch(c):
        return F.col(c).cast("timestamp").cast("double")

    tbk = F.floor(_epoch(ts_col) / bucket_sec)
    l = left.withColumn("_side", F.lit(1)).withColumn("_tbk", tbk)
    r = right.filter(F.col(ts_col).isNotNull())
    for key in by:
        r = r.filter(F.col(key).isNotNull())
    r = r.select(
        *by,
        ts_col,
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c).alias(f"r_{c}") for c in right_cols]).alias("_payload"),
    ).withColumn("_tbk", tbk)

    # per-(key, bucket) latest right payload, then running carry-in
    rb = r.groupBy(*by, "_tbk").agg(
        F.max(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(f"_payload.r_{tiebreak}").alias("tb"),
                F.col("_payload").alias("p"),
            )
        )["p"].alias("_bp")
    )
    spine = (
        l.select(*by, "_tbk").union(r.select(*by, "_tbk")).distinct()
    )
    wseq = (
        Window.partitionBy(*by)
        .orderBy(F.col("_tbk").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ts_type = left.schema[ts_col].dataType
    seeds = (
        spine.join(rb, [*by, "_tbk"], "left")
        .select(
            *by,
            "_tbk",
            F.last("_bp", ignorenulls=True).over(wseq).alias("_payload"),
        )
        .withColumn("_side", F.lit(-1))
        .withColumn(ts_col, F.lit(None).cast(ts_type))
    )

    u = l.unionByName(r, allowMissingColumns=True).unionByName(
        seeds, allowMissingColumns=True
    )
    w = (
        Window.partitionBy(*by, "_tbk")
        .orderBy(
            F.col(ts_col).asc(),  # nulls first: seeds precede everything
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


def sessionize(
    events: DataFrame,
    gap_sec: int = 1800,
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    id_col: str = "event_id",
) -> DataFrame:
    """Add (session_id, session_seq): classic gaps-and-islands
    sessionization — a new session starts whenever the gap to the
    previous event in the same `by` group exceeds gap_sec. session_id
    is 0-based per key in time order; session_seq is the 0-based event
    position within its session. Deterministic under the (ts, id)
    ordering; fractional-epoch arithmetic (same rationale as
    range_join_binned). Fully SQL-expressible (lag + windowed sum) →
    hard DuckDB oracle in the registry.

    Cost: ONE shuffle + per-key window sort — the same plan/skew
    profile as asof_join (a hot key sorts in one task; the
    asof_join_bucketed carry pattern applies if that ever binds, with
    per-bucket session counts prefix-summed over the bucket spine)."""
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_sec), F.lit(1)
    ).otherwise(F.lit(0))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = events.withColumn("_ns", new_session).withColumn(
        "session_id", (F.sum("_ns").over(wrun) - 1).cast("long")
    )
    wsess = Window.partitionBy(*by, "session_id").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return out.withColumn(
        "session_seq", (F.row_number().over(wsess) - 1).cast("long")
    ).drop("_ns")


def sessionize_bucketed(
    events: DataFrame,
    gap_sec: int = 1800,
    ts_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    id_col: str = "event_id",
    bucket_sec: int = 86400,
) -> DataFrame:
    """`sessionize` with HOT-KEY SKEW handling — identical output
    (pinned by test), but each key's events are windowed per
    (key, time-bucket) with the cross-bucket state carried by a
    bucket-spine prefix sum (the same decomposition as
    asof_join_bucketed):

      1. within each (key, bucket): internal new-session flags (first
         row's flag deferred — it depends on the previous bucket) and a
         local running count;
      2. per-bucket aggregate (first_ts, last_ts, n_internal) feeds a
         tiny per-key spine window (#buckets rows): resolve each
         bucket's first-row flag against the previous bucket's last_ts
         and prefix-sum sessions started in earlier buckets;
      3. session_id = offset + first_flag + local_cum − 1, joined back
         on (key, bucket).

    session_seq is computed per (key, session_id) — parallel across
    sessions; only a single never-gapping session spanning the whole
    key would serialize that last step. Null-ts events each form their
    own session (matching the base operator) via the null bucket, which
    sorts first on the spine."""
    reserved = {"_tbk", "_if", "_lc", "_ff", "_off", "session_id", "session_seq"}
    collisions = [c for c in events.columns if c in reserved]
    if collisions:
        raise ValueError(
            f"columns {collisions} collide with reserved names; rename first"
        )
    epoch = F.col(ts_col).cast("timestamp").cast("double")
    # null ts → a sentinel bucket BELOW every real bucket (it must sort
    # first on the spine AND survive the equality join back — a NULL
    # bucket key would never match itself under SQL join semantics)
    _NULL_BUCKET = -(2**62)
    e = events.withColumn(
        "_tbk", F.coalesce(F.floor(epoch / bucket_sec), F.lit(_NULL_BUCKET))
    )

    wb = Window.partitionBy(*by, "_tbk").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gap = epoch - F.lag(epoch).over(wb)
    # first row in bucket: lag null AND ts may be null — defer to spine;
    # rows 2..n: new session iff gap > G, or gap null (null-ts runs)
    internal = F.when(
        F.lag(F.col(id_col)).over(wb).isNull(), F.lit(0)
    ).otherwise(F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0))
    e = e.withColumn("_if", internal).withColumn(
        "_lc",
        F.sum("_if").over(wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

    buckets = e.groupBy(*by, "_tbk").agg(
        F.min(epoch).alias("_first"),
        F.max(epoch).alias("_last"),
        F.sum("_if").alias("_ni"),
    )
    ws = Window.partitionBy(*by).orderBy(F.col("_tbk").asc())
    prev_last = F.lag("_last").over(ws)
    first_flag = F.when(
        prev_last.isNull()
        | F.col("_first").isNull()
        | ((F.col("_first") - prev_last) > gap_sec),
        F.lit(1),
    ).otherwise(F.lit(0))
    spine = buckets.withColumn("_ff", first_flag).withColumn(
        "_off",
        F.coalesce(
            F.sum(F.col("_ff") + F.col("_ni")).over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    joined = e.join(
        spine.select(*by, "_tbk", "_ff", "_off"), [*by, "_tbk"]
    ).withColumn(
        "session_id",
        (F.col("_off") + F.col("_ff") + F.col("_lc") - 1).cast("long"),
    )
    wsess = Window.partitionBy(*by, "session_id").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    return (
        joined.withColumn(
            "session_seq", (F.row_number().over(wsess) - 1).cast("long")
        )
        .drop("_tbk", "_if", "_lc", "_ff", "_off")
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
