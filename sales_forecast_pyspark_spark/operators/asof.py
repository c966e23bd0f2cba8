"""Point-in-time (as-of) join — a time-series operator the reference's
notebook never needed (it joins on exact (country, stock, date) keys,
``Sales_forecast_pyspark.py:1308-1317``) but any event-to-state
enrichment at scale does: attach, to each left row, the columns of the
most recent right row at-or-before its timestamp (or at-or-after, for
``direction="forward"``) sharing the join key.

Spark has no ASOF JOIN (pandas-on-Spark ``merge_asof`` exists but pulls
both sides through its own plan rewrite); DuckDB does, which makes the
operator oracle-checkable. The distributed shape used here is the
union-then-window trick:

1. tag right rows 0 and left rows 1, right's payload columns nulled on
   the left side;
2. one window per join key ordered by ``(time, tag, order)`` with a
   cumulative ``last(payload, ignorenulls=True)`` — right rows deposit
   state, left rows read it;
3. keep only left rows.

That is ONE shuffle + sort on the join key and O(1) running state per
row — no per-row subquery, no range self-join, no candidate explosion.
Skew bound = rows per key, the same caveat as the window layer
(``operators/windows.py``). Ties: a right row at exactly the left time
matches (inclusive, like DuckDB's ``ASOF JOIN`` ``>=``); among several
right rows at the matched time the one with the greatest ``right_order``
wins — pass a unique order column for deterministic results.

``tolerance`` bounds the lookback (backward) / lookahead (forward): a
match farther than ``tolerance`` from the left time is nulled out,
mirroring ``pandas.merge_asof(tolerance=...)``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TIME = "__asof_t"
_ORD = "__asof_ord"
_ROW = "__asof_row"
_RT = "__asof_rt"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str | None = None,
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    right_order: str | None = None,
    matched_time_col: str | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus ``value_cols`` from the
    closest right row at-or-before (``backward``) / at-or-after
    (``forward``) its time on the same key; nulls when no such row.

    ``tolerance``: an interval/numeric Column (e.g.
    ``F.expr("INTERVAL 7 DAYS")``) — matches farther than this from the
    left time come back null. ``right_order`` breaks ties among right
    rows sharing (key, time) — greatest wins; defaults to ``right_time``
    (pass a unique column when right times can collide).
    ``matched_time_col``: also attach the matched right time under this
    name. Left rows with a null time never match (they sort before any
    right row). Null join keys group together, as in ``groupBy``."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    right_time = right_time or left_time
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]
    value_cols = list(value_cols)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns; alias them "
            "on the right side first"
        )
    order_col = right_order or right_time

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_time).alias(_TIME),
        F.col(right_time).alias(_RT),
        F.col(order_col).alias(_ORD),
        F.lit(0).alias(_SIDE),
        F.lit(None).alias(_ROW),
        *[F.col(c) for c in value_cols],
    )
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias(_TIME),
        F.lit(None).cast(r.schema[_RT].dataType).alias(_RT),
        F.lit(None).cast(r.schema[_ORD].dataType).alias(_ORD),
        F.lit(1).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias(_ROW),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in value_cols],
    )
    u = r.unionByName(l.select(r.columns))

    if direction == "backward":
        ordering = [F.col(_TIME).asc(), F.col(_SIDE).asc(), F.col(_ORD).asc()]
    else:
        ordering = [F.col(_TIME).desc(), F.col(_SIDE).asc(), F.col(_ORD).asc()]
    win = (
        Window.partitionBy(*keys)
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attached = [F.last(F.col(c), ignorenulls=True).over(win).alias(c) for c in value_cols]
    rt = F.last(F.col(_RT), ignorenulls=True).over(win).alias(_RT)
    w = u.select(_SIDE, _TIME, _ROW, rt, *attached).filter(F.col(_SIDE) == 1)

    if tolerance is not None:
        if direction == "backward":
            in_range = F.col(_RT) >= F.col(_TIME) - tolerance
        else:
            in_range = F.col(_RT) <= F.col(_TIME) + tolerance
        w = w.select(
            _TIME,
            _ROW,
            F.when(in_range, F.col(_RT)).alias(_RT),
            *[F.when(in_range, F.col(c)).alias(c) for c in value_cols],
        )
    out = [F.col(f"{_ROW}.{c}").alias(c) for c in left.columns]
    if matched_time_col is not None:
        out.append(F.col(_RT).alias(matched_time_col))
    return w.select(*out, *value_cols)
