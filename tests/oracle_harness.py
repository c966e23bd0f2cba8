"""Local replica of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL, sort columns by name, sort rows, and compare
values (exact for non-floats, tolerant for floats). Catching a mismatch
here means catching it before the driver does.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [columns[i] for i in order], out


def _cells_equal(a, b, rel_tol=1e-12, abs_tol=1e-12):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=rel_tol, abs_tol=abs_tol)
        except (TypeError, ValueError):
            return False
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare_query(spark_df, duck_con, sql: str, max_report: int = 5):
    """Returns (ok, message). Row counts must match exactly; values are
    compared after column-name sort + row sort with float tolerance."""
    spark_cols = list(spark_df.columns)
    spark_rows = [tuple(r) for r in spark_df.collect()]
    duck_res = duck_con.sql(sql)
    duck_cols = list(duck_res.columns)
    duck_rows = duck_res.fetchall()

    # The driver hashes TYPED values: DuckDB's bare SUM() over integers
    # returns HUGEINT (int128), which hash-mismatches Spark's BIGINT even
    # when every value is identical (the r04 events_json_extract /
    # key_skew_profile / boilerplate_chunk_stats failures). Values compare
    # equal below, so this must be a hard type-level check.
    duck_types = [str(t).upper() for t in duck_res.types]
    huge = [c for c, t in zip(duck_cols, duck_types) if "HUGEINT" in t]
    if huge:
        return False, (
            f"oracle returns HUGEINT column(s) {huge}: wrap in "
            "CAST(... AS BIGINT) — the driver's typed hasher mismatches int128"
        )

    if sorted(spark_cols) != sorted(duck_cols):
        return False, f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(spark_rows) != len(duck_rows):
        return False, f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"

    _, s_rows = _norm_rows(spark_cols, spark_rows)
    _, d_rows = _norm_rows(duck_cols, duck_rows)
    bad = []
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        if not all(_cells_equal(a, b) for a, b in zip(sr, dr)):
            bad.append((i, sr, dr))
            if len(bad) >= max_report:
                break
    if bad:
        return False, "value mismatches: " + "; ".join(
            f"row {i}: spark={sr} duck={dr}" for i, sr, dr in bad
        )
    return True, f"ok ({len(spark_rows)} rows)"
