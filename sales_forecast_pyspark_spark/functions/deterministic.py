"""Cross-engine-deterministic aggregation helpers.

Floating-point sums are order-dependent, and money values (2-decimal
doubles) land EXACTLY on rounding boundaries, so ``round(sum(double), 2)``
differs between Spark and any external oracle whenever partial-aggregation
order differs. The fix: aggregate in DECIMAL (exact, associative,
order-independent), cast to double only AFTER the aggregate, and do any
scalar arithmetic (division, rounding) on the now-identical doubles.

These helpers are used by every oracle-checked query; they also make
Spark's own results stable across partition counts / AQE re-plans —
valuable at 100 TB where partial-agg order is never reproducible.

Integer-valued doubles (counts, quantities up to 2^53) sum exactly in
any order and need no decimal detour.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(expr: Column, scale: int = 6, precision: int = 30) -> Column:
    """Order-independent sum: round-trip each value through DECIMAL.

    ``scale`` must cover the input's true decimal precision (2 for money,
    4-6 for rates/ratios); values are exact at that scale so the decimal
    cast is lossless and the sum is exact.
    """
    return F.sum(expr.cast(f"decimal({precision},{scale})")).cast("double")


def money_sum(expr: Column, digits: int = 2, scale: int = 6) -> Column:
    """``round(sum(money_expr), digits)`` computed exactly.

    The ROUND happens in DECIMAL (exact half-away-from-zero in both Spark
    and DuckDB — verified bitwise over 60k groups), never on a double:
    money sums land EXACTLY on .xx5 boundaries, where double-round
    algorithms disagree.
    """
    return F.round(F.sum(expr.cast(f"decimal(30,{scale})")), digits).cast("double")


def weighted_sum(
    a: Column, b: Column, scale: int = 7, precision: int = 15, out_digits: int = 4
) -> Column:
    """Order-independent ``sum(a * b)`` for doubles.

    Multiplying two doubles then casting the product to decimal is NOT
    cross-engine-safe: Spark casts via the shortest decimal string
    (HALF_UP) while e.g. DuckDB rounds the exact binary value, and
    products routinely land on tie boundaries where the two disagree.
    Instead each FACTOR is rounded at ``scale`` — safe when the factor's
    value set is either exactly-representable at that scale or
    non-terminating (17-significant-digit shortest reprs), which holds
    for small-denominator window means and decimal-derived averages —
    then multiplied in decimal (exact: (15,7)×(15,7) → (31,14) fits
    without precision loss; the sum widens to (38,14)) and summed exactly.

    The exact sum is rounded to ``out_digits`` IN DECIMAL before the
    double cast: casting a 14-scale decimal to double is not correctly
    rounded in every engine (two-step int/10^14 conversions drift by an
    ulp), while a 4-scale decimal with a sub-2^53 scaled integer converts
    exactly-rounded everywhere.
    """
    da = F.round(a, scale).cast(f"decimal({precision},{scale})")
    db = F.round(b, scale).cast(f"decimal({precision},{scale})")
    return F.round(F.sum(da * db), out_digits).cast("double")


def quantized_long(expr: Column, scale: int = 7, precision: int = 15) -> Column:
    """``round(expr, scale)`` as an exact scaled long (value × 10^scale).

    Same factor quantization as ``weighted_sum`` — round-half-up on the
    decimal representation, NOT ``round(expr * 10^scale)`` (the double
    multiply can cross a .5 boundary) — but materialized as an integer so
    downstream dot products are long multiply-adds instead of decimal
    arithmetic. The decimal→long cast is exact: the scaled decimal holds
    an integer value by construction.
    """
    return (
        F.round(expr, scale).cast(f"decimal({precision},{scale})")
        * F.lit(10**scale).cast(f"decimal({scale + 1},0)")
    ).cast("long")


def quantized_dot(
    a_scaled: Column,
    b_scaled: Column,
    scale: int = 7,
    out_digits: int = 4,
) -> Column:
    """``weighted_sum`` over factors pre-quantized by ``quantized_long``
    — bit-identical output, integer-speed hot path.

    Σ (a×10^s)(b×10^s) is an exact long (unit-norm factors keep it near
    10^2s ≪ 2^63); half-up rounding to ``out_digits`` is an integer
    divide; the final ``int / 10^out_digits`` double division is
    correctly rounded, matching decimal→double. Callers must guarantee a
    non-negative sum (true for dot products of non-negative weights) —
    the half-up shift is written for Σ ≥ 0.
    """
    return quantized_total_round(
        F.sum(a_scaled * b_scaled), scale=scale, out_digits=out_digits
    )


def quantized_total_round(
    total: Column, scale: int = 7, out_digits: int = 4
) -> Column:
    """The half-up descale step of ``quantized_dot`` exposed for callers
    that produce the exact Σ (a×10^s)(b×10^s) long total by other means
    (e.g. a map-lookup ``aggregate`` over per-doc term maps instead of a
    join-expanded SUM — same integer, so bit-identical output).
    ``total`` must be ≥ 0 (see ``quantized_dot``)."""
    shift = 10 ** (2 * scale - out_digits)
    rounded = (total + F.lit(shift // 2)) - ((total + F.lit(shift // 2)) % F.lit(shift))
    return (rounded / F.lit(shift)).cast("long").cast("double") / F.lit(
        float(10**out_digits)
    )


def stable_avg(
    expr: Column, scale: int = 7, round_digits: int | None = None
) -> Column:
    """Order-independent mean: exact decimal sum of the per-row values
    (pre-rounded at ``scale``) divided by the non-null count — one
    deterministic double division instead of an order-dependent running
    mean. By default the result is deliberately NOT rounded: quotients
    of money by small counts sit exactly on 2-decimal halves
    (12.33/2 = 6.165), where cross-engine double rounding diverges.

    ``round_digits`` enables REFERENCE-PARITY mode — the reference's
    ``round(avg(UnitPrice), 2)`` (Sales_forecast_pyspark.py:162) — for
    golden-number regression tests against its published outputs. Do not
    use parity mode in oracle-hashed queries (see above).

    ``scale=7`` is chosen so ratios of 2-decimal prices by quantities
    <= 50 can never land on an exact half at the rounding scale (the
    quotient's power-of-two factor analysis rules it out) and the nearest
    representable gap (~1e-11) clears double noise by >20x.
    """
    total = dec_sum(F.round(expr, scale), scale=scale)
    mean = total / F.nullif(F.count(expr), F.lit(0))
    return F.round(mean, round_digits) if round_digits is not None else mean
