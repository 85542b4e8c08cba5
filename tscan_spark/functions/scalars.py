"""Scalar derivations with reference NA semantics.

The reference's ``proportion``/``density`` return NaN (printed "NA") when
the denominator is zero (/root/reference/include/tscan/utils.h:79-97);
here that is a SQL NULL, which survives parquet, DuckDB comparison and
``numpy.allclose`` NaN-position checks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.col(x)


def proportion(num, den) -> Column:
    """num/den, NULL when den is 0/NULL (utils.h:79-87)."""
    num, den = _c(num), _c(den)
    return F.when(den != 0, num / den)


def density(num, den) -> Column:
    """(num/den)*1000, NULL when den is 0/NULL (utils.h:89-97)."""
    num, den = _c(num), _c(den)
    return F.when(den != 0, num / den * 1000.0)


def freq_log(count, total) -> Column:
    """SUBTLEX Laplace log frequency per billion.

    ``log10(((f+1)/total)*1e9)`` — reference ``freqLog``,
    /root/reference/src/tscan.cxx:1617-1621.
    """
    return F.log10((_c(count) + F.lit(1.0)) / _c(total) * F.lit(1.0e9))


# Shared SQL renderings (DuckDB oracle side) of the same formulas.
def sql_proportion(num: str, den: str) -> str:
    return f"CASE WHEN {den} <> 0 THEN {num} / {den} END"


def sql_density(num: str, den: str) -> str:
    return f"CASE WHEN {den} <> 0 THEN {num} / {den} * 1000.0 END"


def sql_freq_log(count: str, total: str) -> str:
    return f"log10((({count} + 1.0) / {total}) * 1e9)"


# ---------------------------------------------------------------------------
# Fixed-point aggregation: double sums are order-dependent in the last
# ulps, and a distributed engine cannot pin summation order. For golden /
# cross-engine value-hash comparability every SUM/AVG over doubles is
# computed as an exact int64 sum of 6-decimal fixed-point values, then
# divided once. Deterministic at any parallelism.
# ---------------------------------------------------------------------------

FP_SCALE = 1_000_000


def fp_sum(col) -> Column:
    """Exact order-independent sum of a double column at 6dp."""
    return F.sum(F.round(_c(col) * FP_SCALE, 0).cast("long"))


def round6_fp(value: Column) -> Column:
    """6dp half-away-from-zero round as explicit IEEE ops.

    ``sign(v)*floor(abs(v*1e6)+0.5)/1e6`` — floor/abs/sign are
    bit-identical across engines, unlike ROUND(double, 6) whose
    tie-breaking differs between Spark (BigDecimal HALF_UP on the exact
    decimal expansion) and DuckDB near representational ties.
    """
    scaled = F.abs(value * FP_SCALE)
    return F.signum(value) * F.floor(scaled + 0.5) / F.lit(float(FP_SCALE))


def sql_round6_fp(value: str) -> str:
    return (
        f"SIGN({value}) * FLOOR(ABS(({value}) * {FP_SCALE}) + 0.5)"
        f" / {float(FP_SCALE)}"
    )


def fp_mean(col, cnt) -> Column:
    """Fixed-point mean at 6dp, NULL when cnt is 0.

    The quotient is rounded with :func:`round6_fp` (explicit floor) so
    an exact .5 tie in the 7th decimal cannot split across engines.
    """
    v = fp_sum(col) / F.lit(float(FP_SCALE)) / _c(cnt)
    return F.when(_c(cnt) != 0, round6_fp(v))


def sql_fp_sum(col: str) -> str:
    return f"SUM(CAST(ROUND({col} * {FP_SCALE}, 0) AS BIGINT))"


def sql_fp_mean(col: str, cnt: str) -> str:
    v = f"{sql_fp_sum(col)} / {float(FP_SCALE)} / {cnt}"
    return f"CASE WHEN {cnt} <> 0 THEN {sql_round6_fp(v)} END"
