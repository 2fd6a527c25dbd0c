"""Scalar conditional / date / math expression builders (SURVEY.md §2.6).

Each helper returns a ``pyspark.sql.Column`` so it composes inside a single
Catalyst plan (constant-folded, codegen'd — never a Python UDF).

Reference call-sites cited per function (py:N = Hap880_Final_Project.py:N).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def label_lt(value: ColumnOrName, threshold: float, yes: str = "1", no: str = "0") -> Column:
    """C1 — binary CASE label (py:86 ``np.where(DAYS_NEXT_ADMIT < 30,'1','0')``).

    NULL < threshold is NULL -> ``otherwise`` branch, matching numpy's
    NaN-comparison-is-False semantics.
    """
    return F.when(_col(value) < F.lit(threshold), F.lit(yes)).otherwise(F.lit(no))


def clamp_below(value: ColumnOrName, lo: float, replacement: float) -> Column:
    """C2 — clamp CASE (py:215 ``np.where(age < 0, 90, age)``)."""
    v = _col(value)
    return F.when(v < F.lit(lo), F.lit(replacement)).otherwise(v)


def range_recode(
    value: ColumnOrName,
    ranges: Sequence[tuple[float, float, str]],
    default: str,
) -> Column:
    """C3 — N-way range recode as ONE chained CASE (py:131-149's 18-way
    ``np.where`` loop over ICD-9 code ranges).

    ``ranges`` is ``[(lo, hi, name), ...]``; inclusive bounds like
    pandas ``Series.between``. Catalyst folds the chain into a single
    codegen'd expression — no join, no shuffle, no UDF.
    """
    v = _col(value)
    expr: Column | None = None
    for lo, hi, name in ranges:
        cond = v.between(F.lit(lo), F.lit(hi))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    assert expr is not None, "need at least one range"
    return expr.otherwise(F.lit(default))


#: the reference's ICD-9 chapter ranges (py:131-145), EXACT parity: the
#: reference loops ``np.where(recode.between(lo, hi), num, recode)`` over
#: overlapping inclusive ranges, so a boundary value (140, 240, ...) maps to
#: the EARLIER chapter — first-match-wins, which is precisely the semantics
#: of :func:`range_recode`'s chained ``F.when``. 780-800 -> 'misc',
#: 800-1000 -> 'injury', 1000-2000 -> 'misc'; values outside [1, 2000] fall
#: through to the caller's ``default``.
ICD9_RANGES: tuple[tuple[int, int, str], ...] = (
    (1, 140, "infectious"),
    (140, 240, "neoplasms"),
    (240, 280, "endocrine"),
    (280, 290, "blood"),
    (290, 320, "mental"),
    (320, 390, "nervous"),
    (390, 460, "circulatory"),
    (460, 520, "respiratory"),
    (520, 580, "digestive"),
    (580, 630, "genitourinary"),
    (630, 680, "pregnancy"),
    (680, 710, "skin"),
    (710, 740, "muscular"),
    (740, 760, "congenital"),
    (760, 780, "prenatal"),
    (780, 800, "misc"),
    (800, 1000, "injury"),
    (1000, 2000, "misc"),
)


def parse_ts(value: ColumnOrName, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """C4 — timestamp parse with coerce-to-NULL (py:26-28
    ``pd.to_datetime(..., errors='coerce')``). ``try_to_timestamp`` keeps
    the coerce semantics under Spark 4 ANSI mode."""
    return F.try_to_timestamp(_col(value), F.lit(fmt))


def days_between_frac(later: ColumnOrName, earlier: ColumnOrName) -> Column:
    """C5 — timestamp difference in fractional days (py:63
    ``.dt.total_seconds()/(24*60*60)``). Microsecond-exact like pandas
    ``total_seconds()`` (integer µs diff, one IEEE division)."""
    return (F.unix_micros(_col(later)) - F.unix_micros(_col(earlier))) / F.lit(86400.0e6)


def years_between_floor(later: ColumnOrName, earlier: ColumnOrName) -> Column:
    """C6 — integer years via day-diff floor-div 365 (py:214)."""
    return F.floor(F.datediff(_col(later), _col(earlier)) / F.lit(365))


def to_int(value: ColumnOrName) -> Column:
    """C7/C8 — string->int cast with coerce (py:127 ``pd.to_numeric``,
    py:263 ``astype(int)``). ``try_cast`` = NULL on garbage (ANSI-safe)."""
    return _col(value).try_cast("int")


def pct_round(part: ColumnOrName, whole: ColumnOrName, digits: int = 3) -> Column:
    """C9 — percentage with rounding (py:369-370)."""
    return F.round(_col(part) / _col(whole) * 100.0, digits)
