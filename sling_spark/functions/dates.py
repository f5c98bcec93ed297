"""Date parsing with precision (SURVEY.md §2.9).

Reference semantics: SLING dates carry a precision (millennium..day) and
support BC years (sling/nlp/kb/calendar.cc/h; date annotators
mentions.h:349). The reconciler keeps the most precise value when two
statements state the same date at different granularities
(reconciler.cc date reconciliation).

Precision encoding: 1=year, 2=month, 3=day (0 = not a date).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_RE = re.compile(r"^(-?\d{1,4})(?:-(\d{2}))?(?:-(\d{2}))?$")

P_NONE, P_YEAR, P_MONTH, P_DAY = 0, 1, 2, 3


@dataclass(frozen=True)
class ParsedDate:
    year: int
    month: int  # 0 when precision < month
    day: int  # 0 when precision < day
    precision: int


def parse_date(text: str) -> ParsedDate | None:
    """Parse 'Y', 'Y-M', 'Y-M-D' (negative year = BC)."""
    m = _DATE_RE.match(text or "")
    if not m:
        return None
    year = int(m.group(1))
    month = int(m.group(2)) if m.group(2) else 0
    day = int(m.group(3)) if m.group(3) else 0
    if m.group(2) and not 1 <= month <= 12:
        return None
    if m.group(3) and not 1 <= day <= 31:
        return None
    precision = P_DAY if day else (P_MONTH if month else P_YEAR)
    return ParsedDate(year, month, day, precision)


def more_precise(a: str, b: str) -> str:
    """Of two compatible date strings, the more precise one; ties keep
    ``a``. Incompatible dates keep ``a`` (caller treats as distinct)."""
    pa, pb = parse_date(a), parse_date(b)
    if pa is None or pb is None:
        return a
    if not compatible(pa, pb):
        return a
    return b if pb.precision > pa.precision else a


def compatible(a: ParsedDate, b: ParsedDate) -> bool:
    """Same date up to the coarser precision."""
    if a.year != b.year:
        return False
    p = min(a.precision, b.precision)
    if p >= P_MONTH and a.month != b.month:
        return False
    if p >= P_DAY and a.day != b.day:
        return False
    return True


def date_precision_col(c: Column) -> Column:
    """Column twin: precision of a date-string column (JVM regexps)."""
    return (
        F.when(c.rlike(r"^-?\d{1,4}-\d{2}-\d{2}$"), F.lit(P_DAY))
        .when(c.rlike(r"^-?\d{1,4}-\d{2}$"), F.lit(P_MONTH))
        .when(c.rlike(r"^-?\d{1,4}$"), F.lit(P_YEAR))
        .otherwise(F.lit(P_NONE))
    )


def date_year_col(c: Column) -> Column:
    return F.regexp_extract(c, r"^(-?\d{1,4})", 1).cast("int")
