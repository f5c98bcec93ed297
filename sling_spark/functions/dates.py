"""Date parsing with precision (SURVEY.md §2.9).

Reference semantics: SLING dates carry a precision (millennium..day) and
support BC years (sling/nlp/kb/calendar.cc/h; date annotators
mentions.h:349). Star notation for coarse dates per calendar.h:82-84:
DECADE ``[+|-]YYY*``, CENTURY ``[+|-]YY**``, MILLENNIUM ``[+|-]Y***``.
The reconciler keeps the most precise value when two statements state
the same date at different granularities (reconciler.cc date
reconciliation).

Precision encoding mirrors calendar.h:33
(NONE, MILLENNIUM, CENTURY, DECADE, YEAR, MONTH, DAY = 0..6).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_DATE_RE = re.compile(r"^(-?\d{1,4})(?:-(\d{2}))?(?:-(\d{2}))?$")
_STAR_RE = re.compile(r"^([+-]?)(\d+)(\*{1,3})$")

#: English month inventory (the calendar month items' names, reference
#: sling/nlp/kb/calendar.cc month handling — our fixed-inventory analog)
MONTHS = {
    "january": 1, "february": 2, "march": 3, "april": 4, "may": 5,
    "june": 6, "july": 7, "august": 8, "september": 9, "october": 10,
    "november": 11, "december": 12,
}
#: common abbreviations (calendar month alias forms). In the TOKEN
#: path these only match when capitalized — 'dec', 'sep', 'mar', 'jan'
#: are everyday source-code identifiers, and the corpus is code.
MONTH_ABBREV = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "jun": 6, "jul": 7,
    "aug": 8, "sep": 9, "sept": 9, "oct": 10, "nov": 11, "dec": 12,
}


def month_of_word(word: str) -> int | None:
    """Month number of one TOKEN: full names case-insensitively,
    abbreviations only when capitalized (shared by the mention chart
    and the oracle — single source of truth, so the two sides cannot
    diverge)."""
    m = MONTHS.get(word.lower())
    if m is not None:
        return m
    if word[:1].isupper():
        return MONTH_ABBREV.get(word.lower())
    return None


_ALL_MONTHS = {**MONTHS, **MONTH_ABBREV}
_MONTH_ALT = "|".join(_ALL_MONTHS)
#: textual forms resolved by the DateAnnotator analog (calendar.cc
#: ParseFromNumber / date parsing semantics): "May 14, 1984",
#: "14 May 1984", "May 1984", decades "1960s", centuries "19th century"
_TEXT_MDY_RE = re.compile(rf"^({_MONTH_ALT})\s+(\d{{1,2}})\s*,\s+(\d{{4}})$", re.I)
_TEXT_DMY_RE = re.compile(rf"^(\d{{1,2}})\s+({_MONTH_ALT})\s+(\d{{4}})$", re.I)
_TEXT_MY_RE = re.compile(rf"^({_MONTH_ALT})\s+(\d{{4}})$", re.I)
_TEXT_DECADE_RE = re.compile(r"^([12]\d{2})0s$")
_TEXT_CENTURY_RE = re.compile(r"^(\d{1,2})(?:st|nd|rd|th)\s+century$", re.I)

P_NONE, P_MILLENNIUM, P_CENTURY, P_DECADE, P_YEAR, P_MONTH, P_DAY = range(7)

#: year-granularity divisor per coarse precision
_GRANULARITY = {P_MILLENNIUM: 1000, P_CENTURY: 100, P_DECADE: 10}


@dataclass(frozen=True)
class ParsedDate:
    year: int  # base year (e.g. 1950 for "195*")
    month: int  # 0 when precision < month
    day: int  # 0 when precision < day
    precision: int


def parse_date(text: str) -> ParsedDate | None:
    """Parse 'Y', 'Y-M', 'Y-M-D' (negative year = BC), the coarse star
    forms '195*' (decade), '19**' (century), '1***' (millennium), and
    the textual forms the date annotators resolve: 'May 14, 1984',
    '14 May 1984', 'May 1984', '1960s' (decade), '19th century'
    (century; Nth century → star prefix N-1, the pure-prefix convention
    documented at :func:`_coarse`)."""
    text = (text or "").strip()
    m = _TEXT_MDY_RE.match(text)
    if m:
        day, year = int(m.group(2)), int(m.group(3))
        if not 1 <= day <= 31:
            return None
        return ParsedDate(year, _ALL_MONTHS[m.group(1).lower()], day, P_DAY)
    m = _TEXT_DMY_RE.match(text)
    if m:
        day, year = int(m.group(1)), int(m.group(3))
        if not 1 <= day <= 31:
            return None
        return ParsedDate(year, _ALL_MONTHS[m.group(2).lower()], day, P_DAY)
    m = _TEXT_MY_RE.match(text)
    if m:
        return ParsedDate(int(m.group(2)), _ALL_MONTHS[m.group(1).lower()], 0, P_MONTH)
    m = _TEXT_DECADE_RE.match(text)
    if m:
        return ParsedDate(int(m.group(1)) * 10, 0, 0, P_DECADE)
    m = _TEXT_CENTURY_RE.match(text)
    if m:
        n = int(m.group(1))
        if not 1 <= n <= 21:
            return None
        return ParsedDate((n - 1) * 100, 0, 0, P_CENTURY)
    m = _STAR_RE.match(text)
    if m:
        sign = -1 if m.group(1) == "-" else 1
        stars = len(m.group(3))
        if len(m.group(2)) + stars > 4:
            return None
        year = sign * int(m.group(2)) * 10**stars
        precision = {1: P_DECADE, 2: P_CENTURY, 3: P_MILLENNIUM}[stars]
        return ParsedDate(year, 0, 0, precision)
    m = _DATE_RE.match(text)
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


def _coarse(year: int, gran: int) -> int:
    """Coarse bucket of a year, truncating TOWARD ZERO so BC years follow
    star-prefix semantics: -458 is in century '-4**' (bucket -4), not -5
    as floor division would give. (The reference anchors century base
    years at num*100+1 — calendar.cc ParseFromNumber; we use the pure
    prefix convention consistently on both the parse and compare sides,
    so boundary years like 2000 bucket into '20**' here vs '19**' there —
    documented divergence, self-consistent within this system.)"""
    return year // gran if year >= 0 else -((-year) // gran)


def compatible(a: ParsedDate, b: ParsedDate) -> bool:
    """Same date up to the coarser precision (e.g. 1958-03 sits inside
    the 195* decade and the 19** century)."""
    p = min(a.precision, b.precision)
    gran = _GRANULARITY.get(p)
    if gran is not None:
        return _coarse(a.year, gran) == _coarse(b.year, gran)
    if a.year != b.year:
        return False
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
        .when(c.rlike(r"^[+-]?\d{1,3}\*$"), F.lit(P_DECADE))
        .when(c.rlike(r"^[+-]?\d{1,2}\*\*$"), F.lit(P_CENTURY))
        .when(c.rlike(r"^[+-]?\d\*\*\*$"), F.lit(P_MILLENNIUM))
        .otherwise(F.lit(P_NONE))
    )


def date_year_col(c: Column) -> Column:
    return F.regexp_extract(c, r"^(-?\d{1,4})", 1).cast("int")
