"""Number / quantity parsing (reference semantics).

Faithful reimplementation of SLING's number annotator scalar logic:

- ``parse_number(s, tsep, dsep, msep)`` — separator-aware numeric parse
  with thousand-group validation (middle groups 2-3 digits, last group
  exactly 3; decimal milli-groups exactly 3), sign handling, int/float
  result (sling/nlp/silver/mentions.cc:590-655).
- ``parse_number_format(s, format)`` — STANDARD / IMPERIAL / NORWEGIAN
  separator preferences with cross-format fallback
  (sling/nlp/silver/mentions.cc:657-675).
- ``is_year(s)`` — the "4 digits in 1582..2038 is a year" rule used to
  flip SPAN_NUMBER to SPAN_DATE (sling/nlp/silver/mentions.cc:570-585).
- ``quantity(s, units)`` — MeasureAnnotator's number+unit composition as
  a plain scalar: "12 kg" with a unit alias table → (12, unit-id)
  (sling/nlp/silver/mentions.cc:798-930; the unit table here is
  caller-supplied since the code corpus carries no wikidata unit items).

A Spark expression twin ``number_expr`` covers the hot-path format in
pure Catalyst (regexp validation + translate + cast — no Python), for
use inside column-level plans; the scalar version is the annotator-side
(pandas-UDF) path and the oracle.
"""

from __future__ import annotations

INT_MIN, INT_MAX = -(1 << 30), (1 << 30) - 1  # Handle::kMinInt/kMaxInt range


def parse_number(s: str, tsep: str, dsep: str, msep: str = "") -> int | float | None:
    """Parse ``s`` with the given thousand/decimal/milli separators.
    Returns int when integral and in the reference's int handle range,
    float otherwise, None when invalid.

    Like the reference ParseNumber (mentions.cc:590-655), a bare sign
    or separator parses as 0 — the reference guards the ANNOTATOR call
    site with a has-digits check (mentions.cc:559-568) rather than the
    parser; callers feeding raw tokens must do the same. In this repo
    the tokenizer's token grammar makes that structural: any token
    containing a digit fully matches ``\\d+(\\.\\d+)?`` (signs and
    separators tokenize as their own single-char tokens), so the
    annotator's digit-led prefilter is exactly the reference guard."""
    if not s:
        return None
    i, n = 0, len(s)
    scale = 1.0
    if s[0] == "-":
        scale, i = -1.0, 1
    elif s[0] == "+":
        i = 1

    value = 0.0
    group = None  # index just past the most recent tsep
    while i < n:
        c = s[i]
        if "0" <= c <= "9":
            value = value * 10.0 + (ord(c) - 48)
            i += 1
        elif tsep and c == tsep:
            if group is not None and i - group not in (2, 3):
                return None
            group = i + 1
            i += 1
        elif dsep and c == dsep:
            break
        else:
            return None
    if group is not None and i - group != 3:
        return None

    decimal = False
    if i < n and dsep and s[i] == dsep:
        decimal = True
        i += 1
        group = None
        while i < n:
            c = s[i]
            if "0" <= c <= "9":
                value = value * 10.0 + (ord(c) - 48)
                scale /= 10.0
                i += 1
            elif msep and c == msep:
                if group is not None and i - group != 3:
                    return None
                group = i + 1
                i += 1
            else:
                return None
        if group is not None and i - group != 3:
            return None
    if i != n:
        return None

    value *= scale
    if decimal or value < INT_MIN or value > INT_MAX:
        return value
    return int(value)


#: separator preferences per format (mentions.cc:657-675)
FORMATS = {
    "STANDARD": ((".", ",", ""), (",", ".", "")),
    "IMPERIAL": ((",", ".", ""), (".", ",", "")),
    "NORWEGIAN": ((" ", ".", " "), (".", ",", "")),
}


def parse_number_format(s: str, format: str = "IMPERIAL") -> int | float | None:
    for tsep, dsep, msep in FORMATS[format]:
        v = parse_number(s, tsep, dsep, msep)
        if v is not None:
            return v
    return None


def is_year(s: str) -> bool:
    """Numbers between 1582 and 2038 written as 4 digits are years."""
    return len(s) == 4 and s.isdigit() and 1582 <= int(s) <= 2038


def quantity(s: str, units: dict[str, str]) -> tuple[int | float, str] | None:
    """Parse '<number> <unit-alias>' (or '<unit-alias> <number>' for
    currency-style prefixes) against a unit alias table → (amount, unit
    id). The two-token shape is MeasureAnnotator's number-followed-by-
    unit span composition."""
    parts = s.split()
    if len(parts) != 2:
        return None
    for num_tok, unit_tok in (parts, parts[::-1]):
        unit = units.get(unit_tok) or units.get(unit_tok.lower())
        if unit is None:
            continue
        v = parse_number_format(num_tok)
        if v is not None:
            return (v, unit)
    return None


def number_expr(col, format: str = "IMPERIAL"):
    """Catalyst twin of parse_number_format for the preferred separator
    pair of ``format`` plus its fallback: regexp-validated grouping, then
    separator translation, then cast to double. Stays inside whole-stage
    codegen — use for column-level filters/projections; exotic formats
    fall back to the scalar (annotator) path."""
    from pyspark.sql import functions as F

    def one(tsep: str, dsep: str):
        t, d = "\\" + tsep, "\\" + dsep
        pat = f"^[+-]?\\d+(({t}\\d{{2,3}})*{t}\\d{{3}})?({d}\\d*)?$"
        cleaned = F.translate(col, tsep + dsep, "|.")  # drop tsep, dsep -> '.'
        cleaned = F.regexp_replace(cleaned, "\\|", "")
        return F.when(col.rlike(pat), cleaned.cast("double"))

    (t1, d1, _), (t2, d2, _) = FORMATS[format]
    return F.coalesce(one(t1, d1), one(t2, d2))


#: spelled-number values (SpelledNumberAnnotator analog — the reference
#: resolves numerals via phrase-table items carrying P1181 numeric
#: values, mentions.h:283-296; our code KB has no numeral items, so the
#: English inventory is this fixed table)
SPELLED: dict[str, int] = {
    "zero": 0, "one": 1, "two": 2, "three": 3, "four": 4, "five": 5,
    "six": 6, "seven": 7, "eight": 8, "nine": 9, "ten": 10,
    "eleven": 11, "twelve": 12, "thirteen": 13, "fourteen": 14,
    "fifteen": 15, "sixteen": 16, "seventeen": 17, "eighteen": 18,
    "nineteen": 19, "twenty": 20, "thirty": 30, "forty": 40,
    "fifty": 50, "sixty": 60, "seventy": 70, "eighty": 80, "ninety": 90,
}

#: scale words (NumberScaleAnnotator, mentions.h:298-316)
SCALES: dict[str, int] = {
    "hundred": 100,
    "thousand": 1_000,
    "million": 1_000_000,
    "billion": 1_000_000_000,
    "trillion": 1_000_000_000_000,
}


def scale_value(num: int | float, scale: int) -> str:
    """Canonical value string of ``num × scale`` (the scaled-number
    composition): integral results render as integers."""
    v = num * scale
    if isinstance(num, int):
        return str(v)
    return str(int(v)) if float(v).is_integer() and abs(v) < 2**63 else str(v)
