"""XSD literal canonicalization — the reference's off-by-default
``canonicalize:`` reader option (reader.rb:128-129; RDF::Literal
``canonicalize!`` semantics for the numeric/boolean core types).

Only valid lexical forms are rewritten; anything else passes through
untouched (the option never invents errors — invalid typed literals stay
as-written, matching RDF.rb)."""

from __future__ import annotations

import re

XSD = "http://www.w3.org/2001/XMLSchema#"

# re.ASCII throughout (round-3 ADVICE): bare \d matches non-ASCII Unicode
# digits (e.g. Arabic-Indic), which are NOT valid XSD lexical forms — they
# must pass through unchanged, not get "canonicalized".
_INT_RE = re.compile(r"^([+-]?)0*(\d+)$", re.ASCII)
_DEC_RE = re.compile(r"^([+-]?)0*(\d*)(?:\.(\d*?)0*)?$", re.ASCII)
_DBL_RE = re.compile(r"^[+-]?(?:\d+(?:\.\d*)?|\.\d+)(?:[eE][+-]?\d+)?$",
                     re.ASCII)
_BOOL = {"true": "true", "false": "false", "1": "true", "0": "false"}


def _canon_integer(v: str) -> str:
    m = _INT_RE.match(v.strip())
    if not m:
        return v
    sign, digits = m.groups()
    out = digits.lstrip("0") or "0"
    return ("-" + out) if (sign == "-" and out != "0") else out


def _canon_decimal(v: str) -> str:
    s = v.strip()
    m = _DEC_RE.match(s)
    # Valid iff at least one digit appears anywhere ('0', '00', '0.00' are
    # valid all-zero forms and canonicalize to '0.0'; '', '+', '.' are not).
    if not m or not any(c in "0123456789" for c in s):
        return v
    sign, whole, frac = m.groups()
    whole = (whole or "").lstrip("0") or "0"
    frac = frac or "0"
    out = f"{whole}.{frac}"
    neg = sign == "-" and out != "0.0"
    return ("-" + out) if neg else out


def _canon_double(v: str) -> str:
    s = v.strip()
    if s in ("INF", "-INF", "NaN"):
        return s
    if not _DBL_RE.match(s):
        return v
    f = float(s)
    # Overflowing-but-valid lexical forms (e.g. "1E999") round to ±inf;
    # RDF.rb's Literal::Double canonicalizes those to the special lexicals.
    if f == float("inf"):
        return "INF"
    if f == float("-inf"):
        return "-INF"
    if f != f:  # NaN (unreachable from _DBL_RE forms; defensive)
        return "NaN"
    if f == 0.0:
        return "-0.0E0" if s.lstrip().startswith("-") else "0.0E0"
    # canonical xsd:double: single nonzero digit before the point
    mant, _, exp = f"{f:E}".partition("E")
    mant = mant.rstrip("0")
    if mant.endswith("."):
        mant += "0"
    return f"{mant}E{int(exp)}"


_CANON = {
    XSD + "integer": _canon_integer,
    XSD + "long": _canon_integer,
    XSD + "int": _canon_integer,
    XSD + "short": _canon_integer,
    XSD + "byte": _canon_integer,
    XSD + "nonNegativeInteger": _canon_integer,
    XSD + "positiveInteger": _canon_integer,
    XSD + "decimal": _canon_decimal,
    XSD + "double": _canon_double,
    XSD + "float": _canon_double,
    XSD + "boolean": lambda v: _BOOL.get(v.strip(), v),
}


def canonicalize_literal(value: str, datatype: str | None) -> str:
    """Canonical lexical form for the supported XSD datatypes; identity
    for unknown datatypes or invalid lexical forms."""
    fn = _CANON.get(datatype or "")
    if not fn:
        return value
    # Per-document isolation invariant: nothing UDF-side may raise. Any
    # canonicalizer bug degrades to the original lexical form instead of
    # killing the Spark task on every retry.
    try:
        return fn(value)
    except Exception:
        return value
