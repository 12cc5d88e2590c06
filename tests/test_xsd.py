"""XSD canonicalization unit battery (reference: RDF.rb Literal
``canonicalize!`` semantics, wired via reader.rb:128-129's off-by-default
``canonicalize:`` option).

Covers the round-2 ADVICE findings: overflow doubles ("1E999") must map to
INF/-INF instead of raising (the per-document isolation invariant), and
valid all-zero decimals must canonicalize to "0.0"."""

import pytest

from rdf_rdfxml_spark.functions.xsd import XSD, canonicalize_literal


def c(v, dt):
    return canonicalize_literal(v, XSD + dt)


# --- double: overflow / non-finite (ADVICE high) -------------------------

@pytest.mark.parametrize("lex,want", [
    ("1E999", "INF"),
    ("-1E999", "-INF"),
    ("1.7976931348623157E309", "INF"),
    ("2.5E-999", "0.0E0"),     # underflow rounds to +0.0
    ("INF", "INF"),
    ("-INF", "-INF"),
    ("NaN", "NaN"),
])
def test_double_nonfinite_and_overflow(lex, want):
    assert c(lex, "double") == want
    assert c(lex, "float") == want


@pytest.mark.parametrize("lex,want", [
    ("1", "1.0E0"),
    ("-0042.5000", "-4.25E1"),
    (".5", "5.0E-1"),
    ("0", "0.0E0"),
    ("-0", "-0.0E0"),
    ("not-a-double", "not-a-double"),
    ("1e", "1e"),  # invalid: bare exponent marker passes through
])
def test_double_finite(lex, want):
    assert c(lex, "double") == want


# --- decimal: all-zero forms are valid (ADVICE medium) --------------------

@pytest.mark.parametrize("lex,want", [
    ("0", "0.0"),
    ("00", "0.0"),
    ("0.00", "0.0"),
    ("-0", "0.0"),
    ("-0.000", "0.0"),
    ("+0.0", "0.0"),
])
def test_decimal_zero_forms(lex, want):
    assert c(lex, "decimal") == want


@pytest.mark.parametrize("lex,want", [
    ("01.10", "1.1"),
    ("-2.50", "-2.5"),
    ("5.", "5.0"),
    ("5", "5.0"),
    (".", "."),      # no digits: invalid, pass through
    ("+", "+"),
    ("", ""),
    ("abc", "abc"),
])
def test_decimal_general(lex, want):
    assert c(lex, "decimal") == want


# --- isolation: canonicalize_literal never raises -------------------------

def test_canonicalize_never_raises():
    hostile = ["1E999", "-1E999", "\x00", "9" * 10000 + "E" + "9" * 100,
               None.__class__.__name__, "  ", ".", "NaNE5"]
    for dt in ("integer", "decimal", "double", "float", "boolean"):
        for v in hostile:
            out = canonicalize_literal(v, XSD + dt)
            assert isinstance(out, str)


def test_integer_and_boolean_still_canonical():
    assert c("0042", "integer") == "42"
    assert c("-007", "integer") == "-7"
    assert c("-0", "integer") == "0"
    assert c("1", "boolean") == "true"
    assert c("0", "boolean") == "false"
    assert c("maybe", "boolean") == "maybe"


def test_canonicalize_through_parse_path_never_kills_document():
    """The round-2 ADVICE crash scenario end-to-end: a document carrying
    an overflow xsd:double lexical parses fine under canonicalize=True
    (the --canonicalize CLI flag) instead of raising out of the UDF."""
    from rdf_rdfxml_spark.parser.grammar import parse_rdfxml
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      xmlns:eg="http://example.org/">
      <rdf:Description rdf:about="http://example.org/n">
        <eg:p rdf:datatype="http://www.w3.org/2001/XMLSchema#double">1E999</eg:p>
        <eg:q rdf:datatype="http://www.w3.org/2001/XMLSchema#double">-1E999</eg:q>
        <eg:r rdf:datatype="http://www.w3.org/2001/XMLSchema#decimal">0.00</eg:r>
      </rdf:Description>
    </rdf:RDF>"""
    triples, errors = parse_rdfxml(doc, base_uri="http://x/", doc_key="d",
                                   strict=True, canonicalize=True)
    assert errors == []
    vals = {t[1].rsplit("/", 1)[-1]: t[2][1] for t in triples}
    assert vals == {"p": "INF", "q": "-INF", "r": "0.0"}
