"""IRI resolution unit tests.

Ports the 306-case RFC 3986 battery from the reference
(/root/reference/spec/reader_spec.rb:489-1221, data at tests/data/) plus
NCName / NTriples-unescape checks.
"""
import re
from pathlib import Path

import pytest

from rdf_rdfxml_spark.functions.iri import (
    is_ncname, ntriples_unescape, resolve, strip_fragment, resolve_base,
)

DATA = Path(__file__).parent / "data"


def battery_cases():
    xml = (DATA / "iri_battery.xml").read_text()
    nt = (DATA / "iri_battery.nt").read_text()
    expected = dict(re.findall(r"<urn:ex:s(\d+)> <urn:ex:p> <([^>]*)>", nt))
    cases = []
    for base, body in re.findall(
            r'<rdf:RDF xml:base="([^"]*)">(.*?)</rdf:RDF>', xml, re.S):
        for sid, ref in re.findall(
                r'rdf:about="urn:ex:s(\d+)"><ex:p rdf:resource="([^"]*)"',
                body):
            cases.append((sid, base, ref, expected[sid]))
    assert len(cases) == 306
    return cases


@pytest.mark.parametrize("sid,base,ref,expected", battery_cases())
def test_battery(sid, base, ref, expected):
    assert resolve(strip_fragment(base), ref) == expected


def test_resolve_absolute_passthrough():
    # reader.rb:683-684: absolute refs are NOT normalized
    assert resolve("http://a/b", "http:g") == "http:g"
    assert resolve("http://a/b", "http://x/./y") == "http://x/./y"


def test_resolve_base_strips_fragment():
    assert resolve_base("http://a/b", "c#frag") == "http://a/c"
    assert resolve_base("http://a/b#x", "") == "http://a/b"


@pytest.mark.parametrize("value,ok", [
    ("abc", True), ("_x", True), ("a-b.c", True), ("été", True),
    ("333-555-666", False), ("a/b", False), ("q:name", False),
    ("-x", False), (".x", False), ("$x", False), ("", False),
])
def test_ncname(value, ok):
    assert is_ncname(value) is ok


@pytest.mark.parametrize("raw,out", [
    ("plain", "plain"),
    ("a\\u0041b", "aAb"),
    ("x\\U0001F600", "x\U0001F600"),
    ("tab\\there", "tab\there"),
    ("back\\\\slash", "back\\slash"),
])
def test_ntriples_unescape(raw, out):
    assert ntriples_unescape(raw) == out
