"""End-to-end golden-document tests: the IRI battery document and the
reference repo's own DOAP document (etc/doap.rdf vs etc/doap.nt — the .nt
there is stale on URL scheme, corrected here; verified 21/21 otherwise).
"""
from pathlib import Path

from rdf_rdfxml_spark.parser.grammar import parse_rdfxml
from rdf_rdfxml_spark.functions.nt import (
    parse_nt, isomorphic, triple_to_nt, canonicalize_bnodes,
)

DATA = Path(__file__).parent / "data"
REF = Path("/root/reference")


def test_iri_battery_document_exact():
    xml = (DATA / "iri_battery.xml").read_text()
    nt = (DATA / "iri_battery.nt").read_text()
    triples, errors = parse_rdfxml(xml, base_uri="", doc_key="t")
    assert not errors
    got = sorted(triple_to_nt(t) for t in triples)
    want = sorted(triple_to_nt(t) for t in parse_nt(nt))
    assert got == want
    assert len(got) == 306


def test_doap_document():
    doap = (REF / "etc/doap.rdf").read_text()
    # Golden from /root/reference/etc/doap.nt with the stale http:// scheme
    # corrected to match the current doap.rdf (which uses https://).
    gold = (REF / "etc/doap.nt").read_text().replace(
        "<http://greggkellogg.net/", "<https://greggkellogg.net/").replace(
        "<http://lists.w3.org/", "<https://lists.w3.org/")
    triples, errors = parse_rdfxml(
        doap, base_uri="https://rubygems.org/gems/rdf-rdfxml", doc_key="d")
    assert not errors
    exp = parse_nt(gold)
    assert len(triples) == len(exp) == 21
    assert isomorphic(triples, exp), (
        canonicalize_bnodes(triples), canonicalize_bnodes(exp))


def test_example_files_parse_cleanly():
    # every positive example in the reference parses without errors.
    # iri-resolution.rdf is excluded: it uses `<urn:ex:p>` element names that
    # are not namespace-well-formed (libxml2 tolerates them, a conforming
    # namespace parser must not); the identical 306 cases are covered by
    # test_iri_battery_document_exact via the spec's well-formed variant.
    skip = {"iri-resolution.rdf"}
    for name in sorted(REF.glob("example-files/*.rdf")):
        if name.name in skip:
            continue
        content = name.read_text()
        triples, errors = parse_rdfxml(
            content, base_uri=f"http://example.com/{name.name}",
            doc_key=name.name)
        assert not errors, (name, errors)
        assert triples, name
