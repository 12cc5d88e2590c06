"""Manifest-driven W3C rdf11/rdf-xml conformance gate (north rule's
correctness corpus; harness parity with suite_spec.rb:5-56).

Positive eval entries: parse the .rdf with the test's canonical base URI,
compare against the .nt golden via blank-node isomorphism. Negative-syntax
entries: the document must land in the error channel. A final aggregate
asserts micro-averaged precision/recall ≥ 0.95 over all eval entries
(per-entry failures surface individually first)."""

from __future__ import annotations

import pytest

from rdf_rdfxml_spark.functions.nt import (
    canonicalize_bnodes, isomorphic, parse_nt,
)
from rdf_rdfxml_spark.parser.grammar import parse_rdfxml
from rdf_rdfxml_spark.sources.w3c import load_manifest

ENTRIES = load_manifest()
EVAL = [e for e in ENTRIES if e.kind == "eval"]
NEGATIVE = [e for e in ENTRIES if e.kind == "negative"]


def test_manifest_shape():
    assert len(ENTRIES) >= 50
    assert len(EVAL) >= 35 and len(NEGATIVE) >= 10
    assert len({e.test_id for e in ENTRIES}) == len(ENTRIES)


@pytest.mark.parametrize("entry", EVAL, ids=lambda e: e.test_id)
def test_w3c_positive_eval(entry):
    triples, errors = parse_rdfxml(entry.read_action(), base_uri=entry.base,
                                   doc_key=entry.test_id, strict=True)
    assert errors == [], f"{entry.test_id}: unexpected errors {errors}"
    golden = parse_nt(entry.read_result())
    assert isomorphic(triples, golden), (
        f"{entry.test_id}:\n got:    "
        + "\n got:    ".join(canonicalize_bnodes(triples))
        + "\n golden: " + "\n golden: ".join(canonicalize_bnodes(golden)))


@pytest.mark.parametrize("entry", NEGATIVE, ids=lambda e: e.test_id)
def test_w3c_negative_syntax(entry):
    triples, errors = parse_rdfxml(entry.read_action(), base_uri=entry.base,
                                   doc_key=entry.test_id, strict=True)
    assert errors, f"{entry.test_id}: bad document accepted"


def test_w3c_micro_pr_gate():
    """North-rule metric: micro-averaged triple P/R over the whole eval
    corpus (isomorphism-canonical forms; reference comparison semantics)."""
    tp = fp = fn = 0
    for entry in EVAL:
        triples, errors = parse_rdfxml(
            entry.read_action(), base_uri=entry.base,
            doc_key=entry.test_id, strict=True)
        got = set(canonicalize_bnodes(triples))
        want = set(canonicalize_bnodes(parse_nt(entry.read_result())))
        tp += len(got & want)
        fp += len(got - want)
        fn += len(want - got)
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # record the numbers where the bench reader can see them
    print(f"\nW3C eval micro P/R: precision={precision:.4f} "
          f"recall={recall:.4f} tp={tp} fp={fp} fn={fn}")


def _golden_rows(entry):
    rows = []
    for s, p, o in parse_nt(entry.read_result()):
        rows.append({
            "s": s[1], "s_kind": s[0], "p": p,
            "o": o[1], "o_kind": o[0],
            "o_lang": o[2] if o[0] == "literal" else None,
            "o_dt": o[3] if o[0] == "literal" else None,
        })
    return rows


def _has_inexpressible_literal(golden):
    """RDF/XML cannot round-trip an empty/whitespace-only literal that
    carries a language or datatype: it serializes to an empty property
    element, which re-parses via emptyPropertyElt as a plain "" (the
    reference has the identical hole — reader.rb:524-530; documented by
    test_known_roundtrip_hole_empty_typed_literal)."""
    return any(o[0] == "literal" and o[1].strip() == ""
               and (o[2] or o[3]) for _s, _p, o in golden)


@pytest.mark.parametrize("entry", EVAL, ids=lambda e: e.test_id)
def test_w3c_writer_roundtrip(entry):
    """The reference's writer contract (writer_spec.rb:685-706): serialize
    each positive-eval golden graph to RDF/XML, re-parse, compare
    isomorphic."""
    from rdf_rdfxml_spark.writer.serialize import serialize_graph
    golden = parse_nt(entry.read_result())
    if _has_inexpressible_literal(golden):
        pytest.skip("documented round-trip hole: empty literal with "
                    "language/datatype is not expressible in RDF/XML")
    xml = serialize_graph(_golden_rows(entry))
    reparsed, errors = parse_rdfxml(xml, base_uri="",
                                    doc_key=entry.test_id, strict=True)
    assert errors == [], f"{entry.test_id}: writer output rejected {errors}"
    assert isomorphic(reparsed, golden), f"{entry.test_id}:\n{xml}"


@pytest.mark.parametrize("attributes", ["untyped", "typed"])
def test_w3c_writer_roundtrip_attribute_modes(attributes):
    """'untyped' folding is semantics-preserving everywhere; 'typed'
    folding is *documented lossy* on rdf:datatype (the reference's own
    semantics, writer.rb:500-525) — so typed mode is asserted only on
    graphs without non-XMLLiteral datatyped literals."""
    from rdf_rdfxml_spark.writer.serialize import RDF_XMLLITERAL, serialize_graph
    checked = 0
    for entry in EVAL:
        golden = parse_nt(entry.read_result())
        if attributes == "typed" and any(
                o[0] == "literal" and o[3] and o[3] != RDF_XMLLITERAL
                for _s, _p, o in golden):
            continue  # datatype folding is lossy by design
        if _has_inexpressible_literal(golden):
            continue  # documented round-trip hole (see above)
        xml = serialize_graph(_golden_rows(entry), attributes=attributes)
        reparsed, errors = parse_rdfxml(xml, base_uri="",
                                        doc_key=entry.test_id, strict=True)
        assert errors == [], (entry.test_id, errors)
        assert isomorphic(reparsed, golden), (entry.test_id, xml)
        checked += 1
    assert checked >= 50


def test_earl_report_fresh_and_all_passed():
    """The checked-in EARL.md (per-test conformance artifact, parity with
    script/tc --earl) must match a fresh deterministic regeneration and
    record zero failures."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from earl_report import build_report
    fresh = build_report()
    path = os.path.join(os.path.dirname(__file__), "..", "EARL.md")
    with open(path, encoding="utf-8") as f:
        checked_in = f.read()
    assert fresh == checked_in, "EARL.md is stale — rerun tools/earl_report.py"
    assert "**FAILED**" not in fresh


def test_reference_inline_adaptations():
    """Differential against reference-AUTHORED test documents: the
    reference embeds its own adaptations of three W3C negative tests
    inline (spec/reader_spec.rb:228,250,272 — aboutEach-error001/002,
    rdf-id-error001). Our parser must reject those exact texts, the
    strongest offline fidelity evidence available for the reconstructed
    corpus (PROVENANCE.md)."""
    from rdf_rdfxml_spark import parse_rdfxml

    docs = [
        # reader_spec.rb:228 — rdfms-abouteach-error001
        """<?xml version="1.0" ?>
            <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                     xmlns:eg="http://example.org/">
              <rdf:Bag rdf:ID="node">
                <rdf:li rdf:resource="http://example.org/node2"/>
              </rdf:Bag>
              <rdf:Description rdf:aboutEach="#node">
                <dc:rights xmlns:dc="http://purl.org/dc/elements/1.1/">me</dc:rights>
              </rdf:Description>
            </rdf:RDF>""",
        # reader_spec.rb:250 — rdfms-abouteach-error002
        """<?xml version="1.0" ?>
            <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                     xmlns:eg="http://example.org/">
              <rdf:Description rdf:about="http://example.org/node">
                <eg:property>foo</eg:property>
              </rdf:Description>
              <rdf:Description rdf:aboutEachPrefix="http://example.org/">
                <dc:creator xmlns:dc="http://purl.org/dc/elements/1.1/">me</dc:creator>
              </rdf:Description>
            </rdf:RDF>""",
        # reader_spec.rb:272 — rdfcore-rdfms-rdf-id-error001
        """<?xml version="1.0"?>
            <rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">
              <rdf:Description rdf:ID='333-555-666' />
            </rdf:RDF>""",
    ]
    for doc in docs:
        triples, errors = parse_rdfxml(
            doc, base_uri="http://example.com", doc_key="x", strict=True)
        assert errors, "reference-adapted negative doc was not rejected"
