"""W3C rdf11/rdf-xml manifest loader (SURVEY.md §5.2).

Mirrors the reference's manifest harness
(``/root/reference/spec/suite_spec.rb:5-56`` +
``spec/suite_helper.rb:124-164``): a ``manifest.ttl`` declares entries of
type ``rdft:TestXMLEval`` (positive eval: parse ``mf:action``, compare to
the ``mf:result`` NTriples golden via graph isomorphism) or
``rdft:TestXMLNegativeSyntax`` (must reject). Each test's base URI is the
canonical W3C test URL ``http://www.w3.org/2013/RDFXMLTests/<path>``,
which rdf:ID / relative-reference tests resolve against.

The parser below targets the manifest's fixed Turtle shape (predicates
``mf:name``/``mf:action``/``mf:result``, one entry block per test, the
``mf:entries`` collection for ordering) rather than full Turtle — the
corpus is data under our control (see tests/data/w3c/README.md for the
reconstruction notice).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

W3C_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "tests", "data", "w3c")

TEST_BASE = "http://www.w3.org/2013/RDFXMLTests/"

_ENTRY = re.compile(
    r"<#(?P<id>[^>]+)>\s+a\s+rdft:(?P<type>TestXMLEval|TestXMLNegativeSyntax)"
    r"\s*;(?P<body>.*?)\.\s*(?=<#|\Z)", re.S)
_PRED = re.compile(r"mf:(?P<p>name|action|result)\s+"
                   r"(?:\"(?P<str>[^\"]*)\"|<(?P<iri>[^>]*)>)")


@dataclass(frozen=True)
class W3CEntry:
    test_id: str
    kind: str            # 'eval' | 'negative'
    action: str          # repo-relative path of the input .rdf
    result: str | None   # path of the golden .nt (eval only)
    base: str            # base URI for the parse

    def read_action(self, root: str = None) -> bytes:
        with open(os.path.join(root or W3C_DIR, self.action), "rb") as f:
            return f.read()

    def read_result(self, root: str = None) -> str:
        with open(os.path.join(root or W3C_DIR, self.result),
                  encoding="utf-8") as f:
            return f.read()


def load_manifest(root: str = None) -> list[W3CEntry]:
    root = root or W3C_DIR
    with open(os.path.join(root, "manifest.ttl"), encoding="utf-8") as f:
        text = f.read()
    entries = []
    for m in _ENTRY.finditer(text):
        fields = {}
        for pm in _PRED.finditer(m.group("body")):
            fields[pm.group("p")] = pm.group("str") or pm.group("iri")
        action = fields["action"]
        entries.append(W3CEntry(
            test_id=m.group("id"),
            kind="eval" if m.group("type") == "TestXMLEval" else "negative",
            action=action,
            result=fields.get("result"),
            base=TEST_BASE + action))
    if not entries:
        raise ValueError(f"no manifest entries found under {root}")
    return entries


def run_conformance(entries: list[W3CEntry] | None = None,
                    root: str = None) -> list[tuple[str, str, str]]:
    """Run every manifest entry and return ``(test_id, kind, outcome)``
    rows, outcome ∈ {'passed', 'failed'} — the per-test record the
    reference's ``script/tc`` runner produces (tc:60-110: eval entries
    pass on golden isomorphism, negative entries pass on rejection)."""
    from ..functions.nt import isomorphic, parse_nt
    from ..parser.grammar import parse_rdfxml
    out = []
    for e in (entries if entries is not None else load_manifest(root)):
        triples, errors = parse_rdfxml(e.read_action(root),
                                       base_uri=e.base,
                                       doc_key=e.test_id, strict=True)
        if e.kind == "eval":
            ok = (not errors
                  and isomorphic(triples, parse_nt(e.read_result(root))))
        else:
            ok = bool(errors)
        out.append((e.test_id, e.kind, "passed" if ok else "failed"))
    return out


EARL_SUBJECT = "urn:example:rdf-rdfxml-spark"
EARL_ASSERTOR = "urn:example:rdf-rdfxml-spark#harness"


def earl_assertions(results: list[tuple[str, str, str]]) -> str:
    """EARL Turtle assertions, one per test — parity with ``script/tc``'s
    ``--earl`` output (tc:94-105), minus the ``dc:date`` stamp (the
    pipeline's determinism invariant forbids wall-clock reads; the git
    history carries the run provenance instead)."""
    head = (
        "@prefix earl: <http://www.w3.org/ns/earl#> .\n"
        "@prefix rdft: <http://www.w3.org/ns/rdftest#> .\n\n")
    blocks = [
        f"[ a earl:Assertion;\n"
        f"  earl:assertedBy <{EARL_ASSERTOR}>;\n"
        f"  earl:subject <{EARL_SUBJECT}>;\n"
        f"  earl:test <{TEST_BASE}#{test_id}>;\n"
        f"  earl:result [\n"
        f"    a earl:TestResult;\n"
        f"    earl:outcome earl:{outcome}];\n"
        f"  earl:mode earl:automatic ] .\n"
        for test_id, _kind, outcome in results]
    return head + "\n".join(blocks)
