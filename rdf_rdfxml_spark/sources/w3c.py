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
