"""NTriples encode/decode + blank-node-isomorphism graph compare.

The reference's suite compares parsed graphs against golden NTriples via
graph isomorphism (``be_equivalent_graph``, spec/suite_spec.rb:44-47).
These helpers provide the same comparison for our pytest harness, plus the
canonical term encodings used in golden fixtures.

Term tuples are the grammar's encoding: ``("iri", v)`` / ``("bnode", id)`` /
``("literal", value, lang, datatype)``.
"""

from __future__ import annotations

import hashlib
import re


def _escape_literal(value: str) -> str:
    out = value.replace("\\", "\\\\").replace('"', '\\"')
    return out.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")


def _unescape_literal(value: str) -> str:
    from .iri import ntriples_unescape
    return ntriples_unescape(value)


def term_to_nt(term) -> str:
    kind = term[0]
    if kind == "iri":
        return f"<{term[1]}>"
    if kind == "bnode":
        return f"_:{term[1]}"
    _, value, lang, dt = term
    lit = f'"{_escape_literal(value)}"'
    if lang:
        return f"{lit}@{lang}"
    if dt:
        return f"{lit}^^<{dt}>"
    return lit


def triple_to_nt(triple) -> str:
    s, p, o = triple
    return f"{term_to_nt(s)} {term_to_nt(p) if isinstance(p, tuple) else '<' + p + '>'} {term_to_nt(o)} ."


_NT_LINE = re.compile(
    r'^\s*(<[^>]*>|_:\S+)\s+<([^>]*)>\s+'
    r'(<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9\-]+|\^\^<[^>]*>)?)'
    r'\s*\.\s*$'
)


def _parse_term(tok: str):
    if tok.startswith("<"):
        return ("iri", tok[1:-1])
    if tok.startswith("_:"):
        return ("bnode", tok[2:])
    m = re.match(r'^"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9\-]+)|\^\^<([^>]*)>)?$',
                 tok, re.S)
    value = _unescape_literal(m.group(1))
    lang = m.group(2).lower() if m.group(2) else None
    return ("literal", value, lang, m.group(3))


def parse_nt(text: str):
    """Parse simple NTriples (sufficient for golden fixtures)."""
    triples = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = _NT_LINE.match(line)
        if not m:
            raise ValueError(f"bad NT line: {line!r}")
        s = _parse_term(m.group(1))
        p = m.group(2)
        o = _parse_term(m.group(3))
        triples.append((s, p, o))
    return triples


# --- isomorphism-aware canonicalization --------------------------------------

def canonicalize_bnodes(triples):
    """Deterministically relabel blank nodes to ``c0, c1, ...`` using
    iterative signature refinement (URDNA-style, sufficient for test-scale
    graphs). Returns a sorted tuple of NT lines — two graphs are isomorphic
    iff their canonical forms are equal (for the well-distinguished graphs
    the RDF/XML grammar produces)."""
    bnodes = set()
    for s, _p, o in triples:
        if s[0] == "bnode":
            bnodes.add(s[1])
        if o[0] == "bnode":
            bnodes.add(o[1])
    labels = {b: "" for b in bnodes}

    def term_sig(t, labels):
        if t[0] == "bnode":
            return "B" + labels[t[1]]
        return term_to_nt(t)

    for _round in range(len(bnodes) + 2):
        new_labels = {}
        for b in bnodes:
            sigs = []
            for s, p, o in triples:
                if s[0] == "bnode" and s[1] == b:
                    sigs.append(f"S|{p}|{term_sig(o, labels)}")
                if o[0] == "bnode" and o[1] == b:
                    sigs.append(f"O|{p}|{term_sig(s, labels)}")
            sigs.sort()
            new_labels[b] = hashlib.sha256(
                (labels[b] + "||" + ";".join(sigs)).encode()).hexdigest()
        if new_labels == labels:
            break
        labels = new_labels

    # Break remaining ties deterministically by ordinal of sorted signature.
    order = sorted(bnodes, key=lambda b: (labels[b], b))
    final = {}
    for i, b in enumerate(order):
        final[b] = f"c{i}"

    def relabel(t):
        if t[0] == "bnode":
            return ("bnode", final[t[1]])
        return t

    lines = sorted(
        f"{term_to_nt(relabel(s))} <{p}> {term_to_nt(relabel(o))} ."
        for s, p, o in set(triples)
    )
    return tuple(lines)


def isomorphic(triples_a, triples_b) -> bool:
    return canonicalize_bnodes(triples_a) == canonicalize_bnodes(triples_b)
