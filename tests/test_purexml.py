"""Differential verification of the pure-Python XML adapter (purexml)
against the expat adapter — the dual-parser seam the reference keeps
(nokogiri/rexml, reader.rb:143-157; round-3 verdict "what's missing" #3).

Gate: over the whole vendored W3C corpus and the charset battery, the two
adapters must agree — identical trees on accepted documents, both reject
the rejected ones; on byte-mutation fuzz, purexml must never be LAXER
than expat (accepting what expat rejects), and whenever both accept the
trees must match.
"""

from __future__ import annotations

import pytest

from rdf_rdfxml_spark.functions.xmldom import XMLParseError, parse_document

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def tree(el):
    """Canonical flat event list of an Element tree (iterative — must
    survive 5000-deep documents)."""
    out = []
    stack = [("open", el)]
    while stack:
        kind, node = stack.pop()
        if kind == "open":
            out.append(("E", node.ns, node.local, node.prefix,
                        tuple(node.attrs), tuple(node.ns_decls)))
            stack.append(("close", None))
            for c in reversed(node.children):
                if c.is_text:
                    stack.append(("text", c.value))
                else:
                    stack.append(("open", c))
        elif kind == "text":
            out.append(("T", node))
        else:
            out.append(("/",))
    return out


def both(content):
    """(expat_result, python_result) where result is tree | XMLParseError."""
    out = []
    for lib in ("expat", "python"):
        try:
            out.append(tree(parse_document(content, library=lib)))
        except XMLParseError as e:
            out.append(XMLParseError)
    return out


def test_w3c_corpus_differential():
    """Every vendored W3C input (positive AND negative): adapters agree."""
    from rdf_rdfxml_spark.sources.w3c import load_manifest
    n_same = n_reject = 0
    for e in load_manifest():
        a, b = both(e.read_action())
        assert a == b, f"adapter divergence on {e.test_id}"
        if a is XMLParseError:
            n_reject += 1
        else:
            n_same += 1
    assert n_same > 120  # most inputs are XML-well-formed


def test_w3c_conformance_under_python_adapter(monkeypatch):
    """The FULL W3C conformance gate (isomorphism P/R) must also pass
    with the pure-Python adapter driving the grammar — the fallback is a
    first-class parser, not a toy."""
    monkeypatch.setenv("RDFXML_SPARK_XML_LIBRARY", "python")
    from rdf_rdfxml_spark.sources.w3c import run_conformance
    results = run_conformance()
    failed = [r for r in results if r[2] != "passed"]
    assert len(results) == 171 and not failed, \
        f"python-adapter conformance failures: {failed[:5]}"


def test_charset_battery_differential():
    """bytes input across encodings: BOMs, declared charsets, defaults."""
    base = ('<?xml version="1.0"?><r a="é世">téxt</r>')
    cases = [
        base.encode("utf-8"),
        "﻿".encode("utf-8") + base.encode("utf-8"),
        base.encode("utf-16"),          # BOM included by codec
        base.encode("utf-16-le"),       # undeclared, '<' heuristic
        ('<?xml version="1.0" encoding="ISO-8859-1"?>'
         '<r a="é">téxt</r>').encode("latin-1"),
        ('<?xml version="1.0" encoding="UTF-16"?>' + base[21:]
         ).encode("utf-16"),
    ]
    for data in cases:
        a, b = both(data)
        assert a == b and a is not XMLParseError, data[:40]
    # multi-byte declared charset: purexml decodes it directly; the expat
    # ADAPTER reaches the same tree via its declared-decode retry
    sj = ('<?xml version="1.0" encoding="shift_jis"?>'
          '<r>日本語</r>').encode("shift_jis")
    a, b = both(sj)
    assert a == b and a is not XMLParseError


def test_entity_contracts_python_adapter():
    """Internal entities expand; billion-laughs hits the amplification
    guard; SYSTEM entities substitute empty (XXE) — same contracts the
    expat path honors."""
    doc = ('<!DOCTYPE r [<!ENTITY who "world">]>'
           '<r>hello &who;</r>')
    el = parse_document(doc, library="python")
    assert el.children[0].value == "hello world"

    ents = ['<!ENTITY a "haha">'] + [
        f'<!ENTITY {cur} "{"&%s;" % prev * 10}">'
        for prev, cur in zip("abcdefghij", "bcdefghijk")]
    bomb = ("<!DOCTYPE r [" + "".join(ents) + "]><r>&k;</r>")
    with pytest.raises(XMLParseError, match="amplification"):
        parse_document(bomb, library="python")

    xxe = ('<!DOCTYPE r [<!ENTITY x SYSTEM "file:///etc/passwd">]>'
           '<r>&x;</r>')
    el = parse_document(xxe, library="python")
    assert el.inner_text() == ""

    # entity with balanced markup expands structurally
    doc = ('<!DOCTYPE r [<!ENTITY m "<b>x</b>y">]><r>&m;</r>')
    el = parse_document(doc, library="python")
    assert [c.is_element for c in el.children] == [True, False]
    # unbalanced markup in an entity is a WFC violation
    with pytest.raises(XMLParseError):
        parse_document('<!DOCTYPE r [<!ENTITY m "<b>">]><r>&m;</r>',
                       library="python")


def test_deep_nesting_iterative():
    """5000-deep documents must parse (or reject) without RecursionError
    — the element loop is iterative, matching the per-document isolation
    contract."""
    deep = "<r>" + "<a>" * 5000 + "</a>" * 5000 + "</r>"
    a, b = both(deep)
    assert a == b


def test_wellformedness_rejections_differential():
    cases = [
        "<a><b></a>",                       # tag mismatch
        "<a",                               # truncated
        "<a/><b/>",                         # multiple roots
        "<a x='1' x='2'/>",                 # duplicate attribute
        "<a xmlns:p='u' p:x='1' p:x='2'/>",  # duplicate expanded attr
        "<p:a/>",                           # undeclared prefix
        "<a>]]></a>",                       # ']]>' in content
        "<a>&undef;</a>",                   # undefined entity
        "<a>\x01</a>",                      # invalid char
        "<a><!-- -- --></a>",               # '--' in comment
        "<a y=<1/>",                        # '<' in attribute
        "junk<a/>",                         # junk in prolog
        "<a/>trailing",                     # junk in epilog
        "<1bad/>",                          # bad name start
    ]
    for doc in cases:
        a, b = both(doc)
        assert a is XMLParseError, f"expat accepted {doc!r}"
        assert b is XMLParseError, f"purexml accepted {doc!r}"


def test_fuzz_purexml_never_laxer():
    """Byte mutations of a real corpus document: purexml must never
    accept what expat rejects, and when both accept, trees match."""
    import random
    base = ('<?xml version="1.0"?>\n'
            f'<rdf:RDF xmlns:rdf="{RDF}" xmlns:ex="http://e/">\n'
            '<rdf:Description rdf:about="http://a/" ex:v="1">'
            '<ex:p xml:lang="en">text &amp; more</ex:p>'
            '<ex:q rdf:parseType="Literal"><b a="c">x</b></ex:q>'
            '</rdf:Description></rdf:RDF>\n').encode()
    rng = random.Random(7)
    laxer = []
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.randint(1, 3)):
            j = rng.randrange(len(b))
            b[j] = rng.randrange(256)
        a, p = both(bytes(b))
        if a is XMLParseError and p is not XMLParseError:
            laxer.append(bytes(b))
        elif a is not XMLParseError and p is not XMLParseError:
            assert a == p, f"tree divergence on mutation {bytes(b)[:60]!r}"
    assert not laxer, f"purexml laxer than expat on {laxer[:2]}"


def test_hypothesis_structured_differential():
    """Property-based differential: random WELL-FORMED documents built
    from a structured generator (nested elements, namespaces, entities,
    CDATA, comments, attribute edge characters) must parse to identical
    trees under both adapters — covers shapes byte-mutation fuzz never
    reaches."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    names = st.sampled_from(["a", "b", "ex:p", "ex:q", "data", "x1"])
    texts = st.sampled_from(
        ["", "plain", "a &lt; b", "tab\there", "x &amp;&#65; y",
         "line\nbreak", "]] >", "é世界", "&who;"])
    attr_vals = st.sampled_from(
        ["v", "a&amp;b", "sp  ace", "tab\tchar", "&#x41;bc", "q'q", "é"])

    @st.composite
    def element(draw, depth=0):
        name = draw(names)
        attrs = draw(st.lists(
            st.tuples(st.sampled_from(["k", "ex:k", "n", "xml:lang"]),
                      attr_vals),
            max_size=3, unique_by=lambda t: t[0]))
        a_str = "".join(f' {k}="{v}"' for k, v in attrs)
        if depth >= 3 or draw(st.booleans()):
            body = draw(texts)
        else:
            kids = draw(st.lists(element(depth=depth + 1), max_size=3))
            body = draw(texts) + "".join(kids)
        extra = draw(st.sampled_from(
            ["", "<!-- c -->", "<![CDATA[<raw>&]]>", "<?pi data?>"]))
        return f"<{name}{a_str}>{body}{extra}</{name}>"

    @given(element())
    @settings(max_examples=150, deadline=None)
    def run(root_body):
        doc = ('<?xml version="1.0"?>'
               '<!DOCTYPE r [<!ENTITY who "World &amp; co">]>'
               f'<r xmlns:ex="http://e/">{root_body}</r>')
        a, b = both(doc)
        assert a == b, doc[:160]
        assert a is not XMLParseError, doc[:160]

    run()


def test_arbitrary_bytes_never_raise_python_adapter(monkeypatch):
    """The never-raise isolation contract must hold with the python
    adapter driving the grammar: hostile byte blobs become error rows,
    never exceptions (same battery as the expat path)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from rdf_rdfxml_spark import parse_rdfxml

    monkeypatch.setenv("RDFXML_SPARK_XML_LIBRARY", "python")

    @given(st.one_of(
        st.binary(max_size=300),
        st.text(max_size=300).map(lambda t: t.encode("utf-8", "ignore")),
        st.sampled_from([
            b'<?xml version="1.0"?><!DOCTYPE r [<!ENTITY',
            b"<a b=]]><c>&#xD800;</c>",
            b"\xff\xfe<\x00a\x00",
            b"<!DOCTYPE r SYSTEM 'u' [<!ENTITY % p '<!---->'>%p;]><r/>",
        ])))
    @settings(max_examples=300, deadline=None)
    def run(data):
        triples, errors = parse_rdfxml(data, doc_key="fz", strict=True)
        assert isinstance(triples, list) and isinstance(errors, list)

    run()
