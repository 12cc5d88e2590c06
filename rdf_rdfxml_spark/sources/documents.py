"""XML corpus construction over the ``documents`` test table.

The driver's correctness gate runs each Spark query against an ANSI-SQL
oracle in DuckDB over the *same* parquet tables. To make the KG-construction
pipeline oracle-checkable, RDF/XML documents are built **deterministically
from table rows** with one SQL expression that is valid verbatim in both
Spark SQL and DuckDB (only ``||`` concat + CAST AS STRING). The oracle can
then state the expected triples as plain relational projections of
``documents`` — including sha256-derived blank-node ids, since both engines
expose the same ``sha256``/``sha2`` of the identical content string.

``documents`` columns (TESTDATA.md): doc_id, text, lang, source, n_chars —
all clean ASCII (verified: no XML-special or control characters), so no
escaping is required and literal round-trips are byte-exact.
"""

from __future__ import annotations

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
VOC = "http://example.org/voc#"
XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

_PRELUDE = (
    '<?xml version="1.0"?>'
    f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{VOC}" '
    'xml:base="http://example.org/">'
)

_DOC_ID = "CAST(doc_id AS STRING)"


def _q(s: str) -> str:
    """SQL single-quoted string literal (valid in Spark SQL and DuckDB)."""
    return "'" + s.replace("'", "''") + "'"


def _cat(*parts: str) -> str:
    """Concat SQL fragments with ``||``."""
    return " || ".join(parts)


def xml_basic_expr() -> str:
    """Typed node element + property attribute + literal / typed / lang-tagged
    property elements (grammar G2/G4/G8)."""
    return _cat(
        _q(_PRELUDE + '<ex:Document rdf:about="doc/'), _DOC_ID,
        _q('" ex:source="'), "source",
        _q('"><ex:lang>'), "lang",
        _q('</ex:lang><ex:chars rdf:datatype="' + XSD_INT + '">'),
        "CAST(n_chars AS STRING)",
        _q('</ex:chars><ex:body xml:lang="'), "lang",
        _q('">'), "text",
        _q('</ex:body></ex:Document></rdf:RDF>'),
    )


def xml_container_expr() -> str:
    """rdf:Seq with three rdf:li children (grammar G5 li-expansion)."""
    return _cat(
        _q(_PRELUDE + '<rdf:Seq><rdf:li>'), "lang",
        _q('</rdf:li><rdf:li>'), "source",
        _q('</rdf:li><rdf:li rdf:resource="doc/'), _DOC_ID,
        _q('"/></rdf:Seq></rdf:RDF>'),
    )


def xml_collection_expr() -> str:
    """parseType=Collection with two member IRIs (grammar G10)."""
    return _cat(
        _q(_PRELUDE + '<rdf:Description rdf:about="doc/'), _DOC_ID,
        _q('"><ex:members rdf:parseType="Collection">'
           '<rdf:Description rdf:about="m/a"/>'
           '<rdf:Description rdf:about="m/b"/>'
           '</ex:members></rdf:Description></rdf:RDF>'),
    )


def xml_reify_expr() -> str:
    """rdf:ID on a property element → 4 reification triples (grammar G13)."""
    return _cat(
        _q(_PRELUDE + '<rdf:Description rdf:about="doc/'), _DOC_ID,
        _q('"><ex:src rdf:ID="st'), _DOC_ID,
        _q('">'), "source",
        _q('</ex:src></rdf:Description></rdf:RDF>'),
    )


def xml_nested_expr() -> str:
    """Nested anonymous rdf:Description (grammar G7 + fresh bnode) — the
    bnode id is ``b:<sha256(content)>:0``, checkable in SQL on both sides."""
    return _cat(
        _q(_PRELUDE + '<rdf:Description rdf:about="doc/'), _DOC_ID,
        _q('"><ex:meta><rdf:Description><ex:origin>'), "source",
        _q('</ex:origin></rdf:Description></ex:meta>'
           '</rdf:Description></rdf:RDF>'),
    )


def xml_xmlliteral_expr() -> str:
    """parseType="Literal" with markup content (grammar G11 — exclusive
    canonicalization is value-checked relationally on both sides)."""
    return _cat(
        _q(_PRELUDE + '<rdf:Description rdf:about="doc/'), _DOC_ID,
        _q('"><ex:markup rdf:parseType="Literal">a <ex:b>c'), _DOC_ID,
        _q('</ex:b></ex:markup></rdf:Description></rdf:RDF>'),
    )


def xml_xmlbase_expr() -> str:
    """Nested xml:base + rdf:ID + relative rdf:resource (grammar G1/G3/G14:
    RFC 3986 resolution incl. dot segments, fragment minting)."""
    head = ('<?xml version="1.0"?>'
            f'<rdf:RDF xmlns:rdf="{RDF_NS}" xmlns:ex="{VOC}" '
            'xml:base="http://example.org/dir/file.rdf">')
    return _cat(
        _q(head + '<rdf:Description rdf:ID="d'), _DOC_ID,
        _q('"><ex:link rdf:resource="rel/'), _DOC_ID,
        _q('"/><ex:up rdf:resource="../top"/>'
           '</rdf:Description></rdf:RDF>'),
    )


def xml_nodeid_expr() -> str:
    """rdf:nodeID shared across subject/object positions (grammar G3/G17:
    the per-document labeled bnode cache)."""
    return _cat(
        _q(_PRELUDE + '<rdf:Description rdf:about="doc/'), _DOC_ID,
        _q('"><ex:knows rdf:nodeID="n1"/></rdf:Description>'
           '<rdf:Description rdf:nodeID="n1"><ex:origin>'), "source",
        _q('</ex:origin></rdf:Description></rdf:RDF>'),
    )


def xml_maybe_broken_expr() -> str:
    """Malformed XML (unclosed element) for doc_id % 7 == 3 — drives the
    error channel; the basic well-formed document otherwise."""
    broken = _cat(
        _q(_PRELUDE + '<ex:Document rdf:about="doc/'), _DOC_ID,
        _q('"><ex:lang>'), "lang",
    )
    return f"CASE WHEN doc_id % 7 = 3 THEN {broken} ELSE {xml_basic_expr()} END"
