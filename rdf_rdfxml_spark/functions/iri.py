"""IRI / URI utilities for the RDF/XML grammar.

Implements strict RFC 3986 reference resolution matching the semantics of
``RDF::URI#join`` as exercised by the reference implementation
(``/root/reference/lib/rdf/rdfxml/reader.rb:680-694`` — the ``uri`` helper —
and the 306-case resolution battery at
``/root/reference/spec/reader_spec.rb:489-1221``).

Key behavioural notes (verified against the battery's golden NT):

* A reference that carries its own scheme is **returned unchanged** — the
  reference's ``uri(value, append)`` short-circuits on ``append.absolute?``
  (reader.rb:683-684), so no dot-segment removal happens for absolute refs
  (e.g. ``http:g`` stays ``http:g``).
* Everything else follows RFC 3986 §5.2 (merge + remove_dot_segments),
  including the "abnormal" examples.
* ``xml:base`` values have any fragment stripped (reader.rb:98-100).

Pure Python, no dependencies — safe to ship into Arrow-batched UDF workers.
"""

from __future__ import annotations

import re

# RFC 3986 appendix B regex, anchored.
_RFC3986_RE = re.compile(
    r"^(?:([^:/?#]+):)?(?://([^/?#]*))?([^?#]*)(?:\?([^#]*))?(?:#(.*))?$",
    re.S,
)


def split_iri(iri: str):
    """Split an IRI reference into (scheme, authority, path, query, fragment).

    Components absent from the reference are ``None`` (empty string means
    present-but-empty, which RFC 3986 distinguishes).
    """
    m = _RFC3986_RE.match(iri)
    return m.group(1), m.group(2), m.group(3) or "", m.group(4), m.group(5)


def unsplit_iri(scheme, authority, path, query, fragment) -> str:
    out = []
    if scheme is not None:
        out.append(scheme)
        out.append(":")
    if authority is not None:
        out.append("//")
        out.append(authority)
    out.append(path)
    if query is not None:
        out.append("?")
        out.append(query)
    if fragment is not None:
        out.append("#")
        out.append(fragment)
    return "".join(out)


def has_scheme(iri: str) -> bool:
    """True when the reference carries a scheme (the reference's
    ``RDF::URI#absolute?`` test used by ``uri()``/``base=``)."""
    return _RFC3986_RE.match(iri).group(1) is not None


def remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    if not path:
        return path
    output: list[str] = []
    # Work on '/'-separated segments; faithful to the algorithm but O(n).
    i = 0
    n = len(path)
    while i < n:
        if path.startswith("../", i):
            i += 3
        elif path.startswith("./", i):
            i += 2
        elif path.startswith("/./", i):
            i += 2  # replace "/./" prefix with "/"
        elif path[i:] == "/.":
            output.append("/")
            break
        elif path.startswith("/../", i):
            i += 3
            if output:
                output.pop()
        elif path[i:] == "/..":
            i += 2
            if output:
                output.pop()
            output.append("/")
            break
        elif path[i:] in (".", ".."):
            break
        else:
            j = path.find("/", i + 1)
            if j == -1:
                output.append(path[i:])
                i = n
            else:
                output.append(path[i:j])
                i = j
    return "".join(output)


def _merge_paths(base_authority, base_path: str, ref_path: str) -> str:
    """RFC 3986 §5.2.3."""
    if base_authority is not None and base_path == "":
        return "/" + ref_path
    slash = base_path.rfind("/")
    if slash == -1:
        return ref_path
    return base_path[: slash + 1] + ref_path


def rfc3986_join(base: str, ref: str, strict: bool = True) -> str:
    """RFC 3986 §5.2.2 transform-references (strict mode)."""
    r_scheme, r_auth, r_path, r_query, r_frag = split_iri(ref)
    b_scheme, b_auth, b_path, b_query, _ = split_iri(base)
    if r_scheme is not None:
        t = (r_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    elif r_auth is not None:
        t = (b_scheme, r_auth, remove_dot_segments(r_path), r_query, r_frag)
    elif r_path == "":
        t = (b_scheme, b_auth, b_path, r_query if r_query is not None else b_query, r_frag)
    elif r_path.startswith("/"):
        t = (b_scheme, b_auth, remove_dot_segments(r_path), r_query, r_frag)
    else:
        merged = _merge_paths(b_auth, b_path, r_path)
        t = (b_scheme, b_auth, remove_dot_segments(merged), r_query, r_frag)
    return unsplit_iri(*t)


def resolve(base: str, ref: str) -> str:
    """The reference's ``uri(base, ref)`` (reader.rb:680-694): absolute refs
    (own scheme) pass through untouched; otherwise strict RFC 3986 join."""
    if ref is None:
        return base
    if has_scheme(ref):
        return ref
    return rfc3986_join(base or "", ref)


def strip_fragment(iri: str) -> str:
    """``EvaluationContext#base=`` keeps only the part before '#'
    (reader.rb:98-100)."""
    return iri.split("#", 1)[0]


def resolve_base(parent_base: str, xml_base: str) -> str:
    """Compute a new in-scope base from an ``xml:base`` attribute
    (reader.rb:69-76 + the fragment-stripping setter)."""
    if has_scheme(xml_base):
        b = xml_base
    else:
        b = rfc3986_join(parent_base or "", xml_base)
    return strip_fragment(b)


# --- NCName / XML Name validation -------------------------------------------
# Port of NC_REGEXP at /root/reference/lib/rdf/rdfxml.rb:31-42 (XML-Namespaces
# NCName: no ':'; must not start with [0-9$.-]).

_NC_START = (
    "A-Z_a-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u02FF\u0370-\u037D"
    "\u037F-\u1FFF\u200C-\u200D\u2070-\u218F\u2C00-\u2FEF\u3001-\uD7FF"
    "\uF900-\uFDCF\uFDF0-\uFFFD\U00010000-\U000EFFFF"
)
_NC_CHARS = _NC_START + "\\-0-9\u00B7\u0300-\u036F\u203F-\u2040."

NC_REGEXP = re.compile(
    "^(?!\\$)"            # not a $ start (reference excludes [\\d$.-] starts)
    "(?![0-9.\\-])"
    f"[{_NC_START}]"
    f"[{_NC_CHARS}]*$"
)


def is_ncname(value: str) -> bool:
    return bool(value) and NC_REGEXP.match(value) is not None


# --- NTriples string unescaping ----------------------------------------------
# The reference applies RDF::NTriples.unescape to rdf:ID/about/resource/nodeID
# attribute values (reader.rb:402-404, 600-614).

_UNESCAPE_RE = re.compile(
    r"\\(?:u([0-9A-Fa-f]{4})|U([0-9A-Fa-f]{8})|(.))", re.S
)
_ESCAPE_MAP = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def ntriples_unescape(value: str) -> str:
    if "\\" not in value:
        return value

    def _sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        c = m.group(3)
        return _ESCAPE_MAP.get(c, "\\" + c)

    return _UNESCAPE_RE.sub(_sub, value)
