"""Exclusive XML canonicalization for ``rdf:parseType="Literal"`` content.

Mirrors the reference's ``c14nxl`` call (reader.rb:510-518, provided there by
the rdf-xsd gem over Nokogiri's Exclusive C14N 1.0): element children are
serialized in exclusive-canonical form — namespace declarations only where a
prefix is visibly utilized and not already output, attributes sorted per the
C14N rules, no self-closing tags, comments dropped — and the in-scope
``xml:lang`` (the parent context's language, a reference quirk) is injected
onto top-level elements that don't override it. Text nodes pass through with
canonical character escaping.
"""

from __future__ import annotations

from .xmldom import XML_NS, Element, Text

_TEXT_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"), ("\r", "&#xD;")]
_ATTR_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), ('"', "&quot;"),
                 ("\t", "&#x9;"), ("\n", "&#xA;"), ("\r", "&#xD;")]


def _escape_text(value: str) -> str:
    for src, dst in _TEXT_ESCAPES:
        value = value.replace(src, dst)
    return value


def _escape_attr(value: str) -> str:
    for src, dst in _ATTR_ESCAPES:
        value = value.replace(src, dst)
    return value


def _render_element(el: Element, rendered_ns: dict, extra_attrs) -> str:
    """Serialize one element exclusively-canonically.

    ``rendered_ns``: prefix -> uri already emitted in the output ancestor
    chain ('' key is the default namespace, value '' meaning none).
    ``extra_attrs``: [(ns, local, prefix, value)] injected attributes
    (the inherited xml:lang on top-level elements), skipped when the element
    carries its own.
    """
    # Visibly utilized namespaces: the element's own prefix + attr prefixes.
    ns_out: dict[str, str] = {}
    if el.prefix is not None:
        if rendered_ns.get(el.prefix) != (el.ns or ""):
            ns_out[el.prefix] = el.ns or ""
    else:
        default = el.ns or ""
        if rendered_ns.get("", "") != default:
            ns_out[""] = default

    attrs = list(el.attrs)
    for extra in extra_attrs:
        if el.attr(extra[0], extra[1]) is None:
            attrs.append(extra)

    for a_ns, _local, a_prefix, _value in attrs:
        if a_prefix is not None and a_prefix != "xml":
            if rendered_ns.get(a_prefix) != (a_ns or ""):
                ns_out[a_prefix] = a_ns or ""

    child_rendered = dict(rendered_ns)
    child_rendered.update(ns_out)

    name = f"{el.prefix}:{el.local}" if el.prefix else el.local
    parts = ["<", name]
    for prefix in sorted(ns_out):
        uri = _escape_attr(ns_out[prefix])
        parts.append(f' xmlns="{uri}"' if prefix == ""
                     else f' xmlns:{prefix}="{uri}"')
    # C14N attribute order: (namespace URI, local name); unqualified first.
    for a_ns, a_local, a_prefix, value in sorted(
            attrs, key=lambda a: (a[0] or "", a[1])):
        attr_name = f"{a_prefix}:{a_local}" if a_prefix else a_local
        parts.append(f' {attr_name}="{_escape_attr(value)}"')
    parts.append(">")
    for child in el.children:
        if child.is_text:
            parts.append(_escape_text(child.value))
        else:
            parts.append(_render_element(child, child_rendered, ()))
    parts.append(f"</{name}>")
    return "".join(parts)


def c14nxl(children, language: str | None = None,
           namespaces: dict | None = None) -> str:
    """Canonicalize a node list (the children of a parseType="Literal"
    property element) to its exclusive-canonical string form."""
    lang_attr = ((XML_NS, "lang", "xml", language),) if language else ()
    out = []
    for node in children:
        if node.is_text:
            out.append(_escape_text(node.value))
        else:
            out.append(_render_element(node, {}, lang_attr))
    return "".join(out)
