"""rdf_rdfxml_spark — PySpark-native RDF/XML knowledge-graph construction.

Public API:

* :func:`parse_rdfxml` — pure-Python per-document parse (the function the
  Spark extraction stage vectorizes over Arrow batches).
* :mod:`rdf_rdfxml_spark.operators` — DataFrame-level pipeline stages.
"""

from .parser.grammar import parse_rdfxml

__all__ = ["parse_rdfxml"]
__version__ = "0.1.0"
