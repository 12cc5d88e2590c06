"""Canonical Spark schemas (SURVEY.md §1.2).

The reference's term universe is a 3-kind tagged union (IRI / bnode /
literal) with two optional literal annotations — strings plus kind tags all
the way down (RDF.rb Statement, reader.rb:288-292). ``doc_sha`` carries the
per-row ``sha256(content)`` lineage invariant onto every emitted triple;
``repo``/``path``/``commit`` are provenance passthrough from the input table
(BASELINE.json input_hint).
"""

from pyspark.sql.types import StructField, StructType, StringType

_S = StringType()

#: Unified extraction output: ``rec`` = 'triple' | 'error'. Error rows carry
#: the message in ``o`` and nulls elsewhere — one parse per document serves
#: both channels without a second pass.
EXTRACT_SCHEMA = StructType([
    StructField("rec", _S, False),
    StructField("s", _S, True),
    StructField("s_kind", _S, True),
    StructField("p", _S, True),
    StructField("o", _S, True),
    StructField("o_kind", _S, True),
    StructField("o_lang", _S, True),
    StructField("o_dt", _S, True),
    StructField("doc_sha", _S, False),
    StructField("repo", _S, True),
    StructField("path", _S, True),
    StructField("commit", _S, True),
])

TRIPLE_COLUMNS = ["s", "s_kind", "p", "o", "o_kind", "o_lang", "o_dt"]
PROVENANCE_COLUMNS = ["doc_sha", "repo", "path", "commit"]

#: Input shape mandated by BASELINE.json input_hint.
DOCUMENTS_SCHEMA = StructType([
    StructField("repo", _S, True),
    StructField("path", _S, True),
    StructField("commit", _S, True),
    StructField("lang", _S, True),
    StructField("content", _S, False),
])
