"""Graph set-semantics (SURVEY.md §2.4 D3).

The reference accumulates statements into ``RDF::Repository`` — *set*
semantics, duplicate inserts collapse (spec/reader_spec.rb:1224). Here that
is a hash aggregate with map-side partial aggregation (Catalyst plans
``dropDuplicates`` as partial+final HashAggregate, so duplicate-heavy
corpora shrink before the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..schema import TRIPLE_COLUMNS


def dedup_document(triples: DataFrame) -> DataFrame:
    """Per-document set semantics: one reader per document in the reference,
    so duplicates collapse within a document; the same logical triple from
    two documents is kept twice (distinct provenance)."""
    return triples.dropDuplicates([*TRIPLE_COLUMNS, "doc_sha"])


def dedup_global(triples: DataFrame) -> DataFrame:
    """Corpus-level graph view: provenance dropped, the triple *set*.

    Equivalent to inserting every parsed statement into one
    ``RDF::Repository``. Blank-node ids are doc-scoped (D1), so bnodes from
    different documents correctly stay distinct here.
    """
    return triples.select(*TRIPLE_COLUMNS).dropDuplicates(TRIPLE_COLUMNS)
