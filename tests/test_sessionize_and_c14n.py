"""Sessionization (batch window functions + applyInPandasWithState
streaming), writer base-relativization, and XMLLiteral c14n edge cases."""
import time

import pytest
from pyspark.sql import functions as F

from rdf_rdfxml_spark.parser.grammar import parse_rdfxml
from rdf_rdfxml_spark.functions.nt import isomorphic
from rdf_rdfxml_spark.streaming.sessionize import (
    sessionize_batch, sessionize_stream,
)
from rdf_rdfxml_spark.writer.serialize import serialize_graph

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def test_sessionize_batch_semantics(spark):
    rows = [
        # user 1: two sessions (gap 45 min between event 2 and 3)
        (1, "2024-01-01 00:00:00", 1.00, 10),
        (1, "2024-01-01 00:10:00", 2.00, 11),
        (1, "2024-01-01 00:55:00", 3.00, 12),
        # user 2: one session
        (2, "2024-01-01 05:00:00", 5.00, 13),
    ]
    e = spark.createDataFrame(
        [(u, ts, v, i) for u, ts, v, i in rows],
        "user_id long, ts_s string, value double, event_id long"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    got = {(r["user_id"], r["session_start"]): (r["n_events"],
                                                r["value_cents"])
           for r in sessionize_batch(e).collect()}
    t0 = 1704067200  # 2024-01-01 00:00:00 UTC
    assert got == {
        (1, t0): (2, 300),
        (1, t0 + 55 * 60): (1, 300),
        (2, t0 + 5 * 3600): (1, 500),
    }


def test_sessionize_batch_matches_oracle_on_events(spark):
    import duckdb
    from rdf_rdfxml_spark.streaming.sessionize import ORACLE_SQL
    sf = "/root/testdata/sf0.001"
    got = sessionize_batch(spark.read.parquet(f"{sf}/events.parquet"))
    srows = {tuple(r) for r in got.collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf}/events.parquet')")
    orows = {tuple(r) for r in con.sql(ORACLE_SQL).fetchall()}
    assert srows == orows


def test_sessionize_stream_stateful(spark, tmp_path):
    rows = [
        (1, "2024-01-01 00:00:00", 1.00),
        (1, "2024-01-01 00:10:00", 2.00),
        (1, "2024-01-01 00:55:00", 3.00),   # closes session 1 in-stream
        (2, "2024-01-01 05:00:00", 5.00),   # advances watermark past s2
    ]
    src = str(tmp_path / "in")
    (spark.createDataFrame(rows, "user_id long, ts_s string, value double")
     .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
     .write.parquet(src))
    out = str(tmp_path / "out")

    def run():
        stream = (spark.readStream
                  .schema("user_id long, value double, ts timestamp")
                  .parquet(src))
        q = (sessionize_stream(stream).writeStream
             .format("parquet").option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append")
             .trigger(availableNow=True).start())
        assert q.awaitTermination(180)

    run()
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    t0 = 1704067200
    # session 1 closed by the observed gap; session 2 closed by the
    # event-time timeout once the watermark (user 2's event) passed it
    assert (1, t0, 2, 300) in got
    assert (1, t0 + 55 * 60, 1, 300) in got
    # user 2's session is still open (watermark hasn't passed its deadline)
    assert not any(r[0] == 2 for r in got)
    # restart with same checkpoint + no new data → terminates, no duplicates
    run()
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == got


def test_writer_relativizes_against_base():
    triples = [
        (("iri", "http://ex.org/dir/item1"), "http://v/p",
         ("iri", "http://ex.org/dir/item2")),
        (("iri", "http://ex.org/dir/item1"), "http://v/q",
         ("iri", "http://other.example/abs")),
        (("iri", "http://ex.org/dir/"), "http://v/r",
         ("iri", "http://ex.org/dir/item1#frag")),
    ]
    rows = [{"s": s[1], "s_kind": s[0], "p": p, "o": o[1], "o_kind": o[0],
             "o_lang": None, "o_dt": None} for s, p, o in triples]
    xml = serialize_graph(rows, base_uri="http://ex.org/dir/")
    assert 'rdf:about="item1"' in xml
    assert 'rdf:resource="item2"' in xml
    assert 'rdf:resource="http://other.example/abs"' in xml  # not relativized
    assert 'rdf:about=""' in xml                              # base itself
    reparsed, errors = parse_rdfxml(xml, base_uri="", doc_key="r")
    assert not errors
    assert isomorphic(reparsed, triples), xml


def test_writer_relativization_is_resolution_safe():
    # base NOT ending in '/': bare suffix would resolve wrongly — must stay
    # absolute
    triples = [(("iri", "http://ex.org/dir/file"), "http://v/p",
                ("iri", "http://ex.org/dir/filename"))]
    rows = [{"s": "http://ex.org/dir/file", "s_kind": "iri", "p": "http://v/p",
             "o": "http://ex.org/dir/filename", "o_kind": "iri",
             "o_lang": None, "o_dt": None}]
    xml = serialize_graph(rows, base_uri="http://ex.org/dir/file")
    assert 'rdf:resource="http://ex.org/dir/filename"' in xml
    reparsed, errors = parse_rdfxml(xml, base_uri="", doc_key="r")
    assert not errors
    assert isomorphic(reparsed, triples)


# --- c14n edges -----------------------------------------------------------------

def _xmlliteral_value(doc, base=""):
    triples, errors = parse_rdfxml(doc, base_uri=base, doc_key="c")
    assert not errors
    assert len(triples) == 1
    return triples[0][2][1]


def test_c14n_attribute_sorting_and_ns_dedup():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:a="http://a/" xmlns:b="http://b/">
      <rdf:Description rdf:about="http://x/">
        <a:m rdf:parseType="Literal"><a:e zzz="1" b:k="2" aaa="3" a:j="4"/></a:m>
      </rdf:Description>
    </rdf:RDF>"""
    # ns decls sorted by prefix; unqualified attrs first (ns URI ''),
    # then by (ns URI, local): http://a/ j before http://b/ k
    assert _xmlliteral_value(doc) == (
        '<a:e xmlns:a="http://a/" xmlns:b="http://b/" '
        'aaa="3" zzz="1" a:j="4" b:k="2"></a:e>')


def test_c14n_nested_ns_not_redeclared():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:a="http://a/">
      <rdf:Description rdf:about="http://x/">
        <a:m rdf:parseType="Literal"><a:outer><a:inner>t</a:inner></a:outer></a:m>
      </rdf:Description>
    </rdf:RDF>"""
    assert _xmlliteral_value(doc) == (
        '<a:outer xmlns:a="http://a/"><a:inner>t</a:inner></a:outer>')


def test_c14n_existing_xml_lang_not_overridden():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:a="http://a/" xml:lang="en">
      <rdf:Description rdf:about="http://x/">
        <a:m rdf:parseType="Literal"><a:e xml:lang="fr">t</a:e></a:m>
      </rdf:Description>
    </rdf:RDF>"""
    assert _xmlliteral_value(doc) == (
        '<a:e xmlns:a="http://a/" xml:lang="fr">t</a:e>')


def test_c14n_text_escaping():
    doc = f"""<rdf:RDF xmlns:rdf="{RDF}" xmlns:a="http://a/">
      <rdf:Description rdf:about="http://x/">
        <a:m rdf:parseType="Literal">x &amp; y &lt; z</a:m>
      </rdf:Description>
    </rdf:RDF>"""
    assert _xmlliteral_value(doc) == "x &amp; y &lt; z"
