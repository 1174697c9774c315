"""N-Quads parser + provenance traversal tests (reference S1/J1-J3,
Read_And_Clean.py:108-146; data shape from webisalod-instances .nq)."""

from __future__ import annotations

from uni_mannheim_masters_thesis_spark.sources.nquads import (
    parse_nquads_lines,
    provenance_sentences,
)

PREFIX = "http://example.org/concept/"

LINES = [
    # quad with graph
    f'<{PREFIX}apple_> <http://x.org/skos#broader> <{PREFIX}fruit_> <http://x.org/prov/1> .',
    # typed literal object
    f'<{PREFIX}apple_> <http://x.org/ontology#hasConfidence> "0.87"^^<http://www.w3.org/2001/XMLSchema#float> <http://x.org/prov/1> .',
    # default-graph triple (no graph label)
    '<http://x.org/prov/1> <http://www.w3.org/ns/prov#wasDerivedFrom> <http://x.org/deriv/9> .',
    # literal with escaped quote
    '<http://x.org/deriv/9> <http://www.w3.org/ns/prov#value> "an apple is a \\"fruit\\"." .',
    # malformed line → dropped
    "this is not an nquad",
    # comment-ish
    "# comment",
]


def _parse(spark):
    raw = spark.createDataFrame([(line,) for line in LINES], ["value"])
    return parse_nquads_lines(raw)


def test_parse_components(spark):
    rows = {(r.subject, r.predicate): r for r in _parse(spark).collect()}
    assert len(rows) == 4  # malformed lines dropped
    q = rows[(f"{PREFIX}apple_", "http://x.org/skos#broader")]
    assert q.object == f"{PREFIX}fruit_"
    assert q.graph == "http://x.org/prov/1"
    assert not q.object_is_literal


def test_parse_typed_literal(spark):
    rows = {(r.subject, r.predicate): r for r in _parse(spark).collect()}
    lit = rows[(f"{PREFIX}apple_", "http://x.org/ontology#hasConfidence")]
    assert lit.object == "0.87"
    assert lit.object_is_literal


def test_parse_default_graph_is_null(spark):
    rows = {(r.subject, r.predicate): r for r in _parse(spark).collect()}
    dg = rows[("http://x.org/prov/1", "http://www.w3.org/ns/prov#wasDerivedFrom")]
    assert dg.graph is None


def test_two_hop_provenance(spark):
    quads = _parse(spark)
    out = provenance_sentences(quads, PREFIX).collect()
    assert len(out) == 1
    assert out[0].concept == "apple_"
    assert out[0].sentence == 'an apple is a \\"fruit\\".'
