"""N-Quads (RDF) source + provenance traversal (S1, J1-J3).

The reference parses WebIsALOD N-Quads with an in-memory rdflib graph
(``Read_And_Clean.py:108-110``) and walks it imperatively: first triple
per context → concept (``Read_And_Clean.py:114-124``), then two
provenance hops ``prov:wasDerivedFrom`` → ``prov:value`` to reach the
source sentences (``Read_And_Clean.py:140-146``).

Here the quad store is a DataFrame[subject, predicate, object, graph]
parsed from the text lines with one regex (line-at-a-time grammar of
N-Quads: ``<s> <p> (<o>|"literal"...) [<g>] .``), and the traversal is
two self equi-joins — Catalyst plans them as broadcast or sort-merge
depending on size, and at 100 TB the quads table partitions by subject
so both hops co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one capture per N-Quads component; object may be an IRI or a literal
# (with optional datatype/lang tag), graph label optional.
_NQ_RE = (
    r"^\s*<([^>]*)>\s+<([^>]*)>\s+"  # subject, predicate
    r"(<[^>]*>|\"(?:[^\"\\]|\\.)*\"(?:\^\^<[^>]*>|@\S+)?)\s*"  # object
    r"(?:<([^>]*)>\s*)?\.\s*$"  # optional graph
)


def parse_nquads_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a DataFrame of raw N-Quads lines into [subject, predicate,
    object, object_is_literal, graph]. Malformed/comment lines are dropped
    (matching rdflib's strict parse minus error propagation)."""
    v = F.col(value_col)
    parsed = lines.select(
        F.regexp_extract(v, _NQ_RE, 1).alias("subject"),
        F.regexp_extract(v, _NQ_RE, 2).alias("predicate"),
        F.regexp_extract(v, _NQ_RE, 3).alias("raw_object"),
        F.regexp_extract(v, _NQ_RE, 4).alias("graph"),
    ).filter(F.col("subject") != "")
    obj_is_iri = F.col("raw_object").startswith("<")
    literal = F.regexp_extract(F.col("raw_object"), r'^"((?:[^"\\]|\\.)*)"', 1)
    return parsed.select(
        "subject",
        "predicate",
        F.when(obj_is_iri, F.expr("substring(raw_object, 2, length(raw_object) - 2)"))
        .otherwise(literal)
        .alias("object"),
        (~obj_is_iri).alias("object_is_literal"),
        F.when(F.col("graph") == "", None).otherwise(F.col("graph")).alias("graph"),
    )


def read_nquads(spark: SparkSession, path: str) -> DataFrame:
    """S1: N-Quads file → DataFrame[subject, predicate, object, graph]."""
    return parse_nquads_lines(spark.read.text(path))


def provenance_sentences(
    quads: DataFrame,
    concept_prefix: str,
    derived_from_uri: str = "http://www.w3.org/ns/prov#wasDerivedFrom",
    value_uri: str = "http://www.w3.org/ns/prov#value",
) -> DataFrame:
    """Concept → raw sentences via the two-hop provenance traversal.

    J1 (first triple per graph gives the concept), J2 (wasDerivedFrom
    hop), J3 (prov:value hop). Returns DataFrame[concept, sentence].
    """
    from ..operators.relational import per_group_first

    in_graph = quads.filter(F.col("graph").isNotNull())
    concept_per_graph = (
        per_group_first(
            in_graph, ["graph"], [F.col("subject"), F.col("predicate"), F.col("object")]
        )
        .filter(F.col("subject").startswith(concept_prefix))  # P1
        .select(
            F.col("graph").alias("g"),
            # P2: positional strip, NOT regexp_replace — the prefix is a
            # URI full of regex metachars ('.'), and an unanchored global
            # replace would also mangle subjects that embed the prefix
            F.col("subject")
            .substr(F.lit(len(concept_prefix) + 1), F.length("subject"))
            .alias("concept"),
        )
    )
    hop1 = quads.filter(F.col("predicate") == derived_from_uri).select(
        F.col("subject").alias("prov_node"), F.col("object").alias("derivation")
    )
    hop2 = quads.filter(F.col("predicate") == value_uri).select(
        F.col("subject").alias("derivation2"), F.col("object").alias("sentence")
    )
    return (
        concept_per_graph.join(hop1, F.col("g") == F.col("prov_node"))
        .join(hop2, F.col("derivation") == F.col("derivation2"))
        .select("concept", "sentence")
    )
