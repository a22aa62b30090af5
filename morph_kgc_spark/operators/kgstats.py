"""KG output profiling: characteristic sets over materialized triples.

A KG-construction pipeline does not end at the N-Triples sink — the
standard next step is profiling the emitted graph so downstream query
engines can size joins and users can sanity-check the mapping actually
produced the predicate combinations they expect. The canonical profile
is the CHARACTERISTIC SET (Neumann & Moerkotte, ICDE 2011): the set of
distinct predicates attached to a subject. Grouping subjects by their
characteristic set yields a compact structural histogram of the graph
— RDF stores use it for cardinality estimation; mapping authors use it
to spot subjects that silently lost a predicate to a null reference.

The reference engine has no counterpart (it stops at serialization);
this is pipeline surface in the same spirit as the dedup/ANN families.

Scale shape: two shuffles. The first groups the triple stream by
subject (the same key the assembled KG is naturally partitioned on —
at 100 TB this is a map-side-combinable aggregate whose output is one
row per subject). The second groups those rows by the cset string,
whose cardinality is the number of DISTINCT predicate combinations —
dozens to thousands, never corpus-scale — so the final exchange is
negligible. Nothing is collected; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def characteristic_sets(triples: DataFrame,
                        subject_col: str = "subject",
                        predicate_col: str = "predicate") -> DataFrame:
    """Structural histogram of a triple stream: one row per distinct
    characteristic set (space-joined sorted predicate list), with the
    number of subjects exhibiting it and the total triples they carry.

    Output: (cset string, n_subjects long, n_triples long). ``cset``
    is deterministic — predicates are sorted before joining — so the
    result is oracle-comparable and stable across partitionings.
    """
    per_subject = (
        triples
        .groupBy(F.col(subject_col).alias("s"))
        .agg(
            F.array_join(F.sort_array(F.collect_set(predicate_col)), " ")
             .alias("cset"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_subject
        .groupBy("cset")
        .agg(
            F.count(F.lit(1)).alias("n_subjects"),
            F.sum("n").alias("n_triples"),
        )
    )


def void_property_partition(triples: DataFrame,
                            subject_col: str = "subject",
                            predicate_col: str = "predicate",
                            object_col: str = "object") -> DataFrame:
    """VoID-style property partition of a triple stream: one row per
    distinct predicate with its triple count and the number of DISTINCT
    subjects / objects it connects (the W3C VoID vocabulary's
    ``void:propertyPartition`` with ``void:triples`` /
    ``void:distinctSubjects`` / ``void:distinctObjects``).

    This is the other half of the standard KG profile next to
    :func:`characteristic_sets` — per-predicate cardinalities drive
    join ordering in SPARQL engines and are the first sanity check a
    mapping author runs ("did every order really get a price?").
    The reference stops at serialization; no counterpart.

    Scale shape: a single multi-distinct aggregate keyed on predicate.
    Catalyst compiles the two count-distincts via one Expand (3 rows
    per input triple) followed by a two-phase hash aggregate — the
    expanded stream is map-side partially aggregated on
    (predicate, subject/object) before the exchange, so the shuffle
    volume is bounded by the number of distinct (predicate, term)
    pairs, not the triple count, and the final exchange cardinality is
    the predicate vocabulary (dozens). Nothing is collected; no UDFs.
    """
    return (
        triples
        .groupBy(F.col(predicate_col).alias("predicate"))
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct(subject_col).alias("n_subjects"),
            F.countDistinct(object_col).alias("n_objects"),
        )
    )


def void_class_partition(triples: DataFrame,
                         subject_col: str = "subject",
                         predicate_col: str = "predicate",
                         object_col: str = "object",
                         rdf_type: str =
                         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
                         ) -> DataFrame:
    """VoID class partition: one row per rdf:type object with its
    instance count (``void:entities`` per ``void:classPartition``) —
    the companion profile to :func:`void_property_partition`.

    Scale shape: the type-predicate filter prunes the triple stream
    BEFORE the exchange (predicate pushdown against a stored triple
    table; typically ≤ a few % of triples are type assertions), then
    one aggregate keyed on the class IRI — cardinality = ontology
    size, never corpus-scale. distinct subjects == count(*) only if
    the stream is already set-semantic, so both are reported.
    """
    return (
        triples
        .where(F.col(predicate_col) == rdf_type)
        .groupBy(F.col(object_col).alias("class"))
        .agg(F.count(F.lit(1)).alias("n_triples"),
             F.countDistinct(subject_col).alias("n_entities"))
    )
