"""Triple sinks: N-Triples / N-Quads files, Kafka, and driver-side graphs.

Reference sinks: per-group .nt/.nq file append with fsync
(src/morph_kgc/utils.py:285-297), Kafka one-message batch
(utils.py:300-330), rdflib/oxigraph driver graphs (__init__.py:64-83).

Spark-native equivalents: the triple DataFrame is serialized to the
N-Triples line form with one ``concat_ws`` (stays in codegen) and written
with the distributed text writer — at 10^12 triples a single local file
is not an option, so ``write_ntriples`` produces a directory of part
files (standard lake layout); ``to_ntriples_string`` collects for tests
and small graphs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ntriples_lines(triples: DataFrame,
                   only_printable: bool = False) -> DataFrame:
    """(subject, predicate, object[, graph]) → single-column line form.

    ``<s> <p> <o> [<g>] .`` — mirrors '{triple} .\\n' (utils.py:285-297);
    a null graph column (default graph) degrades to the triple form.
    ``only_printable`` applies the reference's
    only_write_printable_characters filter as a codegen regex.
    """
    cols = [F.col("subject"), F.col("predicate"), F.col("object")]
    if "graph" in triples.columns:
        cols.append(F.col("graph"))  # concat_ws skips nulls
    line = F.concat(F.concat_ws(" ", *cols), F.lit(" ."))
    if only_printable:
        from morph_kgc_spark.functions.encoding import remove_non_printable_col

        line = remove_non_printable_col(line)
    return triples.select(line.alias("value"))


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite",
                   only_printable: bool = False) -> None:
    """Distributed N-Triples/N-Quads writer (directory of part files)."""
    ntriples_lines(triples, only_printable=only_printable) \
        .write.mode(mode).text(path)


def to_ntriples_string(triples: DataFrame) -> str:
    """Driver-side serialization — tests/small graphs only."""
    return "\n".join(r.value for r in ntriples_lines(triples).collect()) + "\n"


def write_kafka(triples: DataFrame, bootstrap_servers: str, topic: str,
                batch_one_message: bool = False) -> None:
    """Kafka sink. Default: one message per triple (the scalable shape);
    ``batch_one_message=True`` reproduces the reference's single message
    containing all triples joined by newlines (utils.py:300-330) —
    driver-side, small graphs only.
    """
    lines = ntriples_lines(triples)
    if batch_one_message:
        payload = to_ntriples_string(triples)
        spark = triples.sparkSession
        lines = spark.createDataFrame([(payload,)], "value string")
    (lines.selectExpr("CAST(value AS STRING) AS value")
     .write.format("kafka")
     .option("kafka.bootstrap.servers", bootstrap_servers)
     .option("topic", topic)
     .save())
