"""End-to-end coverage for the deployment surfaces: the CLI
(``python -m morph_kgc_spark``), the spark-submit job, the Kafka sink
topology (mocked writer — no broker in the sandbox), and a streaming
query actually run to completion with availableNow.

Mirrors the reference's CLI shape (src/morph_kgc/__main__.py:26-62).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = "http://example.com/"


def _write_mapping(tmp_path):
    csv = tmp_path / "d.csv"
    csv.write_text("ID,NAME\n1,alpha\n2,beta\n3,gamma\n")
    ttl = tmp_path / "m.ttl"
    ttl.write_text(f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
<#TM> rml:logicalSource [ rml:source "{csv}" ] ;
  rr:subjectMap [ rr:template "{EX}s/{{ID}}" ] ;
  rr:predicateObjectMap [
    rr:predicate <{EX}name> ; rr:objectMap [ rml:reference "NAME" ] ] .
""")
    return ttl


def test_cli_end_to_end(tmp_path):
    """python -m morph_kgc_spark <config> writes distributed N-Triples."""
    ttl = _write_mapping(tmp_path)
    out_dir = tmp_path / "out_nt"
    cfg = tmp_path / "config.ini"
    cfg.write_text(f"[CONFIGURATION]\noutput_file={out_dir}\n"
                   f"[DataSource1]\nmappings={ttl}\n")
    proc = subprocess.run(
        [sys.executable, "-m", "morph_kgc_spark", str(cfg),
         "--master", "local[4]", "--shuffle-partitions", "4"],
        capture_output=True, text=True, timeout=240, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "3 triples materialized" in proc.stderr
    lines = []
    for name in os.listdir(out_dir):
        if name.startswith("part-"):
            with open(out_dir / name) as f:
                lines += [ln for ln in f.read().splitlines() if ln]
    assert sorted(lines) == [
        f'<{EX}s/1> <{EX}name> "alpha" .',
        f'<{EX}s/2> <{EX}name> "beta" .',
        f'<{EX}s/3> <{EX}name> "gamma" .',
    ]


def test_materialize_job_pipeline_mode(tmp_path):
    """jobs/materialize_job.py --mode pipeline: checkpointed bucket sink
    + JSON report (the spark-submit deployment shape)."""
    out = tmp_path / "triples"
    env = {**os.environ, "PYTHONPATH": REPO}  # spark-submit ships the zip
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "materialize_job.py"),
         "--mode", "pipeline", "--pages", "2000", "--entities", "32",
         "--out", str(out), "--buckets", "2"],
        capture_output=True, text=True, timeout=300, cwd=REPO, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["mode"] == "pipeline"
    assert report["written_buckets"] == [0, 1] and report["rows_written"] > 0
    assert report["metrics"]["rows"] == report["rows_written"]


class _RecordingWriter:
    """Stands in for DataFrameWriter: records format/options/save."""

    calls: list = []

    def __init__(self, df):
        self._df = df
        self._format = None
        self._options = {}

    def format(self, fmt):
        self._format = fmt
        return self

    def option(self, k, v):
        self._options[k] = v
        return self

    def save(self):
        _RecordingWriter.calls.append(
            (self._format, dict(self._options), self._df))


@pytest.fixture
def kafka_writer(monkeypatch, spark):
    _RecordingWriter.calls = []
    # patch the CONCRETE DataFrame class (pyspark 4: sql.classic.DataFrame
    # shadows the pyspark.sql.DataFrame base in the MRO)
    cls = type(spark.range(1))
    monkeypatch.setattr(cls, "write",
                        property(lambda self: _RecordingWriter(self)))
    return _RecordingWriter


def test_write_kafka_per_triple(spark, kafka_writer):
    from morph_kgc_spark.sinks.ntriples import write_kafka

    triples = spark.createDataFrame(
        [(f"<{EX}s/1>", f"<{EX}p>", '"a"'), (f"<{EX}s/2>", f"<{EX}p>", '"b"')],
        ["subject", "predicate", "object"])
    write_kafka(triples, "broker:9092", "kg")
    [(fmt, opts, df)] = kafka_writer.calls
    assert fmt == "kafka"
    assert opts == {"kafka.bootstrap.servers": "broker:9092", "topic": "kg"}
    vals = sorted(r.value for r in df.collect())
    assert vals == [f'<{EX}s/1> <{EX}p> "a" .', f'<{EX}s/2> <{EX}p> "b" .']


def test_write_kafka_batch_one_message(spark, kafka_writer):
    """Reference parity mode (utils.py:300-330): ONE message holding the
    whole graph, newline-joined."""
    from morph_kgc_spark.sinks.ntriples import write_kafka

    triples = spark.createDataFrame(
        [(f"<{EX}s/1>", f"<{EX}p>", '"a"'), (f"<{EX}s/2>", f"<{EX}p>", '"b"')],
        ["subject", "predicate", "object"])
    write_kafka(triples, "broker:9092", "kg", batch_one_message=True)
    [(fmt, opts, df)] = kafka_writer.calls
    assert fmt == "kafka"
    rows = df.collect()
    assert len(rows) == 1
    assert sorted(rows[0].value.strip().splitlines()) == [
        f'<{EX}s/1> <{EX}p> "a" .', f'<{EX}s/2> <{EX}p> "b" .']


def test_stream_triples_available_now(spark, tmp_path):
    """A streaming query run to COMPLETION: file micro-batch source →
    stream_triples with a broadcast static parent + watermarked dedup →
    availableNow trigger → memory sink."""
    from morph_kgc_spark import model as M
    from morph_kgc_spark.streaming.pipeline import stream_triples

    src = tmp_path / "stream_in"
    spark.createDataFrame(
        [("1", "7", "2024-01-01 00:00:00"),
         ("1", "7", "2024-01-01 00:00:01"),   # dup within watermark
         ("2", "8", "2024-01-01 00:00:02")],
        ["ID", "NK", "TS"],
    ).withColumn("TS", F.col("TS").cast("timestamp")) \
     .write.mode("overwrite").parquet(str(src))

    stream = (spark.readStream
              .schema("ID string, NK string, TS timestamp")
              .parquet(str(src)))
    nation = spark.createDataFrame([("7", "FRANCE"), ("8", "PERU")],
                                   ["n_key", "n_name"])
    parent_source = M.Source("df", "nation")
    rule = M.Rule(
        source=M.Source("df", "stream"),
        subject=M.TermMap(M.TEMPLATE, EX + "cust/{ID}", M.IRI),
        predicate=M.TermMap(M.CONSTANT, EX + "nation", M.IRI),
        parent_source=parent_source,
        parent_subject=M.TermMap(M.TEMPLATE, EX + "nation/{n_name}", M.IRI),
        join_conditions=(M.JoinCondition("NK", "n_key"),),
    )
    out = stream_triples(stream, [rule], event_time_col="TS",
                         watermark="10 minutes",
                         static_parents={"nation": nation})
    q = (out.writeStream.format("memory").queryName("t_stream_nt")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {(r.subject, r.object)
            for r in spark.sql("select * from t_stream_nt").collect()}
    assert rows == {
        (f"<{EX}cust/1>", f"<{EX}nation/FRANCE>"),
        (f"<{EX}cust/2>", f"<{EX}nation/PERU>"),
    }


def test_streaming_sessionize_available_now(spark, tmp_path):
    """The stateful sessionize (applyInPandasWithState) run to
    COMPLETION: file micro-batch source → availableNow → memory sink.
    Closed sessions are emitted two ways and BOTH must be observed:
    user 1's first session is closed mid-stream by a later event past
    the gap; user 2's idle session is flushed by the EVENT-TIME TIMEOUT
    when the watermark (max event time − 10 min = 02:00) passes its
    last_seen + gap (00:35). User 1's final session stays open (timeout
    02:40 > watermark) and must NOT be emitted."""
    from morph_kgc_spark.operators.events import sessionize
    from morph_kgc_spark.streaming.sessionize import streaming_sessionize

    rows = [
        # user 1: two events 10 min apart (one session), then a 2 h gap
        # opens session 2 — the gap CLOSES session 1 mid-stream
        (1, "2024-01-01 00:00:00", 100),
        (1, "2024-01-01 00:10:00", 101),
        (1, "2024-01-01 02:10:00", 102),
        # user 2: a single (never-closed) session
        (2, "2024-01-01 00:05:00", 200),
    ]
    src = tmp_path / "sess_in"
    batch = spark.createDataFrame(
        rows, ["user_id", "ts", "event_id"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    batch.write.mode("overwrite").parquet(str(src))

    stream = (spark.readStream
              .schema("user_id long, ts timestamp, event_id long")
              .parquet(str(src)))
    out = streaming_sessionize(stream, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("t_sessionize")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    streamed = {(r.user_id, r.n_events, r.start_epoch, r.end_epoch)
                for r in spark.sql("select * from t_sessionize").collect()}

    # batch twin gives the session boundaries; the streaming run emits
    # every session except user 1's final one (still open at shutdown)
    twin = {(r.user_id, r.n_events, r.start_epoch, r.end_epoch)
            for r in sessionize(batch).collect()}
    # user 1's open session starts at 02:10:00 = epoch 1704075000
    expected = {t for t in twin if not (t[0] == 1 and t[2] == 1704075000)}
    assert streamed == expected, (streamed, twin)
    assert len(streamed) == 2, "gap-closed AND timeout-flushed sessions"
