"""INI config front-end (reference-compatible entry)."""

import os

import pytest

from morph_kgc_spark import materialize_from_config

EX = "http://example.com/"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def test_materialize_from_config(spark, tmp_path):
    out_dir = str(tmp_path / "out.nt")
    ini = f"""
[CONFIGURATION]
output_file={out_dir}

[DataSource1]
mappings={FIXTURES}/mapping_basic.ttl
"""
    df = materialize_from_config(spark, ini, write=True)
    assert df.count() == 13
    lines = spark.read.text(out_dir)
    assert lines.count() == 13
    assert all(r.value.endswith(" .") for r in lines.collect())


def test_config_requires_mappings(spark):
    with pytest.raises(ValueError, match="without 'mappings'"):
        materialize_from_config(spark, "[DS]\nfile_path=x\n")
