"""INI config front-end — the reference's user-facing entry shape.

morph-kgc is driven by an INI document (reference:
src/morph_kgc/args_parser.py:75-89, config.py:147-195): a
``[CONFIGURATION]`` section plus one section per data source whose
``mappings`` key lists RML documents. A reference user can point this
engine at the same config:

    import morph_kgc_spark
    df = morph_kgc_spark.materialize_from_config(spark, "config.ini")

Supported keys (superset ignored gracefully): per-source ``mappings``
(comma-separated paths), ``file_path`` (override the rml:source of that
section's rules), [CONFIGURATION] ``na_values`` (comma-separated null
lexical forms, default ['', 'nan'] like config.py:81), ``output_file`` /
``output_dir`` (targets for write_ntriples).
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

CONFIGURATION = "CONFIGURATION"


@dataclass
class EngineConfig:
    mapping_paths: list[str] = field(default_factory=list)
    file_path_overrides: dict[str, str] = field(default_factory=dict)  # section → path
    na_values: tuple[str, ...] = ("", "nan")
    output_file: str | None = None


def load_config(config: str) -> EngineConfig:
    """Parse an INI string or file path into an EngineConfig."""
    parser = configparser.ConfigParser()
    base_dir = "."
    if "\n" not in config and os.path.exists(config):
        base_dir = os.path.dirname(os.path.abspath(config))
        parser.read(config)
    else:
        parser.read_string(config)

    out = EngineConfig()
    if parser.has_section(CONFIGURATION):
        sec = parser[CONFIGURATION]
        if "na_values" in sec:
            out.na_values = tuple(sec["na_values"].split(","))
        out.output_file = sec.get("output_file") or sec.get("output_dir")

    for name in parser.sections():
        if name == CONFIGURATION:
            continue
        sec = parser[name]
        if "mappings" not in sec:
            raise ValueError(f"data source section [{name}] without 'mappings'")
        for m in sec["mappings"].split(","):
            m = m.strip()
            if not os.path.isabs(m):
                m = os.path.join(base_dir, m)
            out.mapping_paths.append(m)
        if "file_path" in sec:
            out.file_path_overrides[name] = sec["file_path"]
    if not out.mapping_paths:
        raise ValueError("config declares no data source sections with mappings")
    return out


def materialize_from_config(spark: SparkSession, config: str,
                            write: bool = False) -> DataFrame:
    """Reference-compatible entry: INI config → triples DataFrame.

    With ``write=True`` and an output_file configured, also writes the
    distributed N-Triples directory.
    """
    from morph_kgc_spark.engine import materialize
    from morph_kgc_spark.mapping.parser import parse_mapping

    cfg = load_config(config)
    rules = []
    for path in cfg.mapping_paths:
        if not os.path.exists(path):
            raise FileNotFoundError(f"mapping file not found: {path}")
        rules.extend(parse_mapping(path))
    df = materialize(spark, rules)
    if write and cfg.output_file:
        from morph_kgc_spark.sinks.ntriples import write_ntriples

        write_ntriples(df, cfg.output_file)
    return df
