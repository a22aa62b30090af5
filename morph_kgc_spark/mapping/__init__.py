"""Mapping front-ends: Turtle RML/R2RML and YARRRML → Rule table."""

from __future__ import annotations

import os
import re

from morph_kgc_spark import model as M

_YAML_HEAD_RE = re.compile(
    r"^\s*(prefixes|mappings|mapping|sources|base|external)\s*:", re.MULTILINE)


def parse_any_mapping(mapping: str, base_dir: str = ".") -> list[M.Rule]:
    """Dispatch a mapping document (path or text) to the right parser.

    Paths dispatch on extension (.yml/.yaml/.json → YARRRML reader,
    else Turtle); inline text on shape (a YAML block with a top-level
    YARRRML key and no Turtle directives → YARRRML). Mirrors the
    reference's retrieve_mappings dispatch (mapping_parser.py:516-561).
    """
    from morph_kgc_spark.mapping.parser import parse_mapping
    from morph_kgc_spark.mapping.yarrrml import parse_yarrrml

    if "\n" not in mapping and os.path.exists(mapping):
        ext = os.path.splitext(mapping)[1].lower()
        if ext in (".yml", ".yaml"):
            return parse_yarrrml(mapping, base_dir)
        return parse_mapping(mapping, base_dir)
    if "@prefix" in mapping or "@base" in mapping or "PREFIX " in mapping:
        return parse_mapping(mapping, base_dir)
    if _YAML_HEAD_RE.search(mapping):
        return parse_yarrrml(mapping, base_dir)
    return parse_mapping(mapping, base_dir)
