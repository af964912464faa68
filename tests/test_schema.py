"""Archetype schema-system tests against all 5 shipped archetypes
(the reference's extensibility fixture corpus, FIXTURES.md)."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fegis_spark.schema import (
    STANDARD_FIELDS,
    apply_defaults,
    create_tool_schemas,
    load_archetype,
    split_arguments,
    tool_struct_type,
    validation_predicate,
)

ARCHETYPES = sorted(glob.glob("/root/reference/archetypes/*.yaml"))


def test_all_archetypes_load():
    assert len(ARCHETYPES) == 5
    for path in ARCHETYPES:
        data = load_archetype(path)
        schemas = create_tool_schemas(data)
        assert schemas, path
        for schema in schemas.values():
            req = schema["inputSchema"]["required"]
            # standard fields always required (reference schema.py:98-106)
            assert set(STANDARD_FIELDS) <= set(req)
            # sorted + deduped (reference schema.py:127)
            assert req == sorted(set(req))
            assert schema["inputSchema"]["additionalProperties"] is False


def test_simple_example_bindings():
    data = load_archetype("/root/reference/archetypes/simple_example.yaml")
    schemas = create_tool_schemas(data)
    tp = schemas["TaskPlanner"]["inputSchema"]["properties"]
    # default-seed binding => default + required (schema.py:167-169)
    assert tp["Priority"]["default"] == "medium"
    assert "Priority" in schemas["TaskPlanner"]["inputSchema"]["required"]
    # typed frames
    assert tp["next_steps"]["type"] == "array"
    assert tp["plan"]["type"] == "string"
    # untyped optional frame
    assert tp["estimated_time"]["type"] == "string"
    assert "estimated_time" not in schemas["TaskPlanner"]["inputSchema"]["required"]


def test_typed_frames_across_corpus():
    """boolean (default.yaml AIMessenger), number (slime_mold)."""
    default = create_tool_schemas(load_archetype("/root/reference/archetypes/default.yaml"))
    msgr = default["AIMessenger"]["inputSchema"]["properties"]
    assert msgr["response_requested"]["type"] == "boolean"
    slime = create_tool_schemas(load_archetype("/root/reference/archetypes/slime_mold.yaml"))
    found_number = any(
        p.get("type") == "number"
        for s in slime.values()
        for p in s["inputSchema"]["properties"].values()
    )
    assert found_number


def test_struct_type_mapping():
    data = load_archetype("/root/reference/archetypes/default.yaml")
    schemas = create_tool_schemas(data)
    st = tool_struct_type(schemas["AIMessenger"])
    by_name = {f.name: f for f in st.fields}
    assert isinstance(by_name["goals"].dataType, T.ArrayType)
    assert isinstance(by_name["response_requested"].dataType, T.BooleanType)
    assert by_name["Title"].nullable is False
    assert by_name["response_requested"].nullable is False


def test_validation_and_defaults(spark):
    data = load_archetype("/root/reference/archetypes/simple_example.yaml")
    schema = create_tool_schemas(data)["TaskPlanner"]
    df = spark.createDataFrame(
        [
            ("t", "c", "x", None, "plan it", ["a"]),
            (None, "c", "x", "high", "plan it", ["a"]),
            ("t", "c", "x", None, None, ["a"]),
        ],
        "Title string, Content string, Context string, Priority string, plan string, next_steps array<string>",
    )
    filled = apply_defaults(df, schema)
    prios = [r.Priority for r in filled.collect()]
    assert prios == ["medium", "high", "medium"]
    ok = filled.filter(validation_predicate(schema))
    # row 2 misses Title, row 3 misses required frame 'plan'
    assert ok.count() == 1


def test_split_arguments():
    data = load_archetype("/root/reference/archetypes/simple_example.yaml")
    schema = create_tool_schemas(data)["TaskPlanner"]
    params, frames = split_arguments(schema)
    assert set(STANDARD_FIELDS) <= set(params)
    assert "Priority" in params and "Category" in params
    assert set(frames) == {"plan", "next_steps", "estimated_time"}


def test_unknown_param_skipped():
    data = {
        "title": "x",
        "parameters": {"Known": {"description": "d"}},
        "tools": {"T": {"parameters": {"Known": None, "Ghost": None}, "frames": {}}},
    }
    schemas = create_tool_schemas(data)
    props = schemas["T"]["inputSchema"]["properties"]
    assert "Known" in props and "Ghost" not in props
