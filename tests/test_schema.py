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


def _frame_value(prop) -> str:
    """A valid map<string,string> cell for each frame type (typing
    happens at extraction, matching how a tool-call log ships values)."""
    return {
        "array": '["a", "b"]',
        "integer": "3",
        "number": "1.5",
        "boolean": "true",
        "object": '{"k": "v"}',
    }.get(prop.get("type", "string"), "some value")


def _typed_frame(name: str, prop) -> F.Column:
    raw = F.col("frames").getItem(name)
    t = prop.get("type", "string")
    if t == "array":
        return F.from_json(raw, "array<string>").alias(name)
    if t == "integer":
        return raw.cast("long").alias(name)
    if t == "number":
        return raw.cast("double").alias(name)
    if t == "boolean":
        return raw.cast("boolean").alias(name)
    if t == "object":
        return F.from_json(raw, "map<string,string>").alias(name)
    return raw.alias(name)


@pytest.mark.parametrize(
    "path", ARCHETYPES, ids=lambda p: p.rsplit("/", 1)[-1].removesuffix(".yaml")
)
def test_archetype_ingest_end_to_end_parity(spark, path):
    """r8 verdict item 6: replay EVERY tool of EVERY shipped archetype
    through ingest.ingest_batch and the compiled-validator semantics —
    required-field rejection (one failing call per tool), default
    seeding, frame typing parity with tool_struct_type, and the
    standard-key parameters-map exclusion (reference server.py:80-87 +
    schema.py:135-221)."""
    import datetime as dt

    from fegis_spark.ingest import hash_embedding_udf, ingest_batch

    data = load_archetype(path)
    schemas = create_tool_schemas(data)
    assert schemas, path
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    embed = hash_embedding_udf(8)  # keep the pandas_udf light

    for tool, schema in schemas.items():
        props = schema["inputSchema"]["properties"]
        params_and_std, frame_keys = split_arguments(schema)
        param_keys = [n for n in params_and_std if n not in STANDARD_FIELDS]

        valid_args = {"Title": "a title", "Content": "the content", "Context": "ctx"}
        for p in param_keys:
            # default-bearing params are OMITTED → must be seeded;
            # required-no-default params must arrive in the call
            if "default" not in props[p]:
                valid_args[p] = "supplied"
        for fr in frame_keys:
            valid_args[fr] = _frame_value(props[fr])
        invalid_args = dict(valid_args)
        del invalid_args["Content"]  # required standard field → reject

        calls = spark.createDataFrame(
            [
                (tool, f"s-{tool}", t0, valid_args),
                (tool, f"s-{tool}", t0 + dt.timedelta(minutes=1), invalid_args),
            ],
            "tool string, session_id string, ts timestamp_ntz,"
            " arguments map<string,string>",
        )
        mem = ingest_batch(calls, param_keys=param_keys, embed_udf=embed)

        # standard-key exclusion + frame/param key partitioning (P7)
        rows = {r.sequence_order: r for r in mem.collect()}
        for r in rows.values():
            assert set(r.parameters or {}).isdisjoint(set(STANDARD_FIELDS)), (
                path, tool, r.parameters,
            )
            assert set(r.frames or {}).isdisjoint(set(param_keys)), (path, tool)
        assert set(rows[1].frames or {}) == set(frame_keys), (path, tool)

        # compiled-validator semantics over the ingested columns
        sel = [
            F.col("sequence_order"),
            F.col("title").alias("Title"),
            F.col("content").alias("Content"),
            F.col("context").alias("Context"),
            *[F.col("parameters").getItem(p).alias(p) for p in param_keys],
            *[_typed_frame(fr, props[fr]) for fr in frame_keys],
        ]
        typed = mem.select(*sel)

        # frame typing parity with the StructType factory
        st = tool_struct_type(schema)
        for fr in frame_keys:
            assert typed.schema[fr].dataType == st[fr].dataType, (path, tool, fr)

        filled = apply_defaults(typed, schema)
        got = {
            r.sequence_order: r
            for r in filled.withColumn("ok", validation_predicate(schema)).collect()
        }
        assert got[1].ok is True, (path, tool, got[1])   # valid call accepted
        assert got[2].ok is False, (path, tool, got[2])  # missing Content rejected

        # default seeding: every omitted default-bearing param came back
        for p in param_keys:
            if "default" in props[p]:
                assert got[1][p] == props[p]["default"], (path, tool, p)
            else:
                assert got[1][p] == "supplied", (path, tool, p)

        # typed frames decoded to non-null values on the valid call
        for fr in frame_keys:
            assert got[1][fr] is not None, (path, tool, fr)
