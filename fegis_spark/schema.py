"""YAML archetype → Spark schema factory (SURVEY.md §1.2, §2.11).

The reference's dynamic tool system (fegis/schema.py) compiles YAML
"archetype" files into JSON-Schema validators. The Spark-native analog
compiles the same YAML into:

* a JSON-schema-shaped dict per tool (same shape as the reference's
  ``create_tool_schemas`` — fegis/schema.py:86-132 — so fidelity is
  directly checkable),
* a ``StructType`` per tool (typed frames: List→array<string>,
  integer→long, number→double, boolean, object→map; everything else
  string — fegis/schema.py:198-205 type mapping),
* analysis-time validation Columns (required ⇒ isNotNull) and default
  filling (coalesce) — Spark's analog of the compiled fastjsonschema
  validator (fegis/schema.py:76-83).

Rules faithfully carried over (fegis/schema.py:135-179):
* every tool gets required string fields Title/Content/Context;
* a parameter binding of ``null`` ⇒ required; a non-empty string ⇒
  required-with-default; anything else ⇒ skipped;
* parameters not in the global pool ⇒ skipped;
* required list is sorted + deduped; untyped frames are strings.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import yaml
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STANDARD_FIELDS = ["Title", "Content", "Context"]
STANDARD_FIELD_DESCRIPTIONS = {
    "Title": "A clear, descriptive title",
    "Content": "The main content",
    "Context": "Relevant context that informed this response",
}

_JSON_TYPE_MAPPING = {
    "list": "array",
    "string": "string",
    "integer": "integer",
    "number": "number",
    "boolean": "boolean",
    "object": "object",
}

_SPARK_TYPES: dict[str, T.DataType] = {
    "array": T.ArrayType(T.StringType()),
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "object": T.MapType(T.StringType(), T.StringType()),
}


def load_archetype(path: str | Path) -> dict[str, Any]:
    """Load + parse a YAML archetype (reference fegis/schema.py:61-73)."""
    filepath = Path(path)
    if not filepath.exists():
        raise FileNotFoundError(f"Archetype file not found: {path}")
    with open(filepath, encoding="utf-8") as f:
        try:
            return yaml.safe_load(f)
        except yaml.YAMLError as e:
            raise ValueError(f"Failed to parse YAML: {e}") from e


def create_tool_schemas(archetype_data: dict[str, Any]) -> dict[str, dict[str, Any]]:
    """Archetype → per-tool JSON-schema dicts (reference shape,
    fegis/schema.py:86-132)."""
    tool_schemas: dict[str, dict[str, Any]] = {}
    global_params = archetype_data.get("parameters", {}) or {}
    for tool_name, tool_def in (archetype_data.get("tools", {}) or {}).items():
        props: dict[str, Any] = {}
        required: list[str] = []
        for std in STANDARD_FIELDS:
            props[std] = {
                "type": "string",
                "description": STANDARD_FIELD_DESCRIPTIONS[std],
                "x-required": True,
            }
            required.append(std)
        for pname, binding in (tool_def.get("parameters", {}) or {}).items():
            gdef = global_params.get(pname)
            if gdef is None:
                continue  # not in global pool — skipped (schema.py:146-150)
            prop = {
                "type": gdef.get("type", "string"),
                "description": gdef.get("description", ""),
            }
            if "examples" in gdef:
                prop["examples"] = gdef["examples"]
            if binding is None:
                prop["x-required"] = True
                required.append(pname)
            elif isinstance(binding, str) and binding:
                prop["default"] = binding
                prop["x-required"] = True
                required.append(pname)
            else:
                continue  # invalid binding — skipped (schema.py:170-176)
            props[pname] = prop
        for fname, fdef in (tool_def.get("frames", {}) or {}).items():
            fdef = fdef if isinstance(fdef, dict) else {}
            ftype = str(fdef.get("type", "string")).lower()
            prop = {"type": _JSON_TYPE_MAPPING.get(ftype, ftype)}
            if fdef.get("required", False):
                prop["x-required"] = True
                required.append(fname)
            props[fname] = prop
        tool_schemas[tool_name] = {
            "name": tool_name,
            "description": tool_def.get("description", f"Tool: {tool_name}"),
            "inputSchema": {
                "type": "object",
                "properties": props,
                "required": sorted(set(required)),
                "additionalProperties": False,
            },
        }
    return tool_schemas


def tool_struct_type(tool_schema: dict[str, Any]) -> T.StructType:
    """JSON tool schema → StructType (required ⇒ nullable=False)."""
    schema = tool_schema["inputSchema"]
    required = set(schema["required"])
    fields = [
        T.StructField(
            name,
            _SPARK_TYPES.get(prop.get("type", "string"), T.StringType()),
            nullable=name not in required,
        )
        for name, prop in schema["properties"].items()
    ]
    return T.StructType(fields)


def validation_predicate(tool_schema: dict[str, Any]) -> Column:
    """One boolean Column: every required field present (non-null, and
    non-empty for strings) — the plan-level analog of the compiled
    fastjsonschema validator."""
    schema = tool_schema["inputSchema"]
    pred = F.lit(True)
    for name in schema["required"]:
        prop = schema["properties"][name]
        c = F.col(name)
        ok = c.isNotNull()
        if prop.get("type", "string") == "string" and "default" not in prop:
            ok = ok & (c != F.lit(""))
        if "default" in prop:
            ok = F.lit(True)  # default fills missing values — always valid
        pred = pred & ok
    return pred


def apply_defaults(df: DataFrame, tool_schema: dict[str, Any]) -> DataFrame:
    """coalesce() parameter defaults into missing columns (reference
    default-seed bindings, schema.py:167-169)."""
    schema = tool_schema["inputSchema"]
    for name, prop in schema["properties"].items():
        if "default" in prop and name in df.columns:
            df = df.withColumn(name, F.coalesce(F.col(name), F.lit(prop["default"])))
    return df


def split_arguments(
    tool_schema: dict[str, Any],
) -> tuple[list[str], list[str]]:
    """P7: partition a tool's fields into (parameters, frames) key sets
    (reference server.py:80-87): parameters = declared params +
    standard fields; frames = the rest."""
    schema = tool_schema["inputSchema"]
    params, frames = [], []
    for name, prop in schema["properties"].items():
        # declared parameters carry descriptions from the global pool;
        # frames carry only type/x-required
        if name in STANDARD_FIELDS or "description" in prop:
            params.append(name)
        else:
            frames.append(name)
    return params, frames
