"""The 7-operator filter algebra → Column compiler (SURVEY.md §2.2, F1-F13).

Faithful Spark re-expression of the reference's filter language:
grammar in fegis/search_tool_schema.json:25-80, validation at
fegis/search/strategies.py:120-158, condition construction at
fegis/search/strategies.py:160-259. A filter spec is
``{"field": f, "operator": op, "value": v}``; all filters AND together
(reference Filter(must=[...]), strategies.py:96-114).

Deliberate, documented semantics (SURVEY.md §7.4):

* ``is_not`` maps Qdrant MatchExcept, which KEEPS points lacking the
  field — so it compiles to null-safe negation (``NOT eqNullSafe``),
  not plain ``!=`` (which drops NULLs).
* ``contains`` is declared as substring match, OR'd over the
  reference's exact three case variants {v, v.lower(), v.capitalize()}
  (Qdrant MatchText is token-based; substring is our spec).
  Python ``str.capitalize`` upper-cases the first char and LOWER-cases
  the rest — not ``initcap``.
* ``between`` is inclusive on both ends; before/after are strict.
* timestamp values are ISO-8601 strings with Z→+00:00 normalization.

Everything compiles to native Column expressions, so Catalyst pushes
the predicates into the parquet scan (PushedFilters) — the analog of
the reference's payload indexes.
"""

from __future__ import annotations

from datetime import datetime
from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

#: API field name → payload column path (reference strategies.py:27-32).
FIELD_MAPPING: dict[str, str] = {
    "agent_id": "meta.agent_id",
    "archetype_title": "meta.archetype_title",
    "archetype_version": "meta.archetype_version",
    "schema_version": "meta.schema_version",
}

#: reference strategies.py:36-59
VALID_OPERATORS = {"is", "is_not", "contains", "after", "before", "between", "any_of"}
VALID_FIELDS = {
    "session_id",
    "tool",
    "agent_id",
    "title",
    "context",
    "sequence_order",
    "memory_id",
    "timestamp",
    "preceding_memory_id",
    "archetype_title",
    "archetype_version",
    "schema_version",
}

_SORTED_VALID_FIELDS = sorted(VALID_FIELDS)
_SORTED_VALID_OPERATORS = sorted(VALID_OPERATORS)


def _parse_iso(value: str) -> datetime:
    return datetime.fromisoformat(value.replace("Z", "+00:00"))


def validate_filters(
    filters: Sequence[Mapping[str, Any]],
    valid_fields: set[str] | None = None,
    timestamp_fields: set[str] = frozenset({"timestamp"}),
) -> None:
    """Analysis-time validation mirroring reference strategies.py:120-158
    (same error messages, raised before any plan is built)."""
    valid_fields = valid_fields if valid_fields is not None else VALID_FIELDS
    for spec in filters:
        for key in ("field", "operator", "value"):
            if key not in spec:
                raise ValueError(f"Filter missing required '{key}' parameter")
        field, operator, value = spec["field"], spec["operator"], spec["value"]
        if field not in valid_fields:
            raise ValueError(f"Invalid field '{field}'. Valid fields: {sorted(valid_fields)}")
        if operator not in VALID_OPERATORS:
            raise ValueError(
                f"Invalid operator '{operator}'. Valid operators: {_SORTED_VALID_OPERATORS}"
            )
        if field in timestamp_fields and operator in ("after", "before"):
            if not isinstance(value, str):
                raise ValueError("Timestamp filter values must be strings in ISO format")
            try:
                _parse_iso(value)
            except ValueError as e:
                raise ValueError(
                    f"Invalid timestamp format '{value}'. "
                    "Use ISO format (e.g., '2024-01-01T00:00:00Z')"
                ) from e


def _ts_lit(value: str) -> Column:
    # naive UTC literal — tables use TIMESTAMP_NTZ under a UTC session
    dt = _parse_iso(value)
    return F.lit(dt.replace(tzinfo=None)).cast("timestamp_ntz")


def compile_condition(
    col: Column, field: str, operator: str, value: Any, is_timestamp: bool
) -> Column:
    """One filter spec → one boolean Column (reference _build_condition,
    strategies.py:160-259)."""
    if operator == "is":
        return col == F.lit(value)
    if operator == "is_not":
        # Qdrant MatchExcept keeps points where the field is missing (F2)
        return ~col.eqNullSafe(F.lit(value))
    if operator in ("before", "after"):
        bound = _ts_lit(value) if is_timestamp else F.lit(value)
        return col < bound if operator == "before" else col > bound
    if operator == "between":
        if not isinstance(value, (list, tuple)) or len(value) != 2:
            raise ValueError("'between' operator requires array [min, max]")
        lo, hi = value
        if is_timestamp:
            return col.between(_ts_lit(lo), _ts_lit(hi))
        return col.between(F.lit(lo), F.lit(hi))
    if operator == "any_of":
        if not isinstance(value, (list, tuple)):
            raise ValueError("'any_of' operator requires array")
        return col.isin(*value)
    if operator == "contains":
        if not isinstance(value, str):
            return col.cast("string").contains(F.lit(str(value)))
        variants = {value, value.lower(), value.capitalize()}
        conds = [col.contains(F.lit(v)) for v in sorted(variants)]
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out
    raise ValueError(f"Invalid operator '{operator}'")


def compile_filters(
    filters: Sequence[Mapping[str, Any]],
    field_mapping: Mapping[str, str] | None = None,
    valid_fields: set[str] | None = None,
    timestamp_fields: set[str] = frozenset({"timestamp"}),
) -> Column:
    """Filter-spec list → single AND'd predicate Column (F8).

    ``field_mapping`` resolves API names to (possibly nested) column
    paths, e.g. agent_id → meta.agent_id (F10); defaults to the
    reference mapping. Returns lit(True) for an empty list (a filtered
    search with no filters matches everything, strategies.py:287).
    """
    validate_filters(filters, valid_fields, timestamp_fields)
    mapping = FIELD_MAPPING if field_mapping is None else field_mapping
    pred = F.lit(True)
    for spec in filters:
        field = spec["field"]
        path = mapping.get(field, field)
        cond = compile_condition(
            F.col(path), field, spec["operator"], spec["value"], field in timestamp_fields
        )
        pred = pred & cond
    return pred
