"""Arrow serde-JSON ↔ Spark StructType translator (SURVEY.md §2.1 O3/O4).

The reference loads/prints schemas as whatever ``serde_json`` produces
for ``arrow_schema::Schema`` v32 (`/root/reference/src/main.rs:126-144`,
format documented at `/root/reference/Readme.md:93-115`): an object with
``fields`` — each carrying ``name``, ``data_type`` (e.g. ``"Utf8"``,
``"Int64"``, ``{"Timestamp": ["Millisecond", null]}`` for parametric
types), ``nullable``, ``dict_id``, ``dict_is_ordered``, ``metadata`` —
plus a top-level ``metadata``. This module round-trips that shape with
Spark ``StructType`` for the types reachable from the converter surface
(the §1.2 inference lattice plus common extras).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

# Simple (non-parametric) arrow serde names ↔ Spark types.
_SIMPLE_TO_SPARK: dict[str, T.DataType] = {
    "Boolean": T.BooleanType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.LongType(),
    "Float16": T.FloatType(),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "Utf8": T.StringType(),
    "LargeUtf8": T.StringType(),
    "Binary": T.BinaryType(),
    "LargeBinary": T.BinaryType(),
    "Date32": T.DateType(),
    "Date64": T.TimestampType(),  # epoch-millis datetime (SURVEY §1.4)
    "Null": T.NullType(),
}

_SPARK_TO_SIMPLE: dict[type, str] = {
    T.BooleanType: "Boolean",
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.StringType: "Utf8",
    T.BinaryType: "Binary",
    T.DateType: "Date32",
    T.TimestampType: "Date64",  # converter surface: datetime == Date64
    T.NullType: "Null",
}


def _data_type_to_spark(dt: Any) -> T.DataType:
    if isinstance(dt, str):
        if dt in _SIMPLE_TO_SPARK:
            return _SIMPLE_TO_SPARK[dt]
        raise ValueError(f"unsupported arrow data_type {dt!r}")
    if isinstance(dt, dict):
        if "Timestamp" in dt:
            # arrow Timestamp(unit, tz): tz null = naive → NTZ (the
            # parquet/ORC rewrite surface produces these); tz present
            # (or legacy docs omitting it) → session-tz TimestampType.
            tz = dt["Timestamp"][1] if len(dt["Timestamp"]) > 1 else "UTC"
            return T.TimestampNTZType() if tz is None else T.TimestampType()
        if "Decimal128" in dt or "Decimal256" in dt:
            precision, scale = dt.get("Decimal128", dt.get("Decimal256"))
            return T.DecimalType(precision, scale)
        if "List" in dt or "LargeList" in dt:
            field = dt.get("List", dt.get("LargeList"))
            return T.ArrayType(
                _data_type_to_spark(field["data_type"]), field.get("nullable", True)
            )
        if "Struct" in dt:
            # Nested objects (JSONL surface; arrow-rs serde shape).
            return T.StructType(
                [
                    T.StructField(
                        f["name"],
                        _data_type_to_spark(f["data_type"]),
                        f.get("nullable", True),
                    )
                    for f in dt["Struct"]
                ]
            )
        if "Map" in dt:
            # arrow Map(entries_field, keys_sorted): entries is a
            # Struct of (key, value) fields.
            entries = dt["Map"][0]["data_type"]["Struct"]
            return T.MapType(
                _data_type_to_spark(entries[0]["data_type"]),
                _data_type_to_spark(entries[1]["data_type"]),
                entries[1].get("nullable", True),
            )
        if "Dictionary" in dt:
            # Dictionary encoding is physical; logical type is the value type.
            return _data_type_to_spark(dt["Dictionary"][1])
    raise ValueError(f"unsupported arrow data_type {dt!r}")


def arrow_json_to_struct(doc: str | dict) -> T.StructType:
    """Parse an arrow serde-JSON schema document into a StructType."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    fields = [
        T.StructField(
            f["name"], _data_type_to_spark(f["data_type"]), f.get("nullable", True)
        )
        for f in doc["fields"]
    ]
    return T.StructType(fields)


def _spark_dt_to_arrow(dt: T.DataType) -> Any:
    """Spark type → arrow serde data_type value, recursively (nested
    structs/lists come from the JSONL inference surface)."""
    tf = type(dt)
    if tf in _SPARK_TO_SIMPLE:
        return _SPARK_TO_SIMPLE[tf]
    if tf is T.TimestampNTZType:
        # Naive timestamp (parquet/ORC rewrite inputs; Spark 4 surfaces
        # TIMESTAMP(NANOS/MICROS isAdjustedToUTC=false) as NTZ) — the
        # print-schema path used to crash on these (review r8).
        return {"Timestamp": ["Microsecond", None]}
    if tf is T.DecimalType:
        return {"Decimal128": [dt.precision, dt.scale]}
    if tf is T.ArrayType:
        return {
            "List": {
                "name": "item",
                "data_type": _spark_dt_to_arrow(dt.elementType),
                "nullable": dt.containsNull,
                "dict_id": 0,
                "dict_is_ordered": False,
                "metadata": {},
            }
        }
    if tf is T.StructType:
        return {"Struct": [_field_to_arrow(f) for f in dt.fields]}
    if tf is T.MapType:
        return {
            "Map": [
                {
                    "name": "entries",
                    "data_type": {
                        "Struct": [
                            {
                                "name": "key",
                                "data_type": _spark_dt_to_arrow(dt.keyType),
                                "nullable": False,
                                "dict_id": 0,
                                "dict_is_ordered": False,
                                "metadata": {},
                            },
                            {
                                "name": "value",
                                "data_type": _spark_dt_to_arrow(dt.valueType),
                                "nullable": dt.valueContainsNull,
                                "dict_id": 0,
                                "dict_is_ordered": False,
                                "metadata": {},
                            },
                        ]
                    },
                    "nullable": False,
                    "dict_id": 0,
                    "dict_is_ordered": False,
                    "metadata": {},
                },
                False,
            ]
        }
    raise ValueError(f"unsupported Spark type {dt}")


def _field_to_arrow(f: T.StructField) -> dict:
    return {
        "name": f.name,
        "data_type": _spark_dt_to_arrow(f.dataType),
        "nullable": f.nullable,
        "dict_id": 0,
        "dict_is_ordered": False,
        "metadata": {},
    }


def struct_to_arrow_json(schema: T.StructType, indent: int = 2) -> str:
    """Render a StructType in the reference's serde-JSON schema shape
    (the ``--dry`` / ``--print-schema`` output, main.rs:161-168) so the
    printed schema can be re-fed via ``--schema-file``."""
    fields = [_field_to_arrow(f) for f in schema.fields]
    return json.dumps({"fields": fields, "metadata": {}}, indent=indent)
