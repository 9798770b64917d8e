"""Unit tests for schema tooling (parity: reference schemas/__init__.py)."""

from __future__ import annotations

import json

import pytest

from br_doc_ocr_spark.core import schemas as S


CUSTOM = {
    "title": "Custom Test Schema",
    "type": "object",
    "properties": {
        "field_one": {"type": "string"},
        "field_two": {"type": "number"},
    },
    "required": ["field_one"],
}


def test_get_default_builtins():
    for t in ("cnh", "rg", "invoice"):
        schema = S.get_default(t)
        assert schema["type"] == "object" and schema["properties"]
    with pytest.raises(S.SchemaError):
        S.get_default("passport")


def test_load_schema_dict_string_path(tmp_path):
    assert S.load_schema(CUSTOM) is CUSTOM
    assert S.load_schema(json.dumps(CUSTOM)) == CUSTOM
    p = tmp_path / "s.json"
    p.write_text(json.dumps(CUSTOM))
    assert S.load_schema(str(p)) == CUSTOM
    assert S.load_schema(p) == CUSTOM
    with pytest.raises(S.SchemaError):
        S.load_schema("/nonexistent/file.json")
    with pytest.raises(S.SchemaError):
        S.load_schema("{bad json")


def test_validate_schema():
    assert S.validate_schema(CUSTOM) == {"valid": True}
    assert not S.validate_schema({})["valid"]
    assert not S.validate_schema({"type": "array"})["valid"]
    assert not S.validate_schema({"type": "object"})["valid"]
    assert not S.validate_schema({"type": "object", "properties": []})["valid"]
    res = S.validate_schema({"type": "object", "properties": {}})
    assert res["valid"] and "warnings" in res
    res = S.validate_schema({"type": "object", "properties": {"a": {}}})
    assert res["valid"] and any("no type" in w for w in res["warnings"])


def test_field_introspection():
    cnh = S.get_default("cnh")
    assert S.required_fields(cnh) == ["nome_completo", "cpf", "data_nascimento",
                                      "categoria_habilitacao", "num_registro"]
    assert "orgao_emissor" in S.all_fields(cnh)
    # format:date OR name contains data/date (schemas/__init__.py:183-201)
    assert set(S.date_fields(cnh)) == {"data_nascimento", "data_validade",
                                       "data_primeira_habilitacao"}
    assert S.field_types(CUSTOM) == {"field_one": "string", "field_two": "number"}


def test_create_empty_result_nested():
    schema = {"type": "object", "properties": {
        "a": {"type": "string"},
        "b": {"type": "array"},
        "c": {"type": "object", "properties": {"d": {"type": "number"}}},
    }}
    assert S.create_empty_result(schema) == {"a": None, "b": [], "c": {"d": None}}


def test_filter_to_schema_nested():
    schema = {"type": "object", "properties": {
        "keep": {"type": "string"},
        "nest": {"type": "object", "properties": {"x": {"type": "string"}}},
    }}
    data = {"keep": "v", "drop": "w", "nest": {"x": 1, "y": 2}}
    assert S.filter_to_schema(data, schema) == {"keep": "v", "nest": {"x": 1}}
    assert S.filter_to_schema({}, schema) == {}
    assert S.filter_to_schema(data, {}) == {}


def test_schema_example():
    out = S.schema_example(CUSTOM)
    assert out == {"field_one": "example_string", "field_two": 0.0}
    nested = {"type": "object", "properties": {
        "arr": {"type": "array", "items": {"type": "object",
                                           "properties": {"n": {"type": "integer"}}}},
        "ex": {"type": "string", "example": "given"},
    }}
    out = S.schema_example(nested)
    assert out == {"arr": [{"n": 0}], "ex": "given"}


def test_validate_against_schema():
    cnh = S.get_default("cnh")
    good = {"nome_completo": "JOÃO DA SILVA", "cpf": "123.456.789-00",
            "data_nascimento": "1990-05-15", "categoria_habilitacao": "AB",
            "num_registro": "12345678901"}
    ok, errors = S.validate_against_schema(good, cnh)
    assert ok and errors == []
    ok, errors = S.validate_against_schema({"nome_completo": "JOÃO"}, cnh)
    assert not ok and any("cpf" in e.lower() for e in errors)
    ok, _ = S.validate_against_schema(dict(good, cpf="invalid-cpf"), cnh)
    assert not ok


def test_to_struct_type():
    from pyspark.sql import types as T
    st = S.to_struct_type(S.get_default("invoice"))
    assert isinstance(st, T.StructType)
    assert st["valor_total"].dataType == T.DoubleType()
    assert st["empresa"].dataType == T.StringType()
    nested = S.to_struct_type({"type": "object", "properties": {
        "arr": {"type": "array", "items": {"type": "integer"}}}})
    assert nested["arr"].dataType == T.ArrayType(T.LongType())
    # JSON Schema permits omitting 'type' on object-shaped specs — infer
    # object from 'properties' instead of degrading to a scalar StringType
    # (review r05); applies nested too
    untyped = S.to_struct_type({"properties": {
        "cpf": {"type": "string"},
        "inner": {"properties": {"n": {"type": "integer"}}}}})
    assert isinstance(untyped, T.StructType)
    assert untyped["cpf"].dataType == T.StringType()
    assert untyped["inner"].dataType == T.StructType(
        [T.StructField("n", T.LongType(), True)])
