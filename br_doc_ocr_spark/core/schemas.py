"""Extraction-schema tooling (JSON-Schema draft-07 subset).

Parity target: ``/root/reference/src/br_doc_ocr/schemas/__init__.py`` — load
from dict / JSON string / path, well-formedness validation, field
introspection (required / date / typed), schema-guided projection
(``filter_to_schema``), empty-result synthesis, example synthesis — plus the
three built-in document schemas (cnh / rg / invoice) whose field contracts are
re-stated here from ``schemas/{cnh,rg,invoice}.json``.

Spark integration: :func:`to_struct_type` compiles a schema into a
``StructType`` at plan time (imported lazily so this module stays Spark-free
for the oracle path).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any


class SchemaError(ValueError):
    """Schema could not be loaded or is malformed."""


# ---------------------------------------------------------------------------
# Built-in schemas (field contracts from the reference's schemas/*.json;
# descriptions elided — only machine-relevant keys kept)
# ---------------------------------------------------------------------------

CNH_SCHEMA: dict[str, Any] = {
    "title": "CNH Extraction Schema",
    "type": "object",
    "properties": {
        "nome_completo": {"type": "string"},
        "cpf": {"type": "string", "pattern": r"^\d{3}\.\d{3}\.\d{3}-\d{2}$"},
        "data_nascimento": {"type": "string", "format": "date"},
        "categoria_habilitacao": {
            "type": "string",
            "enum": ["ACC", "A", "B", "AB", "C", "D", "E", "AC", "AD", "AE",
                     "BC", "BD", "BE", "CD", "CE", "DE"],
        },
        "num_registro": {"type": "string"},
        "data_validade": {"type": "string", "format": "date"},
        "data_primeira_habilitacao": {"type": "string", "format": "date"},
        "orgao_emissor": {"type": "string"},
        "local_emissao": {"type": "string"},
        "observacoes": {"type": "string"},
    },
    "required": ["nome_completo", "cpf", "data_nascimento",
                 "categoria_habilitacao", "num_registro"],
}

RG_SCHEMA: dict[str, Any] = {
    "title": "RG Extraction Schema",
    "type": "object",
    "properties": {
        "nome_completo": {"type": "string"},
        "registro_geral": {"type": "string"},
        "cpf": {"type": "string", "pattern": r"^\d{3}\.\d{3}\.\d{3}-\d{2}$"},
        "data_nascimento": {"type": "string", "format": "date"},
        "data_expedicao": {"type": "string", "format": "date"},
        "orgao_emissor": {"type": "string"},
        "naturalidade": {"type": "string"},
        "filiacao_pai": {"type": "string"},
        "filiacao_mae": {"type": "string"},
        "doc_origem": {"type": "string"},
    },
    "required": ["nome_completo", "registro_geral", "data_nascimento"],
}

INVOICE_SCHEMA: dict[str, Any] = {
    "title": "Invoice Extraction Schema",
    "type": "object",
    "properties": {
        "empresa": {"type": "string"},
        "cnpj": {"type": "string", "pattern": r"^\d{2}\.\d{3}\.\d{3}/\d{4}-\d{2}$"},
        "data_emissao": {"type": "string", "format": "date"},
        "numero_nota": {"type": "string"},
        "serie": {"type": "string"},
        "valor_total": {"type": "number"},
        "valor_produtos": {"type": "number"},
        "valor_impostos": {"type": "number"},
        "icms": {"type": "number"},
        "ipi": {"type": "number"},
        "chave_acesso": {"type": "string"},
        "natureza_operacao": {"type": "string"},
        "destinatario_nome": {"type": "string"},
        "destinatario_cnpj_cpf": {"type": "string"},
    },
    "required": ["empresa", "numero_nota", "valor_total"],
}

BUILTIN_SCHEMAS: dict[str, dict[str, Any]] = {
    "cnh": CNH_SCHEMA,
    "rg": RG_SCHEMA,
    "invoice": INVOICE_SCHEMA,
}


def get_default(document_type: str) -> dict[str, Any]:
    """Built-in schema lookup. Parity: ``schemas/__init__.py:19-41``."""
    try:
        return BUILTIN_SCHEMAS[document_type]
    except KeyError:
        raise SchemaError(f"no built-in schema for document type {document_type!r}")


def load_schema(source: dict[str, Any] | str | Path) -> dict[str, Any]:
    """Load a schema from dict / JSON string / file path.

    Parity: ``schemas/__init__.py:116-154`` (dict passthrough; a string is a
    path unless it starts with ``{``).
    """
    if isinstance(source, dict):
        return source
    if isinstance(source, Path) or (isinstance(source, str) and not source.lstrip().startswith("{")):
        p = Path(source)
        if not p.exists():
            raise SchemaError(f"File not found: {p}")
        try:
            return json.loads(p.read_text(encoding="utf-8"))
        except (json.JSONDecodeError, OSError) as e:
            raise SchemaError(f"cannot load schema file {p}: {e}") from e
    try:
        return json.loads(source)
    except json.JSONDecodeError as e:
        raise SchemaError(f"invalid JSON string: {e}") from e


def validate_schema(schema: dict[str, Any]) -> dict[str, Any]:
    """Well-formedness check → ``{"valid", "error"?, "warnings"?}``.

    Parity: ``schemas/__init__.py:69-113``.
    """
    if not schema:
        return {"valid": False, "error": "Schema is empty"}
    if schema.get("type") != "object":
        return {"valid": False, "error": "Schema type must be 'object'"}
    props = schema.get("properties")
    if props is None:
        return {"valid": False, "error": "Schema must have 'properties'"}
    if not isinstance(props, dict):
        return {"valid": False, "error": "Properties must be an object"}
    warnings: list[str] = []
    if not props:
        warnings.append("Schema has no properties defined")
    for name, spec in props.items():
        if not isinstance(spec, dict):
            return {"valid": False, "error": f"Property '{name}' must be an object"}
        if "type" not in spec:
            warnings.append(f"Property '{name}' has no type defined")
    out: dict[str, Any] = {"valid": True}
    if warnings:
        out["warnings"] = warnings
    return out


# ---------------------------------------------------------------------------
# Introspection
# ---------------------------------------------------------------------------

def required_fields(schema: dict[str, Any]) -> list[str]:
    """Parity: ``schemas/__init__.py:157-167``."""
    return list(schema.get("required", []))


def all_fields(schema: dict[str, Any]) -> list[str]:
    """Parity: ``schemas/__init__.py:170-180``."""
    return list(schema.get("properties", {}).keys())


def date_fields(schema: dict[str, Any]) -> list[str]:
    """Fields with ``format: date`` OR a name containing data/date.

    Parity: ``schemas/__init__.py:183-201``.
    """
    out = []
    for name, spec in schema.get("properties", {}).items():
        fmt = spec.get("format") if isinstance(spec, dict) else None
        lname = name.lower()
        if fmt == "date" or "data" in lname or "date" in lname:
            out.append(name)
    return out


def field_types(schema: dict[str, Any]) -> dict[str, str]:
    """Parity: ``schemas/__init__.py:204-223``."""
    out = {}
    for name, spec in schema.get("properties", {}).items():
        out[name] = spec.get("type", "any") if isinstance(spec, dict) else "any"
    return out


# ---------------------------------------------------------------------------
# Projection / synthesis
# ---------------------------------------------------------------------------

def create_empty_result(schema: dict[str, Any]) -> dict[str, Any]:
    """All schema fields → None ([] for arrays, recursive for objects).

    Parity: ``schemas/__init__.py:246-273``.
    """
    out: dict[str, Any] = {}
    for name, spec in schema.get("properties", {}).items():
        t = spec.get("type", "string") if isinstance(spec, dict) else None
        if t == "object":
            out[name] = create_empty_result(spec)
        elif t == "array":
            out[name] = []
        else:
            out[name] = None
    return out


def filter_to_schema(data: dict[str, Any], schema: dict[str, Any]) -> dict[str, Any]:
    """Keep only schema-declared keys, recursing into nested objects.

    Parity: ``schemas/__init__.py:276-305``.
    """
    if not data or not schema:
        return {}
    props = schema.get("properties", {})
    out: dict[str, Any] = {}
    for key, value in data.items():
        if key not in props:
            continue
        spec = props.get(key, {})
        if isinstance(spec, dict) and spec.get("type") == "object" and isinstance(value, dict):
            out[key] = filter_to_schema(value, spec)
        else:
            out[key] = value
    return out


def schema_example(schema: dict[str, Any]) -> dict[str, Any]:
    """Type-driven example synthesis. Parity: ``schemas/__init__.py:308-350``."""
    defaults: dict[str, Any] = {
        "string": "example_string", "number": 0.0, "integer": 0,
        "boolean": True, "array": [], "object": {},
    }
    out: dict[str, Any] = {}
    for name, spec in schema.get("properties", {}).items():
        if not isinstance(spec, dict):
            out[name] = None
            continue
        if "example" in spec:
            out[name] = spec["example"]
            continue
        t = spec.get("type", "string")
        if t == "object":
            out[name] = schema_example(spec)
        elif t == "array":
            # items may be a dict, a tuple-form LIST, or a bool per
            # JSON-Schema — only the dict form carries a usable type
            items = spec.get("items", {})
            out[name] = ([schema_example(items)]
                         if isinstance(items, dict)
                         and items.get("type") == "object" else [])
        else:
            out[name] = defaults.get(t)
    return out


def validate_against_schema(
    data: dict[str, Any], schema: dict[str, Any]
) -> tuple[bool, list[str]]:
    """Required-field + pattern validation → (is_valid, errors).

    Parity: ``tests/unit/test_postprocessing.py:147-178`` (the normative spec
    for the snapshot-absent ``lib.postprocessing.validate_against_schema``).
    """
    import re

    errors: list[str] = []
    for name in schema.get("required", []):
        if data.get(name) in (None, ""):
            errors.append(f"missing required field: {name}")
    for name, spec in schema.get("properties", {}).items():
        if not isinstance(spec, dict):
            continue
        pattern = spec.get("pattern")
        value = data.get(name)
        if pattern and isinstance(value, str) and value:
            if not re.match(pattern, value):
                errors.append(f"field {name} does not match pattern {pattern}")
        enum = spec.get("enum")
        if enum and value is not None and value not in enum:
            errors.append(f"field {name} not in enum")
    return (not errors, errors)


# ---------------------------------------------------------------------------
# Spark bridge (lazy import — keeps the oracle path Spark-free)
# ---------------------------------------------------------------------------

_SPARK_TYPE_FOR: dict[str, str] = {
    "string": "string", "number": "double", "integer": "long",
    "boolean": "boolean",
}


def to_struct_type(schema: dict[str, Any]):
    """Compile a JSON schema into a ``pyspark.sql.types.StructType``.

    Drives typed ``extracted_data`` columns when the extraction schema is
    static per run (SURVEY.md §1.3).
    """
    from pyspark.sql import types as T

    def convert(spec: dict[str, Any]) -> "T.DataType":
        # JSON Schema permits omitting 'type' on object-shaped specs —
        # infer 'object' from the presence of 'properties' so a top-level
        # {'properties': {...}} compiles to a StructType instead of
        # degrading to a scalar StringType (review r05)
        t = spec.get("type", "object" if "properties" in spec else "string")
        if t == "object":
            return T.StructType([
                T.StructField(n, convert(s if isinstance(s, dict) else {}), True)
                for n, s in spec.get("properties", {}).items()
            ])
        if t == "array":
            items = spec.get("items", {})
            # tuple-form (list) / boolean items degrade to string elements
            # instead of crashing convert() with a non-dict spec
            return T.ArrayType(convert(items if isinstance(items, dict) else {}))
        return getattr(T, {
            "string": "StringType", "number": "DoubleType",
            "integer": "LongType", "boolean": "BooleanType",
        }.get(t, "StringType"))()

    return convert(schema)
