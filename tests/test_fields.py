"""Unit tests for the field normalizer/validator core.

Expected values mirror the reference's normative tests
(/root/reference/tests/unit/test_postprocessing.py, test_rg_extraction.py,
test_invoice_extraction.py) and fixture data (tests/conftest.py:242-475).
"""

from __future__ import annotations

import pytest

from br_doc_ocr_spark.core import fields as F


# --- normalizers -----------------------------------------------------------

def test_normalize_cpf_formats_11_digits():
    assert F.normalize_cpf("12345678900") == "123.456.789-00"
    assert F.normalize_cpf("123.456.789-00") == "123.456.789-00"
    assert F.normalize_cpf(" 123 456 789 00 ") == "123.456.789-00"


def test_normalize_cpf_passthrough_on_wrong_length():
    assert F.normalize_cpf("1234") == "1234"
    assert F.normalize_cpf("") == ""
    assert F.normalize_cpf(None) is None


def test_normalize_cnpj():
    # reference extraction.py:517-539
    assert F.normalize_cnpj("12345678000190") == "12.345.678/0001-90"
    assert F.normalize_cnpj("12.345.678/0001-90") == "12.345.678/0001-90"
    assert F.normalize_cnpj("123") == "123"


def test_normalize_rg():
    assert F.normalize_rg("  mg-12.345.678 ") == "MG-12.345.678"
    assert F.normalize_rg("") == ""


def test_normalize_date_brazilian():
    # test_postprocessing.py:184-189
    assert F.normalize_date("15/05/1990") == "1990-05-15"
    assert F.normalize_date("20/06/2030") == "2030-06-20"


def test_normalize_date_iso_passthrough():
    assert F.normalize_date("1990-05-15") == "1990-05-15"


def test_normalize_date_invalid_returns_original():
    # test_postprocessing.py:198-203
    assert F.normalize_date("not a date") == "not a date"
    assert F.normalize_date("31/02/2020") == "31/02/2020"  # calendar-invalid
    assert F.normalize_date("2020-13-40") == "2020-13-40"


def test_normalize_dates_in_result():
    # test_postprocessing.py:205-218
    data = {"nome": "JOÃO", "data_nascimento": "15/05/1990",
            "data_validade": "20/06/2030"}
    out = F.normalize_dates_in_result(data, ["data_nascimento", "data_validade"])
    assert out["data_nascimento"] == "1990-05-15"
    assert out["data_validade"] == "2030-06-20"
    assert out["nome"] == "JOÃO"


@pytest.mark.parametrize("raw,expected", [
    ("R$ 1.234,56", 1234.56),
    ("1.234,56", 1234.56),
    ("1234,56", 1234.56),
    ("1234.56", 1234.56),
    ("1.234", 1.234),      # try-plain-float-first ordering (extraction.py:568-585)
    ("R$ 1180.00", 1180.0),
    ("R$0,99", 0.99),
    ("abc", None),
    ("", None),
    (None, None),
])
def test_parse_currency(raw, expected):
    assert F.parse_currency(raw) == expected


# --- validators ------------------------------------------------------------

def test_validate_cnh_fields():
    good = {"cpf": "123.456.789-00", "categoria_habilitacao": "AB"}
    assert F.validate_cnh_fields(good) == []
    bad = {"cpf": "12345678900", "categoria_habilitacao": "XY"}
    errors = F.validate_cnh_fields(bad)
    assert len(errors) == 2


@pytest.mark.parametrize("rg,state,valid,fmt", [
    ("12.345.678-9", "SP", True, "sp"),
    ("123456789", "RJ", True, "rj"),
    ("MG-12.345.678", "MG", True, "mg"),
    ("1234567", "BA", True, "state-generic"),
    ("1234567", None, True, "generic"),
    ("1234", None, False, None),
    ("", None, False, None),
    ("1234567890123456", None, False, None),  # 16 digits > 15
])
def test_validate_rg_number(rg, state, valid, fmt):
    res = F.validate_rg_number(rg, state=state)
    assert res["valid"] is valid
    if fmt:
        assert res["format"] == fmt


@pytest.mark.parametrize("orgao,valid", [
    ("SSP-SP", True), ("SSPSP", True), ("DETRAN-RJ", True), ("PC-MG", True),
    ("IIRGD", True), ("IFP-RJ", True), ("SDS-PE", True), ("IGP-RS", True),
    ("FOOBAR-SP", True),  # generic [A-Z]{2,10}-?[A-Z]{2}
    ("X", False), ("", False), (None, False),
])
def test_validate_orgao_emissor(orgao, valid):
    assert F.validate_orgao_emissor(orgao) is valid


def test_extract_state_from_orgao():
    assert F.extract_state_from_orgao("SSP-SP") == "SP"
    assert F.extract_state_from_orgao("DETRAN-RJ") == "RJ"
    assert F.extract_state_from_orgao("IIRGD") is None  # GD not a state
    assert F.extract_state_from_orgao("") is None


def test_validate_rg_fields_golden_sp():
    # conftest.py:412-421 (SP variant)
    data = {"nome_completo": "CARLOS OLIVEIRA", "registro_geral": "12.345.678-9",
            "cpf": "111.222.333-44", "data_nascimento": "1988-07-22",
            "data_expedicao": "2019-11-05", "orgao_emissor": "SSP-SP"}
    assert F.validate_rg_fields(data) == []


def test_validate_rg_fields_missing_rg():
    errors = F.validate_rg_fields({"cpf": "bad"})
    assert any("registro_geral" in e for e in errors)
    assert any("CPF" in e for e in errors)


def test_validate_cnpj():
    assert F.validate_cnpj("12.345.678/0001-90")["valid"]
    assert F.validate_cnpj("12345678000190")["digits"] == "12345678000190"
    assert not F.validate_cnpj("123")["valid"]
    assert not F.validate_cnpj("")["valid"]


def test_validate_nfe_key():
    key = "35210312345678000190550010000000011000000010"
    assert F.validate_nfe_key(key) == {"valid": True, "normalized": key}
    spaced = " ".join([key[i:i + 4] for i in range(0, 44, 4)])
    assert F.validate_nfe_key(spaced)["valid"]
    assert not F.validate_nfe_key("123")["valid"]


def test_calculate_tax_total():
    assert F.calculate_tax_total({"icms": 180.0, "ipi": 20.0}) == 200.0
    assert F.calculate_tax_total({"icms": None, "other": 5.0}) == 0.0
    assert F.calculate_tax_total({"icms": "bad"}) == 0.0


def test_validate_invoice_totals_golden():
    # conftest.py:86-102: 1000 + 180 == 1180 within 0.01
    data = {"valor_produtos": 1000.00, "valor_impostos": 180.00,
            "valor_total": 1180.00}
    assert F.validate_invoice_totals(data)["valid"]
    data["valor_total"] = 1200.00
    res = F.validate_invoice_totals(data)
    assert not res["valid"] and res["difference"] == pytest.approx(20.0)


def test_validate_invoice_fields_golden():
    data = {"empresa": "EMPRESA VENDEDORA LTDA", "cnpj": "12.345.678/0001-90",
            "data_emissao": "2026-01-15", "numero_nota": "000123456",
            "valor_total": 1180.00,
            "chave_acesso": "35210312345678000190550010000000011000000010"}
    assert F.validate_invoice_fields(data) == []


def test_validate_invoice_fields_errors():
    errors = F.validate_invoice_fields(
        {"cnpj": "12", "chave_acesso": "99", "data_emissao": "15/01/2026",
         "valor_total": "not currency"})
    assert any("numero_nota" in e for e in errors)
    assert any("CNPJ" in e for e in errors)
    assert any("NFe" in e for e in errors)
    assert any("data_emissao" in e for e in errors)
    assert any("currency" in e for e in errors)


# --- postprocessing --------------------------------------------------------

def test_parse_payload_json_variants():
    # test_postprocessing.py:15-58
    assert F.parse_payload_json('{"nome": "MARIA"}') == {"nome": "MARIA"}
    assert F.parse_payload_json('```json\n{"nome": "MARIA"}\n```') == {"nome": "MARIA"}
    assert F.parse_payload_json('{"nome": "PEDRO"}\n\ntrailing.') == {"nome": "PEDRO"}
    with pytest.raises(F.JSONParseError):
        F.parse_payload_json("not valid json at all")
    with pytest.raises(F.JSONParseError):
        F.parse_payload_json("")


def test_flag_low_confidence():
    # test_postprocessing.py:61-108 (fixture mock_low_confidence_scores)
    scores = {"nome_completo": 0.85, "cpf": 0.45, "data_nascimento": 0.30,
              "categoria_habilitacao": 0.92, "num_registro": 0.40,
              "data_validade": 0.88}
    flagged = F.flag_low_confidence(scores, threshold=0.5)
    assert flagged == ["cpf", "data_nascimento", "num_registro"]
    assert F.flag_low_confidence({"a": 0.95, "b": 0.94}, threshold=0.96) == ["a", "b"]
    assert F.flag_low_confidence({"a": 0.99}) == []


def test_enrich_extraction_result():
    data = {"cpf": "123.456.789-00"}
    scores = {"cpf": 0.45}
    out = F.enrich_extraction_result(data, scores)
    assert out["extracted_data"] == data
    assert out["confidence_scores"] == scores
    assert out["low_confidence_fields"] == ["cpf"]


def test_fill_placeholder_confidence():
    # extraction.py:185-192
    assert F.fill_placeholder_confidence({"a": 1, "b": 2}, None) == {"a": 0.85, "b": 0.85}
    assert F.fill_placeholder_confidence({"a": 1}, {"a": 0.99}) == {"a": 0.99}


def test_derive_status():
    # extraction.py:208-212
    assert F.derive_status({}, []) == "failed"
    assert F.derive_status({"cpf": "x"}, []) == "success"
    assert F.derive_status({"cpf": "x"}, ["cpf"]) == "partial"


def test_parse_payload_json_brace_bearing_trailing_text():
    """Balanced-brace recovery: trailing text containing braces must not
    break extraction of the leading valid object (the greedy fallback
    spanned first-'{' to last-'}')."""
    from br_doc_ocr_spark.core import fields as F

    assert F.parse_payload_json(
        '{"nome": "MARIA"} segue codigo: if (x) { y(); }') == {"nome": "MARIA"}
    assert F.parse_payload_json(
        '{"a": "br{ace} in string"} tail }') == {"a": "br{ace} in string"}
    import pytest as _pytest
    with _pytest.raises(F.JSONParseError):
        F.parse_payload_json("garbage")


def test_validators_accept_non_string_cpf():
    from br_doc_ocr_spark.core import fields as F

    errs = F.validate_cnh_fields({"cpf": 12345678901})
    assert any("Invalid CPF" in e for e in errs)
    errs = F.validate_rg_fields({"registro_geral": "12.345.678-9",
                                 "cpf": 12345678901})
    assert any("Invalid CPF" in e for e in errs)


def test_parse_payload_json_recovers_past_brace_garbage_prefix():
    """review r04: a brace-bearing garbage prefix must not defeat a valid
    object that follows (the balanced scan tries every '{' start)."""
    from br_doc_ocr_spark.core.fields import parse_payload_json

    got = parse_payload_json('result {ok} -> {"cpf": "123.456.789-01"}')
    assert got == {"cpf": "123.456.789-01"}
    # the leading-object case still wins when IT is the valid one
    got = parse_payload_json('{"a": 1} code: if (x) { y(); }')
    assert got == {"a": 1}
