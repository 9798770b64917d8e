"""Contract layer: output-shape invariants as executable spec.

Mirrors the reference's ``tests/contract/`` (``test_api_responses.py:13-111``,
``test_schema_validation.py:13-99``) — required fields, enum domains, score
ranges, null-semantics — applied to the graft's per-turn extraction output
and the lineage/evaluation tables. These are properties EVERY result row
must satisfy regardless of payload, so they run over the whole tiny corpus,
not hand-picked samples.
"""

from __future__ import annotations

import pandas as pd
import pytest

from br_doc_ocr_spark.core.extract import OUTPUT_COLUMNS, oracle_extract
from br_doc_ocr_spark.synth import make_transcripts_pandas

ALLOWED_KINDS = {"html", "pdf", "prose", "unknown"}
ALLOWED_STATUSES = {"success", "partial", "failed", "error"}


# single source of truth for the corpus both fixtures/tests regenerate
CORPUS_PARAMS = dict(n_convs=15, mean_turns=6, seed=7, skew_conv=False)


@pytest.fixture(scope="module")
def results() -> pd.DataFrame:
    return oracle_extract(make_transcripts_pandas(**CORPUS_PARAMS))


def test_result_has_required_columns(results):
    # test_api_responses.py:17-29 analog: every required field present
    assert list(results.columns) == OUTPUT_COLUMNS


def test_payload_kind_domain(results):
    # test_api_responses.py:31-37 analog (document_type enum)
    assert set(results["payload_kind"]) <= ALLOWED_KINDS


def test_status_domain(results):
    # test_api_responses.py:39-44 analog
    assert set(results["status"]) <= ALLOWED_STATUSES


def test_confidence_scores_in_unit_interval(results):
    # test_api_responses.py: score ∈ [0,1] for every field
    for scores in results["confidence_scores"]:
        for v in scores.values():
            assert 0.0 <= v <= 1.0


def test_fields_is_string_map_and_n_fields_consistent(results):
    for fields, n in zip(results["fields"], results["n_fields"]):
        assert isinstance(fields, dict)
        assert all(isinstance(k, str) and isinstance(v, str)
                   for k, v in fields.items())
        assert n == len(fields)


def test_low_confidence_fields_subset_of_scored(results):
    # FR-013: flagged fields must exist in confidence_scores and score < 0.5
    for scores, low in zip(results["confidence_scores"],
                           results["low_confidence_fields"]):
        for name in low:
            assert name in scores and scores[name] < 0.5


def test_status_derivation_consistent(results):
    # F23 (extraction.py:208-212): failed ⇔ no fields; partial ⇔ low-conf
    for _, row in results.iterrows():
        if row["status"] == "error":
            continue
        if len(row["fields"]) == 0:
            assert row["status"] == "failed"
        elif len(row["low_confidence_fields"]) > 0:
            assert row["status"] == "partial"
        else:
            assert row["status"] == "success"


def test_spans_index_into_raw_payload(results):
    # span offsets are char offsets into the ORIGINAL text column
    # (same CORPUS_PARAMS as the results fixture — single source of truth)
    src = make_transcripts_pandas(**CORPUS_PARAMS)
    src = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for text, spans in zip(src["text"], results["spans"]):
        for s in spans:
            assert 0 <= s["start"] < s["end"] <= len(text)
            assert isinstance(s["field"], str)


def test_key_columns_never_null(results):
    assert results["conv_id"].notna().all()
    assert results["turn_idx"].notna().all()
    assert results["status"].notna().all()
    assert results["extracted_text"].notna().all()  # empty string, never null


def test_lazy_package_api_exports():
    """The package mirrors the reference's lazy top-level API
    (__init__.py:57-84): every __all__ symbol resolves lazily, unknown names
    raise AttributeError, and the queries submodule stays reachable."""
    import br_doc_ocr_spark as b

    for name in b.__all__:
        assert getattr(b, name) is not None, name
    assert callable(b.run_pipeline) and callable(b.evaluate)
    with pytest.raises(AttributeError):
        b.not_a_symbol


# ---------------------------------------------------------------------------
# Single-record API contract — mirrors the reference's response contract
# (tests/contract/test_api_responses.py:13-111) for extract_one.
# ---------------------------------------------------------------------------

INVOICE_PAYLOAD = ("NOTA FISCAL empresa ACME LTDA CNPJ 11.222.333/0001-81 "
                   "valor R$ 1.234,56 data 01/02/2024")


def _result(**kw):
    from br_doc_ocr_spark.core.extract import extract_one

    return extract_one(INVOICE_PAYLOAD, **kw)


def test_extract_one_has_required_fields():
    r = _result()
    for field in ("document_type", "extracted_data", "processing_time_ms",
                  "model_version", "status"):
        assert field in r, field
    assert r["document_type"] in ("cnh", "rg", "invoice", "unknown")
    assert r["status"] in ("success", "partial", "failed")
    assert isinstance(r["processing_time_ms"], int)
    assert r["processing_time_ms"] >= 0
    assert isinstance(r["extracted_data"], dict)


def test_extract_one_confidence_optional_and_bounded():
    r = _result(confidence=True)
    assert isinstance(r["confidence_scores"], dict)
    for score in r["confidence_scores"].values():
        assert 0.0 <= score <= 1.0
    stripped = _result(confidence=False)
    assert "confidence_scores" not in stripped
    assert "low_confidence_fields" not in stripped


def test_extract_one_error_message_null_on_success():
    r = _result()
    assert r["status"] in ("success", "partial")
    assert r["error_message"] is None


def test_extract_one_document_type_from_fields():
    r = _result()
    assert r["document_type"] == "invoice"          # cnpj + valor present
    from br_doc_ocr_spark.core.extract import extract_one

    assert extract_one("RG 12.345.678-9 SSP-SP")["document_type"] == "rg"
    assert extract_one("Categoria: AB")["document_type"] == "cnh"
    assert extract_one("nothing here")["document_type"] == "unknown"


def test_extract_one_document_type_hint_selects_builtin_schema():
    from br_doc_ocr_spark.core.extract import extract_one

    hinted = extract_one(INVOICE_PAYLOAD, document_type="rg")
    assert hinted["document_type"] == "rg"
    # the rg schema bounds the field set: invoice-only fields are filtered
    assert "valor" not in hinted["extracted_data"]


def test_extract_one_multi_document_is_list_of_results():
    from br_doc_ocr_spark.core.extract import extract_one

    two_docs = (INVOICE_PAYLOAD + " and more padding to reach segment size"
                "\n---\n"
                "RG 12.345.678-9 SSP-SP documento de identidade com texto")
    out = extract_one(two_docs, multi_document=True)
    assert isinstance(out, list) and len(out) == 2
    for item in out:
        for field in ("document_type", "extracted_data", "processing_time_ms",
                      "model_version", "status"):
            assert field in item, field
    assert [r["document_type"] for r in out] == ["invoice", "rg"]


def test_extract_one_failure_keeps_contract_keys():
    """The error channel must honor the same contract as success: requested
    confidence keys present (empty), caller's document_type hint kept."""
    from br_doc_ocr_spark.core.extract import extract_one

    r = extract_one(12345, confidence=True)  # non-string → kernel raises
    assert r["status"] == "failed" and r["error_message"]
    assert r["confidence_scores"] == {}
    assert r["low_confidence_fields"] == []
    hinted = extract_one(12345, document_type="invoice", confidence=False)
    assert hinted["document_type"] == "invoice"
    assert "confidence_scores" not in hinted


def test_extract_one_matches_batch_kernel():
    """Single-record and table answers must agree (same kernel)."""
    from br_doc_ocr_spark.core.extract import extract_one, extract_turn

    one = extract_one(INVOICE_PAYLOAD)
    turn = extract_turn(INVOICE_PAYLOAD)
    assert one["extracted_data"] == turn["fields"]
    assert one["status"] == turn["status"]
    assert one["confidence_scores"] == turn["confidence_scores"]


def test_classify_one_contract():
    """Mirrors ClassificationResult.to_dict (classification.py:26-41):
    document_type / confidence / alternatives / processing_time_ms, with
    the residual-spread alternatives of the batch classifier."""
    from br_doc_ocr_spark.core.extract import classify_one

    r = classify_one(INVOICE_PAYLOAD)
    assert r["document_type"] == "invoice"
    assert r["confidence"] == 0.97
    alt_types = {a["document_type"] for a in r["alternatives"]}
    assert alt_types == {"cnh", "rg"}
    assert all(a["confidence"] == 0.015 for a in r["alternatives"])
    assert isinstance(r["processing_time_ms"], int)
    unk = classify_one("nothing classifiable here")
    assert unk["document_type"] == "unknown"
    assert unk["confidence"] == 0.0 and unk["alternatives"] == []
    assert classify_one(None)["document_type"] == "unknown"


def test_extract_one_redact_opt_in_only():
    """redacted_text is ADDED only when requested — the default response
    keeps exactly the reference contract keys."""
    from br_doc_ocr_spark.core.extract import (
        DEFAULT_REDACT_FIELDS, extract_one)

    t = "CPF 123.456.789-00 em anexo"
    base = extract_one(t)
    assert "redacted_text" not in base
    red = extract_one(t, redact_fields=DEFAULT_REDACT_FIELDS)
    assert red["redacted_text"] == "CPF [CPF] em anexo"
    assert set(red) - set(base) == {"redacted_text", "redaction_residuals"}
    assert red["redaction_residuals"] == 0


def test_rg_classifies_without_issuer_token():
    """review r04: the rg hint must fire on the key the scanner actually
    emits (registro_geral), not only when an issuer token is present."""
    from br_doc_ocr_spark.core.extract import extract_one

    r = extract_one("RG: 12.345.678-9")
    assert "registro_geral" in r["extracted_data"]
    assert r["document_type"] == "rg"


def test_extract_one_unknown_document_type_rides_error_channel():
    """review r04: an unknown document_type returns a failed result (the
    documented API error channel), never raises."""
    from br_doc_ocr_spark.core.extract import extract_one

    r = extract_one("CPF 123.456.789-09", document_type="nfse")
    assert r["status"] == "failed"
    assert "SchemaError" in r["error_message"] or "nfse" in r["error_message"]
