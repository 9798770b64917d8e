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
