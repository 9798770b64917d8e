"""Regenerate the per-SF extraction golden fixtures (tests/fixtures/
golden_sf_extract.parquet, golden_sf_multidoc.parquet).

These freeze the ORACLE kernel's output (single-threaded pandas
``oracle_extract`` / ``oracle_extract_documents``) over the driver testdata
corpora at every SF, so the extraction-family catalog queries get real
DuckDB oracles: the SQL recomputes each query's aggregate from the fixture
(VERDICT r01 #6). Each row carries ``corpus_key = Σ len(documents.text)`` —
the oracle SQL selects the right SF's rows by matching that key against the
documents view it runs on (row counts alone don't disambiguate sf0.001 vs
sf0.01, both 500 docs).

Re-run ONLY for a deliberate kernel/corpus change; the parquet diff IS the
behavior change and must be reviewed as such.

Usage: PYTHONPATH=/root/repo python tools/regen_sf_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pandas as pd  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "fixtures")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def main() -> None:
    from br_doc_ocr_spark.core.extract import (
        DEFAULT_REDACT_FIELDS,
        extract_batch,
        oracle_extract,
        oracle_extract_documents,
    )
    from br_doc_ocr_spark.pipeline import transcripts_from_documents
    from br_doc_ocr_spark.session import build_session

    spark = build_session(app_name="regen-sf-goldens", cpus=8,
                          shuffle_partitions=8)
    extract_parts, multidoc_parts = [], []
    for sf_dir in SF_DIRS:
        docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
        corpus_key = int(docs["text"].str.len().sum())
        transcripts = transcripts_from_documents(spark, sf_dir).toPandas()

        golden = oracle_extract(transcripts)
        # redaction golden: same kernel with the identifier mask on, sorted
        # to the same (conv_id, turn_idx) order so rows align
        red = extract_batch(transcripts, None, DEFAULT_REDACT_FIELDS
                            ).sort_values(["conv_id", "turn_idx"]
                                          ).reset_index(drop=True)
        assert (red["conv_id"] == golden["conv_id"]).all()
        redact_masks = [sum(1 for s in spans
                            if s["field"] in DEFAULT_REDACT_FIELDS)
                        for spans in red["spans"]]
        extract_parts.append(pd.DataFrame({
            "corpus_key": corpus_key,
            "conv_id": golden["conv_id"],
            "turn_idx": golden["turn_idx"],
            "payload_kind": golden["payload_kind"],
            "extracted_chars": [len(t) for t in golden["extracted_text"]],
            "fields": [json.dumps(m, sort_keys=True, ensure_ascii=False)
                       for m in golden["fields"]],
            "n_fields": golden["n_fields"],
            "status": golden["status"],
            "redact_masks": redact_masks,
            "redaction_residuals": red["redaction_residuals"],
            "redacted_chars": [len(t) if t is not None else 0
                               for t in red["redacted_text"]],
        }))

        md = oracle_extract_documents(transcripts)
        multidoc_parts.append(pd.DataFrame({
            "corpus_key": corpus_key,
            "conv_id": md["conv_id"],
            "turn_idx": md["turn_idx"],
            "doc_idx": md["doc_idx"],
            "n_docs": md["n_docs"],
            "payload_kind": md["payload_kind"],
            "n_fields": md["n_fields"],
            "status": md["status"],
        }))
        print(f"{sf_dir}: corpus_key={corpus_key} "
              f"extract={len(extract_parts[-1])} "
              f"multidoc={len(multidoc_parts[-1])}")
    spark.stop()

    pd.concat(extract_parts, ignore_index=True).to_parquet(
        os.path.join(FIXTURES, "golden_sf_extract.parquet"), index=False)
    pd.concat(multidoc_parts, ignore_index=True).to_parquet(
        os.path.join(FIXTURES, "golden_sf_multidoc.parquet"), index=False)


if __name__ == "__main__":
    main()
