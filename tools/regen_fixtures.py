"""Regenerate the committed golden parquet fixtures (tests/fixtures/).

The goldens are oracle-computed: the single-threaded pure-pandas kernel
(`core/extract.oracle_extract` / `oracle_extract_documents`) over the
deterministic seed-42 tiny corpus — the SAME parameters as the pytest
`tiny_transcripts` fixture (tests/conftest.py). Re-run this ONLY when a
deliberate kernel-semantics or corpus change is being made; the diff of the
regenerated parquet IS the behavior change and must be reviewed as such.

Usage: PYTHONPATH=/root/repo python tools/regen_fixtures.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pandas as pd  # noqa: E402

from br_doc_ocr_spark.core.extract import (  # noqa: E402
    oracle_extract,
    oracle_extract_documents,
)
from br_doc_ocr_spark.synth import make_transcripts_pandas  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "fixtures")


def main() -> None:
    transcripts = make_transcripts_pandas(n_convs=25, mean_turns=8, seed=42,
                                          skew_conv=True, skew_factor=40)
    transcripts_out = transcripts.copy()
    transcripts_out["ts"] = transcripts_out["ts"].astype("datetime64[us]")
    transcripts_out.to_parquet(
        os.path.join(FIXTURES, "transcripts_tiny.parquet"), index=False)

    golden = oracle_extract(transcripts)
    # json-encode nested cells so the committed parquet is engine-neutral and
    # diff-able (matches test_golden_fixtures.py's comparison encoding)
    golden = golden.assign(
        fields=[json.dumps(m, sort_keys=True) for m in golden["fields"]],
        spans=[json.dumps(s) for s in golden["spans"]],
        confidence_scores=[json.dumps(m, sort_keys=True)
                           for m in golden["confidence_scores"]],
        low_confidence_fields=[json.dumps(list(x))
                               for x in golden["low_confidence_fields"]],
    )
    golden["ts"] = golden["ts"].astype("datetime64[us]")
    golden.to_parquet(os.path.join(FIXTURES, "golden_extractions.parquet"),
                      index=False)

    docs = oracle_extract_documents(transcripts)
    docs = docs.assign(
        fields=[json.dumps(m, sort_keys=True) for m in docs["fields"]],
        low_confidence_fields=[json.dumps(list(x))
                               for x in docs["low_confidence_fields"]],
    )
    docs.to_parquet(os.path.join(FIXTURES, "golden_documents.parquet"),
                    index=False)
    print(f"transcripts: {len(transcripts)} rows; "
          f"golden_extractions: {len(golden)}; golden_documents: {len(docs)}")


if __name__ == "__main__":
    main()
