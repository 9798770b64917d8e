"""Shared fixtures: one session-scoped local SparkSession (SURVEY.md §5)."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from br_doc_ocr_spark.session import build_session

    session = build_session(app_name="br-doc-ocr-spark-tests", cpus=4,
                            shuffle_partitions=8)
    yield session
    session.stop()


@pytest.fixture(scope="session")
def tiny_transcripts():
    """Deterministic tiny transcript table incl. the skewed conv-heavy id."""
    from br_doc_ocr_spark.synth import make_transcripts_pandas

    return make_transcripts_pandas(n_convs=25, mean_turns=8, seed=42,
                                   skew_conv=True, skew_factor=40)


@pytest.fixture(scope="session")
def tiny_transcripts_path(tiny_transcripts, tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "transcripts_tiny.parquet"
    df = tiny_transcripts.copy()
    df["ts"] = df["ts"].astype("datetime64[us]")  # Spark rejects TIMESTAMP(NANOS)
    df.to_parquet(path, index=False)
    return str(path)


SF_DIR = "/root/testdata/sf0.001"
