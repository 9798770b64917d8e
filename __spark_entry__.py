"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator-parity catalog from
``br_doc_ocr_spark.queries`` (SURVEY.md §2 inventory; each entry's docstring
in the registry cites the reference operator it reproduces).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from br_doc_ocr_spark import queries as _catalog  # noqa: E402
from br_doc_ocr_spark.pipeline import flagship_query  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full extraction pipeline
    (payload-kind detect → HTML/PDF main-content extraction → field scan →
    status) over testdata-derived transcripts, summarized per
    (status, payload_kind)."""
    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator family from SURVEY.md §2."""
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL per query — EVERY catalog entry has one: the
    hash-based operators included (SimHash and MinHash/LSH via the bit-exact
    SQL rendering of Spark's xxhash64 in
    br_doc_ocr_spark/duckdb_xxh64.py; the extraction family via committed
    per-SF golden-kernel fixtures)."""
    return _catalog.oracle_sql()
