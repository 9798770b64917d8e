"""br_doc_ocr_spark — a PySpark-native rebuild of the query/data-processing
surface of cristianocps/br-doc-ocr (reference snapshot at /root/reference).

Architecture (Spark-first, NOT a port):

- ``core/``      pure pandas/NumPy extraction kernel shared verbatim between the
                 single-threaded oracle and the Spark ``mapInPandas`` UDF — this
                 is what guarantees per-turn byte equality by construction.
- ``pipeline``   the batch DataFrame job: salted repartition by conv_id,
                 one Arrow-batched extraction crossing, window-restored turn
                 ordering, per-partition lineage, coalesced writes.
- ``checkpoint`` manifest-based resumable runs (Iceberg-snapshot-compatible
                 layout over parquet; no Iceberg jars in the sandbox).
- ``ops/``       large-scale training-data operators: dedup (exact/MinHash-LSH/
                 SimHash/n-gram Jaccard), ANN similarity, text statistics.
- ``queries``    operator-parity query catalog mirrored by ANSI-SQL oracles
                 (driven through ``__spark_entry__.py``).

Reference parity map lives in SURVEY.md §2; each module docstring cites the
reference file:line it reproduces.
"""

__version__ = "0.1.0"
