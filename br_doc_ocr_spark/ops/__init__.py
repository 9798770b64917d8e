"""Large-scale training-data operators: deduplication, similarity search,
text statistics. All hot paths stay JVM-side (built-in ``pyspark.sql.functions``
inside whole-stage codegen); Python appears only in Arrow-batched kernels where
Spark lacks the primitive (SimHash bit-packing, rolling-hash fingerprints)."""
