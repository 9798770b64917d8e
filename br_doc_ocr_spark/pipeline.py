"""The batch extraction job — the graft's flagship DataFrame pipeline.

Reference analog: the batch fan-out executor ``cli/batch.py:24-217`` (scan →
per-record extraction with error channel → sinks → summary), rebuilt on
Spark's execution model per the north rule:

1. scan the transcript table (parquet here; the layout is Iceberg-compatible),
2. **salted repartition by conv_id** — extraction is per-row, so we are free
   to break a 10^9-turn conversation across ``salt`` tasks; without salting a
   single heavy conv_id stalls one task (SURVEY.md §4.3),
3. exactly **one Arrow crossing**: ``mapInPandas(extract_batches)`` over the
   shared kernel (zero per-row Python at the Spark boundary),
4. per-partition **lineage** rows (partition id, row counts, status tallies,
   wall-clock) — PII-free by schema (counts and timings only, NFR-005/006),
5. **stable turn ordering** restored for the sink via range-partitioned sort
   on (conv_id, turn_idx) — fixes the reference's nondeterministic-order bug
   (``cli/batch.py:184-190`` writes in thread-completion order),
6. coalesced, idempotent parquet writes.
"""

from __future__ import annotations

import time
import weakref
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as sf

from br_doc_ocr_spark.core.extract import (
    MULTIDOC_SCHEMA_DDL,
    OUTPUT_SCHEMA_DDL,
    extract_batch,
    extract_documents_batch,
    schema_field_names,
)

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# (Two former module constants deleted, review r05: LINEAGE_SCHEMA_DDL had
# drifted from the lineage rows run_pipeline actually writes — missing the
# run_id/snapshot_id stamps and the optional redaction_residuals column —
# and EXTRACT_WITH_LINEAGE_DDL duplicated _extract_ddl(redact=False); both
# had zero readers. The authoritative kernel-output schema is
# _extract_ddl(); the lineage schema is the select in run_pipeline.)


def _extract_ddl(redact: bool) -> str:
    """Kernel-output DDL for mapInPandas; `redacted_text` +
    `redaction_residuals` ride between the kernel columns and the lineage
    tags exactly where extract_batch emits them, so name- and
    position-matching modes both line up."""
    base = OUTPUT_SCHEMA_DDL + (
        ", redacted_text string, redaction_residuals int" if redact else "")
    return base + ", _partition_id int, _batch_ms long"


def read_transcripts(spark: SparkSession, path: str,
                     table_format: str | None = "parquet",
                     snapshot_id: int | None = None) -> DataFrame:
    """Scan the transcript table, projecting exactly the job's columns so
    Catalyst prunes the read to them. ``table_format=None`` means
    unspecified and reads parquet (callers like the CLI pass their
    optional flag straight through).

    ``table_format='iceberg'`` loads ``path`` as an Iceberg table name (or
    HDFS table dir) through the DataSourceV2 reader — identical projection
    pushdown, plus ``snapshot_id`` time travel for reproducible reruns
    against a pinned snapshot (the production form of the checkpoint
    manifest's snapshot ids). Requires the iceberg-spark-runtime jar on the
    cluster (spark-submit ``--packages``); this sandbox ships no such jar,
    so the path raises a clear error here and is exercised on real
    clusters only — everything downstream is format-agnostic.
    """
    table_format = table_format or "parquet"
    if table_format == "iceberg":
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        try:
            df = reader.load(path)
        except Exception as e:
            # only the missing-jar/data-source case gets the classpath hint;
            # table-not-found / auth / bad snapshot-id keep their own message
            msg = str(e)
            if ("Failed to find" in msg and "data source" in msg.lower()) or \
                    "ClassNotFoundException" in msg:
                raise RuntimeError(
                    "Iceberg read failed — is iceberg-spark-runtime on the "
                    "classpath (spark-submit --packages org.apache.iceberg:"
                    "iceberg-spark-runtime-...)?") from e
            raise
        return df.select(*TRANSCRIPT_COLUMNS)
    if table_format != "parquet":
        raise ValueError(f"unsupported table_format: {table_format!r}")
    if snapshot_id is not None:
        # silently reading the CURRENT table while the caller believes the
        # run is pinned would break the reproducible-rerun contract the
        # flag exists for
        raise ValueError(
            "snapshot_id requires table_format='iceberg' — plain parquet "
            "has no snapshot to pin")
    return spark.read.parquet(path).select(*TRANSCRIPT_COLUMNS)


def _extract_partition(allowed_fields: frozenset[str] | None,
                       redact_fields: frozenset[str] | None = None):
    """Build the per-partition kernel closure. One task = one partition.
    Emits extraction rows tagged with the task's partition id and per-batch
    wall-clock (first row of each batch carries the batch's elapsed ms; the
    rest carry 0) so lineage aggregates exactly."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1
        for batch in batches:
            if not len(batch):
                continue
            t0 = time.perf_counter()
            out = extract_batch(batch, allowed_fields, redact_fields)
            elapsed_ms = int((time.perf_counter() - t0) * 1000)
            out["_partition_id"] = pid
            ms = [0] * len(out)
            ms[0] = elapsed_ms
            out["_batch_ms"] = ms
            yield out

    return run


def run_extraction(
    transcripts: DataFrame,
    salt: int = 8,
    target_partitions: int | None = None,
    schema: dict | None = None,
    persist: bool = False,
    max_payload_chars: int | None = None,
    redact_fields: frozenset[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the extraction stage → (results, lineage).

    ``salt`` splits each conv_id across up to ``salt`` shuffle keys
    (``pmod(turn_idx, salt)``) — deterministic, order-insensitive for a
    per-row map, and it defuses long-conversation skew. ``target_partitions``
    defaults to the session shuffle-partition conf. ``schema`` enables
    schema-guided extraction (US4): a JSON-Schema dict whose field names
    bound the extracted field set (shipped to executors in the task closure —
    the broadcast-variable pattern for a driver-side config).

    ``max_payload_chars`` caps each payload BEFORE the Arrow crossing with a
    codegen'd ``substring`` — the graft analog of the reference's
    downscale-before-inference resize (``preprocessing.py:66-96``: cap at
    1024px, never upscale): a pathological single-turn payload (SCALE.md
    "what breaks first" #3 — a 1 GB turn) is bounded at scan speed instead of
    blowing up a Python worker's Arrow batch. Short payloads pass through
    unchanged (substring never pads); off by default.

    ``redact_fields`` (PII scrubbing, a training-data op beyond the
    reference) appends a ``redacted_text`` column: the raw payload with
    every detected span of those fields masked as ``[FIELD]`` —
    ``core.extract.DEFAULT_REDACT_FIELDS`` covers the identifier fields.

    ``persist=True`` materializes the kernel output (memory, spilling to
    executor disk) so that consuming BOTH returned frames runs the kernel
    once, not twice — required whenever results AND lineage are acted on
    (the write path measured 2× without it). Callers unpersist via
    :func:`unpersist_extraction`.
    """
    spark = transcripts.sparkSession
    n = target_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    if max_payload_chars is not None:
        transcripts = transcripts.withColumn(
            "text", sf.substring("text", 1, max_payload_chars))
    salted = transcripts.repartition(
        n, sf.col("conv_id"), sf.pmod(sf.col("turn_idx"), sf.lit(salt))
    )
    extracted = salted.mapInPandas(
        _extract_partition(schema_field_names(schema), redact_fields),
        schema=_extract_ddl(redact_fields is not None))
    if persist:
        from pyspark import StorageLevel

        # DISK_ONLY, deliberately: MEMORY_AND_DISK builds in-heap columnar
        # cache batches first and OOMed the 8g JVM at 20M rows (the kernel
        # output carries the extracted text) — serialized disk blocks keep
        # the heap bounded like a shuffle spill, at any scale, and the
        # single re-read for the ordered write is sequential I/O.
        extracted = extracted.persist(StorageLevel.DISK_ONLY)

    # Lineage is an aggregation over the extraction output itself — computed
    # in the same plan (no second scan); counts are exact, wall-clock sums the
    # per-batch kernel timings within each partition. Redacting runs also
    # carry the per-partition residual-identifier escape count (the PII
    # completeness audit, VERDICT r03 #5) — a count, never a payload, so the
    # lineage table stays PII-free by schema.
    aggs = [
        sf.count("*").alias("row_count"),
        sf.sum(sf.when(sf.col("status") == "success", 1).otherwise(0)).alias("success_count"),
        sf.sum(sf.when(sf.col("status") == "partial", 1).otherwise(0)).alias("partial_count"),
        sf.sum(sf.when(sf.col("status") == "failed", 1).otherwise(0)).alias("failed_count"),
        sf.sum(sf.when(sf.col("status") == "error", 1).otherwise(0)).alias("error_count"),
        sf.sum("_batch_ms").alias("wall_clock_ms"),
    ]
    if redact_fields is not None:
        aggs.append(sf.sum("redaction_residuals").alias("redaction_residuals"))
    lineage = extracted.groupBy(
        sf.col("_partition_id").alias("partition_id")
    ).agg(*aggs)
    results = extracted.drop("_partition_id", "_batch_ms")
    if persist:
        _EXTRACTION_CACHES[results] = extracted
    return results, lineage


# results-frame -> persisted kernel-output frame, for unpersist_extraction.
# A side registry (not an attribute stashed on the DataFrame instance):
# weak keys so an abandoned results frame never pins its cache entry, and
# no reliance on DataFrame accepting ad-hoc attributes across Spark versions.
_EXTRACTION_CACHES: "weakref.WeakKeyDictionary[DataFrame, DataFrame]" = (
    weakref.WeakKeyDictionary()
)


def _share_extraction_cache(derived: DataFrame, source: DataFrame) -> None:
    """Make ``unpersist_extraction(derived)`` release ``source``'s cache."""
    cache = _EXTRACTION_CACHES.get(source)
    if cache is not None:
        _EXTRACTION_CACHES[derived] = cache


def unpersist_extraction(results: DataFrame) -> None:
    cache = _EXTRACTION_CACHES.pop(results, None)
    if cache is not None:
        cache.unpersist()


def with_stable_order(results: DataFrame) -> DataFrame:
    """Restore per-conversation turn order for sinks/comparisons.

    ``repartitionByRange`` + ``sortWithinPartitions`` gives a globally ordered
    layout without a single-reducer sort — the window-free way to make output
    order deterministic at any scale (SURVEY.md §2.5/§2.6 O4).
    """
    return results.repartitionByRange("conv_id", "turn_idx").sortWithinPartitions(
        "conv_id", "turn_idx"
    )


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str | None = None,
    lineage_path: str | None = None,
    salt: int = 8,
    run_id: str = "run-0",
    snapshot_id: str = "snap-0",
    max_payload_chars: int | None = None,
    schema: dict | None = None,
    drop_confidence: bool = False,
    redact_fields: frozenset[str] | None = None,
    table_format: str | None = "parquet",
    read_snapshot_id: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """End-to-end: read → salted extract → order → (optionally) write.

    ``table_format``/``read_snapshot_id`` select the input reader (Iceberg
    time travel on a cluster with the runtime jar) — distinct from
    ``snapshot_id``, which stamps the OUTPUT lineage rows for the resume
    manifest.

    Writes are idempotent overwrites; lineage rows are stamped with
    ``run_id``/``snapshot_id`` (FIXTURES.md §5) for the resume manifest.
    ``schema`` enables schema-guided extraction (US4) — see
    :func:`run_extraction`. ``drop_confidence`` strips the
    confidence_scores / low_confidence_fields columns from the result (P2 —
    the reference's ``--confidence`` off path, cli/extract.py:130-137).
    """
    if lineage_path and not output_path:
        # the lineage write is nested under the output write — silently
        # skipping it would leave the caller's resume manifest without its
        # lineage table (review r05)
        raise ValueError(
            "run_pipeline: lineage_path requires output_path — lineage is "
            "written alongside the output (pass output_path, or consume "
            "the returned lineage frame directly)")
    transcripts = read_transcripts(spark, input_path,
                                   table_format=table_format,
                                   snapshot_id=read_snapshot_id)
    # persist ONLY when the ordered write AND the lineage write both
    # consume the kernel output — with output alone there is exactly one
    # action inside this function, and the DISK_ONLY materialization was
    # pure overhead (~2x the I/O of the write path at 20M rows,
    # review r05); the returned frames recompute either way since the
    # cache is released before return.
    results, lineage = run_extraction(transcripts, salt=salt,
                                      persist=bool(output_path and
                                                   lineage_path),
                                      max_payload_chars=max_payload_chars,
                                      schema=schema,
                                      redact_fields=redact_fields)
    if drop_confidence:
        dropped = results.drop("confidence_scores", "low_confidence_fields")
        _share_extraction_cache(dropped, results)
        results = dropped
    ordered = with_stable_order(results)
    lineage = lineage.select(
        sf.lit(run_id).alias("run_id"),
        sf.lit(snapshot_id).alias("snapshot_id"),
        "partition_id", "row_count", "success_count", "partial_count",
        "failed_count", "error_count", "wall_clock_ms",
        *(["redaction_residuals"] if redact_fields is not None else []),
    )
    if output_path:
        try:
            ordered.write.mode("overwrite").parquet(output_path)
            if lineage_path:
                # Lineage is tiny — one row per task — single file.
                lineage.coalesce(1).write.mode("append").parquet(lineage_path)
        finally:
            unpersist_extraction(results)
    return ordered, lineage


def run_multi_extraction(transcripts: DataFrame, salt: int = 8,
                         target_partitions: int | None = None) -> DataFrame:
    """FR-015 flatMap form: one output row per detected document segment
    (reference: ``extract_document(multi_document=True)``, extraction.py:
    102-119). Same salted-shuffle discipline as the 1:1 kernel."""
    spark = transcripts.sparkSession
    n = target_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    salted = transcripts.repartition(
        n, sf.col("conv_id"), sf.pmod(sf.col("turn_idx"), sf.lit(salt)))

    def run(batches):
        for batch in batches:
            if len(batch):
                yield extract_documents_batch(batch)

    return salted.mapInPandas(run, schema=MULTIDOC_SCHEMA_DDL)


# ---------------------------------------------------------------------------
# Sinks (reference: cli/batch.py:192-216 — JSON array, JSONL, errors channel)
# ---------------------------------------------------------------------------

RESULT_JSON_COLUMNS = [
    "conv_id", "turn_idx", "payload_kind", "extracted_text", "fields",
    "confidence_scores", "low_confidence_fields", "n_fields", "status",
]


def result_json_column(results: DataFrame) -> DataFrame:
    """One deterministic JSON document per turn: ``to_json(struct(...))``
    with an explicit column order (golden-equality needs stable field order —
    SURVEY.md §2.1 S6; Spark's JSON writer is line-delimited natively = S7)."""
    cols = [c for c in RESULT_JSON_COLUMNS if c in results.columns]
    return results.select(
        "conv_id", "turn_idx",
        sf.to_json(sf.struct(*cols)).alias("result_json"))


def write_json_sinks(results: DataFrame, output_dir: str) -> None:
    """JSONL results + quarantine channel, split by status (cli/batch.py:
    169-174,184-207): good rows to ``results/``, error rows to ``errors/``.

    The split is two actions over one upstream plan — persist the ordered
    frame (DISK_ONLY, heap-bounded) so the kernel and the range shuffle run
    once, not twice (the same dual-consumer rule run_pipeline documents)."""
    from pyspark import StorageLevel

    ordered = with_stable_order(results).persist(StorageLevel.DISK_ONLY)
    try:
        good = ordered.filter(sf.col("status") != "error")
        bad = ordered.filter(sf.col("status") == "error")
        result_json_column(good).write.mode("overwrite").json(
            f"{output_dir}/results")
        result_json_column(bad).write.mode("overwrite").json(
            f"{output_dir}/errors")
    finally:
        ordered.unpersist()


# ---------------------------------------------------------------------------
# Payload classification (reference: services/classification.py:44-120) —
# kind + confidence + alternatives, as pure column expressions.
# ---------------------------------------------------------------------------

PAYLOAD_KINDS = ("html", "pdf", "prose")
CLASSIFY_CONFIDENCE = 0.97  # deterministic stand-in for the model score


def with_classification(results: DataFrame) -> DataFrame:
    """Attach classification confidence + alternatives: residual probability
    spread uniformly over the other kinds (classification.py:92-99, F24).

    Error rows (``payload_kind='unknown'`` — not a member of PAYLOAD_KINDS)
    get confidence 0.0 and NO alternatives: without the guard the ``k !=
    payload_kind`` filter kept all three kinds and the row carried >1 total
    probability mass, handing the failure channel a confident classification.
    """
    residual = (1.0 - CLASSIFY_CONFIDENCE) / (len(PAYLOAD_KINDS) - 1)
    known = sf.col("payload_kind").isin(*PAYLOAD_KINDS)
    others = sf.filter(
        sf.array(*[sf.lit(k) for k in PAYLOAD_KINDS]),
        lambda k: k != sf.col("payload_kind"))
    alternatives = sf.transform(
        others,
        lambda k: sf.struct(k.alias("kind"),
                            sf.round(sf.lit(residual), 6).alias("confidence")))
    empty = sf.array().cast(
        "array<struct<kind:string,confidence:double>>")
    return results.withColumns({
        "classify_confidence": sf.when(known, sf.lit(CLASSIFY_CONFIDENCE))
                                 .otherwise(sf.lit(0.0)),
        "classify_alternatives": sf.when(known, alternatives).otherwise(empty),
    })


# ---------------------------------------------------------------------------
# Flagship-query entry used by __spark_entry__.py: synthesize transcripts from
# the driver-provided testdata (documents table → deterministic payload
# wrapping) and run the full extraction pipeline over them.
# ---------------------------------------------------------------------------

def transcripts_from_documents(spark: SparkSession, sf_dir: str, n_convs: int = 64) -> DataFrame:
    """Deterministically wrap /root/testdata documents into the transcript
    shape: conv_id from a hash bucket of doc_id, payload text decorated with
    HTML/PDF/field markup by doc_id residue. Pure column expressions."""
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    h = sf.xxhash64("doc_id").bitwiseAND(sf.lit(0x7FFFFFFFFFFFFFFF))
    cpf_digits = sf.lpad((h % 99999999999).cast("string"), 11, "0")
    cpf = sf.concat_ws(
        "", sf.substring(cpf_digits, 1, 3), sf.lit("."),
        sf.substring(cpf_digits, 4, 3), sf.lit("."),
        sf.substring(cpf_digits, 7, 3), sf.lit("-"), sf.substring(cpf_digits, 10, 2),
    )
    date_str = sf.format_string(
        "%02d/%02d/%04d", (h % 28 + 1).cast("int"), (h % 12 + 1).cast("int"),
        (h % 50 + 1975).cast("int"),
    )
    decorated = sf.concat_ws(" ", sf.col("text"), sf.lit("CPF"), cpf,
                             sf.lit("data"), date_str)
    html = sf.concat(
        sf.lit('<html><body><nav><a href="/">Home</a></nav><div id="main"><p>'),
        decorated,
        sf.lit('</p></div><footer><p>Copyright 2026.</p></footer></body></html>'),
    )
    pdf = sf.concat(sf.lit("[72,100,372,112] "), sf.col("text"),
                    sf.lit("\n[72,120,372,132] "), decorated)
    multidoc = sf.concat(decorated, sf.lit("\n---\n"), sf.lit("CNPJ "),
                         sf.lit("12.345.678/0001-90 valor R$ 99,90"))
    kind = h % 5
    payload = (
        sf.when(kind == 0, html)
          .when(kind == 1, pdf)
          .when(kind == 2, decorated)
          .when(kind == 3, multidoc)
          .otherwise(sf.col("text"))
    )
    base = docs.select(
        sf.format_string("conv-%05d", (h % n_convs).cast("int")).alias("conv_id"),
        sf.col("doc_id"),
        payload.alias("text"),
        sf.element_at(
            sf.array(sf.lit("user"), sf.lit("assistant"), sf.lit("system"), sf.lit("tool")),
            (h % 4 + 1).cast("int"),
        ).alias("role"),
        sf.when(h % 4 == 3, sf.lit("browser")).otherwise(sf.lit("")).alias("tool"),
        (sf.to_timestamp(sf.lit("2026-01-01 00:00:00"))
         + sf.make_interval(secs=(h % 86400).cast("double"))).alias("ts"),
    )
    w = Window.partitionBy("conv_id").orderBy("doc_id")
    return base.withColumn("turn_idx", (sf.row_number().over(w) - 1).cast("int")).select(
        *TRANSCRIPT_COLUMNS
    )


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full extraction pipeline over testdata-derived transcripts, summarized
    per (status, payload_kind) — the driver's smoke target."""
    transcripts = transcripts_from_documents(spark, sf_dir)
    results, _ = run_extraction(transcripts, salt=4)
    return (
        results.groupBy("status", "payload_kind")
        .agg(
            sf.count("*").alias("n_turns"),
            sf.sum("n_fields").alias("total_fields"),
            # rounded so the golden-fixture DuckDB oracle compares stably
            sf.round(sf.avg(sf.length("extracted_text")), 6)
            .alias("avg_extracted_chars"),
        )
        .orderBy("status", "payload_kind")
    )


def compact_parquet(spark: SparkSession, input_path: str, output_path: str,
                    target_file_mb: int = 512,
                    sort_cols: tuple[str, ...] = (),
                    small_file_ratio: float = 0.75) -> dict:
    """Small-file compaction — the Iceberg ``rewrite_data_files`` analog
    for this repo's parquet layout.

    A long-running ingestion (streaming triggers, many resume snapshots,
    per-bucket writes) accretes small files; at cluster scale the next
    reader then pays one task + one open per sliver. This is SELECTIVE,
    exactly like ``rewrite_data_files``'s bin-pack strategy (VERDICT r03
    #1): only files smaller than ``small_file_ratio × target_file_mb``
    (Iceberg's MIN_FILE_SIZE default is the same 75% shape) are read and
    rewritten — into ``ceil(small bytes / target)`` outputs via
    ``repartition(n)`` (``coalesce`` would collapse the READ parallelism of
    the very scan doing the rewrite) — while well-sized files are COPIED
    through byte-identical, never re-shuffled: at 100 TB, fixing a few
    thousand streaming slivers costs the sliver bytes plus a copy, not a
    full-table shuffle. ``sort_cols`` re-sorts within rewritten output
    files (``sortWithinPartitions``) to restore read locality, e.g.
    ``("conv_id", "turn_idx")`` for extraction output — passthrough files
    keep their existing order.

    Hive-partitioned layouts (``bucket=3/part-...parquet`` — what
    :func:`run_resumable` and partitioned sinks produce) are preserved:
    pass-through copies keep their partition subpath, and the rewrite reads
    with ``basePath`` + writes with ``partitionBy`` so partition columns
    survive both as columns and as directory layout; rewritten rows are
    co-located by partition value (one bin-packed file per value per
    output task — a single partition value larger than the target is not
    split further).

    Writes to ``output_path`` (caller swaps directories when compacting in
    place — same contract as Iceberg's rewrite-then-commit); compacting
    directly onto the input raises — Spark's overwrite would delete the
    source while the rewriting scan reads it. Returns ``{files_before,
    files_after, bytes, rows, rewritten_files, rewritten_bytes,
    copied_files}``.

    File listing/sizing goes through the Hadoop FileSystem API so any URI
    scheme the cluster can read (``hdfs://``, ``s3a://``, local) sizes
    correctly — a driver-side ``os.walk`` would silently see zero bytes
    for a remote table and collapse it to one output file.
    """
    import math

    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()

    def _hpath(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    def _qualified(p: str):
        """Fully-qualified Hadoop path: resolves scheme variants
        (``file:/x`` vs ``/x``) and relative paths against the SAME
        FileSystem the listing uses — Python ``abspath`` would mangle
        ``file:/...`` spellings and resolve relative paths against the
        Python cwd instead of the JVM's (review r04)."""
        hp = _hpath(p)
        return hp.getFileSystem(conf).makeQualified(hp)

    in_q = _qualified(input_path)
    in_qs = str(in_q)
    out_qs = str(_qualified(output_path))
    # ancestor check BOTH ways, not bare equality: an input nested under
    # output_path ('/t/raw' → '/t') is recursively DELETED by the
    # mode('overwrite') before/while the rewrite scans it — silent source
    # data loss; an output nested under input would be listed as its own
    # input on a re-run (review r05)
    if (in_qs == out_qs or in_qs.startswith(out_qs.rstrip("/") + "/")
            or out_qs.startswith(in_qs.rstrip("/") + "/")):
        raise ValueError(
            "compact_parquet: output_path equals or nests with input_path "
            f"({in_qs} vs {out_qs}) — the overwrite would delete the source "
            "mid-scan; write to a sibling directory and swap "
            "(rewrite-then-commit)")

    def _parquet_files(path: str) -> list[tuple[str, int]]:
        hpath = _hpath(path)
        fs = hpath.getFileSystem(conf)
        it = fs.listFiles(hpath, True)
        out = []
        while it.hasNext():
            status = it.next()
            if status.getPath().getName().endswith(".parquet"):
                out.append((status.getPath().toString(), status.getLen()))
        return out

    listing = _parquet_files(input_path)
    if not listing:
        # zero parquet files: reading the (empty) output back for the rows
        # count would fail parquet schema inference with AnalysisException —
        # return empty stats instead (ADVICE r04). Still CREATE output_path
        # (like every non-empty branch does): rewrite-then-swap callers
        # rename/list it unconditionally, and a missing directory would
        # fail them only on the empty-table edge (review r05)
        out_hp = _hpath(output_path)
        out_hp.getFileSystem(conf).mkdirs(out_hp)
        return {"files_before": 0, "files_after": 0, "bytes": 0,
                "rewritten_files": 0, "rewritten_bytes": 0,
                "copied_files": 0, "rows": 0}
    bytes_total = sum(s for _, s in listing)
    threshold = int(small_file_ratio * target_file_mb * 1024 * 1024)
    small = [(p, s) for p, s in listing if s < threshold]
    large = [(p, s) for p, s in listing if s >= threshold]
    small_bytes = sum(s for _, s in small)

    # Hive-partitioned layouts (bucket=3/part-...parquet — exactly what
    # run_resumable and partitioned sinks produce) need two extra contracts:
    # pass-through copies must keep their partition SUBPATH (same-named part
    # files from different partition dirs would otherwise overwrite each
    # other in the output root), and the rewrite must read with basePath +
    # write with partitionBy so the partition columns survive as columns
    # and as directory layout.
    in_root = in_q.toUri().getPath().rstrip("/") + "/"

    def _rel(p: str) -> str:
        # scheme/authority-free path component (listed files come back with
        # a scheme — file:/... — even when the input path had none)
        sp = _hpath(p).toUri().getPath()
        if not sp.startswith(in_root):
            raise ValueError(
                f"compact_parquet: listed file {p} is not under {input_path}")
        return sp[len(in_root):]

    def _part_keys(rel: str) -> tuple[str, ...]:
        return tuple(seg.split("=", 1)[0] for seg in rel.split("/")[:-1]
                     if "=" in seg)

    key_sets = {_part_keys(_rel(p)) for p, _ in listing}
    if len(key_sets) > 1:
        raise ValueError(
            f"compact_parquet: inconsistent partition layouts under "
            f"{input_path}: {sorted(key_sets)} — compact one consistent "
            f"table at a time")
    part_keys = next(iter(key_sets)) if key_sets else ()

    out_fs = _hpath(output_path).getFileSystem(conf)
    if small:
        n_files = max(1, math.ceil(small_bytes
                                   / (target_file_mb * 1024 * 1024)))
        reader = spark.read
        if part_keys:
            reader = reader.option("basePath", input_path)
        df = reader.parquet(*[p for p, _ in small])
        if part_keys:
            # keep whole partition values together so partitionBy writes
            # ceil-bin-packed files per partition dir instead of n x values
            out = df.repartition(n_files, *part_keys)
        else:
            out = df.repartition(n_files)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        writer = out.write.mode("overwrite")
        if part_keys:
            writer = writer.partitionBy(*part_keys)
        writer.parquet(output_path)
    else:
        out_fs.mkdirs(_hpath(output_path))
    # pass well-sized files through untouched: byte-for-byte FileSystem copy,
    # no scan, no shuffle — preserving each file's partition subpath (source
    # part-file names are uuid-unique only WITHIN a directory)
    FileUtil = jvm.org.apache.hadoop.fs.FileUtil
    for p, _ in large:
        src = _hpath(p)
        dst = _hpath(f"{output_path}/{_rel(p)}")
        out_fs.mkdirs(dst.getParent())
        FileUtil.copy(src.getFileSystem(conf), src, out_fs, dst, False, conf)
    files_after = len(_parquet_files(output_path))
    return {"files_before": len(listing), "files_after": files_after,
            "bytes": bytes_total,
            "rewritten_files": len(small), "rewritten_bytes": small_bytes,
            "copied_files": len(large),
            "rows": spark.read.parquet(output_path).count()}
