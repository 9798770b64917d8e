"""Integration: the Spark job must equal the single-threaded pandas oracle
per turn, byte for byte, under stable (conv_id, turn_idx) ordering — the
north-rule correctness gate."""

from __future__ import annotations

import pandas as pd
import pytest

from br_doc_ocr_spark.core.extract import OUTPUT_COLUMNS, oracle_extract
from br_doc_ocr_spark import pipeline


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for comparison: stable order, plain-python cells."""
    out = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    out["fields"] = out["fields"].apply(lambda m: sorted(dict(m).items()))
    out["spans"] = out["spans"].apply(
        lambda xs: [(d["field"], d["start"], d["end"]) for d in xs]
    )
    out["confidence_scores"] = out["confidence_scores"].apply(
        lambda m: sorted(dict(m).items())
    )
    out["low_confidence_fields"] = out["low_confidence_fields"].apply(list)
    out["ts"] = pd.to_datetime(out["ts"]).dt.tz_localize(None)
    out["n_fields"] = out["n_fields"].astype(int)
    out["turn_idx"] = out["turn_idx"].astype(int)
    return out[OUTPUT_COLUMNS]


@pytest.fixture(scope="module")
def spark_result(spark, tiny_transcripts_path, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("out")
    ordered, lineage = pipeline.run_pipeline(
        spark, tiny_transcripts_path,
        output_path=str(out_dir / "extractions.parquet"),
        lineage_path=str(out_dir / "lineage.parquet"),
        salt=8,
    )
    written = spark.read.parquet(str(out_dir / "extractions.parquet"))
    return written.toPandas(), lineage.toPandas()


def test_spark_matches_oracle_per_turn(spark_result, tiny_transcripts):
    """Per-turn equality: every column, every row, after stable ordering."""
    got, _ = spark_result
    expected = oracle_extract(tiny_transcripts)
    got_n = _normalize(got)
    exp_n = _normalize(expected)
    assert len(got_n) == len(exp_n)
    pd.testing.assert_frame_equal(got_n, exp_n, check_dtype=False)


def test_extracted_text_strips_boilerplate(spark_result):
    got, _ = spark_result
    html_rows = got[got["payload_kind"] == "html"]
    assert len(html_rows) > 0
    joined = "\n".join(html_rows["extracted_text"])
    assert "newsletter" not in joined
    assert "Copyright" not in joined
    assert "Home" not in joined


def test_statuses_cover_all_classes(spark_result):
    got, _ = spark_result
    statuses = set(got["status"])
    # prose-only rows → failed (no fields); invalid-field rows → partial.
    assert {"success", "failed"} <= statuses
    assert "partial" in statuses
    assert "error" not in statuses  # no kernel crashes on synthetic data


def test_skewed_conversation_spreads_across_partitions(spark, tiny_transcripts_path):
    """Salting must break conv-heavy across >1 task (SURVEY.md §4.3)."""
    from pyspark.sql import functions as sf

    transcripts = pipeline.read_transcripts(spark, tiny_transcripts_path)
    results, lineage = pipeline.run_extraction(transcripts, salt=8)
    parts = (
        results.withColumn("pid", sf.spark_partition_id())
        .filter(sf.col("conv_id") == "conv-heavy")
        .select("pid").distinct().count()
    )
    assert parts > 1


def test_lineage_counts_reconcile(spark_result, tiny_transcripts):
    got, lineage = spark_result
    assert lineage["row_count"].sum() == len(tiny_transcripts)
    for status, col in [("success", "success_count"), ("partial", "partial_count"),
                        ("failed", "failed_count")]:
        assert lineage[col].sum() == (got["status"] == status).sum()
    # PII-free by schema: only ids, counts, timings.
    assert set(lineage.columns) == {
        "run_id", "snapshot_id", "partition_id", "row_count", "success_count",
        "partial_count", "failed_count", "error_count", "wall_clock_ms",
    }


def test_output_is_stably_ordered_within_files(spark_result):
    got, _ = spark_result
    # The written parquet, read back in file order, must already be sorted
    # within each (conv_id) run — global sort by range partitioning.
    heavy = got[got["conv_id"] == "conv-heavy"]["turn_idx"].tolist()
    assert heavy == sorted(heavy)


def test_flagship_query_runs_on_testdata(spark):
    from tests.conftest import SF_DIR

    out = pipeline.flagship_query(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) > 0
    assert {"status", "payload_kind", "n_turns", "total_fields",
            "avg_extracted_chars"} == set(out.columns)
    assert sum(r["n_turns"] for r in rows) == 500  # all sf0.001 documents


def test_max_payload_chars_caps_before_kernel(spark, tiny_transcripts,
                                              tmp_path_factory):
    """The pre-kernel substring cap (downscale-before-inference analog,
    preprocessing.py:66-96): oversized payloads are bounded, short payloads
    and row counts are untouched, and the capped run equals the oracle run
    on the capped input (the cap is a plain input transform, not a semantic
    fork in the kernel)."""
    cap = 80
    big = tiny_transcripts.copy()
    big.loc[big.index[0], "text"] = "x" * 10_000 + " CPF 123.456.789-00"
    big["ts"] = big["ts"].astype("datetime64[us]")  # Spark rejects NANOS
    path = str(tmp_path_factory.mktemp("cap") / "t.parquet")
    big.to_parquet(path, index=False)

    results, _ = pipeline.run_extraction(
        pipeline.read_transcripts(spark, path), salt=8, max_payload_chars=cap)
    got = _normalize(results.toPandas())

    capped_input = big.copy()
    capped_input["text"] = capped_input["text"].str.slice(0, cap)
    expected = _normalize(oracle_extract(capped_input))

    assert len(got) == len(big)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    # the oversized row's extraction saw only `cap` chars → the CPF beyond
    # the cap is not extracted
    row = got[got["conv_id"] == big.iloc[0]["conv_id"]]
    row = row[row["turn_idx"] == big.iloc[0]["turn_idx"]].iloc[0]
    assert "cpf" not in dict(row["fields"])


def test_results_invariant_to_parallelism_and_salt(spark, tiny_transcripts_path):
    """SCALE.md: nothing in the job is order- or partition-count-dependent.
    The same input must produce identical rows at any target_partitions and
    any salt (both only steer the shuffle layout)."""
    frames = []
    for parts, salt in [(2, 1), (16, 8), (5, 13)]:
        results, _ = pipeline.run_extraction(
            pipeline.read_transcripts(spark, tiny_transcripts_path),
            salt=salt, target_partitions=parts)
        frames.append(_normalize(results.toPandas()))
    pd.testing.assert_frame_equal(frames[0], frames[1], check_dtype=False)
    pd.testing.assert_frame_equal(frames[0], frames[2], check_dtype=False)


def test_redact_fields_appends_masked_column(spark, tiny_transcripts_path):
    """PII scrubbing end-to-end: redacted_text equals the kernel's
    redact_text over the raw payload + detected spans for every row, no
    masked identifier survives, and the base columns are byte-identical to
    the non-redacting run."""
    from br_doc_ocr_spark.core.extract import (
        DEFAULT_REDACT_FIELDS, redact_text)

    results, _ = pipeline.run_extraction(
        pipeline.read_transcripts(spark, tiny_transcripts_path),
        salt=8, redact_fields=DEFAULT_REDACT_FIELDS)
    got = results.toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert "redacted_text" in got.columns

    raw = pd.read_parquet(tiny_transcripts_path).sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(got) == len(raw)
    n_masked = 0
    for i in range(len(got)):
        spans = [dict(d) for d in got.loc[i, "spans"]]
        expect = redact_text(raw.loc[i, "text"], spans,
                             DEFAULT_REDACT_FIELDS)
        assert got.loc[i, "redacted_text"] == expect
        red = got.loc[i, "redacted_text"] or ""
        for f in DEFAULT_REDACT_FIELDS:
            for d in spans:
                if d["field"] == f:
                    n_masked += 1
                    val = raw.loc[i, "text"][d["start"]:d["end"]]
                    assert val not in red or val in f"[{f.upper()}]"
    assert n_masked > 0  # the fixture must actually exercise masking

    plain, _ = pipeline.run_extraction(
        pipeline.read_transcripts(spark, tiny_transcripts_path), salt=8)
    a = _normalize(got[OUTPUT_COLUMNS])
    b = _normalize(plain.toPandas())
    pd.testing.assert_frame_equal(a, b)


def test_read_transcripts_iceberg_seam(spark, tiny_transcripts_path):
    """The Iceberg reader path is wired (DataSourceV2 load + snapshot-id
    option) and fails with a jar-naming error in this runtime-less sandbox;
    unknown formats are rejected outright."""
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        pipeline.read_transcripts(spark, tiny_transcripts_path,
                                  table_format="iceberg", snapshot_id=7)
    with pytest.raises(ValueError, match="unsupported table_format"):
        pipeline.read_transcripts(spark, tiny_transcripts_path,
                                  table_format="orc")
    # pinning a snapshot on plain parquet must be loud, not a silent
    # read-of-current-data
    with pytest.raises(ValueError, match="requires table_format='iceberg'"):
        pipeline.read_transcripts(spark, tiny_transcripts_path,
                                  snapshot_id=7)
    # default path unchanged
    assert pipeline.read_transcripts(
        spark, tiny_transcripts_path).columns == pipeline.TRANSCRIPT_COLUMNS


def test_compact_parquet_rewrites_small_files(spark, tmp_path):
    """Compaction collapses a many-small-file table to the byte-targeted
    file count with identical content; sort_cols restores within-file
    order."""
    import pandas as pd

    src = str(tmp_path / "sliver")
    df = spark.range(20_000).selectExpr(
        "cast(id % 50 as string) AS conv_id",
        "cast(id as int) AS turn_idx",
        "repeat('x', 100) AS text")
    df.repartition(64).write.parquet(src)  # 64 sliver files

    out = str(tmp_path / "compacted")
    stats = pipeline.compact_parquet(spark, src, out, target_file_mb=512,
                                     sort_cols=("conv_id", "turn_idx"))
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1       # everything fits one 512MB target
    assert stats["rows"] == 20_000

    a = spark.read.parquet(src).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    b = spark.read.parquet(out).toPandas().sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # within-file sort applied: reading back preserves the sorted runs
    first_file = spark.read.parquet(out).toPandas()
    runs = first_file.groupby("conv_id")["turn_idx"].apply(
        lambda s: (s.diff().dropna() > 0).all())
    assert runs.all()


def test_compact_parquet_honors_target_file_size(spark, tmp_path):
    """A table larger than one target unit splits into ceil(bytes/target)
    files, not one mega-file."""
    src = str(tmp_path / "big")
    spark.range(40_000).selectExpr(
        "cast(id as string) AS k",
        # incompressible-ish payload so on-disk size stays > 2 MB
        "sha2(cast(id as string), 256) AS a",
        "sha2(cast(id + 1 as string), 256) AS b",
        "repeat(sha2(cast(id as string), 512), 4) AS c",
    ).repartition(32).write.parquet(src)

    out = str(tmp_path / "sized")
    stats = pipeline.compact_parquet(spark, src, out, target_file_mb=1)
    import math
    import os
    # expectation measured INDEPENDENTLY of the implementation's own
    # listing, so a byte-counting bug cannot cancel out of the assertion
    measured = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(src) for f in fs if f.endswith(".parquet"))
    expected = math.ceil(measured / (1024 * 1024))
    assert measured > 2 * 1024 * 1024  # premise: input spans >2 units
    assert stats["bytes"] == measured
    assert stats["files_after"] == expected > 1
    assert stats["rows"] == 40_000


def test_compact_parquet_is_selective(spark, tmp_path):
    """rewrite_data_files semantics (VERDICT r03 #1): only files below
    small_file_ratio × target are rewritten; well-sized files pass through
    BYTE-IDENTICAL (copied, never re-shuffled), and content survives."""
    import hashlib
    import os

    src = str(tmp_path / "mixed")
    # two well-sized (~>0.75 MB at target 1 MB) incompressible files
    big = spark.range(14_000).selectExpr(
        "cast(id as string) AS k",
        "repeat(sha2(cast(id as string), 512), 4) AS c")
    big.repartition(2).write.parquet(src)
    # plus 40 sliver files of the same schema
    sliver = spark.range(14_000, 15_000).selectExpr(
        "cast(id as string) AS k",
        "repeat(sha2(cast(id as string), 512), 4) AS c")
    sliver.repartition(40).write.mode("append").parquet(src)

    def listing(path):
        return {f: os.path.getsize(os.path.join(r, f))
                for r, _d, fs in os.walk(path)
                for f in fs if f.endswith(".parquet")}

    before = listing(src)
    threshold = int(0.75 * 1024 * 1024)
    large_names = {f for f, s in before.items() if s >= threshold}
    assert len(large_names) == 2  # premise: the two big files clear the bar

    out = str(tmp_path / "selective")
    stats = pipeline.compact_parquet(spark, src, out, target_file_mb=1)
    assert stats["copied_files"] == 2
    assert stats["rewritten_files"] == len(before) - 2
    assert stats["rows"] == 15_000

    after = listing(out)
    # the large files appear under their ORIGINAL names with identical bytes
    for name in large_names:
        assert name in after
        h = lambda p: hashlib.md5(open(p, "rb").read()).hexdigest()  # noqa: E731
        src_file = next(os.path.join(r, f) for r, _d, fs in os.walk(src)
                        for f in fs if f == name)
        out_file = next(os.path.join(r, f) for r, _d, fs in os.walk(out)
                        for f in fs if f == name)
        assert h(src_file) == h(out_file)
    # slivers collapsed: total output files = 2 passthrough + ceil(small/target)
    import math
    small_bytes = sum(s for f, s in before.items() if f not in large_names)
    assert stats["files_after"] == 2 + math.ceil(small_bytes / (1024 * 1024))

    a = spark.read.parquet(src).toPandas().sort_values("k").reset_index(drop=True)
    b = spark.read.parquet(out).toPandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_compact_parquet_preserves_hive_partitions(spark, tmp_path):
    """Partitioned layout (review r04 finding): same-named part files from
    different partition dirs must not collide in the output, partition
    columns must survive the rewrite, and the output must stay readable as
    the same partitioned table."""
    import os

    src = str(tmp_path / "parted")
    spark.range(2000).selectExpr(
        "id", "cast(id % 3 AS int) AS bucket",
        "sha2(cast(id as string), 256) AS c"
    ).write.partitionBy("bucket").parquet(src)

    # all slivers: everything is rewritten; partition columns must survive
    out1 = str(tmp_path / "parted_rewrite")
    stats = pipeline.compact_parquet(spark, src, out1, target_file_mb=1)
    got = spark.read.parquet(out1)
    assert got.count() == 2000
    assert set(got.columns) == {"id", "bucket", "c"}
    assert sorted(r["bucket"] for r in got.select("bucket").distinct().collect()) \
        == [0, 1, 2]
    # layout preserved: output files live under bucket=N dirs
    dirs = {os.path.basename(r) for r, _d, fs in os.walk(out1)
            if any(f.endswith(".parquet") for f in fs)}
    assert dirs == {"bucket=0", "bucket=1", "bucket=2"}
    assert stats["rows"] == 2000

    # all pass-through (ratio 0): copies keep their partition subpath, so
    # identical basenames across partition dirs cannot clobber each other
    out2 = str(tmp_path / "parted_copy")
    stats2 = pipeline.compact_parquet(spark, src, out2, target_file_mb=1,
                                      small_file_ratio=0.0)
    assert stats2["rewritten_files"] == 0
    assert spark.read.parquet(out2).count() == 2000
    a = spark.read.parquet(src).toPandas().sort_values("id").reset_index(drop=True)
    b = spark.read.parquet(out2).toPandas().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_compact_parquet_refuses_in_place(spark, tmp_path):
    """output == input would make Spark's overwrite delete the source
    mid-scan — must raise, including on trailing-slash spellings."""
    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="equals or nests with input_path"):
        pipeline.compact_parquet(spark, src, src)
    with pytest.raises(ValueError, match="equals or nests with input_path"):
        pipeline.compact_parquet(spark, src, src + "/")


def test_compact_parquet_refuses_nested_paths(spark, tmp_path):
    """An input nested UNDER the output ('/t/raw' -> '/t') is recursively
    deleted by the overwrite before the rewrite scans it — silent source
    data loss; the reverse nesting lists the output as its own input on a
    re-run. Both must raise (review r05 — equality alone missed them)."""
    src = str(tmp_path / "t" / "raw")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="equals or nests with input_path"):
        pipeline.compact_parquet(spark, src, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="equals or nests with input_path"):
        pipeline.compact_parquet(spark, str(tmp_path / "t"),
                                 str(tmp_path / "t" / "compacted"))


def test_run_pipeline_rejects_lineage_without_output(spark,
                                                     tiny_transcripts_path):
    """lineage_path without output_path was silently ignored (the lineage
    write nests under the output write) — must raise (review r05)."""
    with pytest.raises(ValueError, match="lineage_path requires output_path"):
        pipeline.run_pipeline(spark, tiny_transcripts_path,
                              lineage_path="/tmp/never-written")


def test_compact_parquet_empty_input_returns_empty_stats(spark, tmp_path):
    """Zero parquet files under the input must return zeroed stats, not die
    in schema inference reading the empty output back (ADVICE r04)."""
    src = tmp_path / "empty"
    src.mkdir()
    (src / "_SUCCESS").touch()  # marker files don't count as parquet
    stats = pipeline.compact_parquet(spark, str(src), str(tmp_path / "out"))
    assert stats == {"files_before": 0, "files_after": 0, "bytes": 0,
                     "rewritten_files": 0, "rewritten_bytes": 0,
                     "copied_files": 0, "rows": 0}
    # rewrite-then-swap callers rename/list the output unconditionally —
    # the empty-table edge must still create it (review r05)
    assert (tmp_path / "out").is_dir()


def _iceberg_available(spark) -> bool:
    """True iff an iceberg-spark-runtime jar is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_reader_contract(spark, tiny_transcripts, tmp_path):
    """VERDICT r03 #8: exercises read_transcripts(table_format='iceberg')
    against a real Iceberg table INCLUDING snapshot time travel — skipped
    where the runtime jar is absent (this sandbox), runnable as-is on a
    jar-equipped cluster (spark-submit --packages org.apache.iceberg:
    iceberg-spark-runtime-...; see README 'Iceberg input')."""
    if not _iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath "
                    "(expected in this sandbox; error seam tested in "
                    "test_read_transcripts_iceberg_seam)")
    warehouse = str(tmp_path / "warehouse")
    spark.conf.set("spark.sql.catalog.graft_it",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_it.warehouse", warehouse)
    table = "graft_it.db.transcripts"

    full = spark.createDataFrame(tiny_transcripts)
    half = full.limit(full.count() // 2)
    half.writeTo(table).create()                      # snapshot 1
    snap1 = spark.sql(
        f"SELECT snapshot_id FROM {table}.snapshots "
        "ORDER BY committed_at").first()[0]
    full.subtract(half).writeTo(table).append()       # snapshot 2

    current = pipeline.read_transcripts(spark, table,
                                        table_format="iceberg")
    assert current.columns == pipeline.TRANSCRIPT_COLUMNS
    assert current.count() == full.count()
    pinned = pipeline.read_transcripts(spark, table, table_format="iceberg",
                                       snapshot_id=int(snap1))
    assert pinned.count() == half.count()             # time travel honored
    # and the extraction pipeline runs unchanged over the Iceberg scan
    results, _ = pipeline.run_extraction(pinned, salt=4)
    assert results.count() == half.count()


def test_extraction_cache_registry(spark, tiny_transcripts_path):
    """unpersist_extraction releases the persisted kernel output via the
    side registry (no attribute stashed on the DataFrame instance), and an
    abandoned results frame does not pin its registry entry (weak keys)."""
    import gc
    import weakref

    transcripts = pipeline.read_transcripts(spark, tiny_transcripts_path)
    results, _ = pipeline.run_extraction(transcripts, persist=True)
    assert not hasattr(results, "_extraction_cache")
    cache = pipeline._EXTRACTION_CACHES[results]
    assert cache.is_cached
    pipeline.unpersist_extraction(results)
    assert results not in pipeline._EXTRACTION_CACHES
    assert not cache.is_cached

    # drop_confidence derives a new frame; the registry entry must follow it
    results2, _ = pipeline.run_extraction(transcripts, persist=True)
    derived = results2.drop("confidence_scores", "low_confidence_fields")
    pipeline._share_extraction_cache(derived, results2)
    assert pipeline._EXTRACTION_CACHES[derived] is pipeline._EXTRACTION_CACHES[results2]
    pipeline.unpersist_extraction(derived)
    pipeline.unpersist_extraction(results2)  # pop the source frame's entry too

    # weak keys: losing the last reference clears the entry
    results3, _ = pipeline.run_extraction(transcripts, persist=True)
    ref = weakref.ref(results3)
    cache3 = pipeline._EXTRACTION_CACHES[results3]
    del results3
    gc.collect()
    assert ref() is None
    assert len(list(pipeline._EXTRACTION_CACHES.keys())) == 0
    cache3.unpersist()


def test_compact_parquet_accepts_hadoop_uri_spellings(spark, tmp_path):
    """file:/x (Hadoop's own toString spelling), file:///x and plain /x must
    all compact and all trip the in-place guard against each other."""
    src = str(tmp_path / "u")
    spark.range(100).write.parquet(src)
    out = str(tmp_path / "u_out")
    stats = pipeline.compact_parquet(spark, f"file:{src}", out,
                                     target_file_mb=1)
    assert stats["rows"] == 100
    for spelling in (src, f"file:{src}", f"file://{src}"):
        with pytest.raises(ValueError, match="equals or nests with input_path"):
            pipeline.compact_parquet(spark, src, spelling)
