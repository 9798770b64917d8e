"""Physical-plan quality gates: these assert the *plan shape* the 100 TB
design depends on — filter/projection pushdown to the parquet scan, broadcast
joins for small dims, exactly one Arrow crossing in the extraction stage, and
partial top-k instead of a global sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as sf

from br_doc_ocr_spark import pipeline
from br_doc_ocr_spark.queries import REGISTRY
from tests.conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_projection_and_filter_pushed_to_scan(spark):
    df = REGISTRY["projection_pushdown"].fn(spark, SF_DIR)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThanOrEqual(l_quantity,45" in plan
    # only the two projected columns are read from parquet
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_extendedprice" not in read_schema


def test_extraction_has_single_arrow_crossing_and_shuffle(spark,
                                                          tiny_transcripts_path):
    import re

    df = pipeline.read_transcripts(spark, tiny_transcripts_path)
    results, _ = pipeline.run_extraction(df, salt=4)
    plan = plan_of(results)
    # exactly one Arrow crossing and one (salted) exchange before it
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "pmod(turn_idx" in plan  # the salt key is part of the partitioning

    # redaction rides the SAME single crossing — no extra stage, no extra
    # shuffle, just one more output column from the kernel
    from br_doc_ocr_spark.core.extract import DEFAULT_REDACT_FIELDS

    red, _ = pipeline.run_extraction(df, salt=4,
                                     redact_fields=DEFAULT_REDACT_FIELDS)
    rplan = plan_of(red)
    assert len(re.findall(r"\(\d+\) MapInPandas", rplan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", rplan)) == 1
    assert "redacted_text" in rplan


def test_small_dims_are_broadcast(spark):
    import re

    plan = plan_of(REGISTRY["join_multiway"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    # the fact lineitem⋈orders join may be shuffle-based; the three dims must
    # not introduce more than one shuffle join. Count OPERATORS via the
    # formatted-explain tree markers "(n) <Op>" — a bare substring count sees
    # each operator twice (tree node + details header).
    n_shuffle_joins = len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)",
                                     plan))
    assert n_shuffle_joins <= 1


def test_topk_uses_partial_take_ordered(spark):
    # merged ann_topk unions the brute + ivf branches; each must still be a
    # partial top-k — and so must the quantized int8 path
    plan = plan_of(REGISTRY["ann_topk"].fn(spark, SF_DIR))
    assert plan.count("TakeOrderedAndProject") >= 2  # no global Sort for limit-k
    plan8 = plan_of(REGISTRY["ann_cosine_topk_int8"].fn(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan8


def test_whole_stage_codegen_covers_relational_queries(spark):
    # AQE prints codegen spans only in the FINAL plan → execute first
    for name in ("pricing_summary", "join_broadcast_agg", "fn_currency_parse"):
        df = REGISTRY[name].fn(spark, SF_DIR)
        df.collect()
        plan = plan_of(df)
        assert "== Final Plan ==" in plan, name
        # '*' node prefix / codegen ids mark WholeStageCodegen spans
        assert "[codegen id :" in plan or "* HashAggregate" in plan, name


def test_aqe_and_arrow_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"


def test_hash_aggregate_with_partial_pass(spark):
    plan = plan_of(REGISTRY["pricing_summary"].fn(spark, SF_DIR))
    # map-side partial + final hash aggregate (two HashAggregate operators)
    assert plan.count("HashAggregate") >= 2


def test_bucket_partitioned_output_prunes(spark, tiny_transcripts_path, tmp_path):
    """The checkpoint layout (dir-partitioned by bucket) must let Catalyst
    prune untouched buckets at read time — the Iceberg-partition-spec analog."""
    from br_doc_ocr_spark import checkpoint

    out = str(tmp_path / "out")
    checkpoint.run_resumable(spark, tiny_transcripts_path, out,
                             str(tmp_path / "m.json"), n_buckets=4)
    df = spark.read.parquet(out).filter(sf.col("bucket") == 2)
    plan = plan_of(df)
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "bucket" in part_line and "= 2" in part_line.replace("=2", "= 2")
    # and the pruned read returns only that bucket
    assert df.select("bucket").distinct().collect()[0][0] == 2


def test_minhash_signatures_use_codegen_partial_agg(spark):
    """The LSH signature path must be the explode + codegen'd 32-seed
    projection + two-phase groupBy-min (map-side partial agg), NOT the
    interpreted higher-order transform/array_min formulation — the latter
    profiled ~10x slower (interpreted expression path, ~1 µs/element)."""
    from br_doc_ocr_spark.ops import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sig = dedup.minhash_signatures(docs)
    plan = plan_of(sig)
    # partial + final min aggregation (two HashAggregate operators)
    assert plan.count("HashAggregate") >= 2
    assert "partial_min" in plan
    # the 32 seed hashes sit in a single projection below the aggregate:
    # no array_min anywhere in the signature plan (that's the interpreted path)
    assert "array_min" not in plan


def test_ivf_indexed_probe_prunes_partitions(spark, tmp_path):
    """An ivf_topk_indexed probe must prune at file-listing time: the bucket
    filter has to appear in the scan's PartitionFilters (NOT as a post-scan
    Filter over a full read) — at 100 TB this is a ~3.5% read vs a full scan
    per query."""
    from br_doc_ocr_spark.ops import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.write_ivf_index(emb, path, n_bits=4)
    qv = [float(v) for v in emb.select("embedding").first()[0]]
    probe = similarity.ivf_topk_indexed(spark, path, qv, k=10, n_bits=4,
                                        probe_hamming=1)
    plan = plan_of(probe)
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "bucket" in part_line and "IN" in part_line.upper()
    # pruned read touches exactly the 5 probed cells (home + 4 Hamming-1)
    cells = similarity.probe_buckets(qv, n_bits=4, probe_hamming=1)
    assert len(cells) == 5


def test_ivf_hot_cell_skew_splits_and_prunes(spark, tmp_path):
    """Dynamic hot-cell handling under REAL skew (VERDICT r02 #6): with 90%
    of the corpus in ONE quantizer cell, files_per_cell must land that cell
    as multiple parquet files (write + probe-side split parallelism), the
    probe must still prune at file-listing time (PartitionFilters), and the
    pruned probe must return exactly the brute-force top-k of the probed
    cells."""
    import glob

    from br_doc_ocr_spark.ops import similarity

    n = 2000
    jit = (sf.col("vec_id") % 7).cast("double") * 0.01
    hot = sf.array(*[sf.lit(0.5) + jit for _ in range(4)])
    cold = sf.array(sf.lit(-0.5) - jit, sf.lit(0.5), sf.lit(-0.5), sf.lit(0.5))
    emb = (spark.range(n).select(sf.col("id").alias("vec_id"))
           .select("vec_id",
                   sf.when(sf.col("vec_id") % 10 < 9, hot).otherwise(cold)
                   .alias("embedding")))
    path = str(tmp_path / "ivf_skew")
    similarity.write_ivf_index(emb, path, n_bits=4, files_per_cell=4)
    # the hot cell (all-positive signs → bucket 15) holds 90% of rows and
    # must be split across several files
    hot_files = glob.glob(path + "/bucket=15/*.parquet")
    assert len(hot_files) >= 2, hot_files
    qv = [0.5, 0.5, 0.5, 0.5]
    probe = similarity.ivf_topk_indexed(spark, path, qv, k=5, n_bits=4,
                                        probe_hamming=1)
    plan = plan_of(probe)
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "bucket" in part_line and "IN" in part_line.upper()
    cells = similarity.probe_buckets(qv, n_bits=4, probe_hamming=1)
    brute = similarity.cosine_topk(
        emb.filter(similarity.ivf_bucket(
            sf.col("embedding"), 4).isin(cells)), qv, k=5)
    assert [(r["vec_id"], r["cosine"]) for r in probe.collect()] == \
        [(r["vec_id"], r["cosine"]) for r in brute.collect()]


def test_knn_join_has_partial_window_group_limit(spark):
    """knn_join's per-query top-k must be two-phase: a map-side Partial
    WindowGroupLimit BEFORE the exchange (each scan partition cut to ≤ k rows
    per query pre-shuffle) — without it, one task ranks the entire scored
    corpus for a query (the r01 scale anti-pattern). The rank filter sits
    directly over row_number so Catalyst's InferWindowGroupLimit fires; this
    test locks that plan shape against refactors that break the rule."""
    from br_doc_ocr_spark.ops import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.limit(3).select(sf.col("vec_id").alias("q_id"), "embedding")
    out = similarity.knn_join(queries, emb, k=5)
    plan = plan_of(out)
    # the two WindowGroupLimit phases render as "row_number(), 5, Partial"
    # (map-side, pre-exchange) and "row_number(), 5, Final"
    assert "row_number(), 5, Partial" in plan, plan
    assert "row_number(), 5, Final" in plan, plan


def test_dataset_transform_is_shuffle_free(spark):
    """to_training_samples must stay a pure projection — no Exchange, no
    Python crossing — so the conversation transform runs at scan speed
    over any corpus size."""
    import re

    plan = plan_of(REGISTRY["dataset_conversation"].fn(spark, SF_DIR))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def _events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_asof_join_is_single_shuffle_no_nested_loop(spark):
    """asof_join's scale claim: ONE exchange keyed by the join key, never a
    BroadcastNestedLoopJoin/CartesianProduct (the non-equi-join blowup it
    exists to avoid). (Built directly — the merged temporal_joins catalog
    entry adds a cohort-alignment join on top, so plan-gate the operator,
    not the catalog wrapper.)"""
    import re

    from br_doc_ocr_spark.ops import temporal

    ev = _events(spark)
    left = ev.filter(sf.col("event_type") == "purchase").select("user_id", "ts")
    right = (ev.filter(sf.col("event_type") == "click")
             .groupBy("user_id", "ts").agg(sf.max("value").alias("click_value")))
    plan = plan_of(temporal.asof_join(left, right, value_cols=["click_value"]))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # exchanges: the union's user_id partitioning + the final agg; the join
    # itself must not add a per-row comparison join operator
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin|"
                          r"BroadcastHashJoin)", plan)) == 0


def test_range_join_is_equi_join_not_nested_loop(spark):
    """range_join must execute as a hash/merge EQUI-join on (key, bucket)
    with the range residual as a join filter — not the BNLJ a plain
    inequality join degrades to."""
    from br_doc_ocr_spark.ops import temporal

    ev = _events(spark)
    points = (ev.filter(sf.col("event_type") == "click")
              .select("user_id", "ts", "value"))
    intervals = (ev.filter(sf.col("event_type") == "signup")
                 .select("user_id", sf.col("ts").alias("start"),
                         (sf.col("ts") + sf.expr("INTERVAL 2 HOURS"))
                         .alias("end")))
    plan = plan_of(temporal.range_join(points, intervals))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan)


def test_master_detection_is_launch_shaped(monkeypatch):
    """build_session forces local[N] only when the environment does NOT
    carry a spark-submit master. Detection must key on HOW the JVM was
    launched (PYSPARK_GATEWAY_PORT / PYSPARK_SUBMIT_ARGS), NOT on live
    spark.master properties: plain `python` launches its JVM through
    spark-submit internally, so after the first session the master lands
    in system properties and a property probe pinned every later
    build_session(cpus=k) to the FIRST session's core count — caught live
    when it ran bench.py's 4-core scaling leg on local[32] (review r05)."""
    from br_doc_ocr_spark.session import _master_is_configured

    monkeypatch.delenv("PYSPARK_GATEWAY_PORT", raising=False)
    monkeypatch.delenv("PYSPARK_SUBMIT_ARGS", raising=False)
    # the conftest session is live in this process, so a property-based
    # probe WOULD return True here — launch-shape detection must not
    assert not _master_is_configured()
    monkeypatch.setenv("PYSPARK_GATEWAY_PORT", "12345")
    assert _master_is_configured()
    monkeypatch.delenv("PYSPARK_GATEWAY_PORT")
    monkeypatch.setenv("PYSPARK_SUBMIT_ARGS", "--master yarn pyspark-shell")
    assert _master_is_configured()


def test_heap_scales_with_task_concurrency(spark, monkeypatch):
    """build_session sizes the JVM heap to task slots (~0.75 GiB/core, 8 GiB
    floor) — the 20M-turn ordered write OOMs a fixed 8g heap at local[32]
    (32 concurrent parquet writers × ~128 MiB row-group buffers)."""
    import os

    from br_doc_ocr_spark.session import driver_memory_for

    # the active 4-cpu test session sits at the floor
    if "SPARK_GRAFT_DRIVER_MEM" not in os.environ:
        assert spark.conf.get("spark.driver.memory") == "8g"
    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    assert driver_memory_for(4) == "8g"    # floor
    assert driver_memory_for(32) == "24g"  # scales with cores
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "64g")
    assert driver_memory_for(32) == "64g"  # env override wins
    # cached-batch rows bounded: the DISK_ONLY kernel-output cache holds
    # KB-scale text columns, and the 10 000-row default made build/decompress
    # spikes that OOMed the 24 g heap at 20M rows (session.py rationale)
    assert spark.conf.get(
        "spark.sql.inMemoryColumnarStorage.batchSize") == "1000"


def test_ivf_int8_probe_prunes_partitions_and_columns(spark, tmp_path):
    """The quantized IVF probe (VERDICT r03 #6) composes BOTH savings:
    bucket partition pruning at file-listing time AND codes-only column
    pruning — q_scale is stored in the index but the code-space-cosine
    probe must not read it (ReadSchema is the scan's byte bill at 100 TB)."""
    from br_doc_ocr_spark.ops import similarity

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "ivf8")
    similarity.write_ivf_index_int8(emb, path, n_bits=4)
    qv = [float(v) for v in emb.select("embedding").first()[0]]
    probe = similarity.ivf_topk_indexed_int8(spark, path, qv, k=10, n_bits=4,
                                             probe_hamming=1)
    plan = plan_of(probe)
    part_line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "bucket" in part_line and "IN" in part_line.upper()
    read_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "q_codes" in read_line
    assert "q_scale" not in read_line   # scales cancel — never read
    assert "TakeOrderedAndProject" in plan
