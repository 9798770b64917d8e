"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force cosine top-k against one query vector:
  the dot product and norms are ``aggregate``/``zip_with`` column expressions
  (JVM, codegen); top-k is an ``orderBy ... limit`` which Spark executes as
  per-partition partial top-k + final merge (TakeOrderedAndProject — no full
  sort, no single-reducer bottleneck).
- :func:`knn_join` — k-NN for *every* row of a query set via a broadcast of
  the (small) query side + per-query window top-k.
- :func:`ivf_topk` — the scale path: a deterministic coarse quantizer (sign
  bits of the leading dimensions) buckets vectors at write time; a query
  probes only its own bucket (+ optional neighbors), turning a full scan into
  a partition-pruned one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as sf


def dot(a: Column, b: Column) -> Column:
    return sf.aggregate(
        sf.zip_with(a, b, lambda x, y: x * y),
        sf.lit(0.0),
        lambda acc, x: acc + x,
    )


def _finite(query_vec: list[float]) -> list[float]:
    """Reject NaN/Inf query components up front: they would otherwise render
    as unparseable SQL literals ('nanD') and surface as a baffling
    UNRESOLVED_COLUMN analysis error far from the real cause."""
    import math

    bad = [v for v in query_vec if not math.isfinite(float(v))]
    if bad:
        raise ValueError(
            f"query vector contains non-finite components {bad[:3]} — "
            "embeddings must be finite")
    return query_vec


def norm(a: Column) -> Column:
    return sf.sqrt(sf.aggregate(a, sf.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm guard: a legitimate all-zero embedding scores 0 everywhere
    # instead of dividing by zero (which THROWS under Spark 4's default
    # ANSI mode, killing the whole query for one degenerate row)
    d = norm(a) * norm(b)
    c = sf.when(d == 0, sf.lit(0.0)).otherwise(dot(a, b) / d)
    # NaN → NULL: in Spark NaN sorts GREATER than every double, so one
    # corrupted corpus vector (a single NaN component) would rank FIRST in
    # every desc-ordered top-k and pass every >= threshold filter (NaN >= x
    # is true) — _finite() validates only the query literal, never the
    # corpus (review r05). NULL instead sorts last under desc and fails
    # thresholds, quarantining the row without killing the query.
    guarded = sf.nanvl(c, sf.lit(None).cast("double"))
    # dimension mismatch fails LOUDLY (same contract as ivf_bucket): a
    # 128-dim query against a 256-dim corpus would otherwise NULL-pad
    # through zip_with and score every row NULL — a silently arbitrary
    # "top-k" (review r05). NULL arrays skip the guard (size(NULL) is NULL
    # → the when falls through) and quarantine via the NULL score instead.
    return sf.when(
        sf.size(a) != sf.size(b),
        sf.raise_error(sf.concat(
            sf.lit("cosine: embedding dimension mismatch ("),
            sf.size(a).cast("string"), sf.lit(" vs "),
            sf.size(b).cast("string"), sf.lit(")")))
    ).otherwise(guarded)


def cosine_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Brute-force cosine top-k vs a literal query vector (the exact baseline
    every ANN variant is verified against). Deterministic tie-break on id."""
    # one parsed literal array, not len(dim) py4j lit() round trips; repr()
    # keeps full double precision (repr(float) round-trips exactly)
    q = sf.expr(
        f"array({', '.join(f'{float(v)!r}D' for v in _finite(query_vec))})")
    scored = embeddings.select(
        sf.col(id_col),
        sf.round(cosine(sf.col(vec_col).cast("array<double>"), q), 6).alias("cosine"),
    )
    return scored.orderBy(sf.desc("cosine"), sf.asc(id_col)).limit(k)


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 5,
             q_id: str = "q_id", c_id: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """k nearest corpus rows per query row. The query side is broadcast (small
    dim table); the corpus streams — no shuffle of the big side ever carries
    vectors.

    Two-stage top-k without a hand-built second window: keeping the rank
    filter DIRECTLY over ``row_number`` lets Catalyst's InferWindowGroupLimit
    rule (SPARK-37099) insert a map-side Partial WindowGroupLimit before the
    exchange — every scan partition is cut to ≤ k rows per query BEFORE the
    shuffle, so the shuffle carries ≤ P·Q·k slim (q_id, c_id, cosine) rows
    and the per-query final task ranks ≤ P·k rows, never the 10⁹-rows-per-
    task funnel of a raw window (tests/test_plans.py locks the Partial
    operator's presence below the Exchange). Don't restructure the filter
    (e.g. rank through an intermediate table or non-deterministic exprs in
    the window order) — that defeats the rule."""
    from pyspark.sql import Window

    q = queries.select(sf.col(q_id), sf.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(sf.col(c_id), sf.col(vec_col).cast("array<double>").alias("cv"))
    scored = c.join(sf.broadcast(q)).select(
        q_id, c_id,
        sf.round(cosine(sf.col("cv"), sf.col("qv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(q_id).orderBy(sf.desc("cosine"), sf.asc(c_id))
    return (scored.withColumn("rank", sf.row_number().over(w))
            .filter(sf.col("rank") <= k))


def ivf_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Deterministic coarse quantizer: the sign pattern of the first
    ``n_bits`` dimensions → an integer bucket id (2^n_bits cells). At write
    time the corpus is partitioned by this column; a probe reads one cell."""
    # a vector shorter than n_bits would make element_at throw (ANSI) or
    # yield NULL buckets that silently filter every row out — fail loudly
    checked = sf.when(
        sf.size(vec) < n_bits,
        sf.raise_error(sf.concat(
            sf.lit(f"ivf_bucket: embedding has fewer than n_bits={n_bits} "
                   "dimensions ("), sf.size(vec).cast("string"), sf.lit(")")))
    ).otherwise(vec)
    bits = [
        (sf.element_at(checked, i + 1) > 0).cast("int") * sf.lit(2 ** i)
        for i in range(n_bits)
    ]
    total = bits[0]
    for b in bits[1:]:
        total = total + b
    return total


def probe_buckets(query_vec: list[float], n_bits: int = 8,
                  probe_hamming: int = 1) -> list[int]:
    """The quantizer cells a query probes: its home cell plus every cell
    within Hamming distance ``probe_hamming`` (the standard multi-probe
    recall dial — a true neighbor flips each sign bit with probability
    arccos(sim)/π, so near cells hold most of the missed mass)."""
    if len(query_vec) < n_bits:
        raise ValueError(
            f"probe_buckets: query vector has {len(query_vec)} dimensions, "
            f"fewer than n_bits={n_bits}")
    q_bucket = sum((1 << i) for i, v in enumerate(query_vec[:n_bits]) if v > 0)
    buckets = {q_bucket}
    frontier = {q_bucket}
    for _ in range(probe_hamming):
        frontier = {b ^ (1 << i) for b in frontier for i in range(n_bits)}
        buckets |= frontier
    return sorted(buckets)


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_bits: int = 8, probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k with multi-probe over an UN-materialized corpus:
    computes the quantizer per row and filters — a full scan with a cheap
    predicate. Correctness/recall twin of :func:`ivf_topk_indexed`; at scale
    use :func:`write_ivf_index` + :func:`ivf_topk_indexed`, which prunes the
    scan to the probed cells (≈ Σ C(n_bits, d)/2^n_bits of the files —
    n_bits=8, d ≤ 1 → 9/256 ≈ 3.5%). Measured recall@10 on the testdata
    embeddings: 0.1-0.3 single-probe → 0.7-1.0 at probe_hamming=1."""
    cells = probe_buckets(query_vec, n_bits, probe_hamming)
    cell = embeddings.filter(
        ivf_bucket(sf.col(vec_col).cast("array<double>"), n_bits).isin(cells)
    )
    return cosine_topk(cell, query_vec, k, id_col, vec_col)


def write_ivf_index(embeddings: DataFrame, path: str,
                    vec_col: str = "embedding", n_bits: int = 8,
                    files_per_cell: int = 1) -> None:
    """Materialize the IVF index: the corpus written as parquet partitioned
    by the quantizer cell (``bucket=<cell>/`` directories). A probe then
    reads ONLY its probed cells via partition pruning — at 100 TB this is
    the difference between a full scan per query and touching ~3.5% of the
    files (and cells are further splittable into many files each, so a hot
    cell still parallelizes). Write shuffle: one repartition by bucket so
    each cell is a few large files rather than every input task writing a
    sliver into every cell (small-files problem at 1000 executors).

    ``files_per_cell`` is the hot-cell dial: skewed corpora concentrate in
    few quantizer cells, and with the default a hot cell is written (and
    later scanned as) ONE task's file — raise it to salt the write shuffle
    by a deterministic hash of the vector so each cell lands as N files,
    restoring both write parallelism and probe-side split parallelism."""
    bucketed = embeddings.withColumn(
        "bucket", ivf_bucket(sf.col(vec_col).cast("array<double>"), n_bits))
    if files_per_cell > 1:
        # explicit partition count: files per cell = distinct shuffle
        # partitions holding that cell, so the (bucket, salt) combos need
        # at least their own partition count (2x headroom vs hash
        # collisions) — the session default would collapse them
        n_parts = 2 * (1 << n_bits) * files_per_cell
        salt = sf.pmod(sf.hash(sf.col(vec_col)), sf.lit(files_per_cell))
        out = bucketed.repartition(n_parts, sf.col("bucket"), salt)
    else:
        out = bucketed.repartition(sf.col("bucket"))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)


def ivf_topk_indexed(spark, path: str, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_bits: int = 8, probe_hamming: int = 1) -> DataFrame:
    """Top-k probe against a :func:`write_ivf_index` materialization: the
    ``bucket`` partition-column filter prunes at file-listing time (the scan
    node shows it under ``PartitionFilters`` — locked by tests/test_plans.py),
    so only the probed cells are read. Same results as :func:`ivf_topk` on
    the same corpus/params."""
    cells = probe_buckets(query_vec, n_bits, probe_hamming)
    cell = spark.read.parquet(path).filter(sf.col("bucket").isin(cells))
    return cosine_topk(cell, query_vec, k, id_col, vec_col)


def cosine_near_duplicates(embeddings: DataFrame, threshold: float = 0.9,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           n_bits: int = 8,
                           probe_hamming: int = 1) -> DataFrame:
    """Embedding-cosine near-dup pairs at scale: candidates from a self
    equi-join on the sign-bit quantizer cell, then exact cosine verification.

    Multi-probe recall: the LEFT side explodes each row into its home cell
    plus every cell within Hamming ``probe_hamming`` (the RIGHT side stays on
    its home cell — XOR distance is symmetric, so one-sided probing finds
    every pair whose buckets differ by ≤ probe_hamming, at (n_bits+1)× left
    rows instead of a non-equi join that would break the shuffle-join plan).
    Pairs found in several shared cells are deduped before verification.
    Residual recall dial: pairs straddling > probe_hamming sign flips are
    missed — lower n_bits or raise probe_hamming (cost: bigger cells /
    more probes).
    """
    bucketed = embeddings.select(
        sf.col(id_col).alias("id"),
        sf.col(vec_col).cast("array<double>").alias("v"),
        ivf_bucket(sf.col(vec_col).cast("array<double>"), n_bits).alias("bucket"),
    )
    probe_cells = [sf.col("bucket")]
    frontier = [sf.col("bucket")]
    for _ in range(probe_hamming):
        frontier = [c.bitwiseXOR(sf.lit(1 << i))
                    for c in frontier for i in range(n_bits)]
        probe_cells += frontier
    probes = bucketed.select(
        "id", "v", sf.explode(sf.array_distinct(sf.array(*probe_cells)))
        .alias("cell"))
    l, r = probes.alias("l"), bucketed.alias("r")
    # cosine computed before the pair dedup (identical on every duplicate
    # cell-collision row) so the dropDuplicates shuffle carries 24-byte rows,
    # not the vectors — same discipline as the MinHash candidate join.
    return (l.join(r, [sf.col("l.cell") == sf.col("r.bucket"),
                       sf.col("l.id") < sf.col("r.id")])
            .select(sf.col("l.id").alias("id_a"), sf.col("r.id").alias("id_b"),
                    sf.round(cosine(sf.col("l.v"), sf.col("r.v")), 6)
                    .alias("cosine"))
            .dropDuplicates(["id_a", "id_b"])
            .filter(sf.col("cosine") >= threshold))


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        scale_col: str = "q_scale",
                        codes_col: str = "q_codes") -> DataFrame:
    """Symmetric per-vector int8 quantization (4× storage cut for
    float32 corpora; the standard embedding-store compression):
    ``scale = max(|x|)/127``, ``code = clamp(floor(x/scale + 0.5), ±127)``.
    Pure column expressions. floor(x+0.5) — NOT round() — so the tie rule
    is explicit and identical across engines (round() half-up in Spark vs
    half-even in DuckDB would break the value-level oracle on exact .5
    codes). Zero vectors get scale 0 and all-zero codes."""
    v = sf.col(vec_col).cast("array<double>")
    scale = sf.array_max(sf.transform(v, lambda x: sf.abs(x))) / 127.0
    code = lambda x: sf.greatest(  # noqa: E731
        sf.least(sf.floor(x / sf.col(scale_col) + 0.5), sf.lit(127.0)),
        sf.lit(-127.0)).cast("int")
    return (df.withColumn(scale_col, scale)
            .withColumn(codes_col,
                        sf.when(sf.col(scale_col) == 0.0,
                                sf.transform(v, lambda x: sf.lit(0)))
                        .otherwise(sf.transform(v, code))))


def _quantize_query(query_vec: list[float]) -> list[int]:
    """Driver-side int8 quantization of the literal query vector — identical
    arithmetic to :func:`quantize_embeddings` (floor(x/scale + 0.5), ±127
    clamp) so query codes match what the column expression would produce."""
    import math

    _finite(query_vec)
    q_scale = max(abs(x) for x in query_vec) / 127.0
    if q_scale == 0.0:
        return [0] * len(query_vec)
    return [int(max(min(math.floor(x / q_scale + 0.5), 127), -127))
            for x in query_vec]


def _int8_score(q_codes: list[int]) -> tuple[Column, Column]:
    """(int_dot, code-space cosine) over a ``q_codes`` codes column vs the
    literal query codes. Per-vector scales cancel in the code-space cosine,
    so everything is EXACT integer dot products (|dot| ≤ dim·127² fits a
    double exactly → bit-identical ranking across engines). Emitted as
    parsed SQL expressions — the Column-composed lambda pipeline cost
    ~0.3 s of py4j round trips per plan build."""
    import math

    ss_q = float(sum(c * c for c in q_codes))
    if ss_q == 0.0:
        # a zero-norm QUERY scores 0 against everything — without this the
        # sqrt(ss_q)=0 divisor throws under ANSI for every non-zero corpus
        # row (the corpus-side zero was already guarded below)
        return sf.lit(0).cast("long"), sf.lit(0.0)
    qc = f"array({', '.join(str(c) for c in q_codes)})"
    # dimension mismatch fails LOUDLY (same contract as ivf_bucket): a
    # query probed against a different-dimension index would otherwise
    # NULL-pad through zip_with into NULL scores that silently sort last
    # (review r05); the CASE reuses q_codes so both aggregates stay on the
    # checked value
    checked = (f"CASE WHEN size(q_codes) = {len(q_codes)} THEN q_codes "
               f"ELSE raise_error(concat('int8 probe: index dimension ', "
               f"cast(size(q_codes) AS STRING), "
               f"' != query dimension {len(q_codes)}')) END")
    # widen BEFORE multiplying: the int8 index stores array<tinyint>, and
    # same-type tinyint*tinyint stays tinyint — 127² overflows it under ANSI
    int_dot = sf.expr(
        f"aggregate(zip_with({checked}, {qc}, "
        f"(x, y) -> cast(x as long) * y), cast(0 as long), (acc, x) -> acc + x)")
    ss_c = sf.expr(
        "cast(aggregate(transform(q_codes, x -> cast(x as long) * x), "
        "cast(0 as long), (acc, x) -> acc + x) as double)")
    cos_q = sf.when(ss_c == 0.0, sf.lit(0.0)).otherwise(
        int_dot / (sf.sqrt(ss_c) * sf.lit(math.sqrt(ss_q))))
    return int_dot, cos_q


def cosine_topk_int8(embeddings: DataFrame, query_vec: list[float],
                     k: int = 10, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Brute-force top-k over the int8 codes of :func:`quantize_embeddings` —
    the quantized scan path: at 100 TB the probe reads the 4×-smaller codes
    column instead of the float vectors.

    Scoring is the code-space cosine ``dot(c, q) / (‖c‖·‖q‖)`` — the
    per-vector scales cancel, so the score is built entirely from EXACT
    integer dot products (|dot| ≤ dim·127² fits a double exactly, making the
    ranking bit-identical across engines — the DuckDB oracle in queries.py
    renders the same arithmetic). Zero vectors (scale 0 → all-zero codes)
    score 0. Returns (id, int_dot, cosine_q rounded) ordered by the
    unrounded code-space cosine with an id tie-break; executes as
    TakeOrderedAndProject like :func:`cosine_topk`."""
    q_codes = _quantize_query(query_vec)
    coded = quantize_embeddings(embeddings, vec_col=vec_col)
    int_dot, cos_q = _int8_score(q_codes)
    scored = coded.select(sf.col(id_col), int_dot.alias("int_dot"),
                          cos_q.alias("_cos"))
    return (scored.orderBy(sf.desc("_cos"), sf.asc(id_col)).limit(k)
            .select(id_col, "int_dot",
                    sf.round(sf.col("_cos"), 6).alias("cosine_q")))


def write_ivf_index_int8(embeddings: DataFrame, path: str,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         n_bits: int = 8, files_per_cell: int = 1) -> None:
    """Quantized IVF index (VERDICT r03 #6): the corpus stored as
    ``(id, q_scale, q_codes array<tinyint>)`` partitioned by the sign-bit
    quantizer cell. Two savings compose at probe time: partition pruning
    reads only the probed cells (~3.5% of files at n_bits=8, d ≤ 1), and
    the scan reads the int8 CODES instead of the float vectors (~4× fewer
    bytes — measured on parquet in tests). ``q_scale`` is stored for
    dequantization/reranking but the code-space-cosine probe never reads
    it (column pruning, plan-locked). Same ``files_per_cell`` hot-cell
    salting as :func:`write_ivf_index`."""
    coded = quantize_embeddings(embeddings, vec_col=vec_col)
    bucketed = coded.select(
        sf.col(id_col), sf.col("q_scale"),
        sf.expr("transform(q_codes, x -> cast(x as tinyint))").alias("q_codes"),
        ivf_bucket(sf.col(vec_col).cast("array<double>"), n_bits)
        .alias("bucket"))
    if files_per_cell > 1:
        n_parts = 2 * (1 << n_bits) * files_per_cell
        salt = sf.pmod(sf.hash(sf.col("q_codes")), sf.lit(files_per_cell))
        out = bucketed.repartition(n_parts, sf.col("bucket"), salt)
    else:
        out = bucketed.repartition(sf.col("bucket"))
    out.write.mode("overwrite").partitionBy("bucket").parquet(path)


def ivf_topk_indexed_int8(spark, path: str, query_vec: list[float],
                          k: int = 10, id_col: str = "vec_id",
                          n_bits: int = 8,
                          probe_hamming: int = 1) -> DataFrame:
    """Top-k probe against a :func:`write_ivf_index_int8` materialization:
    partition pruning (bucket filter at file-listing time) + codes-only
    column pruning + exact-integer code-space cosine, executed as
    TakeOrderedAndProject. Returns (id, int_dot, cosine_q) like
    :func:`cosine_topk_int8`."""
    cells = probe_buckets(query_vec, n_bits, probe_hamming)
    q_codes = _quantize_query(query_vec)
    scan = spark.read.parquet(path).filter(sf.col("bucket").isin(cells))
    int_dot, cos_q = _int8_score(q_codes)
    scored = scan.select(sf.col(id_col), int_dot.alias("int_dot"),
                         cos_q.alias("_cos"))
    return (scored.orderBy(sf.desc("_cos"), sf.asc(id_col)).limit(k)
            .select(id_col, "int_dot",
                    sf.round(sf.col("_cos"), 6).alias("cosine_q")))


def dequantize_embeddings(df: DataFrame, scale_col: str = "q_scale",
                          codes_col: str = "q_codes",
                          out_col: str = "embedding_dq") -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: ``x ≈ code · scale``."""
    return df.withColumn(
        out_col, sf.transform(sf.col(codes_col),
                              lambda c: c.cast("double") * sf.col(scale_col)))
