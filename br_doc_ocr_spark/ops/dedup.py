"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design notes (the part that matters at 100 TB):

- **exact**: hash group-by on the content (or its fingerprint) — one shuffle,
  map-side partial aggregation for free.
- **MinHash+LSH**: the only pairwise method that avoids O(n²): signatures are
  computed scan-side with pure column expressions (``xxhash64`` per seed over
  the shingle array — JVM, codegen), then banded; candidate pairs come from a
  self-equi-join on (band_idx, band_hash) — a shuffle keyed by band hash, so
  only colliding docs ever meet. Verification re-checks true Jaccard on the
  candidates only.
- **SimHash**: 64-bit signature via an Arrow kernel (bit-packing has no JVM
  primitive); near-dup = Hamming distance ≤ k via banded equality on 16-bit
  chunks (same LSH-join trick, pigeonhole: d ≤ 3 ⇒ ≥1 of 4 chunks equal).
- **n-gram Jaccard**: exact verifier used on candidate pairs; standalone
  variant provided for small sides / tests.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as sf


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, key_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Group identical content → (keeper id, duplicate count).

    The reference's only dedup concept is the ``file_hash`` unique key
    (``specs/.../data-model.md:50,56``) → hash group-by here.
    """
    return (
        df.groupBy(key_col)
        .agg(sf.min(id_col).alias("keeper_id"), sf.count("*").alias("n_copies"))
        .filter(sf.col("n_copies") > 1)
    )


def drop_exact_duplicates(df: DataFrame, key_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per identical content — deterministic, unlike
    ``dropDuplicates`` whose survivor is partition-order dependent."""
    keepers = df.groupBy(key_col).agg(sf.min(id_col).alias(id_col))
    return df.join(keepers, on=[key_col, id_col], how="left_semi")


# ---------------------------------------------------------------------------
# Shingling + MinHash (pure column expressions)
# ---------------------------------------------------------------------------

def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), built JVM-side."""
    tokens = sf.split(sf.trim(sf.lower(text)), r"\s+")
    k = sf.size(tokens) - (n - 1)
    grams = sf.when(k <= 0, sf.array(sf.concat_ws(" ", tokens))).otherwise(
        sf.transform(
            sf.sequence(sf.lit(1), sf.greatest(k, sf.lit(1))),
            lambda i: sf.concat_ws(" ", sf.slice(tokens, i, n)),
        )
    )
    return sf.array_distinct(grams)


def minhash_signature(shingle_hashes: Column, num_hashes: int = 32) -> Column:
    """MinHash signature from PRE-HASHED shingles: per seed i, min over
    ``xxhash64(h, i)`` of the shingle hashes.

    Takes a column of LONG hashes, not strings: hash each shingle string
    exactly once upstream (``transform(shingles, s -> xxhash64(s))``), then
    derive the ``num_hashes`` permutations by re-hashing the 8-byte longs —
    seed-hashing full shingle strings ``num_hashes`` times profiled ~30×
    slower. All JVM-side, no Python.

    NOTE: higher-order functions (``transform``/``array_min``) run on Spark's
    interpreted expression path, ~1 µs per element — fine for ad-hoc use, but
    the LSH pipeline uses :func:`minhash_signatures` (explode + codegen'd
    projection + partial-agg min), which computes the SAME values at
    whole-stage-codegen speed (profiled ~10× faster end-to-end).
    """
    return sf.array(*[
        sf.array_min(sf.transform(shingle_hashes,
                                  lambda h: sf.xxhash64(h, sf.lit(i))))
        for i in range(num_hashes)
    ])


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_hashes: int = 32) -> DataFrame:
    """(id, sig ARRAY<LONG>) per document — the codegen-friendly MinHash.

    Explodes the per-doc shingle-hash array, computes all ``num_hashes``
    seed-hashes ``xxhash64(h, i)`` in ONE projection (whole-stage codegen —
    higher-order lambdas are interpreted and profile ~10× slower here), and
    reduces with ``groupBy(id).min`` per seed: map-side partial aggregation
    means the shuffle carries one 8-byte min per (partition, id, seed), not
    the shingles. Values are identical to :func:`minhash_signature`.
    """
    sh = df.select(sf.col(id_col).alias("id"),
                   word_shingles(sf.col(text_col), n).alias("_sh"))
    exploded = sh.select(
        "id", sf.explode(sf.transform("_sh", lambda s: sf.xxhash64(s))).alias("_h"))
    mins = exploded.select(
        "id", *[sf.xxhash64("_h", sf.lit(i)).alias(f"_p{i}")
                for i in range(num_hashes)]
    ).groupBy("id").agg(
        *[sf.min(f"_p{i}").alias(f"_m{i}") for i in range(num_hashes)])
    return mins.select(
        "id", sf.array(*[sf.col(f"_m{i}") for i in range(num_hashes)]).alias("sig"))


def jaccard(a: Column, b: Column) -> Column:
    inter = sf.size(sf.array_intersect(a, b))
    union = sf.size(sf.array_union(a, b))
    return sf.when(union == 0, sf.lit(1.0)).otherwise(inter / union)


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold (O(n²) — small inputs / test
    oracle; the scale path is :func:`minhash_lsh_candidates` + verify)."""
    sh = df.select(sf.col(id_col).alias("id"),
                   word_shingles(sf.col(text_col), n).alias("sh"))
    left = sh.alias("l")
    right = sh.alias("r")
    return (
        left.join(right, sf.col("l.id") < sf.col("r.id"))
        .select(
            sf.col("l.id").alias("id_a"), sf.col("r.id").alias("id_b"),
            sf.round(jaccard(sf.col("l.sh"), sf.col("r.sh")), 6).alias("jaccard"),
        )
        .filter(sf.col("jaccard") >= threshold)
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash (shingle → minhash → band →
    bucket self-join). Returns distinct (id_a < id_b) candidate pairs with
    their estimated signature similarity.

    Shuffle profile: one explode (rows × bands) + one equi-join keyed by
    (band_idx, band_hash) — colliding docs only; no cartesian anywhere.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sig.select(
        "id", "sig",
        sf.explode(sf.array(*[
            sf.struct(
                sf.lit(b).alias("band_idx"),
                sf.xxhash64(sf.concat_ws(
                    ",", *[sf.element_at("sig", b * rows_per_band + r + 1)
                           for r in range(rows_per_band)]
                )).alias("band_hash"),
            )
            for b in range(bands)
        ])).alias("band"),
    ).select("id", "sig", "band.band_idx", "band.band_hash")

    l, r = banded.alias("l"), banded.alias("r")
    matches = sf.filter(
        sf.zip_with(sf.col("l.sig"), sf.col("r.sig"),
                    lambda a, b: (a == b).cast("int")),
        lambda x: x == 1,
    )
    # est_similarity is computed BEFORE the pair dedup: it depends only on the
    # two ids (their signatures), so every duplicate band-collision row carries
    # the same value — the dropDuplicates shuffle then moves 24-byte
    # (id_a, id_b, est) rows instead of two num_hashes-long signature arrays
    # (~20× less shuffle volume for a few redundant 32-element comparisons).
    return (
        l.join(r, [sf.col("l.band_idx") == sf.col("r.band_idx"),
                   sf.col("l.band_hash") == sf.col("r.band_hash"),
                   sf.col("l.id") < sf.col("r.id")])
        .select(sf.col("l.id").alias("id_a"), sf.col("r.id").alias("id_b"),
                sf.round(sf.size(matches) / sf.lit(float(num_hashes)), 6)
                  .alias("est_similarity"))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Scale path end-to-end: LSH candidates → exact Jaccard verify ≥ threshold."""
    cands = minhash_lsh_candidates(df, id_col, text_col, n, num_hashes, bands)
    sh = df.select(sf.col(id_col).alias("id"),
                   word_shingles(sf.col(text_col), n).alias("sh"))
    verified = (
        cands.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .select("id_a", "id_b",
                sf.round(jaccard(sf.col("sh_a"), sf.col("sh_b")), 6).alias("jaccard"))
        .filter(sf.col("jaccard") >= threshold)
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash (Arrow kernel for bit packing, LSH-style chunk join for pairs)
# ---------------------------------------------------------------------------

def _simhash64(tokens: list[str]) -> int:
    """64-bit SimHash of a token list (blake2b token hashes, majority vote per
    bit). The bit-spreading/majority/packing is vectorized with numpy — only
    the per-token blake2b call remains a Python loop (inherent to hashlib);
    values are identical to the scalar formulation (bit i of the output is set
    iff more than half the token hashes have bit i set)."""
    if not tokens:
        return 0
    import hashlib

    import numpy as np

    digests = b"".join(
        hashlib.blake2b(tok.encode(), digest_size=8).digest() for tok in tokens)
    hbytes = np.frombuffer(digests, dtype=np.uint8).reshape(-1, 8)
    # int.from_bytes(d, "big") bit i == LSB-first bit i of the byte-reversed
    # row, so unpack little-endian over reversed bytes → columns are bits 0..63
    bits = np.unpackbits(hbytes[:, ::-1], axis=1, bitorder="little")
    majority = bits.sum(axis=0, dtype=np.int64) * 2 > len(tokens)  # acc > 0
    # pack [b63..b0] big-endian → the unsigned 64-bit value, then sign it
    out = int.from_bytes(np.packbits(majority[::-1]).tobytes(), "big")
    return out - (1 << 64) if out >= (1 << 63) else out  # signed 64-bit


def with_simhash(df: DataFrame, text_col: str = "text",
                 out_col: str = "simhash") -> DataFrame:
    from pyspark.sql import types as T

    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.LongType())])

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch[out_col] = [
                _simhash64(t.lower().split()) if isinstance(t, str) and t else 0
                for t in batch[text_col]
            ]
            yield batch

    return df.mapInPandas(kernel, schema=schema)


def simhash_near_duplicates(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text",
                            max_hamming: int = 3) -> DataFrame:
    """Near-dups with Hamming(simhash) ≤ max_hamming via the 4×16-bit-chunk
    pigeonhole join (d ≤ 3 ⇒ at least one chunk identical) — candidates from
    an equi-join, exact Hamming verified with ``bit_count(a XOR b)``."""
    sh = with_simhash(df.select(sf.col(id_col).alias("id"), text_col), text_col)
    chunks = sh.select(
        "id", "simhash",
        sf.explode(sf.array(*[
            sf.struct(
                sf.lit(c).alias("chunk_idx"),
                sf.shiftright("simhash", 16 * c).bitwiseAND(sf.lit(0xFFFF)).alias("chunk"),
            ) for c in range(4)
        ])).alias("c"),
    ).select("id", "simhash", "c.chunk_idx", "c.chunk")
    l, r = chunks.alias("l"), chunks.alias("r")
    return (
        l.join(r, [sf.col("l.chunk_idx") == sf.col("r.chunk_idx"),
                   sf.col("l.chunk") == sf.col("r.chunk"),
                   sf.col("l.id") < sf.col("r.id")])
        .select(sf.col("l.id").alias("id_a"), sf.col("r.id").alias("id_b"),
                sf.bit_count(sf.col("l.simhash").bitwiseXOR(sf.col("r.simhash")))
                .alias("hamming"))
        .dropDuplicates(["id_a", "id_b"])
        .filter(sf.col("hamming") <= max_hamming)
    )
