"""LLM-data-pipeline operators — §2.I: dedup family, similarity
search, text fingerprinting. Designed scale-first:

- exact dedup    → hash groupBy (one shuffle on the hash)
- MinHash LSH    → shingle → k minhashes → band keys → bucket join;
                   candidate pairs only, verified by exact Jaccard.
                   O(n·k) + join on band keys instead of O(n²).
- SimHash        → 64-bit signature per doc (Arrow-vectorized pandas
                   UDF), banded by 16-bit chunks, Hamming-verified
                   with JVM-side bit_count(xor).
- ANN (vectors)  → random-hyperplane LSH buckets; brute force only
                   within buckets.

Everything is deterministic (fixed seeds / hash functions) so results
are stable across runs and cluster sizes.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def tokens(text: Column | str, pattern: str = " ") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, pattern)


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles (the MinHash input set)."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    )


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """k independent minhashes: min over shingles of xxhash64 seeded by
    the hash index. Pure JVM expression — no UDF, scales linearly.

    Built as ONE higher-order-function expression (transform over the
    seed sequence) rather than k separate array expressions: projection
    collapse would otherwise inline the shingle computation into every
    consumer and multiply the work k-fold (measured 8×32× blowup)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(shingle_col, lambda s: F.xxhash64(s, i))),
    )


def band_keys(signature: Column, bands: int, rows: int) -> Column:
    """LSH banding: hash each r-row slice of the signature to one
    bucket key per band; docs sharing any band key become candidates.
    Single expression for the same projection-collapse reason."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            b,
            F.array_join(
                F.transform(F.slice(signature, b * rows + 1, rows), lambda x: x.cast("string")),
                ",",
            ),
        ),
    )


def jaccard(a: Column, b: Column, scale: int = 4) -> Column:
    """Exact Jaccard over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / union, scale)


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """I3 near-duplicate pairs via MinHash+LSH, Jaccard-verified.

    Plan shape: one narrow pass computes signatures; explode to
    (band, key) — 'bands' rows per doc carrying ONLY the id (never the
    shingle arrays — shuffling arrays per band multiplies IO by
    bands×); self-join on the band key finds candidate id pairs (the
    bucket-keyed shuffle); the shingle sets are joined back just for
    the pairs that need exact-Jaccard verification. At 100 TB the
    band-key join replaces an impossible O(n²) cross join."""
    sh = docs.select(F.col(id_col).alias("__id"), shingles(text_col, shingle_n).alias("__sh"))
    banded = sh.select(
        "__id",
        F.posexplode(band_keys(minhash_signature(F.col("__sh")), bands, rows)).alias(
            "band", "key"
        ),
    )
    left = banded.select(F.col("__id").alias("a"), "band", "key")
    right = banded.select(F.col("__id").alias("b"), "band", "key")
    cand = (
        left.join(right, ["band", "key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    verified = (
        cand.join(sh.select(F.col("__id").alias("a"), F.col("__sh").alias("sh_a")), "a")
        .join(sh.select(F.col("__id").alias("b"), F.col("__sh").alias("sh_b")), "b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
    )
    return verified.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


@lru_cache(maxsize=1)
def simhash64():
    """64-bit SimHash pandas UDF (Arrow-batched; numpy inner loop).
    Deterministic: token hash = stable blake2b 8-byte prefix. Lazily
    constructed — pandas_udf needs an active SparkSession."""

    @pandas_udf("long")
    def _simhash64(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            acc = np.zeros(64, dtype=np.int64)
            for tok in (t or "").split(" "):
                h = np.uint64(
                    int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
                )
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits == 1, 1, -1)
            sig = 0
            for b in range(64):
                if acc[b] > 0:
                    sig |= 1 << b
            # wrap to signed 64-bit
            out[i] = sig - (1 << 64) if sig >= 1 << 63 else sig
        return pd.Series(out)

    return _simhash64


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
) -> DataFrame:
    """I-SimHash: near-dup pairs with Hamming(sig_a, sig_b) <= k.
    Banded by the four 16-bit chunks (pigeonhole: any pair within
    Hamming 8 shares at least one exact chunk only heuristically —
    standard SimHash banding recall tradeoff). Verification uses
    JVM bit_count(a XOR b)."""
    sig = docs.select(F.col(id_col), simhash64()(F.col(text_col)).alias("sig"))
    chunks = sig.select(
        id_col,
        "sig",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.shiftright("sig", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("chunk")) for b in range(4)])
        ).alias("bc"),
    ).select(id_col, "sig", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    left = chunks.select(F.col(id_col).alias("a"), F.col("sig").alias("sig_a"), "band", "chunk")
    right = chunks.select(F.col(id_col).alias("b"), F.col("sig").alias("sig_b"), "band", "chunk")
    cand = (
        left.join(right, ["band", "chunk"])
        .filter(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def hyperplane_lsh_buckets(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """I5 scale path: sign-random-projection buckets. Hyperplane
    components are deterministic pseudo-randoms derived from
    (seed, plane, dim) via a splitmix-style integer mix, evaluated
    JVM-side — the whole bucketing is one narrow projection."""

    def mix(p: int, d: int) -> float:
        x = (seed * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + d * 0x94D049BB133111EB) & ((1 << 64) - 1)
        x ^= x >> 31
        x = (x * 0xD6E8FEB86659FD93) & ((1 << 64) - 1)
        x ^= x >> 27
        return ((x & 0xFFFF) / 32768.0) - 1.0  # [-1, 1)

    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        plane = [mix(p, d) for d in range(dim)]
        proj = F.aggregate(
            F.zip_with(v, F.array(*[F.lit(c) for c in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << p))
    bucket = sum(bits[1:], bits[0])
    return vectors.select(F.col(id_col), F.col(vec_col), bucket.alias("bucket"))


def ann_lsh_join(
    vectors: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 3,
    n_planes: int = 10,
    dim: int = 64,
) -> DataFrame:
    """I5: approximate KNN self-join — brute-force cosine only within
    LSH buckets. The bucket join is the single shuffle; candidate
    count ≈ n²/2^planes, tunable to the cluster."""
    from pyspark.sql import Window

    from .functions.vectors import cosine

    b = hyperplane_lsh_buckets(vectors, vec_col=vec_col, id_col=id_col, n_planes=n_planes, dim=dim)
    left = b.select(F.col(id_col).alias("a"), F.col(vec_col).cast("array<double>").alias("va"), "bucket")
    right = b.select(F.col(id_col).alias("b"), F.col(vec_col).cast("array<double>").alias("vb"), "bucket")
    cand = left.join(right, "bucket").filter(F.col("a") != F.col("b"))
    scored = cand.select(
        "a", "b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("score")
    ).dropDuplicates(["a", "b"])
    w = Window.partitionBy("a").orderBy(F.col("score").desc(), F.col("b").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
