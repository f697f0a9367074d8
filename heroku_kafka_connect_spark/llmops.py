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
    Single expression for the same projection-collapse reason.

    NB: ``signature`` appears ``bands`` times in the expression tree;
    only pass a cheap column reference (a materialized signature), not
    the ``minhash_signature`` expression itself — projection collapse
    would recompute every minhash per band. The fused
    ``minhash_band_keys`` below avoids the hazard entirely."""
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


def minhash_band_keys(shingle_col: Column, bands: int, rows: int) -> Column:
    """Fused minhash + banding: one expression in which every minhash
    (seed ``b*rows + r``) is computed exactly once, because each seed
    belongs to exactly one band. Equivalent to
    ``band_keys(minhash_signature(sh), bands, rows)`` (same seeds, same
    bucket keys) but immune to projection collapse inlining the shingle
    + signature computation once per band (measured 8× blowup)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.xxhash64(
            b,
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), F.lit(rows - 1)),
                    lambda r: F.array_min(
                        F.transform(shingle_col, lambda s: F.xxhash64(s, b * rows + r))
                    ).cast("string"),
                ),
                ",",
            ),
        ),
    )


def ordered_pairs(members: Column) -> Column:
    """All (x, y) element pairs with x strictly before y in ``members``
    (pass a SORTED array column for deterministic x < y pairs). The
    in-bucket pair generator shared by every LSH family below: candidate
    pairs are emitted from ONE groupBy of the banded/bucketed rows
    instead of a self-join, which would shuffle — and recompute — the
    signature lineage twice."""
    return F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.size(members)),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )


def jaccard(a: Column, b: Column, scale: int = 4) -> Column:
    """Exact Jaccard over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.round(inter / union, scale)


def _lsh_shingle_buckets(
    docs: DataFrame, id_col: str, text_col: str, shingle_n: int, bands: int, rows: int
) -> tuple[DataFrame, DataFrame]:
    """Shared LSH front half: (per-doc shingle sets, per-bucket sorted
    id arrays). ONE shuffle (the groupBy on the band key); the banded
    rows carry only ids."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("__id"), shingles(text_col, shingle_n).alias("__sh")
    )
    banded = sh.select(
        "__id",
        F.explode(minhash_band_keys(F.col("__sh"), bands, rows)).alias("key"),
    )
    buckets = banded.groupBy("key").agg(F.sort_array(F.collect_set("__id")).alias("ids"))
    return sh, buckets


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = 8,
    rows: int = 4,
    threshold: float = 0.5,
    max_bucket: int = 256,
) -> DataFrame:
    """I3 near-duplicate pairs via MinHash+LSH, Jaccard-verified.

    Plan shape: one narrow pass computes shingles → fused
    minhash-band keys (each minhash evaluated once — see
    ``minhash_band_keys``); explode to (band, key) rows carrying ONLY
    the id (never the shingle arrays — shuffling arrays per band
    multiplies IO by bands×); ONE shuffle groups ids per bucket and
    emits candidate pairs in-bucket (a self-join would shuffle — and
    recompute — the banded set twice); the shingle sets are joined
    back just for the pairs that need exact-Jaccard verification. At
    100 TB the bucket grouping replaces an impossible O(n²) cross
    join.

    ``max_bucket`` is the hot-bucket guard: a pathological bucket
    (boilerplate/empty docs all sharing a band key) is an LSH-inherent
    O(|bucket|²), and ONE such bucket at corpus scale can exceed every
    other bucket combined. Buckets larger than the cap emit no pairs
    here — inspect them via ``minhash_lsh_overflow`` (same keys, same
    plan front half) and handle them out-of-band (exact-dedup them:
    near-identical boilerplate is better served by the exact path).

    The repartition spreads the signature computation across the
    cluster even when the source scan yields few input splits (one
    small parquet file = one task = 1/32 of local[32])."""
    sh, buckets = _lsh_shingle_buckets(docs, id_col, text_col, shingle_n, bands, rows)
    cand = (
        buckets.filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        .select(F.explode(ordered_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.x").alias("a"), F.col("p.y").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    verified = (
        cand.join(sh.select(F.col("__id").alias("a"), F.col("__sh").alias("sh_a")), "a")
        .join(sh.select(F.col("__id").alias("b"), F.col("__sh").alias("sh_b")), "b")
        .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
    )
    return verified.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def minhash_lsh_overflow(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    bands: int = 8,
    rows: int = 4,
    max_bucket: int = 256,
) -> DataFrame:
    """Side output for ``minhash_lsh_pairs``'s hot-bucket cap: the
    (key, n_ids, ids) of every bucket the cap excluded, so capped
    groups are observable and routable (e.g. into exact dedup) rather
    than silently dropped."""
    _, buckets = _lsh_shingle_buckets(docs, id_col, text_col, shingle_n, bands, rows)
    return buckets.filter(F.size("ids") > max_bucket).select(
        "key", F.size("ids").alias("n_ids"), "ids"
    )


@lru_cache(maxsize=1)
def simhash64():
    """64-bit SimHash pandas UDF (Arrow-batched; numpy inner loop).
    Deterministic: token hash = stable blake2b 8-byte prefix. Lazily
    constructed — pandas_udf needs an active SparkSession."""

    @pandas_udf("long")
    def _simhash64(texts: pd.Series) -> pd.Series:
        import hashlib

        import numpy as np

        cache: dict[str, int] = {}

        def token_hash(tok: str) -> int:
            v = cache.get(tok)
            if v is None:
                v = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
                cache[tok] = v
            return v

        shifts = np.arange(64, dtype=np.uint64)
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = (t or "").split(" ")
            hs = np.fromiter((token_hash(tok) for tok in toks), dtype=np.uint64, count=len(toks))
            ones = ((hs[:, None] >> shifts) & np.uint64(1)).sum(axis=0, dtype=np.int64)
            # bit b set iff majority of tokens have bit b set (acc > 0)
            mask = ones * 2 > len(toks)
            sig = int(((np.uint64(1) << shifts)[mask]).sum(dtype=np.uint64))
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
    JVM bit_count(a XOR b). One UDF pass, one shuffle: signatures are
    computed once (repartitioned for parallelism on few-split scans),
    bucketed by (band, chunk), and pairs emitted in-bucket via
    ``ordered_pairs`` — sigs travel with the ids so verification needs
    no join back."""
    par = docs.sparkSession.sparkContext.defaultParallelism
    sig = docs.repartition(par, F.col(id_col)).select(
        F.col(id_col).alias("__id"), simhash64()(F.col(text_col)).alias("sig")
    )
    chunks = sig.select(
        "__id",
        "sig",
        F.explode(
            F.array(*[F.struct(F.lit(b).alias("band"), F.shiftright("sig", 16 * b).bitwiseAND(F.lit(0xFFFF)).alias("chunk")) for b in range(4)])
        ).alias("bc"),
    ).select("__id", "sig", F.col("bc.band").alias("band"), F.col("bc.chunk").alias("chunk"))
    members = F.sort_array(F.collect_set(F.struct(F.col("__id").alias("id"), F.col("sig").alias("sig"))))
    cand = (
        chunks.groupBy("band", "chunk")
        .agg(members.alias("ms"))
        .filter(F.size("ms") > 1)
        .select(F.explode(ordered_pairs(F.col("ms"))).alias("p"))
        .select(
            F.col("p.x.id").alias("a"),
            F.col("p.y.id").alias("b"),
            F.col("p.x.sig").alias("sig_a"),
            F.col("p.y.sig").alias("sig_b"),
        )
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
    LSH buckets. Candidate count ≈ n²/2^planes, tunable to the
    cluster. One shuffle: each vector hashes to exactly ONE bucket, so
    a single groupBy collects bucket members and emits every directed
    in-bucket pair once (no self-join → the hyperplane projections are
    computed once, and no dedup pass is needed)."""
    from pyspark.sql import Window

    from .functions.vectors import cosine

    par = vectors.sparkSession.sparkContext.defaultParallelism
    b = hyperplane_lsh_buckets(
        vectors.repartition(par, F.col(id_col)),
        vec_col=vec_col, id_col=id_col, n_planes=n_planes, dim=dim,
    ).select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v"), "bucket")
    ms = F.col("ms")
    directed = F.flatten(
        F.transform(
            ms,
            lambda x: F.transform(
                F.filter(ms, lambda y: y["id"] != x["id"]),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    scored = (
        b.groupBy("bucket")
        .agg(F.collect_list(F.struct(F.col("__id").alias("id"), F.col("__v").alias("v"))).alias("ms"))
        .filter(F.size("ms") > 1)
        .select(F.explode(directed).alias("p"))
        .select(
            F.col("p.x.id").alias("a"),
            F.col("p.y.id").alias("b"),
            F.round(cosine(F.col("p.x.v"), F.col("p.y.v")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("a").orderBy(F.col("score").desc(), F.col("b").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    *,
    max_iter: int = 25,
    algorithm: str = "label_prop",
) -> DataFrame:
    """Connected components over an undirected edge list → (node,
    component) with component = min node id in the component. The
    final stage of every dedup pipeline: pairwise near-dup matches
    become duplicate CLUSTERS, from which one canonical doc per
    cluster survives.

    Two interchangeable algorithms (identical output, property-tested
    equal on seeded random + path graphs):

    - ``label_prop`` (default): distributed min-label propagation —
      each round every node takes the min label among itself and its
      neighbors (one shuffle per round: an edge⋈label join + a
      groupBy-min, both map-side-combinable). Converges in O(graph
      diameter) rounds; dup clusters are near-cliques (diameter
      ≤ ~3), so 3-4 rounds in practice.
    - ``two_star``: the alternating large-star/small-star algorithm
      of Kiveris et al., "Connected Components in MapReduce and
      Beyond" (SoCC'14) — O(log² n) rounds regardless of diameter,
      the 100 TB choice for adversarial long-path graphs (chained
      near-dups, web graphs). Same per-round shuffle shape
      (groupBy-min + join), same output contract.

    ``max_iter`` is a runaway bound; convergence is checked with a
    cheap probe per round. Each round's result is localCheckpoint'ed:
    iterative plans otherwise grow lineage exponentially and
    re-execute every prior round.
    """
    if algorithm == "two_star":
        return _cc_two_star(edges, src, dst, max_iter=max_iter)
    if algorithm != "label_prop":
        raise ValueError(f"unknown CC algorithm: {algorithm!r}")
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = sym.union(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "label")
            .groupBy("u")
            .agg(F.min("label").alias("label"))
        )
        new_labels = (
            labels.unionByName(nbr_min)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def _cc_two_star(
    edges: DataFrame, src: str = "a", dst: str = "b", *, max_iter: int = 25
) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al., SoCC'14). Converges in O(log² n) rounds
    independent of graph diameter, vs O(diameter) for label
    propagation — the difference between 3 rounds and 10⁶ rounds on a
    path graph.

    Per round, on the current edge set E (kept oriented big→small, so
    every edge (u, v) has u > v):

    - **large-star**: for every node u with symmetric neighborhood
      Γ(u) and m = min(Γ(u) ∪ {u}), emit (v, m) for each v ∈ Γ(u)
      with v > u. Implemented as a groupBy-min (map-side-combinable)
      joined back to the edge list — no neighborhood is ever
      materialized as an array, so high-degree hubs cost a balanced
      shuffle, not a hot task.
    - **small-star**: on the big→small orientation, for every u with
      m = min of its out-neighbors, emit (u, m) and (v, m) for the
      other out-neighbors v. Same groupBy-min + join shape.

    Terminates when a full round leaves the edge set unchanged — at
    that point E is a star forest: every non-root node points
    directly at its component min. Roots appear only as targets, so
    labels come from a left join of the original node set against the
    star edges, with root/isolated-by-self-loop nodes labelling
    themselves."""
    sym0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        sym0.select("u")
        .union(sym0.select(F.col("v").alias("u")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # canonical big→small orientation; self-loops carry no connectivity
    cur = (
        sym0.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cur = cur.count()
    for _ in range(max_iter):
        # large-star over the symmetric view
        s = cur.union(cur.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            s.groupBy("u").agg(F.min("v").alias("mv")).select("u", F.least("mv", "u").alias("m"))
        )
        large = (
            s.filter(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star over the big→small orientation (large's output
        # already satisfies u > v: emitted v > u ≥ m)
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(smins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(smins.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = small.count()
        changed = (
            n_new != n_cur
            or small.exceptAll(cur).limit(1).count() > 0
        )
        cur, n_cur = small, n_new
        if not changed:
            break
    star = cur.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
    return (
        nodes.withColumnRenamed("u", "node")
        .join(star, "node", "left")
        .select("node", F.coalesce("lbl", "node").alias("component"))
    )


def pack_bins_ffd(
    docs: DataFrame,
    *,
    group_col: str = "lang",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
) -> DataFrame:
    """True bin packing per group via first-fit-decreasing — the
    sequential counterpart of offset-based sequence packing
    (`llm_pack_sequences`): no doc straddles a boundary and bins stay
    under budget (a doc longer than the budget gets a bin alone).

    FFD is inherently sequential WITHIN a group, so it runs as an
    ``applyInPandas`` grouped map: Spark distributes groups across
    executors (one shuffle on the group key) and the Python loop only
    ever sees one group's docs — the parallelism unit at 100 TB is
    the (lang, date-bucket, shard) group, kept small enough that a
    group's doc list fits one task. Deterministic: docs are ordered
    by (tokens desc, id) before placement, so the assignment is a
    pure function of the group's contents."""

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        order = sorted(
            zip(pdf[tokens_col].tolist(), pdf[id_col].tolist()), key=lambda t: (-t[0], t[1])
        )
        remaining: list[int] = []
        assigned: dict[int, int] = {}
        for tokens, doc in order:
            for i, cap in enumerate(remaining):
                if tokens <= cap:
                    remaining[i] = cap - tokens
                    assigned[doc] = i
                    break
            else:
                remaining.append(budget - tokens)
                assigned[doc] = len(remaining) - 1
        out = pdf[[id_col, group_col, tokens_col]].copy()
        out["bin_id"] = out[id_col].map(assigned)
        return out

    schema = f"{id_col} long, {group_col} string, {tokens_col} long, bin_id long"
    return docs.select(id_col, group_col, tokens_col).groupBy(group_col).applyInPandas(ffd, schema)
