"""§2.H — UDF/UDAF/UDTF surface (the Spark analog of Connect's
pluggable Transformation/Converter/Predicate classes, reference
main.sh:83 CONNECT_PLUGIN_PATH).

Hot-path discipline: every Python extension point here is
Arrow-batched (pandas_udf / mapInPandas) — row-at-a-time Python UDFs
are 10-100× slower and appear nowhere in this engine. Each query's
oracle re-expresses the pure function in SQL, proving the UDF
computes what it claims."""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import register
from ..session import load_tables
from .common import parallelize_scan


@lru_cache(maxsize=1)
def _tok_count():
    """Vectorized scalar UDF: whitespace token count (lazy — needs an
    active session to resolve the return type)."""

    @pandas_udf("int")
    def tok_count(texts: pd.Series) -> pd.Series:
        return texts.str.split(" ").str.len().astype("int32")

    return tok_count


@register(
    "udf_scalar_pandas",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS tok_count,
           CAST(len(string_split(text, ' ')) * 2 AS INTEGER) AS tok_count_x2
    FROM documents
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 Transformation analog: Arrow-batched scalar pandas UDF."""
    t = load_tables(spark, sf_dir)
    tc = _tok_count()
    return t.documents.select(
        "doc_id",
        tc("text").alias("tok_count"),
        (tc("text") * 2).cast("int").alias("tok_count_x2"),
    )


@lru_cache(maxsize=1)
def _weighted_sum():
    """Vectorized grouped-agg UDF: Σ user_id·k (int64-exact)."""

    @pandas_udf("long")
    def weighted_sum(uid: pd.Series, k: pd.Series) -> int:
        return int((uid * k).sum())

    @pandas_udf("long")
    def group_count(uid: pd.Series) -> int:
        return len(uid)

    return weighted_sum, group_count


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(user_id * CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS uid_k_sum,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 stateful/grouped analog: GROUPED_AGG pandas UDF (partial
    aggregation per Arrow batch, merged per group)."""
    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    df = t.events.select("event_type", "user_id", k.alias("k"))
    wsum, gcount = _weighted_sum()
    # grouped-agg pandas UDFs can't mix with JVM aggregates in one agg —
    # the count is a second pandas UDF over the same groups
    return df.groupBy("event_type").agg(
        wsum("user_id", "k").alias("uid_k_sum"),
        gcount("user_id").alias("n"),
    )


@lru_cache(maxsize=1)
def _chunk_udtf():
    """Arrow-optimized Python UDTF (Spark 3.5+): the table-function
    extension point proper — consumed via LATERAL join. Lazy: @udtf
    resolves its return type against the active session."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string", useArrow=True)
    class ChunkText:
        def eval(self, text: str, size: int):
            t = text or ""
            for i in range(0, len(t), size):
                yield i // size, t[i : i + size]

    return ChunkText


@register(
    "udf_udtf_chunks",
    oracle="""
    SELECT doc_id,
           CAST(g AS INTEGER) AS chunk_idx,
           substr(text, CAST(g * 256 + 1 AS BIGINT), 256) AS chunk
    FROM documents,
         LATERAL (SELECT unnest(range(0, CAST(ceil(LENGTH(text) / 256.0) AS BIGINT))) AS g) t
    """,
)
def udf_udtf_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3b true UDTF: context-window document chunking (1 doc → N
    256-char chunks) as a LATERAL Python table function — the
    LLM-pipeline chunking step AND the Connect record-explosion
    extension point expressed as Spark's native UDTF surface."""
    load_tables(spark, sf_dir)  # registers the documents view
    spark.udtf.register("hkc_chunk_text", _chunk_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.chunk
        FROM documents d, LATERAL hkc_chunk_text(d.text, 256) c
        """
    )


def _explode_tokens(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas UDTF: 1 document row → N token rows."""
    for pdf in batches:
        toks = pdf["text"].str.split(" ")
        out = pdf[["doc_id"]].copy()
        out["token"] = toks
        yield out.explode("token")[["doc_id", "token"]]


@register(
    "udf_explode_tokens",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    """,
)
def udf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3 record-explosion (UDTF) analog: mapInPandas 1→N expansion,
    Arrow-batched both directions."""
    t = load_tables(spark, sf_dir)
    docs = parallelize_scan(t.documents.select("doc_id", "text"), "doc_id")
    return docs.mapInPandas(_explode_tokens, "doc_id bigint, token string")


@register(
    "udf_pandas_cosine_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT e.vec_id,
           ROUND(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
                 / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS score
    FROM embeddings e, q
    WHERE e.vec_id <> 0
    ORDER BY score DESC, e.vec_id ASC
    LIMIT 10
    """,
)
def udf_pandas_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H: Arrow-vectorized vector math — cosine scores computed in a
    pandas UDF with numpy, proving the Python fast path can carry the
    similarity hot loop when the expression tree (64 zip_with/
    aggregate lambdas per row JVM-side) becomes the bottleneck.

    Float determinism is the interesting part: numpy's np.dot uses
    pairwise/SIMD summation, which diverges from the engines'
    left-to-right fold in the last ulps and CAN flip a ROUND(…,4)
    boundary — so the kernel below accumulates dimension-by-dimension
    (vectorized across ROWS, sequential across the 64 dims), exactly
    reproducing the fold order of `functions.vectors.dot` and
    DuckDB's list_dot_product. Same numbers, still SIMD-wide over the
    batch. The query vector is a 1-row bounded driver hop (same
    contract as the IVF centroid materialization)."""
    import numpy as np

    t = load_tables(spark, sf_dir)
    qv = np.array(
        t.embeddings.filter(F.col("vec_id") == 0).head().embedding, dtype=np.float64
    )
    qn = 0.0
    for d in range(len(qv)):  # left-to-right fold, matching the oracle
        qn += qv[d] * qv[d]
    qnorm = float(np.sqrt(qn))

    @pandas_udf("double")
    def cos_score(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        dot = np.zeros(len(m))
        nrm = np.zeros(len(m))
        for d in range(m.shape[1]):  # fold order: dim 0 -> 63
            dot += m[:, d] * qv[d]
            nrm += m[:, d] * m[:, d]
        return pd.Series(dot / (np.sqrt(nrm) * qnorm))

    e = parallelize_scan(t.embeddings.filter(F.col("vec_id") != 0), "vec_id")
    return (
        e.select("vec_id", F.round(cos_score("embedding"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("vec_id"))
        .limit(10)
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, value,
             CAST(ROUND(value * 100) AS BIGINT) AS v100
      FROM events WHERE value IS NOT NULL
    ),
    st AS (
      SELECT user_id, COUNT(*) AS n,
             CAST(SUM(v100) AS BIGINT) AS s1,
             CAST(SUM(v100 * v100) AS BIGINT) AS s2
      FROM e GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.value,
           CASE WHEN st.n * st.s2 - st.s1 * st.s1 > 0
                THEN ROUND((e.v100 - st.s1 / CAST(st.n AS DOUBLE))
                           / sqrt(st.s2 / CAST(st.n AS DOUBLE)
                                  - (st.s1 / CAST(st.n AS DOUBLE))
                                    * (st.s1 / CAST(st.n AS DOUBLE))), 4)
                ELSE NULL END AS z
    FROM e JOIN st ON e.user_id = st.user_id
    """,
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.H grouped-MAP Arrow UDF (`applyInPandas`) — the remaining
    pandas extension point after scalar (udf_scalar_pandas), grouped
    AGG (udf_grouped_agg), and table functions (udf_udtf_chunks):
    each user's events arrive as ONE pandas DataFrame and leave
    re-shaped row-for-row, here z-scored within the user. This is the
    escape hatch for per-group logic no window function expresses
    (sklearn transforms, per-entity model scoring).

    Determinism inside the kernel follows the engine convention:
    2-dp values scale to exact int64 (v100), the moment sums s1/s2
    are exact integer arithmetic REGARDLESS of pandas row order, and
    the final mean/std/z expression is the same IEEE double chain the
    oracle runs — so an Arrow batch boundary or group-arrival order
    can never flip a value. Degenerate groups (zero variance, exact
    integer test n*s2-s1² == 0) emit NULL on both sides.

    Scale shape: applyInPandas shuffles once on the group key —
    exactly the exchange the window-function formulation would need —
    then streams Arrow batches; group state is 2 ints, never
    corpus-sized."""
    import numpy as np

    t = load_tables(spark, sf_dir)
    e = t.events.filter(F.col("value").isNotNull()).select(
        "event_id", "user_id", "value"
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v100 = np.rint(pdf["value"].to_numpy() * 100).astype(np.int64)
        n = len(v100)
        s1 = int(v100.sum())
        s2 = int((v100 * v100).sum())
        if n * s2 - s1 * s1 > 0:
            mean = s1 / n
            std = np.sqrt(s2 / n - mean * mean)
            z = (v100 - mean) / std  # raw; rounded JVM-side (np.round
            # is banker's — the engines' ROUND is half-away-from-zero)
        else:
            z = np.full(n, np.nan)
        out = pdf[["event_id", "user_id", "value"]].copy()
        out["z"] = z
        return out

    raw = e.groupBy("user_id").applyInPandas(
        zscore, "event_id long, user_id long, value double, z double"
    )
    return raw.select("event_id", "user_id", "value", F.round("z", 4).alias("z"))


# ------------------------------------------------- r6: mapInArrow


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-surface: `mapInArrow` — the LOWEST-overhead Python extension
    point: raw Arrow RecordBatches in/out, no pandas conversion at
    all (pyarrow.compute kernels are C++; Python only orchestrates
    per batch). This is the tier below pandas_udf for byte-level /
    columnar-native logic — at 100 TB the pandas materialization that
    mapInPandas pays per batch is pure overhead when the kernel is
    already Arrow-native. The fixture is ASCII so byte length ==
    char length and the oracle can replay both outputs."""
    import pyarrow as pa

    def kernel(batches):
        import pyarrow.compute as pc

        for batch in batches:
            t = pa.Table.from_batches([batch])
            text = t.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    t.column("doc_id").combine_chunks(),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()).combine_chunks(),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
                    ).combine_chunks(),
                ],
                names=["doc_id", "n_bytes", "n_ws_tokens"],
            )

    t = load_tables(spark, sf_dir)
    return t.documents.select("doc_id", "text").mapInArrow(
        kernel, "doc_id bigint, n_bytes bigint, n_ws_tokens bigint"
    )


# ------------------------------------------------- r6: pandas API on Spark


@register(
    "udf_pandas_api_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def udf_pandas_api_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-surface: pandas API on Spark (`pyspark.pandas`) — the
    migration surface for pandas-native users: a groupby-agg written
    in pandas idiom compiles to the SAME distributed plan the
    DataFrame API produces (no driver materialization; ps frames are
    lazy Spark plans). Pinned here so the engine's claim covers all
    four Python surfaces: row-free built-ins, Arrow UDFs,
    mapInArrow, and the pandas API."""
    import pyspark.pandas as ps

    t = load_tables(spark, sf_dir)
    psdf = t.documents.select("lang", "n_chars").pandas_api()
    agg = (
        psdf.groupby("lang")
        .agg({"n_chars": ["count", "sum", "max"]})
        .reset_index()
    )
    agg.columns = ["lang", "n_docs", "total_chars", "max_chars"]
    out = agg.to_spark()
    return out.select(
        "lang",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_chars").cast("long").alias("total_chars"),
        F.col("max_chars").cast("long").alias("max_chars"),
    )


# ------------------------------------------------- r10: grouped applyInArrow


@register(
    "udf_apply_in_arrow",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents GROUP BY lang
    """,
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-surface (Spark 4): ``groupBy().applyInArrow`` — the grouped
    custom-aggregation extension point one tier below applyInPandas:
    each group arrives as a raw Arrow table and the reducer runs
    pyarrow.compute C++ kernels with no pandas materialization (the
    same overhead argument as `udf_map_in_arrow`, applied to the
    grouped path). The shape every custom per-entity reducer takes —
    sketch builders, per-group model fits — when the kernel is
    already columnar-native. The group-level results are replayed by
    a plain SQL aggregate, proving the Arrow path computes what it
    claims.

    Scale: identical shuffle to a hash aggregate (exchange on the
    group key, then per-group batches); skew rules are the same as
    any groupBy — salt heavy keys before the apply."""
    import pyarrow as pa

    def reduce_group(table: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "lang": [table.column("lang")[0].as_py()],
                "n_docs": [table.num_rows],
                "total_chars": [pc.sum(table.column("n_chars")).as_py()],
                "min_doc": [pc.min(table.column("doc_id")).as_py()],
                "max_doc": [pc.max(table.column("doc_id")).as_py()],
            },
            schema=pa.schema(
                [
                    ("lang", pa.string()),
                    ("n_docs", pa.int64()),
                    ("total_chars", pa.int64()),
                    ("min_doc", pa.int64()),
                    ("max_doc", pa.int64()),
                ]
            ),
        )

    t = load_tables(spark, sf_dir)
    return (
        t.documents.select("lang", "doc_id", "n_chars")
        .groupBy("lang")
        .applyInArrow(
            reduce_group,
            "lang string, n_docs bigint, total_chars bigint, "
            "min_doc bigint, max_doc bigint",
        )
    )


# ------------------------------------------------- r10: SCALAR_ITER pandas UDF


@register(
    "udf_scalar_iter_pandas",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN (CAST(ROUND(o_totalprice * 100) AS BIGINT) * 25) // 1000 < 50
                THEN 50
                WHEN (CAST(ROUND(o_totalprice * 100) AS BIGINT) * 25) // 1000 > 10000
                THEN 10000
                ELSE (CAST(ROUND(o_totalprice * 100) AS BIGINT) * 25) // 1000
           END AS fee_cents
    FROM orders
    """,
)
def udf_scalar_iter_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H-surface: ITERATOR-form scalar pandas_udf (SCALAR_ITER) — the
    tier for UDFs with EXPENSIVE one-time setup (model weights, fee
    schedules, compiled regexes): the function receives the whole
    iterator of Arrow batches, so initialization runs ONCE per worker
    per task instead of once per batch — at 100 TB the difference
    between loading a tokenizer 10^6 times and 10^3 times. The body
    here loads a fee schedule (2.5% clipped to [50, 10000] cents)
    before the loop and applies it vectorized per batch; all-integer
    pandas arithmetic, so the SQL replay is exact.

    Completes the pandas-UDF tier table: SCALAR (udf_scalar_pandas),
    SCALAR_ITER (this), GROUPED_AGG (udf_grouped_agg), grouped map
    (udf_grouped_map_zscore), mapInPandas/mapInArrow/applyInArrow."""
    @pandas_udf("long")
    def fee(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        # one-time per-worker init (the point of SCALAR_ITER): the
        # "model" here is a fee schedule; a real pipeline loads
        # weights/vocab once here instead of per batch
        rate_bp, floor, cap = 25, 50, 10000
        for cents in batches:
            f = (cents * rate_bp) // 1000
            yield f.clip(lower=floor, upper=cap)

    t = load_tables(spark, sf_dir)
    from .common import mlong

    return t.orders.select(
        "o_orderkey", fee(mlong("o_totalprice")).alias("fee_cents")
    )
