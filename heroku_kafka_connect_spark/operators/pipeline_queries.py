"""Training-data-pipeline corpus queries (§2.J36-J43): the dataset
engineering steps between "raw corpus" and "training shards" —
deterministic splits, mixture weighting, quality signals, curriculum
batching, shard export. All SQL-oracled (the determinism rules from
operators/common.py apply: md5-prefix hashing for anything
key-addressed, ROUND(…,4) on float outputs, integer-exact counts).

Scale design: every query here is either a narrow projection (split,
repetition, shard assignment — they push to the scan and shuffle
nothing) or a map-side-combinable aggregation whose exchange carries
one row per (doc|bucket|source); the only window (`llm_length_buckets`)
partitions by the length bucket, the natural parallelism unit. Nothing
collects, nothing crosses, no Python in any hot path.
"""

from __future__ import annotations

import os
import tempfile
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_tables
from ..sinks import writers


from ..functions import text as T
from ..functions.text import STOPWORDS
from ..llmops import md5_prefix_bucket, sql_md5_prefix_bucket

#: canonical SQL stopword spelling — single definition in functions.text
from ..functions.text import SQL_STOP_EN as _SQL_STOP_EN


def _pct_bucket(key: Column) -> Column:
    return md5_prefix_bucket(key, 100)


_SQL_PCT = sql_md5_prefix_bucket("{k}", 100)


@register(
    "llm_split_train_eval",
    oracle=f"""
    SELECT doc_id, lang,
           {_SQL_PCT.format(k='doc_id')} AS bucket,
           CASE WHEN {_SQL_PCT.format(k='doc_id')} < 90 THEN 'train'
                WHEN {_SQL_PCT.format(k='doc_id')} < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def llm_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J36 deterministic train/val/test split (90/5/5): membership is
    a pure function of the key (md5-prefix mod 100), so the split is
    reproducible across engines, reruns, and cluster sizes, and
    NEVER leaks: a doc's split can be recomputed anywhere from its id
    alone — no assignment table to join, no shuffle, predicate pushes
    to the scan."""
    t = load_tables(spark, sf_dir)
    b = _pct_bucket(F.col("doc_id"))
    return t.documents.select(
        "doc_id",
        "lang",
        b.alias("bucket"),
        F.when(b < 90, F.lit("train")).when(b < 95, F.lit("val")).otherwise(F.lit("test")).alias(
            "split"
        ),
    )


@register(
    "llm_domain_mixture",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs,
             CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER () AS frac,
             POW(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 0.7) AS w_raw
      FROM c
    )
    SELECT source, n_docs,
           ROUND(frac, 4) AS frac,
           ROUND(w_raw / SUM(w_raw) OVER (), 4) AS weight,
           ROUND(LEAST(1.0, (w_raw / SUM(w_raw) OVER ()) * 10000.0 / n_docs), 4) AS sample_rate
    FROM w
    """,
)
def llm_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J37 temperature-reweighted domain mixture (τ=0.7, the
    multilingual-sampling idiom): upweights tail domains relative to
    their natural frequency, then converts the weight into a
    per-domain sampling rate against a 10k-doc budget. The aggregate
    is |domains| rows — the whole-frame windows run on a relation the
    size of the domain count, never the corpus."""
    t = load_tables(spark, sf_dir)
    c = t.documents.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    all_w = Window.partitionBy()
    frac = F.col("n_docs").cast("double") / F.sum("n_docs").over(all_w)
    w = c.select("source", "n_docs", frac.alias("frac"), F.pow(frac, 0.7).alias("w_raw"))
    weight = F.col("w_raw") / F.sum("w_raw").over(all_w)
    return w.select(
        "source",
        "n_docs",
        F.round("frac", 4).alias("frac"),
        F.round(weight, 4).alias("weight"),
        F.round(F.least(F.lit(1.0), weight * 10000.0 / F.col("n_docs")), 4).alias("sample_rate"),
    )


@register(
    "llm_char_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents
      WHERE text IS NOT NULL
    ),
    cnt AS (SELECT doc_id, c, COUNT(*) AS k FROM ch GROUP BY doc_id, c)
    SELECT doc_id,
           CAST(SUM(k) AS BIGINT) AS n_chars_t,
           COUNT(*) AS n_unique,
           CAST(ROUND((log2(SUM(k)) - SUM(CAST(ROUND(k * log2(k) * 1000000) AS BIGINT))
                       / 1000000.0 / SUM(k)) * 10000) AS BIGINT) / 10000.0 AS entropy
    FROM cnt GROUP BY doc_id
    """,
)
def llm_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J38 character-level Shannon entropy — the classic cheap
    perplexity proxy: gibberish and boilerplate both sit far from
    natural-language entropy (~4.1 bits/char for English). Computed
    as H = log2(n) − Σk·log2(k)/n over per-char counts, the
    factoring that needs only ONE map-side-combinable groupBy per
    (doc, char) plus a per-doc rollup — identical formula order in
    the oracle so the doubles agree to the 4-decimal round."""
    t = load_tables(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    ch = (
        t.documents.filter(F.col("text").isNotNull())
        .repartition(par, F.col("doc_id"))
        .select("doc_id", F.explode_outer(F.split(F.col("text"), "")).alias("c"))
    )
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    return cnt.groupBy("doc_id").agg(
        F.sum("k").alias("n_chars_t"),
        F.count(F.lit(1)).alias("n_unique"),
        (
            F.round(
                (
                    F.log2(F.sum("k"))
                    - F.sum(F.round(F.col("k") * F.log2("k") * 1_000_000).cast("long"))
                    / 1e6
                    / F.sum("k")
                )
                * 10000
            ).cast("long")
            / 10000.0
        ).alias("entropy"),
    )


@register(
    "llm_repetition_ratio",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             [array_to_string(toks[i:i+2], ' ')
              FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)] AS grams
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            WHERE text IS NOT NULL)
    )
    SELECT doc_id,
           CAST(len(grams) AS INTEGER) AS n_grams,
           CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
           ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 4) AS rep_ratio
    FROM g
    """,
)
def llm_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J39 intra-document repetition: 1 − distinct/total over
    NON-deduplicated 3-token grams — the standard boilerplate /
    degenerate-generation signal (Rae et al.'s repetition filters).
    Pure per-row JVM expression; nothing shuffles."""
    t = load_tables(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    g = t.documents.filter(F.col("text").isNotNull()).select("doc_id", grams.alias("grams"))
    return g.select(
        "doc_id",
        F.size("grams").alias("n_grams"),
        F.size(F.array_distinct("grams")).alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct("grams")).cast("double") / F.size("grams"), 4
        ).alias("rep_ratio"),
    )


@register(
    "llm_token_histogram",
    oracle="""
    WITH n AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
               WHERE text IS NOT NULL)
    SELECT n_tokens // 64 AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(n_tokens) AS INTEGER) AS min_tokens,
           CAST(MAX(n_tokens) AS INTEGER) AS max_tokens
    FROM n GROUP BY n_tokens // 64
    """,
)
def llm_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J40 token-length histogram in 64-token buckets — the input to
    batch-shape planning (packing budget, padding waste estimates).
    Integer bucket arithmetic (no float log buckets: floor(log2) has
    cross-engine edge cases at exact powers); one tiny aggregation."""
    t = load_tables(spark, sf_dir)
    n = t.documents.filter(F.col("text").isNotNull()).select(
        F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    bucket = F.floor(F.col("n_tokens") / F.lit(64)).cast("long")
    return n.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


_SQL_SHARD = sql_md5_prefix_bucket("doc_id", 16)


@register(
    "llm_shard_plan",
    oracle=f"""
    SELECT {_SQL_SHARD} AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc
    FROM documents
    GROUP BY {_SQL_SHARD}
    """,
)
def llm_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J41 deterministic shard assignment (md5-mod-16 on the key) +
    per-shard manifest — the write plan for a bucketed export: shard
    membership is engine/rerun-stable, shards are near-uniform
    regardless of key distribution (hash, not range), and the
    manifest is one map-side-combinable aggregation."""
    t = load_tables(spark, sf_dir)
    shard = md5_prefix_bucket(F.col("doc_id"), 16)
    return t.documents.groupBy(shard.alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


@lru_cache(maxsize=None)
def _export_dir(sf_dir: str) -> str:
    """Per-(process, fixture) export dir — same bounded-growth /
    no-cross-harness-race reasoning as sinks_queries._sink_dir."""
    return tempfile.mkdtemp(prefix="hkc_export_")


@register(
    "llm_export_shards",
    oracle=f"""
    SELECT {_SQL_SHARD} AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY {_SQL_SHARD}
    """,
)
def llm_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J42 sharded dataset export, round-tripped: write documents as
    parquet partitioned by the deterministic shard key (the layout a
    training loader consumes shard-by-shard), read the export back,
    and aggregate it — the oracle is the source table, so a lost or
    duplicated row in the write/read path fails the hash, not just
    the row count. At scale the partitionBy write is the standard
    one-pass bucketed export; maxRecordsPerFile bounds file sizes."""
    t = load_tables(spark, sf_dir)
    shard = md5_prefix_bucket(F.col("doc_id"), 16)
    out = os.path.join(_export_dir(sf_dir), "shards")
    writers.write_files(
        t.documents.withColumn("shard", shard),
        out,
        fmt="parquet",
        partition_by=["shard"],
        options={"maxRecordsPerFile": "100000"},
    )
    # partition-dir column comes back as int32 (inferred from the
    # directory name) — restore the written long type
    back = spark.read.parquet(out).withColumn("shard", F.col("shard").cast("long"))
    return back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "llm_length_buckets",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents WHERE text IS NOT NULL
    ),
    b AS (
      SELECT doc_id, n_tokens, n_tokens // 64 AS bucket,
             ROW_NUMBER() OVER (PARTITION BY n_tokens // 64 ORDER BY h, doc_id) AS rn
      FROM n
    )
    SELECT bucket, (rn - 1) // 32 AS batch_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens,
           CAST(MIN(n_tokens) AS INTEGER) AS min_tokens,
           CAST(MAX(n_tokens) AS INTEGER) AS max_tokens
    FROM b GROUP BY bucket, (rn - 1) // 32
    """,
)
def llm_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J43 length-bucketed batch assembly (curriculum/padding-
    efficient batching): docs bucket by length band, are shuffled
    WITHIN the band by a deterministic hash order (md5 of the id — a
    reproducible permutation, no RNG), and cut into 32-doc batches.
    Batch stats quantify padding waste (max−min spread per batch).
    The window partitions by the length bucket — the parallelism
    unit; at 100 TB add the shard key to the partition to bound any
    one band."""
    t = load_tables(spark, sf_dir)
    n = t.documents.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    bucket = F.floor(F.col("n_tokens") / F.lit(64)).cast("long")
    w = Window.partitionBy(bucket).orderBy("h", "doc_id")
    b = n.select(
        "doc_id", "n_tokens", bucket.alias("bucket"), F.row_number().over(w).alias("rn")
    )
    batch = F.floor((F.col("rn") - 1) / F.lit(32)).cast("long")
    return b.groupBy("bucket", batch.alias("batch_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("batch_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


@register(
    "llm_mix_sample",
    oracle="""
    WITH c AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    w AS (
      SELECT source, n_docs,
             POW(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (), 0.7) AS w_raw
      FROM c
    ),
    r AS (
      SELECT source, n_docs,
             CAST(round(LEAST(1.0, (w_raw / SUM(w_raw) OVER ()) * 10000.0 / n_docs)
                        * 10000) AS BIGINT) AS thresh
      FROM w
    )
    SELECT d.source, r.n_docs, r.thresh,
           CAST(COUNT(*) FILTER (
             CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
               % 10000 < r.thresh) AS BIGINT) AS n_kept
    FROM documents d JOIN r USING (source)
    GROUP BY d.source, r.n_docs, r.thresh
    """,
)
def llm_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J37 applied: turn the temperature-mixture sampling rates into
    an actual deterministic sample — each doc is kept iff its md5
    bucket (of 10k) clears its source's threshold, so the SAME docs
    are selected on every engine, rerun, and cluster size (the
    mixture stays reproducible across pipeline versions). Emits
    per-source kept counts for rate verification.

    Plan: the rate relation is |sources| rows computed from a
    |sources|-row aggregate — broadcast into the corpus scan; the
    corpus itself never shuffles until the final per-source count
    (map-side combinable). This is the 'build the training mix' step
    at 100 TB: one pass, no repartition of the data being mixed."""
    t = load_tables(spark, sf_dir)
    c = t.documents.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    all_w = Window.partitionBy()
    frac = F.col("n_docs").cast("double") / F.sum("n_docs").over(all_w)
    w = c.select("source", "n_docs", F.pow(frac, 0.7).alias("w_raw"))
    rate = F.least(
        F.lit(1.0), (F.col("w_raw") / F.sum("w_raw").over(all_w)) * 10000.0 / F.col("n_docs")
    )
    r = w.select("source", "n_docs", F.round(rate * 10000).cast("long").alias("thresh"))
    kept = F.when(
        md5_prefix_bucket(F.col("doc_id"), 10000) < F.col("thresh"), 1
    ).otherwise(0)
    return (
        t.documents.join(F.broadcast(r), "source")
        .groupBy("source", "n_docs", "thresh")
        .agg(F.sum(kept).cast("long").alias("n_kept"))
    )


@register(
    "llm_quality_apply",
    oracle=f"""
    WITH tc AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    s AS (
      SELECT doc_id,
             ROUND(SUM(length(token) * cnt) / CAST(SUM(cnt) AS DOUBLE), 4) AS mean_word_len,
             ROUND(COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 4) AS distinct_ratio,
             ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 4) AS top_token_frac,
             MAX(CASE WHEN token IN ({_SQL_STOP_EN})
                 THEN 1 ELSE 0 END) AS has_stopword
      FROM tc GROUP BY doc_id
    ),
    g AS (
      SELECT doc_id,
             ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 4) AS rep_ratio
      FROM (SELECT doc_id,
                   [array_to_string(toks[i:i+2], ' ')
                    FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)] AS grams
            FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))
    ),
    cnt AS (
      SELECT doc_id, c, COUNT(*) AS k
      FROM (SELECT doc_id, unnest(string_split(text, '')) AS c FROM documents)
      GROUP BY doc_id, c
    ),
    h AS (
      SELECT doc_id,
             CAST(ROUND((log2(SUM(k)) - SUM(CAST(ROUND(k * log2(k) * 1000000) AS BIGINT))
                       / 1000000.0 / SUM(k)) * 10000) AS BIGINT) / 10000.0 AS entropy
      FROM cnt GROUP BY doc_id
    )
    SELECT s.doc_id, s.mean_word_len, s.distinct_ratio, s.top_token_frac,
           s.has_stopword, g.rep_ratio, h.entropy,
           CASE
             WHEN s.mean_word_len NOT BETWEEN 3 AND 10 THEN 'word_len'
             WHEN s.distinct_ratio < 0.4 THEN 'diversity'
             WHEN s.top_token_frac > 0.1 THEN 'repetition'
             WHEN s.has_stopword = 0 THEN 'stopword'
             WHEN g.rep_ratio > 0.2 THEN 'boilerplate'
             WHEN h.entropy NOT BETWEEN 3.5 AND 5.0 THEN 'entropy'
             ELSE 'ok' END AS reason,
           CAST(CASE
             WHEN s.mean_word_len BETWEEN 3 AND 10
              AND s.distinct_ratio >= 0.4
              AND s.top_token_frac <= 0.1
              AND s.has_stopword = 1
              AND g.rep_ratio <= 0.2
              AND h.entropy BETWEEN 3.5 AND 5.0
             THEN 1 ELSE 0 END AS INT) AS keep
    FROM s JOIN g USING (doc_id) JOIN h USING (doc_id)
    """,
)
def llm_quality_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quality counterpart of `llm_dedup_apply`: every quality
    signal the engine computes — Gopher token rules, intra-doc
    3-gram repetition, char-level entropy — joined into ONE per-doc
    (keep, reason) decision, reasons assigned in a fixed rule order
    so a curation run can report WHY each doc fell. Thresholds sit
    at the fixture's decision-relevant quantiles (diversity >= 0.4
    and top-token <= 0.1 straddle the median) so both outcomes are
    exercised.

    Plan: three per-doc stat relations (token agg, per-row gram
    expr, char agg), each map-side combinable, joined on doc_id —
    co-partitioned after the first shuffle, no corpus re-scan per
    signal family at 100 TB. All threshold comparisons run on the
    ROUND(...,4) values, identically in both engines, so FP ulps
    can never flip a keep decision differently per engine."""
    from ..functions import text as T

    t = load_tables(spark, sf_dir)
    stop_en = STOPWORDS["en"]
    tc = (
        t.documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = tc.groupBy("doc_id").agg(
        F.round(
            F.sum(F.length("token") * F.col("cnt")) / F.sum("cnt").cast("double"), 4
        ).alias("mean_word_len"),
        F.round(F.count(F.lit(1)) / F.sum("cnt").cast("double"), 4).alias(
            "distinct_ratio"
        ),
        F.round(F.max("cnt") / F.sum("cnt").cast("double"), 4).alias("top_token_frac"),
        F.max(F.when(F.col("token").isin(*stop_en), 1).otherwise(0)).alias(
            "has_stopword"
        ),
    )
    toks = T.ws_tokens("text")  # same tokenizer as the token stats
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
    )
    g = t.documents.select(
        "doc_id",
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
            4,
        ).alias("rep_ratio"),
    )
    ch = t.documents.select(
        "doc_id", F.explode(F.split("text", "")).alias("c")
    ).groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k"))
    h = ch.groupBy("doc_id").agg(
        (
            F.round(
                (
                    F.log2(F.sum("k"))
                    - F.sum(F.round(F.col("k") * F.log2("k") * 1_000_000).cast("long"))
                    / 1e6
                    / F.sum("k")
                )
                * 10000
            ).cast("long")
            / 10000.0
        ).alias("entropy")
    )
    j = s.join(g, "doc_id").join(h, "doc_id")
    ok_len = F.col("mean_word_len").between(3, 10)
    ok_div = F.col("distinct_ratio") >= 0.4
    ok_rep = F.col("top_token_frac") <= 0.1
    ok_stop = F.col("has_stopword") == 1
    ok_boiler = F.col("rep_ratio") <= 0.2
    ok_ent = F.col("entropy").between(3.5, 5.0)
    reason = (
        F.when(~ok_len, "word_len")
        .when(~ok_div, "diversity")
        .when(~ok_rep, "repetition")
        .when(~ok_stop, "stopword")
        .when(~ok_boiler, "boilerplate")
        .when(~ok_ent, "entropy")
        .otherwise("ok")
    )
    keep = (ok_len & ok_div & ok_rep & ok_stop & ok_boiler & ok_ent).cast("int")
    return j.select(
        "doc_id",
        "mean_word_len",
        "distinct_ratio",
        "top_token_frac",
        "has_stopword",
        "rep_ratio",
        "entropy",
        reason.alias("reason"),
        keep.alias("keep"),
    )


@register(
    "llm_curriculum_order",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CASE WHEN n_chars < 250 THEN 0 WHEN n_chars < 400 THEN 1 ELSE 2 END AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT doc_id, bucket,
           CAST(ROW_NUMBER() OVER (ORDER BY bucket, h, doc_id) - 1 AS BIGINT) AS global_idx
    FROM b
    """,
)
def llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: every document gets a GLOBAL training
    ordinal — short docs first (stage 0/1/2 by length), shuffled
    within each stage by key hash. The oracle states it as one global
    ROW_NUMBER; the Spark plan computes the identical index WITHOUT a
    single-partition global window (the thing that deadlocks at
    100 TB): per-bucket counts (3 rows) -> prefix-sum offsets on that
    tiny relation -> bucket-partitioned row_number + offset. This
    offset+local-rank decomposition is the standard distributed
    global-index pattern — same answer, all parallelism preserved."""
    t = load_tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        F.when(F.col("n_chars") < 250, 0)
        .when(F.col("n_chars") < 400, 1)
        .otherwise(2)
        .alias("bucket"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
    # prefix sum over the |buckets|-row relation (3 rows — not the corpus)
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "bucket", F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("offset")
    )
    wrn = Window.partitionBy("bucket").orderBy("h", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(wrn))
        .join(F.broadcast(offs), "bucket")
        .select(
            "doc_id",
            "bucket",
            (F.col("offset") + F.col("rn") - 1).cast("long").alias("global_idx"),
        )
    )


@register(
    "llm_perplexity_buckets",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    total AS (SELECT SUM(cnt) AS n FROM vocab),
    s AS (
      SELECT t.doc_id,
             CAST(ROUND(-SUM(CAST(ROUND(log2(v.cnt / CAST(total.n AS DOUBLE))
                                        * 1000000) AS BIGINT))
                        / COUNT(*) / 100.0) AS BIGINT) / 10000.0 AS score
      FROM tok t JOIN vocab v USING (token), total
      GROUP BY t.doc_id
    ),
    hist AS (SELECT score, COUNT(*) AS c FROM s GROUP BY score),
    cum AS (
      SELECT score,
             COALESCE(SUM(c) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_lt
      FROM hist
    ),
    nd AS (SELECT COUNT(*) AS total_docs FROM s)
    SELECT s.doc_id, s.score,
           CAST((cum.cum_lt * 10) // nd.total_docs AS INTEGER) AS decile,
           (cum.cum_lt * 10) // nd.total_docs BETWEEN 1 AND 8 AS keep
    FROM s JOIN cum ON s.score = cum.score CROSS JOIN nd
    """,
)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-decile filter (CCNet's LM-quality split): score every
    doc by unigram cross-entropy, cut the corpus into exact deciles,
    keep the middle eight (tail deciles = boilerplate / rare-token
    soup). The decile is computed WITHOUT a corpus-wide NTILE window
    (single partition at scale): scores are 4-dp-rounded, so the
    score HISTOGRAM is a small relation — prefix-sum it for
    strictly-less cumulative counts and join back; decile =
    floor(10·cum_lt/N). Exact quantiles, tie-stable (equal scores
    share a decile), and the only corpus-sized exchanges are the LM
    build and the score agg — the same two TF-IDF already pays."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    s = (
        tok.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            # r8: micro-int per-token terms → order-invariant BIGINT sum;
            # decile cuts then bucket an engine-exact score, so the keep
            # decision can never flip on summation order.
            (
                F.round(
                    -F.sum(
                        F.round(
                            F.log2(F.col("cnt") / F.col("n").cast("double")) * 1_000_000
                        ).cast("long")
                    )
                    / F.count(F.lit(1))
                    / 100.0
                ).cast("long")
                / 10000.0
            ).alias("score")
        )
    )
    hist = s.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    # prefix sum over the |distinct scores| histogram — small relation
    wcum = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "score", F.coalesce(F.sum("c").over(wcum), F.lit(0)).alias("cum_lt")
    )
    nd = s.agg(F.count(F.lit(1)).alias("total_docs"))
    decile = F.floor((F.col("cum_lt") * 10) / F.col("total_docs"))
    return (
        s.join(F.broadcast(cum), "score")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "score",
            decile.cast("int").alias("decile"),
            decile.between(1, 8).alias("keep"),
        )
    )


#: shared oracle fragment: the LR quality scorer's feature + sigmoid
#: chain — reused by llm_quality_lr_score and the threshold sweep.
_LR_SQL = """
    WITH tc AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
      GROUP BY doc_id, token
    ),
    f AS (
      SELECT doc_id,
             ROUND(SUM(length(token) * cnt) / CAST(SUM(cnt) AS DOUBLE), 4) AS mean_word_len,
             ROUND(COUNT(*) / CAST(SUM(cnt) AS DOUBLE), 4) AS distinct_ratio,
             ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 4) AS top_token_frac
      FROM tc GROUP BY doc_id
    )
    SELECT doc_id, mean_word_len, distinct_ratio, top_token_frac,
           ROUND(1.0 / (1.0 + exp(-(
             -2.0 + 0.3 * mean_word_len + 4.0 * distinct_ratio
             - 6.0 * top_token_frac))), 4) AS p_keep,
           1.0 / (1.0 + exp(-(
             -2.0 + 0.3 * mean_word_len + 4.0 * distinct_ratio
             - 6.0 * top_token_frac))) >= 0.5 AS keep
    FROM f
"""


@register("llm_quality_lr_score", oracle=_LR_SQL)
def llm_quality_lr_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering as a columnar expression: a
    logistic-regression scorer with FIXED weights over engineered
    features — the structural stand-in for the fastText/LR quality
    classifiers real curation pipelines train (CCNet, GPT-3's
    WebText-similarity filter). The point at 100 TB: linear-model
    INFERENCE needs no Python and no model server — w·x + sigmoid
    compiles into whole-stage codegen next to the feature
    aggregation, so scoring is free once the features are computed.
    Swapping trained weights for these literals changes nothing
    structurally. Features are ROUND(…,4)-stabilized BEFORE the dot
    product (the quality_apply convention), so the sigmoid sees
    identical doubles in both engines and the 0.5 keep-threshold
    cannot flip."""
    tc = (
        load_tables(spark, sf_dir)
        .documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    f = tc.groupBy("doc_id").agg(
        F.round(
            F.sum(F.length("token") * F.col("cnt")) / F.sum("cnt").cast("double"), 4
        ).alias("mean_word_len"),
        F.round(F.count(F.lit(1)) / F.sum("cnt").cast("double"), 4).alias(
            "distinct_ratio"
        ),
        F.round(F.max("cnt") / F.sum("cnt").cast("double"), 4).alias("top_token_frac"),
    )
    z = (
        -2.0
        + 0.3 * F.col("mean_word_len")
        + 4.0 * F.col("distinct_ratio")
        - 6.0 * F.col("top_token_frac")
    )
    p = 1.0 / (1.0 + F.exp(-z))
    return f.select(
        "doc_id",
        "mean_word_len",
        "distinct_ratio",
        "top_token_frac",
        F.round(p, 4).alias("p_keep"),
        (p >= 0.5).alias("keep"),
    )


@register(
    "llm_quality_threshold_sweep",
    oracle=f"""
    WITH lr AS ({_LR_SQL}),
    b AS (
      SELECT CAST(ROUND(p_keep * 10000) AS BIGINT) // 500 AS bin,
             COUNT(*) AS cnt
      FROM lr GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM b),
    grid AS (SELECT unnest(generate_series(1, 19)) AS k)
    SELECT ROUND(grid.k * 0.05, 2) AS threshold,
           CAST(COALESCE(SUM(CASE WHEN b.bin >= grid.k THEN b.cnt END), 0)
                AS BIGINT) AS n_keep,
           ROUND(COALESCE(SUM(CASE WHEN b.bin >= grid.k THEN b.cnt END), 0)
                 / CAST(tot.total AS DOUBLE), 4) AS keep_frac
    FROM grid CROSS JOIN tot LEFT JOIN b ON TRUE
    GROUP BY grid.k, tot.total
    """,
)
def llm_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve for the LR quality filter: how many documents
    survive at every cut threshold 0.05..0.95? This is the knob-tuning
    artifact a curation run produces BEFORE committing to a threshold
    — pick the point where keep_frac meets the token budget. Built on
    the same scorer chain as llm_quality_lr_score (shared _LR_SQL
    fragment), thresholded in EXACT integer score space: p_keep is
    already ROUND(...,4)-stabilized, so scaling by 10^4 gives exact
    ints and `p >= k*0.05` becomes the integer comparison
    `bin >= k` with bin = p4 // 500 — no float boundary can flip a
    count between engines.

    Scale shape: per-doc scores collapse to a <=21-row bin histogram
    FIRST (map-side combinable agg); the 19-point grid sweeps that
    tiny relation, never the corpus — the cross product is 19x21
    rows, not 19x|docs|."""
    scores = llm_quality_lr_score(spark, sf_dir)
    b = (
        scores.select(
            (F.round(F.col("p_keep") * 10000).cast("long") / F.lit(500))
            .cast("long")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = b.agg(F.sum("cnt").alias("total"))
    grid = spark.range(1, 20).select(F.col("id").alias("k"))
    kept = F.sum(F.when(F.col("bin") >= F.col("k"), F.col("cnt")))
    return (
        grid.crossJoin(F.broadcast(total))
        .join(F.broadcast(b), F.lit(True), "left")
        .groupBy("k", "total")
        .agg(
            F.coalesce(kept, F.lit(0)).alias("n_keep"),
            F.round(
                F.coalesce(kept, F.lit(0)) / F.col("total").cast("double"), 4
            ).alias("keep_frac"),
        )
        .select(
            F.round(F.col("k") * 0.05, 2).alias("threshold"), "n_keep", "keep_frac"
        )
    )


@register(
    "llm_policy_iou",
    oracle=f"""
    WITH {T.SQL_GOPHER_STATS.format(src='documents')},
    pol AS (
      SELECT doc_id,
             CASE WHEN {T.SQL_GOPHER_PASS}
                  THEN 1 ELSE 0 END AS g,
             CASE WHEN 1.0 / (1.0 + exp(-(
                    -2.0 + 0.3 * ROUND(n_token_chars / CAST(n_tokens AS DOUBLE), 4)
                    + 4.0 * ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 4)
                    - 6.0 * ROUND(top_cnt / CAST(n_tokens AS DOUBLE), 4)))) >= 0.5
                  THEN 1 ELSE 0 END AS l
      FROM s
    )
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(g * l) AS BIGINT) AS both_keep,
           CAST(SUM(g * (1 - l)) AS BIGINT) AS only_gopher,
           CAST(SUM((1 - g) * l) AS BIGINT) AS only_lr,
           CAST(SUM((1 - g) * (1 - l)) AS BIGINT) AS neither,
           ROUND(SUM(g * l) / CAST(SUM(CASE WHEN g = 1 OR l = 1 THEN 1 ELSE 0 END)
                 AS DOUBLE), 4) AS keep_iou,
           ROUND((SUM(g * l) + SUM((1 - g) * (1 - l))) / CAST(COUNT(*) AS DOUBLE), 4)
             AS agreement
    FROM pol
    """,
)
def llm_policy_iou(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-policy ablation report: how much do the RULE-based
    filter (Gopher bundle, J49) and the MODEL-based filter (fixed-
    weight LR scorer, J107) agree on the same corpus? Emits the
    keep/keep confusion matrix, IoU of the kept sets, and raw
    agreement — the number a curation team checks before swapping
    policies (a low IoU means the swap rewrites the corpus, not just
    re-ranks it).

    The rule arm is SINGLE-SOURCED: thresholds, the stats front and
    the verdict come from functions.text's Gopher bundle (shared with
    text_gopher_rules and llm_curation_pipeline), so the comparison
    can never run against a stale rule variant. The LR arm restates
    llm_quality_lr_score's fixed weights — keep those two in sync.

    Scale: ONE shared (doc, token, cnt) front half feeds BOTH
    policies — the rules read raw ratios, the LR reads the
    ROUND(...,4)-stabilized features, exactly as their standalone
    queries do — then everything collapses in a single 1-row fold.
    Two map-side-combinable exchanges total; adding a third policy
    costs one more expression, not another corpus pass."""
    tc = (
        load_tables(spark, sf_dir)
        .documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = T.gopher_token_stats(tc)
    mean_len = F.col("n_token_chars") / F.col("n_tokens").cast("double")
    diversity = F.col("n_distinct") / F.col("n_tokens").cast("double")
    top_frac = F.col("top_cnt") / F.col("n_tokens").cast("double")
    g = T.gopher_pass().cast("int")
    z = (
        -2.0
        + 0.3 * F.round(mean_len, 4)
        + 4.0 * F.round(diversity, 4)
        - 6.0 * F.round(top_frac, 4)
    )
    l = (1.0 / (1.0 + F.exp(-z)) >= 0.5).cast("int")
    pol = s.select(g.alias("g"), l.alias("l"))
    either = F.sum(F.when((F.col("g") == 1) | (F.col("l") == 1), 1).otherwise(0))
    return pol.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("g") * F.col("l")).alias("both_keep"),
        F.sum(F.col("g") * (1 - F.col("l"))).alias("only_gopher"),
        F.sum((1 - F.col("g")) * F.col("l")).alias("only_lr"),
        F.sum((1 - F.col("g")) * (1 - F.col("l"))).alias("neither"),
        F.round(
            F.sum(F.col("g") * F.col("l")) / either.cast("double"), 4
        ).alias("keep_iou"),
        F.round(
            (
                F.sum(F.col("g") * F.col("l"))
                + F.sum((1 - F.col("g")) * (1 - F.col("l")))
            )
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("agreement"),
    )


# ------------------------------------------------- r7: hashing-trick features


_SQL_FEAT_BUCKET = sql_md5_prefix_bucket("token", 256)


@register(
    "llm_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    hashed AS (
      SELECT doc_id, token, {_SQL_FEAT_BUCKET} AS bucket FROM tok
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS n_distinct_tokens,
           CAST(COUNT(DISTINCT bucket) AS BIGINT) AS n_buckets,
           ROUND(1.0 - COUNT(DISTINCT bucket) / CAST(COUNT(DISTINCT token) AS DOUBLE), 5)
             AS collision_rate
    FROM hashed
    GROUP BY doc_id
    """,
)
def llm_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick feature extraction (Weinberger et al., ICML 2009
    — the fixed-width sparse featurizer behind Vowpal-Wabbit-style
    linear models): token → md5-bucket in [0, 256); per-doc report of
    feature-space occupancy and the collision rate the dimensionality
    squeeze costs. The md5 bucket is THE portable hash idiom
    (llmops.md5_prefix_bucket) so the oracle replays it bit-exactly.

    Scale: tokenize-explode is narrow; the per-doc distinct counts
    are partial-aggregated per map task before the doc_id shuffle
    (two-stage distinct). No vocabulary table is ever materialized —
    that is the point of the hashing trick: memory is O(width), not
    O(|vocab|), which is why it survives a 100 TB corpus where a
    dictionary-based featurizer needs a 10⁹-row broadcast."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
    hashed = tok.withColumn("bucket", md5_prefix_bucket(F.col("token"), 256))
    return hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("token").alias("n_distinct_tokens"),
        F.countDistinct("bucket").alias("n_buckets"),
        F.round(
            1.0 - F.countDistinct("bucket") / F.countDistinct("token").cast("double"), 5
        ).alias("collision_rate"),
    )


# ------------------------------------------------- r7: DSIR importance resampling


_SQL_ACCEPT_FRAC = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 10000"
)


@register(
    "llm_importance_resample",
    oracle=f"""
    WITH tok AS (
      SELECT d.doc_id, d.lang, unnest(string_split(d.text, ' ')) AS token
      FROM documents d
    ),
    cnt_all AS (SELECT token, COUNT(*) AS ca FROM tok GROUP BY token),
    cnt_tgt AS (SELECT token, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY token),
    consts AS (
      SELECT (SELECT CAST(SUM(ca) AS DOUBLE) FROM cnt_all) AS na,
             (SELECT CAST(COALESCE(SUM(ct), 0) AS DOUBLE) FROM cnt_tgt) AS nt,
             (SELECT CAST(COUNT(*) AS DOUBLE) FROM cnt_all) AS v
    ),
    scored AS (
      SELECT t.doc_id, t.lang,
             COUNT(*) AS n_tokens,
             SUM(CAST(ROUND((ln((COALESCE(g.ct, 0) + 0.5) / (c.nt + 0.5 * c.v))
                 - ln((a.ca + 0.5) / (c.na + 0.5 * c.v))) * 1000000) AS BIGINT)) AS log_w6
      FROM tok t
      JOIN cnt_all a USING (token)
      LEFT JOIN cnt_tgt g USING (token), consts c
      GROUP BY t.doc_id, t.lang
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(ROUND(log_w6 / 100.0) AS BIGINT) / 10000.0 AS log_weight,
           ({_SQL_ACCEPT_FRAC}) * 100
             < CAST(ROUND(exp(LEAST(0.0, log_w6 / 1000000.0)) * 1000000) AS BIGINT) AS accepted
    FROM scored
    """,
)
def llm_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et
    al., NeurIPS 2023): hashed-unigram LMs for the TARGET domain
    (lang='en' here) and the RAW corpus give per-doc importance
    weights log w = Σ_tokens [ln p_tgt(w) − ln p_raw(w)] (+0.5
    add-k smoothing on both, shared vocab normalizer); docs are then
    kept by a deterministic md5-uniform draw against min(1, w) —
    the portable stand-in for the Gumbel/Bernoulli resample. On the
    shared-vocab synthetic fixture the two LMs are near-identical,
    so weights sit near 0 — the discrimination is honest, not
    manufactured; on a real mixed-domain corpus the same plan
    separates domains sharply.

    Determinism: each per-token log-ratio is quantized to an INTEGER
    micro-unit BEFORE the sum (the llm_token_zipf idiom), so the
    per-doc reduce is an order-invariant BIGINT sum — identical under
    any partitioning and in any engine. The accept decision then
    compares two integers: the md5 draw scaled to micro-units vs
    round(exp(min(0, log_w))·1e6) — no FP ulp can flip the
    hash-checked boolean (pinned by the partitioning-invariance test
    in tests/test_round8_ops.py).

    Scale: both LM count tables are |vocab|-bounded aggs off ONE
    tokenize-explode; the scoring join is token-keyed (broadcast
    while the LM fits); scalars (N_tgt, N_raw, |V|) are a 1-row
    broadcast. The accept draw is a pure projection — no RNG state,
    re-runs bit-identical, exactly like llm_sample_hash."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", "lang", F.explode(T.ws_tokens("text")).alias("token"))
    cnt_all = tok.groupBy("token").agg(F.count(F.lit(1)).alias("ca"))
    cnt_tgt = (
        tok.filter(F.col("lang") == "en").groupBy("token").agg(F.count(F.lit(1)).alias("ct"))
    )
    consts = cnt_all.agg(
        F.sum("ca").cast("double").alias("na"),
        F.count(F.lit(1)).cast("double").alias("v"),
    ).crossJoin(cnt_tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("double").alias("nt")))
    ratio = F.log((F.coalesce(F.col("ct"), F.lit(0)) + 0.5) / (F.col("nt") + 0.5 * F.col("v"))) - F.log(
        (F.col("ca") + 0.5) / (F.col("na") + 0.5 * F.col("v"))
    )
    scored = (
        tok.join(cnt_all, "token")
        .join(cnt_tgt, "token", "left")
        .crossJoin(consts)  # 1-row broadcast
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.round(ratio * 1_000_000).cast("long")).alias("log_w6"),
        )
    )
    from ..llmops import md5_prefix_bucket

    log_w = F.col("log_w6") / 1e6
    thr6 = F.round(F.exp(F.least(F.lit(0.0), log_w)) * 1_000_000).cast("long")
    frac6 = (md5_prefix_bucket(F.col("doc_id"), 10000) * 100).cast("long")
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        # 4-dp value derived integer-exactly from the micro sum (x/100.0 is
        # one IEEE-exact division; round-half at .5 is identical cross-engine
        # on exact halves, unlike ROUND(double, 4) of a repeating binary).
        (F.round(F.col("log_w6") / 100.0).cast("long") / 10000.0).alias("log_weight"),
        (frac6 < thr6).alias("accepted"),
    )


# ------------------------------------------------- r8: DoReMi-style reweighting


@register(
    "llm_doremi_reweight",
    oracle="""
    WITH ch AS (
      SELECT doc_id, source, unnest(string_split(text, '')) AS c FROM documents
      WHERE text IS NOT NULL
    ),
    cnt AS (SELECT doc_id, source, c, COUNT(*) AS k FROM ch GROUP BY doc_id, source, c),
    doc_ent AS (
      SELECT doc_id, source,
             CAST(ROUND((log2(SUM(k)) - SUM(CAST(ROUND(k * log2(k) * 1000000) AS BIGINT))
                         / 1000000.0 / SUM(k)) * 10000) AS BIGINT) AS ent_e4
      FROM cnt GROUP BY doc_id, source
    ),
    src AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(ent_e4) AS BIGINT) AS sum_e4
      FROM doc_ent GROUP BY source
    ),
    ref AS (
      SELECT CAST(SUM(sum_e4) AS BIGINT) AS tot_e4, CAST(SUM(n_docs) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_src
      FROM src
    ),
    excess AS (
      SELECT s.source, s.n_docs,
             CAST(ROUND(CAST(s.sum_e4 AS DOUBLE) / s.n_docs) AS BIGINT) AS loss_e4,
             GREATEST(0, CAST(ROUND(CAST(s.sum_e4 AS DOUBLE) / s.n_docs) AS BIGINT)
                         - CAST(ROUND(CAST(r.tot_e4 AS DOUBLE) / r.n) AS BIGINT)) AS excess_e4,
             r.n_src
      FROM src s CROSS JOIN ref r
    ),
    scored AS (
      SELECT source, n_docs, loss_e4, excess_e4, n_src,
             CAST(ROUND(EXP(excess_e4 / 10000.0) * 1000000000) AS BIGINT) AS boost_nano
      FROM excess
    ),
    z AS (SELECT CAST(SUM(boost_nano) AS BIGINT) AS z FROM scored)
    SELECT s.source, s.n_docs,
           s.loss_e4 / 10000.0 AS proxy_loss,
           s.excess_e4 / 10000.0 AS excess_loss,
           CAST(ROUND(1000000.0 / s.n_src) AS BIGINT) / 1000000.0 AS weight_uniform,
           CAST(ROUND(1000000.0 * s.boost_nano / z.z) AS BIGINT) / 1000000.0 AS weight_doremi
    FROM scored s CROSS JOIN z
    """,
)
def llm_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al., NeurIPS'23 —
    'Doremi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining'): one exponentiated-gradient step on the domain
    mixture, upweighting sources whose proxy loss EXCEEDS the
    corpus reference — w'_s ∝ uniform · exp(η·excess_s), η=1. The
    proxy loss here is the char-entropy perplexity proxy (J38's
    exact integer-scaled spelling, shared so the two queries cannot
    drift); production swaps in a proxy-model loss column and keeps
    this plan.

    Determinism: per-doc entropies are e4-scaled BIGINTs; per-source
    and reference means derive by round-to-integer; exp() outputs
    are nano-quantized BEFORE the normalizing sum, so the softmax
    denominator is an order-invariant BIGINT. Scale: one (doc, char)
    agg + per-source rollup (both map-side-combinable) and
    |sources|-row tail relations."""
    t = load_tables(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    ch = (
        t.documents.filter(F.col("text").isNotNull())
        .repartition(par, F.col("doc_id"))
        .select("doc_id", "source", F.explode_outer(F.split(F.col("text"), "")).alias("c"))
    )
    cnt = ch.groupBy("doc_id", "source", "c").agg(F.count(F.lit(1)).alias("k"))
    doc_ent = cnt.groupBy("doc_id", "source").agg(
        F.round(
            (
                F.log2(F.sum("k"))
                - F.sum(F.round(F.col("k") * F.log2("k") * 1_000_000).cast("long"))
                / 1e6
                / F.sum("k")
            )
            * 10000
        )
        .cast("long")
        .alias("ent_e4")
    )
    src = doc_ent.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("ent_e4").alias("sum_e4")
    )
    ref = src.agg(
        F.sum("sum_e4").alias("tot_e4"),
        F.sum("n_docs").alias("n"),
        F.count(F.lit(1)).alias("n_src"),
    )
    loss = F.round(F.col("sum_e4").cast("double") / F.col("n_docs")).cast("long")
    ref_loss = F.round(F.col("tot_e4").cast("double") / F.col("n")).cast("long")
    excess = src.crossJoin(F.broadcast(ref)).select(
        "source",
        "n_docs",
        loss.alias("loss_e4"),
        F.greatest(F.lit(0), loss - ref_loss).alias("excess_e4"),
        "n_src",
    )
    scored = excess.withColumn(
        "boost_nano",
        F.round(F.exp(F.col("excess_e4") / 10000.0) * 1_000_000_000).cast("long"),
    )
    z = scored.agg(F.sum("boost_nano").alias("z"))
    return scored.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        (F.col("loss_e4") / 10000.0).alias("proxy_loss"),
        (F.col("excess_e4") / 10000.0).alias("excess_loss"),
        (F.round(F.lit(1000000.0) / F.col("n_src")).cast("long") / 1000000.0).alias("weight_uniform"),
        (F.round(F.lit(1000000.0) * F.col("boost_nano") / F.col("z")).cast("long") / 1000000.0).alias("weight_doremi"),
    )


# ------------------------------------------------- r8: calibration (ECE)


@register(
    "llm_quality_calibration",
    oracle=f"""
    WITH {T.SQL_GOPHER_STATS.format(src='documents')},
    f AS (
      SELECT doc_id,
             ROUND(n_token_chars / CAST(n_tokens AS DOUBLE), 4) AS mean_word_len,
             ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 4) AS distinct_ratio,
             ROUND(top_cnt / CAST(n_tokens AS DOUBLE), 4) AS top_token_frac,
             CASE WHEN {T.SQL_GOPHER_PASS} THEN 1 ELSE 0 END AS label
      FROM s
    ),
    scored AS (
      SELECT doc_id, label,
             CAST(ROUND(10000 * ROUND(1.0 / (1.0 + exp(-(
               -2.0 + 0.3 * mean_word_len + 4.0 * distinct_ratio
               - 6.0 * top_token_frac))), 4)) AS BIGINT) AS p_e4
      FROM f
    ),
    binned AS (
      SELECT CAST(LEAST(9, p_e4 // 1000) AS INTEGER) AS bin,
             COUNT(*) AS n,
             CAST(SUM(p_e4) AS BIGINT) AS sum_p_e4,
             CAST(SUM(label) AS BIGINT) AS n_pos
      FROM scored GROUP BY 1
    ),
    tot AS (SELECT SUM(n) AS nt FROM binned)
    SELECT b.bin, CAST(b.n AS BIGINT) AS n,
           CAST(ROUND(CAST(b.sum_p_e4 AS DOUBLE) / b.n) AS BIGINT) / 10000.0 AS confidence,
           CAST(ROUND(10000.0 * b.n_pos / b.n) AS BIGINT) / 10000.0 AS accuracy,
           ABS(CAST(ROUND(CAST(b.sum_p_e4 AS DOUBLE) / b.n) AS BIGINT)
               - CAST(ROUND(10000.0 * b.n_pos / b.n) AS BIGINT)) / 10000.0 AS gap,
           CAST(SUM(b.n * ABS(CAST(ROUND(CAST(b.sum_p_e4 AS DOUBLE) / b.n) AS BIGINT)
                              - CAST(ROUND(10000.0 * b.n_pos / b.n) AS BIGINT))) OVER ()
                AS BIGINT) / CAST(t.nt AS DOUBLE) / 10000.0 AS ece
    FROM binned b CROSS JOIN tot t
    """,
)
def llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration readout for the LR quality scorer (reliability
    bins + expected calibration error, Naeini et al. AAAI'15): the
    scorer's p_keep is binned into deciles of confidence, each bin
    reporting mean confidence vs empirical accuracy against the
    Gopher rule bundle as reference labels, and ECE = Σ n_b/N·|acc−
    conf| — the standard check that a quality filter's scores MEAN
    what they say before anyone thresholds on them (the J116 sweep
    picks a cutoff; this validates the scale it's picked on).

    Determinism: p_keep is the 4-dp-pinned sigmoid (J107's exact
    spelling from the shared tc relation), so p_e4 is an exact
    integer; per-bin confidence/accuracy derive by round-to-integer
    of BIGINT ratios and the ECE sum runs over ≤10 e4-int gaps.
    Scale: ONE token-count pass feeds both the features and the
    labels; everything after the per-doc agg is a 10-row relation
    (allowlisted whole-frame window)."""
    tc = (
        load_tables(spark, sf_dir)
        .documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = T.gopher_token_stats(tc)
    f = stats.select(
        "doc_id",
        F.round(F.col("n_token_chars") / F.col("n_tokens").cast("double"), 4).alias("mean_word_len"),
        F.round(F.col("n_distinct") / F.col("n_tokens").cast("double"), 4).alias("distinct_ratio"),
        F.round(F.col("top_cnt") / F.col("n_tokens").cast("double"), 4).alias("top_token_frac"),
        T.gopher_pass().cast("int").alias("label"),
    )
    p = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -(
                    F.lit(-2.0)
                    + F.lit(0.3) * F.col("mean_word_len")
                    + F.lit(4.0) * F.col("distinct_ratio")
                    - F.lit(6.0) * F.col("top_token_frac")
                )
            )
        ),
        4,
    )
    scored = f.select(
        "label", F.round(F.lit(10000) * p).cast("long").alias("p_e4")
    )
    binned = scored.groupBy(
        F.least(F.lit(9), F.floor(F.col("p_e4") / 1000)).cast("int").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_e4").alias("sum_p_e4"),
        F.sum("label").alias("n_pos"),
    )
    tot = binned.agg(F.sum("n").alias("nt"))
    conf_e4 = F.round(F.col("sum_p_e4").cast("double") / F.col("n")).cast("long")
    acc_e4 = F.round(F.lit(10000.0) * F.col("n_pos") / F.col("n")).cast("long")
    w_all = Window.partitionBy()
    return binned.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n",
        (conf_e4 / 10000.0).alias("confidence"),
        (acc_e4 / 10000.0).alias("accuracy"),
        (F.abs(conf_e4 - acc_e4) / 10000.0).alias("gap"),
        (
            F.sum(F.col("n") * F.abs(conf_e4 - acc_e4)).over(w_all).cast("long")
            / F.col("nt").cast("double")
            / 10000.0
        ).alias("ece"),
    )


# ------------------------------------------------- r9: multinomial Naive Bayes lang-id


@register(
    "llm_nb_langid",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cls AS (
      SELECT lang,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS total_toks
      FROM toks GROUP BY lang
    ),
    n AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM cls),
    vocab AS (SELECT DISTINCT tok FROM toks),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS vsize FROM vocab),
    cnt AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY lang, tok),
    grid AS (
      SELECT vo.tok, cl.lang,
             CAST(ROUND(1000000.0 * ln(CAST(COALESCE(ct.c, 0) + 1 AS DOUBLE)
                                       / (cl.total_toks + v.vsize))) AS BIGINT) AS ll
      FROM vocab vo CROSS JOIN cls cl CROSS JOIN v
      LEFT JOIN cnt ct ON ct.tok = vo.tok AND ct.lang = cl.lang
    ),
    prior AS (
      SELECT lang, CAST(ROUND(1000000.0 * ln(CAST(n_docs AS DOUBLE) / n.n_total)) AS BIGINT) AS p
      FROM cls CROSS JOIN n
    ),
    scores AS (
      SELECT t.doc_id, t.lang AS true_lang, g.lang AS cand_lang,
             pr.p + SUM(g.ll) AS score_micro
      FROM toks t JOIN grid g ON g.tok = t.tok
      JOIN prior pr ON pr.lang = g.lang
      GROUP BY t.doc_id, t.lang, g.lang, pr.p
    ),
    best AS (
      SELECT doc_id, true_lang, cand_lang, score_micro,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY score_micro DESC, cand_lang ASC) AS rn
      FROM scores
    )
    SELECT doc_id, true_lang AS lang, cand_lang AS pred_lang,
           score_micro / 1000000.0 AS nb_logprob,
           cand_lang = true_lang AS correct
    FROM best WHERE rn = 1
    """,
)
def llm_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, TRAIN + APPLY in
    one job (the McCallum & Nigam '98 event model with Laplace α=1):
    per-class token log-likelihoods ln((count+1)/(total_c+|V|)) and
    log-priors from the corpus, then per-doc argmax — the trainable
    complement of text_langid's fixed n-gram heuristic, and the same
    shape as a fastText-style quality/domain classifier a curation
    pipeline trains on weak labels.

    FULLY RELATIONAL train+apply — no pivot to per-class columns, no
    driver collect: the model is the (token × class) GRID relation
    (dense via vocab ⨯ classes left-joined with counts, so
    unseen-(token, class) smoothing terms exist as rows), scoring is
    one join of exploded tokens against the grid followed by a
    per-(doc, class) sum, and the argmax is a per-doc window with
    integer compares. Every ln() term is quantized to micro-ints
    BEFORE the additive reduce (order-invariant BIGINT sums, the
    corpus idiom), so scores and decisions are engine-exact. Scale:
    grid is |V|·|classes| (linear in vocab), scoring fan-out is
    |token occurrences|·1 (the grid join matches each occurrence to
    |classes| rows — still linear), and the final window partitions
    by doc."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    cls = toks.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("total_toks"),
    )
    n_total = cls.agg(F.sum("n_docs").alias("n_total"))
    vocab = toks.select("tok").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).alias("vsize"))
    cnt = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    grid = (
        vocab.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(vsize))
        .join(cnt, ["lang", "tok"], "left")
        .select(
            "tok",
            "lang",
            F.round(
                F.lit(1000000.0)
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("total_toks") + F.col("vsize"))
                )
            )
            .cast("long")
            .alias("ll"),
        )
    )
    prior = cls.crossJoin(F.broadcast(n_total)).select(
        "lang",
        F.round(
            F.lit(1000000.0) * F.log(F.col("n_docs").cast("double") / F.col("n_total"))
        )
        .cast("long")
        .alias("p"),
    )
    scores = (
        toks.select("doc_id", F.col("lang").alias("true_lang"), "tok")
        .join(grid.select(F.col("lang").alias("cand_lang"), "tok", "ll"), "tok")
        .groupBy("doc_id", "true_lang", "cand_lang")
        .agg(F.sum("ll").alias("ll_sum"))
        .join(F.broadcast(prior.select(F.col("lang").alias("cand_lang"), "p")), "cand_lang")
        .select(
            "doc_id", "true_lang", "cand_lang", (F.col("p") + F.col("ll_sum")).alias("score_micro")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("cand_lang").asc()
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("true_lang").alias("lang"),
            F.col("cand_lang").alias("pred_lang"),
            (F.col("score_micro") / 1000000.0).alias("nb_logprob"),
            (F.col("cand_lang") == F.col("true_lang")).alias("correct"),
        )
    )
