"""Text-analysis corpus queries (functions/text.py), all SQL-oracled."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import llmops
from ..functions import text as T
from ..functions.text import STOPWORDS
from ..registry import register

#: canonical SQL stopword spelling — single definition in functions.text
from ..functions.text import SQL_STOP_EN as _SQL_STOP_EN
from ..session import load_tables


@register(
    "llm_text_wordcount",
    oracle="""
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 20
    """,
)
def llm_text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I6 tokenize + top-20 word count. Map-side partial agg shrinks
    the shuffle to |vocab| regardless of corpus size."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.select(F.explode(T.ws_tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@register(
    "llm_text_lang_stats",
    oracle="""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang, source
    """,
)
def llm_text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I7 per-(lang, source) corpus stats (integer-exact aggregates)."""
    t = load_tables(spark, sf_dir)
    return t.documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "llm_text_filter",
    oracle="""
    SELECT doc_id, lang, n_chars FROM documents
    WHERE n_chars BETWEEN 100 AND 400
      AND lang IN ('en', 'de')
      AND regexp_matches(text, '\\bspark\\b')
    """,
)
def llm_text_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """I8 content filter: length band + language + regex content."""
    t = load_tables(spark, sf_dir)
    return t.documents.filter(
        F.col("n_chars").between(100, 400)
        & F.col("lang").isin("en", "de")
        & F.col("text").rlike(r"\bspark\b")
    ).select("doc_id", "lang", "n_chars")


@register(
    "text_langid",
    oracle=f"""
    SELECT doc_id,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                     t -> t IN ({_SQL_STOP_EN}))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4) AS en_stopword_ratio,
           CASE WHEN len(list_filter(string_split(text, ' '),
                     t -> t IN ({_SQL_STOP_EN}))) > 0
                THEN 'en' ELSE 'unknown' END AS lang_guess
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit ratio (the fixture corpus
    is English word-soup, so the en-list dominates; the library
    computes the full argmax across 4 language lists)."""
    t = load_tables(spark, sf_dir)
    en_hits = F.size(F.filter(T.ws_tokens("text"), lambda tk: tk.isin(*T.STOPWORDS["en"])))
    return t.documents.select(
        "doc_id",
        T.stopword_ratio("text", "en").alias("en_stopword_ratio"),
        F.when(en_hits > 0, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )


@register(
    "text_quality_score",
    oracle="""
    WITH tk AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS ttr,
           ROUND(0.5 * ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
                 + 0.5 * LEAST(CAST(len(toks) AS DOUBLE) / 100.0, 1.0), 4) AS quality
    FROM tk
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: lexical diversity + length saturation."""
    t = load_tables(spark, sf_dir)
    toks = T.ws_tokens("text")
    return t.documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        T.type_token_ratio("text").alias("ttr"),
        T.quality_score("text").alias("quality"),
    )


@register(
    "text_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+')) AS INTEGER) AS re_tokens,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_computed,
           n_chars
    FROM documents
    """,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace + regex (BPE-ish) + char length."""
    t = load_tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        T.token_count("text").alias("ws_tokens"),
        T.regex_token_count("text").alias("re_tokens"),
        F.length("text").cast("long").alias("n_chars_computed"),
        "n_chars",
    )


@register(
    "text_tfidf",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT COUNT(*) AS n FROM documents),
    s AS (
      SELECT tf.doc_id, tf.token, tf.tf,
             ROUND(tf.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 4) AS score
      FROM tf JOIN dfreq ON tf.token = dfreq.token CROSS JOIN n
    )
    SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, score, CAST(rn AS INTEGER) AS rank
    FROM (SELECT doc_id, token, tf, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token ASC) AS rn
          FROM s)
    WHERE rn <= 3
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J45 TF-IDF top-3 terms per document (smoothed idf =
    ln((N+1)/(df+1)) + 1, the sklearn convention) — keyword
    extraction for corpus curation/topic routing. Plan: one explode →
    map-side (doc, token) counts; document frequency is a second agg
    of that result (|vocab| rows); the corpus count N joins as a
    broadcast single row, so the only big exchanges are the two
    token-keyed aggs. Rank on the ROUNDED score with a token
    tie-break — deterministic across engines.

    Bench watch-list adjudication (r9 item 2, closed r10): the
    0.50 → 1.0-1.2 s drift r8→r9/r10 is a MEASUREMENT artifact, not
    a plan change — fresh-session A/B of this exact plan vs a
    window-based df variant shows the warm wall unchanged at ~0.67 s
    (window variant 0.86 s — kept the join); the bench's min-of-2
    passes run ~300 other plans between this query's two samples, so
    its generated-code cache entries are evicted and both samples pay
    JIT recompilation — a cost that grows with CORPUS SIZE, not with
    this query. Same mechanism fits udf_explode_tokens (Python-worker
    reacquisition); llm_text_wordcount's trivial codegen stays flat,
    which is the discriminating evidence."""
    t = load_tables(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    toks = (
        t.documents.filter(F.col("text").isNotNull())
        .repartition(par, F.col("doc_id"))
        .select("doc_id", F.explode_outer(T.ws_tokens("text")).alias("token"))
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = t.documents.select(F.count(F.lit(1)).alias("n"))
    s = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("token").asc())
    return (
        s.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "score", "rank")
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp,
           SUBSTR(md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')), 1, 4) AS fp_bucket
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 over the sorted distinct token set;
    prefix bucket = shard key for fingerprint-based dedup."""
    t = load_tables(spark, sf_dir)
    fp = T.fingerprint("text")
    return t.documents.select("doc_id", fp.alias("fp"), F.substring(fp, 1, 4).alias("fp_bucket"))


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH {T.SQL_GOPHER_STATS.format(src='documents')}
    SELECT doc_id, n_tokens,
           ROUND(n_token_chars / CAST(n_tokens AS DOUBLE), 4) AS mean_word_len,
           ROUND(n_distinct / CAST(n_tokens AS DOUBLE), 4) AS distinct_ratio,
           ROUND(top_cnt / CAST(n_tokens AS DOUBLE), 4) AS top_token_frac,
           has_stopword,
           CAST(CASE WHEN n_token_chars / CAST(n_tokens AS DOUBLE) BETWEEN 3 AND 10
                 THEN 1 ELSE 0 END AS INT) AS ok_word_len,
           CAST(CASE WHEN n_distinct / CAST(n_tokens AS DOUBLE) >= 0.2
                 THEN 1 ELSE 0 END AS INT) AS ok_diversity,
           CAST(CASE WHEN top_cnt / CAST(n_tokens AS DOUBLE) <= 0.2
                 THEN 1 ELSE 0 END AS INT) AS ok_repetition,
           CAST(CASE WHEN {T.SQL_GOPHER_PASS}
                 THEN 1 ELSE 0 END AS INT) AS pass_all
    FROM s
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule bundle (Rae et al. 2021, public):
    per-doc mean word length in [3, 10], lexical diversity
    (distinct/total >= 0.2), max-token repetition (top token <= 20% of
    doc), and stopword presence — the standard pre-training junk
    filters, emitted as per-rule flags plus the combined verdict so a
    pipeline can tune thresholds from one pass.

    Every statistic derives from the (doc, token, count) relation:
    explode -> groupBy(doc, token) -> groupBy(doc). Two map-side-
    combinable exchanges, no joins, no per-row O(n^2) array
    expressions (a transform-over-distinct top-count would be
    quadratic on long docs)."""
    t = load_tables(spark, sf_dir)
    tc = (
        t.documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    s = T.gopher_token_stats(tc)
    mean_len = F.col("n_token_chars") / F.col("n_tokens").cast("double")
    diversity = F.col("n_distinct") / F.col("n_tokens").cast("double")
    top_frac = F.col("top_cnt") / F.col("n_tokens").cast("double")
    ok_len = mean_len.between(T.GOPHER_MEAN_LEN_LO, T.GOPHER_MEAN_LEN_HI)
    ok_div = diversity >= T.GOPHER_MIN_DIVERSITY
    ok_rep = top_frac <= T.GOPHER_MAX_TOP_FRAC
    return s.select(
        "doc_id",
        "n_tokens",
        F.round(mean_len, 4).alias("mean_word_len"),
        F.round(diversity, 4).alias("distinct_ratio"),
        F.round(top_frac, 4).alias("top_token_frac"),
        "has_stopword",
        ok_len.cast("int").alias("ok_word_len"),
        ok_div.cast("int").alias("ok_diversity"),
        ok_rep.cast("int").alias("ok_repetition"),
        T.gopher_pass().cast("int").alias("pass_all"),
    )


@register(
    "text_unigram_logprob",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
    total AS (SELECT SUM(cnt) AS n FROM vocab)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(ROUND(-SUM(CAST(ROUND(log2(v.cnt / CAST(total.n AS DOUBLE))
                                      * 1000000) AS BIGINT))
                      / COUNT(*) / 100.0) AS BIGINT) / 10000.0
             AS avg_neg_log2p
    FROM tok t JOIN vocab v USING (token), total
    GROUP BY t.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram cross-entropy per doc (the KenLM-perplexity proxy a
    quality pipeline computes when no LM is at hand): corpus unigram
    distribution -> per-doc mean negative log2 probability. High
    values = rare-token soup (OCR junk, wrong language); low = heavy
    boilerplate. Plan: one vocab agg (|vocab| rows), a 1-row total
    broadcast into the probability expression, and a token-key join
    back — the TF-IDF shape; the corpus LM is built and applied in
    one pass, no Python."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n"))
    probs = vocab.crossJoin(F.broadcast(total)).select(
        "token", (F.col("cnt") / F.col("n").cast("double")).alias("p")
    )
    return (
        tok.join(probs, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # r8: per-token −log₂p quantized to micro-ints BEFORE the sum
            # (order-invariant BIGINT reduce), 4-dp derived via a
            # round-to-integer (cross-engine-safe, unlike ROUND(double,4)).
            (
                F.round(
                    -F.sum(F.round(F.log2("p") * 1_000_000).cast("long"))
                    / F.count(F.lit(1))
                    / 100.0
                ).cast("long")
                / 10000.0
            ).alias("avg_neg_log2p"),
        )
    )


@register(
    "text_bigram_counts",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT t[i.i] AS w1, t[i.i + 1] AS w2
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, len(t) - 1)) AS i
      ) i
      WHERE len(t) >= 2
    ),
    counts AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
    tot AS (SELECT w1, SUM(n) AS n1 FROM counts GROUP BY w1)
    SELECT c.w1, c.w2, c.n,
           ROUND(c.n / CAST(t.n1 AS DOUBLE), 4) AS p_w2_given_w1
    FROM counts c JOIN tot t USING (w1)
    QUALIFY ROW_NUMBER() OVER (PARTITION BY c.w1 ORDER BY c.n DESC, c.w2 ASC) <= 3
    """,
)
def text_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM counts — the n-gram language model's build step at
    corpus scale: conditional next-token distribution p(w2|w1), top-3
    continuations per prefix. Plan: narrow bigram explode (pairs
    never leave their map task) -> (w1,w2) count agg -> w1 marginal
    agg -> key join + WindowGroupLimit top-k (map-side cut). All
    exchanges are on token keys (|vocab|-bounded, not corpus-
    bounded); this is how KenLM-style count tables come out of a
    100 TB corpus in one job."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    toks = t.documents.select(T.ws_tokens("text").alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", i + 1).alias("w1"),
                    F.element_at("t", i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    tot = counts.groupBy("w1").agg(F.sum("n").alias("n1"))
    w = Window.partitionBy("w1").orderBy(F.col("n").desc(), F.col("w2").asc())
    return (
        counts.join(tot, "w1")
        .withColumn("p_w2_given_w1", F.round(F.col("n") / F.col("n1").cast("double"), 4))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("w1", "w2", "n", "p_w2_given_w1")
    )


@register(
    "llm_pii_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text
             || CASE WHEN {{b}} < 3
                THEN ' contact user' || doc_id || '@example.com now' ELSE '' END
             || CASE WHEN {{b}} < 2
                THEN ' from 10.0.' || (doc_id % 256) || '.7' ELSE '' END
             || CASE WHEN {{b}} < 1
                THEN ' tel +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END AS text
      FROM documents
    ),
    s1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{{email}}')) AS BIGINT) AS n_emails,
             regexp_replace(text, '{{email}}', '<EMAIL>', 'g') AS t1
      FROM planted
    ),
    s2 AS (
      SELECT doc_id, n_emails,
             CAST(len(regexp_extract_all(t1, '{{ipv4}}')) AS BIGINT) AS n_ips,
             regexp_replace(t1, '{{ipv4}}', '<IP>', 'g') AS t2
      FROM s1
    ),
    s3 AS (
      SELECT doc_id, n_emails, n_ips,
             CAST(len(regexp_extract_all(t2, '{{phone}}')) AS BIGINT) AS n_phones,
             regexp_replace(t2, '{{phone}}', '<PHONE>', 'g') AS t3
      FROM s2
    )
    SELECT doc_id, n_emails, n_ips, n_phones, md5(t3) AS clean_hash
    FROM s3
    """.format(
        b=f"({llmops.sql_md5_prefix_bucket('doc_id', 10)})",
        email=T.PII_EMAIL_RE,
        ipv4=T.PII_IPV4_RE,
        phone=T.PII_PHONE_RE,
    ),
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (the C4/Dolma scrub stage): count and
    mask emails, IPv4s, and phone numbers per document. The fixture
    corpus is PII-free, so the query PLANTS deterministic PII into an
    md5-selected subset (30% emails, 20% IPs, 10% phones — same
    md5_prefix_bucket idiom as sampling/splits) and the scrub must
    find exactly those; the oracle replays plant AND scrub verbatim
    (functions.text.pii_scrub — Java regex and RE2 agree on these
    pattern constructs). Pure JVM regex columns, zero Python in the
    hot path; at 100 TB this is a narrow map-only pass."""
    t = load_tables(spark, sf_dir)
    b = llmops.md5_prefix_bucket(F.col("doc_id"), 10)
    did = F.col("doc_id").cast("string")
    planted = t.documents.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                b < 3,
                F.concat(F.lit(" contact user"), did, F.lit("@example.com now")),
            ).otherwise(F.lit("")),
            F.when(
                b < 2,
                F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
            F.when(
                b < 1,
                F.concat(
                    F.lit(" tel +1 (555) 010-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    n_emails, n_ips, n_phones, clean = T.pii_scrub("text")
    return planted.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        F.md5(clean).alias("clean_hash"),
    )


def _textrank_oracle(iters: int = 3, d: str = "0.85", base: str = "0.15") -> str:
    """SQL replica of ``text_textrank``: the weighted-PageRank rounds
    unrolled as CTE pairs (contrib_i from rank_{i-1}, rank_i from
    contrib_i). Exactness: every per-edge contribution is rounded to
    9 dp and summed as a scaled long (order-independent — the same
    mlong/msum trick as the money sums), and every new rank is
    ROUND(...,9), so both engines iterate over identical doubles."""
    rounds = []
    prev = "r0"
    for i in range(1, iters + 1):
        rounds.append(f"""
    c{i} AS (
      SELECT de.v,
             CAST(ROUND((({prev}.r * de.w) / wt.tw) * 1000000000) AS BIGINT) AS cl
      FROM de
      JOIN {prev} ON {prev}.token = de.u
      JOIN wt ON wt.u = de.u
    ),
    r{i} AS (
      SELECT v AS token, ROUND({base} + {d} * (SUM(cl) / 1000000000.0), 9) AS r
      FROM c{i} GROUP BY v
    )""")
        prev = f"r{i}"
    return f"""
    WITH toks AS (
      SELECT list_filter(string_split(text, ' '), t -> length(t) > 0) AS ts
      FROM documents
    ),
    pr AS (
      SELECT least(ts[i], ts[i + 1]) AS a, greatest(ts[i], ts[i + 1]) AS b
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 1)) AS i)
      WHERE len(ts) >= 2 AND ts[i] <> ts[i + 1]
    ),
    e AS (SELECT a, b, COUNT(*) AS w FROM pr GROUP BY a, b),
    de AS (SELECT a AS u, b AS v, w FROM e UNION ALL SELECT b AS u, a AS v, w FROM e),
    wt AS (SELECT u, CAST(SUM(w) AS BIGINT) AS tw FROM de GROUP BY u),
    r0 AS (SELECT u AS token, CAST(1.0 AS DOUBLE) AS r FROM wt),{",".join(rounds)}
    SELECT {prev}.token, {prev}.r AS rank, wt.tw AS total_cooc
    FROM {prev} JOIN wt ON wt.u = {prev}.token
    ORDER BY rank DESC, token ASC
    LIMIT 20
    """


@register("text_textrank", oracle=_textrank_oracle())
def text_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    PageRank (d=0.85, 3 iterations, init 1.0) over the token
    co-occurrence graph — undirected edges between CONSECUTIVE tokens,
    weight = corpus co-occurrence count — reporting the top-20 tokens.
    The third iterative algorithm in the repo next to Lloyd's k-means
    and connected components, and like them bit-identically replayed
    by the oracle: per-edge contributions round to 9 dp and sum as
    scaled longs (order-independent), each new rank rounds to 9 dp,
    so both engines walk identical doubles through all rounds.

    Scale shape: the expensive part is the edge build — a narrow
    per-doc pair explode (no self-join on (doc, pos)) followed by ONE
    count shuffle that Zipf collapses map-side. Everything after runs
    on the VOCABULARY-sized graph: the per-iteration joins are
    tiny-on-tiny (AQE broadcasts them), and the corpus is never
    touched again — at 100 TB the iteration cost is independent of
    corpus size."""
    t = load_tables(spark, sf_dir)
    toks = F.filter(llmops.tokens("text"), lambda x: F.length(x) > 0)
    n = F.size("ts")
    pair_idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = (
        t.documents.select(toks.alias("ts"))
        .select(
            F.explode(
                F.transform(
                    pair_idx,
                    lambda i: F.struct(
                        F.least(F.element_at("ts", i), F.element_at("ts", i + 1)).alias("a"),
                        F.greatest(F.element_at("ts", i), F.element_at("ts", i + 1)).alias("b"),
                    ),
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
    )
    e = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w"))
    de = e.select(F.col("a").alias("u"), F.col("b").alias("v"), "w").unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"), "w")
    )
    wt = de.groupBy("u").agg(F.sum("w").alias("tw"))
    ranks = wt.select(F.col("u").alias("token"), F.lit(1.0).alias("r"))
    for _ in range(3):
        contrib = (
            de.join(ranks, ranks.token == de.u)
            .join(wt, "u")
            .select(
                "v",
                F.round(((F.col("r") * F.col("w")) / F.col("tw")) * 1_000_000_000)
                .cast("long")
                .alias("cl"),
            )
        )
        ranks = contrib.groupBy("v").agg(
            F.round(
                F.lit(0.15) + F.lit(0.85) * (F.sum("cl") / F.lit(1_000_000_000.0)), 9
            ).alias("r")
        ).select(F.col("v").alias("token"), "r")
    return (
        ranks.join(wt, wt.u == ranks.token)
        .select("token", F.col("r").alias("rank"), F.col("tw").cast("long").alias("total_cooc"))
        .orderBy(F.desc("rank"), "token")
        .limit(20)
    )


@register(
    "text_bm25_topk",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS total FROM dl),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
           WHERE token IN ('vector', 'join', 'window') GROUP BY doc_id, token),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    contrib AS (
      SELECT tf.doc_id,
             CAST(ROUND(
               ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / (CAST(s.total AS DOUBLE) / s.n)))
               * 1000000) AS BIGINT) AS c
      FROM tf JOIN dfreq d ON tf.token = d.token
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats s
    )
    SELECT doc_id, CAST(ROUND(SUM(c) / 100.0) AS BIGINT) / 10000.0 AS bm25
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT 10
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval (k1=1.2, b=0.75) for a fixed 3-term query,
    top-10 docs. The lexical-search counterpart of `llm_sim_topk` —
    what a curation pipeline uses to pull topical slices out of a raw
    corpus without embeddings.

    Scale shape: the term filter lands BEFORE the (doc, term) count,
    so only rows containing query terms survive the first shuffle;
    document length and corpus stats are separate tiny aggregates that
    join back broadcast (df: |query| rows; stats: 1 row). Global top-k
    is TakeOrderedAndProject — no corpus sort. Cross-engine hashing:
    per-term contributions are scaled to integer micro-units before
    the per-doc SUM, so the sum is order-independent (double adds are
    not associative; integer adds are — see common.mlong)."""
    t = load_tables(spark, sf_dir)
    terms = ["vector", "join", "window"]
    toks = t.documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").cast("long").alias("total")
    )
    tf = (
        toks.filter(F.col("token").isin(terms))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    avgdl = F.col("total").cast("double") / F.col("n")
    idf = F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    denom = F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / avgdl)
    contrib = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * (F.col("tf") * 2.2) / denom * 1000000).cast("long").alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        # r8: 4-dp derived from the micro-long sum via round-to-integer —
        # ROUND(sum6/1e6, 4) diverges cross-engine when sum6 ends in 50.
        .agg((F.round(F.sum("c") / 100.0).cast("long") / 10000.0).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(10)
    )


@register(
    "llm_cooccurrence_pmi",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT t[i.i] AS w1, t[i.i + 1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
      WHERE len(t) >= 2
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
    c2 AS (SELECT w2, CAST(SUM(n12) AS BIGINT) AS n2 FROM c12 GROUP BY w2),
    tot AS (SELECT CAST(SUM(n12) AS BIGINT) AS n FROM c12)
    SELECT c12.w1, c12.w2, c12.n12,
           ROUND(ln((c12.n12 * CAST(tot.n AS DOUBLE)) / (c1.n1 * CAST(c2.n2 AS DOUBLE))), 4)
             AS pmi
    FROM c12 JOIN c1 ON c12.w1 = c1.w1 JOIN c2 ON c12.w2 = c2.w2 CROSS JOIN tot
    WHERE c12.n12 >= 5
    ORDER BY pmi DESC, c12.w1, c12.w2 LIMIT 20
    """,
)
def llm_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over adjacent token pairs — the
    collocation detector (Church & Hanks 1990): pairs that co-occur
    far above chance ('new york'-style units) score high; a min-count
    floor (n12 ≥ 5) suppresses the unstable rare-pair tail. Feeds
    tokenizer merge choices and phrase mining.

    Determinism: PMI = ln((n12·N)/(n1·n2)) evaluated on exact BIGINT
    counts in an identical expression shape, so both engines divide
    the same exact integers and ln the same double. Scale: bigrams
    never leave their map task; all exchanges are vocab-bounded
    aggs + key joins, with the 1-row total broadcast; top-20 is
    TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(llmops.tokens("text").alias("t")).filter(F.size("t") >= 2)
    idx = F.sequence(F.lit(0), F.size("t") - 2)
    bg = toks.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("t"), i + 1).alias("w1"),
                    F.element_at(F.col("t"), i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    c2 = c12.groupBy("w2").agg(F.sum("n12").alias("n2"))
    tot = c12.agg(F.sum("n12").alias("n"))
    pmi = F.log(
        (F.col("n12") * F.col("n").cast("double"))
        / (F.col("n1") * F.col("n2").cast("double"))
    )
    return (
        c12.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n12") >= 5)
        .select("w1", "w2", "n12", F.round(pmi, 4).alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


# ------------------------------------------------- r6: readability


@register(
    "text_readability",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    syl AS (
      SELECT doc_id, token,
             GREATEST(1, len(regexp_extract_all(token, '[aeiouy]+'))) AS syllables
      FROM tok
    ),
    s AS (
      SELECT doc_id, COUNT(*) AS n_words,
             CAST(SUM(syllables) AS BIGINT) AS n_syllables
      FROM syl GROUP BY doc_id
    )
    SELECT doc_id, n_words, n_syllables,
           CAST(ROUND((206.835::DOUBLE - 1.015::DOUBLE * n_words
                 - 84.6::DOUBLE * (n_syllables / CAST(n_words AS DOUBLE))) * 10000)
             AS BIGINT) AS flesch_e4
    FROM s
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease scoring (Flesch 1948, public formula) with
    the standard heuristic syllable counter: maximal vowel groups
    ([aeiouy]+ runs), floored at 1 per word. The fixture corpus has
    no sentence punctuation, so each doc is one sentence and the
    words-per-sentence term is n_words — the formula structure and
    the syllable machinery are what this operator ships; real prose
    drops in with a sentence splitter in the same expression chain.

    Scale: explode → per-word regexp count → one map-side-combinable
    doc agg. The syllable count runs in regexp_extract_all JVM-side
    (dialect chosen inside Java∩RE2∩DuckDB, the PII-scrub
    convention); no Python anywhere."""
    t = load_tables(spark, sf_dir)
    tok = t.documents.select("doc_id", F.explode(T.ws_tokens("text")).alias("token"))
    syl = tok.select(
        "doc_id",
        F.greatest(
            F.lit(1), F.size(F.expr("regexp_extract_all(token, '[aeiouy]+', 0)"))
        ).alias("syllables"),
    )
    s = syl.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("syllables").alias("n_syllables"),
    )
    # scaled-integer rounding (the mlong convention): ROUND(x, 4)
    # diverges between engines at decimal-string boundaries (Spark
    # rounds the shortest-string repr, DuckDB rounds x*1e4), but
    # ROUND(x*1e4) to an INTEGER agrees bit-for-bit on identical
    # doubles — so the score ships as exact e4 micro-units.
    return s.select(
        "doc_id",
        "n_words",
        "n_syllables",
        F.round(
            (
                206.835
                - 1.015 * F.col("n_words")
                - 84.6 * (F.col("n_syllables") / F.col("n_words").cast("double"))
            )
            * 10000
        )
        .cast("long")
        .alias("flesch_e4"),
    )


# ------------------------------------------------- r6: tokenizer fertility


@register(
    "text_tokenizer_fertility",
    oracle="""
    WITH s AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_words,
             len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]')) AS n_subwords
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS total_words,
           CAST(SUM(n_subwords) AS BIGINT) AS total_subwords,
           ROUND(SUM(n_subwords) / CAST(SUM(n_words) AS DOUBLE), 4) AS fertility
    FROM s GROUP BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: subword-tokens-per-word — THE
    standard multilingual-tokenizer health metric (a language whose
    fertility is 2× English pays 2× the context window; drives vocab
    rebalancing). Subword count uses the BPE-ish regex family from
    text_token_count (alnum runs + lone non-alnum non-space), word
    count is whitespace split — the same two tokenizations J12
    already pins per-doc, here rolled up to the per-language ratio.

    Scale: two per-row regexp counts fused into the scan projection,
    then ONE |langs|-row aggregate — no explode, no join; the
    corpus-sized relation never shuffles (counts are computed before
    the agg exchange)."""
    t = load_tables(spark, sf_dir)
    s = t.documents.select(
        "doc_id",
        "lang",
        F.size(T.ws_tokens("text")).alias("n_words"),
        F.size(
            F.expr("regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 ]', 0)")
        ).alias("n_subwords"),
    )
    return s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_subwords").alias("total_subwords"),
        F.round(
            F.sum("n_subwords") / F.sum("n_words").cast("double"), 4
        ).alias("fertility"),
    )


# ------------------------------------------------- r7: stupid backoff LM


@register(
    "text_backoff_logprob",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pairs AS (
      SELECT doc_id,
             CASE WHEN i.i = 1 THEN NULL ELSE t[i.i - 1] END AS w1,
             t[i.i] AS w2
      FROM toks, LATERAL (
        SELECT unnest(generate_series(1, len(t))) AS i
      ) i
    ),
    uni AS (
      SELECT w2 AS w, COUNT(*) AS cnt FROM pairs GROUP BY w2
    ),
    total AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n FROM uni),
    bg AS (
      SELECT w1, w2, COUNT(*) AS n FROM pairs WHERE w1 IS NOT NULL GROUP BY w1, w2
    )
    SELECT p.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN p.w1 IS NOT NULL AND bg.n IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_backoff,
           CAST(ROUND(-SUM(CAST(ROUND(log2(
             CASE WHEN p.w1 IS NULL THEN u2.cnt / total.n
                  WHEN bg.n IS NOT NULL THEN bg.n / CAST(u1.cnt AS DOUBLE)
                  ELSE 0.4 * u2.cnt / total.n END) * 1000000) AS BIGINT))
                 / COUNT(*) / 100.0) AS BIGINT) / 10000.0 AS avg_neg_log2_sb
    FROM pairs p
    JOIN uni u2 ON p.w2 = u2.w
    LEFT JOIN uni u1 ON p.w1 = u1.w
    LEFT JOIN bg ON p.w1 = bg.w1 AND p.w2 = bg.w2, total
    GROUP BY p.doc_id
    """,
)
def text_backoff_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff bigram LM scoring (Brants et al., EMNLP 2007 —
    the web-scale LM smoothing that skips normalization): per token,
    S(w|w₋₁) = n(w₋₁w)/n(w₋₁) if the bigram was seen, else
    α·n(w)/N with α = 0.4; doc score = mean −log₂S. The LM is built
    from the corpus itself in the same job (KenLM-style count
    tables), so this is both the train and apply step.

    Determinism: each per-token −log₂S term is quantized to an
    INTEGER micro-unit BEFORE the per-doc sum (the llm_token_zipf
    idiom), making the reduce an order-invariant BIGINT sum —
    identical under any shuffle partitioning and engine-exact across
    the DuckDB boundary.

    Scale: the position explode is narrow (pairs never leave their
    map task); bigram/unigram tables are |vocab|- and |vocab|²-
    bounded aggs; the apply pass joins the token stream against them
    on token keys (broadcastable while the LM fits, shuffle join
    beyond). The corpus total N is a 1-row broadcast (BNLJ_OK). The
    per-doc reduce is one map-side-combinable agg."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select("doc_id", T.ws_tokens("text").alias("t"))
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t")),
                lambda i: F.struct(
                    F.when(i == 1, F.lit(None).cast("string"))
                    .otherwise(F.element_at("t", (i - 1).cast("int")))
                    .alias("w1"),
                    F.element_at("t", i.cast("int")).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    uni = pairs.groupBy(F.col("w2").alias("w")).agg(F.count(F.lit(1)).alias("cnt"))
    total = uni.agg(F.sum("cnt").cast("double").alias("n"))
    bg = (
        pairs.filter(F.col("w1").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u2 = uni.select(F.col("w").alias("w2"), F.col("cnt").alias("cnt2"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("cnt").alias("cnt1"))
    score = (
        F.when(F.col("w1").isNull(), F.col("cnt2") / F.col("n"))
        .when(F.col("bn").isNotNull(), F.col("bn") / F.col("cnt1").cast("double"))
        .otherwise(0.4 * F.col("cnt2") / F.col("n"))
    )
    return (
        pairs.join(u2, "w2")
        .join(u1, "w1", "left")
        .join(bg.select("w1", "w2", F.col("n").alias("bn")), ["w1", "w2"], "left")
        .crossJoin(total)  # 1-row broadcast
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("w1").isNotNull() & F.col("bn").isNull(), 1).otherwise(0)
            ).alias("n_backoff"),
            # integer-exact 4-dp: micro-sum / n / 100 → round-to-int → /1e4
            # (ROUND(double, 4) is NOT cross-engine safe at half boundaries;
            # round-to-integer of an identical double is).
            (
                F.round(
                    -F.sum(F.round(F.log2(score) * 1_000_000).cast("long"))
                    / F.count(F.lit(1))
                    / 100.0
                ).cast("long")
                / 10000.0
            ).alias("avg_neg_log2_sb"),
        )
    )


# ------------------------------------------------- r8: positional inverted index


@register(
    "text_posting_lists",
    oracle="""
    WITH pos AS (
      SELECT doc_id, t.token, CAST(t.i AS BIGINT) AS p
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL (SELECT unnest(toks) AS token,
                           unnest(generate_series(1, len(toks))) AS i) t
    ),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df FROM pos GROUP BY token
      ORDER BY df DESC, token ASC LIMIT 8
    ),
    plist AS (
      SELECT p.token, p.doc_id, list_sort(list(p.p)) AS ps
      FROM pos p JOIN df ON p.token = df.token
      GROUP BY p.token, p.doc_id
    )
    SELECT token, doc_id, CAST(len(ps) AS INTEGER) AS n_occ,
           list_transform(generate_series(1, len(ps)),
                          i -> CASE WHEN i = 1 THEN ps[1] ELSE ps[i] - ps[i-1] END) AS deltas
    FROM plist
    """,
)
def text_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted-index build (the Zobel & Moffat CSUR'06
    shape): for the 8 highest-df terms, the per-document posting list
    of 1-based token positions, DELTA-ENCODED (first position, then
    gaps) — the compression that makes positional indexes feasible:
    gaps are small ints that varint/bit-pack well, absolute positions
    don't.

    Scale: positions come from a narrow posexplode fused into the
    scan (pairs never leave their map task); the df cut is a
    TakeOrdered over the |vocab| agg; postings group on (term, doc)
    — the index's own shard key — so the build is one shuffle
    partitioned exactly how the serving index is laid out. The
    delta encode is a per-row array transform, no window."""
    t = load_tables(spark, sf_dir)
    pos = t.documents.select(
        "doc_id", F.posexplode(T.ws_tokens("text")).alias("i", "token")
    ).select("doc_id", "token", (F.col("i") + 1).cast("long").alias("p"))
    df = (
        pos.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(8)
        .select("token")
    )
    plist = (
        pos.join(F.broadcast(df), "token")
        .groupBy("token", "doc_id")
        .agg(F.sort_array(F.collect_list("p")).alias("ps"))
    )
    deltas = F.transform(
        F.sequence(F.lit(1), F.size("ps")),
        lambda i: F.when(i == 1, F.element_at("ps", 1)).otherwise(
            F.element_at("ps", i) - F.element_at("ps", i - 1)
        ),
    )
    return plist.select(
        "token", "doc_id", F.size("ps").cast("int").alias("n_occ"), deltas.alias("deltas")
    )


# ------------------------------------------------- r8: positional phrase search


@register(
    "text_phrase_search",
    oracle="""
    WITH pos AS (
      SELECT doc_id, t.token, CAST(t.i AS BIGINT) AS p
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           LATERAL (SELECT unnest(toks) AS token,
                           unnest(generate_series(1, len(toks))) AS i) t
    ),
    bg AS (
      SELECT a.token AS w1, b.token AS w2, COUNT(*) AS n
      FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
      GROUP BY a.token, b.token
      ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 3
    )
    SELECT bg.w1, bg.w2,
           COUNT(DISTINCT a.doc_id) AS n_docs,
           COUNT(*) AS n_occurrences
    FROM bg
    JOIN pos a ON a.token = bg.w1
    JOIN pos b ON b.doc_id = a.doc_id AND b.token = bg.w2 AND b.p = a.p + 1
    GROUP BY bg.w1, bg.w2
    """,
)
def text_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phrase search over the positional index — the retrieval-side
    counterpart of text_posting_lists: for the 3 most frequent
    bigram phrases, intersect the two terms' posting lists on
    (doc, position+1 adjacency) and report matching docs and
    occurrences. This is how a search engine answers quoted-phrase
    queries without rescanning text.

    Scale: the phrase candidates come from the bigram count table
    (token-keyed aggs, |vocab|²-bounded); the adjacency intersection
    joins the two posting lists ON THE DOC KEY after a broadcast
    semi-join cut to the 3 query terms — probe cost is |postings of
    queried terms|, independent of corpus width."""
    t = load_tables(spark, sf_dir)
    pos = t.documents.select(
        "doc_id", F.posexplode(T.ws_tokens("text")).alias("i", "token")
    ).select("doc_id", "token", (F.col("i") + 1).cast("long").alias("p"))
    bigrams = (
        t.documents.select(T.ws_tokens("text").alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.struct(
                        F.element_at("toks", i + 1).alias("w1"),
                        F.element_at("toks", i + 2).alias("w2"),
                    ),
                )
            ).alias("bg")
        )
        .groupBy("bg.w1", "bg.w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(3)
        .select("w1", "w2")
    )
    a = pos.select(F.col("token").alias("w1"), "doc_id", F.col("p").alias("p1"))
    b = pos.select(
        F.col("token").alias("tok_b"), F.col("doc_id").alias("doc_b"), F.col("p").alias("p2")
    )
    hits = a.join(F.broadcast(bigrams), "w1").join(
        b,
        (F.col("doc_id") == F.col("doc_b"))
        & (F.col("tok_b") == F.col("w2"))
        & (F.col("p2") == F.col("p1") + 1),
    )
    return hits.groupBy("w1", "w2").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )


# ------------------------------------------------- r8: Kneser-Ney bigram LM


@register(
    "text_kneser_ney",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT t[i.i] AS w1, t[i.i + 1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
      WHERE len(t) >= 2
    ),
    c AS (SELECT w1, w2, COUNT(*) AS n FROM bg GROUP BY w1, w2),
    left_tot AS (SELECT w1, SUM(n) AS c1, COUNT(*) AS follow_types FROM c GROUP BY w1),
    cont AS (SELECT w2, COUNT(*) AS cont_types FROM c GROUP BY w2),
    types AS (SELECT COUNT(*) AS n_types FROM c)
    SELECT c.w1, c.w2, c.n,
           CAST(ROUND(1000000.0 * c.n / lt.c1) AS BIGINT) / 1000000.0 AS p_mle,
           CAST(ROUND(1000000.0 * (
                 (c.n - 0.75) / lt.c1
                 + (0.75 * lt.follow_types / lt.c1) * (CAST(co.cont_types AS DOUBLE) / ty.n_types)
               )) AS BIGINT) / 1000000.0 AS p_kn
    FROM c
    JOIN left_tot lt ON c.w1 = lt.w1
    JOIN cont co ON c.w2 = co.w2
    CROSS JOIN types ty
    ORDER BY c.n DESC, c.w1 ASC, c.w2 ASC LIMIT 20
    """,
)
def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney
    ICASSP'95; Chen & Goodman formulation, absolute discount D=0.75)
    for the corpus's top-20 bigrams: p_KN(w2|w1) =
    (c−D)/c(w1) + D·|follow(w1)|/c(w1) · p_cont(w2), where the
    continuation probability p_cont(w2) = |distinct left contexts of
    w2| / |distinct bigram types| — the smoothing that made n-gram
    LMs competitive and still underlies data-quality LM scorers.

    Determinism: every input is an exact BIGINT count and D=0.75 is
    exact in binary, so p_KN is one scalar IEEE expression per row,
    emitted via round-to-integer. Scale: all four count tables are
    token-keyed map-side-combinable aggs (|vocab|- or |vocab|²-
    bounded); the 1-row type total broadcasts; the top-20 cut is a
    TakeOrdered."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(T.ws_tokens("text").alias("t")).filter(F.size("t") >= 2)
    bg = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.element_at("t", i + 1).alias("w1"),
                    F.element_at("t", i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    left_tot = c.groupBy("w1").agg(
        F.sum("n").alias("c1"), F.count(F.lit(1)).alias("follow_types")
    )
    cont = c.groupBy("w2").agg(F.count(F.lit(1)).alias("cont_types"))
    types = c.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = (
        (F.col("n") - 0.75) / F.col("c1")
        + (F.lit(0.75) * F.col("follow_types") / F.col("c1"))
        * (F.col("cont_types").cast("double") / F.col("n_types"))
    )
    return (
        c.join(left_tot, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            "n",
            (F.round(F.lit(1000000.0) * F.col("n") / F.col("c1")).cast("long") / 1000000.0).alias("p_mle"),
            (F.round(F.lit(1000000.0) * p_kn).cast("long") / 1000000.0).alias("p_kn"),
        )
        .orderBy(F.col("n").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


# ------------------------------------------------- r8: source-vocabulary JS divergence


@register(
    "text_js_divergence",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    cnt AS (SELECT source, token, COUNT(*) AS n FROM tok GROUP BY source, token),
    tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS t FROM cnt GROUP BY source),
    vocab AS (SELECT DISTINCT token FROM cnt),
    grid AS (
      SELECT s.source, v.token, COALESCE(c.n, 0) AS n, s.t
      FROM tot s CROSS JOIN vocab v
      LEFT JOIN cnt c ON c.source = s.source AND c.token = v.token
    ),
    terms AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(ROUND(1000000000.0 * 0.5 * (
               (CASE WHEN a.n = 0 THEN 0.0
                     ELSE (CAST(a.n AS DOUBLE) / a.t)
                          * log2(2.0 * (CAST(a.n AS DOUBLE) / a.t)
                                 / (CAST(a.n AS DOUBLE) / a.t + CAST(b.n AS DOUBLE) / b.t)) END)
               + (CASE WHEN b.n = 0 THEN 0.0
                       ELSE (CAST(b.n AS DOUBLE) / b.t)
                            * log2(2.0 * (CAST(b.n AS DOUBLE) / b.t)
                                   / (CAST(a.n AS DOUBLE) / a.t + CAST(b.n AS DOUBLE) / b.t)) END)
             )) AS BIGINT) AS term_nano
      FROM grid a JOIN grid b ON a.token = b.token AND a.source < b.source
      WHERE a.n + b.n > 0
    )
    SELECT src_a, src_b, COUNT(*) AS n_tokens,
           CAST(ROUND(CAST(SUM(term_nano) AS DOUBLE) / 1000.0) AS BIGINT) / 1000000.0 AS jsd
    FROM terms GROUP BY src_a, src_b
    """,
)
def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source vocabulary
    distributions (Lin IEEE-IT'91; log2, so JSD ∈ [0,1]) — the domain-
    similarity matrix a mixture designer reads before weighting
    sources (llm_domain_mixture / llm_doremi_reweight pick weights;
    this says which sources are near-duplicates of each other in
    DISTRIBUTION, the corpus-level analogue of doc-level dedup).

    Determinism: each token's JSD contribution is quantized to
    nano-int BEFORE the per-pair sum; p, q, and the log2 argument are
    scalar IEEE expressions over exact BIGINT counts. Scale: token
    counts are one (source, token) agg (|sources|·|vocab|-bounded);
    the pair expansion joins the zero-filled grid ON THE TOKEN KEY —
    |vocab|·|sources|² rows, bounded by the SCHEMA of the comparison
    (sources², not corpus²) exactly like rel_audience_overlap."""
    t = load_tables(spark, sf_dir)
    cnt = (
        t.documents.select("source", F.explode(T.ws_tokens("text")).alias("token"))
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("source").agg(F.sum("n").alias("t"))
    vocab = cnt.select("token").distinct()
    grid = (
        tot.crossJoin(F.broadcast(vocab))
        .join(cnt, ["source", "token"], "left")
        .select("source", "token", F.coalesce("n", F.lit(0)).alias("n"), "t")
    )
    a = grid.select(
        F.col("token"),
        F.col("source").alias("src_a"),
        F.col("n").alias("na"),
        F.col("t").alias("ta"),
    )
    b = grid.select(
        F.col("token"),
        F.col("source").alias("src_b"),
        F.col("n").alias("nb"),
        F.col("t").alias("tb"),
    )
    pa = F.col("na").cast("double") / F.col("ta")
    pb = F.col("nb").cast("double") / F.col("tb")
    term = F.lit(0.5) * (
        F.when(F.col("na") == 0, F.lit(0.0)).otherwise(
            pa * F.log2(F.lit(2.0) * pa / (pa + pb))
        )
        + F.when(F.col("nb") == 0, F.lit(0.0)).otherwise(
            pb * F.log2(F.lit(2.0) * pb / (pa + pb))
        )
    )
    terms = (
        a.join(b, "token")
        .filter(F.col("src_a") < F.col("src_b"))
        .filter(F.col("na") + F.col("nb") > 0)
        .select(
            "src_a",
            "src_b",
            F.round(F.lit(1000000000.0) * term).cast("long").alias("term_nano"),
        )
    )
    return terms.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        (
            F.round(F.sum("term_nano").cast("double") / 1000.0).cast("long") / 1000000.0
        ).alias("jsd"),
    )


# ------------------------------------------------- r9: exact set-similarity join (prefix filter)


@register(
    "text_setjoin_prefix",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_distinct([{llmops.sql_hex32("array_to_string(t[i:i+2], ' ')")}
                            FOR i IN range(1, greatest(len(t) - 2, 1) + 1)]) AS hs
      FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    ),
    ex AS (SELECT doc_id, unnest(hs) AS h FROM toks),
    freq AS (SELECT h, COUNT(*) AS df FROM ex GROUP BY h),
    ordered AS (
      SELECT x.doc_id,
             array_agg(x.h ORDER BY f.df, x.h) AS arr,
             COUNT(*) AS sz
      FROM ex x JOIN freq f ON f.h = x.h
      GROUP BY x.doc_id
    ),
    pref AS (
      SELECT doc_id, sz,
             unnest(arr[1:(sz // 2 + 1)]) AS ph,
             unnest(generate_series(1, len(arr[1:(sz // 2 + 1)]))) AS p
      FROM ordered
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
      FROM pref a JOIN pref b
        ON a.ph = b.ph AND a.doc_id < b.doc_id
      WHERE 2 * least(a.sz, b.sz) >= greatest(a.sz, b.sz)
        AND 3 * (1 + least(a.sz - a.p, b.sz - b.p)) >= a.sz + b.sz
    ),
    ver AS (
      SELECT c.a, c.b,
             ROUND(CAST(len(list_intersect(ta.hs, tb.hs)) AS DOUBLE)
                   / len(list_distinct(list_concat(ta.hs, tb.hs))), 4) AS jaccard
      FROM cand c JOIN toks ta ON ta.doc_id = c.a JOIN toks tb ON tb.doc_id = c.b
    )
    SELECT a, b, jaccard FROM ver WHERE jaccard >= 0.5
    """,
)
def text_setjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join with PREFIX FILTERING (Chaudhuri
    et al. ICDE'06; Xiao et al. WWW'08 PPJoin): 3-shingle-set Jaccard
    >= 0.5 pairs with NO false negatives and no all-pairs scan — the
    exact-answer complement of the MinHash family: the SAME shingle
    definition and threshold as llm_dedup_near, but guaranteed-
    complete where MinHash banding is probabilistic (what it finds
    beyond llm_dedup_near's pairs is exactly LSH's false-negative
    mass — tests/test_round9_ops.py pins the superset relation).

    Prefix principle: order every doc's shingles by ascending global
    document frequency (rarest first, ties by the cross-engine hex32
    key); two sets with Jaccard >= tau MUST share a token in their
    first |s| - ceil(tau*|s|) + 1 tokens, so equi-joining on PREFIX
    tokens only is a complete candidate generator — with tau = 1/2
    the prefix length is the pure-integer |s|//2 + 1. Three
    candidate-killers, all integer-exact and all completeness-
    preserving: the size filter 2*min >= max; PPJoin's POSITIONAL
    filter (a match at prefix positions (pa, pb) caps the possible
    overlap at 1 + min(sza-pa, szb-pb), and Jaccard >= 1/2 needs
    3*overlap >= sza+szb); and the exact-Jaccard verify.

    Engineering: shingles ride the cross-engine hex32 LONG everywhere
    (frequency agg, ordering ties, the prefix equi-join, the verify
    intersections) — integer shuffles and integer set-intersects, no
    long-string keys; the scan is spread before the shingle explode
    (one small parquet file = one task otherwise). Scale: prefixes
    are the RARE tokens, so join blocks are small by construction;
    candidate mass tracks true similarity, not corpus squared."""
    from .common import parallelize_scan

    t = load_tables(spark, sf_dir)
    docs = parallelize_scan(t.documents.select("doc_id", "text"), "doc_id")
    # r16: the shingle-set relation has SIX consumers (freq, ordered,
    # both prefix sides, both verify sides) and was re-derived from
    # the parquet scan by each — 12 scans / 6 shingle+hex32 Generates
    # in the committed r15 plan (plans/r16/..._before.txt). One eager
    # localCheckpoint computes it once (guide §2.4/§5 — the pagerank
    # 2-scan idiom); per-call, within one execution, so nothing is
    # reused across runs.
    toks = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(llmops.shingles("text", 3), lambda s: llmops.hex32(s))
        ).alias("hs"),
    ).localCheckpoint(eager=True)
    ex = toks.select("doc_id", F.explode("hs").alias("h"))
    freq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        ex.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "h"))), lambda s: s["h"]
            ).alias("arr"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    pref = ordered.select(
        "doc_id",
        "sz",
        F.posexplode(F.slice("arr", 1, (F.col("sz") / 2).cast("int") + 1)).alias(
            "p0", "ph"
        ),
    ).select("doc_id", "sz", "ph", (F.col("p0") + 1).alias("p"))
    a = pref.select(
        F.col("doc_id").alias("a"), F.col("sz").alias("sza"), "ph", F.col("p").alias("pa")
    )
    b = pref.select(
        F.col("doc_id").alias("b"),
        F.col("sz").alias("szb"),
        F.col("ph").alias("ph_b"),
        F.col("p").alias("pb"),
    )
    cand = (
        a.join(b, (a.ph == b.ph_b) & (a.a < b.b))
        .filter(2 * F.least("sza", "szb") >= F.greatest("sza", "szb"))
        .filter(
            3 * (1 + F.least(F.col("sza") - F.col("pa"), F.col("szb") - F.col("pb")))
            >= F.col("sza") + F.col("szb")
        )
        .select("a", "b")
        .distinct()
    )
    ver = (
        cand.join(toks.select(F.col("doc_id").alias("a"), F.col("hs").alias("ta")), "a")
        .join(toks.select(F.col("doc_id").alias("b"), F.col("hs").alias("tb")), "b")
        .withColumn("jaccard", llmops.jaccard(F.col("ta"), F.col("tb")))
    )
    return ver.filter(F.col("jaccard") >= 0.5).select("a", "b", "jaccard")


# ------------------------------------------------- r9: LLR collocations (Dunning '93)


_XLX = "CASE WHEN {x} > 0 THEN CAST(ROUND(1000000.0 * {x} * ln(CAST({x} AS DOUBLE))) AS BIGINT) ELSE 0 END"


@register(
    "text_collocation_llr",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT t[i.i] AS w1, t[i.i + 1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) i
      WHERE len(t) >= 2
    ),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
    c2 AS (SELECT w2, CAST(SUM(n12) AS BIGINT) AS n2 FROM c12 GROUP BY w2),
    tot AS (SELECT CAST(SUM(n12) AS BIGINT) AS n FROM c12),
    cells AS (
      SELECT c12.w1, c12.w2, c12.n12, c1.n1, c2.n2, tot.n,
             c12.n12 AS k11, c1.n1 - c12.n12 AS k12,
             c2.n2 - c12.n12 AS k21, tot.n - c1.n1 - c2.n2 + c12.n12 AS k22
      FROM c12 JOIN c1 ON c12.w1 = c1.w1 JOIN c2 ON c12.w2 = c2.w2 CROSS JOIN tot
    ),
    g AS (
      SELECT w1, w2, n12,
             2 * ({_XLX.format(x='k11')} + {_XLX.format(x='k12')}
                  + {_XLX.format(x='k21')} + {_XLX.format(x='k22')}
                  - {_XLX.format(x='n1')} - {_XLX.format(x='(n - n1)')}
                  - {_XLX.format(x='n2')} - {_XLX.format(x='(n - n2)')}
                  + {_XLX.format(x='n')}) AS llr_micro
      FROM cells
    )
    SELECT w1, w2, n12, llr_micro / 1000000.0 AS llr
    FROM g WHERE n12 >= 5
    ORDER BY llr_micro DESC, w1, w2 LIMIT 20
    """,
)
def text_collocation_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-likelihood-ratio collocations (Dunning, CL'93 — the
    statistically sound alternative to PMI for SPARSE counts: PMI
    rewards rare pairs, G² penalizes them): the 2×2 contingency G²
    for each adjacent bigram, computed as the standard entropy form
    2·(Σ xlx(k_ij) − Σ xlx(margins) + xlx(N)). Shares the exact
    bigram/margin base with llm_cooccurrence_pmi, so the two rankings
    are directly comparable on the same counts.

    Determinism: every x·ln x term is micro-quantized from an exact
    BIGINT cell BEFORE the fixed 9-term combination, which then runs
    in pure integer arithmetic — engines agree bit-for-bit including
    the ORDER BY on llr_micro. Scale: identical to PMI — vocab-bounded
    aggs, key joins, a 1-row total broadcast, top-20 TakeOrdered."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(llmops.tokens("text").alias("t")).filter(F.size("t") >= 2)
    idx = F.sequence(F.lit(0), F.size("t") - 2)
    bg = toks.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("t"), i + 1).alias("w1"),
                    F.element_at(F.col("t"), i + 2).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    c2 = c12.groupBy("w2").agg(F.sum("n12").alias("n2"))
    tot = c12.agg(F.sum("n12").alias("n"))

    def xlx(col):
        return (
            F.when(
                col > 0,
                F.round(F.lit(1000000.0) * col * F.log(col.cast("double"))).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
        )

    cells = (
        c12.join(c1, "w1")
        .join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", "n12", "n1", "n2", "n",
            F.col("n12").alias("k11"),
            (F.col("n1") - F.col("n12")).alias("k12"),
            (F.col("n2") - F.col("n12")).alias("k21"),
            (F.col("n") - F.col("n1") - F.col("n2") + F.col("n12")).alias("k22"),
        )
    )
    llr_micro = 2 * (
        xlx(F.col("k11")) + xlx(F.col("k12")) + xlx(F.col("k21")) + xlx(F.col("k22"))
        - xlx(F.col("n1")) - xlx(F.col("n") - F.col("n1"))
        - xlx(F.col("n2")) - xlx(F.col("n") - F.col("n2"))
        + xlx(F.col("n"))
    )
    return (
        cells.withColumn("llr_micro", llr_micro)
        .filter(F.col("n12") >= 5)
        .orderBy(F.col("llr_micro").desc(), "w1", "w2")
        .limit(20)
        .select("w1", "w2", "n12", (F.col("llr_micro") / 1000000.0).alias("llr"))
    )


# ------------------------------------------------- r9: RAKE keyphrases (Rose 2010)


@register(
    "text_keyphrase_rake",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w,
             unnest(generate_series(1, len(string_split(text, ' ')))) AS i
      FROM documents
    ),
    flagged AS (
      SELECT doc_id, i, w, CASE WHEN w IN ({_SQL_STOP_EN}) THEN 1 ELSE 0 END AS stop
      FROM toks
    ),
    seg AS (
      SELECT doc_id, i, w, stop,
             SUM(stop) OVER (PARTITION BY doc_id ORDER BY i) AS phrase_id
      FROM flagged
    ),
    phrases AS (
      SELECT doc_id, phrase_id,
             array_to_string(array_agg(w ORDER BY i), ' ') AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM seg WHERE stop = 0
      GROUP BY doc_id, phrase_id
    ),
    pw AS (
      SELECT p.doc_id, p.phrase_id, p.plen, unnest(string_split(p.phrase, ' ')) AS w
      FROM phrases p
    ),
    ws AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(plen) AS BIGINT) AS deg,
             CAST(ROUND(1000000.0 * SUM(plen) / COUNT(*)) AS BIGINT) AS score_micro
      FROM pw GROUP BY w
    ),
    ps AS (
      SELECT pw.doc_id, pw.phrase_id, CAST(SUM(ws.score_micro) AS BIGINT) AS pscore_micro
      FROM pw JOIN ws ON ws.w = pw.w
      GROUP BY pw.doc_id, pw.phrase_id
    ),
    dedup AS (
      SELECT p.phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
             MAX(ps.pscore_micro) AS pscore_micro
      FROM phrases p JOIN ps ON ps.doc_id = p.doc_id AND ps.phrase_id = p.phrase_id
      GROUP BY p.phrase
    )
    SELECT phrase, n_occurrences, pscore_micro / 1000000.0 AS rake_score
    FROM dedup
    ORDER BY pscore_micro DESC, phrase LIMIT 20
    """,
)
def text_keyphrase_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction (Rose/Engel/Cramer/Cowley 2010):
    candidate phrases are maximal stopword-delimited token runs;
    word score = degree/frequency (degree = Σ lengths of phrases the
    word occurs in); phrase score = Σ member word scores; corpus
    top-20. The graph-free complement of TextRank (J78) — RAKE is one
    pass of aggregations where TextRank iterates PageRank, the classic
    speed/quality trade in keyphrase mining.

    Plan: phrase segmentation is the sessionize prefix-sum idiom (a
    per-doc running count of stopword boundaries — window partitioned
    by doc); word and phrase stats are two vocab-bounded aggs; scores
    are micro-int ratios of exact counts summed as BIGINTs, so the
    final ranking compares integers. Top-20 is TakeOrdered."""
    t = load_tables(spark, sf_dir)
    toks = t.documents.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("i0", "w")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "w")
    flagged = toks.withColumn(
        "stop", F.when(F.col("w").isin(*STOPWORDS["en"]), 1).otherwise(0)
    )
    wseg = Window.partitionBy("doc_id").orderBy("i")
    seg = flagged.withColumn("phrase_id", F.sum("stop").over(wseg))
    phrases = (
        seg.filter(F.col("stop") == 0)
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))), lambda s: s["w"]
                ),
                " ",
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
    )
    pw = phrases.select(
        "doc_id", "phrase_id", "plen", F.explode(F.split("phrase", " ")).alias("w")
    )
    ws = pw.groupBy("w").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("plen").alias("deg"),
        F.round(F.lit(1000000.0) * F.sum("plen") / F.count(F.lit(1)))
        .cast("long")
        .alias("score_micro"),
    )
    ps = (
        pw.join(ws.select("w", "score_micro"), "w")
        .groupBy("doc_id", "phrase_id")
        .agg(F.sum("score_micro").cast("long").alias("pscore_micro"))
    )
    dedup = (
        phrases.join(ps, ["doc_id", "phrase_id"])
        .groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("pscore_micro").alias("pscore_micro"),
        )
    )
    return (
        dedup.orderBy(F.col("pscore_micro").desc(), "phrase")
        .limit(20)
        .select(
            "phrase",
            "n_occurrences",
            (F.col("pscore_micro") / 1000000.0).alias("rake_score"),
        )
    )


# ------------------------------------------------- r10: classifier eval harness


@register(
    "text_langid_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang,
             CASE WHEN len(list_filter(string_split(text, ' '),
                       t -> t IN ({_SQL_STOP_EN}))) > 0
                  THEN 'en' ELSE 'unknown' END AS lang_guess
      FROM documents
    ),
    cells AS (
      SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY lang, lang_guess
    )
    SELECT lang, lang_guess, n,
           CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS label_total,
           CAST(SUM(n) OVER (PARTITION BY lang_guess) AS BIGINT) AS guess_total,
           CAST((1000 * n) // SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS recall_milli,
           CAST((1000 * n) // SUM(n) OVER (PARTITION BY lang_guess) AS BIGINT) AS precision_milli
    FROM cells
    """,
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier EVAL harness — the confusion matrix + per-cell
    precision/recall that turns `text_langid` from a scorer into a
    measured model: predictions join their ground-truth label (the
    fixture's lang column) in the same row, cells aggregate per
    (label, guess), and the marginals ride two partitioned windows
    over the ≤|langs|² cell relation. On the English-word-soup
    fixture the heuristic predicts 'en' for nearly everything, and
    the matrix SHOWS that failure mode quantitatively — which is the
    point of shipping the eval beside the model (every quality/langid
    filter at 100 TB gets audited exactly this way before it gates
    data). Integer-milli rates, no float decisions.

    Scale: one scan → one tiny cell aggregate; the windows run on
    |langs|² rows. The same harness shape evaluates any row-level
    classifier in the engine (quality LR, NB langid) against any
    labeled column."""
    t = load_tables(spark, sf_dir)
    en_hits = F.size(
        F.filter(T.ws_tokens("text"), lambda tk: tk.isin(*T.STOPWORDS["en"]))
    )
    pred = t.documents.select(
        "lang",
        F.when(en_hits > 0, F.lit("en")).otherwise(F.lit("unknown")).alias("lang_guess"),
    )
    cells = pred.groupBy("lang", "lang_guess").agg(F.count(F.lit(1)).alias("n"))
    wl = Window.partitionBy("lang")
    wg = Window.partitionBy("lang_guess")
    return cells.select(
        "lang",
        "lang_guess",
        "n",
        F.sum("n").over(wl).cast("long").alias("label_total"),
        F.sum("n").over(wg).cast("long").alias("guess_total"),
        F.expr("(1000 * n) div sum(n) over (partition by lang)").alias("recall_milli"),
        F.expr("(1000 * n) div sum(n) over (partition by lang_guess)").alias(
            "precision_milli"
        ),
    )
