"""Text-analysis column library — §2.I6-I8 + training-data-pipeline
operators (language-ID heuristic, quality scoring, token counting,
fingerprinting). All pure Column expressions — JVM-side, codegen'd,
no Python in the hot path, which is what makes these viable over
100 TB of documents."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "un", "es"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
}

TOKEN_RE = r"[a-zA-Z0-9]+"  # BPE-ish word pieces (alnum runs)

#: THE SQL spelling of the English stopword list — one definition for
#: every oracle that interpolates it (text_queries, pipeline_queries,
#: llm.py all import this; restating it per-module is how stopword
#: edits silently de-sync cross-policy comparisons).
SQL_STOP_EN = ", ".join(f"'{w}'" for w in STOPWORDS["en"])


def ws_tokens(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(ws_tokens(text))


def regex_token_count(text: Column | str, pattern: str = TOKEN_RE) -> Column:
    """Regex (BPE-ish) token count."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), 0))


def stopword_ratio(text: Column | str, lang: str = "en", scale: int = 4) -> Column:
    """Share of tokens that are stopwords of `lang`."""
    toks = ws_tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return F.round(hits.cast("double") / F.size(toks), scale)


def _stopword_hits(toks: Column, stopwords: list[str]) -> Column:
    # NB: the lambda must take exactly one parameter — F.filter passes
    # one lambda variable per declared parameter, so the usual
    # default-arg closure trick would receive a Column for it.
    return F.size(F.filter(toks, lambda t: t.isin(*stopwords)))


def language_guess(text: Column | str) -> Column:
    """Heuristic language ID: argmax stopword-hit count across the
    known lists (ties broken by list order: en, de, es, fr)."""
    toks = ws_tokens(text)
    counts = {lang: _stopword_hits(toks, sw) for lang, sw in STOPWORDS.items()}
    best = None
    for lang, cnt in counts.items():
        if best is None:
            best = F.struct(cnt.alias("n"), F.lit(lang).alias("lang"))
        else:
            cand = F.struct(cnt.alias("n"), F.lit(lang).alias("lang"))
            best = F.when(cand.getField("n") > best.getField("n"), cand).otherwise(best)
    return best.getField("lang")


def type_token_ratio(text: Column | str, scale: int = 4) -> Column:
    """Distinct-token / token ratio (lexical diversity)."""
    toks = ws_tokens(text)
    return F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), scale)


def avg_token_len(text: Column | str, scale: int = 4) -> Column:
    toks = ws_tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.round(total.cast("double") / F.size(toks), scale)


def quality_score(text: Column | str, scale: int = 4) -> Column:
    """Composite quality: lexical diversity + length saturation.
    (The shape of a production quality filter; weights are fixtures.)"""
    ttr = type_token_ratio(text, 6)
    len_sat = F.least(token_count(text).cast("double") / F.lit(100.0), F.lit(1.0))
    return F.round(F.lit(0.5) * ttr + F.lit(0.5) * len_sat, scale)


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set — the classic 'fingerprint' dedup key."""
    toks = ws_tokens(text)
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))


def gram_hashes(text: Column | str, k: int = 5) -> Column:
    """Hash per k-token shingle (the winnowing input) — the
    cross-engine md5 32-bit base hash (llmops.hex32), so winnowing
    fingerprints are SQL-oracle-checkable (DuckDB computes the
    identical value)."""
    from ..llmops import hex32

    toks = ws_tokens(text)
    n = F.size(toks)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: hex32(F.array_join(F.slice(toks, i + 1, k), " ")),
    )


def winnow_fingerprints(df, *, id_col: str = "doc_id", text_col: str = "text",
                        k: int = 5, w: int = 4):
    """Winnowing fingerprints (the MOSS algorithm) → (id, fp) rows:
    the MIN gram hash of each w-length window, deduplicated. A shared
    token run of ≥ k+w-1 tokens GUARANTEES a shared fingerprint — the
    substring-robust dedup key (`fingerprint` above breaks on any
    edit; winnowing only misses edits inside every window).

    Shape: posexplode the gram array (hashes computed ONCE — an
    array-of-windows expression slicing the gram expression inside a
    lambda re-evaluates the whole gram array per window element,
    measured ~50× blowup), then the window min is an incremental
    frame aggregate over pos. One shuffle on the id; O(tokens) rows of
    (id, pos, hash) in flight — the formulation that scales."""
    from pyspark.sql import Window

    # id-hash repartition spreads the gram hashing across the cluster
    # on few-split scans; the frame Window below requires exactly this
    # partitioning, so it costs no extra exchange. posexplode_OUTER +
    # isNotNull: a plain posexplode makes InferFiltersFromGenerate
    # re-evaluate the gram hashes below the repartition (llmops.
    # _lsh_shingle_buckets has the measurement); non-null text always
    # yields >= 1 gram, so outer is semantically identical.
    par = df.sparkSession.sparkContext.defaultParallelism
    g = (
        df.filter(F.col(text_col).isNotNull())
        .repartition(par, F.col(id_col))
        .select(F.col(id_col), F.posexplode_outer(gram_hashes(text_col, k)).alias("pos", "h"))
    )
    frame = Window.partitionBy(id_col).orderBy("pos").rowsBetween(Window.currentRow, w - 1)
    per_doc = Window.partitionBy(id_col)
    return (
        g.withColumn("fp", F.min("h").over(frame))
        .withColumn("__n", F.count(F.lit(1)).over(per_doc))
        .filter(F.col("pos") <= F.greatest(F.col("__n") - w, F.lit(0)))
        .select(F.col(id_col), "fp")
        .distinct()
    )


# ---------------------------------------------------------------- PII scrub

#: Cross-engine PII patterns (Java regex == RE2 on these constructs:
#: char classes, bounded repeats, \b — no lookaround, no backrefs).
#: Kept deliberately conservative; a production blocklist would add
#: IBAN/SSN/credit-card shapes the same way.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_RE = r"\+[0-9][0-9()\-. ]{6,}[0-9]"


def pii_scrub(text: Column | str) -> tuple[Column, Column, Column, Column]:
    """(n_emails, n_ips, n_phones, scrubbed) — the C4/Dolma-style PII
    pass as pure JVM regex columns. Scrub order matters and is fixed
    (emails → IPv4s → phones): each count is taken on the text AS THE
    PREVIOUS STAGE LEFT IT, so digit runs inside an already-redacted
    email can never double-count as a phone. The same sequence is
    replayable in DuckDB (RE2) because the patterns avoid every
    construct the two engines disagree on — the oracle of
    llm_pii_scrub runs it verbatim."""
    c = F.col(text) if isinstance(text, str) else text
    n_emails = F.regexp_count(c, F.lit(PII_EMAIL_RE))
    t1 = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    n_ips = F.regexp_count(t1, F.lit(PII_IPV4_RE))
    t2 = F.regexp_replace(t1, PII_IPV4_RE, "<IP>")
    n_phones = F.regexp_count(t2, F.lit(PII_PHONE_RE))
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return n_emails, n_ips, n_phones, t3


# ------------------------------------------------ Gopher rule bundle

#: THE Gopher thresholds (Rae et al. 2021) — single definition; the
#: rule bundle (text_gopher_rules), the policy ablation
#: (llm_policy_iou) and the curation DAG (llm_curation_pipeline) all
#: read these, so a threshold change cannot de-sync the comparisons.
GOPHER_MEAN_LEN_LO = 3
GOPHER_MEAN_LEN_HI = 10
GOPHER_MIN_DIVERSITY = 0.2
GOPHER_MAX_TOP_FRAC = 0.2


def gopher_token_stats(tc):
    """Per-doc token statistics from a (doc_id, token, cnt) relation —
    the shared front half of every Gopher-rule consumer: total/
    distinct token counts, hottest-token count, total token chars,
    stopword presence. One map-side-combinable doc aggregate."""
    return tc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("cnt").alias("top_cnt"),
        F.sum(F.length("token") * F.col("cnt")).alias("n_token_chars"),
        F.max(
            F.when(F.col("token").isin(*STOPWORDS["en"]), 1).otherwise(0)
        ).alias("has_stopword"),
    )


def gopher_pass():
    """The combined Gopher verdict as a Column over gopher_token_stats
    columns (raw ratios — the bundle's own thresholds)."""
    mean_len = F.col("n_token_chars") / F.col("n_tokens").cast("double")
    diversity = F.col("n_distinct") / F.col("n_tokens").cast("double")
    top_frac = F.col("top_cnt") / F.col("n_tokens").cast("double")
    return (
        mean_len.between(GOPHER_MEAN_LEN_LO, GOPHER_MEAN_LEN_HI)
        & (diversity >= GOPHER_MIN_DIVERSITY)
        & (top_frac <= GOPHER_MAX_TOP_FRAC)
        & (F.col("has_stopword") == 1)
    )


#: SQL twin of gopher_token_stats — interpolate with the source
#: relation providing (doc_id, text); yields CTEs `tc` and `s`.
SQL_GOPHER_STATS = f"""
    tc AS (
      SELECT doc_id, token, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM {{src}})
      GROUP BY doc_id, token
    ),
    s AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct,
             CAST(MAX(cnt) AS BIGINT) AS top_cnt,
             CAST(SUM(length(token) * cnt) AS BIGINT) AS n_token_chars,
             MAX(CASE WHEN token IN ({SQL_STOP_EN}) THEN 1 ELSE 0 END) AS has_stopword
      FROM tc GROUP BY doc_id
    )"""

#: SQL twin of gopher_pass() over the `s` CTE's columns.
SQL_GOPHER_PASS = (
    f"(n_token_chars / CAST(n_tokens AS DOUBLE) "
    f"BETWEEN {GOPHER_MEAN_LEN_LO} AND {GOPHER_MEAN_LEN_HI})"
    f" AND n_distinct / CAST(n_tokens AS DOUBLE) >= {GOPHER_MIN_DIVERSITY}"
    f" AND top_cnt / CAST(n_tokens AS DOUBLE) <= {GOPHER_MAX_TOP_FRAC}"
    f" AND has_stopword = 1"
)
