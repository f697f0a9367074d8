"""Property-based invariants (SURVEY.md §5.2.6) — hypothesis generates
small frames; we assert engine algebra that must hold at any scale."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from heroku_kafka_connect_spark.functions import smt
from heroku_kafka_connect_spark.sinks import writers

ROWS = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 100), st.text("abc", max_size=3)),
    min_size=0,
    max_size=25,
)

CFG = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, ts int, v string") if rows else spark.createDataFrame([], "k int, ts int, v string")


@given(rows=ROWS)
@CFG
def test_latest_per_key_is_idempotent_and_one_row_per_key(spark, rows):
    df = _df(spark, rows)
    once = writers.latest_per_key(df, ["k"], [F.col("ts").desc(), F.col("v").desc()])
    twice = writers.latest_per_key(once, ["k"], [F.col("ts").desc(), F.col("v").desc()])
    n_keys = df.select("k").distinct().count()
    assert once.count() == n_keys == twice.count()


@given(rows=ROWS)
@CFG
def test_filter_output_subset_of_input(spark, rows):
    df = _df(spark, rows)
    out = smt.filter_records(df, F.col("ts") > 50)
    assert out.count() <= df.count()
    assert out.filter(F.col("ts") <= 50).count() == 0


@given(rows=ROWS)
@CFG
def test_union_count_additive(spark, rows):
    df = _df(spark, rows)
    assert df.unionAll(df).count() == 2 * df.count()


@given(rows=ROWS)
@CFG
def test_dedup_exact_leaves_distinct_rows(spark, rows):
    df = _df(spark, rows)
    dd = df.dropDuplicates()
    assert dd.count() == df.distinct().count()
    assert dd.dropDuplicates().count() == dd.count()


@given(rows=ROWS, salts=st.integers(2, 6))
@CFG
def test_salted_join_equals_plain_join(spark, rows, salts):
    """Salting must never change join results — only shuffle layout."""
    from heroku_kafka_connect_spark.functions.skew import salted_join

    big = _df(spark, rows)
    small = spark.createDataFrame([(k, f"d{k}") for k in range(3)], "k int, name string")
    plain = sorted(map(tuple, big.join(small, ["k"]).collect()))
    salted = sorted(map(tuple, salted_join(big, small, ["k"], salts=salts).collect()))
    assert salted == plain


@given(rows=ROWS)
@CFG
def test_latest_per_key_agg_equals_window_variant(spark, rows):
    """Both latest-per-key physical shapes must agree given a unique
    total order (ts, v)."""
    df = _df(spark, rows)
    win = {
        (r.k, r.ts, r.v)
        for r in writers.latest_per_key(df, ["k"], [F.col("ts").desc(), F.col("v").desc()]).collect()
    }
    agg = {
        (r.k, r.ts, r.v)
        for r in writers.latest_per_key_agg(df, ["k"], F.struct("ts", "v")).collect()
    }
    assert win == agg


@given(toks=st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=30))
@CFG
def test_winnowing_deterministic_and_bounded(spark, toks):
    """Fingerprint count never exceeds window count; identical texts →
    identical fingerprint sets (determinism across rows)."""
    from heroku_kafka_connect_spark.functions.text import winnow_fingerprints

    text = " ".join(toks)
    df = spark.createDataFrame([(0, text), (1, text)], "doc_id int, text string")
    out = winnow_fingerprints(df, k=3, w=2)
    by_doc: dict[int, set] = {0: set(), 1: set()}
    for r in out.collect():
        by_doc[r.doc_id].add(r.fp)
    assert by_doc[0] == by_doc[1]
    n_windows = max(len(toks) - 3 - 2 + 2, 1)
    assert 1 <= len(by_doc[0]) <= n_windows


# ------------------------------------------------------- avro codec (pure python, no spark)

_AVRO_SCHEMA = {
    "type": "record",
    "name": "p",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "d", "type": "double"},
        {"name": "o", "type": ["null", "long"]},
        {"name": "t", "type": {"type": "array", "items": "string"}},
    ],
}


@given(
    recs=st.lists(
        st.fixed_dictionaries(
            {
                "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
                "s": st.text(max_size=40),
                "d": st.floats(allow_nan=False),
                "o": st.none() | st.integers(-(2**40), 2**40),
                "t": st.lists(st.text("xyz", max_size=4), max_size=4),
            }
        ),
        max_size=10,
    )
)
@settings(max_examples=60, deadline=None)
def test_avro_codec_roundtrip_property(recs):
    """decode(encode(r)) == r for any record of the supported types —
    the full int64 range (zigzag varint edges), unicode strings,
    arbitrary doubles, null unions, arrays."""
    from heroku_kafka_connect_spark.serde import avro_codec

    for rec in recs:
        buf = avro_codec.encode_record(rec, _AVRO_SCHEMA)
        assert avro_codec.decode_record(buf, _AVRO_SCHEMA) == rec


TEXTS = st.lists(
    st.text(alphabet="ab c", min_size=1, max_size=60).map(
        lambda s: " ".join(s.split()) or "x"
    ),
    min_size=1,
    max_size=10,
)


@given(texts=TEXTS)
@CFG
def test_token_blocks_are_lossless_chunking(spark, texts):
    """Concatenating a doc's 16-token blocks must reproduce the doc's
    token sequence exactly — block dedup can never lose or reorder
    content (the invariant that makes a block-level clean pass safe
    to reassemble)."""
    from heroku_kafka_connect_spark import llmops

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = df.select(
        "text",
        F.array_join(llmops.token_blocks("text", 16), " ").alias("rejoined"),
    ).collect()
    for r in got:
        assert r.rejoined == r.text


@given(ids=st.lists(st.integers(0, 10**9), min_size=0, max_size=30, unique=True))
@CFG
def test_ordered_pairs_complete_and_strictly_ordered(spark, ids):
    """ordered_pairs over a sorted id array yields exactly n(n-1)/2
    pairs, each with x < y — the pair-budget arithmetic every LSH
    bucket relies on."""
    from heroku_kafka_connect_spark import llmops

    df = spark.createDataFrame([(sorted(ids),)], "ids array<bigint>")
    rows = df.select(
        F.explode(llmops.ordered_pairs(F.col("ids"))).alias("p")
    ).select("p.x", "p.y").collect()
    n = len(ids)
    assert len(rows) == n * (n - 1) // 2
    assert all(r.x < r.y for r in rows)
    assert len({(r.x, r.y) for r in rows}) == len(rows)


@given(keys=st.lists(st.integers(-(10**6), 10**6), min_size=1, max_size=40))
@CFG
def test_md5_prefix_bucket_range_and_determinism(spark, keys):
    """Buckets land in [0, buckets) and are a pure function of the
    key — the contract that keeps hash sampling / splits / shards
    aligned across tables, engines and reruns."""
    from heroku_kafka_connect_spark import llmops

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    a = df.select("k", llmops.md5_prefix_bucket(F.col("k"), 100).alias("b")).collect()
    b = df.select("k", llmops.md5_prefix_bucket(F.col("k"), 100).alias("b")).collect()
    assert all(0 <= r.b < 100 for r in a)
    assert {(r.k, r.b) for r in a} == {(r.k, r.b) for r in b}


class _FakeGroupState:
    """Minimal GroupState stub for driving make_sessionize_fn's pure
    merge logic without a streaming query."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = tuple(v)

    def remove(self):
        self._val = None

    def setTimeoutTimestamp(self, ts):
        pass


def _oracle_islands(ts_list, gap_us):
    out = []
    for t in sorted(ts_list):
        if out and t - out[-1][1] <= gap_us:
            out[-1][1] = max(out[-1][1], t)
            out[-1][2] += 1
        else:
            out.append([t, t, 1])
    return [tuple(s) for s in out]


@given(
    ts=st.lists(st.integers(0, 4000), min_size=1, max_size=30),
    cuts=st.lists(st.integers(1, 29), max_size=4),
    shuffle_seed=st.integers(0, 2**16),
)
@settings(max_examples=60, deadline=None)
def test_sessionize_invariant_under_batch_splits_and_intra_batch_order(
    ts, cuts, shuffle_seed
):
    """Replay determinism of the sessionize merge: chunk the SORTED
    event sequence at arbitrary points into micro-batches, shuffle
    each batch internally, and the emitted sessions (closed + the
    final open interval) must equal global gaps-and-islands over the
    whole sequence — output must not depend on micro-batch boundaries
    or intra-batch arrival order. (Out-of-order LATE batches are the
    separately-tested bounded-state trade-off:
    tests/test_streaming.py very-late-event tests.)"""
    import random

    import pandas as pd

    from heroku_kafka_connect_spark.streaming import stateful

    # gap_ms granularity is 1000 µs: 1 ms gap + ×100-spread event
    # times makes islands actually form and split
    fn = stateful.make_sessionize_fn(gap_ms=1)
    gap_us = 1000
    ts = [t * 100 for t in ts]

    events = sorted(ts)
    bounds = sorted({c for c in cuts if c < len(events)})
    batches, prev = [], 0
    for b in bounds + [len(events)]:
        if b > prev:
            batches.append(events[prev:b])
            prev = b
    rng = random.Random(shuffle_seed)
    state = _FakeGroupState()
    emitted = []
    for batch in batches:
        batch = batch[:]
        rng.shuffle(batch)
        pdf = pd.DataFrame({"ts_us": batch})
        for out in fn(("u",), [pdf], state):
            emitted.extend(
                zip(out.session_start_us, out.session_end_us, out.n_events)
            )
    if state.exists:
        emitted.append(state.get)
    assert sorted(emitted) == _oracle_islands(ts, gap_us)


@given(
    cents=st.lists(st.integers(-10**8, 10**8), min_size=1, max_size=40),
    groups=st.integers(1, 3),
)
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_msum_matches_duckdb_exactly_on_arbitrary_money(spark, cents, groups):
    """The r4 scaled-long money-sum family must be BIT-identical to
    its DuckDB oracle spelling for arbitrary 2-dp inputs (not just the
    fixture's): same ROUND(x*100) integers, same long sums, same final
    double division — any drift here silently breaks every
    hash-checked aggregate."""
    import duckdb

    from heroku_kafka_connect_spark.operators.common import (
        mavg,
        msum,
        o_mavg,
        o_msum,
    )

    rows = [(i % groups, c / 100.0) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, "g int, v double")
    got = {
        r.g: (r.s, r.a)
        for r in df.groupBy("g")
        .agg(msum("v").alias("s"), mavg("v").alias("a"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (g INT, v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = {
        g: (s, a)
        for g, s, a in con.execute(
            f"SELECT g, {o_msum('v')} AS s, {o_mavg('v')} AS a FROM t GROUP BY g"
        ).fetchall()
    }
    assert got == want


@given(
    texts=st.lists(
        st.text(
            alphabet="ab @.+-()0123456789x",
            min_size=0,
            max_size=80,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pii_scrub_matches_duckdb_on_adversarial_text(spark, texts):
    """Java-regex vs RE2 dialect parity for the PII patterns on
    adversarial soup (digit runs, dots, plus signs, parens, @s):
    counts AND scrubbed text must agree with the DuckDB replay —
    leftmost-first matching, greedy repeats, and \\b must behave
    identically or the llm_pii_scrub oracle silently rots."""
    import duckdb

    from heroku_kafka_connect_spark.functions.text import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_scrub,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    ne, ni, np_, clean = pii_scrub("text")
    got = {
        r.i: (r.ne, r.ni, r.np, r.c)
        for r in df.select(
            "i", ne.alias("ne"), ni.alias("ni"), np_.alias("np"), clean.alias("c")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    want = {
        i: (ne, ni, np2, c)
        for i, ne, ni, np2, c in con.execute(
            f"""
            SELECT i,
                   len(regexp_extract_all(text, '{PII_EMAIL_RE}')),
                   len(regexp_extract_all(t1, '{PII_IPV4_RE}')),
                   len(regexp_extract_all(t2, '{PII_PHONE_RE}')),
                   regexp_replace(t2, '{PII_PHONE_RE}', '<PHONE>', 'g')
            FROM (
              SELECT i, text, t1,
                     regexp_replace(t1, '{PII_IPV4_RE}', '<IP>', 'g') AS t2
              FROM (
                SELECT i, text,
                       regexp_replace(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g') AS t1
                FROM t))
            """
        ).fetchall()
    }
    assert got == want


@given(
    keys=st.sets(st.integers(min_value=0, max_value=200), min_size=2, max_size=60),
    bucket=st.sampled_from([4, 8, 16, 1024]),
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gap_ranges_bucketed_equals_global(spark, keys, bucket):
    """The bucketed-lag decomposition (src_offset_gap_audit's core)
    must return exactly the gaps a naive global scan finds, for any
    key set and any bucket size — including buckets far smaller than
    the key range, which maximizes cross-boundary gaps."""
    from heroku_kafka_connect_spark.operators.sources_queries import gap_ranges

    df = spark.createDataFrame([(k,) for k in sorted(keys)], "key long")
    got = sorted(
        (r.gap_start, r.gap_end, r.n_missing)
        for r in gap_ranges(df, bucket_size=bucket).collect()
    )
    ks = sorted(keys)
    expect = [
        (a + 1, b - 1, b - a - 1)
        for a, b in zip(ks, ks[1:])
        if b - a > 1
    ]
    assert got == expect


# ---------------------------------------------------------------- r6


EVENTS = st.lists(
    st.tuples(
        st.integers(0, 4),          # user
        st.integers(0, 10_000),     # seconds offset
    ),
    min_size=0,
    max_size=30,
    unique=True,
)


@given(rows=EVENTS)
@CFG
def test_sessionize_decomposition_equals_naive(spark, rows):
    """The lag→flag→prefix-sum sessionization (rel_sessionize_gap's
    core) must equal a naive driver-side pass for ANY event set:
    same number of sessions per user, gap rule strictly > 600 s."""
    from pyspark.sql import Window

    gap = 600
    if rows:
        df = spark.createDataFrame(rows, "u int, s long")
    else:
        df = spark.createDataFrame([], "u int, s long")
    wo = Window.partitionBy("u").orderBy("s")
    sess = (
        df.withColumn("prev", F.lag("s").over(wo))
        .withColumn(
            "new",
            F.when(F.col("prev").isNull() | (F.col("s") - F.col("prev") > gap), 1)
            .otherwise(0),
        )
        .groupBy("u")
        .agg(F.sum("new").alias("n_sessions"))
    )
    got = {r.u: r.n_sessions for r in sess.collect()}
    # naive replay
    from collections import defaultdict

    by_u = defaultdict(list)
    for u, s in rows:
        by_u[u].append(s)
    want = {}
    for u, ss in by_u.items():
        ss.sort()
        n = 1
        for a, b in zip(ss, ss[1:]):
            if b - a > gap:
                n += 1
        want[u] = n
    assert got == want


@given(rows=EVENTS)
@CFG
def test_rolling_distinct_explode_equals_naive(spark, rows):
    """The explode-to-anchor-days decomposition (rel_rolling_distinct
    _users's core) must equal the per-day rescan for ANY (user, day)
    set: rolling-7 distinct per existing day."""
    days = [(u, s % 30) for u, s in rows]  # day in 0..29
    if days:
        df = spark.createDataFrame(days, "u int, d int").distinct()
    else:
        df = spark.createDataFrame([], "u int, d int")
    day_dim = df.select("d").distinct()
    contrib = df.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + 6)).alias("anchor"), "u"
    )
    rolled = (
        contrib.join(day_dim.withColumnRenamed("d", "anchor"), "anchor", "left_semi")
        .groupBy("anchor")
        .agg(F.countDistinct("u").alias("n"))
    )
    got = {r.anchor: r.n for r in rolled.collect()}
    uniq = set(days)
    want = {}
    for d in {d for _, d in uniq}:
        want[d] = len({u for u, dd in uniq if d - 6 <= dd <= d})
    assert got == want


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.text("abcd", min_size=1, max_size=4)),
        min_size=1,
        max_size=25,
    )
)
@CFG
def test_dlq_stamp_bucket_decomposition_is_total_and_stable(spark, rows):
    """The hash-bucket + offset __row_n decomposition (controlplane
    stamp): for ANY batch the stamps are a permutation of 1..n, and
    identical content re-derives identical stamps."""
    from pyspark.sql import Window

    df = spark.createDataFrame(rows, "k int, v string")
    keys = [F.col("k"), F.col("v")]
    nb = 8

    def stamp(bdf):
        tmp = bdf.withColumn("b", F.pmod(F.xxhash64(*keys), F.lit(nb)).cast("int"))
        counts = tmp.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
        woff = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
        offs = counts.select(
            "b", F.coalesce(F.sum("c").over(woff), F.lit(0)).alias("off")
        )
        wrn = Window.partitionBy("b").orderBy(*keys)
        return (
            tmp.withColumn("rn", F.row_number().over(wrn))
            .join(F.broadcast(offs), "b")
            .withColumn("row_n", (F.col("off") + F.col("rn")).cast("int"))
            .drop("b", "rn", "off")
        )

    a = sorted((r.k, r.v, r.row_n) for r in stamp(df).collect())
    b = sorted((r.k, r.v, r.row_n) for r in stamp(df).collect())
    assert a == b
    assert sorted(x[2] for x in a) == list(range(1, len(rows) + 1))


# ------------------------------------------------- r8: codec properties


@given(
    recs=st.lists(
        st.tuples(st.integers(-(2**62), 2**62), st.text(max_size=40)),
        max_size=60,
    ),
    block=st.integers(1, 7),
)
@settings(max_examples=60, deadline=None)
def test_avro_ocf_roundtrip_any_payload(recs, block):
    """OCF write→read is the identity for arbitrary record lists and
    ANY block size (incl. blocks smaller than the record count, which
    exercises the multi-block + trailing-partial-block paths)."""
    from heroku_kafka_connect_spark.serde.avro_ocf import read_ocf, write_ocf

    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": "string"},
        ],
    }
    rows = [{"k": k, "s": s} for k, s in recs]
    back, parsed = read_ocf(write_ocf(rows, schema, block_records=block))
    assert back == rows
    assert parsed["fields"][0]["name"] == "k"


@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_png_pixel_roundtrip_any_grid(w, h, data):
    """encode_png_gray→decode_png_pixels is the identity for any
    dimensions and pixel content (the pixel-level contract behind
    mm_image_ahash)."""
    from heroku_kafka_connect_spark.functions.multimodal import (
        decode_png_pixels,
        encode_png_gray,
    )

    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    assert decode_png_pixels(encode_png_gray(w, h, px)) == (w, h, px)


@given(xs=st.lists(st.integers(0, 5000), min_size=2, max_size=40))
@settings(max_examples=60, deadline=None)
def test_holt_rounding_matches_duckdb_round(xs):
    """The driver-side Holt recursion must replay EXACTLY under
    DuckDB's ROUND (half away from zero) — the property the r8
    half-up/half-away fix pinned. Replays the recursion in DuckDB SQL
    scalar steps for a random series and diffs the integer state."""
    import duckdb
    import math

    def half_away(v):
        return math.floor(v + 0.5) if v >= 0 else math.ceil(v - 0.5)

    con = duckdb.connect()
    l = xs[0] * 1000000
    b = (xs[1] - xs[0]) * 1000000
    for x in xs[1:]:
        l_py = half_away(0.3 * (x * 1000000) + 0.7 * (l + b))
        b_py = half_away(0.1 * (l_py - l) + 0.9 * b)
        l_du, b_du = con.execute(
            f"""SELECT CAST(ROUND(0.3E0 * (CAST({x} AS BIGINT) * 1000000) + 0.7E0 * (CAST({l} AS BIGINT) + CAST({b} AS BIGINT))) AS BIGINT),
                       CAST(ROUND(0.1E0 * (CAST(ROUND(0.3E0 * (CAST({x} AS BIGINT) * 1000000)
                             + 0.7E0 * (CAST({l} AS BIGINT) + CAST({b} AS BIGINT))) AS BIGINT) - CAST({l} AS BIGINT)) + 0.9E0 * CAST({b} AS BIGINT)) AS BIGINT)"""
        ).fetchone()
        assert (l_py, b_py) == (l_du, b_du), (x, l, b)
        l, b = l_py, b_py


# ---------------------------------------------------------------- r9 invariants


def _lev2(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    strings=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=7), min_size=2, max_size=10
    )
)
@CFG
def test_deletion_neighborhood_join_complete_for_lev2(spark, strings):
    """FastSS completeness (rel_entity_match's candidate generator):
    EVERY pair with |Δlen| ≤ 1 and lev ≤ 2 must share a ≤2-deletion
    variant — checked via the real SQL expression on arbitrary
    small-alphabet strings (where lev≤2 pairs are dense and every
    edit composition occurs)."""
    from heroku_kafka_connect_spark.operators.relational import (
        _deletion_variants_sql,
    )

    rows = [(i, s) for i, s in enumerate(strings)]
    df = spark.createDataFrame(rows, "id int, s string")
    v = df.select("id", "s", F.explode(F.expr(_deletion_variants_sql("s"))).alias("v"))
    a = v.select(F.col("id").alias("ia"), F.col("s").alias("sa"), "v")
    b = v.select(F.col("id").alias("ib"), F.col("s").alias("sb"), F.col("v").alias("vb"))
    got = {
        (r["ia"], r["ib"])
        for r in a.join(b, (a.v == b.vb) & (a.ia < b.ib)).select("ia", "ib").distinct().collect()
    }
    for (i, x), (j, y) in __import__("itertools").combinations(rows, 2):
        if abs(len(x) - len(y)) <= 1 and _lev2(x, y) <= 2:
            assert (i, j) in got, (x, y)


@given(
    sets=st.lists(
        st.frozensets(st.integers(0, 12), min_size=1, max_size=8),
        min_size=2,
        max_size=8,
    )
)
@CFG
def test_prefix_filter_principle_never_misses(spark, sets):
    """Prefix-filter completeness (text_setjoin_prefix's principle):
    under ANY global order, two sets with Jaccard ≥ 1/2 share an
    element within their first |s|//2 + 1 elements. Checked in pure
    set algebra over arbitrary small universes — the principle the
    Spark plan relies on, independent of the frequency order chosen."""
    for A, B in __import__("itertools").combinations(sets, 2):
        if len(A & B) / len(A | B) >= 0.5:
            pa = sorted(A)[: len(A) // 2 + 1]
            pb = sorted(B)[: len(B) // 2 + 1]
            assert set(pa) & set(pb), (A, B)


@given(texts=st.lists(st.text(alphabet="abcd ", min_size=1, max_size=40), min_size=1, max_size=6))
@CFG
def test_cdc_bounds_partition_the_payload(spark, texts):
    """mm_cdc_chunking's bounds must PARTITION [0, L): chunks are
    contiguous, non-empty, and reassemble the original byte string —
    checked via the real bounds expression on arbitrary text."""
    rows = [(i, t) for i, t in enumerate(texts) if len(t) > 0]
    if not rows:
        return
    df = spark.createDataFrame(rows, "id int, text string")
    L = F.length("text")
    poly = lambda i: (  # noqa: E731
        (
            (
                F.ascii(F.col("text").substr(i - 3, F.lit(1))) * 31
                + F.ascii(F.col("text").substr(i - 2, F.lit(1)))
            )
            * 31
            + F.ascii(F.col("text").substr(i - 1, F.lit(1)))
        )
        * 31
        + F.ascii(F.col("text").substr(i, F.lit(1)))
    )
    cuts = F.filter(
        F.transform(
            F.sequence(F.lit(4), F.greatest(L, F.lit(4))),
            lambda i: F.when((i <= L) & (poly(i) % 16 == 0), i).otherwise(F.lit(-1)),
        ),
        lambda x: x > 0,
    )
    out = df.select(
        "id",
        "text",
        F.array_sort(
            F.array_distinct(F.concat(F.array(F.lit(0)), cuts, F.array(L.cast("int"))))
        ).alias("bounds"),
    ).collect()
    for r in out:
        b = r["bounds"]
        assert b[0] == 0 and b[-1] == len(r["text"])
        assert all(x < y for x, y in zip(b, b[1:]))  # non-empty, ordered
        rebuilt = "".join(r["text"][x:y] for x, y in zip(b, b[1:]))
        assert rebuilt == r["text"]
