"""§2.A — source-mode corpus queries, exercising sources/jdbc.py and
sources/kafka.py against the fixtures with DuckDB oracles. The stored
offsets below are fixed constants (a mid-keyspace watermark) so the
incremental reads return a stable, non-trivial subset at every sf."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import load_tables
from .common import mlong, msum, o_msum, ts_us
from ..sources import jdbc
from ..sources.kafka import envelope_from_events

_INC_OFFSET = jdbc.Offset(incrementing=800)
_TS_OFFSET = jdbc.Offset(timestamp="1999-06-01 00:00:00")
_TSINC_OFFSET = jdbc.Offset(timestamp="1999-06-01 00:00:00", incrementing=800)

# The derived fixtures below (partitioned orders, two-generation
# docs) are deterministic functions of the immutable sf_dir parquet,
# so one write per session suffices — repeat invocations (bench runs
# time these as READS) must not silently pay a full rewrite, and the
# application-unique path means two concurrent runs on the same
# sf_dir never race a reader against an in-progress overwrite. The
# memo itself lives in operators/common.py (r10 ADVICE: shared by the
# compaction/zorder/footer/foreachBatch APPLY operators too).
from .common import derived_fixture as _derived_fixture  # noqa: E402


@register(
    "src_bulk_scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           epoch_us(o_orderdate) AS o_orderdate, o_orderpriority
    FROM orders
    """,
)
def src_bulk_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 mode=bulk: full snapshot per poll. (o_orderdate re-emitted
    as epoch µs for cross-engine hashing.)"""
    t = load_tables(spark, sf_dir)
    return jdbc.bulk(t.orders).withColumn("o_orderdate", ts_us("o_orderdate"))


@register(
    "src_incrementing",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_orderkey > 800
    """,
)
def src_incrementing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 mode=incrementing: id > stored offset; predicate reaches the
    scan (JDBC pushdown / parquet row-group pruning)."""
    t = load_tables(spark, sf_dir)
    return jdbc.poll(t.orders, "incrementing", _INC_OFFSET, id_col="o_orderkey").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@register(
    "src_timestamp",
    oracle="""
    SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us, o_totalprice FROM orders
    WHERE o_orderdate > TIMESTAMP '1999-06-01 00:00:00'
    """,
)
def src_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 mode=timestamp: ts column > last-seen watermark."""
    t = load_tables(spark, sf_dir)
    return jdbc.poll(t.orders, "timestamp", _TS_OFFSET, ts_col="o_orderdate").select(
        "o_orderkey", ts_us("o_orderdate").alias("o_orderdate_us"), "o_totalprice"
    )


@register(
    "src_ts_incrementing",
    oracle="""
    SELECT o_orderkey, epoch_us(o_orderdate) AS o_orderdate_us FROM orders
    WHERE o_orderdate > TIMESTAMP '1999-06-01 00:00:00'
       OR (o_orderdate = TIMESTAMP '1999-06-01 00:00:00' AND o_orderkey > 800)
    """,
)
def src_ts_incrementing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 mode=timestamp+incrementing: tie-safe compound watermark."""
    t = load_tables(spark, sf_dir)
    return jdbc.poll(
        t.orders, "timestamp+incrementing", _TSINC_OFFSET, id_col="o_orderkey", ts_col="o_orderdate"
    ).select("o_orderkey", ts_us("o_orderdate").alias("o_orderdate_us"))


@register(
    "src_query_pushdown",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 150000
    """,
)
def src_query_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 query= mode: user SQL pushed to the source — expressed
    declaratively so Catalyst pushes filter+projection into the scan
    (the same SQL would ship to a remote DB via jdbc.read_query)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "src_kafka_envelope",
    oracle="""
    SELECT CAST(user_id AS VARCHAR) AS key_str,
           props AS value_str,
           'events' AS topic,
           CAST(user_id % 8 AS INTEGER) AS partition,
           event_id AS "offset",
           epoch_us(ts) AS ts_us
    FROM events
    """,
)
def src_kafka_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 Kafka source envelope: the batch fixture projected into the
    exact (key, value, topic, partition, offset, timestamp) record
    shape of spark.readStream.format('kafka') — binary key/value
    decoded back to strings for hashing."""
    t = load_tables(spark, sf_dir)
    env = envelope_from_events(t.events)
    return env.select(
        F.decode("key", "UTF-8").alias("key_str"),
        F.decode("value", "UTF-8").alias("value_str"),
        "topic",
        "partition",
        "offset",
        ts_us("timestamp").alias("ts_us"),
    )


@register(
    "src_python_datasource",
    oracle="""
    WITH ids AS (SELECT unnest(generate_series(0, 1999)) AS doc_id),
    w AS (
      SELECT ids.doc_id, i.i AS i,
             (['the','a','spark','query','row','data','join','filter',
               'window','stream','batch','merge','sort','agg','key',
               'table','scan','hash','group','order','line','part',
               'value','column'])
             [1 + CAST(concat('0x', substr(md5('w:' || ids.doc_id || ':' || i.i), 1, 8)) AS BIGINT) % 24]
               AS word
      FROM ids, LATERAL (
        SELECT unnest(generate_series(0,
          4 + CAST(concat('0x', substr(md5('n:' || ids.doc_id), 1, 8)) AS BIGINT) % 28)) AS i
      ) i
    ),
    t AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) AS text FROM w GROUP BY doc_id)
    SELECT doc_id,
           md5(text) AS text_hash,
           CAST(length(text) AS BIGINT) AS n_chars,
           (['de','en','es','fr','zh'])
             [1 + CAST(concat('0x', substr(md5('l:' || doc_id), 1, 8)) AS BIGINT) % 5] AS lang,
           'src' || CAST(CAST(concat('0x', substr(md5('s:' || doc_id), 1, 8)) AS BIGINT) % 10 AS VARCHAR)
             AS source
    FROM t
    """,
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A: custom Python DataSource (Spark 4 API) — the engine's own
    generator connector (sources/synthetic.py): 2000 documents-shaped
    rows computed, not read, each field an md5 of a namespaced key.
    The oracle REPLAYS the generator in DuckDB and the driver
    hash-compares md5(text) per row, pinning the whole generation
    function cross-engine. Scale: partitions are index ranges —
    generation is pure per-row compute, embarrassingly parallel, zero
    IO; `option("rows", 10**10)` is a valid 100 TB soak input."""
    from ..sources.synthetic import register_synthetic_sources

    register_synthetic_sources(spark)
    df = (
        spark.read.format("hkc_synthdocs")
        .option("rows", 2000)
        .option("partitions", 8)
        .load()
    )
    return df.select(
        "doc_id",
        F.md5("text").alias("text_hash"),
        "n_chars",
        "lang",
        "source",
    )


@register(
    "src_partition_pruning",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def src_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A: Hive-style partitioned dataset + partition PRUNING — the
    single most important scan optimization at 100 TB: the fixture is
    written `partitionBy(o_orderpriority)` (one directory per value),
    and the filtered read shows `PartitionFilters:
    [isnotnull(...), (o_orderpriority = 1-URGENT)]` with only that
    directory's files ever listed — 4/5 of the data is skipped before
    a single byte is read, vs a PushedFilter which still opens every
    footer. Written ONCE per (application, sf) under a session-unique
    /tmp path (_derived_fixture); on a real lake this is the table's
    permanent layout, chosen by write-time `partitionBy` on the
    ingest path (sinks/writers.py)."""
    t = load_tables(spark, sf_dir)

    def _write(loc: str) -> None:
        (
            t.orders.select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
            )
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(loc)
        )

    loc = _derived_fixture(spark, sf_dir, "part_orders", _write)
    return (
        spark.read.parquet(loc)
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "src_schema_merge",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN doc_id % 2 = 1 THEN source ELSE NULL END AS source
    FROM documents
    """,
)
def src_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A: schema-evolution read (`mergeSchema`) — a v1 writer emitted
    (doc_id, lang), a later v2 writer added `source`; one read over
    both generations returns the WIDENED schema with nulls where v1
    rows predate the column. This is how a 100 TB lake absorbs
    additive schema change without rewriting history: merging is a
    FOOTER-level union (Spark reconciles the Parquet schemas at
    planning), the row data is never touched. Non-additive changes
    (type narrowing, renames) still belong to the staged-MERGE path
    in sinks/writers.py."""
    t = load_tables(spark, sf_dir)
    docs = t.documents

    def _write(loc: str) -> None:
        docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
            "overwrite"
        ).parquet(f"{loc}/gen=v1")
        docs.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "source"
        ).write.mode("overwrite").parquet(f"{loc}/gen=v2")

    loc = _derived_fixture(spark, sf_dir, "schemagen", _write)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(f"{loc}/gen=v1", f"{loc}/gen=v2")
        .select("doc_id", "lang", "source")
    )




def gap_ranges(keys: DataFrame, bucket_size: int = 1024) -> DataFrame:
    """(gap_start, gap_end, n_missing) between consecutive values of
    ``keys.key`` — the bucketed-lag decomposition (intra-bucket window
    + |buckets|-row boundary lag) equivalent to one global LAG but
    with no single-partition corpus sort. Property-tested equal to
    the naive global computation on random key sets
    (tests/test_properties.py)."""
    k = keys.select("key", F.floor(F.col("key") / bucket_size).alias("b"))
    wi = Window.partitionBy("b").orderBy("key")
    intra = (
        k.withColumn("prev", F.lag("key").over(wi))
        .filter(F.col("prev").isNotNull() & (F.col("key") - F.col("prev") > 1))
        .select(
            (F.col("prev") + 1).alias("gap_start"),
            (F.col("key") - 1).alias("gap_end"),
        )
    )
    bounds = k.groupBy("b").agg(F.min("key").alias("mn"), F.max("key").alias("mx"))
    wb = Window.orderBy("b")  # |buckets| rows — key-space/bucket_size, not corpus
    inter = (
        bounds.withColumn("prev_mx", F.lag("mx").over(wb))
        .filter(F.col("prev_mx").isNotNull() & (F.col("mn") - F.col("prev_mx") > 1))
        .select(
            (F.col("prev_mx") + 1).alias("gap_start"),
            (F.col("mn") - 1).alias("gap_end"),
        )
    )
    return intra.unionByName(inter).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("n_missing"),
    )


@register(
    "src_offset_gap_audit",
    oracle="""
    WITH k AS (SELECT o_orderkey AS key FROM orders WHERE o_orderstatus = 'F'),
    l AS (SELECT key, lag(key) OVER (ORDER BY key) AS prev FROM k)
    SELECT prev + 1 AS gap_start, key - 1 AS gap_end, key - prev - 1 AS n_missing
    FROM l WHERE prev IS NOT NULL AND key - prev > 1
    """,
)
def src_offset_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A: offset-continuity audit for incremental ingest — the ranges
    of ids MISSING from an ingested slice (here the 'F'-status
    partition), i.e. the holes an incrementing-mode consumer must
    re-poll. The oracle states it as one global LAG; the Spark plan
    computes the identical ranges WITHOUT a single-partition sort:
    keys bucket by key>>10, intra-bucket gaps come from a
    bucket-partitioned lag, and cross-bucket gaps from a lag over the
    per-bucket (min,max) boundary relation (|buckets| rows — tiny at
    any scale). Same offset+local-window decomposition as
    llm_curriculum_order: full parallelism on the corpus-sized part,
    the serial part bounded by key-space/1024."""
    t = load_tables(spark, sf_dir)
    keys = t.orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("key")
    )
    return gap_ranges(keys, bucket_size=1024)


# ------------------------------------------------- r6: JSONL permissive


@register(
    "src_jsonl_permissive",
    oracle="""
    WITH line AS (
      SELECT doc_id,
             '{"doc_id": ' || doc_id || ', "lang": "' || lang
               || '", "n_chars": ' || n_chars || '}' AS l,
             doc_id % 10 = 3 AS bad
      FROM documents
    )
    SELECT CASE WHEN bad THEN NULL ELSE d.doc_id END AS doc_id,
           CASE WHEN bad THEN NULL ELSE d.lang END AS lang,
           CASE WHEN bad THEN NULL ELSE d.n_chars END AS n_chars,
           CASE WHEN bad THEN substr(l, 1, 15) END AS corrupt_record,
           bad AS is_corrupt
    FROM line JOIN documents d USING (doc_id)
    """,
)
def src_jsonl_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-row: JSON-lines ingestion with PERMISSIVE mode + the
    `_corrupt_record` column — the Connect-JSON-converter failure
    semantics (`errors.tolerance=all`) expressed at the SOURCE: every
    line yields a row; malformed lines land with all fields NULL and
    the raw text preserved for the DLQ instead of killing the scan.
    The fixture plants deterministic corruption (every doc_id%10==3
    line truncated mid-key) so the oracle can replay both the parse
    AND the preserved raw prefix.

    Scale: the JSON scan is a narrow per-line parse (JacksonParser in
    the scan operator, no shuffle); corruption handling adds no extra
    pass — PERMISSIVE is exactly how a 100 TB raw-JSON lake ingests
    without a pre-validation job."""
    t = load_tables(spark, sf_dir)

    line = F.concat(
        F.lit('{"doc_id": '),
        F.col("doc_id"),
        F.lit(', "lang": "'),
        F.col("lang"),
        F.lit('", "n_chars": '),
        F.col("n_chars"),
        F.lit("}"),
    )

    def _write(loc: str) -> None:
        t.documents.select(
            F.when(F.col("doc_id") % 10 == 3, F.substring(line, 1, 15))
            .otherwise(line)
            .alias("value")
        ).write.mode("overwrite").text(loc)

    loc = _derived_fixture(spark, sf_dir, "jsonl", _write)
    read = (
        spark.read.schema(
            "doc_id bigint, lang string, n_chars bigint, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(loc)
    )
    return read.select(
        "doc_id",
        "lang",
        "n_chars",
        F.col("_corrupt_record").alias("corrupt_record"),
        F.col("_corrupt_record").isNotNull().alias("is_corrupt"),
    )


# ------------------------------------------------- r6: ORC roundtrip


@register(
    "src_orc_roundtrip",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {o_msum("l_quantity")} AS sum_qty
    FROM lineitem
    WHERE l_quantity > 25
    GROUP BY l_returnflag
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-row: ORC as a first-class columnar format — write the fact
    columns as ORC once per session, read back with a pushed
    predicate, aggregate. ORC is the other lake format a migrating
    Connect user will have on hand (Hive heritage); this proves the
    engine round-trips it with the same pushdown/pruning behavior as
    parquet (the filter reaches the OrcScan as a PushedFilter; only
    the 3 needed columns are read)."""
    t = load_tables(spark, sf_dir)

    def _write(loc: str) -> None:
        t.lineitem.select("l_orderkey", "l_quantity", "l_returnflag").write.mode(
            "overwrite"
        ).orc(loc)

    loc = _derived_fixture(spark, sf_dir, "orc", _write)
    return (
        spark.read.orc(loc)
        .filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), msum("l_quantity").alias("sum_qty"))
    )


# ------------------------------------------------- r8: CSV source


@register(
    "src_csv_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS sum_bal,
           CAST(SUM(CASE WHEN c_name LIKE '%,%' OR c_name LIKE '%"%' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_quoted
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-row: CSV as a first-class source — the format every Connect
    migration actually starts from (the reference's JDBC sources are
    routinely seeded by CSV loads). The customer dim is written once
    per session as headered CSV (quoting exercised via the name
    column) and read back with an EXPLICIT schema + FAILFAST, then
    filtered and aggregated.

    Scale notes: CSV is the anti-parquet — row-oriented, no column
    pruning, no predicate pushdown, no statistics; the filter here
    runs post-parse and the docstring exists to say so. The correct
    100 TB posture is exactly this query's shape: read CSV ONCE with
    a pinned schema (schema inference is a full extra pass at scale —
    never on by default), convert to parquet, and serve every
    downstream query from the columnar copy. FAILFAST surfaces
    malformed rows at ingest instead of silently nulling columns
    (PERMISSIVE + _corrupt_record is the JSONL query's contract —
    both postures covered)."""
    t = load_tables(spark, sf_dir)

    def _write(loc: str) -> None:
        t.customer.write.mode("overwrite").option("header", True).csv(loc)

    loc = _derived_fixture(spark, sf_dir, "csv", _write)
    schema = "c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"
    quoted = F.col("c_name").contains(",") | F.col("c_name").contains('"')
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(loc)
        .filter(F.col("c_acctbal") > 0)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(mlong("c_acctbal")) / 100.0).cast("double").alias("sum_bal"),
            F.sum(F.when(quoted, 1).otherwise(0)).alias("n_quoted"),
        )
    )


# ------------------------------------------------- r10: parquet footer audit


@register(
    "src_footer_stats_audit",
    oracle="""
    SELECT o_orderkey % 16 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS n_rowgroups,
           CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS min_cents,
           CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM orders GROUP BY 1
    """,
)
def src_footer_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet FOOTER statistics audit — the lake-maintenance job that
    answers 'can the zone maps be trusted?' by reading ONLY metadata:
    write the table as one file per key bucket (modulo buckets — a
    FIXED file count at every scale, where a range divisor on the
    sparse TPC-H orderkey exploded to ~1200 directories at sf0.1 and
    quintupled the wall in dynamic-partition commit), then fan the FILE
    LIST out to executors where each task opens its files' parquet
    footers (pyarrow.parquet.ParquetFile — row-group count, row
    count, column min/max statistics) without touching a single data
    page. The emitted relation is built purely from footer bytes; the
    oracle recomputes the same numbers from the DATA — equality
    proves the writer's stats are sound, which is the precondition
    for every file-skipping plan (`rel_zone_map_audit`,
    `rel_zorder_apply`) to be CORRECT and not just fast. This is how
    Iceberg/Delta manifest audits actually run: metadata-only,
    distributed over the file census.

    Scale: the audited unit of work is a FILE, so the mapInPandas
    fan-out scales with |files| (thousands of footers per task-
    second, zero data IO); the write half is the standard bucketed
    export. Stats column is exact scaled cents — footer min/max on
    INT64 are lossless, so the compare is bit-exact."""
    t = load_tables(spark, sf_dir)

    def _write(loc: str) -> None:
        t.orders.select(
            F.expr("o_orderkey % 16").alias("bucket"),
            mlong("o_totalprice").alias("cents"),
        ).repartition("bucket").write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(loc)

    out = _derived_fixture(spark, sf_dir, "footer16", _write)

    files = (
        spark.read.parquet(out)
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.input_file_name().alias("path"),
        )
        .distinct()
    )

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for bucket, path in zip(pdf["bucket"], pdf["path"]):
                local = path[len("file://"):] if path.startswith("file://") else path
                md = pq.ParquetFile(local).metadata
                mn, mx = None, None
                for rg in range(md.num_row_groups):
                    col = md.row_group(rg).column(0)  # 'cents'
                    st = col.statistics
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
                rows.append((bucket, md.num_rows, md.num_row_groups, mn, mx))
            yield pd.DataFrame(
                rows,
                columns=["bucket", "n_rows", "n_rowgroups", "min_cents", "max_cents"],
            )

    return files.mapInPandas(
        read_footers,
        "bucket bigint, n_rows bigint, n_rowgroups bigint, "
        "min_cents bigint, max_cents bigint",
    )


# ------------------------------------------------- r10: dynamic partition pruning


@register(
    "src_dynamic_partition_pruning",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def src_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC partition pruning — the runtime sibling of A9's static
    PartitionFilters, and the optimization that makes star joins
    viable on partitioned 100 TB facts: the fact side is the
    priority-partitioned dataset, the filter lives on a DIMENSION
    relation (priority → urgency class, filtered to 'hot'), and the
    fact's partition filter is only discoverable at RUNTIME from the
    broadcast dim — Catalyst injects a DynamicPruningExpression
    (partition-dir subquery) so only the matching directories are
    ever listed. tests/test_round10_ops.py pins the
    `dynamicpruning` subquery in the physical plan; a static filter
    could not express this because the pruning values come from the
    other side of the join.

    Oracle: the dim rule is deterministic (priorities starting '1'/'2'
    are hot), so DuckDB replays the end result as a plain IN filter —
    same rows, provably — while the Spark plan earns them with a
    runtime-pruned scan."""
    t = load_tables(spark, sf_dir)

    def _write(loc: str) -> None:
        (
            t.orders.select(
                "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
            )
            .write.mode("overwrite")
            .partitionBy("o_orderpriority")
            .parquet(loc)
        )

    loc = _derived_fixture(spark, sf_dir, "part_orders", _write)
    fact = spark.read.parquet(loc)
    dim = (
        t.orders.select("o_orderpriority")
        .distinct()
        .withColumn(
            "urgency",
            F.when(
                F.substring("o_orderpriority", 1, 1).isin("1", "2"), "hot"
            ).otherwise("cold"),
        )
    )
    hot = dim.filter(F.col("urgency") == "hot")
    return (
        fact.join(F.broadcast(hot), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(mlong("o_totalprice")).alias("total_cents"),
        )
    )


# ------------------------------------------------- r10: incremental snapshot chunks


@register(
    "src_snapshot_chunks",
    oracle="""
    WITH bounds AS (
      SELECT MIN(o_orderkey) // 8192 AS lo, MAX(o_orderkey) // 8192 AS hi
      FROM orders
    ),
    plan AS (
      SELECT unnest(generate_series(bounds.lo, bounds.hi)) AS chunk_id FROM bounds
    ),
    counts AS (
      SELECT o_orderkey // 8192 AS chunk_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    )
    SELECT p.chunk_id,
           CAST(p.chunk_id * 8192 AS BIGINT) AS low_key,
           CAST(p.chunk_id * 8192 + 8191 AS BIGINT) AS high_key,
           COALESCE(c.n, 0) AS n_rows,
           COALESCE(c.n, 0) = 0 AS is_empty,
           CAST(SUM(COALESCE(c.n, 0)) OVER (ORDER BY p.chunk_id) AS BIGINT) AS rows_through
    FROM plan p LEFT JOIN counts c USING (chunk_id)
    """,
)
def src_snapshot_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-snapshot CHUNK PLAN — how Debezium (DDD-3, the
    watermark-based incremental snapshot the reference's CDC sink
    consumes) and every JDBC bulk reader split a keyed table into
    resumable units: fixed key-range chunks over [min, max], each
    chunk's ACTUAL row count measured (TPC-H orderkeys are sparse, so
    empty chunks exist and the plan must carry them — skipping gaps
    is the difference between key-range and row-offset chunking), and
    a running rows_through watermark that tells a resuming snapshot
    exactly where it stopped. Complements A11 (offset-gap audit finds
    the holes; this plans around them) and A2's incrementing poll
    (which consumes the chunks).

    Scale: one agg for bounds (1-row broadcast), one agg for counts,
    a generated chunk spine (|key-space/8192| rows), and a prefix
    window over that bounded spine — the plan relation stays manifest-
    sized regardless of table size."""
    t = load_tables(spark, sf_dir)
    b = t.orders.agg(
        F.expr("min(o_orderkey) div 8192").alias("lo"),
        F.expr("max(o_orderkey) div 8192").alias("hi"),
    )
    plan = b.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("chunk_id")
    )
    counts = t.orders.groupBy(
        F.expr("o_orderkey div 8192").alias("chunk_id")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("chunk_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        plan.join(counts, "chunk_id", "left")
        .select(
            "chunk_id",
            (F.col("chunk_id") * 8192).cast("long").alias("low_key"),
            (F.col("chunk_id") * 8192 + 8191).cast("long").alias("high_key"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_rows"),
            (F.coalesce(F.col("n"), F.lit(0)) == 0).alias("is_empty"),
        )
        .withColumn("rows_through", F.sum("n_rows").over(w).cast("long"))
    )
