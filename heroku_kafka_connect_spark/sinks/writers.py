"""Sink semantics — §2.B (SURVEY.md).

The deployed stack's sinks are the Confluent/Debezium JDBC sinks
(insert / upsert-by-PK / tombstone-delete, reference Dockerfile:28-40)
and the Camel SFTP file sink (reference Dockerfile:46-59). The
*batch semantics* — which rows survive — are pure window algebra and
live here as DataFrame transforms (these are what the t2 oracle
checks). The *physical write* lives in the `foreach_batch_*` factories
for Structured Streaming's `foreachBatch`, which combined with
checkpointing gives effectively-exactly-once on idempotent targets
(at-least-once delivery + idempotent MERGE — the same guarantee the
Connect offset-commit model provides, SURVEY.md §2.F2).

Scale: latest-per-key is one shuffle on the PK; at 100 TB prefer
partial `max_by` pre-aggregation over row_number when only the latest
row (not ranks) is needed — both shapes below.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """B2 upsert semantics: last write per PK wins. `order_by` must be
    a deterministic total order (e.g. ts DESC, id DESC)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def latest_per_key_agg(df: DataFrame, keys: Sequence[str], order_col: Column) -> DataFrame:
    """Partial-aggregation variant of ``latest_per_key`` for when only
    the latest row's CONTENT is needed (no ranks): ``max_by`` over a
    total-order column. The aggregate combines map-side, so each
    map partition shuffles ONE candidate row per key instead of every
    version of every key — at CDC-compaction scale (many updates per
    key) this is the difference between shuffling the changelog and
    shuffling the table. ``order_col`` must be a unique total order
    (e.g. ``struct(ts, seq)``) or ties pick an arbitrary winner."""
    others = [c for c in df.columns if c not in keys]
    packed = df.groupBy(*keys).agg(
        F.max_by(F.struct(*others), order_col).alias("__latest")
    )
    return packed.select(*keys, "__latest.*")


def upsert_batch(
    existing: DataFrame | None, batch: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """Apply a batch of upserts onto existing table state."""
    all_rows = batch if existing is None else existing.unionByName(batch)
    return latest_per_key(all_rows, keys, order_by)


def apply_tombstones(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column], tombstone: Column
) -> DataFrame:
    """B3 delete.enabled: a tombstone record (null value payload in
    Connect) deletes its PK. Keep the latest record per key, then drop
    keys whose latest record is a tombstone."""
    return latest_per_key(df, keys, order_by).filter(~tombstone)


def cdc_envelope(df: DataFrame, op: Column, before: Column, after: Column) -> DataFrame:
    """B4 build: Debezium-style change envelope {op: c/u/d/r, before,
    after} (the event shape the Debezium JDBC sink consumes)."""
    return df.select(op.alias("op"), before.alias("before"), after.alias("after"))


def cdc_apply(
    envelopes: DataFrame, keys: Sequence[str], order_by: Sequence[Column]
) -> DataFrame:
    """B4 apply: materialize final table state from a change stream —
    latest envelope per key wins; a final op='d' removes the key."""
    latest = latest_per_key(envelopes, keys, order_by)
    return latest.filter(F.col("op") != "d")


# ---------------------------------------------------------------- physical writers


def foreach_batch_jdbc_append(url: str, table: str, **options):
    """B1 insert mode → streaming: append each micro-batch.
    At-least-once; pair with unique batch ids in the payload for
    dedup-on-read if the target lacks idempotence."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .options(**options)
            .mode("append")
            .save()
        )

    return write


def stage_table_name(table: str, suffix: str = "") -> str:
    """Stage table for a MERGE upsert — suffixed per writer (query
    name) so concurrent streaming queries targeting the same table
    never overwrite each other's stage mid-MERGE. The suffix is
    sanitized to a bare SQL identifier: pipeline names may contain
    '-' (PipelineSpec allows them), which would break the unquoted
    CREATE TABLE / MERGE statements. Sanitization alone can collide
    distinct names ('my-sink' and 'my_sink' both map to 'my_sink'),
    which would re-create exactly the shared-stage race the suffix
    exists to prevent — a short hash of the RAW suffix keeps
    sanitized-equal names on separate stages."""
    import hashlib
    import re

    if not suffix:
        return f"{table}__stage"
    # cap the sanitized part: a long pipeline name near a backend's
    # identifier limit (Postgres: 63 bytes) would otherwise truncate
    # SERVER-side, shearing off the collision-breaking hash tag and
    # re-creating the shared-stage race it exists to prevent
    safe = re.sub(r"[^A-Za-z0-9_]", "_", suffix)[:32]
    tag = hashlib.md5(suffix.encode()).hexdigest()[:6]
    return f"{table}__stage_{safe}_{tag}"


def merge_sql(table: str, stage: str, columns: Sequence[str], keys: Sequence[str]) -> str:
    """ANSI ``MERGE`` applying a staged batch onto the target — the
    SQL the Connect JDBC sink generates for insert.mode=upsert
    (reference Dockerfile:28-31). Re-running the same staged batch is
    a no-op update, so replay after a partial failure is idempotent."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    upd_cols = [c for c in columns if c not in keys]
    upd = ", ".join(f"t.{c} = s.{c}" for c in upd_cols)
    ins_cols = ", ".join(columns)
    ins_vals = ", ".join(f"s.{c}" for c in columns)
    matched = f"WHEN MATCHED THEN UPDATE SET {upd} " if upd_cols else ""
    return (
        f"MERGE INTO {table} t USING {stage} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
    )


def upsert_sql(
    table: str, columns: Sequence[str], keys: Sequence[str], *, paramstyle: str = "qmark"
) -> str:
    """Row-level upsert statement (``INSERT .. ON CONFLICT DO
    UPDATE``) for DB-API targets that speak the conflict clause
    (sqlite, DuckDB, Postgres) — the non-staging MERGE equivalent."""
    ph = "?" if paramstyle == "qmark" else "%s"
    cols = ", ".join(columns)
    vals = ", ".join(ph for _ in columns)
    upd_cols = [c for c in columns if c not in keys]
    if upd_cols:
        action = "DO UPDATE SET " + ", ".join(f"{c} = excluded.{c}" for c in upd_cols)
    else:
        action = "DO NOTHING"
    return (
        f"INSERT INTO {table} ({cols}) VALUES ({vals}) "
        f"ON CONFLICT ({', '.join(keys)}) {action}"
    )


def foreach_batch_upsert(
    url: str,
    table: str,
    keys: Sequence[str],
    order_by_cols: Sequence[str],
    *,
    stage_suffix: str = "",
    **options,
):
    """B2 insert.mode=upsert → streaming: dedup the micro-batch to
    latest-per-key, stage it to a per-query stage table via the Spark
    JDBC writer (overwrite = replay-safe), then execute one MERGE from
    the stage into the target over a driver-side JDBC connection.
    Replaying a micro-batch restages the same rows and the MERGE
    converges to the same target state (effective exactly-once on top
    of at-least-once delivery — the Connect offset-commit guarantee).

    ``stage_suffix`` isolates concurrent writers: two streaming
    queries upserting the same target must pass distinct suffixes
    (e.g. the query name) or they would overwrite each other's stage
    mid-MERGE — SparkRuntime passes the pipeline name.

    Connection ``options`` are forwarded to BOTH the Spark JDBC stage
    write and the driver-side MERGE connection; a ``driver`` option is
    honored by loading the class first (non-auto-registering JDBC
    drivers).

    Requires a JDBC driver jar on the Spark classpath; in environments
    without one (this sandbox) use ``foreach_batch_upsert_dbapi``,
    which has the same semantics over a DB-API connection and is what
    the replay-idempotence test exercises."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        order = [F.col(c).desc() for c in order_by_cols]
        deduped = latest_per_key(batch_df, keys, order)
        stage = stage_table_name(table, stage_suffix)
        # options come from JSON pipeline config: stringify values
        # (Properties.setProperty rejects non-strings) and strip
        # dbtable/url so a stray config key can't redirect the stage
        # write away from the table the MERGE reads
        opts = {
            k: str(v) for k, v in options.items() if k not in ("dbtable", "url")
        }
        (
            deduped.write.format("jdbc")
            .option("url", url)
            .options(**opts)
            .option("dbtable", stage)
            .mode("overwrite")
            .save()
        )
        jvm = batch_df.sparkSession._jvm  # noqa: SLF001
        if "driver" in opts:
            jvm.java.lang.Class.forName(opts["driver"])
        # the driver-side connection gets CONNECTION properties only —
        # Spark-writer tuning keys (batchsize, truncate, ...) are not
        # JDBC connection properties, and strict drivers reject
        # unknown keys at getConnection
        spark_writer_only = {
            "driver", "batchsize", "truncate", "numpartitions",
            "isolationlevel", "createtableoptions",
            "createtablecolumntypes", "cascadetruncate", "querytimeout",
            "sessioninitstatement",
        }
        props = jvm.java.util.Properties()
        for k, v in opts.items():
            if k.lower() not in spark_writer_only:
                props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(url, props)
        try:
            stmt = conn.createStatement()
            stmt.execute(merge_sql(table, stage, deduped.columns, keys))
            stmt.close()
        finally:
            conn.close()

    return write


def foreach_batch_upsert_dbapi(
    connection_factory,
    table: str,
    keys: Sequence[str],
    order_by_cols: Sequence[str],
    *,
    paramstyle: str = "qmark",
):
    """B2 upsert onto a DB-API target (sqlite / DuckDB / Postgres
    drivers): dedup to latest-per-key, then per-partition
    ``executemany`` of INSERT .. ON CONFLICT DO UPDATE. After the
    dedup shuffle each PK lives in exactly one partition, so parallel
    partition writers never contend on a key; replaying a batch
    re-applies the same per-key updates (idempotent).

    ``connection_factory`` must be a picklable zero-arg callable (it
    runs inside executors)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        order = [F.col(c).desc() for c in order_by_cols]
        deduped = latest_per_key(batch_df, keys, order)
        cols = deduped.columns
        sql = upsert_sql(table, cols, keys, paramstyle=paramstyle)

        def write_partition(rows) -> None:
            conn = connection_factory()
            try:
                cur = conn.cursor()
                cur.executemany(sql, [tuple(r[c] for c in cols) for r in rows])
                conn.commit()
            finally:
                conn.close()

        deduped.foreachPartition(write_partition)

    return write


def foreach_batch_upsert_parquet(table_dir: str, keys: Sequence[str], order_by_cols: Sequence[str]):
    """B2 upsert onto a parquet table: copy-on-write merge per
    micro-batch (versioned state dirs + a `_current` manifest —
    parquet can't MERGE in place). The no-database stand-in for
    `foreach_batch_upsert`; production targets with native MERGE
    (JDBC, lakehouse formats) swap the write step and keep the same
    batch-dedup semantics."""
    import os

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = os.path.join(table_dir, "_current")
        existing = None
        if os.path.exists(cur):
            with open(cur) as f:
                existing = spark.read.parquet(f.read().strip())
        order = [F.col(c).desc() for c in order_by_cols]
        merged = upsert_batch(existing, batch_df, keys, order)
        out = os.path.join(table_dir, f"state_{batch_id}")
        merged.write.mode("overwrite").parquet(out)
        os.makedirs(table_dir, exist_ok=True)
        with open(cur, "w") as f:
            f.write(out)

    return write


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: Sequence[str] = (),
    mode: str = "overwrite",
    options: dict[str, str] | None = None,
) -> None:
    """B5 file sink (the engine half of the Camel SFTP sink — remote
    transport is an environment concern). partition_by gives the
    time-bucketed directory layout the Camel sink produces via file
    rollover; options passes writer knobs through (e.g.
    maxRecordsPerFile to bound file sizes on a sharded export)."""
    w = df.write.format(fmt).mode(mode)
    if options:
        w = w.options(**options)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
