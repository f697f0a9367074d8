"""heroku_kafka_connect_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference stack (CustomerInsight/heroku-kafka-connect: a declarative
deployment wrapper around Confluent Kafka Connect — see
/root/reference/main.sh, Dockerfile), extended with a relational
analytics surface and LLM-data-pipeline operators, designed for
100 TB-scale execution on a real cluster.

Layout (SURVEY.md §7.5):
  session.py     SparkSession factory + fixture table registration
  registry.py    query registry (driver contract: queries()/oracle_sql())
  functions/     column-level transform library (SMTs, text, vectors)
  operators/     the query corpus (relational, llm, smt, sources, sinks)
  sources/       source-mode semantics (JDBC modes, Kafka envelope)
  sinks/         foreachBatch writers (upsert/tombstone/CDC, files)
  serde/         Confluent Avro wire format, JSON serde
  streaming/     event-time windows, watermark, dedup, control plane
  plans/         declarative PipelineSpec -> DataFrame compiler
"""

__version__ = "0.1.0"
