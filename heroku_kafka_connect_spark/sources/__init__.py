"""Source-side operators: JDBC incremental modes, Kafka envelope/SSL."""
