"""Serialization: Confluent Avro wire format, JSON converter."""
