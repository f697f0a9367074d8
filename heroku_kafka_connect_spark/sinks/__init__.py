"""Sink-side operators: upsert/tombstone/CDC batch semantics and
foreachBatch writers."""
