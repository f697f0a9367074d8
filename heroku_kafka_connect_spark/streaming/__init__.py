"""Structured Streaming surface: event-time windows, watermarking,
dedup, the micro-batch runner, and the reconcile control plane."""
