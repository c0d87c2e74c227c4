"""Streaming layer: poll pipeline, export fan-out, DLQ replay, lifecycle."""
