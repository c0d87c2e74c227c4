"""Operator library: change feeds, dedup, similarity, text, DLQ, multimodal."""
