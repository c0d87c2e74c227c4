"""Scalar function helpers: portable cross-engine expressions, templating."""
