"""Structured Streaming wrappers of the batch pipeline."""
