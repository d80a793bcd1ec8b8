"""Structured Streaming surface — incremental twins of the batch ops."""
