"""Deduplication operators for training-data pipelines (placeholder —
filled in this round)."""

QUERIES: dict = {}
ORACLES: dict = {}
NO_ORACLE: dict = {}
