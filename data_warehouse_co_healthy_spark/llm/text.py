"""Text-analysis operators (placeholder — filled in this round)."""

QUERIES: dict = {}
ORACLES: dict = {}
NO_ORACLE: dict = {}
