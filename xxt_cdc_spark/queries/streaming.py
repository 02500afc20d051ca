"""Placeholder — filled in later this round."""

QUERIES = {}
ORACLE = {}
