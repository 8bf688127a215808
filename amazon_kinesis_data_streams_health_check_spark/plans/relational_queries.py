"""Relational coverage queries on the TPC-H-ish tables (populated in later
milestones; the registry import requires the module to exist)."""
