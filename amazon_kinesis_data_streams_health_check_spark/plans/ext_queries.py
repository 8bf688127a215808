"""[EXT] dedup / similarity / text-analysis queries (populated in later
milestones; the registry import requires the module to exist)."""
