"""Per-pillar query registration modules (split of registry.py)."""
