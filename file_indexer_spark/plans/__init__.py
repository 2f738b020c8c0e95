"""Physical-plan inspection helpers (scale-shape assertions in tests)."""
