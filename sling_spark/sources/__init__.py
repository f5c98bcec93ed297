"""Deterministic synthetic inputs (corpus + seed KB) and generic readers."""
