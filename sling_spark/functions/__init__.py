"""Shared scalar semantics + Spark column helpers.

``normalize`` / ``fingerprint`` / ``tokenize`` are pure Python and are
imported by BOTH the Spark pandas UDFs and the pure-Python oracle — a
single source of truth for the string-level semantics, which is what
makes P/R >= 0.95 achievable (SURVEY.md §7 "hard parts").
"""
