"""Training-data-pipeline operators over generic document/embedding
tables (deduplication, similarity search, text analysis).

These are first-class engine components alongside the KG pipeline: the
same engine that builds the KB is what a 100 TB training-data pipeline
runs for corpus hygiene. All operators are DataFrame → DataFrame, built
on JVM-side column expressions wherever possible.
"""
