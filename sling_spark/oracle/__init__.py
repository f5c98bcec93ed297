"""Pure-Python, single-threaded oracle of the pipeline semantics."""
