"""Structured Streaming operators (incremental analog of SLING's
epoch-based SLINGDB iteration, db/dbprotocol.h:27-147)."""
