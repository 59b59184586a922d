"""Scalar/aggregate function families: band math, text analysis,
deduplication, similarity search — all Catalyst expressions first,
Arrow-vectorized UDFs only where built-ins can't express the semantics."""
