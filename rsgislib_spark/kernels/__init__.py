"""Pure-numpy kernel library — no Spark imports here.

Every function is batch-vectorized and deterministic; these kernels are
the single source of truth used both by the Spark operators (inside
pandas/Arrow UDFs) and by the pytest oracles.
"""

from rsgislib_spark.kernels import cells, codecs, geom, phash, pixelmath, strtree  # noqa: F401
