"""DataFrame operators — the engine's relational/spatial surface.

Each operator is a function DataFrame -> DataFrame built from Catalyst
primitives; Python appears only inside Arrow-batched pandas UDFs.
"""
