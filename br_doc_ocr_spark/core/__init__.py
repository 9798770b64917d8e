"""Pure pandas/NumPy extraction kernel — no Spark imports allowed here.

This package is imported both by the Spark ``mapInPandas`` UDF (executor side)
and by the single-threaded golden oracle (driver/test side), so per-turn
equality holds by construction (SURVEY.md §7.4 risk #1).
"""
