"""Scalar function library — the engine's "UDF surface" (SURVEY.md §2.6).

Everything here is either a built-in-composable Column expression or an
Arrow-batched pandas UDF; no per-row Python anywhere (input_hint mandate).
"""
