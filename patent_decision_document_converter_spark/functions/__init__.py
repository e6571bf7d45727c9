"""Pure string-level functions with exact reference semantics.

Every function here is ``str -> str`` (or returns structured data), pure and
deterministic, so it can be unit-tested without Spark and fused into one
Arrow-batched UDF per mode by ``plans.registry``.
"""
