"""PySpark-native patent-decision document extraction engine.

A from-scratch re-implementation (NOT a port) of the query/data-processing
capabilities of the reference local-HTML converter
(tmusimesabaoi4i/Patent_Decision_Document_Converter, studied read-only at
/root/reference): rule-based section segmentation, full/half-width and
whitespace normalization, boilerplate stripping, legal-number rewriting,
claim/paragraph span emission with media references preserved in order —
expressed as vectorized pandas/Arrow UDFs over Spark DataFrames of
interleaved text+media documents.

Layout
------
functions/  pure string semantics (exact reference behavior, str -> str)
operators/  multi-line / cross-row operators (region ops, strippers,
            block state machines, dedup, similarity, text stats)
plans/      pipeline registry, mode chains, Spark job assembly
sources/    documents-table generator + fixture loaders + IO helpers
streaming/  Structured Streaming variant of the conversion job
"""

__version__ = "0.1.0"
