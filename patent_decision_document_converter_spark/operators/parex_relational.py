"""Relational variant of paragraph/figure reference extraction.

SURVEY.md §2.9: the reference's ``extractParagraphAndFigureRefs``
(js/paragraphExtraction.js:13-148) is a scan→dedupe→sort→run-compress→
format aggregation.  ``functions/parex.py`` is the exact per-document
implementation (used by the ``paragraph`` mode); this module re-expresses
the SAME semantics with Spark relational primitives:

* extraction  — ``regexp_extract_all`` / ``translate`` / ``sequence``
  per-row array expressions (codegen, no Python);
* dedupe+sort — ``array_distinct`` + explode;
* run-length compression — the island trick: ``n - row_number() OVER
  (PARTITION BY doc, kind ORDER BY n)`` groups consecutive integers
  (the relational form of compressNumbers, paragraphExtraction.js:30-50);
* format      — ``lpad``/``translate`` to full-width + ordered
  ``collect_list`` re-assembly.

``tests/test_parex_relational.py`` proves string-for-string equality
with the exact UDF over the JPO-style synthetic corpus — the
"UDF for exactness, relational variant for oracle checks" pairing
promised in SURVEY §2.9.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# the JS dash class [‐-‒–—−－〜～] (paragraphExtraction.js:19)
_DASHES = "‐‑‒–—−－〜～"
_FW_DIGITS = "０１２３４５６７８９"
_HW_DIGITS = "0123456789"

_P_SINGLE = r"[\[【]([0-9０-９]+)[\]】]"
_P_RANGE = r"[\[【]([0-9０-９]+)[\]】]\s*-\s*[\[【]([0-9０-９]+)[\]】]"
_FIG_BLOCK = r"図\s*([0-9０-９][0-9０-９\s、,，\-‐-‒–—−－〜～]*)"
_FIG_TAIL_JUNK = r"[^0-9０-９\s、,，\-]+$"
_TOK_TAIL_JUNK = r"[^0-9０-９\-]+$"


def _dash(col: Column) -> Column:
    return F.translate(col, _DASHES, "-" * len(_DASHES))


def _to_int(col: Column) -> Column:
    return F.translate(col, _FW_DIGITS, _HW_DIGITS).cast("int")


def _fig_token_numbers(tok: Column) -> Column:
    """One figure token -> array<int> (range expanded / single / empty),
    replicating parseInt-prefix semantics incl. a leading '-' sign."""
    t = F.regexp_replace(F.regexp_replace(tok, r"\s+", ""), _TOK_TAIL_JUNK, "")
    a = _to_int(F.regexp_extract(t, r"^([0-9０-９]+)-([0-9０-９]+)$", 1))
    b = _to_int(F.regexp_extract(t, r"^([0-9０-９]+)-([0-9０-９]+)$", 2))
    prefix = F.regexp_extract(F.translate(t, _FW_DIGITS, _HW_DIGITS), r"^[+-]?[0-9]+", 0)
    return (
        F.when(t.rlike(r"^[0-9０-９]+-[0-9０-９]+$"), F.sequence(F.least(a, b), F.greatest(a, b)))
        .when(prefix != "", F.array(prefix.cast("int")))
        .otherwise(F.array().cast("array<int>"))
    )


def paragraph_refs_relational(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, refs) with refs formatted exactly like the reference:
    ``(段落[００２７]、[００６５]-[００６７]、図１、６-８)``."""
    dashed = _dash(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.regexp_extract_all(dashed, F.lit(_P_SINGLE), 1).alias("_singles"),
        F.regexp_extract_all(dashed, F.lit(_P_RANGE), 1).alias("_r1"),
        F.regexp_extract_all(dashed, F.lit(_P_RANGE), 2).alias("_r2"),
        F.regexp_extract_all(F.col(text_col), F.lit(_FIG_BLOCK), 1).alias("_blocks"),
    )

    # pad width: widest raw digit run seen in any bracket (range endpoints
    # are also matched by the single pattern, so _singles covers them)
    width = F.coalesce(F.array_max(F.transform(F.col("_singles"), F.length)), F.lit(0))

    p_nums = F.array_distinct(
        F.concat(
            F.transform(F.col("_singles"), _to_int),
            F.coalesce(
                F.flatten(
                    F.zip_with(
                        F.col("_r1"),
                        F.col("_r2"),
                        lambda a, b: F.sequence(
                            F.least(_to_int(a), _to_int(b)), F.greatest(_to_int(a), _to_int(b))
                        ),
                    )
                ),
                F.array().cast("array<int>"),
            ),
        )
    )

    fig_tokens = F.flatten(
        F.transform(
            F.col("_blocks"),
            lambda blk: F.split(
                F.regexp_replace(_dash(blk), _FIG_TAIL_JUNK, ""), r"[、,，]"
            ),
        )
    )
    f_nums = F.array_distinct(F.flatten(F.transform(fig_tokens, _fig_token_numbers)))

    extracted = base.select(
        "id",
        F.greatest(F.lit(4), width).alias("pad"),
        p_nums.alias("_p"),
        f_nums.alias("_f"),
    )

    # ---- relational run-length compression (the island trick) ----
    nums = extracted.select(
        "id", F.lit("p").alias("kind"), F.explode("_p").alias("n")
    ).unionAll(
        extracted.select("id", F.lit("f").alias("kind"), F.explode("_f").alias("n"))
    )
    w = Window.partitionBy("id", "kind").orderBy("n")
    runs = (
        nums.withColumn("grp", F.col("n") - F.row_number().over(w))
        .groupBy("id", "kind", "grp")
        .agg(F.min("n").alias("a"), F.max("n").alias("b"))
    )

    runs = runs.join(extracted.select("id", "pad"), "id")
    fw = lambda c: F.translate(c.cast("string"), _HW_DIGITS, _FW_DIGITS)  # noqa: E731
    # lpad width is per-row (pad column) — expr form since lpad len must be a column
    p_one = F.concat(
        F.lit("["), fw(F.expr("lpad(cast(a as string), pad, '0')")), F.lit("]")
    )
    p_two = F.concat(
        F.lit("["), fw(F.expr("lpad(cast(b as string), pad, '0')")), F.lit("]")
    )
    part = F.when(
        F.col("kind") == "p",
        F.when(F.col("a") == F.col("b"), p_one).otherwise(F.concat(p_one, F.lit("-"), p_two)),
    ).otherwise(
        F.when(F.col("a") == F.col("b"), fw(F.col("a"))).otherwise(
            F.concat(fw(F.col("a")), F.lit("-"), fw(F.col("b")))
        )
    )

    grouped = (
        runs.withColumn("part", part)
        .groupBy("id", "kind")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("a", "part"))), lambda s: s["part"]
                ),
                "、",
            ).alias("joined")
        )
        .groupBy("id")
        .agg(
            F.max(F.when(F.col("kind") == "p", F.col("joined"))).alias("pj"),
            F.max(F.when(F.col("kind") == "f", F.col("joined"))).alias("fj"),
        )
    )

    out = extracted.select("id").join(grouped, "id", "left").select(
        F.col("id").alias(id_col),
        F.concat(
            F.lit("("),
            F.concat_ws(
                "、",
                *[
                    F.when(F.col("pj").isNotNull(), F.concat(F.lit("段落"), F.col("pj"))),
                    F.when(F.col("fj").isNotNull(), F.concat(F.lit("図"), F.col("fj"))),
                ],
            ),
            F.lit(")"),
        ).alias("refs"),
    )
    return out
