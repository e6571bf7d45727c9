"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting (training-data pipeline layer).

All pure built-in column expressions (codegen, no Python).  Ratio-style
outputs are emitted as ``floor(scale * a / b)`` integers: a single IEEE
double division + floor is bit-identical across engines, so the DuckDB
oracles in ``plans/contract.py`` hash-match exactly (no float columns in
any oracle-checked output).

Scale: every operator is a narrow per-row projection except
``winnow_fingerprints`` (per-row higher-order expression, still no
shuffle) and ``doubled_token_counts`` (explode + per-doc window — shuffle
on doc_id only, which the corpus is already partitioned by).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def ws_tokens(col: str = "text") -> Column:
    """Whitespace tokens of trimmed text; empty array for blank docs."""
    t = F.trim(F.regexp_replace(F.col(col), r"\s+", " "))
    return F.when(F.length(t) > 0, F.split(t, " ")).otherwise(
        F.array().cast("array<string>")
    )


def bpe_ish_tokens(col: str = "text") -> Column:
    """GPT-2-style pre-tokenizer approximation: words, numbers, punctuation
    runs each count as one token (the standard regex pre-split before BPE
    merges).  Token COUNT is what pipelines budget on; merges only lower it.
    """
    # split points: transitions between letter / digit / other
    return F.filter(
        F.split(F.col(col), r"(?<=[a-zA-Z])(?=[^a-zA-Z])|(?<=[0-9])(?=[^0-9])|(?<=[^a-zA-Z0-9\s])(?=[a-zA-Z0-9])|\s+"),
        lambda x: F.length(x) > 0,
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token accounting: whitespace tokens, distinct tokens,
    total token chars, BPE-ish token count."""
    toks = ws_tokens(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)).alias("sum_tok_len"),
        F.size(bpe_ish_tokens(text_col)).alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

# minimal marker sets per language; scored by distinct-marker hits.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "is"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "es": ["el", "la", "que", "los", "es"],
    "fr": ["le", "la", "et", "les", "est"],
    "zh": [],  # CJK detected by script, not stopwords
}


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: CJK script ratio first, else stopword votes.

    Pure column expression; ties break by fixed language order (de, en,
    es, fr) for determinism.  Real pipelines swap in fastText via a Pandas
    UDF — the surrounding plan (projection, partition-preserving) is
    identical.
    """
    toks = ws_tokens(text_col)
    cjk = F.length(F.regexp_replace(F.col(text_col), r"[^一-鿿぀-ヿ]", ""))
    votes = {
        lang: F.size(F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(m) for m in marks])))
        for lang, marks in _LANG_MARKERS.items()
        if marks
    }
    best = F.lit("unk")
    best_score = F.lit(0)
    for lang in sorted(votes):  # fixed order → deterministic argmax
        v = votes[lang]
        better = v > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, v).otherwise(best_score)
    pred = F.when(cjk * 5 > F.length(text_col), F.lit("zh")).otherwise(best)
    return df.select(F.col(id_col), pred.alias("pred_lang"))


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher/C4-style per-doc quality features, integer-scaled:

    - n_chars, n_tokens
    - distinct_permille  = floor(1000 * distinct_tokens / tokens)
    - mean_tok_len_x10   = floor(10 * sum_tok_len / tokens)
    - alpha_permille     = floor(1000 * alpha_chars / chars)
    """
    toks = ws_tokens(text_col)
    n_tok = F.size(toks)
    n_chr = F.length(text_col)
    n_distinct = F.size(F.array_distinct(toks))
    sum_len = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    alpha = F.length(F.regexp_replace(F.col(text_col), r"[^a-zA-Z]", ""))
    return df.select(
        F.col(id_col),
        n_chr.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, F.floor(F.lit(1000.0) * n_distinct / n_tok)).otherwise(0).cast("long").alias("distinct_permille"),
        F.when(n_tok > 0, F.floor(F.lit(10.0) * sum_len / n_tok)).otherwise(0).cast("long").alias("mean_tok_len_x10"),
        F.when(n_chr > 0, F.floor(F.lit(1000.0) * alpha / n_chr)).otherwise(0).cast("long").alias("alpha_permille"),
    )


# ---------------------------------------------------------------------------
# document fingerprinting (winnowing)
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    window: int = 5,
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03) fingerprint summary per doc:
    hash every token k-gram, keep the minimum of each sliding window of
    ``window`` consecutive hashes, dedupe.

    Emitted as (n_fingerprints, min_fp, max_fp, fp_set_hash) — an
    integer-only digest that still pins the exact fingerprint set.
    Entirely per-row higher-order expressions (no shuffle).

    Each array stage is materialized as its own column: interpreted
    higher-order functions re-evaluate lambda-invariant subtrees per
    element, so chaining the raw expressions would make every slice
    re-tokenize the document (O(n²) per doc — measured 60× slower).
    """
    toked = df.select(F.col(id_col), ws_tokens(text_col).alias("_toks"))
    t = F.col("_toks")
    grams = F.when(
        F.size(t) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = toked.select(
        F.col(id_col),
        F.transform(
            grams, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
        ).alias("_hashes"),
    )
    h = F.col("_hashes")
    mins = F.when(
        F.size(h) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(h) - (window - 1)),
            lambda i: F.array_min(F.slice(h, i, window)),
        ),
    ).otherwise(h)
    fpd = hashed.select(
        F.col(id_col), F.array_sort(F.array_distinct(mins)).alias("_fps")
    )
    fps = F.col("_fps")
    return fpd.select(
        F.col(id_col),
        F.size(fps).alias("n_fingerprints"),
        F.coalesce(F.array_min(fps), F.lit(0)).cast("long").alias("min_fp"),
        F.coalesce(F.array_max(fps), F.lit(0)).cast("long").alias("max_fp"),
        md5_long(F.concat_ws(",", F.transform(fps, lambda v: v.cast("string")))).alias("fp_set_hash"),
    )


# ---------------------------------------------------------------------------
# doubled-token scan (relational analog of the JaTypoChecker doubled-word
# patterns — RE2-safe: no backreferences, uses lead() instead)
# ---------------------------------------------------------------------------


def doubled_token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Count positions where a token equals its successor (doubled-word
    typo scan, jaTypoChecker.js:19-135 analog at corpus scale).

    posexplode → lead over (doc_id, pos) — one shuffle on doc_id.
    """
    exploded = df.select(F.col(id_col), F.posexplode(ws_tokens(text_col)).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = exploded.withColumn("nxt", F.lead("tok").over(w))
    return (
        flagged.groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("tok") == F.col("nxt"), 1).otherwise(0)).alias("n_doubled")
        )
    )


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style filters — Rae et al. 2021, §A1.1)
# ---------------------------------------------------------------------------


def repetition_signals(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document repetition filters in the Gopher family, as integer
    permille (floor(1000 * num / den) — single exact double division, no
    float drift):

    * ``dup_line_permille``       — non-empty lines that repeat an earlier
      identical line / total non-empty lines (empty lines are structure,
      not content — counting them as duplicates would flag every
      multi-paragraph document);
    * ``dup_line_char_permille``  — characters inside those repeated
      lines / total line characters;
    * ``top_bigram_permille``     — characters covered by the most
      frequent word 2-gram (count × len) / normalized text length.

    Shape: one explode per signal family, aggregations keyed on the doc
    id — two shuffles total, both on the id the corpus is already
    partitioned by.  Blank docs emit 0s (never NULL).
    """
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    ).filter(F.length("line") > 0)
    w = Window.partitionBy(id_col, "line").orderBy("pos")
    flagged = lines.select(
        F.col(id_col),
        F.length("line").alias("n_chars"),
        (F.row_number().over(w) > 1).cast("int").alias("is_dup"),
    )
    line_stats = flagged.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum("is_dup").alias("n_dup_lines"),
        F.sum("n_chars").alias("line_chars"),
        F.sum(F.col("n_chars") * F.col("is_dup")).alias("dup_line_chars"),
    )

    toked = df.select(F.col(id_col), ws_tokens(text_col).alias("_toks"))
    grams = toked.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("_toks") - 1),
                    lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    top = (
        grams.groupBy(id_col, "bigram")
        .agg(F.count("*").alias("cnt"))
        .groupBy(id_col)
        .agg(F.max(F.col("cnt") * F.length("bigram")).alias("top_bigram_chars"))
    )

    norm_len = df.select(
        F.col(id_col),
        F.length(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))).alias("norm_len"),
    )

    def permille(num, den):
        return F.when(den > 0, F.floor(F.lit(1000) * num / den)).otherwise(F.lit(0)).cast("long")

    return (
        norm_len.join(line_stats, id_col, "left")
        .join(top, id_col, "left")
        .select(
            F.col(id_col),
            permille(F.coalesce("n_dup_lines", F.lit(0)), F.coalesce("n_lines", F.lit(0))).alias(
                "dup_line_permille"
            ),
            permille(
                F.coalesce("dup_line_chars", F.lit(0)), F.coalesce("line_chars", F.lit(0))
            ).alias("dup_line_char_permille"),
            permille(F.coalesce("top_bigram_chars", F.lit(0)), F.col("norm_len")).alias(
                "top_bigram_permille"
            ),
        )
    )


def unigram_surprise(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Integer-exact unigram LM quality proxy (the CCNet / perplexity-
    filter family, one model order down): per document, the total
    "surprise" of its tokens under the corpus's OWN unigram distribution,
    in whole bits:

        surprise(doc) = Σ_tok ( bits(N) − bits(count(tok)) )

    where ``bits(x) = floor(log2(x)) + 1`` is computed EXACTLY as the
    length of x's binary-digit string (``conv(x, 10, 2)`` — no libm log,
    so the DuckDB oracle can never drift on the last ulp) and N = total
    corpus token instances.  High mean surprise = rare vocabulary
    (OCR noise, gibberish); low = boilerplate; pipelines cut both tails.

    Output: (doc_id, n_tokens, surprise_bits, mean_surprise_milli) —
    the mean as floor(1000·sum/n) (single exact double division).
    Blank/NULL docs emit 0s.

    Plan (same scale shape as tf-idf): tokenize → corpus unigram counts
    (vocab-sized aggregation, persisted — it feeds both the N total and
    the vocabulary join) → vocabulary join back onto the token stream
    (AQE broadcasts it while it fits) → per-doc sum keyed on the id the
    corpus is already partitioned by.  N = the broadcast cross-join of
    the vocab-sum scalar (a 1-row frame), so the whole plan stays LAZY
    and the corpus is tokenized/aggregated exactly once — no
    plan-construction-time action.
    """
    from ..functions.cachereg import track
    from .dedup import tokens as _norm_tokens

    tk = df.select(F.col(id_col), F.explode(_norm_tokens(text_col)).alias("term")).filter(
        F.col("term") != ""
    )
    counts = track(tk.groupBy("term").agg(F.count("*").alias("cnt")))
    total = counts.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("_N"))
    # bits(N) exactly, same conv-string derivation as bits(cnt); N=0 (an
    # empty corpus) scores nothing anyway because the join is then empty
    # vocabulary join left to AQE (same reasoning as tfidf_top_terms: a
    # junk-heavy web vocabulary can outgrow any pinned broadcast)
    scored = tk.join(counts, "term").crossJoin(F.broadcast(total)).select(
        F.col(id_col),
        (
            F.length(F.conv(F.col("_N"), 10, 2))
            - F.length(F.conv(F.col("cnt"), 10, 2))
        ).alias("s"),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"), F.sum("s").alias("surprise_bits")
    )
    return df.select(id_col).join(per_doc, id_col, "left").select(
        F.col(id_col),
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce("surprise_bits", F.lit(0)).cast("long").alias("surprise_bits"),
        F.when(
            F.col("n_tokens") > 0,
            F.floor(F.lit(1000) * F.col("surprise_bits") / F.col("n_tokens")),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mean_surprise_milli"),
    )
