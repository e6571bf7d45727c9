"""Large-scale deduplication operators (training-data pipeline layer).

The reference converter is per-document (no cross-document ops); a 100 TB
extraction corpus additionally needs corpus-level dedup before training.
Every operator here is expressed with built-in Spark SQL functions (JVM-side,
whole-stage-codegen) — NO Python UDFs — and each has a DuckDB-runnable SQL
oracle in ``plans/contract.py``.

Scale design notes (local[32] correctness, 1000-executor intent):

* ``exact_dedup``      — one shuffle, on a 60-bit content hash (short key;
  map-side partial agg makes the exchange tiny).
* ``minhash_signatures`` — ZERO shuffle: the whole k-hash signature is a
  nested higher-order-function expression evaluated per row (no explode, no
  groupBy).  LSH banding then joins on (band_id, band_hash) — the only
  shuffle, on a short composite key; at 100 TB you bucket the band table.
* ``simhash_fingerprints`` — likewise per-row via nested ``aggregate``;
  two independent 60-bit hash words (120-bit fingerprint) let the
  candidate join band at up to 30 bits per band, so collision groups
  stay small (n / 2^30) and the self-join never goes quadratic even at
  the 10^12-doc extreme.
* ``ngram_jaccard_pairs`` — the shuffle-heavy exact verify; at scale you run
  it ONLY on LSH candidates (pass ``candidates=``), never all-pairs.
* All hashes are md5-derived (``functions.hashing``) so results are
  deterministic and engine-portable (driver oracle parity).

Thresholds are compared in integer arithmetic (``10*common >= t10*union``)
so oracle value-hashes can never diverge on float rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.cachereg import track
from ..functions.hashing import md5_long

# ---------------------------------------------------------------------------
# shared text normalization + shingling (pure column expressions)
# ---------------------------------------------------------------------------


def normalized_text(col: str = "text") -> Column:
    """Whitespace-collapsed, trimmed, lowercased content key."""
    return F.lower(F.trim(F.regexp_replace(F.col(col), r"\s+", " ")))


def tokens(col: str = "text") -> Column:
    return F.split(normalized_text(col), " ")


def stage_barrier(arr: Column) -> Column:
    """Pushdown barrier for a staged expensive array column.

    ``when(rand(seed) >= -1, arr)`` is identity-valued (the predicate is
    always true) but carries the NONDETERMINISTIC marker, so Catalyst
    cannot push predicates through the projection that stages ``arr``.
    Without it, exploding a staged shingle array lets
    ``InferFiltersFromGenerate``'s implicit ``size(e) > 0 AND
    isnotnull(e)`` filter be predicate-pushed below the staging
    projections — re-inlining the whole tokenize/shingle chain into the
    Filter with ``split()`` INSIDE the per-element lambda (the
    interpreted-HOF O(n²) pitfall) and, past a parallelism-floor
    repartition, into the 1-split scan stage, serializing the corpus
    through one task before the real 32-way stage recomputes it.  The
    r5 plan audit measured dedup_decontaminate at ~10 s steady-state
    from exactly this; barriered it is the cost of one rand per row.

    The guard must be ``rand() + 1 > 0`` (arithmetic form), not
    ``rand() >= -1``: Spark 4's optimizer range-folds DIRECT
    comparisons of rand with a literal (rand ∈ [0,1) ⇒ condition
    constant ⇒ the when() — and the nondeterministic marker with it —
    is eliminated and the pushdown returns), but does not reason
    through the addition.
    """
    return F.when(F.rand(11) + F.lit(1.0) > F.lit(0.0), arr)


def char_shingles_from_norm(norm: Column, k: int = 5) -> Column:
    """Distinct character k-gram shingles from a MATERIALIZED normalized-
    text column — the script-agnostic shingle unit (word shingles see one
    giant token in spaceless CJK text).  Same interpreted-HOF caveat as
    :func:`shingles_from_tokens`: pass an attribute, not an expression."""
    return F.when(
        F.length(norm) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(norm) - (k - 1)),
                lambda i: F.substring(norm, i, k),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """Distinct word k-gram shingles from a MATERIALIZED token-array column.

    IMPORTANT (interpreted-HOF pitfall): higher-order functions are not
    codegen'd — the lambda body is re-evaluated per element, including any
    lambda-invariant subtree.  If ``toks`` were the raw ``split(...)``
    expression instead of an attribute, the split would re-run once per
    shingle index (O(n²) work per doc).  Callers must first project the
    token array into its own select (``df.select(tokens().alias("_toks"))``)
    so the lambda sees an attribute reference.
    """
    return F.when(
        F.size(toks) >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate groups by content hash of normalized text.

    One hash shuffle on the 60-bit content key; partial aggregation
    (min/count) runs map-side, so the exchange carries one row per distinct
    hash per map partition.
    """
    return (
        df.select(F.col(id_col), md5_long(normalized_text(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("group_size"),
        )
    )


# ---------------------------------------------------------------------------
# 2. MinHash + LSH
# ---------------------------------------------------------------------------


# MinHash hash family: ONE md5 per shingle (the expensive part), then
# num_hashes cheap affine transforms h_s(x) = (a_s * h(x) + b_s) mod P.
# Overflow-safe in int64 on every engine: h < 2^32 (md5_int32),
# a < 2^30  =>  a*h < 2^62, + b < P < 2^61  =>  sum < 2^63.
# P = 2^61 - 1 (Mersenne prime).  Constants are md5-derived so the
# DuckDB oracle regenerates the identical family.
MINHASH_P = (1 << 61) - 1


def minhash_params(num_hashes: int = 16) -> list[tuple[int, int]]:
    import hashlib as _hl

    params = []
    for s in range(num_hashes):
        a = int(_hl.md5(f"mh_a:{s}".encode()).hexdigest()[:8], 16) % (1 << 30)
        a = a | 1  # nonzero, odd
        b = int(_hl.md5(f"mh_b:{s}".encode()).hexdigest()[:15], 16) % MINHASH_P
        params.append((a, b))
    return params


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_k: int = 3,
    impl: str = "pandas",
    unit: str = "word",
) -> DataFrame:
    """Per-doc MinHash signature: array<long> of length ``num_hashes``.

    ``unit='word'`` shingles whitespace-token k-grams (Latin corpora);
    ``unit='char'`` shingles character k-grams of the normalized text —
    the script-agnostic form required for spaceless CJK (use k≈5).

    signature[s] = min over shingles of (a_s * md5_int32(shingle) + b_s)
    mod P — one md5 per shingle, ``num_hashes`` integer transforms
    (r1 hashed md5(s||':'||shingle) per seed: num_hashes× the md5 cost;
    the affine family is the standard construction and cut the sf0.1
    LSH query ~3x).

    Two implementations with BYTE-IDENTICAL output (same md5 values, so
    the DuckDB oracle passes against either):

    * ``impl='pandas'`` (default) — Arrow-batched mapInPandas: hashlib's
      C md5 per shingle, then numpy-vectorized affine mins.  Catalyst
      higher-order functions are interpreted (not codegen'd) and
      measured ~62 µs per hash-chain eval; this path does the same work
      ~100x cheaper.  Still zero shuffle, parallel across partitions.
    * ``impl='expr'`` — pure built-in nested higher-order-function
      projection (no Python at all); kept as the oracle-transparent
      reference form and for environments without Python workers.

    Docs with < k tokens get an empty signature and are excluded from
    LSH (can't be near-dups by shingling).
    """
    if impl == "pandas":
        return _minhash_signatures_pandas(df, id_col, text_col, num_hashes, shingle_k, unit)
    if unit == "char":
        normed = df.select(F.col(id_col), normalized_text(text_col).alias("_norm"))
        shingled = normed.select(
            F.col(id_col), char_shingles_from_norm(F.col("_norm"), shingle_k).alias("_sh")
        )
    else:
        toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        shingled = toked.select(
            F.col(id_col), shingles_from_tokens(F.col("_toks"), shingle_k).alias("_sh")
        )
    # materialize the per-shingle 32-bit hashes ONCE (interpreted-HOF
    # pitfall: chaining would re-hash per (seed, shingle) pair)
    hashed = shingled.select(
        F.col(id_col),
        F.size("_sh").alias("_n"),
        F.transform(
            F.col("_sh"),
            lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long"),
        ).alias("_h"),
    )
    params = minhash_params(num_hashes)

    def affine_min(a: int, b: int):
        # closure factory: pyspark counts lambda params, so default-arg
        # binding (lambda h, _a=a: ...) would mis-declare a 3-ary lambda
        return F.array_min(
            F.transform(F.col("_h"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P))
        )

    sig = F.array(*[affine_min(a, b) for a, b in params])
    return hashed.select(
        F.col(id_col),
        F.when(F.col("_n") > 0, sig).otherwise(F.array().cast("array<long>")).alias("signature"),
    )


def _minhash_signatures_pandas(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    shingle_k: int,
    unit: str = "word",
) -> DataFrame:
    """hashlib-backed twin of the expr implementation (same md5 bytes →
    same signatures).  Normalization mirrors :func:`normalized_text`
    exactly: Java ``\\s`` is ASCII-only, so the Python regex uses the
    explicit class (Python ``\\s`` would also eat U+3000 etc.)."""
    import re as _re

    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    ws_re = _re.compile(r"[ \t\n\x0b\x0c\r]+")
    out_schema = StructType(
        [df.schema[id_col], StructField("signature", ArrayType(LongType()), True)]
    )

    def run(batches):
        import hashlib

        import pandas as pd

        import numpy as np

        params = minhash_params(num_hashes)
        a_vec = np.array([a for a, _ in params], dtype=np.int64)[:, None]
        b_vec = np.array([b for _, b in params], dtype=np.int64)[:, None]
        for pdf in batches:
            ids, sigs = [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                norm = ws_re.sub(" ", "" if text is None else str(text)).strip(" ").lower()
                if unit == "char":
                    if len(norm) < shingle_k:
                        ids.append(i)
                        sigs.append([])
                        continue
                    shingles = {
                        norm[j : j + shingle_k].encode()
                        for j in range(len(norm) - shingle_k + 1)
                    }
                else:
                    toks = norm.split(" ")
                    if len(toks) < shingle_k:
                        ids.append(i)
                        sigs.append([])
                        continue
                    shingles = {
                        " ".join(toks[j : j + shingle_k]).encode()
                        for j in range(len(toks) - shingle_k + 1)
                    }
                h = np.array(
                    [int(hashlib.md5(g).hexdigest()[:8], 16) for g in shingles],
                    dtype=np.int64,
                )[None, :]
                sig = ((a_vec * h + b_vec) % MINHASH_P).min(axis=1).tolist()
                ids.append(i)
                sigs.append(sig)
            yield pd.DataFrame({id_col: ids, "signature": sigs})

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def banded_signatures(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """(id, band_id, band_hash) band table from MinHash signatures — a
    per-row projection (no shuffle); shared by the batch candidate join
    and the streaming band-state dedup."""
    rows = num_hashes // bands
    return signatures.filter(F.size("signature") > 0).select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: md5_long(
                    F.concat_ws(",", F.transform(F.slice("signature", b * rows + 1, rows), lambda v: v.cast("string")))
                ),
            )
        ).alias("band_id", "band_hash"),
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 band of the signature.

    Bands the signature per-row (still no shuffle), hashes each band to one
    long, then self-joins on (band_id, band_hash) — a short-key equi-join
    AQE can re-balance; at cluster scale the band table is bucket-written
    so repeated dedup runs skip the exchange entirely.
    """
    banded = banded_signatures(signatures, id_col, num_hashes, bands)
    # materialize before the self-join: otherwise BOTH join sides re-run the
    # full signature lineage (hash computation is the expensive stage; the
    # band table is tiny — id + 2 longs per band)
    banded = track(banded)  # released via functions.cachereg.release_cached()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# 3. n-gram Jaccard (exact verify)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold_tenths: int = 6,
    candidates: DataFrame | None = None,
    unit: str = "word",
) -> DataFrame:
    """Pairs with Jaccard(shingles_a, shingles_b) >= threshold_tenths/10.
    ``unit`` as in :func:`minhash_signatures` (char k-grams for CJK).

    Exact set-overlap via shingle explode + self-equi-join on shingle —
    the inverted-index formulation (shuffle keyed on shingle, never a
    cartesian).  Threshold test is integer-only:
    ``10*common >= t * (sa + sb - common)``.

    At 100 TB this runs ONLY over LSH ``candidates`` (semi-join pushed
    below the explode); all-pairs mode is for small corpora / oracles.
    """
    # stage the shingle array behind a pushdown barrier BEFORE exploding:
    # see stage_barrier — the explode's inferred size/notnull filter must
    # read the staged attribute, never re-inline the HOF chain
    if unit == "char":
        normed = df.select(F.col(id_col), normalized_text(text_col).alias("_norm"))
        staged = normed.select(
            F.col(id_col),
            stage_barrier(char_shingles_from_norm(F.col("_norm"), shingle_k)).alias("_sh"),
        )
    else:
        toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        staged = toked.select(
            F.col(id_col),
            stage_barrier(shingles_from_tokens(F.col("_toks"), shingle_k)).alias("_sh"),
        )
    sh = staged.select(F.col(id_col), F.explode("_sh").alias("shingle"))
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))

    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    if candidates is not None:
        # no broadcast hint: the candidate set scales WITH the corpus
        # (LSH pair volume), so a pinned broadcast would OOM the driver at
        # scale — AQE broadcasts automatically whenever the set is small
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")

    out = (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n_shingles", "sa"), "id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n_shingles", "sb"), "id_b")
        .filter(F.col("common") * 10 >= F.lit(threshold_tenths) * (F.col("sa") + F.col("sb") - F.col("common")))
        .select("id_a", "id_b", "common", "sa", "sb")
    )
    return out


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------


# hex-digit offsets of the two 60-bit fingerprint words inside ONE md5
# digest (32 hex chars): word 0 = digits 1-15 (the md5_long convention,
# backward compatible), word 1 = digits 17-31 — disjoint digest bits, so
# one hash per token feeds both words (r3 first shipped an independent
# 'w2:'-salted second hash; same statistics, twice the md5 cost)
_SIMHASH_WORD_OFFSETS = (1, 17)


def _fp_col(w: int) -> str:
    return "fingerprint" if w == 0 else f"fingerprint{w + 1}"


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 60,
    impl: str = "pandas",
    words: int = 2,
) -> DataFrame:
    """``words``×60-bit SimHash per doc over distinct unigram tokens
    (default 2 words = a 120-bit fingerprint).

    word-w fp bit b = sign( sum over tokens of
        (+1 if bit b of word-w's 60-bit slice of md5(tok) else -1) )

    The two words take DISJOINT hex ranges of one digest
    (:data:`_SIMHASH_WORD_OFFSETS`: digits 1-15 — the md5_long
    convention, backward compatible — and 17-31), so a single md5 per
    token feeds both.  Output columns: ``fingerprint`` (word 0) and
    ``fingerprint2`` (word 1, when words=2).  Each word stays < 2^60
    (portable bigint, no sign issues).

    WHY two words: near-dup banding group sizes scale as
    n / 2^band_bits and the per-group join work is quadratic, so band
    width must track log2(n).  A single 60-bit word caps band_bits at
    15 (4 bands) — fine to ~10^10 docs; the second word lets
    :func:`simhash_near_dups` band at up to 30 bits (10^9 values/band),
    which holds the group-size math to 10^12 docs.

    ``impl='pandas'`` (default): hashlib+numpy Arrow-batched twin —
    byte-identical fingerprints, the bit-voting fully vectorized.
    ``impl='expr'``: nested ``aggregate`` expressions — zero Python,
    the oracle-transparent form.
    """
    if words not in (1, 2):
        raise ValueError("words must be 1 or 2")
    if impl == "pandas":
        return _simhash_fingerprints_pandas(df, id_col, text_col, bits, words)
    # NULL text folds to "" (the pandas twin's semantics) — without the
    # coalesce the whole expression is NULL and the row's fingerprint
    # silently diverges between the two impls
    norm = F.lower(
        F.trim(F.regexp_replace(F.coalesce(F.col(text_col), F.lit("")), r"\s+", " "))
    )
    toks = F.array_distinct(F.split(norm, " "))
    # ONE md5 per token, materialized; both words slice the same digest
    hexes = F.transform(toks, lambda t: F.md5(t))

    def word_of(hx: Column, w: int) -> Column:
        off = _SIMHASH_WORD_OFFSETS[w]
        return F.conv(F.substring(hx, off, 15), 16, 10).cast("long")

    # shift-by-column isn't exposed in the Python DSL — SQL lambda form
    # (same Catalyst HigherOrderFunction either way).  The per-token hash
    # arrays are materialized in their own projection first (interpreted-
    # HOF pitfall: the lambda body re-evaluates per element).
    def fp_expr(hs_col: str) -> str:
        return f"""
        aggregate(sequence(0, {bits - 1}),
                  cast(0 as bigint),
                  (acc, b) -> acc + (CASE WHEN
                      aggregate({hs_col}, cast(0 as bigint),
                                (s, h) -> s + (CASE WHEN shiftright(h, b) % 2 = 1
                                               THEN 1 ELSE -1 END)) > 0
                      THEN shiftleft(cast(1 as bigint), b)
                      ELSE cast(0 as bigint) END))
    """

    def word_hashes(w: int) -> Column:
        # closure factory, NOT a default-arg lambda: pyspark counts lambda
        # params, so (lambda h, w=w: ...) would declare an (elem, idx) HOF
        return F.transform(F.col("_hx"), lambda h: word_of(h, w))

    hexed = df.select(F.col(id_col), hexes.alias("_hx"))
    hashed = hexed.select(
        F.col(id_col),
        *[word_hashes(w).alias(f"_hs{w}") for w in range(words)],
    )
    return hashed.select(
        F.col(id_col),
        *[F.expr(fp_expr(f"_hs{w}")).alias(_fp_col(w)) for w in range(words)],
    )


def _simhash_fingerprints_pandas(
    df: DataFrame, id_col: str, text_col: str, bits: int, words: int = 2
) -> DataFrame:
    """hashlib+numpy twin of the expr SimHash (same md5-derived bits):
    one C md5 per distinct token, bit-voting vectorized as a
    (tokens × bits) ±1 matrix sum per word — no per-bit Python loop."""
    import re as _re

    from pyspark.sql.types import LongType, StructField, StructType

    ws_re = _re.compile(r"[ \t\n\x0b\x0c\r]+")
    offsets = _SIMHASH_WORD_OFFSETS[:words]
    fp_cols = [_fp_col(w) for w in range(words)]
    out_schema = StructType(
        [df.schema[id_col]] + [StructField(c, LongType(), True) for c in fp_cols]
    )

    def run(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        shifts = np.arange(bits, dtype=np.uint64)

        def fold(hvals: list[int]) -> int:
            # sign of per-bit ±1 votes; int64-safe (h < 2^60)
            h = np.asarray(hvals, dtype=np.uint64)[:, None]
            votes = (((h >> shifts) & 1).astype(np.int64) * 2 - 1).sum(axis=0)
            fp = 0
            for b in np.nonzero(votes > 0)[0]:
                fp |= 1 << int(b)
            return fp

        for pdf in batches:
            ids = []
            fps: list[list[int]] = [[] for _ in range(words)]
            for i, text in zip(pdf[id_col], pdf[text_col]):
                norm = ws_re.sub(" ", "" if text is None else str(text)).strip(" ").lower()
                digests = [
                    hashlib.md5(t.encode()).hexdigest() for t in set(norm.split(" "))
                ]
                for w, off in enumerate(offsets):
                    # hex-digit offset is 1-based (SQL substring convention)
                    fps[w].append(
                        fold([int(d[off - 1 : off + 14], 16) for d in digests])
                    )
                ids.append(i)
            yield pd.DataFrame({id_col: ids, **dict(zip(fp_cols, fps))})

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def simhash_near_dups(
    fps: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 12,
    bits: int = 60,
    band_bits: int = 30,
) -> DataFrame:
    """Near-dup pairs with hamming(fp_a, fp_b) <= max_hamming, where the
    hamming distance spans ALL fingerprint words present (120 bits with
    the default 2-word fingerprints; the default max_hamming=12 is the
    same 10% relative threshold the old 6-of-60 was).

    Pigeonhole banding: the fingerprint words are split into
    ``words * (bits // band_bits)`` bands of ``band_bits`` bits and the
    self-join keys on (band_id, band value).  With the defaults — 2
    words × 60 bits at band_bits=30 — that is 4 bands of 30 bits: any
    pair with hamming ≤ 3 is guaranteed caught (≤3 differing bits over 4
    bands ⇒ one band identical); larger hammings are caught when their
    differing bits don't touch every band — the standard LSH-recall
    trade-off (lower band_bits ⇒ more bands ⇒ more recall AND smaller
    collision-group keys — tune per corpus size).

    Scale: collision groups per band value scale as n / 2^band_bits and
    the within-group join is quadratic, so band width must track
    log2(n): band_bits=15 (the single-word maximum) holds to ~10^10
    docs; band_bits=30 gives 1.07e9 values per band — group size ~930
    at 10^12 docs, keeping the self-join linear-ish at the extreme
    scale the 10^12-doc north rule names.  ``band_bits`` must divide
    ``bits``; it may only exceed 15 when the fingerprint frame carries
    the second word (``fingerprint2``).
    """
    if bits % band_bits != 0:
        raise ValueError(f"band_bits={band_bits} must divide bits={bits}")
    words = 2 if "fingerprint2" in fps.columns else 1
    if band_bits > 15 and words == 1:
        # a 60-bit single-word fingerprint banded at 30 bits is only 2
        # bands: the pigeonhole guarantee silently drops from hamming<=3
        # to hamming<=1 and near-dup recall collapses with no symptom —
        # refuse instead (use simhash_fingerprints(words=2), or
        # band_bits<=15)
        raise ValueError(
            f"band_bits={band_bits} needs 2-word fingerprints (no "
            "'fingerprint2' column in fps); pass band_bits<=15 for "
            "single-word frames"
        )
    bpw = bits // band_bits
    n_bands = words * bpw
    mask = (1 << band_bits) - 1
    per_word = [
        f"shiftright({_fp_col(w)}, ((b - {w * bpw}) * {band_bits})) & {mask}"
        for w in range(words)
    ]
    if words == 1:
        val = per_word[0]
    else:
        val = f"CASE WHEN b < {bpw} THEN {per_word[0]} ELSE {per_word[1]} END"
    bands_expr = f"transform(sequence(0, {n_bands - 1}), b -> {val})"
    fp_cols = [_fp_col(w) for w in range(words)]
    banded = fps.select(
        F.col(id_col),
        *[F.col(c) for c in fp_cols],
        F.posexplode(F.expr(bands_expr)).alias("band_id", "band_val"),
    )
    banded = track(banded)  # one fingerprint pass feeds both self-join sides
    a = banded.alias("a")
    b = banded.alias("b")
    hamming = F.bit_count(F.col("a.fingerprint").bitwiseXOR(F.col("b.fingerprint")))
    if words == 2:
        hamming = hamming + F.bit_count(
            F.col("a.fingerprint2").bitwiseXOR(F.col("b.fingerprint2"))
        )
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        # filter BEFORE distinct: the hamming test is a per-row expression,
        # the distinct is a shuffle — dropping far pairs first shrinks the
        # exchange to the result size
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ---------------------------------------------------------------------------
# 5. duplicate clusters (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def _cc_canon(e: DataFrame) -> DataFrame:
    """Canonical undirected edge set: u < v, no loops, distinct."""
    return (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _cc_large_star(e: DataFrame) -> DataFrame:
    """large-star(u): connect every neighbor v > u to min(Γ(u) ∪ {u})."""
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = adj.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    return _cc_canon(
        adj.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _cc_small_star(e: DataFrame) -> DataFrame:
    """small-star(u): connect u and its smaller neighbors to their min."""
    adj = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    smaller = adj.filter(F.col("v") < F.col("u"))
    smins = smaller.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        smaller.join(smins, "u")
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .union(smins.select(F.col("u").alias("a"), F.col("m").alias("b")))
    )
    return _cc_canon(out.select(F.col("a").alias("u"), F.col("b").alias("v")))


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    convergence: str = "exact",
) -> DataFrame:
    """(id_a, id_b) candidate-pair edge list → (doc_id, cluster_id) where
    cluster_id = the component's minimum node id.

    Training pipelines need duplicate CLUSTERS (one canonical doc per
    group), not just pairs — this turns LSH/simhash candidate pairs into
    that assignment.  Alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — no GraphFrames dependency; converges in O(log n) rounds
    where naive min-label propagation needs O(diameter).  Each round is
    two groupBy+join shuffles on the node key; lineage is truncated per
    round with ``localCheckpoint`` so plans stay flat across iterations
    (the classic iterative-DataFrame blowup).

    ``convergence='exact'`` detects the edge-set fixpoint with a
    subtract-count (two extra jobs per round — sandbox/correctness
    grade); ``convergence='checksum'`` compares (count, sum(u), sum(v))
    between rounds — one cheap aggregate, and sound here because the
    star operations only move edges monotonically down the id order, so
    an unchanged checksum implies an unchanged edge set for all
    practical purposes; this is the 10^12-node mode.  Both modes are
    proven equal on test graphs.  Dedup components are near-cliques, so
    2-4 rounds converge either way.  Returns one row per node that
    appears in ``pairs``; singletons (docs in no pair) are absent —
    callers left-join and coalesce to doc_id.
    """
    e = _cc_canon(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    ).localCheckpoint(eager=True)

    def _checksum(frame: DataFrame) -> tuple:
        r = frame.agg(
            F.count("*").alias("n"), F.sum("u").alias("su"), F.sum("v").alias("sv")
        ).head()
        return (r["n"], r["su"], r["sv"])

    prev_ck = _checksum(e) if convergence == "checksum" else None
    for _ in range(max_iter):
        new_e = _cc_small_star(_cc_large_star(e)).localCheckpoint(eager=True)
        if convergence == "checksum":
            ck = _checksum(new_e)
            if ck == prev_ck:
                e = new_e
                break
            prev_ck = ck
        else:
            # exact fixpoint test: same count and nothing in the
            # symmetric difference
            if new_e.count() == e.count() and new_e.subtract(e).count() == 0:
                e = new_e
                break
        e = new_e

    # converged star forest in canonical form: u = component min (root),
    # v = leaf; each leaf appears exactly once, roots only on the u side
    leaves = e.select(F.col("v").alias("doc_id"), F.col("u").alias("cluster_id"))
    roots = (
        e.select(F.col("u").alias("doc_id"))
        .distinct()
        .join(leaves.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return leaves.union(roots)


# ---------------------------------------------------------------------------
# 6. eval-set decontamination (cross-corpus n-gram overlap)
# ---------------------------------------------------------------------------


def cross_ngram_overlap(
    train: DataFrame,
    evalset: DataFrame,
    shingle_k: int = 3,
    min_common: int = 1,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
    text_col: str = "text",
    max_eval_df: int | None = None,
) -> DataFrame:
    """Training↔eval contamination scan: (train_doc, eval_doc, n_common)
    for every pair sharing ≥ ``min_common`` distinct word-``shingle_k``-
    grams — the standard n-gram-collision decontamination check run
    before training (eval answers leaking into the train set).

    Scale shape: shingles are joined by their 60-bit md5 hash (short
    key); the eval side is tiny relative to the corpus, so its shingle
    table BROADCASTS — the train side is never shuffled, making the scan
    a map-side join over the corpus + one small aggregation.  Raise
    ``shingle_k`` (8-13 is typical for decontamination) to sharpen
    precision on real corpora.

    ``max_eval_df`` caps the eval-side DOCUMENT FREQUENCY of a shingle:
    shingles present in more than that many eval documents are dropped
    before the join.  Such shingles are shared boilerplate (prompt
    frames, license headers, instruction phrases), not leakage signal —
    standard decontamination practice — and they are exactly the
    quadratic hot keys of the join: one boilerplate shingle produces
    |train occurrences| x |eval docs sharing it| rows before the
    aggregation, which at web scale turns a linear scan into a blowup.
    The cap is computed on the tiny eval side (one window over the
    broadcast-bound table), so the corpus side still never shuffles.
    """
    def side(df: DataFrame, id_col: str, alias: str) -> DataFrame:
        toked = df.select(F.col(id_col).alias(alias), tokens(text_col).alias("_toks"))
        # stage_barrier: the explode's inferred size/notnull filter must
        # read the staged attribute, not re-inline the HOF chain below
        # the parallelism-floor repartition (1-split scan = one task)
        sh = toked.select(
            F.col(alias),
            stage_barrier(shingles_from_tokens(F.col("_toks"), shingle_k)).alias("_sh"),
        )
        return sh.select(F.col(alias), F.explode("_sh").alias("shingle")).select(
            F.col(alias), md5_long(F.col("shingle")).alias("sh_hash")
        )

    t = side(train, train_id, "train_id")
    e = side(evalset, eval_id, "eval_id")
    if max_eval_df is not None:
        # shingles are DISTINCT per doc (shingles_from_tokens), so the
        # per-hash row count IS the eval document frequency
        w = Window.partitionBy("sh_hash")
        e = (
            e.withColumn("_eval_df", F.count("*").over(w))
            .filter(F.col("_eval_df") <= max_eval_df)
            .drop("_eval_df")
        )
    return (
        t.join(F.broadcast(e), "sh_hash")
        .groupBy("train_id", "eval_id")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def decontaminate_chunks(
    train: DataFrame,
    evalset: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 32,
    shingle_k: int = 3,
    min_permille: int = 500,
    train_id: str = "doc_id",
    eval_id: str = "doc_id",
    text_col: str = "text",
    max_eval_df: int | None = None,
) -> DataFrame:
    """Training-WINDOW-granularity decontamination:
    :func:`~..operators.corpus.chunk_documents` → per-chunk shingle scan.

    Whole-doc overlap ratios dilute buried contamination: a 40-token
    eval answer pasted into a 4000-token document is ~1% of the doc's
    shingles but ~100% of one 128-token training window — and the model
    trains on WINDOWS, not docs, so the window is the unit that leaks.
    This op chunks the corpus exactly the way batch packing would
    (same stride arithmetic), then flags every (train doc, chunk, eval
    doc) whose shared distinct ``shingle_k``-gram count reaches
    ``min_permille`` of the chunk's own distinct shingles (integer
    compare: ``1000*common >= min_permille*chunk_shingles`` — no float
    rounding vs the DuckDB oracle).

    Scale shape: chunking is per-row 1→N fan-out (no shuffle); the eval
    shingle table BROADCASTS like :func:`cross_ngram_overlap`, so the
    corpus side's only shuffle is the small per-hit aggregation.
    Overlapping windows can flag the same leaked span in two adjacent
    chunks — dedup at the (train_id, eval_id) level downstream if you
    only need the doc verdict.

    ``max_eval_df`` drops shingles present in more than that many eval
    DOCUMENTS before the join — same boilerplate/hot-key cap as
    :func:`cross_ngram_overlap` (the chunk-side fanout multiplies by
    every eval doc sharing the shingle, so a universal prompt frame is
    both noise and the join's worst key).  The chunk's own
    ``n_chunk_shingles`` denominator is NOT capped — only which shingles
    may count as common.

    Output: (train_id, chunk_id, eval_id, n_common, n_chunk_shingles,
    permille).
    """
    from .corpus import chunk_documents

    chunks = chunk_documents(
        train, chunk_tokens=chunk_tokens, overlap=overlap, id_col=train_id, text_col=text_col
    )
    toked = chunks.select(
        F.col(train_id).alias("train_id"),
        "chunk_id",
        tokens("chunk_text").alias("_toks"),
    )
    csh = (
        toked.select(
            "train_id",
            "chunk_id",
            stage_barrier(shingles_from_tokens(F.col("_toks"), shingle_k)).alias("_sh"),
        )
        .select(
            "train_id",
            "chunk_id",
            F.size("_sh").alias("n_chunk_shingles"),
            F.explode("_sh").alias("shingle"),
        )
        .select("train_id", "chunk_id", "n_chunk_shingles", md5_long(F.col("shingle")).alias("sh_hash"))
    )
    etoked = evalset.select(F.col(eval_id).alias("eval_id"), tokens(text_col).alias("_toks"))
    esh = (
        etoked.select(
            "eval_id",
            stage_barrier(shingles_from_tokens(F.col("_toks"), shingle_k)).alias("_sh"),
        )
        .select("eval_id", F.explode("_sh").alias("shingle"))
        .select("eval_id", md5_long(F.col("shingle")).alias("sh_hash"))
    )
    if max_eval_df is not None:
        w = Window.partitionBy("sh_hash")
        esh = (
            esh.withColumn("_eval_df", F.count("*").over(w))
            .filter(F.col("_eval_df") <= max_eval_df)
            .drop("_eval_df")
        )
    hits = (
        csh.join(F.broadcast(esh), "sh_hash")
        .groupBy("train_id", "chunk_id", "n_chunk_shingles", "eval_id")
        .agg(F.count("*").alias("n_common"))
    )
    return hits.filter(
        F.lit(1000) * F.col("n_common") >= F.lit(min_permille) * F.col("n_chunk_shingles")
    ).select(
        "train_id",
        "chunk_id",
        "eval_id",
        F.col("n_common").cast("long").alias("n_common"),
        F.col("n_chunk_shingles").cast("long").alias("n_chunk_shingles"),
        # integer division: exact vs the oracle's // (no float rounding)
        F.expr("(1000 * n_common) div n_chunk_shingles").cast("long").alias("permille"),
    )


# ---------------------------------------------------------------------------
# 7. span-level duplication: longest common token run per candidate pair
# ---------------------------------------------------------------------------


def _diagonal_runs(
    df: DataFrame,
    pairs: DataFrame,
    shingle_k: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Shared island plan behind :func:`longest_common_run` and
    :func:`remove_common_runs`: per candidate pair, every maximal run of
    consecutive shared positional shingles, as
    (id_a, id_b, diag, island, run, start_a) — ``start_a`` is the run's
    first shingle position in doc a (0-based), ``start_a - diag`` the
    same in doc b.

    Positional shingles (pos kept, NOT distinct) for both sides are
    matched by 60-bit shingle hash; matches on one diagonal
    ``d = pos_a - pos_b`` that are consecutive in ``pos_a`` form an
    island (the pos_a − row_number() trick).  Work is bounded by
    matched-shingle volume per CANDIDATE pair — runs after LSH, never
    all-pairs.
    """
    pos_sh = (
        df.select(F.col(id_col), tokens(text_col).alias("_toks"))
        .select(
            F.col(id_col),
            F.posexplode(
                F.when(
                    F.size("_toks") >= shingle_k,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_toks") - (shingle_k - 1)),
                        lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, shingle_k)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos", "shingle"),
        )
        .select(F.col(id_col), "pos", md5_long(F.col("shingle")).alias("sh_hash"))
    )
    # Both join sides consume pos_sh, so its subtree plans twice — and
    # measurement says LEAVE IT: persisting the wide shingle table was
    # A/B-tested 1.5-1.8x SLOWER at sf0.1 (5.8s vs 3.2s) because
    # materializing every (id, pos, hash) row costs more than re-running
    # the tokenize+shingle+md5 pipeline fused into each shuffle write.
    a = pos_sh.alias("a").join(
        pairs.select("id_a", "id_b").alias("p"), F.col(f"a.{id_col}") == F.col("p.id_a")
    )
    matched = a.join(
        pos_sh.alias("b"),
        (F.col(f"b.{id_col}") == F.col("p.id_b")) & (F.col("a.sh_hash") == F.col("b.sh_hash")),
    ).select(
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    ).distinct()
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    islands = matched.withColumn("island", F.col("pos_a") - F.row_number().over(w))
    return islands.groupBy("id_a", "id_b", "diag", "island").agg(
        F.count("*").alias("run"), F.min("pos_a").alias("start_a")
    )


def longest_common_run(
    df: DataFrame,
    pairs: DataFrame,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """For each candidate pair, the length of the longest run of
    CONSECUTIVE shared word-``shingle_k``-grams — i.e. the longest common
    token substring has ``max_run + k - 1`` tokens.  The span-level
    duplication signal behind substring dedup (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): whole-doc Jaccard misses
    a verbatim paragraph pasted into an otherwise-novel document; a long
    common run catches exactly that.  Plan: :func:`_diagonal_runs`.
    """
    runs = _diagonal_runs(df, pairs, shingle_k, id_col, text_col)
    return runs.groupBy("id_a", "id_b").agg(
        F.max("run").alias("max_run"),
        (F.max("run") + F.lit(shingle_k - 1)).alias("lcs_tokens"),
    )


def remove_common_runs(
    df: DataFrame,
    pairs: DataFrame,
    shingle_k: int = 3,
    min_run: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring dedup REMOVAL (Lee et al. §4 keep-one-occurrence): for
    every doc appearing as ``id_b`` in a candidate pair whose longest
    common shingle run reaches ``min_run``, cut that duplicated token
    span from the doc — the ``id_a`` side keeps its copy — and re-emit
    the text.

    Output (affected docs only): (doc_id, src_id, new_text,
    removed_tokens) where ``src_id`` is the doc whose copy survives and
    ``removed_tokens = run + k - 1``.  Exactly ONE span — the best — is
    cut per doc; iterating the operator removes further spans
    (convergent: each pass strictly shrinks affected docs).  "Best" is
    fully deterministic: longest run, then lowest src_id, then lowest
    diagonal, then lowest start — so the DuckDB oracle replays the
    identical choice.

    The splice is SOURCE-BYTE surgery: shingle token index ``i`` maps 1:1
    onto the i-th whitespace-delimited raw token (normalization only
    lowercases and collapses separators, never changes token boundaries),
    so the cut span's character range is recovered from the raw token /
    separator runs (``regexp_extract_all`` over the original text) and
    ``new_text = text[:cut_start] + text[cut_end:]`` — every kept byte is
    byte-identical to the source (casing, tabs, newlines preserved).  A
    cut reaching the last token also drops the trailing whitespace run.
    The whitespace class is spelled out ([ \\t\\n\\x0b\\f\\r]) because
    RE2's \\s excludes \\x0b — keeps the DuckDB oracle byte-identical.

    Scale shape: everything up to the per-doc argmin is
    :func:`_diagonal_runs` (candidate-bounded); the argmin is one window
    over (id_b) and the offset recovery is per-row linear lambda work on
    AFFECTED docs only — no extra shuffle beyond the doc join.
    """
    runs = _diagonal_runs(df, pairs, shingle_k, id_col, text_col).filter(
        F.col("run") >= min_run
    )
    wb = Window.partitionBy("id_b").orderBy(
        F.desc("run"), F.asc("id_a"), F.asc("diag"), F.asc("start_a")
    )
    best = (
        runs.withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .select(
            F.col("id_b"),
            F.col("id_a").alias("src_id"),
            (F.col("start_a") - F.col("diag")).alias("start_b"),
            (F.col("run") + F.lit(shingle_k - 1)).alias("n_cut"),
        )
    )
    ws_re = "[ \\t\\n\\x0b\\f\\r]"  # Java regex, passed as a lit (no SQL unescape)
    raw = df.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("_txt"),
        F.regexp_extract_all(
            F.col(text_col), F.lit("[^ \\t\\n\\x0b\\f\\r]+"), F.lit(0)
        ).alias("_rtoks"),
        F.regexp_extract_all(F.col(text_col), F.lit(ws_re + "+"), F.lit(0)).alias("_seps"),
        F.when(F.col(text_col).rlike("^" + ws_re), F.lit(1)).otherwise(F.lit(0)).alias("_h"),
    )
    joined = raw.join(best, "id_b")
    lead = F.when(F.col("_h") == 1, F.length(F.element_at("_seps", 1))).otherwise(F.lit(0))

    def tok_start(s: Column) -> Column:
        # 0-based char offset where raw token s starts; valid for
        # 0 <= s < size(_rtoks) (every summed separator index exists
        # because a token always follows it).  element_at indices are INT.
        s = s.cast("int")
        return F.when(s <= 0, lead).otherwise(
            lead
            + F.aggregate(
                F.sequence(F.lit(0), s - 1),
                F.lit(0),
                lambda acc, j: acc
                + F.length(F.element_at(F.col("_rtoks"), j + 1))
                + F.length(F.element_at(F.col("_seps"), j + F.col("_h") + 1)),
            )
        )

    cut = joined.select(
        "id_b",
        "src_id",
        "_txt",
        "n_cut",
        tok_start(F.col("start_b")).alias("_cut_start"),
        F.when(
            F.col("start_b") + F.col("n_cut") >= F.size("_rtoks"), F.length("_txt")
        ).otherwise(tok_start(F.col("start_b") + F.col("n_cut"))).alias("_cut_end"),
    )
    spliced = cut.select(
        F.col("id_b").alias(id_col),
        "src_id",
        F.concat(
            F.substring("_txt", F.lit(1), F.col("_cut_start")),
            F.substring("_txt", F.col("_cut_end") + 1, F.length("_txt")),
        ).alias("new_text"),
        F.col("n_cut").cast("long").alias("removed_tokens"),
    )
    return spliced


# ---------------------------------------------------------------------------
# Bloom-filter membership dedup (reference sets too big to broadcast-join)
# ---------------------------------------------------------------------------


def bloom_positions(
    col: Column, n_bits: int, n_hashes: int, salt: str = "bloom"
) -> Column:
    """Per-row array of ``n_hashes`` bit positions in ``[0, n_bits)`` —
    md5-derived (portable across engines: a SQL oracle replays the
    identical positions, so even the FALSE POSITIVES replicate exactly).
    NULL input yields a NULL array — not an array of NULLs — so the
    build side's explode emits nothing and the probe side flags False."""
    return F.when(
        col.isNotNull(),
        F.array(
            *[
                F.pmod(md5_long(F.concat(col, F.lit(f":{salt}{i}"))), F.lit(n_bits))
                for i in range(n_hashes)
            ]
        ),
    )


def bloom_build(
    df: DataFrame,
    text_col: str = "text",
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    salt: str = "bloom",
) -> bytes:
    """Build a Bloom filter bitmap over a REFERENCE corpus column.

    The scale story this op exists for: dropping documents whose hash
    appears in a reference set needs no join and no shuffle of the
    corpus when the reference fits a broadcast FILTER even though its
    exact hash set would not (10^10 refs = 80 GB of longs, vs a 1%-fpp
    Bloom bitmap ~12 GB, or any sized-down bitmap at a known fpp; this
    sandbox uses small ``n_bits`` to make false positives observable
    and oracle-replayable).

    Plan shape: positions are computed JVM-side and exploded; ONE
    Arrow-batched ``mapInPandas`` pass emits a fixed-size per-partition
    bitmap (``n_bits/8`` bytes regardless of row count), and the
    per-partition bitmaps are ``treeReduce``-merged EXECUTOR-SIDE
    (depth 2 — the shape of Spark's own ``stat.bloomFilter``'s
    treeAggregate), so the driver receives exactly ONE bitmap no matter
    how many partitions the reference scans into.  A collect-then-OR
    here would ship partitions × bitmap bytes to the driver — fine for
    kilobyte filters, fatal for the multi-GB bitmaps a 10^10-document
    reference set needs.  (The one RDD use in this repo: a fixed-size
    binary-blob reduction is per-partition imperative by nature.)
    """
    import numpy as np

    n_bytes = (n_bits + 7) // 8
    pos = df.select(
        F.explode(bloom_positions(F.col(text_col), n_bits, n_hashes, salt)).alias("p")
    )

    def to_bitmap(batches):
        import numpy as np
        import pandas as pd

        bits = np.zeros(n_bytes, dtype=np.uint8)
        for pdf in batches:
            if len(pdf):
                p = pdf["p"].to_numpy(dtype=np.int64)
                np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
        yield pd.DataFrame({"bitmap": [bits.tobytes()]})

    part_maps = pos.mapInPandas(to_bitmap, schema="bitmap binary")
    merged = part_maps.rdd.map(
        lambda r: np.frombuffer(r["bitmap"], dtype=np.uint8)
    ).treeReduce(lambda a, b: a | b, depth=2)
    return merged.tobytes()


def bloom_might_contain(
    df: DataFrame,
    bitmap: bytes,
    text_col: str = "text",
    n_bits: int = 1 << 23,
    n_hashes: int = 4,
    salt: str = "bloom",
    out_col: str = "in_ref",
) -> DataFrame:
    """Flag rows whose ``text_col`` MIGHT be in the reference filter
    (no false negatives; false-positive rate set by ``n_bits``/
    ``n_hashes`` vs reference cardinality).  Positions are JVM
    expressions; the bit probe is one Arrow-batched pandas UDF over a
    broadcast bitmap (vectorized: the batch's k positions form one
    matrix, one gather, one all-reduce).  NULL text flags False."""
    import numpy as np

    bits = np.frombuffer(bitmap, dtype=np.uint8)
    bc = df.sparkSession.sparkContext.broadcast(bits)

    @F.pandas_udf("boolean")
    def _probe(pos):  # pd.Series of length-k lists
        import numpy as np
        import pandas as pd

        b = bc.value
        vals = pos.to_list()
        ok = [v is not None and len(v) > 0 for v in vals]
        res = np.zeros(len(vals), dtype=bool)
        if any(ok):
            m = np.asarray([v for v, o in zip(vals, ok) if o], dtype=np.int64)
            hit = ((b[m >> 3] & (1 << (m & 7)).astype(np.uint8)) != 0).all(axis=1)
            res[np.nonzero(ok)[0]] = hit
        return pd.Series(res)

    return df.withColumn(
        out_col, _probe(bloom_positions(F.col(text_col), n_bits, n_hashes, salt))
    )
