"""Embedding similarity search (ANN) over an ``array<float>`` column.

Training-data pipelines need near-neighbor search over document embeddings
(near-dup removal, retrieval eval, cluster balancing).  Three tiers:

* ``cosine_topk``        — brute-force exact top-k for one query vector.
  The cosine is a pure higher-order-function expression
  (``zip_with`` product + left-to-right ``aggregate`` sum), whole-stage
  codegen, no Python; the top-k is a global sort LIMIT k which Spark
  executes as per-partition TakeOrdered + driver merge of k rows — the
  correct distributed plan (no full sort materialized).
* ``ivf_topk``           — the scale path: assign every vector to its
  nearest centroid once (build side), then probe only ``n_probe``
  centroid cells for a query.  Centroids here are per-``label`` means
  (deterministic, oracle-checkable); on a real cluster you'd k-means with
  ``pyspark.ml.clustering.KMeans`` and keep the same probe/search shape.
* ``cosine_pairs``       — all-pairs above a threshold, for
  embedding-based near-dup detection; at scale, restrict with a bucket
  column (IVF cell / LSH band) so the self-join is per-bucket.

Sum order inside ``aggregate`` is left-to-right and element order is the
array order, so double-precision results are bit-reproducible — this is
what lets the DuckDB oracles in ``plans/contract.py`` match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cachereg import track


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential (left-to-right) double-precision dot product."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    # try_divide: zero-norm vectors yield NULL similarity (sorted last /
    # filtered by thresholds) instead of an ANSI DIVIDE_BY_ZERO error
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to ``query_vec``.

    Returns (rank, vec_id) with deterministic tie-break on id.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("sim")
    )
    ranked = scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
    # row_number over the already-limited k rows — driver-side tiny window
    from pyspark.sql import Window

    # Audited global window: the frame is the already-limited k rows, so a
    # single partition IS the design.  Spark 4's EliminateWindowPartitions
    # folds any literal/foldable partition key right back out, so the
    # WindowExec "No Partition Defined" warning cannot be silenced at the
    # plan level; the harness sessions suppress that one logger instead
    # (plans.session.silence_windowexec_warning).
    w = Window.orderBy(F.desc("sim"), F.asc(id_col))
    return ranked.select(
        F.row_number().over(w).alias("rank"), F.col(id_col)
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean vector per label (the IVF cell centroids).

    posexplode → groupBy(label, pos) avg → re-assemble ordered — a classic
    two-shuffle build step that runs once per corpus snapshot and is tiny
    (|labels| × dim rows).
    """
    exploded = df.select(
        F.col(label_col), F.posexplode(_as_double(F.col(vec_col))).alias("pos", "v")
    )
    per_dim = exploded.groupBy(label_col, "pos").agg(F.avg("v").alias("m"))
    return (
        per_dim.groupBy(label_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: probe the ``n_probe`` centroid cells nearest the
    query, brute-force only inside those cells.

    The centroid table is tiny → broadcast join against the (pre-assigned)
    vector table; the probed fraction bounds compute at scale.  Cells here
    are the ``label`` partitions (deterministic stand-in for k-means cells;
    same plan shape either way).
    """
    cents = label_centroids(df, label_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_labels = (
        cents.select(label_col, cosine(F.col("centroid"), q).alias("csim"))
        .orderBy(F.desc("csim"), F.asc(label_col))
        .limit(n_probe)
        .select(label_col)
    )
    candidates = df.join(F.broadcast(probe_labels), label_col, "inner")
    scored = candidates.select(F.col(id_col), cosine(F.col(vec_col), q).alias("sim"))
    from pyspark.sql import Window

    ranked = scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
    # Audited global window: the frame is the already-limited k rows, so a
    # single partition IS the design.  Spark 4's EliminateWindowPartitions
    # folds any literal/foldable partition key right back out, so the
    # WindowExec "No Partition Defined" warning cannot be silenced at the
    # plan level; the harness sessions suppress that one logger instead
    # (plans.session.silence_windowexec_warning).
    w = Window.orderBy(F.desc("sim"), F.asc(id_col))
    return ranked.select(F.row_number().over(w).alias("rank"), F.col(id_col))


def _rp_plane(p: int, dim: int, tag: str = "rp") -> list[float]:
    """Deterministic pseudo-random hyperplane: component j =
    (md5_60bit(f"{tag}:{p}:{j}") % 2001 - 1000) / 1000.0 ∈ [-1, 1].
    md5-derived so the SQL oracle reproduces the exact same doubles."""
    import hashlib

    return [
        ((int(hashlib.md5(f"{tag}:{p}:{j}".encode()).hexdigest()[:15], 16) % 2001) - 1000)
        / 1000.0
        for j in range(dim)
    ]


def rp_lsh_buckets(
    df: DataFrame,
    dim: int,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection LSH: bucket = bit b set iff
    dot(v, plane_b) > 0.  The scale path for cosine similarity — vectors
    in the same bucket are likely neighbors (collision probability
    1 - angle/π per plane); per-row projection only, no shuffle."""
    bucket = F.lit(0)
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _rp_plane(p, dim)])
        bucket = bucket + F.when(dot(F.col(vec_col), plane) > 0, F.lit(1 << p)).otherwise(0)
    return df.select(F.col(id_col), F.col(vec_col), bucket.cast("long").alias("bucket"))


def rp_bucket_of(vec: list[float], n_planes: int = 4) -> int:
    """Driver-side bucket of a query vector (same doubles, same
    left-to-right sum as the engine computation)."""
    b = 0
    for p in range(n_planes):
        plane = _rp_plane(p, len(vec))
        acc = 0.0
        for x, y in zip([float(v) for v in vec], plane):
            acc = acc + x * y
        if acc > 0:
            b |= 1 << p
    return b


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed ANN: brute-force only the query's bucket.

    Recall is tunable via n_planes (fewer planes → bigger buckets) or
    multi-probe (neighboring buckets by hamming) — this is the
    single-probe baseline; the IVF variant covers the probed-cells shape.
    """
    buckets = rp_lsh_buckets(df, len(query_vec), n_planes, id_col, vec_col)
    qb = rp_bucket_of(query_vec, n_planes)
    cands = buckets.filter(F.col("bucket") == qb)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cands.select(F.col(id_col), cosine(F.col(vec_col), q).alias("sim"))
    from pyspark.sql import Window

    ranked = scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
    # Audited global window: the frame is the already-limited k rows, so a
    # single partition IS the design.  Spark 4's EliminateWindowPartitions
    # folds any literal/foldable partition key right back out, so the
    # WindowExec "No Partition Defined" warning cannot be silenced at the
    # plan level; the harness sessions suppress that one logger instead
    # (plans.session.silence_windowexec_warning).
    w = Window.orderBy(F.desc("sim"), F.asc(id_col))
    return ranked.select(F.row_number().over(w).alias("rank"), F.col(id_col))


def ann_topk_lsh_multiprobe(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe LSH ANN: brute-force the query's bucket AND every
    bucket within ``probe_hamming`` sign-flips of it.

    A vector near a hyperplane lands on either side with ~equal
    probability, so single-probe recall decays with n_planes; probing the
    hamming-1 neighborhood recovers most of it at (n_planes+1)× the
    candidate volume — still a vanishing fraction of the corpus (probing
    5 of 2^n_planes buckets).  The probe set is computed driver-side
    (tiny) and pushed into the scan as an IN filter — partition-prunable
    when the vector table is written bucketed by ``bucket``.
    """
    from itertools import combinations

    buckets = rp_lsh_buckets(df, len(query_vec), n_planes, id_col, vec_col)
    qb = rp_bucket_of(query_vec, n_planes)
    probes = {qb}
    if probe_hamming >= 1:
        probes |= {qb ^ (1 << p) for p in range(n_planes)}
    if probe_hamming >= 2:
        probes |= {qb ^ (1 << a) ^ (1 << b) for a, b in combinations(range(n_planes), 2)}
    cands = buckets.filter(F.col("bucket").isin(sorted(probes)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cands.select(F.col(id_col), cosine(F.col(vec_col), q).alias("sim"))
    from pyspark.sql import Window

    ranked = scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
    # Audited global window: the frame is the already-limited k rows, so a
    # single partition IS the design.  Spark 4's EliminateWindowPartitions
    # folds any literal/foldable partition key right back out, so the
    # WindowExec "No Partition Defined" warning cannot be silenced at the
    # plan level; the harness sessions suppress that one logger instead
    # (plans.session.silence_windowexec_warning).
    w = Window.orderBy(F.desc("sim"), F.asc(id_col))
    return ranked.select(F.row_number().over(w).alias("rank"), F.col(id_col))


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str | None = None,
) -> DataFrame:
    """All (id_a < id_b) pairs with cosine >= threshold.

    With ``bucket_col`` the self-join is keyed on the bucket (IVF cell /
    LSH band) — the only form that survives 100 TB.  Without it this is an
    O(n²) verify pass for small candidate sets / oracles.

    Norms are computed once per row before the join (no re-computation on
    the quadratic side).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        l2_norm(F.col(vec_col)).alias("nrm"),
        *([F.col(bucket_col).alias("bk")] if bucket_col else []),
    )
    base = track(base)  # norms computed once; released via cachereg.release_cached()
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if bucket_col:
        cond = cond & (F.col("a.bk") == F.col("b.bk"))
    sim = F.try_divide(
        F.aggregate(
            F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        F.col("a.nrm") * F.col("b.nrm"),
    )
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# IVF with learned cells: deterministic integer-quantized k-means
# ---------------------------------------------------------------------------


def _quantize(vec_col: Column, scale: int = 1000) -> Column:
    """array<float> -> array<bigint> at fixed point.  All subsequent
    k-means arithmetic is integer, hence associative — results are
    bit-identical regardless of partitioning / reduction order, which is
    what lets a SQL oracle replay the exact same training run."""
    return F.transform(vec_col, lambda x: F.round(x.cast("double") * scale).cast("long"))


def _sq_dist_to(lit_centroid: list[int]) -> "callable":
    c = F.array(*[F.lit(int(x)) for x in lit_centroid])

    def d(qv: Column) -> Column:
        return F.aggregate(
            F.zip_with(qv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return d


def _assign_cells_join(
    frame: DataFrame, cents: list[list[int]], id_col: str
) -> DataFrame:
    """Distributed-centroid assignment: centroids as a (cid, cv)
    DataFrame, broadcast cross-join against the vectors, per-vector
    argmin via min(struct(dist, cid)) — ties to the lower cell id,
    IDENTICAL row semantics to the unrolled-expression path.

    This is the k≫10^3 shape: the per-row expression tree stays O(1) in
    k (the unrolled form embeds k struct literals per row and its plan
    does not survive k~10^6 cells); cost is one broadcast of k×dim ints
    plus a groupBy on the id — the same plan pyspark.ml's KMeansModel
    transform uses.  The groupBy keys on ``id_col`` alone (input_hint:
    ids are unique), so the argmin is a map-side-combinable aggregation.
    """
    spark = frame.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], schema="cid int, cv array<bigint>"
    )
    d = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    best = (
        frame.select(F.col(id_col), "qv")
        .crossJoin(F.broadcast(cdf))
        .groupBy(id_col)
        .agg(F.min(F.struct(d.alias("d"), F.col("cid").alias("cid")))["cid"].cast("int").alias("cell"))
    )
    return frame.join(best, id_col)


def kmeans_fit_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    train_permille: int = 1000,
    assign_impl: str = "expr",
) -> tuple[DataFrame, list[list[int]]]:
    """Lloyd's k-means over integer-quantized vectors; returns
    (df + ``cell`` column, final centroids as integer lists).

    Deterministic BY CONSTRUCTION — the properties a k-means needs to be
    oracle-checkable and cluster-reproducible:

    * init: centroids = the quantized vectors of the ``k`` smallest ids
      present in the table (``orderBy(id).limit(k)`` — any id space, not
      just dense-from-0; no RNG);
    * assignment: integer argmin of squared L2, ties to the lower cell id
      (via ``array_min`` over (dist, cid) structs — struct ordering does
      the tie-break);
    * update: element-wise ``floor(sum/count)`` — integer sums are
      order-independent, and a single double division of integers < 2^53
      is exact, so no reduction-order drift ever;
    * empty cells keep their previous centroid.

    Centroids live on the driver between iterations (k × dim ints — model
    parameters, not data).  ``train_permille`` < 1000 trains the update
    steps on a DETERMINISTIC hash subsample (corpus.sample_key — same
    doctrine as stratified_sample: membership is a pure row function, so
    the trained model is reproducible under any partitioning) while the
    final assignment still covers every row — the standard
    train-on-a-sample / assign-everything split that makes k-means
    tractable at 10^9+ vectors.

    ``assign_impl`` picks the assignment plan (both bit-identical,
    proven row-equal in tests/test_training_ops.py):

    * ``'expr'`` (default) — centroids unrolled into one array_min
      expression per row: zero extra shuffle, whole-stage friendly,
      right for k up to ~10^3;
    * ``'join'`` — centroids as a broadcast DataFrame + per-vector
      argmin aggregation (:func:`_assign_cells_join`): the k≫10^3
      shape (a 10^6-cell IVF build), where unrolling k struct literals
      per row would blow the expression tree.  Costs one groupBy on the
      id per assignment pass.
    """
    from .corpus import sample_key

    if assign_impl not in ("expr", "join"):
        raise ValueError("assign_impl must be 'expr' or 'join'")

    # the training loop scans q once per iteration (assign + update) —
    # cache it so quantization/IO runs once (released via cachereg)
    q = track(df.select(F.col(id_col), _quantize(F.col(vec_col), scale).alias("qv")))
    q_train = (
        q.filter(sample_key(F.col(id_col), "kmeans") < F.lit(train_permille))
        if train_permille < 1000
        else q
    )
    cents = [
        [int(x) for x in r["qv"]]
        for r in q.orderBy(id_col).limit(k).collect()
    ]
    if len(cents) < k:
        raise ValueError(f"need at least k={k} rows in {id_col}")

    def assign(frame: DataFrame) -> DataFrame:
        if assign_impl == "join":
            return _assign_cells_join(frame, cents, id_col)
        pairs = F.array(
            *[
                F.struct(_sq_dist_to(c)(F.col("qv")).alias("d"), F.lit(i).alias("cid"))
                for i, c in enumerate(cents)
            ]
        )
        return frame.withColumn("cell", F.array_min(pairs)["cid"].cast("int"))

    for _ in range(iters):
        assigned = assign(q_train)
        # element-wise integer mean per cell: posexplode -> (cell, pos)
        # sum/count.  Scale note: the shuffle is BOUNDED by the map-side
        # partial aggregation — each input partition emits at most
        # k x dim partially-summed cells, never the n x dim exploded
        # rows — so this shape survives 10^9 vectors.  The r5 A/B
        # against a single wide groupBy(cell).agg(sum(qv[0])..sum(qv[d]))
        # measured the wide form ~1.5x SLOWER at bench scale (a fresh
        # 64-column codegen compile per iteration, since the assign
        # expression inlines the new centroids as literals each round)
        # for no shuffle-volume win; posexplode's simple stable plan is
        # the keeper (2.6 s vs 4.0 s sf0.01 min-of-3, same session).
        per_dim = (
            assigned.select("cell", F.posexplode("qv").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.floor(F.sum("x") / F.count("*")).cast("long").alias("m"))
        )
        new_rows = (
            per_dim.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("c")
            )
            .collect()
        )
        new_cents = list(cents)  # empty cells keep previous centroid
        for r in new_rows:
            new_cents[r["cell"]] = [int(x) for x in r["c"]]
        cents = new_cents

    out = assign(df.select("*", _quantize(F.col(vec_col), scale).alias("qv"))).drop("qv")
    return out, cents


def ann_topk_ivf_kmeans(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1000,
    assign_impl: str = "expr",
) -> DataFrame:
    """IVF ANN over LEARNED (k-means) cells: train deterministic integer
    k-means, probe the ``n_probe`` cells whose centroids are nearest the
    query (integer L2, ties to lower cell id), brute-force cosine only
    inside those cells.  Same probe/search shape as :func:`ivf_topk` but
    with data-driven cells instead of the label stand-in.
    ``assign_impl='join'`` switches the cell assignment to the
    distributed-centroid broadcast-join plan (see kmeans_fit_assign)."""
    import math

    assigned, cents = kmeans_fit_assign(
        df, n_cells, iters, id_col, vec_col, scale, assign_impl=assign_impl
    )
    # round half away from zero — Spark's round()/DuckDB's round(), NOT
    # Python round()'s banker's rounding
    qq = [
        int(math.floor(float(x) * scale + 0.5))
        if x >= 0
        else int(math.ceil(float(x) * scale - 0.5))
        for x in query_vec
    ]
    dists = sorted(
        (sum((a - b) * (a - b) for a, b in zip(qq, c)), cid) for cid, c in enumerate(cents)
    )
    probe = [cid for _, cid in dists[:n_probe]]
    cands = assigned.filter(F.col("cell").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cands.select(F.col(id_col), cosine(F.col(vec_col), q).alias("sim"))
    from pyspark.sql import Window

    ranked = scored.orderBy(F.desc("sim"), F.asc(id_col)).limit(k)
    # Audited global window: the frame is the already-limited k rows, so a
    # single partition IS the design.  Spark 4's EliminateWindowPartitions
    # folds any literal/foldable partition key right back out, so the
    # WindowExec "No Partition Defined" warning cannot be silenced at the
    # plan level; the harness sessions suppress that one logger instead
    # (plans.session.silence_windowexec_warning).
    w = Window.orderBy(F.desc("sim"), F.asc(id_col))
    return ranked.select(F.row_number().over(w).alias("rank"), F.col(id_col))
