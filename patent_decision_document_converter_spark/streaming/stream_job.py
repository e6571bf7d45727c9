"""Structured Streaming surface of the engine.

Three streaming shapes a continuously-ingesting extraction corpus needs:

* ``convert_stream`` — the conversion pipeline itself as a streaming
  query: ``readStream`` over arriving document files → the SAME fused
  mapInPandas stage the batch job uses (stateless per row, so it is
  trivially streamable) → parquet sink with checkpointing.  Batch and
  stream share one code path; the driver restarts resume from the sink
  checkpoint (exactly-once file sink).
* ``events_hourly_stream`` — watermarked tumbling-window aggregation
  (the streaming twin of the ``events_hourly`` contract query): late
  events beyond the watermark are dropped, windows finalize in append
  mode.
* ``sessionize_stream`` — custom stateful operator via
  ``applyInPandasWithState``: per-user session counting with a 30-min
  inactivity gap, state = (last_ts_us, n_sessions, n_events), processing
  side is Arrow-batched pandas (no per-row Python against the stream).

All entry points accept any streaming DataFrame source; helpers below
bind them to parquet directories for tests/local runs with the
``availableNow`` trigger (process-everything-then-stop — the batch-parity
mode).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..plans.job import convert_documents
from ..sources.documents import DOCUMENTS_SCHEMA

SESSION_GAP_US = 1800 * 1_000_000


def read_documents_stream(spark: SparkSession, input_path: str, max_files: int = 8) -> DataFrame:
    """File-arrival stream over a documents directory (schema fixed —
    streaming sources require it).  ``maxFilesPerTrigger`` bounds
    micro-batch size the way Arrow batch caps bound memory."""
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
    )


def convert_stream(docs: DataFrame, mode: str = "officeAction") -> DataFrame:
    """The conversion pipeline on a streaming DataFrame — identical
    mapInPandas stage as the batch job (stateless ⇒ streamable as-is)."""
    return convert_documents(docs, mode=mode)


def start_convert_sink(
    out: DataFrame, output_path: str, checkpoint_path: str, available_now: bool = True
):
    """Checkpointed exactly-once parquet sink for the converted stream."""
    w = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def extract_stream(media: DataFrame, permissive_pdf: bool = True) -> DataFrame:
    """Format-routed main-content extraction on a streaming media frame
    — the extraction tier's streaming twin.  Every leg of
    :func:`..operators.extract.extract_main_content` is stateless pure
    projection/mapInPandas since the r4 zero-shuffle HTML rewrite, so
    the SAME operator runs on a stream unchanged: new media files
    arriving in a watched directory are extracted incrementally with
    exactly-once parquet sink semantics (checkpointed offsets).  Batch
    parity is pinned by tests/test_streaming.py."""
    from ..operators.extract import extract_main_content

    return extract_main_content(media, permissive_pdf=permissive_pdf)


def extract_convert_stream(
    docs: DataFrame,
    media: DataFrame,
    mode: str = "officeAction",
    permissive_pdf: bool = True,
    pre_extracted: bool = False,
) -> DataFrame:
    """Streaming twin of the FULL extraction job (:mod:`..plans.
    extract_job`): dispatcher → ``enrich_media_spans`` → conversion on an
    arriving-documents stream against the static media sidecar.

    ``docs`` is a streaming frame (doc_id, spans); ``media`` is the
    STATIC sidecar (doc_id, media_ref, format, payload).  The call
    reuses :func:`..plans.extract_job.extract_and_enrich` verbatim, so
    batch/stream parity is by construction: the extraction dispatcher
    and the per-doc map aggregation both live on the static side of a
    stream-static LEFT join — legal without watermarks because only the
    stream side is unbounded — and the splice + conversion stages are
    stateless per row.  End-to-end exactly-once comes from the
    checkpointed file sink (:func:`start_convert_sink`).

    Scale note: Structured Streaming re-evaluates the static subplan
    every micro-batch, i.e. the media extraction re-runs per trigger.
    Right for a small/slowly-changing sidecar; for a 100 TB media table
    pre-extract to a table once (`extract_stream` is the incremental
    producer) and pass THAT as ``media`` with ``pre_extracted=True``.
    A stream-stream join is deliberately not used: enrichment is keyed
    by identity (doc_id, media_ref), not event time, and the sidecar
    carries no timestamp to watermark on.
    """
    if pre_extracted:
        from ..operators.pdf import enrich_media_spans

        enriched = enrich_media_spans(
            docs.select("doc_id", "spans"),
            media.select("doc_id", "media_ref", "text"),
        )
    else:
        from ..plans.extract_job import extract_and_enrich

        enriched = extract_and_enrich(docs, media, permissive_pdf=permissive_pdf)
    return convert_documents(enriched, mode=mode)


def events_hourly_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window count/sum per event type (append-mode
    finalizing windows; late data beyond the watermark dropped)."""
    ts = F.col("ts").cast("timestamp")
    return (
        events.withColumn("ts", ts)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_value_milli"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
            "n_events",
            "sum_value_milli",
        )
    )


_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)

_SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Gap-based session counter.  State carries (last_ts_us, n_sessions,
    n_events) across micro-batches; within a batch ALL of the group's
    Arrow chunks are concatenated and sorted once by (ts, event_id) —
    applyInPandasWithState gives no cross-chunk ordering guarantee, so a
    per-chunk sort would fold a >1-chunk group (>256 events with our
    Arrow batch size) in a different total order than the batch
    sessionize query."""
    if state.exists:
        last_ts, n_sessions, n_events = state.get
    else:
        last_ts, n_sessions, n_events = None, 0, 0
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            ts_us = int(ts.value // 1000)  # pandas ns -> us
            if last_ts is None or ts_us - last_ts > SESSION_GAP_US:
                n_sessions += 1
            last_ts = ts_us
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [n_sessions], "n_events": [n_events]}
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: running per-user session/event
    totals via applyInPandasWithState (update mode)."""
    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    docs: DataFrame,
    text_expr=None,
    event_time_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first-seen document per content
    hash across micro-batches.

    Without ``event_time_col``: built-in ``dropDuplicates`` state store —
    state grows with the distinct-hash count (fine for bounded backfills).
    With ``event_time_col``: ``withWatermark`` +
    ``dropDuplicatesWithinWatermark`` — the production form for an
    UNBOUNDED stream: state for a hash is dropped once the watermark
    passes its event time + delay, so executor state is bounded by the
    duplicate-arrival horizon instead of the corpus (dupes arriving
    within ``watermark_delay`` of each other are still caught, which is
    the realistic ingest-crawl duplication pattern).  Content key = md5
    of normalized text, same derivation as the batch
    ``operators.dedup.exact_dedup``."""
    if text_expr is None:
        text_expr = _spans_text_expr()
    hashed = docs.withColumn(
        "content_hash",
        F.conv(F.substring(F.md5(F.lower(F.trim(F.regexp_replace(text_expr, r"\s+", " ")))), 1, 15), 16, 10).cast("long"),
    )
    if event_time_col is not None:
        return hashed.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["content_hash"]
        )
    return hashed.dropDuplicates(["content_hash"])


_DEFAULT_TEXT_EXPR = None  # sentinel resolved inside dedup_stream/_minhash


def _spans_text_expr():
    return F.concat_ws(
        "\n",
        F.transform(
            F.filter(
                F.expr("array_sort(spans, (l, r) -> l.offset - r.offset)"),
                lambda s: s["kind"] == F.lit("text"),
            ),
            lambda s: s["text"],
        ),
    )


_BAND_STATE_SCHEMA = StructType([StructField("canonical_id", StringType())])

_BAND_FLAG_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("dup_of", StringType()),
    ]
)


def _band_dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-(band_id, band_hash) bucket state = the first-seen doc_id.
    Every later doc landing in the bucket is flagged (doc_id, dup_of).
    Within a micro-batch, arrival order is canonicalized by sorting the
    group's rows on doc_id, so results are batch-deterministic."""
    canon = state.get[0] if state.exists else None
    out_ids: list[str] = []
    out_canon: list[str] = []
    chunks = [p for p in pdfs if len(p)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        for d in sorted(pdf["doc_id"].astype(str)):
            if canon is None:
                canon = d
            elif d != canon:
                out_ids.append(d)
                out_canon.append(canon)
    state.update((canon,))
    yield pd.DataFrame({"doc_id": out_ids, "dup_of": out_canon})


def dedup_stream_minhash(
    docs: DataFrame,
    text_expr=None,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    unit: str = "word",
) -> DataFrame:
    """Streaming NEAR-dedup: MinHash-LSH band state across micro-batches.

    Plan: the stateless signature stage (the batch pipeline's exact
    Arrow-batched hashlib twin — byte-identical signatures) → per-row
    banding (no shuffle) → ``applyInPandasWithState`` keyed on
    (band_id, band_hash): the state store holds the first-seen doc per
    band bucket — the streaming equivalent of the batch band-table
    self-join, with the "earlier side" materialized as state instead of
    re-scanned.  Emits (doc_id, dup_of) for every band collision with an
    earlier doc; a doc may be flagged once per colliding band, so
    consumers ``dropDuplicates(["doc_id"])`` per micro-batch (foreachBatch)
    before acting — same post-filter the batch candidates get via
    ``.distinct()``.

    State is ONE short row per distinct band value — bounded by corpus
    band cardinality, not stream length.  A production deployment on an
    unbounded stream would additionally evict idle band buckets with a
    state timeout (the same horizon trade dropDuplicatesWithinWatermark
    makes for exact dedup); NOTE: wiring GroupStateTimeout.
    ProcessingTimeTimeout here deadlocks this pyspark build's
    HDFSBackedStateStore commit under availableNow (tasks block in
    ChecksumCheckpointFileManager.awaitResult — reproduced and reverted),
    so the TTL stays documented-not-wired until the upstream fix.
    Batch-parity: a near-dup arriving in a later micro-batch is flagged
    iff the batch ``minhash_lsh_candidates`` on the union pairs them —
    pinned in tests/test_streaming.py.
    """
    from ..operators.dedup import _minhash_signatures_pandas, banded_signatures

    if text_expr is None:
        text_expr = _spans_text_expr()
    texted = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), text_expr.alias("text")
    )
    sigs = _minhash_signatures_pandas(
        texted, "doc_id", "text", num_hashes, shingle_k, unit
    )
    banded = banded_signatures(sigs, "doc_id", num_hashes, bands)
    return banded.groupBy("band_id", "band_hash").applyInPandasWithState(
        _band_dedup_fn,
        outputStructType=_BAND_FLAG_SCHEMA,
        stateStructType=_BAND_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(out: DataFrame, query_name: str, output_mode: str = "update"):
    """Test helper: drain a stream into an in-memory table with
    availableNow and block until done."""
    q = (
        out.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _curate_gated_stream(
    docs: DataFrame,
    mode: str,
    min_chars: int,
    min_distinct_permille: int,
) -> DataFrame:
    """The STATELESS prefix of streaming curation (shared by
    :func:`curate_stream` and :func:`start_curate_near_sink`): convert
    (same fused stage as batch), quality-gate on the extracted text —
    per-row expressions, trivially streamable."""
    from ..operators.textstats import ws_tokens
    from ..plans.curate import extract_text

    converted = convert_documents(docs, mode=mode)
    clean = converted.filter(F.size("findings") == 0)
    text = extract_text(clean).withColumn(
        "_toks", ws_tokens("text")
    )
    return text.filter(
        (F.length("text") >= min_chars)
        & (
            F.lit(1000) * F.size(F.array_distinct("_toks"))
            >= F.lit(min_distinct_permille) * F.size("_toks")
        )
    ).drop("_toks")


def curate_stream(
    docs: DataFrame,
    mode: str = "officeAction",
    min_chars: int = 20,
    min_distinct_permille: int = 200,
) -> DataFrame:
    """Streaming curation: the batch curate pipeline's stateless+dedup
    core on a document stream — convert (same fused stage), quality-gate
    on the extracted text (per-row expressions: trivially streamable),
    exact-dedup across micro-batches (state store).  For the
    NEAR-dedup-inclusive streaming pipeline use
    :func:`start_curate_near_sink` (foreachBatch incremental state —
    cross-batch LSH + Jaccard verify cannot ride a single in-query
    stateful operator)."""
    gated = _curate_gated_stream(docs, mode, min_chars, min_distinct_permille)
    return dedup_stream(gated, text_expr=F.col("text"))


def start_curate_near_sink(
    docs: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    mode: str = "officeAction",
    min_chars: int = 20,
    min_distinct_permille: int = 200,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    unit: str = "char",
    jaccard_threshold_tenths: int = 8,
    available_now: bool = True,
):
    """Streaming curation WITH cross-batch near-dedup — the full batch
    ``curate_corpus`` dedup semantics (exact hash + LSH candidates +
    integer-Jaccard verify + transitive clustering) on an unbounded
    document stream.

    Why ``foreachBatch`` and not another in-query stateful operator:
    dropping a stream row because ANY of its LSH bands collides with
    earlier state requires anti-joining the stream against the output of
    its own stateful operator — unsupported in one streaming query.  The
    incremental-batch form is the standard production shape: per
    micro-batch, join the new docs against accumulated state tables,
    drop matches, append the new docs' state.  State (all parquet under
    ``state_dir``):

    * ``hashes/``  (content_hash)              — exact-dedup horizon
    * ``bands/``   (band_id, band_hash, doc_id) — LSH candidate index
    * ``texts/``   (doc_id, text)               — Jaccard-verify corpus

    Semantics per batch (mirrors batch curate_corpus stage-for-stage):
    within-batch exact canonical (min doc_id per hash) → drop hashes
    already in state → within-batch near-dedup via the BATCH operators
    (minhash → banded candidates → Jaccard verify → connected
    components, keep cluster-min) → cross-batch: band-collide against
    state, Jaccard-verify the collided pairs against the STATE doc's
    text (including previously DROPPED docs — that is what makes
    transitive chains A~B, B~C drop C even when A!~C, exactly like the
    batch connected components), drop verified dups → append survivors
    to ``out_dir`` and ALL exact-canonical docs' bands+texts to state.

    First-seen-wins replaces global cluster-min for CROSS-batch ties —
    the one inherent stream/batch divergence (a stream cannot un-keep a
    doc it already emitted).

    Scale: every state join is keyed on (band_id, band_hash) or
    content_hash — the same bucketed equi-join shape as batch LSH; the
    Jaccard verify runs only on collided candidate pairs.  State grows
    with the corpus (bands+texts): at 10^12 docs, partition the state
    tables by band_id / hash prefix and compact periodically; an
    eviction horizon (drop state older than the duplicate-arrival
    window) bounds it the same way dropDuplicatesWithinWatermark bounds
    exact state."""
    import os

    from ..operators import dedup as bdedup

    hash_dir = os.path.join(state_dir, "hashes")
    band_dir = os.path.join(state_dir, "bands")
    text_dir = os.path.join(state_dir, "texts")

    gated = _curate_gated_stream(docs, mode, min_chars, min_distinct_permille)

    def _read_state(spark, path: str, schema: str) -> DataFrame:
        try:
            return spark.read.parquet(path)
        except Exception:
            return spark.createDataFrame([], schema)

    def process_batch(bdf: DataFrame, epoch_id: int) -> None:
        spark = bdf.sparkSession
        if not bdf.head(1):
            return
        hashed = bdf.withColumn(
            "content_hash",
            F.conv(
                F.substring(
                    F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))),
                    1, 15,
                ), 16, 10,
            ).cast("long"),
        )
        # within-batch exact canonical, then drop already-seen hashes.
        # localCheckpoint (eager), NOT persist: appending to a state path
        # triggers Spark's refresh-by-path recache, which re-resolves any
        # cached plan reading that path against the NEW file list — a
        # persisted `fresh` would silently recompute as empty once its
        # own hashes were appended (its lineage anti-joins hash_dir).
        # Checkpointing truncates the lineage, so no later state append
        # can re-evaluate it.
        canon = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
        firsts = hashed.join(canon, ["content_hash", "doc_id"], "left_semi")
        seen_hashes = _read_state(spark, hash_dir, "content_hash long")
        fresh = firsts.join(seen_hashes, "content_hash", "left_anti").localCheckpoint()

        # within-batch near-dedup: the BATCH machinery verbatim
        sigs = bdedup.minhash_signatures(
            fresh, num_hashes=num_hashes, shingle_k=shingle_k, unit=unit
        )
        banded = bdedup.banded_signatures(sigs, num_hashes=num_hashes, bands=bands).persist()
        wb_cands = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_hash") == F.col("b.band_hash"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
            .distinct()
        )
        wb_near = bdedup.ngram_jaccard_pairs(
            fresh, shingle_k=shingle_k, unit=unit,
            threshold_tenths=jaccard_threshold_tenths, candidates=wb_cands,
        )
        wb_clusters = bdedup.connected_components(wb_near)
        wb_drops = wb_clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")

        # cross-batch: band collisions vs state, Jaccard-verified against
        # the state doc's text (kept OR dropped — transitive chains)
        state_bands = _read_state(spark, band_dir, "band_id int, band_hash long, doc_id string")
        # candidate pairs are state-doc × fresh-doc; ngram_jaccard_pairs
        # emits pairs with id_a < id_b, so canonicalize the candidate
        # orientation the same way and recover "which side is new" by
        # membership in the fresh batch afterwards
        xb_cands = (
            banded.join(
                state_bands.withColumnRenamed("doc_id", "_state_id"),
                ["band_id", "band_hash"],
            )
            .select(
                F.least("_state_id", "doc_id").alias("id_a"),
                F.greatest("_state_id", "doc_id").alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        state_texts = _read_state(spark, text_dir, "doc_id string, text string")
        # shingle ONLY the docs that band-collided (semi-join below the
        # union): per-batch verify cost tracks collision volume, not the
        # accumulated state size
        cand_ids = (
            xb_cands.select(F.col("id_a").alias("doc_id"))
            .union(xb_cands.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        both = state_texts.union(fresh.select("doc_id", "text")).join(
            cand_ids, "doc_id", "left_semi"
        )
        xb_near = bdedup.ngram_jaccard_pairs(
            both, shingle_k=shingle_k, unit=unit,
            threshold_tenths=jaccard_threshold_tenths, candidates=xb_cands,
        )
        xb_drops = (
            xb_near.select(F.explode(F.array("id_a", "id_b")).alias("doc_id"))
            .join(fresh.select("doc_id"), "doc_id", "left_semi")
        )

        drops = wb_drops.union(xb_drops).distinct()
        kept = fresh.join(drops, "doc_id", "left_anti")
        kept.write.mode("append").parquet(out_dir)

        # register ALL exact-canonical docs (kept + near-dropped): future
        # exact replicas die on the hash, future near-dups of a dropped
        # doc die on its bands — matching batch transitive clustering.
        # Band/text appends run BEFORE the hash append: `banded` derives
        # from the checkpointed `fresh`, but defense-in-depth keeps every
        # append to a path AFTER all reads of that path have been fully
        # consumed in this batch.
        banded.select("band_id", "band_hash", "doc_id").write.mode("append").parquet(band_dir)
        fresh.select("doc_id", "text").write.mode("append").parquet(text_dir)
        fresh.select("content_hash").distinct().write.mode("append").parquet(hash_dir)
        banded.unpersist()

    w = (
        gated.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        w = w.trigger(availableNow=True)
    return w.start()
