"""Structured Streaming tests: batch/stream parity of the conversion
pipeline, watermarked windowed aggregation, custom stateful sessionize."""

import os

import pytest
from pyspark.sql import functions as F

from patent_decision_document_converter_spark.plans.job import convert_documents, get_spark
from patent_decision_document_converter_spark.sources.documents import create_documents_df
from patent_decision_document_converter_spark.sources.generator import make_documents_rows
from patent_decision_document_converter_spark.streaming import stream_job


@pytest.fixture(scope="module")
def spark():
    yield get_spark(app_name="pytest-streaming", master="local[4]", shuffle_partitions=4)


def test_convert_stream_matches_batch(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    inp = os.path.join(base, "in")
    outp = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")

    rows = make_documents_rows(40, seed=5, mega_frac=0.0)
    create_documents_df(spark, rows).repartition(4).write.parquet(inp)

    docs = stream_job.read_documents_stream(spark, inp, max_files=2)
    assert docs.isStreaming
    q = stream_job.start_convert_sink(
        stream_job.convert_stream(docs, "pct"), outp, ckpt
    )
    q.awaitTermination()

    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in spark.read.parquet(outp).collect()
    }
    want = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in convert_documents(create_documents_df(spark, rows), "pct").collect()
    }
    assert got == want  # exact batch/stream parity (same fused stage)

    # restart with no new files: checkpoint resumes, no duplicate output
    q2 = stream_job.start_convert_sink(
        stream_job.convert_stream(stream_job.read_documents_stream(spark, inp), "pct"),
        outp,
        ckpt,
    )
    q2.awaitTermination()
    assert spark.read.parquet(outp).count() == len(rows)


def test_extract_stream_matches_batch(spark, tmp_path_factory):
    """The extraction dispatcher is stateless end-to-end (zero-shuffle
    legs), so it streams unchanged: incremental extraction of a watched
    media directory equals the batch extractor row-for-row, and a
    checkpointed restart with no new files adds nothing."""
    from patent_decision_document_converter_spark.operators import pdf as pdfmod
    from patent_decision_document_converter_spark.operators.extract import (
        extract_main_content,
    )

    base = str(tmp_path_factory.mktemp("xstream"))
    inp, outp, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))

    good_pdf = pdfmod._encode_pdf([(72.0, 700.0, "pdf body")], compress=True)
    rows = [
        ("h1", "html:h1", "html",
         b'<div><a href="#">navnav</a></div><p>' + b"y" * 60 + b"</p>"),
        ("x1", "xml:x1", "xml", b"<d><![CDATA[raw <c>]]><t>tag</t></d>"),
        ("p1", "pdf:p1", "pdf", bytearray(good_pdf)),
        ("t1", "txt:t1", "txt", b" a\n b "),
        ("u1", "bin:u1", "mp4", b"\x00"),
    ]
    schema = "doc_id string, media_ref string, format string, payload binary"
    media = spark.createDataFrame(rows, schema)
    media.repartition(2).write.parquet(inp)

    stream = spark.readStream.schema(media.schema).option("maxFilesPerTrigger", 1).parquet(inp)
    q = stream_job.start_convert_sink(stream_job.extract_stream(stream), outp, ckpt)
    q.awaitTermination()

    got = {r["media_ref"]: r.asDict() for r in spark.read.parquet(outp).collect()}
    want = {r["media_ref"]: r.asDict() for r in extract_main_content(
        media, permissive_pdf=True).collect()}
    assert got == want

    q2 = stream_job.start_convert_sink(
        stream_job.extract_stream(
            spark.readStream.schema(media.schema).parquet(inp)
        ), outp, ckpt,
    )
    q2.awaitTermination()
    assert spark.read.parquet(outp).count() == len(rows)


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Streaming file sources need a directory — stage the events file."""
    import shutil

    d = str(tmp_path_factory.mktemp("events_src"))
    shutil.copy("/root/testdata/sf0.001/events.parquet", os.path.join(d, "part-0.parquet"))
    return d


def test_events_hourly_stream_matches_batch(spark, events_dir):
    src = "/root/testdata/sf0.001/events.parquet"
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = stream_job.events_hourly_stream(stream)
    stream_job.run_stream_to_memory(out, "hourly_test", output_mode="append")
    got = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_milli"])
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }

    ev = spark.read.parquet(src)
    want = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value_milli"])
        for r in ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts").cast("timestamp")), "yyyy-MM-dd HH:00:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 1000).cast("long")).alias("sum_value_milli"),
        )
        .collect()
    }
    # availableNow + watermark: all but the trailing (unfinalized) windows
    # must match the batch result exactly
    assert got
    for k, v in got.items():
        assert want[k] == v
    missing = set(want) - set(got)
    if missing:  # only the newest windows may still be open
        max_done = max(h for h, _ in got)
        assert all(h >= max_done for h, _ in missing)


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("dstream"))
    inp = os.path.join(base, "in")
    rows = make_documents_rows(20, seed=21, mega_frac=0.0)
    dupes = [{"doc_id": "dup-" + r["doc_id"], "spans": r["spans"]} for r in rows[:8]]
    create_documents_df(spark, rows + dupes).repartition(6).write.parquet(inp)

    stream = stream_job.read_documents_stream(spark, inp, max_files=2)
    out = stream_job.dedup_stream(stream)
    stream_job.run_stream_to_memory(out, "dedup_test", output_mode="append")
    got = spark.sql("SELECT doc_id, content_hash FROM dedup_test").collect()
    # exactly one survivor per distinct content hash, across micro-batches
    assert len(got) == len({r["content_hash"] for r in got})
    assert len(got) == 20  # 8 dupes dropped
    # batch twin agrees on the distinct content-hash set
    from patent_decision_document_converter_spark.operators import dedup as bdedup
    from patent_decision_document_converter_spark.sources.generator import doc_text_from_spans

    batch_df = spark.createDataFrame(
        [(r["doc_id"], doc_text_from_spans(r["spans"])) for r in rows + dupes],
        ["doc_id", "text"],
    )
    batch_hashes = {r["content_hash"] for r in bdedup.exact_dedup(batch_df).collect()}
    assert {r["content_hash"] for r in got} == batch_hashes


def test_sessionize_stream_matches_batch(spark, events_dir):
    src = "/root/testdata/sf0.001/events.parquet"
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    out = stream_job.sessionize_stream(stream)
    stream_job.run_stream_to_memory(out, "sess_test", output_mode="update")
    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in spark.sql(
            "SELECT user_id, last(n_sessions) AS n_sessions, last(n_events) AS n_events "
            "FROM sess_test GROUP BY user_id"
        ).collect()
    }

    from patent_decision_document_converter_spark.plans.contract import events_sessionize

    want = {
        r["user_id"]: (r["n_sessions"], r["n_events"])
        for r in events_sessionize(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == want


def test_sessionize_stream_multichunk_group(spark, tmp_path_factory):
    """A group larger than one Arrow chunk (ARROW_MAX_RECORDS=256) must
    fold in global (ts, event_id) order — applyInPandasWithState gives no
    cross-chunk ordering guarantee, so the UDF has to concatenate chunks
    before sorting."""
    import datetime as dt
    import random

    base = str(tmp_path_factory.mktemp("sess_big"))
    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    ts = t0
    for i in range(800):  # > 3 Arrow chunks for one user
        # ~1/40 events open a new session (gap > 30 min)
        gap = dt.timedelta(minutes=45 if rng.random() < 0.025 else 3)
        ts = ts + gap
        rows.append((i, ts, 1, "click", 1.0, "{}"))
    expected_sessions = 1 + sum(
        1 for i in range(1, len(rows)) if (rows[i][1] - rows[i - 1][1]).total_seconds() > 1800
    )
    rng.shuffle(rows)  # arrival order != time order
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.coalesce(1).write.parquet(base + "/in")

    stream = spark.readStream.schema(df.schema).parquet(base + "/in")
    out = stream_job.sessionize_stream(stream)
    stream_job.run_stream_to_memory(out, "sess_big_test", output_mode="update")
    got = spark.sql(
        "SELECT last(n_sessions) AS s, last(n_events) AS e FROM sess_big_test WHERE user_id = 1"
    ).collect()[0]
    assert (got["s"], got["e"]) == (expected_sessions, 800)


def test_dedup_stream_within_watermark_bounds_state(spark, tmp_path_factory):
    """Watermarked streaming dedup: duplicates arriving within the
    watermark horizon are dropped; state is keyed on content hash with an
    event-time TTL (the unbounded-stream form)."""
    import datetime as dt

    base = str(tmp_path_factory.mktemp("wm_dedup"))
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "same content here"),
        (2, t0 + dt.timedelta(minutes=5), "same   CONTENT  here"),  # dup (normalized)
        (3, t0 + dt.timedelta(minutes=10), "different content entirely"),
        (4, t0 + dt.timedelta(minutes=15), "same content here"),  # dup again
    ]
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    df.coalesce(1).write.parquet(base + "/in")

    stream = spark.readStream.schema(df.schema).parquet(base + "/in")
    out = stream_job.dedup_stream(
        stream, text_expr=F.col("text"), event_time_col="ts", watermark_delay="1 hour"
    )
    stream_job.run_stream_to_memory(out.select("doc_id"), "wm_dedup_test", output_mode="append")
    kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM wm_dedup_test").collect()}
    assert kept == {1, 3}


def test_dedup_stream_minhash_flags_cross_batch_near_dup(spark, tmp_path_factory):
    """Streaming NEAR-dedup: a near-duplicate (NOT exact — one token
    differs, so content-hash dedup would keep it) arriving in a later
    micro-batch is flagged against the first-seen doc via MinHash-LSH
    band state; the flagged pair equals the batch pipeline's candidate
    pair on the union of both batches."""
    import time as time_mod

    base = str(tmp_path_factory.mktemp("ndstream"))
    inp = os.path.join(base, "in")
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lamda mu nu xi omicron pi rho sigma tau upsilon ") * 3
    text_a = words + "phi chi psi omega end"
    text_b = words + "phi chi psi omega CHANGED"   # near-dup, not exact
    text_c = "totally unrelated content talking about something else entirely here now"

    def doc(did, text):
        return {"doc_id": did, "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}]}

    create_documents_df(spark, [doc("docA", text_a), doc("docC", text_c)]).coalesce(
        1
    ).write.parquet(inp)
    time_mod.sleep(1.2)  # distinct mtimes: batch 1 = {A, C}, batch 2 = {B}
    create_documents_df(spark, [doc("docB", text_b)]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    stream = stream_job.read_documents_stream(spark, inp, max_files=1)
    out = stream_job.dedup_stream_minhash(stream)
    stream_job.run_stream_to_memory(out, "nd_test", output_mode="update")
    flags = {
        (r["doc_id"], r["dup_of"])
        for r in spark.sql("SELECT doc_id, dup_of FROM nd_test").collect()
    }
    assert ("docB", "docA") in flags  # batch-2 near-dup caught against batch-1 state
    assert not any("docC" in pair for pair in flags)

    # batch parity: same pair set as minhash_lsh_candidates on the union
    from patent_decision_document_converter_spark.operators import dedup as bdedup

    union = spark.createDataFrame(
        [("docA", text_a), ("docB", text_b), ("docC", text_c)], ["doc_id", "text"]
    )
    batch_pairs = {
        frozenset((r["id_a"], r["id_b"]))
        for r in bdedup.minhash_lsh_candidates(bdedup.minhash_signatures(union)).collect()
    }
    assert {frozenset(p) for p in flags} == batch_pairs == {frozenset(("docA", "docB"))}


def test_curate_stream_gates_and_dedups(spark, tmp_path_factory):
    """Streaming curation: quality gate + cross-batch exact dedup on a
    document stream, convert stage shared with batch."""
    base = str(tmp_path_factory.mktemp("curstream"))
    rows = make_documents_rows(16, seed=33, mega_frac=0.0)
    dupes = [{"doc_id": "dup-" + r["doc_id"], "spans": r["spans"]} for r in rows[:5]]
    short = [{"doc_id": "tiny", "spans": [{"kind": "text", "text": "x", "media_ref": "", "offset": 0}]}]
    create_documents_df(spark, rows + dupes + short).repartition(5).write.parquet(base + "/in")

    stream = stream_job.read_documents_stream(spark, base + "/in", max_files=2)
    out = stream_job.curate_stream(stream, mode="pct")
    stream_job.run_stream_to_memory(out.select("doc_id"), "curate_stream_test", output_mode="append")
    kept = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM curate_stream_test").collect()}
    assert "tiny" not in kept  # quality gate
    # one survivor per content (either original or dup id, whichever batch won)
    assert len(kept) == 16
    base_ids = {d.removeprefix("dup-") for d in kept}
    assert base_ids == {r["doc_id"] for r in rows}


def test_curate_near_sink_cross_batch_transitive(spark, tmp_path_factory):
    """Streaming curation WITH near-dedup (r3 gap: curate_stream gated on
    exact hashes only).  Three micro-batches:

      batch 1: A (canonical), U (unrelated)
      batch 2: B = A with ~10% words changed (near-dup of A),
               Z = exact copy of A's spans
      batch 3: C = B with ANOTHER ~10% changed (near-dup of B;
               ~20% away from A — below threshold vs A directly)

    Expected survivors {A, U}: Z dies on the hash state, B on A's band
    state + Jaccard verify, and C TRANSITIVELY on B's registered bands
    even though B itself was dropped — the streaming twin of batch
    connected-components clustering.  Batch parity: curate_corpus over
    the union keeps exactly the same set."""
    import time as time_mod

    base = str(tmp_path_factory.mktemp("ncur"))
    inp = os.path.join(base, "in")

    words = [f"word{i:03d}" for i in range(100)]
    a_words = list(words)
    b_words = list(words)
    for i in range(80, 90):
        b_words[i] = f"chg{i:03d}"
    c_words = list(b_words)
    for i in range(0, 10):
        c_words[i] = f"alt{i:03d}"

    def doc(did, toks):
        return {
            "doc_id": did,
            "spans": [{"kind": "text", "text": " ".join(toks), "media_ref": "", "offset": 0}],
        }

    u = doc("u-doc", [f"other{i:02d}" for i in range(60)])
    batches = [
        [doc("a-doc", a_words), u],
        [doc("b-doc", b_words), doc("z-exact", a_words)],
        [doc("c-doc", c_words)],
    ]
    for i, b in enumerate(batches):
        if i:
            time_mod.sleep(1.2)  # distinct mtimes order the micro-batches
        create_documents_df(spark, b).coalesce(1).write.mode("append").parquet(inp)

    stream = stream_job.read_documents_stream(spark, inp, max_files=1)
    q = stream_job.start_curate_near_sink(
        stream,
        out_dir=os.path.join(base, "out"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        state_dir=os.path.join(base, "state"),
        mode="pct",
    )
    q.awaitTermination()
    kept = {r["doc_id"] for r in spark.read.parquet(os.path.join(base, "out")).collect()}
    assert kept == {"a-doc", "u-doc"}

    # batch parity: the batch pipeline over the union keeps the same set
    # (cluster-min canonical == first-seen here because ids follow
    # arrival order)
    from patent_decision_document_converter_spark.plans.curate import curate_corpus

    union = [d for b in batches for d in b]
    curated, _ = curate_corpus(create_documents_df(spark, union), mode="pct")
    assert {r["doc_id"] for r in curated.select("doc_id").collect()} == kept

    # state tables carry ALL exact-canonical docs (incl. dropped B, C)
    texts = {r["doc_id"] for r in spark.read.parquet(os.path.join(base, "state", "texts")).collect()}
    assert texts == {"a-doc", "u-doc", "b-doc", "c-doc"}


def test_extract_convert_stream_matches_batch_job(spark, tmp_path_factory):
    """Streaming twin of the FULL extraction job: dispatcher →
    enrich_media_spans (stream-static doc-level join) → conversion on an
    arriving-documents stream equals the batch composition row-for-row,
    and a checkpointed restart with no new files adds nothing."""
    from patent_decision_document_converter_spark.operators import pdf as pdfmod
    from patent_decision_document_converter_spark.plans.extract_job import (
        extract_and_enrich,
    )

    base = str(tmp_path_factory.mktemp("xjstream"))
    inp, outp, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))

    good_pdf = pdfmod._encode_pdf([(72.0, 700.0, "attachment body")], compress=True)
    long_p = "主要な本文ブロックです。" * 8

    def t(text, off):
        return {"kind": "text", "text": text, "media_ref": "", "offset": off}

    def m(ref, off):
        return {"kind": "media", "text": "", "media_ref": ref, "offset": off}

    doc_rows = [
        {"doc_id": "d0", "spans": [t("前文１", 0), m("pdf:d0", 1), t("後文１", 2)]},
        {"doc_id": "d1", "spans": [t("前文２", 0), m("html:d1", 1)]},
        {"doc_id": "d2", "spans": [m("bin:d2", 0), t("末文", 1)]},
        {"doc_id": "d3", "spans": [t("テキストのみ", 0)]},
    ]
    media_rows = [
        ("d0", "pdf:d0", "pdf", bytearray(good_pdf)),
        ("d1", "html:d1", "html",
         ('<div><a href="#">ナビ</a></div>' + f"<p>{long_p}</p>").encode()),
        ("d2", "bin:d2", "mp4", bytearray(b"\x00\x01")),
    ]
    media = spark.createDataFrame(
        media_rows, "doc_id string, media_ref string, format string, payload binary"
    )
    create_documents_df(spark, doc_rows).repartition(2).write.parquet(inp)

    docs = stream_job.read_documents_stream(spark, inp, max_files=1)
    out = stream_job.extract_convert_stream(docs, media, mode="officeAction")
    assert out.isStreaming
    q = stream_job.start_convert_sink(out, outp, ckpt)
    q.awaitTermination()

    batch_docs = create_documents_df(spark, doc_rows)
    want = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in convert_documents(
            extract_and_enrich(batch_docs, media), "officeAction"
        ).collect()
    }
    got = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in spark.read.parquet(outp).collect()
    }
    assert got == want

    # restart with no new files: exactly-once, no duplicates
    q2 = stream_job.start_convert_sink(
        stream_job.extract_convert_stream(
            stream_job.read_documents_stream(spark, inp), media, mode="officeAction"
        ),
        outp,
        ckpt,
    )
    q2.awaitTermination()
    assert spark.read.parquet(outp).count() == len(doc_rows)

    # pre-extracted sidecar path (the 100-TB shape: extraction done once,
    # enrichment joins the text table directly) — same result
    pre = spark.createDataFrame(
        [("d0", "pdf:d0", "attachment body"), ("d1", "html:d1", long_p)],
        "doc_id string, media_ref string, text string",
    )
    outp2, ckpt2 = os.path.join(base, "out2"), os.path.join(base, "ckpt2")
    q3 = stream_job.start_convert_sink(
        stream_job.extract_convert_stream(
            stream_job.read_documents_stream(spark, inp), pre,
            mode="officeAction", pre_extracted=True,
        ),
        outp2,
        ckpt2,
    )
    q3.awaitTermination()
    got2 = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in spark.read.parquet(outp2).collect()
    }
    assert got2 == want


def test_bloom_membership_streams_unchanged(spark, tmp_path_factory):
    """Reference-set membership on a stream: bloom_might_contain is a
    stateless projection (JVM position expressions + one pandas UDF over
    a broadcast bitmap), so the BATCH operator applies to a streaming
    frame unchanged — the stream's flags must equal the batch flags
    row-for-row.  The bitmap plays the 'decontaminate against a frozen
    reference corpus' role: built once batch-side, broadcast to every
    micro-batch."""
    from patent_decision_document_converter_spark.operators import dedup
    from patent_decision_document_converter_spark.sources.generator import doc_text_from_spans

    base = str(tmp_path_factory.mktemp("bloomstream"))
    inp = os.path.join(base, "in")
    rows = make_documents_rows(30, seed=33, mega_frac=0.0)
    tdf = spark.createDataFrame(
        [(r["doc_id"], doc_text_from_spans(r["spans"])) for r in rows],
        "doc_id string, text string",
    )
    tdf.repartition(4).write.parquet(inp)
    ref = tdf.filter(F.col("doc_id").rlike("[02468]$"))
    bitmap = dedup.bloom_build(ref, n_bits=256, n_hashes=3)

    stream = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 2)
        .parquet(inp)
    )
    out = dedup.bloom_might_contain(stream, bitmap, n_bits=256, n_hashes=3)
    stream_job.run_stream_to_memory(
        out.select("doc_id", "in_ref"), "bloom_stream_test", output_mode="append"
    )
    got = {r["doc_id"]: r["in_ref"] for r in spark.sql("SELECT * FROM bloom_stream_test").collect()}
    batch = {
        r["doc_id"]: r["in_ref"]
        for r in dedup.bloom_might_contain(tdf, bitmap, n_bits=256, n_hashes=3).collect()
    }
    assert got == batch and len(got) == 30
    # no false negatives on the stream either
    assert all(got[r["doc_id"]] for r in ref.collect())
