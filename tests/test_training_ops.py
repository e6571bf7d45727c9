"""Training-data pipeline operator tests: dedup, similarity search,
text analysis, multimodal plumbing (SURVEY.md §2.13 build-plan layer).

Semantic checks against plain-Python/numpy oracles on small constructed
inputs — the DuckDB value-hash parity for these operators is covered by
tools/check_contract.py / the driver's CORRECTNESS gate.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from patent_decision_document_converter_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textstats,
)
from patent_decision_document_converter_spark.plans.job import get_spark
from patent_decision_document_converter_spark.sources.documents import create_documents_df
from patent_decision_document_converter_spark.sources.generator import make_documents_rows


@pytest.fixture(scope="module")
def spark():
    yield get_spark(app_name="pytest-training-ops", master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),          # exact dup of 1
        (3, "THE  quick   Brown fox jumps over the lazy dog"),       # dup after normalize
        (4, "the quick brown fox jumps over the sleepy dog"),        # near-dup (1 token)
        (5, "completely different content about spark engines here"),
        (6, "a b"),                                                   # too short to shingle
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------


def test_exact_dedup_groups(docs):
    out = {r["content_hash"]: r for r in dedup.exact_dedup(docs).collect()}
    groups = sorted((r["group_size"], r["canonical_id"]) for r in out.values())
    # docs 1,2,3 collapse into one group of 3 with canonical id 1
    assert (3, 1) in groups
    assert sum(g for g, _ in groups) == 6


def test_minhash_identical_docs_identical_signatures(docs):
    sigs = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2] == sigs[3]
    assert len(sigs[1]) == 16
    assert sigs[6] == []  # < 3 tokens -> no shingles
    # near-dup shares most minhashes, disjoint doc shares none
    shared_near = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    shared_far = sum(a == b for a, b in zip(sigs[1], sigs[5]))
    assert shared_near > shared_far


def test_minhash_pandas_expr_parity(spark, docs):
    """The hashlib fast path and the pure-builtin expression path must
    produce byte-identical signatures (same md5 derivation)."""
    fast = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(docs, impl="pandas").collect()}
    expr = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(docs, impl="expr").collect()}
    assert fast == expr
    # and on the realistic testdata corpus
    td = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fast = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(td, impl="pandas").collect()}
    expr = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(td, impl="expr").collect()}
    assert fast == expr


def test_minhash_char_unit_parity_and_cjk(spark, docs):
    """char-shingle mode: pandas/expr parity + catches spaceless-CJK
    near-dups that word shingles are blind to."""
    cjk = spark.createDataFrame(
        [
            (1, "この出願の請求項に係る発明は特許を受けることができない。"),
            (2, "この出願の請求項に係る発明は特許を受けることができない。なお付記。"),
            (3, "全く関係のない別の文書である。"),
        ],
        ["doc_id", "text"],
    )
    fast = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(cjk, shingle_k=5, unit="char", impl="pandas").collect()}
    expr = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(cjk, shingle_k=5, unit="char", impl="expr").collect()}
    assert fast == expr
    shared_near = sum(a == b for a, b in zip(fast[1], fast[2]))
    shared_far = sum(a == b for a, b in zip(fast[1], fast[3]))
    assert shared_near > 8 > shared_far
    # word shingles see ONE token per doc -> no signal at all
    word = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(cjk, unit="word").collect()}
    assert word[1] == []


def test_minhash_lsh_candidates_catch_dups(docs):
    sigs = dedup.minhash_signatures(docs)
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(sigs).collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= pairs
    assert (1, 5) not in pairs


def test_ngram_jaccard_exact_values(docs):
    out = {
        (r["id_a"], r["id_b"]): r
        for r in dedup.ngram_jaccard_pairs(docs, threshold_tenths=0).collect()
    }
    r = out[(1, 2)]
    assert r["common"] == r["sa"] == r["sb"] == 7  # 9 tokens -> 7 3-gram shingles
    # candidates restriction drops non-listed pairs
    cand = docs.sparkSession.createDataFrame([(1, 2)], ["id_a", "id_b"])
    only = dedup.ngram_jaccard_pairs(docs, threshold_tenths=0, candidates=cand).collect()
    assert {(r["id_a"], r["id_b"]) for r in only} == {(1, 2)}


def test_simhash_fingerprints_and_pairs(docs):
    rows = {r["doc_id"]: r for r in dedup.simhash_fingerprints(docs).collect()}
    fps = {k: r["fingerprint"] for k, r in rows.items()}
    fps2 = {k: r["fingerprint2"] for k, r in rows.items()}
    assert fps[1] == fps[2] == fps[3]  # same distinct-token set
    assert fps2[1] == fps2[2] == fps2[3]
    assert 0 <= fps[1] < (1 << 60) and 0 <= fps2[1] < (1 << 60)
    assert fps[1] != fps2[1]  # independent md5 streams
    fpdf = dedup.simhash_fingerprints(docs)
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(fpdf).collect()
    }
    assert pairs[(1, 2)] == 0
    # doc 4 (1 of 9 tokens changed) lands at hamming 13/120 — above the
    # default 10% gate, as it should be for an 11% token change on a
    # tiny doc; a narrower banding (24 bands of 5 bits ⇒ guaranteed
    # recall to hamming 23) with a looser threshold must catch it
    loose = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(fpdf, max_hamming=20, band_bits=5).collect()
    }
    assert loose[(1, 4)] == 13


def test_simhash_band_width_equivalence(spark):
    """Pigeonhole guarantee: at max_hamming <= n_bands - 1, EVERY
    qualifying pair is caught regardless of band width — so 15-bit
    banding (8 bands over 120 bits) and 30-bit banding (4 bands) must
    return the identical pair set.  This pins the wide-band extension
    against the narrow parameterization it replaces."""
    td = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fps = dedup.simhash_fingerprints(td).persist()
    wide = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(fps, max_hamming=3, band_bits=30).collect()
    }
    narrow = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_near_dups(fps, max_hamming=3, band_bits=15).collect()
    }
    fps.unpersist()
    assert wide == narrow
    assert all(h <= 3 for h in wide.values())


def test_simhash_pandas_expr_parity(spark, docs):
    fast = {r["doc_id"]: r["fingerprint"] for r in dedup.simhash_fingerprints(docs, impl="pandas").collect()}
    expr = {r["doc_id"]: r["fingerprint"] for r in dedup.simhash_fingerprints(docs, impl="expr").collect()}
    assert fast == expr
    # NULL / empty text must not diverge between the impls
    edge = spark.createDataFrame([(100, None), (101, ""), (102, "   ")], "doc_id long, text string")
    fast = {r["doc_id"]: r["fingerprint"] for r in dedup.simhash_fingerprints(edge, impl="pandas").collect()}
    expr = {r["doc_id"]: r["fingerprint"] for r in dedup.simhash_fingerprints(edge, impl="expr").collect()}
    assert fast == expr and len(fast) == 3
    td = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fast = {r["doc_id"]: r["fingerprint"] for r in dedup.simhash_fingerprints(td, impl="pandas").collect()}
    expr = {r["doc_id"]: r["fingerprint"] for r in dedup.simhash_fingerprints(td, impl="expr").collect()}
    assert fast == expr


def test_simhash_matches_python_oracle(docs):
    """Bit-exact python re-implementation of both fingerprint words
    (disjoint 60-bit slices of one md5 digest: hex digits 0-14 and
    16-30)."""
    rows = {r["doc_id"]: r for r in dedup.simhash_fingerprints(docs).collect()}
    texts = dict(docs.collect())
    for doc_id, text in texts.items():
        toks = []
        for t in " ".join(text.split()).lower().split(" "):
            if t not in toks:
                toks.append(t)
        for col, lo in (("fingerprint", 0), ("fingerprint2", 16)):
            fp = 0
            for b in range(60):
                s = 0
                for t in toks:
                    h = int(hashlib.md5(t.encode()).hexdigest()[lo : lo + 15], 16)
                    s += 1 if (h >> b) & 1 else -1
                if s > 0:
                    fp |= 1 << b
            assert rows[doc_id][col] == fp, (doc_id, col)


# ---------------------------------------------------------------------------
# similarity
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        label = i % 4
        center = np.zeros(8)
        center[label * 2] = 3.0
        v = center + rng.normal(0, 0.4, 8)
        rows.append((i, [float(x) for x in v], label))
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"]), rows


def test_cosine_topk_matches_numpy(vectors):
    import numpy as np

    df, rows = vectors
    q = rows[0][1]
    got = [r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).orderBy("rank").collect()]
    V = np.array([r[1] for r in rows])
    qv = np.array(q)
    sims = (V @ qv) / (np.linalg.norm(V, axis=1) * np.linalg.norm(qv))
    expected = [int(i) for i in np.lexsort((np.arange(len(sims)), -sims))[:5]]
    assert got == expected


def test_ivf_topk_probes_right_cells(vectors):
    df, rows = vectors
    q = rows[0][1]  # label-0 cluster
    got = [r["vec_id"] for r in similarity.ivf_topk(df, q, k=5, n_probe=1).orderBy("rank").collect()]
    # with 1 probe, all results come from the query's own cluster (label 0)
    labels = {r[0]: r[2] for r in rows}
    assert all(labels[i] == 0 for i in got)
    assert got[0] == 0  # the query vector itself


def test_rp_lsh_buckets_and_ann(vectors):
    df, rows = vectors
    buckets = {r["vec_id"]: r["bucket"] for r in similarity.rp_lsh_buckets(df, 8, n_planes=4).collect()}
    assert all(0 <= b < 16 for b in buckets.values())
    # driver-side query bucket matches the engine's bucket for the same vector
    assert similarity.rp_bucket_of(rows[0][1], 4) == buckets[0]
    got = [r["vec_id"] for r in similarity.ann_topk_lsh(df, rows[0][1], k=5, n_planes=2).orderBy("rank").collect()]
    assert got and got[0] == 0  # query's own vector is in its own bucket, rank 1
    # every result is from the query's bucket
    b2 = {r["vec_id"]: r["bucket"] for r in similarity.rp_lsh_buckets(df, 8, n_planes=2).collect()}
    qb = similarity.rp_bucket_of(rows[0][1], 2)
    assert all(b2[i] == qb for i in got)


def test_lsh_multiprobe_recall_dominates_single_probe(vectors):
    df, rows = vectors
    q = rows[0][1]
    brute = {r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).collect()}
    single = {r["vec_id"] for r in similarity.ann_topk_lsh(df, q, k=5, n_planes=4).collect()}
    multi = {
        r["vec_id"]
        for r in similarity.ann_topk_lsh_multiprobe(df, q, k=5, n_planes=4, probe_hamming=1).collect()
    }
    # candidate set only grows with probes, so recall vs brute force is monotone
    assert len(multi & brute) >= len(single & brute)
    assert 0 in multi  # query's own vector always survives
    # hamming-2 probing grows candidates further and is still a strict subset
    # of the corpus (11 of 16 buckets for 4 planes)
    multi2 = {
        r["vec_id"]
        for r in similarity.ann_topk_lsh_multiprobe(df, q, k=5, n_planes=4, probe_hamming=2).collect()
    }
    assert len(multi2 & brute) >= len(multi & brute)


def test_cosine_pairs_threshold_and_bucket(vectors):
    df, rows = vectors
    pairs = {(r["id_a"], r["id_b"]) for r in similarity.cosine_pairs(df, 0.9).collect()}
    assert pairs  # same-cluster vectors are highly similar
    labels = {r[0]: r[2] for r in rows}
    assert all(labels[a] == labels[b] for a, b in pairs)  # clusters are tight
    bucketed = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs(df, 0.9, bucket_col="label").collect()
    }
    assert bucketed == pairs  # bucketing by true cluster loses nothing here


# ---------------------------------------------------------------------------
# textstats
# ---------------------------------------------------------------------------


def test_token_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "a-b 12x"), (3, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in textstats.token_stats(df).collect()}
    assert out[1]["n_tokens"] == 3 and out[1]["n_distinct"] == 2
    assert out[1]["sum_tok_len"] == 15
    # "a-b 12x" -> BPE-ish: a | - | b | 12 | x
    assert out[2]["n_bpe_tokens"] == 5
    assert out[3]["n_tokens"] == 0 and out[3]["sum_tok_len"] == 0


def test_lang_id_paths(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house is here"),
            (2, "der Hund und die Katze ist nicht hier"),
            (3, "これは日本語の文書です特許请求"),
            (4, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in textstats.lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "zh" and out[4] == "unk"


def test_quality_scores_integer_scaling(spark):
    df = spark.createDataFrame([(1, "aa bb aa")], ["doc_id", "text"])
    r = textstats.quality_scores(df).head()
    assert r["n_chars"] == 8 and r["n_tokens"] == 3
    assert r["distinct_permille"] == math.floor(1000 * 2 / 3)
    assert r["mean_tok_len_x10"] == math.floor(10 * 6 / 3)
    assert r["alpha_permille"] == math.floor(1000 * 6 / 8)


def test_winnow_fingerprints_shift_invariance(spark):
    """Winnowing is robust to content shifts: inserting a prefix far from
    a region keeps that region's fingerprints in the selected set."""
    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14 w15 w16"
    df = spark.createDataFrame(
        [(1, base), (2, "zz0 zz1 zz2 zz3 zz4 zz5 zz6 zz7 " + base)], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in textstats.winnow_fingerprints(df).collect()}
    assert out[1]["n_fingerprints"] > 0
    # doc 2 contains doc 1 -> shares most of doc 1's fingerprint set is not
    # directly exposed; assert determinism + non-degenerate digest instead
    again = {r["doc_id"]: r for r in textstats.winnow_fingerprints(df).collect()}
    assert out[1]["fp_set_hash"] == again[1]["fp_set_hash"]
    assert out[1]["min_fp"] <= out[1]["max_fp"]


def test_doubled_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "go go gadget arms arms arms"), (2, "all distinct words here")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["n_doubled"] for r in textstats.doubled_token_counts(df).collect()}
    assert out[1] == 3  # go|go, arms|arms, arms|arms
    assert out[2] == 0


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = make_documents_rows(30, seed=11, mega_frac=0.0)
    spans_df = create_documents_df(spark, rows)
    return multimodal.synth_media_table(spans_df)


def test_media_table_schema_and_payload(media):
    got = [(f.name, f.dataType) for f in media.schema.fields]
    want = [(f.name, f.dataType) for f in multimodal.MEDIA_SCHEMA.fields]
    assert got == want  # (nullability differs by construction; names+types pinned)
    rows = media.collect()
    assert rows, "generator should interleave media spans"
    for r in rows[:5]:
        assert r["n_bytes"] == 32  # two md5 halves
        assert r["kind"] in ("figure", "table")
        # payload deterministic from media_ref
        h = hashlib.md5(r["media_ref"].encode()).hexdigest() + hashlib.md5(
            (r["media_ref"] + ":1").encode()
        ).hexdigest()
        assert bytes(r["payload"]).hex() == h


def test_decode_media_fake_features(media):
    out = multimodal.decode_media(media).collect()
    assert out and len(out[0]["features"]) == 16
    for r in out[:5]:
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # L1-normalized histogram


def test_decode_media_real_raises_for_fake_payloads(media):
    """The fake-synth fixture carries png/csv format tags over md5-junk
    payloads: the real path must fail LOUDLY either way — csv has no
    stdlib codec (NotImplementedError), and the REAL png decoder rejects
    the junk bytes at the signature check (ValueError) instead of
    pretending to decode them."""
    fig = media.filter(F.col("format") == "png").limit(1)
    with pytest.raises(Exception, match="(?i)not a PNG"):
        multimodal.decode_media(fig, impl="real").collect()
    tab = media.filter(F.col("format") == "csv").limit(1)
    with pytest.raises(Exception, match="(?i)not installed|NotImplemented"):
        multimodal.decode_media(tab, impl="real").collect()


def test_real_resize_bmp_wav_roundtrip(spark):
    """Real resize emits VALID smaller files that the real decoder
    re-parses: an 8x8 BMP halves to 4x4; a 32-frame WAV decimates to 8."""
    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    media = multimodal.synth_media_table_real(docs)
    out = {r["doc_id"]: r for r in multimodal.resize_media(media, scale_denom=2, impl="real").collect()}
    f_img = multimodal._decode_bmp(bytes(out["0"]["payload"]))
    assert f_img[:2] == [4.0, 4.0]
    f_aud = multimodal._decode_wav(bytes(out["1"]["payload"]))
    assert f_aud[0] == 1.0 and f_aud[2] == 16.0
    # decimating twice == decimating by 4 (sample alignment)
    out4 = {r["doc_id"]: r for r in multimodal.resize_media(media, scale_denom=4, impl="real").collect()}
    assert multimodal._decode_wav(bytes(out4["1"]["payload"]))[2] == 8.0


def test_real_bmp_wav_payloads_decode(spark):
    """The real-codec path end-to-end: genuine BMP/WAV payloads decode
    with stdlib codecs; cross-checked against an independent pure-python
    reconstruction of the byte stream."""
    docs = spark.createDataFrame([(0,), (1,)], "doc_id long")
    media = multimodal.synth_media_table_real(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    # payloads are valid files: BMP magic / RIFF-WAVE magic
    bmp = bytes(rows["0"]["payload"])
    wav = bytes(rows["1"]["payload"])
    assert bmp[:2] == b"BM" and rows["0"]["format"] == "bmp"
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    # the stdlib wave module itself accepts the payload
    import io
    import wave as wave_mod

    with wave_mod.open(io.BytesIO(wav), "rb") as w:
        assert (w.getnchannels(), w.getframerate(), w.getnframes()) == (1, 8000, 32)

    feats = {r["doc_id"]: r for r in multimodal.decode_media(media, impl="real").collect()}
    fi = feats["0"]["features"]
    assert fi[0] == 8.0 and fi[1] == 8.0          # parsed geometry
    # channel sums equal an independent reconstruction from the md5 chain
    pix = b"".join(
        hashlib.md5(f"mr:0:p{i}".encode()).digest() for i in range(192 // 16)
    )
    want = [0, 0, 0]
    for i, b in enumerate(pix):
        want[i % 3] += b
    assert fi[2:] == [float(x) for x in want]
    fa = feats["1"]["features"]
    assert fa[:3] == [1.0, 8000.0, 32.0]
    import struct as struct_mod

    dat = b"".join(hashlib.md5(f"mr:1:p{i}".encode()).digest() for i in range(4))
    vals = struct_mod.unpack("<32h", dat)
    assert fa[3] == float(sum(abs(v) for v in vals))


def test_png_encoder_filters_pinned_by_hand(spark):
    """Every PNG scanline filter (None/Sub/Up/Average/Paeth) pinned
    against HAND-COMPUTED spec arithmetic on a 1×5 image — the encoder's
    filtered byte stream is checked literally (not just via round-trip,
    which a symmetric encoder/decoder bug would survive), then the
    decoder must invert it exactly."""
    import zlib

    pix = bytes([1, 2, 3, 5, 7, 9, 10, 20, 30, 40, 60, 80, 100, 150, 200])
    png = multimodal._encode_png(pix, 1, 5)
    # extract the single IDAT chunk and inflate
    import struct as struct_mod

    pos, idat = 8, b""
    while pos + 8 <= len(png):
        (ln,) = struct_mod.unpack_from(">I", png, pos)
        tag = png[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += png[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
    raw = zlib.decompress(idat)
    # hand-derived per the spec: r0 None, r1 Sub (a=0 at x<bpp),
    # r2 Up (x-prev), r3 Average (x-(0+b)//2), r4 Paeth (predictor=b here)
    assert raw == bytes(
        [0, 1, 2, 3,
         1, 5, 7, 9,
         2, 5, 13, 21,
         3, 35, 50, 65,
         4, 60, 90, 120]
    )
    assert multimodal._png_pixels(png) == (1, 5, pix)
    # malformed inputs fail loudly, never decode garbage
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal._png_pixels(b"\x89PNG!!!!" + png[8:])
    bad_profile = multimodal._PNG_SIG + multimodal._png_chunk(
        b"IHDR", struct_mod.pack(">IIBBBBB", 1, 5, 16, 2, 0, 0, 0)
    )
    with pytest.raises(ValueError, match="unsupported PNG profile"):
        multimodal._png_pixels(bad_profile)


def test_png_synth_decode_resize_spark(spark):
    """End-to-end PNG path on Spark: genuine synthesized PNGs decode via
    the Arrow-batched real path to channel sums matching an independent
    md5-chain reconstruction, and the real NN resize emits valid smaller
    PNGs whose pixels stride-sample the originals."""
    docs = spark.createDataFrame([(0,), (1,), (7,)], "doc_id long")
    media = multimodal.synth_media_table_png(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    assert bytes(rows["7"]["payload"])[:8] == multimodal._PNG_SIG
    assert rows["7"]["format"] == "png" and rows["7"]["kind"] == "image"

    feats = {r["doc_id"]: r for r in multimodal.decode_media(media, impl="real").collect()}
    for d in ("0", "1", "7"):
        pix = b"".join(
            hashlib.md5(f"pr:{d}:p{i}".encode()).digest() for i in range(192 // 16)
        )
        want = [0, 0, 0]
        for i, b in enumerate(pix):
            want[i % 3] += b
        assert feats[d]["features"] == [8.0, 8.0] + [float(x) for x in want]

    out = {r["doc_id"]: r for r in multimodal.resize_media(media, scale_denom=2, impl="real").collect()}
    w, h, small = multimodal._png_pixels(bytes(out["7"]["payload"]))
    assert (w, h) == (4, 4)
    pix7 = b"".join(
        hashlib.md5(f"pr:7:p{i}".encode()).digest() for i in range(192 // 16)
    )
    expect = bytearray()
    for r in range(4):
        for c in range(4):
            p = (r * 2) * 8 * 3 + (c * 2) * 3
            expect += pix7[p : p + 3]
    assert small == bytes(expect)


def test_resize_media(media):
    out = multimodal.resize_media(media.limit(4), scale_denom=4).collect()
    assert len(out) == 4
    for r in out:
        assert r["n_bytes"] == 8  # 32 bytes / 4
        assert r["scale_denom"] == 4
    tab = media.filter(F.col("format") == "csv").limit(1)
    with pytest.raises(Exception, match="(?i)not installed|NotImplemented"):
        multimodal.resize_media(tab, impl="real").collect()


def test_sample_frames_fanout(media):
    one = media.limit(3)
    frames = multimodal.sample_frames(one, every_n_bytes=8).collect()
    # 32 bytes / 8 = 4 frames per media row
    assert len(frames) == 12
    assert {f["frame_no"] for f in frames} == {0, 1, 2, 3}
    assert all(len(bytes(f["frame_bytes"])) == 8 for f in frames)


# ---------------------------------------------------------------------------
# physical-plan guards (scale regressions)
# ---------------------------------------------------------------------------


def test_exact_dedup_single_shuffle(docs):
    plan = dedup.exact_dedup(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one hash shuffle on content_hash


def test_minhash_signatures_no_shuffle(docs):
    plan = dedup.minhash_signatures(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row projection


def test_ivf_probe_join_is_broadcast(vectors):
    df, rows = vectors
    plan = similarity.ivf_topk(df, rows[0][1], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_simhash_near_dups_reuses_cached_band_table(docs):
    """The banded self-join must feed both sides from ONE fingerprint
    pass (tracked persist) — without it the mapInPandas hash stage runs
    twice, once per join side."""
    from patent_decision_document_converter_spark.functions.cachereg import release_cached

    out = dedup.simhash_near_dups(dedup.simhash_fingerprints(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    release_cached()
    # both self-join sides read the persisted band table (the plan string
    # may additionally print the cache's own MapInPandas lineage, which is
    # materialized once regardless of how many scans reference it)
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan


def test_kmeans_join_assignment_is_broadcast(vectors):
    """The distributed-centroid assignment must broadcast the centroid
    table (a nested-loop broadcast for the cross join), never shuffle the
    vector side against it."""
    df, rows = vectors
    assigned, _ = similarity.kmeans_fit_assign(df, k=3, iters=1, assign_impl="join")
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_remove_common_runs_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x a b c d y")], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    plan = (
        dedup.remove_common_runs(df, pairs, shingle_k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan  # all joins keyed (id / sh_hash)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3-4-5-6-7-8 (diameter 7 → multiple star rounds),
    # clique {20,21,22}, pair {30,31}; 99 is a singleton (absent)
    edges = [(i, i + 1) for i in range(1, 8)]
    edges += [(20, 21), (21, 22), (20, 22), (30, 31)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    want = {i: 1 for i in range(1, 9)}
    want.update({20: 20, 21: 20, 22: 20, 30: 30, 31: 30})
    assert got == want


def test_connected_components_reversed_and_dup_edges(spark):
    # unordered inputs, duplicates, self-loops must not matter
    pairs = spark.createDataFrame(
        [(5, 3), (3, 5), (3, 3), (7, 5), (9, 7)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {3: 3, 5: 3, 7: 3, 9: 3}


def test_kmeans_ivf_deterministic_and_sane(vectors):
    df, rows = vectors
    assigned1, cents1 = similarity.kmeans_fit_assign(df, k=3, iters=2)
    assigned2, cents2 = similarity.kmeans_fit_assign(df, k=3, iters=2)
    # bit-exact reproducibility (integer arithmetic, no RNG)
    assert cents1 == cents2
    a1 = {r["vec_id"]: r["cell"] for r in assigned1.collect()}
    a2 = {r["vec_id"]: r["cell"] for r in assigned2.collect()}
    assert a1 == a2
    # same-label vectors are tight clusters -> k-means must not split them
    labels = {r[0]: r[2] for r in rows}
    by_label = {}
    for vid, cell in a1.items():
        by_label.setdefault(labels[vid], set()).add(cell)
    assert all(len(cells) == 1 for cells in by_label.values())

    q = rows[0][1]
    got = [
        r["vec_id"]
        for r in similarity.ann_topk_ivf_kmeans(df, q, k=5, n_cells=3, n_probe=1)
        .orderBy("rank")
        .collect()
    ]
    assert got and got[0] == 0  # query's own vector leads its probed cell


def test_kmeans_ivf_nprobe_recall_monotone(vectors):
    """The standard IVF recall/cost knob: widening n_probe only ADDS cells
    to the candidate set, so recall vs brute force is monotone in n_probe,
    and probing every cell recovers brute force exactly."""
    df, rows = vectors
    q = rows[0][1]
    brute = {r["vec_id"] for r in similarity.cosine_topk(df, q, k=5).collect()}
    recalls = []
    for n_probe in (1, 2, 3):
        got = {
            r["vec_id"]
            for r in similarity.ann_topk_ivf_kmeans(
                df, q, k=5, n_cells=3, n_probe=n_probe, iters=2
            ).collect()
        }
        recalls.append(len(got & brute))
    assert recalls == sorted(recalls)  # monotone non-decreasing
    assert recalls[-1] == len(brute)  # n_probe == n_cells scans everything


def test_kmeans_assign_join_matches_expr(vectors):
    """The distributed-centroid (broadcast-join) assignment must be
    row-identical to the unrolled-expression path: same centroids, same
    cell per vector, same tie-breaking (min (dist, cid) struct)."""
    df, rows = vectors
    a_expr, c_expr = similarity.kmeans_fit_assign(df, k=3, iters=2, assign_impl="expr")
    a_join, c_join = similarity.kmeans_fit_assign(df, k=3, iters=2, assign_impl="join")
    assert c_expr == c_join  # training replays identically either way
    m_expr = {r["vec_id"]: r["cell"] for r in a_expr.collect()}
    m_join = {r["vec_id"]: r["cell"] for r in a_join.collect()}
    assert m_expr == m_join


def test_multiprobe_probe_set_is_scan_filter(vectors):
    """Multi-probe candidates come from ONE scan with an IN filter — no
    shuffle, no join against a probe table."""
    df, rows = vectors
    plan = (
        similarity.ann_topk_lsh_multiprobe(df, rows[0][1], k=3, n_planes=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan  # probe set is a pushed literal IN list
    assert "Scan" in plan and plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1


def test_media_features_scan_reads_only_doc_id(spark):
    from patent_decision_document_converter_spark.plans.contract import media_features

    qe = media_features(spark, "/root/testdata/sf0.001")._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # decode is partition-preserving: the ONLY allowed Exchange is the
    # r5 parallelism-floor round-robin on the single-file testdata scan
    # (a no-op with enough input splits); no keyed shuffle anywhere
    import re as re_mod

    other_exchanges = [
        ln for ln in plan.splitlines()
        if "Exchange" in ln and "RoundRobinPartitioning" not in ln
    ]
    assert not other_exchanges, other_exchanges
    assert len(re_mod.findall(r"Exchange RoundRobinPartitioning", plan)) <= 1
    # the parquet scan must be pruned to the single needed column
    assert "ReadSchema: struct<doc_id:bigint>" in qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_kmeans_trains_on_sample_assigns_all(vectors):
    df, rows = vectors
    assigned, cents = similarity.kmeans_fit_assign(df, k=3, iters=2, train_permille=600)
    a = {r["vec_id"]: r["cell"] for r in assigned.collect()}
    assert len(a) == len(rows)  # every vector assigned, sampled training or not
    # deterministic: same sample -> same model
    _, cents2 = similarity.kmeans_fit_assign(df, k=3, iters=2, train_permille=600)
    assert cents == cents2
    # tight same-label clusters still land in one cell each
    labels = {r[0]: r[2] for r in rows}
    by_label = {}
    for vid, cell in a.items():
        by_label.setdefault(labels[vid], set()).add(cell)
    assert all(len(cells) == 1 for cells in by_label.values())


def test_cross_ngram_overlap_decontamination(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated sentence with other words"),
            (3, "quick brown fox jumps high"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [(100, "a quick brown fox jumps question")], "doc_id long, text string"
    )
    out = {
        (r["train_id"], r["eval_id"]): r["n_common"]
        for r in dedup.cross_ngram_overlap(train, evalset, shingle_k=3, min_common=1).collect()
    }
    # doc 1 and 3 share 'quick brown fox' / 'brown fox jumps' trigrams
    assert out[(1, 100)] == 2 and out[(3, 100)] == 2
    assert (2, 100) not in out
    # plan: eval side broadcasts, corpus side unshuffled before the agg
    plan = (
        dedup.cross_ngram_overlap(train, evalset)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_cross_ngram_overlap_eval_df_cap(spark):
    """max_eval_df drops boilerplate shingles shared by many eval docs
    BEFORE the join: a license header present in every eval doc (and
    every train doc) would otherwise fan out |train| x |eval| rows —
    with the cap, only genuine leakage survives."""
    boiler = "licensed under the apache license version two"
    train = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta answer"),
            (2, boiler + " epsilon zeta eta theta"),
            (3, boiler + " iota kappa lam mu"),
        ],
        "doc_id long, text string",
    )
    evalset = spark.createDataFrame(
        [
            (100, boiler + " alpha beta gamma delta answer"),  # real leak into 1
            (101, boiler + " unrelated eval question one"),
            (102, boiler + " another eval question two"),
        ],
        "doc_id long, text string",
    )
    uncapped = {
        (r["train_id"], r["eval_id"]): r["n_common"]
        for r in dedup.cross_ngram_overlap(train, evalset, shingle_k=3).collect()
    }
    # boilerplate makes EVERY train doc collide with EVERY eval doc
    assert len(uncapped) == 9
    capped = {
        (r["train_id"], r["eval_id"]): r["n_common"]
        for r in dedup.cross_ngram_overlap(
            train, evalset, shingle_k=3, max_eval_df=2
        ).collect()
    }
    # the boilerplate shingles have eval-DF 3 > 2 and vanish; only the
    # genuinely leaked 'alpha beta gamma delta answer' span remains —
    # its trigrams start at 'version two alpha' (the first trigram not
    # shared by all three eval docs)
    assert set(capped) == {(1, 100)}
    leaked = "version two alpha beta gamma delta answer".split()
    assert capped[(1, 100)] == len(leaked) - 2
    # chunk-level twin honours the same cap
    chunk_hits = dedup.decontaminate_chunks(
        train, evalset, chunk_tokens=8, overlap=0, shingle_k=3,
        min_permille=300, max_eval_df=2,
    ).collect()
    assert {(r["train_id"], r["eval_id"]) for r in chunk_hits} == {(1, 100)}


def test_repetition_signals_gopher_style(spark):
    df = spark.createDataFrame(
        [
            (1, "unique one\nunique two\nunique three"),           # no repetition
            (2, "same line\nsame line\nsame line\nother"),          # 2 of 4 lines dup
            (3, "go go go go go go"),                               # one dominating bigram
            (4, ""),                                                # blank -> all zeros
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in textstats.repetition_signals(df).collect()}
    assert out[1]["dup_line_permille"] == 0
    assert out[2]["dup_line_permille"] == 500  # 2/4
    # dup chars: 2 * len('same line') / total
    total = len("same line") * 3 + len("other")
    assert out[2]["dup_line_char_permille"] == int(1000 * 2 * len("same line") / total)
    # 'go go' occurs 5 times, 5*5=25 chars over 17 normalized chars -> >1000
    assert out[3]["top_bigram_permille"] == int(1000 * 25 / len("go go go go go go"))
    assert out[4] == {
        "doc_id": 4,
        "dup_line_permille": 0,
        "dup_line_char_permille": 0,
        "top_bigram_permille": 0,
    }


def test_longest_common_run(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x y a b c d e f z q"),   # shares the 6-token run 'a..f'
            (3, "a b c x d e f x g h"),   # broken runs: best 'a b c' (3)
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): (r["max_run"], r["lcs_tokens"])
        for r in dedup.longest_common_run(df, pairs, shingle_k=3).collect()
    }
    # doc1-doc2: 'a b c d e f' = 6 tokens = 4 consecutive 3-shingles
    assert out[(1, 2)] == (4, 6)
    # doc1-doc3: only 'a b c' / 'd e f' / 'g h' fragments -> single shingles
    assert out[(1, 3)] == (1, 3)


def test_remove_common_runs_cuts_best_span(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x y a b c d e f z q"),   # shares the 6-token run 'a..f'
            (3, "a b c x d e f x g h"),   # only single-shingle overlaps
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in dedup.remove_common_runs(df, pairs, shingle_k=3).collect()}
    # doc 2 loses its copy of 'a b c d e f' (6 tokens), doc 1 keeps it
    assert out[2]["src_id"] == 1
    assert out[2]["new_text"] == "x y z q"
    assert out[2]["removed_tokens"] == 6
    # doc 3: best island is a single shingle (3 tokens); the deterministic
    # tie-break (run DESC, src ASC, diag ASC, start ASC) picks 'd e f'
    # (diag 3-4=-1 sorts before 'a b c' at diag 0)
    assert out[3]["removed_tokens"] == 3
    assert out[3]["new_text"] == "a b c x x g h"
    assert 1 not in out  # id_a side always keeps its occurrence
    # min_run gate drops the weak doc-3 cut but keeps doc 2
    gated = {r["doc_id"] for r in dedup.remove_common_runs(df, pairs, shingle_k=3, min_run=2).collect()}
    assert gated == {2}


def test_curate_substring_dedup_stage(spark):
    """curate_corpus with substring_dedup_min_run cuts a pasted span from
    a below-threshold near-dup survivor and re-emits it as flat text."""
    from patent_decision_document_converter_spark.functions.cachereg import release_cached
    from patent_decision_document_converter_spark.plans.curate import curate_corpus

    # 24 space-separated pure-kanji tokens: survive conversion untouched,
    # shingle as words, and dominate the char-5-gram LSH signatures (the
    # single-char unique suffix keeps shingle Jaccard high enough that
    # the deterministic MinHash draw collides on a band)
    shared = (
        "共有 段落 重複 検出 対象 連続 範囲 部分 文書 内容 抽出 処理 "
        "手続 補正 理由 通知 書類 発明 請求 項目 記載 事項 検討 判断"
    )
    rows = [
        ("0", f"{shared} 零"),
        ("1", f"{shared} 壱"),
        ("2", "全然 違う 話題 です 独自 記述 のみ 含む 文章 構成"),
    ]
    docs = spark.createDataFrame(
        [
            (i, [{"kind": "text", "text": t, "media_ref": "", "offset": 0}])
            for i, t in rows
        ],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    curated, metrics = curate_corpus(
        docs,
        min_chars=5,
        min_tokens=1,
        min_distinct_permille=0,
        jaccard_threshold_tenths=10,   # doc-level dedup keeps both 0 and 1
        substring_dedup_min_run=2,
    )
    got = {r["doc_id"]: r for r in curated.collect()}
    release_cached()
    assert metrics["substring_cut_docs"] == 1
    assert set(got) == {"0", "1", "2"}
    # the higher doc_id lost the shared run; the lower kept its copy
    assert "重複" not in "".join(s["text"] for s in got["1"]["spans"])
    assert got["1"]["n_spans_out"] == 1
    assert "重複" in "".join(s["text"] for s in got["0"]["spans"])


def test_unigram_surprise_exact_bits(spark):
    """Hand-computed: corpus 'a a b' + 'b c' has counts a:2 b:2 c:1,
    N=5 → bits_total=3, bits(a)=bits(b)=2, bits(c)=1."""
    df = spark.createDataFrame(
        [(1, "a A b"), (2, "b c"), (3, ""), (4, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textstats.unigram_surprise(df).collect()}
    assert (out[1]["n_tokens"], out[1]["surprise_bits"], out[1]["mean_surprise_milli"]) == (3, 3, 1000)
    assert (out[2]["n_tokens"], out[2]["surprise_bits"], out[2]["mean_surprise_milli"]) == (2, 3, 1500)
    for blank in (3, 4):
        assert (out[blank]["n_tokens"], out[blank]["surprise_bits"]) == (0, 0)


def test_simhash_band_refinement_superset(spark):
    """Band refinement is monotone at ANY hamming threshold: a pair
    caught by a 30-bit band match is necessarily caught by 15-bit
    banding too (each 30-bit band splits into two 15-bit sub-bands that
    both match).  Unlike the pigeonhole-equality test (guaranteed region
    only), this covers the probabilistic recall region as well."""
    td = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    fps = dedup.simhash_fingerprints(td).persist()
    wide = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_dups(fps, max_hamming=40, band_bits=30).collect()
    }
    narrow = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_dups(fps, max_hamming=40, band_bits=15).collect()
    }
    fps.unpersist()
    assert wide <= narrow
    assert wide  # non-vacuous on this corpus


def test_remove_common_runs_output_is_contiguous_byte_cut(spark):
    """Invariant over a real corpus: every emitted doc is its ORIGINAL
    text with exactly ONE contiguous character span deleted — every kept
    byte identical to the source (casing/whitespace preserved), and the
    deleted span carries exactly ``removed_tokens`` raw tokens."""
    import re

    td = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = dedup.minhash_signatures(td)
    cands = dedup.minhash_lsh_candidates(sigs)
    out = dedup.remove_common_runs(td, cands, shingle_k=3).collect()
    assert out  # non-vacuous on this corpus
    texts = {r["doc_id"]: r["text"] for r in td.select("doc_id", "text").collect()}
    tok_re = re.compile(r"[^ \t\n\x0b\f\r]+")
    for r in out:
        orig, new, k = texts[r["doc_id"]], r["new_text"], r["removed_tokens"]
        # prefix up to first divergence is source bytes; remainder must be
        # a source suffix (byte-identical splice)
        p = 0
        while p < len(new) and new[p] == orig[p]:
            p += 1
        assert new[:p] == orig[:p], r["doc_id"]
        assert new[p:] == "" or orig.endswith(new[p:]), r["doc_id"]
        # the cut really removed k whitespace-delimited tokens
        assert len(tok_re.findall(orig)) - len(tok_re.findall(new)) == k, r["doc_id"]
        # token boundaries survive the splice: new tokens = orig tokens
        # minus one contiguous block of k
        ot, nt = tok_re.findall(orig), tok_re.findall(new)
        q = 0
        while q < len(nt) and nt[q] == ot[q]:
            q += 1
        assert ot[q + k:] == nt[q:], r["doc_id"]


def test_decontaminate_chunks_catches_buried_leak(spark):
    """A 20-token eval answer pasted into a 400-token doc is ~4.5% of
    the doc's shingles (doc-level ratio scan at 50% misses it) but 60%
    of the 32-token training window it lands in — the chunk-level scan
    flags exactly that window at the same 50% threshold."""
    answer = " ".join(f"ans{i}" for i in range(20))
    filler = [f"fill{i}" for i in range(400)]
    # paste at token offset 48 = 2 * stride(24): chunk 2 covers the leak
    train_text = " ".join(filler[:48]) + " " + answer + " " + " ".join(filler[48:380])
    train = spark.createDataFrame([(1, train_text)], "doc_id long, text string")
    evalset = spark.createDataFrame([(100, answer)], "doc_id long, text string")

    # doc-level overlap ratio is diluted far below the 50% threshold
    doc_hits = dedup.cross_ngram_overlap(train, evalset, shingle_k=3).collect()
    assert len(doc_hits) == 1 and doc_hits[0]["n_common"] == 18
    n_doc_shingles = train.select(
        F.size(dedup.shingles_from_tokens(dedup.tokens("text"), 3)).alias("n")
    ).head()["n"]
    assert 1000 * 18 < 500 * n_doc_shingles  # the doc-level scan misses it

    # the window-level scan flags the leaking chunk at the SAME threshold
    hits = dedup.decontaminate_chunks(
        train, evalset, chunk_tokens=32, overlap=8, shingle_k=3, min_permille=500
    ).collect()
    assert [(r["train_id"], r["chunk_id"], r["eval_id"]) for r in hits] == [(1, 2, 100)]
    assert hits[0]["n_common"] == 18  # all 18 answer shingles inside chunk 2
    assert hits[0]["n_chunk_shingles"] == 30
    assert hits[0]["permille"] == 600

    # sanity: a fully-duplicated short doc is caught by both
    train2 = spark.createDataFrame([(2, answer)], "doc_id long, text string")
    both = dedup.decontaminate_chunks(
        train2, evalset, chunk_tokens=32, overlap=8, shingle_k=3, min_permille=500
    ).collect()
    assert len(both) == 1 and both[0]["permille"] == 1000


def test_connected_components_checksum_mode_agrees(spark):
    edges = [(i, i + 1) for i in range(1, 10)] + [(50, 51), (51, 52), (70, 71)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    exact = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, convergence="exact").collect()
    }
    cksum = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, convergence="checksum").collect()
    }
    assert exact == cksum


# ---------------------------------------------------------------------------
# PDF/layout parse (operators/pdf.py)
# ---------------------------------------------------------------------------


def test_pdf_roundtrip_scrambled_layout():
    """Encoder emits runs in scrambled order; extraction must rebuild
    reading order from the (x, y) coordinates — both the FlateDecode and
    raw content-stream paths."""
    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    for doc_id in (0, 1, 4, 5):
        ref = f"pdf:{doc_id}"
        pages = pdfmod._synth_runs(ref, doc_id)
        assert len(pages) == (2 if doc_id % 4 == 0 else 1)
        payload = pdfmod._encode_pdf([], compress=doc_id % 2 == 0, pages=pages)
        assert payload.startswith(b"%PDF-1.4")
        n_lines = 3 + doc_id % 3
        expected = "\n".join(
            f"p({ln}) " + hashlib.md5(f"{ref}:{tag}{ln}".encode()).hexdigest()
            for tag in (("l", "p1l") if doc_id % 4 == 0 else ("l",))
            for ln in range(n_lines)
        )
        assert pdfmod.extract_pdf_text(payload) == expected


def test_pdf_tokenizer_full_operator_surface():
    """Hand-written content stream exercising every supported operator:
    Td relative moves, TD (sets leading), T* and ' (leading-driven next
    line), TJ arrays with kerning numbers, hex strings, octal escapes,
    nested balanced parens, and line continuation — none of which the
    synthesizer emits."""
    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    content = b"""BT /F1 12 Tf
1 0 0 1 72 700 Tm (line0 a) Tj
10 0 Td (line0 b) Tj
-10 -20 TD (line1) Tj
T* (line2 \\( nested (p) \\)) Tj
(quoted) '
[(li) -120 (ne3) 30 < 20 68 65 78>] TJ
1 0 0 1 72 600 Tm (oct\\101l and cont\\
inued) Tj
ET"""
    payload = pdfmod._encode_pdf([], compress=False, raw_content=content)
    text = pdfmod.extract_pdf_text(payload)
    # y=700: Tm run + Td run; y=680: TD (leading=20); y=660: T*;
    # y=640: ' (next line + show) and the TJ run share the line
    lines = text.splitlines()
    assert lines[0] == "line0 a line0 b"
    assert lines[1] == "line1"
    assert lines[2] == "line2 ( nested (p) )"
    assert lines[3] == "line3 hex quoted"  # TJ concat (kerning ignored) + hex string
    assert lines[4] == "octAl and continued"  # octal escape + line continuation


def test_pdf_xref_validation_rejects_corruption():
    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    payload = bytearray(pdfmod._encode_pdf([(72.0, 700.0, "hi")], compress=False))
    with pytest.raises(ValueError, match="not a PDF"):
        pdfmod.extract_pdf_text(b"JUNK" + bytes(payload))
    # corrupt the startxref pointer -> structural parse must fail loudly
    at = payload.rindex(b"startxref")
    num_start = at + len(b"startxref\n")
    num_end = payload.index(b"\n", num_start)
    bad = payload[:num_start] + b"7" + payload[num_start:num_end] + payload[num_end:]
    with pytest.raises(ValueError):
        pdfmod.extract_pdf_text(bytes(bad))


def test_pdf_spark_stages_shuffle_free(spark):
    """synth → extract over Spark: values match the plain-Python path
    and neither stage introduces an Exchange (partition-preserving
    mapInPandas only)."""
    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    out = pdfmod.pdf_extract_text_df(pdfmod.synth_pdf_table(docs))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 8
    for i in range(8):
        r = rows[str(i)]
        n_lines = (3 + i % 3) * (2 if i % 4 == 0 else 1)
        expected = "\n".join(
            f"p({ln}) " + hashlib.md5(f"pdf:{i}:{tag}{ln}".encode()).hexdigest()
            for tag in (("l", "p1l") if i % 4 == 0 else ("l",))
            for ln in range(3 + i % 3)
        )
        assert r["text"] == expected
        assert r["n_lines"] == n_lines
        assert r["n_chars"] == len(expected)


def test_enrich_media_spans_splices_and_passes_through(spark):
    """Media span WITH extracted text gets a media_text span right after
    it; media spans without extracted text and plain text spans pass
    through; offsets are densely renumbered from scrambled input order."""
    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    span_t = (
        "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    )
    docs = spark.createDataFrame(
        [
            # scrambled array order; media at offset 1 has text, offset 3 does not
            ("d1", [("media", "", "pdf:a", 1), ("text", "t0", "", 0),
                    ("media", "", "img:x", 3), ("text", "t2", "", 2)]),
            ("d2", [("text", "only", "", 0)]),  # no media at all
        ],
        f"doc_id string, spans {span_t}",
    )
    mt = spark.createDataFrame(
        [("d1", "pdf:a", "EXTRACTED")], "doc_id string, media_ref string, text string"
    )
    out = {r["doc_id"]: r["spans"] for r in pdfmod.enrich_media_spans(docs, mt).collect()}
    d1 = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out["d1"]]
    assert d1 == [
        ("text", "t0", "", 0),
        ("media", "", "pdf:a", 1),
        ("media_text", "EXTRACTED", "pdf:a", 2),
        ("text", "t2", "", 3),
        ("media", "", "img:x", 4),
    ]
    d2 = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in out["d2"]]
    assert d2 == [("text", "only", "", 0)]


def test_enrich_media_spans_randomized_invariant(spark):
    """Seeded-random corpus, exact equality against a Python reference:
    output offsets are dense 0..n-1 in input-offset order, every matched
    media span is followed immediately by its media_text span, unmatched
    media / text spans and empty docs pass through — the north-rule
    (kind, text, media_ref, order) invariant under 40 random docs."""
    import random

    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    rng = random.Random(20260817)
    docs_rows, mt_rows, expected = [], [], {}
    for d in range(40):
        did = f"doc{d}"
        n = rng.randint(0, 8)
        kinds = [rng.choice(["text", "media"]) for _ in range(n)]
        offsets = list(range(n))
        rng.shuffle(offsets)
        spans = []
        for i, (k, off) in enumerate(zip(kinds, offsets)):
            ref = f"m{i}" if k == "media" else ""
            spans.append((k, f"t{d}_{i}" if k == "text" else "", ref, off))
        docs_rows.append((did, spans))
        matched = {}
        for i, k in enumerate(kinds):
            if k == "media" and rng.random() < 0.5:
                matched[f"m{i}"] = f"X{d}_{i}"
                mt_rows.append((did, f"m{i}", f"X{d}_{i}"))
        if rng.random() < 0.2:  # decoys that match no media span
            mt_rows.append((did, "m_nope", "junk"))
        # python reference: order by offset, splice, renumber densely
        out, j = [], 0
        for k, t, ref, _off in sorted(spans, key=lambda x: x[3]):
            out.append((k, t, ref, j)); j += 1
            if k == "media" and ref in matched:
                out.append(("media_text", matched[ref], ref, j)); j += 1
        expected[did] = out

    span_t = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
    docs = spark.createDataFrame(docs_rows, f"doc_id string, spans {span_t}")
    mt = spark.createDataFrame(mt_rows, "doc_id string, media_ref string, text string")
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in pdfmod.enrich_media_spans(docs, mt).collect()
    }
    assert got == expected


def test_pdf_permissive_mode_survives_corrupt_payloads(spark):
    """A corrupt payload in strict mode kills the stage; in permissive
    mode the row carries NULL text + the parser error and good rows are
    unaffected."""
    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    good = pdfmod._encode_pdf([(72.0, 700.0, "ok")], compress=False)
    media = spark.createDataFrame(
        [("g", "pdf:g", bytearray(good)), ("b", "pdf:b", bytearray(b"%PDF-garbage"))],
        "doc_id string, media_ref string, payload binary",
    )
    out = {r["doc_id"]: r for r in pdfmod.pdf_extract_text_df(media, permissive=True).collect()}
    assert out["g"]["text"] == "ok" and out["g"]["error"] is None
    assert out["b"]["text"] is None and "startxref" in out["b"]["error"]
    with pytest.raises(Exception):
        pdfmod.pdf_extract_text_df(media).collect()


def test_extract_main_content_dispatch_legs(spark):
    """Format routing: html → boilerplate-stripped main text (nav
    dropped, all-boilerplate doc kept as NULL), pdf → layout text,
    xml → CDATA-aware tag strip, txt → whitespace normalize,
    unknown → NULL with format echoed."""
    from patent_decision_document_converter_spark.operators import extract as exmod
    from patent_decision_document_converter_spark.operators import pdf as pdfmod

    good_pdf = pdfmod._encode_pdf([(72.0, 700.0, "pdf body")], compress=True)
    long_p = "x" * 60
    rows = [
        ("h1", "html:h1", "html",
         f'<div><a href="#">navnav</a></div><p>{long_p}</p>'.encode()),
        ("h2", "html:h2", "html",
         b'<div><a href="#">only boilerplate nav</a></div>'),
        ("p1", "pdf:p1", "pdf", good_pdf),
        ("t1", "txt:t1", "txt", b"  a\n\n b\t"),
        ("x1", "xml:x1", "xml",
         b'<?xml version="1.0"?><doc><!-- c --><t a="1">T1 &amp; T2</t>'
         b"<body><![CDATA[cdata <kept> text]]></body></doc>"),
        ("u1", "bin:u1", "mp4", b"\x00\x01"),
        # NULL format must NOT be silently dropped (NULL fails every
        # equality filter AND the negated isin) — it degrades loudly
        # through the `other` leg like any unknown format
        ("n1", "bin:n1", None, b"\x00"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, format string, payload binary"
    )
    out = {r["doc_id"]: r for r in exmod.extract_main_content(media).collect()}
    assert len(out) == 7
    assert out["n1"]["main_text"] is None and out["n1"]["format"] is None
    assert out["n1"]["error"] == "unsupported format"
    assert out["h1"]["main_text"] == long_p
    assert out["h2"]["main_text"] is None and out["h2"]["format"] == "html"
    assert out["p1"]["main_text"] == "pdf body"
    assert out["t1"]["main_text"] == "a b"
    assert out["u1"]["main_text"] is None and out["u1"]["format"] == "mp4"
    assert out["u1"]["error"] == "unsupported format"
    # xml: prolog/comment/tags stripped, entity decoded, CDATA text
    # KEPT verbatim (angle brackets inside CDATA are content, not tags)
    assert out["x1"]["main_text"] == "T1 & T2 cdata <kept> text"
    assert all(out[k]["error"] is None for k in ("h1", "h2", "p1", "t1", "x1"))

    # permissive PDF leg surfaces the parser message in `error`
    rows_bad = rows + [("p2", "pdf:p2", "pdf", b"%PDF-corrupt")]
    media_bad = spark.createDataFrame(
        rows_bad, "doc_id string, media_ref string, format string, payload binary"
    )
    out_bad = {
        r["doc_id"]: r
        for r in exmod.extract_main_content(media_bad, permissive_pdf=True).collect()
    }
    assert out_bad["p2"]["main_text"] is None and "startxref" in out_bad["p2"]["error"]
    assert out_bad["p1"]["main_text"] == "pdf body" and out_bad["p1"]["error"] is None


def test_jpeg_roundtrip_constant_blocks_exact():
    """Baseline JPEG with all-ones quant is EXACTLY lossless for blocks
    that are constant per channel (every AC coefficient analytically
    zero): gray round-trips byte-exact, color round-trips through the
    fixed-point YCbCr conversion — checked against an independent
    recomputation of that integer math."""
    pix = bytes([7] * 64 + [200] * 64)  # 8x16 gray, two stacked blocks
    f = multimodal._decode_jpeg(multimodal._encode_jpeg(pix, 8, 16, gray=True))
    assert f == [8.0, 16.0, float(7 * 64 + 200 * 64)]

    d = hashlib.md5(b"jr:42:p0").digest()
    blocks = [(d[3 * j], d[3 * j + 1], d[3 * j + 2]) for j in range(4)]
    pixels = bytearray(16 * 16 * 3)
    for j, color in enumerate(blocks):
        by, bx = divmod(j, 2)
        for yy in range(8):
            row = ((by * 8 + yy) * 16 + bx * 8) * 3
            pixels[row : row + 24] = bytes(color) * 8
    f = multimodal._decode_jpeg(multimodal._encode_jpeg(bytes(pixels), 16, 16))
    want = [0, 0, 0]
    for r, g, b in blocks:
        r2, g2, b2 = multimodal._jpeg_ycc_to_rgb(*multimodal._jpeg_rgb_to_ycc(r, g, b))
        want[0] += 64 * r2
        want[1] += 64 * g2
        want[2] += 64 * b2
    assert f == [16.0, 16.0] + [float(x) for x in want]


def test_jpeg_arbitrary_pixels_near_lossless_and_profile_raises():
    """Arbitrary (non-constant) pixels exercise the full huffman AC
    path: with all-ones quant the decode error is bounded by DCT
    rounding (≤2 per sample here).  Unsupported profiles fail loudly:
    progressive SOF2 and subsampled 4:2:0 raise, mirroring the PNG
    profile contract."""
    rng = [(i * 37 + (i * i) % 61) % 256 for i in range(8 * 8 * 3)]
    pix = bytes(rng)
    jp = multimodal._encode_jpeg(pix, 8, 8)
    w, h, sr, sg, sb = multimodal._decode_jpeg(jp)
    assert (w, h) == (8.0, 8.0)
    want = [sum(pix[i] for i in range(c, 192, 3)) for c in range(3)]
    for a, b in zip(want, (sr, sg, sb)):
        assert abs(a - b) <= 2 * 64  # ≤2 per sample

    with pytest.raises(ValueError, match="SOF marker 0xc2"):
        multimodal._decode_jpeg(jp[:2] + b"\xff\xc2" + jp[4:])
    sub = bytearray(jp)
    sof = jp.index(b"\xff\xc0")
    sub[sof + 11] = 0x22  # luma sampling 2x2 -> 4:2:0 (marker+len+P+Y+X+Nf+Cid)
    with pytest.raises(ValueError, match="subsampling"):
        multimodal._decode_jpeg(bytes(sub))
    with pytest.raises(ValueError, match="not a JPEG"):
        multimodal._decode_jpeg(b"nope")


def test_jpeg_synth_decode_spark(spark):
    """End-to-end JPEG path on Spark: genuine synthesized baseline JPEGs
    (SOI/DQT/SOF0/DHT/SOS framing verified) decode via the Arrow-batched
    real path to channel sums matching an independent md5-chain +
    fixed-point-color reconstruction — the same math the DuckDB oracle
    replays in media_features_jpeg."""
    docs = spark.createDataFrame([(3,), (4,)], "doc_id long")
    media = multimodal.synth_media_table_jpeg(docs)
    rows = {r["doc_id"]: r for r in media.collect()}
    payload = bytes(rows["3"]["payload"])
    assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
    assert b"\xff\xc0" in payload and b"\xff\xc4" in payload  # SOF0 + DHT
    assert rows["3"]["format"] == "jpeg"

    feats = {
        r["doc_id"]: r["features"]
        for r in multimodal.decode_media(media, impl="real").collect()
    }
    for did in ("3", "4"):
        d = hashlib.md5(f"jr:{did}:p0".encode()).digest()
        want = [0, 0, 0]
        for j in range(4):
            r2, g2, b2 = multimodal._jpeg_ycc_to_rgb(
                *multimodal._jpeg_rgb_to_ycc(d[3 * j], d[3 * j + 1], d[3 * j + 2])
            )
            want[0] += 64 * r2
            want[1] += 64 * g2
            want[2] += 64 * b2
        assert feats[did] == [16.0, 16.0] + [float(x) for x in want]


def test_shingle_explode_filters_never_reinline_the_hof_chain(docs):
    """Plan guard for stage_barrier (dedup.py): exploding a staged
    shingle array must not let InferFiltersFromGenerate's size/notnull
    filter be predicate-pushed below the staging projection — the pushed
    copy re-inlines the whole tokenize/shingle chain into a Filter node
    (with split() inside the per-element lambda: the interpreted-HOF
    O(n²) pitfall) and, under the parallelism floor, into the 1-split
    scan stage on ONE task.  Invariant: no Filter node carries the
    shingle HOF subtree; it must only appear in Project nodes."""
    queries = {
        "jaccard": dedup.ngram_jaccard_pairs(docs, threshold_tenths=0),
        "decontaminate": dedup.cross_ngram_overlap(
            docs.filter(F.col("doc_id") > 1),
            docs.filter(F.col("doc_id") <= 1),
            min_common=1,
            max_eval_df=5,
        ),
        "chunks": dedup.decontaminate_chunks(
            docs.filter(F.col("doc_id") > 1), docs.filter(F.col("doc_id") <= 1)
        ),
    }
    for name, q in queries.items():
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "array_distinct(transform" in plan, name  # chain present
        bad = [
            ln
            for ln in plan.splitlines()
            if "Filter " in ln and "array_distinct(transform" in ln
        ]
        assert not bad, (name, bad[:1])


def test_bloom_membership_filter(spark):
    """Bloom semantics: NO false negatives (every reference row flags
    True), false positives possible and deterministic; null text flags
    False; membership independent of partitioning; a pure-Python bit
    replay of the md5 positions agrees row-for-row."""
    import hashlib

    ref_rows = [(i, f"ref doc {i} körper 本文") for i in range(40)]
    other_rows = [(100 + i, f"probe doc {i} different") for i in range(200)]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(
        ref_rows + other_rows + [(999, None)], "doc_id long, text string"
    )
    n_bits, k = 256, 3
    bitmap = dedup.bloom_build(ref, n_bits=n_bits, n_hashes=k)
    out = {
        r["doc_id"]: r["in_ref"]
        for r in dedup.bloom_might_contain(
            corpus, bitmap, n_bits=n_bits, n_hashes=k
        ).collect()
    }
    # no false negatives
    assert all(out[i] for i, _ in ref_rows)
    # null text -> False, never a crash
    assert out[999] is False
    # pure-Python replay of positions + bit test matches every row
    set_bits = set()
    def positions(text):
        return [
            int(hashlib.md5(f"{text}:bloom{i}".encode()).hexdigest()[:15], 16) % n_bits
            for i in range(k)
        ]
    for _, t in ref_rows:
        set_bits.update(positions(t))
    for did, t in ref_rows + other_rows:
        assert out[did] == all(p in set_bits for p in positions(t)), did
    # deterministic under repartitioning (build AND probe)
    bitmap2 = dedup.bloom_build(ref.repartition(7), n_bits=n_bits, n_hashes=k)
    assert bitmap2 == bitmap
    out2 = {
        r["doc_id"]: r["in_ref"]
        for r in dedup.bloom_might_contain(
            corpus.repartition(5), bitmap, n_bits=n_bits, n_hashes=k
        ).collect()
    }
    assert out2 == out
