from __future__ import annotations

from pyspark.sql import functions as F

from radiant_portal_pipeline_spark.operators.registry import load_table
from radiant_portal_pipeline_spark.sim import ann
from radiant_portal_pipeline_spark.text import dedup as D


def test_minhash_lsh_recall_vs_exact(spark, sf_correct):
    """On this deterministic corpus, LSH + exact-verify must find every
    pair the exhaustive shared-shingle path finds at the threshold."""
    docs = load_table(spark, sf_correct, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.exact_jaccard_pairs(docs, threshold=0.4).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_dedup(docs, threshold=0.4).collect()
    }
    assert exact, "corpus should contain near-dup pairs"
    missed = exact - lsh
    assert not missed, f"LSH missed {len(missed)}/{len(exact)} pairs"
    # precision is exact by construction (candidates verified with true jaccard)
    assert lsh <= exact


def test_simhash_pairs_sane(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    pairs = D.simhash_near_pairs(docs, max_hamming=6).collect()
    assert pairs, "should find some near pairs in a small-vocab corpus"
    for r in pairs:
        assert r["doc_a"] < r["doc_b"]
        assert 0 <= r["hamming"] <= 6


def test_simhash_is_deterministic(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents")
    a = sorted(map(tuple, D.simhash64(docs).collect()))
    b = sorted(map(tuple, D.simhash64(docs).collect()))
    assert a == b


def test_ivf_topk_recall_vs_brute_force(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").between(1, 8)).collect()
    ]
    bf = [r["vec_id"] for r in ann.brute_force_topk(emb, qvec, k=10).collect()]
    ivf = [r["vec_id"] for r in ann.ivf_topk(emb, cents, qvec, k=10, n_probes=2).collect()]
    overlap = len(set(bf) & set(ivf))
    # 2/8 probes on clustered data: expect decent recall, deterministic here
    assert overlap >= 5, f"IVF recall too low: {overlap}/10 (bf={bf}, ivf={ivf})"


def test_ivf_bucket_assignment_total(spark, sf_correct):
    emb = load_table(spark, sf_correct, "embeddings")
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").between(1, 8)).collect()
    ]
    assigned = ann.assign_ivf_buckets(emb, cents)
    assert assigned.count() == emb.count()
    buckets = {r["bucket"] for r in assigned.select("bucket").distinct().collect()}
    assert buckets <= {c for c, _ in cents}


def test_kmeans_training_converges(spark, sf_correct):
    from radiant_portal_pipeline_spark.sim.kmeans import (
        inertia_proxy,
        train_kmeans,
    )

    emb = load_table(spark, sf_correct, "embeddings")
    cents, hist = train_kmeans(emb, k=8, iters=4)
    assert len(cents) >= 2 and len(cents[0][1]) == 64
    assert len(hist) == 4
    assert inertia_proxy(hist), f"mean cosine degraded: {hist}"
    assert hist[-1] > hist[0], f"no improvement over init: {hist}"
    # trained centroids beat the arbitrary init for IVF recall
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    bf = [r["vec_id"] for r in ann.brute_force_topk(emb, qvec, k=10).collect()]
    ivf = [
        r["vec_id"]
        for r in ann.ivf_topk(emb, cents, qvec, k=10, n_probes=2).collect()
    ]
    assert len(set(bf) & set(ivf)) >= 7


def test_media_metadata_matches_direct_compute(spark, sf_correct):
    """The PNG decode path end-to-end: encode real PNGs in one
    mapInPandas stage, decode them in another, check dims + checksum
    against the pixel-generator arithmetic."""
    from radiant_portal_pipeline_spark.multimodal.binary import (
        extract_media_metadata,
        png_dims,
        to_binary_docs,
    )

    docs = load_table(spark, sf_correct, "documents").limit(50)
    got = {
        r["doc_id"]: (r["width"], r["height"], r["red_checksum"])
        for r in extract_media_metadata(to_binary_docs(docs)).collect()
    }
    for r in docs.select("doc_id").collect():
        d = r["doc_id"]
        w, h = png_dims(d)
        expect = sum((d + 3 * x + 7 * y) % 256 for y in range(h) for x in range(w))
        assert got[d] == (w, h, expect)


def test_png_codec_rejects_corruption():
    """A real decoder must notice corruption: flip a byte inside IDAT
    (CRC check) and truncate the stream (chunk-walk bounds)."""
    import pytest

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    good = C.synth_png(7, 12, 9)
    assert C.decode_png(good)["width"] == 12
    corrupted = bytearray(good)
    corrupted[60] ^= 0xFF  # inside the first IDAT's data
    with pytest.raises(ValueError):
        C.decode_png(bytes(corrupted))
    with pytest.raises(ValueError):
        C.decode_png(good[: len(good) // 2])


def test_dedup_groups_connected_components(spark):
    from radiant_portal_pipeline_spark.text.dedup import dedup_groups

    pairs = spark.createDataFrame(
        # two components: {1,2,3,7} (chain), {5,9}; 4/8 absent from graph
        [(1, 2), (2, 3), (3, 7), (5, 9)],
        "doc_a long, doc_b long",
    )
    got = {(r["node"], r["label"]) for r in dedup_groups(pairs).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (7, 1), (5, 5), (9, 5)}


def test_simhash_band_recall_is_exact_at_max_hamming(spark, sf_correct):
    """Pigeonhole contract: with max_hamming+1 bands, EVERY pair within
    the advertised distance is found — verify against the O(n^2)
    ground truth on the test corpus."""
    from radiant_portal_pipeline_spark.text.dedup import simhash64, simhash_near_pairs
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_correct}/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_pairs(docs, max_hamming=6).collect()
    }
    sh = simhash64(docs)
    a, b = sh.alias("a"), sh.alias("b")
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .filter(F.col("h") <= 6)
        .collect()
    }
    assert got == truth  # exact recall AND precision


def test_ivf_indexed_path_prunes_files_and_matches_onthefly(spark, sf_correct, tmp_path):
    """The persisted index must (a) return exactly what the on-the-fly
    IVF search returns and (b) open ONLY the probed buckets' files."""
    emb = load_table(spark, sf_correct, "embeddings")
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    cents = [
        (int(r["vec_id"]), list(r["embedding"]))
        for r in emb.filter(F.col("vec_id").between(1, 8)).collect()
    ]
    index = ann.build_ivf_index(spark, emb, cents, str(tmp_path / "ivf"))
    probe_ids = ann.rank_probe_buckets(cents, qvec, n_probes=2)
    pruned = index.live_files(partitions=probe_ids)
    assert 0 < len(pruned) < len(index.live_files())
    got = [
        tuple(r) for r in ann.ivf_topk_indexed(index, cents, qvec, k=10, n_probes=2).collect()
    ]
    want = [
        tuple(r) for r in ann.ivf_topk(emb, cents, qvec, k=10, n_probes=2).collect()
    ]
    assert got == want


def test_wav_bmp_parsers_roundtrip_and_reject_garbage():
    import pytest

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    w = C.parse_wav(C.synth_wav(n_frames=441, sample_rate=44100, n_channels=2))
    assert (w["n_frames"], w["sample_rate"], w["n_channels"], w["bits"]) == (
        441, 44100, 2, 16,
    )
    b = C.parse_bmp(C.synth_bmp(width=31, height=7))
    assert (b["width"], b["height"], b["bpp"]) == (31, 7, 24)
    with pytest.raises(ValueError):
        C.parse_wav(b"\x00" * 64)
    with pytest.raises(ValueError):
        C.parse_bmp(b"\x00" * 64)


def test_lsh_vector_near_dup_recall_matches_theory(spark, sf_correct):
    """Random-hyperplane banding recall at threshold c follows
    1-(1-p^4)^4 with p = 1 - arccos(c)/pi. At c=0.3 that's ~0.43 for
    pairs NEAR the threshold (higher for true near-dups, ->1 as c->1).
    Assert the measured recall sits in the theoretical ballpark and
    precision is exact (every emitted pair verified >= threshold)."""
    emb = load_table(spark, sf_correct, "embeddings")
    q = emb.select("vec_id", ann.quantized(F.col("embedding")).alias("qv"))
    a, b = q.alias("a"), q.alias("b")
    truth = {
        (r["vec_a"], r["vec_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            ann.cosine_q(F.col("a.qv"), F.col("b.qv")).alias("c"),
        )
        .filter(F.col("c") >= 0.3)
        .collect()
    }
    got = ann.lsh_vector_near_dup_pairs(emb, threshold=0.3)
    pairs = {(r["vec_a"], r["vec_b"]) for r in got.collect()}
    assert pairs <= truth  # exact precision (cosine verify)
    recall = len(pairs & truth) / len(truth)
    assert 0.3 <= recall, f"recall {recall} collapsed below theory floor"


def test_dedup_groups_string_ids(spark):
    """Non-numeric node ids (hash-string doc ids) must converge via the
    join-based fallback — the sum-based convergence check is only valid
    for exact numeric labels (round-2 review finding)."""
    from radiant_portal_pipeline_spark.text.dedup import dedup_groups

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],  # 3-hop chain
        "doc_a string, doc_b string",
    )
    got = {(r["node"], r["label"]) for r in dedup_groups(pairs).collect()}
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("x", "x"), ("y", "x"),
    }


def test_pcm_feature_extraction_matches_generator():
    from radiant_portal_pipeline_spark.multimodal import codecs as C

    b = C.synth_wav_pcm(7, n_frames=100, sample_rate=8000)
    f = C.extract_pcm_features(b)
    want = [abs(((7 * 31 + i * 17) % 256) - 128) for i in range(100)]
    assert f["n_frames"] == 100 and f["sample_rate"] == 8000
    assert f["peak"] == max(want) and f["sum_abs"] == sum(want)


def test_bmp_resize_handles_padding_and_row_order():
    from radiant_portal_pipeline_spark.multimodal import codecs as C

    # width 3 -> 9 data bytes per row + 3 pad bytes (exercises stride)
    b = C.synth_bmp_pixels(5, width=3, height=4)
    r = C.resize_bmp_nearest(b, step=2)
    assert (r["out_w"], r["out_h"]) == (2, 2)
    # sampled pixels: (x,y) in {0,2} x {0,2}, blue = (5 + 3x + 7y) % 256
    want = sum((5 + 3 * x + 7 * y) % 256 for y in (0, 2) for x in (0, 2))
    assert r["blue_checksum"] == want


def test_bmp_resize_honors_offset_and_top_down():
    """Real-file shapes the round-3 review flagged: a V4/V5-style
    pixel-array offset past 54, and a negative-height (top-down) BMP
    must not be flipped."""
    import struct

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    base = C.synth_bmp_pixels(5, width=4, height=4)
    want = C.resize_bmp_nearest(base, step=2)

    # shift the pixel array 16 bytes right and patch bfOffBits
    shifted = bytearray(base[:54]) + bytearray(16) + bytearray(base[54:])
    shifted[10:14] = struct.pack("<I", 54 + 16)
    assert C.resize_bmp_nearest(bytes(shifted), step=2) == want

    # top-down variant: negate biHeight, store rows top-down (= reverse
    # the bottom-up row blocks of the original body)
    row_bytes = (4 * 3 + 3) // 4 * 4
    body = base[54:]
    rows = [body[i * row_bytes:(i + 1) * row_bytes] for i in range(4)]
    td = bytearray(base[:54]) + bytearray(b"".join(reversed(rows)))
    td[22:26] = struct.pack("<i", -4)
    assert C.resize_bmp_nearest(bytes(td), step=2) == want


def test_pcm_peak_not_negative_on_full_scale_sample():
    import struct

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    body = struct.pack("<4h", -32768, 100, -5, 32767)
    b = (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
         + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
         + b"data" + struct.pack("<I", len(body)) + body)
    f = C.extract_pcm_features(b)
    assert f["peak"] == 32768  # |−32768| — would be negative under int16 abs
    assert f["sum_abs"] == 32768 + 100 + 5 + 32767


def test_y4m_frame_sampling_roundtrip_and_reject_garbage():
    import pytest

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    b = C.synth_y4m(3, width=8, height=6, n_frames=5)
    s = C.sample_y4m_frames(b, step=2)
    assert (s["width"], s["height"], s["n_frames"], s["n_sampled"]) == (8, 6, 5, 3)
    want = sum(
        (3 + 13 * f + 5 * i) % 256 for f in (0, 2, 4) for i in range(48)
    )
    assert s["y_checksum"] == want
    with pytest.raises(ValueError):
        C.sample_y4m_frames(b"\x00" * 32)


def test_dedup_groups_durable_checkpointing(spark, tmp_path):
    """durable=True materializes every round to storage (executor-loss
    safe on a cluster) and must produce the identical components; the
    checkpointer must clean superseded rounds and close() the rest."""
    import os

    from radiant_portal_pipeline_spark.checkpoint import IterCheckpointer
    from radiant_portal_pipeline_spark.text.dedup import dedup_groups

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    base = str(tmp_path / "cc")
    ck = IterCheckpointer(durable=True, base_dir=base)
    got = {(r["node"], r["label"]) for r in dedup_groups(pairs, ck=ck).collect()}
    want = {(r["node"], r["label"]) for r in dedup_groups(pairs).collect()}
    assert got == want
    # the final labels frame is still held (durable files backing it)
    assert any(d.startswith("cut-") for d in os.listdir(base))
    ck.close()
    assert not any(os.listdir(os.path.join(base, d)) for d in os.listdir(base)) or not os.listdir(base)


def test_iter_checkpointer_requires_base_dir():
    import pytest

    from radiant_portal_pipeline_spark.checkpoint import IterCheckpointer

    with pytest.raises(ValueError):
        IterCheckpointer(durable=True)


def test_jpeg_codec_lossy_roundtrip_within_spec_accuracy():
    """General (non-constant) images through the baseline JPEG encoder
    + decoder: the reconstruction must stay within normal baseline-JPEG
    error for smooth content (the gated m_jpeg_decode query covers the
    value-EXACT constant-block case; this covers the AC coefficient
    machinery — runlengths, ZRL, negative coefficients, byte
    stuffing)."""
    import numpy as np

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    # smooth gradient: quantization error stays small and local
    px = (
        (np.add.outer(np.arange(24) * 2.0, np.arange(40) * 1.5)) % 200 + 20
    ).astype(np.uint8)
    dec = C.decode_jpeg(C.encode_jpeg_gray(px), return_pixels=True)
    assert (dec["width"], dec["height"]) == (40, 24)
    err = np.abs(dec["pixels"].astype(int) - px.astype(int))
    assert err.max() <= 24 and err.mean() < 6.0, (err.max(), err.mean())

    # high-frequency content exercises ZRL / long AC runs / negatives
    hf = ((np.indices((16, 16)).sum(0) % 2) * 180 + 30).astype(np.uint8)
    dec2 = C.decode_jpeg(C.encode_jpeg_gray(hf), return_pixels=True)
    assert dec2["pixels"].shape == (16, 16)
    # checkerboard at Nyquist survives as a checkerboard (correlation,
    # not exactness — the quantizer is coarse at high frequency)
    rec = dec2["pixels"].astype(float)
    pattern = (np.indices((16, 16)).sum(0) % 2).astype(float)
    corr = np.corrcoef(rec.ravel(), pattern.ravel())[0, 1]
    assert corr > 0.9, corr


def test_jpeg_codec_rejects_corruption():
    import pytest

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    good = C.synth_jpeg(7, 16, 16)
    assert C.decode_jpeg(good)["width"] == 16
    with pytest.raises(ValueError):
        C.decode_jpeg(b"\x00\x01" + good[2:])  # bad SOI
    with pytest.raises(ValueError):
        C.decode_jpeg(good[:40])  # truncated before SOS


def test_mp3_parser_walks_frames_and_rejects_desync():
    import pytest

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    b = C.synth_mp3(5, 7)
    m = C.parse_mp3(b)
    assert m["n_frames"] == 7 and m["bitrate_kbps"] == C._MP3_BITRATES[5 % 14 + 1]
    # flip one header byte -> sync is lost mid-stream, parser must raise
    corrupted = bytearray(b)
    # second frame starts after frame 1's computed length
    flen = C._mp3_frame_len(m["bitrate_kbps"], m["sample_rate"], 0)
    corrupted[flen] = 0x00
    with pytest.raises(ValueError):
        C.parse_mp3(bytes(corrupted))
    with pytest.raises(ValueError):
        C.parse_mp3(b[: flen + 2])  # truncated frame header


def test_mp3_parser_skips_id3_tags():
    """Nearly all real MP3s carry ID3v2 (leading) and/or ID3v1
    (trailing) metadata; the walker must skip both (round-4 advisor)
    and still reject genuinely foreign leading/trailing bytes."""
    import pytest

    from radiant_portal_pipeline_spark.multimodal import codecs as C

    frames = C.synth_mp3(3, 5)
    plain = C.parse_mp3(frames)

    # ID3v2: 'ID3' + ver(2) + flags + 4-byte SYNCHSAFE size, then body
    body = b"TALB\x00\x00\x00\x05\x00\x00\x00albumTIT2\x00\x00\x00\x03\x00\x00abc"
    size = len(body)
    synchsafe = bytes(
        [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
    )
    id3v2 = b"ID3\x04\x00\x00" + synchsafe + body
    # ID3v1: trailing 128-byte 'TAG' block
    id3v1 = (b"TAG" + b"title".ljust(30, b"\x00") + b"artist".ljust(30, b"\x00")
             + b"\x00" * 65)
    assert len(id3v1) == 128

    tagged = C.parse_mp3(id3v2 + frames + id3v1)
    assert tagged == plain  # tags are transparent to the frame walk

    with pytest.raises(ValueError, match="truncated ID3v2"):
        C.parse_mp3(id3v2[:12])  # tag header claims more than the buffer
    with pytest.raises(ValueError, match="lost frame sync"):
        C.parse_mp3(b"\x00\x00" + frames)  # non-ID3 leading bytes still raise
    with pytest.raises(ValueError, match="lost frame sync"):
        C.parse_mp3(frames + b"\x00" * 7)  # non-ID3v1 trailer: desync
    with pytest.raises(ValueError, match="trailing bytes"):
        C.parse_mp3(frames + b"\x00" * 3)  # sub-header trailer still raises


def test_shingle_oracle_parity_on_short_docs(spark):
    """Round-5 review finding #6: Spark's word_shingles emits ONE short
    shingle for 1-2-token documents (slice truncates); the DuckDB
    oracles' shingle CTE must match exactly on those edge lengths or a
    short doc in a future SF regeneration would hash-mismatch the now
    value-adjudicated MinHash gate."""
    import duckdb
    import pandas as pd

    from radiant_portal_pipeline_spark.text import dedup as D

    texts = ["", "one", "one two", "one two three", "a b c d e"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got_spark = sorted(
        (r["doc_id"], r["shingle"])
        for r in D.word_shingles(docs, k=3).collect()
    )
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": range(len(texts)),
                                            "text": texts}))
    toks = ("LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\\s+'), "
            "t -> t <> '')")
    got_duck = sorted(
        (int(a), b)
        for a, b in con.execute(f"""
            WITH d AS (SELECT doc_id, {toks} AS w FROM documents),
            sh AS (SELECT doc_id, UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
                RANGE(1, GREATEST(LEN(w) - 1, 2)),
                i -> ARRAY_TO_STRING(w[i::INT:(i::INT + 2)], ' ')))) AS shingle
            FROM d)
            SELECT doc_id, shingle FROM sh WHERE shingle <> ''
        """).fetchall()
    )
    assert got_spark == got_duck
    # the 1- and 2-token docs DO emit a (short) shingle on both sides
    assert (1, "one") in got_spark and (2, "one two") in got_spark


def test_decontaminate_flags_overlap_and_spares_clean_docs(spark):
    """Decontamination contract on a constructed corpus: a training doc
    sharing a 3-shingle with the eval set is flagged with the right hit
    count; a clean doc is not; short docs behave."""
    from radiant_portal_pipeline_spark.text.dedup import decontaminate

    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox ran away"),  # shares 2 shingles
            (2, "completely different words here"),  # clean
            (3, "quick brown"),  # short doc, shingle 'quick brown' != any 3-shingle
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_eval_shingle_hits"], r["contaminated"])
        for r in decontaminate(train, eval_docs, k=3).collect()
    }
    # eval shingles: {the quick brown, quick brown fox, brown fox jumps}
    assert got[1] == (2, True), got  # 'the quick brown', 'quick brown fox'
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_quantize_py_bit_exact_vs_spark(spark, sf_correct):
    """The driver-side quantizer (used for the constant query/centroid
    side of cosine scoring, so hot paths don't pay a Spark job per
    quantization) must reproduce Spark's ROUND HALF_UP integers and the
    IEEE norm EXACTLY — over every vector in the corpus, not a sample."""
    import math

    emb = load_table(spark, sf_correct, "embeddings")
    rows = emb.select(
        "vec_id",
        "embedding",
        ann.quantized(F.col("embedding")).alias("q"),
        ann.norm_d(ann.quantized(F.col("embedding"))).alias("n"),
    ).collect()
    assert rows
    for r in rows:
        pq = ann.quantize_py(list(r["embedding"]))
        assert pq == list(r["q"]), f"vec {r['vec_id']} quantization drift"
        pn = math.sqrt(float(sum(x * x for x in pq)))
        assert pn == r["n"], f"vec {r['vec_id']} norm drift"
