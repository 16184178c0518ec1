"""LLM-data-pipeline operator tests: dedup, similarity, text,
multimodal (north-star components, BASELINE.json)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from healthcare_data_lakehouse_using_gcp_spark.operators import (
    dedup,
    multimodal,
    similarity,
    text,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup
    (3, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # near
    (4, "completely different text about spark query engines and distributed joins"),
    (5, "!!! ??? ,,,"),  # punctuation junk
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    groups = dedup.exact_dedup(docs).collect()
    assert len(groups) == 4  # docs 1+2 collapse
    dup = next(g for g in groups if g["dup_count"] == 2)
    assert dup["canonical_id"] == 1
    kept = dedup.drop_exact_duplicates(docs)
    assert kept.count() == 4
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4, 5}


def test_minhash_near_dup(spark, docs):
    pairs = dedup.minhash_dedup(docs, threshold=0.5, shingle_size=3).collect()
    keys = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (1, 2) in keys  # exact dups always pass
    assert (1, 3) in keys or (2, 3) in keys  # near dup caught
    assert all({p["id_a"], p["id_b"]} != {4} for p in pairs)
    for p in pairs:
        assert 0.0 <= p["jaccard"] <= 1.0


def test_minhash_band_recall_vs_exact(spark):
    # gate for the 24-hash / 6-band default (VERDICT r1 item 2): every
    # high-Jaccard pair per the EXACT n-gram truth must survive the
    # banding stage. Verification is exact, so banding is the only
    # approximation in minhash_dedup.
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(200)]
    rows, did = [], 0
    for _ in range(20):
        base = [rng.choice(vocab) for _ in range(40)]
        rows.append((did, " ".join(base)))
        did += 1
        mut = list(base)
        mut[rng.randrange(len(mut))] = rng.choice(vocab)  # 1 word → j≈0.85
        rows.append((did, " ".join(mut)))
        did += 1
    for _ in range(20):
        rows.append((did, " ".join(rng.choice(vocab) for _ in range(40))))
        did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    truth = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.8).collect()
    }
    assert len(truth) >= 10  # sanity: mutations produced high-j pairs
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_dedup(df, threshold=0.8).collect()
    }
    assert got <= truth  # exact verify: no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9


def test_ngram_jaccard_exact_pairs(spark, docs):
    pairs = {
        (p["id_a"], p["id_b"]): p["jaccard"]
        for p in dedup.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == pytest.approx(1.0)
    assert 0.3 <= pairs[(1, 3)] < 1.0


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_simhash_hamming(spark, docs):
    fps = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert fps[1] == fps[2]  # identical text → identical fingerprint
    ham_13 = bin(fps[1] ^ fps[3] & (2**64 - 1)).count("1")
    ham_14 = bin(fps[1] ^ fps[4] & (2**64 - 1)).count("1")
    assert ham_13 < ham_14  # near-dup closer than unrelated
    near = dedup.simhash_near_pairs(dedup.simhash(docs), max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in near} >= {(1, 2)}


def test_brute_force_topk(spark):
    corpus_df = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)]
        + [(10, [0.9, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    queries_df = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    out_df = similarity.brute_force_topk(corpus_df, queries_df, k=2)
    out = out_df.collect()
    assert [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])] == [0, 10]
    assert out[0]["cosine"] == pytest.approx(1.0)
    # balanced reduction (optimization r16): Spark plans the
    # rank-filter window as WindowGroupLimit with a Partial mode pass
    # below the exchange, pruning each map partition to its local
    # top-k BEFORE the shuffle — the same bound the old manual
    # (query_id, spark_partition_id) pre-rank enforced, without that
    # variant's extra full exchange of the scored set
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "hashpartitioning" in plan
    assert "Partial" in plan


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_lsh_topk_recall(spark):
    import numpy as np

    rng = np.random.default_rng(0)
    base = rng.standard_normal((20, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    corpus_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries_df = corpus_df.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(corpus_df, queries_df, k=1)
    approx = similarity.lsh_topk(
        corpus_df, queries_df, k=1, num_planes=4, num_tables=6, dim=8
    )
    # self-vector is always in its own bucket → rank-1 self recall
    exact_top = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    approx_top = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert exact_top == approx_top


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_ivf_topk_recall(spark):
    import numpy as np

    rng = np.random.default_rng(1)
    base = rng.standard_normal((40, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    corpus_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries_df = corpus_df.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(corpus_df, queries_df, k=1).collect()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(
            corpus_df, queries_df, k=1, n_centroids=4, n_probe=2
        ).collect()
    }
    # a query's own vector lives in its own probed list → self recall
    assert exact == approx


def test_ivf_index_build_search_split(spark, tmp_path):
    import numpy as np

    rng = np.random.default_rng(2)
    base = rng.standard_normal((40, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    corpus_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries_df = corpus_df.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")

    indexed, cents = similarity.build_ivf_index(corpus_df, n_centroids=4)
    # persist + reload roundtrip (the 100 TB path: build once, query many)
    path = str(tmp_path / "ivf")
    similarity.save_ivf_index(indexed, cents, path)
    indexed2, cents2 = similarity.load_ivf_index(spark, path)
    assert indexed2.count() == 40
    assert cents2.count() == 4

    direct = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivf_search(indexed, cents, queries_df, k=2, n_probe=2).collect()
    }
    loaded = {
        (r["query_id"], r["vec_id"], r["rank"])
        for r in similarity.ivf_search(indexed2, cents2, queries_df, k=2, n_probe=2).collect()
    }
    assert direct == loaded  # saved index answers identically
    # self-vector lives in its own probed list → rank-1 self recall
    assert {(q, v) for q, v, r in direct if r == 1} == {(i, i) for i in range(3)}


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = similarity.embedding_near_dup_pairs(
        df, threshold=0.95, num_planes=2, num_tables=4
    ).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(1, 2)}
    # exact variant agrees with the LSH one on planted strong dups,
    # and is the ground truth at ANY threshold
    exact = similarity.embedding_near_dup_exact(df, threshold=0.95).collect()
    assert {(p["id_a"], p["id_b"]) for p in exact} == {(1, 2)}
    exact_low = similarity.embedding_near_dup_exact(df, threshold=-1.0)
    assert exact_low.count() == 3  # all pairs when unthresholded


def test_text_stats_and_quality(spark, docs):
    stats = {r["doc_id"]: r for r in text.word_stats(docs).collect()}
    assert stats[1]["token_count"] == 14
    q = {r["doc_id"]: r["quality_score"] for r in text.quality_score(docs).collect()}
    assert q[1] > q[5]  # punctuation junk scores lower
    lang = {r["doc_id"]: r["predicted_lang"] for r in text.language_id(docs).collect()}
    assert lang[1] == "en"
    assert lang[5] == "unknown"


def test_fingerprint(spark, docs):
    fp = {r["doc_id"]: r for r in text.fingerprint(docs).collect()}
    assert fp[1]["full_md5"] == fp[2]["full_md5"]
    assert fp[1]["full_md5"] != fp[3]["full_md5"]
    assert fp[1]["prefix_md5"] == fp[3]["prefix_md5"]  # same first 8 words


def test_media_header_parse_roundtrip():
    """Builders synthesize structurally valid payloads; the stdlib
    parser must recover the exact construction parameters — and the
    complete formats (PNG/WAV) must decode with independent stdlib
    readers (zlib scanline reconstruction / the wave module)."""
    png = multimodal.build_png(17, 9)
    assert multimodal.parse_media_header(png) == ("png", 17, 9, 3, None, 8)
    assert len(png) == 9 * (3 * 17 + 1) + 68  # zlib stored-block arithmetic

    jpeg = multimodal.build_jpeg(201, 77)
    assert multimodal.parse_media_header(jpeg) == ("jpeg", 201, 77, 3, None, 8)
    assert len(jpeg) == 32 + 3 * 3

    wav = multimodal.build_wav(2, 44100)
    assert multimodal.parse_media_header(wav) == ("wav", None, None, 2, 44100, 16)
    assert len(wav) == 44 + 32 * 2 * 2

    gif = b"GIF89a" + (300).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert multimodal.parse_media_header(gif)[:3] == ("gif", 300, 200)

    # independent decode of the complete formats
    import io
    import wave
    import zlib

    raw = zlib.decompress(png[8 + 25 + 8 : -12 - 4])
    assert len(raw) == 9 * (3 * 17 + 1)  # h scanlines of filter byte + RGB
    with wave.open(io.BytesIO(wav)) as w:
        assert (w.getnchannels(), w.getframerate(), w.getsampwidth()) == (2, 44100, 2)

    # padding runs of 0xFF between segments (fill bytes) are legal in
    # real-world JPEGs — the walker skips them and still finds SOF
    padded = jpeg[:2] + b"\xff\xff\xff" + jpeg[2:]
    assert multimodal.parse_media_header(padded) == ("jpeg", 201, 77, 3, None, 8)
    # a stray EOI before any SOF stops the walk cleanly
    assert multimodal.parse_media_header(b"\xff\xd8\xff\xd9" + b"\x00" * 16) == (
        "jpeg", None, None, None, None, None,
    )

    # garbage / truncated payloads degrade to unknown, never raise
    assert multimodal.parse_media_header(b"")[0] == "unknown"
    assert multimodal.parse_media_header(b"\x89PNG\r\n\x1a\n trunc")[0] == "unknown"
    assert multimodal.parse_media_header(b"plain text here")[0] == "unknown"


def test_multimodal_features(spark):
    rows = [
        ("m1", "image", multimodal.build_png(800, 600), "image/png", 800, 600, None, None),
        ("m2", "video", b"fake mp4", "video/mp4", 1920, 1080, 5000, None),
        ("m3", "audio", multimodal.build_wav(1, 16000), "audio/wav", None, None, None, 16000),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, modality string, payload binary, mime_type string,"
        "width int, height int, duration_ms long, sample_rate int",
    )
    feats = {r["media_id"]: r for r in multimodal.extract_features(df).collect()}
    assert len(feats["m1"]["features"]) == multimodal.FEATURE_DIM
    # REAL header decode through the Arrow exchange
    assert (feats["m1"]["format"], feats["m1"]["width"], feats["m1"]["height"]) == (
        "png", 800, 600,
    )
    assert (feats["m3"]["format"], feats["m3"]["channels"], feats["m3"]["sample_rate"]) == (
        "wav", 1, 16000,
    )
    assert feats["m2"]["format"] == "unknown" and feats["m2"]["width"] is None
    assert feats["m2"]["payload_bytes"] == 8
    # deterministic stub: same payload → same features
    feats2 = {r["media_id"]: r for r in multimodal.extract_features(df).collect()}
    assert feats["m1"]["features"] == feats2["m1"]["features"]

    resized = {r["media_id"]: r for r in multimodal.resize_metadata(df, max_dim=512).collect()}
    assert resized["m1"]["target_width"] == 512 and resized["m1"]["target_height"] == 384
    frames = multimodal.frame_sample_plan(df, every_ms=1000).collect()
    assert len(frames) == 5  # 5000 ms video → 5 sampled frames


def test_mp4_build_parse_roundtrip_and_video_metadata(spark):
    """r8: real ISO-BMFF metadata parse — build_mp4's box tree parses
    back exactly (16.16 dims, timescale-normalized duration), the
    sniffer classifies it, garbage/truncation degrade to Nones, and
    parse_video_metadata carries it through the Arrow exchange."""
    p = multimodal.build_mp4(320, 240, 2500)
    assert multimodal.parse_mp4_header(p) == (320, 240, 2500)
    assert multimodal.parse_media_header(p) == ("mp4", 320, 240, None, None, None)
    assert multimodal.parse_mp4_header(b"not mp4") == (None, None, None)
    assert multimodal.parse_mp4_header(p[:20]) == (None, None, None)

    rows = [
        (1, multimodal.build_mp4(640, 480, 3000)),
        (2, multimodal.build_mp4(160, 96, 1)),
        (3, b"junk payload"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    meta = {r["media_id"]: r for r in multimodal.parse_video_metadata(df).collect()}
    assert (meta[1]["vid_format"], meta[1]["width"], meta[1]["height"],
            meta[1]["duration_ms"]) == ("mp4", 640, 480, 3000)
    assert meta[2]["duration_ms"] == 1
    assert meta[3]["vid_format"] == "unknown" and meta[3]["width"] is None


def test_multimodal_strict_raises():
    # strict gates ONLY the non-PNG pixel/sample decode; header
    # parsing is real, and PNG pixels now decode for real (r7)
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"x", "image", strict=True)
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(multimodal.build_jpeg(4, 4), "image", strict=True)
    assert multimodal.parse_media_header(multimodal.build_png(4, 4))[0] == "png"
    # PNG passes strict with real statistics
    feats = multimodal.decode_stub(multimodal.build_png(4, 4), "image", strict=True)
    assert len(feats) == multimodal.FEATURE_DIM
    assert feats[0] == pytest.approx(128 / 255)  # default color mean, std 0
    assert feats[1] == 0.0


def test_decode_png_pixels_solid_and_unsupported():
    import numpy as np

    px = multimodal.decode_png_pixels(multimodal.build_png(7, 5, (10, 20, 30)))
    assert px.shape == (5, 7, 3)
    assert (px == np.array([10, 20, 30], dtype=np.uint8)).all()
    with pytest.raises(ValueError):
        multimodal.decode_png_pixels(b"not a png")
    with pytest.raises(ValueError):  # truncated chunk chain
        multimodal.decode_png_pixels(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)


def _encode_png(img, color_type, filters):
    """Test-side PNG encoder with explicit per-row filter types —
    the INVERSE direction of decode_png_pixels' reconstruction, so
    round-trip equality is a genuine two-implementation check."""
    import struct as st
    import zlib

    import numpy as np

    h, w, c = img.shape
    bpp = c
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * c):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                cc = int(prev[x - bpp]) if x >= bpp else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            raw.append((int(cur[x]) - pred) & 0xFF)
        prev = cur

    def chunk(typ, data):
        body = typ + data
        return st.pack(">I", len(data)) + body + st.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    assert ctype == color_type
    ihdr = st.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_jpeg_roundtrip_solid_gradient_random():
    """decode_jpeg_pixels vs encode_jpeg_baseline — two independent
    directions of the same spec: solid color and smooth gradients
    round-trip EXACTLY at unit quantization (AC coefficients
    vanish/are integral), random RGB within ±2 (YCbCr rounding)."""
    import numpy as np

    solid = np.zeros((16, 24, 3), dtype=np.uint8)
    solid[:] = [128, 64, 32]
    dec = multimodal.decode_jpeg_pixels(multimodal.encode_jpeg_baseline(solid))
    assert dec.shape == (16, 24, 3)
    assert (dec == solid).all()

    gray = np.tile(np.arange(32, dtype=np.uint8)[None, :] * 8, (9, 1))[:, :, None]
    dec_g = multimodal.decode_jpeg_pixels(multimodal.encode_jpeg_baseline(gray))
    assert dec_g.shape == (9, 32, 1)
    assert (dec_g == gray).all()

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    dec_r = multimodal.decode_jpeg_pixels(multimodal.encode_jpeg_baseline(img))
    assert np.abs(dec_r.astype(int) - img.astype(int)).max() <= 2

    # lossy quantization still lands near the source
    q = np.full(64, 16, dtype=np.int32)
    dec_q = multimodal.decode_jpeg_pixels(multimodal.encode_jpeg_baseline(img, quant=q))
    assert np.abs(dec_q.astype(int) - img.astype(int)).mean() < 16


def test_jpeg_decode_rejects_nonbaseline_and_headeronly():
    import numpy as np

    with pytest.raises(ValueError):
        multimodal.decode_jpeg_pixels(b"not a jpeg")
    # the corpus fixture is header-only: no SOS scan to decode
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_pixels(multimodal.build_jpeg(8, 8))
    # progressive marker (SOF2) refuses
    solid = np.zeros((8, 8, 1), dtype=np.uint8)
    payload = bytearray(multimodal.encode_jpeg_baseline(solid))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        multimodal.decode_jpeg_pixels(bytes(payload))
    # strict decode_stub: real baseline passes, header-only raises
    feats = multimodal.decode_stub(
        multimodal.encode_jpeg_baseline(solid), "image", strict=True
    )
    assert len(feats) == multimodal.FEATURE_DIM and feats[0] == 0.0
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(multimodal.build_jpeg(8, 8), "image", strict=True)


def test_jpeg_feature_layout_matches_png():
    """Identical image stats across container formats: the same solid
    color through PNG and JPEG yields the same feature vector."""
    import numpy as np

    solid = np.zeros((12, 20, 3), dtype=np.uint8)
    solid[:] = [128, 64, 32]
    jf = multimodal.jpeg_pixel_features(multimodal.encode_jpeg_baseline(solid))
    pf = multimodal.png_pixel_features(multimodal.build_png(20, 12))
    assert jf == pytest.approx(pf)


def test_decode_wav_samples_silence_and_tone():
    import struct as st

    import numpy as np

    # silence fixture: zeros, duration from the actual data chunk
    x, rate, bits = multimodal.decode_wav_samples(multimodal.build_wav(2, 16000))
    assert x.shape == (32, 2) and rate == 16000 and bits == 16
    assert (x == 0.0).all()
    feats = multimodal.wav_sample_features(multimodal.build_wav(1, 8000))
    assert feats[8] == 0.0 and feats[9] == 0.0 and feats[10] == 0.0
    assert feats[11] == pytest.approx(32 / 8000)
    assert feats[14] == 0.5  # 16-bit

    # hand-built alternating square wave: known rms/peak/zcr
    samples = [10000, -10000] * 16  # 32 frames, mono
    data = b"".join(st.pack("<h", s) for s in samples)
    fmt = st.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (b"WAVE" + b"fmt " + st.pack("<I", 16) + fmt
            + b"data" + st.pack("<I", len(data)) + data)
    wav = b"RIFF" + st.pack("<I", len(body)) + body
    x, rate, bits = multimodal.decode_wav_samples(wav)
    assert x.shape == (32, 1)
    f = multimodal.wav_sample_features(wav)
    amp = 10000 / 32768
    assert f[9] == pytest.approx(amp)        # peak
    assert f[8] == pytest.approx(amp)        # rms of a square wave = amp
    assert f[10] == pytest.approx(1.0)       # every step crosses zero
    assert f[0] == pytest.approx(0.0)        # mean
    # strict mode passes on PCM WAV now
    assert multimodal.decode_stub(wav, "audio", strict=True) == f
    # 8-bit unsigned path
    data8 = bytes([128, 255, 0, 128])
    fmt8 = st.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    body8 = (b"WAVE" + b"fmt " + st.pack("<I", 16) + fmt8
             + b"data" + st.pack("<I", len(data8)) + data8)
    x8, _, bits8 = multimodal.decode_wav_samples(b"RIFF" + st.pack("<I", len(body8)) + body8)
    assert bits8 == 8
    assert x8[:, 0] == pytest.approx([0.0, 127 / 128, -1.0, 0.0])
    # compressed/non-PCM raises
    fmt_bad = st.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # MP3-in-WAV
    body_bad = (b"WAVE" + b"fmt " + st.pack("<I", 16) + fmt_bad
                + b"data" + st.pack("<I", 0))
    with pytest.raises(ValueError):
        multimodal.decode_wav_samples(b"RIFF" + st.pack("<I", len(body_bad)) + body_bad)


@pytest.mark.parametrize(
    "color_type,channels", [(0, 1), (2, 3), (4, 2), (6, 4)]
)
def test_decode_png_pixels_all_filters_roundtrip(color_type, channels):
    """Gradient image encoded with every filter type (0-4 cycling by
    row) decodes back byte-exact, for each supported color type."""
    import numpy as np

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(10, 9, channels), dtype=np.uint8)
    payload = _encode_png(img, color_type, filters=[0, 1, 2, 3, 4])
    out = multimodal.decode_png_pixels(payload)
    assert (out == img).all()


def test_vocab_topk(spark, docs):
    top = text.vocab_topk(docs, k=3).collect()
    assert top[0]["token"] == "the"  # most frequent across the fixture
    assert top[0]["freq"] >= top[1]["freq"] >= top[2]["freq"]


def test_deterministic_sample_stability(spark, docs):
    a = {r["doc_id"] for r in text.deterministic_sample(docs, 0.5).collect()}
    b = {r["doc_id"] for r in text.deterministic_sample(docs, 0.5).collect()}
    assert a == b  # identical every run
    sub = {r["doc_id"] for r in text.deterministic_sample(docs, 0.2).collect()}
    assert sub <= a  # smaller rate is a strict subset (same hash, lower cut)
    assert {r["doc_id"] for r in text.deterministic_sample(docs, 1.0).collect()} == {
        1, 2, 3, 4, 5
    }


def test_stratified_sample(spark):
    rows = [(i, "web" if i % 2 == 0 else "books") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = text.stratified_sample(df, {"books": 1.0}, default_rate=0.0).collect()
    assert {r["source"] for r in out} == {"books"}
    assert len(out) == 100  # rate 1.0 keeps every row of the stratum


def test_epoch_upsample(spark):
    rows = [(i, ["books", "web", "junk"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = text.epoch_upsample(
        df, {"books": 2.5, "web": 0.75, "junk": 0.0}, default_epochs=1.0
    ).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # junk dropped entirely
    assert not any(d % 3 == 2 for d in by_doc)
    books = [d for d in by_doc if d % 3 == 0]
    web = [d for d in by_doc if d % 3 == 1]
    # every surviving books doc has 2 or 3 copies with dense 0-based epochs
    for d in books:
        assert sorted(by_doc[d]) in ([0, 1], [0, 1, 2])
    # the fractional halves hit ~half the stratum (deterministic cut)
    thirds = sum(1 for d in books if len(by_doc[d]) == 3)
    assert 30 <= thirds <= 70, thirds
    # web: one copy each, ~75% of the stratum survives
    assert all(by_doc[d] == [0] for d in web)
    assert 55 <= len(web) <= 95, len(web)
    # deterministic: a second run is identical
    again = text.epoch_upsample(
        df, {"books": 2.5, "web": 0.75, "junk": 0.0}, default_epochs=1.0
    ).collect()
    assert sorted((r["doc_id"], r["epoch"]) for r in again) == sorted(
        (r["doc_id"], r["epoch"]) for r in out
    )


def test_curate_corpus_pipeline(spark, docs):
    kept = {r["doc_id"]: r for r in text.curate_corpus(docs, min_quality=0.2).collect()}
    assert 5 not in kept      # punctuation junk fails quality/lang
    assert 2 not in kept      # exact dup of 1 → canonical id 1 survives
    assert 1 in kept and kept[1]["predicted_lang"] == "en"


def test_ivf_index_append_and_drift(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    corpus_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, cents = similarity.build_ivf_index(corpus_df, n_centroids=4)
    base_cost = similarity.ivf_assignment_cost(indexed, cents)
    assert 0.0 <= base_cost <= 2.0

    new_rows = [(100 + i, [float(x) for x in rng.standard_normal(8)]) for i in range(5)]
    new_df = spark.createDataFrame(new_rows, "vec_id long, embedding array<double>")
    grown = similarity.ivf_index_append(indexed, cents, new_df)
    assert grown.count() == 35
    # appended vectors are searchable through the same index
    q = new_df.limit(1).select(F.col("vec_id").alias("query_id"), "embedding")
    hits = similarity.ivf_search(grown, cents, q, k=1, n_probe=2).collect()
    assert hits[0]["vec_id"] == hits[0]["query_id"]  # self-recall


def test_ivf_index_refresh_splits_worst_list(spark):
    """Hand-built drift scenario: ONE inverted list holds two tight,
    well-separated clusters (the worst-cost list by construction);
    refresh with max_lists=1 must split exactly that list, separate
    the two clusters into different sub-lists, keep every vector
    exactly once, renumber cids contiguously, and lower the total
    assignment cost."""
    import numpy as np

    # cluster A around e0, cluster B around e1 (cosine(A,B) ≈ 0),
    # plus a lone tight list around e2 that must NOT be refreshed
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))        # A
    for i in range(6):
        rows.append((10 + i, [0.0, 1.0, 0.01 * i, 0.0]))   # B
    for i in range(4):
        rows.append((20 + i, [0.0, 0.0, 0.0, 1.0 + 0.01 * i]))  # C
    corpus_df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    # hand-built index: lists {0: A∪B (drifted), 1: C (tight)}
    cents = spark.createDataFrame(
        [(0, [0.5, 0.5, 0.0, 0.0]), (1, [0.0, 0.0, 0.0, 1.0])],
        "cid int, centroid array<double>",
    )
    indexed = corpus_df.withColumn(
        "cid", F.when(F.col("vec_id") >= 20, F.lit(1)).otherwise(F.lit(0))
    )
    cost_before = similarity.ivf_assignment_cost(indexed, cents)

    new_idx, new_cents, refreshed = similarity.ivf_index_refresh(
        indexed, cents, max_lists=1, split_factor=2, lloyd_iters=2
    )
    assert refreshed == [0]  # the mixed list is the worst by cost
    got = new_idx.collect()
    # content preserved exactly once
    assert sorted(r["vec_id"] for r in got) == sorted(r[0] for r in rows)
    # contiguous cids: 1 untouched + 2 sub-lists = 0..2
    cent_rows = new_cents.orderBy("cid").collect()
    assert [r["cid"] for r in cent_rows] == [0, 1, 2]
    # cluster C stayed together under the remapped untouched cid
    by_id = {r["vec_id"]: r["cid"] for r in got}
    c_cids = {by_id[20 + i] for i in range(4)}
    assert len(c_cids) == 1
    # A and B ended in two DIFFERENT sub-lists, each pure
    a_cids = {by_id[i] for i in range(6)}
    b_cids = {by_id[10 + i] for i in range(6)}
    assert len(a_cids) == 1 and len(b_cids) == 1 and a_cids != b_cids
    # drift metric improved
    cost_after = similarity.ivf_assignment_cost(new_idx, new_cents)
    assert cost_after < cost_before
    # refreshed index still serves: self-recall through ivf_search
    q = corpus_df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = similarity.ivf_search(new_idx, new_cents, q, k=1, n_probe=1).collect()
    assert hits[0]["vec_id"] == 0


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_ivf_refresh_maintained_stats_path(spark):
    """The zero-corpus-pass maintain loop (r16, VERDICT r15 item 4):
    list stats computed at build + merged per append must drive
    refresh to the IDENTICAL selection and output as the scan path,
    and merge_list_stats must equal a direct scan of the union."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    corpus_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, cents = similarity.build_ivf_index(corpus_df, n_centroids=4)
    indexed = indexed.localCheckpoint(eager=True)
    batch = spark.createDataFrame(
        [(100 + i, [float(x) for x in rng.standard_normal(8)]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    grown, batch_stats = similarity.ivf_index_append_with_stats(
        indexed, cents, batch
    )
    grown = grown.localCheckpoint(eager=True)
    # incremental identity: stats(base) + stats(batch) == stats(grown)
    base_stats = similarity.ivf_list_stats(indexed, cents)
    merged = similarity.merge_list_stats(base_stats, batch_stats)
    direct = similarity.ivf_list_stats(grown, cents)
    assert {c: n for c, _, n in merged} == {c: n for c, _, n in direct}
    for (c1, cost1, _), (c2, cost2, _) in zip(merged, sorted(direct)):
        assert c1 == c2 and cost1 == pytest.approx(cost2, rel=1e-9)
    # maintained-stats refresh == scan refresh, row for row
    kw = dict(max_lists=2, split_factor=2, lloyd_iters=1)
    idx_a, cents_a, ref_a = similarity.ivf_index_refresh(grown, cents, **kw)
    idx_b, cents_b, ref_b = similarity.ivf_index_refresh(
        grown, cents, list_stats=merged, **kw
    )
    assert ref_a == ref_b
    assert sorted(map(tuple, idx_a.collect())) == sorted(
        map(tuple, idx_b.collect())
    )
    assert sorted(map(tuple, cents_a.collect())) == sorted(
        map(tuple, cents_b.collect())
    )
    # stale/mismatched metadata fails loud
    forged = merged + [(99, 5.0, 10)]
    with pytest.raises(ValueError, match="list_stats"):
        similarity.ivf_index_refresh(grown, cents, list_stats=forged, **kw)
    # the loop CONTINUES without a rescan: carry stats across the
    # refresh (untouched lists remap, new sub-lists re-scored in a
    # bounded pass) and drive a SECOND refresh to the same selection
    # and output as a fresh scan would
    idx_b = idx_b.localCheckpoint(eager=True)
    carried = similarity.carry_list_stats(merged, ref_b, idx_b, cents_b, cents)
    direct2 = similarity.ivf_list_stats(idx_b, cents_b)
    assert {c: n for c, _, n in carried} == {c: n for c, _, n in direct2}
    for (c1, cost1, _), (c2, cost2, _) in zip(carried, sorted(direct2)):
        assert c1 == c2 and cost1 == pytest.approx(cost2, rel=1e-9)
    idx_c1, _, ref_c1 = similarity.ivf_index_refresh(idx_b, cents_b, **kw)
    idx_c2, _, ref_c2 = similarity.ivf_index_refresh(
        idx_b, cents_b, list_stats=carried, **kw
    )
    assert ref_c1 == ref_c2
    assert sorted(map(tuple, idx_c1.collect())) == sorted(
        map(tuple, idx_c2.collect())
    )


def test_carry_list_stats_aligns_with_refresh_on_empty_list(spark):
    """carry_list_stats must renumber from the CENTROID TABLE, not
    the stats block: an empty inverted list (cid present in the
    table, zero members — so absent from ivf_list_stats) shifts the
    two renumberings apart if the stats drive it (code-review r16)."""
    # cid 0 holds a drifted 4-member list (refresh target), cid 1 is
    # EMPTY, cid 2 holds 4 on-centroid members
    rows = [(i, [10.0 + i, 1.0], 0) for i in range(4)] + [
        (20 + i, [0.0, 5.0], 2) for i in range(4)
    ]
    indexed = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cid int"
    ).localCheckpoint(eager=True)
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [0.0, 5.0])],
        "cid int, centroid array<double>",
    )
    stats = similarity.ivf_list_stats(indexed, cents)
    assert sorted(c for c, _, _ in stats) == [0, 2]  # no entry for empty 1
    new_idx, new_cents, refreshed = similarity.ivf_index_refresh(
        indexed, cents, max_lists=1, split_factor=2, lloyd_iters=1,
        list_stats=stats,
    )
    assert refreshed == [0]
    new_idx = new_idx.localCheckpoint(eager=True)
    # refresh renumbers untouched [1, 2] -> [0, 1]; stats-derived
    # renumbering would map 2 -> 0 and mis-attribute its cost
    carried = similarity.carry_list_stats(
        stats, refreshed, new_idx, new_cents, cents
    )
    direct = similarity.ivf_list_stats(new_idx, new_cents)
    assert {c: n for c, _, n in carried} == {c: n for c, _, n in direct}
    for (c1, cost1, _), (c2, cost2, _) in zip(carried, sorted(direct)):
        assert c1 == c2 and cost1 == pytest.approx(cost2, rel=1e-9)
    # mismatched centroid table fails loud
    with pytest.raises(ValueError, match="old_centroids_df"):
        similarity.carry_list_stats(
            stats, refreshed, new_idx, new_cents,
            cents.filter(F.col("cid") < 2),
        )
    with pytest.raises(ValueError, match="old_stats"):
        similarity.carry_list_stats(
            stats + [(9, 1.0, 1)], refreshed, new_idx, new_cents, cents
        )


def test_ivf_refresh_rejects_unmerged_duplicate_stats(spark):
    """An unmerged base+batch concatenation splits a list's cost
    across duplicate cid entries (and can select one list twice) —
    rejected by name instead of a cryptic downstream failure."""
    rows = [(i, [float(i), 1.0], i % 2) for i in range(8)]
    indexed = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, cid int"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [2.0, 1.0])], "cid int, centroid array<double>"
    )
    stats = similarity.ivf_list_stats(indexed, cents)
    with pytest.raises(ValueError, match="duplicate"):
        similarity.ivf_index_refresh(
            indexed, cents, list_stats=stats + stats[:1]
        )


def test_ivf_refresh_stats_path_fails_loud_on_corrupt_index(spark):
    """The maintained-stats path runs zero corpus scans, so the
    corrupt-row check rides the output pass itself (lazy raise_error
    woven into the remapped cid column): a row whose cid is NULL or
    absent from the centroid table must fail loud at execution, not
    vanish through the kept-side filter/join (code-review r16)."""
    good = [(i, [float(i), 1.0], i % 2) for i in range(8)]
    cents = spark.createDataFrame(
        [(0, [1.0, 1.0]), (1, [2.0, 1.0])], "cid int, centroid array<double>"
    )
    clean = spark.createDataFrame(
        good, "vec_id long, embedding array<double>, cid int"
    )
    stats = similarity.ivf_list_stats(clean, cents)
    for bad_row in [(99, [9.0, 9.0], 7), (99, [9.0, 9.0], None)]:
        corrupt = clean.unionByName(
            spark.createDataFrame(
                [bad_row], "vec_id long, embedding array<double>, cid int"
            )
        )
        new_idx, _, _ = similarity.ivf_index_refresh(
            corrupt, cents, max_lists=1, split_factor=2, lloyd_iters=0,
            list_stats=stats,
        )
        with pytest.raises(Exception, match="corrupt index"):
            new_idx.collect()


def test_ivf_index_refresh_contracts(spark):
    import pytest as _pytest

    rows = [(i, [float(i), 1.0]) for i in range(4)]
    corpus_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 1.0])], "cid int, centroid array<double>"
    )
    indexed = corpus_df.withColumn("cid", F.lit(0))
    with _pytest.raises(ValueError, match="max_lists"):
        similarity.ivf_index_refresh(indexed, cents, max_lists=0)
    with _pytest.raises(ValueError, match="split_factor"):
        similarity.ivf_index_refresh(indexed, cents, split_factor=1)
    with _pytest.raises(ValueError, match="lloyd_iters"):
        similarity.ivf_index_refresh(indexed, cents, lloyd_iters=-1)
    # no list with >= split_factor members → fail loud, name the fix
    with _pytest.raises(ValueError, match="rebuild"):
        similarity.ivf_index_refresh(indexed, cents, split_factor=5)
    # a cid missing from the centroid table = corrupt index → raise
    # in the stats pass, never silently drop those rows downstream
    two_lists = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [1.0, 0.1], 0), (2, [0.9, 0.1], 0),
         (3, [0.0, 1.0], 7), (4, [0.1, 1.0], 7)],
        "vec_id long, embedding array<double>, cid int",
    )
    with _pytest.raises(ValueError, match="corrupt index"):
        similarity.ivf_index_refresh(
            two_lists, cents, max_lists=1, split_factor=2
        )
    # a NULL cid is the same corruption (isin/filter would NULL-drop
    # those rows silently — the stats pass must catch it instead)
    with_null = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [1.0, 0.1], 0), (2, [0.9, 0.1], 0),
         (3, [0.0, 1.0], None)],
        "vec_id long, embedding array<double>, cid int",
    )
    with _pytest.raises(ValueError, match="corrupt index"):
        similarity.ivf_index_refresh(
            with_null, cents, max_lists=1, split_factor=2
        )


def test_ivf_index_refresh_deterministic(spark):
    """Same inputs → byte-identical (cid, vec_id) assignment and
    centroid table — the md5-spread seeding and cid-ordered
    renumbering leave no run-to-run freedom."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((40, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
    corpus_df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, cents = similarity.build_ivf_index(corpus_df, n_centroids=4)
    indexed = indexed.localCheckpoint(eager=True)

    def snap():
        idx, cdf, ref = similarity.ivf_index_refresh(
            indexed, cents, max_lists=2, split_factor=2, lloyd_iters=1
        )
        return (
            sorted((r["vec_id"], r["cid"]) for r in idx.collect()),
            sorted(
                (r["cid"], tuple(r["centroid"])) for r in cdf.collect()
            ),
            ref,
        )

    assert snap() == snap()


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_ivf_index_merge_consolidates_nearest(spark):
    """Two hand-built shard indexes: shard A has lists around e0 and
    e1, shard B has lists around e0-ish (nearest to A's e0 list) and
    e3. Merging 4 lists down to 3 must fuse exactly the two e0-ish
    lists into ONE count-weighted centroid, keep every vector exactly
    once under contiguous cids, and leave the merged index
    searchable."""
    import numpy as np

    a_rows = [(0, [1.0, 0.0, 0.0, 0.0]), (1, [1.0, 0.02, 0.0, 0.0]),
              (2, [0.0, 1.0, 0.0, 0.0])]
    b_rows = [(10, [1.0, 0.1, 0.0, 0.0]),
              (11, [0.0, 0.0, 0.0, 1.0]), (12, [0.0, 0.0, 0.01, 1.0])]
    a_idx = spark.createDataFrame(
        [(i, v, 0 if v[0] > 0.5 else 1) for i, v in a_rows],
        "vec_id long, embedding array<double>, cid int",
    )
    a_cents = spark.createDataFrame(
        [(0, [1.0, 0.01, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cid int, centroid array<double>",
    )
    b_idx = spark.createDataFrame(
        [(i, v, 0 if v[0] > 0.5 else 1) for i, v in b_rows],
        "vec_id long, embedding array<double>, cid int",
    )
    b_cents = spark.createDataFrame(
        [(0, [1.0, 0.1, 0.0, 0.0]), (1, [0.0, 0.0, 0.005, 1.0])],
        "cid int, centroid array<double>",
    )
    merged_idx, merged_cents = similarity.ivf_index_merge(
        a_idx, a_cents, b_idx, b_cents, target_centroids=3
    )
    got = merged_idx.collect()
    assert sorted(r["vec_id"] for r in got) == [0, 1, 2, 10, 11, 12]
    cent_rows = merged_cents.orderBy("cid").collect()
    assert [r["cid"] for r in cent_rows] == [0, 1, 2]
    by_id = {r["vec_id"]: r["cid"] for r in got}
    # the two e0-ish lists fused: A{0,1} and B{10} share one cid
    assert by_id[0] == by_id[1] == by_id[10]
    # the other two lists stayed separate
    assert len({by_id[0], by_id[2], by_id[11]}) == 3
    assert by_id[11] == by_id[12]
    # fused centroid is the count-weighted mean of (2×A0, 1×B0)
    fused = next(
        r["centroid"] for r in cent_rows if r["cid"] == by_id[0]
    )
    expect = (np.array([1.0, 0.01, 0.0, 0.0]) * 2
              + np.array([1.0, 0.1, 0.0, 0.0])) / 3
    assert np.allclose(fused, expect)
    # merged index serves: self-recall for a vector from each shard
    for qid in (0, 11):
        q = merged_idx.filter(F.col("vec_id") == qid).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        hits = similarity.ivf_search(
            merged_idx, merged_cents, q, k=1, n_probe=1
        ).collect()
        assert hits[0]["vec_id"] == qid


def test_ivf_index_merge_contracts(spark):
    import pytest as _pytest

    idx = spark.createDataFrame(
        [(0, [1.0, 0.0], 0)], "vec_id long, embedding array<double>, cid int"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cid int, centroid array<double>"
    )
    other = spark.createDataFrame(
        [(0, [0.0, 1.0], 0)], "vec_id long, embedding array<double>, cid int"
    )
    with _pytest.raises(ValueError, match="BOTH indexes"):
        similarity.ivf_index_merge(idx, cents, other, cents)
    # assume_disjoint skips the guard entirely — the caller owns the
    # disjointness proof (VERDICT r14 item 3's escape hatch); the
    # duplicated id rides through into the merged index
    midx, _ = similarity.ivf_index_merge(
        idx, cents, other, cents, assume_disjoint=True
    )
    assert midx.count() == 2
    # range-disjoint shards skip the exact join too: the min/max
    # pre-check (two one-row aggs) proves ids cannot collide
    far = spark.createDataFrame(
        [(1000, [0.0, 1.0], 0)],
        "vec_id long, embedding array<double>, cid int",
    )
    midx2, _ = similarity.ivf_index_merge(idx, cents, far, cents)
    assert sorted(r["vec_id"] for r in midx2.collect()) == [0, 1000]
    with _pytest.raises(ValueError, match="target_centroids"):
        similarity.ivf_index_merge(
            idx, cents,
            other.withColumn("vec_id", F.lit(99).cast("long")), cents,
            target_centroids=0,
        )
    # a cid missing from its centroid table = corrupt index → raise,
    # never silently drop rows in the relabel join
    corrupt = spark.createDataFrame(
        [(99, [0.5, 0.5], 7)], "vec_id long, embedding array<double>, cid int"
    )
    with _pytest.raises(ValueError, match="corrupt index"):
        similarity.ivf_index_merge(idx, cents, corrupt, cents)
    # cap guard names both alternatives
    import healthcare_data_lakehouse_using_gcp_spark.operators.similarity as sim_mod
    old = sim_mod.MAX_MERGE_CENTROIDS
    try:
        sim_mod.MAX_MERGE_CENTROIDS = 1
        with _pytest.raises(ValueError, match="stages"):
            similarity.ivf_index_merge(
                idx, cents,
                other.withColumn("vec_id", F.lit(99).cast("long")), cents,
                target_centroids=1,
            )
    finally:
        sim_mod.MAX_MERGE_CENTROIDS = old


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_ivf_merge_then_refresh_lifecycle(spark):
    """The full incremental lifecycle on real-ish data: two disjoint
    shard indexes merge without a vector shuffle, the merged index's
    drift cost is finite, and ivf_index_refresh on the merged result
    improves it — merge-then-refresh as the docstrings promise."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    shard_a = df.filter(F.col("vec_id") % 2 == 0)
    shard_b = df.filter(F.col("vec_id") % 2 == 1)
    ia, ca = similarity.build_ivf_index(shard_a, n_centroids=4)
    ib, cb = similarity.build_ivf_index(shard_b, n_centroids=4)
    midx, mcents = similarity.ivf_index_merge(
        ia, ca, ib, cb, target_centroids=5
    )
    midx = midx.localCheckpoint(eager=True)
    assert midx.count() == 60
    assert mcents.count() == 5
    cost_m = similarity.ivf_assignment_cost(midx, mcents)
    ridx, rcents, _ = similarity.ivf_index_refresh(
        midx, mcents, max_lists=2, split_factor=2, lloyd_iters=2
    )
    cost_r = similarity.ivf_assignment_cost(ridx, rcents)
    assert cost_r < cost_m
    assert ridx.count() == 60


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_ivf_pq_refresh_equivalence_and_laziness(spark):
    """ivf_pq_refresh must produce EXACTLY the codes a full
    ivf_pq_encode of the refreshed index would — while re-encoding
    only the refreshed lists: untouched rows' codes are byte-identical
    to their pre-refresh codes (proof the fresh path never
    re-encodes)."""
    import numpy as np

    rng = np.random.default_rng(23)
    base = rng.standard_normal((50, 8))
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
    vectors = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, cents = similarity.build_ivf_index(vectors, n_centroids=4)
    indexed = indexed.localCheckpoint(eager=True)
    books = similarity.train_pq_codebooks_residual(
        indexed, cents, m=4, nbits=4, sample_size=64
    )
    pq_index = similarity.ivf_pq_encode(
        indexed, books, centroids_df=cents
    ).localCheckpoint(eager=True)

    new_pq, new_cents, refreshed = similarity.ivf_pq_refresh(
        pq_index, cents, books, vectors, max_lists=2, split_factor=2,
        lloyd_iters=1,
    )
    got = {r["vec_id"]: r for r in new_pq.collect()}
    assert sorted(got) == list(range(50))

    # equivalence: full re-encode of the refreshed index gives the
    # same (cid, codes) for every row
    new_idx, new_cents2, refreshed2 = similarity.ivf_index_refresh(
        indexed, cents, max_lists=2, split_factor=2, lloyd_iters=1
    )
    assert refreshed2 == refreshed
    assert (
        sorted((r["cid"], tuple(r["centroid"])) for r in new_cents.collect())
        == sorted((r["cid"], tuple(r["centroid"])) for r in new_cents2.collect())
    )
    full = {
        r["vec_id"]: r
        for r in similarity.ivf_pq_encode(
            new_idx, books, centroids_df=new_cents2
        ).collect()
    }
    for i in range(50):
        assert got[i]["cid"] == full[i]["cid"], i
        assert list(got[i]["pq_codes"]) == list(full[i]["pq_codes"]), i

    # untouched rows kept their ORIGINAL codes byte-identical
    old_codes = {r["vec_id"]: r for r in pq_index.collect()}
    untouched_ids = [
        i for i in range(50) if old_codes[i]["cid"] not in refreshed
    ]
    assert untouched_ids, "fixture must leave some list untouched"
    for i in untouched_ids:
        assert list(got[i]["pq_codes"]) == list(old_codes[i]["pq_codes"]), i

    # refreshed serving index still answers ADC searches
    q = vectors.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    hits = similarity.ivf_pq_search(
        new_pq, new_cents, books, q, k=5, n_probe=2, residual=True
    ).collect()
    assert len(hits) == 5

    # single-execution pin (VERDICT r14 item 2): the residual path
    # materializes the new_idx⋈old join ONCE (localCheckpoint), so
    # the returned plan's only Python stage is the stale re-encode —
    # the refresh's per-list assignment UDF must be BEHIND the
    # checkpoint scan, not re-planned under both the fresh and stale
    # branches (3 ArrowEvalPython nodes = the unchecked lineage)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        new_pq.explain()  # simple mode: each node printed exactly once
    # an executed AQE plan prints Final + Initial sections — the pin
    # reads only the first (the plan that actually ran)
    plan = buf.getvalue().split("== Initial Plan ==")[0]
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "ExistingRDD" in plan, plan


def test_ivf_pq_refresh_contracts(spark):
    import pytest as _pytest

    pq_index = spark.createDataFrame(
        [(0, 0, [1, 2]), (99, 0, [3, 4])],
        "vec_id long, cid int, pq_codes array<smallint>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "cid int, centroid array<double>"
    )
    vectors = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    import numpy as np

    books = np.zeros((2, 2, 1))
    # coded id 99 has no raw vector → cannot re-derive residual codes
    with _pytest.raises(ValueError, match="cold vectors"):
        similarity.ivf_pq_refresh(pq_index, cents, books, vectors)
    # a duplicated row in the cold store would duplicate that id in
    # the returned codes frame (double-counted by every ADC search)
    ok_index = spark.createDataFrame(
        [(0, 0, [1, 2])], "vec_id long, cid int, pq_codes array<smallint>"
    )
    dup_vectors = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.9, 0.1])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="cold store"):
        similarity.ivf_pq_refresh(ok_index, cents, books, dup_vectors)
    # a duplicated CODED id (clean cold store) would fan out 2×2
    # through the assignment and new_idx→old joins — the ADC
    # double-count the contract forbids (ADVICE r14)
    dup_index = spark.createDataFrame(
        [(0, 0, [1, 2]), (0, 0, [3, 4])],
        "vec_id long, cid int, pq_codes array<smallint>",
    )
    ok_vectors = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="codes frame"):
        similarity.ivf_pq_refresh(dup_index, cents, books, ok_vectors)


def test_connected_components_and_groups(spark):
    # chain 1-2, 2-3 plus isolated pair 10-11: components resolve
    # transitively to the min id
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comp = {r["node"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    groups = {
        r["doc_id"]: r["component"] for r in dedup.dedup_groups(docs_df(spark)).collect()
    }
    assert groups[1] == groups[2] == 1  # exact dups share a component
    assert groups[4] == 4  # unpaired doc is its own canonical


def test_leakage_safe_splits(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    # a transitive dup chain 0-1-2 plus pair 10-11; rest unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r
        for r in dedup.leakage_safe_splits(
            docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
        ).collect()
    }
    assert sorted(out) == list(range(40))  # every doc assigned
    # the LEAKAGE guarantee: a whole component shares one split
    assert out[0]["group_key"] == out[1]["group_key"] == out[2]["group_key"] == 0
    assert out[0]["split"] == out[1]["split"] == out[2]["split"]
    assert out[10]["split"] == out[11]["split"]
    assert out[5]["group_key"] == 5  # unpaired doc is its own group
    assert set(r["split"] for r in out.values()) <= {"train", "val", "test"}
    # deterministic: same seed → identical assignment; new seed → a
    # different (but still component-consistent) shuffle
    again = {
        r["doc_id"]: r["split"]
        for r in dedup.leakage_safe_splits(
            docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=42
        ).collect()
    }
    assert again == {i: out[i]["split"] for i in out}
    reseeded = {
        r["doc_id"]: r["split"]
        for r in dedup.leakage_safe_splits(
            docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7
        ).collect()
    }
    assert reseeded[0] == reseeded[1] == reseeded[2]
    # contracts
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum to 1"):
        dedup.leakage_safe_splits(docs, pairs, {"train": 0.5, "val": 0.1})
    with _pytest.raises(ValueError, match="positive"):
        dedup.leakage_safe_splits(docs, pairs, {"train": 1.5, "val": -0.5})
    with _pytest.raises(ValueError, match="at least one"):
        dedup.leakage_safe_splits(docs, pairs, {})
    # a fraction below basis-point granularity would cover zero
    # buckets — that split could silently never receive a document
    with _pytest.raises(ValueError, match="zero buckets"):
        dedup.leakage_safe_splits(
            docs, pairs, {"train": 0.9999, "val": 0.00005, "test": 0.00005}
        )


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_select_within_token_budget(spark):
    rows = [
        # (id, quality, tokens)
        (1, 0.9, 100),
        (2, 0.9, 100),
        (3, 0.8, 100),
        (4, 0.7, 100),
        (5, 0.6, 100),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, quality_score double, token_count long"
    )
    sel = lambda b: sorted(  # noqa: E731
        r["doc_id"]
        for r in text.select_within_token_budget(df, b).collect()
    )
    # prefix semantics: best-first, id-ascending within ties, keep
    # while the RUNNING total fits
    assert sel(1000) == [1, 2, 3, 4, 5]  # everything fits
    assert sel(300) == [1, 2, 3]
    assert sel(250) == [1, 2]  # doc 3 would overflow; prefix stops
    assert sel(150) == [1]  # tie broken to the lower id
    assert sel(50) == []
    assert sel(0) == []
    # boundary partially admitted WITHIN the boundary quality value
    assert sel(350) == [1, 2, 3]  # doc 4 (0.7) would overflow at 400
    # contracts
    with pytest.raises(ValueError, match="token_budget"):
        text.select_within_token_budget(df, -1)
    with_null = df.unionByName(
        spark.createDataFrame(
            [(9, None, 10)], "doc_id long, quality_score double, token_count long"
        )
    )
    with pytest.raises(ValueError, match="NULL"):
        text.select_within_token_budget(with_null, 100)
    # NaN passes a bare NULL guard but corrupts the threshold walk
    # (Python sorted() vs Spark NaN comparison semantics diverge on
    # the > v* / == v* filters) — fail loud instead (ADVICE r15)
    with_nan = df.unionByName(
        spark.createDataFrame(
            [(9, float("nan"), 10)],
            "doc_id long, quality_score double, token_count long",
        )
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        text.select_within_token_budget(with_nan, 100)
    import healthcare_data_lakehouse_using_gcp_spark.operators.text as text_mod

    old = text_mod.MAX_BUDGET_LEVELS
    try:
        text_mod.MAX_BUDGET_LEVELS = 2
        with pytest.raises(ValueError, match="MAX_BUDGET_LEVELS"):
            text.select_within_token_budget(df, 300)
    finally:
        text_mod.MAX_BUDGET_LEVELS = old


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_mixture_proportional_fill(spark):
    # A saturates (100 avail < 0.5-weight fair share of 2000-token
    # budget); its deficit redistributes over B and C at the water
    # level lambda = (2000-100)/0.5 = 3800
    rows = (
        [("A", 10)] * 10        # 100 tokens
        + [("B", 100)] * 10     # 1000 tokens
        + [("C", 200)] * 10     # 2000 tokens
    )
    df = spark.createDataFrame(rows, "source string, token_count long")
    wts = {"A": 0.5, "B": 0.25, "C": 0.25}
    out = {
        r["source"]: r
        for r in text.mixture_proportional_fill(df, wts, 2000).collect()
    }
    assert out["A"]["saturated"] and not out["B"]["saturated"]
    assert out["A"]["alloc_tokens"] == 100.0 and out["A"]["rate"] == 1.0
    assert out["B"]["alloc_tokens"] == pytest.approx(950.0)
    assert out["B"]["rate"] == pytest.approx(0.95)
    assert out["C"]["alloc_tokens"] == pytest.approx(950.0)
    assert out["C"]["rate"] == pytest.approx(0.475)
    # budget fills exactly when data suffices
    assert sum(r["alloc_tokens"] for r in out.values()) == pytest.approx(2000.0)
    # total availability below budget: everything saturates, the
    # shortfall is visible (sum alloc < budget), no error
    under = {
        r["source"]: r
        for r in text.mixture_proportional_fill(df, wts, 10_000).collect()
    }
    assert all(r["saturated"] and r["rate"] == 1.0 for r in under.values())
    assert sum(r["alloc_tokens"] for r in under.values()) == pytest.approx(3100.0)
    # abundant data everywhere: pure target split, nothing saturates
    # (budget 150 keeps A strictly under its 100-token availability;
    # at exactly 200, A == its fair share and the <= boundary counts
    # as saturated — same allocation, flag flipped)
    rich = {
        r["source"]: r
        for r in text.mixture_proportional_fill(df, wts, 150).collect()
    }
    assert not any(r["saturated"] for r in rich.values())
    assert rich["A"]["alloc_tokens"] == pytest.approx(75.0)
    assert rich["B"]["alloc_tokens"] == pytest.approx(37.5)
    edge = {
        r["source"]: r
        for r in text.mixture_proportional_fill(df, wts, 200).collect()
    }
    assert edge["A"]["saturated"] and edge["A"]["alloc_tokens"] == 100.0
    assert edge["A"]["rate"] == 1.0
    # repetition-aware recipe: max_epochs=2 doubles A's effective
    # availability before it saturates; its rate reports the true
    # upsampling factor (2.0) while available_tokens stays 1-epoch
    rep = {
        r["source"]: r
        for r in text.mixture_proportional_fill(
            df, wts, 2000, max_epochs=2.0
        ).collect()
    }
    assert rep["A"]["saturated"] and rep["A"]["alloc_tokens"] == 200.0
    assert rep["A"]["rate"] == 2.0 and rep["A"]["available_tokens"] == 100
    assert rep["B"]["alloc_tokens"] == pytest.approx(900.0)
    assert rep["C"]["rate"] == pytest.approx(0.45)
    assert sum(r["alloc_tokens"] for r in rep.values()) == pytest.approx(2000.0)
    # contracts
    with pytest.raises(ValueError, match="max_epochs"):
        text.mixture_proportional_fill(df, wts, 100, max_epochs=0.5)
    with pytest.raises(ValueError, match="sum to 1"):
        text.mixture_proportional_fill(df, {"A": 0.5, "B": 0.25, "C": 0.3}, 100)
    with pytest.raises(ValueError, match="> 0"):
        text.mixture_proportional_fill(df, {"A": 1.0, "B": 0.0, "C": 0.0}, 100)
    with pytest.raises(ValueError, match="token_budget"):
        text.mixture_proportional_fill(df, wts, -1)
    with pytest.raises(ValueError, match="mismatch"):
        text.mixture_proportional_fill(df, {"A": 0.5, "B": 0.5}, 100)
    with pytest.raises(ValueError, match="mismatch"):
        text.mixture_proportional_fill(
            df, {"A": 0.5, "B": 0.25, "C": 0.125, "D": 0.125}, 100
        )
    # a NaN token count would poison the per-source sum and silently
    # kill saturation for every later row — fail loud instead
    # (code-review r16, the select_within_token_budget guard)
    nan_df = spark.createDataFrame(
        [("A", 10.0), ("B", float("nan")), ("C", 5.0)],
        "source string, token_count double",
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        text.mixture_proportional_fill(nan_df, wts, 100)
    with_null = df.unionByName(
        spark.createDataFrame([(None, 5)], "source string, token_count long")
    )
    with pytest.raises(ValueError, match="NULL"):
        text.mixture_proportional_fill(with_null, wts, 100)


def test_apportion_integer_counts_hamilton(spark):
    """Hand-computed largest-remainder apportionment: 7 slots over
    weights 4/3/2 → quotas 28/9, 21/9, 14/9 = 3.11, 2.33, 1.56;
    bases 3+2+1=6, one leftover goes to the largest remainder (C at
    .56) → 3, 2, 2. Naive rounding would give 3+2+2=7 here but
    drifts in general; the sum contract is exact by construction."""
    df = spark.createDataFrame(
        [("A", 4.0), ("B", 3.0), ("C", 2.0)], "source string, alloc_tokens double"
    )
    out = {r["source"]: r for r in text.apportion_integer_counts(df, 7).collect()}
    assert {s: r["n_alloc"] for s, r in out.items()} == {"A": 3, "B": 2, "C": 2}
    assert out["A"]["quota"] == pytest.approx(28 / 9)
    # ties break group-ascending: weights 1/1 over 1 slot → A wins
    tie = spark.createDataFrame(
        [("B", 1.0), ("A", 1.0)], "source string, alloc_tokens double"
    )
    tout = {r["source"]: r["n_alloc"]
            for r in text.apportion_integer_counts(tie, 1).collect()}
    assert tout == {"A": 1, "B": 0}
    # zero-weight group gets nothing; total still exact
    zw = spark.createDataFrame(
        [("A", 5.0), ("B", 0.0)], "source string, alloc_tokens double"
    )
    zout = {r["source"]: r["n_alloc"]
            for r in text.apportion_integer_counts(zw, 3).collect()}
    assert zout == {"A": 3, "B": 0}
    # total=0 allocates nothing
    assert all(
        r["n_alloc"] == 0
        for r in text.apportion_integer_counts(df, 0).collect()
    )
    # contracts: negative total, NULL/NaN/negative weights, all-zero
    with pytest.raises(ValueError, match="total"):
        text.apportion_integer_counts(df, -1)
    for bad in [("D", None), ("D", float("nan")), ("D", -1.0)]:
        bdf = df.unionByName(
            spark.createDataFrame([bad], "source string, alloc_tokens double")
        )
        with pytest.raises(ValueError, match="NULL/NaN/negative"):
            text.apportion_integer_counts(bdf, 5)
    allz = spark.createDataFrame(
        [("A", 0.0), ("B", 0.0)], "source string, alloc_tokens double"
    )
    with pytest.raises(Exception, match="all weights are zero"):
        text.apportion_integer_counts(allz, 5).collect()


def test_dedup_keep_best(spark):
    docs = spark.createDataFrame(
        [
            (1, 0.5),
            (2, 0.9),   # best of component {1,2,3} — NOT the min id
            (3, 0.7),
            (10, 0.2),  # unpaired: keeps itself
            (11, 0.4),
            (12, 0.4),  # ties break to the LOWER id → 11 wins
        ],
        "doc_id long, quality_score double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (11, 12)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_keep_best(docs, pairs, "quality_score").collect()
    }
    assert sorted(out) == [2, 10, 11]
    assert out[2]["group_key"] == 1  # component keyed by min id
    assert out[10]["group_key"] == 10
    assert out[11]["group_key"] == 11
    assert out[2]["quality_score"] == 0.9
    # NULL/NaN scores fail loud (ADVICE r15): a NULL sorts last under
    # DESC and silently loses its component — or wins it when every
    # member is NULL — instead of surfacing the unscored row
    with_null = docs.unionByName(
        spark.createDataFrame([(99, None)], "doc_id long, quality_score double")
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        dedup.dedup_keep_best(with_null, pairs, "quality_score")
    with_nan = docs.unionByName(
        spark.createDataFrame(
            [(99, float("nan"))], "doc_id long, quality_score double"
        )
    )
    with pytest.raises(ValueError, match="NULL/NaN"):
        dedup.dedup_keep_best(with_nan, pairs, "quality_score")


def test_connected_components_logarithmic_convergence(spark):
    """VERDICT r4 item 6: pointer jumping bounds the round count by
    O(log diameter), not O(diameter). A 64-link chain (worst case for
    plain one-hop min-label propagation, which needs ~64 rounds and
    would silently exceed max_iters=20) must close in ≤ ⌈log2 64⌉+2 =
    8 rounds and still resolve every node to the chain minimum."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    iters: list[int] = []
    comp = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            pairs, iteration_counter=iters
        ).collect()
    }
    assert set(comp.values()) == {0} and len(comp) == 65
    assert iters[0] <= 8, f"64-chain took {iters[0]} rounds (expected ≤ 8)"


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_pack_documents(spark):
    rows = [(i, " ".join(["w"] * 10)) for i in range(40)]  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.pack_documents(df, token_budget=25, num_buckets=2).collect()
    assert len(out) == 40
    by_doc = {r["doc_id"]: r for r in out}
    # offsets are exclusive prefix sums within the bucket, in id order
    for bucket in (0, 1):
        docs = sorted(
            (r for r in out if r["bucket"] == bucket), key=lambda r: r["doc_id"]
        )
        expect = 0
        for r in docs:
            assert r["pack_offset"] == expect
            assert r["pack_id"] == expect // 25
            expect += r["token_count"]
    # determinism: identical assignment on rerun
    again = {r["doc_id"]: (r["bucket"], r["pack_id"]) for r in
             text.pack_documents(df, token_budget=25, num_buckets=2).collect()}
    assert again == {d: (r["bucket"], r["pack_id"]) for d, r in by_doc.items()}


def test_scrub_pii(spark):
    rows = [
        (1, "contact john.doe+x@example.com or call 555-123-4567 today"),
        (2, "ssn 123-45-6789 on file"),
        (3, "clean document with no identifiers at all"),
        (4, "two mails a@b.io c@d.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.scrub_pii(df).collect()}
    assert "<EMAIL>" in out[1]["scrubbed_text"]
    assert "<PHONE>" in out[1]["scrubbed_text"]
    assert out[1]["n_redactions"] == 2 and out[1]["had_pii"]
    assert out[2]["scrubbed_text"] == "ssn <SSN> on file"
    assert out[3]["n_redactions"] == 0 and not out[3]["had_pii"]
    assert out[4]["n_redactions"] == 2
    assert "john.doe" not in out[1]["scrubbed_text"]


def test_repetition_stats(spark):
    rows = [
        (1, "a b c\na b c\nd e f"),          # 1 dup line of 3
        (2, "x y z w v u"),                   # no repetition
        (3, "spam spam spam spam spam spam"), # heavy n-gram repetition
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
    assert out[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-4)
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["dup_ngram_frac"] == pytest.approx(3 / 4, abs=1e-4)  # 4 grams, 1 distinct


def test_benchmark_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "completely novel content nothing shared here"),
            (3, "the quick brown fox jumps high and then some extra words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in text.benchmark_overlap(docs, bench).collect()}
    assert out[1]["overlap_frac"] == pytest.approx(1.0)  # fully contaminated
    assert out[2]["overlap_frac"] == 0.0 and out[2]["n_matched"] == 0
    assert 0.0 < out[3]["overlap_frac"] < 1.0  # partial overlap
    # a NULL-text doc surfaces with n_grams=0 and overlap_frac=0.0 —
    # NOT a NULL 0/0 a downstream `> t` filter would silently pass
    # over (code-review r16)
    with_null = docs.unionByName(
        spark.createDataFrame([(9, None)], "doc_id long, text string")
    )
    nul = {
        r["doc_id"]: r
        for r in text.benchmark_overlap(with_null, bench).collect()
    }[9]
    assert nul["n_grams"] == 0 and nul["n_matched"] == 0
    assert nul["overlap_frac"] == 0.0


def test_decontaminate_against_policies(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps high"),
            (2, "completely novel content nothing shared here"),
            (3, "the quick brown fox jumps high and then some extra words"),
            (4, "short doc"),  # fewer tokens than ngram → pseudo-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps high"), (101, "short doc")],
        "doc_id long, text string",
    )
    # verbatim protocol (default): any shared 3-gram disqualifies
    kept = text.decontaminate_against(docs, bench, ngram=3)
    assert sorted(r["doc_id"] for r in kept.collect()) == [2]
    assert "contaminated" not in kept.columns  # drop mode strips the flag
    # keep_flag mode returns EVERY doc + the decision column, and the
    # drop mode's survivor set is exactly the un-flagged rows
    flagged = {
        r["doc_id"]: r
        for r in text.decontaminate_against(
            docs, bench, ngram=3, keep_flag=True
        ).collect()
    }
    assert sorted(flagged) == [1, 2, 3, 4]
    assert flagged[1]["contaminated"] and flagged[3]["contaminated"]
    assert not flagged[2]["contaminated"]
    # the sub-ngram doc copied verbatim from a benchmark item flags
    # through the whole-text pseudo-gram
    assert flagged[4]["contaminated"]
    # max_hits loosens the verbatim rule: doc 4's single pseudo-gram
    # hit survives max_hits=1 while docs 1/3 (4 hits each) still drop
    assert flagged[3]["n_hits"] == 4 and flagged[4]["n_hits"] == 1
    kept_loose = text.decontaminate_against(docs, bench, ngram=3, max_hits=1)
    assert sorted(r["doc_id"] for r in kept_loose.collect()) == [2, 4]
    # fractional protocol: doc 3 is 4/9 contaminated — passes at a
    # 0.5 threshold, fails at 0.3; doc 1 (frac 1.0) always fails
    frac = {
        r["doc_id"]: r
        for r in text.decontaminate_against(
            docs, bench, ngram=3, overlap_threshold=0.5, keep_flag=True
        ).collect()
    }
    assert frac[1]["contaminated"] and not frac[3]["contaminated"]
    frac_tight = {
        r["doc_id"]: r
        for r in text.decontaminate_against(
            docs, bench, ngram=3, overlap_threshold=0.3, keep_flag=True
        ).collect()
    }
    assert frac_tight[3]["contaminated"]
    # contracts
    with pytest.raises(ValueError, match="overlap_threshold"):
        text.decontaminate_against(docs, bench, overlap_threshold=1.5)
    with pytest.raises(ValueError, match="max_hits"):
        text.decontaminate_against(docs, bench, max_hits=-1)
    # a NULL-text doc yields NULL shingles; it must surface
    # explicitly (n_grams=0, un-contaminated) rather than vanish from
    # both the flag and drop outputs through the explode (ADVICE r15)
    with_null = docs.unionByName(
        spark.createDataFrame([(9, None)], "doc_id long, text string")
    )
    nflag = {
        r["doc_id"]: r
        for r in text.decontaminate_against(
            with_null, bench, ngram=3, keep_flag=True
        ).collect()
    }
    assert sorted(nflag) == [1, 2, 3, 4, 9]
    assert nflag[9]["n_grams"] == 0 and nflag[9]["n_hits"] == 0
    assert not nflag[9]["contaminated"]
    nkept = text.decontaminate_against(with_null, bench, ngram=3)
    assert sorted(r["doc_id"] for r in nkept.collect()) == [2, 9]


def test_gopher_quality_filter(spark):
    docs = spark.createDataFrame(
        [
            # healthy natural-ish text: passes every rule
            (1, "the quick brown fox and the lazy dog ran to the old "
                "mill by the river bank in the morning light as it was"),
            (2, "tiny"),                                   # fails length
            (3, "the " * 30 + "end of it was a"),          # dup bigrams
            (4, "supercalifragilistic " * 25 + "of the it a was"),  # long tokens
            (5, "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( " * 3
                + "the of it a was and to in is that for on"),  # punct-heavy
            (6, "alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lmbda mu nu xi omicron pi rho sigma tau upsilon"),
            # ^ no stopwords at all → fails the stopword floor
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.gopher_quality_filter(
            docs, min_tokens=10, keep_flag=True
        ).collect()
    }
    assert sorted(out) == [1, 2, 3, 4, 5, 6]
    assert out[1]["keep"], out[1]
    assert not out[2]["pass_length"] and not out[2]["keep"]
    assert not out[3]["pass_dup_ngrams"] and not out[3]["keep"]
    assert not out[4]["pass_token_len"] and not out[4]["keep"]
    assert not out[5]["pass_punct"] and not out[5]["keep"]
    assert not out[6]["pass_stopwords"] and not out[6]["keep"]
    # drop mode returns exactly the keep=true rows, keep stripped
    kept = text.gopher_quality_filter(docs, min_tokens=10)
    assert "keep" not in kept.columns
    assert sorted(r["doc_id"] for r in kept.collect()) == [
        i for i in out if out[i]["keep"]
    ]
    # duplicate-line rule: three identical lines out of four
    liney = spark.createDataFrame(
        [(9, "the cat sat\nthe cat sat\nthe cat sat\nthe dog of it was a")],
        "doc_id long, text string",
    )
    row = text.gopher_quality_filter(
        liney, min_tokens=5, max_dup_ngram_frac=1.0, keep_flag=True
    ).collect()[0]
    assert not row["pass_dup_lines"] and not row["keep"]


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_decontaminate_semantic_methods_and_drop(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((30, 8))
    # plant two near-copies of bench vectors inside the train side
    base[20] = base[0] * 1.001
    base[21] = base[1] * 0.999
    rows = [(i, [float(x) for x in base[i]]) for i in range(30)]
    train = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    bench = train.filter(F.col("vec_id") < 3)
    flagged = {
        r["vec_id"]: r
        for r in similarity.decontaminate_semantic(
            train, bench, threshold=0.95, method="exact", keep_flag=True
        ).collect()
    }
    assert sorted(flagged) == list(range(30))
    # bench members self-hit at cosine 1.0; the planted copies flag
    for i in (0, 1, 2, 20, 21):
        assert flagged[i]["contaminated"], i
    assert flagged[20]["max_cosine"] >= 0.999
    assert sum(r["contaminated"] for r in flagged.values()) == 5
    # checked == exact row-for-row (the union-with-residual contract)
    checked = {
        r["vec_id"]: r
        for r in similarity.decontaminate_semantic(
            train, bench, threshold=0.95, method="checked", keep_flag=True
        ).collect()
    }
    for i in range(30):
        assert checked[i]["n_bench_hits"] == flagged[i]["n_bench_hits"], i
        assert checked[i]["max_cosine"] == flagged[i]["max_cosine"], i
    # drop mode returns exactly the un-flagged rows, flag stripped
    kept = similarity.decontaminate_semantic(
        train, bench, threshold=0.95, method="exact"
    )
    assert "contaminated" not in kept.columns
    assert sorted(r["vec_id"] for r in kept.collect()) == [
        i for i in range(30) if i not in (0, 1, 2, 20, 21)
    ]
    # lsh path: a subset of exact (bucket recall), never a superset
    lsh = {
        r["vec_id"]: r
        for r in similarity.decontaminate_semantic(
            train, bench, threshold=0.95, method="lsh", keep_flag=True
        ).collect()
    }
    for i in range(30):
        assert lsh[i]["n_bench_hits"] <= flagged[i]["n_bench_hits"], i
        assert not lsh[i]["contaminated"] or flagged[i]["contaminated"], i
    # identical-direction planted pairs share every sign bucket → the
    # LSH path cannot miss them
    for i in (0, 1, 2, 20, 21):
        assert lsh[i]["contaminated"], i
    # a NULL embedding in the probed first train row fails loud with
    # the operator's contract instead of an unnamed TypeError deep
    # inside the hyperplane builder (ADVICE r15)
    null_first = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="NULL/empty"):
        similarity.decontaminate_semantic(
            null_first, bench, threshold=0.95, method="lsh"
        )
    # an empty train slice (a normal partitioned-pipeline input) must
    # return an empty frame on the LSH path, not crash deriving dim
    empty = train.filter(F.col("vec_id") < 0)
    assert (
        similarity.decontaminate_semantic(
            empty, bench, method="lsh", keep_flag=True
        ).count()
        == 0
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        similarity.decontaminate_semantic(train, bench, method="bogus")


def test_normalize_unicode(spark):
    rows = [
        (1, "café latte"),            # precomposed é — already NFC
        (2, "café latte"),           # e + combining accent → composes
        (3, "plain ascii text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.normalize_unicode(df).collect()}
    assert out[1]["normalized_text"] == "café latte" and not out[1]["changed"]
    assert out[2]["normalized_text"] == "café latte" and out[2]["changed"]
    assert not out[3]["changed"]
    # NFC makes the visually-identical pair hash-identical for dedup
    assert out[1]["normalized_text"] == out[2]["normalized_text"]


def test_span_dedup_removes_repeated_spans(spark):
    """Span-level exact dedup: first occurrence survives, repeats are
    cut even inside otherwise-unique documents, fully-duplicate docs
    surface with spans_kept=0."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.dedup import span_dedup

    boiler = " ".join(f"b{i}" for i in range(10))  # one exact 10-word span
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"c{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq_a}"),   # first occurrence of boiler
            (2, f"{boiler} {uniq_b}"),   # loses the boiler span only
            (3, boiler),                  # fully duplicate
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in span_dedup(df, span_words=10).collect()}
    assert len(out) == 3
    assert out[1]["spans_kept"] == 2 and out[1]["deduped_text"] == f"{boiler} {uniq_a}"
    assert out[2]["spans_kept"] == 1 and out[2]["deduped_text"] == uniq_b
    assert out[3]["spans_kept"] == 0 and out[3]["deduped_text"] == ""
    assert out[3]["spans_total"] == 1


def test_span_dedup_short_tail_span(spark):
    """Documents whose word count isn't a span multiple keep the
    short trailing span as its own unit."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(1, "x0 x1 x2 x3 x4 x5 x6 x7 x8 x9 tail1 tail2")],
        "doc_id bigint, text string",
    )
    row = span_dedup(df, span_words=10).collect()[0]
    assert row["spans_total"] == 2
    assert row["deduped_text"].endswith("tail1 tail2")


def test_semantic_dedup_prunes_neighborhoods(spark):
    """SemDeDup: near-identical vectors collapse to one kept
    representative (lowest id); distinct directions all survive."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((6, 8))
    rows = []
    for i in range(6):
        v = base[i] / np.linalg.norm(base[i])
        rows.append((i, [float(x) for x in v]))
        # id 100+i: near-duplicate of vector i (tiny perturbation)
        w = v + 1e-3 * rng.standard_normal(8)
        w = w / np.linalg.norm(w)
        rows.append((100 + i, [float(x) for x in w]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.semantic_dedup(df, threshold=0.98, n_centroids=4).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 12
    for i in range(6):
        assert by_id[i]["keep"] is True  # lowest id of its neighborhood
    # every near-dup twin is pruned and points at its original
    pruned = [r for r in out if not r["keep"]]
    assert len(pruned) == 6
    assert all(r["dup_of"] == r["vec_id"] - 100 for r in pruned)


def test_pq_roundtrip_and_topk_recall(spark):
    """PQ: codes are m small ints; ADC top-1 finds the exact nearest
    neighbor for in-corpus queries (self-match at distance ~0)."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.standard_normal((32, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(32)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = similarity.train_pq_codebooks(df, m=4, nbits=4, sample_size=32, iters=6)
    assert books.shape == (4, 16, 4)
    codes = similarity.pq_encode(df, books)
    first = codes.first()
    assert len(first["pq_codes"]) == 4
    assert all(0 <= c < 16 for c in first["pq_codes"])

    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(3)],
        "query_id long, query_vec array<double>",
    )
    top = similarity.pq_topk(codes, books, queries, k=1)
    got = {r["query_id"]: r["vec_id"] for r in top.collect()}
    # with 32 training points == corpus, quantization cells are tight
    # enough that each query's nearest code is its own vector
    assert got == {0: 0, 1: 1, 2: 2}


def test_span_dedup_plan_shape(spark):
    """Span dedup must stay linear: the winner join is EQUI-keyed on
    span_text (shuffle/sort-merge is fine — it's linear), never a
    cartesian product or a nested-loop join, and every exchange is a
    hash partitioning (no global sorts, no single-partition funnels
    before the final agg)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.dedup import span_dedup

    df = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(25))) for i in range(8)],
        "doc_id bigint, text string",
    )
    plan = span_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "rangepartitioning" not in plan and "SinglePartition" not in plan


def test_ivf_pq_search_recall(spark):
    """IVF-PQ composition: probe-bounded candidate set + ADC scoring
    still finds each in-corpus query's own vector at rank 1 with
    generous probes and tight codebooks."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((48, 16))
    rows = [(i, [float(x) for x in base[i]]) for i in range(48)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, cents = similarity.build_ivf_index(df, n_centroids=4)
    books = similarity.train_pq_codebooks(df, m=4, nbits=4, sample_size=48, iters=6)
    pq_index = similarity.ivf_pq_encode(indexed, books)
    assert set(pq_index.columns) == {"vec_id", "cid", "pq_codes"}

    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(4)],
        "query_id long, query_vec array<double>",
    )
    top = similarity.ivf_pq_search(pq_index, cents, books, queries, k=1, n_probe=4)
    got = {r["query_id"]: r["vec_id"] for r in top.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_residual_pq_beats_raw_pq_recall(spark):
    """FAISS-style IVFADC claim, measured: quantizing v − centroid
    instead of v spends the same m×2^nbits code budget on a
    lower-variance target, so ADC shortlists recall more of the true
    top-k at identical index bytes. On the driver ANN fixture the
    lift is 0.33 → 0.43; here both modes run on sf0.001 and the
    residual mode must (a) clear its own floor and (b) never lose to
    raw. Self-recall sanity: an in-corpus query must find its own
    vector at rank 1 through the residual path too."""
    import os

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata unavailable")
    from healthcare_data_lakehouse_using_gcp_spark import corpus

    e, q = corpus._ann_queries(spark, sf_dir)
    qv = q.select("query_id", F.col("embedding").alias("query_vec"))
    truth = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(e, q, k=10).collect()
    }
    indexed, cents = similarity.build_ivf_index(e, n_centroids=16)
    indexed = indexed.localCheckpoint(eager=True)

    raw_books = similarity.train_pq_codebooks(e, m=8, nbits=4, sample_size=256)
    raw_idx = similarity.ivf_pq_encode(indexed, raw_books)
    raw_hits = sum(
        1
        for r in similarity.ivf_pq_search(
            raw_idx, cents, raw_books, qv, k=10, n_probe=6
        ).collect()
        if (r["query_id"], r["vec_id"]) in truth
    )

    res_books = similarity.train_pq_codebooks_residual(
        indexed, cents, m=8, nbits=4, sample_size=256
    )
    res_idx = similarity.ivf_pq_encode(indexed, res_books, centroids_df=cents)
    res_hits = sum(
        1
        for r in similarity.ivf_pq_search(
            res_idx, cents, res_books, qv, k=10, n_probe=6, residual=True
        ).collect()
        if (r["query_id"], r["vec_id"]) in truth
    )
    assert res_hits / len(truth) >= 0.35, f"residual recall {res_hits/len(truth):.2f}"
    assert res_hits >= raw_hits, (res_hits, raw_hits)

    # the underlying claim, measured directly: residual codebooks are
    # the strictly better quantizer — lower reconstruction MSE at
    # identical code bytes (0.489 vs 0.547 on this fixture)
    import numpy as np

    rows = indexed.collect()
    X = np.array([r["embedding"] for r in rows])
    cid = np.array([r["cid"] for r in rows])
    C = np.array([r["centroid"] for r in cents.orderBy("cid").collect()])

    def recon_mse(books, target, add_back):
        b = np.asarray(books)
        m, _, dsub = b.shape
        parts = []
        for sub in range(m):
            xs = target[:, sub * dsub : (sub + 1) * dsub]
            code = ((xs[:, None, :] - b[sub][None, :, :]) ** 2).sum(2).argmin(1)
            parts.append(b[sub][code])
        recon = np.concatenate(parts, axis=1) + add_back
        return float(((X - recon) ** 2).sum(1).mean())

    raw_mse = recon_mse(raw_books, X, 0.0)
    res_mse = recon_mse(res_books, X - C[cid], C[cid])
    assert res_mse < raw_mse, (res_mse, raw_mse)

    # self-recall through the residual path
    self_q = e.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    top = similarity.ivf_pq_search(
        res_idx, cents, res_books, self_q, k=1, n_probe=16, residual=True
    )
    assert all(r["query_id"] == r["vec_id"] for r in top.collect())


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_ivf_pq_index_save_load_roundtrip(spark, tmp_path):
    """The IVF-PQ serving index persists whole (codes partitioned by
    inverted list + centroids + flattened codebooks, no pickle): a
    fresh load must reproduce the pre-save search exactly, for both
    raw and residual codebooks."""
    import numpy as np

    rng = np.random.default_rng(5)
    base = rng.standard_normal((64, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(64)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i] + 0.05]) for i in range(4)],
        "query_id long, query_vec array<double>",
    )
    indexed, cents = similarity.build_ivf_index(df, n_centroids=4)
    indexed = indexed.localCheckpoint(eager=True)
    for mode in ("raw", "residual"):
        if mode == "raw":
            books = similarity.train_pq_codebooks(df, m=4, nbits=4, sample_size=64)
            pq_index = similarity.ivf_pq_encode(indexed, books)
        else:
            books = similarity.train_pq_codebooks_residual(
                indexed, cents, m=4, nbits=4, sample_size=64
            )
            pq_index = similarity.ivf_pq_encode(indexed, books, centroids_df=cents)
        before = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in similarity.ivf_pq_search(
                pq_index, cents, books, queries, k=3, n_probe=4,
                residual=(mode == "residual"),
            ).collect()
        }
        path = str(tmp_path / f"pqidx_{mode}")
        similarity.save_ivf_pq_index(pq_index, cents, books, path)
        l_idx, l_cents, l_books = similarity.load_ivf_pq_index(spark, path)
        assert np.allclose(l_books, np.asarray(books))
        after = {
            (r["query_id"], r["rank"]): r["vec_id"]
            for r in similarity.ivf_pq_search(
                l_idx, l_cents, l_books, queries, k=3, n_probe=4,
                residual=(mode == "residual"),
            ).collect()
        }
        assert after == before, mode


def test_ivf_seeding_unbiased_on_id_clustered_corpus(spark):
    """VERDICT r3 item 6: seeding k-means from the first n ids is
    biased when the corpus is id-sorted by source — every seed lands
    in one source's embedding cluster. The spread sample (lowest-n by
    md5(seed||id)) must (a) not return the first-n ids, (b) give every
    well-separated cluster at least one centroid, so no inverted list
    swallows the corpus and n_probe=1 self-recall holds for EVERY
    cluster, not just the one that owned the low ids."""
    import numpy as np

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((4, 16)) * 8.0
    rows = []
    for c in range(4):  # ids strictly cluster-ordered: 0-31, 32-63, ...
        for j in range(32):
            v = centers[c] + 0.1 * rng.standard_normal(16)
            rows.append((c * 32 + j, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # the raw sample is id-decorrelated: orderBy(id).limit(8) would
    # return ids 0..7 (all cluster 0); the spread sample must not
    sampled_ids = [
        r[0] for r in similarity._spread_sample_rows(df, "vec_id", "vec_id", 8, 42)
    ]
    assert max(sampled_ids) >= 32, f"sample stuck in first cluster: {sampled_ids}"

    indexed, cents = similarity.build_ivf_index(df, n_centroids=8)
    sizes = {r["cid"]: r["count"] for r in indexed.groupBy("cid").count().collect()}
    assert max(sizes.values()) <= 64, f"one list swallowed the corpus: {sizes}"

    queries = spark.createDataFrame(
        [(c, rows[c * 32][1]) for c in range(4)],
        "query_id long, embedding array<double>",
    )
    top = similarity.ivf_topk(df, queries, k=1, n_centroids=8, n_probe=1)
    got = {r["query_id"]: r["vec_id"] for r in top.collect()}
    assert got == {c: c * 32 for c in range(4)}


def test_incremental_dedup_against_saved_index(spark, tmp_path):
    """Incremental pipeline: index an existing corpus once, then dedup
    a NEW batch against it without re-shingling the corpus; append the
    cleaned batch and catch a later redelivery of the same doc."""
    path = str(tmp_path / "mh_index")
    corpus_df = spark.createDataFrame(DOCS, "doc_id long, text string")
    dedup.save_minhash_index(corpus_df, path, num_hashes=24, bands=6)

    new_batch = spark.createDataFrame(
        [
            # near-dup of docs 1/2 (one word changed)
            (101, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
            # genuinely new
            (102, "spark structured streaming watermarks bound state for late arriving events"),
        ],
        "doc_id long, text string",
    )
    pairs = dedup.dedup_against_index(new_batch, path, threshold=0.5).collect()
    hit_new_ids = {r["new_id"] for r in pairs}
    assert 101 in hit_new_ids and 102 not in hit_new_ids
    assert {r["index_id"] for r in pairs if r["new_id"] == 101} == {1, 2, 3}
    assert all(0.5 <= r["jaccard"] <= 1.0 for r in pairs)

    # verify=False returns band candidates only (storage-light mode)
    cands = dedup.dedup_against_index(new_batch, path, verify=False).collect()
    assert {r["new_id"] for r in cands} >= {101}
    assert all(r["jaccard"] is None for r in cands)

    # append the clean doc; a redelivery of it must now be caught
    clean = new_batch.filter(F.col("doc_id") == 102)
    dedup.minhash_index_append(clean, path)
    redelivered = spark.createDataFrame(
        [(202, "spark structured streaming watermarks bound state for late arriving events")],
        "doc_id long, text string",
    )
    pairs2 = dedup.dedup_against_index(redelivered, path, threshold=0.8).collect()
    assert {(r["new_id"], r["index_id"]) for r in pairs2} == {(202, 102)}
    assert pairs2[0]["jaccard"] == 1.0


def test_dedup_against_index_fails_loudly_on_corruption(spark, tmp_path):
    """ADVICE r4: a candidate whose index_id has bands/ rows but no
    sets/ row (an append that crashed between writes) must raise at
    verification, not silently vanish through an inner join."""
    import shutil

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    path = str(tmp_path / "mh_corrupt")
    corpus_df = spark.createDataFrame(DOCS, "doc_id long, text string")
    dedup.save_minhash_index(corpus_df, path, num_hashes=24, bands=6)
    shutil.rmtree(f"{path}/sets")
    # recreate sets/ with only doc 5's row: docs 1/2/3 keep bands rows
    # but lose their verification sets — the corruption shape
    from healthcare_data_lakehouse_using_gcp_spark.operators.dedup import shingle_hash_frame

    only5 = shingle_hash_frame(
        corpus_df.filter(F.col("doc_id") == 5), "text", "doc_id", 3
    )
    only5.groupBy("doc_id").agg(F.collect_set("h").alias("hs")).write.parquet(
        f"{path}/sets"
    )
    near_dup_of_1 = spark.createDataFrame(
        [(301, "the quick brown fox jumps over the lazy dog near the river bank tonight")],
        "doc_id long, text string",
    )
    with pytest.raises(SparkRuntimeException, match="bands/ rows but no sets/ row"):
        dedup.dedup_against_index(near_dup_of_1, path, threshold=0.5)


def test_cap_per_source_salted_matches_exact(spark):
    """ADVICE r4: the two-stage salted cap (skew-safe plan for giant
    sources) must produce IDENTICAL survivors and ranks to the
    single-window exact plan."""
    rows = [(i, f"doc {i}", "big" if i < 90 else "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    exact = {
        (r["doc_id"], r["source_rank"])
        for r in text.cap_documents_per_source(df, cap=7).collect()
    }
    salted = {
        (r["doc_id"], r["source_rank"])
        for r in text.cap_documents_per_source(df, cap=7, salt_buckets=8).collect()
    }
    assert salted == exact and len({d for d, _ in exact}) == 7 + 7


def test_exact_rerank_matches_brute_force(spark):
    """Two-stage retrieval: an approximate shortlist reranked exactly
    must reproduce brute-force top-k whenever the shortlist contains
    the true top-k (generous probes here guarantee it)."""
    import numpy as np

    rng = np.random.default_rng(17)
    base = rng.standard_normal((40, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i] + 0.01 * rng.standard_normal(16)]) for i in range(3)],
        "query_id long, query_vec array<double>",
    )
    exact = similarity.brute_force_topk(
        df, queries.withColumnRenamed("query_vec", "embedding"), k=3
    )
    expected = {
        (r["query_id"], r["rank"]): r["vec_id"] for r in exact.collect()
    }
    got_df = similarity.ivf_pq_rerank_topk(
        df, queries, k=3, shortlist_factor=8, n_centroids=4, n_probe=4, m=4
    )
    got = {(r["query_id"], r["rank"]): r["vec_id"] for r in got_df.collect()}
    assert got == expected
    # rerank emits exact cosine, monotone in rank per query
    for r in got_df.collect():
        assert -1.0 <= r["cosine"] <= 1.0 + 1e-9


def test_cap_per_source_deterministic_and_capped(spark):
    """Per-source cap: skewed sources are cut to the cap, the kept set
    is md5-deterministic (not the lowest ids), and re-running yields
    the identical survivors."""
    rows = [(i, f"doc {i}", "big") for i in range(100)] + [
        (1000 + i, f"doc {1000+i}", "small") for i in range(3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = text.cap_documents_per_source(df, cap=10, strata_col="source")
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["big"]) == 10 and len(by_src["small"]) == 3
    assert set(by_src["big"]) != set(range(10)), "cap must not be id-order-biased"
    again = {r["doc_id"] for r in text.cap_documents_per_source(
        df, cap=10, strata_col="source").collect()}
    assert again == {r["doc_id"] for r in got}
    assert all(1 <= r["source_rank"] <= 10 for r in got)


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunking: every token is covered, consecutive chunks overlap by
    exactly overlap_tokens, short docs give one chunk, and the tail
    chunk's token count exposes its short length."""
    long_doc = " ".join(f"t{i}" for i in range(150))
    df = spark.createDataFrame(
        [(1, long_doc), (2, "a b c")], "doc_id long, text string"
    )
    out = text.chunk_documents(df, chunk_tokens=64, overlap_tokens=16)
    chunks = {r["doc_id"]: [] for r in out.collect()}
    for r in out.orderBy("doc_id", "chunk_idx").collect():
        chunks[r["doc_id"]].append(r)
    c1 = chunks[1]
    assert [c["chunk_start"] for c in c1] == [0, 48, 96]
    assert c1[0]["chunk_token_count"] == 64
    assert c1[-1]["chunk_token_count"] == 150 - 96  # short tail kept
    # overlap: last 16 tokens of chunk k == first 16 of chunk k+1
    for a, b in zip(c1, c1[1:]):
        assert a["chunk_text"].split()[48:] == b["chunk_text"].split()[:16]
    # union of chunks covers every token exactly in order
    seen = c1[0]["chunk_text"].split()
    for b in c1[1:]:
        seen += b["chunk_text"].split()[16:]
    assert seen == long_doc.split()
    assert [r["chunk_token_count"] for r in chunks[2]] == [3]


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        text.chunk_documents(df, chunk_tokens=16, overlap_tokens=16)


def test_new_ops_plan_shapes(spark, tmp_path):
    """Scale-shape assertions for the r4 operators: chunking is
    shuffle-free, the per-source cap pays exactly one exchange (the
    window's), incremental index lookup joins equi (never cartesian),
    and the rerank fetch prunes via a semi-join."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(80)), f"s{i%3}") for i in range(12)],
        "doc_id long, text string, source string",
    )
    chunk_plan = text.chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in chunk_plan

    cap_plan = (
        text.cap_documents_per_source(docs, cap=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert cap_plan.count("Exchange") == 1
    assert "SinglePartition" not in cap_plan

    path = str(tmp_path / "mhidx")
    dedup.save_minhash_index(docs, path)
    # materialize=False: inspect the real plan, not a checkpoint scan
    inc_plan = (
        dedup.dedup_against_index(docs.limit(3), path, threshold=0.5, materialize=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in inc_plan
    assert "BroadcastNestedLoopJoin" not in inc_plan

    import numpy as np

    rng = np.random.default_rng(23)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    cands = spark.createDataFrame(
        [(0, i) for i in range(5)], "query_id long, vec_id long"
    )
    queries = spark.createDataFrame(
        [(0, [float(x) for x in rng.standard_normal(8)])],
        "query_id long, query_vec array<double>",
    )
    rr_plan = (
        similarity.exact_rerank_topk(cands, vecs, queries, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in rr_plan
    assert "CartesianProduct" not in rr_plan


def test_unigram_perplexity_ranks_junk_higher(spark):
    """LM perplexity: common-token docs score low, rare-token docs
    high; OOV tokens hit the floor logprob; vocab_size caps the LM."""
    rows = [(i, "the common words appear here " * 3) for i in range(8)]
    rows.append((100, "zzyzx qwxyz vvvvq"))  # rare junk
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = text.train_unigram_lm(df)
    out = {r["doc_id"]: r for r in text.unigram_perplexity(df, lm).collect()}
    common_ppl = out[0]["perplexity"]
    junk_ppl = out[100]["perplexity"]
    assert junk_ppl > common_ppl * 3

    # capped vocab: junk tokens (freq 1) fall out -> OOV floor dominates
    lm_small = text.train_unigram_lm(df, vocab_size=5)
    assert lm_small.count() == 5
    out2 = {r["doc_id"]: r for r in text.unigram_perplexity(df, lm_small, oov_logp=-20.0).collect()}
    import math
    assert abs(out2[100]["avg_neg_logprob"] - 20.0) < 1e-6
    assert out2[100]["perplexity"] >= math.exp(19.9)

    # materialize=False (lazy pipelined LM, r6) is semantics-identical
    # to the eager-checkpoint default — only the job structure differs
    lm_lazy = text.train_unigram_lm(df, vocab_size=5, materialize=False)
    assert sorted(map(tuple, lm_lazy.collect())) == sorted(
        map(tuple, lm_small.collect())
    )
    spark.catalog.clearCache()  # release the lazy counts cache


def test_feature_hash_embed_feeds_ann(spark, docs):
    """Feature-hashing embedder: unit-norm vectors, identical docs get
    identical embeddings, and the output composes directly with the
    ANN operator — a doc's nearest non-self neighbor is its exact
    duplicate."""
    import math

    emb = text.feature_hash_embed(docs, dim=32)
    rows = {r["doc_id"]: r for r in emb.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    for r in rows.values():
        nrm = math.sqrt(sum(v * v for v in r["embedding"]))
        assert abs(nrm - 1.0) < 1e-9 or nrm == 0.0
    assert rows[1]["embedding"] == rows[2]["embedding"]  # exact dups
    assert rows[1]["embedding"] != rows[4]["embedding"]

    corpus_df = emb.selectExpr("doc_id as vec_id", "embedding")
    queries = corpus_df.filter(F.col("vec_id") == 1).selectExpr(
        "vec_id as query_id", "embedding"
    )
    top = similarity.brute_force_topk(corpus_df, queries, k=2).collect()
    by_rank = {r["rank"]: r for r in top}
    # rank 1 and 2 are the identical pair {1,2} in id order, cosine 1.0
    assert {by_rank[1]["vec_id"], by_rank[2]["vec_id"]} == {1, 2}
    assert abs(by_rank[2]["cosine"] - 1.0) < 1e-9


def test_leakage_safe_split_keeps_groups_together(spark, docs):
    """Group-level split: near-dup docs always land on the same side;
    membership is deterministic across runs; eval_frac=0 puts all in
    train."""
    pairs = dedup.ngram_jaccard_pairs(docs, shingle_size=3, threshold=0.5)
    out = dedup.leakage_safe_split(docs, pairs, eval_frac=0.5).collect()
    side = {r["doc_id"]: r["split"] for r in out}
    group = {r["doc_id"]: r["split_group"] for r in out}
    assert len(side) == 5
    # docs 1/2/3 are the near-dup group -> same group label, same side
    assert group[1] == group[2] == group[3]
    assert side[1] == side[2] == side[3]
    # singletons get their own label
    assert group[4] == 4 and group[5] == 5
    again = {r["doc_id"]: r["split"] for r in
             dedup.leakage_safe_split(docs, pairs, eval_frac=0.5).collect()}
    assert again == side
    all_train = dedup.leakage_safe_split(docs, pairs, eval_frac=0.0).collect()
    assert all(r["split"] == "train" for r in all_train)


def test_bpe_ish_pretokenize(spark):
    df = spark.createDataFrame(
        [(1, "don't stop! 42 times"), (2, "  spaced   out  "), (3, "a+b=c")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id",
        text.pretokens_col(F.col("text")).alias("toks"),
        text.pretoken_count_col(F.col("text")).alias("n"),
    ).collect()}
    assert out[1]["toks"] == ["don", "'", "t", "stop", "!", "42", "times"]
    assert out[1]["n"] == 7
    # whitespace never yields a pretoken
    assert out[2]["toks"] == ["spaced", "out"]
    assert out[3]["toks"] == ["a", "+", "b", "=", "c"]


# --- bigram_pmi (collocations) ---------------------------------------


def test_bigram_pmi_finds_planted_collocation(spark):
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.text import bigram_pmi

    # 'hong kong' always co-occurs; filler tokens pair randomly
    docs = spark.createDataFrame(
        [(i, "hong kong " + ("x y " if i % 2 else "y x ") * 3) for i in range(10)],
        "doc_id long, text string",
    )
    out = bigram_pmi(docs, min_count=5, k=10).collect()
    assert out, "no bigrams survived min_count"
    top = out[0]
    assert (top["w1"], top["w2"]) == ("hong", "kong")
    # hand-check the PMI: c_ab=10; 8 tokens/doc → N_uni=80 with
    # hong=kong=10; 7 bigrams/doc → N_bi=70
    expected = math.log((10 / 70) / ((10 / 80) * (10 / 80)))
    assert abs(top["pmi"] - expected) < 1e-3
    assert top["n_pair"] == 10


def test_bigram_pmi_min_count_filters(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import bigram_pmi

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d")], "doc_id long, text string"
    )
    pairs = {(r["w1"], r["w2"]) for r in bigram_pmi(docs, min_count=2, k=10).collect()}
    assert pairs == {("a", "b")}  # 'c d' seen once → filtered


def test_bigram_pmi_single_token_docs_contribute_unigrams_only(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import bigram_pmi

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "a b"), (3, "a b")], "doc_id long, text string"
    )
    out = bigram_pmi(docs, min_count=1, k=10).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b")}


def test_weighted_sample_favors_heavy_docs(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import (
        weighted_sample_per_group,
    )

    # 50 light docs (w=1) + 10 heavy docs (w=1000) in one group: a
    # k=10 weight-proportional draw should be dominated by heavies
    rows = [(i, "s", 1.0) for i in range(50)]
    rows += [(100 + i, "s", 1000.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    kept = {r["doc_id"] for r in weighted_sample_per_group(df, 10, "w").collect()}
    assert len(kept) == 10
    assert sum(1 for d in kept if d >= 100) >= 8  # heavies dominate


def test_weighted_sample_deterministic_and_bounded(spark):
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import (
        weighted_sample_per_group,
    )

    rows = [(i, f"g{i % 3}", float(1 + i % 7)) for i in range(90)]
    rows += [(999, "g0", 0.0), (998, "g1", -1.0)]  # unweightable -> dropped
    df = spark.createDataFrame(rows, "doc_id long, source string, w double")
    a = {r["doc_id"] for r in weighted_sample_per_group(df, 5, "w").collect()}
    b = {
        r["doc_id"]
        for r in weighted_sample_per_group(df.repartition(13), 5, "w").collect()
    }
    assert a == b  # partitioning-independent
    assert len(a) == 15 and 999 not in a and 998 not in a


def test_sample_per_group_uniform_reservoir(spark):
    """r8: fixed-COUNT per-group sampling (the distributed reservoir)
    — exactly n rows per group when the group is big enough, all rows
    when smaller, identical ids under any partitioning (two-phase
    balanced top-k shares weighted_sample_per_group's plan)."""
    from healthcare_data_lakehouse_using_gcp_spark.operators.text import (
        sample_per_group,
    )

    rows = [(i, f"g{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sample_per_group(df, 7)
    assert out.columns == ["doc_id", "source"]
    assert all(r["count"] == 7 for r in out.groupBy("source").count().collect())
    out2 = sample_per_group(df.repartition(17), 7)
    assert {tuple(r) for r in out.collect()} == {tuple(r) for r in out2.collect()}
    small = spark.createDataFrame([(1, "x"), (2, "x")], "doc_id long, source string")
    assert sample_per_group(small, 7).count() == 2


def test_source_divergence_flags_templated_source(spark):
    import math

    from healthcare_data_lakehouse_using_gcp_spark.operators.text import (
        source_token_divergence,
    )

    docs = [(i, "varied", f"unique{i} words all over the place {i}") for i in range(10)]
    docs += [(100 + i, "templated", "same same same same") for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_token_divergence(df).collect()}
    # single-token source: entropy exactly 0
    assert abs(out["templated"]["entropy"]) < 1e-12
    assert out["varied"]["entropy"] > 1.0
    # both diverge from the pooled corpus; KL is non-negative
    assert out["templated"]["kl_vs_corpus"] > 0
    assert out["varied"]["kl_vs_corpus"] >= 0
    # hand-check templated KL: p('same')=1, q('same')=40/110
    assert abs(out["templated"]["kl_vs_corpus"] - math.log(110 / 40)) < 1e-9


# --- BPE tokenizer training + apply ----------------------------------


def test_bpe_train_hand_computed_merges(spark):
    """The classic hug/pug/pun/bun/hugs histogram (HF tokenizer-course
    example) — merge order verified by hand, including the
    lexicographic tie-break at rank 4: after (h,ug) the hugs word is
    [hug, s], so (hug,s) ties (p,ug) at 5 and wins lexicographically
    ('hug' < 'p')."""
    words = ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    merges = text.bpe_train(df, n_merges=5)
    assert merges == [("u", "g"), ("u", "n"), ("h", "ug"), ("p", "un"), ("hug", "s")]
    # exhausting the pair space stops early instead of looping
    assert len(text.bpe_train(df, n_merges=100)) < 100


def test_bpe_word_histogram_is_vocab_sized(spark):
    df = spark.createDataFrame(
        [(1, "to be or not to be"), (2, "to be!")], "doc_id long, text string"
    )
    hist = {r["word"]: r["freq"] for r in text.bpe_word_histogram(df).collect()}
    assert hist == {"to": 3, "be": 3, "or": 1, "not": 1, "!": 1}
    capped = text.bpe_word_histogram(df, vocab_cap=2).collect()
    assert {r["word"] for r in capped} == {"to", "be"}


def test_bpe_apply_encodes_with_learned_merges(spark):
    words = ["hug"] * 10 + ["pug"] * 5 + ["pun"] * 12 + ["bun"] * 4 + ["hugs"] * 5
    train = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    merges = text.bpe_train(train, n_merges=5)
    df = spark.createDataFrame([(1, "hugs pun"), (2, "bug")], "doc_id long, text string")
    out = {r["doc_id"]: r for r in text.bpe_apply(df, merges).collect()}
    # hugs: u+g -> h+ug -> hug+s -> [hugs]; pun: u+n -> p+un -> [pun]
    assert out[1]["bpe_tokens"] == ["hugs", "pun"]
    assert out[1]["n_bpe_tokens"] == 2
    # unseen word: only the (u,g) merge applies
    assert out[2]["bpe_tokens"] == ["b", "ug"]
    # empty merge table degrades to characters
    chars = text.bpe_apply(df, []).collect()
    assert all(r["n_bpe_tokens"] == len((r["text"]).replace(" ", "")) for r in chars)


def test_bpe_apply_matches_trainer_tokenization_on_unicode_whitespace(spark):
    """ADVICE r7: apply-side pre-tokenization must run through the
    SAME Spark expression as training. Java's \\s is ASCII-only, so
    NBSP / U+2028 are *punctuation runs* to the trainer; a Python-re
    split (Unicode \\s) would swallow them and mint words no merge
    ever saw. Gate: bpe_apply([]) must degrade to exactly the
    trainer's pre-token characters, NBSP included."""
    df = spark.createDataFrame(
        [(1, "foo bar"), (2, "a b")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["bpe_tokens"] for r in text.bpe_apply(df, []).collect()}
    # NBSP is not Java-\s: it survives as its own punctuation pre-token
    assert out[1] == ["f", "o", "o", " ", "b", "a", "r"]
    assert out[2] == ["a", " ", "b"]
    # and the n_pretokens ≤ n_bpe_tokens invariant holds by construction
    pre = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", F.size(text.pretokens_col(F.lower("text"))).alias("n")
        ).collect()
    }
    cnt = {r["doc_id"]: r["n_bpe_tokens"] for r in text.bpe_apply(df, []).collect()}
    assert all(pre[d] <= cnt[d] for d in pre)


def test_bpe_train_uncapped_vocab_guard_fires(spark, monkeypatch):
    """VERDICT r7 item 4: vocab_cap=None must fail loudly when the
    distinct-word histogram exceeds the driver bound instead of
    silently collecting it (web-corpus driver OOM)."""
    monkeypatch.setattr(text, "MAX_UNCAPPED_VOCAB", 3)
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="vocab_cap"):
        text.bpe_train(df, n_merges=5, vocab_cap=None)
    # under the bound, uncapped training still works
    small = spark.createDataFrame([(1, "aa aa bb")], "doc_id long, text string")
    monkeypatch.setattr(text, "MAX_UNCAPPED_VOCAB", 100)
    assert text.bpe_train(small, n_merges=1, vocab_cap=None) == [("a", "a")]


def test_adc_query_collect_guard_fires(spark, monkeypatch):
    """VERDICT r7 item 4: the ADC scorers build per-query LUTs
    driver-side; an oversized query frame must raise with the bounded
    alternative, not OOM the driver."""
    from healthcare_data_lakehouse_using_gcp_spark.operators import similarity

    monkeypatch.setattr(similarity, "MAX_DRIVER_QUERIES", 2)
    q = spark.createDataFrame(
        [(i, [float(i), 0.0]) for i in range(5)],
        "query_id long, query_vec array<float>",
    )
    with pytest.raises(ValueError, match="MAX_DRIVER_QUERIES"):
        similarity._collect_queries_guarded(q, "query_id", "query_vec")
    monkeypatch.setattr(similarity, "MAX_DRIVER_QUERIES", 10)
    assert len(similarity._collect_queries_guarded(q, "query_id", "query_vec")) == 5


def test_bpe_train_deterministic_across_runs(spark, docs):
    m1 = text.bpe_train(docs, n_merges=20)
    m2 = text.bpe_train(docs, n_merges=20)
    assert m1 == m2 and len(m1) == 20


def test_bpe_merges_save_load_roundtrip(spark, docs, tmp_path):
    merges = text.bpe_train(docs, n_merges=15)
    path = str(tmp_path / "merges")
    text.save_bpe_merges(spark, merges, path)
    assert text.load_bpe_merges(spark, path) == merges
    # loaded table drives bpe_apply identically
    a = text.bpe_apply(docs, merges).select("doc_id", "n_bpe_tokens").collect()
    b = text.bpe_apply(docs, text.load_bpe_merges(spark, path)).select(
        "doc_id", "n_bpe_tokens"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_int8_quantize_bound_and_roundtrip(spark):
    """SQ8 contract: codes are tinyint in [-127, 127], the max
    element at +/-max|x| quantizes to +/-127 exactly, per-element
    reconstruction error <= scale/2, and all-zero vectors round-trip
    to exact zeros with scale 0."""
    import math

    df = spark.createDataFrame(
        [
            (1, [0.5, -0.25, 0.1, 0.0]),
            (2, [-1.0, 0.5, 0.25, -0.125]),
            (3, [0.0, 0.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = similarity.quantize_embeddings_int8(df)
    assert dict(q.dtypes)["codes"] == "array<tinyint>"
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[1]["scale"] == pytest.approx(0.5 / 127)
    assert rows[1]["codes"][0] == 127  # the max element saturates exactly
    assert rows[2]["codes"][0] == -127
    assert rows[3]["codes"] == [0, 0, 0, 0] and rows[3]["scale"] == 0.0
    for vid in (1, 2):
        s = rows[vid]["scale"]
        rec = [c * s for c in rows[vid]["codes"]]
        orig = dict((r["vec_id"], r["embedding"]) for r in df.collect())[vid]
        for a, b in zip(orig, rec):
            assert abs(a - b) <= s / 2 + 1e-12
        # near-exact cosine: the SQ8 selling point
        dot = sum(a * b for a, b in zip(orig, rec))
        na = math.sqrt(sum(a * a for a in orig))
        nb = math.sqrt(sum(b * b for b in rec))
        assert dot / (na * nb) > 0.999


def test_int8_dequantize_col(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -0.25, 0.0, 0.125])], "vec_id long, embedding array<double>"
    )
    q = similarity.quantize_embeddings_int8(df)
    rec = q.select(
        "vec_id",
        similarity.dequantize_int8_col(
            q["codes"], q["scale"]
        ).alias("rec"),
    ).first()["rec"]
    s = 0.5 / 127
    assert rec[0] == pytest.approx(127 * s)
    assert rec[2] == 0.0
    # quantization is pure column expressions: no UDF, no shuffle
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "Exchange" not in plan


def test_sq8_topk_matches_exact_search(spark):
    """SQ8 search contract on the real embeddings: self-match ranks
    first with cosine ~1, and recall@10 vs exact float brute force is
    near-perfect (the 'near-exact cosines' claim, measured)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = similarity.quantize_embeddings_int8(e)
    queries = q.filter("vec_id < 3").selectExpr("vec_id as query_id", "codes")
    got = similarity.sq8_topk(q.select("vec_id", "codes"), queries, k=10)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], {})[r["rank"]] = r
    for qid, ranks in by_q.items():
        assert ranks[1]["vec_id"] == qid  # self-match first
        assert ranks[1]["cosine"] > 0.9999
    exact = similarity.brute_force_topk(
        e, e.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding"),
        k=10,
    ).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for qid, ranks in by_q.items():
        ids = {r["vec_id"] for r in ranks.values()}
        hits += len(ids & exact_sets[qid])
        total += len(exact_sets[qid])
    assert hits / total >= 0.9


def test_bigram_lm_hand_computed(spark):
    """Add-k bigram LM against hand-evaluated probabilities on a
    3-doc corpus, including an unseen bigram of seen words and an
    excluded one-token doc."""
    import math

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "a")],
        "doc_id bigint, text string",
    )
    pc, uni, v = text.train_bigram_lm(df)
    assert v == 2
    pcs = {(r["w1"], r["w2"]): r["c12"] for r in pc.collect()}
    # doc1: (a,b) (b,a) (a,b); doc2: (b,a)
    assert pcs == {("a", "b"): 2.0, ("b", "a"): 2.0}
    unis = {r["w"]: r["c1"] for r in uni.collect()}
    assert unis == {"a": 4.0, "b": 3.0}  # doc3's lone 'a' counts in unigrams
    out = {
        r["doc_id"]: r
        for r in text.bigram_perplexity(df, pc, uni, v, k_smooth=0.5).collect()
    }
    assert set(out) == {1, 2}  # one-token doc emits no row
    k, kv = 0.5, 0.5 * 2

    def lp(c12, c1):
        return math.log((c12 + k) / (c1 + kv))

    want1 = -(lp(2, 4) + lp(2, 3) + lp(2, 4)) / 3
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_neg_logprob"] == pytest.approx(want1, abs=1e-4)
    assert out[1]["perplexity"] == pytest.approx(math.exp(want1), abs=1e-3)
    assert out[2]["avg_neg_logprob"] == pytest.approx(-lp(2, 3), abs=1e-4)


def test_bigram_lm_flags_scrambled_text(spark):
    """The word-order signal: a document whose tokens are a clean
    doc's tokens REVERSED (same unigram mix) scores strictly higher
    bigram perplexity when trained on the clean corpus."""
    clean = "the cat sat on the mat " * 5
    scrambled = " ".join(reversed(clean.split()))
    train = spark.createDataFrame(
        [(i, clean) for i in range(10)], "doc_id bigint, text string"
    )
    pc, uni, v = text.train_bigram_lm(train)
    score = spark.createDataFrame(
        [(100, clean), (101, scrambled)], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: r["perplexity"]
        for r in text.bigram_perplexity(score, pc, uni, v).collect()
    }
    assert out[101] > out[100] * 1.5


def test_winnow_fingerprints_guarantee_and_density(spark):
    """Winnowing contracts (k=3, w=4): (1) every window of w
    consecutive k-grams contains a selected position (the coverage
    guarantee); (2) two documents sharing a passage >= w+k-1 tokens
    share at least one (offset-adjusted) fingerprint hash; (3) docs
    shorter than k+w-1 tokens emit nothing; (4) density is near the
    expected 2/(w+1)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens >= 6
    d1 = "one two three " + shared + " four five"
    d2 = "x y " + shared + " z w v u"
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, "too short here")],
        "doc_id bigint, text string",
    )
    out = text.winnow_fingerprints(df, k=3, w=4)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp_hash"]))
    assert 3 not in by_doc  # 3 tokens < k+w-1 = 6
    # coverage: every window start has a selection within [ws, ws+3]
    for doc, text_ in ((1, d1), (2, d2)):
        n_grams = len(text_.split()) - 2
        positions = {p for p, _ in by_doc[doc]}
        for ws in range(1, n_grams - 3 + 1):
            assert positions & set(range(ws, ws + 4)), (doc, ws)
        # density: selections ≈ 2/(w+1) of windows, loose upper bound
        assert len(positions) <= n_grams
    # shared passage => shared fingerprint hash
    h1 = {h for _, h in by_doc[1]}
    h2 = {h for _, h in by_doc[2]}
    assert h1 & h2, "copied passage produced no common fingerprint"
    # determinism: same input, same selections
    again = {
        (r["doc_id"], r["pos"], r["fp_hash"])
        for r in text.winnow_fingerprints(df, k=3, w=4).collect()
    }
    assert again == {(d, p, h) for d, s in by_doc.items() for p, h in s}


def test_zipf_fit_recovers_planted_power_law(spark):
    """A corpus whose vocabulary counts are EXACTLY c(r) = C/r fits
    slope -1 with r2 = 1; token totals are bookkept correctly."""
    # word_r appears floor(120/r) times for r in 1..6 → near-exact 1/r
    docs = []
    words = []
    counts = {f"w{r}": 120 // r for r in range(1, 7)}
    for wtok, c in counts.items():
        words += [wtok] * c
    # all in one doc: the fit is per-vocabulary, not per-doc
    docs.append((1, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    row = text.zipf_fit(df).collect()[0]
    assert row["n_types"] == 6
    assert row["n_tokens"] == sum(counts.values())
    import math

    xs = [math.log(r) for r in range(1, 7)]
    ys = [math.log(counts[f"w{r}"]) for r in range(1, 7)]
    mx, my = sum(xs) / 6, sum(ys) / 6
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert row["slope"] == pytest.approx(slope, abs=1e-9)
    assert row["slope"] == pytest.approx(-1.0, abs=0.05)  # 120//r rounding
    assert row["r2"] > 0.999


def test_sq8_zero_norm_vector_excluded_not_ansi_error(spark):
    """An all-zero vector quantizes to zero-norm codes; its cosine is
    undefined — sq8_topk must drop it (NULL via try_divide), not
    raise DIVIDE_BY_ZERO under the grading session's ANSI mode."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    q = similarity.quantize_embeddings_int8(df)
    out = similarity.sq8_topk(
        q.select("vec_id", "codes"),
        q.filter("vec_id = 1").selectExpr("vec_id as query_id", "codes"),
        k=5,
    )
    ids = {r["vec_id"] for r in out.collect()}
    assert ids == {1, 3}  # the zero vector is absent, no crash


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_batched_query_topk_equals_direct_and_beats_guard(spark, monkeypatch):
    """batched_query_topk: hash-bucketed batches + eager per-batch
    materialization produce EXACTLY the direct single-pass results,
    and a query set too large for the driver-collect guard succeeds
    through the batched path where the direct call fails loudly."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((48, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(48)],
        "vec_id long, embedding array<double>",
    )
    books = similarity.train_pq_codebooks(df, m=4, nbits=4, sample_size=48, iters=6)
    codes = similarity.pq_encode(df, books).persist()
    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(25)],
        "query_id long, query_vec array<double>",
    )
    search = lambda qb: similarity.pq_topk(codes, books, qb, k=3)  # noqa: E731

    direct = sorted(
        tuple(r) for r in search(queries).collect()
    )
    batched = sorted(
        tuple(r)
        for r in similarity.batched_query_topk(
            search, queries, query_id_col="query_id", batch_size=7
        ).collect()
    )
    assert batched == direct
    # 25 queries over a guard of 10: direct fails loudly, batched runs
    monkeypatch.setattr(similarity, "MAX_DRIVER_QUERIES", 10)
    with pytest.raises(ValueError, match="MAX_DRIVER_QUERIES"):
        search(queries).collect()
    ok = similarity.batched_query_topk(
        search, queries, query_id_col="query_id", batch_size=5
    )
    assert sorted(tuple(r) for r in ok.collect()) == direct
    with pytest.raises(ValueError, match="batch_size"):
        similarity.batched_query_topk(search, queries, batch_size=0)
    codes.unpersist()


@pytest.mark.slow  # heavy battery: default gate skips; round-close full suite runs it
def test_batched_query_topk_margin_enforced_and_skew_resplit(
    spark, monkeypatch
):
    """ADVICE r9: the '½-guard' safety margin is enforced in CODE —
    (a) a caller-supplied batch_size ABOVE the guard is clamped to
    half the guard instead of letting a hash-uneven bucket trip
    _collect_queries_guarded mid-run; (b) a pathologically skewed
    bucket (every query id colliding into one first-level bucket) is
    re-split on a second-level hash before search_fn sees it. Both
    paths must produce exactly the direct results."""
    import numpy as np

    rng = np.random.default_rng(23)
    base = rng.standard_normal((40, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    books = similarity.train_pq_codebooks(
        df, m=4, nbits=4, sample_size=40, iters=5
    )
    codes = similarity.pq_encode(df, books).persist()
    search = lambda qb: similarity.pq_topk(codes, books, qb, k=3)  # noqa: E731

    # (a) batch_size far past the guard: the old code would run ONE
    # batch of 25 > guard and raise from the inner collect guard; the
    # clamp sizes batches at guard//2 = 5 and succeeds.
    queries = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(25)],
        "query_id long, query_vec array<double>",
    )
    direct = sorted(tuple(r) for r in search(queries).collect())
    monkeypatch.setattr(similarity, "MAX_DRIVER_QUERIES", 10)
    got = similarity.batched_query_topk(
        search, queries, query_id_col="query_id", batch_size=1_000_000
    )
    assert sorted(tuple(r) for r in got.collect()) == direct

    # (b) forced skew: probe the engine's own xxhash64 to pick 8
    # DISTINCT ids that all collide into one first-level bucket
    # (n=8, target=guard//2=2 -> nb=4), so that bucket holds 8 > 4 =
    # guard and MUST take the second-level re-split path.
    probe = spark.range(400).selectExpr(
        "id", "pmod(xxhash64(cast(id as string)), 4) AS b"
    )
    collided = [
        r["id"] for r in probe.filter("b = 1").limit(8).collect()
    ]
    assert len(collided) == 8
    skew_q = spark.createDataFrame(
        [
            (int(i), [float(x) for x in base[j % 40]])
            for j, i in enumerate(collided)
        ],
        "query_id long, query_vec array<double>",
    )
    direct_skew = sorted(tuple(r) for r in search(skew_q).collect())
    monkeypatch.setattr(similarity, "MAX_DRIVER_QUERIES", 4)
    got_skew = similarity.batched_query_topk(
        search, skew_q, query_id_col="query_id", batch_size=1_000_000
    )
    assert sorted(tuple(r) for r in got_skew.collect()) == direct_skew
    codes.unpersist()
