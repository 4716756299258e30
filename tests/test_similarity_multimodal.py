"""Similarity search (brute vs LSH), dedup operators on planted dups,
and multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_inertial_flow_partitioner_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    lsh_candidate_pairs,
    simhash_dup_groups,
)
from osm_inertial_flow_partitioner_spark.operators.multimodal import (
    extract_features,
    resize_stub,
    sample_frames,
)
from osm_inertial_flow_partitioner_spark.operators.similarity import (
    cosine_topk_brute,
    cosine_topk_lsh,
    embedding_near_dup,
)


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((50, 16))
    # plant near-duplicates: 45..49 are tiny perturbations of 0..4
    for i in range(5):
        base[45 + i] = base[i] + rng.standard_normal(16) * 0.01
    return spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    ).cache()


def test_brute_topk_finds_planted_dups(embeddings):
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    top = cosine_topk_brute(embeddings, q, k=1).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    assert got == {i: 45 + i for i in range(5)}


def test_lsh_topk_recall_on_planted_dups(embeddings):
    q = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    top = cosine_topk_lsh(embeddings, q, k=1, n_planes=4, dim=16).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    # near-identical vectors share all hyperplane signs -> same bucket
    assert got == {i: 45 + i for i in range(5)}


def test_embedding_near_dup_pairs(embeddings):
    pairs = embedding_near_dup(embeddings, threshold=0.99, n_planes=4, dim=16)
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert {(i, 45 + i) for i in range(5)} <= got


def test_flat_cosine_bit_equals_hof_fold(embeddings):
    """Round-6 parity pin: `_cosine_lit` (staged norm(v), driver-folded
    literal norm) must be IEEE-bit-identical to the plain
    `cosine(v, lit_array)` fold — same left-to-right association, same
    per-element casts. Compared UNROUNDED with exact double equality."""
    from osm_inertial_flow_partitioner_spark.operators.similarity import (
        _as_double,
        _cosine_lit,
        _norm,
        _py_norm,
        cosine,
    )

    rng = np.random.default_rng(7)
    lits = [[float(x) for x in rng.standard_normal(16) * 50] for _ in range(3)]
    df = embeddings.withColumn("_v", _as_double(F.col("embedding"))).withColumn(
        "_nv", _norm(F.col("_v"))
    )
    for c in lits:
        hof = cosine(
            F.col("_v"), F.array(*[F.lit(float(x)) for x in c])
        )
        staged = _cosine_lit(F.col("_v"), F.col("_nv"), c)
        bad = df.select(hof.alias("h"), staged.alias("f")).filter(
            # exact double equality — no rounding tolerance
            ~(F.col("h") == F.col("f"))
        )
        assert bad.count() == 0
    # and the Python-side literal norm matches the Catalyst fold
    one = df.limit(1)
    for c in lits:
        norm_catalyst = one.select(
            F.sqrt(
                F.aggregate(
                    F.array(*[F.lit(float(x)) for x in c]),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ).alias("n")
        ).first()["n"]
        assert norm_catalyst == _py_norm(c)


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = []
    for i in range(20):
        text = f"unique document number {i} with content token{i} extra words here"
        rows.append((i, text))
    # exact dups (whitespace-normalized)
    rows.append((100, rows[0][1] + " "))
    rows.append((101, rows[1][1]))
    # near dup (one word changed)
    rows.append((102, rows[2][1].replace("extra", "additional")))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_finds_planted(dup_docs):
    kept = exact_dedup(dup_docs).collect()
    n_copies = {r["doc_id"]: r["n_copies"] for r in kept}
    assert n_copies[0] == 2 and n_copies[1] == 2
    assert 100 not in n_copies and 101 not in n_copies
    assert n_copies[2] == 1  # near-dup is NOT an exact dup


def test_lsh_pairs_catch_near_dup(dup_docs):
    pairs = {(r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(dup_docs, num_perm=8, bands=4).collect()}
    assert (0, 100) in pairs and (1, 101) in pairs
    assert (2, 102) in pairs  # 1-word diff shares most minhashes


def test_simhash_groups_exact_dups(dup_docs):
    groups = {r["doc_id"]: r["n_docs"] for r in simhash_dup_groups(dup_docs, bits=32).collect()}
    assert groups.get(0) == 2 and groups.get(1) == 2


def test_jaccard_pairs_score(dup_docs):
    pairs = {(r["doc1"], r["doc2"]): r["jaccard"] for r in jaccard_pairs(dup_docs, 0.5).collect()}
    assert pairs[(0, 100)] == 1.0
    assert 0.7 < pairs[(2, 102)] < 1.0


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, "image", bytes([i % 256] * 64), 8, 8, 0) for i in range(6)
    ] + [(10, "video", b"\x01\x02\x03", 0, 0, 3500)]
    return spark.createDataFrame(
        rows,
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )


def test_multimodal_feature_plumbing(media):
    feats = extract_features(media).collect()
    assert len(feats) == 7
    assert all(len(r["features"]) == 16 for r in feats)
    # deterministic
    again = extract_features(media).collect()
    assert {r["media_id"]: r["features"] for r in feats} == {
        r["media_id"]: r["features"] for r in again
    }


def test_real_decode_raises_without_pil():
    from osm_inertial_flow_partitioner_spark.operators import multimodal

    if multimodal.HAS_PIL:
        pytest.skip("PIL present; covered by test_real_decode_with_pil")
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00" * 16, real=True)


def test_real_decode_with_pil(media):
    """PIL path: same (16, 16) float32 contract as the stub, end-to-end
    through the Spark mapInPandas plumbing."""
    from osm_inertial_flow_partitioner_spark.operators import multimodal

    if not multimodal.HAS_PIL:
        pytest.skip("PIL not installed in this runtime")
    import io

    import numpy as np
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(np.arange(64, dtype=np.uint8).reshape(8, 8)).save(
        buf, format="PNG"
    )
    arr = multimodal.decode_image(buf.getvalue(), real=True)
    assert arr.shape == (16, 16) and arr.dtype == np.float32
    png_media = media.sparkSession.createDataFrame(
        [(1, "image", buf.getvalue(), 8, 8, 0)],
        "media_id long, kind string, payload binary, width int, "
        "height int, duration_ms int",
    )
    feats = extract_features(png_media, real_decode=True).collect()
    assert len(feats) == 1 and len(feats[0]["features"]) == 16


def _wav_bytes(samples, framerate=8000, sampwidth=2, channels=1):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        if sampwidth == 2:
            w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
        else:
            w.writeframes((np.asarray(samples) + 128).astype(np.uint8).tobytes())
    return buf.getvalue()


def test_real_audio_decode_wav(media):
    """Real audio path: stdlib-wave PCM decode (no external codec),
    same (16, 16) float32 contract, end-to-end through mapInPandas."""
    import numpy as np

    from osm_inertial_flow_partitioner_spark.operators import multimodal

    # 16-bit mono ramp: 256 evenly spaced picks of an identity ramp of
    # length 256 recover the ramp exactly
    ramp = np.arange(256, dtype=np.int64) - 128
    arr = multimodal.decode_audio(_wav_bytes(ramp), real=True)
    assert arr.shape == (16, 16) and arr.dtype == np.float32
    assert np.array_equal(arr.ravel(), ramp.astype(np.float32))
    # stereo mixes to mono; 8-bit path decodes
    stereo = np.stack([ramp, -ramp], axis=1).ravel()
    arr2 = multimodal.decode_audio(
        _wav_bytes(stereo, channels=2), real=True
    )
    assert np.allclose(arr2, 0.0)
    arr3 = multimodal.decode_audio(_wav_bytes(ramp // 2, sampwidth=1), real=True)
    assert arr3.shape == (16, 16)
    # non-WAV payload fails LOUDLY on the real path
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"\x00garbage", real=True)
    # end-to-end: audio rows route through the wave decoder and video
    # rows through the y4m decoder under real_decode
    wav_media = media.sparkSession.createDataFrame(
        [
            (20, "audio", _wav_bytes(ramp), 0, 0, 32),
            (21, "video", _y4m_bytes([60, 180], w=32, h=32), 0, 0, 1000),
        ],
        "media_id long, kind string, payload binary, width int, "
        "height int, duration_ms int",
    )
    feats = {r["media_id"]: r["features"] for r in extract_features(wav_media, real_decode=True).collect()}
    assert len(feats[20]) == 16 and len(feats[21]) == 16
    want = multimodal.decode_audio(_wav_bytes(ramp), real=True).mean(axis=1)
    assert np.allclose(feats[20], want, atol=1e-6)
    assert np.allclose(feats[21], 120.0, atol=1e-6)  # mean of 60/180 luma


def _y4m_bytes(frame_lumas, w=32, h=32, chroma="420jpeg"):
    """Minimal YUV4MPEG2 stream: one constant-luma frame per entry."""
    import numpy as np

    if chroma.startswith("420"):
        cb = 2 * ((w // 2) * (h // 2))
    elif chroma.startswith("422"):
        cb = 2 * ((w // 2) * h)
    elif chroma.startswith("444"):
        cb = 2 * w * h
    else:
        cb = 0
    out = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode()
    for y in frame_lumas:
        out += b"FRAME\n"
        out += np.full(w * h, y, dtype=np.uint8).tobytes()
        out += b"\x80" * cb
    return out


def test_real_video_decode_y4m():
    """Real video path: stdlib+numpy YUV4MPEG2 decode — frames sampled,
    luma block-averaged to the (16, 16) float32 contract; compressed
    payloads fail LOUDLY."""
    import numpy as np

    from osm_inertial_flow_partitioner_spark.operators import multimodal

    # constant-luma frames: pooled output is the mean across frames
    arr = multimodal.decode_video(_y4m_bytes([100], w=32, h=32), real=True)
    assert arr.shape == (16, 16) and arr.dtype == np.float32
    assert np.allclose(arr, 100.0)
    arr2 = multimodal.decode_video(_y4m_bytes([0, 200], w=32, h=32), real=True)
    assert np.allclose(arr2, 100.0)
    # block-average exactness on a gradient: W=H=32 -> 2x2 blocks
    grad = (
        np.arange(32, dtype=np.uint8)[None, :].repeat(32, axis=0)
    )
    payload = (
        b"YUV4MPEG2 W32 H32 F25:1 C420\n" + b"FRAME\n"
        + grad.tobytes() + b"\x80" * (2 * 16 * 16)
    )
    arr3 = multimodal.decode_video(payload, real=True)
    want_cols = grad.astype(np.float64).reshape(32, 16, 2).mean(axis=2)[0]
    assert np.allclose(arr3[0], want_cols)
    # chroma strides: 422 and 444 parse; frame count > max_frames samples
    for ch in ("422", "444"):
        a = multimodal.decode_video(
            _y4m_bytes([50, 150, 250], w=16, h=16, chroma=ch), real=True
        )
        assert np.allclose(a, 150.0)
    many = multimodal.decode_video(
        _y4m_bytes(list(range(0, 240, 16)), w=16, h=16), real=True
    )
    assert many.shape == (16, 16)
    # a compressed/non-y4m payload raises loudly, stub path still works
    with pytest.raises(NotImplementedError):
        multimodal.decode_video(b"\x00\x00\x01\xb3mpeg", real=True)
    with pytest.raises(NotImplementedError):
        multimodal.decode_video(
            b"YUV4MPEG2 W16 H16 C420\nFRAME\n\x00\x01", real=True
        )  # truncated frame
    assert multimodal.decode_video(b"\x01\x02", real=False).shape == (16, 16)


def test_multimodal_resize_and_frames(media):
    rs = resize_stub(media, 4, 4)
    assert rs.filter((F.col("width") != 4) | (F.col("height") != 4)).count() == 0
    frames = sample_frames(media, every_ms=1000).collect()
    vid = [r for r in frames if r["media_id"] == 10]
    assert len(vid) == 3  # 3500ms // 1000
    assert [r["frame_idx"] for r in sorted(vid, key=lambda r: r["frame_idx"])] == [0, 1, 2]
