"""Multimodal binary-column plumbing + stateful-streaming sessionizer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from cube_builder_spark.functions import multimodal
from cube_builder_spark.tables import load_tables


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, ["documents"])["documents"]


def test_media_metadata_parses_real_bytes(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = multimodal.attach_fake_media(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    meta = multimodal.media_metadata(media)
    joined = (meta.join(docs.select("doc_id", "n_chars"), "doc_id")
              .withColumn("expect_w", (100 + F.col("n_chars") % 640).cast("int"))
              .withColumn("expect_h", (100 + (F.col("n_chars") * 7) % 480).cast("int")))
    bad = joined.filter((F.col("width") != F.col("expect_w"))
                        | (F.col("height") != F.col("expect_h"))
                        | (F.col("n_bytes") < F.col("n_chars") + 12)).count()
    assert bad == 0
    # digest column is a real md5 over the payload bytes
    row = meta.select("sha").first()
    assert len(row.sha) == 32


def test_frame_sample_stays_metadata_only(spark, sf_dir):
    media = multimodal.attach_fake_media(_docs(spark, sf_dir))
    frames = multimodal.frame_sample(media, every_n=1)
    agg = (frames.groupBy("doc_id", "n_frames")
           .agg(F.count(F.lit(1)).alias("n"), F.max("frame_idx").alias("mx")))
    bad = agg.filter((F.col("n") != F.col("n_frames"))
                     | (F.col("mx") != F.col("n_frames") - 1)).count()
    assert bad == 0


def test_bmp_codec_roundtrip():
    import numpy as np
    pix = multimodal.image_pixels(doc_id=42, w=7, h=5)
    buf = multimodal.encode_bmp(pix)
    assert buf[:2] == b"BM"
    back = multimodal.decode_bmp(buf)
    assert np.array_equal(back, pix)
    # odd width exercises row padding
    pix2 = multimodal.image_pixels(doc_id=3, w=5, h=3)
    assert np.array_equal(multimodal.decode_bmp(multimodal.encode_bmp(pix2)),
                          pix2)


def test_wav_codec_roundtrip():
    import numpy as np
    s = multimodal.audio_samples(doc_id=7, n=123)
    rate, back = multimodal.decode_wav(multimodal.encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(back, s)


def test_real_decode_and_resample(spark, sf_dir):
    media = multimodal.attach_real_media(_docs(spark, sf_dir))
    import numpy as np
    img = multimodal.decode_image(media).collect()
    assert img, "image docs exist"
    for r in img:
        pix = multimodal.image_pixels(r.doc_id, r.width, r.height)
        assert r.px_sum == int(pix.astype(np.int64).sum())
    res = multimodal.resample_audio(media, rate_hz=12000).collect()
    assert res, "audio docs exist"
    for r in res:
        assert r.n_out == (r.n_in * 12000) // 8000
    vid = multimodal.decode_video(media).collect()
    assert vid, "video docs exist"
    for r in vid:
        pix = multimodal.video_pixels(r.doc_id, r.n_frames, r.width, r.height)
        assert r.px_sum == int(pix.astype(np.int64).sum())
        assert r.fps == multimodal.video_fps(r.doc_id)


def test_avi_codec_roundtrip():
    import numpy as np
    frames = multimodal.video_pixels(doc_id=11, n_frames=3, w=5, h=4)
    buf = multimodal.encode_avi(frames, fps=17)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"AVI "
    fps, back = multimodal.decode_avi(buf)
    assert fps == 17 and np.array_equal(back, frames)
    # even width (no row padding) round-trips too
    frames2 = multimodal.video_pixels(doc_id=2, n_frames=1, w=4, h=3)
    fps2, back2 = multimodal.decode_avi(multimodal.encode_avi(frames2, 30))
    assert fps2 == 30 and np.array_equal(back2, frames2)


def test_stateful_sessionizer_closed_sessions(spark, tmp_path):
    """Drive a 2-batch file stream through applyInPandasWithState:
    sessions separated by >30 min close and emit exactly once."""
    import datetime

    from cube_builder_spark.streaming.events import EVENT_SCHEMA
    from cube_builder_spark.streaming.stateful import sessionize_stream

    t0 = datetime.datetime(2020, 1, 1, 8, 0, 0)

    def ev(minutes, user, value, eid):
        return (eid, t0 + datetime.timedelta(minutes=minutes), user, "click",
                value, "{}")

    rows = [
        # user 1: session A (two events), 90-min gap, session B
        ev(0, 1, 1.0, 1), ev(10, 1, 2.5, 2), ev(100, 1, 4.0, 3),
        # user 2: one long session, never closes within the data
        ev(0, 2, 1.0, 4), ev(20, 2, 1.0, 5), ev(40, 2, 1.0, 6),
    ]
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(rows, EVENT_SCHEMA).write.parquet(src)
    out = sessionize_stream(spark.readStream.schema(EVENT_SCHEMA).parquet(src))
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("sessions").start())
    q.processAllAvailable()
    q.stop()
    got = {(r.user_id): r for r in spark.sql("SELECT * FROM sessions").collect()}
    # user 1's first session closed (the 100-min event breached the gap)
    assert 1 in got
    s = got[1]
    assert (s.n_events, s.total_value_cents) == (2, 350)
    assert s.session_start == t0 and s.session_end == t0 + datetime.timedelta(minutes=10)
    # user 2's session never closed -> not emitted in append mode
    assert 2 not in got


def test_stateful_streaming_dedup(spark, tmp_path):
    """Two micro-batches through the stateful dedup: the canonical
    survives across batches, later duplicates are attributed to it."""
    from cube_builder_spark.streaming.dedup_stream import dedup_stream

    schema = "doc_id long, text string"
    src = str(tmp_path / "docs_stream")
    # batch 1: doc 10 and 11 identical, 12 unique
    spark.createDataFrame(
        [(11, "aaa bbb"), (10, "aaa bbb"), (12, "ccc")], schema
    ).write.parquet(src + "/b1")
    out = dedup_stream(spark.readStream.schema(schema).parquet(src + "/*"))
    q = (out.writeStream.outputMode("append")
         .format("memory").queryName("dedup_led").start())
    q.processAllAvailable()
    # batch 2: doc 20 duplicates batch-1 content, 21 unique
    spark.createDataFrame(
        [(20, "aaa bbb"), (21, "ddd")], schema).write.parquet(src + "/b2")
    q.processAllAvailable()
    q.stop()
    led = {r.doc_id: r for r in
           spark.sql("SELECT * FROM dedup_led").collect()}
    assert len(led) == 5
    # canonical = lowest doc_id of the FIRST batch the hash appeared in
    assert led[10].is_canonical and led[10].canonical_id == 10
    assert not led[11].is_canonical and led[11].canonical_id == 10
    assert led[11].n_seen_before == 1
    # cross-batch: doc 20 attributed to batch-1's canonical
    assert not led[20].is_canonical and led[20].canonical_id == 10
    assert led[20].n_seen_before == 2
    assert led[12].is_canonical and led[21].is_canonical


# ---------------------------------------------------------------------------
# Round-8: corruption fuzz for the hand-written media codecs (same
# adversarial treatment as the tar/zip walks and the TIFF codec).
# Contract: any flip/truncation/zeroed-run either raises a clean
# ValueError/NotImplementedError/IndexError or — when the damage misses
# everything the decode touches — returns the exact original payload.
# ---------------------------------------------------------------------------

def _media_bases():
    pix = multimodal.image_pixels(7, 13, 9)
    bmp = multimodal.encode_bmp(pix)
    samples = np.arange(-300, 300, 7, dtype=np.int16)
    wav = multimodal.encode_wav(samples, 8000)
    frames = np.stack([multimodal.image_pixels(i, 12, 6) for i in range(3)])
    avi = multimodal.encode_avi(frames, 25)
    return {
        "bmp": (bmp, lambda b: multimodal.decode_bmp(b),
                lambda got: np.array_equal(got, pix)),
        "wav": (wav, lambda b: multimodal.decode_wav(b),
                lambda got: got[0] == 8000 and np.array_equal(got[1],
                                                              samples)),
        "avi": (avi, lambda b: multimodal.decode_avi(b),
                lambda got: got[0] == 25 and np.array_equal(got[1],
                                                            frames)),
    }


_MEDIA = _media_bases()
_OK_ERRORS = (ValueError, NotImplementedError, IndexError)


def test_media_truncation_ladder_never_wrong():
    for kind, (buf, dec, same) in _MEDIA.items():
        for cut in range(0, len(buf), 13):
            try:
                got = dec(buf[:cut])
            except _OK_ERRORS:
                continue
            # WAV nframes comes from the header; a truncated data
            # chunk legitimately decodes to fewer samples via the
            # stdlib reader — shorter-prefix results are acceptable
            # for wav, never for the image codecs
            if kind == "wav":
                continue
            assert same(got), f"{kind} truncated at {cut}: wrong data"


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=150, deadline=None)
    @given(kind=st.sampled_from(["bmp", "wav", "avi"]),
           mode=st.sampled_from(["flip", "zero_run"]),
           pos=st.floats(0.0, 1.0), val=st.integers(0, 255),
           runlen=st.integers(1, 32))
    def test_media_corruption_fuzz(kind, mode, pos, val, runlen):
        buf, dec, same = _MEDIA[kind]
        i = min(int(pos * len(buf)), len(buf) - 1)
        if mode == "flip":
            if buf[i] == val:
                val ^= 0xFF
            mutated = buf[:i] + bytes([val]) + buf[i + 1:]
        else:
            n = min(runlen, len(buf) - i)
            mutated = buf[:i] + b"\x00" * n + buf[i + n:]
        try:
            got = dec(mutated)
        except _OK_ERRORS:
            return
        if kind == "bmp":
            # pixel-region damage decodes to a changed image — that is
            # inherent to a checksum-less format; structure damage must
            # never mis-shape the array
            assert got.shape == (9, 13, 3)
        elif kind == "wav":
            rate, data = got
            assert data.dtype == np.int16
        else:
            fps, frames = got
            assert frames.shape[1:] == (6, 12, 3)
except ImportError:  # pragma: no cover
    pass


# image dHash -----------------------------------------------------------------

def _ref_dhash(pix: np.ndarray) -> tuple[int, int]:
    """Independent reference dHash (loop form, no vectorization)."""
    h, w = pix.shape[:2]
    gray = [[(299 * int(pix[y][x][0]) + 587 * int(pix[y][x][1])
              + 114 * int(pix[y][x][2])) // 1000
             for x in range(w)] for y in range(h)]
    g = [[gray[(r * h) // 8][(c * w) // 9] for c in range(9)]
         for r in range(8)]
    h0 = h1 = 0
    for r in range(8):
        for c in range(8):
            bit = 1 if g[r][c + 1] > g[r][c] else 0
            if r < 4:
                h0 |= bit << (r * 8 + c)
            else:
                h1 |= bit << ((r - 4) * 8 + c)
    return h0, h1


def test_image_dhash_matches_reference(spark):
    """image_dhash over real encoded BMP payloads equals a loop-form
    reference implementation on the decoded pixels."""
    rng = np.random.default_rng(11)
    rows, want = [], {}
    for doc_id in range(8):
        w, h = int(rng.integers(4, 17)), int(rng.integers(3, 11))
        pix = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        rows.append((doc_id, "image/bmp", multimodal.encode_bmp(pix)))
        want[doc_id] = _ref_dhash(pix)
    rows.append((99, "audio/wav", b"not an image"))   # skipped
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary")
    got = {r.doc_id: (r.h0, r.h1)
           for r in multimodal.image_dhash(media).collect()}
    assert got == want
    assert all(0 <= v < 2 ** 32 for pair in got.values() for v in pair)


def test_dhash_dup_pairs_lossless_banding(spark):
    """The 8-byte-band bucket join must return EXACTLY the brute-force
    hamming<=6 pair set (pigeonhole guarantees no misses; the verify
    removes band-collision false positives)."""
    rng = np.random.default_rng(5)
    base = int(rng.integers(0, 2 ** 32)), int(rng.integers(0, 2 ** 32))
    hashes = []
    for i in range(40):
        h0, h1 = base
        # flip a random number of bits so distances spread 0..64
        for _ in range(int(rng.integers(0, 20))):
            half = int(rng.integers(0, 2))
            bit = 1 << int(rng.integers(0, 32))
            if half == 0:
                h0 ^= bit
            else:
                h1 ^= bit
        hashes.append((i, h0, h1))
    want = set()
    for i, (ia, a0, a1) in enumerate(hashes):
        for ib, b0, b1 in hashes[i + 1:]:
            ham = bin((a0 ^ b0)).count("1") + bin((a1 ^ b1)).count("1")
            if ham <= 6:
                want.add((ia, ib, ham))
    df = spark.createDataFrame(hashes, "doc_id long, h0 long, h1 long")
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in multimodal.dhash_dup_pairs(df, max_hamming=6).collect()}
    assert got == want and len(want) > 0
    with pytest.raises(ValueError):
        multimodal.dhash_dup_pairs(df, max_hamming=8)


# audio fingerprint ------------------------------------------------------------

def _ref_audio_fp(samples) -> tuple[int, int]:
    """Independent reference fingerprint (loop form)."""
    nf = len(samples) // multimodal.AUDIO_FP_FRAME
    es = []
    for f in range(nf):
        e = 0
        for j in range(multimodal.AUDIO_FP_FRAME):
            s = int(samples[f * multimodal.AUDIO_FP_FRAME + j])
            e += s * s
        es.append(e)
    fp = 0
    for f in range(1, nf):
        if es[f] > es[f - 1]:
            fp |= 1 << (f - 1)
    return fp, nf - 1


def test_audio_fingerprint_matches_reference(spark):
    """audio_fingerprint over real encoded WAV payloads equals a
    loop-form reference on the raw samples; sub-2-frame docs and
    non-audio rows are skipped."""
    rng = np.random.default_rng(7)
    rows, want = [], {}
    for doc_id in range(8):
        n = int(rng.integers(25, 150))
        samples = rng.integers(-1000, 1001, n).astype(np.int16)
        rows.append((doc_id, "audio/wav",
                     multimodal.encode_wav(samples, multimodal.AUDIO_SRC_RATE)))
        fp, nb = _ref_audio_fp(samples)
        if nb >= 1:
            want[doc_id] = (fp, nb)
    rows.append((90, "audio/wav",
                 multimodal.encode_wav(np.zeros(7, np.int16),
                                       multimodal.AUDIO_SRC_RATE)))  # <2 frames
    rows.append((99, "image/bmp", b"not audio"))                     # skipped
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary")
    got = {r.doc_id: (r.fp, r.nb)
           for r in multimodal.audio_fingerprint(media).collect()}
    assert got == want and len(want) > 0


def test_audio_dup_pairs_lossless_banding(spark):
    """The two-band bucket join must return EXACTLY the brute-force
    hamming<=1 pair set among equal-length fingerprints."""
    rng = np.random.default_rng(3)
    fps = []
    for i in range(60):
        nb = int(rng.integers(4, 14))
        base = int(rng.integers(0, 2)) * ((1 << nb) - 1) // 3
        fp = base ^ (1 << int(rng.integers(0, nb)) if rng.integers(0, 2)
                     else 0)
        fps.append((i, fp & ((1 << nb) - 1), nb))
    want = set()
    for i, (ia, fa, na) in enumerate(fps):
        for ib, fb, nb2 in fps[i + 1:]:
            if na == nb2 and bin(fa ^ fb).count("1") <= 1:
                want.add((ia, ib, bin(fa ^ fb).count("1")))
    df = spark.createDataFrame(fps, "doc_id long, fp long, nb int")
    got = {(r.doc_a, r.doc_b, r.hamming)
           for r in multimodal.audio_dup_pairs(df, max_hamming=1).collect()}
    assert got == want and len(want) > 0
    with pytest.raises(ValueError):
        multimodal.audio_dup_pairs(df, max_hamming=2)
