"""Multimodal binary-column plumbing: schema, Arrow batch shape, the
deterministic fake decoder, and the NotImplementedError decode stub."""

from __future__ import annotations

import hashlib

import pytest

from gistdex_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    fake_decode,
    media_stats,
    synthetic_media_df,
)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image/png")


# --- optional-import codec path: the REAL branch runs wherever Pillow is
# importable, the deterministic-fake branch everywhere else; both expose
# the same signature/schema so plans are identical.

from gistdex_spark.operators.multimodal import (  # noqa: E402
    default_decoder,
    default_resizer,
    fake_resize,
    have_image_codec,
    pil_decode,
    pil_resize,
)

HAS_PIL = have_image_codec()


@pytest.mark.skipif(HAS_PIL, reason="Pillow present: real path active")
def test_without_pil_defaults_are_fakes_and_real_raises():
    from gistdex_spark.operators.multimodal import portable_decode

    # without PIL the decode default is the PORTABLE path (real BMP
    # decoding, deterministic fake for codec-needing formats)
    assert default_decoder() is portable_decode
    assert default_resizer() is fake_resize
    with pytest.raises(NotImplementedError):
        pil_decode(b"\x89PNG", dim=4)
    with pytest.raises(NotImplementedError):
        pil_resize(b"\x89PNG", 8, 8)


@pytest.mark.skipif(not HAS_PIL, reason="Pillow absent: stub path active")
def test_with_pil_real_decode_and_resize():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (200, 10, 10)).save(buf, format="PNG")
    png = buf.getvalue()
    assert default_decoder() is pil_decode
    feats = pil_decode(png, dim=4)
    assert len(feats) == 4 and all(0.0 <= v <= 1.0 for v in feats)
    out = pil_resize(png, 8, 8)
    assert Image.open(io.BytesIO(out)).size == (8, 8)


def test_extract_features_same_schema_on_either_path(spark):
    media = synthetic_media_df(spark, n=3)
    auto = extract_features(media, dim=4)  # default_decoder dispatch
    pinned = extract_features(media, dim=4, decoder=fake_decode)
    assert auto.schema == pinned.schema


def test_fake_decode_deterministic():
    a = fake_decode(b"payload", dim=8)
    b = fake_decode(b"payload", dim=8)
    assert list(a) == list(b)
    assert len(a) == 8
    assert all(0.0 <= v < 1.0 for v in a)
    # first feature == first 4 digest bytes / 2^32
    h = hashlib.sha256(b"payload").digest()
    assert a[0] == int.from_bytes(h[0:4], "big") / 2**32


def test_extract_features_end_to_end(spark):
    media = synthetic_media_df(spark, n=12)
    feats = extract_features(media, dim=4).collect()
    assert len(feats) == 12
    by_id = {r.media_id: r for r in feats}
    for r in feats:
        assert len(r.features) == 4
        assert r.n_bytes == 64
    # hash matches a locally computed one for a known payload
    payload = (b"media-0-" * 8)[:64]
    assert by_id["m0000"].content_hash == hashlib.sha256(payload).hexdigest()
    assert list(by_id["m0000"].features) == list(fake_decode(payload, 4))


def test_media_stats_prunes_payload(spark, tmp_path):
    media = synthetic_media_df(spark, n=9)
    rows = {r.kind: r.n_items for r in media_stats(media).collect()}
    assert rows == {"image": 3, "audio": 3, "video": 3}
    # against a real parquet scan, column pruning must drop the BINARY
    # payload from the read schema entirely
    path = str(tmp_path / "media.parquet")
    media.write.parquet(path)
    on_disk = spark.read.parquet(path)
    plan = media_stats(on_disk)._jdf.queryExecution().executedPlan().toString()
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines and all("payload" not in l for l in scan_lines), plan


def test_resize_updates_images_only(spark):
    from gistdex_spark.operators.multimodal import resize_images, synthetic_media_df

    media = synthetic_media_df(spark, 9)
    out = resize_images(media, 32, 24).collect()
    by_id = {r.media_id: r for r in out}
    assert len(out) == 9  # pass-through preserves row count
    for r in out:
        if r.kind == "image":
            assert (r.width, r.height) == (32, 24)
            assert len(r.payload) == 32 * 24 // 16
        else:
            assert r.payload is not None  # untouched
            assert r.width != 32 or r.width is None

    # deterministic: same input → same resized payload
    again = {r.media_id: r.payload for r in resize_images(media, 32, 24).collect()}
    assert all(by_id[k].payload == again[k] for k in again)


def test_frame_sampling_expands_videos(spark):
    from gistdex_spark.operators.multimodal import sample_frames, synthetic_media_df

    media = synthetic_media_df(spark, 9)  # kinds cycle image/audio/video
    frames = sample_frames(media, interval_ms=1000).collect()
    vids = {r.media_id: r for r in media.collect() if r.kind == "video"}
    # every frame belongs to a video; counts = ceil(duration/interval)
    per_id = {}
    for f in frames:
        assert f.media_id in vids
        per_id.setdefault(f.media_id, []).append(f)
    for mid, fs in per_id.items():
        dur = vids[mid].duration_ms
        assert len(fs) == -(-dur // 1000)
        assert [f.frame_idx for f in sorted(fs, key=lambda x: x.ts_ms)] == list(
            range(len(fs))
        )
        assert len({bytes(f.frame_payload) for f in fs}) == len(fs)  # distinct frames


def test_frame_sampling_rejects_bad_interval(spark):
    import pytest

    from gistdex_spark.operators.multimodal import sample_frames, synthetic_media_df

    with pytest.raises(ValueError):
        sample_frames(synthetic_media_df(spark, 3), interval_ms=0)


def test_stub_slots_raise(spark):
    import pytest

    from gistdex_spark.operators.multimodal import frame_sample_stub, resize_stub

    with pytest.raises(NotImplementedError):
        resize_stub(b"x", 8, 8)
    with pytest.raises(NotImplementedError):
        frame_sample_stub(b"x", 0)


def test_bmp_real_decode_roundtrip():
    """The dependency-free real codec: an encoded gradient decodes to a
    monotonically increasing strip — actual pixel math, not a hash."""
    import numpy as np

    from gistdex_spark.operators.multimodal import bmp_decode, bmp_encode_gray

    arr = np.tile(np.linspace(0, 255, 16).astype(np.uint8), (8, 1))
    strip = bmp_decode(bmp_encode_gray(arr), dim=8)
    assert len(strip) == 8
    assert all(strip[i] < strip[i + 1] for i in range(7))
    # uniform image decodes to a constant strip at the right level
    flat = bmp_decode(
        bmp_encode_gray(np.full((4, 4), 128, dtype=np.uint8)), dim=4
    )
    assert np.allclose(flat, 128 / 255.0)


def test_portable_decoder_dispatches_on_magic():
    import numpy as np

    from gistdex_spark.operators.multimodal import (
        bmp_encode_gray,
        fake_decode,
        portable_decode,
    )

    bmp = bmp_encode_gray(np.zeros((2, 2), dtype=np.uint8))
    assert np.allclose(portable_decode(bmp), 0.0)  # real decode
    other = b"\x89PNG fake"
    assert (portable_decode(other) == fake_decode(other)).all()


def test_extract_features_with_real_bmp_payloads(spark):
    """End-to-end over the Spark plumbing: BINARY BMP payloads through the
    Arrow mapInPandas feature extractor with the REAL decoder."""
    import numpy as np

    from gistdex_spark.operators.multimodal import (
        bmp_encode_gray,
        extract_features,
        portable_decode,
    )

    rows = []
    for i in range(4):
        arr = np.full((8, 8), 40 * i, dtype=np.uint8)
        rows.append((f"m{i}", "image", bytearray(bmp_encode_gray(arr))))
    df = spark.createDataFrame(
        rows, schema="media_id STRING, kind STRING, payload BINARY"
    )
    out = {
        r.media_id: r.features
        for r in extract_features(df, decoder=portable_decode).collect()
    }
    assert len(out) == 4
    for i in range(4):
        assert np.allclose(out[f"m{i}"], (40 * i) / 255.0), out[f"m{i}"]


def test_wav_real_decode_energy_profile():
    """stdlib-wave real audio path: silence then a square wave decodes to
    a low→high RMS energy profile — actual signal math."""
    import numpy as np

    from gistdex_spark.operators.multimodal import (
        portable_decode,
        wav_decode,
        wav_encode_pcm16,
    )

    s = np.concatenate(
        [np.zeros(4000), 20000 * np.sign(np.sin(np.arange(4000)))]
    ).astype(np.int16)
    p = wav_encode_pcm16(s)
    f = wav_decode(p, dim=4)
    assert f[0] < 0.01 and f[1] < 0.01
    assert f[2] > 0.5 and f[3] > 0.5
    assert (portable_decode(p, 4) == f).all()  # RIFF magic dispatch


def test_portable_decoder_never_raises_on_lookalike_magic():
    """A RIFF container that is not PCM WAV (WebP/AVI) or a BM-prefixed
    non-bitmap must fall back to the fake, not fail the job."""
    import numpy as np

    from gistdex_spark.operators.multimodal import fake_decode, portable_decode

    webp = b"RIFF\x10\x00\x00\x00WEBPVP8 "
    assert (portable_decode(webp) == fake_decode(webp)).all()
    bm_text = b"BMnot really a bitmap"
    assert (portable_decode(bm_text) == fake_decode(bm_text)).all()


def test_avi_roundtrip_info_grab_decode():
    """Encoder -> real RIFF parse: header fields, frame inventory,
    timestamp seek (incl. clamp past the end), first-frame features."""
    import numpy as np

    from gistdex_spark.operators.multimodal import (
        avi_decode,
        avi_encode_gray,
        avi_frame_at,
        avi_info,
        portable_decode,
    )

    g = [60, 120, 180]
    frames = [np.full((4, 4), v, np.uint8) for v in g]
    p = avi_encode_gray(frames, fps=1)
    info = avi_info(p)
    assert info["width"] == 4 and info["height"] == 4
    assert info["declared_frames"] == 3 and len(info["frames"]) == 3
    assert info["usec_per_frame"] == 1_000_000
    for k, v in enumerate(g):
        assert avi_frame_at(p, k * 1000) == bytes([v]) * 48
    assert avi_frame_at(p, 99_000) == bytes([g[-1]]) * 48  # clamp
    # first-frame luma strip: uniform gray 60 -> 60/255 in filled buckets
    f = avi_decode(p, dim=4)
    assert np.allclose(f, g[0] * (0.299 + 0.587 + 0.114) / 255.0)
    assert (portable_decode(p, 4) == f).all()  # RIFF 'AVI ' dispatch


def test_avi_rejects_non_avi_and_robust_frame_falls_back():
    import pytest as _pytest

    from gistdex_spark.operators.multimodal import (
        avi_frame_at,
        avi_info,
        fake_frame,
        robust_frame,
    )

    with _pytest.raises(ValueError):
        avi_info(b"RIFF\x10\x00\x00\x00WAVEfmt ")
    with _pytest.raises(ValueError):
        avi_info(b"plain text")
    assert robust_frame(b"plain text", 500) == fake_frame(b"plain text", 500)


def test_avi_truncated_frame_chunk_raises_and_robust_falls_back():
    """A movi chunk whose declared size overruns the payload must raise
    from avi_frame_at (not silently truncate), so robust_frame's except
    path delivers the fake-frame fallback (r7 ADVICE)."""
    import numpy as np

    from gistdex_spark.operators.multimodal import (
        avi_encode_gray,
        avi_frame_at,
        fake_frame,
        robust_frame,
    )

    p = avi_encode_gray([np.full((4, 4), 60, np.uint8)], fps=1)
    # Cut the payload mid-frame-chunk: the index still points past the end.
    cut = p[:-20]
    with pytest.raises(ValueError, match="overruns"):
        avi_frame_at(cut, 0)
    assert robust_frame(cut, 0) == fake_frame(cut, 0)


def test_sample_frames_uses_real_parser_for_avi(spark):
    """Default grabber (robust_frame) must return the ACTUAL frame bytes
    for AVI payloads — not the sha256 fake."""
    import numpy as np

    from gistdex_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        avi_encode_gray,
        sample_frames,
    )

    p = avi_encode_gray(
        [np.full((4, 4), v, np.uint8) for v in (10, 20)], fps=1
    )
    media = spark.createDataFrame(
        [("m1", "video", bytearray(p), "video/x-msvideo", 4, 4, 2000)],
        MEDIA_SCHEMA,
    )
    got = {
        r["ts_ms"]: bytes(r["frame_payload"])
        for r in sample_frames(media, interval_ms=1000).collect()
    }
    assert got == {0: bytes([10]) * 48, 1000: bytes([20]) * 48}


def test_avi_first_frame_decode_equals_bmp_decode_property():
    """avi_decode(first frame) == bmp_decode(same frame as BMP) over
    random dims (incl. widths with stride padding) and frame counts —
    the two containers share the BGR24 bottom-up pixel layout and the
    luma pooling, so the decoders must agree exactly."""
    import random

    import numpy as np

    from gistdex_spark.operators.multimodal import (
        avi_decode,
        avi_encode_gray,
        avi_frame_at,
        avi_info,
        bmp_decode,
        bmp_encode_gray,
    )

    rng = random.Random(13)
    for trial in range(25):
        h = rng.randint(1, 9)
        w = rng.randint(1, 9)  # odd widths exercise stride padding
        nf = rng.randint(1, 5)
        frames = [
            np.array(
                [[rng.randint(0, 255) for _ in range(w)] for _ in range(h)],
                dtype=np.uint8,
            )
            for _ in range(nf)
        ]
        p = avi_encode_gray(frames, fps=rng.choice([1, 2, 5]))
        info = avi_info(p)
        assert (info["width"], info["height"]) == (w, h)
        assert len(info["frames"]) == nf
        got = avi_decode(p, dim=4)
        want = bmp_decode(bmp_encode_gray(frames[0]), dim=4)
        assert (got == want).all(), (trial, w, h, got, want)
        # frame bytes at t=0 equal the BMP's pixel section
        bmp = bmp_encode_gray(frames[0])
        off = int.from_bytes(bmp[10:14], "little")
        assert avi_frame_at(p, 0) == bmp[off:]
