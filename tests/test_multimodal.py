"""Multimodal tests: binaryFile source, metadata struct, the Arrow-batched
decode UDF shape, and the REAL library-free kernels (PNG/BMP/PPM decode,
nearest-neighbor resize, WAV audio features) against synthetic payloads
encoded independently in this file."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    (d / "a.png").write_bytes(b"\x89PNG-fake-payload-a")
    (d / "b.jpg").write_bytes(b"\xff\xd8-fake-payload-bb")
    (d / "c.wav").write_bytes(b"RIFF-fake-payload-ccc")
    return str(d)


def test_load_binary_dir_schema_and_meta(spark, media_dir):
    from kql_engine_spark.multimodal import load_binary_dir

    df = load_binary_dir(spark, media_dir)
    assert df.columns == ["content", "meta"]
    rows = {r.meta.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"].meta.media_type == "image"
    assert rows["c.wav"].meta.media_type == "audio"
    assert rows["b.jpg"].meta.length == len(b"\xff\xd8-fake-payload-bb")
    assert bytes(rows["a.png"].content) == b"\x89PNG-fake-payload-a"


def test_glob_filter(spark, media_dir):
    from kql_engine_spark.multimodal import load_binary_dir

    df = load_binary_dir(spark, media_dir, glob="*.png")
    assert df.count() == 1


def test_fake_decode_image_deterministic(spark, media_dir):
    from kql_engine_spark.multimodal import fake_decode_image, load_binary_dir

    df = load_binary_dir(spark, media_dir, glob="*.png")
    a = fake_decode_image(df).collect()
    b = fake_decode_image(df).collect()
    assert a == b  # deterministic fake: same payload -> same features
    feat = a[0]
    assert 64 <= feat.width < 256 and 64 <= feat.height < 256
    assert 1 <= feat.channels <= 4
    assert 0.0 <= feat.mean_intensity <= 255.0


def _png_bytes(arr, filters):
    """Minimal PNG encoder for tests: 8-bit, per-row filter types."""
    import struct
    import zlib

    import numpy as np

    h, w, c = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b""
    prior = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        ft = filters[y % len(filters)]
        row = arr[y].reshape(-1).astype(np.int32)
        left = np.concatenate([np.zeros(c, np.int32), row[:-c]])
        ul = np.concatenate([np.zeros(c, np.int32), prior[:-c]])
        if ft == 0:
            enc = row
        elif ft == 1:
            enc = (row - left) % 256
        elif ft == 2:
            enc = (row - prior) % 256
        elif ft == 3:
            enc = (row - (left + prior) // 2) % 256
        else:  # paeth
            enc = np.empty_like(row)
            for x in range(len(row)):
                p = int(left[x]) + int(prior[x]) - int(ul[x])
                pa, pb, pc = abs(p - left[x]), abs(p - prior[x]), abs(p - ul[x])
                pr = left[x] if pa <= pb and pa <= pc else (prior[x] if pb <= pc else ul[x])
                enc[x] = (row[x] - pr) % 256
        raw += bytes([ft]) + bytes(enc.astype(np.uint8))
        prior = row

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp_bytes(arr):
    """Minimal bottom-up 24-bit BMP encoder for tests."""
    import struct

    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    data = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytes(int(v) for px in arr[y] for v in (px[2], px[1], px[0]))
        data += row + b"\x00" * (row_bytes - len(row))
    header = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + dib + data


def test_real_decode_png_bmp_pnm(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import decode_image, load_binary_dir

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(3, 6, 1), dtype=np.uint8)
    d = tmp_path_factory.mktemp("real_media")
    (d / "f.png").write_bytes(_png_bytes(img, [0, 1, 2, 3, 4]))
    (d / "g.png").write_bytes(_png_bytes(gray, [4, 3, 1]))
    (d / "h.bmp").write_bytes(_bmp_bytes(img))
    (d / "i.bmp").write_bytes(_bmp_bytes(img[:, :3]))  # 9-byte rows pad to 12
    (d / "p.ppm").write_bytes(
        b"P6\n# comment\n4 5\n255\n" + bytes(img.reshape(-1))
    )
    (d / "j.jpg").write_bytes(b"\xff\xd8\xff\xe0-not-decodable")
    feats = {
        r.path.rsplit("/", 1)[-1]: r
        for r in decode_image(load_binary_dir(spark, str(d))).collect()
    }
    want_mean = round(float(img.mean()), 4)
    for name in ("f.png", "h.bmp", "p.ppm"):
        r = feats[name]
        assert (r.width, r.height, r.channels) == (4, 5, 3), name
        assert r.mean_intensity == want_mean, name
    pad = feats["i.bmp"]
    assert (pad.width, pad.height, pad.channels) == (3, 5, 3)
    assert pad.mean_intensity == round(float(img[:, :3].mean()), 4)
    g = feats["g.png"]
    assert (g.width, g.height, g.channels) == (6, 3, 1)
    assert g.mean_intensity == round(float(gray.mean()), 4)
    # JPEG stays library-gated: null features, row preserved
    assert feats["j.jpg"].width is None


def test_fake_resize_deterministic_shape(spark, media_dir):
    from kql_engine_spark.multimodal import fake_resize_image, load_binary_dir

    df = load_binary_dir(spark, media_dir, glob="*.png")
    out = fake_resize_image(df, 32, 16).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.width, r.height) == (32, 16)
    assert len(bytes(r.resized)) == 32 * 16 // 64
    # deterministic: same input -> same bytes
    again = fake_resize_image(load_binary_dir(spark, media_dir, glob="*.png"), 32, 16).collect()[0]
    assert bytes(again.resized) == bytes(r.resized)


def test_fake_sample_frames_expands_rows(spark, media_dir):
    from kql_engine_spark.multimodal import fake_sample_frames, load_binary_dir

    df = load_binary_dir(spark, media_dir)  # 3 files
    out = fake_sample_frames(df, n_frames=4, fps=2.0).collect()
    assert len(out) == 3 * 4  # 1 -> N expansion
    per_path = {}
    for r in out:
        per_path.setdefault(r.path, []).append(r)
    for rows in per_path.values():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == [0, 1, 2, 3]
        ts = {r.frame_idx: r.ts_sec for r in rows}
        assert ts[2] == 1.0  # frame 2 at 2 fps -> 1.0s
        assert len({bytes(r.frame) for r in rows}) == 4  # distinct frames


def test_fake_audio_features(spark, media_dir):
    from kql_engine_spark.multimodal import fake_audio_features, load_binary_dir

    out = fake_audio_features(load_binary_dir(spark, media_dir, glob="*.wav")).collect()
    assert len(out) == 1
    r = out[0]
    assert 1.0 <= r.duration_sec <= 300.0
    assert r.sample_rate in (8000, 16000, 22050, 44100, 48000)
    assert 0.0 <= r.rms <= 1.0


def _wav_bytes(rate, samples16):
    import struct

    import numpy as np

    data = np.asarray(samples16, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_real_resize_image_roundtrips(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import (
        _decode_payload, load_binary_dir, resize_image,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    d = tmp_path_factory.mktemp("resize_media")
    (d / "src.png").write_bytes(_png_bytes(img, [0, 2]))
    (d / "bad.jpg").write_bytes(b"\xff\xd8nope")
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in resize_image(load_binary_dir(spark, str(d)), 3, 4).collect()
    }
    out = _decode_payload(bytes(rows["src.png"].resized))
    assert out.shape == (4, 3, 3)
    # nearest-neighbor: every output pixel is an input pixel
    ys = (np.arange(4) * 8 // 4).clip(0, 7)
    xs = (np.arange(3) * 6 // 3).clip(0, 5)
    assert (out == img[ys][:, xs]).all()
    assert rows["bad.jpg"].resized is None


def test_real_audio_features_wav(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import audio_features, load_binary_dir

    t = np.arange(16000)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 16384).astype("<i2")
    d = tmp_path_factory.mktemp("audio_media")
    (d / "tone.wav").write_bytes(_wav_bytes(16000, sine))
    (d / "noise.mp3").write_bytes(b"ID3 not parseable")
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in audio_features(load_binary_dir(spark, str(d))).collect()
    }
    tone = rows["tone.wav"]
    assert tone.sample_rate == 16000 and tone.duration_sec == 1.0
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2) ~ 0.3536
    assert abs(tone.rms - 0.3536) < 0.002
    assert rows["noise.mp3"].sample_rate is None
