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
    # undecodable payload: null features, row preserved
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


# ------------------------------------------------------------- baseline JPEG
# Minimal baseline JPEG ENCODER for tests. It writes its own flat-length
# canonical Huffman tables into DHT (no reliance on the Annex K defaults)
# and an all-ones quant table, so decoder errors can't hide behind table
# mismatches; only the zigzag order and DCT basis are shared spec knowledge.

_TEST_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_bytes(img, sampling=None, dri=0, prec=8):
    import struct

    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 or img.shape[2] == 1 else 3
    if prec != 8:
        assert ch == 1, "12-bit test encoder is grayscale-only"
    img = img.reshape(h, w, ch).astype(np.float64)
    if ch == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = sampling or [(1, 1)] * 3
    else:
        planes = [img[..., 0]]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    comp = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * vmax * 8, mcux * hmax * 8
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:
            pp = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        comp.append(pp)
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0] /= np.sqrt(2.0)
    C /= 2.0
    ncat = 12 if prec == 8 else 16
    dc_bits, dc_vals = [0] * 16, list(range(ncat))
    dc_bits[4] = ncat  # flat 5-bit codes
    smax = 11 if prec == 8 else 15
    ac_vals = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, smax)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)  # flat 8-bit codes

    def canon(bits, vals):
        m, code, i = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                m[vals[i]] = (ln, code)
                code += 1
                i += 1
            code <<= 1
        return m

    dc_map, ac_map = canon(dc_bits, dc_vals), canon(ac_bits, ac_vals)
    out = bytearray()
    st = {"b": 0, "n": 0}

    def put(v, n):
        for i in range(n - 1, -1, -1):
            st["b"] = (st["b"] << 1) | ((v >> i) & 1)
            st["n"] += 1
            if st["n"] == 8:
                out.append(st["b"])
                if st["b"] == 0xFF:
                    out.append(0)
                st["b"], st["n"] = 0, 0

    def flush():
        while st["n"]:
            put(1, 1)

    def cat(v):
        return abs(v).bit_length()

    pred = [0] * len(comp)
    rst = 0
    for m in range(mcux * mcuy):
        if dri and m and m % dri == 0:
            flush()
            out.extend(b"\xff" + bytes([0xD0 + rst % 8]))
            rst += 1
            pred = [0] * len(comp)
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for by in range(sv):
                for bx in range(sh):
                    y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                    blk = comp[ci][y0 : y0 + 8, x0 : x0 + 8] - float(1 << (prec - 1))
                    qc = np.rint(C @ blk @ C.T).astype(int)
                    zz = [int(qc.flat[_TEST_ZIGZAG[i]]) for i in range(64)]
                    d = zz[0] - pred[ci]
                    pred[ci] = zz[0]
                    s = cat(d)
                    ln, code = dc_map[s]
                    put(code, ln)
                    if s:
                        put(d if d >= 0 else d + (1 << s) - 1, s)
                    run = 0
                    for kk in range(1, 64):
                        v = zz[kk]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ln, code = ac_map[0xF0]
                            put(code, ln)
                            run -= 16
                        s = cat(v)
                        ln, code = ac_map[(run << 4) | s]
                        put(code, ln)
                        put(v if v >= 0 else v + (1 << s) - 1, s)
                        run = 0
                    if run:
                        ln, code = ac_map[0x00]
                        put(code, ln)
    flush()
    nc = len(comp)
    head = bytearray(b"\xff\xd8")
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    head += (b"\xff\xc0" if prec == 8 else b"\xff\xc1") + struct.pack(
        ">HBHHB", 8 + 3 * nc, prec, h, w, nc
    )
    for ci, (sh, sv) in enumerate(samp):
        head += bytes([ci + 1, (sh << 4) | sv, 0])
    head += b"\xff\xc4" + struct.pack(">HB", 19 + ncat, 0x00) + bytes(dc_bits + dc_vals)
    head += (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(ac_vals), 0x10)
        + bytes(ac_bits + ac_vals)
    )
    if dri:
        head += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    head += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        head += bytes([ci + 1, 0x00])
    head += b"\x00\x3f\x00"
    return bytes(head) + bytes(out) + b"\xff\xd9"


def test_jpeg_decode_roundtrip_unit():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(11)
    # constant gray, DC-only path: exact
    g = np.full((16, 8), 136, dtype=np.uint8)
    got = _decode_jpeg(_jpeg_bytes(g))
    assert got.shape == (16, 8, 1) and np.all(got == 136)
    # random color 4:4:4 with all-ones quant: only DCT rounding survives
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = _decode_jpeg(_jpeg_bytes(img))
    assert got.shape == (16, 16, 3)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4
    # non-multiple-of-8 dims crop back to the requested size
    odd = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    got = _decode_jpeg(_jpeg_bytes(odd))
    assert got.shape == (12, 10, 3)
    assert np.max(np.abs(got.astype(int) - odd.astype(int))) <= 4
    # constant color survives 4:2:0 subsampling + upsampling exactly (+-1)
    c420 = np.zeros((32, 16, 3), dtype=np.uint8)
    c420[..., 0], c420[..., 1], c420[..., 2] = 70, 120, 200
    got = _decode_jpeg(_jpeg_bytes(c420, sampling=[(2, 2), (1, 1), (1, 1)]))
    assert got.shape == (32, 16, 3)
    assert np.max(np.abs(got.astype(int) - c420.astype(int))) <= 1
    # constant color also survives 4:2:2 (horizontal-only subsampling)
    c422 = np.zeros((16, 32, 3), dtype=np.uint8)
    c422[..., 0], c422[..., 1], c422[..., 2] = 30, 90, 180
    got = _decode_jpeg(_jpeg_bytes(c422, sampling=[(2, 1), (1, 1), (1, 1)]))
    assert got.shape == (16, 32, 3)
    assert np.max(np.abs(got.astype(int) - c422.astype(int))) <= 1
    # restart markers: DC predictors reset at each RST boundary
    got = _decode_jpeg(_jpeg_bytes(img, dri=2))
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4


def test_jpeg_decode_through_spark_pipeline(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import decode_image, load_binary_dir

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(24, 16, 3), dtype=np.uint8)
    d = tmp_path_factory.mktemp("jpeg_media")
    (d / "a.jpg").write_bytes(_jpeg_bytes(img))
    (d / "bad.jpg").write_bytes(b"\xff\xd8\xff\xe0-not-decodable")
    feats = {
        r.path.rsplit("/", 1)[-1]: r
        for r in decode_image(load_binary_dir(spark, str(d))).collect()
    }
    a = feats["a.jpg"]
    assert (a.width, a.height, a.channels) == (16, 24, 3)
    assert abs(a.mean_intensity - float(img.mean())) < 2.0
    assert feats["bad.jpg"].width is None


def _test_gif_lzw(pixels, mcs):
    """Shared test LZW encoder: dict growth + DEFERRED width bumps (the
    decoder's table lags one entry behind, so the width increases one
    step later than the insert that filled 2^w)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = []
    width = mcs + 1
    codes.append((clear, width))
    d = {(i,): i for i in range(clear)}
    nxt = end + 1
    buf = ()
    for px in pixels:
        cand = buf + (px,)
        if cand in d:
            buf = cand
            continue
        codes.append((d[buf], width))
        d[cand] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        buf = (px,)
    if buf:
        codes.append((d[buf], width))
    codes.append((end, width))
    acc = nbits = 0
    data = bytearray()
    for code, cw in codes:
        acc |= code << nbits
        nbits += cw
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return data


def _gif_header(w, h, palette):
    import struct

    n = len(palette)
    gct_bits = max(1, (n - 1).bit_length()) - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | gct_bits, 0, 0)
    for i in range(2 << gct_bits):
        out += bytes(palette[i] if i < n else (0, 0, 0))
    return out


def _gif_subblocks(data):
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"


def _gif_bytes(idx, palette, interlace=False, mcs=4):
    """Minimal single-frame GIF89a encoder for tests."""
    import struct

    h, w = idx.shape
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = idx[order]
    data = _test_gif_lzw(rows.reshape(-1).tolist(), mcs)
    out = _gif_header(w, h, palette)
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out += bytes([mcs]) + _gif_subblocks(data)
    return bytes(out + b"\x3b")


def _gif_anim_bytes(frames, palette, delays_cs, mcs=4):
    """Animated GIF: one GCE (delay, no transparency) + full-screen image
    descriptor per frame."""
    import struct

    h, w = frames[0].shape
    out = _gif_header(w, h, palette)
    for idx, delay in zip(frames, delays_cs):
        out += b"\x21\xf9\x04" + bytes([0, delay & 0xFF, delay >> 8, 0]) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([mcs]) + _gif_subblocks(
            _test_gif_lzw(idx.reshape(-1).tolist(), mcs)
        )
    return bytes(out + b"\x3b")


def test_gif_decode_roundtrip_unit():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_gif

    rng = np.random.default_rng(23)
    palette = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(16)]
    idx = rng.integers(0, 16, size=(13, 7), dtype=np.int32)
    want = np.array(palette, dtype=np.uint8)[idx]
    got = _decode_gif(_gif_bytes(idx, palette))
    assert got is not None and got.shape == (13, 7, 3)
    assert np.array_equal(got, want)
    # interlaced rows come back in display order
    got_i = _decode_gif(_gif_bytes(idx, palette, interlace=True))
    assert np.array_equal(got_i, want)
    # repetitive data exercises dict growth and the KwKwK path
    rep = np.tile(np.arange(4, dtype=np.int32), (32, 8))
    want_rep = np.array(palette, dtype=np.uint8)[rep]
    got_rep = _decode_gif(_gif_bytes(rep, palette))
    assert np.array_equal(got_rep, want_rep)
    assert _decode_gif(b"GIF89a-garbage") is None


def test_gif_sample_frames_real(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import load_binary_dir, sample_frames

    rng = np.random.default_rng(29)
    palette = [tuple(int(v) for v in rng.integers(0, 256, 3)) for _ in range(8)]
    frames = [
        np.full((6, 5), i % 8, dtype=np.int32) * 0 + i for i in range(4)
    ]
    d = tmp_path_factory.mktemp("gif_anim")
    (d / "anim.gif").write_bytes(_gif_anim_bytes(frames, palette, [10, 20, 30, 40]))
    (d / "still.png").write_bytes(b"\x89PNG-not-a-gif")
    out = sample_frames(load_binary_dir(spark, str(d)), n_frames=3).collect()
    # non-GIF rows produce no frames; GIF yields 3 evenly spaced of 4
    assert all(r.path.endswith("anim.gif") for r in out)
    assert len(out) == 3
    by_ix = {r.frame_idx: r for r in out}
    assert sorted(by_ix) == [0, 2, 3]  # round(i*3/2) spacing over 4 frames
    # ts from accumulated delays (cs): frame 2 starts at (10+20)/100
    assert abs(by_ix[2].ts_sec - 0.30) < 1e-9
    assert abs(by_ix[3].ts_sec - 0.60) < 1e-9
    # frames round-trip: constant color index i -> palette[i] everywhere
    for fi, r in by_ix.items():
        body = bytes(r.frame).split(b"\n", 3)[3]
        px = np.frombuffer(body, np.uint8).reshape(6, 5, 3)
        assert np.all(px == np.array(palette[fi], dtype=np.uint8))


def test_sample_frames_corrupt_gif_yields_zero_rows(spark, tmp_path_factory):
    # valid GIF magic but truncated header/blocks: the payload must yield
    # zero rows (per-payload guard), never fail the whole query
    from kql_engine_spark.multimodal import load_binary_dir, sample_frames

    d = tmp_path_factory.mktemp("gif_bad")
    (d / "trunc1.gif").write_bytes(b"GIF89a\x05\x00")  # cut mid-header
    (d / "trunc2.gif").write_bytes(
        _gif_header(5, 6, [(0, 0, 0)] * 2)[:14] + b"\x2c\x00"
    )  # cut mid image descriptor
    (d / "junk.gif").write_bytes(b"GIF89a" + bytes(range(48)))
    out = sample_frames(load_binary_dir(spark, str(d)), n_frames=2).collect()
    assert out == []


def test_jpeg_restart_desync_fails_closed():
    # DRI declared but RST markers absent: the bitstream is desynced, so
    # the decoder must fail (to a None payload upstream) instead of
    # silently producing corrupt pixels
    import numpy as np
    import pytest

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    payload = bytearray(_jpeg_bytes(img, dri=2))
    # strip every RSTn (FF D0..D7) from the entropy stream
    i = 0
    while i < len(payload) - 1:
        if payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7:
            del payload[i : i + 2]
        else:
            i += 1
    with pytest.raises(ValueError, match="restart"):
        _decode_jpeg(bytes(payload))


def _jpeg_progressive_bytes(img, use_sa=True):
    """Minimal progressive JPEG encoder (tests only; written independently
    of the engine decoder per this file's contract). 1:1 sampling, all-ones
    quant table, flat Huffman codes. use_sa=True emits the 4-scan
    successive-approximation ladder (DC@Al=1 -> AC@Al=1 per comp -> DC
    refine -> AC refine per comp); use_sa=False emits spectral-selection
    only (DC, then AC bands 1-5 and 6-63 per comp), both with EOBRUN."""
    import struct

    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 or img.shape[2] == 1 else 3
    img = img.reshape(h, w, ch).astype(np.float64)
    if ch == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [img[..., 0]]
    mcux, mcuy = -(-w // 8), -(-h // 8)
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0] /= np.sqrt(2.0)
    C /= 2.0
    # quantized zigzag coefficient blocks per component
    blocks = []  # blocks[ci][by][bx] -> list of 64 ints (zigzag)
    for p in planes:
        pp = np.pad(p, ((0, mcuy * 8 - h), (0, mcux * 8 - w)), mode="edge")
        rows = []
        for by in range(mcuy):
            row = []
            for bx in range(mcux):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qc = np.rint(C @ blk @ C.T).astype(int)
                row.append([int(qc.flat[_TEST_ZIGZAG[i]]) for i in range(64)])
            rows.append(row)
        blocks.append(rows)

    dc_bits, dc_vals = [0] * 16, list(range(12))
    dc_bits[3] = 12
    # full AC alphabet incl. EOBn (r<<4|0, r<15) and refine (r<<4|1)
    ac_vals = [(r << 4) | s for r in range(16) for s in range(11)]
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_vals)

    def canon(bits, vals):
        m, code, i = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                m[vals[i]] = (ln, code)
                code += 1
                i += 1
            code <<= 1
        return m

    dc_map, ac_map = canon(dc_bits, dc_vals), canon(ac_bits, ac_vals)

    out_all = bytearray()

    class Bitwriter:
        def __init__(self):
            self.out = bytearray()
            self.b = 0
            self.n = 0

        def put(self, v, n):
            for i in range(n - 1, -1, -1):
                self.b = (self.b << 1) | ((v >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.out.append(self.b)
                    if self.b == 0xFF:
                        self.out.append(0)
                    self.b, self.n = 0, 0

        def flush(self):
            while self.n:
                self.put(1, 1)

    def cat(v):
        return abs(v).bit_length()

    def sos_header(comp_ids, ss, se, ah, al):
        hd = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids), len(comp_ids))
        for cid in comp_ids:
            hd += bytes([cid, 0x00])
        hd += bytes([ss, se, (ah << 4) | al])
        return hd

    def dc_first_scan(al):
        bw = Bitwriter()
        pred = [0] * len(blocks)
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci in range(len(blocks)):
                v = blocks[ci][my][mx][0] >> al  # arithmetic shift per T.81
                d = v - pred[ci]
                pred[ci] = v
                s = cat(d)
                ln, code = dc_map[s]
                bw.put(code, ln)
                if s:
                    bw.put(d if d >= 0 else d + (1 << s) - 1, s)
        bw.flush()
        return bw.out

    def dc_refine_scan(al):
        bw = Bitwriter()
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci in range(len(blocks)):
                bw.put((blocks[ci][my][mx][0] >> al) & 1, 1)
        bw.flush()
        return bw.out

    def ac_first_scan(ci, ss, se, al):
        bw = Bitwriter()
        eobrun = 0

        def flush_eobrun():
            nonlocal eobrun
            if eobrun:
                r = eobrun.bit_length() - 1
                ln, code = ac_map[r << 4]
                bw.put(code, ln)
                if r:
                    bw.put(eobrun - (1 << r), r)
                eobrun = 0

        for by in range(mcuy):
            for bx in range(mcux):
                zz = blocks[ci][by][bx]
                band = [
                    (int(np.fix(zz[kk] / (1 << al))) if al else zz[kk])
                    for kk in range(ss, se + 1)
                ]
                last = -1
                for i, v in enumerate(band):
                    if v:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    continue
                flush_eobrun()
                run = 0
                for i in range(last + 1):
                    v = band[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_map[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    s = cat(v)
                    ln, code = ac_map[(run << 4) | s]
                    bw.put(code, ln)
                    bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < se - ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        bw.flush()
        return bw.out

    def ac_refine_scan(ci, ss, se, al):
        # T.81 G.2 correction-bit encoding (libjpeg-style bit buffering)
        bw = Bitwriter()
        eobrun = 0
        pending_bits = []

        def flush_eobrun():
            nonlocal eobrun, pending_bits
            if eobrun:
                r = eobrun.bit_length() - 1
                ln, code = ac_map[r << 4]
                bw.put(code, ln)
                if r:
                    bw.put(eobrun - (1 << r), r)
                for bit in pending_bits:
                    bw.put(bit, 1)
                pending_bits = []
                eobrun = 0

        for by in range(mcuy):
            for bx in range(mcux):
                zz = blocks[ci][by][bx]
                absv = [abs(zz[kk]) >> al for kk in range(ss, se + 1)]
                # EOB = after the last newly-nonzero (magnitude exactly 1)
                last_new = -1
                for i, t in enumerate(absv):
                    if t == 1:
                        last_new = i
                if last_new < 0:
                    # no new coefficients: whole band is EOB-span bits
                    eobrun += 1
                    pending_bits.extend(t & 1 for t in absv if t > 1)
                    if eobrun == 0x7FFF:
                        flush_eobrun()
                    continue
                flush_eobrun()
                r = 0
                br = []
                for i in range(last_new + 1):
                    t = absv[i]
                    if t == 0:
                        r += 1
                        continue
                    if t > 1:
                        br.append(t & 1)
                        continue
                    while r > 15:
                        ln, code = ac_map[0xF0]
                        bw.put(code, ln)
                        r -= 16
                        for bit in br:
                            bw.put(bit, 1)
                        br = []
                    ln, code = ac_map[(r << 4) | 1]
                    bw.put(code, ln)
                    bw.put(1 if zz[ss + i] > 0 else 0, 1)
                    for bit in br:
                        bw.put(bit, 1)
                    br = []
                    r = 0
                tail = [t & 1 for t in absv[last_new + 1 :] if t > 1]
                if r > 0 or tail:
                    eobrun += 1
                    pending_bits.extend(tail)
                    if eobrun == 0x7FFF:
                        flush_eobrun()
        flush_eobrun()
        bw.flush()
        return bw.out

    nc = len(blocks)
    head = bytearray(b"\xff\xd8")
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    head += b"\xff\xc2" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        head += bytes([ci + 1, 0x11, 0])
    head += b"\xff\xc4" + struct.pack(">HB", 19 + 12, 0x00) + bytes(dc_bits + dc_vals)
    head += (
        b"\xff\xc4"
        + struct.pack(">HB", 19 + len(ac_vals), 0x10)
        + bytes(ac_bits + ac_vals)
    )
    out_all += head
    ids = [ci + 1 for ci in range(nc)]
    if use_sa:
        out_all += sos_header(ids, 0, 0, 0, 1) + dc_first_scan(1)
        for ci in range(nc):
            out_all += sos_header([ci + 1], 1, 63, 0, 1) + ac_first_scan(ci, 1, 63, 1)
        out_all += sos_header(ids, 0, 0, 1, 0) + dc_refine_scan(0)
        for ci in range(nc):
            out_all += sos_header([ci + 1], 1, 63, 1, 0) + ac_refine_scan(ci, 1, 63, 0)
    else:
        out_all += sos_header(ids, 0, 0, 0, 0) + dc_first_scan(0)
        for ci in range(nc):
            out_all += sos_header([ci + 1], 1, 5, 0, 0) + ac_first_scan(ci, 1, 5, 0)
            out_all += sos_header([ci + 1], 6, 63, 0, 0) + ac_first_scan(ci, 6, 63, 0)
    return bytes(out_all) + b"\xff\xd9"


def test_jpeg_progressive_spectral_selection_roundtrip():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (24, 17, 3)).astype(np.uint8)
    got = _decode_jpeg(_jpeg_progressive_bytes(img, use_sa=False))
    assert got is not None and got.shape == (24, 17, 3)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4

    g = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    got = _decode_jpeg(_jpeg_progressive_bytes(g, use_sa=False))
    assert got is not None and got.shape == (16, 16, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - g.astype(int))) <= 1


def test_jpeg_progressive_successive_approximation_roundtrip():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(43)
    img = rng.integers(0, 256, (24, 17, 3)).astype(np.uint8)
    got = _decode_jpeg(_jpeg_progressive_bytes(img, use_sa=True))
    assert got is not None and got.shape == (24, 17, 3)
    # after the refinement ladder, precision equals the sequential path
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4

    g = rng.integers(0, 256, (23, 9)).astype(np.uint8)
    got = _decode_jpeg(_jpeg_progressive_bytes(g, use_sa=True))
    assert got is not None and got.shape == (23, 9, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - g.astype(int))) <= 1


def test_jpeg_progressive_smooth_image_exercises_eobrun():
    # a smooth gradient quantizes to long zero tails -> EOBn spans > 1
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    y, x = np.mgrid[0:40, 0:33]
    img = ((y * 3 + x * 2) % 256).astype(np.uint8)
    for sa in (False, True):
        got = _decode_jpeg(_jpeg_progressive_bytes(img, use_sa=sa))
        assert got is not None and got.shape == (40, 33, 1)
        assert np.max(np.abs(got[..., 0].astype(int) - img.astype(int))) <= 1


# ------------------------------------------------- JPEG arithmetic (SOF9/10)
# Minimal arithmetic-coded JPEG ENCODER for tests, written against the
# T.81 Annex D ENCODER flowcharts (CODE0/CODE1, RENORME, BYTEOUT with
# carry/FF-stack/zero-deferral, FLUSH) and the F.1.4.4 conditioning
# procedures — independent of the engine's DECODER logic. The one shared
# artifact is the Table D.3 state machine itself (duplicated below so a
# later engine-side edit is pinned); a transcription error common to both
# copies would not be caught by these round-trips and is called out in the
# engine docstring.

_TEST_ARITAB = (
    (0x5A1D, 1, 1, 1), (0x2586, 2, 14, 0), (0x1114, 3, 16, 0),
    (0x080B, 4, 18, 0), (0x03D8, 5, 20, 0), (0x01DA, 6, 23, 0),
    (0x00E5, 7, 25, 0), (0x006F, 8, 28, 0), (0x0036, 9, 30, 0),
    (0x001A, 10, 33, 0), (0x000D, 11, 35, 0), (0x0006, 12, 9, 0),
    (0x0003, 13, 10, 0), (0x0001, 13, 12, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 16, 36, 0), (0x2CF2, 17, 38, 0), (0x207C, 18, 39, 0),
    (0x17B9, 19, 40, 0), (0x1182, 20, 42, 0), (0x0CEF, 21, 43, 0),
    (0x09A1, 22, 45, 0), (0x072F, 23, 46, 0), (0x055C, 24, 48, 0),
    (0x0406, 25, 49, 0), (0x0303, 26, 51, 0), (0x0240, 27, 52, 0),
    (0x01B1, 28, 54, 0), (0x0144, 29, 56, 0), (0x00F5, 30, 57, 0),
    (0x00B7, 31, 59, 0), (0x008A, 32, 60, 0), (0x0068, 33, 62, 0),
    (0x004E, 34, 63, 0), (0x003B, 35, 32, 0), (0x002C, 9, 33, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 38, 64, 0), (0x3A0D, 39, 65, 0),
    (0x2EF1, 40, 67, 0), (0x261F, 41, 68, 0), (0x1F33, 42, 69, 0),
    (0x19A8, 43, 70, 0), (0x1518, 44, 72, 0), (0x1177, 45, 73, 0),
    (0x0E74, 46, 74, 0), (0x0BFB, 47, 75, 0), (0x09F8, 48, 77, 0),
    (0x0861, 49, 78, 0), (0x0706, 50, 79, 0), (0x05CD, 51, 48, 0),
    (0x04DE, 52, 50, 0), (0x040F, 53, 50, 0), (0x0363, 54, 51, 0),
    (0x02D4, 55, 52, 0), (0x025C, 56, 53, 0), (0x01F8, 57, 54, 0),
    (0x01A4, 58, 55, 0), (0x0160, 59, 56, 0), (0x0125, 60, 57, 0),
    (0x00F6, 61, 58, 0), (0x00CB, 62, 59, 0), (0x00AB, 63, 61, 0),
    (0x008F, 32, 61, 0), (0x5B12, 65, 65, 1), (0x4D04, 66, 80, 0),
    (0x412C, 67, 81, 0), (0x37D8, 68, 82, 0), (0x2FE8, 69, 83, 0),
    (0x293C, 70, 84, 0), (0x2379, 71, 86, 0), (0x1EDF, 72, 87, 0),
    (0x1AA9, 73, 87, 0), (0x174E, 74, 72, 0), (0x1424, 75, 72, 0),
    (0x119C, 76, 74, 0), (0x0F6B, 77, 74, 0), (0x0D51, 78, 75, 0),
    (0x0BB6, 79, 77, 0), (0x0A40, 48, 77, 0), (0x5832, 81, 80, 1),
    (0x4D1C, 82, 88, 0), (0x438E, 83, 89, 0), (0x3BDD, 84, 90, 0),
    (0x34EE, 85, 91, 0), (0x2EAE, 86, 92, 0), (0x299A, 87, 93, 0),
    (0x2516, 71, 86, 0), (0x5570, 89, 88, 1), (0x4CA9, 90, 95, 0),
    (0x44D9, 91, 96, 0), (0x3E22, 92, 97, 0), (0x3824, 93, 99, 0),
    (0x32B4, 94, 99, 0), (0x2E17, 86, 93, 0), (0x56A8, 96, 95, 1),
    (0x4F46, 97, 101, 0), (0x47E5, 98, 102, 0), (0x41CF, 99, 103, 0),
    (0x3C3D, 100, 104, 0), (0x375E, 93, 99, 0), (0x5231, 102, 105, 0),
    (0x4C0F, 103, 106, 0), (0x4639, 104, 107, 0), (0x415E, 99, 103, 0),
    (0x5627, 106, 105, 1), (0x50E7, 107, 108, 0), (0x4B85, 103, 109, 0),
    (0x5597, 109, 110, 0), (0x504F, 107, 111, 0), (0x5A10, 111, 110, 1),
    (0x5522, 109, 112, 0), (0x59EB, 111, 112, 1), (0x5A1D, 113, 113, 0),
)


class _ArithW:
    """T.81 Annex D arithmetic ENCODER: CODE0/CODE1 with conditional
    exchange, RENORME with BYTEOUT (carry propagation over stacked 0xFF
    bytes, deferred zero bytes), 0x00 stuffing after emitted 0xFF, and
    the D.1.8 FLUSH that drops trailing zero bytes."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11
        self.buffer = -1
        self.sc = 0  # stacked 0xFF bytes awaiting carry resolution
        self.zc = 0  # deferred 0x00 bytes
        self.out = bytearray()

    def _emit(self, b):
        self.out.append(b)
        if b == 0xFF:
            self.out.append(0)

    def _flush_zc(self):
        if self.zc:
            self.out.extend(b"\x00" * self.zc)
            self.zc = 0

    def encode(self, st, i, bit):
        sv = st[i]
        qe, nmps, nlps, sw = _TEST_ARITAB[sv & 0x7F]
        self.a -= qe
        if bit != (sv >> 7):
            # LPS, conditional exchange
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            if sw:
                sv ^= 0x80
            st[i] = (sv & 0x80) | nlps
        else:
            # MPS
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) | nmps
        while True:  # RENORME
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:  # BYTEOUT
                temp = self.c >> 19
                if temp > 0xFF:
                    # carry: ripple into buffer, stacked FFs become 00
                    if self.buffer >= 0:
                        self._flush_zc()
                        self._emit(self.buffer + 1)
                    self.zc += self.sc
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1
                else:
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer >= 0:
                        self._flush_zc()
                        self._emit(self.buffer)
                    if self.sc:
                        self._flush_zc()
                        self.out.extend(b"\xff\x00" * self.sc)
                        self.sc = 0
                    self.buffer = temp
                self.c &= 0x7FFFF
                self.ct += 8
            if self.a >= 0x8000:
                return

    def finish(self):
        # D.1.8: pick the in-interval codepoint with most trailing zeros
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = temp + 0x8000 if temp < self.c else temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._flush_zc()
                self._emit(self.buffer + 1)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._flush_zc()
                self._emit(self.buffer)
            if self.sc:
                self._flush_zc()
                self.out.extend(b"\xff\x00" * self.sc)
                self.sc = 0
        if self.c & 0x7FFF800:  # trailing zero bytes are dropped
            self._flush_zc()
            self._emit((self.c >> 19) & 0xFF)
            if self.c & 0x7F800:
                self._emit((self.c >> 11) & 0xFF)
        self.buffer = -1
        return bytes(self.out)


class _ArithJpegCtx:
    """Per-restart-interval encode state: coder, statistics, DC contexts."""

    def __init__(self, ncomp):
        self.w = _ArithW()
        self.dc_st = bytearray(64)
        self.ac_st = bytearray(256)
        self.fixed = bytearray([113])
        self.pred = [0] * ncomp
        self.dc_ctx = [0] * ncomp

    def enc_dc(self, ci, v, cond_dc):
        # F.1.4.1 / F.1.4.4.1 (v already point-transformed)
        w, st = self.w, self.dc_st
        d = v - self.pred[ci]
        self.pred[ci] = v
        i = self.dc_ctx[ci]
        if d == 0:
            w.encode(st, i, 0)
            self.dc_ctx[ci] = 0
            return
        w.encode(st, i, 1)
        sign = 1 if d < 0 else 0
        w.encode(st, i + 1, sign)
        i += 2 + sign
        v2 = (-d if sign else d) - 1
        m = 0
        if v2:
            w.encode(st, i, 1)
            m = 1
            i = 20  # X1
            vt = v2
            while vt >> 1:
                w.encode(st, i, 1)
                m <<= 1
                i += 1
                vt >>= 1
        w.encode(st, i, 0)
        lo, up = cond_dc
        if m < (1 << lo) >> 1:
            self.dc_ctx[ci] = 0
        elif m > (1 << up) >> 1:
            self.dc_ctx[ci] = 12 + 4 * sign
        else:
            self.dc_ctx[ci] = 4 + 4 * sign
        i += 14
        mm = m >> 1
        while mm:
            w.encode(st, i, 1 if v2 & mm else 0)
            mm >>= 1

    def enc_ac_band(self, zz, kstart, se, al, kx):
        # F.1.4.2 sequential / G.1.3.2 first-pass band with >> al
        w, st = self.w, self.ac_st
        ke = se
        while ke >= kstart and (abs(zz[ke]) >> al) == 0:
            ke -= 1
        k = kstart
        while k <= ke:
            i = 3 * (k - 1)
            w.encode(st, i, 0)  # not EOB yet
            while (abs(zz[k]) >> al) == 0:
                w.encode(st, i + 1, 0)
                i += 3
                k += 1
            w.encode(st, i + 1, 1)
            sign = 1 if zz[k] < 0 else 0
            w.encode(self.fixed, 0, sign)
            v = (abs(zz[k]) >> al) - 1
            i += 2
            m = 0
            if v:
                w.encode(st, i, 1)
                m = 1
                if v >> 1:
                    w.encode(st, i, 1)
                    m = 2
                    i = 189 if k <= kx else 217  # X2 lo/hi band
                    vt = v >> 1
                    while vt >> 1:
                        w.encode(st, i, 1)
                        m <<= 1
                        i += 1
                        vt >>= 1
            w.encode(st, i, 0)
            i += 14
            mm = m >> 1
            while mm:
                w.encode(st, i, 1 if v & mm else 0)
                mm >>= 1
            k += 1
        if ke < se:
            w.encode(st, 3 * (k - 1), 1)  # EOB

    def enc_ac_refine(self, zz, kstart, se, al):
        # G.1.3.3 successive-approximation correction scan
        w, st = self.w, self.ac_st
        ke = se
        while ke >= kstart and (abs(zz[ke]) >> al) == 0:
            ke -= 1
        kex = ke
        while kex >= kstart and (abs(zz[kex]) >> (al + 1)) == 0:
            kex -= 1
        k = kstart
        while k <= ke:
            i = 3 * (k - 1)
            if k > kex:
                w.encode(st, i, 0)
            while True:
                t = abs(zz[k]) >> al
                if t:
                    if t >> 1:  # previously nonzero: correction bit
                        w.encode(st, i + 2, t & 1)
                    else:  # newly nonzero: significance + sign
                        w.encode(st, i + 1, 1)
                        w.encode(self.fixed, 0, 1 if zz[k] < 0 else 0)
                    break
                w.encode(st, i + 1, 0)
                i += 3
                k += 1
            k += 1
        if ke < se:
            w.encode(st, 3 * (k - 1), 1)  # EOB


def _jpeg_arith_bytes(img, sampling=None, dri=0, cond_dc=(0, 1), cond_ac=5,
                      progressive=False):
    """Arithmetic-coded JPEG encoder (tests only). Sequential SOF9 with
    optional subsampling/restarts/conditioning, or — progressive=True,
    1:1 only — SOF10 as a 4-scan successive-approximation ladder
    (DC@Al=1, per-comp AC@Al=1, DC refine, per-comp AC refine)."""
    import struct

    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 or img.shape[2] == 1 else 3
    img = img.reshape(h, w, ch).astype(np.float64)
    if ch == 3:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        samp = sampling or [(1, 1)] * 3
    else:
        planes = [img[..., 0]]
        samp = [(1, 1)]
    if progressive:
        assert all(s == (1, 1) for s in samp), "progressive test enc is 1:1"
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    k = np.arange(8)
    C = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
    C[0] /= np.sqrt(2.0)
    C /= 2.0
    # quantized zigzag blocks per component on the MCU-padded grid
    blocks = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcuy * vmax * 8, mcux * hmax * 8
        pp = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:
            pp = pp.reshape(ph // fy, fy, pw // fx, fx).mean(axis=(1, 3))
        rows = []
        for by in range(mcuy * sv):
            row = []
            for bx in range(mcux * sh):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                qc = np.rint(C @ blk @ C.T).astype(int)
                row.append([int(qc.flat[_TEST_ZIGZAG[i]]) for i in range(64)])
            rows.append(row)
        blocks.append(rows)
    nc = len(planes)

    def walk_mcu(ctx_holder, per_block, out):
        """Interleaved MCU walk with restart handling shared by the
        sequential scan and the progressive DC scans."""
        rst = 0
        for m in range(mcux * mcuy):
            if dri and m and m % dri == 0:
                out.extend(ctx_holder[0].w.finish())
                out.extend(b"\xff" + bytes([0xD0 + rst % 8]))
                rst += 1
                ctx_holder[0] = _ArithJpegCtx(nc)
            my, mx = divmod(m, mcux)
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        per_block(
                            ctx_holder[0],
                            blocks[ci][my * sv + by][mx * sh + bx], ci,
                        )
        out.extend(ctx_holder[0].w.finish())

    def sos_header(comp_ids, ss, se, ah, al):
        hd = b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(comp_ids),
                                       len(comp_ids))
        for cid in comp_ids:
            hd += bytes([cid, 0x00])  # Td=0 (DC cond table), Ta=0 (AC)
        hd += bytes([ss, se, (ah << 4) | al])
        return hd

    scans = bytearray()
    if not progressive:
        scans += sos_header(list(range(1, nc + 1)), 0, 63, 0, 0)
        holder = [_ArithJpegCtx(nc)]

        def seq_block(ctx, zz, ci):
            ctx.enc_dc(ci, zz[0], cond_dc)
            ctx.enc_ac_band(zz, 1, 63, 0, cond_ac)

        walk_mcu(holder, seq_block, scans)
    else:
        # DC first @ Al=1 (interleaved)
        scans += sos_header(list(range(1, nc + 1)), 0, 0, 0, 1)
        holder = [_ArithJpegCtx(nc)]
        walk_mcu(
            holder,
            lambda ctx, zz, ci: ctx.enc_dc(ci, zz[0] >> 1, cond_dc), scans,
        )
        # AC first @ Al=1, one non-interleaved scan per component
        for ci in range(nc):
            scans += sos_header([ci + 1], 1, 63, 0, 1)
            ctx = _ArithJpegCtx(nc)
            for row in blocks[ci]:
                for zz in row:
                    ctx.enc_ac_band(zz, 1, 63, 1, cond_ac)
            scans += ctx.w.finish()
        # DC refine @ Ah=1, Al=0 (fixed-bin correction bits)
        scans += sos_header(list(range(1, nc + 1)), 0, 0, 1, 0)
        holder = [_ArithJpegCtx(nc)]
        walk_mcu(
            holder,
            lambda ctx, zz, ci: ctx.w.encode(ctx.fixed, 0, zz[0] & 1), scans,
        )
        # AC refine @ Ah=1, Al=0 per component
        for ci in range(nc):
            scans += sos_header([ci + 1], 1, 63, 1, 0)
            ctx = _ArithJpegCtx(nc)
            for row in blocks[ci]:
                for zz in row:
                    ctx.enc_ac_refine(zz, 1, 63, 0)
            scans += ctx.w.finish()

    head = bytearray(b"\xff\xd8")
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    head += (b"\xff\xca" if progressive else b"\xff\xc9") + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for ci, (sh, sv) in enumerate(samp):
        head += bytes([ci + 1, (sh << 4) | sv, 0])
    # DAC: DC table 0 conditioning (L | U<<4), AC table 0 Kx
    head += b"\xff\xcc" + struct.pack(">H", 6) + bytes(
        [0x00, (cond_dc[1] << 4) | cond_dc[0], 0x10, cond_ac]
    )
    if dri:
        head += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    return bytes(head) + bytes(scans) + b"\xff\xd9"


def test_jpeg_aritab_structural_invariants():
    from kql_engine_spark.multimodal import _JPEG_ARITAB

    assert _JPEG_ARITAB == _TEST_ARITAB  # test-side pin against edits
    assert len(_JPEG_ARITAB) == 114
    for idx, (qe, nmps, nlps, sw) in enumerate(_JPEG_ARITAB):
        assert 0 < qe <= 0x5B12
        assert 0 <= nmps < 114 and 0 <= nlps < 114
        # SWITCH only at states whose Qe is near 0.5 (MPS sense can flip
        # only where the LPS has become the more probable symbol)
        if sw:
            assert qe > 0x5000, (idx, hex(qe))
    # the fast-attack chain from state 0 strictly decreases Qe
    seen, i = set(), 1
    while i not in seen and i != _JPEG_ARITAB[i][1]:
        seen.add(i)
        assert _JPEG_ARITAB[_JPEG_ARITAB[i][1]][0] < _JPEG_ARITAB[i][0]
        i = _JPEG_ARITAB[i][1]
    # state 113 is the non-adapting equiprobable bin
    qe, nmps, nlps, sw = _JPEG_ARITAB[113]
    assert (nmps, nlps, sw) == (113, 113, 0)


def test_jpeg_arith_sequential_roundtrip():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(47)
    # constant gray, DC-only: exact
    g = np.full((16, 8), 136, dtype=np.uint8)
    got = _decode_jpeg(_jpeg_arith_bytes(g))
    assert got is not None and got.shape == (16, 8, 1) and np.all(got == 136)
    # random color 4:4:4, all-ones quant: only DCT rounding survives
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    got = _decode_jpeg(_jpeg_arith_bytes(img))
    assert got is not None and got.shape == (16, 16, 3)
    assert np.max(np.abs(got.astype(int) - img.astype(int))) <= 4
    # odd dims crop back
    odd = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    got = _decode_jpeg(_jpeg_arith_bytes(odd))
    assert got is not None and got.shape == (12, 10, 3)
    assert np.max(np.abs(got.astype(int) - odd.astype(int))) <= 4
    # 4:2:0 constant color survives subsample+upsample within +-1
    c420 = np.zeros((32, 16, 3), dtype=np.uint8)
    c420[..., 0], c420[..., 1], c420[..., 2] = 70, 120, 200
    got = _decode_jpeg(_jpeg_arith_bytes(c420, sampling=[(2, 2), (1, 1), (1, 1)]))
    assert got is not None and np.max(np.abs(got.astype(int) - c420.astype(int))) <= 1


def test_jpeg_arith_matches_huffman_pixels():
    # same source, same quantized coefficients -> the entropy layer must
    # be invisible: arithmetic and Huffman decodes are bit-identical
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(53)
    for shape in ((16, 16, 3), (24, 17, 3), (8, 8)):
        img = rng.integers(0, 256, size=shape).astype(np.uint8)
        ha = _decode_jpeg(_jpeg_bytes(img))
        ar = _decode_jpeg(_jpeg_arith_bytes(img))
        assert ha is not None and ar is not None
        assert np.array_equal(ha, ar)


def test_jpeg_arith_restart_and_conditioning():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(59)
    img = rng.integers(0, 256, size=(32, 16, 3), dtype=np.uint8)
    # restart markers reset coder, statistics, and DC contexts
    got = _decode_jpeg(_jpeg_arith_bytes(img, dri=2))
    ref = _decode_jpeg(_jpeg_bytes(img))
    assert got is not None and np.array_equal(got, ref)
    # non-default DAC conditioning must round-trip identically too
    got = _decode_jpeg(_jpeg_arith_bytes(img, cond_dc=(2, 4), cond_ac=13))
    assert got is not None and np.array_equal(got, ref)
    # smooth gradient: long EOB chains, low-activity statistics
    y, x = np.mgrid[0:40, 0:33]
    grad = ((y * 3 + x * 2) % 256).astype(np.uint8)
    got = _decode_jpeg(_jpeg_arith_bytes(grad))
    assert got is not None and got.shape == (40, 33, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - grad.astype(int))) <= 1


def test_jpeg_arith_progressive_roundtrip():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(61)
    img = rng.integers(0, 256, size=(24, 17, 3), dtype=np.uint8)
    got = _decode_jpeg(_jpeg_arith_bytes(img, progressive=True))
    ref = _decode_jpeg(_jpeg_bytes(img))
    # the SA ladder reconstructs the same coefficients as sequential
    assert got is not None and np.array_equal(got, ref)
    g = rng.integers(0, 256, size=(23, 9), dtype=np.uint8)
    got = _decode_jpeg(_jpeg_arith_bytes(g, progressive=True))
    assert got is not None and got.shape == (23, 9, 1)
    assert np.max(np.abs(got[..., 0].astype(int) - g.astype(int))) <= 1


# ------------------------------------------------------------------ FLAC
# Minimal FLAC ENCODER for tests — independent bit writer, CRC-8/CRC-16,
# Rice coder, and frame assembly written against the published format
# (RFC 9639), sharing nothing with the decoder but the spec constants.
# Strategies cover constant / verbatim / fixed / LPC subframes, wasted
# bits, and all three stereo decorrelation modes.


class _FlacW:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def w(self, v, bits):
        v &= (1 << bits) - 1
        for i in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self):
        while self.n:
            self.w(0, 1)


def _tcrc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _tcrc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _rice_write(w, residuals, param):
    for r in residuals:
        u = (r << 1) if r >= 0 else ((-r) << 1) - 1
        q = u >> param
        for _ in range(q):
            w.w(0, 1)
        w.w(1, 1)
        w.w(u & ((1 << param) - 1), param)


def _flac_subframe_write(w, samples, bps, kind, wasted=0):
    w.w(0, 1)  # padding
    if wasted:
        assert all(s % (1 << wasted) == 0 for s in samples)
        samples = [s >> wasted for s in samples]
        bps -= wasted
    if kind == "constant":
        assert len(set(samples)) == 1
        w.w(0, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(1, wasted)  # unary: (wasted-1) zeros then a 1
        w.w(samples[0], bps)
        return
    if kind == "verbatim":
        w.w(1, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(1, wasted)
        for s in samples:
            w.w(s, bps)
        return
    if kind == "fixed2":
        order, coefs = 2, [2, -1]
        w.w(8 + order, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(1, wasted)
        for s in samples[:order]:
            w.w(s, bps)
        res = [
            samples[i] - sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(samples))
        ]
        w.w(0, 2)  # rice method 0
        w.w(0, 4)  # partition order 0
        param = 6
        w.w(param, 4)
        _rice_write(w, res, param)
        return
    if kind == "lpc2":
        order, shift, qc = 2, 5, [58, -27]  # ~ mild second-order predictor
        w.w(32 + order - 1, 6)
        w.w(1 if wasted else 0, 1)
        if wasted:
            w.w(1, wasted)
        for s in samples[:order]:
            w.w(s, bps)
        prec = 12
        w.w(prec - 1, 4)
        w.w(shift, 5)
        for c in qc:
            w.w(c, prec)
        res = [
            samples[i]
            - ((sum(c * samples[i - 1 - j] for j, c in enumerate(qc))) >> shift)
            for i in range(order, len(samples))
        ]
        w.w(0, 2)
        w.w(2, 4)  # partition order 2: exercises multi-partition path
        nparts = 4
        base = len(samples) // nparts
        idx = 0
        for p in range(nparts):
            cnt = base - (order if p == 0 else 0)
            chunk = res[idx : idx + cnt]
            idx += cnt
            if p == 1:
                w.w(15, 4)  # escape partition: raw 17-bit residuals
                w.w(17, 5)
                for r in chunk:
                    w.w(r, 17)
            else:
                w.w(8, 4)
                _rice_write(w, chunk, 8)
        return
    raise AssertionError(kind)


def _flac_bytes(rate, chans, bps=16, block=None, kind="verbatim", stereo=None,
                wasted=0, corrupt_crc=False):
    """Encode channel sample lists as a FLAC stream. `stereo` in
    {None, 'left', 'right', 'mid'} applies decorrelation to 2 channels."""
    n = len(chans[0])
    block = block or n
    nch = len(chans)
    info = _FlacW()
    info.w(block, 16)
    info.w(block, 16)
    info.w(0, 24)
    info.w(0, 24)
    info.w(rate, 20)
    info.w(nch - 1, 3)
    info.w(bps - 1, 5)
    info.w(n, 36)
    info.buf.extend(b"\x00" * 16)  # md5 unset
    out = bytearray(b"fLaC")
    out.append(0x80)  # last block, STREAMINFO
    out.extend(len(info.buf).to_bytes(3, "big"))
    out.extend(info.buf)
    frame_no = 0
    for start in range(0, n, block):
        seg = [c[start : start + block] for c in chans]
        bs = len(seg[0])
        w = _FlacW()
        w.w(0x3FFE, 14)
        w.w(0, 1)
        w.w(0, 1)  # fixed blocking
        w.w(7, 4)  # 16-bit uncommon block size (always explicit)
        w.w(0, 4)  # rate from STREAMINFO
        if stereo is None:
            w.w(nch - 1, 4)
        else:
            w.w({"left": 8, "right": 9, "mid": 10}[stereo], 4)
        w.w({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        w.w(0, 1)
        assert frame_no < 0x80
        w.w(frame_no, 8)
        frame_no += 1
        w.w(bs - 1, 16)
        w.w(_tcrc8(w.buf), 8)
        if stereo is None:
            for c in seg:
                _flac_subframe_write(w, c, bps, kind, wasted)
        else:
            l, r = seg
            side = [a - b for a, b in zip(l, r)]
            if stereo == "left":
                _flac_subframe_write(w, l, bps, kind, wasted)
                _flac_subframe_write(w, side, bps + 1, kind)
            elif stereo == "right":
                _flac_subframe_write(w, side, bps + 1, kind)
                _flac_subframe_write(w, r, bps, kind, wasted)
            else:
                mid = [(a + b) >> 1 for a, b in zip(l, r)]
                _flac_subframe_write(w, mid, bps, kind, wasted)
                _flac_subframe_write(w, side, bps + 1, kind)
        w.align()
        crc = _tcrc16(w.buf)
        if corrupt_crc:
            crc ^= 1
        w.w(crc, 16)
        out.extend(w.buf)
    return bytes(out)


def _expected_features(rate, chans, bps=16):
    import numpy as np

    a = np.asarray(chans, dtype=np.float64) / float(1 << (bps - 1))
    return round(len(chans[0]) / rate, 6), rate, round(float(np.sqrt(np.mean(a * a))), 6)


def test_flac_verbatim_matches_wav():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_flac, _decode_wav

    t = np.arange(4000)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 16384).astype(np.int64)
    got = _decode_flac(_flac_bytes(16000, [list(sine)], block=1000))
    assert got == _decode_wav(_wav_bytes(16000, sine.astype("<i2")))


def test_flac_fixed_and_lpc_roundtrip_exact():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_flac

    rng = np.random.default_rng(7)
    # smooth ramp + noise: small fixed/LPC residuals, but correctness is
    # exact regardless of how well the predictor fits
    x = (np.cumsum(rng.integers(-50, 51, 4096)) + 1000).astype(np.int64)
    x = np.clip(x, -32768, 32767)
    samples = list(x)
    want = _expected_features(22050, [samples])
    assert _decode_flac(_flac_bytes(22050, [samples], block=1024, kind="fixed2")) == want
    assert _decode_flac(_flac_bytes(22050, [samples], block=1024, kind="lpc2")) == want


def test_flac_stereo_decorrelation_modes():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_flac

    rng = np.random.default_rng(9)
    l = list(rng.integers(-3000, 3000, 2048).astype(np.int64))
    r = list((np.asarray(l) + rng.integers(-40, 40, 2048)).astype(np.int64))
    want = _expected_features(8000, [l, r])
    for mode in (None, "left", "right", "mid"):
        got = _decode_flac(_flac_bytes(8000, [l, r], block=512, stereo=mode))
        assert got == want, mode


def test_flac_constant_wasted_bits_and_crc_guard():
    from kql_engine_spark.multimodal import _decode_flac

    silence = [0] * 1024
    d, rate, rms = _decode_flac(_flac_bytes(44100, [silence], kind="constant"))
    assert (d, rate, rms) == (round(1024 / 44100, 6), 44100, 0.0)
    # wasted bits: every sample divisible by 4 -> 2 wasted bits
    vals = [((i % 37) - 18) * 4 for i in range(1024)]
    want = _expected_features(44100, [vals])
    assert _decode_flac(_flac_bytes(44100, [vals], wasted=2)) == want
    # corrupt CRC-16 must fail closed (None), not return wrong numbers
    assert _decode_flac(_flac_bytes(44100, [vals], corrupt_crc=True)) is None


def test_flac_through_audio_features(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import audio_features, load_binary_dir

    t = np.arange(16000)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 16384).astype(np.int64)
    d = tmp_path_factory.mktemp("flac_media")
    (d / "tone.flac").write_bytes(_flac_bytes(16000, [list(sine)], block=4096))
    (d / "clip.mp3").write_bytes(b"\xff\xfbnot really audio")
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in audio_features(load_binary_dir(spark, str(d))).collect()
    }
    tone = rows["tone.flac"]
    assert tone.sample_rate == 16000 and tone.duration_sec == 1.0
    assert abs(tone.rms - 0.3536) < 0.002
    assert rows["clip.mp3"].sample_rate is None


# ------------------------------------------------------------------- MP3
# Synthetic MPEG-audio frame sequences: headers built bit-by-bit from the
# published ISO 11172-3 layout, zero-filled payloads. The walk must
# recover exact duration/rate, skip ID3v2, tolerate ID3v1, and fail
# closed on truncation, rate drift, or free-format frames.


def _mp3_header(version, layer, brx, srx, pad=0):
    b1 = 0xE0 | (version << 3) | ((4 - layer) << 1) | 1
    b2 = (brx << 4) | (srx << 2) | (pad << 1)
    return bytes([0xFF, b1, b2, 0xC0])


def _mp3_frames(version, layer, brx, srx, n, kbps_table_rate, pads=None):
    out = bytearray()
    pads = pads or [0] * n
    for i in range(n):
        hdr = _mp3_header(version, layer, brx, srx, pads[i])
        rate, kbps = kbps_table_rate
        if layer == 1:
            ln = (12 * kbps * 1000 // rate + pads[i]) * 4
        else:
            spf = 1152 if (version == 3 or layer == 2) else 576
            ln = spf // 8 * kbps * 1000 // rate + pads[i]
        out += hdr + b"\x00" * (ln - 4)
    return bytes(out)


def test_mp3_frame_walk_exact_duration():
    from kql_engine_spark.multimodal import _decode_mp3

    # MPEG1 Layer III, 44.1 kHz, 128 kbps, 10 frames
    p = _mp3_frames(3, 3, 9, 0, 10, (44100, 128))
    assert _decode_mp3(p) == (round(10 * 1152 / 44100, 6), 44100, None)
    # MPEG2.5 Layer III, 8 kHz, 64 kbps -> 576 samples/frame
    p = _mp3_frames(0, 3, 8, 2, 5, (8000, 64))
    assert _decode_mp3(p) == (round(5 * 576 / 8000, 6), 8000, None)
    # MPEG1 Layer I, 32 kHz, 32 kbps -> 384 samples/frame, 48-byte frames
    p = _mp3_frames(3, 1, 1, 2, 8, (32000, 32))
    assert _decode_mp3(p) == (round(8 * 384 / 32000, 6), 32000, None)
    # padding bit lengthens frames without changing the duration
    p = _mp3_frames(3, 3, 9, 0, 6, (44100, 128), pads=[0, 1, 0, 1, 1, 0])
    assert _decode_mp3(p) == (round(6 * 1152 / 44100, 6), 44100, None)


def test_mp3_tags_and_fail_closed():
    from kql_engine_spark.multimodal import _decode_mp3

    body = _mp3_frames(3, 3, 9, 0, 4, (44100, 128))
    id3v2 = b"ID3\x04\x00\x00" + bytes([0, 0, 0x02, 0x01]) + b"\x00" * (0x101)
    id3v1 = b"TAG" + b"\x00" * 125
    assert _decode_mp3(id3v2 + body + id3v1) == (
        round(4 * 1152 / 44100, 6), 44100, None,
    )
    assert _decode_mp3(body[:-10]) is None          # truncated final frame
    assert _decode_mp3(body[: 417]) is None         # single frame: not enough
    drift = body + _mp3_frames(3, 3, 9, 1, 2, (48000, 128))
    assert _decode_mp3(drift) is None               # mid-stream rate change
    free = bytearray(body)
    free[2] = (0 << 4) | (0 << 2)                   # free-format bitrate
    assert _decode_mp3(bytes(free)) is None


def test_mp3_through_audio_features(spark, tmp_path_factory):
    from kql_engine_spark.multimodal import audio_features, load_binary_dir

    d = tmp_path_factory.mktemp("mp3_media")
    (d / "song.mp3").write_bytes(_mp3_frames(3, 3, 9, 0, 40, (44100, 128)))
    rows = {
        r.path.rsplit("/", 1)[-1]: r
        for r in audio_features(load_binary_dir(spark, str(d))).collect()
    }
    song = rows["song.mp3"]
    assert song.sample_rate == 44100
    assert song.duration_sec == round(40 * 1152 / 44100, 6)
    assert song.rms is None


# ----------------------------------------------------- 12-bit + lossless JPEG
# Independent test encoders for extended sequential 12-bit (reusing
# _jpeg_bytes with prec=12) and lossless SOF3 (T.81 Annex H): flat
# canonical Huffman tables over SSSS 0..16, predictors 1-7, point
# transform, modulo-2^16 differences.


def _jpeg_lossless_bytes(img, predictor=1, prec=8, pt=0):
    import struct

    import numpy as np

    h, w = img.shape[:2]
    nc = 1 if img.ndim == 2 else img.shape[2]
    planes = [
        (img.reshape(h, w, nc)[..., c].astype(np.int64) >> pt) for c in range(nc)
    ]
    vals17 = list(range(17))
    bits = [0] * 16
    bits[4] = 17  # seventeen flat 5-bit codes

    def canon(bits_, vals_):
        m, code, i = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits_[ln - 1]):
                m[vals_[i]] = (ln, code)
                code += 1
                i += 1
            code <<= 1
        return m

    cmap = canon(bits, vals17)
    out = bytearray()
    st = {"b": 0, "n": 0}

    def put(v, n):
        for i in range(n - 1, -1, -1):
            st["b"] = (st["b"] << 1) | ((v >> i) & 1)
            st["n"] += 1
            if st["n"] == 8:
                out.append(st["b"])
                if st["b"] == 0xFF:
                    out.append(0)
                st["b"], st["n"] = 0, 0

    default = 1 << (prec - pt - 1)
    for y in range(h):
        for x in range(w):
            for p in planes:
                if y == 0:
                    px = default if x == 0 else int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    a, b, c = int(p[y, x - 1]), int(p[y - 1, x]), int(p[y - 1, x - 1])
                    px = {
                        1: a, 2: b, 3: c, 4: a + b - c,
                        5: a + ((b - c) >> 1), 6: b + ((a - c) >> 1),
                        7: (a + b) >> 1,
                    }[predictor]
                d = ((int(p[y, x]) - px + 32768) & 0xFFFF) - 32768
                if d == -32768:
                    ln, code = cmap[16]
                    put(code, ln)  # SSSS 16: no extra bits
                    continue
                s = abs(d).bit_length()
                ln, code = cmap[s]
                put(code, ln)
                if s:
                    put(d if d >= 0 else d + (1 << s) - 1, s)
    while st["n"]:
        put(1, 1)
    head = bytearray(b"\xff\xd8")
    head += b"\xff\xc3" + struct.pack(">HBHHB", 8 + 3 * nc, prec, h, w, nc)
    for ci in range(nc):
        head += bytes([ci + 1, 0x11, 0])
    head += b"\xff\xc4" + struct.pack(">HB", 19 + 17, 0x00) + bytes(bits + vals17)
    head += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        head += bytes([ci + 1, 0x00])
    head += bytes([predictor, 0, pt])
    return bytes(head) + bytes(out) + b"\xff\xd9"


def test_jpeg_lossless_exact_all_predictors():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (13, 9), dtype=np.int64)
    for pred in range(1, 8):
        got = _decode_jpeg(_jpeg_lossless_bytes(img, predictor=pred))
        assert got is not None and got.shape == (13, 9, 1), pred
        assert (got[..., 0].astype(np.int64) == img).all(), pred


def test_jpeg_lossless_rgb_and_16bit_and_pt():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 256, (7, 11, 3), dtype=np.int64)
    got = _decode_jpeg(_jpeg_lossless_bytes(rgb, predictor=4))
    # lossless carries no color transform: planes come back verbatim
    assert (got.astype(np.int64) == rgb).all()

    deep = rng.integers(0, 65536, (9, 6), dtype=np.int64)
    got = _decode_jpeg(_jpeg_lossless_bytes(deep, predictor=7, prec=16))
    want = np.clip(np.rint(deep / 256.0), 0, 255).astype(np.uint8)
    assert (got[..., 0] == want).all()

    # point transform Pt=2: decoder returns (v >> 2) << 2
    img = rng.integers(0, 256, (8, 8), dtype=np.int64)
    got = _decode_jpeg(_jpeg_lossless_bytes(img, predictor=2, pt=2))
    assert (got[..., 0].astype(np.int64) == (img >> 2) << 2).all()


def test_jpeg_12bit_extended_sequential():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_jpeg

    # constant 12-bit image: DC-only blocks decode exactly, then >>4
    flat = np.full((16, 16), 3000, dtype=np.int64)
    got = _decode_jpeg(_jpeg_bytes(flat, prec=12))
    assert got is not None and got.shape == (16, 16, 1)
    assert (got[..., 0] == round(3000 / 16)).all()

    # random 12-bit data: within DCT rounding after the 12->8 scale-down
    rng = np.random.default_rng(8)
    img = rng.integers(0, 4096, (24, 17), dtype=np.int64)
    got = _decode_jpeg(_jpeg_bytes(img, prec=12))
    want = img.astype(np.float64) / 16.0
    assert np.max(np.abs(got[..., 0].astype(np.float64) - want)) <= 1.5


# ------------------------------------------------------------------- AVI
# Minimal AVI WRITER for tests: RIFF/hdrl/strl/movi layout with MJPEG
# ('00dc', payloads from the independent test JPEG encoder) or
# uncompressed bottom-up DIB ('00db') frames.


def _avi_bytes(frames_rgb, fps_scale_rate=(1, 10), codec="mjpeg",
               with_audio_chunks=False):
    import struct

    import numpy as np

    h, w = frames_rgb[0].shape[:2]
    scale, rate = fps_scale_rate

    def chunk(fcc, body):
        return fcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<IIIIIIIIII", int(scale / rate * 1e6), 0, 0, 0,
                       len(frames_rgb), 0, 1, 0, w, h) + b"\x00" * 16
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIII", 0, 0, 0, 0, scale,
                                            rate, 0, len(frames_rgb))
            + b"\x00" * 16)
    bmih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, w * h * 3, 0, 0, 0, 0)
    movi = b"movi"
    for i, f in enumerate(frames_rgb):
        if with_audio_chunks:
            movi += chunk(b"01wb", b"\x00" * 33)  # interleaved audio: skipped
        if codec == "mjpeg":
            movi += chunk(b"00dc", _jpeg_bytes(f))
        else:
            row_bytes = (w * 3 + 3) & ~3
            bits = b""
            for y in range(h - 1, -1, -1):  # bottom-up BGR
                row = bytes(int(v) for px in f[y] for v in (px[2], px[1], px[0]))
                bits += row + b"\x00" * (row_bytes - len(row))
            movi += chunk(b"00db", bits)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bmih)))
    riff_body = b"AVI " + hdrl + lst(b"movi", movi[4:])
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def test_avi_dib_frames_exact():
    import numpy as np

    from kql_engine_spark.multimodal import _avi_frames, _decode_payload

    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8) for _ in range(4)]
    payload = _avi_bytes(frames, codec="dib", fps_scale_rate=(1, 4))
    got = _avi_frames(payload)
    assert got is not None and len(got) == 4
    for (delay, img), want in zip(got, frames):
        assert abs(delay - 25.0) < 1e-9  # 4 fps -> 25 centisec
        assert (img == want).all()
    # decode_image path sees the first frame
    first = _decode_payload(payload)
    assert (first == frames[0]).all()


def test_avi_mjpeg_frames_and_audio_interleave():
    import numpy as np

    from kql_engine_spark.multimodal import _avi_frames

    base = np.zeros((16, 16, 3), dtype=np.uint8)
    frames = [np.clip(base + 40 * i, 0, 255).astype(np.uint8) for i in range(5)]
    payload = _avi_bytes(frames, codec="mjpeg", with_audio_chunks=True)
    got = _avi_frames(payload)
    assert got is not None and len(got) == 5
    for (_, img), want in zip(got, frames):
        # constant-color MJPEG decodes exactly (DC-only blocks)
        assert (img == want).all()
    assert _avi_frames(payload[: len(payload) // 2]) is None  # truncated


def test_avi_through_sample_frames(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import load_binary_dir, sample_frames

    rng = np.random.default_rng(14)
    frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(6)]
    d = tmp_path_factory.mktemp("avi_media")
    (d / "clip.avi").write_bytes(_avi_bytes(frames, codec="dib", fps_scale_rate=(1, 2)))
    (d / "noise.mp4").write_bytes(b"\x00\x00\x00 ftypisom not supported")
    out = sample_frames(load_binary_dir(spark, str(d)), n_frames=3).collect()
    assert all(r.path.endswith("clip.avi") for r in out)
    assert sorted(r.frame_idx for r in out) == [0, 2, 5]  # evenly spaced over 6
    ts = {r.frame_idx: r.ts_sec for r in out}
    assert ts[0] == 0.0 and ts[2] == 1.0 and ts[5] == 2.5  # 2 fps timing
    for r in out:
        assert bytes(r.frame).startswith(b"P6\n8 8\n255\n")


# ------------------------------------------------------------- MP4 / MOV
# Independent ISO BMFF muxer (box grammar + QuickTime sample tables
# written from the spec, not from the decoder under test).


def _mp4_box(typ, body):
    import struct

    return struct.pack(">I", len(body) + 8) + typ + body


def _mp4_full(typ, version, body):
    import struct

    return _mp4_box(typ, struct.pack(">B3x", version) + body)


def _mp4_sample_tables(sizes, deltas, offsets_of, per_chunk, co64=False):
    """stsd is supplied by the caller; build stts/stsc/stsz/stco|co64."""
    import struct

    runs = []
    for d in deltas:
        if runs and runs[-1][1] == d:
            runs[-1][0] += 1
        else:
            runs.append([1, d])
    stts = _mp4_full(
        b"stts", 0,
        struct.pack(">I", len(runs))
        + b"".join(struct.pack(">II", n, d) for n, d in runs),
    )
    n_chunks = (len(sizes) + per_chunk - 1) // per_chunk
    stsc = _mp4_full(b"stsc", 0, struct.pack(">IIII", 1, 1, per_chunk, 1))
    fixed = sizes[0] if len(set(sizes)) == 1 else 0
    if fixed:
        stsz = _mp4_full(b"stsz", 0, struct.pack(">II", fixed, len(sizes)))
    else:
        stsz = _mp4_full(
            b"stsz", 0,
            struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
    fmt, typ = (">Q", b"co64") if co64 else (">I", b"stco")
    stco = _mp4_full(
        typ, 0,
        __import__("struct").pack(">I", n_chunks)
        + b"".join(__import__("struct").pack(fmt, offsets_of(c)) for c in range(n_chunks)),
    )
    return stts + stsc + stsz + stco


def _mp4_bytes(video_frames=None, fps=10, pcm=None, rate=8000,
               audio_codec=b"sowt", per_chunk=2, co64=False, version1=False):
    """Minimal but spec-shaped MP4/MOV: ftyp + mdat + moov with a 'jpeg'
    video track and/or a PCM audio track. Samples grouped per_chunk to
    exercise the stsc walk; mdat precedes moov so stco holds real file
    offsets."""
    import struct

    import numpy as np

    ftyp = _mp4_box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomqt  ")
    mdat_payload = b""
    v_sizes, v_offs, a_sizes, a_offs = [], [], [], []
    base = len(ftyp) + 8
    if video_frames is not None:
        for f in video_frames:
            jb = _jpeg_bytes(f)
            v_offs.append(base + len(mdat_payload))
            v_sizes.append(len(jb))
            mdat_payload += jb
    if pcm is not None:
        if audio_codec == b"sowt":
            raw = np.asarray(pcm, dtype="<i2").tobytes()
            bps = 2
        elif audio_codec == b"twos":
            raw = np.asarray(pcm, dtype=">i2").tobytes()
            bps = 2
        elif audio_codec == b"raw ":
            raw = np.asarray(pcm, dtype="u1").tobytes()
            bps = 1
        else:  # opaque codec payload (e.g. fake AAC): one blob sample
            raw = bytes(pcm)
            bps = len(raw)
        for i in range(0, len(raw), bps):
            a_offs.append(base + len(mdat_payload) + i)
            a_sizes.append(bps)
        mdat_payload += raw
    mdat = _mp4_box(b"mdat", mdat_payload)

    mv_ts = 1000
    tracks = b""
    if video_frames is not None:
        h, w = video_frames[0].shape[:2]
        ts = fps * 100
        entry = (
            struct.pack(">I", 86) + b"jpeg" + b"\x00" * 6 + struct.pack(">H", 1)
            + b"\x00" * 16 + struct.pack(">HH", w, h)
            + struct.pack(">II", 0x00480000, 0x00480000) + b"\x00" * 4
            + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
        )
        stsd = _mp4_full(b"stsd", 0, struct.pack(">I", 1) + entry)
        n = len(video_frames)
        if version1:
            mdhd = _mp4_full(b"mdhd", 1, struct.pack(">QQIQHH", 0, 0, ts, 100 * n, 0x55C4, 0))
        else:
            mdhd = _mp4_full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, ts, 100 * n, 0x55C4, 0))
        hdlr = _mp4_full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"v\x00")
        tabs = _mp4_sample_tables(
            v_sizes, [100] * n, lambda c: v_offs[c * per_chunk], per_chunk, co64
        )
        stbl = _mp4_box(b"stbl", stsd + tabs)
        minf = _mp4_box(b"minf", _mp4_full(b"vmhd", 0, b"\x00" * 8) + stbl)
        tkhd = _mp4_full(b"tkhd", 0, b"\x00" * 76 + struct.pack(">II", w << 16, h << 16))
        trak = _mp4_box(b"trak", tkhd + _mp4_box(b"mdia", mdhd + hdlr + minf))
        tracks += trak
    if pcm is not None:
        entry = (
            struct.pack(">I", 36) + audio_codec + b"\x00" * 6 + struct.pack(">H", 1)
            + struct.pack(">HH4x", 0, 0)
            + struct.pack(">HHHH", 1, 8 * (a_sizes[0] if audio_codec != b"mp4a" else 2), 0, 0)
            + struct.pack(">I", rate << 16)
        )
        stsd = _mp4_full(b"stsd", 0, struct.pack(">I", 1) + entry)
        n = len(a_sizes)
        mdhd = _mp4_full(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, rate, n, 0x55C4, 0))
        hdlr = _mp4_full(b"hdlr", 0, b"\x00" * 4 + b"soun" + b"\x00" * 12 + b"s\x00")
        tabs = _mp4_sample_tables(
            a_sizes, [1] * n, lambda c: a_offs[c * per_chunk], per_chunk, co64
        )
        stbl = _mp4_box(b"stbl", stsd + tabs)
        minf = _mp4_box(b"minf", _mp4_full(b"smhd", 0, b"\x00" * 4) + stbl)
        tkhd = _mp4_full(b"tkhd", 0, b"\x00" * 84)
        tracks += _mp4_box(b"trak", tkhd + _mp4_box(b"mdia", mdhd + hdlr + minf))
    mvhd = _mp4_full(b"mvhd", 0, struct.pack(">IIII", 0, 0, mv_ts, 0) + b"\x00" * 80)
    return ftyp + mdat + _mp4_box(b"moov", mvhd + tracks)


def test_mp4_jpeg_frames_exact():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_payload, _mp4_frames

    base = np.zeros((16, 16, 3), dtype=np.uint8)
    frames = [np.clip(base + 50 * i, 0, 255).astype(np.uint8) for i in range(5)]
    payload = _mp4_bytes(video_frames=frames, fps=4, per_chunk=2)
    got = _mp4_frames(payload)
    assert got is not None and len(got) == 5
    for (delay, img), want in zip(got, frames):
        assert abs(delay - 25.0) < 1e-9  # 4 fps -> 25 centisec
        assert (img == want).all()  # constant-color MJPEG is exact
    assert (_decode_payload(payload) == frames[0]).all()
    # structural damage fails closed, never raises out of the guard
    assert _mp4_frames(payload[: len(payload) // 3]) is None
    from kql_engine_spark.multimodal import _mp4_tracks

    import pytest as _pytest

    with _pytest.raises(ValueError):
        _mp4_tracks(payload[: len(payload) - 30])  # moov truncated
    assert _decode_payload(payload[: len(payload) - 30]) is None


def test_mp4_co64_and_version1_mdhd():
    import numpy as np

    from kql_engine_spark.multimodal import _mp4_frames

    rng = np.random.default_rng(21)
    frames = [np.full((8, 8, 3), 90, dtype=np.uint8) for _ in range(3)]
    payload = _mp4_bytes(video_frames=frames, fps=2, co64=True, version1=True)
    got = _mp4_frames(payload)
    assert got is not None and len(got) == 3
    assert all(abs(d - 50.0) < 1e-9 for d, _ in got)
    assert all((img == 90).all() for _, img in got)


def test_mp4_audio_pcm_rms_exact():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_mp4_audio

    t = np.arange(800)
    sine = (10000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int64)
    for codec in (b"sowt", b"twos"):
        payload = _mp4_bytes(pcm=sine, rate=8000, audio_codec=codec, per_chunk=256)
        dur, rate, rms = _decode_mp4_audio(payload)
        assert dur == 0.1 and rate == 8000
        want = float(np.sqrt(np.mean((sine / 32768.0) ** 2)))
        assert abs(rms - want) < 1e-6
    # u8 offset-binary
    u8 = ((sine / 256) + 128).astype(np.uint8)
    dur, rate, rms = _decode_mp4_audio(
        _mp4_bytes(pcm=u8, rate=8000, audio_codec=b"raw ", per_chunk=100)
    )
    want = float(np.sqrt(np.mean(((u8.astype(np.float64) - 128) / 128) ** 2)))
    assert dur == 0.1 and abs(rms - want) < 1e-6
    # gated codec: exact container metadata, null RMS
    dur, rate, rms = _decode_mp4_audio(
        _mp4_bytes(pcm=b"\x01\x02\x03\x04", rate=44100, audio_codec=b"mp4a", per_chunk=1)
    )
    assert rate == 44100 and rms is None and dur > 0


def test_mp4_through_spark_surface(spark, tmp_path_factory):
    import numpy as np

    from kql_engine_spark.multimodal import (
        audio_features,
        load_binary_dir,
        sample_frames,
    )

    frames = [np.full((8, 8, 3), 30 * i, dtype=np.uint8) for i in range(6)]
    sine = (20000 * np.sin(np.arange(1600) / 3.0)).astype(np.int64)
    d = tmp_path_factory.mktemp("mp4_media")
    (d / "clip.mp4").write_bytes(_mp4_bytes(video_frames=frames, fps=2))
    (d / "tone.m4a").write_bytes(_mp4_bytes(pcm=sine, rate=16000, per_chunk=512))
    df = load_binary_dir(spark, str(d))
    out = sample_frames(df, n_frames=3).collect()
    assert all(r.path.endswith("clip.mp4") for r in out)
    assert sorted(r.frame_idx for r in out) == [0, 2, 5]
    ts = {r.frame_idx: r.ts_sec for r in out}
    assert ts[0] == 0.0 and ts[2] == 1.0 and ts[5] == 2.5
    au = {r.path.rsplit("/", 1)[-1]: r for r in audio_features(df).collect()}
    assert au["tone.m4a"].duration_sec == 0.1 and au["tone.m4a"].sample_rate == 16000
    want = float(np.sqrt(np.mean((sine / 32768.0) ** 2)))
    assert abs(au["tone.m4a"].rms - want) < 1e-6
    assert au["clip.mp4"].duration_sec is None  # no audio track


# ------------------------------------------------- PNG extended pixel tiers
# Independent encoder covering depth 1/2/4/8/16, palette, and Adam7 —
# written from the PNG spec (bit packing MSB-first, byte-level filters
# with bpp left-distance, pass-ordered interlace scanlines).

_PNG_ADAM7_T = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_bytes_ext(samples, depth, ctype, palette=None, interlace=0, filters=(0,)):
    """samples: (h, w, nch) ints at the target depth (palette: indices)."""
    import struct
    import zlib

    import numpy as np

    h, w, nch = samples.shape
    bpp = max(1, nch * depth // 8)

    def pack_rows(sub):
        sh, sw, _ = sub.shape
        rows = []
        for y in range(sh):
            if depth == 8:
                rows.append(sub[y].reshape(-1).astype(np.uint8).tobytes())
            elif depth == 16:
                rows.append(sub[y].reshape(-1).astype(">u2").tobytes())
            else:
                bits = []
                for v in sub[y].reshape(-1):
                    bits.extend(int(v) >> (depth - 1 - i) & 1 for i in range(depth))
                while len(bits) % 8:
                    bits.append(0)
                rows.append(np.packbits(np.array(bits, dtype=np.uint8)).tobytes())
        return rows

    def filter_rows(rows):
        out = b""
        prior = bytes(len(rows[0])) if rows else b""
        for y, rb in enumerate(rows):
            ft = filters[y % len(filters)]
            cur = np.frombuffer(rb, dtype=np.uint8).astype(np.int32)
            pri = np.frombuffer(prior, dtype=np.uint8).astype(np.int32)
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if len(cur) > bpp else np.zeros_like(cur)
            ul = np.concatenate([np.zeros(bpp, np.int32), pri[:-bpp]]) if len(pri) > bpp else np.zeros_like(pri)
            if ft == 0:
                enc = cur
            elif ft == 1:
                enc = (cur - left) % 256
            elif ft == 2:
                enc = (cur - pri) % 256
            elif ft == 3:
                enc = (cur - (left + pri) // 2) % 256
            else:
                enc = np.empty_like(cur)
                for x in range(len(cur)):
                    p = int(left[x]) + int(pri[x]) - int(ul[x])
                    pa, pb, pc = abs(p - left[x]), abs(p - pri[x]), abs(p - ul[x])
                    pr = left[x] if pa <= pb and pa <= pc else (pri[x] if pb <= pc else ul[x])
                    enc[x] = (cur[x] - pr) % 256
            out += bytes([ft]) + bytes(enc.astype(np.uint8))
            prior = rb
        return out

    if interlace:
        raw = b""
        for x0, y0, dx, dy in _PNG_ADAM7_T:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += filter_rows(pack_rows(sub))
    else:
        raw = filter_rows(pack_rows(samples))

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    png = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    )
    if palette is not None:
        png += chunk(b"PLTE", bytes(np.asarray(palette, dtype=np.uint8).reshape(-1)))
    # split the stream over two IDATs to pin multi-IDAT reassembly
    z = zlib.compress(raw)
    png += chunk(b"IDAT", z[: len(z) // 2]) + chunk(b"IDAT", z[len(z) // 2 :])
    return png + chunk(b"IEND", b"")


def test_png_palette_roundtrip():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_png

    rng = np.random.default_rng(31)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 7, 1))
    for depth in (4, 8):
        got = _decode_png(_png_bytes_ext(idx, depth, 3, palette=pal, filters=(0, 1, 2)))
        assert got.shape == (9, 7, 3)
        assert (got == pal[idx[:, :, 0]]).all()
    # out-of-range palette index fails closed
    bad = _png_bytes_ext(np.full((2, 2, 1), 9), 8, 3, palette=pal[:4])
    assert _decode_png(bad) is None


def test_png_16bit_high_byte_contract():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_png

    rng = np.random.default_rng(32)
    img = rng.integers(0, 65536, (6, 5, 3))
    got = _decode_png(_png_bytes_ext(img, 16, 2, filters=(2, 4, 3, 1)))
    assert (got == (img >> 8).astype(np.uint8)).all()
    gray = rng.integers(0, 65536, (4, 4, 1))
    got = _decode_png(_png_bytes_ext(gray, 16, 0))
    assert (got == (gray >> 8).astype(np.uint8)).all()


def test_png_low_depth_gray_scaling():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_png

    rng = np.random.default_rng(33)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        img = rng.integers(0, mx + 1, (5, 11, 1))  # odd width: partial final byte
        got = _decode_png(_png_bytes_ext(img, depth, 0, filters=(0, 2)))
        assert got.shape == (5, 11, 1)
        assert (got == (img * (255 // mx)).astype(np.uint8)).all()


def test_png_adam7_equals_noninterlaced():
    import numpy as np

    from kql_engine_spark.multimodal import _decode_png

    rng = np.random.default_rng(34)
    # sizes chosen to exercise empty and single-pixel interlace passes
    for h, w in ((1, 1), (2, 3), (5, 5), (8, 8), (9, 13), (16, 4)):
        img = rng.integers(0, 256, (h, w, 3))
        plain = _decode_png(_png_bytes_ext(img, 8, 2, interlace=0, filters=(0, 1, 2, 3, 4)))
        inter = _decode_png(_png_bytes_ext(img, 8, 2, interlace=1, filters=(4, 3, 2, 1, 0)))
        assert (plain == img).all()
        assert (inter == img).all()
    # interlaced palette + 16-bit tiers too
    pal = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    idx = rng.integers(0, 8, (9, 9, 1))
    got = _decode_png(_png_bytes_ext(idx, 4, 3, palette=pal, interlace=1))
    assert (got == pal[idx[:, :, 0]]).all()
    img16 = rng.integers(0, 65536, (7, 6, 4))
    got = _decode_png(_png_bytes_ext(img16, 16, 6, interlace=1, filters=(1, 2)))
    assert (got == (img16 >> 8).astype(np.uint8)).all()
