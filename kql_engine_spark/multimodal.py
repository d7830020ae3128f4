"""Multimodal column support (SURVEY.md §2.12 last row).

Image/audio/video payloads are opaque `binary` columns with typed metadata —
the Spark-side plumbing (schemas, binaryFile source, Arrow-batched pandas
UDF shape) is REAL and tested. Decode kernels:

- ``decode_image`` REALLY decodes the library-free codecs — PNG at every
  tier (all bit depths incl. 16-bit, palette, grayscale/RGB(A),
  non-interlaced AND Adam7-interlaced, multi-IDAT; stdlib zlib +
  unfiltering), uncompressed 24/32-bit BMP, binary PPM/PGM, JPEG
  Huffman baseline/progressive AND arithmetic-coded SOF9/SOF10 (T.81
  Annex D QM coder) plus Huffman lossless (4:4:4/4:2:2/4:2:0, restart
  markers), GIF (LZW, interlace, animated compositing), AVI MJPEG-track
  and MP4/MOV JPEG-track first frames — in pure numpy. ``audio_features``
  decodes RIFF/WAVE PCM and native FLAC (RFC 9639), and walks MPEG-audio
  frame headers for exact mp3 duration/rate. Hierarchical and
  arithmetic-lossless JPEG, inter-coded video (H.26x), AAC, and mp3
  sample reconstruction stay gated on a media library; such payloads
  yield null feature columns.
- ``fake_decode_image`` produces DETERMINISTIC FAKE features derived from a
  sha256 of the payload bytes. It exists to exercise the exact mapInPandas
  batch shape with arbitrary payload bytes (no valid image needed).

Scale notes: binaryFile reads are split per-file (one row per object);
`maxPartitionBytes` governs batching. The pandas UDF path is Arrow-batched —
payload bytes cross the JVM->Python boundary once per batch, not per row.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every binary payload column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("modified", T.TimestampType()),
        T.StructField("media_type", T.StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)

_EXT_MEDIA = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio",
    "mp4": "video", "mkv": "video", "webm": "video",
}


def load_binary_dir(spark: SparkSession, path: str, glob: str | None = None) -> DataFrame:
    """Read a directory of media files as (content binary, meta struct).

    Uses Spark's binaryFile source: one row per file, split-per-file
    parallelism, lazy — metadata-only ops never read payload bytes.
    """
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    media_type = F.coalesce(
        *[F.when(ext == k, F.lit(v)) for k, v in _EXT_MEDIA.items()],
        F.lit("unknown"),
    )
    meta = F.struct(
        F.col("path").alias("path"),
        F.col("length").alias("length"),
        F.col("modificationTime").alias("modified"),
        media_type.alias("media_type"),
    )
    return df.select(F.col("content"), meta.alias("meta"))


def _fake_features(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC FAKE decode: features from sha256(payload). Replace with
    a real decoder (PIL.Image.open etc.) when the library is available."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 4
    mean_intensity = round(int.from_bytes(h[3:5], "big") / 65535.0 * 255.0, 4)
    return width, height, channels, mean_intensity


def fake_decode_image(df: DataFrame) -> DataFrame:
    """mapInPandas over (content, meta) -> IMAGE_FEATURES_SCHEMA rows.

    The batch shape is exactly what a real decoder uses: iterate Arrow
    batches, run the kernel per payload, emit a features frame. Only
    `_fake_features` is a stub.
    """
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_fake_features(bytes(b)) for b in pdf["content"]]
            meta = pd.DataFrame(list(pdf["meta"]))
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "length": meta["length"].astype("int64"),
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_intensity": [f[3] for f in feats],
                }
            )

    return df.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


def _decode_bmp(payload: bytes):
    import struct

    import numpy as np

    if len(payload) < 54:
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32) or width <= 0 or height == 0:
        return None
    flipped = height > 0  # positive height = bottom-up rows
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3  # rows pad to 4 bytes
    need = data_off + row_bytes * height
    if len(payload) < need:
        return None
    a = np.frombuffer(payload, dtype=np.uint8, count=row_bytes * height, offset=data_off)
    a = a.reshape(height, row_bytes)[:, : width * nch].reshape(height, width, nch)
    if flipped:
        a = a[::-1]
    return a[..., [2, 1, 0, 3] if nch == 4 else [2, 1, 0]]  # BGR(A) -> RGB(A)


def _decode_pnm(payload: bytes):
    import numpy as np

    if payload[:2] not in (b"P5", b"P6"):
        return None
    # header: magic, width, height, maxval — whitespace/comment separated
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    try:
        width, height, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    if maxval > 255 or width <= 0 or height <= 0:
        return None
    nch = 3 if payload[:2] == b"P6" else 1
    need = width * height * nch
    if len(payload) - i < need:
        return None
    a = np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
    return a.reshape(height, width, nch)


# Adam7 interlace pass grid: (x_start, y_start, x_step, y_step)
_PNG_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw, pos, height, stride, bpp):
    """Reverse the per-scanline filters (PNG spec 9, filter types 0-4)
    over `height` scanlines of `stride` bytes starting at raw[pos]; the
    filter's left-neighbor distance is bpp bytes (ceil bits-per-pixel/8).
    Returns (uint8 array [height, stride], position after the last row)."""
    import numpy as np

    if len(raw) - pos < height * (stride + 1):
        raise ValueError("png: truncated scanlines")
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                row[x] = (int(row[x]) + int(row[x - bpp])) & 0xFF
        elif ftype == 2:  # Up
            row += prior
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prior[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a_ = int(row[x - bpp]) if x >= bpp else 0
                b_ = int(prior[x])
                c_ = int(prior[x - bpp]) if x >= bpp else 0
                p = a_ + b_ - c_
                pa, pb, pc = abs(p - a_), abs(p - b_), abs(p - c_)
                pr = a_ if pa <= pb and pa <= pc else (b_ if pb <= pc else c_)
                row[x] = (int(row[x]) + pr) & 0xFF
        elif ftype != 0:
            raise ValueError("png: bad filter type")
        out[y] = row
        prior = row
    return out, pos


def _png_samples(rows, width, nch, depth, palette):
    """Unfiltered scanline bytes [h, stride] -> uint8 pixels [h, w, out_ch].
    16-bit planes keep the high byte (the same scaled-to-uint8 contract as
    the >8-bit JPEG tiers); 1/2/4-bit grayscale scales by 255/(2^d - 1)
    exactly; palette indices map through PLTE to RGB."""
    import numpy as np

    h = rows.shape[0]
    if depth == 8:
        px = rows[:, : width * nch].reshape(h, width, nch)
    elif depth == 16:
        px = rows[:, : width * nch * 2].reshape(h, width, nch, 2)[..., 0]
    else:  # 1/2/4-bit, single channel (gray or palette index)
        bits = np.unpackbits(rows, axis=1)[:, : width * depth]
        weights = 1 << np.arange(depth - 1, -1, -1)
        px = (bits.reshape(h, width, depth) * weights).sum(2).astype(np.uint8)
        px = px[:, :, None]
    if palette is not None:
        if int(px.max(initial=0)) >= len(palette):
            raise ValueError("png: palette index out of range")
        return palette[px[:, :, 0]]
    if depth < 8:
        px = px * np.uint8(255 // ((1 << depth) - 1))
    return np.ascontiguousarray(px)


def _decode_png(payload: bytes):
    """PNG (spec-complete pixel tiers): color types 0/2/3/4/6, bit depths
    1/2/4/8/16 where the spec allows them, all five scanline filters,
    non-interlaced and Adam7-interlaced streams, multi-IDAT. 16-bit
    samples scale to the uint8 contract via the high byte; tRNS is
    ignored (features are computed on the color planes)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, idat, ihdr, plte = 8, b"", None, None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            if ln % 3 or ln == 0 or ln > 768:
                return None
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + crc
    if ihdr is None or not idat:
        return None
    width, height, depth, ctype, comp, filt, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    valid_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }
    if (
        nch is None or depth not in valid_depths[ctype] or comp or filt
        or interlace > 1 or width == 0 or height == 0
        or (ctype == 3 and plte is None)
    ):
        return None
    palette = plte if ctype == 3 else None
    try:
        raw = zlib.decompress(idat)
    except zlib.error:
        return None
    bpp = max(1, nch * depth // 8)

    def stride_of(w):
        return (w * nch * depth + 7) // 8

    try:
        if not interlace:
            rows, _ = _png_unfilter(raw, 0, height, stride_of(width), bpp)
            return _png_samples(rows, width, nch, depth, palette)
        out_ch = 3 if ctype == 3 else nch
        out = np.zeros((height, width, out_ch), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _PNG_ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            rows, pos = _png_unfilter(raw, pos, ph, stride_of(pw), bpp)
            out[y0::dy, x0::dx] = _png_samples(rows, pw, nch, depth, palette)
        return out
    except ValueError:
        return None


# --------------------------------------------------------------- JPEG (SOF0)
# Baseline sequential JPEG in pure numpy + stdlib: marker parse, Huffman
# entropy decode (bit-at-a-time — this is a correctness kernel for modest
# batch media, not a libjpeg replacement), dequantize + dezigzag, 8x8
# orthonormal IDCT as one matrix sandwich, per-component plane assembly
# with nearest upsampling (4:4:4 / 4:2:2 / 4:2:0), JFIF YCbCr -> RGB.
# Baseline/extended sequential (SOF0/1, 8- and 12-bit), progressive
# (SOF2: spectral selection + successive approximation per ITU T.81
# G.2), lossless (SOF3, Annex H predictors 1-7, modulo-2^16), and
# arithmetic-coded sequential/progressive (SOF9/SOF10, Annex D QM coder
# with F.1.4.4 conditioning + DAC-marker parameters) are decoded;
# hierarchical and arithmetic lossless return None.

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _jpeg_huff_table(bits, vals):
    """(BITS counts, HUFFVAL) -> {(length, code): value} per ITU T.81 C.2."""
    table, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _JpegBits:
    """MSB-first bit reader over byte-unstuffed entropy data."""

    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self):
        if self.pos >= len(self.data):
            raise ValueError("jpeg: bitstream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n):
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read()
        return v


def _jpeg_extend(v, n):
    """DIFF/AC value decode per T.81 F.2.2.1: n-bit code -> signed value."""
    return v if n == 0 or v >= (1 << (n - 1)) else v - (1 << n) + 1


def _jpeg_decode_huff(bits, table):
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | bits.read()
        ln += 1
        if (ln, code) in table:
            return table[(ln, code)]
    raise ValueError("jpeg: bad huffman code")


_JPEG_IDCT_C = None


def _jpeg_idct(coef):
    import numpy as np

    global _JPEG_IDCT_C
    if _JPEG_IDCT_C is None:
        k = np.arange(8)
        c = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16.0)
        c[0] /= np.sqrt(2.0)
        _JPEG_IDCT_C = c / 2.0  # orthonormal DCT-II basis rows
    c = _JPEG_IDCT_C
    return c.T @ coef @ c


def _jpeg_entropy_slice(payload: bytes, pos: int):
    """Byte-unstuff the entropy-coded segment starting at `pos`: FF00 ->
    FF, RSTn positions recorded, stops at any other marker. Returns
    (data, restart_offsets, next_marker_pos)."""
    data = bytearray()
    restarts = []
    while pos < len(payload) - 1:
        b = payload[pos]
        if b == 0xFF:
            nxt = payload[pos + 1]
            if nxt == 0x00:
                data.append(0xFF)
                pos += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                restarts.append(len(data))
                pos += 2
                continue
            break
        data.append(b)
        pos += 1
    return bytes(data), restarts, pos


def _jpeg_decode_scan(data, restarts, scan_comps, ss, se, ah, al, hufft,
                      smap, dri, coefs, comps, mcux, mcuy, progressive):
    """Decode one entropy-coded scan into the per-component zigzag
    coefficient stores (T.81 F.2 sequential / G.2 progressive). Handles
    interleaved (multi-component, MCU walk) and non-interleaved
    (single-component, block walk) scans, EOBRUN, and successive-
    approximation refinement."""
    bits = _JpegBits(data)
    pred = {ci: 0 for ci in scan_comps}
    state = {"eobrun": 0, "bits": bits}
    nrst = 0

    def first_block(zz, ci):
        # DC (if ss==0) + AC first pass, shifted left by al
        k = ss
        if ss == 0:
            dc_t = hufft.get((0, smap[comps[ci]["id"]][0]))
            if dc_t is None:
                raise ValueError("jpeg: missing DC table")
            t = _jpeg_decode_huff(state["bits"], dc_t)
            pred[ci] += _jpeg_extend(state["bits"].receive(t), t)
            zz[0] = pred[ci] << al
            k = 1
        if k > se:
            return
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac_t = hufft.get((1, smap[comps[ci]["id"]][1]))
        if ac_t is None:
            raise ValueError("jpeg: missing AC table")
        b = state["bits"]
        while k <= se:
            rs = _jpeg_decode_huff(b, ac_t)
            r, s = rs >> 4, rs & 15
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                # EOBn (progressive) / plain EOB (baseline: r == 0)
                state["eobrun"] = (1 << r) - 1
                if r:
                    state["eobrun"] += b.receive(r)
                break
            k += r
            if k > se:
                raise ValueError("jpeg: AC overrun")
            zz[k] = _jpeg_extend(b.receive(s), s) << al
            k += 1

    def refine_block(zz, ci):
        # successive-approximation refinement (T.81 G.2 / G.1.2.3)
        b = state["bits"]
        p1 = 1 << al
        if ss == 0:
            # DC refinement: one correction bit per block
            if b.read():
                zz[0] |= p1
            return
        ac_t = hufft.get((1, smap[comps[ci]["id"]][1]))
        if ac_t is None:
            raise ValueError("jpeg: missing AC table")
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _jpeg_decode_huff(b, ac_t)
                r, s = rs >> 4, rs & 15
                sval = 0
                if s:
                    if s != 1:
                        raise ValueError("jpeg: bad AC refine magnitude")
                    sval = p1 if b.read() else -p1
                elif r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += b.receive(r)
                    break
                # advance past r zero-history coefficients, reading a
                # correction bit at every nonzero-history one passed
                while k <= se:
                    c = int(zz[k])
                    if c != 0:
                        if b.read() and (abs(c) & p1) == 0:
                            zz[k] = c + (p1 if c > 0 else -p1)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if sval and k <= se:
                    zz[k] = sval
                k += 1
        if state["eobrun"] > 0:
            # EOB span: correction bits for remaining nonzero-history
            # coefficients in the band, then consume one span unit
            while k <= se:
                c = int(zz[k])
                if c != 0 and b.read() and (abs(c) & p1) == 0:
                    zz[k] = c + (p1 if c > 0 else -p1)
                k += 1
            state["eobrun"] -= 1

    decode_block = refine_block if ah else first_block

    if len(scan_comps) > 1:
        n_units = mcux * mcuy
    else:
        ci = scan_comps[0]
        c = comps[ci]
        # non-interleaved scans walk the component's TRUE block grid
        # (ceil of scaled dims), not the MCU-padded grid
        bw = -(-c["w_px"] // 8)
        bh = -(-c["h_px"] // 8)
        n_units = bw * bh
    for m in range(n_units):
        if dri and m and m % dri == 0:
            # restart: byte-align at the recorded boundary, reset state.
            # Exhausted restart list = encoder/decoder interval mismatch or
            # missing RST markers — the bitstream is desynced; fail to None
            # (via _decode_payload's guard) rather than decode garbage.
            if nrst >= len(restarts):
                raise ValueError("jpeg: restart marker missing (DRI desync)")
            state["bits"] = _JpegBits(data[restarts[nrst] :])
            nrst += 1
            for ci2 in pred:
                pred[ci2] = 0
            state["eobrun"] = 0
        if len(scan_comps) > 1:
            my, mx = divmod(m, mcux)
            for ci in scan_comps:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        decode_block(
                            coefs[ci][my * c["v"] + by, mx * c["h"] + bx], ci
                        )
        else:
            by, bx = divmod(m, bw)
            decode_block(coefs[ci][by, bx], ci)


def _jpeg_lossless_scan(data, scan_comps, pred_sel, pt, hufft, smap,
                        planes, comps, h, w, prec):
    """Lossless JPEG (SOF3) scan decode per T.81 Annex H: Huffman-coded
    prediction differences (SSSS 0-16, 16 = +32768), predictors 1-7,
    modulo-2^16 reconstruction, point transform applied at the end.
    Sampling factors must all be 1 (the common lossless shape)."""
    bits = _JpegBits(data)
    default = 1 << (prec - pt - 1)
    tabs = {}
    for ci in scan_comps:
        t = hufft.get((0, smap[comps[ci]["id"]][0]))
        if t is None:
            raise ValueError("jpeg: missing lossless table")
        tabs[ci] = t
    for y in range(h):
        for x in range(w):
            for ci in scan_comps:
                ssss = _jpeg_decode_huff(bits, tabs[ci])
                if ssss == 16:
                    diff = 32768
                else:
                    diff = _jpeg_extend(bits.receive(ssss), ssss)
                p = planes[ci]
                if y == 0:
                    px = default if x == 0 else int(p[0, x - 1])
                elif x == 0:
                    px = int(p[y - 1, 0])
                else:
                    a, b = int(p[y, x - 1]), int(p[y - 1, x])
                    c = int(p[y - 1, x - 1])
                    if pred_sel == 1:
                        px = a
                    elif pred_sel == 2:
                        px = b
                    elif pred_sel == 3:
                        px = c
                    elif pred_sel == 4:
                        px = a + b - c
                    elif pred_sel == 5:
                        px = a + ((b - c) >> 1)
                    elif pred_sel == 6:
                        px = b + ((a - c) >> 1)
                    elif pred_sel == 7:
                        px = (a + b) >> 1
                    else:
                        raise ValueError("jpeg: bad lossless predictor")
                p[y, x] = (px + diff) & 0xFFFF


# ------------------------------------------------- JPEG arithmetic (SOF9/10)
# QM-coder probability estimation state machine, ITU-T T.81 Table D.3
# (Qe, NMPS, NLPS, SWITCH). Entry 113 is the non-adapting equiprobable
# state used for AC sign / refinement decisions (the "fixed bin" of the
# public IJG codec, whose register conventions the decoder below also
# follows). NOTE on validation: the round-trip tests drive this table
# through an INDEPENDENTLY WRITTEN in-test encoder (T.81 Annex D encoder
# flowcharts), which proves the coder/conditioning logic but would not
# catch a transcription error in the shared table itself; the structural
# invariants (chain reachability, SWITCH only at MPS-exchange states,
# Qe monotone along the fast-attack chain) are asserted in tests.
_JPEG_ARITAB = (
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


class _JpegArithDec:
    """QM arithmetic decoder per ITU-T T.81 Annex D / F.2.2 (DECODE with
    conditional MPS/LPS exchange), using the lazy-renormalization register
    layout of the public IJG implementation: the code register C is never
    shifted during renormalization — CT tracks how many low-order bits C
    holds beyond A's alignment, and the subinterval boundary is scaled by
    CT at compare time. `data` is the byte-unstuffed entropy segment from
    _jpeg_entropy_slice; reads past its end feed zero bytes (a marker was
    reached — legal mid-stream in arithmetic coding, F.2.2.5).

    A statistics bin is one byte: bit 7 = current MPS sense, bits 0-6 =
    Table D.3 state index."""

    def __init__(self, data):
        self.data = data
        self.pos = 0
        self.c = 0
        self.a = 0
        self.ct = -16  # forces the two INITDEC byte loads on first decode

    def decode(self, st: bytearray, i: int) -> int:
        a, c, ct = self.a, self.c, self.ct
        data, n = self.data, len(self.data)
        while a < 0x8000:
            ct -= 1
            if ct < 0:
                if self.pos < n:
                    b = data[self.pos]
                    self.pos += 1
                else:
                    b = 0
                c = (c << 8) | b
                ct += 8
                if ct < 0:  # still inside INITDEC: need 2 bytes in C
                    ct += 1
                    if ct == 0:
                        a = 0x8000  # -> 0x10000 after the shift below
            a <<= 1
        sv = st[i]
        qe, nmps, nlps, sw = _JPEG_ARITAB[sv & 0x7F]
        a -= qe
        bound = a << ct
        if c >= bound:
            c -= bound
            # LPS region, conditional exchange (T.81 Figure F.22)
            if a < qe:
                bit = sv >> 7
                st[i] = (sv & 0x80) | nmps
            else:
                bit = 1 - (sv >> 7)
                if sw:
                    sv ^= 0x80
                st[i] = (sv & 0x80) | nlps
            a = qe
        elif a < 0x8000:
            # MPS region needing renorm, conditional exchange (F.23)
            if a < qe:
                bit = 1 - (sv >> 7)
                if sw:
                    sv ^= 0x80
                st[i] = (sv & 0x80) | nlps
            else:
                bit = sv >> 7
                st[i] = (sv & 0x80) | nmps
        else:
            bit = sv >> 7  # MPS, no renormalization, no state change
        self.a, self.c, self.ct = a, c, ct
        return bit


def _jpeg_arith_scan(data, restarts, scan_comps, ss, se, ah, al, cond,
                     smap, dri, coefs, comps, mcux, mcuy, progressive):
    """Decode one arithmetic-coded scan (SOF9 sequential / SOF10
    progressive) into the zigzag-order coefficient stores, mirroring the
    Huffman path's walk. Conditioning per T.81 F.1.4.4: DC uses a
    5-category context from the previous block's diff classified against
    the DAC (L, U) bounds; AC sign and refinement use the fixed
    equiprobable bin; AC magnitude-category bins split at the DAC Kx
    threshold. Statistics areas, DC contexts/predictors, and the decoder
    registers all reset at restart markers (F.2.4). Each restart segment
    is decoded against ITS OWN byte range: reads past a segment's end
    must feed zeros (the marker was reached, F.2.2.5) — handing the
    decoder the following segment's bytes instead desyncs the final
    symbols before the boundary."""
    state = {"dec": _JpegArithDec(data[: restarts[0]] if restarts else data)}
    dc_stats: dict[int, bytearray] = {}
    ac_stats: dict[int, bytearray] = {}
    fixed = bytearray([113])
    last_dc = {ci: 0 for ci in scan_comps}
    dc_ctx = {ci: 0 for ci in scan_comps}

    def dstat(t):
        if t not in dc_stats:
            dc_stats[t] = bytearray(64)
        return dc_stats[t]

    def astat(t):
        if t not in ac_stats:
            ac_stats[t] = bytearray(256)
        return ac_stats[t]

    def decode_dc(zz, ci):
        # T.81 F.2.4.1 / Figures F.22-F.24 (layout: Table F.4)
        td = smap[comps[ci]["id"]][0]
        st = dstat(td)
        d = state["dec"]
        i = dc_ctx[ci]
        if d.decode(st, i) == 0:
            dc_ctx[ci] = 0
        else:
            sign = d.decode(st, i + 1)
            i += 2 + sign  # SP = S0+2, SN = S0+3
            m = d.decode(st, i)
            if m:
                i = 20  # X1
                while d.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("jpeg: arith DC magnitude overrun")
                    i += 1
            lo, up = cond.get((0, td), (0, 1))
            if m < (1 << lo) >> 1:
                dc_ctx[ci] = 0  # zero diff category
            elif m > (1 << up) >> 1:
                dc_ctx[ci] = 12 + 4 * sign  # large diff category
            else:
                dc_ctx[ci] = 4 + 4 * sign  # small diff category
            v = m
            i += 14  # magnitude bits share one bin at X + 14
            m >>= 1
            while m:
                if d.decode(st, i):
                    v |= m
                m >>= 1
            v += 1
            last_dc[ci] += -v if sign else v
        zz[0] = last_dc[ci] << al

    def decode_ac_first(zz, ci, kstart):
        # T.81 F.2.4.2 (sequential) == G.2 first-pass band with << al
        ta = smap[comps[ci]["id"]][1]
        st = astat(ta)
        kx = cond.get((1, ta), 5)
        d = state["dec"]
        k = kstart
        while k <= se:
            i = 3 * (k - 1)
            if d.decode(st, i):
                return  # EOB
            while d.decode(st, i + 1) == 0:
                i += 3
                k += 1
                if k > se:
                    raise ValueError("jpeg: arith AC overrun")
            sign = d.decode(fixed, 0)
            i += 2
            m = d.decode(st, i)
            if m and d.decode(st, i):
                m = 2
                i = 189 if k <= kx else 217  # X2 of the lo/hi band
                while d.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("jpeg: arith AC magnitude overrun")
                    i += 1
            v = m
            i += 14
            m >>= 1
            while m:
                if d.decode(st, i):
                    v |= m
                m >>= 1
            v += 1
            zz[k] = (-v if sign else v) << al
            k += 1

    def decode_ac_refine(zz, ci):
        # T.81 G.2 successive-approximation correction scan
        ta = smap[comps[ci]["id"]][1]
        st = astat(ta)
        d = state["dec"]
        p1, m1 = 1 << al, -1 << al
        kex = se
        while kex > 0 and zz[kex] == 0:
            kex -= 1
        k = ss
        while k <= se:
            i = 3 * (k - 1)
            if k > kex and d.decode(st, i):
                return  # EOB
            while True:
                c = int(zz[k])
                if c:
                    if d.decode(st, i + 2):
                        zz[k] = c + (m1 if c < 0 else p1)
                    break
                if d.decode(st, i + 1):
                    zz[k] = m1 if d.decode(fixed, 0) else p1
                    break
                i += 3
                k += 1
                if k > se:
                    raise ValueError("jpeg: arith AC refine overrun")
            k += 1

    def decode_block(zz, ci):
        if ah == 0:
            if ss == 0:
                decode_dc(zz, ci)
            if se >= 1:
                decode_ac_first(zz, ci, max(ss, 1))
        elif ss == 0:
            # DC refinement: one fixed-bin correction bit per block
            if state["dec"].decode(fixed, 0):
                zz[0] |= 1 << al
        else:
            decode_ac_refine(zz, ci)

    if len(scan_comps) > 1:
        n_units = mcux * mcuy
    else:
        ci0 = scan_comps[0]
        c0 = comps[ci0]
        bw = -(-c0["w_px"] // 8)
        bh = -(-c0["h_px"] // 8)
        n_units = bw * bh
    nrst = 0
    for m in range(n_units):
        if dri and m and m % dri == 0:
            if nrst >= len(restarts):
                raise ValueError("jpeg: restart marker missing (DRI desync)")
            nxt = restarts[nrst + 1] if nrst + 1 < len(restarts) else len(data)
            state["dec"] = _JpegArithDec(data[restarts[nrst] : nxt])
            nrst += 1
            for t in dc_stats.values():
                t[:] = bytes(len(t))
            for t in ac_stats.values():
                t[:] = bytes(len(t))
            fixed[0] = 113
            for ci in scan_comps:
                last_dc[ci] = 0
                dc_ctx[ci] = 0
        if len(scan_comps) > 1:
            my, mx = divmod(m, mcux)
            for ci in scan_comps:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        decode_block(
                            coefs[ci][my * c["v"] + by, mx * c["h"] + bx], ci
                        )
        else:
            by, bx = divmod(m, bw)
            decode_block(coefs[ci0][by, bx], ci0)


def _decode_jpeg(payload: bytes):
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        return None
    qt, hufft, dri = {}, {}, 0
    frame = None
    progressive = False
    lossless = False
    arith = False
    arith_cond: dict[tuple[int, int], object] = {}
    prec, pt_used = 8, 0
    coefs = None
    mcux = mcuy = 0
    comps = []
    h = w = 0
    saw_scan = False
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 15
                if pq == 0:
                    qt[tq] = np.frombuffer(seg, np.uint8, 64, s + 1).astype(np.int32)
                    s += 65
                else:
                    qt[tq] = np.frombuffer(seg, ">u2", 64, s + 1).astype(np.int32)
                    s += 129
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                tc, th = seg[s] >> 4, seg[s] & 15
                bits16 = list(seg[s + 1 : s + 17])
                n = sum(bits16)
                vals = list(seg[s + 17 : s + 17 + n])
                hufft[(tc, th)] = _jpeg_huff_table(bits16, vals)
                s += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/1 sequential, SOF2 progressive, SOF3 lossless,
            # SOF9/10 arithmetic-coded sequential/progressive
            progressive = marker in (0xC2, 0xCA)
            lossless = marker == 0xC3
            arith = marker in (0xC9, 0xCA)
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if lossless:
                if not 2 <= prec <= 16:
                    return None
            elif prec not in (8, 12):  # 12-bit extended sequential/progressive
                return None
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if lossless:
                if any(c["h"] != 1 or c["v"] != 1 for c in comps):
                    return None  # subsampled lossless: out of tier
                coefs = [np.zeros((h, w), dtype=np.int32) for _ in comps]
                frame = (h, w, comps)
                continue
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            coefs = []
            for c in comps:
                c["w_px"] = -(-w * c["h"] // hmax)
                c["h_px"] = -(-h * c["v"] // vmax)
                coefs.append(
                    np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
                )
            frame = (h, w, comps)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB):
            return None  # hierarchical / arithmetic lossless: out of tier
        elif marker == 0xCC:  # DAC — arithmetic conditioning (T.81 B.2.4.3)
            s = 0
            while s + 1 < len(seg):
                tc, tb = seg[s] >> 4, seg[s] & 15
                cs = seg[s + 1]
                if tc == 0:
                    lo, up = cs & 15, cs >> 4
                    if lo > up or up > 15:
                        return None
                    arith_cond[(0, tb)] = (lo, up)
                else:
                    if not 1 <= cs <= 63:
                        return None
                    arith_cond[(1, tb)] = cs
                s += 2
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            ns = seg[0]
            smap = {}
            scan_comps = []
            by_id = {c["id"]: i for i, c in enumerate(comps)}
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                smap[cid] = (tt >> 4, tt & 15)
                if cid not in by_id:
                    return None
                scan_comps.append(by_id[cid])
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            data, restarts, pos = _jpeg_entropy_slice(payload, pos)
            if lossless:
                if dri:
                    return None  # restart prediction reset: out of tier
                pt_used = al
                _jpeg_lossless_scan(
                    data, scan_comps, ss, al, hufft, smap, coefs, comps,
                    h, w, prec,
                )
            elif arith:
                _jpeg_arith_scan(
                    data, restarts, scan_comps, ss, se, ah, al, arith_cond,
                    smap, dri, coefs, comps, mcux, mcuy, progressive,
                )
            else:
                _jpeg_decode_scan(
                    data, restarts, scan_comps, ss, se, ah, al, hufft, smap,
                    dri, coefs, comps, mcux, mcuy, progressive,
                )
            saw_scan = True
    if frame is None or not saw_scan:
        return None
    import numpy as np

    if lossless:
        # exact samples already reconstructed; apply the point transform,
        # scale >8-bit precisions down to the uint8 contract. Lossless
        # JPEG carries no JFIF color transform — planes come out as-is.
        out = np.stack(
            [(c.astype(np.int64) << pt_used) for c in coefs], axis=2
        ).astype(np.float64)
        if prec > 8:
            out = out / float(1 << (prec - 8))
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    # dequantize + de-zigzag + one vectorized IDCT pass per component

    if _JPEG_IDCT_C is None:
        _jpeg_idct(np.zeros((8, 8)))  # build the basis
    cbasis = _JPEG_IDCT_C
    zig = np.asarray(_JPEG_ZIGZAG)
    full = []
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for ci, c in enumerate(comps):
        q = qt.get(c["tq"])
        if q is None:
            return None
        deq = coefs[ci].astype(np.float64) * q[None, None, :]
        blocks = np.zeros(deq.shape[:2] + (64,), dtype=np.float64)
        blocks[..., zig] = deq
        blocks = blocks.reshape(deq.shape[0], deq.shape[1], 8, 8)
        px = np.einsum("ij,abjk,kl->abil", cbasis.T, blocks, cbasis) + float(
            1 << (prec - 1)
        )
        plane = px.transpose(0, 2, 1, 3).reshape(
            deq.shape[0] * 8, deq.shape[1] * 8
        )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    elif len(full) == 3:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        out = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
    else:
        return None
    if prec > 8:  # 12-bit extended sequential/progressive -> uint8 contract
        out = out / float(1 << (prec - 8))
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def _gif_lzw(data: bytes, mcs: int):
    """GIF-variant LZW decode: LSB-first bits, clear/end codes, KwKwK,
    width growth to 12. Returns the pixel-index list."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    table = [[i] for i in range(clear)] + [None, None]
    width = mcs + 1
    acc = nbits = 0
    out: list[int] = []
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [[i] for i in range(clear)] + [None, None]
                width = mcs + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            else:
                if code < len(table) and table[code] is not None:
                    entry = table[code]
                    table.append(table[prev] + [entry[0]])
                else:  # KwKwK case
                    entry = table[prev] + [table[prev][0]]
                    table.append(entry)
                if len(table) == (1 << width) and width < 12:
                    width += 1
            out.extend(entry)
            prev = code
    return out


def _gif_frames(payload: bytes, max_frames: int = 64):
    """GIF87a/89a frame walk with minimal compositing: frames paint their
    (left, top, w, h) rect onto the logical-screen canvas, transparency
    index skips pixels, disposal 2 restores the rect to background.
    Disposal 3 (restore-previous) stops the walk — frames up to that
    point are still returned. Yields (delay_centisec, HxWx3 uint8)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    sw, sh, packed, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    bg_rgb = gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    canvas = None
    frames = []
    transparent, delay, disposal = None, 0, 0
    while pos < len(payload) and len(frames) < max_frames:
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                blk = payload[pos + 1 : pos + 1 + payload[pos]]
                transparent = blk[3] if blk[0] & 1 else None
                delay = blk[1] | (blk[2] << 8)
                disposal = (blk[0] >> 2) & 7
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:
            return frames or None
        left, top, w, h, ip = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        ct = gct
        if ip & 0x80:
            n = 2 << (ip & 7)
            ct = np.frombuffer(payload, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            return frames or None
        mcs = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        out = _gif_lzw(bytes(data), mcs)
        if len(out) < w * h:
            return frames or None
        idx = np.asarray(out[: w * h], dtype=np.int32).reshape(h, w)
        if ip & 0x40:  # 4-pass interlace row order
            order = (
                list(range(0, h, 8))
                + list(range(4, h, 8))
                + list(range(2, h, 4))
                + list(range(1, h, 2))
            )
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if canvas is None:
            canvas = np.tile(bg_rgb, (sh, sw, 1)).astype(np.uint8)
        region = canvas[top : top + h, left : left + w]
        painted = ct[np.clip(idx, 0, len(ct) - 1)][: region.shape[0], : region.shape[1]]
        if transparent is not None:
            mask = (idx != transparent)[: region.shape[0], : region.shape[1]]
            region[mask] = painted[mask]
        else:
            region[:] = painted
        frames.append((delay, canvas.copy()))
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            break  # restore-previous: out of this tier, stop honestly
        transparent, delay, disposal = None, 0, 0
    return frames or None


def _decode_gif(payload: bytes):
    """First composited frame of a GIF (see _gif_frames)."""
    frames = _gif_frames(payload, max_frames=1)
    return frames[0][1] if frames else None


def _decode_payload(payload: bytes):
    """bytes -> HxWxC uint8 array for the self-contained codecs (BMP 24/32,
    binary PPM/PGM, PNG — all bit depths / interlace / palette tiers via
    stdlib zlib, JPEG — baseline, extended sequential, progressive,
    lossless, and arithmetic-coded SOF9/SOF10, first-frame GIF, AVI
    MJPEG-track, MP4/MOV JPEG-track), else None. Hierarchical and
    arithmetic-lossless JPEG plus inter-coded video (H.26x) stay gated
    to None — see decode_image's null-column contract."""
    for dec in (_decode_png, _decode_bmp, _decode_pnm, _decode_jpeg, _decode_gif,
                _decode_avi, _decode_mp4_video):
        try:
            a = dec(payload)
        except Exception:
            a = None
        if a is not None:
            return a
    return None


def decode_image(df: DataFrame) -> DataFrame:
    """REAL image decode for library-free codecs (PNG/BMP/PPM/PGM/GIF and
    JPEG — baseline, extended sequential, progressive, lossless, and
    arithmetic-coded SOF9/SOF10 — all pure numpy + stdlib zlib); same
    schema and mapInPandas batch shape as fake_decode_image. Payloads the
    built-in codecs can't parse (hierarchical / arithmetic-lossless JPEG,
    truncated streams) decode to null feature columns rather than failing
    the batch — filter `width IS NULL` to find them."""
    import pandas as pd

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for b in pdf["content"]:
                a = _decode_payload(bytes(b) if b is not None else b"")
                if a is None:
                    rows.append((None, None, None, None))
                else:
                    rows.append(
                        (a.shape[1], a.shape[0], a.shape[2], round(float(a.mean()), 4))
                    )
            meta = pd.DataFrame(list(pdf["meta"]))
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "length": meta["length"].astype("int64"),
                    "width": [r[0] for r in rows],
                    "height": [r[1] for r in rows],
                    "channels": [r[2] for r in rows],
                    "mean_intensity": [r[3] for r in rows],
                }
            )

    return df.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


RESIZED_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_sec", T.DoubleType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def fake_resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """mapInPandas 1->1 resize shape: (content, meta) -> RESIZED_IMAGE_SCHEMA.
    The fake kernel emits a deterministic payload of width*height/64 bytes
    derived from sha256(content) — a real PIL/libvips kernel replaces only
    the bytes computation; schema, batching and partitioning are real."""
    import pandas as pd

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            out = []
            for b in pdf["content"]:
                seed = hashlib.sha256(bytes(b) + f"{width}x{height}".encode()).digest()
                n = max(1, width * height // 64)
                out.append((seed * (n // len(seed) + 1))[:n])
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return df.mapInPandas(resize, RESIZED_IMAGE_SCHEMA)


def fake_sample_frames(df: DataFrame, n_frames: int, fps: float = 1.0) -> DataFrame:
    """mapInPandas 1->N frame-sampling shape: each video row explodes into
    n_frames rows (frame_idx, ts_sec, frame bytes). This exercises the
    expanding-batch contract a real ffmpeg sampler has — output row count
    differs from input row count, which mapInPandas supports natively."""
    import pandas as pd

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            rows = {"path": [], "frame_idx": [], "ts_sec": [], "frame": []}
            for path, b in zip(meta["path"], pdf["content"]):
                payload = bytes(b)
                for i in range(n_frames):
                    seed = hashlib.sha256(payload + i.to_bytes(4, "big")).digest()
                    rows["path"].append(path)
                    rows["frame_idx"].append(i)
                    rows["ts_sec"].append(round(i / fps, 6))
                    rows["frame"].append(seed)
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, FRAME_SCHEMA)


def fake_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas 1->1 audio feature extraction: deterministic fake
    duration/sample-rate/RMS from sha256(content). Swap in soundfile/librosa
    for the real kernel; the Arrow batch shape is identical."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            feats = []
            for b in pdf["content"]:
                h = hashlib.sha256(bytes(b) or b"").digest()
                feats.append(
                    (
                        round(1.0 + int.from_bytes(h[0:2], "big") / 65535.0 * 299.0, 4),
                        (8000, 16000, 22050, 44100, 48000)[h[2] % 5],
                        round(int.from_bytes(h[3:5], "big") / 65535.0, 6),
                    )
                )
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "duration_sec": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "rms": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for the library-free codecs: decode via
    ``_decode_payload``, numpy index-sample to (height, width), re-encode
    as binary PPM (P6) / PGM (P5) so downstream decoders can read the
    payload. Codecs the built-ins can't parse yield a null `resized`."""
    import pandas as pd

    if width <= 0 or height <= 0:
        raise ValueError("resize_image: width and height must be positive")

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            out = []
            for b in pdf["content"]:
                a = _decode_payload(bytes(b) if b is not None else b"")
                if a is None:
                    out.append(None)
                    continue
                h, w, c = a.shape
                ys = (np.arange(height) * h // height).clip(0, h - 1)
                xs = (np.arange(width) * w // width).clip(0, w - 1)
                r = a[ys][:, xs]
                if c >= 3:
                    body, magic = r[..., :3], b"P6"
                else:
                    body, magic = r[..., :1], b"P5"
                out.append(
                    magic + f"\n{width} {height}\n255\n".encode()
                    + bytes(body.reshape(-1))
                )
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "width": width,
                    "height": height,
                    "resized": out,
                }
            )

    return df.mapInPandas(resize, RESIZED_IMAGE_SCHEMA)


def _decode_wav(payload: bytes):
    """(duration_sec, sample_rate, rms in [0,1]) for RIFF/WAVE PCM 8/16-bit
    and float32 payloads, else None — stdlib struct + numpy only."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, ln = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks pad to even
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, nch, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if nch == 0 or rate == 0:
        return None
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype("float64") / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, dtype="u1").astype("float64") - 128.0) / 128.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, dtype="<f4").astype("float64")
    else:
        return None
    if not len(x):
        return None
    frames = len(x) // nch
    rms = float(np.sqrt(np.mean(x * x)))
    return round(frames / rate, 6), int(rate), round(rms, 6)


# ----------------------------------------------------------------- AVI
# RIFF/AVI frame walk (public 'hdrl'/'strh'/'strf'/'movi' layout):
# MJPEG ('NNdc' chunks decoded by the built-in JPEG kernel) and
# uncompressed DIB ('NNdb' chunks re-wrapped as BMP for the built-in BMP
# kernel). Frame timing from the video strh scale/rate, falling back to
# avih microseconds-per-frame. Other codecs yield undecodable frames ->
# skipped; a stream with no decodable frames behaves like a non-AVI
# payload (None).


def _avi_frames(payload: bytes, max_frames: int = 64):
    """AVI -> [(delay_centisec, HxWx3 uint8), ...] or None."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    us_per_frame = 0
    scale = rate = 0
    in_video_stream = False
    strf_video = None
    raw_frames: list[tuple[bytes, bytes]] = []  # (kind, bytes)

    def walk(pos: int, end: int):
        nonlocal us_per_frame, scale, rate, in_video_stream, strf_video
        while pos + 8 <= end:
            fcc = payload[pos : pos + 4]
            ln = struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if body + ln > len(payload):
                raise ValueError("avi: truncated chunk")
            if fcc == b"LIST":
                if ln >= 4:
                    if payload[body : body + 4] == b"strl":
                        in_video_stream = False  # reset per stream list
                    walk(body + 4, body + ln)
            elif fcc == b"avih" and ln >= 4:
                us_per_frame = struct.unpack_from("<I", payload, body)[0]
            elif fcc == b"strh" and ln >= 28:
                in_video_stream = payload[body : body + 4] == b"vids"
                if in_video_stream:
                    scale, rate = struct.unpack_from("<II", payload, body + 20)
            elif fcc == b"strf" and in_video_stream:
                strf_video = payload[body : body + ln]
            elif (
                len(fcc) == 4
                and fcc[:2].isdigit()
                and fcc[2:4] in (b"dc", b"db")
                and len(raw_frames) < max_frames
            ):
                raw_frames.append((bytes(fcc[2:4]), payload[body : body + ln]))
            pos = body + ln + (ln & 1)  # chunks pad to even

    try:
        walk(12, len(payload))
    except Exception:
        return None
    if not raw_frames:
        return None
    if rate:
        delay_cs = scale / rate * 100.0
    elif us_per_frame:
        delay_cs = us_per_frame / 10000.0
    else:
        delay_cs = 0.0
    frames = []
    for kind, data in raw_frames:
        img = None
        if kind == b"dc":
            try:
                img = _decode_jpeg(data)
            except Exception:
                img = None
        elif strf_video is not None and len(strf_video) >= 40:
            # DIB bits + the stream's BITMAPINFOHEADER == a headerless BMP
            import struct as _s

            bmp = (
                b"BM"
                + _s.pack("<IHHI", 14 + len(strf_video) + len(data), 0, 0,
                          14 + len(strf_video))
                + strf_video
                + data
            )
            try:
                img = _decode_bmp(bmp)
            except Exception:
                img = None
        if img is not None:
            if img.shape[2] == 1:
                import numpy as np

                img = np.repeat(img, 3, axis=2)
            frames.append((delay_cs, img[:, :, :3]))
    return frames or None


def _decode_avi(payload: bytes):
    """First decodable frame of an AVI (MJPEG or DIB), for decode_image."""
    frames = _avi_frames(payload, max_frames=1)
    return frames[0][1] if frames else None


# ---------------------------------------------------------------- MP3
# MPEG audio FRAME WALK (headers only — ISO/IEC 11172-3 / 13818-3 frame
# header layout and the published bitrate/sample-rate tables): exact
# duration and sample rate without entropy decode. Full sample
# reconstruction (hence RMS) stays library-gated.

_MP3_RATES = {  # version bits -> sample-rate table (index 3 reserved)
    3: (44100, 48000, 32000),  # MPEG1
    2: (22050, 24000, 16000),  # MPEG2
    0: (11025, 12000, 8000),   # MPEG2.5
}

_MP3_KBPS = {
    # (is_mpeg1, layer) -> bitrate kbps for index 1..14
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    (False, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}


def _mp3_frame_info(payload: bytes, pos: int):
    """Parse one MPEG audio frame header at `pos`. Returns
    (frame_bytes, samples_per_frame, sample_rate) or None."""
    if pos + 4 > len(payload):
        return None
    b0, b1, b2, _b3 = payload[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    version = (b1 >> 3) & 3  # 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
    layer_code = (b1 >> 1) & 3  # 1=III, 2=II, 3=I
    if version == 1 or layer_code == 0:
        return None
    layer = 4 - layer_code  # 1/2/3
    brx = (b2 >> 4) & 15
    srx = (b2 >> 2) & 3
    pad = (b2 >> 1) & 1
    if brx in (0, 15) or srx == 3:
        return None  # free-format / invalid: length unknowable from header
    rate = _MP3_RATES[version][srx]
    kbps = _MP3_KBPS[(version == 3, layer)][brx - 1]
    bitrate = kbps * 1000
    if layer == 1:
        nbytes = (12 * bitrate // rate + pad) * 4
        nsamples = 384
    else:
        nsamples = 1152 if (version == 3 or layer == 2) else 576
        nbytes = nsamples // 8 * bitrate // rate + pad
    return nbytes, nsamples, rate


def _decode_mp3(payload: bytes):
    """(duration_sec, sample_rate, None) from a strict MPEG-audio frame
    walk: ID3v2 skip, then consecutive valid frame headers to EOF (an
    ID3v1 'TAG' trailer is tolerated). Any gap, free-format frame, or
    mid-stream rate change fails the payload closed -> None."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        sz = 0
        for b in payload[6:10]:
            if b & 0x80:
                return None  # not syncsafe
            sz = (sz << 7) | b
        pos = 10 + sz + (10 if payload[5] & 0x10 else 0)
    nframes = 0
    total_sec = 0.0
    rate0 = None
    while pos < len(payload):
        if payload[pos : pos + 3] == b"TAG" and len(payload) - pos == 128:
            break  # ID3v1 trailer
        info = _mp3_frame_info(payload, pos)
        if info is None:
            return None
        nbytes, nsamples, rate = info
        if rate0 is None:
            rate0 = rate
        elif rate != rate0:
            return None
        total_sec += nsamples / rate
        pos += nbytes
        nframes += 1
    if nframes < 2 or pos > len(payload):
        return None  # demand >= 2 consistent frames before trusting a sync
    return round(total_sec, 6), int(rate0), None


# --------------------------------------------------------------- FLAC
# Native FLAC decode (RFC 9639 / the published format spec): metadata
# walk, frame-header parse with CRC-8, constant/verbatim/fixed/LPC
# subframes, Rice/Rice2 partitioned residuals, wasted-bits shift,
# left-side / right-side / mid-side stereo decorrelation, frame CRC-16.
# Pure stdlib + numpy; bit-at-a-time like the JPEG kernel — a
# correctness kernel for modest batch media, not a libFLAC replacement.
# Any CRC mismatch or reserved field fails the payload closed (-> null
# feature columns) rather than decoding garbage.


class _FlacBits:
    """MSB-first bit reader over bytes (no unstuffing — FLAC frames are
    plain byte streams; headers/footers are byte-aligned)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("flac: bitstream exhausted")
            avail = 8 - self.bit
            take = n if n < avail else avail
            v = (v << take) | (
                (self.data[self.pos] >> (avail - take)) & ((1 << take) - 1)
            )
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def sread(self, n: int) -> int:
        if n == 0:
            return 0
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self):
        if self.bit:
            self.bit = 0
            self.pos += 1


def _flac_crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _flac_crc16(data: bytes) -> int:
    """CRC-16, poly 0x8005, init 0 — whole-frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


_FLAC_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}

_FLAC_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _flac_residual(br: _FlacBits, bs: int, order: int) -> list[int]:
    """Partitioned Rice residual (coding methods 0/1; escape = raw)."""
    method = br.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits, esc = (4, 15) if method == 0 else (5, 31)
    porder = br.read(4)
    nparts = 1 << porder
    base = bs >> porder
    if bs != base << porder:
        raise ValueError("flac: block size not divisible by partitions")
    out: list[int] = []
    for p in range(nparts):
        cnt = base - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("flac: partition smaller than predictor order")
        param = br.read(pbits)
        if param == esc:
            nb = br.read(5)
            for _ in range(cnt):
                out.append(br.sread(nb))
        else:
            for _ in range(cnt):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _flac_subframe(br: _FlacBits, bs: int, bps: int) -> list[int]:
    """One subframe (T.D. per RFC 9639 §9.2): header, optional wasted
    bits, then constant / verbatim / fixed / LPC payload."""
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eb = bps - wasted
    if eb <= 0:
        raise ValueError("flac: wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        s = [br.sread(eb)] * bs
    elif stype == 1:  # VERBATIM
        s = [br.sread(eb) for _ in range(bs)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        s = [br.sread(eb) for _ in range(order)]
        coefs = _FLAC_FIXED_COEF[order]
        for r in _flac_residual(br, bs, order):
            s.append(r + sum(c * s[-1 - j] for j, c in enumerate(coefs)))
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 31) + 1
        s = [br.sread(eb) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.sread(5)
        if shift < 0:
            raise ValueError("flac: negative qlp shift")
        qc = [br.sread(prec) for _ in range(order)]
        for r in _flac_residual(br, bs, order):
            s.append(r + (sum(c * s[-1 - j] for j, c in enumerate(qc)) >> shift))
    else:
        raise ValueError("flac: reserved subframe type")
    if wasted:
        s = [x << wasted for x in s]
    return s


def _flac_frame(data: bytes, pos: int, def_rate: int, def_bps: int):
    """Decode one frame starting at byte `pos`. Returns
    (next_pos, rate, [channel sample lists])."""
    br = _FlacBits(data, pos)
    if br.read(14) != 0x3FFE:
        raise ValueError("flac: lost frame sync")
    if br.read(1):
        raise ValueError("flac: reserved header bit")
    br.read(1)  # blocking strategy (frame vs sample number — not needed)
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("flac: reserved header bit")
    # coded (UTF-8-style) frame/sample number — validated, value unused
    first = br.read(8)
    if first >= 0x80:
        nbytes = 0
        mask = 0x80
        while first & mask:
            nbytes += 1
            mask >>= 1
        if nbytes < 2 or nbytes > 7:
            raise ValueError("flac: bad coded number")
        for _ in range(nbytes - 1):
            if br.read(8) >> 6 != 0b10:
                raise ValueError("flac: bad coded-number continuation")
    if bs_code == 0:
        raise ValueError("flac: reserved block size")
    elif bs_code == 1:
        bs = 192
    elif bs_code <= 5:
        bs = 576 << (bs_code - 2)
    elif bs_code == 6:
        bs = br.read(8) + 1
    elif bs_code == 7:
        bs = br.read(16) + 1
    else:
        bs = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = def_rate
    elif sr_code in _FLAC_RATES:
        rate = _FLAC_RATES[sr_code]
    elif sr_code == 12:
        rate = br.read(8) * 1000
    elif sr_code == 13:
        rate = br.read(16)
    elif sr_code == 14:
        rate = br.read(16) * 10
    else:
        raise ValueError("flac: invalid sample rate code")
    if ss_code == 0:
        bps = def_bps
    elif ss_code in _FLAC_BPS:
        bps = _FLAC_BPS[ss_code]
    else:
        raise ValueError("flac: reserved sample size")
    if not rate or not bps:
        raise ValueError("flac: frame needs STREAMINFO defaults")
    if _flac_crc8(data[pos : br.pos]) != br.read(8):
        raise ValueError("flac: frame header CRC-8 mismatch")
    if ch_code <= 7:
        nch, mode = ch_code + 1, None
    elif ch_code <= 10:
        nch, mode = 2, ch_code
    else:
        raise ValueError("flac: reserved channel assignment")
    chans = []
    for c in range(nch):
        ebps = bps
        # the side channel of a stereo-decorrelated pair carries one
        # extra bit (RFC 9639 §9.2.2)
        if (mode == 8 and c == 1) or (mode == 9 and c == 0) or (
            mode == 10 and c == 1
        ):
            ebps += 1
        chans.append(_flac_subframe(br, bs, ebps))
    br.align()
    if _flac_crc16(data[pos : br.pos]) != br.read(16):
        raise ValueError("flac: frame CRC-16 mismatch")
    if mode == 8:  # left/side: R = L - side
        left, side = chans
        chans = [left, [l - s for l, s in zip(left, side)]]
    elif mode == 9:  # right/side: L = R + side
        side, right = chans
        chans = [[r + s for r, s in zip(right, side)], right]
    elif mode == 10:  # mid/side
        mid, side = chans
        left, right = [], []
        for m, s in zip(mid, side):
            mm = (m << 1) | (s & 1)
            left.append((mm + s) >> 1)
            right.append((mm - s) >> 1)
        chans = [left, right]
    return br.pos, rate, chans


def _decode_flac(payload: bytes):
    """(duration_sec, sample_rate, rms in [0,1]) for native FLAC payloads,
    else None. Decodes every frame (all subframe types), validates both
    CRCs per frame, and computes RMS from the reconstructed samples
    normalized by 2^(bps-1)."""
    import numpy as np

    if payload[:4] != b"fLaC" or len(payload) < 42:
        return None
    pos, def_rate, def_bps = 4, 0, 0
    last = False
    while not last:
        if pos + 4 > len(payload):
            return None
        head = payload[pos]
        last, btype = bool(head & 0x80), head & 0x7F
        ln = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + ln]
        if btype == 0:  # STREAMINFO
            if ln < 34:
                return None
            bits = int.from_bytes(body[10:18], "big")
            def_rate = bits >> 44
            def_bps = ((bits >> 36) & 0x1F) + 1
        pos += 4 + ln
    nsamp = 0
    sumsq = 0.0
    rate = 0
    try:
        while pos < len(payload):
            pos, rate, chans = _flac_frame(payload, pos, def_rate, def_bps)
            nsamp += len(chans[0])
            for ch in chans:
                a = np.asarray(ch, dtype=np.float64)
                sumsq += float(np.sum(a * a)) / len(chans)
    except Exception:
        return None  # CRC mismatch / reserved field / truncation: fail closed
    if not nsamp or not rate:
        return None
    scale = float(1 << (def_bps - 1)) if def_bps else 32768.0
    rms = math.sqrt(sumsq / nsamp) / scale
    return round(nsamp / rate, 6), int(rate), round(rms, 6)


# ----------------------------------------------------------- MP4/MOV/M4A
# ISO BMFF container walk (ISO/IEC 14496-12 box grammar + the QuickTime
# File Format sample-table layout it standardized): moov/trak/mdia/stbl
# parse with stts/stsc/stsz/stco(co64) sample materialization. Video
# tracks whose sample-entry codec is JPEG ('jpeg'/'mjpa' — Motion-JPEG
# samples are interchange-format JPEG streams the built-in T.81 kernel
# decodes) yield real frames; uncompressed PCM audio tracks ('sowt',
# 'twos', 'raw ', 'fl32') yield real RMS; every other codec (avc1/hevc/
# mp4a-AAC...) is library-gated — container metadata (duration, rate,
# timing) is still parsed exactly, samples are not decoded. Malformed
# or truncated box trees fail the payload closed.

def _mp4_boxes(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, box_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        size = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("bmff: truncated largesize")
            size = int.from_bytes(payload[pos + 8 : pos + 16], "big")
            body = pos + 16
            if size < 16:
                raise ValueError("bmff: bad largesize")
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        elif size < 8:
            raise ValueError("bmff: bad box size")
        if pos + size > end:
            raise ValueError("bmff: truncated box")
        yield typ, body, pos + size
        pos += size


def _mp4_child(payload: bytes, pos: int, end: int, typ: bytes):
    for t, b, e in _mp4_boxes(payload, pos, end):
        if t == typ:
            return b, e
    return None


def _mp4_u32s(payload: bytes, pos: int, n: int):
    import numpy as np

    if pos + 4 * n > len(payload):
        raise ValueError("bmff: truncated table")
    return np.frombuffer(payload, dtype=">u4", count=n, offset=pos).astype("int64")


def _mp4_tracks(payload: bytes):
    """Parse the moov of an ISO BMFF payload into per-track dicts:
    {handler, codec, timescale, duration_sec, width, height, channels,
    sample_rate, samples: [(offset, size)...], deltas: media-ticks per
    sample}. Requires the standard 'ftyp' signature at offset 4. Raises
    on structural damage; returns [] when there is no moov."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    moov = _mp4_child(payload, 0, len(payload), b"moov")
    if moov is None:
        return []
    tracks = []
    for t, b, e in _mp4_boxes(payload, *moov):
        if t != b"trak":
            continue
        mdia = _mp4_child(payload, b, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _mp4_child(payload, *mdia, b"mdhd")
        hdlr = _mp4_child(payload, *mdia, b"hdlr")
        minf = _mp4_child(payload, *mdia, b"minf")
        if not (mdhd and hdlr and minf):
            continue
        stbl = _mp4_child(payload, *minf, b"stbl")
        if stbl is None:
            continue
        ver = payload[mdhd[0]]
        if ver == 1:  # 64-bit creation/modification/duration
            timescale = int.from_bytes(payload[mdhd[0] + 20 : mdhd[0] + 24], "big")
            duration = int.from_bytes(payload[mdhd[0] + 24 : mdhd[0] + 32], "big")
        else:
            timescale = int.from_bytes(payload[mdhd[0] + 12 : mdhd[0] + 16], "big")
            duration = int.from_bytes(payload[mdhd[0] + 16 : mdhd[0] + 20], "big")
        if timescale == 0:
            raise ValueError("bmff: zero timescale")
        handler = payload[hdlr[0] + 8 : hdlr[0] + 12]

        stsd = _mp4_child(payload, *stbl, b"stsd")
        stts = _mp4_child(payload, *stbl, b"stts")
        stsc = _mp4_child(payload, *stbl, b"stsc")
        stsz = _mp4_child(payload, *stbl, b"stsz")
        stco = _mp4_child(payload, *stbl, b"stco")
        co64 = _mp4_child(payload, *stbl, b"co64")
        if not (stsd and stts and stsc and stsz and (stco or co64)):
            continue

        # first sample entry: codec fourcc + the fixed-layout AV fields
        entry = stsd[0] + 8
        codec = payload[entry + 4 : entry + 8]
        width = height = channels = rate = None
        if handler == b"vide" and entry + 36 <= stsd[1]:
            width = int.from_bytes(payload[entry + 32 : entry + 34], "big")
            height = int.from_bytes(payload[entry + 34 : entry + 36], "big")
        elif handler == b"soun" and entry + 36 <= stsd[1]:
            channels = int.from_bytes(payload[entry + 24 : entry + 26], "big")
            rate = int.from_bytes(payload[entry + 32 : entry + 34], "big")  # 16.16

        # stts -> per-sample deltas (media ticks)
        n_tt = int.from_bytes(payload[stts[0] + 4 : stts[0] + 8], "big")
        tt = _mp4_u32s(payload, stts[0] + 8, 2 * n_tt).reshape(-1, 2)
        import numpy as np

        if int(tt[:, 0].sum()) > 1_000_000:
            raise ValueError("bmff: stts sample count out of bounds")
        deltas = np.repeat(tt[:, 1], tt[:, 0])

        # stsz -> per-sample sizes
        fixed_sz = int.from_bytes(payload[stsz[0] + 4 : stsz[0] + 8], "big")
        n_samples = int.from_bytes(payload[stsz[0] + 8 : stsz[0] + 12], "big")
        if n_samples > 1_000_000:
            raise ValueError("bmff: stsz sample count out of bounds")
        if fixed_sz:
            sizes = np.full(n_samples, fixed_sz, dtype="int64")
        else:
            sizes = _mp4_u32s(payload, stsz[0] + 12, n_samples)

        # stco/co64 chunk offsets + stsc runs -> absolute (offset, size)
        if stco:
            n_ch = int.from_bytes(payload[stco[0] + 4 : stco[0] + 8], "big")
            offs = _mp4_u32s(payload, stco[0] + 8, n_ch)
        else:
            n_ch = int.from_bytes(payload[co64[0] + 4 : co64[0] + 8], "big")
            if co64[0] + 8 + 8 * n_ch > len(payload):
                raise ValueError("bmff: truncated co64")
            offs = np.frombuffer(
                payload, dtype=">u8", count=n_ch, offset=co64[0] + 8
            ).astype("int64")
        n_sc = int.from_bytes(payload[stsc[0] + 4 : stsc[0] + 8], "big")
        sc = _mp4_u32s(payload, stsc[0] + 8, 3 * n_sc).reshape(-1, 3)

        samples: list[tuple[int, int]] = []
        si = 0
        for ri in range(n_sc):
            first = int(sc[ri, 0])
            per = int(sc[ri, 1])
            last = int(sc[ri + 1, 0]) - 1 if ri + 1 < n_sc else n_ch
            if first < 1 or last < first - 1 or per < 0:
                raise ValueError("bmff: bad stsc run")
            for ch in range(first - 1, last):
                pos = int(offs[ch])
                for _ in range(per):
                    if si >= n_samples:
                        break
                    sz = int(sizes[si])
                    if pos + sz > len(payload):
                        raise ValueError("bmff: sample past EOF")
                    samples.append((pos, sz))
                    pos += sz
                    si += 1
        samples = samples[:n_samples]

        tracks.append(
            {
                "handler": handler,
                "codec": codec,
                "timescale": timescale,
                "duration_sec": duration / timescale,
                "width": width,
                "height": height,
                "channels": channels,
                "sample_rate": rate,
                "samples": samples,
                "deltas": deltas,
            }
        )
    return tracks


def _mp4_frames(payload: bytes, max_frames: int = 64):
    """MP4/MOV -> [(delay_centisec, HxWx3 uint8), ...] for a JPEG-codec
    video track, or None (no such track / not BMFF / damaged)."""
    import numpy as np

    try:
        tracks = _mp4_tracks(payload)
    except Exception:
        return None
    if not tracks:
        return None
    frames = []
    for tr in tracks:
        if tr["handler"] != b"vide" or tr["codec"] not in (b"jpeg", b"mjpa"):
            continue
        ts = tr["timescale"]
        for i, (off, sz) in enumerate(tr["samples"][:max_frames]):
            try:
                img = _decode_jpeg(payload[off : off + sz])
            except Exception:
                img = None
            if img is None:
                continue
            if img.shape[2] == 1:
                img = np.repeat(img, 3, axis=2)
            d = int(tr["deltas"][i]) if i < len(tr["deltas"]) else 0
            frames.append((d / ts * 100.0, img[:, :, :3]))
        if frames:
            break
    return frames or None


def _decode_mp4_video(payload: bytes):
    """First decodable JPEG-codec frame of an MP4/MOV, for decode_image."""
    frames = _mp4_frames(payload, max_frames=1)
    return frames[0][1] if frames else None


# QuickTime uncompressed-PCM audio codecs the built-in kernel reconstructs
_MP4_PCM = {
    b"sowt": ("<i2", 32768.0),  # s16 little-endian
    b"twos": (">i2", 32768.0),  # s16 big-endian
    b"raw ": ("u1", None),      # u8 offset-binary
    b"fl32": (">f4", 1.0),      # float32 big-endian
}


def _decode_mp4_audio(payload: bytes):
    """(duration_sec, sample_rate, rms|None) for the first audio track of
    an MP4/MOV/M4A. Duration and rate come from the container's exact
    mdhd/stsd fields for ANY codec; RMS is reconstructed only for the
    uncompressed PCM codecs (AAC etc. stay library-gated -> null RMS)."""
    import numpy as np

    tracks = _mp4_tracks(payload)
    if not tracks:
        return None
    for tr in tracks:
        if tr["handler"] != b"soun":
            continue
        rate = tr["sample_rate"] or tr["timescale"]
        rms = None
        fmt = _MP4_PCM.get(tr["codec"])
        if fmt is not None and tr["samples"]:
            dt, scale = fmt
            raw = b"".join(payload[o : o + s] for o, s in tr["samples"])
            x = np.frombuffer(raw, dtype=dt).astype(np.float64)
            if x.size:
                if scale is None:
                    x = (x - 128.0) / 128.0
                else:
                    x = x / scale
                rms = round(float(np.sqrt(np.mean(x * x))), 6)
        return round(tr["duration_sec"], 6), int(rate), rms
    return None


def sample_frames(df: DataFrame, n_frames: int, fps: float = 1.0) -> DataFrame:
    """REAL frame sampling for the motion formats the built-in codecs
    cover: animated GIF (frame walk + minimal compositing in
    ``_gif_frames``), AVI with MJPEG or uncompressed DIB video
    (``_avi_frames``: RIFF walk, strh scale/rate timing, frames decoded
    by the built-in JPEG/BMP kernels), and MP4/MOV with a JPEG-codec
    video track (``_mp4_frames``: ISO BMFF box walk, stts timing,
    stsc/stsz/stco sample materialization). Each payload yields up to
    n_frames evenly spaced frames re-encoded as binary PPM; ts_sec
    comes from the container's frame timing, falling back to
    frame_idx/fps when the file carries none. Other payloads (real
    video codecs are library-gated) produce ZERO rows — same 1->N
    mapInPandas shape as fake_sample_frames, so the fake remains the
    shape-contract fixture."""
    import pandas as pd

    if n_frames <= 0:
        raise ValueError("sample_frames: n_frames must be positive")

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np

        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            rows = {"path": [], "frame_idx": [], "ts_sec": [], "frame": []}
            for path, b in zip(meta["path"], pdf["content"]):
                # a truncated/corrupt GIF/AVI (valid magic, short blocks)
                # must yield zero rows, not fail the query — same
                # per-payload guard contract as _decode_payload
                raw = bytes(b) if b is not None else b""
                try:
                    frames = _gif_frames(raw)
                    if not frames:
                        frames = _avi_frames(raw)
                    if not frames:
                        frames = _mp4_frames(raw)
                except Exception:
                    continue
                if not frames:
                    continue
                starts = np.cumsum([0.0] + [d / 100.0 for d, _ in frames[:-1]])
                k = min(n_frames, len(frames))
                picks = sorted(set(round(i * (len(frames) - 1) / max(k - 1, 1)) for i in range(k)))
                for out_ix, fi in enumerate(picks):
                    _, img = frames[fi]
                    h, w, _ = img.shape
                    ts = float(starts[fi]) if starts[-1] > 0 else out_ix / fps
                    rows["path"].append(path)
                    rows["frame_idx"].append(fi)
                    rows["ts_sec"].append(round(ts, 6))
                    rows["frame"].append(
                        b"P6" + f"\n{w} {h}\n255\n".encode()
                        + bytes(img[..., :3].reshape(-1))
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, FRAME_SCHEMA)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio features for RIFF/WAVE PCM payloads (8/16-bit int,
    32-bit float) and native FLAC (full frame decode, all subframe types,
    CRC-validated): duration, sample rate, RMS — stdlib + numpy only.
    MPEG audio (mp3) gets an exact header frame-walk — true duration and
    sample rate, null RMS (sample reconstruction stays library-gated).
    MP4/MOV/M4A audio tracks get exact container duration/rate for any
    codec, plus real RMS when the codec is uncompressed PCM
    (sowt/twos/raw/fl32); AAC samples stay library-gated."""
    import pandas as pd

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = pd.DataFrame(list(pdf["meta"]))
            feats = []
            for b in pdf["content"]:
                raw = bytes(b) if b is not None else b""
                r = _decode_wav(raw)
                if r is None:
                    try:
                        r = _decode_flac(raw)
                    except Exception:
                        r = None
                if r is None:
                    try:
                        r = _decode_mp3(raw)
                    except Exception:
                        r = None
                if r is None:
                    try:
                        r = _decode_mp4_audio(raw)
                    except Exception:
                        r = None
                feats.append(r if r is not None else (None, None, None))
            yield pd.DataFrame(
                {
                    "path": meta["path"],
                    "duration_sec": [f[0] for f in feats],
                    "sample_rate": [f[1] for f in feats],
                    "rms": [f[2] for f in feats],
                }
            )

    return df.mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
