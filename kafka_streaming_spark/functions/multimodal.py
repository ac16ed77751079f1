"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The Spark-side plumbing — schema contracts, batch iteration shape,
partition behavior — is real and tested, and so are the codecs for the
three formats stdlib can express:

- **PNG** (``encode_png`` / ``decode_png``): a real, spec-conformant subset
  — 8-bit depth, gray/gray-alpha/RGB/RGBA, zlib-compressed IDAT, all five
  scanline filters (None/Sub/Up/Average/Paeth), CRC-validated chunks.
  Pure ``zlib`` + ``struct`` + numpy unfiltering; no imaging library.
- **WAV** (``encode_wav`` / ``decode_wav``): 16-bit PCM through the stdlib
  ``wave`` module.
- **AVI** (``encode_avi`` / ``decode_avi``): the uncompressed raw-frame
  RIFF subset (DIB video stream, 24-bit BGR bottom-up rows) via ``struct``
  — real container parsing for the frame-sampling operator.

Payloads that are not PNG/WAV fall back to a clearly-labeled deterministic
byte-fold stand-in (``_fold_decode``), so the operators stay total over
arbitrary binary columns.  On a real cluster you'd swap the fallbacks for
PIL/ffmpeg without touching any Spark code — the operator shape
(mapInPandas over binary + metadata columns) is exactly what runs at
100 TB, where decode CPU dominates and Arrow batching amortizes the Python
boundary.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# Real PNG codec (stdlib zlib/struct + numpy)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (8-bit depth only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_CTYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor (spec §9.4), vectorized."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an ``(h, w)`` or ``(h, w, ch)`` uint8 array as a real PNG.

    The per-row filter cycles through all five PNG filter types (row % 5),
    so a decode round-trip exercises every unfilter path — deliberate: the
    registry query's analytic oracle can only pass if *all* filters invert
    correctly."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, ch = pixels.shape
    zero = np.zeros((1, ch), np.int32)
    raw = bytearray()
    prev = np.zeros((w, ch), np.int32)
    for r in range(h):
        row = pixels[r].astype(np.int32)
        left = np.vstack([zero, row[:-1]])
        f = r % 5
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - (left + prev) // 2
        else:
            upleft = np.vstack([zero, prev[:-1]])
            filt = row - _paeth(left, prev, upleft)
        raw.append(f)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_CTYPE[ch], 0, 0, 0)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a real (non-interlaced, 8-bit) PNG → (width, height,
    channels, ``(h, w, ch)`` uint8 array).  Validates chunk CRCs and
    implements all five scanline unfilters.  Filters Sub/Average/Paeth
    carry a left-to-right data dependency, so those rows run a per-pixel
    loop — fine for metadata/thumbnail work; wire a C decoder for bulk
    pixel workloads (the mapInPandas contract is unchanged)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, bytearray()
    w = h = ctype = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", data[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
        elif typ == b"IDAT":
            idat.extend(payload)
        elif typ == b"IEND":
            break
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    out = np.zeros((h, w, ch), np.uint8)
    prev = np.zeros((w, ch), np.int32)
    o = 0
    for r in range(h):
        f = raw[o]
        o += 1
        line = (
            np.frombuffer(raw, np.uint8, stride, o).astype(np.int32).reshape(w, ch)
        )
        o += stride
        if f == 0:
            row = line
        elif f == 2:
            row = (line + prev) % 256
        else:
            row = np.zeros((w, ch), np.int32)
            left = np.zeros(ch, np.int32)
            for x in range(w):
                up = prev[x]
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    upleft = prev[x - 1] if x else np.zeros(ch, np.int32)
                    pred = _paeth(left, up, upleft)
                row[x] = (line[x] + pred) % 256
                left = row[x]
        out[r] = row.astype(np.uint8)
        prev = row
    return w, h, ch, out


# ---------------------------------------------------------------------------
# Real WAV codec (stdlib wave)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode an int16 sample array as a real mono 16-bit PCM WAV."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit PCM WAV → (sample_rate, int16 array)."""
    with wave.open(io.BytesIO(data), "rb") as wf:
        if wf.getsampwidth() != 2 or wf.getnchannels() != 1:
            raise ValueError("only mono 16-bit PCM WAV supported")
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    return rate, np.frombuffer(frames, dtype="<i2")

# ---------------------------------------------------------------------------
# Real AVI codec (raw-frame RIFF container, stdlib struct)
# ---------------------------------------------------------------------------

_AVI_SIG = (b"RIFF", b"AVI ")


def _dib_rows(frame: np.ndarray) -> bytes:
    """One uncompressed DIB image: BGR byte order, bottom-up rows, each row
    zero-padded to a 4-byte boundary (the BMP/AVI '00db' payload format)."""
    h, w, _ = frame.shape
    bgr = frame[::-1, :, ::-1]  # bottom-up + RGB→BGR
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    if pad:
        padded = np.zeros((h, row_bytes + pad), np.uint8)
        padded[:, :row_bytes] = bgr.reshape(h, row_bytes)
        return padded.tobytes()
    return bgr.tobytes()


def encode_avi(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode an ``(n, h, w, 3)`` uint8 array as a real uncompressed AVI:
    RIFF('AVI ') → LIST('hdrl') with avih/strh/strf headers → LIST('movi')
    of raw '00db' DIB frames.  The subset every AVI reader accepts
    ('DIB '-handler video stream, 24-bit, no index needed for sequential
    readers); written with stdlib ``struct`` only."""
    n, h, w, ch = frames.shape
    if ch != 3:
        raise ValueError("encode_avi expects (n, h, w, 3) RGB frames")
    frame_payloads = [_dib_rows(frames[i]) for i in range(n)]
    frame_size = len(frame_payloads[0]) if frame_payloads else 0

    def chunk(ckid: bytes, payload: bytes) -> bytes:
        return ckid + struct.pack("<I", len(payload)) + payload + (b"\x00" * (len(payload) & 1))

    def lst(listtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", listtype + payload)

    us_per_frame = round(1_000_000 / fps)
    avih = struct.pack(
        "<10I", us_per_frame, frame_size * fps, 0, 0, n, 0, 1, frame_size, w, h
    ) + b"\x00" * 16
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", p) for p in frame_payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi(data: bytes) -> tuple[int, np.ndarray]:
    """Decode the raw-frame AVI subset → (fps, ``(n, h, w, 3)`` uint8 RGB
    frames).  Walks the RIFF chunk tree with ``struct`` (sequential read,
    no idx1 needed), inverts the DIB row layout (bottom-up, BGR, 4-byte row
    padding)."""
    if data[:4] != _AVI_SIG[0] or data[8:12] != _AVI_SIG[1]:
        raise ValueError("not an AVI payload")

    def chunks(off: int, end: int):
        while off + 8 <= end:
            ckid = data[off : off + 4]
            (size,) = struct.unpack("<I", data[off + 4 : off + 8])
            yield ckid, off + 8, size
            off += 8 + size + (size & 1)

    us_per_frame = w = h = None
    payloads: list[bytes] = []
    for ckid, off, size in chunks(12, 8 + struct.unpack("<I", data[4:8])[0]):
        if ckid != b"LIST":
            continue
        listtype = data[off : off + 4]
        if listtype == b"hdrl":
            for ckid2, off2, size2 in chunks(off + 4, off + size):
                if ckid2 == b"avih":
                    vals = struct.unpack("<10I", data[off2 : off2 + 40])
                    us_per_frame, w, h = vals[0], vals[8], vals[9]
        elif listtype == b"movi":
            for ckid2, off2, size2 in chunks(off + 4, off + size):
                if ckid2 == b"00db":
                    payloads.append(data[off2 : off2 + size2])
    if us_per_frame is None or w is None:
        raise ValueError("missing avih header")
    stride = w * 3 + ((-(w * 3)) % 4)
    frames = np.zeros((len(payloads), h, w, 3), np.uint8)
    for i, p in enumerate(payloads):
        rows = np.frombuffer(p, np.uint8).reshape(h, stride)[:, : w * 3]
        frames[i] = rows.reshape(h, w, 3)[::-1, :, ::-1]  # un-flip, BGR→RGB
    return round(1_000_000 / us_per_frame), frames


#: Contract for a multimodal asset row (binary payload + typed metadata).
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def _fold_decode(payload: bytes) -> tuple[int, int, int]:
    """Fallback pseudo-metadata for payloads in no recognized container
    format: a deterministic byte-fold over the prefix (clearly labeled —
    real formats take the PNG/WAV paths above)."""
    n = len(payload)
    h = 0
    for b in payload[:16]:
        h = (h * 131 + b) % 1_000_003
    return (64 + h % 1024, 64 + (h // 1024) % 1024, 1 + n % 4)


def _meta_of(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) — real IHDR parse for PNG payloads (header
    only, no pixel inflate), byte-fold fallback otherwise."""
    if payload[:8] == _PNG_SIG:
        w, h, _depth, ctype, _c, _f, _i = struct.unpack(">IIBBBBB", payload[16:29])
        return (w, h, _PNG_CHANNELS[ctype])
    return _fold_decode(payload)


def decode_image_meta(assets: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """Extract image metadata via Arrow-batched ``mapInPandas``: PNG
    payloads get a real IHDR parse (no pixel decompression — metadata scans
    shouldn't inflate 100 TB of IDAT), others the byte-fold fallback.

    The iterator-of-DataFrames shape means constant memory per task
    regardless of partition size — the decode loop sees pandas batches of
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_meta_of(p if p is not None else b"") for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                }
            )

    return assets.mapInPandas(decode, IMAGE_META_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(assets: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize via mapInPandas with the target shape pinned in the output
    schema.  PNG payloads are really decoded, nearest-neighbor resampled in
    numpy, and re-encoded as PNG; non-PNG payloads keep the deterministic
    byte down/up-sampling fallback so the operator stays total.  (Swap
    nearest-neighbor for PIL's Lanczos on a real cluster; the Spark
    contract — Arrow batches in, fixed schema out — is unchanged.)"""
    target = width * height

    def resize_one(p: bytes) -> bytes:
        if p[:8] == _PNG_SIG:
            w0, h0, _ch, px = decode_png(p)
            ys = (np.arange(height) * h0) // height
            xs = (np.arange(width) * w0) // width
            return encode_png(px[ys][:, xs])
        if len(p) >= target:
            step = len(p) // target
            return bytes(p[i * step] for i in range(target))
        reps = target // max(len(p), 1) + 1
        return (p * reps)[:target]

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "payload": [resize_one(p if p is not None else b"") for p in pdf["payload"]],
                }
            )

    return assets.mapInPandas(do_resize, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), True),
    ]
)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Frame sampling for video payloads: fan each asset out to every
    ``every_n``-th frame (1→N rows inside ``mapInPandas`` — no explode of
    materialized frame arrays through a shuffle).

    AVI payloads (the real stdlib codec above) are DECODED: each sampled
    frame is emitted as a standalone PNG, i.e. the keyframe-extraction
    step of a multimodal training pipeline end-to-end in real container
    formats.  Unrecognized payloads keep the fixed-size byte-slice
    fallback (shape/schema contract identical) — swap in an ffmpeg reader
    for codecs beyond raw DIB."""

    def do_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for asset_id, p in zip(pdf["asset_id"], pdf["payload"]):
                p = p if p is not None else b""
                if p[:4] == _AVI_SIG[0] and p[8:12] == _AVI_SIG[1]:
                    _fps, decoded = decode_avi(p)
                    for f in range(0, len(decoded), every_n):
                        ids.append(asset_id)
                        idxs.append(f)
                        frames.append(encode_png(decoded[f]))
                    continue
                n_frames = max(len(p) // frame_bytes, 1)
                for f in range(0, n_frames, every_n):
                    ids.append(asset_id)
                    idxs.append(f)
                    frames.append(p[f * frame_bytes : (f + 1) * frame_bytes])
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(do_sample, FRAME_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("window_idx", IntegerType(), False),
        StructField("energy", LongType(), True),
        StructField("zero_crossings", IntegerType(), True),
    ]
)


def extract_audio_features(assets: DataFrame, window_bytes: int = 512) -> DataFrame:
    """Audio feature extraction: per fixed-size window, emit (energy,
    zero-crossing-count) — stand-ins for MFCC/spectrogram features (swap
    the numpy body for librosa on a real cluster).  WAV payloads are
    really decoded (stdlib ``wave``) and windowed over int16 PCM samples
    (window = ``window_bytes // 2`` samples); other payloads window the
    raw bytes centered at 128.  Same 1→N fan-out shape as
    ``sample_frames``; vectorized in numpy per Arrow batch."""

    def windows_of(p: bytes) -> np.ndarray:
        if p[:4] == b"RIFF":
            _rate, pcm = decode_wav(p)
            return pcm.astype(np.int64), window_bytes // 2
        buf = np.frombuffer(p, dtype=np.uint8).astype(np.int64) - 128
        return buf, window_bytes

    def do_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, energies, zcs = [], [], [], []
            for asset_id, p in zip(pdf["asset_id"], pdf["payload"]):
                samples, wlen = windows_of(p if p is not None else b"")
                n_win = max(len(samples) // wlen, 1)
                for w in range(n_win):
                    win = samples[w * wlen : (w + 1) * wlen]
                    ids.append(asset_id)
                    idxs.append(w)
                    energies.append(int((win * win).sum()))
                    zcs.append(int((np.signbit(win[1:]) != np.signbit(win[:-1])).sum()))
            yield pd.DataFrame(
                {"asset_id": ids, "window_idx": idxs, "energy": energies, "zero_crossings": zcs}
            )

    return assets.mapInPandas(do_extract, AUDIO_FEATURE_SCHEMA)


PIXELS_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("pixels", BinaryType(), True),
    ]
)


def decode_image_pixels(assets: DataFrame) -> DataFrame:
    """Full PNG pixel decode via Arrow-batched ``mapInPandas``: inflate
    IDAT, undo all five scanline filters, and emit the pixel tensor as a
    flat row-major ``(h, w, ch)`` uint8 binary column — the layout a
    downstream training pipeline feeds straight into a tensor framework.
    Non-PNG payloads yield a NULL pixel column (schema-stable: filter on
    ``pixels IS NOT NULL`` downstream)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, pxs = [], [], [], [], []
            for asset_id, p in zip(pdf["asset_id"], pdf["payload"]):
                p = p if p is not None else b""
                ids.append(asset_id)
                if p[:8] == _PNG_SIG:
                    w, h, ch, px = decode_png(p)
                    ws.append(w)
                    hs.append(h)
                    chs.append(ch)
                    pxs.append(px.tobytes())
                else:
                    ws.append(0)
                    hs.append(0)
                    chs.append(0)
                    pxs.append(None)
            yield pd.DataFrame(
                {"asset_id": ids, "width": ws, "height": hs, "channels": chs, "pixels": pxs}
            )

    return assets.mapInPandas(decode, PIXELS_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("hash_hi", LongType(), True),
        StructField("hash_lo", LongType(), True),
    ]
)


def average_hash(decoded: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual AVERAGE HASH (aHash) over decoded pixel tensors — the
    image near-dup fingerprint: nearest-neighbor downsample to
    ``grid×grid``, integer grayscale ``(r+g+b)//3``, then one bit per
    cell set iff the cell is at least the image mean (compared as
    ``gray·grid² ≥ sum`` — integer cross-multiplication, no division, so
    the bit pattern is bit-identical in any reimplementation).  Returns
    the 64-bit hash split into two LongType halves (``hash_hi`` bits
    63..32, ``hash_lo`` bits 31..0) to stay clear of signed overflow.

    Every arithmetic step is integer (`(dst·extent)//grid` index math,
    floor-div grayscale, cross-multiplied threshold) — the same
    portability contract as the text/dedup stacks, which is what lets a
    SQL oracle replay the hash analytically.  Near-identical images
    (small sparse perturbations) collapse to the same hash; bucketing on
    it is the multimodal analogue of exact text dedup, and Hamming-ball
    expansion over the two halves is the LSH-style near path.  Scale
    shape: one Arrow ``mapInPandas`` pass over the decoded tensors, no
    shuffle; the downstream dedup is a hash groupBy."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        g2 = grid * grid
        for pdf in batches:
            ids, his, los = [], [], []
            for asset_id, w, h, ch, px in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["channels"], pdf["pixels"]
            ):
                ids.append(asset_id)
                if px is None or w == 0 or h == 0:
                    his.append(None)
                    los.append(None)
                    continue
                arr = np.frombuffer(px, np.uint8).reshape(int(h), int(w), int(ch))
                si = (np.arange(grid) * int(h)) // grid
                sj = (np.arange(grid) * int(w)) // grid
                small = arr[si][:, sj].astype(np.int64)
                gray = small.sum(axis=2) // int(ch)  # (r+g+b)//3, exact ints
                total = int(gray.sum())
                bits = (gray.reshape(-1) * g2 >= total).astype(np.int64)
                hi = 0
                lo = 0
                for p, b in enumerate(bits):
                    if not b:
                        continue
                    if p < 32:
                        lo |= 1 << p
                    else:
                        hi |= 1 << (p - 32)
                his.append(hi)
                los.append(lo)
            yield pd.DataFrame({"asset_id": ids, "hash_hi": his, "hash_lo": los})

    return decoded.mapInPandas(hash_batch, AHASH_SCHEMA)
