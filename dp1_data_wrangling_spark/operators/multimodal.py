"""Multimodal (image/audio/video) column handling (north star).

Media are opaque ``binary`` payload columns + typed metadata, exactly as a
100 TB multimodal corpus stores them (the bytes travel in parquet; decode
happens executor-side).  The Spark-side plumbing — schema, partitioning,
Arrow batch shape, mapInPandas signatures — is real and tested.

Codec surface (rounds 7-8): UNCOMPRESSED formats decode for real, in
pure numpy — PPM (P6) and BMP (24-bit BI_RGB) images, WAV (PCM16) audio,
Y4M (C444) video — so resize / checksum operate on actual pixels and
samples; integer pixel math keeps every stat oracle-replayable in SQL.
Round 8 adds REAL compressed decode for PNG (8-bit RGB): stdlib zlib
inflate + the full filter set (None/Sub/Up/Average/Paeth) — exact
integer math, so PNG stats stay oracle-replayable too.  Lossy formats
(JPEG/MP3/MP4/...) still route to ``decode_media_stub``, which raises
NotImplementedError: those need codec libraries absent from this
container, and a silent fake would be worse than an honest stub.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    payload = utf-8 bytes of the text, fake image metadata from lengths."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        (F.col("n_chars") % 1024 + 16).cast("long").alias("width"),
        (F.col("n_chars") % 768 + 16).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_media_stub(payload: bytes, media_type: str) -> object:
    """The real decode hook (PIL/ffmpeg/soundfile would go here).

    Kept as an explicit stub: the container has no media codecs.  Swap in
    a real implementation without touching the Spark plumbing."""
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libraries "
        "not present in this environment"
    )


N_FAKE_FEATURES = 8


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, schema-declared.

    Uses ``fake_decode_features`` (deterministic md5-derived floats) in
    place of a codec; the dataflow (binary in, float vector out, batch
    shape, partition preservation) is the real thing."""
    import hashlib

    import pandas as pd

    def fake_decode_features(payload: bytes | None) -> tuple[int, list[float]]:
        if payload is None:
            return 0, [0.0] * N_FAKE_FEATURES
        digest = hashlib.md5(payload).digest()
        feats = [digest[i] / 255.0 for i in range(N_FAKE_FEATURES)]
        return len(payload), feats

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [d[0] for d in decoded],
                    "features": [d[1] for d in decoded],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """mapInPandas image resize: aspect-preserving downscale to
    ``max_side``.  The codec call is stubbed (payload passes through; a
    real implementation decodes, resizes, re-encodes inside the same batch
    loop) but the size arithmetic, schema, and Arrow batch shape are real."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # dimensions are nullable (audio/video rows carry duration but
            # no width/height) — NaN would crash the int64 cast
            w = pdf["width"].fillna(0)
            h = pdf["height"].fillna(0)
            scale = (max_side / w.combine(h, max).clip(lower=1)).clip(upper=1.0)
            # floor(x + 0.5), NOT .round(): numpy rounds half-to-even, which
            # no SQL engine replays — half-up keeps the arithmetic
            # oracle-expressible (same IEEE ops in any engine).  Clamp >= 1
            # where the source side exists: an extreme aspect ratio must
            # not round a side to zero pixels (dimension-less audio/video
            # rows keep 0 — they had no raster to begin with).
            ow = np.floor(w * scale + 0.5).astype("int64")
            oh = np.floor(h * scale + 0.5).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.where(w > 0, ow.clip(lower=1), 0),
                    "height": np.where(h > 0, oh.clip(lower=1), 0),
                    # stub: re-encode would happen here (decode_media_stub)
                    "payload": pdf["payload"],
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1_000) -> DataFrame:
    """mapInPandas frame sampling: one output row per ``every_ms`` of
    duration (video → frame table fan-out).  Frame extraction is stubbed
    (payload passes through; ffmpeg would seek+decode per ts) — the
    fan-out shape, schema, and timestamps are real."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "frame_no": [], "ts_ms": [], "payload": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n = 1 if pd.isna(dur) else max(int(dur) // every_ms, 1)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["payload"].append(payload)  # stub: frame bytes
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Real codecs for uncompressed formats (pure numpy — no external libraries)
# ---------------------------------------------------------------------------


_SHIPPED_BY_VALUE = False


def _ship_codecs_by_value() -> None:
    """The external driver imports this package by FILE PATH, driver-side
    only — executor Python workers cannot ``import dp1_data_wrangling_spark``.
    Every other pandas op here is a self-contained closure for exactly that
    reason; the codec functions are shared public API, so instead register
    this module for by-value cloudpickle serialization: closures that call
    ``decode_media``/``encode_ppm``/... then ship the code itself, not an
    unresolvable module reference.

    Process-global side effect: after the first call, every closure pickle
    that references this module carries its code by value.  Guarded so the
    registration (and its pickle-size cost) is paid exactly once."""
    global _SHIPPED_BY_VALUE
    if _SHIPPED_BY_VALUE:
        return
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    _SHIPPED_BY_VALUE = True


def encode_ppm(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as a binary PPM (P6, maxval 255)."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """Decode a binary PPM (P6) into an (h, w, 3) uint8 array.  Handles
    the header grammar (whitespace-separated tokens, # comments)."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    if w < 1 or h < 1:
        # a 0-dimension raster is syntactically encodable but has no
        # pixels to operate on — fail descriptively, not with a
        # downstream IndexError in the resampler
        raise ValueError(f"degenerate PPM raster {w}x{h}")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3).copy()


def encode_bmp(arr) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row padding)."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    bgr = a[::-1, :, ::-1]  # bottom-up, BGR
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    pixel_data = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixel_data), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 0, 0, 0, 0)
    return header + pixel_data


def decode_bmp(payload: bytes):
    """Decode a 24-bit uncompressed (BI_RGB) BMP into an (h, w, 3) uint8
    RGB array (top-down).  Handles bottom-up and top-down row order and
    4-byte row padding."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB supported, got bpp={bpp} compression={compression}"
        )
    h = abs(h_raw)
    if w < 1 or h < 1:
        raise ValueError(f"degenerate BMP raster {w}x{h}")
    row_bytes = (w * 3 + 3) & ~3
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=h * row_bytes, offset=data_offset
    ).reshape(h, row_bytes)
    bgr = raster[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    if h_raw > 0:  # bottom-up (the common case)
        rgb = rgb[::-1]
    return rgb.copy()


def encode_wav(sample_rate: int, samples) -> bytes:
    """Encode mono int16 samples as a PCM WAV (RIFF/WAVE, fmt + data)."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def ulaw_to_linear(u8):
    """Expand G.711 μ-law bytes to linear int16 — the exact CCITT
    integer formula (complement, 4-bit mantissa rebias by 0x84, segment
    shift), vectorized.  Every byte value 0..255 is a valid codeword;
    max magnitude is the standard 32124."""
    import numpy as np

    v = (~np.asarray(u8, dtype=np.uint8)).astype(np.int64) & 0xFF
    t = (((v & 0x0F) << 3) + 0x84) << ((v >> 4) & 0x07)
    return np.where(v & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def decode_wav(payload: bytes):
    """Decode a **mono** WAV — PCM16 (fmt 1, 16-bit) or G.711 μ-law
    (fmt 7, 8-bit, expanded to linear int16): returns (sample_rate,
    int16 samples).  Walks the RIFF chunk list — fmt need not
    immediately precede data (so PCM16 validity checks run after the
    walk, when the format is known).  Multi-channel files are rejected:
    downstream frame slicing (``sample_audio_frames``) treats the
    sample axis as time, which an interleaved stereo stream would
    silently double."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, audio_fmt, rate, data = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if (audio_fmt, bits) not in ((1, 16), (7, 8)):
                raise ValueError(
                    "only PCM16 (fmt=1/16-bit) or mu-law (fmt=7/8-bit) "
                    f"supported, got fmt={audio_fmt} bits={bits}"
                )
            if ch != 1:
                raise ValueError(f"only mono supported, got channels={ch}")
        elif cid == b"data":
            if len(body) != size:
                raise ValueError(
                    f"truncated data chunk: declared {size} bytes, "
                    f"got {len(body)}"
                )
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if audio_fmt == 7:
        return rate, ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
    if len(data) % 2:
        raise ValueError(f"odd data chunk size {len(data)} for PCM16")
    return rate, np.frombuffer(data, dtype="<i2").copy()


def encode_wav_ulaw(sample_rate: int, codewords) -> bytes:
    """Encode mono G.711 μ-law codewords (uint8) as a WAV (RIFF/WAVE,
    fmt code 7, 8 bits/sample, block align 1)."""
    import struct

    import numpy as np

    data = np.asarray(codewords, dtype=np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 7, 1, sample_rate, sample_rate, 1, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png(arr, *, filters=None) -> bytes:
    """Encode an (h, w, 3) uint8 array as an 8-bit RGB PNG (color type
    2) — or an (h, w) array as 8-bit grayscale (color type 0) — no
    interlace, using only stdlib zlib.  ``filters`` optionally gives
    per-row filter types 0-4 (cycled) so tests can exercise every
    unfilter path (Sub/Up/Average/Paeth); default is filter 0 rows."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        bpp, ctype = 1, 0
    elif a.ndim == 3 and a.shape[2] == 3:
        bpp, ctype = 3, 2
    else:
        raise ValueError(f"expected (h, w, 3) or (h, w) array, got shape {a.shape}")
    h, w = a.shape[:2]
    if filters is None:
        filters = [0]
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for r in range(h):
        row = a[r].reshape(-1).astype(np.int64)
        left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
        ft = int(filters[r % len(filters)])
        if ft == 0:
            enc = row
        elif ft == 1:  # Sub
            enc = (row - left) % 256
        elif ft == 2:  # Up
            enc = (row - prev) % 256
        elif ft == 3:  # Average
            enc = (row - (left + prev) // 2) % 256
        elif ft == 4:  # Paeth
            upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
            pa = np.abs(prev - upleft)
            pb = np.abs(left - upleft)
            pc = np.abs(left + prev - 2 * upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (row - pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        raw.append(ft)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Decode an 8-bit RGB (color type 2) or grayscale (color type 0)
    PNG, no interlace, into an (h, w, 3) uint8 array (gray replicates
    into RGB so every downstream image stat sees one raster shape) —
    stdlib zlib inflate + the full filter set (None/Sub/Up/Average/
    Paeth), exact integer math per the PNG spec.  CRCs are verified;
    truncation, palette/alpha/16-bit color types, and interlacing raise
    descriptive ValueErrors (the honest-stub posture: decode correctly
    or fail loudly, never a silent partial raster).  Filter-0 and Up
    rows unfilter vectorized; Sub/Average/Paeth carry an intra-row
    dependency and walk pixels in Python — acceptable for the test
    rasters, and the plumbing is codec-swappable behind the same
    signature."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, w, h, bpp = 8, None, None, 3
    idat = bytearray()
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (0, 2):
                raise ValueError(
                    f"only 8-bit RGB (color type 2) or grayscale (0) "
                    f"supported, got depth={depth} color_type={ctype}"
                )
            bpp = 3 if ctype == 2 else 1
            if comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported compression/filter/interlace "
                    f"{comp}/{filt}/{interlace}"
                )
        elif tag == b"IDAT":
            idat.extend(data)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # per-chunk CRCs can pass while the reassembled deflate stream is
        # corrupt/truncated — keep the decoder's ValueError contract
        raise ValueError(f"corrupt IDAT deflate stream: {exc}") from exc
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"raster size mismatch: expected {h * (stride + 1)} filtered "
            f"bytes, got {len(raw)}"
        )
    out = np.zeros((h, stride), dtype=np.int64)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, r * (stride + 1) + 1
        ).astype(np.int64)
        prev = out[r - 1] if r else np.zeros(stride, np.int64)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: intra-row recurrence
            cur = np.zeros(stride, np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + prev[i]) // 2
                else:
                    b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (line[i] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[r] = cur
    arr = out.astype(np.uint8).reshape(h, w, bpp)
    if bpp == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr


_QOI_MAGIC = b"qoif"
_QOI_END = b"\x00" * 7 + b"\x01"


def _qoi_index(r: int, g: int, b: int, a: int = 255) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def encode_qoi(arr) -> bytes:
    """Encode an (h, w, 3) uint8 array as QOI (qoiformat.org — the
    public-domain 'Quite OK Image' format: RUN / INDEX / DIFF / LUMA /
    RGB ops over a 64-entry recency hash table).  Fully integer and
    sequential; channels=3, sRGB colorspace byte."""
    import struct

    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got shape {a.shape}")
    h, w = a.shape[:2]
    out = bytearray(_QOI_MAGIC + struct.pack(">IIBB", w, h, 3, 0))
    index = [(0, 0, 0)] * 64
    pr = pg = pb = 0
    run = 0
    for px in a.reshape(-1, 3):
        r, g, b = int(px[0]), int(px[1]), int(px[2])
        if (r, g, b) == (pr, pg, pb):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        idx = _qoi_index(r, g, b)
        if index[idx] == (r, g, b):
            out.append(idx)
        else:
            index[idx] = (r, g, b)
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out.extend((0xFE, r, g, b))
        pr, pg, pb = r, g, b
    if run:
        out.append(0xC0 | (run - 1))
    out.extend(_QOI_END)
    return bytes(out)


def decode_qoi(payload: bytes):
    """Decode a QOI (channels=3) payload into an (h, w, 3) uint8 array —
    exact integer replay of the RUN / INDEX / DIFF / LUMA / RGB ops.
    4-channel files, truncation, and a missing end marker raise
    descriptive ValueErrors (same fail-loud contract as the other
    codecs)."""
    import struct

    import numpy as np

    if payload[:4] != _QOI_MAGIC:
        raise ValueError("not a QOI payload")
    if len(payload) < 14 + len(_QOI_END):
        raise ValueError("truncated QOI header")
    w, h, channels, _cs = struct.unpack_from(">IIBB", payload, 4)
    if channels != 3:
        raise ValueError(f"only 3-channel QOI supported, got {channels}")
    if w < 1 or h < 1:
        raise ValueError(f"degenerate QOI raster {w}x{h}")
    if payload[-8:] != _QOI_END:
        raise ValueError("missing QOI end marker")
    data = payload[14:-8]
    n_px = w * h
    out = np.zeros((n_px, 3), dtype=np.uint8)
    index = [(0, 0, 0)] * 64
    r = g = b = 0
    pos = 0
    i = 0
    while i < n_px:
        if pos >= len(data):
            raise ValueError(
                f"truncated QOI stream: {i} of {n_px} pixels decoded"
            )
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # RGB
            if pos + 3 > len(data):
                raise ValueError("truncated QOI_OP_RGB")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:
            raise ValueError("QOI_OP_RGBA in a 3-channel stream")
        else:
            tag = byte >> 6
            if tag == 0:  # INDEX
                r, g, b = index[byte & 0x3F]
            elif tag == 1:  # DIFF
                r = (r + ((byte >> 4) & 3) - 2) % 256
                g = (g + ((byte >> 2) & 3) - 2) % 256
                b = (b + (byte & 3) - 2) % 256
            elif tag == 2:  # LUMA
                if pos >= len(data):
                    raise ValueError("truncated QOI_OP_LUMA")
                dg = (byte & 0x3F) - 32
                b2 = data[pos]
                pos += 1
                r = (r + dg + ((b2 >> 4) & 0xF) - 8) % 256
                g = (g + dg) % 256
                b = (b + dg + (b2 & 0xF) - 8) % 256
            else:  # RUN
                run = (byte & 0x3F) + 1
                if i + run > n_px:
                    raise ValueError("QOI run overflows the raster")
                out[i : i + run] = (r, g, b)
                i += run
                continue
        index[_qoi_index(r, g, b)] = (r, g, b)
        out[i] = (r, g, b)
        i += 1
    return out.reshape(h, w, 3)


def encode_y4m(planes) -> bytes:
    """Encode an (n_frames, 3, h, w) uint8 plane stack as YUV4MPEG2
    (C444 — full-resolution Y/U/V planes, no chroma subsampling)."""
    import numpy as np

    a = np.asarray(planes, dtype=np.uint8)
    if a.ndim != 4 or a.shape[1] != 3:
        raise ValueError(f"expected (n, 3, h, w) array, got shape {a.shape}")
    n, _, h, w = a.shape
    out = [b"YUV4MPEG2 W%d H%d F25:1 Ip A1:1 C444\n" % (w, h)]
    for f in range(n):
        out.append(b"FRAME\n")
        out.append(a[f].tobytes())
    return b"".join(out)


def decode_y4m(payload: bytes):
    """Decode a YUV4MPEG2 (C444) stream: returns (w, h, (n, 3, h, w)
    uint8).  Walks FRAME markers; tolerates frame-header parameters
    (anything between FRAME and newline)."""
    import numpy as np

    if payload[:9] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = None
    colorspace = "420jpeg"  # spec default when no C tag (stripped form)
    for tok in payload[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            colorspace = tok[1:].decode()
    if w is None or h is None:
        raise ValueError("missing W/H in YUV4MPEG2 header")
    if colorspace != "444":
        raise ValueError(f"only C444 supported, got C{colorspace}")
    frame_bytes = 3 * h * w
    frames = []
    pos = nl + 1
    while pos < len(payload):
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {pos}")
        pos = payload.index(b"\n", pos) + 1  # skip frame params
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=frame_bytes, offset=pos)
            .reshape(3, h, w)
        )
        pos += frame_bytes
    stacked = np.stack(frames) if frames else np.zeros((0, 3, h, w), np.uint8)
    return w, h, stacked


def decode_media(payload: bytes, media_type: str):
    """Dispatch on magic bytes: returns ``('image', (h,w,3) uint8)`` for
    PPM/BMP/PNG, ``('audio', (sample_rate, int16 array))`` for WAV,
    ``('video', (w, h, (n,3,h,w) uint8))`` for Y4M; anything else routes
    to the honest stub (NotImplementedError)."""
    if payload is not None:
        if payload[:2] == b"P6":
            return "image", decode_ppm(payload)
        if payload[:2] == b"BM":
            return "image", decode_bmp(payload)
        if payload[:8] == _PNG_MAGIC:
            return "image", decode_png(payload)
        if payload[:4] == _QOI_MAGIC:
            return "image", decode_qoi(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "audio", decode_wav(payload)
        if payload[:9] == b"YUV4MPEG2":
            return "video", decode_y4m(payload)
    return decode_media_stub(payload, media_type)


def nearest_resize(arr, out_h: int, out_w: int):
    """Nearest-neighbor resample with pure integer index math:
    ``out[i, j] = src[(i * h) // out_h, (j * w) // out_w]`` — the exact
    semantics a SQL oracle can replay (no float sampling grid)."""
    import numpy as np

    a = np.asarray(arr)
    h, w = a.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return a[ri][:, ci]


def fit_dims(w: int, h: int, max_side: int) -> tuple[int, int]:
    """Aspect-preserving target size: scale = min(max_side/max(w,h), 1),
    rounded half-up, clamped to >= 1 per side — an extreme aspect ratio
    (e.g. 24x1 at max_side 8) would otherwise round its short side to a
    zero-pixel image (caught by the codec property test)."""
    scale = min(max_side / max(w, h, 1), 1.0)
    return max(int(w * scale + 0.5), 1), max(int(h * scale + 0.5), 1)


DECODE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_values", LongType(), True),
        StructField("value_sum", LongType(), True),
        StructField("out_width", LongType(), True),
        StructField("out_height", LongType(), True),
        StructField("resized_sum", LongType(), True),
    ]
)


def fuse_stages(df: DataFrame, stages, schema) -> DataFrame:
    """Chain pandas-batch stages inside ONE ``mapInPandas`` (guide §4,
    r14): each stage is an ``Iterator[pd.DataFrame] ->
    Iterator[pd.DataFrame]`` transform — the SAME functions the
    standalone operators run (their ``*_batches`` factories below) — so
    intermediate batches (the heavy payload bytes, for synthesize →
    decode chains) stay inside the Python worker instead of crossing
    the Arrow boundary back to the JVM between operators.  Composing
    operators as ``op2(op1(df))`` is result-identical (every stage is
    row-local) but pays the payload transpose+serialize round trip
    twice; the fused plan carries one ``MapInPandas`` node."""
    _ship_codecs_by_value()

    def run(it):
        for stage in stages:
            it = stage(it)
        return it

    return df.mapInPandas(run, schema)


def decode_stats_batches(*, max_side: int = 8):
    """The ``decode_stats`` batch transform, exposed for
    :func:`fuse_stages` composition.  Input batches need
    ``media_id``/``media_type``/``payload``; extra columns are ignored."""
    import pandas as pd

    _ship_codecs_by_value()
    field_names = [f.name for f in DECODE_STATS_SCHEMA.fields]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {n: [] for n in field_names}
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                kind, decoded = decode_media(payload, mtype)
                row: dict[str, object] = dict.fromkeys(out, None)
                row["media_id"] = mid
                row["kind"] = kind
                if kind == "image":
                    arr = decoded
                    h, w = arr.shape[:2]
                    ow, oh = fit_dims(w, h, max_side)
                    resized = nearest_resize(arr, oh, ow)
                    row.update(
                        width=w, height=h,
                        n_values=int(arr.size),
                        value_sum=int(arr.astype("int64").sum()),
                        out_width=ow, out_height=oh,
                        resized_sum=int(resized.astype("int64").sum()),
                    )
                elif kind == "video":
                    w, h, frames = decoded
                    row.update(
                        width=w, height=h,
                        n_values=int(frames.size),
                        value_sum=int(frames.astype("int64").sum()),
                    )
                else:
                    rate, samples = decoded
                    row.update(
                        sample_rate=int(rate),
                        n_values=int(samples.size),
                        value_sum=int(samples.astype("int64").sum()),
                    )
                for k, v in row.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return batches


def decode_stats(media: DataFrame, *, max_side: int = 8) -> DataFrame:
    """REAL decode pass: parse each payload with the numpy codecs, then
    (images) nearest-neighbor-downscale to ``max_side`` and checksum both
    rasters; (audio) checksum the PCM samples.  Everything int — the
    whole path (encode → parse → resample → sum) is SQL-replayable.

    One mapInPandas over the media table: payload bytes never shuffle
    beyond their scan partition, output is a few scalars per row — the
    shape that survives a 100 TB corpus (decode cost scales with bytes
    per executor, the result table is negligible)."""
    return media.mapInPandas(
        decode_stats_batches(max_side=max_side), DECODE_STATS_SCHEMA
    )


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("sample_rate", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("sample_sum", LongType(), False),
    ]
)


def sample_audio_frames(media: DataFrame, *, frame_ms: int = 1_000) -> DataFrame:
    """REAL audio frame fan-out: decode each WAV payload and slice the
    PCM stream into ``frame_ms`` windows — one output row per frame with
    its sample count and integer sample sum (SQL-replayable, like
    ``decode_stats``).  The frame table is what a speech pipeline windows
    over; contrast ``sample_frames``, which fans out metadata with a
    stubbed payload for formats we cannot decode.

    Rows whose payload is not RIFF/WAVE are SKIPPED (an image has no
    sample stream) — filter to the audio modality first if a row-count
    contract matters.  Row-local mapInPandas: zero shuffles, fan-out
    bounded by duration/frame_ms per row."""
    return media.mapInPandas(
        audio_frames_batches(frame_ms=frame_ms), AUDIO_FRAME_SCHEMA
    )


def audio_frames_batches(*, frame_ms: int = 1_000):
    """The ``sample_audio_frames`` batch transform, exposed for
    :func:`fuse_stages` composition (non-RIFF rows skip exactly as the
    standalone operator does)."""
    import pandas as pd

    if frame_ms < 1:
        raise ValueError(f"frame_ms must be >= 1, got {frame_ms}")
    _ship_codecs_by_value()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {f.name: [] for f in AUDIO_FRAME_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    continue
                rate, samples = decode_wav(b)
                spf = max(rate * frame_ms // 1000, 1)
                n = int(samples.size)
                for f in range((n + spf - 1) // spf):
                    chunk = samples[f * spf : (f + 1) * spf]
                    out["media_id"].append(mid)
                    out["frame_no"].append(f)
                    out["ts_ms"].append(f * frame_ms)
                    out["sample_rate"].append(int(rate))
                    out["n_samples"].append(int(chunk.size))
                    out["sample_sum"].append(int(chunk.astype("int64").sum()))
            # explicit int64 dtypes: an all-skipped batch would otherwise
            # yield object-dtype empties that Arrow can't cast
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return batches


VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("n_values", LongType(), False),
        StructField("value_sum", LongType(), False),
    ]
)


def sample_video_frames(media: DataFrame) -> DataFrame:
    """REAL video frame fan-out: decode each Y4M payload and emit one row
    per frame with its dimensions and integer plane-value sum — the
    frame-table shape a vision pipeline samples from, with the same
    SQL-replayable integer discipline as ``decode_stats``.  Non-Y4M rows
    are skipped (compressed video stays behind the honest stub via
    ``sample_frames``).  Row-local mapInPandas: zero shuffles."""
    return media.mapInPandas(video_frames_batches(), VIDEO_FRAME_SCHEMA)


def video_frames_batches():
    """The ``sample_video_frames`` batch transform, exposed for
    :func:`fuse_stages` composition."""
    import pandas as pd

    _ship_codecs_by_value()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {f.name: [] for f in VIDEO_FRAME_SCHEMA.fields}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                if b[:9] != b"YUV4MPEG2":
                    continue
                w, h, frames = decode_y4m(b)
                for f in range(frames.shape[0]):
                    out["media_id"].append(mid)
                    out["frame_no"].append(f)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_values"].append(3 * h * w)
                    out["value_sum"].append(int(frames[f].astype("int64").sum()))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return batches


def synthetic_video(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL Y4M payloads from an id column: w = id%8+4,
    h = id%6+4, n_frames = id%4+2, and plane value
    ``v[f, p, r, c] = (id*7 + f*11 + p*5 + r*3 + c) % 256`` — closed-form
    content, so a SQL oracle replays any frame statistic without touching
    bytes (same contract as ``synthetic_media``)."""
    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        synthetic_video_batches(id_col), MEDIA_SCHEMA
    )


def synthetic_video_batches(id_col: str = "media_id"):
    """The ``synthetic_video`` batch transform, exposed for
    :func:`fuse_stages` composition."""
    import numpy as np
    import pandas as pd

    _ship_codecs_by_value()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "media_type": [], "payload": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h, n = mid % 8 + 4, mid % 6 + 4, mid % 4 + 2
                f = np.arange(n)[:, None, None, None]
                p = np.arange(3)[None, :, None, None]
                r = np.arange(h)[None, None, :, None]
                c = np.arange(w)[None, None, None, :]
                planes = ((mid * 7 + f * 11 + p * 5 + r * 3 + c) % 256).astype(
                    np.uint8
                )
                out["media_id"].append(mid)
                out["media_type"].append("video/x-yuv4mpeg2")
                out["payload"].append(encode_y4m(planes))
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(n * 40)  # 25 fps
            yield pd.DataFrame(out)

    return batches


def synthetic_png(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL compressed payloads from an id column — actual
    zlib-deflated PNGs: w = id%14+4, h = id%10+4; EVEN ids are 8-bit RGB
    (color type 2) with ``pixel[r, c, k] = (id*13 + r*5 + c*11 + k*3) %
    256``; ODD ids are 8-bit GRAYSCALE (color type 0) with
    ``pixel[r, c] = (id*13 + r*5 + c*11) % 256`` (decoded as replicated
    RGB), so both color types run under the external driver check.
    Per-row filter type ``(id + r) % 5`` exercises the whole
    None/Sub/Up/Average/Paeth filter set on both sides of the codec.
    Content is closed-form in the id, so a SQL oracle replays any decode
    statistic without touching bytes — a wrong unfilter (or a CRC/IDAT
    reassembly bug) shows up as a checksum mismatch, because the stats
    are computed from DECODED pixels (same contract as
    ``synthetic_media``)."""
    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        synthetic_png_batches(id_col), MEDIA_SCHEMA
    )


def synthetic_png_batches(id_col: str = "media_id"):
    """The ``synthetic_png`` batch transform, exposed for
    :func:`fuse_stages` composition."""
    import numpy as np
    import pandas as pd

    _ship_codecs_by_value()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "media_type": [], "payload": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = mid % 14 + 4, mid % 10 + 4
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                k = np.arange(3)[None, None, :]
                if mid % 2:
                    arr = (
                        (mid * 13 + r[:, :, 0] * 5 + c[:, :, 0] * 11) % 256
                    ).astype(np.uint8)
                else:
                    arr = ((mid * 13 + r * 5 + c * 11 + k * 3) % 256).astype(
                        np.uint8
                    )
                out["media_id"].append(mid)
                out["media_type"].append("image/png")
                out["payload"].append(
                    encode_png(arr, filters=[(mid + rr) % 5 for rr in range(h)])
                )
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(None)
            yield pd.DataFrame(out)

    return batches


def synthetic_qoi(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL QOI payloads from an id column: w = id%12+4,
    h = id%8+4, ``pixel[r, c, k] = (id*11 + (r//2)*3 + (c//3)*7 + k*5)
    % 256`` — the integer-div terms create 3-pixel horizontal runs and
    row repeats, so the encoder emits the whole RUN/INDEX/DIFF/LUMA/RGB
    op mix (not just raw RGB ops).  Content is closed-form in the id, so
    a SQL oracle replays decode statistics without touching bytes (same
    contract as ``synthetic_png``)."""
    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        synthetic_qoi_batches(id_col), MEDIA_SCHEMA
    )


def synthetic_qoi_batches(id_col: str = "media_id"):
    """The ``synthetic_qoi`` batch transform, exposed for
    :func:`fuse_stages` composition."""
    import numpy as np
    import pandas as pd

    _ship_codecs_by_value()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "media_type": [], "payload": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = mid % 12 + 4, mid % 8 + 4
                r = np.arange(h)[:, None, None]
                c = np.arange(w)[None, :, None]
                k = np.arange(3)[None, None, :]
                arr = (
                    (mid * 11 + (r // 2) * 3 + (c // 3) * 7 + k * 5) % 256
                ).astype(np.uint8)
                out["media_id"].append(mid)
                out["media_type"].append("image/qoi")
                out["payload"].append(encode_qoi(arr))
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(None)
            yield pd.DataFrame(out)

    return batches


def synthetic_media(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL media payloads from an id column — actual PPM /
    BMP / WAV bytes whose content is closed-form in the id, so a SQL
    oracle can replay any decode statistic without touching bytes:

    - id % 3 == 0 → WAV:  n = id%50+10 PCM16 samples at 8 kHz,
      ``s[n] = (id*17 + n*13) % 4096 - 2048``
    - id % 3 == 1 → PPM, id % 3 == 2 → BMP: w = id%16+4, h = id%12+4,
      ``pixel[r, c, k] = (id*31 + r*7 + c*3 + k) % 256``

    Encoding happens executor-side in one mapInPandas (the driver never
    sees a payload)."""
    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        synthetic_media_batches(id_col), MEDIA_SCHEMA
    )


def synthetic_media_batches(id_col: str = "media_id"):
    """The ``synthetic_media`` batch transform, exposed for
    :func:`fuse_stages` composition."""
    import numpy as np
    import pandas as pd

    _ship_codecs_by_value()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "media_type": [], "payload": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for mid in pdf[id_col]:
                mid = int(mid)
                if mid % 3 == 0:
                    n = mid % 50 + 10
                    samples = (mid * 17 + np.arange(n) * 13) % 4096 - 2048
                    payload = encode_wav(8000, samples)
                    mtype, w, h = "audio/wav", None, None
                    dur = n * 1000 // 8000
                else:
                    w, h = mid % 16 + 4, mid % 12 + 4
                    r = np.arange(h)[:, None, None]
                    c = np.arange(w)[None, :, None]
                    k = np.arange(3)[None, None, :]
                    arr = ((mid * 31 + r * 7 + c * 3 + k) % 256).astype(np.uint8)
                    if mid % 3 == 1:
                        payload, mtype = encode_ppm(arr), "image/x-portable-pixmap"
                    else:
                        payload, mtype = encode_bmp(arr), "image/bmp"
                    dur = None
                out["media_id"].append(mid)
                out["media_type"].append(mtype)
                out["payload"].append(payload)
                out["width"].append(w)
                out["height"].append(h)
                out["duration_ms"].append(dur)
            yield pd.DataFrame(out)

    return batches

def synthetic_ulaw(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Deterministic REAL G.711 μ-law WAV payloads from an id column:
    ``n = id % 40 + 8`` codewords at 8 kHz with byte
    ``u[s] = (id*29 + s*19) % 256`` — closed-form content, so a SQL
    oracle can replay the μ-law expansion (complement / rebias / segment
    shift is exact integer math) without touching bytes.  Encoding
    happens executor-side in one mapInPandas (same contract as
    ``synthetic_media``)."""
    return ids.select(F.col(id_col).cast("long")).mapInPandas(
        synthetic_ulaw_batches(id_col), MEDIA_SCHEMA
    )


def synthetic_ulaw_batches(id_col: str = "media_id"):
    """The ``synthetic_ulaw`` batch transform, exposed for
    :func:`fuse_stages` composition."""
    import numpy as np
    import pandas as pd

    _ship_codecs_by_value()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "media_type": [], "payload": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for mid in pdf[id_col]:
                mid = int(mid)
                n = mid % 40 + 8
                u = (mid * 29 + np.arange(n) * 19) % 256
                out["media_id"].append(mid)
                out["media_type"].append("audio/basic")
                out["payload"].append(encode_wav_ulaw(8000, u))
                out["width"].append(None)
                out["height"].append(None)
                out["duration_ms"].append(n * 1000 // 8000)
            yield pd.DataFrame(out)

    return batches

