"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns (``media_type``, ``width``/``height``/``duration_ms``…).
Decode / resize / feature-extract / frame-sample are **actor-pool**
``map_batches`` stages (model/codec state loaded once per actor in
``__init__``).

Codec reality in this container: WAV audio decode is REAL (stdlib
``wave`` → PCM → per-frame RMS, exercised in tests on synthesized
tones), PNG image decode is REAL (pure stdlib ``zlib``/``struct``
codec below: 8-bit gray/RGB/RGBA/gray-alpha, all five row filters,
non-interlaced — round-trip- and cross-filter-tested), and BMP decode
is REAL (uncompressed 24-bit BI_RGB, top-down and bottom-up,
vectorized row unpadding — round-trip-tested). Other image
formats and video codecs are not available, so those calls are STUBBED
behind ``import``-guards: when neither PIL nor the PNG path applies,
each stage falls back to a clearly-marked deterministic fake so the
Ray-side plumbing (schemas, batch sizing for large payloads, actor
signatures, output layout) is still exercised. Swap ``_decode_impl``
for a full decoder in production.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # "image/png", "audio/wav", "video/mp4"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synth_wav(duration_ms: int, freq_hz: float = 440.0, rate: int = 8000) -> bytes:
    """Deterministic PCM16 mono WAV (stdlib ``wave``): a sine tone —
    valid input for the real :func:`decode_wav` path."""
    import io
    import wave

    t = np.arange(int(rate * duration_ms / 1000.0)) / rate
    pcm = (np.sin(2 * np.pi * freq_hz * t) * 0.5 * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_media_table(n: int, seed: int = 9) -> pa.Table:
    """Deterministic media rows for tests: audio rows carry real
    (decodable) WAV payloads, image rows real PNG or BMP payloads
    (gradient + noise, gray or RGB, true width/height metadata), video
    rows opaque random bytes (no video codec in this container)."""
    rng = np.random.default_rng(seed)
    types = ["image/png", "audio/wav", "video/mp4", "image/bmp"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        t = types[i % 4]
        w = h = 0
        if t == "audio/wav":
            payload = synth_wav(int(rng.integers(20, 200)), freq_hz=float(rng.integers(100, 2000)))
        elif t.startswith("image/"):
            h, w = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            grad = np.add.outer(np.arange(h), np.arange(w)) * 3
            img = ((grad + rng.integers(0, 64, size=(h, w))) % 256).astype(np.uint8)
            if t == "image/bmp":
                rgb = np.stack([img, np.flipud(img), np.fliplr(img)], axis=2)
                payload = encode_bmp(rgb)
            else:
                if i % 2:  # alternate gray / RGB
                    img = np.stack([img, np.flipud(img), np.fliplr(img)], axis=2)
                payload = encode_png(img)
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["media_type"].append(t)
        rows["payload"].append(payload)
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(int(rng.integers(1000, 60000)) if not t.startswith("image") else 0)
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type) for k, v in rows.items()})


# ---------------------------------------------------------------------------
# pure-stdlib PNG codec (zlib + struct; no imaging libraries)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth_vec(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (RFC 2083 §6.6)."""
    a16, b16, c16 = a.astype(np.int16), b.astype(np.int16), c.astype(np.int16)
    p = a16 + b16 - c16
    pa_, pb, pc_ = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a16, np.where(pb <= pc_, b16, c16))


def encode_png(arr, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder: 8-bit grayscale (H×W) or RGB (H×W×3),
    one filter type applied to every row. Filter 0 is the production
    shape; types 1-4 exist so tests can exercise the decoder's
    de-filtering against independently generated streams."""
    import struct
    import zlib

    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    else:
        raise ValueError("expected HxW grayscale or HxWx3 RGB uint8")
    h, w = a.shape[:2]
    stride = w * ch
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    zeros = np.zeros(ch, dtype=np.uint8)
    for r in range(h):
        row = a[r].reshape(-1)
        left = np.concatenate([zeros, row[:-ch]]) if stride > ch else np.zeros(stride, np.uint8)
        ul = np.concatenate([zeros, prev[:-ch]]) if stride > ch else np.zeros(stride, np.uint8)
        if filter_type == 0:
            out = row
        elif filter_type == 1:
            out = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:
            out = (row.astype(np.int16) - prev).astype(np.uint8)
        elif filter_type == 3:
            out = (
                row.astype(np.int16) - ((left.astype(np.int16) + prev.astype(np.int16)) >> 1)
            ).astype(np.uint8)
        elif filter_type == 4:
            out = (row.astype(np.int16) - _paeth_vec(left, prev, ul)).astype(np.uint8)
        else:
            raise ValueError("filter_type must be 0-4")
        raw.append(filter_type)
        raw += out.tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray | None:
    """Minimal PNG decoder (stdlib ``zlib`` + numpy): 8-bit depth,
    color types 0/2/4/6 (gray, RGB, gray+alpha, RGBA), all five row
    filters, non-interlaced. Returns H×W (gray) or H×W×C uint8, or
    None when the payload is not a PNG this codec handles — callers
    fall back to PIL (if present) or the deterministic fake. Filters
    None/Up are vectorized; Sub is a per-channel-lane cumulative sum;
    Average/Paeth reconstruct left-to-right (rare in our streams —
    the encoder above emits filter 0)."""
    import struct
    import zlib

    try:
        if not payload.startswith(_PNG_SIG):
            return None
        pos, idat, meta = len(_PNG_SIG), [], None
        while pos + 8 <= len(payload):
            ln, tag = struct.unpack(">I4s", payload[pos : pos + 8])
            data = payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
            if tag == b"IHDR":
                meta = struct.unpack(">IIBBBBB", data)
            elif tag == b"IDAT":
                idat.append(data)
            elif tag == b"IEND":
                break
        if meta is None or not idat:
            return None
        w, h, depth, color, _comp, _filt, interlace = meta
        ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
        if ch is None or depth != 8 or interlace != 0 or w == 0 or h == 0:
            return None
        stride = w * ch
        raw = zlib.decompress(b"".join(idat))
        if len(raw) != h * (stride + 1):
            return None
        rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
        out = np.zeros((h, stride), dtype=np.uint8)
        prev = np.zeros(stride, dtype=np.uint8)
        for r in range(h):
            f = int(rows[r, 0])
            cur = rows[r, 1:]
            if f == 0:
                rec = cur.copy()
            elif f == 1:  # Sub: per-channel-lane prefix sum mod 256
                lanes = cur.reshape(w, ch).astype(np.uint64)
                rec = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(-1)
            elif f == 2:  # Up
                rec = (cur.astype(np.int16) + prev).astype(np.uint8)
            elif f == 3:  # Average (left-recursive)
                rec = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    left = int(rec[i - ch]) if i >= ch else 0
                    rec[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
            elif f == 4:  # Paeth (left-recursive)
                rec = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    left = int(rec[i - ch]) if i >= ch else 0
                    ul = int(prev[i - ch]) if i >= ch else 0
                    up = int(prev[i])
                    p = left + up - ul
                    pa_, pb, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa_ <= pb and pa_ <= pc_) else (up if pb <= pc_ else ul)
                    rec[i] = (int(cur[i]) + pred) & 0xFF
            else:
                return None
            out[r] = rec
            prev = rec
        return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
    except Exception:
        return None


def encode_bmp(arr) -> bytes:
    """Uncompressed 24-bit BI_RGB Windows BMP from an (H, W, 3) uint8
    RGB array — pure stdlib/numpy, fully vectorized (row padding to 4
    bytes, bottom-up row order, BGR channel order per the format)."""
    import struct

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("encode_bmp expects (H, W, 3) uint8 RGB")
    h, w = a.shape[:2]
    row_len = (w * 3 + 3) & ~3
    body = np.zeros((h, row_len), np.uint8)
    body[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    pixels = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def decode_bmp(payload: bytes) -> np.ndarray | None:
    """Decode the uncompressed 24-bit BI_RGB BMP subset (top-down or
    bottom-up) to an (H, W, 3) uint8 RGB array; None when the payload
    is not a BMP this subset covers — the dispatch-chain contract every
    codec here follows."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        offset = struct.unpack_from("<I", payload, 10)[0]
        (hdr_size, w, h, planes, bpp, compression) = struct.unpack_from(
            "<IiiHHI", payload, 14
        )
    except struct.error:
        return None
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0 or w <= 0:
        return None
    flip = h > 0  # positive height = bottom-up storage
    h = abs(h)
    row_len = (w * 3 + 3) & ~3
    if len(payload) < offset + row_len * h:
        return None
    rows = np.frombuffer(payload, np.uint8, row_len * h, offset).reshape(h, row_len)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return (img[::-1] if flip else img).copy()


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class ImageDecodeResize:
    """Actor-pool stage: decode + resize images to (size × size) float
    grayscale arrays. Decode order: PIL (any format, if installed) →
    the pure-stdlib PNG / BMP codecs above (REAL in this container) → a
    DETERMINISTIC FAKE (payload-hash-seeded pixels) for payloads no
    decoder handles, so downstream plumbing is always exercised."""

    def __init__(self, size: int = 32):
        self.size = size
        self.pil = _have_pil()

    def _gray_resize(self, arr: np.ndarray) -> np.ndarray:
        if arr.ndim == 3:
            if arr.shape[2] >= 3:  # RGB / RGBA → ITU-R 601 luma
                g = arr[..., 0] * 0.299 + arr[..., 1] * 0.587 + arr[..., 2] * 0.114
            else:  # gray+alpha
                g = arr[..., 0].astype(np.float32)
        else:
            g = arr.astype(np.float32)
        g = np.asarray(g, dtype=np.float32) / 255.0
        h, w = g.shape
        yi = np.minimum(np.arange(self.size) * h // self.size, h - 1)
        xi = np.minimum(np.arange(self.size) * w // self.size, w - 1)
        return g[np.ix_(yi, xi)].astype(np.float32)

    def _decode_impl(self, payload: bytes) -> np.ndarray:
        if self.pil:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("L").resize((self.size, self.size))
            return np.asarray(img, dtype=np.float32) / 255.0
        arr = decode_png(payload)
        if arr is None:
            arr = decode_bmp(payload)
        if arr is not None:  # REAL stdlib decode (PNG or BMP)
            return self._gray_resize(arr)
        # STUB: deterministic fake pixels from the payload hash
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
        rng = np.random.default_rng(seed)
        return rng.random((self.size, self.size), dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = [t.startswith("image/") for t in batch["media_type"].to_pylist()]
        sub = batch.filter(pa.array(mask))
        pixels = [self._decode_impl(p) for p in sub["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": sub["media_id"],
                "pixels": pa.array([p.flatten().tolist() for p in pixels], pa.list_(pa.float32())),
                "shape": pa.array([[self.size, self.size]] * len(pixels), pa.list_(pa.int32())),
            }
        )


def decode_wav(payload: bytes) -> np.ndarray | None:
    """Decode a RIFF/WAV payload to float32 mono samples in [-1, 1]
    using only the stdlib ``wave`` module (PCM8/PCM16; channels
    averaged). Returns None when the payload is not parseable WAV —
    callers fall back to the deterministic byte fake."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            width = w.getsampwidth()
            ch = w.getnchannels()
            raw = w.readframes(w.getnframes())
    except Exception:
        return None
    if width == 2:
        arr = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        return None
    if ch > 1:
        arr = arr[: len(arr) // ch * ch].reshape(-1, ch).mean(axis=1)
    return arr


def spectral_features(samples: np.ndarray, rate: int = 8000) -> tuple[float, float]:
    """(spectral centroid Hz, spectral bandwidth Hz) of a mono signal —
    real DSP via numpy's rFFT magnitude spectrum, no audio libraries.
    Centroid = magnitude-weighted mean frequency; bandwidth = the
    magnitude-weighted standard deviation around it."""
    if samples.size < 2:
        return 0.0, 0.0
    mag = np.abs(np.fft.rfft(samples.astype(np.float64)))
    freqs = np.fft.rfftfreq(samples.size, d=1.0 / rate)
    total = mag.sum()
    if total <= 0:
        return 0.0, 0.0
    centroid = float((freqs * mag).sum() / total)
    bandwidth = float(np.sqrt((((freqs - centroid) ** 2) * mag).sum() / total))
    return centroid, bandwidth


class AudioFeatures:
    """Actor-pool stage: frame-level audio features. WAV payloads are
    genuinely decoded (stdlib ``wave``) to PCM and reduced to per-frame
    RMS energy plus whole-clip spectral centroid/bandwidth (numpy rFFT
    — a pure sine's centroid lands on its tone frequency, pinned in
    tests); non-WAV payloads (no codec lib in this container) fall
    back to a clearly-marked deterministic byte fake, flagged in the
    ``decoded`` column."""

    def __init__(self, n_frames: int = 16, rate: int = 8000):
        self.n_frames = n_frames
        self.rate = rate

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = [t.startswith("audio/") for t in batch["media_type"].to_pylist()]
        sub = batch.filter(pa.array(mask))
        feats, decoded, centroids, bandwidths = [], [], [], []
        for p in sub["payload"].to_pylist():
            samples = decode_wav(p)
            decoded.append(samples is not None)
            if samples is None:
                samples = np.frombuffer(p, dtype=np.uint8).astype(np.float32)
                frames = np.array_split(samples, self.n_frames)
                feats.append([float(f.mean()) if f.size else 0.0 for f in frames])
                centroids.append(0.0)
                bandwidths.append(0.0)
            else:
                frames = np.array_split(samples, self.n_frames)
                feats.append(
                    [float(np.sqrt(np.mean(f * f))) if f.size else 0.0 for f in frames]
                )
                c, b = spectral_features(samples, self.rate)
                centroids.append(c)
                bandwidths.append(b)
        return pa.table(
            {
                "media_id": sub["media_id"],
                "frame_energy": pa.array(feats, pa.list_(pa.float32())),
                "spectral_centroid_hz": pa.array(centroids, pa.float32()),
                "spectral_bandwidth_hz": pa.array(bandwidths, pa.float32()),
                "decoded": pa.array(decoded, pa.bool_()),
            }
        )


class VideoFrameSample:
    """Actor-pool stage: sample N 'frames' per video. Stubbed: slices the
    payload deterministically (real path: seek + decode keyframes)."""

    def __init__(self, n_frames: int = 4, frame_bytes: int = 64):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = [t.startswith("video/") for t in batch["media_type"].to_pylist()]
        sub = batch.filter(pa.array(mask))
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(sub["media_id"].to_pylist(), sub["payload"].to_pylist()):
            step = max(1, len(p) // self.n_frames)
            for fi in range(self.n_frames):
                start = fi * step
                out_id.append(mid)
                out_idx.append(fi)
                out_frame.append(p[start : start + self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_index": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frame, pa.binary()),
            }
        )


def decode_pipeline(ds, size: int = 32, concurrency=(1, 4), batch_size: int = 64):
    """Image decode as an actor pool: small batches because payloads are
    large binary cells (ray_guide memory note)."""
    return ds.map_batches(
        ImageDecodeResize,
        fn_constructor_kwargs=dict(size=size),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
