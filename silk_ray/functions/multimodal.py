"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with metadata
columns (``media_type``, ``width``/``height``/``duration_ms``…).
Decode / resize / feature-extract / frame-sample are **actor-pool**
``map_batches`` stages (model/codec state loaded once per actor in
``__init__``).

Codec reality in this container: WAV audio decode is REAL (stdlib
``wave`` → PCM → per-frame RMS, exercised in tests on synthesized
tones). Imaging/video libraries are not available, so those codec
calls are STUBBED behind ``import``-guards: when the lib is missing
each stage applies a clearly-marked deterministic fake so the Ray-side
plumbing (schemas, batch sizing for large payloads, actor signatures,
output layout) is real and tested. Swap ``_decode_impl`` for a real
decoder in production.
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
    """Deterministic fake media rows for tests: audio rows carry real
    (decodable) WAV payloads, image/video rows opaque random bytes."""
    rng = np.random.default_rng(seed)
    types = ["image/png", "audio/wav", "video/mp4"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        t = types[i % 3]
        if t == "audio/wav":
            payload = synth_wav(int(rng.integers(20, 200)), freq_hz=float(rng.integers(100, 2000)))
        else:
            payload = rng.integers(0, 256, size=int(rng.integers(256, 4096)), dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["media_type"].append(t)
        rows["payload"].append(payload)
        rows["width"].append(int(rng.integers(64, 1024)) if t.startswith("image") else 0)
        rows["height"].append(int(rng.integers(64, 1024)) if t.startswith("image") else 0)
        rows["duration_ms"].append(int(rng.integers(1000, 60000)) if not t.startswith("image") else 0)
    return pa.table({k: pa.array(v, MEDIA_SCHEMA.field(k).type) for k, v in rows.items()})


def _have_pil() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


class ImageDecodeResize:
    """Actor-pool stage: decode + resize images to (size × size) float
    arrays. Without PIL, applies a DETERMINISTIC FAKE (payload-hash-
    seeded pixels) so downstream plumbing is exercised; the real decode
    path is the ``PIL.Image.open`` branch."""

    def __init__(self, size: int = 32):
        self.size = size
        self.real = _have_pil()

    def _decode_impl(self, payload: bytes) -> np.ndarray:
        if self.real:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("L").resize((self.size, self.size))
            return np.asarray(img, dtype=np.float32) / 255.0
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


class AudioFeatures:
    """Actor-pool stage: frame-level audio features. WAV payloads are
    genuinely decoded (stdlib ``wave``) to PCM and reduced to per-frame
    RMS energy; non-WAV payloads (no codec lib in this container) fall
    back to a clearly-marked deterministic byte fake, flagged in the
    ``decoded`` column."""

    def __init__(self, n_frames: int = 16):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = [t.startswith("audio/") for t in batch["media_type"].to_pylist()]
        sub = batch.filter(pa.array(mask))
        feats, decoded = [], []
        for p in sub["payload"].to_pylist():
            samples = decode_wav(p)
            decoded.append(samples is not None)
            if samples is None:
                samples = np.frombuffer(p, dtype=np.uint8).astype(np.float32)
                frames = np.array_split(samples, self.n_frames)
                feats.append([float(f.mean()) if f.size else 0.0 for f in frames])
            else:
                frames = np.array_split(samples, self.n_frames)
                feats.append(
                    [float(np.sqrt(np.mean(f * f))) if f.size else 0.0 for f in frames]
                )
        return pa.table(
            {
                "media_id": sub["media_id"],
                "frame_energy": pa.array(feats, pa.list_(pa.float32())),
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
