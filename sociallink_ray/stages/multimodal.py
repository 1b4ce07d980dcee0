"""Multimodal columns: image/audio/video payloads as opaque ``binary``
columns with typed metadata, processed by actor-pool ``map_batches``
stages.

REAL decoders, no external libs: self-describing uncompressed formats
are decoded with numpy + the stdlib —

- images: PPM ``P6`` (netpbm) -> (h, w, 3) uint8,
- audio: RIFF/WAV PCM16 via the stdlib ``wave`` module -> int16 samples,
- video: a declared ``RAWV`` frame container (magic + u32 frame count +
  length-prefixed PPM frames) -> per-frame arrays.

JPEG and PNG decode IN-CONTAINER via the vendored pure-python codecs
(``functions/jpeg.py`` baseline T.81, ``functions/png.py`` over stdlib
zlib), with PIL used instead wherever it happens to be installed.
MP3/H.264 genuinely need ffmpeg, which is not in this container:
unknown magic raises ``NotImplementedError`` with guidance, so the
stage contract is unchanged when a real codec lib is plugged in. A
deterministic digest-based fake decoder remains available for plumbing
tests (``fake=True``).

Design notes for 100 TB: payload rows are heavy, so the stages use
small ``batch_size`` and actor pools sized by ``concurrency``; outputs
drop the payload column immediately (select_columns) the same way the
flagship drops ``html`` after text extraction.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),   # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16
RAWV_MAGIC = b"RAWV"


# --------------------------------------------------------------------------
# codecs (pure numpy / stdlib)
# --------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Handles comments and any
    whitespace in the header, per the netpbm spec."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # tokenize header: magic, width, height, maxval (comments start '#')
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PPM supported")
    n = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return arr.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> RIFF/WAV bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAV PCM16 -> (int16 mono samples, sample rate). Multi-channel
    input is averaged to mono."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise NotImplementedError("only PCM16 WAV supported")
        rate = f.getframerate()
        nch = f.getnchannels()
        raw = f.readframes(f.getnframes())
    x = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return x, rate


def encode_rawv(frames: list[bytes]) -> bytes:
    """Length-prefixed frame container: RAWV | u32 n | (u32 len, blob)*n."""
    out = [RAWV_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        out.append(struct.pack("<I", len(fr)))
        out.append(fr)
    return b"".join(out)


def decode_rawv(payload: bytes) -> list[bytes]:
    if not payload.startswith(RAWV_MAGIC):
        raise ValueError("not a RAWV payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    pos, frames = 8, []
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        frames.append(payload[pos : pos + ln])
        pos += ln
    return frames


def resize_image(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize via index striding (pure numpy)."""
    sh, sw = img.shape[:2]
    rows = (np.arange(h) * sh // h).astype(np.intp)
    cols = (np.arange(w) * sw // w).astype(np.intp)
    return img[rows[:, None], cols[None, :]]


# --------------------------------------------------------------------------
# feature kernels (FEATURE_DIM floats per payload)
# --------------------------------------------------------------------------

def image_features(img: np.ndarray) -> np.ndarray:
    """16-dim image descriptor: per-channel mean/std, 8-bin grayscale
    histogram, aspect ratio, log area."""
    f = img.astype(np.float32) / 255.0
    gray = f.mean(axis=2)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    hist = hist / max(1, gray.size)
    h, w = img.shape[:2]
    return np.concatenate(
        [
            f.reshape(-1, 3).mean(axis=0),
            f.reshape(-1, 3).std(axis=0),
            hist.astype(np.float32),
            [w / max(1, h), np.log10(max(1, h * w))],
        ]
    ).astype(np.float32)


def audio_features(x: np.ndarray, rate: int) -> np.ndarray:
    """16-dim audio descriptor: rms, zero-crossing rate, spectral
    centroid/rolloff/peak (normalized to Nyquist), 8 log-spaced band
    energies, log length, rate, duration."""
    xf = x.astype(np.float32) / 32768.0
    n = len(xf)
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    rms = float(np.sqrt(np.mean(xf**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(xf))))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(xf))
    power = spec**2
    tot = power.sum() or 1.0
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    nyq = rate / 2.0
    centroid = float((freqs * power).sum() / tot / nyq)
    cum = np.cumsum(power)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * cum[-1]))] / nyq)
    peak = float(freqs[int(power.argmax())] / nyq)
    # 8 log-spaced bands over [20 Hz, nyquist]
    edges = np.geomspace(20.0, nyq, 9)
    bands = [
        float(power[(freqs >= lo) & (freqs < hi)].sum() / tot)
        for lo, hi in zip(edges[:-1], edges[1:])
    ]
    return np.array(
        [rms, zcr, centroid, rolloff, peak, *bands,
         np.log10(n), rate / 48000.0, n / rate],
        dtype=np.float32,
    )


def _pil_image():
    """Optional-dependency probe: PIL when importable, else None —
    the vendored pure-python JPEG/PNG codecs take over when absent."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_compressed_image(payload: bytes) -> np.ndarray:
    """JPEG/PNG -> HxWx3 uint8. PIL when available (fast C path);
    otherwise the vendored pure-python baseline-JPEG / PNG decoders
    (functions/jpeg.py, functions/png.py) — the format no longer
    depends on anything outside this repo + stdlib + numpy."""
    Image = _pil_image()
    if Image is not None:
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    if payload.startswith(_JPEG_MAGIC):
        from ..functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload.startswith(_PNG_MAGIC):
        from ..functions.png import decode_png

        return decode_png(payload)
    raise ValueError("decode_compressed_image: unknown image magic")


_JPEG_MAGIC = b"\xff\xd8\xff"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_frame(fr: bytes) -> np.ndarray:
    """Decode one video frame blob: PPM (native container format) or
    JPEG/PNG (compressed frames via the vendored codecs)."""
    if fr.startswith(b"P6"):
        return decode_ppm(fr)
    if fr.startswith(_JPEG_MAGIC) or fr.startswith(_PNG_MAGIC):
        return decode_compressed_image(fr)
    raise ValueError("unknown frame magic in RAWV container")


def _decode_real(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode + featurize, dispatched on payload magic bytes."""
    if payload.startswith(b"P6"):
        return image_features(decode_ppm(payload))
    if payload.startswith(b"RIFF"):
        return audio_features(*decode_wav(payload))
    if payload.startswith(RAWV_MAGIC):
        frames = decode_rawv(payload)
        step = max(1, len(frames) // 4)  # sample <=4 frames
        feats = [image_features(_decode_frame(fr)) for fr in frames[::step]]
        return np.mean(feats, axis=0).astype(np.float32)
    if payload.startswith(_JPEG_MAGIC) or payload.startswith(_PNG_MAGIC):
        return image_features(decode_compressed_image(payload))
    raise NotImplementedError(
        "compressed media codecs (MP3/H.264) require ffmpeg, which is "
        "not in this container; supported self-describing formats: "
        "PPM P6 images, PCM16 WAV audio, RAWV frame containers, and "
        "JPEG/PNG (vendored pure-python codecs; PIL when installed)"
    )


def _decode_fake(payload: bytes, media_type: str) -> np.ndarray:
    """Deterministic surrogate decoder: a 16-dim float32 'feature' from
    the payload digest — stable across processes, good enough to test
    the plumbing and downstream similarity ops."""
    h = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
    v = np.frombuffer(h, dtype=np.uint32).astype(np.float32)
    return (v % 1000) / 1000.0


class MediaFeatureStage:
    """Actor-pool stage: (media_id, payload) -> (media_id, feature
    list<float>). Instantiate with ``concurrency=N, batch_size=small``
    — payloads are heavy, so a batch × pool must fit worker heap."""

    def __init__(self, fake: bool = False):
        self.decode = _decode_fake if fake else _decode_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self.decode(bytes(p), t)
            for p, t in zip(
                batch["payload"].to_pylist(), batch["media_type"].to_pylist()
            )
        ]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "feature": pa.array(
                    [f.tolist() for f in feats], pa.list_(pa.float32())
                ),
            }
        )


class FrameSampleStage:
    """Video frame sampling: 1->N flat-map. RAWV payloads are REALLY
    parsed — one output row per sampled frame, carrying the decodable
    PPM frame blob; non-RAWV payloads fall back to deterministic byte
    slices (plumbing-test surrogate, as documented)."""

    def __init__(self, every_ms: int = 1000):
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, frames = [], [], []
        for mid, payload, dur in zip(
            batch["media_id"].to_pylist(),
            batch["payload"].to_pylist(),
            batch["duration_ms"].to_pylist(),
        ):
            payload = bytes(payload)
            n = max(1, int(dur or 0) // self.every_ms)
            if payload.startswith(RAWV_MAGIC):
                avail = decode_rawv(payload)
                if not avail:  # legal zero-frame container: emit nothing
                    continue
                # sample n frames uniformly across the container
                sel = (np.arange(n) * len(avail) // n).astype(int)
                for i, fi in enumerate(sel):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(avail[fi])
            else:
                step = max(1, len(payload) // n)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(payload[i * step : (i + 1) * step])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_features(ds: Dataset, fake: bool = False, concurrency=4) -> Dataset:
    """The media feature-extraction pipeline stage (actor pool — the
    real decoder is expensive per-actor state; the JPEG Huffman LUTs
    cache per actor process across batches, functions/jpeg.py
    _LUT_CACHE). A FIXED pool size starts all actors concurrently —
    the (1, N) autoscaling ramp added ~0.4s of serial spin-up per
    invocation at fixture scale."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=64,            # heavy payload rows -> small batches
        concurrency=concurrency,
        num_cpus=1,
    )


def sample_frames(ds: Dataset, every_ms: int = 1000, concurrency=(1, 4)) -> Dataset:
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
        num_cpus=1,
    )


def synth_media_table(n: int = 64, seed: int = 7) -> pa.Table:
    """Deterministic synthetic media table in MEDIA_SCHEMA — REAL
    payloads: PPM / JPEG / PNG images (rotating), PCM16 WAV tones,
    RAWV frame containers. JPEG/PNG payloads come from the vendored
    codecs, so the compressed-image decode path is exercised on every
    media_features run without Pillow."""
    from ..functions.jpeg import encode_jpeg
    from ..functions.png import encode_png

    rng = np.random.RandomState(seed)
    types = ["image", "audio", "video"]
    payloads, widths, heights, durs = [], [], [], []
    for i in range(n):
        t = types[i % 3]
        if t == "image":
            w, h = 16 + (i % 4) * 8, 12 + (i % 3) * 8
            img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            fmt = (i // 3) % 3
            if fmt == 0:
                payloads.append(encode_ppm(img))
            elif fmt == 1:
                payloads.append(
                    encode_jpeg(img, quality=92, subsample=bool(i % 2))
                )
            else:
                payloads.append(encode_png(img))
            widths.append(w)
            heights.append(h)
            durs.append(0)
        elif t == "audio":
            rate = 8000
            dur_ms = 250 + 125 * (i % 4)
            tt = np.arange(int(rate * dur_ms / 1000)) / rate
            freq = 220.0 * (1 + i % 5)
            x = (8000 * np.sin(2 * np.pi * freq * tt)).astype(np.int16)
            payloads.append(encode_wav(x, rate))
            widths.append(0)
            heights.append(0)
            durs.append(dur_ms)
        else:
            nfr = 4 + i % 3
            frames = [
                encode_ppm(rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8))
                for _ in range(nfr)
            ]
            payloads.append(encode_rawv(frames))
            widths.append(8)
            heights.append(6)
            durs.append(3000 + 500 * (i % 4))
    rows = {
        "media_id": list(range(n)),
        "media_type": [types[i % 3] for i in range(n)],
        "payload": payloads,
        "width": widths,
        "height": heights,
        "duration_ms": durs,
    }
    return pa.table(
        {k: pa.array(v, MEDIA_SCHEMA.field(k).type) for k, v in rows.items()}
    )
