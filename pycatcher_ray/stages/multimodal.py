"""Multimodal column stages: binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata
(mime, byte size), decoded and feature-extracted by an actor-pool
``map_batches`` stage.  Two real pure-stdlib codecs are implemented
(no image/audio libraries ship in this container):

- **image/png**: full decode of the grayscale PNGs the synthesizer
  emits — signature + IHDR parse (width/height/bit depth), zlib
  inflate of the IDAT stream, scanline un-filtering (filter 0/1/2,
  the ones the encoder uses) → pixel statistics.
- **audio/wav**: stdlib ``wave`` decode — sample rate, frame count,
  duration, plus PCM-domain features (RMS, peak, zero-crossing rate)
  from the int16 samples.

``decoder="fake"`` (byte-histogram features, any payload) remains for
mimes without a codec; ``decoder="pil"`` / ``"ffmpeg"`` fail fast at
actor construction, marking exactly where a real deployment plugs in.

Scale notes: binary payloads dominate bytes, so the stage uses SMALL
``batch_size`` (payload bytes × batch_size × concurrency must fit the
worker heap), ``batch_format="pyarrow"`` (binary columns round-trip
zero-copy through Arrow, not pandas object dtype), and emits
fixed-size feature vectors rather than re-emitting payloads.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pyarrow as pa

__all__ = ["MediaDecoder", "decode_features", "synth_media_table",
           "make_png", "make_wav", "parse_png", "parse_wav"]

FEATURE_DIM = 8


# ------------------------------------------------------------- encoders
# (synthesis only — the engine's decode path must not depend on them)


def make_png(width: int, height: int, rng: np.random.Generator) -> bytes:
    """A real, valid 8-bit grayscale PNG (signature/IHDR/IDAT/IEND)."""
    raw = b"".join(
        b"\x00" + rng.integers(0, 256, width, dtype=np.uint8).tobytes()
        for _ in range(height)
    )

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def make_wav(n_frames: int, framerate: int, freq_hz: float,
             rng: np.random.Generator) -> bytes:
    """A real 16-bit mono PCM WAV: sine at freq_hz plus noise."""
    t = np.arange(n_frames) / framerate
    sig = (0.6 * np.sin(2 * np.pi * freq_hz * t)
           + 0.05 * rng.standard_normal(n_frames))
    pcm = np.clip(sig * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


# ------------------------------------------------------------- decoders


def parse_png(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(width, height, pixels) from an 8-bit grayscale PNG with
    per-scanline filters 0 (none), 1 (sub) or 2 (up)."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if typ == b"IHDR":
            width, height, bit_depth, color = struct.unpack(
                ">IIBB", data[:10])
            if bit_depth != 8 or color != 0:
                raise ValueError("only 8-bit grayscale supported")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = width + 1
    pixels = np.empty((height, width), dtype=np.uint8)
    prev = np.zeros(width, dtype=np.uint8)
    for y in range(height):
        line = raw[y * stride:(y + 1) * stride]
        filt, body = line[0], np.frombuffer(line[1:], dtype=np.uint8)
        if filt == 0:
            row = body.copy()
        elif filt == 2:  # up
            row = body + prev
        elif filt == 1:  # sub
            row = body.copy()
            acc = 0
            for x in range(width):
                acc = (int(row[x]) + acc) & 0xFF
                row[x] = acc
        else:
            raise ValueError(f"unsupported PNG filter {filt}")
        pixels[y] = row
        prev = pixels[y]
    return width, height, pixels


def parse_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(framerate, n_frames, int16 samples) from a 16-bit mono WAV."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        framerate = w.getframerate()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    return framerate, n_frames, np.frombuffer(frames, dtype="<i2")


# ------------------------------------------------------------ synthesis


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096
                      ) -> pa.Table:
    """Deterministic media table: REAL alternating PNG/WAV payloads.

    ``payload_bytes`` keeps its historical meaning as the approximate
    payload size target (it sizes the image/audio dimensions)."""
    rng = np.random.default_rng(seed)
    side = max(8, int(np.sqrt(payload_bytes)))
    payloads, mimes = [], []
    for i in range(n):
        if i % 2 == 0:
            w = side + int(rng.integers(0, 8))
            h = side + int(rng.integers(0, 8))
            payloads.append(make_png(w, h, rng))
            mimes.append("image/png")
        else:
            frames = payload_bytes // 2 + int(rng.integers(0, 256))
            payloads.append(
                make_wav(frames, 8000, 200.0 + 10.0 * (i % 40), rng)
            )
            mimes.append("audio/wav")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(mimes),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array(
                np.array([len(p) for p in payloads], dtype=np.int64)
            ),
        }
    )


# ------------------------------------------------------------ the stage


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    ``decoder="stdlib"`` (default): real PNG/WAV decode (above), byte
    histogram fallback for other mimes.  ``decoder="fake"``: byte
    histogram features for everything (payloads need not be valid
    media).  Anything else raises NotImplementedError at __init__
    (fail fast at actor construction — that is where PIL/ffmpeg would
    be loaded once per actor)."""

    def __init__(self, decoder: str = "stdlib"):
        if decoder not in ("stdlib", "fake"):
            raise NotImplementedError(
                f"decoder={decoder!r} needs codec libs not present in this "
                "container; 'stdlib' (PNG/WAV) and 'fake' are enabled"
            )
        self.decoder = decoder
        self.feature_dim = FEATURE_DIM

    def _byte_features(self, payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        qs = np.quantile(arr, np.linspace(0, 1, self.feature_dim - 2))
        return np.concatenate(([arr.mean(), arr.std()], qs))

    def _decode_payload(self, mime: str, payload: bytes) -> np.ndarray:
        if self.decoder == "stdlib" and mime == "image/png":
            w, h, px = parse_png(payload)
            pxf = px.astype(np.float64)
            return np.array([1.0, w, h, pxf.mean(), pxf.std(),
                             float(px.min()), float(px.max()), 0.0])
        if self.decoder == "stdlib" and mime == "audio/wav":
            rate, n_frames, pcm = parse_wav(payload)
            x = pcm.astype(np.float64) / 32768.0
            zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0))
            return np.array([2.0, rate, n_frames, n_frames / rate,
                             float(np.sqrt(np.mean(x * x))),
                             float(np.abs(x).max()), zcr, 0.0])
        return self._byte_features(payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack(
            [self._decode_payload(m.as_py(), p.as_py())
             for m, p in zip(batch["mime"], batch["payload"])]
        )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "n_bytes": batch["n_bytes"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.ravel(), type=pa.float64()),
                    self.feature_dim,
                ),
            }
        )


def decode_features(media_ds, concurrency: int | None = None,
                    batch_size: int = 64, decoder: str = "stdlib"):
    """Run the decode actor pool; batch_size deliberately small because
    payload bytes, not row count, bound worker memory."""
    from ..config import auto_concurrency

    return media_ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decoder": decoder},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or auto_concurrency(cap=8),
        num_cpus=1,
    )
