"""Multimodal column stages: binary payloads with typed metadata.

Images/audio/video are opaque ``binary`` columns plus metadata
(mime, width/height or sample rate, duration).  The Ray-side plumbing —
schema, small-batch actor pools, output layout — is real and tested; the
actual codec calls are STUBBED behind ``decoder="fake"`` because no
image/audio library ships in this container (per the task brief).  A real
deployment passes ``decoder="pil"`` / ``decoder="ffmpeg"`` and only
``_decode_payload`` changes.

Scale notes: binary payloads dominate bytes, so the stage uses SMALL
``batch_size`` (payload bytes × batch_size × concurrency must fit the
worker heap), ``batch_format="pyarrow"`` (binary columns round-trip
zero-copy through Arrow, not pandas object dtype), and emits
fixed-size feature vectors rather than re-emitting payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["MediaDecoder", "decode_features", "synth_media_table"]


def synth_media_table(n: int, seed: int = 42, payload_bytes: int = 4096
                      ) -> pa.Table:
    """Deterministic fake media table for tests: binary blobs + metadata."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, payload_bytes, dtype=np.uint8).tobytes()
                for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "mime": pa.array(
                [("image/png", "audio/wav")[i % 2] for i in range(n)]
            ),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_bytes": pa.array(
                np.full(n, payload_bytes, dtype=np.int64)
            ),
        }
    )


class MediaDecoder:
    """Actor-pool decode/feature-extract stage.

    ``decoder="fake"`` derives a deterministic feature vector from the
    payload bytes (mean/std/quantiles of the byte histogram) so the full
    pipeline — batching, actor reuse, schema, downstream aggregation —
    runs end to end without codec libraries.  Any other decoder raises
    NotImplementedError at __init__ (fail fast at actor construction).
    """

    def __init__(self, decoder: str = "fake", feature_dim: int = 8):
        if decoder != "fake":
            raise NotImplementedError(
                f"decoder={decoder!r} needs codec libs not present in this "
                "container; only the deterministic 'fake' decoder is enabled"
            )
        self.decoder = decoder
        self.feature_dim = feature_dim

    def _decode_payload(self, payload: bytes) -> np.ndarray:
        arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        qs = np.quantile(arr, np.linspace(0, 1, self.feature_dim - 2))
        return np.concatenate(([arr.mean(), arr.std()], qs))

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = np.stack(
            [self._decode_payload(p.as_py()) for p in batch["payload"]]
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


def decode_features(media_ds, concurrency: int = 2, batch_size: int = 64):
    """Run the decode actor pool; batch_size deliberately small because
    payload bytes, not row count, bound worker memory."""
    return media_ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
