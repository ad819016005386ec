"""FixedSizeBinary chunk layout (the north-star chunk-block phrasing):
``to_fixed_layout`` re-emits Gorilla chunk blobs at a fixed stride,
``from_fixed_layout`` restores the exact variable-layout bytes, and the
padding is inert to the decoder."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pycatcher_ray.functions.gorilla import decode_chunk, encode_chunk
from pycatcher_ray.stages.compress import (
    compress,
    decompress_table,
    fixed_chunk_width,
    from_fixed_layout,
    to_fixed_layout,
)


def _small_rollup_ds():
    import ray

    rng = np.random.default_rng(7)
    rows = []
    for key in ("a", "b"):
        for h in range(60):
            rows.append({
                "key": key,
                "bucket_start": pd.Timestamp("2024-01-01")
                + pd.Timedelta(hours=h),
                "sum_value": float(rng.normal(100.0, 9.0)),
            })
    return ray.data.from_pandas(pd.DataFrame(rows))


class TestFixedLayout:
    def test_roundtrip_and_parquet_type(self, ray_session, tmp_path):
        chunks = compress(_small_rollup_ds(), "key", 3600, 24,
                          num_shards=2)
        var = chunks.to_pandas().sort_values(
            ["key", "chunk_id"]).reset_index(drop=True)
        fixed = to_fixed_layout(chunks, 24)
        w = fixed_chunk_width(24)
        assert fixed.schema().base_schema.field("chunk").type \
            == pa.binary(w)

        # parquet round-trip preserves the fixed-size type
        out = str(tmp_path / "chunks")
        fixed.write_parquet(out)
        back = pq.read_table(out)
        assert back.schema.field("chunk").type == pa.binary(w)

        # every padded blob is exactly width bytes and decodes to the
        # same points as the variable blob
        bdf = back.to_pandas().sort_values(
            ["key", "chunk_id"]).reset_index(drop=True)
        assert (bdf["chunk"].str.len() == w).all()
        for i in range(len(bdf)):
            tsf, vf = decode_chunk(bdf.loc[i, "chunk"])
            tsv, vv = decode_chunk(var.loc[i, "chunk"])
            np.testing.assert_array_equal(tsf, tsv)
            np.testing.assert_array_equal(vf, vv)

    def test_from_fixed_restores_exact_bytes(self, ray_session):
        chunks = compress(_small_rollup_ds(), "key", 3600, 24,
                          num_shards=2)
        var = chunks.to_pandas().sort_values(
            ["key", "chunk_id"]).reset_index(drop=True)
        restored = from_fixed_layout(to_fixed_layout(chunks, 24)) \
            .to_pandas().sort_values(
                ["key", "chunk_id"]).reset_index(drop=True)
        assert list(restored["chunk"]) == list(var["chunk"])
        # and the decompressed table matches the source points
        dec = decompress_table(restored).sort_values(
            ["key", "bucket_start"]).reset_index(drop=True)
        src = _small_rollup_ds().to_pandas().sort_values(
            ["key", "bucket_start"]).reset_index(drop=True)
        np.testing.assert_allclose(dec["value"], src["sum_value"],
                                   rtol=0, atol=0)

    def test_padding_inert_to_decoder(self):
        rng = np.random.default_rng(3)
        for n in (1, 2, 7, 24):
            ts = np.arange(n, dtype=np.int64) * 3600
            vals = rng.normal(size=n)
            blob = encode_chunk(ts, vals)
            t2, v2 = decode_chunk(blob + b"\x00" * 41)
            np.testing.assert_array_equal(t2, ts)
            np.testing.assert_array_equal(v2, vals)

    def test_oversize_blob_raises(self, ray_session):
        chunks = compress(_small_rollup_ds(), "key", 3600, 24,
                          num_shards=2)
        with pytest.raises(Exception, match="exceeds fixed width"):
            # width for 1-bucket chunks is far below a 24-point blob
            to_fixed_layout(chunks, 1).to_pandas()
