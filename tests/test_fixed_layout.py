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

    def test_sliced_binary_batch(self, ray_session):
        # a sliced Arrow array (Ray block split / limit) has a nonzero
        # array offset and offsets that don't start at byte 0 — the
        # scatter math must honor both
        from pycatcher_ray.stages.compress import fixed_chunk_width

        rng = np.random.default_rng(11)
        blobs = [encode_chunk(np.arange(n, dtype=np.int64) * 3600,
                              rng.normal(size=n))
                 for n in (5, 24, 1, 17, 24, 3)]
        full = pa.table({
            "key": pa.array([f"k{i}" for i in range(len(blobs))]),
            "chunk_id": pa.array(range(len(blobs)), type=pa.int64()),
            "chunk": pa.array(blobs, type=pa.binary()),
            "chunk_bytes": pa.array([len(b) for b in blobs],
                                    type=pa.int64()),
        })
        sliced = full.slice(2, 3)  # nonzero offset into every buffer
        assert sliced["chunk"].chunk(0).offset == 2

        from pycatcher_ray.stages.compress import (_scatter_fixed,
                                                   _to_fixed_batch)

        w = fixed_chunk_width(24)
        out = _to_fixed_batch(sliced, w).to_pandas()
        for i in range(3):
            got = out.loc[i, "chunk"]
            want = blobs[2 + i]
            assert len(got) == w
            assert got[: len(want)] == want
            assert got[len(want):] == b"\x00" * (w - len(want))

        # and the scatter kernel itself on a guaranteed nonzero-offset
        # VIEW (combine_chunks may compact; from_buffers cannot)
        base = full["chunk"].chunk(0)
        view = pa.Array.from_buffers(
            pa.binary(), 3,
            [None, base.buffers()[1], base.buffers()[2]], offset=2)
        assert view.offset == 2 and view.to_pylist() == blobs[2:5]
        fixed = _scatter_fixed(view, w)
        for i in range(3):
            got = fixed[i].as_py()
            want = blobs[2 + i]
            assert got[: len(want)] == want
            assert got[len(want):] == b"\x00" * (w - len(want))

    def test_oversize_blob_raises(self, ray_session):
        chunks = compress(_small_rollup_ds(), "key", 3600, 24,
                          num_shards=2)
        with pytest.raises(Exception, match="exceeds fixed width"):
            # width for 1-bucket chunks is far below a 24-point blob
            to_fixed_layout(chunks, 1).to_pandas()
