"""Tests for the training-data operators: text stats, language-ID,
fingerprints, MinHash/SimHash/embedding near-dup, multimodal plumbing,
and stationarity diagnostics."""

import numpy as np
import pandas as pd
import pytest

from pycatcher_ray.functions.stationarity import adf_test, kpss_test, stationarity_verdict
from pycatcher_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    cluster_pairs,
    shingle_set,
    word_hashes,
)
from pycatcher_ray.stages.textops import Fingerprint, LangId, TextStats


def _jaccard(a, b):
    sa, sb = shingle_set(a), shingle_set(b)
    inter = np.intersect1d(sa, sb).size
    return inter / (sa.size + sb.size - inter)


NEAR_DUP_A = ("the quick brown fox jumps over the lazy dog and runs far "
              "away into the deep green forest before sunset tonight")
NEAR_DUP_B = ("the quick brown fox jumps over the lazy dog and runs far "
              "away into the deep green forest before sunrise tonight")
DISTINCT = ("completely different sentence about database systems and "
            "distributed query execution engines running on clusters")


class TestHashing:
    def test_word_hashes_deterministic(self):
        a = word_hashes(["hello", "world"])
        b = word_hashes(["hello", "world"])
        np.testing.assert_array_equal(a, b)
        assert a[0] != a[1]

    def test_shingles(self):
        s = shingle_set("a b c d", k=3)
        assert s.size == 2  # (a,b,c), (b,c,d)

    def test_minhash_estimates_jaccard(self):
        mh = MinHasher(num_perm=256)
        sa, sb = shingle_set(NEAR_DUP_A), shingle_set(NEAR_DUP_B)
        est = (mh.signature(sa) == mh.signature(sb)).mean()
        true = _jaccard(NEAR_DUP_A, NEAR_DUP_B)
        assert abs(est - true) < 0.15
        assert true > 0.7

    def test_simhash_near_for_neardups(self):
        sh = SimHasher()
        d_near = bin(sh.signature(NEAR_DUP_A) ^ sh.signature(NEAR_DUP_B)).count("1")
        d_far = bin(sh.signature(NEAR_DUP_A) ^ sh.signature(DISTINCT)).count("1")
        assert d_near < d_far
        assert d_near <= 10

    def test_cluster_pairs_transitive(self):
        pairs = pd.DataFrame(
            {"doc_a": [1, 2, 10], "doc_b": [2, 3, 11], "jaccard": [0.9] * 3}
        )
        out = cluster_pairs(pairs).set_index("doc_id")["cluster_id"]
        assert out[1] == out[2] == out[3]
        assert out[10] == out[11] != out[1]


class TestTextOps:
    def test_text_stats_features(self):
        ts = TextStats()
        batch = pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["The quick brown fox, it jumps! 123", ""],
            }
        )
        out = ts(batch)
        assert out.loc[0, "n_words"] == 7
        assert out.loc[0, "n_chars"] == 34
        assert out.loc[0, "punct_ratio"] > 0
        assert out.loc[0, "stopword_ratio"] > 0
        assert out.loc[1, "n_words"] == 0
        assert 0 <= out["quality_score"].iloc[0] <= 1

    def test_lang_id_heuristic(self):
        li = LangId()
        assert li.classify("the cat is in the house and it is happy")[0] == "en"
        assert li.classify("el gato es muy bonito y la casa es grande")[0] == "es"
        assert li.classify("le chat est dans la maison et il est content")[0] == "fr"
        assert li.classify("der Hund ist in dem Haus und die Katze auf dem Dach")[0] == "de"
        assert li.classify("这是一个中文句子测试内容")[0] == "zh"
        assert li.classify("")[0] == "und"

    def test_fingerprint_stability_and_sensitivity(self):
        fp = Fingerprint()
        a1 = fp._fingerprint(NEAR_DUP_A)
        a2 = fp._fingerprint(NEAR_DUP_A)
        b = fp._fingerprint(DISTINCT)
        assert a1 == a2
        assert a1[0] != b[0]


class TestDistributedDedup:
    @pytest.fixture(scope="class")
    def docs(self, ray_session):
        import ray.data as rd

        rows = [{"doc_id": f"d{i}", "text": DISTINCT + f" filler {i} " * 3}
                for i in range(20)]
        rows.append({"doc_id": "dupA", "text": NEAR_DUP_A})
        rows.append({"doc_id": "dupB", "text": NEAR_DUP_B})
        return rd.from_items(rows)

    def test_minhash_dedup_finds_planted_pair(self, docs):
        from pycatcher_ray.stages.dedup import minhash_dedup

        clusters = minhash_dedup(docs, threshold=0.6)
        by_doc = clusters.set_index("doc_id")["cluster_id"].to_dict()
        assert by_doc.get("dupA") == by_doc.get("dupB")

    def test_simhash_pairs_find_planted_pair(self, docs):
        from pycatcher_ray.stages.dedup import simhash_pairs

        pairs = simhash_pairs(docs, max_hamming=10).to_pandas()
        found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
        assert ("dupA", "dupB") in found

    def test_embedding_neardup(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(0)
        base = rng.standard_normal(32)
        rows = []
        for i in range(50):
            rows.append({"vec_id": i, "embedding": rng.standard_normal(32)})
        rows.append({"vec_id": 100, "embedding": base})
        rows.append({"vec_id": 101, "embedding": base + rng.standard_normal(32) * 0.01})
        ds = rd.from_items(rows)
        from pycatcher_ray.stages.dedup import embedding_neardup

        pairs = embedding_neardup(ds, threshold=0.98).to_pandas()
        found = {(a, b) for a, b in zip(pairs["vec_a"], pairs["vec_b"])}
        assert (100, 101) in found or (101, 100) in found


class TestMultimodal:
    def test_decode_stage_runs(self, ray_session):
        import ray.data as rd

        from pycatcher_ray.stages.multimodal import (
            MediaDecoder,
            decode_features,
            synth_media_table,
        )

        media = rd.from_arrow(synth_media_table(64, seed=1))
        out = decode_features(media).to_pandas()
        assert len(out) == 64
        assert len(out["features"].iloc[0]) == 8
        # deterministic features
        out2 = decode_features(rd.from_arrow(synth_media_table(64, seed=1))).to_pandas()
        a = np.stack(out.sort_values("media_id")["features"].to_numpy())
        b = np.stack(out2.sort_values("media_id")["features"].to_numpy())
        np.testing.assert_array_equal(a, b)

    def test_real_decoder_not_implemented(self):
        from pycatcher_ray.stages.multimodal import MediaDecoder

        with pytest.raises(NotImplementedError):
            MediaDecoder(decoder="pil")

    def test_media_features_exact_golden(self, ray_session):
        """HARD signal for the media_features query (verdict r2: the one
        registry entry with no driver correctness row): the synth is
        seeded, so the per-mime aggregates of the decoded features are
        exact constants.  Checked two ways: (a) against a driver-side
        recompute straight from parse_png/parse_wav ground truth, and
        (b) against pinned literals so a silent synth/codec drift fails
        loudly."""
        from pycatcher_ray.queries import media_features
        from pycatcher_ray.stages.multimodal import (
            parse_png,
            parse_wav,
            synth_media_table,
        )

        got = media_features("/unused").to_pandas().sort_values(
            "mime").reset_index(drop=True)

        # (a) ground truth straight from the codecs, no Ray
        t = synth_media_table(512, seed=42)
        agg: dict = {}
        for m, p, b in zip(t["mime"].to_pylist(), t["payload"].to_pylist(),
                           t["n_bytes"].to_pylist()):
            d = agg.setdefault(m, {"total_bytes": 0, "n": 0, "sum": 0.0})
            d["total_bytes"] += b
            d["n"] += 1
            if m == "image/png":
                _w, _h, px = parse_png(p)
                d["sum"] += px.astype(np.float64).mean()
            else:
                rate, nf, _pcm = parse_wav(p)
                d["sum"] += nf / rate
        want = pd.DataFrame(
            [{"mime": m, "total_bytes": d["total_bytes"], "n_media": d["n"],
              "avg_primary_feature": round(d["sum"] / d["n"], 4)}
             for m, d in sorted(agg.items())]
        )
        merged = got.merge(want, on="mime", suffixes=("", "_want"))
        assert len(merged) == 2
        assert (merged["total_bytes"] == merged["total_bytes_want"]).all()
        assert (merged["n_media"] == merged["n_media_want"]).all()
        assert (merged["avg_primary_feature"]
                == merged["avg_primary_feature_want"]).all()

        # (b) pinned literals (synth_media_table(512, seed=42))
        by_mime = got.set_index("mime")
        assert int(by_mime.loc["audio/wav", "total_bytes"]) == 1123552
        assert int(by_mime.loc["audio/wav", "n_media"]) == 256
        assert float(by_mime.loc["audio/wav", "avg_primary_feature"]) == 0.2716
        assert int(by_mime.loc["image/png", "total_bytes"]) == 1202628
        assert int(by_mime.loc["image/png", "n_media"]) == 256
        assert float(by_mime.loc["image/png", "avg_primary_feature"]) == 127.489


class TestStationarity:
    def test_white_noise_stationary(self):
        rng = np.random.default_rng(0)
        v = stationarity_verdict(rng.standard_normal(400))
        assert v["stationary"]

    def test_random_walk_not_stationary(self):
        rng = np.random.default_rng(0)
        v = stationarity_verdict(np.cumsum(rng.standard_normal(400)))
        assert not v["stationary"]
        assert v["adf_p"] > 0.05 and v["kpss_p"] < 0.05

    def test_adf_reports(self):
        rng = np.random.default_rng(1)
        r = adf_test(rng.standard_normal(300))
        assert r["statistic"] < r["critical_values"]["5%"]
        assert r["pvalue"] < 0.05

    def test_kpss_trending_rejects(self):
        r = kpss_test(np.linspace(0, 10, 300) + np.random.default_rng(2).standard_normal(300) * 0.1)
        assert r["pvalue"] < 0.05


class TestANN:
    def test_ivf_recall_vs_brute(self, ray_session):
        import pyarrow.parquet as pq
        import ray.data as rd

        from pycatcher_ray.stages.ann import brute_topk, build_ivf, ivf_search

        path = "/root/testdata/sf0.001/embeddings.parquet"
        tbl = pq.read_table(path, columns=["vec_id", "embedding"],
                            filters=[("vec_id", "=", 0)])
        q = np.asarray(tbl["embedding"][0].as_py(), dtype=np.float64)
        ds = rd.read_parquet(path, columns=["vec_id", "embedding"])
        exact = set(brute_topk(ds, q, k=10).to_pandas()["vec_id"])
        index = build_ivf(ds, n_clusters=8)
        approx = set(
            ivf_search(index, q, k=10, n_probe=4).to_pandas()["vec_id"]
        )
        assert 0 in approx  # the query vector itself
        assert len(exact & approx) >= 5  # recall@10 >= 0.5 at n_probe=4/8

    def test_kmeans_deterministic(self):
        from pycatcher_ray.stages.ann import kmeans_fit

        rng = np.random.default_rng(1)
        x = rng.standard_normal((200, 8))
        c1 = kmeans_fit(x, 4, seed=3)
        c2 = kmeans_fit(x, 4, seed=3)
        np.testing.assert_array_equal(c1, c2)


class TestHLL:
    def test_estimate_accuracy(self):
        from pycatcher_ray.functions.hll import HLL

        rng = np.random.default_rng(0)
        vals = rng.integers(0, 10**12, 50_000)
        exact = len(set(vals.tolist()))
        est = HLL().add_many(vals).estimate()
        assert abs(est - exact) / exact < 0.05

    def test_merge_equals_union(self):
        from pycatcher_ray.functions.hll import HLL

        a = HLL().add_many(range(0, 30_000))
        b = HLL().add_many(range(20_000, 60_000))
        merged = a.merge(b)
        assert abs(merged.estimate() - 60_000) / 60_000 < 0.05

    def test_round_trip_bytes(self):
        from pycatcher_ray.functions.hll import HLL

        a = HLL().add_many(range(1000))
        b = HLL.from_bytes(a.to_bytes())
        assert a.estimate() == b.estimate()

    def test_query_within_band_and_exact_matches(self, ray_session):
        """approx_users_by_type now self-asserts the ±2% band (the SQL
        oracle pins within_2pct = TRUE) and carries the exact distinct,
        which must equal the standalone exact query."""
        from pycatcher_ray.queries import (approx_users_by_type,
                                           distinct_users_by_type)

        sf = "/root/testdata/sf0.01"
        approx = approx_users_by_type(sf).to_pandas().set_index("source")
        exact = distinct_users_by_type(sf).to_pandas().set_index("source")
        assert set(approx.index) == set(exact.index)
        for src in exact.index:
            assert approx.loc[src, "exact_users"] == exact.loc[src, "n_users"]
            assert bool(approx.loc[src, "within_2pct"]), src


class TestDedupScaleDefenses:
    def test_hot_bucket_boilerplate_corpus_completes(self, ray_session):
        """10^4-doc identical-boilerplate corpus: every doc lands in the
        SAME LSH bucket in every band.  Without the bucket cap this is
        a ~5*10^7-pair explosion; with it the pipeline completes and
        still clusters the sampled members together."""
        import ray.data as rd

        from pycatcher_ray.stages.dedup import minhash_dedup

        boiler = ("all rights reserved terms of service privacy policy "
                  "copyright notice contact us about careers ") * 3
        rows = [{"doc_id": f"d{i:05d}", "text": boiler} for i in range(10_000)]
        docs = rd.from_items(rows)
        clusters = minhash_dedup(docs, num_perm=32, bands=8, threshold=0.9,
                                 max_bucket=64)
        # each band samples its bucket UNIFORMLY (per-bucket hash order,
        # unbiased — ADVICE r2), so the retained docs are the union of the
        # per-band samples: bounded by bands * max_bucket, every retained
        # doc in a non-singleton cluster, and deterministic across runs
        assert 64 <= len(clusters) <= 8 * 64
        sizes = clusters.groupby("cluster_id").size()
        assert (sizes >= 2).all()
        clusters2 = minhash_dedup(docs, num_perm=32, bands=8, threshold=0.9,
                                  max_bucket=64)
        pd.testing.assert_frame_equal(clusters, clusters2)

    def test_label_propagation_matches_union_find(self, ray_session):
        """cluster_pairs_distributed == driver union-find on a chain +
        separate component (transitivity across shards)."""
        import ray.data as rd

        from pycatcher_ray.stages.dedup import (
            cluster_pairs,
            cluster_pairs_distributed,
        )

        edges = pd.DataFrame(
            {
                "doc_a": [f"n{i}" for i in range(9)] + ["x1", "y1"],
                "doc_b": [f"n{i+1}" for i in range(9)] + ["x2", "y2"],
                "jaccard": [0.9] * 11,
            }
        )
        want = cluster_pairs(edges).set_index("doc_id")["cluster_id"]
        # both paths: the size-gated single-task CC (default cap) and
        # the distributed label-propagation rounds (cap 0 forces them)
        for cap in (2_000_000, 0):
            got = (
                cluster_pairs_distributed(rd.from_pandas(edges),
                                          small_edge_cap=cap)
                .to_pandas().set_index("doc_id")["cluster_id"]
            )
            assert set(got.index) == set(want.index)
            # same partition structure (labels themselves both use min-id)
            for d in want.index:
                assert got[d] == want[d]

    def test_ngram_jaccard_exact_pairs(self, ray_session):
        """ngram_jaccard_pairs finds exactly the planted near-dup pair
        with the true trigram Jaccard value (inverted-index join ==
        brute-force set computation)."""
        import ray.data as rd

        from pycatcher_ray.stages.dedup import ngram_jaccard_pairs, shingle_set

        rows = [{"doc_id": i, "text": f"totally unrelated document {i} "
                 f"with its own words number {i*7} and {i*13}"}
                for i in range(30)]
        rows.append({"doc_id": 100, "text": NEAR_DUP_A})
        rows.append({"doc_id": 101, "text": NEAR_DUP_B})
        got = ngram_jaccard_pairs(rd.from_items(rows),
                                  threshold=0.5).to_pandas()
        sa, sb = shingle_set(NEAR_DUP_A), shingle_set(NEAR_DUP_B)
        inter = np.intersect1d(sa, sb, assume_unique=True).size
        want = round(inter / (sa.size + sb.size - inter), 4)
        assert len(got) == 1
        assert (int(got["doc_a"].iloc[0]), int(got["doc_b"].iloc[0])) == (100, 101)
        assert abs(float(got["jaccard"].iloc[0]) - want) < 1e-9


class TestIVFDisk:
    def test_disk_index_prunes_reads_and_matches_memory(self, ray_session,
                                                        tmp_path):
        import os

        import ray.data as rd

        from pycatcher_ray.stages.ann import (
            build_ivf,
            ivf_search,
            ivf_search_disk,
            load_ivf,
            probe_clusters,
            write_ivf,
        )

        rng = np.random.default_rng(3)
        rows = [{"vec_id": i, "embedding": rng.standard_normal(16)}
                for i in range(400)]
        ds = rd.from_items(rows)
        index = build_ivf(ds, n_clusters=8)
        disk = write_ivf(index, str(tmp_path / "ivf"))

        q = rows[7]["embedding"]
        got_mem = ivf_search(index, q, k=5, n_probe=3).to_pandas()
        got_disk = ivf_search_disk(disk, q, k=5, n_probe=3).to_pandas()
        assert got_mem["vec_id"].tolist() == got_disk["vec_id"].tolist()

        # pruned read: probed dirs are a strict subset of the partitions,
        # and they hold strictly fewer rows than the corpus
        all_dirs = [d for d in os.listdir(tmp_path / "ivf" / "data")
                    if d.startswith("cluster=")]
        probed = probe_clusters(disk.centroids, q, 3)
        assert len(probed) == 3 < len(all_dirs)
        import glob

        import pyarrow.parquet as pq

        probed_rows = sum(
            pq.read_table(f).num_rows
            for c in probed
            for f in glob.glob(os.path.join(disk.cluster_dir(c), "*.parquet"))
        )
        assert 0 < probed_rows < 400

        # reload round-trip
        re = load_ivf(str(tmp_path / "ivf"))
        got_re = ivf_search_disk(re, q, k=5, n_probe=3).to_pandas()
        assert got_re["vec_id"].tolist() == got_disk["vec_id"].tolist()


class TestStdlibCodecs:
    def test_png_round_trip(self):
        from pycatcher_ray.stages.multimodal import make_png, parse_png

        rng = np.random.default_rng(7)
        blob = make_png(33, 21, rng)
        w, h, px = parse_png(blob)
        assert (w, h) == (33, 21)
        assert px.shape == (21, 33)

    def test_wav_round_trip_and_features(self):
        from pycatcher_ray.stages.multimodal import make_wav, parse_wav

        rng = np.random.default_rng(8)
        blob = make_wav(8000, 8000, 440.0, rng)
        rate, n, pcm = parse_wav(blob)
        assert rate == 8000 and n == 8000 and pcm.size == 8000
        # a 0.6-amplitude sine has RMS ~0.6/sqrt(2)
        x = pcm.astype(np.float64) / 32768.0
        assert abs(np.sqrt(np.mean(x * x)) - 0.6 / np.sqrt(2)) < 0.05

    def test_decoder_extracts_real_dimensions(self, ray_session):
        import ray.data as rd

        from pycatcher_ray.stages.multimodal import (
            decode_features,
            synth_media_table,
        )

        tbl = synth_media_table(16, seed=5)
        out = decode_features(rd.from_arrow(tbl)).to_pandas()
        assert len(out) == 16
        by_id = out.set_index("media_id")
        for i in range(16):
            f = np.asarray(by_id.loc[i, "features"])
            if i % 2 == 0:  # PNG: [1, w, h, mean, std, min, max, 0]
                assert f[0] == 1.0 and 8 <= f[1] <= 128 and 8 <= f[2] <= 128
            else:          # WAV: [2, rate, frames, dur, rms, peak, zcr, 0]
                assert f[0] == 2.0 and f[1] == 8000.0
                assert abs(f[3] - f[2] / 8000.0) < 1e-9
                assert 0.3 < f[4] < 0.6  # sine RMS


class TestTokenPrefixNovelty:
    """Planted duplicate prefixes: the synthesized native input has
    effectively-unique 8-token prefixes (novelty_rate 1.0 everywhere),
    so the duplicate branch — argmin by (epoch, doc_id), short-prefix
    padding, cross-day/cross-source dups — is pinned here against the
    DuckDB oracle on a hand-built corpus."""

    def test_planted_duplicates_match_oracle(self, ray_session, tmp_path,
                                             monkeypatch):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = list(range(100, 108))  # one shared 8-token prefix
        m0 = 28_401_120               # 2024-01-01T00:00 in epoch minutes
        rows = [
            # same prefix, same minute, different seq: novel = smaller
            # doc_id lexicographically
            ("a|{}|0".format(m0), base + [1, 2, 3], "srcA"),
            ("a|{}|9".format(m0), base + [4], "srcA"),
            # same prefix later same day and next day, other source
            ("a|{}|1".format(m0 + 5), base + [9, 9], "srcA"),
            ("b|{}|0".format(m0 + 1440), list(base), "srcB"),
            # short docs: len-4 vs len-5 prefixes must stay distinct,
            # len-4 dup across sources collapses
            ("a|{}|2".format(m0), [5, 5, 5, 5], "srcA"),
            ("b|{}|0".format(m0 + 1), [5, 5, 5, 5], "srcB"),
            ("b|{}|1".format(m0 + 1), [5, 5, 5, 5, 7], "srcB"),
            # single-token doc
            ("b|{}|2".format(m0 + 2), [42], "srcB"),
        ]
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array([r[2] for r in rows]),
        })
        d = tmp_path / "toks"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))

        import pycatcher_ray.queries as q

        monkeypatch.setattr(q.tokens, "tokens_input_dir", lambda sf: str(d))
        got = q.token_prefix_novelty("ignored").to_pandas()
        got = got.sort_values(["source", "day"]).reset_index(drop=True)
        want = duckdb.connect().execute(
            q._token_prefix_novelty_oracle()).fetchdf().sort_values(
            ["source", "day"]).reset_index(drop=True)
        got["day"] = got["day"].astype("datetime64[us]")
        want["day"] = want["day"].astype("datetime64[us]")
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        # hand-check the planted structure: srcA day1 has 4 docs of
        # which 2 novel (the seq-0 prefix winner and the first len-4
        # short doc; NOT seq-9 nor the later prefix dup); srcB day1:
        # len-4 dup not novel, len-5 and single-token novel; srcB day2:
        # the cross-day prefix dup is not novel
        by = got.set_index(["source", "day"])
        a1 = by.loc[("srcA", pd.Timestamp("2024-01-01"))]
        assert a1["n_docs"] == 4 and a1["n_novel"] == 2
        b1 = by.loc[("srcB", pd.Timestamp("2024-01-01"))]
        assert b1["n_docs"] == 3 and b1["n_novel"] == 2
        b2 = by.loc[("srcB", pd.Timestamp("2024-01-02"))]
        assert b2["n_docs"] == 1 and b2["n_novel"] == 0


class TestKmeansAssignPlanted:
    """Hand-built embeddings pin the kmeans_assign_step contract the
    sf-oracle can't single out: the exact-integer tie rule (equidistant
    point goes to the LOWEST centroid id) and the k-lowest-vec_id
    seeding, cross-checked against the DuckDB oracle on the same file."""

    def test_tie_goes_to_lowest_centroid(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pycatcher_ray.queries as q

        # 8 centroid seeds (vec_id 1..8) + one exact midpoint + one
        # quantization clone of centroid 8.  Coordinates sit at
        # (k + 0.5)·1e-6 — the float32 round-trip keeps ×1e6 safely
        # inside the integer cell, so floor-quantization gives q = k
        # deterministically (k·1e-6 itself would land AT the boundary
        # after float32 rounding).
        vecs = []
        for i in range(8):
            v = [0.0, 0.0, 0.0, 0.0]
            v[0] = (2 * i + 0.5) * 1e-6   # q = [2i, 0, 0, 0]
            vecs.append((i + 1, v, 0))
        vecs.append((9, [1.5e-6, 0.0, 0.0, 0.0], 0))   # q=1: dist 1 to c1 AND c2
        vecs.append((10, [14.5e-6, 0.0, 0.0, 0.0], 1))  # q=14 = centroid 8
        tbl = pa.table({
            "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
            "embedding": pa.array([v[1] for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array([v[2] for v in vecs], pa.int32()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

        got = q.kmeans_assign_step(str(tmp_path))
        got = got.sort_values("centroid_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/embeddings.parquet')")
        want = con.execute(q.oracles()["kmeans_assign_step"]).fetchdf()
        want = want.sort_values("centroid_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        by = got.set_index("centroid_id")
        assert by.loc[1, "n_vecs"] == 2      # itself + the tie point
        assert by.loc[1, "mean_sq_dist"] == 0.5
        assert by.loc[8, "n_vecs"] == 2      # itself + the clone
        assert by.loc[8, "mean_sq_dist"] == 0.0
        assert 9 not in by.index and 10 not in by.index

    def test_label_centroid_separation_exact(self, ray_session, tmp_path):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pycatcher_ray.queries as q

        # label 0 centroid = (1e-6, 0); label 1 centroid = (4e-6, 0);
        # label 2 = single point at (0, 2e-6)
        tbl = pa.table({
            "vec_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "embedding": pa.array(
                [[0.0, 0.0], [2.5e-6, 0.0],
                 [3.5e-6, 0.0], [5.5e-6, 0.0],
                 [0.0, 2.5e-6]], pa.list_(pa.float32())),
            "label": pa.array([0, 0, 1, 1, 2], pa.int32()),
        })
        pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

        got = q.label_centroid_separation(str(tmp_path))
        got = got.sort_values(["label_a", "label_b"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/embeddings.parquet')")
        want = con.execute(
            q.oracles()["label_centroid_separation"]).fetchdf()
        want = want.sort_values(["label_a", "label_b"]).reset_index(
            drop=True)
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        by = got.set_index(["label_a", "label_b"])
        assert by.loc[(0, 1), "centroid_sq_dist"] == 9.0   # (4-1)^2
        assert by.loc[(0, 2), "centroid_sq_dist"] == 5.0   # 1^2 + 2^2


class TestTokenBigramTTRPlanted:
    """Hand-built token lists pin the head-33 window (a bigram past
    position 33 must NOT count), within- and cross-doc dedup, and the
    single-token edge, against the DuckDB oracle on the same file."""

    def test_head_window_and_dedup(self, ray_session, tmp_path,
                                   monkeypatch):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pycatcher_ray.queries as q

        m0 = 28_401_120
        long_doc = list(range(1, 34)) + [777, 778]  # 35 tokens
        rows = [
            # head-33 ⇒ bigrams (1,2)..(32,33); (33,777),(777,778) cut
            (f"a|{m0}|0", long_doc, "srcA"),
            # repeats (1,2) twice within the doc and once vs the long doc
            (f"a|{m0}|1", [1, 2, 1, 2], "srcA"),
            (f"a|{m0}|2", [9], "srcA"),            # no bigram
            (f"b|{m0}|0", [1, 2, 3], "srcB"),      # separate source
        ]
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows],
                               pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], pa.int32()),
            "source": pa.array([r[2] for r in rows]),
        })
        d = tmp_path / "toks"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        monkeypatch.setattr(q.tokens, "tokens_input_dir", lambda sf: str(d))

        got = q.token_bigram_ttr("ignored").to_pandas()
        got = got.sort_values("source").reset_index(drop=True)
        want = duckdb.connect().execute(
            q._token_bigram_oracle()).fetchdf().sort_values(
            "source").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        by = got.set_index("source")
        # srcA: long doc 32 pairs + short doc 3 pairs = 35 total;
        # distinct = 32 unique of the chain + (2,1) = 33
        assert by.loc["srcA", "n_bigrams"] == 35
        assert by.loc["srcA", "n_distinct_bigrams"] == 33
        assert by.loc["srcB", "n_bigrams"] == 2
        assert by.loc["srcB", "n_distinct_bigrams"] == 2


class TestTokenLoopScorePlanted:
    """The synthesized corpus is loop-free (loopy_rate 0 everywhere), so
    the loopy branch — window multiplicity >= 3, doc-boundary window
    exclusion, sub-8-token docs dropping out — is pinned here against
    the DuckDB list-slice oracle on a hand-built corpus."""

    def test_planted_loops_match_oracle(self, ray_session, tmp_path,
                                        monkeypatch):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        import pycatcher_ray.queries as q

        base = list(range(100, 108))
        rows = [
            # 3x repeated 8-window -> loopy (multiplicity 3)
            ("a|0|0", base * 3, "srcA"),
            # the same window only twice -> NOT loopy (multiplicity 2)
            ("a|0|1", base + [1, 2, 3] + base, "srcA"),
            # unique windows -> multiplicity 1
            ("a|0|2", list(range(200, 216)), "srcA"),
            # exactly 8 tokens: one window, multiplicity 1
            ("b|0|0", base, "srcB"),
            # shorter than the window: excluded from n_docs entirely
            ("b|0|1", [7, 7, 7], "srcB"),
            # degenerate constant doc: every window identical -> loopy,
            # multiplicity = n_tok - 7 = 13
            ("b|0|2", [9] * 20, "srcB"),
        ]
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array([r[2] for r in rows]),
        })
        d = tmp_path / "toks"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))
        monkeypatch.setattr(q.tokens, "tokens_input_dir", lambda sf: str(d))

        got = q.token_loop_score("ignored").to_pandas()
        got = got.sort_values("source").reset_index(drop=True)
        want = duckdb.connect().execute(
            q._token_loop_oracle()).fetchdf().sort_values(
            "source").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        by = got.set_index("source")
        assert by.loc["srcA", "n_docs"] == 3
        assert by.loc["srcA", "n_loopy"] == 1
        assert by.loc["srcA", "max_window_repeat"] == 3
        assert by.loc["srcB", "n_docs"] == 2  # the 3-token doc drops
        assert by.loc["srcB", "n_loopy"] == 1
        assert by.loc["srcB", "max_window_repeat"] == 13


class TestDocsLengthAudit:
    def test_planted_mismatch_counted(self, ray_session, tmp_path):
        """The n_chars != len(text) branch never fires on the synth sf
        corpora (lengths are consistent by construction) — pin it with
        a planted corruption."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pycatcher_ray.queries import docs_length_audit

        texts = ["alpha beta", "gamma", "delta epsilon zeta", "eta"]
        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s1", "s1", "s2", "s2"]),
            # s1 doc 2 and s2 doc 3 corrupted (off-by-one / truncated)
            "n_chars": pa.array(
                [len(texts[0]), len(texts[1]) + 1,
                 len(texts[2]) - 5, len(texts[3])], type=pa.int64()),
        })
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        out = docs_length_audit(str(tmp_path)).to_pandas()
        out = out.set_index("source").sort_index()
        assert out.loc["s1", "n_docs"] == 2
        assert out.loc["s1", "n_mismatch"] == 1
        assert out.loc["s2", "n_mismatch"] == 1


class TestTokenVocabTurnoverPlanted:
    """The sf corpora have globally-unique token ids, so turnover
    jaccard is legitimately 0.0 there (same situation as
    token_prefix_novelty); this planted fixture pins the overlap
    branch — partial overlap, full overlap, zero overlap, the
    consecutive-day-only rule across a gap, and within-day distinct
    across repeated tokens — against the DuckDB oracle AND hand
    counts."""

    def test_planted_overlap_matches_oracle(self, ray_session, tmp_path,
                                            monkeypatch):
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        m0 = 28_401_120  # 2024-01-01T00:00 in epoch minutes
        day = 1440
        rows = [
            # srcA: day1 {1,2,3,4} (split over two docs, with repeats),
            # day2 {3,4,5,6} -> jac 2/6, day3 {7,8} -> jac 0
            ("a|{}|0".format(m0), [1, 2, 2, 3], "srcA"),
            ("a|{}|1".format(m0 + 5), [3, 4], "srcA"),
            ("a|{}|0".format(m0 + day), [3, 4, 5, 6, 6], "srcA"),
            ("a|{}|0".format(m0 + 2 * day), [7, 8], "srcA"),
            # srcB: day1 {10}, day2 {10} -> jac 1.0; then a GAP (no
            # day3) and day4 {11}: no row for day4 (prev day missing)
            ("b|{}|0".format(m0), [10], "srcB"),
            ("b|{}|0".format(m0 + day), [10, 10], "srcB"),
            ("b|{}|0".format(m0 + 3 * day), [11], "srcB"),
        ]
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows]),
            "tokens": pa.array([r[1] for r in rows],
                               type=pa.list_(pa.int32())),
            "n_tok": pa.array([len(r[1]) for r in rows], type=pa.int32()),
            "source": pa.array([r[2] for r in rows]),
        })
        d = tmp_path / "toks"
        d.mkdir()
        pq.write_table(tbl, str(d / "part-0.parquet"))

        import pycatcher_ray.queries as q

        monkeypatch.setattr(q.tokens, "tokens_input_dir", lambda sf: str(d))
        got = q.token_vocab_turnover("ignored")
        got = got.sort_values(["source", "day"]).reset_index(drop=True)
        want = duckdb.connect().execute(
            q._token_vocab_turnover_oracle()).fetchdf().sort_values(
            ["source", "day"]).reset_index(drop=True)
        got["day"] = got["day"].astype("datetime64[us]")
        want["day"] = want["day"].astype("datetime64[us]")
        pd.testing.assert_frame_equal(got, want[got.columns],
                                      check_dtype=False, rtol=0, atol=0)
        by = got.set_index(["source", "day"])
        a2 = by.loc[("srcA", pd.Timestamp("2024-01-02"))]
        assert (a2["vocab_prev"], a2["vocab_day"], a2["n_common"]) == (4, 4, 2)
        assert a2["jaccard"] == 2 / 6
        a3 = by.loc[("srcA", pd.Timestamp("2024-01-03"))]
        assert (a3["n_common"], a3["jaccard"]) == (0, 0.0)
        b2 = by.loc[("srcB", pd.Timestamp("2024-01-02"))]
        assert b2["jaccard"] == 1.0
        # the post-gap day has no row: prev day unobserved
        assert ("srcB", pd.Timestamp("2024-01-04")) not in by.index
        assert len(got) == 3
