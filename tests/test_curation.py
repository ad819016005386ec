"""End-to-end curation-pipeline tests: planted junk / exact dups /
near-dups flow through quality gate → exact dedup → minhash
canonicalization → checkpointed write, and a rerun resumes."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pycatcher_ray.pipelines import run_curation


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    rng = np.random.default_rng(99)
    vocab = np.array([f"word{i}" for i in range(300)])
    texts, n = [], 120
    for _ in range(n):
        texts.append(" ".join(rng.choice(vocab, int(rng.integers(20, 60)))))
    texts[0] = ""                       # junk: empty
    texts[1] = "!!! ??? ..."            # junk: punct-only (0 words)
    texts[2] = "one two"                # junk: below min_words
    texts[3] = texts[10]                # exact duplicate
    texts[4] = texts[10]                # exact triplicate
    base = " ".join(rng.choice(vocab, 50))
    texts[5] = base
    texts[6] = base + " extraword"      # near duplicate of 5
    texts[7] = None                     # junk: NULL text (gate-dropped)
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["web"] * n),
    })
    d = tmp_path_factory.mktemp("curation")
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def _read_corpus(out_dir):
    files = sorted(glob.glob(os.path.join(out_dir, "corpus", "part=*",
                                          "data.parquet")))
    return pd.concat([pd.read_parquet(f) for f in files],
                     ignore_index=True)


class TestCurationPipeline:
    def test_end_to_end(self, ray_session, corpus_dir, tmp_path):
        out = str(tmp_path / "out")
        m = run_curation(os.path.join(corpus_dir, "documents.parquet"), out)

        # junk dropped at the gate (empty, punct-only, too-short, NULL)
        assert m["quality_gate"]["n_input"] == 120
        assert m["quality_gate"]["n_dropped"] >= 4
        # two of the three identical texts dropped
        assert m["exact_dedup"]["n_dropped"] == 2
        # the planted near-dup pair collapsed to its min doc_id
        assert m["near_dedup"]["n_dropped"] >= 1

        got = _read_corpus(out)
        assert m["write"]["rows_written"] == len(got)
        # no duplicate texts survive
        assert got["text"].nunique() == len(got)
        # canonical doc of the exact-dup group {3, 4, 10} is min id 3
        ids = set(got["doc_id"].to_numpy().tolist())
        assert 3 in ids and 4 not in ids and 10 not in ids
        # NULL text never reaches the output
        assert 7 not in ids
        # of the near-dup pair (5, 6), only 5 survives
        assert 5 in ids and 6 not in ids
        # quality score attached and above the gate for every kept row
        assert (got["quality_score"] >= 0.35).all()
        # books: input - all drops == written
        assert (120 - m["quality_gate"]["n_dropped"]
                - m["exact_dedup"]["n_dropped"]
                - m["near_dedup"]["n_dropped"]) == len(got)

    def test_text_digests_null_convention(self):
        # NULL text hashes as "" (the dedup_exact (t or "") convention),
        # NOT as the stringified literal 'None'
        from pycatcher_ray.pipelines.curation import _text_digests

        d = _text_digests(pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": pd.Series([None, "", "None"], dtype=object)}))
        assert d["h1"][0] == d["h1"][1] and d["h2"][0] == d["h2"][1]
        assert d["h1"][0] != d["h1"][2]

    def test_rerun_resumes(self, ray_session, corpus_dir, tmp_path):
        out = str(tmp_path / "out2")
        src = os.path.join(corpus_dir, "documents.parquet")
        m1 = run_curation(src, out)
        m2 = run_curation(src, out)
        assert m2["write"]["rows_written"] == 0
        assert sorted(m2["write"]["partitions_skipped"]) == sorted(
            m1["write"]["partitions_written"])
