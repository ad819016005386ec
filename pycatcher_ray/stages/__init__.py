"""Ray Data stages: ingest, rollup/cascade, gap-fill, detect, compress,
text ops, dedup, multimodal."""

from .ann import IVFIndex, brute_topk, build_ivf, ivf_search, kmeans_fit
from .compress import add_chunk_id, compress, decompress_table
from .dedup import (
    MinHasher,
    SimHasher,
    cluster_pairs,
    embedding_neardup,
    lsh_candidate_pairs,
    minhash_bands,
    minhash_dedup,
    shingle_set,
    simhash_pairs,
    verify_jaccard_pairs,
    word_hashes,
)
from .detect import DetectorActor, detect, detect_series, pack_series
from .gapfill import gapfill, gapfill_group
from .ingest import derive_ts, ingest, token_checksum_column, validate_batch
from .multimodal import MediaDecoder, decode_features, synth_media_table
from .retention import DEFAULT_RETENTION, apply_retention
from .rollup import bucket_column, cascade, rollup, rollup_tiers
from .textops import Fingerprint, LangId, TextStats, fingerprint, lang_id, text_stats

__all__ = [
    "IVFIndex", "brute_topk", "build_ivf", "ivf_search", "kmeans_fit",
    "add_chunk_id", "compress", "decompress_table",
    "MinHasher", "SimHasher", "cluster_pairs", "embedding_neardup",
    "lsh_candidate_pairs", "minhash_bands", "minhash_dedup", "shingle_set",
    "simhash_pairs", "verify_jaccard_pairs", "word_hashes",
    "DetectorActor", "detect", "detect_series", "pack_series",
    "gapfill", "gapfill_group",
    "derive_ts", "ingest", "token_checksum_column", "validate_batch",
    "MediaDecoder", "decode_features", "synth_media_table",
    "DEFAULT_RETENTION", "apply_retention",
    "bucket_column", "cascade", "rollup", "rollup_tiers",
    "Fingerprint", "LangId", "TextStats", "fingerprint", "lang_id", "text_stats",
]
