"""Large-scale training-data pipeline operators (engine extensions beyond the
reference's surface — SURVEY §7.4 north-star). All operators are pure
DataFrame compositions (JVM-side, codegen-friendly) unless an algorithm
genuinely needs Python, in which case Arrow-batched Pandas UDFs are used.
"""

from .dedup import (
    connected_components,
    dedup_against_corpus,
    dedup_keep_best,
    exact_dedup,
    minhash_signatures,
    minhash_candidate_pairs,
    minhash_neardup_pairs,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_candidate_pairs,
    simhash_neardup_pairs,
    word_shingles,
)
from .similarity import (
    batch_cosine_topk,
    brute_force_cosine_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_batch_topk,
    lsh_bucketed_topk,
    normalize_vectors,
    quantize_vectors,
)
from .text import (
    document_fingerprint,
    inverted_index,
    language_id,
    quality_scores,
    scrub_pii,
    tf_idf,
    token_stats,
    pack_sequences,
    winnow_fingerprints,
)
from .bpe import bpe_apply, bpe_learn, word_freq_table
from .fuzzy import edit_distance_pairs
from .profile import (
    correlation_matrix,
    numeric_histogram,
    profile_columns,
    skew_profile,
    validate_expectations,
)
from .sampling import (
    corpus_shuffle,
    corpus_upsample,
    deterministic_sample,
    percentile_band_filter,
)
from .timeseries import (
    cohort_retention,
    resample_counts,
    funnel_next_within,
    latest_state,
    rolling_window_agg,
)
from .multimodal import (
    attach_binary_payload,
    audio_window_features,
    extract_binary_features,
    resize_images,
    sample_video_frames,
    stub_decode_image,
)

__all__ = [
    "attach_binary_payload",
    "audio_window_features",
    "batch_cosine_topk",
    "brute_force_cosine_topk",
    "lsh_batch_topk",
    "connected_components",
    "dedup_against_corpus",
    "bpe_apply",
    "bpe_learn",
    "word_freq_table",
    "corpus_shuffle",
    "corpus_upsample",
    "deterministic_sample",
    "document_fingerprint",
    "dedup_keep_best",
    "cohort_retention",
    "correlation_matrix",
    "edit_distance_pairs",
    "exact_dedup",
    "extract_binary_features",
    "funnel_next_within",
    "ivf_topk",
    "latest_state",
    "percentile_band_filter",
    "profile_columns",
    "rolling_window_agg",
    "resample_counts",
    "kmeans_centroids",
    "language_id",
    "lsh_bucketed_topk",
    "numeric_histogram",
    "skew_profile",
    "validate_expectations",
    "minhash_candidate_pairs",
    "minhash_neardup_pairs",
    "minhash_signatures",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "normalize_vectors",
    "quantize_vectors",
    "quality_scores",
    "inverted_index",
    "resize_images",
    "sample_video_frames",
    "simhash_candidate_pairs",
    "simhash_fingerprints",
    "simhash_neardup_pairs",
    "scrub_pii",
    "stub_decode_image",
    "tf_idf",
    "token_stats",
    "pack_sequences",
    "winnow_fingerprints",
    "word_shingles",
]
