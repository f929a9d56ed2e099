"""LLM training-data pipeline operators.

First-class, scale-oriented operators a large-scale training-data
pipeline needs on top of the OLAP surface: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard), embedding similarity search
(brute-force and LSH-bucketed ANN), text analysis (token counting,
quality signals, language ID, fingerprinting) and multimodal binary
column plumbing.

Everything is built from native ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage codegen) — no Python UDFs in any hot path.  The
only Pandas-UDF code is the multimodal decode plumbing, whose decode
step is stubbed (no image/audio libs in this environment) while the
Spark-side schema/batching is real.

Hashes are *portable*: derived from md5 so a DuckDB/ANSI-SQL oracle can
reproduce them bit-for-bit (see :func:`cubes_spark.llm.text.hash64`).
"""

from cubes_spark.llm.text import (
    bpe_token_count,
    chunk_documents,
    deterministic_split,
    fingerprint,
    hash64,
    language_id,
    pack_sequences,
    redact_pii,
    repetition_stats,
    text_stats,
    token_array,
    trigram_logprob,
    winnow_fingerprints,
)
from cubes_spark.llm.dedup import (
    benchmark_contamination,
    connected_components,
    duplicate_clusters,
    duplicate_spans,
    exact_duplicates,
    span_duplicate_docs,
    minhash_signatures,
    minhash_candidate_pairs,
    simhash,
    simhash_near_duplicates,
    ngram_jaccard_pairs,
)
from cubes_spark.llm.similarity import (
    cosine_topk,
    ann_lsh_cosine,
    embedding_near_duplicates,
    ivf_topk,
    kmeans_clusters,
    random_projection,
    semantic_dedup,
)
from cubes_spark.llm.web import (
    extract_links,
    html_to_text,
    parse_tar,
    parse_warc,
    webdataset_samples,
)
from cubes_spark.llm.multimodal import (
    audio_metadata,
    binary_metadata,
    decode_features,
    avi_frame_stats,
    bmp_pixel_stats,
    decode_avi,
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_wav,
    gif_pixel_stats,
    jpeg_pixel_stats,
    matroska_metadata,
    matroska_tracks,
    image_dimensions,
    png_pixel_stats,
    wav_sample_stats,
    resize_samples,
    resize_image,
    image_resize_stats,
    resample_samples,
    resample_audio,
    audio_resample_stats,
    video_frame_pipeline,
)

__all__ = [
    "hash64",
    "token_array",
    "bpe_token_count",
    "text_stats",
    "chunk_documents",
    "deterministic_split",
    "pack_sequences",
    "language_id",
    "fingerprint",
    "winnow_fingerprints",
    "repetition_stats",
    "redact_pii",
    "trigram_logprob",
    "exact_duplicates",
    "duplicate_spans",
    "span_duplicate_docs",
    "benchmark_contamination",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "simhash",
    "simhash_near_duplicates",
    "ngram_jaccard_pairs",
    "connected_components",
    "duplicate_clusters",
    "cosine_topk",
    "ann_lsh_cosine",
    "embedding_near_duplicates",
    "ivf_topk",
    "kmeans_clusters",
    "semantic_dedup",
    "random_projection",
    "html_to_text",
    "extract_links",
    "parse_warc",
    "parse_tar",
    "webdataset_samples",
    "binary_metadata",
    "image_dimensions",
    "audio_metadata",
    "decode_features",
    "avi_frame_stats",
    "bmp_pixel_stats",
    "decode_avi",
    "decode_bmp",
    "decode_gif",
    "decode_jpeg",
    "jpeg_pixel_stats",
    "matroska_metadata",
    "matroska_tracks",
    "decode_png",
    "decode_wav",
    "gif_pixel_stats",
    "png_pixel_stats",
    "wav_sample_stats",
    "resize_samples",
    "resize_image",
    "image_resize_stats",
    "resample_samples",
    "resample_audio",
    "audio_resample_stats",
    "video_frame_pipeline",
]
