from analyst_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_features,
    token_count,
)
from analyst_spark.functions.dedup import (
    cross_corpus_minhash_pairs,
    exact_dedup,
    minhash_pairs,
    ngram_jaccard_pairs,
    release_cached,
    shingle_tokens,
    simhash_signatures,
)
from analyst_spark.functions.shuffle import seeded_shuffle
from analyst_spark.functions.multimodal import (
    audio_features,
    image_features,
    resize_images,
)
from analyst_spark.functions.similarity import cosine_topk, ivf_topk, lsh_bucket_topk

__all__ = [
    "token_count",
    "quality_features",
    "language_id",
    "doc_fingerprint",
    "exact_dedup",
    "shingle_tokens",
    "minhash_pairs",
    "simhash_signatures",
    "ngram_jaccard_pairs",
    "cross_corpus_minhash_pairs",
    "seeded_shuffle",
    "release_cached",
    "cosine_topk",
    "ivf_topk",
    "lsh_bucket_topk",
    "image_features",
    "audio_features",
    "resize_images",
]
