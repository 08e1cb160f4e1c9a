"""Corpus-scale training-data operators over Ray Datasets.

These are the large-scale data-pipeline operations a 100 TB training corpus
needs alongside extraction: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding cosine), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language ID, quality scoring, token
counting, fingerprinting), and multimodal column plumbing.

Every operator is expressed Ray-Data-first: vectorized map_batches for the
narrow work, partial aggregation before any groupby, broadcast (ray.put)
for small sides, and hash-bucket groupbys instead of all-pair shuffles.
"""

from .text import add_text_stats, detect_language, fingerprint_documents
from .dedup import exact_dedup, minhash_signatures, minhash_dedup_pairs, simhash_64
from .ann import brute_force_topk

__all__ = [
    "add_text_stats",
    "brute_force_topk",
    "detect_language",
    "exact_dedup",
    "fingerprint_documents",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "simhash_64",
]
