"""Training-data pipeline operators beyond the reference's validator.

The north-star engine validates pre-tokenized training corpora; these
modules add the data-processing operators a large-scale training pipeline
needs around validation — deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding cosine), similarity search, text analysis
(language id, quality scoring, token counting, fingerprinting) and
multimodal binary-column plumbing. All are Spark-first: built-in
functions and broadcast/bucket joins in the hot path, Arrow-batched
pandas stages only where linear algebra genuinely needs numpy.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
