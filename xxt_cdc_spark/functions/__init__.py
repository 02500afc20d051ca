"""Large-scale data-pipeline operators (north-star extensions).

These go beyond the reference's CDC surface (SURVEY.md §2.7): text
analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram
Jaccard / embedding cosine), similarity search, and multimodal binary
columns. All hot paths are built from JVM-side built-ins; Python
appears only in the explicitly-stubbed multimodal decoders.
"""

from xxt_cdc_spark.functions import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
