"""North-star extensions beyond the reference surface (SURVEY.md §7.1
M7): multimodal binary plumbing. Dedup / similarity / text analysis
live in plans/queries_text.py and plans/queries_embed.py as oracle-
checked queries; this package holds the operators that need Python
(Arrow-batched mapInPandas), which the query layer cannot express as
pure Column expressions.
"""

from iot_etl_spark.extensions.multimodal import (
    decode_and_featurize,
    sample_frames,
    make_fake_media_bytes,
)
from iot_etl_spark.extensions.ann import kmeans_cells, ivf_topk
from iot_etl_spark.extensions.corpus import dedupe_corpus
from iot_etl_spark.extensions.sketches import (
    approx_distinct_profile,
    approx_quantile_profile,
)

__all__ = [
    "decode_and_featurize",
    "sample_frames",
    "make_fake_media_bytes",
    "kmeans_cells",
    "ivf_topk",
    "dedupe_corpus",
    "approx_distinct_profile",
    "approx_quantile_profile",
]
