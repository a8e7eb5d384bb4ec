from wicsmmiretl_spark.functions.text import (
    tokens,
    sentences,
    caption_stats,
    add_ratio_columns,
    vocab,
    language_id,
    quality_score,
    fingerprint,
)
from wicsmmiretl_spark.functions.strings import (
    strip_control_chars,
    add_punct,
    wikimedia_urls,
)

__all__ = [
    "tokens",
    "sentences",
    "caption_stats",
    "add_ratio_columns",
    "vocab",
    "language_id",
    "quality_score",
    "fingerprint",
    "strip_control_chars",
    "add_punct",
    "wikimedia_urls",
]
