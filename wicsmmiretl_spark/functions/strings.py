"""Scalar string functions (SURVEY §2.7 F1-F4).

All pure Catalyst expressions — Java regex supports ``\\p{C}`` so even the
polyglot-crash control-char strip (utils.py:431) stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def strip_control_chars(text: Column | str) -> Column:
    """F1: remove unicode control characters (utils.py:431)."""
    return F.regexp_replace(_c(text), r"\p{C}", "")


def add_punct(text: Column | str) -> Column:
    """F2: strip, drop trailing dots, append '. '
    (f30k_vs_coco_vs_wicsmmir_v2.ipynb cell 34)."""
    return F.concat(F.regexp_replace(F.trim(_c(text)), r"\.+$", ""), F.lit(". "))


def concat_corpus(df, text_col: str, order_col: str) -> Column:
    """F3: concat-reduce sampled captions into one document — inherently a
    small-set op; collect_list with a deterministic sort inside one agg."""
    return F.concat_ws("", F.array_sort(F.collect_list(F.struct(order_col, text_col)))[text_col])


def wikimedia_urls(file_col: Column | str, width: int = 640) -> tuple[Column, Column]:
    """F4: build the (direct, fallback) Wikimedia thumbnail URLs from a
    ``File:...`` id — md5-sharded commons path (utils.py:46-61; perl twin
    scripts/wikimgrab.pl:15-28).

    Returns (direct_url, indirect_url) columns. Percent-encoding uses
    ``url_encode`` (Spark ≥3.4).
    """
    c = _c(file_col)
    name = F.regexp_replace(c, r"^(File|Image):", "")
    name = F.regexp_replace(name, r" ", "_")
    # Uppercase first char, as MediaWiki canonicalizes.
    name = F.concat(F.upper(F.substring(name, 1, 1)), F.substring(name, 2, F.length(name) - 1))
    digest = F.md5(name)
    shard1 = F.substring(digest, 1, 1)
    shard2 = F.substring(digest, 1, 2)
    encoded = F.url_encode(name)
    direct = F.concat(
        F.lit("https://upload.wikimedia.org/wikipedia/commons/thumb/"),
        shard1, F.lit("/"), shard2, F.lit("/"), encoded,
        F.lit(f"/{width}px-"), encoded,
    )
    # Fallback form matches the reference's second-stage retry (utils.py:61):
    # Special:FilePath redirects to the original upload regardless of shard.
    indirect = F.concat(
        F.lit("https://commons.wikimedia.org/w/index.php?title=Special:FilePath&file="),
        encoded,
        F.lit(f"&width={width}"),
    )
    return direct, indirect
