"""Model-backed NLP enrichment backends (SURVEY §2.8 E1 strategy parameter).

The reference selects among spaCy / NLTK / polyglot via
``MetadataGeneratorBackend`` (utils.py:39-43) and runs the model in forked
worker processes (``nlp.pipe(n_process=...)``, utils.py:234-235). The Spark
equivalent is a ``mapInPandas`` strategy with **per-executor model caching**:
the iterator-of-batches form loads the model once per Python worker, then
streams Arrow batches through it — the cluster-wide generalization of
spaCy's fork+pipe.

Backends:
* ``builtin`` — wicsmmiretl_spark.functions.text.caption_stats (pure
  Catalyst expressions, no Python). Default; always available.
* ``spacy`` / ``nltk`` — full POS/NER stats matching the reference's column
  set (utils.py:228-396). Optional: gated on import, raising a clear error
  when the model library is absent (this container ships neither).

The POS-count columns (num_nouns … num_adj) and entity types are only
available from model backends — same optionality as the reference's
``pos_tag_stats`` flag.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

_POS_COLUMNS = [
    "num_nouns",
    "num_propn",
    "num_conj",
    "num_verb",
    "num_sym",
    "num_num",
    "num_adp",
    "num_adj",
]

_STATS_FIELDS = [
    StructField("num_tok", IntegerType()),
    StructField("num_sent", IntegerType()),
    StructField("min_sent_len", IntegerType()),
    StructField("max_sent_len", IntegerType()),
    StructField("num_ne", IntegerType()),
    StructField("ne_texts", ArrayType(StringType())),
    StructField("ne_types", ArrayType(StringType())),
    *[StructField(c, IntegerType()) for c in _POS_COLUMNS],
    StructField("ratio_ne_tok", DoubleType()),
    StructField("ratio_noun_tok", DoubleType()),
    StructField("ratio_propn_tok", DoubleType()),
    StructField("ratio_all_noun_tok", DoubleType()),
]


def available_backends() -> dict[str, bool]:
    out = {"builtin": True}
    for mod in ("spacy", "nltk"):
        try:
            __import__(mod)
            out[mod] = True
        except ImportError:
            out[mod] = False
    return out


def enrich(df: DataFrame, text_col: str = "text", backend: str = "builtin") -> DataFrame:
    """E1 dispatcher — mirrors generate_caption_stats' backend switch
    (utils.py:183-226)."""
    if backend == "builtin":
        from wicsmmiretl_spark.functions.text import caption_stats

        return caption_stats(df, text_col)
    if backend == "spacy":
        return _enrich_model(df, text_col, _spacy_batch_fn())
    if backend == "nltk":
        return _enrich_model(df, text_col, _nltk_batch_fn())
    raise ValueError(f"unknown NLP backend {backend!r}; available: {available_backends()}")


def _enrich_model(df: DataFrame, text_col: str, batch_fn) -> DataFrame:
    """Shared mapInPandas scaffold: original columns + stats fields appended.

    ``batch_fn(texts: list[str]) -> list[dict]`` is the model-specific part;
    it is constructed lazily INSIDE the worker (per-executor model cache) via
    the closure returned by ``_spacy_batch_fn``/``_nltk_batch_fn``.
    """
    out_schema = StructType(list(df.schema.fields) + _STATS_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fn = batch_fn()  # model loads once per worker, on first batch stream
        for pdf in batches:
            stats = pd.DataFrame(fn(list(pdf[text_col].fillna(""))))
            yield pd.concat([pdf.reset_index(drop=True), stats], axis=1)

    return df.mapInPandas(run, out_schema)


def _ratios(stats: dict) -> dict:
    nt = max(stats["num_tok"], 1)
    stats["ratio_ne_tok"] = stats["num_ne"] / nt
    stats["ratio_noun_tok"] = stats["num_nouns"] / nt
    stats["ratio_propn_tok"] = stats["num_propn"] / nt
    stats["ratio_all_noun_tok"] = (stats["num_nouns"] + stats["num_propn"]) / nt
    return stats


def _spacy_batch_fn():
    """spaCy backend (utils.py:228-301 parity: nlp.pipe batching, POS Counter,
    NER texts/types). Returns a factory so the model loads on the executor,
    not the driver."""
    try:
        import spacy  # noqa: F401
    except ImportError as ex:  # pragma: no cover - env without spacy
        raise ImportError(
            "spaCy backend requested but spacy is not installed; "
            "use backend='builtin' or install spacy + en_core_web_sm"
        ) from ex

    def factory():
        import spacy
        from collections import Counter

        nlp = spacy.load("en_core_web_sm")

        def run(texts: list[str]) -> list[dict]:
            out = []
            for doc in nlp.pipe(texts):
                sents = list(doc.sents)
                sent_lens = [len(s) for s in sents] or [0]
                pos = Counter(t.pos_ for t in doc)
                stats = {
                    "num_tok": len(doc),
                    "num_sent": len(sents),
                    "min_sent_len": min(sent_lens),
                    "max_sent_len": max(sent_lens),
                    "num_ne": len(doc.ents),
                    "ne_texts": [e.text for e in doc.ents],
                    "ne_types": [e.label_ for e in doc.ents],
                    "num_nouns": pos.get("NOUN", 0),
                    "num_propn": pos.get("PROPN", 0),
                    "num_conj": pos.get("CONJ", 0) + pos.get("CCONJ", 0) + pos.get("SCONJ", 0),
                    "num_verb": pos.get("VERB", 0),
                    "num_sym": pos.get("SYM", 0),
                    "num_num": pos.get("NUM", 0),
                    "num_adp": pos.get("ADP", 0),
                    "num_adj": pos.get("ADJ", 0),
                }
                out.append(_ratios(stats))
            return out

        return run

    return factory


def _nltk_batch_fn():
    """NLTK backend (utils.py:302-396 parity: word/sent tokenize, pos_tag,
    ne_chunk)."""
    try:
        import nltk  # noqa: F401
    except ImportError as ex:  # pragma: no cover - env without nltk
        raise ImportError(
            "NLTK backend requested but nltk is not installed; "
            "use backend='builtin' or install nltk + punkt/tagger data"
        ) from ex

    def factory():
        import nltk
        from collections import Counter

        def run(texts: list[str]) -> list[dict]:
            out = []
            for text in texts:
                sents = nltk.sent_tokenize(text) or [""]
                toks_per_sent = [nltk.word_tokenize(s) for s in sents]
                toks = [t for ts in toks_per_sent for t in ts]
                tagged = nltk.pos_tag(toks)
                pos = Counter(tag for _, tag in tagged)
                tree = nltk.ne_chunk(tagged)
                ents = [
                    (" ".join(w for w, _ in st.leaves()), st.label())
                    for st in tree.subtrees()
                    if st.label() != "S"
                ]
                stats = {
                    "num_tok": len(toks),
                    "num_sent": len(sents),
                    "min_sent_len": min(len(ts) for ts in toks_per_sent),
                    "max_sent_len": max(len(ts) for ts in toks_per_sent),
                    "num_ne": len(ents),
                    "ne_texts": [t for t, _ in ents],
                    "ne_types": [ty for _, ty in ents],
                    "num_nouns": sum(v for k, v in pos.items() if k.startswith("NN") and k != "NNP"),
                    "num_propn": pos.get("NNP", 0) + pos.get("NNPS", 0),
                    "num_conj": pos.get("CC", 0) + pos.get("IN", 0),
                    "num_verb": sum(v for k, v in pos.items() if k.startswith("VB")),
                    "num_sym": pos.get("SYM", 0),
                    "num_num": pos.get("CD", 0),
                    "num_adp": pos.get("RP", 0),
                    "num_adj": sum(v for k, v in pos.items() if k.startswith("JJ")),
                }
                out.append(_ratios(stats))
            return out

        return run

    return factory
