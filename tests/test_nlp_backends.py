"""NLP backend strategy dispatch (E1 backend parity)."""

from __future__ import annotations

import pytest

from wicsmmiretl_spark.functions.nlp_backends import available_backends, enrich
from wicsmmiretl_spark.functions.text import token_counts


def test_builtin_backend_dispatch(spark):
    df = spark.createDataFrame([("one two three. four five.",)], "text string")
    r = enrich(df, "text", backend="builtin").first()
    assert r.num_tok == 5 and r.num_sent == 2


def test_unknown_backend_raises(spark):
    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="unknown NLP backend"):
        enrich(df, "text", backend="polyglot9000")


def test_missing_model_backend_raises_cleanly(spark):
    backends = available_backends()
    assert backends["builtin"] is True
    df = spark.createDataFrame([("x",)], "text string")
    for name, present in backends.items():
        if name != "builtin" and not present:
            with pytest.raises(ImportError, match="not installed"):
                enrich(df, "text", backend=name)


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! It's 2024.",)], "text string")
    r = token_counts(df, "text").first()
    assert r.ws_tokens == 4
    # Hello , world ! It ' s 2 0 2 4 .  -> letters runs + digits + punct runs
    assert r.bpe_tokens == 12
