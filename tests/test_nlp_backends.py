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


def test_enrich_model_scaffold_with_fake_model(spark, tmp_path):
    """_enrich_model's per-executor model-reuse pattern, proven without
    spaCy: a stub factory (a) produces the full stats column set appended to
    the original columns, and (b) is invoked ONCE per task even when the
    task streams multiple Arrow batches — the 'model loads once per worker'
    contract that makes model UDFs viable at scale."""
    import glob
    import uuid

    from wicsmmiretl_spark.functions.nlp_backends import _enrich_model

    marker_dir = str(tmp_path)

    # Closure (module-level functions don't unpickle on executors): each
    # factory call drops a marker file, so the file count == model loads.
    def fake_batch_fn():
        with open(f"{marker_dir}/{uuid.uuid4().hex}.load", "w"):
            pass

        def run(texts):
            return [
                {
                    "num_tok": len(t.split()),
                    "num_sent": 1,
                    "min_sent_len": len(t.split()),
                    "max_sent_len": len(t.split()),
                    "num_ne": 0,
                    "ne_texts": [],
                    "ne_types": [],
                    "num_nouns": 0,
                    "num_propn": 0,
                    "num_conj": 0,
                    "num_verb": 0,
                    "num_sym": 0,
                    "num_num": 0,
                    "num_adp": 0,
                    "num_adj": 0,
                    "ratio_ne_tok": 0.0,
                    "ratio_noun_tok": 0.0,
                    "ratio_propn_tok": 0.0,
                    "ratio_all_noun_tok": 0.0,
                }
                for t in texts
            ]

        return run

    df = spark.createDataFrame(
        [(i, f"word {'x ' * i}end") for i in range(10)], "doc_id long, text string"
    ).coalesce(1)
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        out = _enrich_model(df, "text", fake_batch_fn).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    assert len(out) == 10
    by_id = {r.doc_id: r for r in out}
    assert by_id[3].num_tok == 5  # "word x x x end" — original cols preserved
    assert by_id[0].ne_texts == []
    # 10 rows / 2-row batches = 5 batches streamed through ONE factory call.
    assert len(glob.glob(f"{marker_dir}/*.load")) == 1


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! It's 2024.",)], "text string")
    r = token_counts(df, "text").first()
    assert r.ws_tokens == 4
    # Hello , world ! It ' s 2 0 2 4 .  -> letters runs + digits + punct runs
    assert r.bpe_tokens == 12
