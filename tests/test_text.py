"""Text analysis: enrichment invariants (FIXTURES.md §A2 property tests),
vocab, language ID, quality, fingerprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from wicsmmiretl_spark.catalog import load_table
from wicsmmiretl_spark.functions.strings import add_punct, strip_control_chars
from wicsmmiretl_spark.functions.text import (
    add_ratio_columns,
    caption_stats,
    fingerprint,
    language_id,
    quality_score,
    vocab,
)


def test_caption_stats_invariants(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = caption_stats(docs, "text")
    bad = out.filter(
        (F.col("num_tok") <= 0)
        | (F.col("num_sent") < 1)
        | (F.col("min_sent_len") > F.col("max_sent_len"))
        | (F.col("max_sent_len") > F.col("num_tok"))
        | (F.col("num_ne") > F.col("num_tok"))
        | (F.col("num_ne") != F.size("ne_texts"))
    )
    assert bad.count() == 0


def test_caption_stats_known_values(spark):
    df = spark.createDataFrame([("The cat sat. The dog ran away!",)], "text string")
    r = caption_stats(df, "text").first()
    assert r.num_tok == 7
    assert r.num_sent == 2
    assert r.min_sent_len == 3
    assert r.max_sent_len == 4


def test_ratio_columns_bounded(spark, sf_dir):
    docs = caption_stats(load_table(spark, "documents", sf_dir), "text")
    out = add_ratio_columns(docs, ["num_ne"])
    bad = out.filter((F.col("ratio_ne_tok") < 0) | (F.col("ratio_ne_tok") > 1))
    assert bad.count() == 0


def test_vocab_counts(spark):
    df = spark.createDataFrame([("a b a",), ("b a",)], "text string")
    out = {r.token: r["count"] for r in vocab(df, "text").collect()}
    assert out == {"a": 3, "b": 2}


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat is in the house and it is warm",),
            ("der Hund ist nicht mit der Katze",),
            ("el perro es un animal que vive en la casa",),
            ("zzz qqq xxx",),
        ],
        "text string",
    )
    out = [r.l for r in df.select(language_id("text").alias("l")).collect()]
    assert out == ["en", "de", "es", "und"]


def test_quality_score_ranges(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    out = quality_score(docs, "text")
    bad = out.filter(
        (F.col("q_alpha_ratio") < 0)
        | (F.col("q_alpha_ratio") > 1)
        | (F.col("q_stopword_ratio") < 0)
        | (F.col("q_stopword_ratio") > 1)
        | (F.col("q_distinct_ratio") < 0)
        | (F.col("q_distinct_ratio") > 1)
    )
    assert bad.count() == 0


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",), ("other",)], "text string")
    fps = [r.fp for r in df.select(fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_strip_control_chars(spark):
    df = spark.createDataFrame([("a\x00b\x1fc",)], "text string")
    assert df.select(strip_control_chars("text").alias("t")).first().t == "abc"


def test_add_punct(spark):
    df = spark.createDataFrame([("caption ends here...",), ("no dots",)], "text string")
    out = [r.t for r in df.select(add_punct("text").alias("t")).collect()]
    assert out == ["caption ends here. ", "no dots. "]


def test_ne_types_parallel_to_ne_texts(spark):
    from pyspark.sql import Row

    from wicsmmiretl_spark.functions.text import caption_stats

    df = spark.createDataFrame(
        [Row(doc_id=1, text="we saw Paris and IBM today"), Row(doc_id=2, text="plain words only")]
    )
    rows = {r.doc_id: r for r in caption_stats(df, "text").collect()}
    assert len(rows[1].ne_types) == len(rows[1].ne_texts) == rows[1].num_ne
    by_text = dict(zip(rows[1].ne_texts, rows[1].ne_types))
    assert by_text["Paris"] == "PROPN" and by_text["IBM"] == "ORG"
    assert rows[2].ne_types == []


def test_bigram_surprisal_orders_quality(spark):
    """A doc repeating one bigram scores LOWER mean surprisal than a doc of
    corpus-unique bigrams; docs with <2 tokens are excluded."""
    from wicsmmiretl_spark.functions.text import bigram_surprisal

    rows = [
        (1, "the cat " * 30),             # one dominant bigram, high count
        (2, "zq wv xr yk pm jn tb ld"),   # every bigram unique
        (3, "single"),                    # no bigrams -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, r.avg_surprisal) for r in bigram_surprisal(df).collect()}
    assert set(out) == {1, 2}
    assert out[1][0] == 59 and out[2][0] == 7
    assert out[1][1] < out[2][1]


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------

def test_pmi_prefers_exclusive_pairs(spark):
    import math

    import pytest

    from wicsmmiretl_spark.functions.text import pmi_collocations

    # "a b" always co-occur (exclusive); "x y" co-occur but x/y also appear alone.
    docs = spark.createDataFrame(
        [(1, "a b " * 10 + "x y " * 10 + "x z y q " * 10)],
        "doc_id: bigint, text: string",
    )
    out = {(r.w1, r.w2): r.pmi for r in pmi_collocations(docs, min_count=5, k=50).collect()}
    assert out[("a", "b")] > out[("x", "y")]
    # Hand value: c_ab=10, c_a=c_b=10, N=79 bigrams, W=80 tokens ->
    # pmi = ln(10*80*80/(79*10*10)) = ln(8.101...)
    assert out[("a", "b")] == pytest.approx(math.log(10 * 80 * 80 / (79 * 10 * 10)), abs=1e-5)


def test_pmi_min_count_floors(spark):
    from wicsmmiretl_spark.functions.text import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "rare pair " + "common duo " * 20)], "doc_id: bigint, text: string"
    )
    out = {(r.w1, r.w2) for r in pmi_collocations(docs, min_count=10, k=50).collect()}
    assert ("rare", "pair") not in out and ("common", "duo") in out


def test_pmi_validates(spark):
    import pytest

    from wicsmmiretl_spark.functions.text import pmi_collocations

    docs = spark.createDataFrame([(1, "a b")], "doc_id: bigint, text: string")
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(docs, min_count=0)
    with pytest.raises(ValueError, match="k"):
        pmi_collocations(docs, k=0)


# ---------------------------------------------------------------------------
# feature_hash
# ---------------------------------------------------------------------------

def test_feature_hash_deterministic_and_parallel_arrays(spark):
    from wicsmmiretl_spark.functions.text import feature_hash

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha beta alpha")], "doc_id: bigint, text: string"
    )
    out = {r.doc_id: (r.indices, r.values) for r in feature_hash(docs, num_features=512).collect()}
    assert out[1] == out[2]  # same text -> identical vector
    idx, vals = out[1]
    assert idx == sorted(idx) and len(idx) == len(vals)
    # Signed counts: |alpha| contributes 2, |beta| 1 (signs may flip values).
    assert sorted(abs(v) for v in vals) == [1, 2]


def test_feature_hash_stable_under_repartition(spark):
    from wicsmmiretl_spark.functions.text import feature_hash

    docs = spark.createDataFrame(
        [(i, f"tok{i % 11} tok{i % 7} common") for i in range(200)],
        "doc_id: bigint, text: string",
    )
    a = sorted(tuple(r) for r in feature_hash(docs.coalesce(1), num_features=32).collect())
    b = sorted(tuple(r) for r in feature_hash(docs.repartition(9), num_features=32).collect())
    assert a == b


def test_feature_hash_validates(spark):
    import pytest

    from wicsmmiretl_spark.functions.text import feature_hash

    docs = spark.createDataFrame([(1, "x")], "doc_id: bigint, text: string")
    with pytest.raises(ValueError, match="num_features"):
        feature_hash(docs, num_features=1)


def test_canonicalize_url_rules(spark):
    """Each normalization rule fires: case, www, default vs explicit port,
    trailing slash, fragment, tracking-param removal, param sort; schemeless
    and hostless inputs yield NULL (surfaced, not passed through)."""
    from wicsmmiretl_spark.functions.urls import canonicalize_url, url_host

    cases = [
        ("HTTPS://WWW.Ex.COM:443/A//?b=2&utm_source=x&a=1#f", "https://ex.com/A?a=1&b=2"),
        ("http://ex.com:80/", "http://ex.com/"),
        ("http://ex.com:8080", "http://ex.com:8080/"),
        ("https://ex.com/p/?gclid=1&ref=z", "https://ex.com/p"),
        ("ex.com/no-scheme", None),
        ("http:///path-no-host", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [c for _, c in cases]
    hosts = [r.h for r in df.select(url_host("url").alias("h")).collect()]
    assert hosts == ["ex.com", "ex.com", "ex.com", "ex.com", None, None]


def test_bigram_surprisal_min_count_floor(spark):
    """min_bigram_count prunes the trained bigram table (the scale knob
    for adversarial vocabulary growth): floor=1 is byte-identical to the
    exact default, a higher floor only ever RAISES a doc's surprisal
    (pruned bigrams score as unseen — one-sided, bounded error), docs
    with only frequent bigrams are untouched, and floor<1 raises."""
    import pytest

    from wicsmmiretl_spark.functions.text import bigram_surprisal

    rows = [
        (1, "the cat the cat the cat the cat"),  # 'the cat' c2=7ish, frequent
        (2, "zeta omega kappa sigma lambda"),  # all bigrams unique (c2=1)
        (3, "the cat the cat"),  # only the frequent bigram
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def snap(**kw):
        return {
            r.doc_id: (r.n_bigrams, r.avg_surprisal)
            for r in bigram_surprisal(df, **kw).collect()
        }

    exact = snap()
    assert snap(min_bigram_count=1) == exact

    floored = snap(min_bigram_count=3)
    assert set(floored) == set(exact)
    for doc_id, (n, s) in floored.items():
        assert n == exact[doc_id][0]  # scoring coverage unchanged
        assert s >= exact[doc_id][1]  # pruning only raises surprisal
    # the unique-bigram doc is the one the floor actually touches
    assert floored[2][1] > exact[2][1]
    # the frequent-bigram-only doc is untouched (its c2 survives the floor)
    assert floored[3][1] == exact[3][1]

    with pytest.raises(ValueError, match="min_bigram_count"):
        bigram_surprisal(df, min_bigram_count=0)
