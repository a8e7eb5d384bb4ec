"""Naive Bayes train/classify/confusion vs brute-force Python ground
truth — smoothing, unseen tokens, priors, tie-breaking, and empty-doc
edges the sf0.01 oracle gate can't probe."""

from __future__ import annotations

import math
import random

import pytest

from wicsmmiretl_spark.operators.nb import nb_classify, nb_confusion, nb_train

SCALE = 10**7


def _train_brute(rows):
    ntc, nc, nd = {}, {}, {}
    vocab = set()
    for label, text in rows:
        if label is None or text is None:
            continue
        nd[label] = nd.get(label, 0) + 1
        for t in text.split():
            ntc[(label, t)] = ntc.get((label, t), 0) + 1
            nc[label] = nc.get(label, 0) + 1
            vocab.add(t)
    n = sum(nd.values())
    v = len(vocab)
    logp = {
        (l, t): int(round(math.log((c + 1) / float(nc[l] + v)) * SCALE))
        for (l, t), c in ntc.items()
    }
    info = {
        l: (
            int(round(math.log(nd[l] / float(n)) * SCALE)),
            int(round(math.log(1.0 / (nc[l] + v)) * SCALE)),
        )
        for l in nd
    }
    return logp, info


def _classify_brute(logp, info, docs):
    out = {}
    for did, text in docs:
        toks = text.split()
        if not toks:
            continue
        best = None
        for label in sorted(info):
            prior, dflt = info[label]
            s = prior + sum(logp.get((label, t), dflt) for t in toks)
            if best is None or s > best[0]:
                best = (s, label)
        out[did] = (best[1], round(best[0] / SCALE, 4))
    return out


def test_nb_matches_brute_force(spark):
    rng = random.Random(17)
    langs = {
        "aa": "alpha beta gamma delta shared",
        "bb": "omega psi chi phi shared",
        "cc": "uno dos tres cuatro shared",
    }
    rows = []
    for i in range(120):
        lab = rng.choice(list(langs))
        words = langs[lab].split()
        rows.append((lab, " ".join(rng.choice(words) for _ in range(rng.randint(3, 12)))))
    train_df = spark.createDataFrame(rows, "lang: string, text: string")
    docs = [(i, rows[i][1]) for i in range(len(rows))]
    docs_df = spark.createDataFrame(docs, "doc_id: bigint, text: string")

    logp_b, info_b = _train_brute(rows)
    tl, li = nb_train(train_df, "lang", "text")
    got_logp = {(r["label"], r["token"]): r["logp"] for r in tl.collect()}
    got_info = {r["label"]: (r["prior"], r["dflt"]) for r in li.collect()}
    assert got_logp == logp_b
    assert got_info == info_b

    got = {
        r["doc_id"]: (r["pred"], r["score"])
        for r in nb_classify(docs_df, tl, li, "doc_id", "text").collect()
    }
    assert got == _classify_brute(logp_b, info_b, docs)


def test_nb_confusion_separable_corpus_is_diagonal(spark):
    rows = [
        (i, "aa", "alpha beta alpha gamma") for i in range(10)
    ] + [(i + 10, "bb", "omega psi omega chi") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id: bigint, lang: string, text: string")
    got = {
        (r["true_lang"], r["pred"]): r["n"]
        for r in nb_confusion(df, "lang", "text", "doc_id").collect()
    }
    assert got == {("aa", "aa"): 10, ("bb", "bb"): 10}


def test_nb_unseen_tokens_fall_back_to_prior(spark):
    # A doc of entirely unseen tokens scores prior + n*dflt per class:
    # aa = ln(2/3) + 3·ln(1/9) ≈ -6.996, bb = ln(1/3) + 3·ln(1/7) ≈ -6.937
    # — the smaller class's larger smoothing default beats the prior.
    train = spark.createDataFrame(
        [(1, "aa", "x y"), (2, "aa", "x z"), (3, "bb", "p q")],
        "doc_id: bigint, lang: string, text: string",
    )
    tl, li = nb_train(train, "lang", "text")
    docs = spark.createDataFrame(
        [(9, "never seen tokens")], "doc_id: bigint, text: string"
    )
    got = nb_classify(docs, tl, li, "doc_id", "text").collect()[0]
    assert got["pred"] == "bb"


def test_nb_empty_docs_and_validation(spark):
    train = spark.createDataFrame(
        [(1, "aa", "x y"), (2, "bb", "p q")],
        "doc_id: bigint, lang: string, text: string",
    )
    tl, li = nb_train(train, "lang", "text")
    docs = spark.createDataFrame(
        [(1, ""), (2, "x")], "doc_id: bigint, text: string"
    )
    got = nb_classify(docs, tl, li, "doc_id", "text").collect()
    assert [r["doc_id"] for r in got] == [2]  # empty doc excluded
    with pytest.raises(ValueError, match="nb_train"):
        nb_train(train, "nope", "text")
