"""Training-data pipeline operators: PII scrubbing, repetition signals,
benchmark decontamination (unit-level; the suite queries oracle them at
corpus scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wicsmmiretl_spark.functions.repetition import repetition_stats
from wicsmmiretl_spark.functions.scrub import scrub_pii
from wicsmmiretl_spark.operators.decontaminate import ngram_contamination


def test_scrub_pii_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 415-555-0199 or +1 415 555 0123"),
            (3, "server at 192.168.1.200 went down"),
            (4, "nothing sensitive here at all"),
            (5, "a@b.io and 10.0.0.1 and 202-555-0042 together"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in scrub_pii(df, "text").collect()}
    assert rows[1].scrubbed == "mail <EMAIL> now"
    assert rows[1].n_email == 1 and rows[1].n_phone == 0 and rows[1].n_ipv4 == 0
    assert rows[2].scrubbed == "call <PHONE> or +1 <PHONE>"
    assert rows[2].n_phone == 2
    assert rows[3].scrubbed == "server at <IP> went down"
    assert rows[4].scrubbed == rows[4].text  # negatives untouched
    assert rows[4].n_email == rows[4].n_phone == rows[4].n_ipv4 == 0
    assert rows[5].scrubbed == "<EMAIL> and <IP> and <PHONE> together"


def test_scrub_pii_null_text_stays_null(spark):
    df = spark.createDataFrame([(1, None)], "id long, text string")
    r = scrub_pii(df, "text").first()
    assert r.scrubbed is None and r.n_email is None


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # bigrams: [a b]x3 [b a]x2 — all duplicated
            (2, "w x y z"),           # all unique
            (3, "solo"),              # < 2 tokens: no bigrams
            (4, ""),                  # empty
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}

    r1 = rows[1]
    assert r1.n_tokens == 6 and r1.dup_word_frac == round(4 / 6, 6)
    assert r1.n_bigrams == 5
    assert r1.top_bigram == "a b" and r1.top_bigram_frac == 0.6
    assert r1.dup_bigram_frac == 1.0

    r2 = rows[2]
    assert r2.dup_word_frac == 0.0 and r2.dup_bigram_frac == 0.0
    assert r2.top_bigram_frac == 0.333333  # 3 unique bigrams, tie → smallest wins
    assert r2.top_bigram == "w x"

    assert rows[3].n_bigrams == 0 and rows[3].top_bigram is None
    assert rows[3].top_bigram_frac == 0.0
    assert rows[4].n_tokens == 0 and rows[4].dup_word_frac == 0.0


def test_ngram_contamination_finds_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "xx alpha beta gamma delta yy"),   # shares 1 distinct 4-gram
            (2, "alpha beta gamma delta epsilon"), # shares 2
            (3, "no overlap in this one at all"),
        ],
        "doc_id long, text string",
    )
    out = {r.train_id: r for r in ngram_contamination(train, bench, n=4).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_shared_grams == 1 and out[1].n_bench_docs == 1
    assert out[2].n_shared_grams == 2 and out[2].n_bench_docs == 1


def test_ngram_contamination_shuffle_path_matches_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} common common common common tail{i}") for i in range(30)],
        "doc_id long, text string",
    )
    train = docs.filter(F.col("doc_id") % 5 != 0)
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    a = sorted(map(tuple, ngram_contamination(train, bench, n=4, broadcast_bench=True).collect()))
    b = sorted(map(tuple, ngram_contamination(train, bench, n=4, broadcast_bench=False).collect()))
    assert a == b and len(a) > 0


def test_chunk_documents_partitions_and_overlaps(spark):
    from wicsmmiretl_spark.operators.packing import chunk_documents

    toks = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks), (2, "a b"), (3, ""), (4, None)], "doc_id long, text string")
    # stride == chunk: chunks partition the token list exactly
    parts = sorted(
        (r.chunk_idx, r.chunk_text) for r in chunk_documents(df, chunk=4, stride=4).filter("doc_id = 1").collect()
    )
    assert [p[1] for p in parts] == ["t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9"]
    # overlapping: window i starts at i*stride, trailing short window kept
    ov = sorted(
        (r.chunk_idx, r.chunk_text, r.chunk_n_tok)
        for r in chunk_documents(df, chunk=4, stride=2).filter("doc_id = 1").collect()
    )
    assert ov[0][1] == "t0 t1 t2 t3" and ov[1][1] == "t2 t3 t4 t5"
    assert ov[-1][1] == "t8 t9" and ov[-1][2] == 2
    # empty/null docs emit no chunks
    assert chunk_documents(df, chunk=4, stride=4).filter("doc_id >= 3").count() == 0


def test_pack_sequences_invariants(spark, sf_dir):
    from wicsmmiretl_spark.catalog import load_table
    from wicsmmiretl_spark.operators.packing import pack_sequences

    docs = load_table(spark, "documents", sf_dir)
    out = pack_sequences(docs, budget=100, num_buckets=8)
    rows = out.collect()
    assert len(rows) == docs.count()
    assert all(0 <= r.seq_offset < 100 for r in rows)
    assert all(0 <= r.bucket < 8 for r in rows)
    # within a bucket, ids in order fill sequences monotonically and every
    # token is accounted for: first_tok of doc i == cumsum of previous docs
    by_bucket = {}
    for r in sorted(rows, key=lambda r: (r.bucket, r.doc_id)):
        prev = by_bucket.get(r.bucket, 0)
        assert r.seq_idx * 100 + r.seq_offset == prev
        by_bucket[r.bucket] = prev + r.n_tok
    # repartitioning does not change assignments
    again = sorted(map(tuple, pack_sequences(docs.repartition(13), budget=100, num_buckets=8).collect()))
    assert again == sorted(map(tuple, rows))


def test_cap_per_group_partitioning_invariant(spark):
    """cap_per_group keeps exactly min(cap, group size) rows per group,
    picks them by the declared order, and returns the SAME rows no matter
    how the input is partitioned (the two-stage prune must be a pure
    optimization)."""
    from pyspark.sql import functions as F

    from wicsmmiretl_spark.operators.sampling import cap_per_group

    rows = [(i, f"g{i % 3}", (i * 37) % 100) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    order = [F.desc("score"), F.asc("id")]

    got1 = sorted(tuple(r) for r in cap_per_group(df, "grp", 7, order).collect())
    got2 = sorted(
        tuple(r)
        for r in cap_per_group(df.repartition(13, "id"), "grp", 7, order).collect()
    )
    assert got1 == got2
    # Local ground truth.
    expect = []
    for g in ("g0", "g1", "g2"):
        members = sorted(
            (r for r in rows if r[1] == g), key=lambda r: (-r[2], r[0])
        )[:7]
        expect.extend(members)
    assert got1 == sorted(expect)
    # Cap above group size keeps everything.
    assert cap_per_group(df, "grp", 1000, order).count() == 90


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    """Priority sample: partitioning-invariant, excludes non-positive
    weights, matches a local replay of the identical algorithm, and a
    heavily-upweighted row is always selected."""
    import hashlib

    from wicsmmiretl_spark.operators.sampling import weighted_sample

    rows = [(i, 10 if i != 42 else 10_000_000) for i in range(300)]
    rows += [(900, 0), (901, -5)]
    df = spark.createDataFrame(rows, "id long, w long")

    got = [(r.id, r.priority) for r in weighted_sample(df, "w", 20, "id", seed=7).collect()]
    got_re = [
        (r.id, r.priority)
        for r in weighted_sample(df.repartition(11), "w", 20, "id", seed=7).collect()
    ]
    assert sorted(got) == sorted(got_re)
    ids = {i for i, _ in got}
    assert 42 in ids and 900 not in ids and 901 not in ids

    def pri(i, w):
        h = int(hashlib.md5(f"7:{i}".encode()).hexdigest()[:8], 16)
        return float(w) * 4294967296.0 / float(h + 1)

    local = sorted(((pri(i, w), -i) for i, w in rows if w > 0), reverse=True)[:20]
    assert sorted(ids) == sorted(-ni for _p, ni in local)


def test_kfold_assign_balanced_and_stable(spark):
    """Balanced mode: per-stratum fold sizes differ by at most 1, folds are
    partitioning-invariant, and match a local replay of the md5 rank chain.
    Stateless mode: shuffle-free assignment matches hash % k."""
    import hashlib

    from wicsmmiretl_spark.operators.sampling import kfold_assign

    rows = [(i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, stratum string")

    got = {
        (r.id, r.fold)
        for r in kfold_assign(df, 4, ["id"], stratum_col="stratum", seed=9).collect()
    }
    got_re = {
        (r.id, r.fold)
        for r in kfold_assign(
            df.repartition(13, "id"), 4, ["id"], stratum_col="stratum", seed=9
        ).collect()
    }
    assert got == got_re
    # Per-stratum balance: max-min fold size <= 1.
    from collections import Counter

    per = {}
    for (i, fold) in got:
        per.setdefault(i % 3, Counter())[fold] += 1
    for c in per.values():
        assert set(c) == {0, 1, 2, 3}
        assert max(c.values()) - min(c.values()) <= 1
    # Local replay of the rank chain.
    expect = set()
    for s in range(3):
        members = sorted(
            (i for i, _ in rows if i % 3 == s),
            key=lambda i: (hashlib.md5(f"{i}:9".encode()).hexdigest()[:8], i),
        )
        expect |= {(i, rank % 4) for rank, i in enumerate(members)}
    assert got == expect

    # Stateless mode: pure projection, matches hash % k.
    flat = {(r.id, r.fold) for r in kfold_assign(df, 4, ["id"], balanced=False, seed=9).collect()}
    expect_flat = {
        (i, int(hashlib.md5(f"{i}:9".encode()).hexdigest()[:8], 16) % 4) for i, _ in rows
    }
    assert flat == expect_flat


def test_token_budget_sample_exact_and_monotone(spark):
    """Per-source budgets hold exactly (kept size <= budget), under-budget
    sources keep everything, zero budget drops a source, assignment is
    partitioning-invariant, and raising a budget only ADDS rows."""
    import pytest

    from wicsmmiretl_spark.operators.sampling import token_budget_sample

    rows = [(i, f"s{i % 3}", 10 + (i * 7) % 50) for i in range(90)]
    df = spark.createDataFrame(rows, "id long, src string, sz long")

    kept = token_budget_sample(
        df, "src", "sz", {"s0": 100, "s1": 10**9}, ["id"], seed=3, default_budget=200
    )
    got = {r.id for r in kept.collect()}
    got_re = {
        r.id
        for r in token_budget_sample(
            df.repartition(11), "src", "sz", {"s0": 100, "s1": 10**9}, ["id"], seed=3,
            default_budget=200,
        ).collect()
    }
    assert got == got_re
    sums = {}
    for i, s, z in rows:
        if i in got:
            sums[s] = sums.get(s, 0) + z
    assert sums["s0"] <= 100 and sums["s2"] <= 200
    assert sums["s1"] == sum(z for i, s, z in rows if s == "s1")  # under budget

    # Zero budget drops the source entirely.
    none_kept = token_budget_sample(df, "src", "sz", {"s0": 0}, ["id"], seed=3)
    assert none_kept.filter("src = 's0'").count() == 0

    # Monotone: a bigger budget is a superset.
    bigger = {
        r.id
        for r in token_budget_sample(
            df, "src", "sz", {"s0": 300, "s1": 10**9}, ["id"], seed=3, default_budget=400
        ).collect()
    }
    assert got <= bigger

    with pytest.raises(ValueError):
        token_budget_sample(df, "src", "sz", {"s0": -1}, ["id"])


def test_sampling_scratch_name_guards(spark):
    """kfold_assign and token_budget_sample reject inputs that already carry
    their internal scratch columns (_pfx/_rn, _pfx/_sz/_sz_cum) instead of
    silently overwriting and dropping user data — the 'input columns
    unchanged' contract enforced, matching salted_join's _salt guard."""
    import pytest

    from wicsmmiretl_spark.operators.sampling import kfold_assign, token_budget_sample

    df = spark.createDataFrame([(1, "a", 5)], "id long, src string, sz long")
    with pytest.raises(ValueError, match="_pfx"):
        kfold_assign(df.withColumnRenamed("src", "_pfx"), 2, ["id"])
    with pytest.raises(ValueError, match="_rn"):
        kfold_assign(df.withColumnRenamed("src", "_rn"), 2, ["id"])
    # The stateless path is a pure projection touching no scratch names —
    # the guard must NOT fire there (it previously worked; keep it so).
    out = kfold_assign(df.withColumnRenamed("src", "_rn"), 2, ["id"], balanced=False)
    assert out.columns == ["id", "_rn", "sz", "fold"]
    with pytest.raises(ValueError, match="_sz_cum"):
        token_budget_sample(
            df.withColumnRenamed("src", "_sz_cum"), "id", "sz", {}, ["id"]
        )
    with pytest.raises(ValueError, match="_sz"):
        token_budget_sample(df.withColumnRenamed("src", "_sz"), "id", "sz", {}, ["id"])


class TestNegativeSamples:
    def _tables(self, spark):
        # 3 users; user 1 bought items 1-8 of 10 (heavily provisioned),
        # user 2 bought item 1 only, user 3 bought nothing (absent).
        pos = [(1, i) for i in range(1, 9)] + [(2, 1)]
        positives = spark.createDataFrame(pos, "user long, item long")
        items = spark.createDataFrame([(i,) for i in range(1, 11)], "item long")
        return positives, items

    def test_negatives_never_collide_with_positives(self, spark):
        from wicsmmiretl_spark.operators.sampling import negative_samples

        positives, items = self._tables(spark)
        out = negative_samples(
            positives, items, "user", "item", n_candidates=8, n_keep=3
        ).collect()
        pos = {(1, i) for i in range(1, 9)} | {(2, 1)}
        for r in out:
            assert (r.user, r.item) not in pos
            assert 1 <= r.item <= 10
        by_user = {}
        for r in out:
            by_user.setdefault(r.user, []).append(r.item)
        # Only users WITH positives are sampled; per-user cap respected;
        # no duplicate negatives within a user.
        assert set(by_user) <= {1, 2}
        for u, its in by_user.items():
            assert len(its) <= 3
            assert len(set(its)) == len(its)

    def test_draw_is_deterministic_and_seed_sensitive(self, spark):
        from wicsmmiretl_spark.operators.sampling import negative_samples

        positives, items = self._tables(spark)

        def run(seed):
            return sorted(
                (r.user, r.slot, r.item)
                for r in negative_samples(
                    positives, items, "user", "item",
                    n_candidates=8, n_keep=3, seed=seed,
                ).collect()
            )

        a, b = run(42), run(42)
        assert a == b
        assert run(43) != a  # a different seed must move the draw

    def test_validates_keep_bounds(self, spark):
        from wicsmmiretl_spark.operators.sampling import negative_samples

        positives, items = self._tables(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError, match="n_keep"):
            negative_samples(positives, items, "user", "item",
                             n_candidates=2, n_keep=3)


class TestTemperatureMix:
    def _docs(self, spark):
        # 90% source 'big', 10% source 'small', unit sizes.
        rows = [(i, "big", 1) for i in range(90)] + [(100 + i, "small", 1) for i in range(10)]
        return spark.createDataFrame(rows, "doc_id long, src string, sz int")

    def test_t2_flattens_toward_rare_sources(self, spark):
        from wicsmmiretl_spark.operators.sampling import temperature_mix

        docs = self._docs(spark)
        out = temperature_mix(
            docs, "src", budget=40.0, size_col="sz", key_cols=["doc_id"],
            temperature=2.0,
        )
        got = {r.src: 0 for r in out.collect()}
        for r in out.collect():
            got[r.src] = got.get(r.src, 0) + 1
        # Proportional (T=1) would give small ~4 of 40; sqrt weights give
        # small a 25% share (sqrt(.1)/(sqrt(.9)+sqrt(.1))) → expected ~10,
        # i.e. its entire supply at fraction 1.0.
        assert got.get("small", 0) == 10
        assert 0 < got.get("big", 0) < 90

    def test_deterministic_and_temperature_one_is_proportional(self, spark):
        from wicsmmiretl_spark.operators.sampling import temperature_mix

        docs = self._docs(spark)

        def counts(t):
            out = temperature_mix(
                docs, "src", budget=40.0, size_col="sz", key_cols=["doc_id"],
                temperature=t,
            ).collect()
            d = {}
            for r in out:
                d[r.src] = d.get(r.src, 0) + 1
            return d

        assert counts(2.0) == counts(2.0)
        c1 = counts(1.0)
        # T=1: expected small ≈ 40 * 0.1 = 4 — clearly below the T=2 reading.
        assert c1.get("small", 0) < 10

    def test_degenerate_sources_are_dropped_not_crashed(self, spark):
        from wicsmmiretl_spark.operators.sampling import temperature_mix

        rows = (
            [(i, "big", 1) for i in range(90)]
            + [(200, "nullsz", None), (201, "nullsz", None)]  # NULL total
            + [(300, "zerosz", 0)]  # zero total
        )
        docs = spark.createDataFrame(rows, "doc_id long, src string, sz int")
        out = temperature_mix(
            docs, "src", budget=40.0, size_col="sz", key_cols=["doc_id"],
            temperature=2.0,
        ).collect()
        # The massless sources carry weight 0 and vanish; the live source
        # still samples (previously: TypeError on int(None) /
        # ZeroDivisionError on a zero total).
        assert {r.src for r in out} == {"big"}
        assert 0 < len(out) <= 90

    def test_validates(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.sampling import temperature_mix

        docs = self._docs(spark)
        with _pytest.raises(ValueError, match="temperature"):
            temperature_mix(docs, "src", 10.0, "sz", ["doc_id"], temperature=0)


class TestReferentialSample:
    def test_subset_is_closed_under_the_fk(self, spark, sf_dir):
        from wicsmmiretl_spark.catalog import load_table
        from wicsmmiretl_spark.operators.sampling import referential_sample

        orders = load_table(spark, "orders", sf_dir)
        li = load_table(spark, "lineitem", sf_dir)
        kp, kc = referential_sample(orders, li, "o_orderkey", "l_orderkey", 0.2)
        n_parent = kp.count()
        assert 0 < n_parent < orders.count()
        # Zero orphans: every kept lineitem's parent survived.
        orphans = kc.join(
            kp.selectExpr("o_orderkey as l_orderkey"), "l_orderkey", "anti"
        ).count()
        assert orphans == 0
        # And the cut is genuinely the child-side closure, not a child
        # sample: every kept parent's lineitems are ALL kept.
        full_of_kept = li.join(
            kp.selectExpr("o_orderkey as l_orderkey"), "l_orderkey", "semi"
        ).count()
        assert kc.count() == full_of_kept > 0

    def test_deterministic_and_seed_sensitive(self, spark, sf_dir):
        from wicsmmiretl_spark.catalog import load_table
        from wicsmmiretl_spark.operators.sampling import referential_sample

        orders = load_table(spark, "orders", sf_dir)
        li = load_table(spark, "lineitem", sf_dir)

        def keys(seed):
            kp, _ = referential_sample(orders, li, "o_orderkey", "l_orderkey", 0.2, seed=seed)
            return {r.o_orderkey for r in kp.select("o_orderkey").collect()}

        assert keys(1) == keys(1)
        assert keys(1) != keys(2)

    def test_validates_fraction(self, spark, sf_dir):
        import pytest as _pytest

        from wicsmmiretl_spark.catalog import load_table
        from wicsmmiretl_spark.operators.sampling import referential_sample

        orders = load_table(spark, "orders", sf_dir)
        li = load_table(spark, "lineitem", sf_dir)
        with _pytest.raises(ValueError, match="fraction"):
            referential_sample(orders, li, "o_orderkey", "l_orderkey", 0.0)


class TestNbUncertaintyQueue:
    def test_ambiguous_doc_ranks_most_uncertain(self, spark):
        from wicsmmiretl_spark.operators.nb import nb_train, nb_uncertainty_queue

        rows = [
            (1, "en", "the cat sat"), (2, "en", "the dog ran"),
            (3, "fr", "le chat noir"), (4, "fr", "le chien brun"),
            # doc 5 mixes both vocabularies evenly — maximum ambiguity.
            (5, "en", "the cat le chat"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        logps, info = nb_train(docs, "lang", "text")
        q = nb_uncertainty_queue(docs, logps, info, "doc_id", "text", k=5).collect()
        margins = {r.doc_id: r.margin for r in q}
        # Queue is most-uncertain-first, and the mixed-vocabulary doc is
        # more uncertain than either pure-English doc.
        assert [r.margin for r in q] == sorted(r.margin for r in q)
        assert margins[5] < margins[1] and margins[5] < margins[2]
        assert {r.pred for r in q} <= {"en", "fr"}
        assert all(r.pred != r.runner_up for r in q)

    def test_k_bounds_and_validation(self, spark):
        import pytest as _pytest

        from wicsmmiretl_spark.operators.nb import nb_train, nb_uncertainty_queue

        docs = spark.createDataFrame(
            [(1, "en", "a b"), (2, "fr", "c d")], "doc_id long, lang string, text string"
        )
        logps, info = nb_train(docs, "lang", "text")
        assert len(nb_uncertainty_queue(docs, logps, info, "doc_id", "text", k=1).collect()) == 1
        with _pytest.raises(ValueError, match="k must"):
            nb_uncertainty_queue(docs, logps, info, "doc_id", "text", k=0)
