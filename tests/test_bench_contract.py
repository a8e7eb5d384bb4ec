"""bench.py driver contract: the metric line must survive broken queries
(r5 lost the whole round's artifact to one AnalysisException)."""

from __future__ import annotations

import json


def test_bench_survives_broken_query(spark, monkeypatch, capsys):
    """A query that raises must degrade the artifact (an errors entry),
    never kill it: the contract line still parses, still carries the
    healthy query's timing, and totals only the healthy queries."""
    import bench

    ok = bench.QUERIES["vocab_top100"]

    def broken(spark, sf_dir):
        raise RuntimeError("deliberately broken for the contract test")

    monkeypatch.setattr(bench, "QUERIES", {"vocab_top100": ok, "broken": broken})
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    doc = json.loads(line)
    assert doc["metric"] == "suite_total_seconds"
    assert "vocab_top100" in doc["queries"]
    assert "broken" in doc["errors"]
    assert "RuntimeError" in doc["errors"]["broken"]
    assert doc["value"] >= doc["queries"]["vocab_top100"]
