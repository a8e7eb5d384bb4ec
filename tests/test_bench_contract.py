"""bench.py driver contract: the metric line must survive broken queries
(r5 lost the whole round's artifact to one AnalysisException)."""

from __future__ import annotations

import json


def test_bench_survives_broken_query(spark, monkeypatch, capsys, tmp_path):
    """A query that raises must degrade the artifact (an errors entry),
    never kill it: the contract line still parses, still carries the
    healthy query's timing, and totals only the healthy queries."""
    import bench

    ok = bench.QUERIES["vocab_top100"]

    def broken(spark, sf_dir):
        raise RuntimeError("deliberately broken for the contract test")

    monkeypatch.setattr(bench, "QUERIES", {"vocab_top100": ok, "broken": broken})
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_QUIET_WAIT_MAX", "0")  # disarm the whole quiet gate
    monkeypatch.setenv("SPARK_GRAFT_FULL_OUT", str(tmp_path))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    doc = json.loads(line)
    assert doc["metric"] == "suite_total_seconds"
    assert "vocab_top100" in doc["queries"]
    assert "broken" in doc["errors"]
    assert "RuntimeError" in doc["errors"]["broken"]
    assert doc["value"] >= doc["queries"]["vocab_top100"]
    # The full-timings sidecar carries EVERY timing and error, unclipped.
    full_files = list(tmp_path.glob("BENCH_FULL_r*.json"))
    assert len(full_files) == 1
    full = json.loads(full_files[0].read_text())
    assert full["queries"] == doc["queries"] or set(full["queries"]) >= set(
        doc["queries"]
    )
    assert "broken" in full["errors"]
    assert full["n_queries"] == len(full["queries"])


def test_bench_mass_failure_keeps_line_parseable(spark, monkeypatch, capsys, tmp_path):
    """Every query broken (testdata drift scenario): the errors dict must be
    capped inside the contract line, with the overflow counted, so the line
    still fits the driver's 2000-char stdout tail window."""
    import bench

    ok = bench.QUERIES["vocab_top100"]

    def make_broken(i):
        def broken(spark, sf_dir):
            raise RuntimeError(
                f"deliberately broken query number {i} with a long message "
                "mimicking an AnalysisException traceback summary line"
            )

        return broken

    patched = {"vocab_top100": ok}
    patched.update({f"broken_{i:02d}": make_broken(i) for i in range(40)})
    monkeypatch.setattr(bench, "QUERIES", patched)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_QUIET_WAIT_MAX", "0")  # disarm the whole quiet gate
    monkeypatch.setenv("SPARK_GRAFT_FULL_OUT", str(tmp_path))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) < 2000
    doc = json.loads(line)
    assert doc["metric"] == "suite_total_seconds"
    assert "vocab_top100" in doc["queries"]
    shown = len(doc["errors"])
    assert shown + doc.get("errors_omitted", 0) == 40


def test_bench_flaky_second_run_keeps_first_timing(spark, monkeypatch, capsys, tmp_path):
    """A query that succeeds on run 1 and throws on run 2 (transient host
    fault) must still report run 1's timing alongside the error record."""
    import bench

    ok = bench.QUERIES["vocab_top100"]
    calls = {"n": 0}

    def flaky(spark, sf_dir):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("transient fault on second run")
        return ok(spark, sf_dir)

    monkeypatch.setattr(bench, "QUERIES", {"vocab_top100": ok, "flaky": flaky})
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_QUIET_WAIT_MAX", "0")  # disarm the whole quiet gate
    monkeypatch.setenv("SPARK_GRAFT_FULL_OUT", str(tmp_path))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    doc = json.loads(line)
    assert "flaky" in doc["queries"]
    assert doc["queries"]["flaky"] > 0
    assert "RuntimeError" in doc["errors"]["flaky"]


def test_bench_sidecar_numbering_never_clobbers(tmp_path):
    """The full-timings sidecar must never overwrite an existing file —
    a committed canonical is round evidence; reruns of the same round get
    a .k suffix instead."""
    import bench

    assert bench._next_full_bench_path(tmp_path).name == "BENCH_FULL_r1.json"
    (tmp_path / "BENCH_r03.json").write_text("{}")
    p = bench._next_full_bench_path(tmp_path)
    assert p.name == "BENCH_FULL_r4.json"
    p.write_text("{}")
    assert bench._next_full_bench_path(tmp_path).name == "BENCH_FULL_r4.1.json"
    (tmp_path / "BENCH_FULL_r4.1.json").write_text("{}")
    assert bench._next_full_bench_path(tmp_path).name == "BENCH_FULL_r4.2.json"


def test_bench_sidecar_noncanonical_run_never_claims_base_name(tmp_path, monkeypatch):
    """VERDICT r14 item 5: the r14 driver's 8-core scaling re-bench wrote
    its sidecar as BENCH_FULL_r15.json, shadowing the NEXT round's
    canonical name. A run at reduced core width (SPARK_GRAFT_CPUS below
    the host's full width) is a side take and must start at .1, leaving
    the unsuffixed name for the round's real full-width take."""
    import os

    import bench

    (tmp_path / "BENCH_r14.json").write_text("{}")
    # Explicit canonical flag: a side take skips the base name even when
    # the base name is still free.
    assert (
        bench._next_full_bench_path(tmp_path, canonical=False).name
        == "BENCH_FULL_r15.1.json"
    )
    assert (
        bench._next_full_bench_path(tmp_path, canonical=True).name
        == "BENCH_FULL_r15.json"
    )
    # Env derivation: CPUS != host width -> side take; CPUS == host width
    # (or unset) -> canonical.
    host = os.cpu_count()
    monkeypatch.setenv("SPARK_GRAFT_CPUS", str(max(1, (host or 2) - 1)))
    assert bench._next_full_bench_path(tmp_path).name == "BENCH_FULL_r15.1.json"
    monkeypatch.setenv("SPARK_GRAFT_CPUS", str(host))
    assert bench._next_full_bench_path(tmp_path).name == "BENCH_FULL_r15.json"
    monkeypatch.delenv("SPARK_GRAFT_CPUS")
    assert bench._next_full_bench_path(tmp_path).name == "BENCH_FULL_r15.json"
    # The .k chain continues past an existing side take.
    (tmp_path / "BENCH_FULL_r15.1.json").write_text("{}")
    assert (
        bench._next_full_bench_path(tmp_path, canonical=False).name
        == "BENCH_FULL_r15.2.json"
    )


def test_bench_sidecar_round_from_round_root(tmp_path):
    """SPARK_GRAFT_FULL_OUT redirects the DESTINATION only: the round
    number still comes from the repo root's driver artifacts, so an
    override pointed at an empty archive dir doesn't restart numbering at
    r1 (ADVICE r10). The .k anti-clobber suffix is evaluated against the
    destination dir."""
    import bench

    repo = tmp_path / "repo"
    dest = tmp_path / "archive"
    repo.mkdir()
    dest.mkdir()
    (repo / "BENCH_r07.json").write_text("{}")
    p = bench._next_full_bench_path(dest, round_root=repo)
    assert p.parent == dest and p.name == "BENCH_FULL_r8.json"
    p.write_text("{}")
    assert bench._next_full_bench_path(dest, round_root=repo).name == "BENCH_FULL_r8.1.json"


def test_bench_prior_prefers_full_then_rerun_then_driver(tmp_path):
    """ratio_vs_prev's prior: newest round wins; within a round a FULL
    sidecar beats the clipped driver tail, and a .k rerun beats the base
    sidecar; priors at a different sf are skipped (never compare scales)."""
    import json as _json

    import bench

    (tmp_path / "BENCH_r04.json").write_text(
        _json.dumps({"parsed": {"queries": {"q": 9.0}, "sf": 0.1}})
    )
    assert bench._latest_prior_bench(0.1, tmp_path) == {"q": 9.0}
    (tmp_path / "BENCH_FULL_r4.json").write_text(
        _json.dumps({"queries": {"q": 2.0}, "sf": 0.1})
    )
    assert bench._latest_prior_bench(0.1, tmp_path) == {"q": 2.0}
    (tmp_path / "BENCH_FULL_r4.1.json").write_text(
        _json.dumps({"queries": {"q": 3.0}, "sf": 0.1})
    )
    assert bench._latest_prior_bench(0.1, tmp_path) == {"q": 3.0}
    assert bench._latest_prior_bench(0.01, tmp_path) is None


def test_quiet_wait_returns_when_load_drops():
    """_quiet_wait polls until load1 drops below the threshold: injected
    fakes step the load 5.0 -> 3.0 -> 0.4, the wait ends on the third
    reading, not exhausted (VERDICT r12 item 3)."""
    import bench

    loads = iter([5.0, 5.0, 3.0, 3.0, 0.4])
    t = {"now": 0.0}

    def fake_sleep(s):
        t["now"] += s

    waited, exhausted = bench._quiet_wait(
        1.0, 600.0, poll_s=10.0, load1=lambda: next(loads), sleep=fake_sleep, clock=lambda: t["now"]
    )
    assert not exhausted
    assert waited == 20.0


def test_quiet_wait_exhausts_on_persistent_load():
    """A host that never quiets: the wait stops at the deadline and reports
    exhausted=True — bench proceeds, it never hangs."""
    import bench

    t = {"now": 0.0}

    def fake_sleep(s):
        t["now"] += s

    waited, exhausted = bench._quiet_wait(
        1.0, 60.0, poll_s=10.0, load1=lambda: 7.0, sleep=fake_sleep, clock=lambda: t["now"]
    )
    assert exhausted
    assert waited == 60.0


def test_bench_stamps_quiet_wait_exhausted(spark, monkeypatch, capsys, tmp_path):
    """When the bounded quiet-wait runs out on a loaded host, the contract
    line and the sidecar BOTH carry the explicit hot-take label — the
    self-labelling artifact the r11/r12 adjudications existed to avoid."""
    import json as _json

    import bench

    ok = bench.QUERIES["vocab_top100"]
    monkeypatch.setattr(bench, "QUERIES", {"vocab_top100": ok})
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    monkeypatch.setenv("SPARK_GRAFT_FULL_OUT", str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_QUIET_LOAD1", "1.0")
    monkeypatch.setenv("SPARK_GRAFT_QUIET_WAIT_MAX", "0.2")
    monkeypatch.setattr(bench.os, "getloadavg", lambda: (9.9, 9.9, 9.9))
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    doc = _json.loads(line)
    assert doc["quiet_wait_exhausted"] is True
    assert doc["load1_start"] == 9.9
    full = _json.loads(next(tmp_path.glob("BENCH_FULL_r*.json")).read_text())
    assert full["quiet_wait_exhausted"] is True
    assert full["quiet_wait_s"] >= 0.2


def test_quiet_wait_holds_for_load5_drain():
    """The load5 condition (r13): load1 crossing the knee while load5 is
    still draining is NOT quiet (measured: a gate-passed run came back
    1.24x inflated). The wait holds until BOTH drop."""
    import bench

    l5 = iter([9.0, 9.0, 6.0, 6.0, 3.0])
    t = {"now": 0.0}

    def fake_sleep(s):
        t["now"] += s

    waited, exhausted = bench._quiet_wait(
        1.0,
        600.0,
        poll_s=10.0,
        load1=lambda: 0.5,
        sleep=fake_sleep,
        clock=lambda: t["now"],
        load5_threshold=4.0,
        load5=lambda: next(l5),
    )
    assert not exhausted
    assert waited == 20.0


def test_quiet_wait_load5_only_gating():
    """SPARK_GRAFT_QUIET_LOAD1<=0 with load5 armed must still gate (the
    README's 'disables each' contract): a disabled load1 is a vacuous
    +inf condition, not a bypass of the whole gate."""
    import bench

    l5 = iter([6.0, 6.0, 2.0])
    t = {"now": 0.0}

    def fake_sleep(s):
        t["now"] += s

    waited, exhausted = bench._quiet_wait(
        float("inf"),
        600.0,
        poll_s=10.0,
        load1=lambda: 99.0,  # never consulted against inf
        sleep=fake_sleep,
        clock=lambda: t["now"],
        load5_threshold=4.0,
        load5=lambda: next(l5),
    )
    assert not exhausted and waited == 10.0
