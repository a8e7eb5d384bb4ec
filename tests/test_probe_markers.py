"""fine_init_probe slice-marker contract (r14 review findings): reusing a
slice built with a different copy count or base sf_dir must be REFUSED,
not silently measured — a mismatch mislabels the exponent and every n/k
figure in the recorded evidence. The validation paths run before any
Spark work, so these tests drive them directly on synthetic dirs."""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import fine_init_probe as fip  # noqa: E402


def _slice_dir(tmp_path, copies="100", base="/root/testdata/sf0.1"):
    d = tmp_path / "slice"
    d.mkdir()
    (d / "embeddings.parquet").mkdir()
    if copies is not None:
        (d / "COPIES").write_text(f"{copies}\n")
    if base is not None:
        (d / "BASE_SF").write_text(f"{base}\n")
    return d


@pytest.fixture
def pinned(monkeypatch):
    monkeypatch.setattr(fip, "COPIES", 100)
    monkeypatch.setattr(fip, "BASE_SF", "/root/testdata/sf0.1")


def test_valid_reuse_returns_path(tmp_path, pinned):
    d = _slice_dir(tmp_path)
    assert fip._synth_slice(None, str(d)) == str(d / "embeddings.parquet")


def test_copies_mismatch_refused(tmp_path, pinned):
    d = _slice_dir(tmp_path, copies="10")
    with pytest.raises(SystemExit, match="COPIES=10"):
        fip._synth_slice(None, str(d))


def test_base_mismatch_refused(tmp_path, pinned):
    d = _slice_dir(tmp_path, base="/root/testdata/sf0.01")
    with pytest.raises(SystemExit, match="sf0.01"):
        fip._synth_slice(None, str(d))


def test_base_compare_is_realpath_normalized(tmp_path, pinned, monkeypatch):
    # Trailing slash / equivalent spelling must NOT trigger a refusal.
    monkeypatch.setattr(fip, "BASE_SF", "/root/testdata/sf0.1/")
    d = _slice_dir(tmp_path, base="/root/testdata/sf0.1")
    assert fip._synth_slice(None, str(d)).endswith("embeddings.parquet")


def test_missing_copies_marker_refused_with_rename_hint(tmp_path, pinned):
    d = _slice_dir(tmp_path, copies=None)
    with pytest.raises(SystemExit, match="pre-r14"):
        fip._synth_slice(None, str(d))


def test_missing_base_marker_warns_but_proceeds(tmp_path, pinned, capsys):
    # A scale_rehearsal-built full slice has COPIES but no BASE_SF —
    # reusable, with a loud caveat (the base cannot be validated).
    d = _slice_dir(tmp_path, base=None)
    assert fip._synth_slice(None, str(d)).endswith("embeddings.parquet")
    assert "cannot validate" in capsys.readouterr().err


def test_probe_dir_carries_embeddings_only_marker_contract():
    # scale_rehearsal refuses dirs with this marker as full-slice input;
    # the probe must keep writing it (grep the source, no Spark needed).
    src = Path(fip.__file__).read_text()
    assert "EMBEDDINGS_ONLY" in src
    rehearsal = Path(fip.__file__).with_name("scale_rehearsal.py").read_text()
    assert "EMBEDDINGS_ONLY" in rehearsal


def test_scale_copies_takes_explicit_count(spark):
    # The probe passes copies= explicitly because the two modules resolve
    # the same env var to different defaults (r14 finding).
    from scale_rehearsal import _scale_copies, embeddings_copy

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)], "vec_id long, embedding array<float>"
    )
    out = _scale_copies(df, embeddings_copy, copies=3)
    assert out.count() == 15
    assert out.select("vec_id").distinct().count() == 15
