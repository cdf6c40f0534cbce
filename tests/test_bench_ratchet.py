"""The bench regression ratchet (`bench._ratchet`).

The ratchet exists because a 550→366 fps regression shipped silently in
round 3; round 4's version compared against the newest ``BENCH_r*.json``
even when the driver's parse had failed (``"parsed": null``) — checking
nothing exactly when it mattered (VERDICT r4 weak #1).  These tests pin
the fixed semantics: skip past null records, use bench's own
``BENCH_LATEST.json``, fire on any known-good source, and label metric
redefinitions instead of diffing across them.
"""

import json

import bench


def _record(value, detect=1000.0, defs=None):
    rec = {
        "value": value,
        "stage_fps": {"detect": detect, "track": 900.0, "extract": 800.0},
        "sustained_e2e": {"predecoded": {"legs": {"compute_fps": 280.0}}},
        "cli": {"combined_fps": 50.0},
    }
    if defs is not None:
        rec["defs"] = defs
    return rec


def _driver_file(tmp_path, name, parsed):
    (tmp_path / name).write_text(json.dumps({"parsed": parsed, "tail": "x"}))


def test_skips_null_parsed_driver_files(tmp_path):
    """A parsed:null BENCH file (r4's actual state) must not silence the
    ratchet: it falls back to the newest parseable record."""
    _driver_file(tmp_path, "BENCH_r03.json", _record(650.0))
    _driver_file(tmp_path, "BENCH_r04.json", None)
    out = bench._ratchet(_record(400.0), here=str(tmp_path))
    assert out["vs"] == ["BENCH_r03.json"]
    assert any(r["metric"] == "value" and r["was"] == 650.0
               for r in out["regressions"])


def test_bench_latest_alone_is_a_source(tmp_path):
    """Even with every driver parse failed, bench's own persisted record
    keeps the ratchet armed."""
    _driver_file(tmp_path, "BENCH_r04.json", None)
    (tmp_path / "BENCH_LATEST.json").write_text(json.dumps(_record(650.0)))
    out = bench._ratchet(_record(400.0), here=str(tmp_path))
    assert out["vs"] == ["BENCH_LATEST.json"]
    assert out["regressions"]


def test_no_regression_within_tolerance(tmp_path):
    _driver_file(tmp_path, "BENCH_r03.json", _record(650.0))
    out = bench._ratchet(_record(640.0), here=str(tmp_path))
    assert out["regressions"] == []


def test_redefined_metric_is_labeled_not_diffed(tmp_path):
    """A record carrying a different definition tag for a metric yields a
    ``redefined`` entry, never a numeric regression (VERDICT r4 weak #2:
    the r3→r4 detect redefinition was silently diffed)."""
    old_defs = dict(bench.METRIC_DEFS)
    old_defs["stage_fps.detect"] = "fused detect+extract program (r3)"
    _driver_file(tmp_path, "BENCH_r03.json",
                 _record(650.0, detect=853.4, defs=old_defs))
    # detect "regresses" 853.4 -> 500 numerically, but the definitions differ
    out = bench._ratchet(_record(650.0, detect=500.0), here=str(tmp_path))
    assert not any(r["metric"] == "stage_fps.detect"
                   for r in out["regressions"])
    assert any(e["metric"] == "stage_fps.detect" for e in out["redefined"])


def test_fires_against_any_source(tmp_path):
    """BENCH_LATEST better than the newest driver record: regressing below
    BENCH_LATEST fires even if still above the driver number."""
    _driver_file(tmp_path, "BENCH_r03.json", _record(400.0))
    (tmp_path / "BENCH_LATEST.json").write_text(json.dumps(_record(700.0)))
    out = bench._ratchet(_record(500.0), here=str(tmp_path))
    assert any(r["vs"] == "BENCH_LATEST.json" for r in out["regressions"])
    assert not any(r["vs"] == "BENCH_r03.json" for r in out["regressions"])


def test_no_sources_returns_none(tmp_path):
    assert bench._ratchet(_record(500.0), here=str(tmp_path)) is None
