"""Unit tests for bench.py's regression-proof last-good record keeping.

VERDICT r4 weak #3: the resilience driver treated any rc=0 run as "good",
so a 175.9 s regressed run overwrote the 31.4 s record. record_last_good
must refuse large regressions unless explicitly forced.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import record_last_good  # noqa: E402


def _res(value, metric="ppsurf50nn_e2e_reconstruction_res257"):
    return {"metric": metric, "value": value, "unit": "s/object",
            "vs_baseline": round(60.0 / value, 3)}


def _read(path):
    with open(path) as f:
        return json.load(f)["result"]["value"]


def test_first_result_records(tmp_path):
    p = str(tmp_path / "lg.json")
    assert record_last_good(_res(31.4), path=p, force=False)
    assert _read(p) == 31.4


def test_improvement_records(tmp_path):
    p = str(tmp_path / "lg.json")
    record_last_good(_res(31.4), path=p, force=False)
    assert record_last_good(_res(20.0), path=p, force=False)
    assert _read(p) == 20.0


def test_small_regression_records_with_warning(tmp_path, capsys):
    p = str(tmp_path / "lg.json")
    record_last_good(_res(31.4), path=p, force=False)
    assert record_last_good(_res(40.0), path=p, force=False)
    assert _read(p) == 40.0
    assert "REGRESSION vs last-good" in capsys.readouterr().err


def test_large_regression_refused(tmp_path, capsys):
    """The exact r4 failure: 175.9 s must not clobber a 31.4 s record."""
    p = str(tmp_path / "lg.json")
    record_last_good(_res(31.4), path=p, force=False)
    assert not record_last_good(_res(175.871), path=p, force=False)
    assert _read(p) == 31.4
    err = capsys.readouterr().err
    assert "REGRESSION vs last-good" in err
    assert "not recording" in err


def test_large_regression_forced(tmp_path):
    p = str(tmp_path / "lg.json")
    record_last_good(_res(31.4), path=p, force=False)
    assert record_last_good(_res(175.871), path=p, force=True)
    assert _read(p) == 175.871


def test_metric_change_records(tmp_path):
    """A different metric (e.g. BENCH_RESOLUTION override) never compares."""
    p = str(tmp_path / "lg.json")
    record_last_good(_res(31.4), path=p, force=False)
    assert record_last_good(
        _res(500.0, metric="ppsurf50nn_e2e_reconstruction_res513"),
        path=p, force=False)
    assert _read(p) == 500.0


def test_corrupt_record_overwritten(tmp_path):
    p = str(tmp_path / "lg.json")
    with open(p, "w") as f:
        f.write("{not json")
    assert record_last_good(_res(31.4), path=p, force=False)
    assert _read(p) == 31.4
