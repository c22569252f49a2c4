"""Asset-day metric gates (scripts/asset_gates.py, called by
scripts/asset_day.sh): log.txt parsing, the BASELINE tolerance gate, and
the int8 drift gate — so the one-command asset-day chain's pass/fail
logic is locked before the day it actually matters."""

import importlib.util
import json
import pathlib
import subprocess
import sys

SCRIPTS = pathlib.Path(__file__).parent.parent / "scripts"

spec = importlib.util.spec_from_file_location(
    "asset_gates", SCRIPTS / "asset_gates.py")
gates = importlib.util.module_from_spec(spec)
spec.loader.exec_module(gates)


def _write_eval(tmp_path, tag, r1_05, r1_07, miou_frac, invalid=0.001):
    d = tmp_path / tag / "20260820000"
    d.mkdir(parents=True)
    row = {
        "test_agg_metrics": 52.1,
        "test_r1": {"0.5": r1_05, "0.55": 65.0, "0.7": r1_07},
        "test_mIoU": miou_frac,
        "test_invalid_predictions": invalid,
        "test_total": 3720,
    }
    (d / "log.txt").write_text(json.dumps(row) + "\n")
    return str(tmp_path / tag)


class TestReadMetrics:
    def test_parses_and_normalizes(self, tmp_path):
        d = _write_eval(tmp_path, "e", 69.4, 49.5, 0.587)
        got = gates.read_metrics(d)
        assert got["R1@0.5"] == 69.4 and got["R1@0.7"] == 49.5
        assert abs(got["mIoU"] - 58.7) < 1e-9  # fraction -> points
        assert got["invalid"] == 0.001

    def test_points_scale_miou_passthrough(self, tmp_path):
        d = _write_eval(tmp_path, "e", 69.4, 49.5, 58.7)
        assert abs(gates.read_metrics(d)["mIoU"] - 58.7) < 1e-9

    def test_empty_dir(self, tmp_path):
        assert gates.read_metrics(str(tmp_path / "nope")) == {}


class TestBaselineGate:
    def test_pass_within_tolerance(self, tmp_path):
        d = _write_eval(tmp_path, "e", 69.4, 48.5, 0.582)
        assert gates.gate_baseline(d, 1.0)

    def test_fail_below_tolerance(self, tmp_path):
        d = _write_eval(tmp_path, "e", 67.0, 49.5, 0.587)  # R1@0.5 -2.31
        assert not gates.gate_baseline(d, 1.0)

    def test_fail_on_missing_metrics(self, tmp_path):
        assert not gates.gate_baseline(str(tmp_path / "nope"), 1.0)


class TestInt8Gate:
    def test_pass_small_drift(self, tmp_path):
        b = _write_eval(tmp_path, "bf16", 69.4, 49.5, 0.587)
        i = _write_eval(tmp_path, "int8", 69.1, 49.2, 0.584)
        assert gates.gate_int8(b, i)

    def test_fail_large_drift(self, tmp_path):
        b = _write_eval(tmp_path, "bf16", 69.4, 49.5, 0.587)
        i = _write_eval(tmp_path, "int8", 68.0, 49.2, 0.584)  # -1.4
        assert not gates.gate_int8(b, i)

    def test_fail_invalid_predictions_rise(self, tmp_path):
        b = _write_eval(tmp_path, "bf16", 69.4, 49.5, 0.587, invalid=0.001)
        i = _write_eval(tmp_path, "int8", 69.4, 49.5, 0.587, invalid=0.01)
        assert not gates.gate_int8(b, i)

    def test_int8_better_is_fine(self, tmp_path):
        b = _write_eval(tmp_path, "bf16", 69.4, 49.5, 0.587)
        i = _write_eval(tmp_path, "int8", 70.0, 50.0, 0.60)
        assert gates.gate_int8(b, i)


def test_cli_exit_codes(tmp_path):
    d = _write_eval(tmp_path, "e", 69.4, 49.5, 0.587)
    ok = subprocess.run(
        [sys.executable, str(SCRIPTS / "asset_gates.py"), "baseline", d,
         "1.0"], capture_output=True)
    assert ok.returncode == 0
    bad = subprocess.run(
        [sys.executable, str(SCRIPTS / "asset_gates.py"), "baseline",
         str(tmp_path / "nope"), "1.0"], capture_output=True)
    assert bad.returncode == 1
