"""bench.py artifact robustness (round-4 postmortem: one rc=124 lost the
round's entire official perf record — BENCH_r04.json parsed null).

Contract under test, using the no-TPU fake stage mode (MRBLIP_BENCH_FAKE):

* a cumulative JSON row is printed after EVERY stage, headline first,
  each line a superset of the previous — the driver parses the last line;
* a driver-style hard kill mid-run still leaves a parseable last line
  that carries the headline value (stages already completed survive);
* the internal budget guard skips remaining stages and records them, and
  kills an over-running stage without losing earlier rows.
"""

import json
import os
import signal
import subprocess
import sys
import time

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _run(env_extra, delays=None, timeout=None, kill_after=None):
    env = dict(os.environ, MRBLIP_BENCH_FAKE="1")
    env.pop("MRBLIP_BENCH_STAGE", None)
    if delays:
        env["MRBLIP_BENCH_FAKE_DELAYS"] = json.dumps(delays)
    env.update(env_extra)
    proc = subprocess.Popen(
        [sys.executable, BENCH], env=env, text=True,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )
    if kill_after is not None:
        # Emulate the driver's timeout: SIGKILL the parent mid-run. Lines
        # already flushed to the pipe must survive.
        time.sleep(kill_after)
        proc.send_signal(signal.SIGKILL)
    out, _ = proc.communicate(timeout=timeout or 120)
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert lines, "bench printed nothing"
    return [json.loads(ln) for ln in lines], proc.returncode


def test_full_run_emits_cumulative_rows():
    rows, rc = _run({})
    assert rc == 0
    # First row is the immediate placeholder; every later row is a superset
    # of the one before (cumulative emission).
    assert rows[0]["value"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert set(prev) <= set(cur)
    last = rows[-1]
    assert last["value"] == 100.0  # headline (int8 infer) stage
    assert last["train_value"] == 25.0
    assert last["train_int8_value"] == 30.0
    assert last["bf16_value"] == 50.0
    assert "skipped_stages" not in last


def test_headline_survives_driver_kill_mid_run():
    # Headline is fast; the train stage sleeps 60 s. Kill the parent while
    # train is mid-sleep — the already-printed headline row must survive.
    rows, _ = _run({}, delays={"train": 60}, kill_after=8.0)
    last = rows[-1]
    assert last["value"] == 100.0, last
    assert "train_value" not in last  # train never finished


def test_budget_guard_skips_remaining_stages():
    # Budget expires right after the headline stage: the guard must skip
    # the rest, record them, and still exit 0 with the headline row.
    rows, rc = _run({
        "MRBLIP_BENCH_BUDGET_S": "6",
        "MRBLIP_BENCH_MIN_STAGE_S": "4",
    }, delays={"headline": 2})
    assert rc == 0
    last = rows[-1]
    assert last["value"] == 100.0
    assert set(last["skipped_stages"]) == {"train", "train-int8", "bf16"}


def test_dead_relay_probe_records_diagnosis_and_still_tries_headline():
    # Simulate the axon relay being down (observed live in round 5: a
    # stage sat 25 min inside jax.devices() at ~0% CPU): the bounded
    # pre-flight probe must fail fast, stamp the artifact, and give only
    # the headline stage a chance instead of queueing four hangs.
    rows, rc = _run({
        "MRBLIP_BENCH_PROBE_CMD": "sleep 60",
        "MRBLIP_BENCH_PROBE_TIMEOUT_S": "2",
    })
    assert rc == 0
    last = rows[-1]
    assert last["tpu_unreachable"] is True
    assert last["device_probe_s"] >= 2.0
    assert last["value"] == 100.0  # fake headline still ran
    assert set(last["skipped_stages"]) == {"train", "train-int8", "bf16"}


def test_probe_success_is_recorded_and_all_stages_run():
    rows, rc = _run({"MRBLIP_BENCH_PROBE_CMD": "true"})
    assert rc == 0
    last = rows[-1]
    assert "tpu_unreachable" not in last
    assert "device_probe_s" in last
    assert last["bf16_value"] == 50.0  # every stage ran


def test_overrunning_stage_is_killed_not_fatal():
    # The train stage would overrun the deadline mid-sleep: the watchdog
    # kills it, the headline row survives, and the parent exits 0.
    rows, rc = _run({
        "MRBLIP_BENCH_BUDGET_S": "8",
        "MRBLIP_BENCH_MIN_STAGE_S": "1",
    }, delays={"train": 60})
    assert rc == 0
    last = rows[-1]
    assert last["value"] == 100.0
    assert "train_value" not in last
    # the stages after the killed one were recorded as skipped
    assert "train-int8" in last["skipped_stages"]
    assert "bf16" in last["skipped_stages"]


def test_transient_stage_failure_is_retried_once(tmp_path):
    marker = str(tmp_path / "fail_marker")
    rows, rc = _run({
        "MRBLIP_BENCH_FAKE_FAIL_ONCE": "train",
        "MRBLIP_BENCH_FAKE_MARKER": marker,
    })
    assert rc == 0
    last = rows[-1]
    # The first train attempt crashed (simulated relay flake); the retry
    # supplied the row, and the artifact records that a retry happened.
    assert last["train_value"] == 25.0
    assert last["retried_stages"] == ["train"]
    assert "skipped_stages" not in last
    assert os.path.exists(marker)
