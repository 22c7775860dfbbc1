"""Watchdog supervisor tests (examples/train_supervisor.py) — pure subprocess
logic, no jax. The scenarios mirror the two real incidents: a clean finish, a
crash-resume, and a relay wedge (log goes silent, process sleeps forever)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

import train_supervisor as sup  # noqa: E402


def run_sup(tmp_path, child_script, **overrides):
    log = str(tmp_path / "train.log")
    argv = ["--log", log,
            "--pidfile", str(tmp_path / "pid"),
            "--silence_timeout", str(overrides.pop("silence_timeout", 60)),
            "--poll_s", "0.05",
            "--term_grace_s", "5",
            "--cooldown_s", "0.05",
            "--probe_cmd", overrides.pop("probe_cmd", "true"),
            "--probe_retries", str(overrides.pop("probe_retries", 3)),
            "--max_relaunches", str(overrides.pop("max_relaunches", 2)),
            "--", "bash", "-c", child_script]
    assert not overrides, overrides
    rc = sup.main(argv)
    return rc, (open(log).read() if os.path.exists(log) else "")


class TestSupervisor:
    def test_clean_exit_no_relaunch(self, tmp_path):
        rc, log = run_sup(tmp_path, "echo run-$$; exit 0")
        assert rc == 0
        assert log.count("run-") == 1

    def test_crash_then_resume(self, tmp_path):
        """First launch crashes; the relaunch (after a passing probe) runs to
        completion — the resume-from-checkpoint scenario."""
        marker = tmp_path / "crashed_once"
        script = (f"echo attempt; if [ ! -e {marker} ]; then touch {marker}; "
                  f"exit 1; fi; exit 0")
        rc, log = run_sup(tmp_path, script)
        assert rc == 0
        assert log.count("attempt") == 2

    def test_wedge_detected_and_relaunched(self, tmp_path):
        """A child that logs once then sleeps forever must be SIGTERMed on
        log-silence and relaunched; the second attempt finishes."""
        marker = tmp_path / "wedged_once"
        script = (f"echo alive; if [ ! -e {marker} ]; then touch {marker}; "
                  f"sleep 600; fi; exit 0")
        t0 = time.time()
        rc, log = run_sup(tmp_path, script, silence_timeout=1)
        assert rc == 0
        assert log.count("alive") == 2
        assert time.time() - t0 < 60  # detected in ~1s, not after sleep 600

    def test_unhealthy_device_gives_up(self, tmp_path):
        rc, _ = run_sup(tmp_path, "exit 1", probe_cmd="false",
                        probe_retries=2)
        assert rc == 2

    def test_max_relaunches_bounds_crash_loop(self, tmp_path):
        rc, log = run_sup(tmp_path, "echo attempt; exit 1",
                          max_relaunches=2)
        assert rc == 1
        assert log.count("attempt") == 3  # initial + 2 relaunches

    def test_pidfile_written(self, tmp_path):
        rc, _ = run_sup(tmp_path, "echo ok; exit 0")
        assert rc == 0
        assert (tmp_path / "pid").read_text().strip().isdigit()
