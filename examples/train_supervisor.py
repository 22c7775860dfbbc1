"""Watchdog supervisor for long TPU training runs on a relay-attached chip.

Two documented incidents (CLAUDE.md 2026-08-17, 2026-08-19) share one
signature: a healthy trainer's host thread blocks forever on the TPU relay
socket — the process sleeps at 0% CPU and the log goes silent mid-run, but
nothing crashes. Recovery is always the same manual runbook: SIGTERM (the
trainer checkpoints-and-exits cleanly, shmgan_tpu/train/loop.py preemption
handling), wait for the relay to cool down, probe with a tiny matmul, and
relaunch — the run resumes from its last checkpoint. This script automates
that runbook so a wedge costs minutes instead of a human noticing.

The reference has no failure-recovery story at all (its train loop is a bare
epoch for-loop, ShmGANwithSSpecSeg.py:466-875); this pairs with the
checkpoint/auto-resume machinery (SURVEY.md §5 failure detection/recovery).

Usage:
  python examples/train_supervisor.py \
      --log benchmarks/run/gan_train.log --pidfile /tmp/train.pid \
      --silence_timeout 900 \
      -- python examples/quality_train.py --phase gan ... --out benchmarks/run

Everything after `--` is the trainer command; its stdout/stderr append to
--log. The trainer must be resumable (quality_train.py restores from
--ckpt_dir on start). Exit code 0 of the child ends supervision successfully;
a wedge (log silent > --silence_timeout) or a crash triggers
SIGTERM -> cool-down -> device probe -> relaunch, up to --max_relaunches.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

DEFAULT_PROBE = (
    "import jax, jax.numpy as jnp; "
    "x = jnp.ones((256, 256)); "
    "print('probe ok:', float(jnp.dot(x, x)[0, 0]))"
)


def log(msg: str) -> None:
    print(f"[supervisor {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--log", required=True,
                   help="trainer stdout/stderr appends here; its mtime is the "
                        "liveness signal")
    p.add_argument("--pidfile", default="",
                   help="write the live child pid here (for manual kill)")
    p.add_argument("--silence_timeout", type=float, default=900.0,
                   help="seconds of log silence that count as a wedge "
                        "(set to ~3x the trainer's slowest log cadence)")
    p.add_argument("--poll_s", type=float, default=15.0)
    p.add_argument("--term_grace_s", type=float, default=120.0,
                   help="SIGTERM -> SIGKILL escalation window (the trainer "
                        "checkpoints on SIGTERM; give it time)")
    p.add_argument("--cooldown_s", type=float, default=120.0,
                   help="hands-off wait after the child exits before probing "
                        "(TPU relay rule: >=120s after killing a client)")
    p.add_argument("--probe_cmd", default="",
                   help="override the liveness probe command (default: tiny "
                        "matmul + value fetch in a python subprocess)")
    p.add_argument("--probe_timeout_s", type=float, default=120.0)
    p.add_argument("--probe_retries", type=int, default=12,
                   help="probe attempts before giving up (relay can need "
                        "25+ min after a worker crash; 12 x cooldown covers it)")
    p.add_argument("--max_relaunches", type=int, default=5)
    p.add_argument("command", nargs=argparse.REMAINDER,
                   help="-- then the trainer command line")
    a = p.parse_args(argv)
    if a.command and a.command[0] == "--":
        a.command = a.command[1:]
    if not a.command:
        p.error("trainer command required after --")
    return a


def launch(command, log_path, pidfile) -> subprocess.Popen:
    os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)
    logf = open(log_path, "ab", buffering=0)
    # new session so SIGTERM targets exactly this child's group, and the child
    # survives a supervisor-terminal hangup like nohup would
    child = subprocess.Popen(command, stdout=logf, stderr=subprocess.STDOUT,
                             start_new_session=True)
    logf.close()  # the child holds its own fd now
    if pidfile:
        with open(pidfile, "w") as f:
            f.write(str(child.pid))
    log(f"launched pid {child.pid}: {' '.join(command)}")
    return child


def terminate(child: subprocess.Popen, grace_s: float) -> int:
    """SIGTERM (trainer checkpoints-and-exits), escalate to SIGKILL after
    grace_s. Returns the exit code. Signals the exact pid — never a pattern."""
    if child.poll() is not None:
        return child.returncode
    log(f"SIGTERM pid {child.pid} (grace {grace_s:.0f}s)")
    child.terminate()
    try:
        return child.wait(timeout=grace_s)
    except subprocess.TimeoutExpired:
        log(f"SIGKILL pid {child.pid} (did not exit in {grace_s:.0f}s)")
        child.kill()
        return child.wait()


def probe_device(a) -> bool:
    """One probe attempt: the relay acks optimistically, so the probe must
    fetch a VALUE (float()), not just block_until_ready."""
    cmd = (a.probe_cmd.split() if a.probe_cmd
           else [sys.executable, "-c", DEFAULT_PROBE])
    try:
        r = subprocess.run(cmd, timeout=a.probe_timeout_s,
                           capture_output=True, text=True)
        ok = r.returncode == 0
        log(f"probe {'ok' if ok else f'FAILED rc={r.returncode}'}")
        return ok
    except subprocess.TimeoutExpired:
        log(f"probe TIMED OUT ({a.probe_timeout_s:.0f}s)")
        return False


def wait_device_healthy(a) -> bool:
    for attempt in range(a.probe_retries):
        log(f"cooldown {a.cooldown_s:.0f}s before probe "
            f"{attempt + 1}/{a.probe_retries}")
        time.sleep(a.cooldown_s)
        if probe_device(a):
            return True
    return False


def supervise(a) -> int:
    relaunches = 0
    while True:
        child = launch(a.command, a.log, a.pidfile)
        launched_at = time.time()
        wedged = False
        while True:
            rc = child.poll()
            if rc is not None:
                break
            mtime = (os.path.getmtime(a.log) if os.path.exists(a.log)
                     else time.time())
            # Clock silence from the LATER of the log's last write and this
            # child's launch: right after a relaunch the log still carries the
            # previous attempt's mtime, and a slow-starting child would be
            # flagged wedged before its first line (seen under load in CI).
            silence = time.time() - max(mtime, launched_at)
            if silence > a.silence_timeout:
                log(f"WEDGE: log silent {silence:.0f}s "
                    f"(> {a.silence_timeout:.0f}s)")
                wedged = True
                rc = terminate(child, a.term_grace_s)
                break
            time.sleep(a.poll_s)
        if rc == 0 and not wedged:
            log("child exited 0 — done")
            return 0
        log(f"child exited rc={rc}{' after wedge' if wedged else ''}")
        if relaunches >= a.max_relaunches:
            log(f"max relaunches ({a.max_relaunches}) reached — giving up")
            return 1
        if not wait_device_healthy(a):
            log("device never probed healthy — giving up")
            return 2
        relaunches += 1
        log(f"relaunch {relaunches}/{a.max_relaunches}")


def main(argv=None) -> int:
    return supervise(parse_args(argv))


if __name__ == "__main__":
    sys.exit(main())
