"""Fast-session acquisition for the tunneled TPU runtime.

The runtime lands each process in a fast (~ms dispatch) or throttled
(~180 ms/dispatch, device-level — a 16-step fused scan runs at the same
per-step rate) mode, decided at session setup. ``ensure_fast_session`` probes
dispatch latency with a tiny program and, when throttled, re-execs the
calling script in a fresh process up to ``max_tries`` times; if no fast
session is found the last process continues throttled (correctness is
unaffected, only wall-clock).

Usage at the very top of a script, before any heavy work:

    from tpu_session import ensure_fast_session
    ensure_fast_session()
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

_ENV = "HSIMAE_SESSION_TRY"


def probe_dispatch_ms(n: int = 8) -> float:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((512, 512), jnp.float32)
    for _ in range(3):  # compiles (the axon runtime compiles twice)
        float(f(x))
    t0 = time.perf_counter()
    for _ in range(n):
        y = float(f(x))  # value fetch = true completion; block_until_ready
        # on this tunneled runtime returns before device completion
    return (time.perf_counter() - t0) / n * 1e3


def ensure_fast_session(max_tries: int = 8, threshold_ms: float = 40.0,
                        sleep_s: float = 75.0) -> bool:
    """Returns True when the current process has a fast session.

    Mode draws are time-correlated (observed streaks of tens of minutes),
    so retries sleep ``sleep_s`` before re-exec'ing rather than hammering.
    After ``max_tries`` the process continues throttled — correctness is
    unaffected, only wall-clock.
    """
    ms = probe_dispatch_ms()
    tries = int(os.environ.get(_ENV, "0"))
    fast = ms < threshold_ms
    print(f"# session probe: {ms:.1f} ms/dispatch "
          f"({'fast' if fast else 'throttled'}, try {tries})", flush=True)
    if fast or tries >= max_tries:
        return fast
    time.sleep(sleep_s)
    env = dict(os.environ)
    env[_ENV] = str(tries + 1)
    # replace this process with a fresh attempt (new session, new mode draw)
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
    raise RuntimeError("unreachable")  # pragma: no cover


import contextlib
import signal

_HOLD_ENV = "HSIMAE_HOLD_PID"


def _is_hold_pid(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read()
        return b"bench.py" in cmd and b"--hold" in cmd
    except OSError:
        return False


@contextlib.contextmanager
def hold_bench_slot():
    """Hold bench.py's single-TPU-slot flock while a manual TPU job runs, so
    yield-mode watcher benches print {"skip": "slot_busy"} and exit instead
    of colliding with it (two concurrent jax processes wedge this runtime).

    Spawns ``bench.py --hold`` — a non-jax process that just holds the flock;
    the kernel releases the lock however it dies, so a crashed job cannot
    leave the slot stuck. Survives ``ensure_fast_session``'s re-exec: the
    holder pid travels in the environment and the re-exec'd image adopts it
    instead of spawning (and leaking) a second holder. Enter this context
    BEFORE calling ensure_fast_session so the probe window is covered too.
    A driver round-end bench still preempts by design (its artifact has
    priority); nothing here can prevent that.
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get(_HOLD_ENV)
    proc = None
    if existing and existing.isdigit() and _is_hold_pid(int(existing)):
        pid = int(existing)  # adopted from the pre-re-exec image
    else:
        proc = subprocess.Popen(
            [sys.executable, os.path.join(repo, "bench.py"), "--hold"],
            stderr=subprocess.DEVNULL)
        pid = proc.pid
        os.environ[_HOLD_ENV] = str(pid)
        # WAIT for confirmed acquisition: --hold may be preempting a hunting
        # watcher's bench (SIGTERM + wind-down can take ~1-2 min), and
        # proceeding before the slot is actually ours would run the manual
        # jax job concurrently with the watcher's child — the exact
        # two-process collision the slot exists to prevent.
        # The deadline covers the holder DEFERRING to a driver round-end
        # bench (priority: driver bench > manual hold > hunting watcher),
        # which can own the slot for its whole wall-clock budget.
        slot_dir = os.environ.get("HSIMAE_BENCH_SLOT_DIR", "/tmp")
        pidfile = os.path.join(slot_dir, "hsimae_bench_parent.pid")
        deadline = time.time() + 4500.0
        t0 = time.time()
        last_note = 0.0
        while time.time() < deadline:
            try:
                with open(pidfile) as f:
                    if int(f.read().strip()) == pid:
                        break
            except (OSError, ValueError):
                pass
            if proc.poll() is not None:
                raise RuntimeError(
                    "bench.py --hold exited without acquiring the TPU slot "
                    f"(rc={proc.returncode}); refusing to run a manual TPU "
                    "job concurrently with whatever holds it")
            if time.time() - last_note > 120.0:
                last_note = time.time()
                print(f"# waiting for the TPU slot hold "
                      f"({time.time() - t0:.0f}s)", flush=True)
            time.sleep(2.0)
        else:
            raise RuntimeError("timed out waiting for the TPU slot hold")
    try:
        yield
    finally:
        os.environ.pop(_HOLD_ENV, None)
        if _is_hold_pid(pid):
            try:
                # SIGKILL, not SIGTERM: the holder's SIGTERM handler
                # propagates a driver-takeover wind-down to its parent —
                # which on THIS normal-exit path is the very job that is
                # releasing the hold. The flock dies with the process.
                os.kill(pid, signal.SIGKILL)
            except OSError:
                pass
        if proc is not None:
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
