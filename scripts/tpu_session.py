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
