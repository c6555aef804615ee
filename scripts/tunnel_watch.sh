#!/bin/bash
# TPU tunnel-recovery watcher (the pattern from .claude/skills/verify/SKILL.md).
#
# The axon TPU is reached through a stdio relay daemon (`tpu_init`) whose
# stdin/stdout are wired by the outer infrastructure; when it dies, every
# jax process hangs at jax.devices() and nothing in-process can recover it
# (round 3 measured a 10+ h outage; a connecting jax client does NOT respawn
# the relay). This watcher polls ps for the relay and, on recovery, runs
# bench.py once with a bounded budget so a tunnel return is exploited even
# with nobody at the keyboard.
#
#   nohup scripts/tunnel_watch.sh [budget_s] >/dev/null 2>&1 &
#
# Log: /tmp/tunnel_watch.log; bench output: /tmp/bench_recovery.{log,err}.
#
# Coordination: the bench run uses HSIMAE_BENCH_YIELD=1 so it skips when
# another bench parent holds the TPU slot. For MANUAL TPU work (diag
# scripts, reference-scale pretrains) hold the slot first —
#   python bench.py --hold & echo $! > /tmp/hold.pid
# — so this watcher's bench yields instead of colliding with your session.

BUDGET="${1:-2400}"
log() { echo "$(date -u +%H:%M:%S) $*" >> /tmp/tunnel_watch.log; }
log "armed (bench budget ${BUDGET}s)"
for i in $(seq 1 660); do
  if ps aux | grep 'tpu_init' | grep -v grep > /dev/null; then
    log "tunnel relay detected (iter $i); settling 30s"
    sleep 30
    log "launching bench.py (yield mode: the driver's round-end bench wins)"
    HSIMAE_BENCH_YIELD=1 HSIMAE_BENCH_BUDGET_S="$BUDGET" \
      timeout $((BUDGET + 300)) \
      python "$(dirname "$0")/../bench.py" \
      > /tmp/bench_recovery.log 2> /tmp/bench_recovery.err
    log "bench.py exited rc=$?"
    # success = a FRESH measurement line: bench.py always prints the archived
    # provisional record (stale:true) and prints {"skip": ...} in yield mode,
    # so a bare '^{' grep would declare victory on every invocation.
    if grep '^{' /tmp/bench_recovery.log | grep -v '"stale"' \
         | grep -v '"skip"' | grep -q '"value"'; then
      log "fresh measurement: $(grep '^{' /tmp/bench_recovery.log \
        | grep -v '"stale"' | grep -v '"skip"' | tail -1)"
      exit 0
    fi
    log "no fresh measurement (outage flap / slot busy / throttle-only) — resuming watch"
    sleep 120
  fi
  sleep 60
done
log "expired without capture"
