#!/bin/bash
# Round-4 second-half serial TPU queue, v2 (supersedes round4b_queue.sh).
# Reordered to match VERDICT r03 priority: the comparison-table win (item 3)
# runs BEFORE the HSIMAE-L end-to-end evidence (item 4) so the uncertain
# experiment gets iteration room; L is mechanical and lands whenever reached.
#   0. wait for the in-flight baseline comparison table to finish
#   1. HSIMAE-S texture row, 200-scene corpus (5x v1 diversity, same
#      patch-updates: 150 epochs x ~180k cuts ~ v1's 600ep x 39k)
#   2. HSIMAE-B texture row on the same corpus (the flagship row)
#   3. HSIMAE-L reference-scale pretrain (4M patches, remat) + transfer;
#      OOM fallback to batch 1024 (an axon process is dead after its first
#      RESOURCE_EXHAUSTED).
# Every step resumes (periodic checkpoints + protocol_runs.jsonl) and is
# retried until its artifact exists, so a killed jax process (driver bench
# takeover, tunnel outage) only costs the un-checkpointed tail.
set -u
cd /root/repo

retry() {  # retry <attempts> <artifact> <cmd...>: run cmd until artifact exists
  local tries=$1 art=$2; shift 2
  for ((i = 0; i < tries; i++)); do
    [[ -e "$art" ]] && return 0
    "$@"
    [[ -e "$art" ]] && return 0
    echo "== artifact $art missing after attempt $i; sleeping 120s"
    sleep 120
  done
  [[ -e "$art" ]]
}

WAIT_PID="${1:-}"
if [[ -n "$WAIT_PID" ]]; then
  echo "== [$(date +%T)] waiting for pid $WAIT_PID (baseline table)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "== [$(date +%T)] step 1: HSIMAE-S texture row, 200-scene corpus"
retry 3 /tmp/texture_row_s_v2.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DONEFILE=/tmp/texture_row_s_v2.done \
      timeout 14400 python scripts/texture_table.py HSIMAE-S

echo "== [$(date +%T)] step 2: HSIMAE-B texture row, 200-scene corpus"
retry 3 /tmp/texture_row_b_v2.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DONEFILE=/tmp/texture_row_b_v2.done \
      timeout 21600 python scripts/texture_table.py HSIMAE-B

echo "== [$(date +%T)] step 3: HSIMAE-L refscale pretrain + transfer"
retry 2 /tmp/refscale/pt_l/params_final.msgpack \
  env HSIMAE_REFSCALE_MODEL=HSIMAE-L HSIMAE_REFSCALE_REMAT=1 \
      timeout 10800 python scripts/pretrain_reference_scale.py train
if [[ ! -f /tmp/refscale/pt_l/params_final.msgpack ]]; then
  echo "== L pretrain did not finish at bs 2048; retrying at bs 1024"
  retry 2 /tmp/refscale/pt_l/params_final.msgpack \
    env HSIMAE_REFSCALE_MODEL=HSIMAE-L HSIMAE_REFSCALE_REMAT=1 \
        HSIMAE_REFSCALE_BS=1024 \
        timeout 10800 python scripts/pretrain_reference_scale.py train
fi
if [[ -f /tmp/refscale/pt_l/params_final.msgpack ]]; then
  retry 2 /tmp/l_transfer.json timeout 7200 python scripts/l_transfer.py
  mkdir -p artifacts/refscale
  cp /tmp/l_transfer.json artifacts/refscale/l_transfer.json 2>/dev/null
  cp /tmp/refscale/pt_l/train_log.npy artifacts/refscale/l_train_log.npy 2>/dev/null
fi

echo "== [$(date +%T)] round4c queue done"
