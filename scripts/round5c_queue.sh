#!/bin/bash
# Round-5 follow-up TPU queue: flagship-row statistics. Launched by a
# watcher when round5b_queue.sh exits (the two must never run concurrently
# — manual holds preempt each other, verify SKILL.md).
#   1. HSIMAE-B@dec2x48 enc0 row extended to 10 test seeds (reuses the
#      step-0 pretrain + protocol ledger; only seeds 3412-3416 run).
#   2. HSIMAE-B@dec2x48 enc0 on the held-out scene (seed 7701) — the same
#      recipe-overfit check the S row gets in round5b step 3.
#   3. (stretch) HSIMAE-S@v2@enc0 10-seed on the held-out scene, for the
#      full paired S/B/DBDA triangle on both scenes.
set -u
cd /root/repo

retry() {
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

echo "== [$(date +%T)] c1: B@dec2x48 enc0 extended to 10 test seeds"
retry 3 /tmp/texture_row_b_dec2_10ts.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DECODER=2,48 \
      HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_TEST_SEEDS=10 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_b_dec2_10ts.done \
      timeout 7200 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] c2: B@dec2x48 enc0 on held-out scene 7701"
retry 3 /tmp/texture_row_b_dec2_sc7701.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DECODER=2,48 \
      HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_SCENE_SEED=7701 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_b_dec2_sc7701.done \
      timeout 10800 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] c3 (stretch): S@v2@enc0 10 seeds on held-out scene"
retry 2 /tmp/texture_row_s_enc0_sc7701_10ts.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_SCENE_SEED=7701 HSIMAE_TT_TEST_SEEDS=10 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_s_enc0_sc7701_10ts.done \
      timeout 7200 python scripts/texture_table.py HSIMAE-S
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] round5c queue done"
