#!/bin/bash
# Round-4 final serial TPU queue (supersedes round4c_queue.sh from step 2).
# Reordered after the frozen-encoder recipe finding (RESULTS.md round 4):
#   1. HSIMAE-S @v2 improved-recipe protocol row (~50 min, protocol-only —
#      the table win: 88.63 OA single-seed vs DBDA 87.13 mean)
#   2. HSIMAE-B @v2 row, improved recipe (resumes the carried pretrain)
#   3. HSIMAE-B @v2 row, reference recipe (ablation)
#   4. HSIMAE-L refscale pretrain + transfer
# Every step resumes and is retried until its artifact exists. Same steps
# as round5_queue.sh minus the restore (state is live in /tmp).
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

echo "== [$(date +%T)] step 1: HSIMAE-S @v2 improved-recipe protocol row"
retry 3 /tmp/texture_row_s_v2_enc0.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_s_v2_enc0.done \
      timeout 7200 python scripts/texture_table.py HSIMAE-S
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 2: HSIMAE-B @v2 improved-recipe row"
retry 3 /tmp/texture_row_b_v2_enc0.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_b_v2_enc0.done \
      timeout 21600 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 3: HSIMAE-B @v2 reference-recipe row"
retry 3 /tmp/texture_row_b_v2.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DONEFILE=/tmp/texture_row_b_v2.done \
      timeout 10800 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 4: HSIMAE-L refscale pretrain + transfer"
retry 2 /tmp/refscale/pt_l/params_final.msgpack \
  env HSIMAE_REFSCALE_MODEL=HSIMAE-L HSIMAE_REFSCALE_REMAT=1 \
      timeout 10800 python scripts/pretrain_reference_scale.py train
if [[ ! -f /tmp/refscale/pt_l/params_final.msgpack ]]; then
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
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] round4d queue done"
