#!/bin/bash
# Round-5 serial TPU queue. Launch ONCE at round start, AFTER
# scripts/restore_tmp_state.sh has put artifacts/round_carry back into /tmp:
#
#   bash scripts/restore_tmp_state.sh
#   nohup bash scripts/round5_queue.sh > /tmp/round5_queue.log 2>&1 &
#   echo $! > /tmp/round5_queue.pid
#
# Priority order (what is still open after round 4):
#   1. HSIMAE-S @v2 enc0 EXTENDED-GRID probe row (~45 min): the enc0
#      selection score is monotone increasing up to the reference grid's
#      top edge (0.479..0.893 at 1e-4..5e-3), so the head-only optimum is
#      likely above it — probe 2e-2/1e-2/5e-3 cheaply at S scale.
#   2. HSIMAE-B @v2 texture row, frozen-encoder recipe — the flagship's
#      comparison-table entry under the winning recipe (enc0 put S at
#      87.46, #1; B is the scale lever). Uses the extended grid iff the
#      S probe selected above 5e-3. Resumes the carried pretrain.
#   3. HSIMAE-L reference-scale pretrain (4M patches, remat for activation
#      headroom) + transfer vs scratch — VERDICT r03 item 4.
#   4. HSIMAE-B @v2 row under the reference recipe — the uniform-lr
#      ablation at B scale (completes the recipe-damage story).
#   5. (reached only if time remains) HSIMAE-S @v2 600-epoch continuation.
# Ordered by evidence value so an early cutoff keeps the best rows.
# Every step retries until its artifact exists and every step resumes from
# periodic checkpoints, so driver-bench takeovers / tunnel outages only cost
# the un-checkpointed tail. Keep scripts/fast_hunt.sh and a 20-min
# snapshot_tmp_state.sh + commit heartbeat running alongside.
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

echo "== [$(date +%T)] step 0: HSIMAE-S @v2 improved-recipe protocol row"
# Frozen-encoder head training (round-4 diagnostic: the reference's
# uniform-lr finetune damages the pretrained representation; scale 0.0 is
# +7 OA at the probed (lr, seed) — scripts/diag_encoder_lr_ab.py). Reuses
# the restored v2 pretrain checkpoint, so this is protocol-only (~50 min)
# and the cheapest shot at putting HSIMAE above DBDA's 87.13 OA.
retry 3 /tmp/texture_row_s_v2_enc0.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_s_v2_enc0.done \
      timeout 7200 python scripts/texture_table.py HSIMAE-S
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 1: HSIMAE-S @v2 enc0 extended-grid probe row"
retry 3 /tmp/texture_row_s_v2_enc0_xg.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_LR_GRID=2e-2,1e-2,5e-3 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_s_v2_enc0_xg.done \
      timeout 7200 python scripts/texture_table.py HSIMAE-S
bash scripts/snapshot_tmp_state.sh

# Grid for the B row: extended iff the S probe selected above the reference
# edge (best_lr > 5e-3); empty means the reference grid.
B_GRID=$(python - <<'EOF'
import json
try:
    row = json.load(open("/tmp/texture_row_s_v2_enc0_xg.done"))
    best = max(float(r.get("best_lr") or 0)
               for k, r in row.items() if "@g" in k) if row else 0
except Exception:
    best = 0
print("2e-2,1e-2,5e-3" if best > 0.005 else "")
EOF
)
echo "== B-row lr grid: ${B_GRID:-reference}"

echo "== [$(date +%T)] step 2: HSIMAE-B @v2 improved-recipe protocol row"
# Finishes the carried B pretrain (resumes its newest ckpt) then runs the
# frozen-encoder protocol — the highest-value row left in the table.
retry 4 /tmp/texture_row_b_v2_enc0.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      ${B_GRID:+HSIMAE_TT_LR_GRID=$B_GRID} \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_b_v2_enc0.done \
      timeout 21600 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

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
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 4: HSIMAE-B @v2 reference-recipe row (ablation)"
retry 3 /tmp/texture_row_b_v2.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DONEFILE=/tmp/texture_row_b_v2.done \
      timeout 21600 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 5 (stretch): HSIMAE-S @v2, 600-epoch continuation"
# Seed the continuation workdir from the carried v2 periodic checkpoint
# (params + opt state at ~epoch 150) so the 600-epoch run RESUMES rather
# than restarting; run_pretraining picks up the newest ckpt_*.msgpack.
if [[ ! -d /tmp/texture_pt_HSIMAE-S_v2x600 ]]; then
  mkdir -p /tmp/texture_pt_HSIMAE-S_v2x600
  cp -p /tmp/texture_pt_HSIMAE-S_v2/ckpt_*.msgpack* \
        /tmp/texture_pt_HSIMAE-S_v2x600/ 2>/dev/null || true
fi
retry 2 /tmp/texture_row_s_v2_600.done \
  env HSIMAE_TT_TAG=v2x600 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=600 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DONEFILE=/tmp/texture_row_s_v2_600.done \
      timeout 28800 python scripts/texture_table.py HSIMAE-S

echo "== [$(date +%T)] round5 queue done"
