#!/bin/bash
# Round-5 serial TPU queue, revision B — written after the round-5 opening
# diagnostics settled the HSIMAE-B collapse question:
#   * frozen-latent probe on B@v2 params_final: 26.6 OA (chance; S@v2: 89.7)
#     -> the B PRETRAIN fails to learn arrangement features; finetune path
#     exonerated (scripts/diag_class6_probe.py, HSIMAE_PROBE_* env).
#   * latent geometry healthy (eff-rank 19.4/128, flat spectrum, normal
#     token variance — scripts/diag_latent_stats.py) -> NOT representation
#     collapse; consistent with the decoder-shortcut mechanism: B pretrains
#     with the reference decoder [8,64] (`Model_Pretraining.py:131`) which
#     can solve the masked-grid MSE by interpolation, while S's shallow
#     signature-default [2,48] decoder forces arrangement into the encoder.
# Step 0 tests that mechanism: B pretrained with S's decoder, then the
# winning frozen-encoder recipe. Steps 1-4 make the S-vs-DBDA comparison
# statistically real (10 paired seeds + a held-out scene). Step 5 is the
# twice-promised HSIMAE-L end-to-end. Ordered by evidence value.
#
# Launch ONCE, after scripts/restore_tmp_state.sh:
#   nohup bash scripts/round5b_queue.sh > /tmp/round5b_queue.log 2>&1 &
#   echo $! > /tmp/round5b_queue.pid
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

echo "== [$(date +%T)] step 0: HSIMAE-B shallow-decoder pretrain + enc0 row"
# The decoder-shortcut experiment: same corpus/schedule/recipe as the
# collapsed B@v2 rows, decoder swapped to S's [2,48]. Lands row
# HSIMAE-B@v2@enc0@dec2x48 (favorable or not — negatives get reported too).
retry 4 /tmp/texture_row_b_dec2.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DECODER=2,48 \
      HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_b_dec2.done \
      timeout 18000 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 1: S@v2@enc0 extended to 10 test seeds"
# Resume ledger /tmp/texture_proto_HSIMAE-S_v2_enc0 already holds the
# selection sweep + test seeds 3407-3411; only 3412-3416 run fresh.
retry 3 /tmp/texture_row_s_enc0_10ts.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_TEST_SEEDS=10 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_s_enc0_10ts.done \
      timeout 7200 python scripts/texture_table.py HSIMAE-S
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 2: DBDA extended to 10 test seeds"
retry 3 /tmp/dbda_10ts.done \
  env HSIMAE_BR_DONEFILE=/tmp/dbda_10ts.done \
      timeout 5400 python scripts/baseline_row.py DBDA --test-seeds 10
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 3: held-out scene (seed 7701): S@v2@enc0 row"
# Same pretrained checkpoint (corpus is scene-independent), new eval scene:
# kills the recipe-overfit concern (recipe was developed on scene 3407).
retry 3 /tmp/texture_row_s_enc0_sc7701.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
      HSIMAE_TT_SCENE_SEED=7701 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_s_enc0_sc7701.done \
      timeout 7200 python scripts/texture_table.py HSIMAE-S
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 4: held-out scene (seed 7701): DBDA row"
retry 3 /tmp/dbda_sc7701.done \
  env HSIMAE_BR_DONEFILE=/tmp/dbda_sc7701.done \
      timeout 5400 python scripts/baseline_row.py DBDA --scene-seed 7701
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] step 5: HSIMAE-L refscale pretrain + transfer"
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

echo "== [$(date +%T)] step 6 (stretch): B@dec2x48 reference-recipe ablation"
# Completes the recipe-damage story at B scale iff the shallow-decoder
# pretrain produced transferable features (reuses the step-0 checkpoint).
retry 2 /tmp/texture_row_b_dec2_ref.done \
  env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
      HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DECODER=2,48 \
      HSIMAE_TT_DONEFILE=/tmp/texture_row_b_dec2_ref.done \
      timeout 14400 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh

echo "== [$(date +%T)] round5b queue done"
