#!/bin/bash
set -u
cd /root/repo
echo "== [$(date +%T)] d1: B@dec2x48 held-out extended to 10 seeds"
env HSIMAE_TT_TAG=v2 HSIMAE_TT_PT_SCENES=200 HSIMAE_TT_PT_EPOCHS=150 \
    HSIMAE_TT_SIZE_MAX=160 HSIMAE_TT_DECODER=2,48 \
    HSIMAE_TT_ENC_SCALE=0.0 HSIMAE_TT_DROPPATH=0.0 \
    HSIMAE_TT_SCENE_SEED=7701 HSIMAE_TT_TEST_SEEDS=10 \
    timeout 3600 python scripts/texture_table.py HSIMAE-B
bash scripts/snapshot_tmp_state.sh
echo "== [$(date +%T)] d2: DBDA held-out extended to 10 seeds"
timeout 3600 python scripts/baseline_row.py DBDA --scene-seed 7701 --test-seeds 10
bash scripts/snapshot_tmp_state.sh
echo "== [$(date +%T)] round5d done"
