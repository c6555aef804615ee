#!/bin/bash
# Round-4 serial TPU queue (one jax process at a time; each step holds the
# bench slot so the fast-session hunter's yield benches skip):
#   1. HSIMAE-S full texture protocol (reference grid, 3+5 seeds) — the
#      flagship row of the texture comparison table
#   2. the 10-model zoo + SVM-RBF on the SAME textured scene
#   3. HSIMAE-L reference-scale pretrain (4M patches) + transfer experiment
#   4. (if the round is still alive) HSIMAE-B texture row
# Every step streams results and resumes, so a driver kill loses nothing.
set -u
cd /root/repo

echo "== [$(date +%T)] step 1: HSIMAE-S full texture protocol"
python - <<'EOF'
# clear the smoke-grade (2-lr, 1+1-seed) row + resume state so the full
# reference protocol re-runs; the 600-epoch pretrain checkpoint is reused
import json, os, shutil
out = "/tmp/comparison_table_texture.json"
if os.path.exists(out):
    d = json.load(open(out))
    if d.get("HSIMAE-S", {}).get("oa", "").endswith("±0.00"):
        d.pop("HSIMAE-S")
        json.dump(d, open(out, "w"), indent=2)
shutil.rmtree("/tmp/texture_proto_HSIMAE-S", ignore_errors=True)
EOF
timeout 10800 python scripts/texture_table.py HSIMAE-S

echo "== [$(date +%T)] step 2: baseline zoo on the textured scene"
timeout 21600 python scripts/comparison_table.py --texture \
    SSFTT FDSSC DBDA SpectralFormer GSC-ViT HybridFormer DCTN HiT RSSAN \
    SSRN SVM-RBF

echo "== [$(date +%T)] step 3: HSIMAE-L refscale pretrain + transfer"
HSIMAE_REFSCALE_MODEL=HSIMAE-L HSIMAE_REFSCALE_REMAT=1 \
    timeout 14400 python scripts/pretrain_reference_scale.py train
timeout 7200 python scripts/l_transfer.py

echo "== [$(date +%T)] step 4: HSIMAE-B texture row"
timeout 21600 python scripts/texture_table.py HSIMAE-B

echo "== [$(date +%T)] texture_round done"
