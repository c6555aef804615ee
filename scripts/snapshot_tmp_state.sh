#!/bin/bash
# Harvest resumable in-flight state from /tmp into artifacts/round_carry/.
#
# /tmp is WIPED between rounds (verify SKILL.md), so any experiment the
# round-end catches mid-flight (a texture-row pretrain, the L refscale leg,
# a half-done protocol sweep) would otherwise restart from zero next round.
# This script copies ONLY the small resume-critical files — final params,
# the single newest periodic checkpoint of an unfinished pretrain (+ its
# step-metadata json), train logs, protocol_runs.jsonl ledgers, and the
# merged comparison-table json — never the full checkpoint history (~1.7 GB
# per workdir). Safe to run at any time, including while the experiments
# are still running (files are copied, not moved).
#
# Pair: scripts/restore_tmp_state.sh puts everything back so the round-4
# queue scripts resume exactly where they left off.
set -u
CARRY=/root/repo/artifacts/round_carry
mkdir -p "$CARRY"

snap_workdir() {  # snap_workdir <tmp workdir>: params_final OR newest ckpt
  local wd=$1 name dst
  [[ -d "$wd" ]] || return 0
  name=$(basename "$wd")
  dst="$CARRY/$name"
  mkdir -p "$dst"
  if [[ -f "$wd/params_final.msgpack" ]]; then
    cp -p "$wd/params_final.msgpack" "$dst/"
  fi
  # newest periodic checkpoint (params + opt state + step metadata): the
  # resume point for an unfinished pretrain, and the seed for extending a
  # finished one to more epochs (round-5 step 3)
  local newest base f
  newest=$(ls -t "$wd"/ckpt_*.msgpack 2>/dev/null | head -1)
  if [[ -n "${newest:-}" ]]; then
    base=$(basename "$newest")
    # prune superseded periodic ckpts from the carry dir (keep the
    # working tree at one ckpt per workdir; ~40 MB each at B scale)
    for f in "$dst"/ckpt_*.msgpack; do
      [[ -e "$f" && "$(basename "$f")" != "$base" ]] && rm -f "$f" "$f.json"
    done
    cp -p "$newest" "$dst/"
    [[ -f "$newest.json" ]] && cp -p "$newest.json" "$dst/"
  fi
  for f in train_log.npy train.jsonl protocol_runs.jsonl; do
    [[ -f "$wd/$f" ]] && cp -p "$wd/$f" "$dst/"
  done
  echo "snapshotted $wd -> $dst ($(du -sh "$dst" | cut -f1))"
}

for wd in /tmp/texture_pt_HSIMAE-* /tmp/texture_proto_HSIMAE-* \
          /tmp/refscale/pt_l /tmp/refscale/pt_b; do
  snap_workdir "$wd"
done

for f in /tmp/comparison_table_texture.json /tmp/l_transfer.json; do
  [[ -f "$f" ]] && cp -p "$f" "$CARRY/" && echo "snapshotted $f"
done
echo "carry total: $(du -sh "$CARRY" | cut -f1)"
