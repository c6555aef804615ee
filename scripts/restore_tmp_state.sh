#!/bin/bash
# Restore artifacts/round_carry/ (written by scripts/snapshot_tmp_state.sh
# at the end of the previous round) back into /tmp, so the round-4 queue
# scripts (texture_table.py, pretrain_reference_scale.py, run_protocol's
# protocol_runs.jsonl resume) pick up mid-flight experiments instead of
# restarting them. Run ONCE at the start of a new round, BEFORE launching
# any queue script. Never overwrites files that already exist in /tmp
# (a live experiment's state always wins over a stale snapshot).
set -u
CARRY=/root/repo/artifacts/round_carry
[[ -d "$CARRY" ]] || { echo "no carry state at $CARRY"; exit 0; }

for d in "$CARRY"/*/; do
  [[ -d "$d" ]] || continue
  name=$(basename "$d")
  case "$name" in
    pt_l|pt_b) dst=/tmp/refscale/$name ;;
    *) dst=/tmp/$name ;;
  esac
  mkdir -p "$dst"
  for f in "$d"*; do
    base=$(basename "$f")
    [[ -e "$dst/$base" ]] || cp -p "$f" "$dst/$base"
  done
  echo "restored $dst"
done

for f in "$CARRY"/comparison_table_texture.json "$CARRY"/l_transfer.json; do
  base=$(basename "$f")
  if [[ -f "$f" && ! -e "/tmp/$base" ]]; then
    cp -p "$f" "/tmp/$base" && echo "restored /tmp/$base"
  fi
done
exit 0
