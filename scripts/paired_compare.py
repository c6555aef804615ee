"""Paired per-seed comparison of two rows of the textured-scene table.

The protocol draws the labeled split and init from the SAME seed list
(3407, 3408, ...) for every model, so per-seed OAs pair naturally: seed k
gives both models the same few-shot label budget draw of the same scene.
Reporting the mean and std of the per-seed DIFFERENCE separates the models
with far fewer seeds than comparing two independent means (VERDICT r04
item 3 / weak #2).

Usage:
  python scripts/paired_compare.py HSIMAE-S@v2@enc0@10ts DBDA@10ts
  python scripts/paired_compare.py --out /tmp/comparison_table_texture.json A B
"""

import argparse
import json
import math


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("key_a")
    ap.add_argument("key_b")
    ap.add_argument("--out", default="/tmp/comparison_table_texture.json")
    args = ap.parse_args()
    with open(args.out) as f:
        table = json.load(f)
    a, b = table[args.key_a], table[args.key_b]
    pa, pb = a.get("per_seed_oa"), b.get("per_seed_oa")
    if not pa or not pb:
        raise SystemExit("both rows need per_seed_oa (re-run with the "
                         "round-5 texture_table/baseline_row scripts)")
    n = min(len(pa), len(pb))
    d = [x - y for x, y in zip(pa[:n], pb[:n])]
    mean = sum(d) / n
    var = sum((x - mean) ** 2 for x in d) / (n - 1) if n > 1 else float("nan")
    sd = math.sqrt(var)
    se = sd / math.sqrt(n)
    t = mean / se if se else float("inf")
    wins = sum(1 for x in d if x > 0)
    print(f"{args.key_a} vs {args.key_b} over {n} paired seeds")
    print(f"  per-seed OA ({args.key_a}): {pa[:n]}")
    print(f"  per-seed OA ({args.key_b}): {pb[:n]}")
    print(f"  paired diff: mean {mean:+.2f} OA, sd {sd:.2f}, se {se:.2f}, "
          f"t={t:.2f} (df={n - 1}), wins {wins}/{n}")
    return {"mean_diff": mean, "sd": sd, "se": se, "t": t, "n": n,
            "wins": wins}


if __name__ == "__main__":
    main()
