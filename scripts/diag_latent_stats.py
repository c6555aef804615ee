"""Latent-geometry diagnostics for the HSIMAE-B texture collapse (CPU).

The B@v2 frozen-encoder probe is at chance (26.6 OA vs S@v2's 89.7) at EQUAL
final reconstruction loss (0.806 vs 0.810) — so the B pretrain itself failed
to put arrangement information into the latents. Two candidate mechanisms:

  C1 (representation collapse) — training instability (lr 5e-3 at 2x width)
      drove token latents to a low-rank / near-constant configuration.
      Prediction: B's pooled-latent covariance has tiny effective rank and/or
      near-1 mean pairwise cosine similarity; per-window token variance tiny.
  C2 (decoder shortcut) — B pretrains with the reference decoder [8, 64]
      (`/root/reference/Model_Pretraining.py:131`) while S uses the shallow
      [2, 48] signature-default decoder: an 8-block decoder can solve the
      masked-grid MSE from pos-embeds + mean-token + a handful of visible
      tokens, so the ENCODER is never forced to encode inter-token
      arrangement. Prediction: B latents are healthy-rank (no collapse),
      linearly separable for nothing task-relevant: probe at chance while
      variance/rank look normal.

Run: JAX_PLATFORMS=cpu python scripts/diag_latent_stats.py  (~10 min)
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_diag_comp_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from hsimae_tpu.checkpoints.io import load_params  # noqa: E402
from hsimae_tpu.config import preset  # noqa: E402
from hsimae_tpu.data.sampling import dual_scene_split  # noqa: E402
from hsimae_tpu.data.synthetic import make_textured_scene  # noqa: E402
from hsimae_tpu.models.hsimae import HSIMAE  # noqa: E402

CKPTS = {
    "HSIMAE-S": "/tmp/texture_pt_HSIMAE-S_v2/params_final.msgpack",
    "HSIMAE-B": "/tmp/texture_pt_HSIMAE-B_v2/params_final.msgpack",
}
N_WINDOWS = 1024


def stats(name: str, ckpt: str, windows: np.ndarray) -> None:
    cfg = preset(name)
    model = HSIMAE(cfg)
    params = load_params(ckpt)

    @jax.jit
    def enc(x):
        return model.apply({"params": params}, x, False, method=HSIMAE.encode)

    outs = []
    for i in range(0, len(windows), 256):
        outs.append(np.asarray(enc(jnp.asarray(windows[i:i + 256]))))
    z = np.concatenate(outs)  # [N, tok, dim]
    n, tok, dim = z.shape

    pooled = z.mean(axis=1)                       # [N, dim]
    c = pooled - pooled.mean(0)
    ev = np.linalg.eigvalsh(c.T @ c / len(c))[::-1]
    ev = np.clip(ev, 0, None)
    eff_rank = float(ev.sum() ** 2 / (ev ** 2).sum())  # participation ratio
    p = ev / ev.sum()
    entropy_rank = float(np.exp(-(p[p > 0] * np.log(p[p > 0])).sum()))

    zn = pooled / (np.linalg.norm(pooled, axis=1, keepdims=True) + 1e-8)
    sub = zn[:512]
    cos = sub @ sub.T
    mean_cos = float((cos.sum() - len(sub)) / (len(sub) * (len(sub) - 1)))

    # arrangement sensitivity: how much do token latents vary across the
    # (t, l) grid within one window, relative to cross-window variation?
    within = float(z.var(axis=1).mean())          # token variance per window
    across = float(pooled.var(axis=0).mean())     # window-to-window variance
    print(f"{name}: tok={tok} dim={dim} | pooled eff-rank {eff_rank:.1f} "
          f"(entropy {entropy_rank:.1f}) of {dim} | mean-cos {mean_cos:.3f} | "
          f"within-window token var {within:.4f} / cross-window pooled var "
          f"{across:.4f} (ratio {within / (across + 1e-9):.2f})")
    print(f"  top-8 eigval fractions: "
          + " ".join(f"{x:.3f}" for x in (ev / ev.sum())[:8]))


def main():
    scene_raw, gt = make_textured_scene(96, 96, bands=103, seed=3407,
                                        cells_per_class=2)
    rng = np.random.default_rng(3407)
    split = dual_scene_split(scene_raw, gt, patch_size=9, num=10,
                             gwpca=True, nc=32, rng=rng)
    pad = 4
    padded = np.pad(split.scene, ((pad, pad), (pad, pad), (0, 0)),
                    mode="symmetric")
    mask = split.test_gt > 0
    rows, cols = np.nonzero(mask)
    sel = np.random.default_rng(0).choice(len(rows), N_WINDOWS, replace=False)
    windows = np.stack([padded[r:r + 9, c:c + 9]
                        for r, c in zip(rows[sel], cols[sel])])
    for name, ckpt in CKPTS.items():
        if os.path.exists(ckpt):
            stats(name, ckpt, windows)
        else:
            print(f"{name}: checkpoint missing at {ckpt}")


if __name__ == "__main__":
    main()
