"""Is the period-3 checkerboard in the pretrained encoder at all? (CPU)

Follow-up to `diag_class6_confusion.py`: HSIMAE-S@v2 smears checker-p3
(the only texture whose period equals the 3x3 spatial patch size) nearly
uniformly across the other structured classes. Two mechanistic hypotheses:

  H1 (pooling) — attention DOES write the inter-token alternation into the
      token latents, but the classify head's mean over spatial positions
      (`models/hsimae.py::classify`, both 'agg' and 'gap') destroys it.
      Prediction: a linear probe on CONCATENATED token latents separates
      checker-p3; a probe on position-MEANED latents does not.
  H2 (encoding) — when texture period == patch size, phase-aligned windows
      tokenize into pure-material patches and the encoder never produces
      arrangement-sensitive features. Prediction: both probes fail on
      checker-p3; only patch geometry (p=1) or model scale can help.

Probes: frozen v2-pretrained encoder latents of every labeled test window,
logistic regression at 10 labels/class (same split as the protocol run),
per-class accuracy for (a) AGG-style pooled latents, (b) full token concat.

Run: JAX_PLATFORMS=cpu python scripts/diag_class6_probe.py (~3 min).
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

# Round-5: checkpoint/preset overridable so the same probe runs on the
# HSIMAE-B@v2 checkpoint (the collapsed texture rows, VERDICT r04 weak #1).
CKPT = os.environ.get(
    "HSIMAE_PROBE_CKPT",
    "/root/repo/artifacts/round_carry/texture_pt_HSIMAE-S_v2/params_final.msgpack")
PRESET = os.environ.get("HSIMAE_PROBE_PRESET", "HSIMAE-S")
NAMES = ["checker-p1", "checker-p2", "h-stripes-p2", "v-stripes-p2",
         "speckle", "checker-p3"]


def encode_all(model, params, patches: np.ndarray) -> np.ndarray:
    """[N, 9, 9, 32] -> [N, tokens, dim] frozen encoder latents."""
    @jax.jit
    def enc(x):
        return model.apply({"params": params}, x, False,
                           method=HSIMAE.encode)

    outs = []
    for i in range(0, len(patches), 512):
        outs.append(np.asarray(enc(jnp.asarray(patches[i:i + 512]))))
    return np.concatenate(outs)


def probe(xtr, ytr, xte, yte, label: str) -> None:
    from sklearn.linear_model import LogisticRegression

    clf = LogisticRegression(max_iter=3000, C=1.0)
    clf.fit(xtr.reshape(len(xtr), -1), ytr)
    pred = clf.predict(xte.reshape(len(xte), -1))
    oa = 100 * float((pred == yte).mean())
    per = [100 * float((pred[yte == k] == k).mean()) for k in range(1, 7)]
    print(f"{label}: OA {oa:.2f} | " +
          " ".join(f"{n}={p:.0f}" for n, p in zip(NAMES, per)))


def main():
    scene_raw, gt = make_textured_scene(96, 96, bands=103, seed=3407,
                                        cells_per_class=2)
    dec = tuple(int(x) for x in
                os.environ.get("HSIMAE_PROBE_DECODER", "").split(",") if x)
    cfg = preset(PRESET, **({"decoder_depth": dec[0], "decoder_dim": dec[1]}
                            if dec else {}))
    rng = np.random.default_rng(3407)
    split = dual_scene_split(scene_raw, gt, patch_size=cfg.img_size, num=10,
                             gwpca=True, nc=cfg.bands, rng=rng)
    model = HSIMAE(cfg)
    params = load_params(CKPT)
    if isinstance(params, dict) and "params" in params and "step" in params:
        print(f"(periodic train-state checkpoint, step {params['step']})")
        params = params["params"]  # probe mid-pretrain ckpt_N.msgpack files

    # labeled train windows + all labeled test windows (centered, padded —
    # the same geometry the finetune/eval paths use)
    pad = cfg.img_size // 2
    padded = np.pad(split.scene, ((pad, pad), (pad, pad), (0, 0)),
                    mode="symmetric")

    def windows(rows, cols):
        return np.stack([padded[r:r + cfg.img_size, c:c + cfg.img_size]
                         for r, c in zip(rows, cols)])

    w = split.scene.shape[1]
    xtr_img = windows(split.labeled_index // w, split.labeled_index % w)
    ytr = split.labels
    mask = split.test_gt > 0
    rows, cols = np.nonzero(mask)
    yte = split.test_gt[mask]
    xte_img = windows(rows, cols)

    ztr = encode_all(model, params, xtr_img)
    zte = encode_all(model, params, xte_img)
    n, tok, dim = ztr.shape
    t = cfg.spectral_groups if hasattr(cfg, "spectral_groups") else 4

    print(f"latents: {tok} tokens x {dim} dim "
          f"({len(ztr)} train, {len(zte)} test windows)")
    # (a) spatial-mean pooled (what agg/gap heads see, spatially)
    s = tok // t if tok % t == 0 else tok
    probe(ztr.mean(axis=1), ytr, zte.mean(axis=1), yte,
          "pooled (mean over all tokens)  ")
    # (b) full token concat — spatial arrangement preserved
    probe(ztr, ytr, zte, yte,
          "concat (all token latents)     ")


if __name__ == "__main__":
    main()
