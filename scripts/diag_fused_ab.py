"""Same-session A/B of the fused q/k/v + SwiGLU projection matmuls.

The throttle degree varies session to session (190-220 ms/step for the same
unfused program today), so cross-session comparisons are useless. This runs
BOTH variants in ONE process: the library default (fused projections), and
an unfused control built by swapping `layers.Attention` / `layers.SwiGLU`
for plain per-projection nn.Dense versions (identical param tree).
"""

import functools
import sys
import time
from typing import Callable, Optional

import numpy as np

sys.path.insert(0, "/root/repo")

import flax.linen as nn
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from hsimae_tpu.models import layers


class UnfusedAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = layers.trunc_normal_init(0.02)

    @nn.compact
    def __call__(self, x, attn_bias: Optional[jax.Array] = None):
        n, s, c = x.shape
        h = self.num_heads
        hd = c // h
        dense = functools.partial(
            nn.Dense, self.dim, use_bias=self.qkv_bias,
            kernel_init=self.kernel_init, bias_init=nn.initializers.zeros,
            dtype=self.dtype)
        q = dense(name="q")(x).reshape(n, s, h, hd)
        k = dense(name="k")(x).reshape(n, s, h, hd)
        v = dense(name="v")(x).reshape(n, s, h, hd)
        scale = hd**-0.5
        attn = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
        if attn_bias is not None:
            attn = attn + attn_bias
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, s, c)
        return nn.Dense(self.dim, use_bias=True, kernel_init=self.kernel_init,
                        bias_init=nn.initializers.zeros, dtype=self.dtype,
                        name="proj")(out)


class UnfusedSwiGLU(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = layers.trunc_normal_init(0.02)

    @nn.compact
    def __call__(self, x):
        hidden = layers.swiglu_hidden_dim(self.dim, self.mlp_ratio)
        dense = functools.partial(
            nn.Dense, use_bias=True, kernel_init=self.kernel_init,
            bias_init=nn.initializers.zeros, dtype=self.dtype)
        x1 = dense(hidden, name="w1")(x)
        x3 = dense(hidden, name="w3")(x)
        return dense(self.dim, name="w2")(nn.silu(x1) * x3)


def build_and_time(tag):
    from hsimae_tpu.config import preset
    from hsimae_tpu.data.pipeline import MultiScenePatchSource
    from hsimae_tpu.data.windows import build_pretrain_cut_index
    from hsimae_tpu.models.hsimae import build_hsimae, init_model
    from hsimae_tpu.models.masking import grid_shape_candidates
    from hsimae_tpu.train.optim import pretrain_optimizer
    from hsimae_tpu.train.pretrain import TrainState, make_pretrain_step

    cfg = preset("HSIMAE-B", compute_dtype=jnp.bfloat16)
    model = build_hsimae(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = jax.device_get(init_model(model, seed=0)["params"])
    params = jax.device_put(params, jax.devices()[0])
    tx, _ = pretrain_optimizer(5e-4, 5e-2, total_steps=1000)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    scenes = [np.random.default_rng(i).standard_normal(
        (128, 128, cfg.bands)).astype(np.float32) for i in range(4)]
    source = MultiScenePatchSource(scenes, patch_size=cfg.img_size)
    locs = build_pretrain_cut_index([s.shape for s in scenes], cfg.img_size,
                                    coarse_from=2).locs
    lt, ll = grid_shape_candidates(cfg.t_size, cfg.l_size, 0.5)[0]
    step = make_pretrain_step(model)
    rng_np = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    bs = 2048

    def one(_s=[state]):
        sel = rng_np.integers(0, len(locs), bs)
        imgs = source.gather(locs[sel])
        _s[0], loss = step(_s[0], imgs, key, lt, ll)
        return float(loss)

    for _ in range(5):
        one()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            one()
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"{tag}: {best*1e3:.1f} ms/step -> {bs/best:,.0f} patches/s",
          flush=True)
    return best


def main():
    t_fused = build_and_time("fused (library default)")
    from hsimae_tpu.models import hsimae as hsimae_mod

    # Block looks the classes up in layers' namespace at call time; hsimae.py
    # also imports Attention by name — patch both bindings
    layers.Attention, layers.SwiGLU = UnfusedAttention, UnfusedSwiGLU
    hsimae_mod.Attention = UnfusedAttention
    t_unfused = build_and_time("unfused control")
    print(f"speedup fused vs unfused: {t_unfused/t_fused:.3f}x", flush=True)


if __name__ == "__main__":
    main()
