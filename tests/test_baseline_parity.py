"""Converted-weights logits parity for the baseline zoo vs the torch oracle.

Each test builds the reference torch model from
`/root/reference/Compared_Methods/` (read-only oracle, never copied), converts
its state_dict through `hsimae_tpu.models.baselines.convert`, and asserts the
flax re-implementation produces the same eval logits. This pins the
quirk-heavy models (SSFTT dim**-0.5 scale, SpectralFormer CAF skipcat, SSRN
double activation, RSSAN conv1-twice/ssa1-reuse) numerically, not just by
output shape.
"""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/multi-process tier (VERDICT r04 item 7)

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")


def _install_timm_stub():
    """HiT/DCTN import timm (not in this image) for DropPath/trunc_normal_/
    register_model only; provide minimal equivalents so the oracle loads."""
    import types

    if "timm" in sys.modules:
        return
    timm = types.ModuleType("timm")
    data = types.ModuleType("timm.data")
    data.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    data.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):  # eval-mode identity is all parity tests need
            if not self.training or not self.drop_prob:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.floor(keep + torch.rand(shape, dtype=x.dtype))
            return x / keep * mask

    layers.DropPath = DropPath
    layers.trunc_normal_ = torch.nn.init.trunc_normal_
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda f: f
    models.layers = layers
    models.registry = registry
    timm.data = data
    timm.models = models
    sys.modules.update({
        "timm": timm, "timm.data": data, "timm.models": models,
        "timm.models.layers": layers, "timm.models.registry": registry,
    })


_install_timm_stub()

import jax
import jax.numpy as jnp

from hsimae_tpu.checkpoints.io import partial_restore
from hsimae_tpu.models import baselines as zoo
from hsimae_tpu.models.baselines import convert as cvt


def _load_full(model, x_hwc, converted):
    """Init flax variables, restore EVERY leaf from the converted tree, and
    return the restored variables (asserting full coverage)."""
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x_hwc, False,
    )
    out = {}
    for col in vs:
        src = converted.get(col)
        assert src is not None, f"converter produced no '{col}' collection"
        restored, loaded, skipped = partial_restore(vs[col], src, verbose=False)
        n = len(jax.tree_util.tree_leaves(vs[col]))
        assert len(loaded) == n, (
            f"{col}: loaded {len(loaded)}/{n} leaves; unmapped source: {skipped}"
        )
        assert not skipped, f"{col}: converter produced unknown leaves {skipped}"
        out[col] = restored
    return out


def _assert_logits_match(tm, jm, converted, bands, ps, rtol=2e-4, atol=2e-4):
    tm.eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, bands, ps, ps)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    x_hwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    vs = _load_full(jm, x_hwc, converted)
    ours = np.asarray(jm.apply(vs, x_hwc, False))
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol)


def test_ssftt_logits_match_reference():
    from Compared_Methods.SSFTT import SSFTTnet

    # harness config (`/root/reference/Compared_Experiment.py:373`); bands=30
    # is baked into the reference (in-channels kennel_3D*28, `SSFTT.py:125`)
    tm = SSFTTnet(1, 10, kennel_3D=8, kennel_2D=64, num_tokens=4, dim=64, heads=4)
    jm = zoo.SSFTT(num_classes=10, kernel_3d=8, kernel_2d=64, num_tokens=4,
                   dim=64, heads=4)
    _assert_logits_match(tm, jm, cvt.convert_ssftt(tm.state_dict(), kernel_3d=8),
                         bands=30, ps=13)


def test_spectralformer_logits_match_reference():
    from Compared_Methods.SpectralFormer import ViT

    # harness config shape (`Compared_Experiment.py:383`), 40 bands for speed
    tm = ViT(7, 3, 40, 10, dim=64, depth=5, heads=4, mlp_dim=8,
             dropout=0.1, emb_dropout=0.1, mode="CAF")
    jm = zoo.SpectralFormer(image_size=7, near_band=3, num_bands=40,
                            num_classes=10, dim=64, depth=5, heads=4,
                            mlp_dim=8, dim_head=16)
    _assert_logits_match(tm, jm, cvt.convert_spectralformer(tm.state_dict()),
                         bands=40, ps=7)


def test_ssrn_logits_match_reference():
    from Compared_Methods.SSRN import SSRN as RefSSRN

    tm = RefSSRN(30, 6)
    jm = zoo.SSRN(bands=30, num_classes=6)
    _assert_logits_match(tm, jm, cvt.convert_ssrn(tm.state_dict()),
                         bands=30, ps=7)


def test_dbda_logits_match_reference():
    from Compared_Methods.DBDA import DBDA as RefDBDA

    tm = RefDBDA(30, 6)
    jm = zoo.DBDA(bands=30, num_classes=6)
    _assert_logits_match(tm, jm, cvt.convert_dbda(tm.state_dict()),
                         bands=30, ps=9)


def test_fdssc_logits_match_reference():
    from Compared_Methods.FDSSC import FDSSC_f

    tm = FDSSC_f(30, 6)
    jm = zoo.FDSSC(bands=30, num_classes=6)
    _assert_logits_match(tm, jm, cvt.convert_fdssc(tm.state_dict()),
                         bands=30, ps=9)


def test_hybridformer_logits_match_reference():
    from Compared_Methods.HybridFormer import HybridFormer as RefHF

    # harness config shape (`Compared_Experiment.py:357-366`), 30 bands
    tm = RefHF(image_size=15, patch_size=(3, 5), num_classes=6, dim=100,
               depth=2, heads=4, mlp_dim=2048, channels=30,
               dropout=0.2, emb_dropout=0.2)
    jm = zoo.HybridFormer(image_size=15, patch_sizes=(3, 5), num_classes=6,
                          dim=100, depth=2, heads=4, dim_head=64, channels=30,
                          dropout=0.2, emb_dropout=0.2)
    _assert_logits_match(tm, jm, cvt.convert_hybridformer(tm.state_dict()),
                         bands=30, ps=15)


def test_gscvit_logits_match_reference():
    from Compared_Methods.GSCViT import GSCViT as RefGSCViT

    tm = RefGSCViT(num_classes=6, channels=32, heads=(1, 1, 1), depth=(1, 1, 1),
                   group_spatial_size=[4, 4, 4], dropout=0.1, padding=[1, 1, 1],
                   dims=(256, 128, 64), num_groups=[16, 16, 16])
    jm = zoo.GSCViT(num_classes=6, channels=32, heads=(1, 1, 1), depth=(1, 1, 1),
                    group_spatial_size=(4, 4, 4), dropout=0.1, padding=(1, 1, 1),
                    dims=(256, 128, 64), num_groups=(16, 16, 16))
    _assert_logits_match(tm, jm, cvt.convert_gscvit(tm.state_dict()),
                         bands=32, ps=8)


def test_hit_logits_match_reference():
    from Compared_Methods.HiT import HiT as RefHiT

    # bands=30, img=15 make the patch-embed fold (8 * D'') equal embed_dim
    # 64, matching the reference's implicit dimensioning (it has no
    # projection between patch embed and stage 0)
    layers, dims, trans = (1, 1, 1, 1), (64, 64, 64, 64), (False, True, False, False)
    tm = RefHiT(layers=list(layers), img_size=15, num_classes=6,
                embed_dims=list(dims), transitions=list(trans),
                segment_dim=[8, 8, 4, 4], mlp_ratios=[3, 3, 3, 3],
                qkv_bias=False, drop_rate=0.1, attn_drop_rate=0.1,
                drop_path_rate=0.1)
    jm = zoo.HiT(bands=30, num_classes=6, layers=layers, embed_dims=dims,
                 transitions=trans, segment_dim=(8, 8, 4, 4),
                 mlp_ratios=(3.0, 3.0, 3.0, 3.0))
    _assert_logits_match(
        tm, jm, cvt.convert_hit(tm.state_dict(), layers, trans, dims),
        bands=30, ps=15)


def test_dctn_logits_match_reference():
    from Compared_Methods.DCTN import DCTN as RefDCTN

    # harness PaviaU shape (`Compared_Experiment.py:439-441`) at patch 15,
    # 33 bands (exercises the replication pad: new_bands=35), 1 block/stage
    layers, dims, trans = (1, 1, 1, 1), (320, 320, 512, 512), (False, True, False, False)
    tm = RefDCTN(list(layers), num_classes=6, embed_dims=list(dims),
                 transitions=list(trans), segment_dim=[8, 8, 4, 4],
                 mlp_ratios=[3, 3, 3, 3], dateset="PaviaU")
    # the torch MDCP hardcodes channels=103 per dataset; its pad size derives
    # from that, so feed 103 bands to keep the oracle self-consistent
    jm = zoo.DCTN(layers=layers, bands=103, num_classes=6, embed_dims=dims,
                  transitions=trans, segment_dim=(8, 8, 4, 4),
                  mlp_ratios=(3.0, 3.0, 3.0, 3.0), groups=5, groups_width=64,
                  pool_depth=40)
    _assert_logits_match(
        tm, jm, cvt.convert_dctn(tm.state_dict(), layers, trans, dims),
        bands=103, ps=15)


def test_rssan_logits_match_reference():
    from Compared_Methods.RSSAN import RSSAN as RefRSSAN

    # constructor args per the reference's own comment (`RSSAN.py:77`)
    tm = RefRSSAN(6, 32, 3, 32, 1, 1)
    jm = zoo.RSSAN(bands=32, num_classes=6, features=32)
    _assert_logits_match(tm, jm, cvt.convert_rssan(tm.state_dict()),
                         bands=32, ps=7)
