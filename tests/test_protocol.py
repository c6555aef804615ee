"""The multi-seed selection/test protocol end-to-end at micro scale."""

import numpy as np

from hsimae_tpu.config import EvalConfig, FinetuneConfig, ProtocolConfig, preset
from hsimae_tpu.data.synthetic import make_synthetic_scene
from hsimae_tpu.train.protocol import run_protocol


def test_run_protocol_micro():
    scene, gt = make_synthetic_scene(20, 20, bands=40, n_classes=3, seed=4)
    cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
                 embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2)
    proto = ProtocolConfig(lr_grid=(1e-3, 1e-4), selection_seeds=1, test_seeds=2)
    ft = FinetuneConfig(epochs=2, batch_size=8)
    res = run_protocol(scene, gt, cfg, ft, proto, EvalConfig(),
                       samples_per_class=5, gwpca=True, verbose=False)
    assert res.best_lr in (1e-3, 1e-4)
    assert set(res.selection_scores) == {1e-3, 1e-4}
    assert len(res.test_metrics) == 2
    assert 0.0 <= res.oa_mean <= 1.0
    assert res.per_class_mean.shape[0] >= 3 - 1  # aligned per-class accuracies
    assert np.isfinite(res.oa_std)
