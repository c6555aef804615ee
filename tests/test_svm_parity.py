"""SVM-RBF two-stage grid-search parity vs the reference as oracle.

`/root/reference/Compared_Methods/svm_rbf.py` cannot be imported directly (it
runs a full Salinas experiment at module level with Windows paths), so the
oracle class is loaded by exec'ing the file prefix up to the experiment code,
with its `Compared_Experiment` imports stubbed.

The selected (C, gamma) depends on the stratified val split, whose RNG stream
(legacy np.random vs our Generator) cannot match; the oracle's actual splits
are therefore RECORDED (by wrapping the real `Utils.Preprocessing.spilt_dataset`)
and REPLAYED into our implementation. What the test then pins exactly:
the coarse grid (C in 2^{-3..9 step 2}, gamma in 2^{-5..3 step 2}), the fine
grid (best * 2^{-1.75..1.75 step 0.25}), the itertools.product visit order,
strict-improvement tie handling, the oa+aa+kappa selection score, and the
final refit on the train half (`svm_rbf.py:25-67`).
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/multi-process tier (VERDICT r04 item 7)

pytest.importorskip("sklearn")
torch = pytest.importorskip("torch")  # Utils imports are torch-adjacent

sys.path.insert(0, "/root/reference")

from hsimae_tpu.models.baselines import svm_rbf as ours_mod


def _load_oracle_class(recorded_splits):
    """Exec the reference svm_rbf class with stubbed experiment imports and a
    split recorder; returns the class object."""
    from Utils.Preprocessing import spilt_dataset as real_split

    def recording_split(data, label, training_ratio=0.8):
        out = real_split(data, label, training_ratio=training_ratio)
        recorded_splits.append(out)
        return out

    stub = types.ModuleType("Compared_Experiment")
    stub.get_data_path = lambda *a, **k: (None, None)
    stub.data_trans = lambda *a, **k: None
    stub.get_data_set = lambda *a, **k: None
    stub.label_to_colormap = lambda *a, **k: None
    stub.spilt_dataset = recording_split
    saved = sys.modules.get("Compared_Experiment")
    sys.modules["Compared_Experiment"] = stub
    try:
        src = open("/root/reference/Compared_Methods/svm_rbf.py").read()
        src = src.split("\nseeds = [")[0]  # drop the module-level experiment
        ns = {}
        exec(compile(src, "ref_svm_rbf", "exec"), ns)
    finally:
        if saved is None:
            del sys.modules["Compared_Experiment"]
        else:
            sys.modules["Compared_Experiment"] = saved
    return ns["svm_rbf"]


def _fixture(seed=7, n_per_class=16, n_classes=3, dim=6):
    """Overlapping Gaussian classes: selection is non-degenerate (different
    (C, gamma) cells genuinely score differently on the val half)."""
    rng = np.random.default_rng(seed)
    xs, ys = [], []
    for c in range(n_classes):
        mu = rng.standard_normal(dim) * 1.2
        xs.append(mu + rng.standard_normal((n_per_class, dim)) * 1.0)
        ys.append(np.full(n_per_class, c + 1))
    x = np.concatenate(xs).astype(np.float64)
    y = np.concatenate(ys).astype(np.int64)
    p = rng.permutation(len(y))
    return x[p], y[p]


def test_two_stage_grid_selects_reference_c_gamma():
    x, y = _fixture()
    recorded = []
    oracle_cls = _load_oracle_class(recorded)

    np.random.seed(0)
    ref = oracle_cls(seed=42)
    ref.train(x, y)
    assert len(recorded) == 2  # one split per stage

    # replay the oracle's splits into our implementation, as index tuples
    row_to_idx = {xi.tobytes(): i for i, xi in enumerate(x)}
    replays = []
    for tr_d, tr_y, va_d, va_y in recorded:
        tr_i = np.array([row_to_idx[np.asarray(d).tobytes()] for d in tr_d])
        va_i = np.array([row_to_idx[np.asarray(d).tobytes()] for d in va_d])
        replays.append((tr_i, np.asarray(tr_y), va_i, np.asarray(va_y)))
    it = iter(replays)
    orig = ours_mod.train_val_split
    ours_mod.train_val_split = lambda idx, labels, ratio, rng=None: next(it)
    try:
        model = ours_mod.SVMRBF(seed=42)
        model.train(x, y)
    finally:
        ours_mod.train_val_split = orig

    assert model.best_c == ref.best_est.C, (model.best_c, ref.best_est.C)
    assert model.best_gamma == ref.best_est.gamma

    # the refit estimators must agree everywhere, not just on hyperparams
    probe = np.random.default_rng(1).standard_normal((64, x.shape[1]))
    np.testing.assert_array_equal(model.best_est.predict(probe),
                                  ref.best_est.predict(probe))
