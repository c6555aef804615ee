"""Golden tests for the data layer: GWPCA vs sklearn, window geometry vs the
reference's divisor-stride semantics, sampler invariants, device patch gather
vs numpy slicing."""

import numpy as np
import pytest

from hsimae_tpu.data import (
    apply_gwpca,
    pca_fit_transform,
    split_band_groups,
    window_starts,
    patch_grid_indices,
    sample_per_class,
    train_val_split,
    dual_scene_split,
    make_synthetic_scene,
    ScenePatchSource,
    MultiScenePatchSource,
    augment_flips,
)
from hsimae_tpu.data.windows import build_pretrain_cut_index


# ------------------------------- GWPCA ------------------------------------


def test_split_band_groups_odd_nesting():
    # c=103, group=4 -> recursive halving: 103 -> 51|52 -> 25|26|26|26
    spans = split_band_groups(103, 4)
    widths = [b - a for a, b in spans]
    assert widths == [25, 26, 26, 26]
    assert spans[0][0] == 0 and spans[-1][1] == 103


def test_pca_matches_sklearn_full_solver():
    sk = pytest.importorskip("sklearn.decomposition")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 24))  # n <= 500 -> sklearn 'full' solver
    ours = pca_fit_transform(x, 8, whiten=True)
    ref = sk.PCA(n_components=8, whiten=True, random_state=42).fit_transform(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-8)


def test_pca_matches_sklearn_randomized_solver():
    sk = pytest.importorskip("sklearn.decomposition")
    rng = np.random.default_rng(1)
    # n > 500 and k < 0.8 * f -> sklearn auto picks 'randomized'
    x = rng.normal(size=(3000, 30)) @ rng.normal(size=(30, 30))
    ours = pca_fit_transform(x, 8, whiten=True)
    ref = sk.PCA(n_components=8, whiten=True, random_state=42).fit_transform(x)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-5)


def test_gwpca_matches_reference_recipe():
    """apply_gwpca == global min-max norm + per-group sklearn PCA, concat."""
    sk = pytest.importorskip("sklearn.decomposition")
    scene, _ = make_synthetic_scene(30, 25, bands=103, seed=3)
    ours = apply_gwpca(scene, nc=32, group=4)
    assert ours.shape == (30, 25, 32)

    x = scene.reshape(-1, 103).astype(np.float64)
    x = (x - x.min()) / (x.max() - x.min())
    outs = []
    for a, b in split_band_groups(103, 4):
        outs.append(
            sk.PCA(n_components=8, whiten=True, random_state=42).fit_transform(x[:, a:b])
        )
    ref = np.concatenate(outs, -1).reshape(30, 25, 32)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


# ------------------------------ windows ------------------------------------


def test_window_starts_divisor_semantics():
    # stride is a divisor: step = size // stride; last window clamped flush.
    s = window_starts(100, 9, 1)  # non-overlapping
    assert s[0] == 0 and s[-1] == 91
    assert all(np.diff(s)[:-1] == 9)
    s3 = window_starts(100, 9, 3)  # step 3
    assert all(np.diff(s3)[:-1] == 3) and s3[-1] == 91
    pp = window_starts(100, 9, 9)  # per-pixel
    np.testing.assert_array_equal(pp[:-1], np.arange(0, 91, 1)[:-0 or None][: len(pp) - 1])
    assert pp[-1] == 91

    # exact divisibility: plain non-overlapping tiling
    s = window_starts(27, 9, 1)
    np.testing.assert_array_equal(s, [0, 9, 18])


def test_per_pixel_grid_covers_all_pixels():
    # padded per-pixel mode: h+2p scene, ps windows, divisor ps -> step 1
    h, w, ps = 17, 13, 9
    grid = patch_grid_indices(h + ps - 1, w + ps - 1, ps, stride=ps)
    assert len(grid) == h * w
    # row-major pixel order
    np.testing.assert_array_equal(grid[:3, 1], [0, 1, 2])
    np.testing.assert_array_equal(grid[::w, 0], np.arange(h))


def test_pretrain_cut_index_policies():
    shapes = [(40, 40, 32)] * 15 + [(30, 30, 32)]
    idx = build_pretrain_cut_index(shapes, patch_size=9, ratio=0.5)
    locs = idx.locs
    # scene 15 (>= coarse_from) uses non-overlapping step-9 windows
    s15 = locs[locs[:, 2] == 15]
    assert len(s15) == len(window_starts(30, 9, 1)) ** 2
    # early scenes use step-3 windows subsampled to ratio
    s0 = locs[locs[:, 2] == 0]
    full = len(window_starts(40, 9, 3)) ** 2
    assert len(s0) == int(full * 0.5)


# ------------------------------ sampling -----------------------------------


def test_textured_scene_pixelwise_uninformative_but_patchwise_separable():
    """make_textured_scene's contract: classes share per-pixel spectral
    marginals (a 1x1-pixel classifier is at chance-with-priors) while 9x9
    patch statistics separate them — the benchmark property HSIMAE's joint
    spatial-spectral design exists to exploit (VERDICT r03 item 3)."""
    from hsimae_tpu.data.synthetic import make_textured_scene

    scene, gt = make_textured_scene(64, 64, bands=60, seed=3407)
    assert scene.shape == (64, 64, 60) and gt.shape == (64, 64)
    assert gt.min() == 0 and gt.max() == 6  # background + 6 classes

    # class-conditional mean spectra coincide (marginal equality): the gap
    # between any two classes is small vs the material contrast
    means = np.stack([scene[gt == k].mean(axis=0) for k in range(1, 7)])
    contrast = float(scene[gt > 0].max() - scene[gt > 0].min())
    gap = float(np.abs(means[:, None] - means[None]).max())
    assert gap < 0.05 * contrast, (gap, contrast)

    # a pixel-level classifier cannot beat predicting the largest class
    sklearn = pytest.importorskip("sklearn")
    from sklearn.svm import SVC

    rng = np.random.default_rng(0)
    X, y = scene[gt > 0], gt[gt > 0]
    idx = rng.permutation(len(X))[:1200]
    svc = SVC(kernel="rbf", C=100, gamma="scale").fit(X[idx[:500]], y[idx[:500]])
    oa = float((svc.predict(X[idx[500:]]) == y[idx[500:]]).mean())
    prior = float(np.bincount(y).max() / len(y))
    assert oa < prior + 0.07, (oa, prior)

    # patch statistics DO separate: stripe orientations have asymmetric
    # gradient energy; the pixel checkerboard maximizes it
    from numpy.lib.stride_tricks import sliding_window_view

    proj = scene.mean(axis=-1)
    sw = sliding_window_view(proj, (9, 9))
    g = gt[4:-4, 4:-4]
    sig = {}
    for k in (1, 3, 4):
        ptch = sw[g == k][:150]
        rd = float(np.abs(np.diff(ptch, axis=1)).mean())
        cd = float(np.abs(np.diff(ptch, axis=2)).mean())
        sig[k] = (rd, cd)
    assert sig[3][0] > sig[3][1] * 1.15  # h-stripes: row-grad >> col-grad
    assert sig[4][1] > sig[4][0] * 1.15  # v-stripes: col-grad >> row-grad
    assert sig[1][0] > sig[3][0]         # pixel checker has the most energy


def test_textured_scene_balanced_cells():
    """cells_per_class: balanced Voronoi layout — every class present with a
    guaranteed cell quota, large texture regions (the shared benchmark
    geometry: 96x96, cells_per_class=2, seed 3407), per-pixel marginal
    equality preserved."""
    from hsimae_tpu.data.synthetic import make_textured_scene

    scene, gt = make_textured_scene(96, 96, bands=40, seed=3407,
                                    cells_per_class=2)
    counts = np.bincount(gt.ravel(), minlength=7)
    assert (counts[1:] > 0).all(), counts  # all 6 classes present

    # large regions: most non-bg pixels have a single-class 9x9 window
    pad = np.pad(gt, 4, mode="symmetric")
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(pad, (9, 9))
    pure = (win == gt[..., None, None]).all(axis=(-1, -2)) & (gt > 0)
    assert pure.sum() / (gt > 0).sum() > 0.5

    # marginal equality still holds in the balanced variant
    means = np.stack([scene[gt == k].mean(axis=0) for k in range(1, 7)])
    contrast = float(scene[gt > 0].max() - scene[gt > 0].min())
    assert float(np.abs(means[:, None] - means[None]).max()) < 0.06 * contrast


def test_sample_per_class_quota_and_testgt():
    _, gt = make_synthetic_scene(48, 48, bands=16, n_classes=5, seed=7)
    rng = np.random.default_rng(0)
    idx, test_gt = sample_per_class(gt.reshape(-1), num=10, rng=rng)
    labels = gt.reshape(-1)[idx]
    assert (labels != 0).all()
    for c in range(1, 6):
        assert (labels == c).sum() == min(10, (gt == c).sum())
    # train pixels zeroed in test_gt, everything else untouched
    assert (test_gt[idx] == 0).all()
    mask = np.ones(gt.size, bool)
    mask[idx] = False
    np.testing.assert_array_equal(test_gt[mask], gt.reshape(-1)[mask])


def test_sample_per_class_exact_population_quirk():
    gt = np.array([1] * 10 + [2] * 50)  # class 1 population == num
    idx, _ = sample_per_class(gt, num=10, rng=np.random.default_rng(0))
    labels = gt[idx]
    assert (labels == 1).sum() == 5  # num - 5 quirk (Preprocessing.py:246-250)
    assert (labels == 2).sum() == 10


def test_train_val_split_stratified():
    labels = np.array([1] * 20 + [2] * 10 + [3] * 30)
    indices = np.arange(60) * 7
    tr_i, tr_l, va_i, va_l = train_val_split(indices, labels, 0.5, np.random.default_rng(1))
    assert len(tr_i) + len(va_i) == 60
    for c in (1, 2, 3):
        assert abs((tr_l == c).sum() - (va_l == c).sum()) <= 1
    # returned indices are drawn from the given pool
    assert set(tr_i) | set(va_i) <= set(indices)


def test_dual_scene_split_shapes():
    scene, gt = make_synthetic_scene(40, 36, bands=64, n_classes=4, seed=5)
    split = dual_scene_split(scene, gt, patch_size=9, num=8, gwpca=True)
    assert split.scene.shape == (40, 36, 32)
    assert split.unlabeled_starts.shape[1] == 2
    assert (split.labels >= 1).all()
    assert split.test_gt.shape == gt.shape
    # every labeled pixel zeroed in test_gt
    assert (split.test_gt.reshape(-1)[split.labeled_index] == 0).all()


# ------------------------------ pipeline -----------------------------------


def test_scene_patch_source_matches_numpy():
    scene, _ = make_synthetic_scene(20, 17, bands=12, seed=2)
    src = ScenePatchSource(scene, patch_size=9)
    padded = np.pad(scene, ((4, 4), (4, 4), (0, 0)), mode="symmetric")
    idx = np.array([0, 5, 17 * 20 - 1, 37])
    got = np.asarray(src.gather_pixels(idx))
    for k, i in enumerate(idx):
        r, c = divmod(i, 17)
        np.testing.assert_allclose(got[k], padded[r : r + 9, c : c + 9, :], rtol=1e-6)

    starts = np.array([[0, 0], [11, 8]])
    got = np.asarray(src.gather_windows(starts))
    np.testing.assert_allclose(got[1], scene[11:20, 8:17, :], rtol=1e-6)


def test_multi_scene_source_norm_and_gather():
    rng = np.random.default_rng(0)
    scenes = [rng.normal(size=(20, 15, 8)).astype(np.float32) for _ in range(3)]
    mins = np.array([s.min() for s in scenes], np.float32)
    maxs = np.array([s.max() for s in scenes], np.float32)
    src = MultiScenePatchSource(scenes, patch_size=9, scene_min=mins, scene_max=maxs)
    locs = np.array([[3, 2, 1], [0, 0, 2], [11, 6, 0]], np.int32)
    got = np.asarray(src.gather(locs))
    for k, (r, c, s) in enumerate(locs):
        want = (scenes[s][r : r + 9, c : c + 9, :] - mins[s]) / (maxs[s] - mins[s])
        np.testing.assert_allclose(got[k], want, rtol=1e-5)


def test_multi_scene_source_bf16_storage_matches_f32():
    """bf16 scene storage (reference-scale corpora: halves HBM + upload)
    gathers must match f32 within bf16 mantissa error, and the OUTPUT stays
    f32 (patches normalize/train in f32 regardless of storage)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    scenes = [rng.normal(size=(20, 15, 8)).astype(np.float32) for _ in range(2)]
    mins = np.array([s.min() for s in scenes], np.float32)
    maxs = np.array([s.max() for s in scenes], np.float32)
    locs = np.array([[3, 2, 1], [0, 0, 0], [11, 6, 0]], np.int32)
    f32 = MultiScenePatchSource(scenes, patch_size=9, scene_min=mins,
                                scene_max=maxs)
    bf16 = MultiScenePatchSource(scenes, patch_size=9, scene_min=mins,
                                 scene_max=maxs, storage_dtype=jnp.bfloat16)
    assert bf16._flat.dtype == jnp.bfloat16
    a, b = f32.gather(locs), bf16.gather(locs)
    assert b.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-2)


def test_augment_flips_are_axis_reversals():
    import jax

    x = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    # p=1: both flips always applied
    y = np.asarray(augment_flips(x, jax.random.key(0), p=1.0))
    np.testing.assert_allclose(y, x[:, ::-1, ::-1, :])
    # p=0: identity
    y = np.asarray(augment_flips(x, jax.random.key(0), p=0.0))
    np.testing.assert_allclose(y, x)


def test_metrics_match_sklearn_with_background_predictions():
    """Background (class-0) predictions must count as wrong, exactly as
    sklearn treats the shifted -1 label (code-review finding: the old
    np.maximum clamp silently converted them into class-1 hits)."""
    import numpy as np
    from sklearn import metrics as sk

    from hsimae_tpu.utils.metrics import classification_metrics

    rng = np.random.default_rng(0)
    y_true = rng.integers(0, 6, 500)
    y_pred = rng.integers(0, 6, 500)  # includes background predictions
    keep = y_true != 0
    yt, yp = y_true[keep] - 1, y_pred[keep] - 1
    m = classification_metrics(y_true, y_pred)
    assert np.isclose(m.oa, sk.accuracy_score(yt, yp))
    assert np.isclose(m.aa, np.mean(sk.recall_score(yt, yp, average=None,
                                                    zero_division=0)))
    assert np.isclose(m.kappa, sk.cohen_kappa_score(yt, yp))
    assert len(m.per_class) == 5  # aligned by class id, bucket dropped


def test_load_dataset_from_original_mat_downloads(tmp_path):
    """The published MATLAB cubes (Salinas_corrected.mat + Salinas_gt.mat
    etc.) load unchanged — no manual .npy conversion, which the reference
    requires (`Compared_Experiment.py:338-351` hard-codes data.npy/gt.npy)."""
    from scipy.io import savemat

    from hsimae_tpu.data.datasets import load_dataset

    base = tmp_path / "PaviaU"
    base.mkdir()
    rng = np.random.default_rng(0)
    scene = rng.standard_normal((20, 16, 103)).astype(np.float32)
    gt = rng.integers(0, 10, (20, 16)).astype(np.float64)  # MATLAB doubles
    savemat(base / "PaviaU.mat", {"paviaU": scene})
    savemat(base / "PaviaU_gt.mat", {"paviaU_gt": gt})

    got_scene, got_gt = load_dataset("PaviaU", root=str(tmp_path))
    np.testing.assert_allclose(got_scene, scene, rtol=1e-6)
    np.testing.assert_array_equal(got_gt, gt.astype(np.int32))
    assert got_gt.dtype == np.int32


def test_load_dataset_mat_single_file_and_npy_priority(tmp_path):
    """One .mat holding both arrays works; a data.npy beside it wins."""
    from scipy.io import savemat

    from hsimae_tpu.data.datasets import load_dataset

    base = tmp_path / "Salinas"
    base.mkdir()
    rng = np.random.default_rng(1)
    scene = rng.standard_normal((12, 10, 204)).astype(np.float32)
    gt = rng.integers(0, 17, (12, 10)).astype(np.uint8)
    savemat(base / "salinas.mat",
            {"salinas_corrected": scene, "salinas_gt": gt})
    got_scene, got_gt = load_dataset("Salinas", root=str(tmp_path))
    np.testing.assert_allclose(got_scene, scene, rtol=1e-6)
    np.testing.assert_array_equal(got_gt, gt)

    npy_scene = scene + 1.0
    np.save(base / "data.npy", npy_scene)
    np.save(base / "gt.npy", gt)
    got_scene2, _ = load_dataset("Salinas", root=str(tmp_path))
    np.testing.assert_allclose(got_scene2, npy_scene, rtol=1e-6)


def test_resolve_mat_scene_rejects_ambiguity(tmp_path):
    from scipy.io import savemat

    from hsimae_tpu.data.datasets import resolve_mat_scene

    base = tmp_path / "d"
    base.mkdir()
    rng = np.random.default_rng(2)
    savemat(base / "a.mat", {"c1": rng.standard_normal((5, 5, 7)),
                             "c2": rng.standard_normal((5, 5, 7))})
    with pytest.raises(FileNotFoundError, match="exactly one 3-D cube"):
        resolve_mat_scene(str(base))
