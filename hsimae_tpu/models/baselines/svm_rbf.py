"""SVM-RBF baseline: two-stage grid search on (C, gamma), 1x1-pixel spectra.

Behavioral re-implementation of
`/root/reference/Compared_Methods/svm_rbf.py:19-93`:

1. coarse grid: C in 2^{-3,-1,...,9}, gamma in 2^{-5,-3,...,3},
2. fine grid around the coarse optimum: factors 2^{-1.75..1.75} step 0.25,
3. selection metric = OA + AA + kappa on a 50/50 stratified val split,
4. final fit on the train half with the best (C, gamma).

sklearn runs on host — this baseline has no accelerator path by design.
"""

from __future__ import annotations

import itertools
from typing import Optional, Tuple

import numpy as np

from hsimae_tpu.data.sampling import train_val_split
from hsimae_tpu.utils.metrics import classification_metrics


class SVMRBF:
    def __init__(self, seed: int = 42):
        self.name = "SVM_RBF"
        self.best_est = None
        self.seed = seed
        self.best_c = None
        self.best_gamma = None

    def _select(self, x, y, cs, gs, rng) -> Tuple[object, float, float]:
        from sklearn.svm import SVC

        idx = np.arange(len(x))
        tr_i, tr_y, va_i, va_y = train_val_split(idx, y, 0.5, rng=rng)
        best = (None, 0.0, 0.0, -1.0)
        for c, g in itertools.product(cs, gs):
            svm = SVC(C=c, gamma=g, kernel="rbf", random_state=self.seed)
            svm.fit(x[tr_i], tr_y)
            pred = svm.predict(x[va_i])
            m = classification_metrics(va_y, pred)
            score = m.oa + m.aa + m.kappa
            if score > best[3]:
                best = (svm, c, g, score)
        from sklearn.svm import SVC as _SVC

        svm = _SVC(C=best[1], gamma=best[2], kernel="rbf")
        svm.fit(x[tr_i], tr_y)
        return svm, best[1], best[2]

    def train(self, x: np.ndarray, y: np.ndarray, rng=None):
        rng = rng or np.random.default_rng(self.seed)
        cs = [2.0**i for i in range(-3, 10, 2)]
        gs = [2.0**i for i in range(-5, 4, 2)]
        _, c0, g0 = self._select(x, y, cs, gs, rng)
        fine = np.arange(-1.75, 2.0, 0.25)
        cs = [c0 * 2.0**i for i in fine]
        gs = [g0 * 2.0**i for i in fine]
        self.best_est, self.best_c, self.best_gamma = self._select(x, y, cs, gs, rng)
        return self

    def predict_scene(self, scene: np.ndarray) -> np.ndarray:
        h, w, c = scene.shape
        return self.best_est.predict(scene.reshape(-1, c)).reshape(h, w)

    def test(self, scene: np.ndarray, test_gt: np.ndarray):
        pred = self.predict_scene(scene)
        return classification_metrics(test_gt, pred), pred
