"""Baseline model zoo: JAX/flax re-implementations of the reference's 10
compared methods (`/root/reference/Compared_Methods/`), plus SVM-RBF.

All conv/transformer models take channels-last ``[B, h, w, bands]`` input and
a ``train`` flag; dropout uses the ``'dropout'`` rng; BatchNorm stats live in
the ``batch_stats`` collection.
"""

from hsimae_tpu.models.baselines.ssrn import SSRN
from hsimae_tpu.models.baselines.ssftt import SSFTT
from hsimae_tpu.models.baselines.spectralformer import SpectralFormer
from hsimae_tpu.models.baselines.dbda import DBDA
from hsimae_tpu.models.baselines.fdssc import FDSSC
from hsimae_tpu.models.baselines.rssan import RSSAN
from hsimae_tpu.models.baselines.hybridformer import HybridFormer
from hsimae_tpu.models.baselines.gscvit import GSCViT
from hsimae_tpu.models.baselines.hit import HiT
from hsimae_tpu.models.baselines.dctn import DCTN
from hsimae_tpu.models.baselines.svm_rbf import SVMRBF

__all__ = [
    "SSRN", "SSFTT", "SpectralFormer", "DBDA", "FDSSC", "RSSAN",
    "HybridFormer", "GSCViT", "HiT", "DCTN", "SVMRBF",
]
