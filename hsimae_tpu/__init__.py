"""HSIMAE-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework for masked-autoencoder
pretraining and few-shot classification of hyperspectral images (HSI).

Re-implements, TPU-first, the full capability surface of the reference
PyTorch research codebase Ryan21wy/HSIMAE (see /root/reference):

* GroupWise-PCA spectral reduction           -> :mod:`hsimae_tpu.data.gwpca`
* scene -> 9x9x32 patch pipelines            -> :mod:`hsimae_tpu.data`
* separable spatial/spectral MAE (HSIMAE)    -> :mod:`hsimae_tpu.models`
* dual-branch fine-tuning (DualViT)          -> :mod:`hsimae_tpu.models`
* full-scene sliding-window inference        -> :mod:`hsimae_tpu.train.evaluate`
* baseline model zoo + benchmark harness     -> :mod:`hsimae_tpu.models.baselines`
* data/tensor parallel scale-out over a mesh -> :mod:`hsimae_tpu.parallel`
* Pallas fused kernels for the hot blocks    -> :mod:`hsimae_tpu.ops`
* AOT serving artifacts (jax.export)         -> :mod:`hsimae_tpu.serving`
"""

from hsimae_tpu.version import __version__

__all__ = ["__version__"]
