"""Deployment/serving: AOT-exported classifier artifacts.

The reference deploys by shipping a ``.pkl`` state_dict plus the model
source and re-running the eval section of ``Model_Finetuning.py:243-301``.
Here deployment is a single self-contained artifact: the classifier forward
is AOT-lowered with :mod:`jax.export` to serialized StableHLO at a fixed set
of batch buckets (static shapes — the TPU/XLA serving discipline), bundled
with the trained params and the model metadata in one msgpack file. The
artifact loads and runs without flax or the model source, on any host with
jax (CPU or TPU — both platforms are lowered in), with jax.export's
cross-version compatibility guarantees.
"""

from hsimae_tpu.serving.export import (
    ExportedClassifier,
    export_classifier,
    export_flax_classifier,
    load_classifier,
)

__all__ = ["ExportedClassifier", "export_classifier",
           "export_flax_classifier", "load_classifier"]
