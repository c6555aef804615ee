from hsimae_tpu.utils.seed import seed_everything, PRNG
from hsimae_tpu.utils.metrics import classification_metrics, Metrics
from hsimae_tpu.utils.colormap import label_to_colormap
from hsimae_tpu.utils.logger import MetricLogger
from hsimae_tpu.utils.early_stop import EarlyStopping

__all__ = [
    "seed_everything",
    "PRNG",
    "classification_metrics",
    "Metrics",
    "label_to_colormap",
    "MetricLogger",
    "EarlyStopping",
]
