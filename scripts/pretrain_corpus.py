"""MAE-pretrain HSIMAE-S on a synthetic multi-scene corpus for the protocol
demo (the published HSIHybrid corpus is not available in this image).

Writes params to /tmp/pt_s/params_final.msgpack.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_session import ensure_fast_session  # noqa: E402

ensure_fast_session()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from hsimae_tpu.cli.pretrain import main  # noqa: E402

if __name__ == "__main__":
    main([
        "--synthetic", "--synthetic-scenes", "6", "--synthetic-size", "64",
        "--model", "HSIMAE-S", "--bf16",
        "--epochs", os.environ.get("HSIMAE_PT_EPOCHS", "40"),
        "--batch-size", "512", "--workdir", "/tmp/pt_s",
        "--coarse-from", "4",
    ])
