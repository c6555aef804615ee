"""True multi-process data parallelism: 2 `jax.distributed` CPU processes.

Closes VERDICT r2 weak #4: `shard_batch`'s multihost path
(`process_local_slice` + `jax.make_array_from_process_local_data`,
`hsimae_tpu/parallel/mesh.py:56-90`) had only been exercised in
single-process/forced-flag degenerate modes. Here two real processes
coordinate through `jax.distributed.initialize` (gloo CPU collectives), each
contributes 2 virtual CPU devices to a 4-device global mesh, each feeds ONLY
its `process_local_slice` of the deterministic global batch, and the
all-reduced dual-branch training-step loss must match a single-process run of
the same global batch (the reference has no distributed support at all;
SURVEY.md §2.6 makes DP first-class in this framework).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle/multi-process tier (VERDICT r04 item 7)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(f"127.0.0.1:{{port}}", num_processes=nproc,
                           process_id=pid)
import jax.numpy as jnp
import numpy as np
from hsimae_tpu.config import preset
from hsimae_tpu.models.hsimae import build_dual_vit, init_model
from hsimae_tpu.parallel.mesh import make_mesh, process_local_slice, shard_batch, replicate
from hsimae_tpu.train.finetune import TrainState, make_dual_step
from hsimae_tpu.train.optim import finetune_optimizer

assert jax.process_count() == nproc and len(jax.devices()) == 4

cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
             embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2)
model = build_dual_vit(cfg, 4)
params = init_model(model, seed=0)["params"]  # deterministic: same on both
tx, _ = finetune_optimizer(1e-3, 1e-3, epochs=2, steps_per_epoch=2)

rng = np.random.default_rng(1)  # every process computes the SAME global batch
x = rng.uniform(size=(8, 9, 9, 32)).astype(np.float32)
xu = rng.uniform(size=(8, 9, 9, 32)).astype(np.float32)
y = np.asarray([1, 2, 3, 1, 2, 3, 1, 2], np.int32)
w = np.ones(8, np.float32)

mesh = make_mesh()  # 4 global devices, data=4
sl = process_local_slice(8)
xs, xus = shard_batch((x[sl], xu[sl]), mesh)  # multihost assembly path
st = replicate(TrainState.create(apply_fn=model.apply, params=params, tx=tx), mesh)
step = make_dual_step(model, lamda=10.0, flip_augment=False)
st, loss, rec, logits = step(st, xs, jnp.asarray(y), jnp.asarray(w), xus,
                             jnp.asarray(w), jax.random.PRNGKey(3), 2, 4)
print(f"LOSS {{float(loss):.10f}}", flush=True)
jax.distributed.shutdown()
""".format(repo=REPO)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_loss_matches_single_process(tmp_path):
    import jax
    import jax.numpy as jnp

    # expected: the same global batch, single process, no sharding
    from hsimae_tpu.config import preset
    from hsimae_tpu.models.hsimae import build_dual_vit, init_model
    from hsimae_tpu.train.finetune import TrainState, make_dual_step
    from hsimae_tpu.train.optim import finetune_optimizer

    cfg = preset("HSIMAE-S", depth=2, s_depth=1, decoder_depth=1,
                 embed_dim=32, num_heads=2, decoder_dim=16, decoder_num_heads=2)
    model = build_dual_vit(cfg, 4)
    params = init_model(model, seed=0)["params"]
    tx, _ = finetune_optimizer(1e-3, 1e-3, epochs=2, steps_per_epoch=2)
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(8, 9, 9, 32)).astype(np.float32)
    xu = rng.uniform(size=(8, 9, 9, 32)).astype(np.float32)
    y = jnp.asarray([1, 2, 3, 1, 2, 3, 1, 2], jnp.int32)
    w = jnp.ones(8, jnp.float32)
    st = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_dual_step(model, lamda=10.0, flip_augment=False)
    _, expected, _, _ = step(st, jnp.asarray(x), y, w, jnp.asarray(xu), w,
                             jax.random.PRNGKey(3), 2, 4)
    expected = float(expected)

    port = _free_port()
    script = tmp_path / "dp_child.py"
    script.write_text(CHILD)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=2")
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), "2", str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for p in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=600)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:{out}\nstderr:{err}"
    losses = []
    for rc, out, err in outs:
        for line in out.splitlines():
            if line.startswith("LOSS "):
                losses.append(float(line.split()[1]))
    assert len(losses) == 2, outs
    # both processes see the same replicated loss, equal to the 1-process run
    assert abs(losses[0] - losses[1]) < 1e-6
    assert abs(losses[0] - expected) < 1e-4, (losses, expected)
