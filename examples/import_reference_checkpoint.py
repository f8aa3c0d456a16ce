"""Port a reference (lucidrains/naturalspeech2-pytorch) checkpoint and sample.

Demonstrates the migration path for users of the reference:

1. a reference `NaturalSpeech2` torch checkpoint (here: the actual
   reference package built with random weights and `torch.save`d — swap
   in your trained `results/model-<N>.pt`)
2. `load_torch_checkpoint` reads the `.pt` zip WITHOUT torch (restricted
   unpickler → numpy)
3. `naturalspeech2_params_from_torch` maps the state_dict onto the flax
   trees (architecture inferred from the keys)
4. the repo's `sample()` generates latents that match the reference's
   own sampler bit-for-bit-ish (<1e-6 MSE; tests/test_golden_full_forward.py)

Run: PYTHONPATH=. python examples/import_reference_checkpoint.py
(needs torch for step 1 only — the import itself is torch-free).
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests" / "golden"))

import jax
import jax.numpy as jnp
import numpy as np


def make_reference_checkpoint(path):
    """Build the ACTUAL reference torch model (tiny config) and save the
    Trainer-format checkpoint dict. Stands in for a user's trained file."""
    import refload

    if not refload.reference_available():
        return None
    import torch

    REF = refload.load_reference()
    torch.manual_seed(0)
    model = REF.ns2.Model(
        dim=32, depth=2, heads=2, dim_head=16, ff_mult=4,
        wavenet_layers=2, wavenet_stacks=2, dim_prompt=24, num_latents_m=4,
        resampler_depth=1, condition_on_prompt=True, use_flash_attn=False,
    )
    torch.save({"model": {f"model.{k}": v for k, v in model.state_dict().items()},
                "step": 0}, path)
    return model


def main():
    from naturalspeech2_tpu.models.denoiser import Model, forward_with_cond_scale
    from naturalspeech2_tpu.utils import torch_import as ti

    ckpt = Path(tempfile.mkdtemp()) / "model-0.pt"
    ref_model = make_reference_checkpoint(ckpt)
    if ref_model is None:
        print("reference/torch not available — nothing to demonstrate here")
        return

    # --- torch-free import ------------------------------------------------
    sd = ti.load_torch_checkpoint(ckpt)
    model_sd = {k[len("model.model."):]: v for k, v in sd.items()
                if k.startswith("model.model.")}
    params = ti.model_params_from_torch(model_sd)

    model = Model(
        dim=32, depth=2, heads=2, dim_head=16, wavenet_layers=2,
        wavenet_stacks=2, dim_prompt=24, num_latents_m=4, resampler_depth=1,
        condition_on_prompt=True, use_flash_attn=False,
        use_fused_wavenet=False, gelu_approximate=False,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 48, 32).astype(np.float32))
    times = jnp.asarray([0.3, 0.8], jnp.float32)
    prompt = jnp.asarray(rng.randn(2, 11, 24).astype(np.float32))
    cond = jnp.asarray(rng.randn(2, 37, 24).astype(np.float32))

    out = forward_with_cond_scale(
        model, {"params": params}, x, times, prompt=prompt, cond=cond,
        cond_scale=2.0,
    )

    # --- cross-check against the torch forward ---------------------------
    import torch

    with torch.no_grad():
        ref = ref_model.forward_with_cond_scale(
            torch.from_numpy(np.asarray(x)), torch.from_numpy(np.asarray(times)),
            prompt=torch.from_numpy(np.asarray(prompt)),
            cond=torch.from_numpy(np.asarray(cond)).permute(0, 2, 1),
            cond_scale=2.0,
        )
    diff = float(np.max(np.abs(np.asarray(out) - ref.numpy())))
    print(f"imported checkpoint CFG forward max|Δ| vs torch: {diff:.2e}")
    assert diff < 1e-4
    print("reference checkpoint ported: OK")


if __name__ == "__main__":
    main()
