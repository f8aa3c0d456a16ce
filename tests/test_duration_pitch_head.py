"""Duration/pitch predictor head activation (dead-ReLU regression).

The reference head is Dense(1)→ReLU (naturalspeech2_pytorch.py:466). Under
an L1 loss whose targets include zeros (the reference's unmasked duration
loss, :1587), the pre-activation can be driven negative everywhere — at
which point ReLU's gradient is exactly 0 and the predictor is permanently
dead (observed in a 20k-step run: duration_pred ≡ 0, loss frozen).
head_activation="softplus" keeps a gradient everywhere with the same
non-negative output contract and identical parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np

from naturalspeech2_tpu.models.encoders import DurationPitchPredictor


def _tiny(head_activation):
    return DurationPitchPredictor(
        dim=8, num_phoneme_tokens=12, dim_encoded_prompts=8, dim_hidden=8,
        depth=1, heads=2, dim_head=4, dropout=0.0,
        head_activation=head_activation,
    )


def _grad_norm(head_activation):
    dp = _tiny(head_activation)
    ids = jnp.array([[1, 2, 3, 4]])
    prompts = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8))
    params = dp.init(jax.random.PRNGKey(1), ids, prompts)["params"]
    # force the head pre-activation negative for every position: the state
    # a few unmasked-L1 steps produce in practice
    params = jax.tree_util.tree_map(lambda x: x, params)  # copy
    for trunk in ("to_duration_pred", "to_pitch_pred"):
        params[trunk]["to_pred"]["bias"] = jnp.full_like(
            params[trunk]["to_pred"]["bias"], -10.0
        )

    def loss(p):
        d, pi = dp.apply({"params": p}, ids, prompts)
        target = jnp.full_like(d, 4.0)
        return jnp.abs(d - target).mean() + jnp.abs(pi - target).mean()

    g = jax.grad(loss)(params)
    return sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))


def test_relu_head_is_dead_when_preactivation_negative():
    assert _grad_norm("relu") == 0.0  # documents the reference trap


def test_softplus_head_keeps_gradient():
    assert _grad_norm("softplus") > 0.0


def test_softplus_output_nonnegative():
    dp = _tiny("softplus")
    ids = jnp.array([[1, 2, 3, 4]])
    prompts = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 8))
    params = dp.init(jax.random.PRNGKey(1), ids, prompts)["params"]
    d, pi = dp.apply({"params": params}, ids, prompts)
    assert np.asarray(d).min() >= 0.0 and np.asarray(pi).min() >= 0.0
    assert d.shape == pi.shape == (1, 4)
