"""Progressive distillation for fast few-step sampling.

The reference cites progressive distillation (Salimans & Ho 2022,
arXiv 2202.00512) as future work and never implements it
(`/root/reference/README.md:189-197`); this module implements it
TPU-natively: a student denoiser is trained so ONE of its DDIM steps matches
TWO teacher DDIM steps, and step counts halve per round (N → N/2 → … → 1-4
steps). Everything (two teacher evals + target derivation + student grad)
is one jitted program.

Works directly on the `NaturalSpeech2` denoiser with the v-objective
(the reference default): the target v is derived from the x₀ that makes a
single student step land exactly where the teacher's two half-steps do.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from naturalspeech2_tpu.models.denoiser import Model
from naturalspeech2_tpu.ops.schedules import gamma_to_alpha_sigma
from naturalspeech2_tpu.utils.helpers import safe_div


def _alpha_sigma(gamma_schedule, t, scale):
    return gamma_to_alpha_sigma(gamma_schedule(t), scale)


def _x0_from_v(audio, v, alpha, sigma):
    return alpha * audio - sigma * v


def _v_from_x0(audio, x0, alpha, sigma):
    noise = safe_div(audio - alpha * x0, sigma)
    return alpha * noise - sigma * x0


def _ddim_step(audio, x0, alpha, sigma, alpha_next, sigma_next):
    pred_noise = safe_div(audio - alpha * x0, sigma)
    return x0 * alpha_next + pred_noise * sigma_next


def distillation_loss(
    model: Model,
    student_params,
    teacher_params,
    x_data: jax.Array,
    key: jax.Array,
    *,
    num_student_steps: int,
    gamma_schedule: Callable,
    scale: float = 1.0,
) -> jax.Array:
    """One-step-student vs two-step-teacher consistency loss (v-objective).

    x_data: clean codec latents ``[b, n, d]``.
    """
    b = x_data.shape[0]
    k_t, k_noise = jax.random.split(key)

    # student times on the discrete grid {1/N, 2/N, ..., 1}
    i = jax.random.randint(k_t, (b,), 1, num_student_steps + 1)
    t = i.astype(jnp.float32) / num_student_steps
    t_mid = t - 0.5 / num_student_steps
    t_next = t - 1.0 / num_student_steps

    def pad(v):
        return v[:, None, None]

    alpha_t, sigma_t = map(pad, _alpha_sigma(gamma_schedule, t, scale))
    alpha_m, sigma_m = map(pad, _alpha_sigma(gamma_schedule, t_mid, scale))
    alpha_n, sigma_n = map(pad, _alpha_sigma(gamma_schedule, t_next, scale))

    noise = jax.random.normal(k_noise, x_data.shape, x_data.dtype)
    x_t = alpha_t * x_data + sigma_t * noise

    # two teacher DDIM half-steps (no grad through the teacher)
    def teacher_v(x, times):
        return model.apply(teacher_params, x, times)

    v1 = jax.lax.stop_gradient(teacher_v(x_t, t))
    x0_1 = _x0_from_v(x_t, v1, alpha_t, sigma_t)
    x_mid = _ddim_step(x_t, x0_1, alpha_t, sigma_t, alpha_m, sigma_m)

    v2 = jax.lax.stop_gradient(teacher_v(x_mid, t_mid))
    x0_2 = _x0_from_v(x_mid, v2, alpha_m, sigma_m)
    x_next = _ddim_step(x_mid, x0_2, alpha_m, sigma_m, alpha_n, sigma_n)

    # x̃0 such that ONE student step from (x_t, t) lands at x_next:
    #   x_next = α_n·x̃0 + (σ_n/σ_t)·(x_t − α_t·x̃0)
    denom = alpha_n - safe_div(sigma_n * alpha_t, sigma_t)
    x0_target = safe_div(x_next - safe_div(sigma_n, sigma_t) * x_t, denom)
    v_target = _v_from_x0(x_t, x0_target, alpha_t, sigma_t)
    v_target = jax.lax.stop_gradient(v_target)

    v_student = model.apply(student_params, x_t, t)

    # truncated-SNR weighting w = max(α²/σ², 1)  (arXiv 2202.00512 §4)
    w = jnp.maximum((alpha_t**2) / (sigma_t**2), 1.0)
    return (w * (v_student - v_target) ** 2).mean()


class ProgressiveDistiller:
    """Halve the sampler step count round by round.

    Usage:
        d = ProgressiveDistiller(ns2, teacher_params)
        student_params = d.distill_round(latents_iter, num_student_steps=500,
                                         n_updates=...)
        # then teacher ← student and halve again
    """

    def __init__(
        self,
        ns2,
        teacher_model_params,
        lr: float = 1e-4,
        max_grad_norm: float = 1.0,
    ):
        self.ns2 = ns2
        self.model = ns2.model
        self.teacher_params = teacher_model_params
        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm), optax.adam(lr)
        )

    def distill_round(
        self,
        latent_batches,
        *,
        num_student_steps: int,
        n_updates: int,
        seed: int = 0,
        updates_per_jit: int = 1,
    ):
        """One halving round. ``updates_per_jit > 1`` runs that many
        updates per dispatch under one `lax.scan` (stacked data batches) —
        essential through a high-latency device tunnel where per-call
        dispatch would otherwise dominate the tiny per-update compute."""
        student_params = jax.tree_util.tree_map(
            jnp.copy, self.teacher_params
        )  # student initialised from teacher
        opt_state = self.optimizer.init(student_params)

        # teacher_params is a jit ARGUMENT, not a closure: closed-over
        # params embed as HLO literals (hundreds of MB at real scale — the
        # same constant-embedding failure bench.py documents) and would
        # also force a re-trace every halving round
        # `do` masks padded tail steps so a final partial chunk keeps the
        # scan length (and therefore the compiled program) fixed — a
        # ragged last chunk would otherwise force a second full
        # trace+compile, re-paying the dispatch latency the chunking
        # exists to amortize
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def update_chunk(student_params, opt_state, teacher_params, xs, keys, do):
            def step(carry, inp):
                sp, os_ = carry
                x_data, key, live = inp
                loss, grads = jax.value_and_grad(
                    lambda p: distillation_loss(
                        self.model, p, teacher_params, x_data, key,
                        num_student_steps=num_student_steps,
                        gamma_schedule=self.ns2.gamma_schedule,
                        scale=self.ns2.scale,
                    )
                )(sp)
                updates, os_new = self.optimizer.update(grads, os_, sp)
                sp_new = optax.apply_updates(sp, updates)
                keep = lambda new, old: jax.tree_util.tree_map(
                    lambda a, b: jnp.where(live, a, b), new, old
                )
                return (keep(sp_new, sp), keep(os_new, os_)), (loss, live)

            (sp, os_), (losses, lives) = jax.lax.scan(
                step, (student_params, opt_state), (xs, keys, do)
            )
            # last LIVE loss (padded steps report the padded batch's loss)
            idx = jnp.sum(lives.astype(jnp.int32)) - 1
            return sp, os_, losses[idx]

        key = jax.random.PRNGKey(seed)
        loss = None
        done = 0
        chunk = max(1, updates_per_jit)
        while done < n_updates:
            m = min(chunk, n_updates - done)
            batches = [jnp.asarray(next(latent_batches)) for _ in range(m)]
            # pad the tail chunk to the fixed scan length; `do` masks the pads
            batches += [batches[-1]] * (chunk - m)
            xs = jnp.stack(batches)
            do = jnp.arange(chunk) < m
            key, k = jax.random.split(key)
            student_params, opt_state, loss = update_chunk(
                student_params, opt_state, self.teacher_params, xs,
                jax.random.split(k, chunk), do,
            )
            done += m
        self.teacher_params = student_params  # ready for the next halving
        self.last_loss = float(loss) if loss is not None else None
        return student_params

    def run_schedule(
        self,
        latent_batches,
        *,
        start_steps: int,
        target_steps: int,
        updates_per_round: int,
        seed: int = 0,
        updates_per_jit: int = 1,
    ):
        """Full progressive-distillation schedule: halve the sampler step
        count round by round (start → start/2 → … → target, the
        arXiv 2202.00512 recipe the reference cites as future work,
        README.md:189-197) and return ``(final_params, history)`` where
        history records each round's (num_student_steps, final loss).

        The returned params sample with ``sample(..., timesteps=target_steps)``
        (DDIM on the distilled model — each student step stands in for two
        teacher steps of the previous round)."""
        assert start_steps % target_steps == 0 and (
            start_steps // target_steps
        ) & (start_steps // target_steps - 1) == 0, (
            "start_steps must be target_steps × a power of two"
        )
        history = []
        steps = start_steps
        params = self.teacher_params
        rnd = 0
        while steps > target_steps:
            steps //= 2  # the student learns to do `steps` steps
            params = self.distill_round(
                latent_batches,
                num_student_steps=steps,
                n_updates=updates_per_round,
                seed=seed + rnd,
                updates_per_jit=updates_per_jit,
            )
            history.append((steps, self.last_loss))
            rnd += 1
        return params, history
