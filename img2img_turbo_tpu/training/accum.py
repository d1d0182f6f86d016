"""Constant-memory gradient accumulation via `lax.scan` over micro-batches.

The reference accumulates with `accelerator.accumulate` (k micro-batch
backwards, one optimizer step — train_pix2pix_turbo.py:170,
train_cyclegan_turbo.py:168). The TPU-native equivalent runs INSIDE the
fused train step: the logical batch is reshaped to (k, B/k, ...), a
`lax.scan` computes per-micro-batch gradients reusing one micro-batch of
activation memory, and the averaged gradient feeds a single optimizer
update. Because every loss in this codebase is a batch mean and micro
batches are equal-sized, the averaged gradient equals the big-batch
gradient exactly (up to fp reassociation) — pinned by
tests/test_training.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def split_micro(data, k: int):
    """Reshape every leaf (B, ...) -> (k, B // k, ...). B % k must be 0."""
    def r(x):
        if x.shape[0] % k:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by accum_steps {k}")
        return x.reshape((k, x.shape[0] // k) + x.shape[1:])
    return jax.tree_util.tree_map(r, data)


def merge_micro(data):
    """Inverse of split_micro on stacked outputs: (k, m, ...) -> (k*m, ...)."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:]), data)


def accumulated_value_and_grad(loss_fn, params, data, rng, k: int):
    """Scan `jax.value_and_grad(loss_fn)` over k micro-batches.

    loss_fn(params, micro_data, key) -> (loss, aux). `data` leaves carry a
    leading batch dim divisible by k; micro i receives jax.random.split(rng,
    k)[i]. Returns ((loss_mean, aux_stacked), grads_mean) where aux leaves
    gain a leading k axis (use merge_micro to reassemble per-sample aux,
    or .mean(0) for scalar metrics).

    Activation memory is one micro-batch: scan reuses the body's buffers;
    only the (constant-size) gradient accumulator persists across steps.
    """
    keys = jax.random.split(rng, k)
    if k == 1:
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, data, keys[0])
        aux = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None], aux)
        return (loss, aux), g

    micro = split_micro(data, k)

    def body(gsum, inp):
        mb, key = inp
        (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, mb, key)
        gsum = jax.tree_util.tree_map(
            lambda s, x: s + x.astype(s.dtype), gsum, g)
        return gsum, (loss, aux)

    g0 = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params)
    gsum, (losses, auxs) = jax.lax.scan(body, g0, (micro, keys))
    grads = jax.tree_util.tree_map(
        lambda s, p: (s / k).astype(p.dtype), gsum, params)
    return (losses.mean(), auxs), grads
