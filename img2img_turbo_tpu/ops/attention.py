"""Attention kernels.

The reference gets memory-efficient attention from xformers CUDA kernels
(reference: src/train_pix2pix_turbo.py:52-56, src/inference_unpaired.py:36).
The TPU answer is a Pallas flash-attention kernel: online-softmax over KV
blocks so the (Sq, Skv) score matrix never hits HBM. The UNet's largest
attention is 64x64 = 4096 latent tokens of self-attention at 512^2 input
(plus 77-token cross-attention, which is small enough for the XLA path).

All kernels take (B, H, S, head_dim) tensors. Softmax statistics are fp32;
MXU matmuls take bf16/fp32 inputs with fp32 accumulation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def scaled_dot_product_attention(q, k, v):
    """XLA reference attention. q: (B, H, Sq, d), k/v: (B, H, Skv, d)."""
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas flash attention (non-causal; full KV resident in VMEM per (b, h))
# ---------------------------------------------------------------------------


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float,
                  block_k: int, seq_kv: int, kv_pad: int):
    q = q_ref[0]  # (block_q, d)
    block_q, d = q.shape
    nk = (seq_kv + kv_pad) // block_k

    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(i * block_k, block_k), :]
        vb = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if kv_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col + i * block_k < seq_kv, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, block_q: int = 512, block_k: int = 512):
    """Flash attention via Pallas. q: (B, H, Sq, d), k/v: (B, H, Skv, d).

    Sq must be divisible by the (possibly shrunk) q block; KV is padded to a
    block multiple and masked. Falls back to shrinking block sizes for short
    sequences.
    """
    b, h, sq, d = q.shape
    skv = k.shape[2]
    block_q = min(block_q, max(8, 1 << (sq - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (skv - 1).bit_length()))
    # Ragged Sq: pad query rows up to a block multiple and slice the result.
    # Padded q rows see the same masked KV, produce finite garbage, and are
    # dropped — cheaper than an XLA fallback on shapes like 7350 (bird.png).
    q_pad = (-sq) % block_q
    if q_pad:
        q = jnp.pad(q, [(0, 0), (0, 0), (0, q_pad), (0, 0)])
    sq_p = sq + q_pad
    kv_pad = (-skv) % block_k
    if kv_pad:
        pad = [(0, 0), (0, 0), (0, kv_pad), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    sm_scale = 1.0 / math.sqrt(d)
    bh = b * h
    qr = q.reshape(bh, sq_p, d)
    kr = k.reshape(bh, skv + kv_pad, d)
    vr = v.reshape(bh, skv + kv_pad, d)

    kernel = functools.partial(
        _flash_kernel, sm_scale=sm_scale, block_k=block_k, seq_kv=skv,
        kv_pad=kv_pad)
    grid = (bh, sq_p // block_q)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv + kv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv + kv_pad, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq_p * (skv + kv_pad) * d,
            bytes_accessed=(qr.size + kr.size + vr.size) * q.dtype.itemsize,
            transcendentals=bh * sq_p * (skv + kv_pad),
        ),
    )(qr, kr, vr)
    out = out.reshape(b, h, sq_p, d)
    return out[:, :, :sq] if q_pad else out


# ---------------------------------------------------------------------------
# Transpose-free multi-head flash attention: operates on (B, S, D) with the
# head dim folded into lanes. Head slicing happens inside the kernel as
# static column ranges, so no (0,2,1,3) transposes / relayouts ever hit HBM
# (those transposes were ~30% of UNet device time via the XLA path).
# ---------------------------------------------------------------------------


def _flash_heads_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                        *, num_heads: int, head_dim: int, sm_scale: float,
                        seq_kv: int, kv_pad: int):
    """Grid (b, q_blocks, kv_blocks) with kv innermost; softmax state is
    carried in VMEM scratch across kv steps (q/o blocks revisit, so only a
    (block_k, D) slice of K/V is resident per step)."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)
    block_k = k_ref.shape[1]

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    for h in range(num_heads):
        lo = h * head_dim
        q = q_ref[0, :, lo:lo + head_dim]
        kb = k_ref[0, :, lo:lo + head_dim]
        vb = v_ref[0, :, lo:lo + head_dim]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        if kv_pad:
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col + ki * block_k < seq_kv, s, -jnp.inf)
        m_prev = m_scr[h]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_scr[h] = m_new
        l_scr[h] = l_scr[h] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_scr[h] = acc_scr[h] * alpha + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ki == nk - 1)
    def _():
        for h in range(num_heads):
            lo = h * head_dim
            o_ref[0, :, lo:lo + head_dim] = (
                acc_scr[h] / l_scr[h]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "block_q",
                                             "block_k"))
def flash_attention_folded(q, k, v, num_heads: int, block_q: int = 256,
                           block_k: int = 512):
    """q: (B, Sq, D), k/v: (B, Skv, D) with D = num_heads*head_dim.
    Returns (B, Sq, D). No transposes anywhere; VMEM bounded by
    (block_q + 2*block_k) * D."""
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads
    block_q = min(block_q, max(8, 1 << (sq - 1).bit_length()))
    # Ragged Sq (e.g. 7350 tokens for an 840x560 input): pad query rows to a
    # block multiple and slice the result. Padded rows attend over the same
    # masked KV, yielding finite values that are simply discarded.
    q_pad = (-sq) % block_q
    if q_pad:
        q = jnp.pad(q, [(0, 0), (0, q_pad), (0, 0)])
    sq_p = sq + q_pad
    block_k = min(block_k, max(128, 1 << (skv - 1).bit_length()))
    kv_pad = (-skv) % block_k
    if kv_pad:
        pad = [(0, 0), (0, kv_pad), (0, 0)]
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    kernel = functools.partial(
        _flash_heads_kernel, num_heads=num_heads, head_dim=hd,
        sm_scale=1.0 / math.sqrt(hd), seq_kv=skv, kv_pad=kv_pad)
    nk = (skv + kv_pad) // block_k
    out = pl.pallas_call(
        kernel,
        grid=(b, sq_p // block_q, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, ki: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, ki: (i, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, ki: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((num_heads, block_q, 1), jnp.float32),
            pltpu.VMEM((num_heads, block_q, 1), jnp.float32),
            pltpu.VMEM((num_heads, block_q, hd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq_p * (skv + kv_pad) * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * num_heads * sq_p * (skv + kv_pad),
        ),
    )(q, k, v)
    return out[:, :sq] if q_pad else out


def _mha_xla(q, k, v, num_heads: int):
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads
    qh = q.reshape(b, sq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, skv, num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, skv, num_heads, hd).transpose(0, 2, 1, 3)
    o = scaled_dot_product_attention(qh, kh, vh)
    return o.transpose(0, 2, 1, 3).reshape(b, sq, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha_flash(q, k, v, num_heads: int):
    return flash_attention_folded(q, k, v, num_heads)


def _mha_flash_fwd(q, k, v, num_heads: int):
    return flash_attention_folded(q, k, v, num_heads), (q, k, v)


def _mha_flash_bwd(num_heads: int, res, g):
    # backward recomputes through the XLA path (Pallas kernels have no
    # automatic JVP); forward stays flash. A dedicated flash backward
    # kernel is future work — this matches non-flash training memory.
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _mha_xla(q_, k_, v_, num_heads),
                     q, k, v)
    return vjp(g)


_mha_flash.defvjp(_mha_flash_fwd, _mha_flash_bwd)


def multihead_attention(q, k, v, num_heads: int):
    """Layout-aware dispatch on projected (B, S, D) tensors.

    TPU + long queries: transpose-free folded flash kernel (custom VJP:
    XLA-recompute backward). Otherwise: the XLA reference path."""
    sq, d = q.shape[1], q.shape[2]
    if jax.default_backend() == "tpu" and sq >= 256 and d % num_heads == 0:
        return _mha_flash(q, k, v, num_heads)
    return _mha_xla(q, k, v, num_heads)


def default_attention(q, k, v):
    """Dispatch: Pallas flash attention on TPU, XLA elsewhere (CPU tests).

    Decided at trace time from the default backend, so the choice is baked
    into the compiled program.
    """
    if jax.default_backend() == "tpu" and q.shape[2] >= 256:
        return flash_attention(q, k, v)
    return scaled_dot_product_attention(q, k, v)
