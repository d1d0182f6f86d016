"""Fused GroupNorm(+SiLU)+3x3-conv Pallas kernel — the resnet-body engine.

Round-1 profiling showed the VAE/UNet resnet bodies running far below MXU
peak in-graph: XLA fuses each GroupNorm's reduction into the producing conv
("convert_reduce_fusion", 118 -> 25 TFLOP/s on 512-ch small-spatial convs)
and spends ~3 ms/call on layout copies/pads for its space-to-batch conv
rewrites (CLAUDE.md perf findings; reference hot path
/root/reference/src/pix2pix_turbo.py:199-203).

This kernel computes `conv3x3(silu(x * a + b)) (+ bias + temb) (+ residual)`
in one pass:
- x streams HBM -> VMEM once per spatial tile (manual halo DMA, rows +-1),
- normalize+SiLU happen in-register on the tile (a, b are the folded
  GroupNorm affine per (batch, channel)),
- the 3x3 conv runs as 9 shifted (Th*W, C) @ (C, TCo) MXU matmuls
  accumulated in fp32,
- the epilogue can emit per-tile sum/sum-of-squares of the OUTPUT, so the
  NEXT GroupNorm needs no separate pass over HBM (`combine_stats` folds
  them into its (a, b)).

A full resnet block is then 2 kernel calls + 1 tiny XLA combine, with HBM
traffic = 1 read + 1 write per conv — the speed-of-light schedule for this
architecture.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from img2img_turbo_tpu.ops.vma import sds as _sds


def _env_mb(name: str, default_mb: float) -> int:
    return int(float(os.environ.get(name, default_mb)) * 2 ** 20)


# VMEM budgets — TWO REGIMES, swept per-shape on the real v5e chip
# (scripts/sweep_fused_budgets.py; round-4 re-sweep journaled in
# docs/perf_journal.md):
#
# Regime L (large-spatial, e.g. the VAE's 128^2..512^2 levels): the
# largest DOUBLE-buffered tile whose per-copy halo buffer stays <= ~8MB
# (XBUF/2), under the raised Mosaic limit. Round-4 on-chip findings
# (docs/perf_journal.md): 512^2x128 th=8/nbuf=1 -> th=16/nbuf=2 is 824 ->
# 736 us b1 / 6586 -> 5850 us b8; 128^2x512 th=16 is 493 us (was ~700
# in-graph). Tiles past EITHER ~8K fp32 accumulator rows (512^2x128
# th=32: 1119 us) or ~13MB per-copy xbuf (512^2x256 th=16: 2273 vs 1511
# at th=8; 128^2x512 th=32: 989 vs 493 at th=16) fall off a ~2x cliff —
# hence both the _M_ROWS cap and the 16MB XBUF default.
#
# Regime S (small-spatial: whole image + halo fits _S_XBUF): one spatial
# tile per image with weight blocks streamed over a raised Mosaic
# vmem_limit — removes the per-tile fixed costs that dominated small
# UNet shapes (round-2 sweep: 64^2x512: 62 -> 130 TF/s; 16^2x1280:
# 22 -> 89 TF/s). Weight blocks stay <= _S_WBLOCK so they stream/overlap
# instead of one serial full-weight DMA (16^2x1280: tco=256 at 85us beat
# tco=1280 at 93us). Batched (bsz > 1) calls only take S when L's tiles
# are already whole-image — otherwise L's cross-tile prefetch pipeline
# wins (b8 64^2x512: 1026us L vs 1102us S).
_XBUF_BUDGET = _env_mb("FC_XBUF_MB", 16)   # L: 3 column-shift halo'd copies
_W_BUDGET = _env_mb("FC_W_MB", 8)          # L: weight block (double-buffered)
_TOTAL_BUDGET = _env_mb("FC_TOTAL_MB", 48)  # L: joint cap incl. headroom
_S_XBUF = _env_mb("FC_S_XBUF_MB", 32)      # S: whole-image 3-copy buffer cap
_S_WBLOCK = _env_mb("FC_S_WBLOCK_MB", 8)   # S: streamable weight block cap
_S_TOTAL = _env_mb("FC_S_TOTAL_MB", 110)   # S: joint cap (128MB physical)
_VMEM_LIMIT = _env_mb("FC_VMEM_MB", 128)   # Mosaic vmem_limit_bytes
# fp32 accumulator row cap (th*tw): the round-4 on-chip sweep found tile
# time degrades sharply past ~8K accumulator rows (512^2x128: th=16 at
# 736us vs th=32 at 1119us — the (th*tw, tco) fp32 accumulator outgrows
# what Mosaic can keep register/VMEM-local across the 9 tap dots), while
# per-tile fixed costs argue for the LARGEST th under the cap (512^2
# 256ch entry: th=8 left ~400us of per-tile overhead on the table).
_M_ROWS = int(os.environ.get("FC_MROWS", 8192))
# Weight-RESIDENT output tile cap (regime L): with the (b, i, j) grid and
# j (co-blocks) innermost, any nco > 1 re-fetches the full weight tensor
# once per (b, i) — Pallas only skips a block DMA when the index map
# output is unchanged between consecutive grid steps. At the deep-channel
# decoder shapes that is the dominant HBM stream (128^2x512: 37.7 MB of
# weight traffic vs 4.7 MB resident) and the round-5 on-chip matrix
# measured it directly (module-event basis, 2026-08-19): tco=co cut
# 128^2x512 from 1210.6 -> 646.2 us, 256^2x256 from 1196.5 -> 790.7,
# 256^2x512->256 from 2495.7 -> 1625.9. tco therefore prefers FULL co
# (nco=1, weights fetched exactly once) whenever the block fits this cap,
# falling back to the streamed 128-column policy otherwise. 8 MB admits
# the 640-ch UNet weights (7.4 MB) — only reachable at bsz > 1 via the
# _PREF_L path below (b1 640-ch shapes are regime S), where the on-chip A/B
# measured 535.6 -> 406.0 us (matrix2 2026-08-19).
_W_RESIDENT = _env_mb("FC_W_RES_MB", 8)
# Experiment knob: force regime L's output-channel tile (e.g. FC_TCO=512
# makes nco=1 on the 512-ch decoder shapes). 0 = default policy.
_TCO_FORCE = int(os.environ.get("FC_TCO", 0))
# At bsz > 1, prefer regime L over regime F when L's pick is
# weight-resident (nco == 1) AND c >= 512. Rationale: regime F exists to
# cut weight re-streams (grid (1, bsz/m, nco) fetches each block bsz/m
# times), but a weight-RESIDENT L grid fetches the block exactly ONCE —
# less traffic than any fold — and L tiles double-buffer their halo DMAs
# where F tiles are serial whole-image loads. On-chip A/B (matrix2
# 2026-08-19, module-event p50): b8 64^2x512 1399.7 -> 1314.4 us, b8
# 32^2x640 535.6 -> 406.0 us (resident via the 8 MB cap), but b8
# 64^2x320 906.7 -> 1040.7 us — the 320/384-ch class is prologue-bound
# and keeps the fold, hence the c >= 512 gate. A/B: FC_PREF_L=0.
_PREF_L = os.environ.get("FC_PREF_L", "1") == "1"
# Interleaved prologue/matmul (stride-1 kernel, non-fold): at j==0 the
# tile's VPU prologue chunks are emitted BETWEEN the output-row-chunk
# matmuls in one straight-line block (2-chunk lookahead), so Mosaic's
# scheduler can hide the ~250us/tile of normalize+shift VPU work under
# the MXU dots. A deferred-prologue variant in a separate pl.when tail
# measured 2x SLOWER (when-regions are scheduling barriers — journal
# 2026-08-19); the interleave must stay inside the block. A/B: FC_ILV=0.
_ILV = os.environ.get("FC_ILV", "1") == "1"
# Min M rows per interleaved dot: prologue-sized chunks gave M=512/1024
# dots at W=128/256, 2x slower than no interleave (journal 2026-08-19);
# compute chunks are therefore sized to >= _ILV_M rows independently of
# the prologue chunking.
_ILV_M = int(os.environ.get("FC_ILV_M", 2048))
# Value-space compute (stride-1, non-fold): the round-4 profile shows the
# memref-staged prologue achieving ZERO VPU/MXU overlap at the 512^2
# decoder shapes (736 us measured = 390 us matmul floor + ~345 us VPU,
# exactly additive — journal 2026-08-19 prologue probe): routing the
# normalized tile through the 3-copy xbuf makes every dot depend on the
# whole scratch buffer, so Mosaic serializes prologue against matmuls.
# FC_VS instead normalizes each chunk as SSA VALUES feeding the dots
# directly (no column-shift copies; column taps become output-side rolls
# of the three per-tap partial sums), leaving a pure dataflow graph the
# scheduler can overlap freely. A/B: FC_VS=1 (default off until the
# on-chip A/B journals a win).
_VS = os.environ.get("FC_VS", "0") == "1"
# Output rows per value-space chunk (live fp32 temporaries scale with it;
# the +2 halo rows are re-normalized per chunk, so larger is less VPU
# overhead but more VMEM/registers).
_VS_CC = int(os.environ.get("FC_VS_CC", 8))


def _compiler_params(big: bool):
    """All regimes raise the Mosaic scoped-VMEM limit: v5e has 128MB
    physical VMEM and regime S has run under the raised limit since round
    2 — the 16MB default only ever capped regime L's tile picks (round-2's
    tiny-tile configuration was tuned under it; the round-4 re-sweep under
    the raised limit picks larger double-buffered tiles, see the budget
    defaults above). The flag only records which budget family picked."""
    del big
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)}


def _pick_tco(c: int, co: int, itemsize: int, taps: int, budget: int):
    """Largest output-channel tile whose weight block fits `budget`.

    co is 128-padded by every wrapper, so candidates are 128-multiple
    divisors of co."""
    if co % 128:
        if co % 8 == 0 and taps * c * co * itemsize <= budget:
            return co
        return None
    n128 = co // 128
    for k in range(n128, 0, -1):
        if n128 % k:
            continue
        tco = 128 * k
        if taps * c * tco * itemsize <= budget:
            return tco
    return None


def _divisors_desc(n: int):
    return [d for d in range(n, 0, -1) if n % d == 0]


def _pick_tiles(h: int, w: int, c: int, co: int, itemsize: int,
                skip_c: int = 0, bsz: int = 1):
    """-> (Th, TCo, nbuf, big, fold_m) fitting the VMEM budgets; Th divides
    H (or equals fold_m*(H+2) in regime F), TCo divides Co. `big` selects
    the raised Mosaic VMEM limit (regimes S/F; see the budget comment
    above).

    Regime F (fold_m > 0, bsz > 1): fold_m whole images ride in ONE tile —
    the batch dim is folded into rows as [gap, H rows, gap] blocks of
    P = H+2 rows per image (gap rows zero; they substitute the SAME-conv
    halo at every image boundary). The grid becomes
    (1, bsz/fold_m, n_co), so a weight block is re-streamed bsz/fold_m
    times instead of bsz times — at the deep UNet levels (weights >> x)
    this was THE batched-serving bottleneck (BENCH_r02 b8 ran at b1
    latency x8; VERDICT r2 item 1). The 2/P gap-row compute overhead is
    the price (12% at 16^2, 3% at 64^2)."""

    def rest_bytes(th, tco, wbytes):
        # chunked fp32 prologue temporaries (3 live chunk-size arrays)
        prologue = min(3 * (th + 2) * w * c * 4, 3 * _CHUNK_BYTES)
        acc = th * w * tco * 4
        io = 3 * th * w * tco * itemsize  # out + residual double buffers
        io += 2 * th * w * skip_c * itemsize  # skip_x, double-buffered
        return prologue + 2 * wbytes + acc + io

    def pick_l():
        # tco: weight-RESIDENT full co first (nco=1 — the weight block is
        # DMA'd exactly once for the whole grid; see _W_RESIDENT above),
        # then the streamed 128-column fallback. Tile policy: the LARGEST
        # double-buffered th wins — the round-4 on-chip sweep showed the
        # serial-DMA loss of nbuf=1 tiles outweighs tile size at every
        # profiled decoder shape (the round-2 tiny-tile budgets never had
        # room for both).
        if _TCO_FORCE and co % _TCO_FORCE == 0 \
                and 9 * c * _TCO_FORCE * itemsize <= 2 * _W_BUDGET:
            tco = _TCO_FORCE
        elif co % 8 == 0 and 9 * c * co * itemsize <= _W_RESIDENT:
            tco = co
        elif co % 128 == 0 and 9 * c * 128 * itemsize <= _W_BUDGET:
            tco = 128
        elif 9 * c * co * itemsize <= _W_BUDGET and co % 8 == 0:
            tco = co
        else:
            return None, None, 1, False, 0
        wbytes = 9 * c * tco * itemsize
        for cap in (_M_ROWS, None):
            for th in _divisors_desc(h):
                if cap is not None and th * w > cap:
                    continue
                xbuf = 3 * (th + 2) * w * c * itemsize
                rest = rest_bytes(th, tco, wbytes)
                if 2 * xbuf <= _XBUF_BUDGET \
                        and 2 * xbuf + rest <= _TOTAL_BUDGET:
                    return th, tco, 2, False, 0
            for th in _divisors_desc(h):
                if cap is not None and th * w > cap:
                    continue
                xbuf = 3 * (th + 2) * w * c * itemsize
                rest = rest_bytes(th, tco, wbytes)
                if xbuf <= _XBUF_BUDGET and xbuf + rest <= _TOTAL_BUDGET:
                    return th, tco, 1, False, 0
        return None, None, 1, False, 0

    # regime F: multi-image folded tiles (only a win for m >= 2)
    if bsz > 1:
        if _PREF_L and c >= 512:
            lt = pick_l()
            if lt[0] is not None and lt[1] == co:
                return lt
        P = h + 2
        tco = _pick_tco(c, co, itemsize, 9, _S_WBLOCK)
        if tco is not None:
            for m in _divisors_desc(bsz):
                if m < 2:
                    break
                th = m * P
                xbuf = 3 * (th + 2) * w * c * itemsize
                if xbuf > _S_XBUF:
                    continue
                if xbuf + rest_bytes(th, tco, 9 * c * tco * itemsize) \
                        <= _S_TOTAL:
                    return th, tco, 1, True, m

    # regime S: one whole-image tile, streamed weight blocks, raised limit
    xbuf_s = 3 * (h + 2) * w * c * itemsize
    if xbuf_s <= _S_XBUF:
        tco = _pick_tco(c, co, itemsize, 9, _S_WBLOCK)
        if tco is not None and \
                xbuf_s + rest_bytes(h, tco, 9 * c * tco * itemsize) \
                <= _S_TOTAL:
            if bsz == 1 or pick_l()[0] == h:
                return h, tco, 1, True, 0
    return pick_l()


def _pad_to_128(n: int) -> int:
    return -(-n // 128) * 128


def _xla_fallback(x, w, bias, a, b, extra_bias, residual, skip_x, skip_w,
                  act, emit_stats, stride=1, pad_lo=1):
    """Reference XLA composition — used when the tile pick fails at the
    wrapper's real dtype/skip configuration even though the (bf16-assumed)
    `supported()` gate passed (e.g. fp32 activations). Semantics identical
    to the kernel; stats come back as one (B, 1, 2, C) partial-sum tile."""
    h = x
    if a is not None:
        h = h * a[:, None, None, :].astype(x.dtype) \
            + b[:, None, None, :].astype(x.dtype)
        if act == "silu":
            h = jax.nn.silu(h)
    y = jax.lax.conv_general_dilated(
        h, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(pad_lo, 1), (pad_lo, 1)] if stride == 2 else "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)
    y = y + bias.astype(x.dtype)
    if extra_bias is not None:
        y = y + extra_bias[:, None, None, :].astype(x.dtype)
    if skip_x is not None:
        y = y + jnp.dot(skip_x, skip_w.astype(skip_x.dtype),
                        preferred_element_type=x.dtype)
    if residual is not None:
        y = y + residual
    stats = None
    if emit_stats:
        yf = y.astype(jnp.float32)
        stats = jnp.stack([jnp.sum(yf, axis=(1, 2)),
                           jnp.sum(yf * yf, axis=(1, 2))], axis=1)
        stats = stats[:, None]  # (B, 1, 2, C)
    return y, stats


def _pad_last(arr, to: int):
    d = to - arr.shape[-1]
    if d == 0:
        return arr
    return jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, d)])


def _ceil_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _pad_spatial(arr, hp: int, wp: int):
    """Zero-pad rows/cols of (B, H, W, C) up to (hp, wp).

    Zero SPATIAL padding preserves exact SAME-conv semantics on the true
    region: the true right/bottom edge reads the zero pad exactly as SAME
    padding would, pad-region outputs are garbage that the wrapper slices
    off, and in-kernel masks keep emitted stats exact. This is what lets
    arbitrary ×8-cropped inputs (e.g. the reference's 840×560 bird example,
    inference_paired.py:39-41 — latent widths 105/53/27) stay on the Pallas
    path at every level instead of degrading to mixed XLA/Pallas graphs."""
    b, h, w, c = arr.shape
    if h == hp and w == wp:
        return arr
    return jnp.pad(arr, [(0, 0), (0, hp - h), (0, wp - w), (0, 0)])


def supported(x_shape, co: int, itemsize: int = 2, skip_c: int = 0) -> bool:
    """TPU-compilable gate: the manual halo DMA and the output pipeline
    slice the lane (channel) dim, which Mosaic only allows at 128-aligned
    offsets. The wrapper zero-pads channels up to the next 128-multiple
    (e.g. the UNet's 320-ch level runs at 384; conv_in's 3/4 input channels
    and conv_out's 3 outputs run at 128) — the pad/slice ops double as
    layout adapters at the XLA<->Pallas boundary.

    `itemsize`/`skip_c` must match what the wrapper will actually run with
    (the activation dtype's itemsize; the 128-padded skip channel count) —
    the tile picker's VMEM budget depends on both, and the wrapper falls
    back to the XLA composition if its own pick fails.

    Odd spatial sizes are fine: the wrapper zero-pads H/W to multiples of 8
    (exact SAME-conv semantics, see _pad_spatial) so the gate only needs
    the PADDED dims to tile."""
    b, h, w, c = x_shape
    th = _pick_tiles(_ceil_to(h, 8), _ceil_to(w, 8), _pad_to_128(c),
                     _pad_to_128(co), itemsize,
                     skip_c=_pad_to_128(skip_c), bsz=b)[0]
    return th is not None and h >= 2


_CHUNK_BYTES = _env_mb("FC_CHUNK_MB", 1)  # fp32 prologue bound (per temp)


def _chunk_rows(tw: int, cin: int, cap: int) -> int:
    """Prologue chunk height: whole image rows bounding the fp32
    temporaries at ~_CHUNK_BYTES (the hardware rotate is 32-bit-only, so
    chunks are processed in fp32 registers before casting back)."""
    return max(1, min(cap, _CHUNK_BYTES // (4 * tw * cin)))


def _prologue_chunk(xbuf, a_ref, b_ref, k0, kn, *, th, tw, cin, normalize,
                    act, mask_h=None, mask_w=None):
    """Normalize(+SiLU) xbuf rows [k0, k0+kn) and write their column-shift
    copies. k0/kn are STATIC. The flat-roll cross-row wraps (including at
    chunk boundaries) land on col==0 / col==tw-1 positions, which are
    masked to the SAME-padding zero anyway.

    mask_h/mask_w (true H/W when the wrapper spatially padded): zero-pad
    rows/cols must stay ZERO post-normalize (silu(0*a + b) != 0 would bleed
    into the true region's edge taps)."""
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    dt = xbuf.dtype
    rc = kn * tw
    xn = xbuf[1, pl.ds(k0, kn)].reshape(rc, cin).astype(jnp.float32)
    if normalize:
        bi2 = pl.program_id(0)
        xn = xn * a_ref[bi2] + b_ref[bi2]
        if act == "silu":
            xn = xn * jax.nn.sigmoid(xn)
    # image-boundary halo rows must stay ZERO post-activation
    rows = jax.lax.broadcasted_iota(jnp.int32, (rc, 1), 0)
    col = jax.lax.rem(rows, tw)
    if k0 == 0:
        xn = jnp.where(jnp.logical_or(rows >= tw, i > 0), xn, 0.0)
    if k0 + kn == th + 2:
        xn = jnp.where(jnp.logical_or(rows < rc - tw, i < nh - 1),
                       xn, 0.0)
    if mask_h is not None:
        # global input row of flat row r: i*th - 1 + k0 + r // tw
        gr = i * th - 1 + k0 + rows // tw
        xn = jnp.where(gr < mask_h, xn, 0.0)
    if mask_w is not None:
        xn = jnp.where(col < mask_w, xn, 0.0)
    xbuf[1, pl.ds(k0, kn)] = xn.astype(dt).reshape(kn, tw, cin)
    # column tap dj=0 reads x[.., oj-1]: shift flat rows down by 1; the
    # first column of each image row has no left neighbor -> zero
    left = jnp.where(col == 0, 0.0, pltpu.roll(xn, 1, 0))
    xbuf[0, pl.ds(k0, kn)] = left.astype(dt).reshape(kn, tw, cin)
    right = jnp.where(col == tw - 1, 0.0, pltpu.roll(xn, rc - 1, 0))
    xbuf[2, pl.ds(k0, kn)] = right.astype(dt).reshape(kn, tw, cin)


def _prologue(xbuf, a_ref, b_ref, *, th, tw, cin, normalize, act,
              mask_h=None, mask_w=None, chunk=None):
    """Normalize(+SiLU) the loaded tile and build its column-shift copies.

    Processed in chunks of whole image rows so the fp32 temporaries stay
    bounded (~_CHUNK_BYTES) instead of scaling with the tile — which would
    otherwise dominate the kernel's scoped-vmem stack and force tiny tiles.
    `chunk` is computed ONCE in `_kernel` and shared with the interleaved
    path (`compute_ilv`), whose lookahead correctness depends on both sites
    advancing in identical steps (the k0==0 / k0+kn==th+2 boundary masks in
    `_prologue_chunk` fire only when chunk boundaries partition [0, th+2)
    in order from 0 — advisor r4 finding).

    (A DMA-engine variant — left/right copies as VMEM->VMEM shifted
    copies overlapped with the center matmuls — is ILLEGAL on this
    hardware: Mosaic rejects sublane-offset memref slices, the W dim is
    sublane-tiled (8,128). The rotates must stay on the VPU.)
    """
    if chunk is None:
        chunk = _chunk_rows(tw, cin, th + 2)
    for k0 in range(0, th + 2, chunk):
        kn = min(chunk, th + 2 - k0)
        _prologue_chunk(xbuf, a_ref, b_ref, k0, kn, th=th, tw=tw, cin=cin,
                        normalize=normalize, act=act, mask_h=mask_h,
                        mask_w=mask_w)


def _prologue_fold(xbuf, a_ref, b_ref, *, m, P, h_real, tw, cin, normalize,
                   act, mask_w=None):
    """Regime-F prologue: the tile is m folded images of P = h+2 rows each
    ([gap, rows, gap]); xbuf covers tile rows -1..th (th = m*P). All gap /
    halo rows are memset to zero (they ARE the SAME-padding), and each
    image's real rows are normalized with ITS (a, b) row — a_ref/b_ref are
    the tile's (m, 1, C) blocks (the singleton keeps Mosaic's last-two-dims
    block rule satisfied for any fold_m; a_ref[u] is (1, C) and broadcasts
    over the chunk rows). Segment offsets are static (m is a Python
    int), so no dynamic row->image gather is needed."""
    dt = xbuf.dtype
    th = m * P
    # zero runs: xbuf row tr maps to global tile row tr-1; image u's real
    # rows are tr in [u*P+2, u*P+2+h_real). Zero everything else.
    zero_runs = [(0, 2)]
    for u in range(m):
        start = u * P + 2 + h_real
        end = min((u + 1) * P + 2, th + 2)
        if end > start:
            zero_runs.append((start, end - start))
    for copy in range(3):
        for start, ln in zero_runs:
            xbuf[copy, pl.ds(start, ln)] = jnp.zeros((ln, tw, cin), dt)
    chunk = max(1, min(h_real, _CHUNK_BYTES // (4 * tw * cin)))
    for u in range(m):
        base = u * P + 2
        for k0 in range(0, h_real, chunk):
            kn = min(chunk, h_real - k0)
            rc = kn * tw
            xn = xbuf[1, pl.ds(base + k0, kn)].reshape(rc, cin
                                                       ).astype(jnp.float32)
            if normalize:
                xn = xn * a_ref[u] + b_ref[u]
                if act == "silu":
                    xn = xn * jax.nn.sigmoid(xn)
            rows = jax.lax.broadcasted_iota(jnp.int32, (rc, 1), 0)
            col = jax.lax.rem(rows, tw)
            if mask_w is not None:
                xn = jnp.where(col < mask_w, xn, 0.0)
            xbuf[1, pl.ds(base + k0, kn)] = xn.astype(dt).reshape(
                kn, tw, cin)
            # column-shift copies (see _prologue): the flat-roll cross-row
            # wraps land on col==0 / col==tw-1, masked to the SAME zero.
            # Chunk-boundary wraps only corrupt those masked positions.
            left = jnp.where(col == 0, 0.0, pltpu.roll(xn, 1, 0))
            xbuf[0, pl.ds(base + k0, kn)] = left.astype(dt).reshape(
                kn, tw, cin)
            right = jnp.where(col == tw - 1, 0.0, pltpu.roll(xn, rc - 1, 0))
            xbuf[2, pl.ds(base + k0, kn)] = right.astype(dt).reshape(
                kn, tw, cin)


def _kernel(a_ref, b_ref, w_ref, bias_ref, eb_ref, res_ref, sk_ref, skw_ref,
            x_hbm, out_ref, stats_ref, xbuf, sem, *, th, tw, cin, tco,
            normalize, act, emit_stats, out_dtype, nbuf, mask_h=None,
            mask_w=None, fold=None, use_ilv=None, ilv_m=None, use_vs=None,
            vs_cc=None):
    i = pl.program_id(1)
    j = pl.program_id(2)
    nh = pl.num_programs(1)
    r = (th + 2) * tw  # flattened (rows-with-halo x width)
    # one shared chunk height for BOTH prologue paths: the interleaved
    # lookahead (`pro_upto`) and the whole-tile `_prologue` must advance in
    # identical steps or the boundary masks in `_prologue_chunk` desync
    ch = _chunk_rows(tw, cin, th + 2)
    if use_ilv is None:
        use_ilv = _ILV
    if ilv_m is None:
        ilv_m = _ILV_M
    if use_vs is None:
        use_vs = _VS
    if vs_cc is None:
        vs_cc = _VS_CC

    # xbuf: (nbuf, 3, th+2, tw, C) — sets of three column-shift copies of
    # the normalized tile. nbuf=2 double-buffers: tile i lives in slot i%2
    # and the DMAs for tile i+1 are issued before computing tile i,
    # overlapping the HBM stream with the matmuls (used only when the
    # second buffer costs no tile size — see _pick_tiles). In row-major
    # flattened view ((th+2)*tw, C) the conv's column taps (dj) are
    # flat-row shifts of +-1, realized ONCE per tile with pltpu.roll + a
    # boundary mask; the row taps (di) are then slices on the free dim, so
    # the 9 matmul operands below are pure views (tw % 8 == 0).
    slot = jax.lax.rem(i, 2) if nbuf == 2 else 0
    nco = pl.num_programs(2)
    vs = use_vs and fold is None
    ilv = use_ilv and fold is None and not vs

    def main_dma(ii, sl):
        bi = pl.program_id(0)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ii * th, th)],
            xbuf.at[sl, 1, pl.ds(1, th)], sem.at[sl, 0])

    def top_dma(ii, sl):
        bi = pl.program_id(0)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ii * th - 1, 1)],
            xbuf.at[sl, 1, pl.ds(0, 1)], sem.at[sl, 1])

    def bot_dma(ii, sl):
        bi = pl.program_id(0)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds((ii + 1) * th, 1)],
            xbuf.at[sl, 1, pl.ds(th + 1, 1)], sem.at[sl, 2])

    @pl.when(j == 0)
    def _load():
        # nh is static: a single-tile grid folds program_id to a literal,
        # so halo/prefetch descriptors must not be constructed at all then
        if fold is not None:
            # regime F: tiles are independent folded-image groups — the
            # per-image gap rows ARE the conv halo, so no top/bot DMAs
            m, P, h_real = fold
            main_dma(i, 0).start()
            main_dma(i, 0).wait()
            _prologue_fold(xbuf.at[0], a_ref, b_ref, m=m, P=P,
                           h_real=h_real, tw=tw, cin=cin,
                           normalize=normalize, act=act, mask_w=mask_w)
            return
        if nh == 1:
            @pl.when(i == 0)
            def _only():
                main_dma(0, 0).start()
            main_dma(i, 0).wait()
        elif nbuf == 1:
            # serial load (the double buffer would have shrunk the tile)
            main_dma(i, 0).start()

            @pl.when(i > 0)
            def _():
                top_dma(i, 0).start()

            @pl.when(i < nh - 1)
            def _():
                bot_dma(i, 0).start()

            main_dma(i, 0).wait()

            @pl.when(i > 0)
            def _():
                top_dma(i, 0).wait()

            @pl.when(i < nh - 1)
            def _():
                bot_dma(i, 0).wait()
        else:
            @pl.when(i == 0)
            def _first():
                main_dma(0, 0).start()
                bot_dma(0, 0).start()

            main_dma(i, slot).wait()

            @pl.when(i > 0)
            def _():
                top_dma(i, slot).wait()

            @pl.when(i < nh - 1)
            def _():
                bot_dma(i, slot).wait()

            # prefetch tile i+1 into the other slot (its compute consumer,
            # tile i-1's data, is already done)
            @pl.when(i < nh - 1)
            def _prefetch():
                main_dma(i + 1, 1 - slot).start()
                top_dma(i + 1, 1 - slot).start()

                @pl.when(i + 1 < nh - 1)
                def _():
                    bot_dma(i + 1, 1 - slot).start()

        if ilv or vs:
            return  # ilv: prologue interleaved with the j==0 matmuls
            # below; vs: no prologue at all — normalization happens in
            # value space inside compute_vs
        pmask = dict(mask_h=mask_h, mask_w=mask_w) if normalize else {}
        if nbuf == 1:
            _prologue(xbuf.at[0], a_ref, b_ref, th=th, tw=tw, cin=cin,
                      normalize=normalize, act=act, chunk=ch, **pmask)
        else:
            @pl.when(slot == 0)
            def _pr0():
                _prologue(xbuf.at[0], a_ref, b_ref, th=th, tw=tw, cin=cin,
                          normalize=normalize, act=act, chunk=ch, **pmask)

            @pl.when(slot == 1)
            def _pr1():
                _prologue(xbuf.at[1], a_ref, b_ref, th=th, tw=tw, cin=cin,
                          normalize=normalize, act=act, chunk=ch, **pmask)

    def compute(sl):
        # static slot: a traced slot index in the matmul operands forces
        # dynamic addressing and collapses Mosaic's schedule (~10x)
        acc = jnp.zeros((th * tw, tco), jnp.float32)
        for di in range(3):
            for dj in range(3):
                xs = xbuf[sl, dj, pl.ds(di, th)].reshape(th * tw, cin)
                acc = acc + jnp.dot(xs, w_ref[di, dj],
                                    preferred_element_type=jnp.float32)
        acc = acc + bias_ref[0].astype(jnp.float32)
        if eb_ref is not None:
            # eb is carried fp32: a dynamic sublane index into packed bf16
            # (2 rows/register) is unprovable for Mosaic; fp32 is exact
            if fold is not None:
                # (m, 1, tco) block: each folded image adds ITS row
                m, P, _ = fold
                acc = (acc.reshape(m, P * tw, tco)
                       + eb_ref[...]).reshape(th * tw, tco)
            else:
                acc = acc + eb_ref[pl.program_id(0)]
        if sk_ref is not None:
            # epilogue 1x1-conv skip fusion (VAE skip-decoder zero-convs):
            # y += skip_x @ skip_w, so the XLA add+conv passes (and their
            # HBM round trips) disappear and the stats stay chainable
            csk = sk_ref.shape[-1]
            acc = acc + jnp.dot(sk_ref[0].reshape(th * tw, csk),
                                skw_ref[...],
                                preferred_element_type=jnp.float32)
        y = acc.reshape(th, tw, tco)
        if res_ref is not None:
            y = y + res_ref[0].astype(jnp.float32)
        yo = y.astype(out_dtype)
        if fold is not None:
            # gap/pad output rows are garbage (their taps straddle two
            # images): zero them so the stats are exact; the wrapper's
            # unfold slice drops them from the output anyway. Tile rows
            # are image-periodic: row r real iff 1 <= r mod P <= h_real.
            fm, P, h_real = fold
            ri = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 0)
            rm = jax.lax.rem(ri, P)
            msk = jnp.logical_and(rm >= 1, rm <= h_real)
            if mask_w is not None:
                ci = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 1)
                msk = jnp.logical_and(msk, ci < mask_w)
            yo = jnp.where(msk, yo, 0)
        elif mask_h is not None or mask_w is not None:
            # spatial padding in play: zero the pad region so the emitted
            # stats stay exact (the output slice drops it anyway)
            m = jnp.full((th, tw, 1), True)
            if mask_h is not None:
                ri = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 0)
                m = jnp.logical_and(m, ri + i * th < mask_h)
            if mask_w is not None:
                ci = jax.lax.broadcasted_iota(jnp.int32, (th, tw, 1), 1)
                m = jnp.logical_and(m, ci < mask_w)
            yo = jnp.where(m, yo, 0)
        out_ref[0] = yo
        if emit_stats:
            yf = yo.astype(jnp.float32)
            if fold is not None:
                fm, P, _ = fold
                yseg = yf.reshape(fm, P * tw, tco)
                stats_ref[:, 0] = jnp.stack(
                    [jnp.sum(yseg, axis=1), jnp.sum(yseg * yseg, axis=1)],
                    axis=1)
            else:
                stats_ref[0, 0] = jnp.stack([jnp.sum(yf, axis=(0, 1)),
                                             jnp.sum(yf * yf, axis=(0, 1))])

    def compute_ilv(sl):
        # j==0 fused prologue+matmul: prologue chunks are emitted BETWEEN
        # the output-row-chunk matmuls in one straight-line block, so the
        # scheduler hides the VPU normalize/shift work under the MXU dots.
        # Two granularities (on-chip A/B 2026-08-19): prologue chunks stay
        # fp32-temp-bounded (~_CHUNK_BYTES), but compute chunks must keep
        # the dot M-dim >= ~_ILV_M rows — at W=128/256 the prologue-sized
        # M=512/1024 dots were 2x SLOWER than no interleave, while W=512's
        # M=2048 won 1.24-1.37x. A static `done` counter keeps each
        # compute chunk's +-1-row taps inside already-normalized rows with
        # one compute chunk of lookahead. Bonus: the fp32 accumulator is
        # (cc*tw, tco) instead of (th*tw, tco), so it never hits the
        # _M_ROWS register cliff. `ch` is the shared chunk height computed
        # once in _kernel (same steps as the non-interleaved _prologue).
        cc = min(th, max(ch, -(-ilv_m // tw)))
        pmask = dict(mask_h=mask_h, mask_w=mask_w) if normalize else {}
        done = 0

        def pro_upto(tgt):
            nonlocal done
            tgt = min(tgt, th + 2)
            while done < tgt:
                kn = min(ch, th + 2 - done)
                _prologue_chunk(xbuf.at[sl], a_ref, b_ref, done, kn,
                                th=th, tw=tw, cin=cin,
                                normalize=normalize, act=act, **pmask)
                done += kn

        pro_upto(cc + 2)  # serial prefix: chunk 0's own taps
        st = None
        for r0 in range(0, th, cc):
            rn = min(cc, th - r0)
            # emit the NEXT chunk's prologue here, adjacent to this
            # chunk's dots (same straight-line region -> overlapped)
            pro_upto(r0 + rn + cc + 2)
            acc = jnp.zeros((rn * tw, tco), jnp.float32)
            for di in range(3):
                for dj in range(3):
                    xs = xbuf[sl, dj, pl.ds(r0 + di, rn)].reshape(
                        rn * tw, cin)
                    acc = acc + jnp.dot(xs, w_ref[di, dj],
                                        preferred_element_type=jnp.float32)
            acc = acc + bias_ref[0].astype(jnp.float32)
            if eb_ref is not None:
                acc = acc + eb_ref[pl.program_id(0)]
            if sk_ref is not None:
                csk = sk_ref.shape[-1]
                acc = acc + jnp.dot(
                    sk_ref[0, pl.ds(r0, rn)].reshape(rn * tw, csk),
                    skw_ref[...], preferred_element_type=jnp.float32)
            y = acc.reshape(rn, tw, tco)
            if res_ref is not None:
                y = y + res_ref[0, pl.ds(r0, rn)].astype(jnp.float32)
            yo = y.astype(out_dtype)
            if mask_h is not None or mask_w is not None:
                m = jnp.full((rn, tw, 1), True)
                if mask_h is not None:
                    ri = jax.lax.broadcasted_iota(jnp.int32, (rn, tw, 1), 0)
                    m = jnp.logical_and(m, ri + i * th + r0 < mask_h)
                if mask_w is not None:
                    ci = jax.lax.broadcasted_iota(jnp.int32, (rn, tw, 1), 1)
                    m = jnp.logical_and(m, ci < mask_w)
                yo = jnp.where(m, yo, 0)
            out_ref[0, pl.ds(r0, rn)] = yo
            if emit_stats:
                yf = yo.astype(jnp.float32)
                part = jnp.stack([jnp.sum(yf, axis=(0, 1)),
                                  jnp.sum(yf * yf, axis=(0, 1))])
                st = part if st is None else st + part
        if emit_stats:
            stats_ref[0, 0] = st

    def compute_vs(sl):
        # Value-space chunked compute (see the _VS comment at the top of
        # the module): each chunk of `cc` output rows reads the RAW tile
        # slice (+2 halo rows), normalizes it as fp32 SSA values,
        # casts to the dot dtype, and feeds the 9 taps as 3 per-column-tap
        # partial sums P_dj = sum_di dot(rows+di, w[di, dj]); the column
        # shifts land on the OUTPUT side (O = roll(P0) + P1 + roll(P2)).
        # Nothing round-trips through a scratch memref between the VPU
        # prologue and the MXU dots, so the scheduler is free to overlap
        # chunk k+1's normalize with chunk k's matmuls. The +2 halo rows
        # are re-normalized per chunk ((cc+2)/cc VPU overhead) and, on
        # nco>1 grids, per co tile — both hidden when overlap engages.
        cc = min(th, max(vs_cc, -(-ilv_m // tw)))
        bi2 = pl.program_id(0)
        st = None
        for r0 in range(0, th, cc):
            rn = min(cc, th - r0)
            rc = (rn + 2) * tw
            xn = xbuf[sl, 1, pl.ds(r0, rn + 2)].reshape(
                rc, cin).astype(jnp.float32)
            rows = jax.lax.broadcasted_iota(jnp.int32, (rc, 1), 0)
            col = jax.lax.rem(rows, tw)
            if normalize:
                xn = xn * a_ref[bi2] + b_ref[bi2]
                if act == "silu":
                    xn = xn * jax.nn.sigmoid(xn)
            # image-boundary halo rows must stay ZERO post-activation
            # (tile row -1 at i==0 / row th at i==nh-1 are never DMA'd)
            if r0 == 0:
                xn = jnp.where(jnp.logical_or(rows >= tw, i > 0), xn, 0.0)
            if r0 + rn == th:
                xn = jnp.where(jnp.logical_or(rows < rc - tw, i < nh - 1),
                               xn, 0.0)
            if normalize and mask_h is not None:
                gr = i * th - 1 + r0 + rows // tw
                xn = jnp.where(gr < mask_h, xn, 0.0)
            if normalize and mask_w is not None:
                xn = jnp.where(col < mask_w, xn, 0.0)
            xb = xn.astype(xbuf.dtype)
            accs = []
            for dj in range(3):
                acc_j = jnp.zeros((rn * tw, tco), jnp.float32)
                for di in range(3):
                    xs = jax.lax.slice(
                        xb, (di * tw, 0), (di * tw + rn * tw, cin))
                    acc_j = acc_j + jnp.dot(
                        xs, w_ref[di, dj],
                        preferred_element_type=jnp.float32)
                accs.append(acc_j)
            orow = jax.lax.broadcasted_iota(jnp.int32, (rn * tw, 1), 0)
            ocol = jax.lax.rem(orow, tw)
            # O[:, s] = P0[:, s-1] + P1[:, s] + P2[:, s+1]; the flat-roll
            # cross-row wraps land exactly on the masked SAME-padding cols
            left = jnp.where(ocol == 0, 0.0, pltpu.roll(accs[0], 1, 0))
            right = jnp.where(ocol == tw - 1, 0.0,
                              pltpu.roll(accs[2], rn * tw - 1, 0))
            acc = accs[1] + left + right
            acc = acc + bias_ref[0].astype(jnp.float32)
            if eb_ref is not None:
                acc = acc + eb_ref[bi2]
            if sk_ref is not None:
                csk = sk_ref.shape[-1]
                acc = acc + jnp.dot(
                    sk_ref[0, pl.ds(r0, rn)].reshape(rn * tw, csk),
                    skw_ref[...], preferred_element_type=jnp.float32)
            y = acc.reshape(rn, tw, tco)
            if res_ref is not None:
                y = y + res_ref[0, pl.ds(r0, rn)].astype(jnp.float32)
            yo = y.astype(out_dtype)
            if mask_h is not None or mask_w is not None:
                m = jnp.full((rn, tw, 1), True)
                if mask_h is not None:
                    ri = jax.lax.broadcasted_iota(jnp.int32, (rn, tw, 1), 0)
                    m = jnp.logical_and(m, ri + i * th + r0 < mask_h)
                if mask_w is not None:
                    ci = jax.lax.broadcasted_iota(jnp.int32, (rn, tw, 1), 1)
                    m = jnp.logical_and(m, ci < mask_w)
                yo = jnp.where(m, yo, 0)
            out_ref[0, pl.ds(r0, rn)] = yo
            if emit_stats:
                yf = yo.astype(jnp.float32)
                part = jnp.stack([jnp.sum(yf, axis=(0, 1)),
                                  jnp.sum(yf * yf, axis=(0, 1))])
                st = part if st is None else st + part
        if emit_stats:
            stats_ref[0, 0] = st

    def dispatch(fn):
        if nbuf == 1:
            fn(0)
        else:
            @pl.when(slot == 0)
            def _c0():
                fn(0)

            @pl.when(slot == 1)
            def _c1():
                fn(1)

    if vs:
        dispatch(compute_vs)
    elif not ilv:
        dispatch(compute)
    else:
        @pl.when(j == 0)
        def _ij0():
            dispatch(compute_ilv)

        if nco > 1:
            @pl.when(j > 0)
            def _ijn():
                dispatch(compute)


@functools.partial(jax.jit, static_argnames=("act", "emit_stats",
                                             "interpret", "ilv", "ilv_m",
                                             "vs", "vs_cc"))
def fused_gn_silu_conv3x3(x, w, bias, a=None, b=None, extra_bias=None,
                          residual=None, skip_x=None, skip_w=None,
                          act: str = "silu", emit_stats: bool = False,
                          interpret: bool = False,
                          ilv: Optional[bool] = None,
                          ilv_m: Optional[int] = None,
                          vs: Optional[bool] = None,
                          vs_cc: Optional[int] = None):
    """y = conv3x3_same(act(x*a + b)) + bias [+ extra_bias] [+ residual]
    [+ skip_x @ skip_w].

    x: (B, H, W, C); w: (3, 3, C, Co); bias: (Co,);
    a, b: (B, C) folded GroupNorm affine (None -> raw x, no activation);
    extra_bias: (B, Co) (the UNet resnet's projected time embedding);
    residual: (B, H, W, Co) added to the conv output (resnet skip);
    skip_x (B, H, W, Csk) / skip_w (Csk, Co): an epilogue 1x1 conv added to
    the output (the skip-decoder's zero-conv fusion, gamma folded into
    skip_w by the caller);
    emit_stats: also return per-tile output sums (B, n_tiles, 2, Co) for
    `combine_stats` — the next GroupNorm's statistics ride along for free;
    ilv / ilv_m: interleaved-prologue toggle and min dot-M rows. None (the
    default) resolves to the FC_ILV / FC_ILV_M env defaults; explicit
    values are STATIC jit args so A/B tests get distinct cache entries
    (monkeypatching the module globals does NOT retrace — advisor r4).
    vs / vs_cc: value-space compute toggle and chunk rows (FC_VS /
    FC_VS_CC defaults) — see the _VS module comment; vs supersedes ilv.
    """
    bsz, h, wd, c = x.shape
    co_real = w.shape[-1]
    # zero-pad channels to 128-multiples (Mosaic lane alignment); a=b=0 on
    # pad channels keeps the normalized+activated pad at exactly 0, and
    # zero weight rows/cols make the padding semantically inert. Even tiny
    # counts (conv_in's RGB/latents, conv_out's 3) pad to 128: the pad /
    # slice is one cheap layout-adapting pass, vs the 5-10x degraded
    # schedule XLA emits for a conv pinned by Pallas neighbors.
    c_pad = _pad_to_128(c)
    co = _pad_to_128(co_real)
    hp, wp = _ceil_to(h, 8), _ceil_to(wd, 8)
    csk_pad = 0 if skip_x is None else _pad_to_128(skip_x.shape[-1])
    if h < 2 or _pick_tiles(hp, wp, c_pad, co, x.dtype.itemsize,
                            skip_c=csk_pad, bsz=bsz)[0] is None:
        # graceful degrade (fp32 runs, exotic shapes): the gate is tuned
        # for bf16 — never raise inside jit, run the XLA composition
        return _xla_fallback(x, w, bias, a, b, extra_bias, residual,
                             skip_x, skip_w, act, emit_stats)
    if c_pad != c or co != co_real:
        x = _pad_last(x, c_pad)
        w = jnp.pad(w, [(0, 0), (0, 0), (0, c_pad - c),
                        (0, co - co_real)])
        bias = _pad_last(bias, co)
        if a is not None:
            a = _pad_last(a, c_pad)
            b = _pad_last(b, c_pad)
        if extra_bias is not None:
            extra_bias = _pad_last(extra_bias, co)
        if residual is not None:
            residual = _pad_last(residual, co)
        if skip_w is not None:
            skip_w = _pad_last(skip_w, co)
        c = c_pad
    if skip_x is not None and skip_x.shape[-1] % 128:
        pad_sk = _pad_to_128(skip_x.shape[-1])
        skip_x = _pad_last(skip_x, pad_sk)
        skip_w = jnp.pad(skip_w, [(0, pad_sk - skip_w.shape[0]), (0, 0)])
    csk = 0 if skip_x is None else skip_x.shape[-1]
    if (hp, wp) != (h, wd):
        x = _pad_spatial(x, hp, wp)
        if residual is not None:
            residual = _pad_spatial(residual, hp, wp)
        if skip_x is not None:
            skip_x = _pad_spatial(skip_x, hp, wp)
    th, tco, nbuf, big, fold_m = _pick_tiles(hp, wp, c, co,
                                             x.dtype.itemsize,
                                             skip_c=csk, bsz=bsz)
    assert th is not None, f"unsupported shape {x.shape} -> {co}"
    normalize = a is not None
    if normalize:
        a2 = a.astype(jnp.float32)
        b2 = b.astype(jnp.float32)
    else:
        a2 = jnp.zeros((bsz, c), jnp.float32)  # unused placeholder
        b2 = jnp.zeros((bsz, c), jnp.float32)
    bias2 = bias.reshape(1, co)

    fold = None
    if fold_m:
        # regime F: fold the batch into rows as m-image tiles of P-row
        # [gap, image, gap] blocks (see _pick_tiles). The leading-dim
        # pad+reshape is layout-free in NHWC.
        P = hp + 2
        fold = (fold_m, P, h)

        def fold_rows(t):
            t = jnp.pad(t, [(0, 0), (1, 1), (0, 0), (0, 0)])
            return t.reshape(1, bsz * P, wp, t.shape[-1])

        x = fold_rows(x)
        if residual is not None:
            residual = fold_rows(residual)
        if skip_x is not None:
            skip_x = fold_rows(skip_x)
        grid = (1, bsz // fold_m, co // tco)
        gb, gnh = 1, bsz // fold_m
        # Mosaic's block rule constrains the LAST TWO dims only (divisible
        # by (8, 128) or equal to the array dims). A (fold_m, C) block on
        # the (B, C) affine violates it whenever fold_m is neither
        # 8-divisible nor == B (e.g. b8 VAE 64^2x512 picks fold_m=2 —
        # BENCH r4 run1 crash; the b4 smoke case passed only because
        # fold_m == B there). Ride a singleton middle dim instead: blocks
        # become (fold_m, 1, C) so the constrained dims are (1, C).
        a2 = a2[:, None]
        b2 = b2[:, None]
        ab_spec = pl.BlockSpec((fold_m, 1, c), lambda bb, i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        eb_spec = pl.BlockSpec((fold_m, 1, tco), lambda bb, i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)
        out_rows = bsz * P
        stats_shape = (bsz, 1, 2, co)
        stats_spec = pl.BlockSpec((fold_m, 1, 2, tco),
                                  lambda bb, i, j: (i, 0, 0, j),
                                  memory_space=pltpu.VMEM)
        mask_h_eff = None  # subsumed by the kernel's periodic row mask
    else:
        grid = (bsz, hp // th, co // tco)
        gb, gnh = bsz, hp // th
        ab_spec = pl.BlockSpec((bsz, c), lambda bb, i, j: (0, 0),
                               memory_space=pltpu.VMEM)
        eb_spec = pl.BlockSpec((bsz, tco), lambda bb, i, j: (0, j),
                               memory_space=pltpu.VMEM)
        out_rows = hp
        stats_shape = (bsz, gnh, 2, co)
        stats_spec = pl.BlockSpec((1, 1, 2, tco),
                                  lambda bb, i, j: (bb, i, 0, j),
                                  memory_space=pltpu.VMEM)
        mask_h_eff = h if hp != h else None

    in_specs = [
        ab_spec,
        ab_spec,
        pl.BlockSpec((3, 3, c, tco), lambda bb, i, j: (0, 0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tco), lambda bb, i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [a2, b2, w, bias2]
    if extra_bias is not None:
        in_specs.append(eb_spec)
        eb2 = extra_bias.astype(jnp.float32)
        args.append(eb2[:, None] if fold is not None else eb2)
    if residual is not None:
        in_specs.append(pl.BlockSpec((1, th, wp, tco),
                                     lambda bb, i, j: (bb, i, 0, j),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    if skip_x is not None:
        in_specs.append(pl.BlockSpec((1, th, wp, csk),
                                     lambda bb, i, j: (bb, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(skip_x)
        in_specs.append(pl.BlockSpec((csk, tco), lambda bb, i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(skip_w.astype(x.dtype))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(x)

    out_shapes = [_sds((gb, out_rows, wp, co), x.dtype, *args)]
    out_specs = [pl.BlockSpec((1, th, wp, tco),
                              lambda bb, i, j: (bb, i, 0, j),
                              memory_space=pltpu.VMEM)]
    if emit_stats:
        out_shapes.append(_sds(stats_shape, jnp.float32, *args))
        out_specs.append(stats_spec)

    def kernel(*refs):
        pos = 4
        eb = refs[pos] if extra_bias is not None else None
        pos += extra_bias is not None
        res = refs[pos] if residual is not None else None
        pos += residual is not None
        sk = refs[pos] if skip_x is not None else None
        skw = refs[pos + 1] if skip_x is not None else None
        pos += 2 * (skip_x is not None)
        x_hbm = refs[pos]
        out_ref = refs[pos + 1]
        stats_ref = refs[pos + 2] if emit_stats else None
        xbuf, sem = refs[-2], refs[-1]
        _kernel(refs[0], refs[1], refs[2], refs[3], eb, res, sk, skw,
                x_hbm, out_ref, stats_ref, xbuf, sem, th=th, tw=wp, cin=c,
                tco=tco, normalize=normalize, act=act,
                emit_stats=emit_stats, out_dtype=x.dtype, nbuf=nbuf,
                mask_h=mask_h_eff,
                mask_w=wd if wp != wd else None, fold=fold,
                use_ilv=ilv, ilv_m=ilv_m, use_vs=vs, vs_cc=vs_cc)

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shapes if emit_stats else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((nbuf, 3, th + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hp * wp * 9 * c * co,
            transcendentals=bsz * hp * wp * c if normalize else 0,
            bytes_accessed=(bsz * hp * wp * (c + co) * x.dtype.itemsize
                            + 9 * c * co * w.dtype.itemsize)),
        interpret=interpret,
        **_compiler_params(big),
    )(*args)
    y, stats = outs if emit_stats else (outs, None)
    if fold is not None:
        y = y.reshape(bsz, fold[1], wp, co)[:, 1:h + 1, :wd]
    elif (hp, wp) != (h, wd):
        y = y[:, :h, :wd]
    if co != co_real:
        y = y[..., :co_real]
    if stats is not None and co != co_real:
        stats = stats[..., :co_real]
    return y, stats


# ---------------------------------------------------------------------------
# Stride-2 conv3x3 (down-sample), phase-decomposed input
# ---------------------------------------------------------------------------


def _pick_tiles_down(hout: int, w: int, c: int, co: int, itemsize: int,
                     bsz: int = 1):
    """-> (Th, TCo, nbuf, big); tiles over OUTPUT rows; w is the INPUT
    width. Same two-regime policy as _pick_tiles."""

    def bufs(th, tco, wbytes):
        raw = (2 * th + 2) * w * c * itemsize
        phases = 3 * (th + 1) * w * c * itemsize
        prologue = min(3 * (th + 1) * w * c * 4, 3 * _CHUNK_BYTES)
        acc = th * (w // 2) * tco * 4
        io = 3 * th * (w // 2) * tco * itemsize
        return raw, phases + prologue + 2 * wbytes + acc + io

    def pick_l():
        # NOTE: the stride-1 weight-resident tco policy was A/B'd here too
        # and REGRESSED (journal 2026-08-19 matrix2: down 128^2x512 b1
        # 384.8 -> 398.4 us) — the down kernel is phase-rebuild-bound, not
        # weight-stream-bound, and the resident pick shrinks th. Streamed
        # 128-column blocks stay the policy.
        if co % 128 == 0 and 9 * c * 128 * itemsize <= _W_BUDGET:
            tco = 128
        elif 9 * c * co * itemsize <= _W_BUDGET and co % 8 == 0:
            tco = co
        else:
            return None, None, 1, False
        wbytes = 9 * c * tco * itemsize
        for cap in (_M_ROWS, None):
            for th in _divisors_desc(hout):
                if cap is not None and th * (w // 2) > cap:
                    continue
                raw, rest = bufs(th, tco, wbytes)
                phases = 3 * (th + 1) * w * c * itemsize
                if 2 * raw + phases <= _XBUF_BUDGET + 2 * 2 ** 20 and \
                        2 * raw + rest <= _TOTAL_BUDGET:
                    return th, tco, 2, False
            for th in _divisors_desc(hout):
                if cap is not None and th * (w // 2) > cap:
                    continue
                raw, rest = bufs(th, tco, wbytes)
                phases = 3 * (th + 1) * w * c * itemsize
                if raw + phases <= _XBUF_BUDGET + 2 * 2 ** 20 and \
                        raw + rest <= _TOTAL_BUDGET:
                    return th, tco, 1, False
        return None, None, 1, False

    raw_s = (2 * hout + 2) * w * c * itemsize
    phases_s = 3 * (hout + 1) * w * c * itemsize
    if raw_s + phases_s <= _S_XBUF:
        tco = _pick_tco(c, co, itemsize, 9, _S_WBLOCK)
        if tco is not None and \
                sum(bufs(hout, tco, 9 * c * tco * itemsize)) <= _S_TOTAL:
            if bsz == 1 or pick_l()[0] == hout:
                return hout, tco, 1, True
    return pick_l()


def downsample_supported(x_shape, co: int, itemsize: int = 2) -> bool:
    """Odd/non-÷16 spatial sizes are handled by wrapper zero-padding
    (exact stride-2 conv semantics — the pad region is sliced off and
    masked out of the stats); only channel-count constraints remain."""
    b, h, w, c = x_shape
    if c < 128 or co < 128 or c % 8 or co % 8:
        return False
    if h < 2 or w < 2:
        return False
    th = _pick_tiles_down(_ceil_to(h, 16) // 2, _ceil_to(w, 16),
                          _pad_to_128(c), _pad_to_128(co), itemsize,
                          bsz=b)[0]
    return th is not None


def _down_kernel(w_ref, bias_ref, x_hbm, out_ref, stats_ref, raw, pbuf, sem,
                 *, th, tw, cin, tco, pad_lo, out_dtype, emit_stats, nbuf,
                 mask_h=None, mask_w=None):
    """Stride-2 conv3x3 via input phase decomposition.

    raw: (2th+2, W, C) holding x[2*i*th - pad_lo + k] for k in [0, 2th]
    (boundary rows zeroed); pbuf: (2, 3, th+1, W/2, C) = row-phase rp x
    column-tap dj buffers: pbuf[rp, dj][u, s] = x_row(2u + rp)[2s + dj -
    pad_lo]. Tap (di, dj) of the stride-2 conv is then
    pbuf[di % 2, dj][t + di // 2] — pure slices, like the stride-1 kernel.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)
    nh = pl.num_programs(1)
    w2 = tw // 2
    slot = jax.lax.rem(i, 2) if nbuf == 2 else 0

    def main_dma(ii, sl):
        bi = pl.program_id(0)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(2 * ii * th, 2 * th)],
            raw.at[sl, pl.ds(pad_lo, 2 * th)], sem.at[sl, 0])

    def halo_dma(ii, sl):
        # pad_lo=1: a top halo row; pad_lo=0: a bottom halo row
        bi = pl.program_id(0)
        if pad_lo:
            return pltpu.make_async_copy(
                x_hbm.at[bi, pl.ds(2 * ii * th - 1, 1)],
                raw.at[sl, pl.ds(0, 1)], sem.at[sl, 1])
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(2 * (ii + 1) * th, 1)],
            raw.at[sl, pl.ds(2 * th, 1)], sem.at[sl, 1])

    def halo_needed(ii):
        return (ii > 0) if pad_lo else (ii < nh - 1)

    @pl.when(j == 0)
    def _load():
        if nh == 1:
            @pl.when(i == 0)
            def _only():
                main_dma(0, 0).start()
            main_dma(i, 0).wait()
        elif nbuf == 1:
            main_dma(i, 0).start()

            @pl.when(halo_needed(i))
            def _():
                halo_dma(i, 0).start()

            main_dma(i, 0).wait()

            @pl.when(halo_needed(i))
            def _():
                halo_dma(i, 0).wait()
        else:
            @pl.when(i == 0)
            def _first():
                main_dma(0, 0).start()
                if not pad_lo:
                    halo_dma(0, 0).start()

            main_dma(i, slot).wait()

            @pl.when(halo_needed(i))
            def _():
                halo_dma(i, slot).wait()

            @pl.when(i < nh - 1)
            def _prefetch():
                main_dma(i + 1, 1 - slot).start()

                @pl.when(halo_needed(i + 1))
                def _():
                    halo_dma(i + 1, 1 - slot).start()

        def phase_build(sl):
            # one chunked pass: zero invalid boundary rows, column-shift,
            # and split into the six phase buffers. Even-sized chunks keep
            # whole (even, odd) row pairs together; the fp32 temporaries
            # stay bounded (see _prologue). The garbage buffer row 2th+1
            # flows into pbuf[1, :, th], which no tap ever reads. sl is
            # static (see _kernel.compute).
            dt = raw.dtype
            total = 2 * th + 2
            chunk = max(2,
                        min(total, _CHUNK_BYTES // (4 * tw * cin)) // 2 * 2)
            for k0 in range(0, total, chunk):
                kn = min(chunk, total - k0)
                rc = kn * tw
                xr = raw[sl, pl.ds(k0, kn)].reshape(rc, cin).astype(
                    jnp.float32)
                rows = jax.lax.broadcasted_iota(jnp.int32, (rc, 1), 0)
                if k0 == 0 and pad_lo:
                    # row -1 at the image top
                    xr = jnp.where(jnp.logical_or(rows >= tw, i > 0),
                                   xr, 0.0)
                if k0 + kn == total and not pad_lo:
                    # hi padding: raw row 2th is x[2(i+1)th], invalid at
                    # the last tile (the chunk's second-to-last row)
                    invalid = jnp.logical_and(
                        i == nh - 1,
                        jnp.logical_and(rows >= rc - 2 * tw,
                                        rows < rc - tw))
                    xr = jnp.where(invalid, 0.0, xr)
                cols = jax.lax.rem(rows, tw)
                for dj in range(3):
                    o = dj - pad_lo
                    if o == 0:
                        sh = xr
                    elif o > 0:
                        sh = jnp.where(cols < tw - o,
                                       pltpu.roll(xr, rc - o, 0), 0.0)
                    else:
                        sh = jnp.where(cols >= -o, pltpu.roll(xr, -o, 0),
                                       0.0)
                    ph = sh.reshape(kn // 2, 2, w2, 2, cin)
                    pbuf[0, dj, pl.ds(k0 // 2, kn // 2)] = \
                        ph[:, 0, :, 0].astype(dt)
                    pbuf[1, dj, pl.ds(k0 // 2, kn // 2)] = \
                        ph[:, 1, :, 0].astype(dt)

        if nbuf == 1:
            phase_build(0)
        else:
            @pl.when(slot == 0)
            def _p0():
                phase_build(0)

            @pl.when(slot == 1)
            def _p1():
                phase_build(1)

    acc = jnp.zeros((th * w2, tco), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = pbuf[di % 2, dj, pl.ds(di // 2, th)].reshape(th * w2, cin)
            acc = acc + jnp.dot(xs, w_ref[di, dj],
                                preferred_element_type=jnp.float32)
    acc = acc + bias_ref[0].astype(jnp.float32)
    yo = acc.reshape(th, w2, tco).astype(out_dtype)
    if mask_h is not None or mask_w is not None:
        # spatial padding: zero the pad region so emitted stats stay exact
        m = jnp.full((th, w2, 1), True)
        if mask_h is not None:
            ri = jax.lax.broadcasted_iota(jnp.int32, (th, w2, 1), 0)
            m = jnp.logical_and(m, ri + i * th < mask_h)
        if mask_w is not None:
            ci = jax.lax.broadcasted_iota(jnp.int32, (th, w2, 1), 1)
            m = jnp.logical_and(m, ci < mask_w)
        yo = jnp.where(m, yo, 0)
    out_ref[0] = yo
    if emit_stats:
        yf = yo.astype(jnp.float32)
        stats_ref[0, 0] = jnp.stack([jnp.sum(yf, axis=(0, 1)),
                                     jnp.sum(yf * yf, axis=(0, 1))])


@functools.partial(jax.jit, static_argnames=("pad_lo", "emit_stats",
                                             "interpret"))
def downsample2x_conv3x3(x, w, bias, pad_lo: int = 0,
                         emit_stats: bool = False, interpret: bool = False):
    """Stride-2 conv3x3. pad_lo=0: VAE encoder padding (0,1)x(0,1);
    pad_lo=1: UNet downsample SAME padding (1,1)x(1,1).
    x: (B, H, W, C) -> ((B, H/2, W/2, Co), stats?).
    """
    bsz, hin, tw, c = x.shape
    co_real = w.shape[-1]
    c_pad = _pad_to_128(c)
    co = _pad_to_128(co_real)
    # true output dims from the stride-2 conv formula with (pad_lo, 1)
    # padding (matches torch/lax for odd sizes too)
    hout_real = (hin + pad_lo - 2) // 2 + 1
    wout_real = (tw + pad_lo - 2) // 2 + 1
    hp, wp = _ceil_to(hin, 16), _ceil_to(tw, 16)
    if hin < 2 or tw < 2 or _pick_tiles_down(
            hp // 2, wp, c_pad, co, x.dtype.itemsize, bsz=bsz)[0] is None:
        return _xla_fallback(x, w, bias, None, None, None, None, None,
                             None, None, emit_stats, stride=2,
                             pad_lo=pad_lo)
    if c_pad != c or co != co_real:
        x = _pad_last(x, c_pad)
        w = jnp.pad(w, [(0, 0), (0, 0), (0, c_pad - c), (0, co - co_real)])
        bias = _pad_last(bias, co)
        c = c_pad
    x = _pad_spatial(x, hp, wp)
    hout, w2 = hp // 2, wp // 2
    th, tco, nbuf, big = _pick_tiles_down(hout, wp, c, co,
                                          x.dtype.itemsize, bsz=bsz)
    nh, nco = hout // th, co // tco
    bias2 = bias.reshape(1, co)

    def kernel(w_ref, b_ref, x_hbm, out_ref, *rest):
        stats_ref = rest[0] if emit_stats else None
        raw, pbuf, sem = rest[-3], rest[-2], rest[-1]
        _down_kernel(w_ref, b_ref, x_hbm, out_ref, stats_ref, raw, pbuf,
                     sem, th=th, tw=wp, cin=c, tco=tco, pad_lo=pad_lo,
                     out_dtype=x.dtype, emit_stats=emit_stats, nbuf=nbuf,
                     mask_h=hout_real if hout_real != hout else None,
                     mask_w=wout_real if wout_real != w2 else None)

    in_specs = [
        pl.BlockSpec((3, 3, c, tco), lambda bb, i, j: (0, 0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tco), lambda bb, i, j: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_specs = [pl.BlockSpec((1, th, w2, tco), lambda bb, i, j: (bb, i, 0, j),
                              memory_space=pltpu.VMEM)]
    out_shapes = [_sds((bsz, hout, w2, co), x.dtype, w, bias2, x)]
    if emit_stats:
        out_specs.append(pl.BlockSpec((1, 1, 2, tco),
                                      lambda bb, i, j: (bb, i, 0, j),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            _sds((bsz, nh, 2, co), jnp.float32, w, bias2, x))

    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nh, nco),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shapes if emit_stats else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((nbuf, 2 * th + 2, wp, c), x.dtype),
            pltpu.VMEM((2, 3, th + 1, w2, c), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf, 2)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hout * w2 * 9 * c * co,
            transcendentals=0,
            bytes_accessed=(bsz * hp * wp * c * x.dtype.itemsize
                            + bsz * hout * w2 * co * x.dtype.itemsize
                            + 9 * c * co * w.dtype.itemsize)),
        interpret=interpret,
        **_compiler_params(big),
    )(w.astype(x.dtype), bias2, x)
    y, stats = outs if emit_stats else (outs, None)
    if (hout_real, wout_real) != (hout, w2):
        y = y[:, :hout_real, :wout_real]
    if co != co_real:
        y = y[..., :co_real]
        if stats is not None:
            stats = stats[..., :co_real]
    return y, stats


# ---------------------------------------------------------------------------
# Nearest-2x-upsample + conv3x3, phase-decomposed
# ---------------------------------------------------------------------------


def _fold_upsample_weights(w):
    """(3,3,C,Co) -> (2,2,2,2,C,Co) per-phase 2x2 taps on the LOW-RES input.

    conv3x3 on nearest-2x-upsampled x satisfies, for output pixel
    (2i+a, 2j+b): the three row taps collapse onto input rows {i-1, i}
    (a=0) or {i, i+1} (a=1) with summed weights — and likewise for
    columns. So the whole op is 4 phase convs with 2x2 kernels on x
    directly: 2.25x fewer FLOPs than conv on the upsampled tensor, and x
    is read at low resolution (4x less HBM).
    """
    # fold rows: wr[a, p, j, c, co]
    wr0 = jnp.stack([w[0], w[1] + w[2]])          # a=0: rows (i-1, i)
    wr1 = jnp.stack([w[0] + w[1], w[2]])          # a=1: rows (i, i+1)
    wr = jnp.stack([wr0, wr1])                    # (2, 2, 3, C, Co)
    # fold cols: wf[a, b, p, q, c, co]
    wc0 = jnp.stack([wr[:, :, 0], wr[:, :, 1] + wr[:, :, 2]], axis=2)
    wc1 = jnp.stack([wr[:, :, 0] + wr[:, :, 1], wr[:, :, 2]], axis=2)
    return jnp.stack([wc0, wc1], axis=1)          # (2[a], 2[b], 2[p], 2[q], C, Co)


def _pick_tiles_up(h: int, w: int, c: int, co: int, itemsize: int,
                   skip_c: int = 0, bsz: int = 1):
    """-> (Th, TCo, nbuf, big); same two-regime policy as _pick_tiles."""

    def rest_bytes(th, tco, wbytes):
        prologue = min(3 * (th + 2) * w * c * 4, 3 * _CHUNK_BYTES)
        acc = 4 * th * w * tco * 4
        # out block (2th, 2w, tco) double-buffered + the in-register
        # interleave temporaries (~2 fp32 copies of the tile)
        io = 8 * th * w * tco * itemsize + 8 * th * w * tco * 4
        io += 8 * th * w * skip_c * itemsize  # skip block, double-buffered
        return prologue + 2 * wbytes + acc + io

    def pick_l():
        # NOTE: the stride-1 weight-resident tco policy was A/B'd here too
        # and REGRESSED (journal 2026-08-19 matrix2: up 256^2x256 b1
        # 1218.9 -> 1838.3 us) — the resident pick's bigger accumulator
        # forces a smaller th and the upsample is compute-bound, not
        # weight-stream-bound. Streamed 128-column blocks stay the policy.
        if co % 128 == 0 and 16 * c * 128 * itemsize <= _W_BUDGET:
            tco = 128
        elif 16 * c * co * itemsize <= _W_BUDGET and co % 8 == 0:
            tco = co
        else:
            return None, None, 1, False
        wbytes = 16 * c * tco * itemsize
        for cap in (_M_ROWS, None):
            for th in _divisors_desc(h):
                if cap is not None and th * w > cap:
                    continue
                xbuf = 3 * (th + 2) * w * c * itemsize
                rest = rest_bytes(th, tco, wbytes)
                if 2 * xbuf <= _XBUF_BUDGET \
                        and 2 * xbuf + rest <= _TOTAL_BUDGET:
                    return th, tco, 2, False
            for th in _divisors_desc(h):
                if cap is not None and th * w > cap:
                    continue
                xbuf = 3 * (th + 2) * w * c * itemsize
                rest = rest_bytes(th, tco, wbytes)
                if xbuf <= _XBUF_BUDGET and xbuf + rest <= _TOTAL_BUDGET:
                    return th, tco, 1, False
        return None, None, 1, False

    xbuf_s = 3 * (h + 2) * w * c * itemsize
    if xbuf_s <= _S_XBUF:
        tco = _pick_tco(c, co, itemsize, 16, _S_WBLOCK)
        if tco is not None and \
                xbuf_s + rest_bytes(h, tco, 16 * c * tco * itemsize) \
                <= _S_TOTAL:
            if bsz == 1 or pick_l()[0] == h:
                return h, tco, 1, True
    return pick_l()


def upsample_supported(x_shape, co: int, itemsize: int = 2,
                       skip_c: int = 0) -> bool:
    """Spatial sizes are unconstrained (wrapper zero-pads to ÷8 — exact
    upsample+SAME-conv semantics on the true region); channels must be
    128-multiples (this wrapper does not channel-pad)."""
    b, h, w, c = x_shape
    if c % 128 or co % 128:
        return False
    th = _pick_tiles_up(_ceil_to(h, 8), _ceil_to(w, 8), c, co,
                        itemsize, skip_c=_pad_to_128(skip_c), bsz=b)[0]
    return th is not None and h >= 2


def _up_kernel(w_ref, bias_ref, sk_ref, skw_ref, x_hbm, out_ref, stats_ref,
               xbuf, sem, *, th, tw, cin, tco, out_dtype, emit_stats,
               nbuf, mask_h=None, mask_w=None):
    i = pl.program_id(1)
    j = pl.program_id(2)
    nh = pl.num_programs(1)
    r = (th + 2) * tw
    slot = jax.lax.rem(i, 2) if nbuf == 2 else 0

    def main_dma(ii, sl):
        bi = pl.program_id(0)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ii * th, th)],
            xbuf.at[sl, 1, pl.ds(1, th)], sem.at[sl, 0])

    def top_dma(ii, sl):
        bi = pl.program_id(0)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ii * th - 1, 1)],
            xbuf.at[sl, 1, pl.ds(0, 1)], sem.at[sl, 1])

    def bot_dma(ii, sl):
        bi = pl.program_id(0)
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds((ii + 1) * th, 1)],
            xbuf.at[sl, 1, pl.ds(th + 1, 1)], sem.at[sl, 2])

    @pl.when(j == 0)
    def _load():
        if nh == 1:
            @pl.when(i == 0)
            def _only():
                main_dma(0, 0).start()
            main_dma(i, 0).wait()
        elif nbuf == 1:
            main_dma(i, 0).start()

            @pl.when(i > 0)
            def _():
                top_dma(i, 0).start()

            @pl.when(i < nh - 1)
            def _():
                bot_dma(i, 0).start()

            main_dma(i, 0).wait()

            @pl.when(i > 0)
            def _():
                top_dma(i, 0).wait()

            @pl.when(i < nh - 1)
            def _():
                bot_dma(i, 0).wait()
        else:
            @pl.when(i == 0)
            def _first():
                main_dma(0, 0).start()
                bot_dma(0, 0).start()

            main_dma(i, slot).wait()

            @pl.when(i > 0)
            def _():
                top_dma(i, slot).wait()

            @pl.when(i < nh - 1)
            def _():
                bot_dma(i, slot).wait()

            @pl.when(i < nh - 1)
            def _prefetch():
                main_dma(i + 1, 1 - slot).start()
                top_dma(i + 1, 1 - slot).start()

                @pl.when(i + 1 < nh - 1)
                def _():
                    bot_dma(i + 1, 1 - slot).start()

        if nbuf == 1:
            _prologue(xbuf.at[0], None, None, th=th, tw=tw, cin=cin,
                      normalize=False, act=None)
        else:
            @pl.when(slot == 0)
            def _pr0():
                _prologue(xbuf.at[0], None, None, th=th, tw=tw, cin=cin,
                          normalize=False, act=None)

            @pl.when(slot == 1)
            def _pr1():
                _prologue(xbuf.at[1], None, None, th=th, tw=tw, cin=cin,
                          normalize=False, act=None)

    def compute(sl):
        # static slot (see _kernel.compute)
        bias = bias_ref[0].astype(jnp.float32)
        phases = []
        for a in range(2):
            for b2 in range(2):
                acc = jnp.zeros((th * tw, tco), jnp.float32)
                for p in range(2):
                    for q in range(2):
                        # row offset: a=0 -> {-1, 0}; a=1 -> {0, +1} (xbuf
                        # rows are global rows s-1+k, so di = a + p); col
                        # shift dj = b + q indexes (left, center, right)
                        xs = xbuf[sl, b2 + q, pl.ds(a + p, th)].reshape(
                            th * tw, cin)
                        acc = acc + jnp.dot(
                            xs, w_ref[a, b2, p, q],
                            preferred_element_type=jnp.float32)
                phases.append((acc + bias).reshape(th, tw, tco)
                              .astype(out_dtype))
        # interleave in VMEM: out[2t+a, 2s+b] = phase[2a+b][t, s] — a
        # tile-local relayout instead of an XLA full-tensor reshape copy
        r0 = jnp.stack([phases[0], phases[1]],
                       axis=2).reshape(th, 2 * tw, tco)
        r1 = jnp.stack([phases[2], phases[3]],
                       axis=2).reshape(th, 2 * tw, tco)
        out = jnp.stack([r0, r1], axis=1).reshape(2 * th, 2 * tw, tco)
        if sk_ref is not None:
            # epilogue 1x1-conv skip fusion at output resolution
            csk = sk_ref.shape[-1]
            skm = jnp.dot(sk_ref[0].reshape(4 * th * tw, csk), skw_ref[...],
                          preferred_element_type=jnp.float32)
            out = out + skm.reshape(2 * th, 2 * tw, tco).astype(out_dtype)
        if mask_h is not None or mask_w is not None:
            # spatial padding: zero the pad region so emitted stats stay
            # exact (masks are in OUTPUT coordinates, 2x the input's)
            m = jnp.full((2 * th, 2 * tw, 1), True)
            if mask_h is not None:
                ri = jax.lax.broadcasted_iota(
                    jnp.int32, (2 * th, 2 * tw, 1), 0)
                m = jnp.logical_and(m, ri + i * 2 * th < mask_h)
            if mask_w is not None:
                ci = jax.lax.broadcasted_iota(
                    jnp.int32, (2 * th, 2 * tw, 1), 1)
                m = jnp.logical_and(m, ci < mask_w)
            out = jnp.where(m, out, 0)
        out_ref[0] = out
        if emit_stats:
            of = out.astype(jnp.float32)
            stats_ref[0, 0] = jnp.stack([jnp.sum(of, axis=(0, 1)),
                                         jnp.sum(of * of, axis=(0, 1))])

    if nbuf == 1:
        compute(0)
    else:
        @pl.when(slot == 0)
        def _c0():
            compute(0)

        @pl.when(slot == 1)
        def _c1():
            compute(1)


@functools.partial(jax.jit, static_argnames=("emit_stats", "interpret"))
def upsample2x_conv3x3(x, w, bias, skip_x=None, skip_w=None,
                       emit_stats: bool = False, interpret: bool = False):
    """conv3x3_same(nearest_upsample_2x(x)) + bias as 4 phase convs.

    x: (B, H, W, C); w: (3,3,C,Co); returns ((B, 2H, 2W, Co), stats) where
    stats is (B, n_tiles, 2, Co) output partial sums when emit_stats (for
    combine_stats chaining into the next GroupNorm) else None.
    skip_x (B, 2H, 2W, Csk) / skip_w (Csk, Co): epilogue 1x1-conv skip
    added to the output (gamma folded into skip_w by the caller).
    """
    bsz, h, wd, c = x.shape
    co = w.shape[-1]
    csk = 0 if skip_x is None else skip_x.shape[-1]
    hp, wp = _ceil_to(h, 8), _ceil_to(wd, 8)
    th, tco, nbuf, big = _pick_tiles_up(hp, wp, c, co, x.dtype.itemsize,
                                        skip_c=csk, bsz=bsz)
    if th is None or h < 2:
        up = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _xla_fallback(up, w, bias, None, None, None, None,
                             skip_x, skip_w, None, emit_stats)
    x = _pad_spatial(x, hp, wp)
    if skip_x is not None:
        skip_x = _pad_spatial(skip_x, 2 * hp, 2 * wp)
    nh, nco = hp // th, co // tco
    wf = _fold_upsample_weights(w.astype(x.dtype))
    bias2 = bias.reshape(1, co)

    in_specs = [
        pl.BlockSpec((2, 2, 2, 2, c, tco), lambda bb, i, j: (0, 0, 0, 0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tco), lambda bb, i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    args = [wf, bias2]
    if skip_x is not None:
        in_specs.append(pl.BlockSpec((1, 2 * th, 2 * wp, csk),
                                     lambda bb, i, j: (bb, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(skip_x)
        in_specs.append(pl.BlockSpec((csk, tco), lambda bb, i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(skip_w.astype(x.dtype))
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    args.append(x)
    out_specs = [pl.BlockSpec((1, 2 * th, 2 * wp, tco),
                              lambda bb, i, j: (bb, i, 0, j),
                              memory_space=pltpu.VMEM)]
    out_shapes = [_sds((bsz, 2 * hp, 2 * wp, co), x.dtype, *args)]
    if emit_stats:
        out_specs.append(pl.BlockSpec((1, 1, 2, tco),
                                      lambda bb, i, j: (bb, i, 0, j),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            _sds((bsz, nh, 2, co), jnp.float32, *args))

    def kernel(*refs):
        pos = 2
        sk = refs[pos] if skip_x is not None else None
        skw = refs[pos + 1] if skip_x is not None else None
        pos += 2 * (skip_x is not None)
        x_hbm = refs[pos]
        out_ref = refs[pos + 1]
        stats_ref = refs[pos + 2] if emit_stats else None
        xbuf, sem = refs[-2], refs[-1]
        _up_kernel(refs[0], refs[1], sk, skw, x_hbm, out_ref, stats_ref,
                   xbuf, sem, th=th, tw=wp, cin=c, tco=tco,
                   out_dtype=x.dtype, emit_stats=emit_stats, nbuf=nbuf,
                   mask_h=2 * h if hp != h else None,
                   mask_w=2 * wd if wp != wd else None)

    outs = pl.pallas_call(
        kernel,
        grid=(bsz, nh, nco),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shapes if emit_stats else out_shapes[0],
        scratch_shapes=[
            pltpu.VMEM((nbuf, 3, th + 2, wp, c), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * hp * wp * 16 * c * co,
            transcendentals=0,
            bytes_accessed=(bsz * hp * wp * (c + 4 * co) * x.dtype.itemsize
                            + 16 * c * co * w.dtype.itemsize)),
        interpret=interpret,
        **_compiler_params(big),
    )(*args)
    y, stats = outs if emit_stats else (outs, None)
    if (hp, wp) != (h, wd):
        y = y[:, :2 * h, :2 * wd]
    return y, stats


def combine_stats(partials, scale, bias, num_groups: int, eps: float,
                  count: int):
    """(B, n_tiles, 2, C) partial sums -> folded GroupNorm affine (a, b).

    count = number of elements per channel (H*W of the stats source).
    """
    bsz, _, _, c = partials.shape
    cg = c // num_groups
    sums = jnp.sum(partials, axis=1)                       # (B, 2, C)
    g = jnp.sum(sums.reshape(bsz, 2, num_groups, cg), axis=-1)
    n = count * cg
    mean = g[:, 0] / n
    var = jnp.maximum(g[:, 1] / n - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    scale_g = scale.astype(jnp.float32).reshape(num_groups, cg)
    bias_g = bias.astype(jnp.float32).reshape(num_groups, cg)
    a = inv[..., None] * scale_g[None]
    bterm = bias_g[None] - mean[..., None] * a
    return a.reshape(bsz, c), bterm.reshape(bsz, c)
