"""Device mesh + sharding rules.

The reference's entire distribution story is accelerate/NCCL DDP
(train_pix2pix_turbo.py:28-32,120-123; NCCL_P2P_DISABLE=1 in
docs/training_cyclegan_turbo.md:47). The TPU-native replacement is a
`jax.sharding.Mesh` with a `data` axis (DP over ICI; gradient psum emitted
by XLA from sharding annotations alone) and an optional `model` axis for
tensor parallelism (channel/head sharding of the UNet for >1-chip serving
latency — beyond reference capability, SURVEY.md §2c).

No backend env vars, no wrapper layer: sharding annotations replace the
whole accelerate stack. Multi-host would extend the same mesh over DCN via
jax.distributed; process-0 gating is `jax.process_index() == 0`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Multi-host init (jax.distributed over DCN). On single-host setups
    this is a no-op; on pods, call before any jax op. Replaces the
    reference's torch.distributed/NCCL process-group init (hidden inside
    accelerate, train_pix2pix_turbo.py:28-32)."""
    import jax

    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    return jax.process_index() == 0  # main-process gating flag


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """(data, model) mesh. Defaults to all devices on the data axis.

    Pure — no global kernel toggling. Data-parallel programs keep the
    Pallas kernel engine by running the step through `dp_shard_map`
    (per-shard single-device kernels, the TPU-native analog of the
    reference's DDP scaling its cuDNN kernels untouched,
    train_pix2pix_turbo.py:120-123). Only tensor-parallel pjit graphs
    (n_model > 1) must trace the pure-XLA paths — Pallas custom calls are
    not partitionable by XLA's SPMD pass; use `kernels_scope(mesh)`."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"requested {n_data}x{n_model} mesh but only {len(devices)} devices")
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def kernels_scope(mesh: Mesh):
    """Scoped FUSED_KERNELS setting for tracing a program that XLA's SPMD
    pass will partition over `mesh`: kernels stay ON for data-only meshes
    (shard_map'd paths) and single-device meshes, OFF when the model axis
    is sharded (enter the scope around jit tracing)."""
    from img2img_turbo_tpu.models import layers

    return layers.fused_kernels_scope(mesh.shape[MODEL_AXIS] == 1)


def dp_shard_map_fn(fn, mesh: Mesh, batch_argnums, rng_argnums=(),
                    out_specs=None, pmean_outputs=False):
    """Generic data-parallel shard_map: run `fn` per-shard over the mesh's
    data axis so the single-device program — Pallas kernels included —
    executes on each shard's local batch slice. The TPU-native analog of
    the reference's DDP scaling its cuDNN kernels untouched
    (train_pix2pix_turbo.py:120-123); unlike annotation-DP this keeps
    ops/fused_conv.py engaged (Pallas calls are opaque to XLA's SPMD pass).

    Args at `batch_argnums` are batch-leading pytrees sharded over data
    (batch size must divide the axis); args at `rng_argnums` are PRNG keys,
    folded with the shard index so per-sample draws differ across shards;
    everything else replicates. `out_specs` defaults to P(data) (batch-
    leading outputs); pass P() for replicated outputs (requires the fn to
    make them shard-invariant, e.g. via pmean). pmean_outputs=True pmeans
    the whole output tree (scalar metrics) before returning it replicated.
    """
    batch_argnums = set(batch_argnums)
    rng_argnums = set(rng_argnums)
    if out_specs is None:
        out_specs = P() if pmean_outputs else P(DATA_AXIS)

    def wrapped(*args):
        args = list(args)
        if rng_argnums:
            idx = jax.lax.axis_index(DATA_AXIS)
            for r in rng_argnums:
                args[r] = jax.random.fold_in(args[r], idx)
        out = fn(*args)
        if pmean_outputs:
            out = jax.lax.pmean(out, DATA_AXIS)
        return out

    def runner(*args):
        in_specs = tuple(
            P(DATA_AXIS) if i in batch_argnums else P()
            for i in range(len(args)))
        f = jax.shard_map(wrapped, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
        return f(*args)

    return runner


def dp_shard_map(step_fn, mesh: Mesh, batch_argnums=(3,), rng_argnums=(4,)):
    """DP wrapper for a train step `(state, frozen, aux_frozen, batch, rng)
    -> (state, metrics)`. The step must have been built with
    `axis_name=DATA_AXIS` (training/paired.py, training/unpaired.py) so
    gradients/metrics are pmean'd across shards BEFORE each optimizer
    update — the returned state is then identical on every shard and the
    replicated out_specs P() is verified by shard_map's varying-axes
    analysis."""
    return dp_shard_map_fn(step_fn, mesh, batch_argnums, rng_argnums,
                           out_specs=P())




def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(tree, mesh: Mesh):
    """Device-put a pytree of batch-leading arrays, sharded over data."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh: Mesh):
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


# ---------------------------------------------------------------------------
# Tensor-parallel param sharding rules (optional `model` axis)
# ---------------------------------------------------------------------------


def _tp_spec_for(path_keys: Tuple[str, ...], leaf) -> P:
    """Channel-sharding heuristic for UNet/VAE param trees:

    - attention to_q/to_k/to_v kernels: shard output dim (head-parallel)
    - attention to_out kernels: shard input dim (row-parallel; psum fuses)
    - conv kernels: shard output channels; biases follow their kernel
    - norms / small tensors: replicated
    """
    keys = [str(k) for k in path_keys]
    name = keys[-1]
    parent = keys[-2] if len(keys) >= 2 else ""
    if leaf.ndim == 2:
        if parent in ("to_q", "to_k", "to_v") or parent in ("proj", "fc1"):
            return P(None, MODEL_AXIS) if name == "kernel" else P(MODEL_AXIS)
        if parent in ("to_out", "out", "fc2"):
            return P(MODEL_AXIS, None) if name == "kernel" else P()
    if leaf.ndim == 4 and name == "kernel" and leaf.shape[-1] % 2 == 0:
        return P(None, None, None, MODEL_AXIS)
    # norms, biases, embeddings: replicated (cheap relative to matmul weights)
    return P()


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = False):
    """NamedSharding tree for params: replicated by default, channel-sharded
    over the model axis when tensor_parallel (and the axis size > 1)."""
    if not tensor_parallel or mesh.shape[MODEL_AXIS] == 1:
        s = replicated(mesh)
        return jax.tree_util.tree_map(lambda _: s, params)

    def to_sharding(path, leaf):
        keys = tuple(getattr(k, "key", getattr(k, "idx", k)) for k in path)
        spec = _tp_spec_for(keys, leaf)
        # only shard dims divisible by the axis size
        n = mesh.shape[MODEL_AXIS]
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % n != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)
