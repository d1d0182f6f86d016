"""Varying-mesh-axes threading for Pallas calls under `jax.shard_map`.

`parallel.mesh.dp_shard_map` runs whole single-device programs — Pallas
kernels included — per data shard. With shard_map's default
`check_vma=True` (the varying-axes analysis that verifies replication
discipline, which we keep ON), every `pallas_call` must declare how its
outputs vary across mesh axes. A kernel's outputs vary over exactly the
union of its operands' varying axes (kernels are per-shard-local: no
collectives inside), so `sds` derives that union from the operands.

Outside shard_map, `jax.typeof(x).vma` is the empty frozenset and the
struct behaves exactly like a plain `jax.ShapeDtypeStruct`.
"""

from __future__ import annotations

import jax


def sds(shape, dtype, *operands) -> jax.ShapeDtypeStruct:
    """`jax.ShapeDtypeStruct` whose vma is the union of the operands'."""
    vma = frozenset()
    for o in operands:
        vma = vma | jax.typeof(o).vma
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
