"""LoRA as a parameter-tree transformation (peft equivalent).

The reference relies on `peft.LoraConfig` + `add_adapter` with torch-module
target lists (/root/reference/src/pix2pix_turbo.py:137-155,
src/cyclegan_turbo.py:48-106). Here LoRA is a pytree mirroring the base
params: each adapted module gets {"a", "b"} factors, and

    merge(base, lora, scale) = W + scale * (alpha / rank) * B @ A

is a pure tree function. For serving, merge once and run the dense graph;
for training and for the stochastic-sketch path (runtime LoRA scale r,
reference pix2pix_turbo.py:206-207) merge *inside* jit with a traced scale —
XLA fuses the rank-r update into the weight load, one compiled program for
every r.

Target-module matching reproduces peft's suffix-on-dot-boundary semantics
over diffusers-style module names, so the target lists stored inside
reference checkpoints (e.g. "to_q", "conv", "ff.net.0.proj") select exactly
the same modules. `torch_module_name` maps this framework's tree paths to
those names (the inverse of weights/torch_import.py).

Conv LoRA follows peft's Conv2d factorization: A is a (kh, kw, in, r) conv,
B is a 1x1 (r, out) projection; delta kernel = einsum('hwir,ro->hwio').
Default lora_alpha is 8 (peft's default — note pix2pix VAE rank 4 therefore
trains with scale 2, while CycleGAN passes lora_alpha=rank for scale 1).
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LoRASpec:
    rank: int
    target_modules: Tuple[str, ...]
    alpha: float = 8.0  # peft LoraConfig default

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


# reference target lists (pix2pix_turbo.py:137-152, cyclegan_turbo.py:52,99)
PIX2PIX_UNET_TARGETS = (
    "to_k", "to_q", "to_v", "to_out.0", "conv", "conv1", "conv2",
    "conv_shortcut", "conv_out", "proj_in", "proj_out", "ff.net.2",
    "ff.net.0.proj")
PIX2PIX_VAE_TARGETS = (
    "conv1", "conv2", "conv_in", "conv_shortcut", "conv", "conv_out",
    "skip_conv_1", "skip_conv_2", "skip_conv_3", "skip_conv_4",
    "to_k", "to_q", "to_v", "to_out.0")
CYCLEGAN_UNET_GREP = (
    "to_k", "to_q", "to_v", "to_out.0", "conv", "conv1", "conv2", "conv_in",
    "conv_shortcut", "conv_out", "proj_out", "proj_in", "ff.net.2",
    "ff.net.0.proj")
CYCLEGAN_VAE_TARGETS = PIX2PIX_VAE_TARGETS


def matches_target(name: str, targets: Sequence[str]) -> bool:
    """peft semantics: module name equals a target or ends with '.<target>'."""
    for t in targets:
        if name == t or name.endswith("." + t):
            return True
    return False


# ---------------------------------------------------------------------------
# Tree path -> diffusers-style module name
# ---------------------------------------------------------------------------


def _attn_part(rest: List) -> Optional[str]:
    if not rest:
        return ""
    head, tail = rest[0], rest[1:]
    if head == "to_out":
        return "to_out.0"
    if head in ("to_q", "to_k", "to_v"):
        return head
    if head == "ff":
        return {"proj": "ff.net.0.proj", "out": "ff.net.2"}[tail[0]]
    return None


def _transformer_name(rest: List) -> Optional[str]:
    """Name inside a Transformer2D attention dict."""
    head = rest[0]
    if head in ("proj_in", "proj_out"):
        return head
    if head in ("attn1", "attn2"):
        part = _attn_part(rest[1:])
        return None if part is None else f"transformer_blocks.0.{head}.{part}"
    if head == "ff":
        return "transformer_blocks.0." + _attn_part(rest)
    return None  # norms


def unet_torch_name(path: Tuple) -> Optional[str]:
    """diffusers UNet2DConditionModel module name for a tree path ending at a
    kernel-bearing module; None for non-targetable modules (norms etc.)."""
    p = list(path)
    if p == ["conv_in"] or p == ["conv_in", "current"]:
        return "conv_in"
    if p == ["conv_in", "pretrained"]:
        return None  # frozen twin never adapted
    if p == ["conv_out"]:
        return "conv_out"
    if p[0] == "time_mlp":
        return {"lin1": "time_embedding.linear_1",
                "lin2": "time_embedding.linear_2"}[p[1]]
    if p[0] in ("down", "up"):
        prefix = {"down": "down_blocks", "up": "up_blocks"}[p[0]]
        i = p[1]
        if p[2] == "resnets":
            j, leaf = p[3], p[4]
            if leaf.startswith("norm"):
                return None
            return f"{prefix}.{i}.resnets.{j}.{leaf}"
        if p[2] == "attns":
            j = p[3]
            inner = _transformer_name(p[4:])
            return None if inner is None else f"{prefix}.{i}.attentions.{j}.{inner}"
        if p[2] == "downsample":
            return f"down_blocks.{i}.downsamplers.0.conv"
        if p[2] == "upsample":
            return f"up_blocks.{i}.upsamplers.0.conv"
    if p[0] == "mid":
        if p[1] in ("res1", "res2"):
            leaf = p[2]
            if leaf.startswith("norm"):
                return None
            idx = 0 if p[1] == "res1" else 1
            return f"mid_block.resnets.{idx}.{leaf}"
        if p[1] == "attn":
            inner = _transformer_name(p[2:])
            return None if inner is None else f"mid_block.attentions.0.{inner}"
    return None


def vae_torch_name(path: Tuple) -> Optional[str]:
    """diffusers AutoencoderKL module name for a tree path."""
    p = list(path)
    if p[0] in ("quant_conv", "post_quant_conv"):
        return p[0]
    side = p[0]  # "encoder" | "decoder"
    if side not in ("encoder", "decoder"):
        return None
    q = p[1:]
    if q == ["conv_in"]:
        return f"{side}.conv_in"
    if q == ["conv_out"]:
        return f"{side}.conv_out"
    if q[0] == "skip_convs":
        return f"{side}.skip_conv_{q[1] + 1}"
    if q[0] in ("down", "up"):
        prefix = {"down": "down_blocks", "up": "up_blocks"}[q[0]]
        i = q[1]
        if q[2] == "resnets":
            leaf = q[4]
            if leaf.startswith("norm"):
                return None
            return f"{side}.{prefix}.{i}.resnets.{q[3]}.{leaf}"
        if q[2] == "downsample":
            return f"{side}.down_blocks.{i}.downsamplers.0.conv"
        if q[2] == "upsample":
            return f"{side}.up_blocks.{i}.upsamplers.0.conv"
    if q[0] == "mid":
        if q[1] in ("res1", "res2"):
            leaf = q[2]
            if leaf.startswith("norm"):
                return None
            idx = 0 if q[1] == "res1" else 1
            return f"{side}.mid_block.resnets.{idx}.{leaf}"
        if q[1] == "attn":
            if q[2] == "norm":
                return None
            part = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                    "to_out": "to_out.0"}[q[2]]
            return f"{side}.mid_block.attentions.0.{part}"
    return None


NAME_FNS = {"unet": unet_torch_name, "vae": vae_torch_name}


def iter_modules(params, path=()):
    """Yield (path, module_dict) for every kernel-bearing module."""
    if isinstance(params, dict):
        if "kernel" in params:
            yield path, params
            return
        for k, v in params.items():
            yield from iter_modules(v, path + (k,))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            yield from iter_modules(v, path + (i,))


def module_names(params, model: str) -> Dict[str, Tuple]:
    """{diffusers module name: tree path} for all targetable modules."""
    name_fn = NAME_FNS[model]
    out = {}
    for path, _ in iter_modules(params):
        name = name_fn(path)
        if name is not None:
            out[name] = path
    return out


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


# ---------------------------------------------------------------------------
# Init / merge
# ---------------------------------------------------------------------------


def init_lora(key, base_params, spec: LoRASpec, model: str):
    """Create a LoRA tree for all modules matching spec.target_modules.

    peft 'gaussian' init: A ~ N(0, 1/r^2)? — peft uses std=1/r for gaussian
    init; B = 0, so merge(base, lora) == base at init.
    Returns {"modules": {name: {"a","b"}}, stored flat by module name to keep
    the tree stable across adapters}, plus spec data.
    """
    names = module_names(base_params, model)
    modules = {}
    for name, path in sorted(names.items()):
        if not matches_target(name, spec.target_modules):
            continue
        kernel = _get(base_params, path)["kernel"]
        key, sub = jax.random.split(key)
        if kernel.ndim == 4:
            kh, kw, cin, cout = kernel.shape
            a = jax.random.normal(sub, (kh, kw, cin, spec.rank),
                                  jnp.float32) * (1.0 / spec.rank)
            b = jnp.zeros((spec.rank, cout), jnp.float32)
        else:
            cin, cout = kernel.shape
            a = jax.random.normal(sub, (cin, spec.rank),
                                  jnp.float32) * (1.0 / spec.rank)
            b = jnp.zeros((spec.rank, cout), jnp.float32)
        modules[name] = {"a": a, "b": b}
    return {"rank": spec.rank, "alpha": spec.alpha, "modules": modules}


def lora_delta(entry, kernel_shape):
    """Dense delta-kernel from LoRA factors (no alpha scaling)."""
    a, b = entry["a"], entry["b"]
    if len(kernel_shape) == 4:
        return jnp.einsum("hwir,ro->hwio", a, b,
                          preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def merge_lora(base_params, lora, scale=1.0, model: str = "unet"):
    """base + scale * (alpha/rank) * BA for every adapted module.

    `scale` may be a traced scalar (the stochastic path's runtime r).
    Returns a new tree; unadapted leaves are shared, not copied.
    """
    names = module_names(base_params, model)
    # deep-copy container structure only
    new = jax.tree_util.tree_map(lambda x: x, base_params)
    s = lora["alpha"] / lora["rank"]
    for name, entry in lora["modules"].items():
        path = names[name]
        mod = dict(_get(new, path))
        delta = lora_delta(entry, mod["kernel"].shape)
        mod["kernel"] = (mod["kernel"]
                         + (jnp.asarray(scale, delta.dtype) * s * delta
                            ).astype(mod["kernel"].dtype))
        _set(new, path, mod)
    return new


def merge_multi(base_params, loras: Sequence, scale=1.0, model: str = "unet"):
    """Apply several adapters (CycleGAN's encoder/decoder/others trio)."""
    out = base_params
    for lora in loras:
        out = merge_lora(out, lora, scale, model)
    return out


# ---------------------------------------------------------------------------
# Reference-pkl ingestion (schemas: pix2pix_turbo.py:221-229 /
# train_cyclegan_turbo.py:293-307)
# ---------------------------------------------------------------------------


def _to_a(w: np.ndarray):
    """torch lora_A weight -> our 'a'."""
    if w.ndim == 4:  # (r, in, kh, kw) conv
        return jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 1, 0)))
    return jnp.asarray(np.ascontiguousarray(w.T))  # (r, in) -> (in, r)


def _to_b(w: np.ndarray):
    """torch lora_B weight -> our 'b' (always (r, out))."""
    if w.ndim == 4:  # (out, r, 1, 1)
        return jnp.asarray(np.ascontiguousarray(w[:, :, 0, 0].T))
    return jnp.asarray(np.ascontiguousarray(w.T))


_LORA_RE = re.compile(r"^(.*)\.lora_([AB])\.([^.]+)\.weight$")


def lora_from_torch_state_dict(sd: Dict[str, np.ndarray], rank: int,
                               alpha: Optional[float] = None,
                               adapter: Optional[str] = None):
    """Build a LoRA tree from peft-style keys
    `<module>.lora_{A,B}.<adapter>.weight`. Non-LoRA keys are ignored.

    peft state dicts from `get_peft_model_state_dict` drop the adapter name
    (`<module>.lora_A.weight`); both forms are accepted.
    """
    modules: Dict[str, Dict[str, jnp.ndarray]] = {}
    alt_re = re.compile(r"^(.*)\.lora_([AB])\.weight$")
    for k, v in sd.items():
        m = _LORA_RE.match(k)
        name_adapter = None
        if m:
            name, ab, name_adapter = m.group(1), m.group(2), m.group(3)
        else:
            m = alt_re.match(k)
            if not m:
                continue
            name, ab = m.group(1), m.group(2)
        if adapter is not None and name_adapter is not None \
                and name_adapter != adapter:
            continue
        # strip peft wrapper prefixes if present
        name = name.replace(".base_layer", "")
        entry = modules.setdefault(name, {})
        entry["a" if ab == "A" else "b"] = (
            _to_a(v) if ab == "A" else _to_b(v))
    for name, entry in modules.items():
        assert "a" in entry and "b" in entry, f"incomplete LoRA pair: {name}"
    return {"rank": rank, "alpha": float(alpha if alpha is not None else 8.0),
            "modules": modules}


def overlay_base_weights(base_params, sd: Dict[str, np.ndarray], model: str):
    """Overlay plain (non-LoRA) torch weights from a reference checkpoint
    onto base params — e.g. the retrained conv_in and the skip convs
    (save filter at pix2pix_turbo.py:226-228). Returns the new tree and the
    list of overlaid module names."""
    names = module_names(base_params, model)
    new = jax.tree_util.tree_map(lambda x: x, base_params)
    applied = []
    for k, v in sd.items():
        if ".lora_" in k or not k.endswith((".weight", ".bias")):
            continue
        name = k.rsplit(".", 1)[0].replace(".base_layer", "")
        field = k.rsplit(".", 1)[1]
        if name not in names:
            continue
        path = names[name]
        mod = dict(_get(new, path))
        if field == "weight":
            if v.ndim == 4:
                mod["kernel"] = jnp.asarray(
                    np.ascontiguousarray(v.transpose(2, 3, 1, 0)))
            else:
                mod["kernel"] = jnp.asarray(np.ascontiguousarray(v.T))
        else:
            mod["bias"] = jnp.asarray(v)
        _set(new, path, mod)
        applied.append(k)
    return new, applied
