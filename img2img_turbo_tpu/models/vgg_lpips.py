"""VGG16 + LPIPS perceptual distance in JAX.

Replaces the `lpips.LPIPS(net='vgg')` dependency the reference uses as both
a training loss and an eval metric (train_pix2pix_turbo.py:75,179 /
train_cyclegan_turbo.py:136-138). Structure mirrors the LPIPS reference
implementation: inputs in [-1, 1], per-channel shift/scale normalization,
VGG16 features at relu1_2/relu2_2/relu3_3/relu4_3/relu5_3, channel-unit
normalization, trained 1x1 linear heads, spatial mean, sum over layers.

Weights: `convert_lpips_state_dict` ingests the torch `lpips` package's
state dict (vgg slices + lin heads) when available; `init_vgg_lpips` gives
random weights for offline testing (metric is then only structurally valid).
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.models import layers as L

# VGG16 conv plan: (out_channels, layers) per block; maxpool between blocks
_VGG_PLAN = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# LPIPS input normalization (from the LPIPS reference implementation)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_vgg16(key) -> Dict:
    blocks = []
    in_ch = 3
    for out_ch, n_layers in _VGG_PLAN:
        convs = []
        for _ in range(n_layers):
            key, sub = jax.random.split(key)
            convs.append(L.init_conv2d(sub, in_ch, out_ch, 3))
            in_ch = out_ch
        blocks.append(convs)
    return {"blocks": blocks}


def vgg16_features(params, x) -> List[jax.Array]:
    """x: (B, H, W, 3) already LPIPS-normalized. Returns the 5 relu
    activations LPIPS taps (last relu of each block)."""
    feats = []
    h = x
    for i, convs in enumerate(params["blocks"]):
        if i > 0:
            # 2x2 max pool stride 2
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        for conv in convs:
            h = jax.nn.relu(L.conv2d(conv, h))
        feats.append(h)
    return feats


def init_vgg_lpips(key) -> Dict:
    k1, k2 = jax.random.split(key)
    vgg = init_vgg16(k1)
    lins = []
    for i, (ch, _) in enumerate(_VGG_PLAN):
        k2, sub = jax.random.split(k2)
        # LPIPS lin heads: 1x1 conv, no bias, non-negative in the official
        # weights; random-abs init keeps the metric a proper distance
        lins.append({"kernel": jnp.abs(
            jax.random.normal(sub, (1, 1, ch, 1)) * 0.1)})
    return {"vgg": vgg, "lins": lins}


def _normalize_input(x):
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    return (x - shift) / scale


def _unit_normalize(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(jnp.square(f.astype(jnp.float32)), axis=-1,
                            keepdims=True))
    return (f / (norm + eps).astype(f.dtype))


def lpips(params, x, y) -> jax.Array:
    """LPIPS distance between x and y, both (B, H, W, 3) in [-1, 1].
    Returns (B,) distances."""
    fx = vgg16_features(params["vgg"], _normalize_input(x))
    fy = vgg16_features(params["vgg"], _normalize_input(y))
    total = 0.0
    for f1, f2, lin in zip(fx, fy, params["lins"]):
        d = jnp.square(_unit_normalize(f1) - _unit_normalize(f2))
        val = L.conv2d(lin, d.astype(jnp.float32))
        total = total + jnp.mean(val, axis=(1, 2, 3))
    return total


# ---------------------------------------------------------------------------
# torch `lpips` package weight ingestion
# ---------------------------------------------------------------------------


def load_lpips_weights(path: str) -> Dict:
    """Single-file ingestion of a torch `lpips.LPIPS(net='vgg')` state dict
    (keys 'net.sliceK.I.weight' + 'linN.model.1.weight'), or a dict
    {"vgg": torchvision features sd, "lins": lpips lin sd}."""
    from img2img_turbo_tpu.weights.torch_import import load_torch_pickle
    sd = load_torch_pickle(path)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "vgg" in sd and "lins" in sd:
        return convert_lpips_state_dict(sd["vgg"], sd["lins"])
    vgg_sd, lin_sd = {}, {}
    for k, v in sd.items():
        if k.startswith("net.slice"):
            # 'net.slice1.2.weight' -> 'features.2.weight' (lpips names
            # submodules by the original torchvision features index)
            idx_name = k.split(".", 2)[2]
            vgg_sd[f"features.{idx_name}"] = v
        elif k.startswith("lin"):
            lin_sd[k] = v
        elif k.startswith("features."):
            vgg_sd[k] = v
    if not lin_sd:
        raise ValueError(f"{path}: no lpips lin-head weights found "
                         "(expected 'linN.model.1.weight' keys)")
    return convert_lpips_state_dict(vgg_sd, lin_sd)


def convert_lpips_state_dict(vgg_sd: Dict[str, np.ndarray],
                             lin_sd: Dict[str, np.ndarray]) -> Dict:
    """vgg_sd: torchvision vgg16.features state dict (keys like
    'features.0.weight'); lin_sd: lpips lin heads ('lin0.model.1.weight')."""
    # torchvision features indices of convs per block
    conv_idx = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    blocks = []
    for idxs in conv_idx:
        convs = []
        for i in idxs:
            w = vgg_sd[f"features.{i}.weight"]
            b = vgg_sd[f"features.{i}.bias"]
            convs.append({"kernel": jnp.asarray(
                np.ascontiguousarray(w.transpose(2, 3, 1, 0))),
                "bias": jnp.asarray(b)})
        blocks.append(convs)
    lins = []
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"]  # (1, C, 1, 1)
        lins.append({"kernel": jnp.asarray(
            np.ascontiguousarray(w.transpose(2, 3, 1, 0)))})
    return {"vgg": {"blocks": blocks}, "lins": lins}
