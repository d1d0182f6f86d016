"""InceptionV3 feature extractor for FID (clean-fid / pytorch-fid exact).

Replaces the `clean-fid` dependency (reference train_pix2pix_turbo.py:152-163,
291-296; train_cyclegan_turbo.py:89-125,339-376). Architecture is the FID
InceptionV3: BasicConv2d = conv + frozen BatchNorm(eps=1e-3) + ReLU,
Mixed_5b..7c, global average pool -> 2048-d pool3 features. BatchNorm is
folded to an affine (scale, bias) at conversion time — inference-only, so
the fold is exact.

Published-FID comparability requires the TF-ported model's quirks, which
differ from torchvision's `inception_v3` in exactly two ways (pytorch-fid
`FIDInceptionA/C/E`; clean-fid `inception_pytorch.py` is the same port):

- every in-block 3x3 avg pool uses count_include_pad=False (`_avgpool3`
  divides by the real window count at the borders), and
- Mixed_7c's pool branch is a MAX pool (`FIDInceptionE_2` — reproducing a
  bug in the original TF graph), while Mixed_7b keeps the avg pool.

`fid_variant=False` switches both back to torchvision semantics.

Weight-source matrix for `convert_inception_state_dict` (both use
torchvision module naming, so one converter covers both):

| source                                   | quirks needed | classes fc |
|------------------------------------------|---------------|-----------|
| pt_inception-2015-12-05 (pytorch-fid /   | fid_variant   | 1008      |
|   clean-fid FID_WEIGHTS_URL)             | =True         | (ignored) |
| torchvision inception_v3 IMAGENET1K      | =False        | 1000      |

Random init keeps the metric structurally exercisable offline; the
layer-for-layer torch-mirror golden lives in tests/test_metrics.py.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from img2img_turbo_tpu.models import layers as L


def _init_bconv(key, cin, cout, k, stride=1, padding=0):
    """BasicConv2d: conv (no bias) + folded-BN affine."""
    if isinstance(k, int):
        k = (k, k)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    kern = jax.random.normal(key, (k[0], k[1], cin, cout)) * (
        1.0 / np.sqrt(cin * k[0] * k[1]))
    return {"kernel": kern, "scale": jnp.ones((cout,)),
            "bias": jnp.zeros((cout,)), "stride": stride, "pad": padding}


def _bconv(p, x):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (p["stride"], p["stride"]),
        list(p["pad"]), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return jax.nn.relu(y)


def _maxpool(x, k=3, s=2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, k, k, 1),
                                 (1, s, s, 1), "VALID")


def _avgpool3(x):
    """3x3 stride-1 SAME avg pool with count_include_pad=False semantics
    (divide by the REAL window size at borders) — the FID TF-port variant
    shared by every in-block pool branch."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    c = jax.lax.reduce_window(jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), "SAME")
    return s / c


def init_inception(key) -> Dict:
    ks = iter(jax.random.split(key, 200))

    def nk():
        return next(ks)

    p: Dict = {}
    p["Conv2d_1a_3x3"] = _init_bconv(nk(), 3, 32, 3, stride=2)
    p["Conv2d_2a_3x3"] = _init_bconv(nk(), 32, 32, 3)
    p["Conv2d_2b_3x3"] = _init_bconv(nk(), 32, 64, 3, padding=1)
    p["Conv2d_3b_1x1"] = _init_bconv(nk(), 64, 80, 1)
    p["Conv2d_4a_3x3"] = _init_bconv(nk(), 80, 192, 3)

    def inception_a(cin, pool_features):
        return {
            "branch1x1": _init_bconv(nk(), cin, 64, 1),
            "branch5x5_1": _init_bconv(nk(), cin, 48, 1),
            "branch5x5_2": _init_bconv(nk(), 48, 64, 5, padding=2),
            "branch3x3dbl_1": _init_bconv(nk(), cin, 64, 1),
            "branch3x3dbl_2": _init_bconv(nk(), 64, 96, 3, padding=1),
            "branch3x3dbl_3": _init_bconv(nk(), 96, 96, 3, padding=1),
            "branch_pool": _init_bconv(nk(), cin, pool_features, 1),
        }

    p["Mixed_5b"] = inception_a(192, 32)
    p["Mixed_5c"] = inception_a(256, 64)
    p["Mixed_5d"] = inception_a(288, 64)

    p["Mixed_6a"] = {
        "branch3x3": _init_bconv(nk(), 288, 384, 3, stride=2),
        "branch3x3dbl_1": _init_bconv(nk(), 288, 64, 1),
        "branch3x3dbl_2": _init_bconv(nk(), 64, 96, 3, padding=1),
        "branch3x3dbl_3": _init_bconv(nk(), 96, 96, 3, stride=2),
    }

    def inception_c(c7):
        return {
            "branch1x1": _init_bconv(nk(), 768, 192, 1),
            "branch7x7_1": _init_bconv(nk(), 768, c7, 1),
            "branch7x7_2": _init_bconv(nk(), c7, c7, (1, 7),
                                       padding=((0, 0), (3, 3))),
            "branch7x7_3": _init_bconv(nk(), c7, 192, (7, 1),
                                       padding=((3, 3), (0, 0))),
            "branch7x7dbl_1": _init_bconv(nk(), 768, c7, 1),
            "branch7x7dbl_2": _init_bconv(nk(), c7, c7, (7, 1),
                                          padding=((3, 3), (0, 0))),
            "branch7x7dbl_3": _init_bconv(nk(), c7, c7, (1, 7),
                                          padding=((0, 0), (3, 3))),
            "branch7x7dbl_4": _init_bconv(nk(), c7, c7, (7, 1),
                                          padding=((3, 3), (0, 0))),
            "branch7x7dbl_5": _init_bconv(nk(), c7, 192, (1, 7),
                                          padding=((0, 0), (3, 3))),
            "branch_pool": _init_bconv(nk(), 768, 192, 1),
        }

    p["Mixed_6b"] = inception_c(128)
    p["Mixed_6c"] = inception_c(160)
    p["Mixed_6d"] = inception_c(160)
    p["Mixed_6e"] = inception_c(192)

    p["Mixed_7a"] = {
        "branch3x3_1": _init_bconv(nk(), 768, 192, 1),
        "branch3x3_2": _init_bconv(nk(), 192, 320, 3, stride=2),
        "branch7x7x3_1": _init_bconv(nk(), 768, 192, 1),
        "branch7x7x3_2": _init_bconv(nk(), 192, 192, (1, 7),
                                     padding=((0, 0), (3, 3))),
        "branch7x7x3_3": _init_bconv(nk(), 192, 192, (7, 1),
                                     padding=((3, 3), (0, 0))),
        "branch7x7x3_4": _init_bconv(nk(), 192, 192, 3, stride=2),
    }

    def inception_e(cin):
        return {
            "branch1x1": _init_bconv(nk(), cin, 320, 1),
            "branch3x3_1": _init_bconv(nk(), cin, 384, 1),
            "branch3x3_2a": _init_bconv(nk(), 384, 384, (1, 3),
                                        padding=((0, 0), (1, 1))),
            "branch3x3_2b": _init_bconv(nk(), 384, 384, (3, 1),
                                        padding=((1, 1), (0, 0))),
            "branch3x3dbl_1": _init_bconv(nk(), cin, 448, 1),
            "branch3x3dbl_2": _init_bconv(nk(), 448, 384, 3, padding=1),
            "branch3x3dbl_3a": _init_bconv(nk(), 384, 384, (1, 3),
                                           padding=((0, 0), (1, 1))),
            "branch3x3dbl_3b": _init_bconv(nk(), 384, 384, (3, 1),
                                           padding=((1, 1), (0, 0))),
            "branch_pool": _init_bconv(nk(), cin, 192, 1),
        }

    p["Mixed_7b"] = inception_e(1280)
    p["Mixed_7c"] = inception_e(2048)
    return p


def _run_a(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b5 = _bconv(p["branch5x5_2"], _bconv(p["branch5x5_1"], x))
    b3 = _bconv(p["branch3x3dbl_3"], _bconv(p["branch3x3dbl_2"],
                                            _bconv(p["branch3x3dbl_1"], x)))
    bp = _bconv(p["branch_pool"], _avgpool3(x))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _run_b(p, x):
    b3 = _bconv(p["branch3x3"], x)
    bd = _bconv(p["branch3x3dbl_3"], _bconv(p["branch3x3dbl_2"],
                                            _bconv(p["branch3x3dbl_1"], x)))
    bp = _maxpool(x)
    return jnp.concatenate([b3, bd, bp], axis=-1)


def _run_c(p, x):
    b1 = _bconv(p["branch1x1"], x)
    b7 = _bconv(p["branch7x7_3"], _bconv(p["branch7x7_2"],
                                         _bconv(p["branch7x7_1"], x)))
    bd = x
    for name in ["branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
                 "branch7x7dbl_4", "branch7x7dbl_5"]:
        bd = _bconv(p[name], bd)
    bp = _bconv(p["branch_pool"], _avgpool3(x))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _run_d(p, x):
    b3 = _bconv(p["branch3x3_2"], _bconv(p["branch3x3_1"], x))
    b7 = x
    for name in ["branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
                 "branch7x7x3_4"]:
        b7 = _bconv(p[name], b7)
    bp = _maxpool(x)
    return jnp.concatenate([b3, b7, bp], axis=-1)


def _maxpool3_same(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 1, 1, 1), "SAME")


def _run_e(p, x, pool="avg"):
    """pool="max" is the FIDInceptionE_2 (Mixed_7c) TF-bug reproduction."""
    b1 = _bconv(p["branch1x1"], x)
    b3 = _bconv(p["branch3x3_1"], x)
    b3 = jnp.concatenate([_bconv(p["branch3x3_2a"], b3),
                          _bconv(p["branch3x3_2b"], b3)], axis=-1)
    bd = _bconv(p["branch3x3dbl_2"], _bconv(p["branch3x3dbl_1"], x))
    bd = jnp.concatenate([_bconv(p["branch3x3dbl_3a"], bd),
                          _bconv(p["branch3x3dbl_3b"], bd)], axis=-1)
    pooled = _maxpool3_same(x) if pool == "max" else _avgpool3(x)
    bp = _bconv(p["branch_pool"], pooled)
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def split_static(params):
    """Split the param tree into (arrays-only pytree, static config tree).

    The stride/pad ints must not cross a jit boundary as pytree leaves
    (they'd become tracers and conv padding requires Python ints)."""
    if isinstance(params, dict):
        if "kernel" in params:
            arrays = {k: params[k] for k in ("kernel", "scale", "bias")}
            static = {"stride": params["stride"], "pad": params["pad"]}
            return arrays, static
        arrs, stats = {}, {}
        for k, v in params.items():
            arrs[k], stats[k] = split_static(v)
        return arrs, stats
    raise TypeError(type(params))


def merge_static(arrays, static):
    if "kernel" in arrays:
        return {**arrays, **static}
    return {k: merge_static(arrays[k], static[k]) for k in arrays}


def make_feature_fn(params):
    """jit-safe feature extractor: arrays as traced args, config static."""
    import functools
    arrays, static = split_static(params)

    @functools.partial(jax.jit, static_argnames=("fid_variant",))
    def fn(arrs, images_unit, fid_variant=True):
        return inception_features(merge_static(arrs, static), images_unit,
                                  fid_variant=fid_variant)

    return functools.partial(fn, arrays)


def inception_features(params, images_unit,
                       fid_variant: bool = True) -> jax.Array:
    """images_unit: (B, 299, 299, 3) floats in [0, 1] (clean-fid feeds
    uint8/255 then scales internally to [-1, 1]). Returns (B, 2048).

    fid_variant: TF-port pooling quirks (see module docstring) — keep True
    for published-FID comparability with pt_inception weights."""
    x = images_unit * 2.0 - 1.0
    x = _bconv(params["Conv2d_1a_3x3"], x)
    x = _bconv(params["Conv2d_2a_3x3"], x)
    x = _bconv(params["Conv2d_2b_3x3"], x)
    x = _maxpool(x)
    x = _bconv(params["Conv2d_3b_1x1"], x)
    x = _bconv(params["Conv2d_4a_3x3"], x)
    x = _maxpool(x)
    x = _run_a(params["Mixed_5b"], x)
    x = _run_a(params["Mixed_5c"], x)
    x = _run_a(params["Mixed_5d"], x)
    x = _run_b(params["Mixed_6a"], x)
    x = _run_c(params["Mixed_6b"], x)
    x = _run_c(params["Mixed_6c"], x)
    x = _run_c(params["Mixed_6d"], x)
    x = _run_c(params["Mixed_6e"], x)
    x = _run_d(params["Mixed_7a"], x)
    x = _run_e(params["Mixed_7b"], x)
    x = _run_e(params["Mixed_7c"], x,
               pool="max" if fid_variant else "avg")
    return jnp.mean(x, axis=(1, 2))


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision inception_v3 state dict -> our folded-BN pytree."""
    shapes = init_inception(jax.random.PRNGKey(0))

    def fold(prefix, proto):
        w = sd[prefix + ".conv.weight"]
        gamma = sd[prefix + ".bn.weight"]
        beta = sd[prefix + ".bn.bias"]
        mean = sd[prefix + ".bn.running_mean"]
        var = sd[prefix + ".bn.running_var"]
        eps = 1e-3
        scale = gamma / np.sqrt(var + eps)
        return {"kernel": jnp.asarray(
            np.ascontiguousarray(w.transpose(2, 3, 1, 0))),
            "scale": jnp.asarray(scale),
            "bias": jnp.asarray(beta - mean * scale),
            "stride": proto["stride"], "pad": proto["pad"]}

    def walk(proto, prefix):
        if "kernel" in proto:
            return fold(prefix, proto)
        return {k: walk(v, f"{prefix}.{k}" if prefix else k)
                for k, v in proto.items()}

    return walk(shapes, "")
