"""Weight converter round-trip tests: export our params to diffusers-style
torch state dicts (via the lora.py naming map) and re-ingest them through
weights/torch_import — the converted tree must match the original exactly.
This pins both the name mapping and the layout transposes without needing
the actual HF files."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from img2img_turbo_tpu import configs, lora as lora_mod
from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.weights import torch_import as ti


def _tree_equal(a, b, path=""):
    if isinstance(a, dict):
        assert set(a) == set(b), f"{path}: keys {set(a)} != {set(b)}"
        for k in a:
            _tree_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, (list, tuple)):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _tree_equal(x, y, f"{path}[{i}]")
    else:
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=path)


def _export_torch_sd(params, model: str):
    """Our pytree -> {diffusers name: torch-layout numpy}, including norms
    (named via the module map for kernels; norms handled by walking)."""
    sd = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            if "kernel" in tree:
                name = lora_mod.NAME_FNS[model](path)
                assert name is not None, f"unmapped module at {path}"
                k = np.asarray(tree["kernel"])
                sd[name + ".weight"] = (k.transpose(3, 2, 0, 1)
                                        if k.ndim == 4 else k.T)
                if "bias" in tree:
                    sd[name + ".bias"] = np.asarray(tree["bias"])
                return
            if "scale" in tree:  # norm
                name = _norm_name(path, model)
                sd[name + ".weight"] = np.asarray(tree["scale"])
                sd[name + ".bias"] = np.asarray(tree["bias"])
                return
            for key, v in tree.items():
                walk(v, path + (key,))
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                walk(v, path + (i,))

    walk(params, ())
    return sd


def _norm_name(path, model):
    """diffusers norm-module names (not covered by the LoRA map, which only
    names targetable conv/linear modules)."""
    p = [str(x) for x in path]
    side = ""
    if model == "vae":
        side = p[0] + "."
        p = p[1:]
    out = []
    i = 0
    while i < len(p):
        tok = p[i]
        if tok == "down":
            out.append(f"down_blocks.{p[i + 1]}")
            i += 2
        elif tok == "up":
            out.append(f"up_blocks.{p[i + 1]}")
            i += 2
        elif tok == "mid":
            out.append("mid_block")
            i += 1
        elif tok == "resnets":
            out.append(f"resnets.{p[i + 1]}")
            i += 2
        elif tok in ("res1", "res2"):
            out.append(f"resnets.{0 if tok == 'res1' else 1}")
            i += 1
        elif tok == "attns":
            out.append(f"attentions.{p[i + 1]}")
            i += 2
        elif tok == "attn":
            out.append("attentions.0")
            i += 1
        elif tok == "norm_out":
            out.append("conv_norm_out")
            i += 1
        elif tok == "norm" and out and "attentions" in out[-1]:
            # transformer input GN / vae attn group_norm
            out.append("group_norm" if model == "vae" else "norm")
            i += 1
        elif tok in ("norm1", "norm2", "norm3"):
            # transformer LNs live under transformer_blocks.0
            if model == "unet" and "attentions" in (out[-1] if out else ""):
                out.append(f"transformer_blocks.0.{tok}")
            else:
                out.append(tok)
            i += 1
        else:
            out.append(tok)
            i += 1
    return side + ".".join(out)


class TestUNetRoundTrip:
    def test_export_import_identity(self):
        cfg = configs.TINY_UNET
        params = unet_mod.init_unet(jax.random.PRNGKey(0), cfg)
        sd = _export_torch_sd(params, "unet")
        # a few spot checks that naming matches diffusers conventions
        assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1." \
            "to_q.weight" in sd
        assert "down_blocks.0.downsamplers.0.conv.weight" in sd
        assert "time_embedding.linear_1.weight" in sd
        assert "mid_block.resnets.0.norm1.weight" in sd
        assert "conv_norm_out.weight" in sd
        back = ti.convert_unet_state_dict(sd, cfg)
        _tree_equal(params, back)


class TestVAERoundTrip:
    def test_export_import_identity(self):
        cfg = configs.TINY_VAE
        params = vae_mod.init_vae(jax.random.PRNGKey(0), cfg)
        sd = _export_torch_sd(params, "vae")
        assert "encoder.down_blocks.0.resnets.0.conv1.weight" in sd
        assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in sd
        assert "decoder.skip_conv_1.weight" in sd
        assert "encoder.mid_block.attentions.0.to_q.weight" in sd
        assert "quant_conv.weight" in sd
        back = ti.convert_vae_state_dict(sd, cfg)
        _tree_equal(params, back)
