"""Serving engine + demo logic tests (tiny configs, CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from PIL import Image

from img2img_turbo_tpu import configs
from img2img_turbo_tpu.models import unet as unet_mod, vae as vae_mod
from img2img_turbo_tpu.pipelines import pix2pix as p2p
from img2img_turbo_tpu.serving import demo as demo_mod
from img2img_turbo_tpu.serving.engine import ServingEngine


@pytest.fixture(scope="module")
def tiny_params():
    cfgs = p2p.GeneratorConfigs(unet=configs.TINY_UNET,
                                vae=configs.TINY_VAE, text=configs.TINY_TEXT)
    params = {
        "unet": unet_mod.init_unet(jax.random.PRNGKey(0), cfgs.unet),
        "vae": vae_mod.init_vae(jax.random.PRNGKey(1), cfgs.vae),
    }
    return cfgs, params


class TestEngine:
    def test_uint8_roundtrip_edge_mode(self, tiny_params):
        cfgs, params = tiny_params
        eng = ServingEngine(params, cfgs, mode="edge_to_image",
                            dtype=jnp.float32, donate_input=False)
        ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim))
        img = np.random.RandomState(0).randint(
            0, 255, (1, 64, 64, 3), np.uint8)
        out = eng(img, ctx)
        assert out.shape == (1, 64, 64, 3)
        assert out.dtype == jnp.uint8

    def test_image_mode_and_batch_broadcast(self, tiny_params):
        cfgs, params = tiny_params
        eng = ServingEngine(params, cfgs, mode="image", dtype=jnp.float32,
                            donate_input=False)
        ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim))
        img = np.zeros((3, 64, 64, 3), np.uint8)
        out = eng(img, ctx)
        assert out.shape == (3, 64, 64, 3)

    def test_unknown_mode_raises(self, tiny_params):
        cfgs, params = tiny_params
        with pytest.raises(ValueError, match="unknown serving mode"):
            ServingEngine(params, cfgs, mode="nope")

    def test_sketch_mode_stochastic(self, tiny_params):
        from img2img_turbo_tpu import lora as lora_mod
        from img2img_turbo_tpu.models import unet as unet_mod

        cfgs, params = tiny_params
        base = {"unet": unet_mod.make_twin_conv_in(dict(params["unet"])),
                "vae": params["vae"]}
        lora = {
            "unet": lora_mod.init_lora(
                jax.random.PRNGKey(2), base["unet"],
                lora_mod.LoRASpec(2, ("to_q",)), "unet"),
            "vae": lora_mod.init_lora(
                jax.random.PRNGKey(3), base["vae"],
                lora_mod.LoRASpec(2, ("to_q",)), "vae"),
        }
        eng = ServingEngine(cfgs=cfgs, mode="sketch", dtype=jnp.float32,
                            donate_input=False, base=base, lora=lora)
        ctx = jnp.zeros((1, 77, cfgs.unet.cross_attention_dim))
        sketch = np.zeros((1, 64, 64, 3), np.uint8)
        o1 = eng(sketch, ctx, rng=jax.random.PRNGKey(0), r=0.3)
        o2 = eng(sketch, ctx, rng=jax.random.PRNGKey(0), r=0.8)
        o3 = eng(sketch, ctx, rng=jax.random.PRNGKey(9), r=0.3)
        assert o1.shape == (1, 64, 64, 3) and o1.dtype == jnp.uint8
        # r changes the output; seed changes the noise map
        assert np.abs(o1.astype(int) - o2.astype(int)).max() > 0
        assert np.abs(o1.astype(int) - o3.astype(int)).max() > 0


class TestDemos:
    @pytest.fixture(scope="class")
    def pipe(self):
        cfgs = p2p.GeneratorConfigs(unet=configs.TINY_UNET,
                                    vae=configs.TINY_VAE,
                                    text=configs.TINY_TEXT)
        pipe = p2p.Pix2PixTurbo.from_random(jax.random.PRNGKey(0),
                                            cfgs=cfgs).merge()
        # text path: use a fixed caption embedding instead of a tokenizer
        d = cfgs.unet.cross_attention_dim
        pipe._prompt_cache = {}
        pipe.encode_prompt = lambda prompt: jnp.zeros((1, 77, d))
        return pipe

    def test_style_templates_match_reference_surface(self):
        assert len(demo_mod.STYLE_LIST) == 9
        assert demo_mod.DEFAULT_STYLE == "Fantasy art"
        out = demo_mod.apply_style("Manga", "a cat")
        assert out.startswith("manga style a cat")

    def test_canny_demo_process(self, pipe):
        img = Image.fromarray(np.random.RandomState(0).randint(
            0, 255, (70, 66, 3), np.uint8))  # non-x8 size: demo crops
        edges, out = demo_mod.CannyDemo(pipe).process(img, "p", 100, 200)
        assert out.size == (64, 64)
        assert edges.size == (64, 64)

    def test_sketch_demo_run_stochastic(self, pipe):
        from img2img_turbo_tpu.models import unet as unet_mod
        pipe.base["unet"] = unet_mod.make_twin_conv_in(pipe.base["unet"])
        sketch = Image.fromarray(
            (np.random.RandomState(1).rand(64, 64, 3) > 0.5).astype(np.uint8)
            * 255)
        out = demo_mod.SketchDemo(pipe).run(sketch, "a dog", "Anime", 42,
                                            0.4)
        assert out.size == (64, 64)

    def test_launch_without_gradio_raises_cleanly(self, pipe):
        import importlib
        if importlib.util.find_spec("gradio") is not None:
            pytest.skip("gradio installed")
        with pytest.raises(RuntimeError, match="gradio is not installed"):
            demo_mod.launch_canny_demo(pipe)


class TestWebDemo:
    """Headless smoke of the standalone (gradio-free) canvas demo server."""

    def test_page_and_sketch_api_roundtrip(self, request):
        import base64
        import io
        import json
        import urllib.request

        import jax
        import jax.numpy as jnp
        from PIL import Image

        from img2img_turbo_tpu.models import unet as unet_mod
        from img2img_turbo_tpu.serving import web_demo

        # build the tiny stochastic pipe inline (mirrors TestDemos.pipe)
        cfgs = p2p.GeneratorConfigs(unet=configs.TINY_UNET,
                                    vae=configs.TINY_VAE,
                                    text=configs.TINY_TEXT)
        pipe = p2p.Pix2PixTurbo.from_random(jax.random.PRNGKey(0),
                                            cfgs=cfgs).merge()
        d = cfgs.unet.cross_attention_dim
        pipe._prompt_cache = {}
        pipe.encode_prompt = lambda prompt: jnp.zeros((1, 77, d))
        pipe.base["unet"] = unet_mod.make_twin_conv_in(pipe.base["unet"])

        server, port = web_demo.launch_in_thread(pipe)
        try:
            page = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30).read().decode()
            # the reference demo's tool surface, served without gradio
            for control in ("pencil", "eraser", "undo", "clear",
                            "dl-sketch", "dl-output", "rand", "Fantasy art"):
                assert control in page

            img = Image.new("RGB", (64, 64), "white")
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            data_url = ("data:image/png;base64,"
                        + base64.b64encode(buf.getvalue()).decode())
            body = json.dumps({"image": data_url, "prompt": "a cat",
                               "style": "Anime", "seed": 3, "r": 0.5}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/sketch", data=body,
                headers={"Content-Type": "application/json"})
            out = json.loads(urllib.request.urlopen(req, timeout=300).read())
            assert "image" in out, out
            out_img = Image.open(io.BytesIO(
                base64.b64decode(out["image"].split(",", 1)[1])))
            assert out_img.size == (64, 64)

            # canny canvas UI (gradio_canny2image.py:30-78 tool surface):
            # upload/drop target, threshold sliders 1-255 step 10, edge
            # viz + output panels, wired to the /api/canny endpoint
            cpage = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/canny", timeout=30).read().decode()
            for control in ('id="drop"', 'id="low"', 'id="high"',
                            'min="1"', 'max="255"', 'step="10"',
                            'id="edges"', 'id="outimg"', "/api/canny"):
                assert control in cpage, control
            body = json.dumps({"image": data_url, "prompt": "a cat",
                               "low": 100, "high": 200}).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/canny", data=body,
                headers={"Content-Type": "application/json"})
            out = json.loads(urllib.request.urlopen(req, timeout=300).read())
            assert "edges" in out and "image" in out, out
        finally:
            server.shutdown()
