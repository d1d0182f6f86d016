"""Checkpoint download utilities (reference model.py:57-73 parity).

The published img2img-turbo checkpoints live at
https://www.cs.cmu.edu/~img2img-turbo/models/ (reference
pix2pix_turbo.py:48,82; cyclegan_turbo.py:127-145). This module downloads
them when the environment has egress; the CLIs fall back to a clear
"place the file here" message otherwise.
"""

from __future__ import annotations

import os

BASE_URL = "https://www.cs.cmu.edu/~img2img-turbo/models/"

MODEL_FILES = {
    "edge_to_image": "edge_to_image_loras.pkl",
    "sketch_to_image_stochastic": "sketch_to_image_stochastic_lora.pkl",
    "day_to_night": "day2night.pkl",
    "night_to_day": "night2day.pkl",
    "clear_to_rainy": "clear2rainy.pkl",
    "rainy_to_clear": "rainy2clear.pkl",
}


def download_url(url: str, outf: str, chunk_size: int = 1 << 20) -> str:
    """Streaming HTTP download with progress (reference model.py:57-73)."""
    if os.path.exists(outf):
        print(f"Skipping download, {outf} already exists")
        return outf
    import urllib.request

    print(f"Downloading checkpoint to {outf}")
    os.makedirs(os.path.dirname(os.path.abspath(outf)), exist_ok=True)
    tmp = outf + ".partial"
    with urllib.request.urlopen(url) as resp, open(tmp, "wb") as f:
        total = int(resp.headers.get("Content-Length", 0))
        done = 0
        while True:
            chunk = resp.read(chunk_size)
            if not chunk:
                break
            f.write(chunk)
            done += len(chunk)
            if total:
                print(f"\r{done / total:6.1%}", end="", flush=True)
    print()
    os.replace(tmp, outf)
    print(f"Downloaded successfully to {outf}")
    return outf


def get_checkpoint(name: str, ckpt_folder: str = "checkpoints") -> str:
    """Resolve a named model to a local pkl, downloading when possible."""
    fname = MODEL_FILES[name]
    outf = os.path.join(ckpt_folder, fname)
    if os.path.exists(outf):
        return outf
    try:
        return download_url(BASE_URL + fname, outf)
    except OSError as e:
        raise FileNotFoundError(
            f"checkpoint {outf} not found and download failed ({e}); "
            f"fetch {BASE_URL}{fname} on a machine with network access and "
            f"place it at {outf}") from e
