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


CLIP_TOKENIZER_URLS = {
    # the sd-turbo tokenizer the reference loads via AutoTokenizer
    # (reference src/pix2pix_turbo.py:32); plain HTTPS, no hub client needed
    "vocab.json": ("https://huggingface.co/stabilityai/sd-turbo/"
                   "resolve/main/tokenizer/vocab.json"),
    "merges.txt": ("https://huggingface.co/stabilityai/sd-turbo/"
                   "resolve/main/tokenizer/merges.txt"),
}


def get_clip_tokenizer(dest: str = "checkpoints/clip_tokenizer") -> str:
    """Fetch the CLIP tokenizer files (vocab.json + merges.txt) to `dest`.

    Offline fallback: CLIPTokenizer.from_dir(dest) also accepts a lone
    merges file — including OpenAI's bpe_simple_vocab_16e6.txt.gz — and
    derives the vocabulary from it (models/tokenizer.vocab_from_merges),
    so any locally available CLIP BPE merge list unblocks tokenization.
    """
    os.makedirs(dest, exist_ok=True)
    have_any = any(
        os.path.exists(os.path.join(dest, f))
        for f in ("vocab.json", "merges.txt", "merges.txt.gz",
                  "bpe_simple_vocab_16e6.txt.gz"))
    try:
        for fname, url in CLIP_TOKENIZER_URLS.items():
            download_url(url, os.path.join(dest, fname))
    except Exception as e:
        if not have_any:
            raise RuntimeError(
                f"could not download the CLIP tokenizer ({e}); place "
                f"vocab.json+merges.txt (or a CLIP BPE merges file such as "
                f"bpe_simple_vocab_16e6.txt.gz) in {dest}") from e
    return dest
