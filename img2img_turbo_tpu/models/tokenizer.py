"""Pure-Python CLIP BPE tokenizer (host-side; no torch, no transformers).

Equivalent of the `AutoTokenizer.from_pretrained("stabilityai/sd-turbo",
subfolder="tokenizer")` the reference uses (src/pix2pix_turbo.py:32) with
`max_length=77, padding="max_length", truncation=True`
(src/pix2pix_turbo.py:191-192). Implements the byte-level CLIP BPE with
</w> word-end markers, lowercasing and whitespace cleanup; loads standard
HF `vocab.json` + `merges.txt` files from a local directory.

SD 2.x / SD-Turbo pads with "!" (id 0); bos/eos are <|startoftext|> /
<|endoftext|>. Tokenization is a one-time host-side step — prompt embeddings
are cached and fed to the compiled TPU graph.
"""

from __future__ import annotations

import functools
import gzip
import html
import json
import os
import re
from typing import List, Sequence, Union

import numpy as np


@functools.lru_cache()
def bytes_to_unicode():
    """GPT-2/CLIP reversible byte→unicode mapping."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _get_pairs(word):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


def _whitespace_clean(text: str) -> str:
    text = re.sub(r"\s+", " ", text)
    return text.strip()


def _load_merges(merges_path: str) -> List[str]:
    """Merge lines from an HF merges.txt(.gz) or OpenAI's
    bpe_simple_vocab_16e6.txt.gz (truncated to CLIP's 48894 merges,
    openai/CLIP simple_tokenizer.py:68)."""
    if merges_path.endswith(".gz"):
        with gzip.open(merges_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
    else:
        with open(merges_path, encoding="utf-8") as f:
            lines = f.read().split("\n")
    if lines and (lines[0].startswith("#")
                  or len(lines[0].split()) != 2):
        lines = lines[1:]
    merges = [m for m in lines if m and len(m.split()) == 2]
    if merges_path.endswith("bpe_simple_vocab_16e6.txt.gz"):
        merges = merges[:49152 - 256 - 2]
    return merges


class CLIPTokenizer:
    """CLIP BPE tokenizer with the HF CLIPTokenizer call surface we need."""

    def __init__(self, vocab_path: str, merges_path: str,
                 model_max_length: int = 77, pad_token: str = "!"):
        # fall back to a non-\p pattern if `regex` is unavailable
        try:
            import regex
            self._pat = regex.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
                r"""[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""", regex.IGNORECASE)
        except ImportError:
            self._pat = re.compile(
                r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
                r"""[a-zA-Z]+|[0-9]|[^\sa-zA-Z0-9]+""", re.IGNORECASE)
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        with open(vocab_path, encoding="utf-8") as f:
            self.encoder = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        merges = [tuple(m.split()) for m in _load_merges(merges_path)]
        self.bpe_ranks = dict(zip(merges, range(len(merges))))
        self.cache = {"<|startoftext|>": "<|startoftext|>",
                      "<|endoftext|>": "<|endoftext|>"}
        self.bos_token_id = self.encoder["<|startoftext|>"]
        self.eos_token_id = self.encoder["<|endoftext|>"]
        self.pad_token = pad_token
        self.pad_token_id = self.encoder.get(pad_token, self.eos_token_id)
        self.model_max_length = model_max_length
        # HF registers pad/bos/eos as *special* tokens: literal occurrences
        # in the text are split out before BPE (so "!!" with pad "!" becomes
        # two bare pad ids, not "! !</w>")
        self.special_tokens = {
            "<|startoftext|>": self.bos_token_id,
            "<|endoftext|>": self.eos_token_id,
            pad_token: self.pad_token_id,
        }
        self._special_re = re.compile(
            "(" + "|".join(re.escape(t) for t in
                           sorted(self.special_tokens, key=len,
                                  reverse=True)) + ")")

    @classmethod
    def from_dir(cls, path: str, **kw) -> "CLIPTokenizer":
        """Load from a directory holding either the HF pair
        (vocab.json + merges.txt) or only a merges file — including
        OpenAI's single-file `bpe_simple_vocab_16e6.txt.gz` — from which
        the vocab is derived (see vocab_from_merges)."""
        vocab = os.path.join(path, "vocab.json")
        for cand in ("merges.txt", "merges.txt.gz",
                     "bpe_simple_vocab_16e6.txt.gz"):
            merges = os.path.join(path, cand)
            if os.path.exists(merges):
                break
        if os.path.exists(vocab):
            return cls(vocab, merges, **kw)
        if not os.path.exists(merges):
            raise FileNotFoundError(
                f"no vocab.json or merges file in {path}; fetch with "
                "img2img_turbo_tpu.utils.download.get_clip_tokenizer() on "
                "a machine with network access")
        import tempfile

        derived = vocab_from_merges(merges)
        tmp = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
        json.dump(derived, tmp)
        tmp.close()
        try:
            return cls(tmp.name, merges, **kw)
        finally:
            os.unlink(tmp.name)

    def bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs,
                         key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def _encode_plain(self, text: str) -> List[int]:
        ids: List[int] = []
        for token in self._pat.findall(text):
            token = "".join(self.byte_encoder[b]
                            for b in token.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return ids

    def encode_text(self, text: str) -> List[int]:
        """Raw BPE ids (special-token literals split out first), no
        bos/eos wrapping."""
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        ids: List[int] = []
        for piece in self._special_re.split(text):
            if not piece:
                continue
            if piece in self.special_tokens:
                ids.append(self.special_tokens[piece])
            else:
                ids.extend(self._encode_plain(piece))
        return ids

    def __call__(self, text: Union[str, Sequence[str]],
                 max_length: int = None, padding: str = "max_length",
                 truncation: bool = True) -> np.ndarray:
        """Returns (B, max_length) int32 ids with bos/eos/pad, matching
        HF CLIPTokenizer(..., padding='max_length', truncation=True)."""
        if isinstance(text, str):
            text = [text]
        max_length = max_length or self.model_max_length
        out = np.full((len(text), max_length), self.pad_token_id, np.int32)
        for i, t in enumerate(text):
            ids = self.encode_text(t)
            if truncation:
                ids = ids[: max_length - 2]
            ids = [self.bos_token_id] + ids + [self.eos_token_id]
            out[i, : len(ids)] = ids
        return out

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[i] for i in ids
                       if i not in (self.bos_token_id,))
        text = bytearray(self.byte_decoder[c] for c in text).decode(
            "utf-8", errors="replace")
        return text.replace("</w>", " ").replace("<|endoftext|>", "").strip()


def vocab_from_merges(merges_path: str) -> dict:
    """Reconstruct the CLIP vocab.json mapping from a merges file.

    The CLIP vocabulary is fully determined by its merge list (OpenAI
    clip/simple_tokenizer.py builds it the same way): the 256 byte symbols,
    the 256 end-of-word variants, one token per merge (in merge order),
    then the two specials. HF's vocab.json for CLIP checkpoints is exactly
    this ordering, so a single `merges.txt` (or OpenAI's
    bpe_simple_vocab_16e6.txt.gz, whose lines 1..48894 are the merges) is
    enough to run the tokenizer.
    """
    merges = _load_merges(merges_path)
    symbols = list(bytes_to_unicode().values())
    vocab = symbols + [s + "</w>" for s in symbols]
    vocab += ["".join(m.split()) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    return {tok: i for i, tok in enumerate(vocab)}
