"""Tokenizer parity vs transformers.CLIPTokenizer on a synthetic vocab
(the real sd-turbo vocab files load the same way; parity of the BPE
algorithm is what matters)."""

import json

import numpy as np
import pytest

from img2img_turbo_tpu.models.tokenizer import CLIPTokenizer, bytes_to_unicode


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    units = list(bytes_to_unicode().values())
    vocab = {}
    for u in units:
        vocab[u] = len(vocab)
    for u in units:
        vocab[u + "</w>"] = len(vocab)
    merges = [
        ("h", "e"), ("l", "l"), ("l", "o</w>"),
        ("he", "ll"), ("hell", "o</w>"),
        ("w", "o"), ("r", "l"), ("wo", "rl"), ("worl", "d</w>"),
        ("c", "a"), ("ca", "t</w>"),
        ("1", "2"),
    ]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return str(d)


PROMPTS = [
    "hello world",
    "a cat, hello!!",
    "HELLO World 123",
    "  spaces   and\ttabs ",
    "unicode: café",
    "",
]


def test_parity_with_transformers(vocab_dir):
    from transformers import CLIPTokenizer as HFTok

    ours = CLIPTokenizer.from_dir(vocab_dir, pad_token="!")
    theirs = HFTok(vocab_file=vocab_dir + "/vocab.json",
                   merges_file=vocab_dir + "/merges.txt", pad_token="!")
    # the reference environment has ftfy (requirements.txt), which selects
    # HF's whitespace_clean+lower path — the one our tokenizer implements.
    # This box lacks ftfy, so force that path (fix_text is identity on the
    # ASCII prompts used here).
    theirs.fix_text = lambda s: s
    for prompt in PROMPTS:
        got = ours([prompt], max_length=20)[0]
        exp = theirs([prompt], max_length=20, padding="max_length",
                     truncation=True, return_tensors="np").input_ids[0]
        np.testing.assert_array_equal(got, exp, err_msg=f"prompt={prompt!r}")


def test_truncation(vocab_dir):
    from transformers import CLIPTokenizer as HFTok

    ours = CLIPTokenizer.from_dir(vocab_dir, pad_token="!")
    theirs = HFTok(vocab_file=vocab_dir + "/vocab.json",
                   merges_file=vocab_dir + "/merges.txt", pad_token="!")
    theirs.fix_text = lambda s: s
    long = "hello world " * 40
    got = ours([long], max_length=16)[0]
    exp = theirs([long], max_length=16, padding="max_length",
                 truncation=True, return_tensors="np").input_ids[0]
    np.testing.assert_array_equal(got, exp)


def test_batch_shape(vocab_dir):
    tok = CLIPTokenizer.from_dir(vocab_dir, pad_token="!")
    out = tok(["hello", "world hello cat"], max_length=77)
    assert out.shape == (2, 77)
    assert out.dtype == np.int32


def test_from_dir_with_merges_only_matches_full_pair(vocab_dir, tmp_path):
    """vocab.json is derivable from the merge list (OpenAI simple_tokenizer
    construction); a merges-only directory must tokenize identically."""
    import shutil

    from img2img_turbo_tpu.models.tokenizer import vocab_from_merges

    derived = vocab_from_merges(vocab_dir + "/merges.txt")
    with open(vocab_dir + "/vocab.json") as f:
        full = json.load(f)
    assert derived == full

    d = tmp_path / "merges_only"
    d.mkdir()
    shutil.copy(vocab_dir + "/merges.txt", d / "merges.txt")
    ours = CLIPTokenizer.from_dir(str(d), pad_token="!")
    ref = CLIPTokenizer.from_dir(vocab_dir, pad_token="!")
    for p in PROMPTS:
        np.testing.assert_array_equal(ours(p), ref(p))
