"""Dataset/loader tests on synthetic reference-layout folders."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from img2img_turbo_tpu.training import data


class _Tok:
    model_max_length = 77

    def __call__(self, text):
        return np.full((1, 77), 7, np.int32)


@pytest.fixture(scope="module")
def paired_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("paired"))
    rng = np.random.RandomState(0)
    for sub in ("train_A", "train_B", "test_A", "test_B"):
        os.makedirs(f"{root}/{sub}")
    prompts = {}
    for i in range(5):
        name = f"x{i}.png"
        for sub in ("train_A", "train_B"):
            Image.fromarray((rng.rand(40, 40, 3) * 255).astype(
                np.uint8)).save(f"{root}/{sub}/{name}")
        prompts[name] = f"cap {i}"
    json.dump(prompts, open(f"{root}/train_prompts.json", "w"))
    json.dump({}, open(f"{root}/test_prompts.json", "w"))
    return root


@pytest.fixture(scope="module")
def unpaired_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("unpaired"))
    rng = np.random.RandomState(0)
    for sub in ("train_A", "train_B"):
        os.makedirs(f"{root}/{sub}")
        for i in range(3):
            Image.fromarray((rng.rand(40, 40, 3) * 255).astype(
                np.uint8)).save(f"{root}/{sub}/i{i}.png")
    open(f"{root}/fixed_prompt_a.txt", "w").write("horse\n")
    open(f"{root}/fixed_prompt_b.txt", "w").write("zebra\n")
    return root


class TestPairedDataset:
    def test_ranges_and_keys(self, paired_root):
        ds = data.PairedDataset(paired_root, "train", "no_resize", _Tok())
        assert len(ds) == 5
        item = ds[0]
        cond = item["conditioning_pixel_values"]
        out = item["output_pixel_values"]
        assert cond.min() >= 0.0 and cond.max() <= 1.0          # [0,1]
        assert out.min() >= -1.0 and out.max() <= 1.0           # [-1,1]
        assert item["input_ids"].shape == (77,)
        assert item["caption"] == "cap 0"

    def test_loader_batching(self, paired_root):
        ds = data.PairedDataset(paired_root, "train", "resize_256", _Tok())
        batch = next(data.data_loader(ds, 2, seed=0))
        assert batch["conditioning_pixel_values"].shape == (2, 256, 256, 3)
        assert batch["input_ids"].shape == (2, 77)
        assert isinstance(batch["caption"], list)


class TestUnpairedDataset:
    def test_len_and_fixed_prompts(self, unpaired_root):
        ds = data.UnpairedDataset(unpaired_root, "train", "no_resize",
                                  _Tok())
        assert len(ds) == 6  # len(A) + len(B)
        item = ds[0]
        assert item["caption_src"] == "horse"
        assert item["caption_tgt"] == "zebra"
        assert item["pixel_values_src"].min() >= -1.0

    def test_index_beyond_src_range_uses_random_src(self, unpaired_root):
        import random
        ds = data.UnpairedDataset(unpaired_root, "train", "no_resize",
                                  _Tok())
        item = ds.__getitem__(5, random.Random(0))  # > len(A)=3
        assert item["pixel_values_src"].shape == (40, 40, 3)


class TestTransforms:
    def test_registry_names(self):
        for name in ("resized_crop_512", "resize_286_randomcrop_256x256_hflip",
                     "resize_256", "resize_256x256", "resize_512",
                     "resize_512x512", "no_resize"):
            assert data.build_transform(name) is not None
        with pytest.raises(ValueError):
            data.build_transform("nope")

    def test_resized_crop_512(self):
        T = data.build_transform("resized_crop_512")
        img = Image.new("RGB", (1000, 700))
        out = T(img)
        assert out.size == (512, 512)


class TestLoaderWrappers:
    def _counting_loader(self, n):
        for i in range(n):
            yield {"x": np.full((2, 3), i, np.float32), "s": [f"a{i}"]}

    def test_accumulate_batches(self):
        it = data.accumulate_batches(self._counting_loader(4), 2)
        b = next(it)
        assert b["x"].shape == (4, 3)
        assert b["s"] == ["a0", "a1"]

    def test_prefetch_preserves_order_and_terminates(self):
        out = list(data.prefetch(self._counting_loader(5), depth=2))
        assert len(out) == 5
        assert [int(b["x"][0, 0]) for b in out] == [0, 1, 2, 3, 4]


class TestBucketing:
    def test_bucket_size(self):
        from img2img_turbo_tpu.serving.engine import bucket_size
        assert bucket_size(200) == 256
        assert bucket_size(512) == 512
        assert bucket_size(513) == 768
        assert bucket_size(1100) == 1280
