import os
import zipfile

import numpy as np
import pytest


@pytest.fixture()
def zip_dataset(tmp_path):
    from PIL import Image
    zpath = str(tmp_path / "imgs.zip")
    ann = str(tmp_path / "map.txt")
    with zipfile.ZipFile(zpath, "w") as z:
        for i in range(6):
            img = Image.new("RGB", (8, 8), (i * 30, 0, 0))
            p = tmp_path / f"im{i}.png"
            img.save(p)
            z.write(p, f"cls/im{i}.png")
    with open(ann, "w") as f:
        for i in range(6):
            f.write(f"cls/im{i}.png {i % 2}\n")
    return zpath, ann


@pytest.mark.parametrize("mode", ["none", "part", "full"])
def test_cached_zip_folder(zip_dataset, mode):
    from mvuld_tpu.data.zip_folder import CachedZipImageFolder
    zpath, ann = zip_dataset
    ds = CachedZipImageFolder(zpath, ann, cache_mode=mode, rank=0, world_size=2)
    assert len(ds) == 6
    img, label = ds[3]
    assert img.size == (8, 8) and label == 1
    arr0 = np.asarray(ds[0][0])
    assert arr0[0, 0, 0] == 0
    arr2 = np.asarray(ds[2][0])
    assert arr2[0, 0, 0] == 60


def test_subset_strided():
    from mvuld_tpu.data.zip_folder import subset_strided_indices
    a = subset_strided_indices(10, rank=0, world_size=2)
    b = subset_strided_indices(10, rank=1, world_size=2)
    assert sorted(a.tolist() + b.tolist()) == list(range(10))
    s = subset_strided_indices(10, 0, 2, shuffle_seed=0)
    assert sorted(s.tolist()) == a.tolist()


def test_distributed_helpers_single_host():
    from mvuld_tpu.parallel.distributed import (is_primary,
                                                maybe_initialize_distributed,
                                                process_index, shard_manifest)
    assert maybe_initialize_distributed() is False     # no coordinator env
    assert process_index() == 0 and is_primary()
    items = list(range(7))
    assert shard_manifest(items, rank=1, world=3) == [1, 4]


def test_in22k_dataset(tmp_path):
    """IN22K JSON-annotation reader parity (reference:
    imagenet22k_dataset.py:12): [path, class] pairs, corrupt-image
    fallback, target_transform hook."""
    from PIL import Image

    from mvuld_tpu.data.zip_folder import IN22KDataset

    root = tmp_path / "in22k"
    root.mkdir()
    db = []
    for i in range(4):
        Image.new("RGB", (8, 8), (0, i * 40, 0)).save(root / f"im{i}.jpeg")
        db.append([f"im{i}.jpeg", 5000 + i])
    db.append(["missing.jpeg", 21840])          # corrupt/missing entry
    import json
    (root / "ann.json").write_text(json.dumps(db))

    ds = IN22KDataset(str(root), "ann.json")
    assert len(ds) == 5
    img, target = ds[1]
    assert target == 5001 and img.size == (8, 8) and img.mode == "RGB"
    # unreadable file degrades to a random RGB image, not an exception
    img, target = ds[4]
    assert target == 21840 and img.mode == "RGB"
    # transforms
    ds2 = IN22KDataset(str(root), "ann.json",
                       transform=lambda im: np.asarray(im).sum(),
                       target_transform=lambda t: t - 5000)
    val, target = ds2[2]
    assert target == 2 and np.isscalar(val) or val.shape == ()
