"""Data layer: split parsing, labels, palette, preprocessing parity."""

import os

import numpy as np
import pytest

from vision_transformer_cam_tpu.data import palette, transforms, voc12


def test_split_parsing_matches_reference_slice(tmp_path):
    """voc12/data.py:60-66 uses the fixed [-15:-4] slice."""
    p = tmp_path / "split.txt"
    p.write_text("/JPEGImages/2007_000032.jpg /SegmentationClassAug/2007_000032.png\n"
                 "/JPEGImages/2008_000006.jpg\n")
    assert voc12.load_img_name_list(str(p)) == ["2007_000032", "2008_000006"]


def test_real_reference_splits_parse():
    ref = "/root/reference/voc12"
    if not os.path.isdir(ref):
        pytest.skip("reference not mounted")
    names = voc12.load_img_name_list(os.path.join(ref, "train.txt"))
    assert len(names) == 1464 and names[0] == "2007_000032"
    labels = voc12.load_image_label_list_from_npy(
        names[:5], os.path.join(ref, "cls_labels.npy"))
    assert labels[0].shape == (20,) and labels[0].dtype == np.float32


def test_xml_label_loading(tmp_path):
    ann = tmp_path / "Annotations"
    ann.mkdir()
    (ann / "x.xml").write_text(
        "<annotation><object><name>dog</name></object>"
        "<object><name>person</name></object>"
        "<object><name>notaclass</name></object></annotation>")
    lab = voc12.load_image_label_from_xml("x", str(tmp_path))
    expect = np.zeros(20, np.float32)
    expect[voc12.CAT_NAME_TO_NUM["dog"]] = 1
    expect[voc12.CAT_NAME_TO_NUM["person"]] = 1
    np.testing.assert_array_equal(lab, expect)


def test_palette_roundtrip(tmp_path):
    pal = palette.voc_palette_flat()
    assert len(pal) == 768
    # VOC class 1 (aeroplane) is (128, 0, 0)
    assert pal[3:6] == [128, 0, 0]
    p = tmp_path / "palette.json"
    palette.save_palette_json(str(p))
    assert palette.load_palette_json(str(p)) == pal


def test_palette_matches_png_extraction(tmp_path):
    """get_palette.py parity: writing a PNG with our palette and re-extracting
    yields the same flat list."""
    labels = np.arange(4, dtype=np.uint8).reshape(2, 2)
    png = tmp_path / "seg.png"
    palette.save_indexed_png(str(png), labels)
    assert palette.palette_from_png(str(png)) == palette.voc_palette_flat()


def test_preprocess_matches_committed_golden():
    """Vendored torchvision-parity golden (VERDICT round-1 item 9):
    torchvision's PIL backend delegates Resize to PIL.Image.resize with the
    same resample mode, so a PIL-produced golden pins the torchvision
    pipeline semantics without the dependency.  Captured once (PIL 12.1,
    seed 0) and committed; regenerate ONLY if the preprocessing contract
    deliberately changes."""
    import os
    z = np.load(os.path.join(os.path.dirname(__file__),
                             "golden_preprocess.npz"))
    ours = transforms.preprocess_array(z["input_rgb"], 224,
                                       (0.485, 0.456, 0.406),
                                       (0.229, 0.224, 0.225))
    np.testing.assert_allclose(ours, z["preprocessed"], atol=1e-6)


def test_seg_resize_matches_committed_golden():
    import os
    z = np.load(os.path.join(os.path.dirname(__file__),
                             "golden_preprocess.npz"))
    ours = transforms.seg_resize_nearest(z["input_seg"], 224)
    np.testing.assert_array_equal(ours, z["seg_resized"])


def test_preprocess_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    from torchvision import transforms as T
    import PIL.Image
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(300, 400, 3), dtype=np.uint8)
    img = PIL.Image.fromarray(arr)
    ref_t = T.Compose([T.Resize([224, 224]), T.ToTensor(),
                       T.Normalize([0.485, 0.456, 0.406],
                                   [0.229, 0.224, 0.225])])
    ref = ref_t(img).numpy().transpose(1, 2, 0)
    ours = transforms.preprocess_array(arr, 224,
                                       (0.485, 0.456, 0.406),
                                       (0.229, 0.224, 0.225))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_seg_resize_nearest_matches_torchvision():
    torchvision = pytest.importorskip("torchvision")
    from torchvision.transforms import functional as F
    from torchvision import transforms as T
    import torch
    rng = np.random.default_rng(1)
    seg = rng.integers(0, 21, size=(100, 150)).astype(np.uint8)
    import PIL.Image
    ref = np.asarray(F.resize(PIL.Image.fromarray(seg), 224,
                              interpolation=T.InterpolationMode.NEAREST))
    ours = transforms.seg_resize_nearest(seg, 224)
    np.testing.assert_array_equal(ours, ref)


def test_batch_loader(tmp_path):
    class FakeDataset:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"name": str(i),
                    "image": np.full((4, 4, 3), i, np.float32),
                    "label": np.zeros(20, np.float32)}

    from vision_transformer_cam_tpu.data.loader import BatchLoader
    dl = BatchLoader(FakeDataset(), batch_size=4, shuffle=True, drop_last=True,
                     seed=0, num_threads=2)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["image"].shape == (4, 4, 4, 3)
    # two epochs with different shuffles
    names0 = [n for b in batches for n in b["name"]]
    dl.set_epoch(1)
    names1 = [n for b in dl for n in b["name"]]
    assert names0 != names1


def test_batch_loader_process_sharding():
    class FakeDataset:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"name": str(i), "image": np.zeros((2, 2, 3), np.float32)}

    from vision_transformer_cam_tpu.data.loader import BatchLoader
    seen = []
    for pi in range(2):
        dl = BatchLoader(FakeDataset(), batch_size=2, shuffle=False,
                         process_index=pi, process_count=2)
        seen += [n for b in dl for n in b["name"]]
    assert sorted(seen) == [str(i) for i in range(8)]


def test_batch_loader_dataset_smaller_than_processes():
    """A dataset SMALLER than process_count must still give every host the
    same number of (wrapped) samples — unequal stripes deadlock the
    collective train step (review finding: idx[:total-n] under-filled,
    np.resize cycles)."""
    class FakeDataset:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"name": str(i), "image": np.zeros((2, 2, 3), np.float32)}

    from vision_transformer_cam_tpu.data.loader import BatchLoader
    loaders = [BatchLoader(FakeDataset(), batch_size=1, shuffle=False,
                           process_index=pi, process_count=8)
               for pi in range(8)]
    lens = [len(dl) for dl in loaders]
    assert lens == [1] * 8
    names, pad_flags = [], []
    for dl in loaders:
        for b in dl:
            names += list(b["name"])
            pad_flags += list(b["is_pad"])
    assert len(names) == 8
    # each real sample appears, and exactly 3 entries are counted (unpadded)
    assert sorted(set(names)) == ["0", "1", "2"]
    assert sum(not p for p in pad_flags) == 3


def test_native_loader_matches_pil(tmp_path):
    """Native C++ decode+resize+normalize vs the PIL path: within one uint8
    quantization level (PIL resizes with 8-bit fixed-point coefficients)."""
    from vision_transformer_cam_tpu.io import native_loader as nl
    if not nl.available():
        pytest.skip("native library unavailable")
    import PIL.Image
    rng = np.random.default_rng(3)
    paths = []
    for i in range(3):
        arr = rng.integers(0, 256, (150 + 11 * i, 201 - 13 * i, 3),
                           dtype=np.uint8)
        p = tmp_path / f"n{i}.jpg"
        PIL.Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    out = nl.decode_batch(paths, 224)
    mean, std = (0.485, 0.456, 0.406), (0.229, 0.224, 0.225)
    ref = np.stack([transforms.preprocess_array(
        np.asarray(PIL.Image.open(p).convert("RGB")), 224, mean, std)
        for p in paths])
    assert np.abs(out - ref).max() < 2.0 / 255.0 / min(std)


def test_batch_loader_native_decode(tmp_path):
    """BatchLoader(native_decode=True) produces the same batch structure and
    near-identical pixels as the PIL path on a VOC12Dataset."""
    from vision_transformer_cam_tpu.io import native_loader as nl
    if not nl.available():
        pytest.skip("native library unavailable")
    import PIL.Image
    from vision_transformer_cam_tpu.data.loader import BatchLoader
    rng = np.random.default_rng(4)
    (tmp_path / "JPEGImages").mkdir()
    names = ["2010_000001", "2010_000002"]
    for n in names:
        PIL.Image.fromarray(rng.integers(0, 256, (99, 131, 3),
                                         dtype=np.uint8)).save(
            tmp_path / "JPEGImages" / f"{n}.jpg")
    (tmp_path / "split.txt").write_text(
        "\n".join(f"/JPEGImages/{n}.jpg" for n in names) + "\n")
    ds = voc12.VOC12Dataset(str(tmp_path / "split.txt"), str(tmp_path),
                            img_size=64)
    pil_batch = next(iter(BatchLoader(ds, 2, shuffle=False)))
    nat_batch = next(iter(BatchLoader(ds, 2, shuffle=False,
                                      native_decode=True)))
    assert nat_batch["name"] == pil_batch["name"]
    assert nat_batch["image"].shape == pil_batch["image"].shape
    assert np.abs(nat_batch["image"] - pil_batch["image"]).max() < 0.05


def test_save_indexed_png_rejects_ids_over_255(tmp_path):
    """Indexed PNGs hold <= 256 ids; large filler ids (compose_pseudo_seg
    keeps them int64 for correct scoring) must raise instead of silently
    wrapping into valid-looking foreground classes on disk."""
    import pytest
    labels = np.array([[0, 1], [2, 300]], np.int64)
    with pytest.raises(ValueError, match="300"):
        palette.save_indexed_png(str(tmp_path / "bad.png"), labels)


def test_device_prefetch_multi_axis_mesh_shard_decision():
    """device_prefetch must ask the SHARDING whether a batch lays out
    evenly — not mesh.size: on a ('data','model') 4x2 mesh with P('data'),
    a batch of 36 divides over the 4 data shards (36 % 8 != 0 would wrongly
    take the replicate fallback), while a 37-batch tail must still fall
    back to unsharded placement instead of raising (review finding)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vision_transformer_cam_tpu.data.loader import device_prefetch

    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    sharding = NamedSharding(mesh, P("data"))
    batches = [{"image": np.zeros((36, 4, 4, 3), np.float32)},
               {"image": np.zeros((37, 4, 4, 3), np.float32)}]
    out = list(device_prefetch(iter(batches), sharding=sharding, size=2))
    assert out[0]["image"].sharding.is_equivalent_to(sharding, 4)
    # the indivisible tail arrives on device, just not batch-sharded
    assert not out[1]["image"].sharding.is_equivalent_to(sharding, 4)
