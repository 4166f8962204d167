"""CNN-CAM demo (t.py parity): JAX ResNet forward + return_cam + CLI."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu.models import resnet  # noqa: E402


def test_resnet_forward_shapes():
    params = resnet.init(jax.random.key(0), num_classes=10)
    x = jnp.zeros((2, 64, 64, 3))
    logits, feats = resnet.apply(params, x)
    assert logits.shape == (2, 10)
    assert feats.shape == (2, 2, 2, 512)  # 64 / 2(stem) / 2(pool) / 8(stages)


def test_return_cam_matches_manual():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((7, 7, 16)).astype(np.float32)
    fc = rng.standard_normal((16, 4)).astype(np.float32)
    cams = resnet.return_cam(feats, fc, [2, 0])
    assert cams.shape == (2, 7, 7) and cams.dtype == np.uint8
    want = feats.reshape(-1, 16) @ fc[:, 2]
    want = want.reshape(7, 7)
    want = np.uint8(255 * (want - want.min()) / (want - want.min()).max())
    np.testing.assert_array_equal(cams[0], want)


def test_cnn_cam_demo_cli(tmp_path):
    import PIL.Image
    from vision_transformer_cam_tpu.cli import cnn_cam_demo
    rng = np.random.default_rng(1)
    img = tmp_path / "dogcat.jpg"
    PIL.Image.fromarray(
        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)).save(img)
    res = cnn_cam_demo.main(["--image", str(img), "--topk", "3",
                             "--num_classes", "12",
                             "--out", str(tmp_path / "cams")])
    assert len(res["top"]) == 3
    files = os.listdir(tmp_path / "cams")
    assert len(files) == 3 and all(f.endswith(".jpg") for f in files)


def test_render_origin_cams(tmp_path):
    """generate_origin_cam parity (utils.py:91-129): one overlay per GT class
    plus the synthesized max-CAM, without the reference's filename collision."""
    from vision_transformer_cam_tpu.cam.render import render_origin_cams
    rng = np.random.default_rng(2)
    cams = rng.random((2, 16, 5)).astype(np.float32)   # [B, P, C]
    labels = np.zeros((2, 5), np.float32)
    labels[0, [1, 3]] = 1
    labels[1, 2] = 1
    imgs = [rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
            for _ in range(2)]
    render_origin_cams(cams, labels, ["img_a", "img_b"], "", str(tmp_path),
                       images_bgr=imgs)
    files = sorted(os.listdir(tmp_path))
    assert files == ["img_a_cls1_siglabel_cam.jpg",
                     "img_a_cls3_siglabel_cam.jpg",
                     "img_a_syn_cam.jpg",
                     "img_b_cls2_siglabel_cam.jpg",
                     "img_b_syn_cam.jpg"]


def test_cam_norm_constant_input():
    from vision_transformer_cam_tpu.cam.render import cam_norm
    out = cam_norm(np.full((7, 7), 3.25))
    assert out.dtype == np.uint8 and np.isfinite(out.astype(float)).all()
