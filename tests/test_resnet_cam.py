"""CNN-CAM demo (t.py parity): JAX ResNet forward + return_cam + CLI."""

import os

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu.models import resnet  # noqa: E402


def _t(w_hwio):
    """HWIO -> torch OIHW tensor."""
    import torch
    return torch.tensor(np.asarray(w_hwio, np.float32).transpose(3, 2, 0, 1))


def _t_bn(x, p):
    import torch
    import torch.nn.functional as F
    t = lambda a: torch.tensor(np.asarray(a, np.float32))  # noqa: E731
    return F.batch_norm(x, t(p["mean"]), t(p["var"]), t(p["scale"]),
                        t(p["bias"]), training=False, eps=1e-5)


def test_resnet_matches_torch_functional():
    """Full-forward parity with torch's padding semantics (Conv2d pads
    symmetrically by (k-1)//2; MaxPool2d(3,2,1)) at an EVEN input size —
    XLA 'SAME' pads stride-2 windows asymmetrically exactly at even sizes
    ((2,3) for the 7x7/s2 stem on 64; verified: at odd sizes the two
    coincide), shifting every window vs the torchvision weights' layout
    (review finding — shape tests alone cannot catch it)."""
    import torch
    import torch.nn.functional as F
    params = resnet.init(jax.random.key(0), num_classes=5)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    logits, feats = resnet.apply(params, jnp.asarray(x))

    y = torch.tensor(x.transpose(0, 3, 1, 2))
    y = F.relu(_t_bn(F.conv2d(y, _t(params["stem"]["conv"]), stride=2,
                              padding=3), params["stem"]["bn"]))
    y = F.max_pool2d(y, 3, 2, padding=1)
    for si, stage in enumerate(params["stages"]):
        for bi, blk in enumerate(stage):
            stride = 2 if (si > 0 and bi == 0) else 1
            sc = _t_bn(F.conv2d(y, _t(blk["down"]["conv"]), stride=stride),
                       blk["down"]["bn"]) if "down" in blk else y
            h = F.relu(_t_bn(F.conv2d(y, _t(blk["conv1"]), stride=stride,
                                      padding=1), blk["bn1"]))
            h = _t_bn(F.conv2d(h, _t(blk["conv2"]), padding=1), blk["bn2"])
            y = F.relu(h + sc)
    ref_feats = y.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats), ref_feats,
                               atol=1e-3, rtol=1e-3)
    ref_logits = ref_feats.mean((1, 2)) @ np.asarray(params["fc"]["kernel"]) \
        + np.asarray(params["fc"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=1e-3, rtol=1e-3)


def test_squeezenet_matches_torch_functional():
    """squeezenet1_1 parity incl. MaxPool2d(3,2,ceil_mode=True) at a size
    where ceil and floor mode DIFFER (review finding): 118 -> stem 58 ->
    first pool floor 28 vs ceil 29."""
    import torch
    import torch.nn.functional as F
    from vision_transformer_cam_tpu.models import squeezenet
    params = squeezenet.init(jax.random.key(0), num_classes=5)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 118, 118, 3)).astype(np.float32)
    logits, feats = squeezenet.apply(params, jnp.asarray(x))

    tb = lambda p: torch.tensor(np.asarray(p, np.float32))  # noqa: E731
    y = torch.tensor(x.transpose(0, 3, 1, 2))
    y = F.relu(F.conv2d(y, _t(params["stem"]["kernel"]), stride=2)
               + tb(params["stem"]["bias"]).view(1, -1, 1, 1))
    for i, fire in enumerate(params["fires"]):
        if i in squeezenet.POOL_BEFORE:
            y = F.max_pool2d(y, 3, 2, ceil_mode=True)
        s = F.relu(F.conv2d(y, _t(fire["squeeze"]["kernel"]))
                   + tb(fire["squeeze"]["bias"]).view(1, -1, 1, 1))
        e1 = F.relu(F.conv2d(s, _t(fire["expand1"]["kernel"]))
                    + tb(fire["expand1"]["bias"]).view(1, -1, 1, 1))
        e3 = F.relu(F.conv2d(s, _t(fire["expand3"]["kernel"]), padding=1)
                    + tb(fire["expand3"]["bias"]).view(1, -1, 1, 1))
        y = torch.cat([e1, e3], dim=1)
    ref_feats = y.numpy().transpose(0, 2, 3, 1)
    assert feats.shape == ref_feats.shape  # ceil-mode grid
    np.testing.assert_allclose(np.asarray(feats), ref_feats,
                               atol=1e-3, rtol=1e-3)
    cls = F.relu(F.conv2d(y, _t(params["classifier"]["kernel"]))
                 + tb(params["classifier"]["bias"]).view(1, -1, 1, 1))
    np.testing.assert_allclose(np.asarray(logits),
                               cls.numpy().mean((2, 3)),
                               atol=1e-3, rtol=1e-3)


def test_densenet_matches_torch_functional():
    """densenet parity (stem 7x7/s2 pad 3, maxpool 3/2/1, dense layers,
    avgpool transitions, pre-relu norm5 hook) at an even input size (where
    'SAME' would diverge — see the resnet test)."""
    import torch
    import torch.nn.functional as F
    from vision_transformer_cam_tpu.models import densenet
    params = densenet.init(jax.random.key(0), num_classes=4, growth=8,
                           blocks=(2, 3), init_features=16)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    logits, feats = densenet.apply(params, jnp.asarray(x))

    y = torch.tensor(x.transpose(0, 3, 1, 2))
    y = F.relu(_t_bn(F.conv2d(y, _t(params["stem"]["conv"]), stride=2,
                              padding=3), params["stem"]["bn"]))
    y = F.max_pool2d(y, 3, 2, padding=1)
    for bi, block in enumerate(params["blocks"]):
        for layer in block:
            h = F.conv2d(F.relu(_t_bn(y, layer["bn1"])), _t(layer["conv1"]))
            h = F.conv2d(F.relu(_t_bn(h, layer["bn2"])), _t(layer["conv2"]),
                         padding=1)
            y = torch.cat([y, h], dim=1)
        if bi < len(params["transitions"]):
            t = params["transitions"][bi]
            y = F.conv2d(F.relu(_t_bn(y, t["bn"])), _t(t["conv"]))
            y = F.avg_pool2d(y, 2, 2)
    ref_feats = _t_bn(y, params["norm5"]).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(feats), ref_feats,
                               atol=1e-3, rtol=1e-3)
    ref_logits = np.maximum(ref_feats, 0).mean((1, 2)) \
        @ np.asarray(params["classifier"]["kernel"]) \
        + np.asarray(params["classifier"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), ref_logits,
                               atol=1e-3, rtol=1e-3)


def test_resnet_forward_shapes():
    params = resnet.init(jax.random.key(0), num_classes=10)
    x = jnp.zeros((2, 64, 64, 3))
    logits, feats = resnet.apply(params, x)
    assert logits.shape == (2, 10)
    assert feats.shape == (2, 2, 2, 512)  # 64 / 2(stem) / 2(pool) / 8(stages)


def test_squeezenet_forward_shapes():
    """t.py model_id 1 (squeezenet1_1): hooked `features` is the post-fire9
    512-channel map; logits come from the 1x1 classifier conv + avgpool."""
    from vision_transformer_cam_tpu.models import squeezenet
    params = squeezenet.init(jax.random.key(0), num_classes=10)
    x = jnp.zeros((1, 224, 224, 3))
    logits, feats = squeezenet.apply(params, x)
    assert logits.shape == (1, 10)
    assert feats.shape == (1, 13, 13, 512)  # torchvision squeezenet1_1 grid
    assert squeezenet.cam_weight(params).shape == (512, 10)


def test_densenet_forward_shapes():
    """t.py model_id 3 (densenet161): tiny instance (growth 8, 2 blocks) —
    the channel plan must follow init+k*layers with half-width transitions,
    and the hooked `features` tensor is post-norm5, pre-relu."""
    from vision_transformer_cam_tpu.models import densenet
    params = densenet.init(jax.random.key(0), num_classes=7, growth=8,
                           blocks=(2, 3), init_features=16)
    x = jnp.zeros((1, 64, 64, 3))
    logits, feats = densenet.apply(params, x)
    # 16 -> block1 16+2*8=32 -> trans 16 -> block2 16+3*8=40 channels;
    # 64px / 2 (stem) / 2 (pool) / 2 (one transition) = 8
    assert logits.shape == (1, 7)
    assert feats.shape == (1, 8, 8, 40)
    assert densenet.cam_weight(params).shape == (40, 7)
    # pre-relu hook point: a random-init densenet must show negative values
    params2 = densenet.init(jax.random.key(1), num_classes=7, growth=8,
                            blocks=(2, 3), init_features=16)
    _, f2 = densenet.apply(params2, jnp.ones((1, 64, 64, 3)))
    assert float(jnp.min(f2)) < 0


def test_densenet161_default_channel_plan():
    """The default init must build the 161 config: growth 48, blocks
    6/12/36/24, stem 96 -> 2208 final channels (torchvision densenet161)."""
    from vision_transformer_cam_tpu.models import densenet
    # eval_shape: the channel plan is a pure function of the config — no
    # need to materialize the full 161 weight tree (48 s on this 1-core box)
    params = jax.eval_shape(
        lambda k: densenet.init(k, num_classes=3), jax.random.key(0))
    assert params["norm5"]["scale"].shape == (2208,)
    assert densenet.cam_weight(params).shape == (2208, 3)


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
    # the other two t.py architectures through the same CLI (model_id table)
    # the other two t.py architectures through the same CLI (model_id
    # table), plus the labels-json pretty-print path (t.py:95-104)
    import json
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps([f"class_{i}" for i in range(12)]))
    res = cnn_cam_demo.main(["--image", str(img), "--topk", "2",
                             "--num_classes", "12",
                             "--arch", "squeezenet1_1",
                             "--labels_json", str(labels),
                             "--out", str(tmp_path / "cams_sq")])
    assert len(res["top"]) == 2
    assert res["names"][int(res["top"][0])] == f"class_{int(res['top'][0])}"
    assert len(os.listdir(tmp_path / "cams_sq")) == 2


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
