"""Native artifact writers (native/vitcam_io.cc round-5 additions): the
palette-PNG encoder and the CAM-overlay renderer.

Contracts under test (reference counterparts: validate.py:258-262 palette
PNG via ToPILImage+putpalette+save; utils.py:111-129 overlay jpg):
  - PNG: DECODED content (indices + palette) identical to PIL's writer —
    the artifact is the pixel data, not the deflate byte stream.
  - Overlay: composed RGB within ±2 8-bit steps of the Python math
    (PIL-semantics resize in float vs PIL's 8-bit fixed point — the same
    divergence class the decode path documents).
  - The batch wrappers fall back to the PIL path when the native library
    lacks the new symbols.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from vision_transformer_cam_tpu.cam import render
from vision_transformer_cam_tpu.data.palette import (save_indexed_png,
                                                     save_indexed_png_batch,
                                                     voc_palette_flat)
from vision_transformer_cam_tpu.io import native_loader

pytestmark = pytest.mark.skipif(not native_loader.artifacts_available(),
                                reason="native artifact writers unavailable")


def test_png_batch_content_identical_to_pil(tmp_path):
    rng = np.random.default_rng(0)
    pal = voc_palette_flat()
    labels = [rng.integers(0, 22, (37, 50)).astype(np.uint8),
              rng.integers(0, 216, (64, 48)).astype(np.uint8),  # filler ids
              np.zeros((5, 7), np.uint8)]
    pil_paths = [str(tmp_path / f"pil{i}.png") for i in range(3)]
    nat_paths = [str(tmp_path / f"nat{i}.png") for i in range(3)]
    for p, l in zip(pil_paths, labels):
        save_indexed_png(p, l, pal)
    native_loader.write_png_batch(nat_paths, labels, pal)
    for pp, np_, lab in zip(pil_paths, nat_paths, labels):
        a, b = Image.open(pp), Image.open(np_)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        assert np.array_equal(np.asarray(b), lab)
        assert a.getpalette() == b.getpalette()


def test_png_batch_level_is_content_neutral(tmp_path):
    rng = np.random.default_rng(1)
    lab = rng.integers(0, 21, (30, 41)).astype(np.uint8)
    pal = voc_palette_flat()
    p1, p9 = str(tmp_path / "l1.png"), str(tmp_path / "l9.png")
    native_loader.write_png_batch([p1], [lab], pal, level=1)
    native_loader.write_png_batch([p9], [lab], pal, level=9)
    assert np.array_equal(np.asarray(Image.open(p1)),
                          np.asarray(Image.open(p9)))


def test_save_indexed_png_batch_routes_and_falls_back(tmp_path, monkeypatch):
    rng = np.random.default_rng(2)
    lab = rng.integers(0, 22, (23, 31)).astype(np.uint8)
    nat = str(tmp_path / "nat.png")
    save_indexed_png_batch([nat], [lab])
    monkeypatch.setattr(native_loader, "artifacts_available", lambda: False)
    pil = str(tmp_path / "pil.png")
    save_indexed_png_batch([pil], [lab])
    a, b = Image.open(pil), Image.open(nat)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    assert a.getpalette() == b.getpalette()


def test_save_indexed_png_batch_overflow_contract(tmp_path):
    # int64 filler ids > 255 must keep raising (palette-PNG contract),
    # through the batch API too
    lab = np.full((4, 4), 300, np.int64)
    with pytest.raises(ValueError, match="cannot"):
        save_indexed_png_batch([str(tmp_path / "x.png")], [lab])


def _jpeg_bytes(img: np.ndarray) -> bytes:
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    return buf.getvalue()


def _python_overlay_pil_math(jpeg: bytes, cam: np.ndarray,
                             lut: np.ndarray) -> np.ndarray:
    """The fallback path's arithmetic with the PIL resampler pinned (the
    cv2 branch uses cv2.resize, a third rounding variant)."""
    dec = np.asarray(Image.open(io.BytesIO(jpeg)).convert("RGB"))
    h, w = dec.shape[:2]
    u8 = render.cam_norm(cam)
    heat_idx = np.asarray(Image.fromarray(u8).resize((w, h), Image.BILINEAR))
    return (lut[heat_idx] * 0.3 + dec.astype(np.float64) * 0.5
            ).astype(np.uint8)


def test_overlay_rgb_matches_python_math():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (60, 83, 3)).astype(np.uint8)
    jpeg = _jpeg_bytes(img)
    cam = rng.normal(size=(14, 14))
    lut = render.jet_lut_rgb()
    nat = native_loader.overlay_rgb_one(jpeg, cam, lut)
    exp = _python_overlay_pil_math(jpeg, cam, lut)
    assert nat.shape == exp.shape
    d = np.abs(nat.astype(int) - exp.astype(int))
    assert d.max() <= 2, f"max diff {d.max()}"
    assert d.mean() < 0.5


def test_overlay_constant_cam_no_nan():
    # all-background image: cam_norm divides by max(ptp, 1e-12) — the
    # reference's 0/0 NaN case, handled the same way on both paths
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    jpeg = _jpeg_bytes(img)
    cam = np.ones((14, 14))
    lut = render.jet_lut_rgb()
    nat = native_loader.overlay_rgb_one(jpeg, cam, lut)
    exp = _python_overlay_pil_math(jpeg, cam, lut)
    assert np.abs(nat.astype(int) - exp.astype(int)).max() <= 2


def test_overlay_batch_writes_decodable_jpegs(tmp_path):
    rng = np.random.default_rng(5)
    srcs, dsts = [], []
    for i in range(3):
        img = rng.integers(0, 255, (40 + 7 * i, 55, 3)).astype(np.uint8)
        p = str(tmp_path / f"src{i}.jpg")
        Image.fromarray(img).save(p, quality=95)
        srcs.append(p)
        dsts.append(str(tmp_path / f"dst{i}.jpg"))
    cams = rng.normal(size=(3, 14, 14))
    native_loader.overlay_batch(srcs, dsts, cams, render.jet_lut_rgb())
    for i, d in enumerate(dsts):
        out = np.asarray(Image.open(d).convert("RGB"))
        assert out.shape == (40 + 7 * i, 55, 3)


def test_overlay_batch_counts_failures(tmp_path):
    ok = str(tmp_path / "ok.jpg")
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(ok)
    with pytest.raises(ValueError, match="1/2"):
        native_loader.overlay_batch(
            [ok, str(tmp_path / "missing.jpg")],
            [str(tmp_path / "o1.jpg"), str(tmp_path / "o2.jpg")],
            np.zeros((2, 14, 14)), render.jet_lut_rgb())


def test_render_rollout_overlays_both_paths(tmp_path, monkeypatch):
    rng = np.random.default_rng(6)
    img = rng.integers(0, 255, (45, 61, 3)).astype(np.uint8)
    src = str(tmp_path / "src.jpg")
    Image.fromarray(img).save(src, quality=95)
    cam = rng.normal(size=(1, 14, 14))
    nat = str(tmp_path / "nat.jpg")
    render.render_rollout_overlays(cam, [src], [nat])
    monkeypatch.setattr(native_loader, "artifacts_available", lambda: False)
    fb = str(tmp_path / "fb.jpg")
    render.render_rollout_overlays(cam, [src], [fb])
    a = np.asarray(Image.open(nat).convert("RGB")).astype(int)
    b = np.asarray(Image.open(fb).convert("RGB")).astype(int)
    assert a.shape == b.shape
    # two JPEG encoders + two resamplers: visual-equivalence bound only
    assert np.abs(a - b).mean() < 3.0
