"""Serving-mode quality evaluation on TRAINED weights.

Real VOC2012 JPEGs and the jx_ ViT-B/16-21k checkpoint are unavailable in
this environment (no network egress; only the split lists exist under the
reference's voc12/).  The substitute: fine-tune on a synthetic structured
multi-label dataset until the attention genuinely separates foreground from
background, then measure every serving mode's mAP / CAM / top-16 deltas
against the f32 exact path on those TRAINED weights.  Random-weight fidelity
(BENCHMARKS.md) is the worst case — near-uniform attention maximizes
threshold and top-k ties; this script bounds the realistic case.

Mirrors the reference's quality protocol (multi-label val mAP as in
utils.py:206-245, update_log.md:35) on data this environment can produce.

  python scripts/quality_eval.py [--steps N] [--batch B] [--eval N]
      [--model ZOO_NAME] [--chunk N]

--model picks any zoo config (square size scales with resolution; long-N
models get the shipped serving setup: scoped-VMEM raise, single-q-block
kernel, rollout_post).  --chunk bounds the per-dispatch eval batch — the
ViT-L@384 rollout_post hm stack is [24, B, 577, 577] f32, so eval at
B=128 needs chunking on a 16 GB chip.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vision_transformer_cam_tpu import configs
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.ops import rollout
from vision_transformer_cam_tpu.utils.metrics import compute_mAP

NUM_CLASSES = 20
# deterministic class colors/textures (means in normalized-image units)
_rng = np.random.RandomState(0)
CLASS_COLOR = _rng.uniform(-1.8, 1.8, size=(NUM_CLASSES, 3))
CLASS_FREQ = _rng.randint(2, 6, size=NUM_CLASSES)
# relational "pairs" protocol: 7 texture primitives; a CLASS is an
# unordered PAIR of primitives (two squares in the image).  A single
# square is ambiguous (each primitive appears in ~6 classes), so the
# classifier must BIND both squares — which forces the cls token's
# LATE-block attention onto the objects.  That matters because the
# reference pipeline reads localization from blocks mask_from=4 /
# bg_blocks_from=5 onward (vit_model.py:320-349, validate.py:224-235);
# the single-square protocol measured localization ONLY in blocks 0-1
# (local color pop-out) with blocks 2+ spatially uniform — structurally
# invisible to the pipeline regardless of training length.
N_PRIM = 7
PRIM_COLOR = _rng.uniform(-1.8, 1.8, size=(N_PRIM, 3))
PRIM_FREQ = _rng.randint(2, 9, size=N_PRIM)
PAIRS = [(a, b) for a in range(N_PRIM) for b in range(a + 1, N_PRIM)]
PAIRS = PAIRS[:NUM_CLASSES]          # 21 pairs -> first 20 are classes


def _paste_square(images, segs, i, y0, x0, sq, color, freq, seg_val):
    yy, xx = np.mgrid[0:sq, 0:sq]
    tex = np.sin((xx + yy) * (np.pi / freq))[..., None]
    images[i, y0:y0 + sq, x0:x0 + sq] += (
        color[None, None, :] * (0.75 + 0.25 * tex)).astype(np.float32)
    if segs is not None:
        segs[i, y0:y0 + sq, x0:x0 + sq] = seg_val


def make_pairs_batch(seed: int, n: int, img: int = 224,
                     with_seg: bool = False, size_lo: int = 5,
                     size_hi: int = 3):
    """Relational protocol: one class per image = an unordered PAIR of
    texture primitives, drawn as two non-overlapping squares.  GT seg marks
    BOTH squares with the class id (+1).  See the PAIRS comment above for
    why this forces late-block attention."""
    r = np.random.RandomState(seed)
    images = r.normal(0.0, 0.25, size=(n, img, img, 3)).astype(np.float32)
    labels = np.zeros((n, NUM_CLASSES), np.float32)
    segs = np.zeros((n, img, img), np.uint8) if with_seg else None
    for i in range(n):
        c = int(r.randint(NUM_CLASSES))
        labels[i, c] = 1.0
        placed = []
        for prim in PAIRS[c]:
            sq = r.randint(img // size_lo, img // size_hi + 1)
            for _ in range(16):
                y0, x0 = r.randint(0, img - sq), r.randint(0, img - sq)
                if all(y0 + sq <= py or py + ps <= y0
                       or x0 + sq <= px or px + ps <= x0
                       for py, px, ps in placed):
                    break
            placed.append((y0, x0, sq))
            _paste_square(images, segs, i, y0, x0, sq,
                          PRIM_COLOR[prim], PRIM_FREQ[prim], c + 1)
    if with_seg:
        return jnp.asarray(images), jnp.asarray(labels), segs
    return jnp.asarray(images), jnp.asarray(labels)


def make_batch(seed: int, n: int, img: int = 224, with_seg: bool = False,
               max_objects: int = 1, size_lo: int = 5, size_hi: int = 3,
               pairs: bool = False):
    """n images, each with 1..max_objects of 20 classes; a present class
    contributes a textured square (side drawn from [img/size_lo,
    img/size_hi]) at a non-overlapping random location over a noise
    background.

    Round-4 protocol (measured via scripts/seg_diagnose.py — the knob
    settings are diagnosis-driven, not guessed):
    - SINGLE object by default: the reference's bg rollout gate is
      max-NORMALIZED per image (validate.py:235), so with two objects the
      rollout suppresses whichever object the cls token attends to less —
      the GT keeps both and the mIoU floor is structural, not a model
      property.
    - side in [img/5, img/3] (4-11% of area): the trained rollout mask is
      peaked (it passes ~4% of pixels at the reference's 0.05 threshold);
      objects sized to that footprint make the bg-gate IoU — the metric's
      dynamic range — reflect localization quality instead of saturating
      the miss term.  The old 1-2x [img/4, img/2] draw measured truth
      mIoU ~13 with class accuracy ~0 (collapsed cos maps pass 100% of
      pixels at thr 0.5, so ALL discrimination flows through the rollout
      gate and class assignment).

    with_seg: also return the ground-truth segmentation masks [n, img, img]
    uint8 (0 = background, c+1 = class c — the VOC label convention), known
    exactly from the generated square locations.  This is what lets the
    synthetic substitute score the END artifact of validate.py:248-285
    (pseudo-seg mIoU) per serving mode."""
    if pairs:
        return make_pairs_batch(seed, n, img, with_seg,
                                size_lo=size_lo, size_hi=size_hi)
    r = np.random.RandomState(seed)
    images = r.normal(0.0, 0.25, size=(n, img, img, 3)).astype(np.float32)
    labels = np.zeros((n, NUM_CLASSES), np.float32)
    segs = np.zeros((n, img, img), np.uint8) if with_seg else None
    for i in range(n):
        occupied = np.zeros((img, img), bool)
        n_obj = r.randint(1, max_objects + 1)
        for c in r.choice(NUM_CLASSES, size=n_obj, replace=False):
            sq = r.randint(img // size_lo, img // size_hi + 1)
            # up to 8 placement attempts to avoid overlap: overlapping
            # squares make the GT mask ambiguous (the later class
            # overwrites pixels the earlier label still claims)
            for _ in range(8):
                y0 = r.randint(0, img - sq)
                x0 = r.randint(0, img - sq)
                if not occupied[y0:y0 + sq, x0:x0 + sq].any():
                    break
            else:
                continue
            labels[i, c] = 1.0
            occupied[y0:y0 + sq, x0:x0 + sq] = True
            yy, xx = np.mgrid[0:sq, 0:sq]
            tex = np.sin((xx + yy) * (np.pi / CLASS_FREQ[c]))[..., None]
            patch = CLASS_COLOR[c][None, None, :] * (0.75 + 0.25 * tex)
            images[i, y0:y0 + sq, x0:x0 + sq] += patch.astype(np.float32)
            if with_seg:
                segs[i, y0:y0 + sq, x0:x0 + sq] = c + 1
        if not labels[i].any():
            # every placement failed (vanishingly rare): retry the image as
            # single-object — the mAP metric needs >= 1 positive per row
            sq = img // 3
            c = int(r.randint(NUM_CLASSES))
            labels[i, c] = 1.0
            yy, xx = np.mgrid[0:sq, 0:sq]
            tex = np.sin((xx + yy) * (np.pi / CLASS_FREQ[c]))[..., None]
            images[i, :sq, :sq] += (CLASS_COLOR[c][None, None, :]
                                    * (0.75 + 0.25 * tex)).astype(np.float32)
            if with_seg:
                segs[i, :sq, :sq] = c + 1
    if with_seg:
        return jnp.asarray(images), jnp.asarray(labels), segs
    return jnp.asarray(images), jnp.asarray(labels)


def finetune(steps: int, batch: int, model: str, seed: int = 0,
             data_kw: dict | None = None, freeze_below: int = 0):
    """freeze_below=K: blocks 0..K-1 stay at their random init (update mask
    over the stacked-blocks leading axis).  The synthetic substitute for
    'generic pretrained lower layers': a from-scratch model solves the
    synthetic tasks with block-0..2 attention selection (measured across
    four protocols — seg_diagnose per-block mask stats), but the reference
    pipeline reads localization from blocks mask_from=4 / bg_blocks_from=5;
    freezing the early blocks forces the selection to emerge where the
    pipeline looks, as it does in pretrained ViTs."""
    from vision_transformer_cam_tpu.train.state import (create_train_state,
                                                        make_optimizer)
    from vision_transformer_cam_tpu.train.step import train_step
    data_kw = data_kw or {}

    cfg = configs.resolve_model(model)(num_classes=NUM_CLASSES)
    cfg = cfg.replace(representation_size=None,
                      dtype=jnp.bfloat16, param_dtype=jnp.float32,
                      attn_impl="pallas", drop_ratio=0.0,
                      attn_drop_ratio=0.0, drop_path_ratio=0.0)
    params = vit.init(cfg, jax.random.key(seed))
    tx, _ = make_optimizer(
        configs.OptimConfig(lr=5e-4, weight_decay=5e-5, warmup_epochs=1,
                            epochs=max(steps // 50, 2)),
        global_batch_size=batch, steps_per_epoch=50)
    if freeze_below:
        import optax
        inner = tx

        def _masked(path, u):
            if path and getattr(path[0], "key", None) == "blocks":
                keep = jnp.arange(u.shape[0]) >= freeze_below
                return u * keep.reshape(
                    (-1,) + (1,) * (u.ndim - 1)).astype(u.dtype)
            return u

        def _update(grads, st, params=None):
            updates, st = inner.update(grads, st, params)
            return jax.tree_util.tree_map_with_path(_masked, updates), st

        tx = optax.GradientTransformation(inner.init, _update)
    state = create_train_state(params, tx)
    rng = jax.random.key(42 + seed)
    t0 = time.perf_counter()
    for s in range(steps):
        images, labels = make_batch(1000 + s + 100000 * seed, batch,
                                    img=cfg.img_size, **data_kw)
        state, m = train_step(state, images, labels, rng, cfg, tx)
        if s % 25 == 0 or s == steps - 1:
            print(f"  step {s:4d}  loss {float(m['loss']):.4f}  "
                  f"f1 {float(m['f1']):.3f}  "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    return jax.device_get(state.params)


def _mask_stack(cls_rows, num_tokens):
    """attn_cls_rows [L, B, N] -> the model's per-layer normalized patch
    masks [L, B, P] (numpy replica of vit._mask_from_cls_row with
    per-sample normalization — the inference semantics).  These are the
    values the 0.25 mask-feedback threshold and the final top-16 selection
    are applied to (vit_model.py:339, :377)."""
    aug0 = np.asarray(cls_rows, np.float64).copy()
    aug0[..., 0] += 1.0
    aug0 /= aug0.sum(axis=-1, keepdims=True)
    m = aug0[..., num_tokens:]
    return m / m.max(axis=-1, keepdims=True)


def tie_margins(row, truth, cfg, mask_threshold=0.25):
    """Threshold-distance metrics (round-4 verdict item 7): when a mode's
    decisions flip vs the f32 truth, HOW FAR were the flipped patches from
    the decision boundary — in the truth's own normalized mask units?
    Flips concentrated within ~1e-2 of the boundary are threshold-tie
    noise (the known ±0.08 top-16-overlap replicate spread at N>=577);
    flips far from it would be structural quantization damage.

      maskFlip%: fraction of (layer, image, patch) 0.25-mask-feedback
                 decisions that differ from truth across ALL L layers —
                 the cascade's source population;
      tieD.25:   median min(|truth_mask - 0.25|, |mode_mask - 0.25|) over
                 those flips — the boundary distance of whichever side was
                 near the threshold.  (Truth-side distance alone is
                 uninformative here: a patch the truth's bg feedback
                 masked underflows to exactly 0 post-softmax, so every
                 downstream cascade site prints |0 - 0.25| = 0.25000
                 regardless of how the divergence started — first measured
                 on the round-5 ViT-B run.  The min-distance asks the
                 right question at both the ORIGIN flip, where one side
                 sat near 0.25, and at cascade sites, where the mode's
                 unmasked value may also be far from the boundary.);
      tieD16:    median distance of top-16 membership flips from the
                 truth's own 16th/17th-value boundary (last layer)."""
    mt = _mask_stack(truth["cls_rows"], cfg.num_tokens)
    mm = _mask_stack(row["cls_rows"], cfg.num_tokens)
    flips = (mt >= mask_threshold) != (mm >= mask_threshold)
    row["mask_flip_frac"] = float(flips.mean())
    row["tie_dist_mask"] = float(np.median(np.minimum(
        np.abs(mt[flips] - mask_threshold),
        np.abs(mm[flips] - mask_threshold)))) \
        if flips.any() else float("nan")
    last_t, last_m = mt[-1], mm[-1]
    d16 = []
    for i in range(last_t.shape[0]):
        st = set(np.asarray(truth["topi"][i]).tolist())
        sm = set(np.asarray(row["topi"][i]).tolist())
        flipped = st ^ sm
        if not flipped:
            continue
        v = np.sort(last_t[i])[::-1]
        k = truth["topi"].shape[1]
        boundary = 0.5 * (v[k - 1] + v[k])
        d16.extend(abs(last_t[i][p] - boundary) for p in flipped)
    row["tie_dist_top16"] = float(np.median(d16)) if d16 else float("nan")
    return row


def eval_mode(name, params, cfg, images, labels, truth=None, seg_gt=None,
              chunk=0, pcfg=None):
    from vision_transformer_cam_tpu.cam.pseudo_seg import pseudo_seg_batch
    from vision_transformer_cam_tpu.utils.metrics import ConfusionMatrix

    @jax.jit
    def fwd(p, x):
        out = vit.forward(p, x, cfg, need_rollout=True)
        cam = rollout.cam_from_rollout_row(out.rollout_row, cfg.grid_size)
        return out, cam

    # chunked eval: long-N models (ViT-L@384's rollout_post hm stack is
    # [24, B, 577, 577] f32) don't fit the whole eval set on a 16 GB chip
    n_total = int(images.shape[0])
    chunk = chunk or n_total
    logits_l, h1_l, topi_l, cam_l, preds_l, rows_l = [], [], [], [], [], []
    pcfg = pcfg or configs.PseudoSegConfig()
    for lo in range(0, n_total, chunk):
        out, cam_c = fwd(params, images[lo:lo + chunk])
        lg, h1c, tic = jax.device_get((out.logits, out.head1_logits,
                                       out.top_patch_idx))
        logits_l.append(lg), h1_l.append(h1c), topi_l.append(tic)
        cam_l.append(np.asarray(jax.device_get(cam_c)))
        rows_l.append(np.asarray(jax.device_get(out.attn_cls_rows),
                                 np.float32))       # [L, chunk, N]
        if seg_gt is not None:
            n_c = lg.shape[0]
            preds_l.extend(pseudo_seg_batch(out, cfg, pcfg,
                                            [seg_gt.shape[1:]] * n_c))
    logits, h1 = np.concatenate(logits_l), np.concatenate(h1_l)
    topi, cam = np.concatenate(topi_l), np.concatenate(cam_l)
    cls_rows = np.concatenate(rows_l, axis=1)
    lab = np.asarray(labels)
    m196 = compute_mAP(lab, 1 / (1 + np.exp(-logits.astype(np.float32))))
    m16 = compute_mAP(lab, 1 / (1 + np.exp(-h1.astype(np.float32))))
    row = {"mode": name, "mAP_196patch": float(np.mean(m196)),
           "mAP_16patch": float(np.mean(m16)),
           "cam": cam.astype(np.float32), "topi": topi,
           "cls_rows": cls_rows}
    if seg_gt is not None:
        # the END artifact (validate.py:248-285): full pseudo-seg pipeline,
        # scored as mIoU vs the known synthetic square masks (filler ids
        # > num_classes fold to background, as cli/validate.py scores it)
        preds = np.stack(preds_l).astype(np.int64)
        preds[preds > NUM_CLASSES] = 0
        cm = ConfusionMatrix(NUM_CLASSES)
        cm.update(seg_gt.reshape(-1).astype(np.int64), preds.reshape(-1))
        _, _, iou = cm.compute()
        row["miou"] = float(np.nanmean(np.asarray(iou)) * 100)
        row["seg"] = preds
    if truth is not None:
        dev = np.abs(row["cam"] - truth["cam"])
        row["cam_max_dev"] = float(dev.max())
        row["cam_mean_dev"] = float(dev.mean())
        # max dev is a TAIL metric: one fg/bg mask-threshold tie flip in an
        # early layer cascades into a large localized CAM change (even the
        # bf16 path shows ~0.3 on sharply-trained models) while the bulk of
        # the map is untouched.  p99.9 + the >1% fraction characterize the
        # body of the distribution.
        row["cam_p999"] = float(np.quantile(dev, 0.999))
        row["cam_frac_gt_1pct"] = float((dev > 0.01).mean())
        inter = [len(set(a.tolist()) & set(b.tolist())) / len(a)
                 for a, b in zip(topi, truth["topi"])]
        row["top16_overlap"] = float(np.mean(inter))
        if seg_gt is not None and "seg" in truth:
            # pixel agreement of this mode's pseudo-seg PNGs with the f32
            # path's — the artifact-level fidelity the top-16 overlap
            # only proxies
            row["seg_match"] = float((row["seg"] == truth["seg"]).mean())
        tie_margins(row, truth, cfg, mask_threshold=cfg.mask_threshold)
    return row


def main():
    from vision_transformer_cam_tpu.utils import (check_cli_flags,
                                                  honor_jax_platforms_env)
    honor_jax_platforms_env()  # JAX_PLATFORMS=cpu must actually stick
    check_cli_flags(sys.argv, bool_flags=("--sabotage", "--pairs"),
                    value_flags=("--steps", "--batch", "--eval", "--chunk",
                                 "--seed", "--model", "--freeze",
                                 "--objects", "--size_lo", "--size_hi",
                                 "--params"),
                    prog="quality_eval.py")

    def arg(flag, default):
        return int(sys.argv[sys.argv.index(flag) + 1]) \
            if flag in sys.argv else default

    steps = arg("--steps", 300)
    batch = arg("--batch", 64)
    n_eval = arg("--eval", 256)
    chunk = arg("--chunk", 0)
    # --seed N: an independent replicate (different init, train data draw
    # and eval draw) — how run-to-run threshold-tie noise is separated from
    # structural mode differences (the ViT-L@384 per-head-vs-per-tensor
    # question, BENCHMARKS quality section)
    seed = arg("--seed", 0)
    model = sys.argv[sys.argv.index("--model") + 1] \
        if "--model" in sys.argv else "vit_base_patch16_224_in21k"
    # protocol knobs (round-4 diagnosis, seg_diagnose.py): --pairs switches
    # to the relational two-square protocol; --freeze K leaves blocks 0..K-1
    # at random init so selection emerges where the reference pipeline
    # reads it (blocks >= 4); --objects/--size_* control the plain protocol
    data_kw = dict(max_objects=arg("--objects", 1),
                   size_lo=arg("--size_lo", 5), size_hi=arg("--size_hi", 3),
                   pairs="--pairs" in sys.argv)
    freeze_below = arg("--freeze", 0)

    base = configs.resolve_model(model)(num_classes=NUM_CLASSES)
    base = base.replace(representation_size=None)
    # long-N (ViT-L@384): measure the SHIPPED serving config — raised
    # scoped-VMEM partition, single-q-block kernel, rollout_post auto
    from vision_transformer_cam_tpu.utils import tune_tpu_for_long_sequence
    tune_tpu_for_long_sequence(base)

    # --params PATH: cache the fine-tuned weights across runs — the eval
    # half (metric changes, added modes) then re-runs without re-paying the
    # 10-20 min TPU fine-tune.  Loads if PATH exists, else fine-tunes and
    # saves.  The path is trusted to match (model, seed, protocol); keep
    # those in the filename.
    params_path = sys.argv[sys.argv.index("--params") + 1] \
        if "--params" in sys.argv else ""
    if params_path and os.path.exists(params_path):
        import pickle
        with open(params_path, "rb") as f:
            params = pickle.load(f)
        print(f"loaded fine-tuned params from {params_path}")
    else:
        print(f"fine-tuning {model} {steps} steps @ batch {batch} "
              f"on synthetic data  (protocol: {data_kw}, "
              f"freeze_below={freeze_below})")
        params = finetune(steps, batch, model, seed=seed, data_kw=data_kw,
                          freeze_below=freeze_below)
        if params_path:
            import pickle
            with open(params_path, "wb") as f:
                pickle.dump(jax.device_get(params), f)
            print(f"saved fine-tuned params to {params_path}")
    images, labels, seg_gt = make_batch(9999 + 100000 * seed, n_eval,
                                        img=base.img_size, with_seg=True,
                                        **data_kw)

    # "highest": on TPU the default matmul precision runs f32 dots as bf16
    # passes (~5e-3 CAM dev vs f64 — BENCHMARKS "f32 fidelity on TPU"), so
    # the truth baseline pins true-f32 passes.  (The tables' conclusions
    # pre-date this pin but are insensitive: threshold-tie density dwarfs a
    # 5e-3 baseline shift in every replicate.)
    f32 = base.replace(dtype=jnp.float32, param_dtype=jnp.float32,
                       matmul_precision="highest",
                       # inference semantics: the reference validates at
                       # batch 1, where global-max mask norm IS per-sample
                       per_sample_mask_norm=True)
    p32 = jax.tree.map(lambda a: a.astype(jnp.float32), params)
    truth = eval_mode("f32 exact (truth)", p32, f32, images, labels,
                      seg_gt=seg_gt, chunk=chunk)

    if "--sabotage" in sys.argv:
        # Dynamic-range proof (round-4 verdict item 5): a deliberately
        # broken bg gate — bg_rollout_threshold 0.05 -> 0.5 marks most
        # foreground rollout mass as background — must visibly crater the
        # truth mIoU.  If it doesn't, the synthetic protocol has no power
        # to catch a real pipeline regression and its per-mode table is
        # measuring mode-consistency only.
        broken = configs.PseudoSegConfig(bg_rollout_threshold=0.5)
        bad = eval_mode("f32 + SABOTAGED bg gate", p32, f32, images, labels,
                        seg_gt=seg_gt, chunk=chunk, pcfg=broken)
        print(f"\ntruth mIoU {truth['miou']:.2f}  ->  sabotaged bg gate "
              f"mIoU {bad['miou']:.2f}")
        # fall through to the per-mode table: one fine-tune serves both
        # the dynamic-range proof and the mode comparison

    bf = base.replace(dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
                      attn_impl="pallas", gelu_approx=True,
                      softmax_clamp=True, per_sample_mask_norm=True)
    pbf = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    rows = [truth,
            eval_mode("bf16+pallas+tanh+clamp (serving)", pbf, bf, images,
                      labels, truth, seg_gt, chunk=chunk)]

    from vision_transformer_cam_tpu.ops.quant import (calibrate_act_scales,
                                                      quantize_params)
    calib, _ = make_batch(777 + 100000 * seed, 16, img=base.img_size,
                          **data_kw)
    scales = calibrate_act_scales(pbf, bf, calib)
    pq = quantize_params(pbf, act_scales=scales)
    # int8_hifi ships with output-only int8 attention I/O (float probs,
    # kernel emits int8 for the proj GEMM) — measure the shipped graph
    rows.append(eval_mode("int8_hifi (W8A8, float attn, int8-OUT)", pq,
                          bf.replace(int8_attn_out=True), images, labels,
                          truth, seg_gt, chunk=chunk))
    rows.append(eval_mode("int8 + attn I/O per-head (default)", pq,
                          bf.replace(int8_attn_io=True), images, labels,
                          truth, seg_gt, chunk=chunk))
    # the round-2 per-tensor (q|k|v thirds) scales, for the ablation record
    import copy
    pq_t = copy.copy(pq)
    pq_t["blocks"] = copy.copy(pq["blocks"])
    pq_t["blocks"]["attn"] = copy.copy(pq["blocks"]["attn"])
    pq_t["blocks"]["attn"]["qkv"] = dict(
        pq["blocks"]["attn"]["qkv"],
        out_scales=jnp.max(pq["blocks"]["attn"]["qkv"]["out_scales"],
                           axis=2))
    rows.append(eval_mode("int8 + attn I/O per-tensor (r2)", pq_t,
                          bf.replace(int8_attn_io=True), images, labels,
                          truth, seg_gt, chunk=chunk))

    print(f"\n{'mode':36s} {'mAP_196':>8s} {'mAP_16':>8s} {'mIoU':>6s} "
          f"{'camMaxD':>8s} {'camP99.9':>8s} {'cam>1%':>7s} "
          f"{'camMeanD':>9s} {'top16ovl':>8s} {'segMatch':>8s} "
          f"{'mskFlip%':>8s} {'tieD.25':>8s} {'tieD16':>8s}")
    for r in rows:
        miou = f" {r['miou']:6.2f}" if "miou" in r else "       "
        extra = (f" {r['cam_max_dev']:8.5f} {r['cam_p999']:8.5f} "
                 f"{r['cam_frac_gt_1pct']:7.4f} {r['cam_mean_dev']:9.6f} "
                 f"{r['top16_overlap']:8.3f}") if "cam_max_dev" in r else ""
        match = f" {r['seg_match']:8.4f}" if "seg_match" in r else ""
        tie = (f" {100 * r['mask_flip_frac']:8.4f} {r['tie_dist_mask']:8.5f}"
               f" {r['tie_dist_top16']:8.5f}") if "mask_flip_frac" in r else ""
        print(f"{r['mode']:36s} {r['mAP_196patch']:8.4f} "
              f"{r['mAP_16patch']:8.4f}{miou}{extra}{match}{tie}")


if __name__ == "__main__":
    main()
