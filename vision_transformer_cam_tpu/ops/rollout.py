"""Attention rollout, fused for TPU.

The reference computes rollout three different ways:
  * in-model mask generation per block (vit_model.py:325-361) — one rollout
    step on the cls row;
  * the full 12-layer recursive matmul chain in predict.py:214-232;
  * a blocks-6..12 averaged single step for the background mask
    (validate.py:224-246).

Key identity exploited throughout: each head-mean attention row sums to 1, so
every consumer of the row-normalized (A + I) matrix that only reads the cls row
needs nothing but the per-layer head-mean cls-attention row [B, N] — which the
model emits from its forward scan.  Only the full joint chain needs the full
head-mean matrices, and even its final cls row reduces to a reverse
vector-matrix scan (O(L·N²) instead of O(L·N³)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def aug_normalize(headmean):
    """(A + I) row-normalized (predict.py:214-218).  headmean: [..., N, N]."""
    n = headmean.shape[-1]
    aug = headmean + jnp.eye(n, dtype=headmean.dtype)
    return aug / jnp.sum(aug, axis=-1, keepdims=True)


def aug_cls_row(cls_row):
    """Row 0 of aug_normalize, computed from the cls row alone.  [..., N]."""
    aug0 = cls_row.at[..., 0].add(1.0)
    return aug0 / jnp.sum(aug0, axis=-1, keepdims=True)


def rollout_joint(headmean_stack):
    """Full recursive chain joint[n] = aug[n] @ joint[n-1]
    (predict.py:222-226).  headmean_stack: [L, B, N, N] -> [L, B, N, N]."""
    aug = aug_normalize(headmean_stack)

    def step(carry, a):
        j = jnp.einsum("bij,bjk->bik", a, carry,
                       preferred_element_type=carry.dtype)
        return j, j

    _, joints = jax.lax.scan(step, aug[0], aug[1:])
    return jnp.concatenate([aug[:1], joints], axis=0)


def rollout_cls_row(headmean_stack):
    """Final joint-attention cls row without materializing the chain.

    row0(aug_L @ ... @ aug_1) computed by a reverse scan of vector-matrix
    products: with v the running row and s_l the row-sums of (A_l + I),
    v <- (v / s_l) @ A_l + (v / s_l).

    headmean_stack: [L, B, N, N] -> [B, N].
    """
    l, b, n, _ = headmean_stack.shape
    v0 = jnp.zeros((b, n), headmean_stack.dtype).at[:, 0].set(1.0)

    def step(v, a):
        s = 1.0 + jnp.sum(a, axis=-1)          # row sums of (A + I), [B, N]
        u = v / s
        v = jnp.einsum("bi,bij->bj", u, a,
                       preferred_element_type=v.dtype) + u
        return v, None

    v, _ = jax.lax.scan(step, v0, headmean_stack, reverse=True)
    return v


def _prefix(row_len: int, grid_size: int, prefix_tokens) -> int:
    """Number of non-patch prefix tokens to drop before the grid reshape.

    None (the default everywhere) infers it from the row length — 1 for
    plain configs, 2 for distilled (cls + dist) — so every CAM call site
    handles distilled models without threading cfg.num_tokens through
    (bench/validate/predict/export all hit this)."""
    if prefix_tokens is None:
        prefix_tokens = row_len - grid_size * grid_size
    # exact fit required in BOTH directions — an explicit prefix that
    # under-consumes (e.g. 1 on a distilled cls+dist row) must raise here,
    # not as an opaque reshape error downstream
    if prefix_tokens < 0 or prefix_tokens != row_len - grid_size * grid_size:
        raise ValueError(
            f"rollout row of length {row_len} does not hold a "
            f"{grid_size}x{grid_size} patch grid after {prefix_tokens} "
            "prefix tokens")
    return prefix_tokens


def rollout_cam(headmean_stack, grid_size, prefix_tokens=None):
    """predict.py:229-247: final joint cls->patch row, reshaped to the patch
    grid and normalized by its max.  Returns [B, g, g] in [0, 1].

    prefix_tokens: number of non-patch tokens to drop (cfg.num_tokens —
    2 for distilled configs); None = inferred from the row length."""
    v = rollout_cls_row(headmean_stack)
    p = _prefix(v.shape[-1], grid_size, prefix_tokens)
    mask = v[:, p:].reshape(v.shape[0], grid_size, grid_size)
    return mask / jnp.max(mask, axis=(1, 2), keepdims=True)


def cam_from_rollout_row(rollout_row, grid_size, prefix_tokens=None):
    """Final joint cls->patch row (the model's fused in-scan rollout carry) to
    a max-normalized CAM grid (predict.py:229-247).  [B, N] -> [B, g, g].
    prefix_tokens None = inferred (handles distilled rows)."""
    p = _prefix(rollout_row.shape[-1], grid_size, prefix_tokens)
    m = rollout_row[:, p:].reshape(
        rollout_row.shape[0], grid_size, grid_size)
    return m / jnp.max(m, axis=(1, 2), keepdims=True)


def per_block_cams(cls_rows, grid_size, prefix_tokens=None):
    """predict.py:261-274: per-block aug cls rows, max-normalized per block.
    cls_rows: [L, B, N] -> [L, B, g, g].  prefix_tokens None = inferred."""
    aug0 = aug_cls_row(cls_rows)
    p = _prefix(aug0.shape[-1], grid_size, prefix_tokens)
    m = aug0[..., p:]
    m = m.reshape(*m.shape[:-1], grid_size, grid_size)
    return m / jnp.max(m, axis=(-1, -2), keepdims=True)


def bg_rollout_row(cls_rows, from_block: int,
                   prefix_tokens: int = 1):
    """validate.py:224-235: head-mean attention averaged over blocks
    [from_block:], one rollout step, cls->patch row normalized by max.

    Averaging full matrices then taking row 0 of the row-normalized (M + I)
    equals running aug_cls_row on the averaged cls rows, since row sums of the
    average stay 1.  cls_rows: [L, B, N] -> [B, num_patches] in [0, 1].
    """
    if from_block >= cls_rows.shape[0]:
        raise ValueError(
            f"bg rollout from_block={from_block} >= depth "
            f"{cls_rows.shape[0]}: the empty mean would be silently NaN "
            "and every pseudo-seg pixel background")
    row = jnp.mean(cls_rows[from_block:], axis=0)
    aug0 = aug_cls_row(row)
    m = aug0[:, prefix_tokens:]
    # No grid_size arg here (the output stays a flat patch row), so the
    # _prefix exact-fit guard the sibling CAM helpers use doesn't apply —
    # but the result must still be a g*g patch grid downstream.  A
    # distilled row (cls + dist, N = g*g + 2) sliced with the default
    # prefix 1 leaves g*g + 1 entries: catch that here instead of as an
    # opaque reshape error (or a silently shifted grid) at the call site.
    n_patch = m.shape[-1]
    g = int(round(float(n_patch) ** 0.5))
    if g * g != n_patch:
        raise ValueError(
            f"bg rollout row has {n_patch} patch entries after dropping "
            f"{prefix_tokens} prefix token(s) — not a square patch grid; "
            "pass prefix_tokens=cfg.num_tokens (2 for distilled models)")
    return m / jnp.max(m, axis=-1, keepdims=True)
