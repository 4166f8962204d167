"""Shape-fuzz property tests for the fused attention kernels (round-3
verdict item 8): the q-block/padding edges the long-N tuning keeps touching
must stay correct for EVERY shape class, not just the flagship 197-token
one — ragged q-block tails, non-128-multiple N, dh=80 (ViT-H/14's head
width), odd head counts, and the >1k-token regime BASELINE config #4 names
(N=1025 = ViT-L/16@512).

All interpret-mode (CPU), pinned against the plain-jnp reference math
(_xla_attention_core / ops.rollout identities) on random inputs with a
nontrivial bg mask.
"""

import functools

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from vision_transformer_cam_tpu.kernels.attention import (  # noqa: E402
    _xla_attention_core, masked_attention_fused)

# (n, heads, dh, q_block, block_b) — q_block 0 = auto; the explicit ones
# force ragged tail blocks (e.g. 147 @ 64 -> 64+64+19; 1025 @ 384 ->
# 384+384+257)
CASES = [
    pytest.param(130, 4, 32, 0, 1, id="n130_h4_dh32"),
    pytest.param(147, 3, 40, 64, 1, id="n147_h3_dh40_qb64_ragged"),
    pytest.param(257, 16, 80, 0, 2, id="n257_h16_dh80_vith_bb2"),
    pytest.param(513, 2, 32, 256, 1, id="n513_qb256_ragged"),
    pytest.param(1025, 2, 32, 384, 1, id="n1025_gt1k_qb384"),
    pytest.param(1025, 2, 32, 0, 1, id="n1025_gt1k_auto"),
]


def _inputs(n, h, dh, b=2, seed=0):
    c = h * dh
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.standard_normal((b, n, 3 * c)) * 0.5, jnp.float32)
    # nontrivial bg: ~30% background keys, cls position always foreground
    bg = jnp.asarray(rng.random((b, n)) < 0.3, jnp.float32).at[:, 0].set(0.0)
    return qkv, bg


@pytest.mark.parametrize("n,h,dh,qb,bb", CASES)
def test_fused_kernel_matches_xla_core(n, h, dh, qb, bb):
    qkv, bg = _inputs(n, h, dh)
    scale = dh ** -0.5
    ref_out, ref_cls = _xla_attention_core(qkv, bg, h, scale, -100.0)
    out, cls_row = masked_attention_fused(
        qkv, bg, num_heads=h, scale=scale, q_block=qb, block_b=bb,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_row), np.asarray(ref_cls),
                               atol=2e-6)


@pytest.mark.parametrize("n,h,dh,qb,bb", CASES[:4])
def test_fused_kernel_headmean_and_rollout(n, h, dh, qb, bb):
    """with_headmean == mean-over-heads of the reference probabilities, and
    the in-kernel rollout update == (aug_normalize(hm) @ J) on a random
    (non-identity) joint — the q-block slicing must keep every variant
    exact, not just the plain output."""
    from vision_transformer_cam_tpu.ops.rollout import aug_normalize
    qkv, bg = _inputs(n, h, dh, seed=1)
    scale = dh ** -0.5
    b = qkv.shape[0]

    out, cls_row, hm = masked_attention_fused(
        qkv, bg, num_heads=h, scale=scale, q_block=qb, block_b=bb,
        with_headmean=True, interpret=True)
    # reference headmean from the plain-jnp probabilities
    c = h * dh
    q, k, v = (qkv.reshape(b, n, 3, h, dh).transpose(2, 0, 3, 1, 4)[i]
               for i in range(3))
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    pair = jnp.minimum(bg[:, :, None] + bg[:, None, :], 1.0)
    p = jax.nn.softmax(s + (-100.0 * pair)[:, None], axis=-1)
    ref_hm = jnp.mean(p, axis=1)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(ref_hm),
                               atol=2e-6)

    rng = np.random.default_rng(2)
    joint = jnp.asarray(rng.random((b, n, n)), jnp.float32)
    _, _, newj = masked_attention_fused(
        qkv, bg, joint, num_heads=h, scale=scale, q_block=qb, block_b=bb,
        interpret=True)
    ref_j = jnp.einsum("bij,bjk->bik", aug_normalize(ref_hm), joint,
                       preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(newj), np.asarray(ref_j),
                               atol=2e-5)


def test_seq_kernel_gt1k_tokens():
    """The sequence-parallel kernel wrap at N=1025 (>1k tokens): token axis
    pads 1025 -> 1028 over 4 shards; out/cls/headmean must match the fused
    kernel bit-for-practical-purposes."""
    from vision_transformer_cam_tpu.kernels.attention import (
        masked_attention_seq)
    from vision_transformer_cam_tpu.parallel import mesh as meshlib
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = meshlib.make_mesh((2, 4), ("data", "seq"))
    n, h, dh = 1025, 2, 32
    qkv, bg = _inputs(n, h, dh, seed=3)
    scale = dh ** -0.5
    ref_out, ref_cls, ref_hm = masked_attention_fused(
        qkv, bg, num_heads=h, scale=scale, with_headmean=True,
        interpret=True)
    # batch-sharded placement: 1025 doesn't divide the 4 token shards; the
    # wrapper pads to 1028 and reshards via its shard_map in_specs
    with jax.set_mesh(mesh):
        out, cls_row, hm = jax.jit(functools.partial(
            masked_attention_seq, num_heads=h, scale=scale,
            with_headmean=True, interpret=True, seq_axis="seq",
            data_axis="data"))(
            jax.device_put(qkv, NamedSharding(mesh, P("data"))),
            jax.device_put(bg, NamedSharding(mesh, P("data"))))
        jax.block_until_ready(out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(cls_row), np.asarray(ref_cls),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(hm), np.asarray(ref_hm),
                               atol=2e-6)
