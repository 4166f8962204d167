"""Pipeline parallelism over depth — stage-sharded blocks, microbatched
carry handoff via `ppermute` inside `shard_map`.

The reference scales only by replicating the whole model per GPU (DDP,
train_and_validate.py:142-146); for zoo members whose parameters or
activations outgrow one chip (ViT-H/14 depth 32, long-N ViT-L@384) the
TPU-native answer is to shard the *layer* dimension over a mesh axis.  The
model's block stack is already a `lax.scan` over stacked [L, ...] params
(models/vit.py), which makes stage sharding natural: each stage holds
`depth / n_stages` layers, the scan carry — (tokens, bg indicator, rollout
joint), the model's ONLY inter-layer state — is exactly the microbatch
"bubble" that flows stage-to-stage over ICI via collective-permute.

Schedule: plain GPipe-style fill-and-drain.  With S stages and M
microbatches, tick t has stage s working on microbatch (t - s); total
S + M - 1 ticks.  Warmup/drain ticks compute on zero/stale state and their
outputs are simply never collected (each tick writes into fixed [M, ...]
output buffers at index t - stage, skipped when out of range — no
(S+M-1)-tick stacking); stage 0 re-processes the last microbatch during
drain so no NaN-producing garbage ever enters the array flow.

Semantics note: `cfg.per_sample_mask_norm=True` is REQUIRED.  The reference
normalizes the iterative attention mask by the *batch-global* max
(vit_model.py:335) — a value that depends on which samples share a batch.
Under microbatching that coupling would make the result depend on M, so the
pipeline runner insists on the per-sample form (the knob the config exposes
for exactly this class of use); `forward()` on one device with the same flag
is then bit-identical, which tests/test_pipeline.py pins.

Differentiable end-to-end (ppermute/psum/gather all have VJPs), so
`jax.grad` through `pipeline_forward` gives stage-sharded block gradients;
`pipeline_train_step` + `stage_shard_params` make that a full optimizer
step whose updated block params STAY stage-sharded (each stage holds
depth/S layers in HBM).  Exercised by tests/test_pipeline.py (forward,
grad, and train-step update equality vs the single-device path) and
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vision_transformer_cam_tpu.configs import ViTCAMConfig
from vision_transformer_cam_tpu.models import vit
from vision_transformer_cam_tpu.models.vit import ViTCAMOutput


def _block_apply(lp, tok, bg, joint, i, cfg: ViTCAMConfig, need_rollout):
    """One transformer block + CAM mask update (the XLA inference path of
    models/vit.py's scan body — vit_model.py:319-361).  `i` is the GLOBAL
    layer index (stage * layers_per_stage + local index)."""
    xn = vit._layer_norm(tok, lp["ln1"]["scale"], lp["ln1"]["bias"],
                         cfg.ln_eps)
    o, cls_row, hm, _, _ = vit._attention_xla(
        lp["attn"], xn, bg, cfg, None,
        "headmean" if need_rollout else None)
    tok = tok + o
    yn = vit._layer_norm(tok, lp["ln2"]["scale"], lp["ln2"]["bias"],
                         cfg.ln_eps)
    hmid = vit._gelu(vit._linear(yn, lp["mlp"]["fc1"], cfg), cfg.gelu_approx)
    tok = tok + vit._linear(hmid, lp["mlp"]["fc2"], cfg)
    _, new_bg = vit._mask_from_cls_row(cls_row, cfg)
    bg = jnp.where(i >= cfg.mask_from, new_bg, bg)
    if need_rollout:
        from vision_transformer_cam_tpu.ops.rollout import aug_normalize
        joint = jnp.einsum(
            "bij,bjk->bik", aug_normalize(hm.astype(joint.dtype)), joint,
            preferred_element_type=joint.dtype)
    return tok, bg, joint, cls_row


@functools.partial(jax.jit, static_argnames=(
    "cfg", "mesh", "stage_axis", "data_axis", "microbatches",
    "need_rollout"))
def pipeline_forward(params, x, cfg: ViTCAMConfig, mesh: Mesh, *,
                     stage_axis: str = "stage", data_axis=None,
                     microbatches=None, need_rollout=False) -> ViTCAMOutput:
    """Run the CAM forward with the block stack sharded over `stage_axis`.

    params: host, replicated or stage_shard_params-placed param pytree
    (blocks stacked [L, ...] as built by vit.init).  x: [B, H, W, C].
    `microbatches` defaults to the stage count (the smallest M that fills
    the pipeline).  When `data_axis` is given the microbatch dimension is
    additionally batch-sharded over it (dp x pp).  Returns a ViTCAMOutput
    with the same fields a plain XLA-path forward(need_rollout=...) fills;
    block internals match vit.forward bit-for-bit (pinned by
    tests/test_pipeline.py).  Jitted with the config/mesh/schedule static —
    repeated calls with the same layout reuse the compiled program.
    """
    if not cfg.per_sample_mask_norm:
        raise ValueError(
            "pipeline_forward requires cfg.per_sample_mask_norm=True: the "
            "reference's batch-global mask max (vit_model.py:335) would "
            "couple samples across microbatches, making the output depend "
            "on the microbatch count.")
    if (cfg.attn_impl == "pallas" or cfg.attn_block_fusion or cfg.mlp_fusion
            or cfg.ln_quant_fusion or cfg.int8_fused_gemm):
        raise ValueError("pipeline_forward runs the XLA block path; drop "
                         "the Pallas-kernel knobs (attn_impl='pallas', "
                         "attn_block_fusion, mlp_fusion, ln_quant_fusion, "
                         "int8_fused_gemm).")
    if cfg.matmul_precision:
        # same mechanism as vit.forward: the precision must reach every dot
        # traced below (including inside the shard_mapped tick scan)
        with jax.default_matmul_precision(cfg.matmul_precision):
            return _pipeline_forward(
                params, x, cfg.replace(matmul_precision=None), mesh,
                stage_axis=stage_axis, data_axis=data_axis,
                microbatches=microbatches, need_rollout=need_rollout)
    return _pipeline_forward(params, x, cfg, mesh, stage_axis=stage_axis,
                             data_axis=data_axis, microbatches=microbatches,
                             need_rollout=need_rollout)


def _pipeline_forward(params, x, cfg: ViTCAMConfig, mesh: Mesh, *,
                      stage_axis, data_axis, microbatches, need_rollout):
    s = mesh.shape[stage_axis]
    depth, b, n = cfg.depth, x.shape[0], cfg.seq_len
    if depth % s:
        raise ValueError(f"depth {depth} not divisible by {s} stages")
    lps = depth // s
    m = microbatches or s
    if b % m:
        raise ValueError(f"batch {b} not divisible by {m} microbatches")
    mb = b // m

    tokens0 = vit.embed_tokens(params, x, cfg).reshape(m, mb, n,
                                                       cfg.embed_dim)
    bg0 = jnp.zeros((m, mb, n), cfg.dtype)
    rollout_dtype = jnp.float32 if cfg.dtype == jnp.bfloat16 else cfg.dtype
    joint0 = jnp.broadcast_to(jnp.eye(n, dtype=rollout_dtype),
                              (m, mb, n, n)) if need_rollout \
        else jnp.zeros((m, mb, 1, 1), rollout_dtype)

    # stage-shard the stacked block params: [L, ...] -> [S, lps, ...]
    blocks_st = jax.tree.map(
        lambda l: l.reshape((s, lps) + l.shape[1:]), params["blocks"])
    block_specs = jax.tree.map(
        lambda l: P(stage_axis, *([None] * (l.ndim - 1))), blocks_st)
    mb_spec = P(None, data_axis, None, None)   # [M, mb, ...]: mb over data

    def run(blocks_loc, toks, bgs, joints):
        # blocks_loc: [1, lps, ...] local stage slice
        blk = jax.tree.map(lambda l: l[0], blocks_loc)
        stage = jax.lax.axis_index(stage_axis)
        perm = [(i, (i + 1) % s) for i in range(s)]

        def tick(carry, t):
            tok, bg, joint, btok, bcls, brow = carry
            # inject at stage 0 (idx clamps so drain ticks re-process the
            # last microbatch instead of flowing wrapped garbage)
            idx = jnp.minimum(t, m - 1)
            at0 = stage == 0
            tok = jnp.where(at0, jax.lax.dynamic_index_in_dim(
                toks, idx, keepdims=False), tok)
            bg = jnp.where(at0, jax.lax.dynamic_index_in_dim(
                bgs, idx, keepdims=False), bg)
            joint = jnp.where(at0, jax.lax.dynamic_index_in_dim(
                joints, idx, keepdims=False), joint)

            def layer(c, xs):
                tok2, bg2, joint2 = c
                lp, j = xs
                tok2, bg2, joint2, cls_row = _block_apply(
                    lp, tok2, bg2, joint2, stage * lps + j, cfg,
                    need_rollout)
                return (tok2, bg2, joint2), cls_row

            (tok, bg, joint), cls_rows = jax.lax.scan(
                layer, (tok, bg, joint), (blk, jnp.arange(lps)))
            # collect into fixed [M, ...] buffers (this stage processed
            # microbatch t - stage this tick; warmup/drain ticks are
            # invalid and leave the buffers untouched) — stacking all
            # S+M-1 tick outputs would inflate the collected-output
            # footprint by (S+M-1)/M on exactly the models pp exists for
            oidx = t - stage
            valid = (oidx >= 0) & (oidx < m)
            cidx = jnp.clip(oidx, 0, m - 1)

            def collect(buf, val):
                return jnp.where(valid, jax.lax.dynamic_update_index_in_dim(
                    buf, val, cidx, 0), buf)

            btok = collect(btok, tok)
            bcls = collect(bcls, cls_rows)
            brow = collect(brow, joint[:, 0, :])
            # hand the carry to the next stage over ICI
            tok, bg, joint = (jax.lax.ppermute(a, stage_axis, perm)
                              for a in (tok, bg, joint))
            return (tok, bg, joint, btok, bcls, brow), None

        # zeros are safe warmup state (LN of zeros is finite; warmup tick
        # outputs are never collected); local shapes come from the operands
        # — under dp the per-device microbatch is mb / dp_size
        mbl, nl = toks.shape[1], toks.shape[2]
        # the carry becomes stage-varying after the first ppermute (and the
        # buffers after the first collect); mark the constant-zero initial
        # values as varying so the scan types match.  zeros_like inherits
        # the operand's varying axes (data, when dp-sharded); the FRESH
        # zeros buffers start with none, so they need every axis the
        # in-body values vary over
        all_axes = (stage_axis,) + ((data_axis,) if data_axis else ())
        stg = lambda a: jax.lax.pcast(a, (stage_axis,), to="varying")  # noqa: E731,E501
        fresh = lambda a: jax.lax.pcast(a, all_axes, to="varying")  # noqa: E731,E501
        carry0 = (stg(jnp.zeros_like(toks[0])), stg(jnp.zeros_like(bgs[0])),
                  stg(jnp.zeros_like(joints[0])),
                  stg(jnp.zeros_like(toks)),
                  fresh(jnp.zeros((m, lps, mbl, nl), cfg.dtype)),
                  fresh(jnp.zeros((m,) + joints.shape[1:2]
                                  + joints.shape[3:], joints.dtype)))
        (_, _, _, btok, bcls, brow) = jax.lax.scan(
            tick, carry0, jnp.arange(s + m - 1))[0]

        last = stage == s - 1
        tok_fin = jax.lax.psum(jnp.where(last, btok, 0), stage_axis)
        row_fin = jax.lax.psum(jnp.where(last, brow, 0), stage_axis)
        return tok_fin, jnp.moveaxis(bcls, 1, 0), row_fin

    shmap = jax.shard_map(
        run, mesh=mesh,
        in_specs=(block_specs, mb_spec, P(None, data_axis, None),
                  mb_spec),
        out_specs=(mb_spec, P(stage_axis, None, data_axis, None),
                   P(None, data_axis, None)))
    tok_fin, cls_all, row_fin = shmap(blocks_st, tokens0, bg0, joint0)

    tokens = tok_fin.reshape(b, n, cfg.embed_dim)
    cls_rows = cls_all.reshape(depth, b, n)                 # [L, B, N]
    rollout_row = row_fin.reshape(b, n) if need_rollout else None

    # --- heads (the post-scan tail of models/vit.forward_features) ---
    mask14, _ = vit._mask_from_cls_row(cls_rows[-1], cfg)
    _, top_idx = jax.lax.top_k(mask14, cfg.top_k_patches)
    patch_tokens = tokens[:, cfg.num_tokens:, :]
    top_embeds = jnp.take_along_axis(patch_tokens, top_idx[:, :, None],
                                     axis=1)
    head1_in = jnp.mean(top_embeds, axis=1)
    head1_logits = jnp.dot(
        head1_in, params["head1"]["kernel"].astype(cfg.dtype),
        preferred_element_type=cfg.dtype) \
        + params["head1"]["bias"].astype(cfg.dtype)
    xf = vit._layer_norm(tokens, params["norm"]["scale"],
                         params["norm"]["bias"], cfg.ln_eps)
    cls_feat = xf[:, 0]
    if cfg.has_logits:
        cls_feat = jnp.tanh(jnp.dot(
            cls_feat, params["pre_logits"]["kernel"].astype(cfg.dtype),
            preferred_element_type=cfg.dtype)
            + params["pre_logits"]["bias"].astype(cfg.dtype))
    logits = jnp.dot(cls_feat, params["head"]["kernel"].astype(cfg.dtype),
                     preferred_element_type=cfg.dtype) \
        + params["head"]["bias"].astype(cfg.dtype)
    if cfg.distilled:
        dist_logits = jnp.dot(
            xf[:, 1], params["head_dist"]["kernel"].astype(cfg.dtype),
            preferred_element_type=cfg.dtype) \
            + params["head_dist"]["bias"].astype(cfg.dtype)
        logits = (logits + dist_logits) / 2.0
    return ViTCAMOutput(
        logits=logits, head1_logits=head1_logits, attn_cls_rows=cls_rows,
        top_patch_embeds=top_embeds, top_patch_idx=top_idx,
        head1_kernel=params["head1"]["kernel"], rollout_row=rollout_row,
        tokens_prenorm=tokens)


def stage_shard_params(mesh: Mesh, params, stage_axis: str = "stage"):
    """Place a param pytree with the stacked block params sharded over the
    stage axis (dim 0 — depth) and everything else replicated.

    Stage s then HOLDS only its depth/S block slice in HBM — the parameter
    memory win pipeline parallelism exists for.  pipeline_forward's
    [L, ...] -> [S, lps, ...] reshape of a dim-0-sharded array is a local
    view (contiguous slices land on their stage), so consuming these placed
    params needs no relayout."""
    s = mesh.shape[stage_axis]

    def spec(path, leaf):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "blocks" in keys and leaf.ndim >= 1 and leaf.shape[0] % s == 0:
            return NamedSharding(mesh, P(stage_axis))
        return NamedSharding(mesh, P())

    return jax.device_put(
        params, jax.tree_util.tree_map_with_path(spec, params))


@functools.partial(jax.jit, static_argnames=(
    "cfg", "tx", "mesh", "stage_axis", "data_axis", "microbatches"),
    donate_argnames=("state",))
def pipeline_train_step(state, images, labels, cfg: ViTCAMConfig, tx,
                        mesh: Mesh, *, stage_axis: str = "stage",
                        data_axis=None, microbatches=None):
    """One optimizer step through the pipeline-parallel forward.

    The pp analog of train/step.train_step (reference hot loop
    utils.py:144-203): dual multilabel-soft-margin loss over both heads,
    grads by autodiff through the fill-and-drain schedule (ppermute/psum
    VJPs — GPipe-style: the backward replays the schedule in reverse; a
    1F1B memory schedule is a possible refinement, not a semantics change),
    optax update.  Deterministic (the pipeline blocks take no dropout
    RNG); stochastic-regularization fine-tuning stays on the dp/tp path.
    Pinned against train_step update equality in tests/test_pipeline.py.
    """
    import optax

    from vision_transformer_cam_tpu.ops.losses import dual_head_loss
    from vision_transformer_cam_tpu.train.state import TrainState

    def loss_fn(params):
        out = pipeline_forward(params, images, cfg, mesh,
                               stage_axis=stage_axis, data_axis=data_axis,
                               microbatches=microbatches)
        loss, parts = dual_head_loss(out.logits, out.head1_logits, labels)
        return loss, parts

    (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return (TrainState(step=state.step + 1, params=params,
                       opt_state=opt_state),
            {"loss": loss, **parts})
