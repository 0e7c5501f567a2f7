"""Backward-graph parity: stage-2-style loss + ALL parameter gradients vs torch.

tests/test_fullstack_parity.py proves the FORWARD composition elementwise;
training correctness additionally depends on every VJP XLA derives for the
same graph (GroupNorm, softmax attention, qkv_merge/LoRA branches, skip
concat, motion-module reshapes, time-embedding broadcast) and on the loss
arithmetic (inverted-mask weighting train_cam_ctrl.py:601-629; MotionDirector
debias :635-645).  This runs the full stage-2-style loss through the ENTIRE
UNet3D graph in both frameworks and matches:

- the loss value,
- d loss / d noisy-latents (flows through every layer of the graph),
- d loss / d pose & traj features (the injection points' backward; traj[3]'s
  gradient must be IDENTICALLY zero — the 4th-down-block quirk,
  unet_cam_obj.py:1227-1234 — a non-zero gradient there would silently train
  the adapter's last stage against a feature the forward never consumes),
- the COMPLETE parameter-gradient tree (every kernel/bias/LoRA/merge param),
  extracted from torch by swapping each Parameter's .data with its .grad and
  re-running the same params() mapping used by the forward parity test.

An optimizer update is params - lr*f(grads); with loss and grads matched
elementwise, the training math is pinned end-to-end on this tiny graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from synfmc_tpu.models.unet3d import UNet3D
from synfmc_tpu.training.losses import appearance_debias_loss, masked_diffusion_loss

from tests.test_fullstack_parity import TSpatial, TUNet3D

torch.manual_seed(0)

MW, SW, DEBIAS = 0.7, 0.3, 0.1  # mask/sd/debias loss weights


def _build_torch_model(chs, heads, xdim, lora_cfg, pose_scale):
    """TUNet3D with the reference per-layer LoRA divisor rule (rank = ch//cfg),
    exactly as the forward parity test builds it."""
    tm = TUNet3D(chs, heads, xdim, lora_rank=0, pose_scale=pose_scale)
    for i, blk in enumerate(tm.downs):
        if blk.cross:
            blk.attns = torch.nn.ModuleList(
                [TSpatial(chs[i], xdim, heads, chs[i] // lora_cfg) for _ in range(2)])
    rev = list(reversed(chs))
    for i, blk in enumerate(tm.ups):
        if blk.cross:
            blk.attns = torch.nn.ModuleList(
                [TSpatial(rev[i], xdim, heads, rev[i] // lora_cfg) for _ in range(3)])
    tm.mid_attn = TSpatial(chs[-1], xdim, heads, chs[-1] // lora_cfg)
    return tm


def _torch_grad_tree(tm):
    """Extract parameter gradients in the SAME pytree layout as tm.params():
    temporarily swap every Parameter's data with its grad, then reuse the
    exact same mapping (incl. conv/dense transposes) the forward test uses."""
    with torch.no_grad():
        for p in tm.parameters():
            if p.grad is None:
                p.grad = torch.zeros_like(p)
            p.data, p.grad = p.grad, p.data
        tree = tm.params()
        for p in tm.parameters():
            p.data, p.grad = p.grad, p.data
    return tree


def test_stage2_loss_and_grads_match_torch(rng):
    chs, heads, xdim, b, f, h, w = (32, 64, 128, 128), 4, 48, 1, 2, 16, 24
    lora_cfg, pose_scale = 8, 0.5
    tm = _build_torch_model(chs, heads, xdim, lora_cfg, pose_scale)

    x = rng.normal(size=(b, f, h, w, 4)).astype(np.float32)
    noise = rng.normal(size=(b, f, h, w, 4)).astype(np.float32)
    ctx = rng.normal(size=(b, 7, xdim)).astype(np.float32)
    t = np.array([321])
    pose = [rng.normal(size=(b, f, h // 2**i, w // 2**i, c)).astype(np.float32) * 0.3
            for i, c in enumerate(chs)]
    traj = [rng.normal(size=(b, f, h // 2**i, w // 2**i, c)).astype(np.float32) * 0.3
            for i, c in enumerate(chs)]
    # union object mask already at latent resolution (nearest_resize is then
    # the identity, so the torch side needs no resize transcription)
    mask = (rng.uniform(size=(b, f, h, w, 1)) < 0.4).astype(np.float32)

    # the debias anchor index is drawn inside appearance_debias_loss from this
    # key; reproduce the draw here so the torch side uses the same anchor
    dkey = jax.random.PRNGKey(7)
    anchor_idx = int(jax.random.randint(dkey, (b,), 0, f)[0])

    # ---- torch: forward, loss, autograd ----
    xt = torch.from_numpy(x).permute(0, 1, 4, 2, 3).requires_grad_(True)
    pose_t = [torch.from_numpy(p).permute(0, 1, 4, 2, 3).requires_grad_(True) for p in pose]
    traj_t = [torch.from_numpy(p).permute(0, 1, 4, 2, 3).requires_grad_(True) for p in traj]
    noise_t = torch.from_numpy(noise).permute(0, 1, 4, 2, 3)
    mask_t = torch.from_numpy(mask).permute(0, 1, 4, 2, 3)

    pred_t = tm(xt, torch.from_numpy(t), torch.from_numpy(ctx), pose_t, traj_t)
    m_inv = 1.0 - mask_t  # stage 2 inverts: emphasize background (train_cam_ctrl.py:624)
    sd_loss = torch.mean((pred_t - noise_t) ** 2)
    mask_loss = torch.mean((pred_t * m_inv - noise_t * m_inv) ** 2)
    anchor = noise_t[:, anchor_idx : anchor_idx + 1]
    s2 = 2.0 ** 0.5
    debias = torch.mean(((s2 * pred_t - anchor) - (s2 * noise_t - anchor)) ** 2)
    loss_t = MW * mask_loss + SW * sd_loss + DEBIAS * debias
    loss_t.backward()

    # ---- jax: same loss through the repo's own loss functions ----
    unet = UNet3D(
        block_out_channels=chs, attn_heads=heads, cross_attention_dim=xdim,
        use_motion_module=True, motion_num_heads=heads, camera_cond=True,
        pose_scale=pose_scale, lora_rank=lora_cfg,
    )
    params = jax.tree.map(np.asarray, tm.params())

    def loss_fn(params, x, pose, traj):
        pred = unet.apply({"params": params}, x, jnp.asarray(t), jnp.asarray(ctx),
                          pose_features=pose, traj_features=traj)
        loss, _ = masked_diffusion_loss(
            pred, jnp.asarray(noise), jnp.asarray(mask),
            invert_mask=True, mask_loss_weight=MW, sd_loss_weight=SW,
        )
        return loss + DEBIAS * appearance_debias_loss(pred, jnp.asarray(noise), dkey)

    loss_j, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2, 3))(
        params, jnp.asarray(x), [jnp.asarray(p) for p in pose], [jnp.asarray(p) for p in traj]
    )
    gp, gx, gpose, gtraj = grads

    np.testing.assert_allclose(float(loss_j), loss_t.detach().item(), rtol=1e-5)

    # input gradient: flows through every layer of the graph
    want_gx = xt.grad.permute(0, 1, 3, 4, 2).numpy()
    np.testing.assert_allclose(np.asarray(gx), want_gx, atol=1e-6, rtol=2e-3)

    # pose-feature gradients at all four scales (the qkv_merge injection path)
    for i in range(4):
        want = pose_t[i].grad.permute(0, 1, 3, 4, 2).numpy()
        np.testing.assert_allclose(np.asarray(gpose[i]), want, atol=1e-6, rtol=2e-3,
                                   err_msg=f"pose grad scale {i}")

    # traj gradients: scales 0-2 match torch; scale 3 must be EXACTLY zero
    # (the plain 4th down block never consumes it — quirk is load-bearing in
    # the backward too)
    for i in range(3):
        want = traj_t[i].grad.permute(0, 1, 3, 4, 2).numpy()
        np.testing.assert_allclose(np.asarray(gtraj[i]), want, atol=1e-6, rtol=2e-3,
                                   err_msg=f"traj grad scale {i}")
    assert traj_t[3].grad is None or not traj_t[3].grad.any()
    np.testing.assert_array_equal(np.asarray(gtraj[3]), 0.0)

    # the COMPLETE parameter-gradient tree, every leaf
    want_tree = jax.tree.map(np.asarray, _torch_grad_tree(tm))
    flat_got, treedef_got = jax.tree_util.tree_flatten_with_path(gp)
    flat_want = jax.tree_util.tree_leaves(want_tree)
    assert jax.tree_util.tree_structure(gp) == jax.tree_util.tree_structure(want_tree)
    checked = 0
    for (path, got_leaf), want_leaf in zip(flat_got, flat_want):
        name = jax.tree_util.keystr(path)
        scale = max(np.abs(want_leaf).max(), 1e-3)  # per-tensor tolerance floor
        np.testing.assert_allclose(
            np.asarray(got_leaf), want_leaf, atol=2e-3 * scale, rtol=2e-3,
            err_msg=f"param grad mismatch at {name}",
        )
        checked += 1
    assert checked > 400  # the tiny graph still has hundreds of parameter tensors
