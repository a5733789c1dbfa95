"""Training loop (python -m gof_tpu.train -s <data> -m <out>).

Replaces the reference train.py:90-278. TPU-native structure: the entire
optimization step (render -> losses -> backward -> Adam -> densification
stats) is ONE jitted function with donated buffers, and the host dispatches
it in lax.scan WINDOWS of up to 10 iterations (cameras/gt indexed on device
from stacked arrays) so per-dispatch host overhead amortizes; the host only
samples camera ids, schedules densify/reset/filter refreshes at window
boundaries, right-sizes static capacities from demand telemetry (re-jit),
and writes logs/checkpoints from one packed metrics readback per window.

Loss parity (train.py:124-190):
  rgb:       (1 - lambda_dssim) * L1(+appearance) + lambda_dssim * (1 - SSIM)
  distortion: mean of channel 8, weight lambda_distortion from iter 15000
  normal:    1 - dot(render normal in world, normal from depth), weight
             lambda_depth_normal from iter 15000
Schedule parity: SH degree +1 every 1k iters; densify every 100 in
[500, 15000); opacity reset every 3000; 3D filter refresh every 100 post-
densify iters (train.py:252-269).
"""

from __future__ import annotations

import functools
import json
import os
import random
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import cameras as cameras_lib
from . import config as config_lib
from .data import scene as scene_lib
from .model import appearance as app_lib
from .model import gaussians as gm
from .ops import binning as binning_lib
from .ops import render as render_lib
from .ops.blend import pixel_rays
from .utils import hostio, losses, schedules


class TrainParams(NamedTuple):
    gauss: gm.GaussianParams
    app_net: Optional[dict]
    app_emb: Optional[jnp.ndarray]


class FusedAdamState(NamedTuple):
    """Adam moments for the six gaussian groups live in ONE dense [NCOL, CAP]
    f32 buffer per moment (NCOL = 59 = 3+3+45+3+4+1 flattened param columns,
    CAP in the lane dimension).

    WHY: a [CAP, C] buffer (or worse, [CAP, 15, 3] leaves mirroring
    features_rest) is stored in TPU tiled layouts that pad the minor
    dimension(s) to the (8, 128) vector tile — measured on v5e at 3M
    gaussians: elementwise over [P, 59] runs at 244 GB/s effective vs
    609 GB/s for [59, P], and a default-layout f32[3M, 15, 3] buffer is a
    24.6 GB allocation (42x pad, AOT-rejected for exceeding HBM). With
    TrainParams-shaped moments the fused Adam cost 160 ms/step of the
    449 ms 3M train step; the flat dense layout removes ~10x of that
    traffic. Appearance-net moments (small, irregular) stay per-leaf.
    Defaults on the app fields keep legacy 3-field checkpoint pickles
    loadable (load_checkpoint migrates them).
    """

    count: jnp.ndarray
    mu_flat: jnp.ndarray  # [NCOL, CAP] f32
    nu_flat: jnp.ndarray  # [NCOL, CAP] f32
    mu_app: object = None  # (app_net, app_emb) moment pytree or None
    nu_app: object = None


# flattened column count per gaussian param leaf (order = GaussianParams)
def _gauss_cols(gg: gm.GaussianParams) -> list:
    return [int(np.prod(l.shape[1:])) if l.ndim > 1 else 1 for l in gg]


def flatten_gauss_t(gg: gm.GaussianParams) -> jnp.ndarray:
    """[CAP, ...] leaves -> one dense [NCOL, CAP] buffer (rows = columns of
    the per-gaussian parameter matrix, order xyz|f_dc|f_rest|scaling|
    rotation|opacity)."""
    P = gg.xyz.shape[0]
    return jnp.concatenate([l.reshape(P, -1).T for l in gg], axis=0)


def unflatten_gauss_t(f: jnp.ndarray, like: gm.GaussianParams) -> gm.GaussianParams:
    cols = _gauss_cols(like)
    parts = jnp.split(f, np.cumsum(cols)[:-1], axis=0)
    return gm.GaussianParams(
        *[p.T.reshape(l.shape) for p, l in zip(parts, like)])


def make_optimizer(opt: config_lib.OptimizationParams, spatial_lr_scale: float):
    """Fused per-group Adam (training_setup, gaussian_model.py:342-364):
    eps 1e-15, exp position schedule scaled by the scene extent.

    The reference keeps one torch Adam with 8 param groups. A literal
    optax.multi_transform translation spends ~4 ms/step in ~50 tiny fused
    kernels at 100k gaussians (per-fusion overhead, not bandwidth), so the
    six gaussian groups run the identical Adam math over one dense
    [NCOL, CAP] buffer (see FusedAdamState for why the lanes-major layout)
    with a per-ROW learning rate; the appearance params run per-leaf.
    """

    def xyz_lr(step):
        return schedules.expon_lr(
            step,
            opt.position_lr_init * spatial_lr_scale,
            opt.position_lr_final * spatial_lr_scale,
            opt.position_lr_max_steps,
            lr_delay_mult=opt.position_lr_delay_mult,
            lr_delay_steps=0,
        )

    b1, b2, eps = 0.9, 0.999, 1e-15

    def app_moments(params: TrainParams):
        if params.app_net is None and params.app_emb is None:
            return None
        return jax.tree.map(jnp.zeros_like,
                            (params.app_net, params.app_emb))

    def init(params: TrainParams):
        ncol = sum(_gauss_cols(params.gauss))
        cap = params.gauss.xyz.shape[0]
        return FusedAdamState(
            count=jnp.zeros((), jnp.int32),
            mu_flat=jnp.zeros((ncol, cap), jnp.float32),
            nu_flat=jnp.zeros((ncol, cap), jnp.float32),
            mu_app=app_moments(params),
            nu_app=app_moments(params),
        )

    def update(grads: TrainParams, state: FusedAdamState, params=None):
        del params
        count_inc = state.count + 1
        cf = count_inc.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf

        def adam_leaf(g, m, v, lr):
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * g * g
            upd = (-lr) * (m2 / bc1) / (jnp.sqrt(v2 / bc2) + eps)
            return upd, m2, v2

        # --- gaussian groups: one [NCOL, CAP] buffer, per-row lr ---
        gg = grads.gauss
        cols = _gauss_cols(gg)
        lrs = [xyz_lr(state.count), opt.feature_lr, opt.feature_lr / 20.0,
               opt.scaling_lr, opt.rotation_lr, opt.opacity_lr]
        lr_rows = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(lr, jnp.float32)[None], (c,))
             for lr, c in zip(lrs, cols)])

        upd_f, mu_f, nu_f = adam_leaf(
            flatten_gauss_t(gg), state.mu_flat, state.nu_flat,
            lr_rows[:, None])

        # --- appearance params: per-leaf (few, small) ---
        def app_update(gtree, mtree, vtree, lr):
            if gtree is None:
                return None, None, None
            trip = jax.tree.map(lambda g, m, v: adam_leaf(g, m, v, lr),
                                gtree, mtree, vtree)
            pick = lambda i: jax.tree.map(
                lambda t: t[i], trip, is_leaf=lambda t: isinstance(t, tuple))
            return pick(0), pick(1), pick(2)

        mu_net, mu_emb = state.mu_app if state.mu_app is not None else (None, None)
        nu_net, nu_emb = state.nu_app if state.nu_app is not None else (None, None)
        upd_net, mu_net, nu_net = app_update(
            grads.app_net, mu_net, nu_net, opt.appearance_network_lr)
        upd_emb, mu_emb, nu_emb = app_update(
            grads.app_emb, mu_emb, nu_emb, opt.appearance_embeddings_lr)

        updates = TrainParams(gauss=unflatten_gauss_t(upd_f, gg),
                              app_net=upd_net, app_emb=upd_emb)
        has_app = grads.app_net is not None or grads.app_emb is not None
        new_state = FusedAdamState(
            count=count_inc, mu_flat=mu_f, nu_flat=nu_f,
            mu_app=(mu_net, mu_emb) if has_app else None,
            nu_app=(nu_net, nu_emb) if has_app else None,
        )
        return updates, new_state

    return optax.GradientTransformation(init, update)


def depth_to_normal(camera: cameras_lib.Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """World-space normals from the median-depth map via central differences
    (utils/depth_utils.py:6-35). Returns [3, H, W] with zero border."""
    H, W = camera.height, camera.width
    rx, ry = pixel_rays(W, H, camera.focal_x, camera.focal_y)
    dirs_view = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)  # [H, W, 3]
    R_c2w = camera.world_view[:3, :3].T
    rays_world = dirs_view @ R_c2w.T
    points = depth[..., None] * rays_world + camera.cam_center  # [H, W, 3]
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = jnp.cross(dx, dy)
    # rsqrt(sum + eps): jnp.linalg.norm has a NaN gradient at exactly 0, and
    # background pixels produce zero normals
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    out = jnp.pad(n, ((1, 1), (1, 1), (0, 0)))
    return out.transpose(2, 0, 1)


def masked_shs(params: gm.GaussianParams, active_degree: jnp.ndarray, max_degree: int) -> jnp.ndarray:
    """Zero SH coefficients beyond the warmup degree (oneupSHdegree,
    train.py:131-132) so the degree can be traced without re-jitting."""
    shs = gm.get_features(params)
    K = shs.shape[1]
    k_idx = jnp.arange(K)
    keep = k_idx < (active_degree + 1) ** 2
    return shs * keep[None, :, None]


def _dp_grad_step(view_loss, mesh, tp: TrainParams, gstate: gm.GaussianState,
                  gt_stack: jnp.ndarray, cam_stack):
    """Camera-batch data-parallel value_and_grad under shard_map.

    Each device evaluates `view_loss` on its own (gt, camera) slice; grads
    and scalar metrics are pmean-reduced, densification-stat contributions
    psum-summed per view (sum of per-view gradient norms, as if the views
    were consecutive reference iterations, train.py:253-254 +
    gaussian_model.py:709-714), and overflow telemetry is max-reduced so the
    gate trips if ANY device overflowed. All outputs are replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    def per_device(tp, gstate, gt_d, cam_d):
        gt = gt_d[0]
        camera = jax.tree.map(lambda x: x[0], cam_d)
        carrier0 = jnp.zeros((tp.gauss.xyz.shape[0], 3), jnp.float32)
        (loss, aux), (grads, carrier_grad) = jax.value_and_grad(
            lambda tp, c: view_loss(tp, c, gt, camera),
            argnums=(0, 1), has_aux=True,
        )(tp, carrier0)
        loss = jax.lax.pmean(loss, axis)
        grads = jax.tree.map(lambda x: jax.lax.pmean(x, axis), grads)
        # per-view densification-stat contributions (summed over views)
        vis = aux["visibility"] & gstate.active
        gxy = jnp.where(vis, jnp.linalg.norm(carrier_grad[:, :2], axis=-1), 0.0)
        gabs = jnp.where(vis, jnp.abs(carrier_grad[:, 2]), 0.0)
        stat = jax.lax.psum(
            jnp.stack([gxy, gabs, vis.astype(jnp.float32)]), axis)
        radii = jax.lax.pmax(
            jnp.where(vis, aux["radii"], 0.0).astype(jnp.float32), axis)
        mean_keys = ("l1", "ssim", "distortion", "depth_normal", "psnr")
        red = {k: jax.lax.pmean(aux[k], axis) for k in mean_keys}
        for k in ("num_keys", "compact_demand"):
            red[k] = jax.lax.pmax(aux[k], axis)
        for k in ("key_overflow", "compact_overflow", "live_overflow"):
            red[k] = jax.lax.pmax(aux[k].astype(jnp.int32), axis) > 0
        red["live_demand"] = jax.lax.pmax(aux["live_demand"], axis)
        return loss, grads, stat, radii, red

    loss, grads, stat, radii, red = shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )(tp, gstate, gt_stack, cam_stack)

    vis_any = stat[2] > 0
    gstate_new = gstate._replace(
        grad_accum=gstate.grad_accum + stat[0],
        grad_abs_accum=gstate.grad_abs_accum + stat[1],
        denom=gstate.denom + stat[2],
        max_radii2d=jnp.where(
            vis_any, jnp.maximum(gstate.max_radii2d, radii), gstate.max_radii2d),
    )
    # radii/visibility in the reduced aux feed logging only; the stat update
    # above already consumed the per-view values
    red["radii"] = radii
    red["visibility"] = vis_any
    return loss, red, grads, gstate_new


def build_train_step(
    opt: config_lib.OptimizationParams,
    model_cfg: config_lib.ModelParams,
    pipe: config_lib.PipelineParams,
    tx,
    interpret: bool = False,
    with_stats: bool = True,
    with_reg: bool = True,
    n_inner: int = 1,
    dp: int = 1,
    mesh=None,
    live_ntiles: int = 0,
):
    """Build the jitted train step.

    dp > 1 enables camera-batch data parallelism over a `dp`-device
    jax.sharding.Mesh (the TPU replacement for the reference's
    one-process-per-GPU dispatch, scripts/run_mipnerf360.py:50-81): each
    device renders a DIFFERENT training view of the same scene, gradients are
    pmean-reduced over ICI, densification-stat contributions are psum-summed
    per view, and the overflow gate trips if ANY device overflowed — the
    exact single-chip semantics extended to batch size dp. `gt` then carries
    a leading [dp] axis and every camera leaf is stacked to [dp, ...].
    """
    sh_degree = model_cfg.sh_degree
    kernel_size = model_cfg.kernel_size
    use_app = model_cfg.use_decoupled_appearance
    backend = pipe.backend
    capacity = pipe.key_capacity
    # temporal liveness culling (binning.compact_live): per-(camera, tile)
    # live-prefix bounds ride the scan carry; only meaningful single-device
    # on the pallas backend, once densification ends
    use_live = (live_ntiles > 0 and pipe.live_capacity > 0
                and dp == 1 and backend == "pallas")
    if dp > 1 and mesh is None:
        from .parallel import sharding as shard_lib

        mesh = shard_lib.make_mesh(dp)

    def step_body(tp: TrainParams, opt_state, gstate: gm.GaussianState,
                  gt: jnp.ndarray, step: jnp.ndarray,
                  camera: cameras_lib.Camera, bg: jnp.ndarray, lim=None):
        active_degree = jnp.minimum(step // 1000, sh_degree)
        ntiles_cam = 0
        if use_live and lim is not None:
            # the cache rows are sized for the LARGEST camera (live_ntiles);
            # this camera's tile grid may be smaller (mixed-resolution
            # scenes train in per-resolution groups) — static slice
            _ntx, _nty = binning_lib.tile_grid(camera.width, camera.height)
            ntiles_cam = _ntx * _nty
            lim = lim[:ntiles_cam]

        def view_loss(tp: TrainParams, carrier, gt, camera):
            g = tp.gauss
            scales_f = gm.filtered_scaling(g, gstate.filter_3d)
            opac_f = gm.filtered_opacity(g, gstate.filter_3d)
            shs = masked_shs(g, active_degree, sh_degree)
            out = render_lib.render(
                camera, g.xyz, scales_f, g.rotation, opac_f, shs, sh_degree,
                kernel_size, bg, carrier=carrier, active_mask=gstate.active,
                capacity=capacity, backend=backend, interpret=interpret,
                with_stats=with_stats, with_reg=with_reg,
                compact_capacity=pipe.compact_capacity,
                live_limit_chunks=lim if use_live else None,
                live_capacity=pipe.live_capacity if use_live else 0,
            )
            image = out.image[:3]
            if use_app:
                l1 = app_lib.appearance_l1(image, gt, tp.app_net, tp.app_emb, camera.uid)
            else:
                l1 = losses.l1_loss(image, gt)
            ssim_val = losses.ssim(image, gt)
            rgb_loss = (1.0 - opt.lambda_dssim) * l1 + opt.lambda_dssim * (1.0 - ssim_val)

            if with_reg:
                distortion_loss = jnp.mean(out.image[8])

                depth = out.image[6]
                d2n = depth_to_normal(camera, depth)
                rn = out.image[3:6]
                rn = rn * jax.lax.rsqrt(jnp.sum(rn * rn, axis=0, keepdims=True) + 1e-12)
                rn_world = jnp.einsum("ij,jhw->ihw", camera.world_view[:3, :3].T, rn)
                normal_error = 1.0 - jnp.sum(rn_world * d2n, axis=0)
                depth_normal_loss = jnp.mean(normal_error)

                lam_dist = jnp.where(step >= opt.distortion_from_iter, opt.lambda_distortion, 0.0)
                lam_dn = jnp.where(step >= opt.depth_normal_from_iter, opt.lambda_depth_normal, 0.0)
                loss = rgb_loss + lam_dist * distortion_loss + lam_dn * depth_normal_loss
            else:
                # before min(distortion_from_iter, depth_normal_from_iter) the
                # regularizer weights are zero; the reg channels and their
                # gradient paths are compiled out of the kernels entirely
                distortion_loss = jnp.zeros(())
                depth_normal_loss = jnp.zeros(())
                loss = rgb_loss
            aux = {
                "l1": l1, "ssim": ssim_val, "distortion": distortion_loss,
                "depth_normal": depth_normal_loss, "radii": out.radii,
                "visibility": out.visibility, "num_keys": out.num_keys,
                "key_overflow": out.overflow, "psnr": losses.psnr(image, gt),
                "compact_demand": out.compact_demand,
                "compact_overflow": out.compact_overflow,
                "live_counts": out.live_counts, "live_bad": out.live_bad,
                "live_overflow": out.live_overflow,
                "live_demand": out.live_demand,
            }
            return loss, aux

        if dp == 1:
            carrier0 = jnp.zeros((tp.gauss.xyz.shape[0], 3), jnp.float32)
            (loss, aux), (grads, carrier_grad) = jax.value_and_grad(
                lambda tp, c: view_loss(tp, c, gt, camera),
                argnums=(0, 1), has_aux=True,
            )(tp, carrier0)
            stat_new = gm.add_densification_stats(
                gstate, carrier_grad, aux["radii"], aux["visibility"])
        else:
            loss, aux, grads, stat_new = _dp_grad_step(
                view_loss, mesh, tp, gstate, gt, camera)

        if not use_app:
            # keep appearance leaves untouched (zero grads)
            grads = grads._replace(
                app_net=jax.tree.map(jnp.zeros_like, tp.app_net),
                app_emb=(None if tp.app_emb is None
                         else jnp.zeros_like(tp.app_emb)),
            )

        # Key-overflow steps rendered with the deepest duplicated keys
        # dropped, and compact-overflow steps clamped gradient-row writes;
        # either way the gradients are polluted. Skip the whole update (the
        # host grows the capacity and re-jits right after), keeping the step
        # a no-op instead of training on a truncated list.
        overflow = aux["key_overflow"] | aux["compact_overflow"]
        live_inv = jnp.zeros((), bool)
        if use_live:
            # a stale liveness bound truncated an unsaturated tile (wrong
            # image/gradients) or the compacted list overflowed: skip the
            # update and heal the cached bounds
            live_inv = aux["live_overflow"] | jnp.any(aux["live_bad"])
            overflow = overflow | live_inv

        def gate(old, new):
            return jax.tree.map(
                lambda a, b: jnp.where(overflow, a, b) if hasattr(b, "dtype") else b,
                old, new)

        updates, new_opt_state = tx.update(grads, opt_state, tp)
        tp = gate(tp, optax.apply_updates(tp, updates))
        opt_state = gate(opt_state, new_opt_state)
        gstate = gate(gstate, stat_new)
        metrics = {k: aux[k] for k in ("l1", "ssim", "distortion", "depth_normal", "num_keys", "key_overflow", "psnr", "compact_demand", "compact_overflow")}
        metrics["loss"] = loss
        # ONE packed vector for the host's periodic log read: each separate
        # scalar readback pays a full device-sync RTT (~30 ms through the
        # TPU tunnel); eight of them every 10 iterations would dominate the
        # step time. Counts < 2^24 are exact in f32.
        metrics["step_next"] = step + 1
        metrics["packed"] = jnp.stack([
            loss, aux["psnr"],
            aux["num_keys"].astype(jnp.float32),
            aux["key_overflow"].astype(jnp.float32),
            aux["compact_demand"].astype(jnp.float32),
            aux["compact_overflow"].astype(jnp.float32),
            jnp.sum(gstate.active).astype(jnp.float32),
            aux["live_demand"].astype(jnp.float32),
            aux["live_overflow"].astype(jnp.float32),
            live_inv.astype(jnp.float32),
        ])
        if use_live and lim is not None:
            # next visit's per-tile bounds: the measured live prefix plus
            # margin; exponential growth where the bound proved stale; no
            # update from an overflowed (garbage) walk
            lim_c = jnp.minimum(lim, binning_lib.LIM_INF)
            measured = aux["live_counts"] + binning_lib.LIVE_MARGIN_CHUNKS
            new_lim = jnp.where(aux["live_bad"], lim_c * 2 + 4, measured)
            # key/compact-overflow steps walked a truncated/garbage list —
            # their measured live counts are meaningless, so keep the old
            # bound for ANY invalid step, not just live_overflow (otherwise
            # a capacity-growth step poisons the cache with too-small bounds
            # and triggers a burst of detected-stale skips right after)
            invalid_walk = (aux["key_overflow"] | aux["compact_overflow"]
                            | aux["live_overflow"])
            new_lim = jnp.where(invalid_walk, lim_c, new_lim)
            if live_ntiles and ntiles_cam < live_ntiles:
                # pad back to the cache row width; the pad entries are never
                # consumed for this camera (sliced off above next visit)
                new_lim = jnp.concatenate([
                    new_lim,
                    jnp.full((live_ntiles - ntiles_cam,), binning_lib.LIM_INF,
                             jnp.int32)])
            metrics["live_new_lim"] = new_lim
        return tp, opt_state, gstate, metrics

    # Only the (large) gaussian params are donated. Everything else contains
    # leaves that XLA constant-dedup/CSE can make share one buffer (zero conv
    # biases, equal Adam counts, freshly-reset zero densification stats), and
    # donating a shared buffer twice is a runtime error.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(gauss: gm.GaussianParams, app_net, app_emb, opt_state,
                   gstate, gt, step, camera, bg, lim=None):
        tp = TrainParams(gauss=gauss, app_net=app_net, app_emb=app_emb)
        return step_body(tp, opt_state, gstate, gt, step, camera, bg, lim=lim)

    def wrapped(tp: TrainParams, opt_state, gstate, gt, step, camera, bg,
                lim=None):
        args = (tp.gauss, tp.app_net, tp.app_emb, opt_state, gstate, gt,
                step, camera, bg)
        tp, opt_state, gstate, metrics = (
            train_step(*args, lim=lim) if use_live and lim is not None
            else train_step(*args))
        # metrics["step_next"] = step + 1 rides the jit so the loop keeps
        # its counter ON DEVICE: a per-iteration host->device scalar
        # transfer through the TPU tunnel blocks for a full RTT
        return tp, opt_state, gstate, metrics

    if n_inner <= 1:
        return wrapped

    # --- scan-windowed multi-step: one dispatch per n_inner iterations ---
    # Dispatching one pjit call through the tunneled backend costs O(10ms)
    # of single-core host time (arg-handle serialization); at ~25ms device
    # steps that dominates wall clock. The window indexes its cameras and
    # gt images on device from stacked arrays.
    @functools.partial(jax.jit, donate_argnums=(0,) + ((10,) if use_live else ()))
    def multi_step(gauss, app_net, app_emb, opt_state, gstate,
                   gt_stack, cam_ids, step0, cam_stack, bg, live_cache=None,
                   gid_map=None):
        def body(carry, i):
            if use_live:
                tp, opt_state, gstate, step, live_cache = carry
            else:
                tp, opt_state, gstate, step = carry
            cid = cam_ids[i]
            camera = jax.tree.map(lambda x: x[cid], cam_stack)
            gt = gt_stack[cid]
            # mixed-resolution scenes pass per-resolution-group stacks; cid
            # is group-local while the liveness cache stays indexed by the
            # GLOBAL camera id (gid_map: local -> global)
            gid = cid if gid_map is None else gid_map[cid]
            lim = live_cache[gid] if use_live else None
            tp, opt_state, gstate, metrics = step_body(
                tp, opt_state, gstate, gt, step, camera, bg, lim=lim)
            if use_live:
                live_cache = live_cache.at[gid].set(metrics["live_new_lim"])
                carry = (tp, opt_state, gstate, step + 1, live_cache)
            else:
                carry = (tp, opt_state, gstate, step + 1)
            return carry, metrics["packed"]

        tp0 = TrainParams(gauss=gauss, app_net=app_net, app_emb=app_emb)
        carry0 = ((tp0, opt_state, gstate, step0, live_cache) if use_live
                  else (tp0, opt_state, gstate, step0))
        carry, packed = jax.lax.scan(body, carry0, jnp.arange(n_inner))
        out = {"packed_all": packed, "step_next": carry[3]}
        if use_live:
            out["live_cache"] = carry[4]
        return carry[0], carry[1], carry[2], out

    def wrapped_multi(tp, opt_state, gstate, gt_stack, cam_ids, step0,
                      cam_stack, bg, live_cache=None, gid_map=None):
        args = (tp.gauss, tp.app_net, tp.app_emb, opt_state, gstate,
                gt_stack, cam_ids, step0, cam_stack, bg)
        if use_live:
            return multi_step(*args, live_cache, gid_map=gid_map)
        return multi_step(*args, gid_map=gid_map)

    return wrapped_multi


def zero_moments_predicate(capacity: int):
    def fn(leaf, targets, ok):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            t = jnp.where(ok, targets, capacity)
            return leaf.at[t].set(jnp.zeros_like(leaf[:1])[0], mode="drop")
        return leaf

    return fn


def grow_capacity(tp: TrainParams, gstate: gm.GaussianState, opt_state, old_cap: int, new_cap: int):
    """Host-side pool growth: pad every capacity-sized leaf with zeros/defaults."""

    def pad(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == old_cap:
            x = np.asarray(leaf)
            out = np.zeros((new_cap,) + x.shape[1:], x.dtype)
            out[:old_cap] = x
            return jnp.asarray(out)
        # the fused Adam's dense [NCOL, CAP] moment buffers grow in the
        # lane (slot) dimension
        if (hasattr(leaf, "ndim") and leaf.ndim == 2
                and leaf.shape[1] == old_cap and leaf.shape[0] != old_cap):
            x = np.asarray(leaf)
            out = np.zeros((x.shape[0], new_cap), x.dtype)
            out[:, :old_cap] = x
            return jnp.asarray(out)
        return leaf

    tp2 = jax.tree.map(pad, tp)
    # quaternions of fresh slots must be valid (copy: np.asarray of a jax
    # array is a read-only view)
    rot = np.array(tp2.gauss.rotation, copy=True)
    rot[old_cap:, 0] = 1.0
    tp2 = tp2._replace(gauss=tp2.gauss._replace(rotation=jnp.asarray(rot)))
    gstate2 = jax.tree.map(pad, gstate)
    opt_state2 = jax.tree.map(pad, opt_state)
    return tp2, gstate2, opt_state2


def training(model_cfg: config_lib.ModelParams, opt: config_lib.OptimizationParams,
             pipe: config_lib.PipelineParams, test_iterations, save_iterations,
             checkpoint_iterations, start_checkpoint: str = "", quiet: bool = False,
             interpret: bool = False, profile_dir: str = "",
             debug_image_interval: int = 0, dp: int = 1):
    random.seed(0)
    np.random.seed(0)

    mesh = None
    if dp > 1:
        from .parallel import sharding as shard_lib

        if jax.device_count() < dp:
            raise RuntimeError(
                f"--dp {dp} needs {dp} devices; only {jax.device_count()} "
                f"visible on backend '{jax.default_backend()}'")
        mesh = shard_lib.make_mesh(dp)

    sc = scene_lib.Scene(
        model_cfg.source_path, model_cfg.model_path, images=model_cfg.images,
        resolution=model_cfg.resolution, white_background=model_cfg.white_background,
        eval_split=model_cfg.eval, load_allres=model_cfg.load_allres,
    )
    config_lib.save_cfg(model_cfg.model_path, model_cfg, pipe, opt)

    n0 = sc.info.point_cloud_xyz.shape[0]
    cap = 1 << max(int(np.ceil(np.log2(max(n0 * 2, 1024)))), 10)
    gauss, gstate = gm.init_from_points(
        sc.info.point_cloud_xyz, sc.info.point_cloud_rgb, model_cfg.sh_degree, cap
    )
    app_rng = jax.random.PRNGKey(0)
    app_net, app_emb = app_lib.init_appearance(app_rng)
    tp = TrainParams(gauss=gauss, app_net=app_net, app_emb=app_emb)

    tx = make_optimizer(opt, sc.cameras_extent)
    opt_state = tx.init(tp)
    # force-materialize distinct buffers: optax init dedupes the eight Adam
    # count scalars into one constant, which breaks buffer donation
    opt_state = jax.tree.map(lambda x: jnp.array(np.asarray(x)), opt_state)

    first_iter = 0
    if start_checkpoint:
        tp, opt_state, gstate, first_iter = load_checkpoint(start_checkpoint)
        opt_state = jax.tree.map(lambda x: jnp.asarray(x), opt_state)
        if not quiet:
            print(f"resumed from {start_checkpoint} at iteration {first_iter}")

    cam_meta = sc.all_cameras_meta(sc.train_cameras)
    filt = gm.compute_3d_filter(tp.gauss.xyz, gstate.active, *cam_meta)
    gstate = gstate._replace(filter_3d=filt)

    bg = jnp.asarray([1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0])
    reg_start = min(opt.distortion_from_iter, opt.depth_normal_from_iter)
    with_stats = first_iter + 1 <= opt.densify_until_iter
    with_reg = first_iter + 1 >= reg_start

    # --- scan-window size: one dispatch per n_inner iterations ---
    # Every host control point (densify cadence, opacity reset, phase flips,
    # eval/save/checkpoint iterations, metric logging) must land on a window
    # boundary, so the window is the gcd of all cadences (target 10). A
    # dispatch through the tunneled backend costs ~10ms of single-core host
    # time; at ~25ms device steps, per-iteration dispatch dominates wall
    # clock. Mixed camera resolutions fall back to single-step.
    import math as _math

    cadences = [10, opt.densification_interval, opt.opacity_reset_interval,
                max(opt.densify_until_iter, 1), max(reg_start, 1),
                max(opt.densify_from_iter, 1), opt.iterations]
    cadences += [int(i) for i in list(test_iterations) + list(save_iterations)
                 + list(checkpoint_iterations) if int(i) > first_iter]
    if debug_image_interval:
        cadences.append(debug_image_interval)
    n_inner = 10
    for c in cadences:
        n_inner = _math.gcd(n_inner, c)
    if first_iter % max(n_inner, 1) != 0:
        n_inner = 1
    n_inner = max(n_inner, 1)

    # Mixed camera resolutions (load_allres multi-scale scenes) train in
    # per-resolution GROUPS: every scan window draws all its cameras from
    # one group (jit needs uniform image shapes per dispatch), groups are
    # interleaved across windows proportionally to their camera counts, so
    # each camera's marginal visit frequency matches the reference's
    # uniform shuffled-epoch sampling (train.py:135-141) while scan
    # windows and liveness culling stay enabled.
    _res_groups: dict = {}
    for _i, _c in enumerate(sc.train_cameras):
        _res_groups.setdefault(sc._scaled_size(_c), []).append(_i)
    res_group_ids = [np.asarray(v, np.int32) for v in _res_groups.values()]
    multi_res = len(res_group_ids) > 1

    specials = sorted(set(
        int(i) for i in list(test_iterations) + list(save_iterations)
        + list(checkpoint_iterations)))

    def late_window(at_iter: int) -> int:
        """Dispatch window once densification-era host controls are done:
        the only remaining cadences are the 100-step filter refresh, the
        sparse eval/save/checkpoint iterations, and the optional debug-image
        dump — so the scan window can grow to 100 (one host dispatch per
        100 steps instead of 10)."""
        n = _math.gcd(100, at_iter) if at_iter else 100
        for s in specials + [opt.iterations]:
            if s > at_iter:
                n = _math.gcd(n, s)
        if debug_image_interval:
            n = _math.gcd(n, debug_image_interval)
        return max(n, 1)

    from .constants import TILE_W as _TILE_W
    ntiles_max = max((-(-cw // _TILE_W)) * (-(-ch // _TILE_W))
                     for cw, ch in (sc._scaled_size(c) for c in sc.train_cameras))
    live_cache = None  # [ncams, ntiles] per-tile live-prefix bounds (chunks)
    live_peak = 0

    def rebuild_step():
        return build_train_step(opt, model_cfg, pipe, tx, interpret=interpret,
                                with_stats=with_stats, with_reg=with_reg,
                                n_inner=n_inner, dp=dp, mesh=mesh,
                                live_ntiles=(ntiles_max if live_cache is not None
                                             else 0))

    train_step = rebuild_step()
    densify_fn = jax.jit(
        lambda p, s, o, k, use_size: gm.densify_and_prune(
            p, s, o, k, opt.densify_grad_threshold, 0.05, sc.cameras_extent,
            opt.percent_dense, use_size,
        )
    )
    reset_fn = jax.jit(gm.reset_opacity)
    filter_fn = jax.jit(gm.compute_3d_filter)

    # host-side camera data cache
    cam_cache = {}

    def get_cam(info):
        if info.uid not in cam_cache:
            cam, gt = sc.camera(info)
            cam_cache[info.uid] = (cam, jnp.asarray(gt))
        return cam_cache[info.uid]

    # >= 800px-wide cameras for the 30% high-res oversampling
    # (reference train.py:112-116,139-141)
    highres_ids = [i for i, c in enumerate(sc.train_cameras)
                   if sc._scaled_size(c)[0] >= 800]

    cam_stack = gt_stack = None
    group_stacks = None  # [(cam_stack, gt_stack, gid_map, local_queue)] per group
    group_credit = None
    group_weight = None
    if n_inner > 1 and not multi_res:
        # device-resident stacks the scan window indexes per step; built
        # from host arrays directly (populating cam_cache too would hold a
        # second full-resolution copy of every view in HBM)
        cams_l, gts_l = zip(*(sc.camera(i) for i in sc.train_cameras))
        cam_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cams_l)
        gt_stack = jnp.asarray(np.stack([np.asarray(g) for g in gts_l]))
    elif n_inner > 1:
        # per-resolution-group stacks + proportional interleave scheduler
        group_stacks = []
        for gids in res_group_ids:
            cams_l, gts_l = zip(*(sc.camera(sc.train_cameras[int(i)])
                                  for i in gids))
            group_stacks.append((
                jax.tree.map(lambda *xs: jnp.stack(xs), *cams_l),
                jnp.asarray(np.stack([np.asarray(g) for g in gts_l])),
                jnp.asarray(gids),
                [],  # local shuffled id queue (refilled per group-epoch)
            ))
        n_total = sum(len(g) for g in res_group_ids)
        group_weight = np.asarray(
            [len(g) / n_total for g in res_group_ids], np.float64)
        if model_cfg.sample_more_highres and highres_ids:
            # fold the 30% high-res oversampling (reference
            # train.py:139-141) into the group interleave: a size group is
            # uniformly >= 800px wide or not, so the per-camera marginal
            # 0.7/N + 0.3*[hr]/N_hr sums per group to the weights below
            hr = np.asarray([1.0 if sc._scaled_size(
                sc.train_cameras[int(g[0])])[0] >= 800 else 0.0
                for g in res_group_ids])
            sizes = np.asarray([len(g) for g in res_group_ids], np.float64)
            n_hr = float((sizes * hr).sum())
            group_weight = 0.7 * sizes / n_total + 0.3 * sizes * hr / n_hr
        group_credit = np.zeros(len(group_stacks), np.float64)

    log_path = os.path.join(model_cfg.model_path, "train_log.jsonl")
    logf = open(log_path, "a")
    tb = _make_tb_writer(model_cfg.model_path)
    stack = []
    key = jax.random.PRNGKey(0)
    ema_loss = None
    compact_peak = 0
    key_peak = 0
    step_dev = None  # device-resident iteration counter (seeded lazily)
    pending_metrics = []  # unread per-window packed metrics (device arrays)
    t_start = time.time()

    # optional device tracing (the reference's analog is torch.cuda.Event
    # timing + tensorboard scalars, train.py:103-126); we expose the full
    # jax profiler instead
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    iteration = first_iter
    while iteration < opt.iterations:
        # Widen the dispatch window once every densification-era host
        # control (densify/100, opacity reset/3000, phase flips) is behind
        # us: the remaining cadences (filter refresh/100, sparse eval/save)
        # allow ~100-step scan windows, cutting per-dispatch host overhead
        # 10x for the back half of training.
        if (n_inner > 1 and iteration >= opt.densify_until_iter
                and iteration + 1 >= reg_start
                and late_window(iteration) > n_inner
                and iteration % 100 == 0):
            n_inner = late_window(iteration)
            train_step = None  # rebuilt below after phase flips
        iteration += n_inner
        # `iteration` is the END of the current n_inner-step window (== the
        # iteration itself when n_inner == 1); every cadence below lands on
        # a window boundary by construction of n_inner.
        win_start = iteration - n_inner + 1
        # after densification ends, the densify-stat pseudo-gradients are
        # compiled out of the backward kernel
        if with_stats and win_start > opt.densify_until_iter:
            with_stats = False
            train_step = None
        # once a regularizer activates, its channels are compiled back in;
        # the flip covers the whole window CONTAINING reg_start (the step at
        # reg_start applies nonzero weights; earlier steps in the window
        # compute the channels with zero lambda, which is exact)
        if not with_reg and iteration >= reg_start:
            with_reg = True
            train_step = None
        # Enable temporal liveness culling once densification is over: the
        # per-(camera, tile) saturation prefixes are stable from here on
        # (no clones/splits/opacity resets), so keys past the previous
        # visit's live prefix (+margin) are image-exactly dead. Start at
        # live_capacity == key_capacity (no shrink win yet) so first visits
        # with unbounded limits can measure; the telemetry right-sizes it
        # down within ~2 windows.
        if (live_cache is None and dp == 1 and pipe.backend == "pallas"
                and not interpret and n_inner > 1
                and win_start > opt.densify_until_iter):
            pipe.live_capacity = pipe.key_capacity
            live_cache = jnp.full((len(sc.train_cameras), ntiles_max),
                                  binning_lib.LIM_INF, jnp.int32)
            train_step = None
            if not quiet:
                print(f"[{iteration}] liveness culling on "
                      f"(live_capacity {pipe.live_capacity})")
        if train_step is None:
            train_step = rebuild_step()

        def next_id():
            nonlocal stack
            if not stack:
                stack = list(range(len(sc.train_cameras)))
                random.shuffle(stack)
            j = stack.pop()
            # 30% high-res oversampling (train.py:139-141); the pop above
            # still consumes a stack entry, as in the reference
            if model_cfg.sample_more_highres and highres_ids and random.random() < 0.3:
                j = highres_ids[random.randint(0, len(highres_ids) - 1)]
            return j

        if step_dev is None:  # (re)seed the device-resident step counter
            step_dev = jnp.asarray(win_start, jnp.int32)
        if n_inner == 1:
            if dp == 1:
                camera, gt = get_cam(sc.train_cameras[next_id()])
            else:
                # one optimizer step consumes dp distinct views
                pairs = [get_cam(sc.train_cameras[next_id()]) for _ in range(dp)]
                camera = jax.tree.map(lambda *xs: jnp.stack(xs),
                                      *[c for c, _ in pairs])
                gt = jnp.stack([g for _, g in pairs])
            tp, opt_state, gstate, metrics = train_step(
                tp, opt_state, gstate, gt, step_dev, camera, bg
            )
        elif group_stacks is None:
            id_list = [next_id() for _ in range(n_inner * dp)]
            ids = np.asarray(id_list, np.int32).reshape(n_inner, dp)
            if dp == 1:
                ids = ids[:, 0]  # scalar per scan step, as before
            tp, opt_state, gstate, metrics = train_step(
                tp, opt_state, gstate, gt_stack,
                jnp.asarray(ids), step_dev, cam_stack, bg,
                live_cache=live_cache,
            )
            live_cache = metrics.pop("live_cache", live_cache)
            # last window camera, for the optional debug-image dump below
            # (views from the stacks — no second device copy via cam_cache)
            camera = jax.tree.map(lambda x: x[id_list[-1]], cam_stack)
            gt = gt_stack[id_list[-1]]
        else:
            # mixed resolutions: whole window from ONE group; groups
            # interleave by a deficit-credit scheduler so visit frequency
            # per camera matches the uniform(-plus-highres) marginal
            group_credit += group_weight * (n_inner * dp)
            gsel = int(np.argmax(group_credit))
            group_credit[gsel] -= n_inner * dp
            cam_stack_g, gt_stack_g, gid_map_g, queue_g = group_stacks[gsel]
            ng = len(res_group_ids[gsel])
            id_list = []
            for _ in range(n_inner * dp):
                if not queue_g:
                    queue_g.extend(random.sample(range(ng), ng))
                id_list.append(queue_g.pop())
            ids = np.asarray(id_list, np.int32).reshape(n_inner, dp)
            if dp == 1:
                ids = ids[:, 0]
            tp, opt_state, gstate, metrics = train_step(
                tp, opt_state, gstate, gt_stack_g,
                jnp.asarray(ids), step_dev, cam_stack_g, bg,
                live_cache=live_cache, gid_map=gid_map_g,
            )
            live_cache = metrics.pop("live_cache", live_cache)
            camera = jax.tree.map(lambda x: x[id_list[-1]], cam_stack_g)
            gt = gt_stack_g[id_list[-1]]
        step_dev = metrics["step_next"]

        # --- host control flow (train.py:237-278) ---
        if iteration < opt.densify_until_iter:
            if iteration > opt.densify_from_iter and iteration % opt.densification_interval == 0:
                use_size = jnp.bool_(iteration > opt.opacity_reset_interval)
                key, sub = jax.random.split(key)
                tp_g, gstate, opt_state, rep = _densify(densify_fn, tp, gstate, opt_state, sub, use_size)
                tp = tp_g
                if bool(rep.pool_overflow):
                    new_cap = int(tp.gauss.xyz.shape[0] * 2)
                    tp, gstate, opt_state = grow_capacity(
                        tp, gstate, opt_state, tp.gauss.xyz.shape[0], new_cap
                    )
                    if not quiet:
                        print(f"[{iteration}] grew capacity to {new_cap}")
                filt = filter_fn(tp.gauss.xyz, gstate.active, *cam_meta)
                gstate = gstate._replace(filter_3d=filt)
            if iteration % opt.opacity_reset_interval == 0 or (
                model_cfg.white_background and iteration == opt.densify_from_iter
            ):
                tp = tp._replace(gauss=reset_fn(tp.gauss, gstate.filter_3d))
        elif iteration % 100 == 0:
            filt = filter_fn(tp.gauss.xyz, gstate.active, *cam_meta)
            gstate = gstate._replace(filter_3d=filt)

        # Host reads force a device sync (~30ms through the TPU tunnel here),
        # so metrics are only materialized every 10 iterations. Unread
        # windows are KEPT (device arrays, no sync) and folded into the next
        # readback so overflow/demand from every step is seen even when
        # n_inner does not divide 10.
        pending_metrics.append(metrics["packed_all"] if n_inner > 1
                               else metrics["packed"])
        if iteration % 10 == 0 or iteration == first_iter + n_inner:
            # single batched readback (see metrics["packed"])
            mp = np.concatenate([np.atleast_2d(np.asarray(m))
                                 for m in pending_metrics], axis=0)  # [k, 10]
            pending_metrics.clear()
            m_loss, m_psnr, m_points = mp[-1, 0], mp[-1, 1], mp[-1, 6]
            m_keys, m_key_ov = mp[:, 2].max(), mp[:, 3].max()
            m_cdem, m_cov = mp[:, 4].max(), mp[:, 5].max()
            if pipe.debug and not np.all(np.isfinite(mp[:, 0])):
                # fail-time forensics (the reference's snapshot_fw.dump +
                # CHECK_CUDA debug mode, dgr/__init__.py:89-96,
                # auxiliary.h:204-211): dump every render/optimizer input so
                # the failing window replays offline, then abort loudly.
                fn = _debug_dump(
                    model_cfg.model_path, iteration, tp, gstate, opt_state,
                    {"packed_metrics": mp,
                     "key_capacity": np.int64(pipe.key_capacity),
                     "compact_capacity": np.int64(pipe.compact_capacity),
                     "n_inner": np.int64(n_inner)})
                raise FloatingPointError(
                    f"non-finite loss in window ending at iteration "
                    f"{iteration}; render inputs dumped to {fn}")
            rebuild = False
            if m_key_ov:
                # Grow to the observed demand (num_keys is the true pre-drop
                # total) with 30% headroom rather than blind doubling: every
                # capacity-bound stage (binning expansions/sort/relayout,
                # payload gather, gradient reduce) scales with this static
                # size, so overshoot is paid on every subsequent step.
                need = int(m_keys)
                new_cap = max(int(need * 1.2), int(pipe.key_capacity * 1.25))
                pipe.key_capacity = -(-new_cap // 65536) * 65536
                rebuild = True
                if not quiet:
                    print(f"[{iteration}] key capacity grew to {pipe.key_capacity}"
                          f" (demand {need})")
            # Compact gradient-buffer policy: the backward only stores live
            # (pre-saturation) slot rows, typically ~15% of the keys. Track
            # observed demand and keep the static buffer at ~1.5x its peak:
            # the gradient segment-sum is latency-bound per row, so paying
            # the safe worst case on every step costs ~20 ms at bench scale.
            compact_peak = max(compact_peak, int(m_cdem))
            if m_cov:
                need = int(m_cdem)
                new_cc = max(int(need * 1.25), int(max(pipe.compact_capacity, 1) * 1.25))
                pipe.compact_capacity = -(-new_cc // 65536) * 65536
                rebuild = True
                if not quiet:
                    print(f"[{iteration}] compact capacity grew to "
                          f"{pipe.compact_capacity} (demand {need})")
            elif rebuild:
                # re-jitting anyway (key growth): re-fit the compact buffer
                # to 1.5x peak demand (opacity resets spike it transiently)
                pipe.compact_capacity = -(-max(int(compact_peak * 1.35), 65536)
                                          // 65536) * 65536
            if live_cache is not None:
                live_peak = max(live_peak, int(mp[:, 7].max()))
                if mp[:, 8].max() > 0:  # compacted-list overflow
                    need = int(mp[:, 7].max())
                    new_lc = max(int(need * 1.25),
                                 int(pipe.live_capacity * 1.25))
                    pipe.live_capacity = min(
                        -(-new_lc // 65536) * 65536, pipe.key_capacity)
                    rebuild = True
                    if not quiet:
                        print(f"[{iteration}] live capacity grew to "
                              f"{pipe.live_capacity} (demand {need})")
            key_peak = max(key_peak, int(m_keys))
            if not rebuild and iteration % 500 == 0:
                # Right-size DOWN: every capacity-proportional stage (sort,
                # gather, reduce) pays the static size on every step, so an
                # oversized capacity (initial default, or post-opacity-reset
                # shrinkage) is pure waste. Only act on >1.5x slack to avoid
                # re-jit thrash; overflow handling above grows it back.
                align = lambda v, lo: -(-max(int(v), lo) // 65536) * 65536
                want_kc = align(key_peak * 1.15, 131072)
                cc_eff = pipe.compact_capacity or (
                    pipe.key_capacity + ntiles_max * 128)
                want_cc = align(compact_peak * 1.35, 65536)
                want_lv = 0
                if live_cache is not None and live_peak > 0:
                    want_lv = align(live_peak * 1.3, 131072)
                if (want_kc * 1.3 < pipe.key_capacity
                        or want_cc * 1.3 < cc_eff
                        or (want_lv and want_lv * 1.3 < pipe.live_capacity)):
                    pipe.key_capacity = min(want_kc, pipe.key_capacity)
                    pipe.compact_capacity = min(want_cc, cc_eff)
                    if want_lv:
                        pipe.live_capacity = min(want_lv, pipe.live_capacity)
                    rebuild = True
                    if not quiet:
                        print(f"[{iteration}] right-sized capacities: keys "
                              f"{pipe.key_capacity} compact {pipe.compact_capacity}"
                              f" live {pipe.live_capacity}")
                key_peak = 0
                compact_peak = 0
                live_peak = 0
            if rebuild:
                train_step = rebuild_step()
                # re-persist the config so post-hoc tools (render_cli,
                # extract_mesh, metrics) see the capacities the final model
                # actually needs, not the launch-time guess
                config_lib.save_cfg(model_cfg.model_path, model_cfg, pipe, opt)
            loss = float(m_loss)
            ema_loss = loss if ema_loss is None else 0.6 * loss + 0.4 * ema_loss
            rec = {
                "iter": iteration, "loss": round(loss, 5), "ema": round(ema_loss, 5),
                "psnr": round(float(m_psnr), 3),
                "points": int(m_points),
                "keys": int(m_keys),
                "elapsed": round(time.time() - t_start, 1),
            }
            logf.write(json.dumps(rec) + "\n")
            logf.flush()
            if tb is not None:
                tb.add_scalar("train_loss_patches/total_loss", loss, iteration)
                tb.add_scalar("train/psnr", rec["psnr"], iteration)
                tb.add_scalar("total_points", rec["points"], iteration)
                tb.add_scalar("iter_time", (time.time() - t_start) / iteration, iteration)
            if not quiet and iteration % 100 == 0:
                print(rec)

        if debug_image_interval and iteration % debug_image_interval == 0:
            from .utils import vis

            img = render_eval(tp, gstate, camera, model_cfg, pipe, bg, interpret)
            vis.save_debug_grid(
                os.path.join(model_cfg.model_path, "debug", f"iter_{iteration:06d}.png"),
                np.asarray(img), np.asarray(gt),
            )

        if iteration in test_iterations:
            report = evaluate(sc, tp, gstate, model_cfg, pipe, bg, interpret)
            if not quiet:
                print(f"[{iteration}] eval: {report}")
            logf.write(json.dumps({"iter": iteration, "eval": report}) + "\n")
            logf.flush()

        if iteration in save_iterations:
            path = os.path.join(
                model_cfg.model_path, "point_cloud", f"iteration_{iteration}", "point_cloud.ply"
            )
            scene_lib.save_gaussians_ply(path, tp.gauss, gstate, model_cfg.sh_degree)

        if iteration in checkpoint_iterations:
            save_checkpoint(model_cfg.model_path, iteration, tp, opt_state, gstate)

    if profile_dir:
        jax.profiler.stop_trace()
    if tb is not None:
        tb.close()
    logf.close()
    return tp, gstate


def _make_tb_writer(model_path: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(model_path)
    except Exception:
        return None


def _debug_dump(model_path, iteration, tp, gstate, opt_state, extra):
    """Write the full training-step input state as one npz (--debug mode).

    The analog of the reference's fail-time input snapshots
    (diff_gaussian_rasterization/__init__.py:89-96): gaussian parameters,
    densification state, fused-Adam moments, and capacity telemetry —
    everything needed to replay the failing step offline.
    """
    path = os.path.join(model_path, "debug")
    os.makedirs(path, exist_ok=True)
    fn = os.path.join(path, f"snapshot_iter{int(iteration):06d}.npz")
    arrs = {}
    for k, v in tp.gauss._asdict().items():
        arrs[f"gauss_{k}"] = np.asarray(v)
    for k, v in gstate._asdict().items():
        arrs[f"gstate_{k}"] = np.asarray(v)
    arrs["adam_count"] = np.asarray(opt_state.count)
    # dense [NCOL, CAP] moment buffers; row blocks follow GaussianParams
    # field order (see flatten_gauss_t)
    arrs["adam_mu_flat"] = np.asarray(opt_state.mu_flat)
    arrs["adam_nu_flat"] = np.asarray(opt_state.nu_flat)
    arrs.update(extra)
    np.savez_compressed(fn, **arrs)
    return fn


def _densify(densify_fn, tp, gstate, opt_state, key, use_size):
    g2, s2, opt_state2, rep = densify_fn(tp.gauss, gstate, opt_state, key, use_size)
    return tp._replace(gauss=g2), s2, opt_state2, rep


def evaluate(sc, tp, gstate, model_cfg, pipe, bg, interpret=False,
             max_views: int | None = None):
    """PSNR over the full test split, as in training_report
    (train.py:303-342, which evaluates every test camera). Pass max_views to
    subsample explicitly (e.g. smoke tests)."""
    cams = sc.test_cameras or sc.train_cameras[:4]
    psnrs = []
    for info in (cams if max_views is None else cams[:max_views]):
        camera, gt = sc.camera(info)
        img = render_eval(tp, gstate, camera, model_cfg, pipe, bg, interpret)
        psnrs.append(float(losses.psnr(img[:3], jnp.asarray(gt))))
    return {"psnr": round(float(np.mean(psnrs)), 3), "views": len(psnrs)}


_EVAL_CACHE = {}


def build_eval_fn(model_cfg, pipe, interpret=False):
    """Jitted full-degree eval render (cached per config)."""
    key = (model_cfg.sh_degree, model_cfg.kernel_size, pipe.key_capacity,
           pipe.backend, interpret)
    if key in _EVAL_CACHE:
        return _EVAL_CACHE[key]

    @jax.jit
    def f(tp, gstate, camera, bg):
        g = tp.gauss
        scales_f = gm.filtered_scaling(g, gstate.filter_3d)
        opac_f = gm.filtered_opacity(g, gstate.filter_3d)
        shs = gm.get_features(g)
        out = render_lib.render(
            camera, g.xyz, scales_f, g.rotation, opac_f, shs, model_cfg.sh_degree,
            model_cfg.kernel_size, bg, active_mask=gstate.active,
            capacity=pipe.key_capacity, backend=pipe.backend, interpret=interpret,
        )
        return out.image, out.num_keys, out.overflow

    _EVAL_CACHE[key] = f
    return f


def render_eval(tp, gstate, camera, model_cfg, pipe, bg, interpret=False):
    """Overflow-safe eval render: a persisted config can carry a smaller key
    capacity than the final model needs (training right-sizes capacities as
    the scene grows); silently truncated renders would quietly degrade every
    eval metric, so grow + re-jit until the render fits."""
    for _ in range(8):
        img, num_keys, overflow = build_eval_fn(model_cfg, pipe, interpret)(
            tp, gstate, camera, bg)
        if not bool(overflow):
            return img
        need = int(num_keys)
        pipe.key_capacity = -(-int(need * 1.3) // 65536) * 65536
    raise RuntimeError(f"render overflow persists at capacity {pipe.key_capacity}")


def save_checkpoint(model_path, iteration, tp, opt_state, gstate):
    """Full training state snapshot (the reference torch.save((capture(), it)),
    train.py:276-278) — ours additionally includes the appearance params and
    the 3D filter."""
    import pickle

    path = os.path.join(model_path, f"chkpnt{iteration}.pkl")
    blob = jax.tree.map(lambda x: hostio.device_get(x) if hasattr(x, "shape") else x,
                        {"tp": tp, "opt_state": opt_state, "gstate": gstate, "iter": iteration})
    with open(path, "wb") as f:
        pickle.dump(blob, f)


def load_checkpoint(path):
    import pickle

    class _Unpickler(pickle.Unpickler):
        # checkpoints written by `python -m gof_tpu.train` pickle this
        # module's classes under __main__; remap so any entry point loads
        def find_class(self, module, name):
            if module == "__main__" and hasattr(
                    __import__("gof_tpu.train", fromlist=[name]), name):
                module = "gof_tpu.train"
            return super().find_class(module, name)

    with open(path, "rb") as f:
        blob = _Unpickler(f).load()
    opt_state = blob["opt_state"]
    if isinstance(getattr(opt_state, "mu_flat", None), TrainParams):
        # legacy checkpoint (moments stored as TrainParams-shaped pytrees,
        # 3-field FusedAdamState): the field defaults let it unpickle with
        # mu_flat/nu_flat bound to the old trees — flatten them into the
        # dense [NCOL, CAP] layout
        mu_tp, nu_tp = opt_state.mu_flat, opt_state.nu_flat
        has_app = mu_tp.app_net is not None or mu_tp.app_emb is not None
        opt_state = FusedAdamState(
            count=opt_state.count,
            mu_flat=flatten_gauss_t(jax.tree.map(jnp.asarray, mu_tp.gauss)),
            nu_flat=flatten_gauss_t(jax.tree.map(jnp.asarray, nu_tp.gauss)),
            mu_app=(mu_tp.app_net, mu_tp.app_emb) if has_app else None,
            nu_app=(nu_tp.app_net, nu_tp.app_emb) if has_app else None,
        )
    return jax.tree.map(jnp.asarray, blob["tp"]), opt_state, blob["gstate"], blob["iter"]


def main(argv=None):
    from gof_tpu.utils import compile_cache
    compile_cache.enable()
    import argparse

    parser = argparse.ArgumentParser(description="gof_tpu training")
    config_lib.add_group(parser, config_lib.ModelParams)
    config_lib.add_group(parser, config_lib.PipelineParams)
    config_lib.add_group(parser, config_lib.OptimizationParams)
    parser.add_argument("--test_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int, default=[30_000])
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--cpu", action="store_true", help="force CPU (interpret kernels)")
    parser.add_argument("--profile_dir", type=str, default="", help="write a jax profiler trace here")
    parser.add_argument("--debug_image_interval", type=int, default=0,
                        help="save a gt/render/normal/depth/alpha/distortion grid every N iters")
    parser.add_argument("--dp", type=int, default=1,
                        help="camera-batch data parallelism over a dp-device "
                             "mesh (each optimizer step consumes dp views; "
                             "grads psum over ICI)")
    ns = parser.parse_args(argv)
    if ns.cpu:
        jax.config.update("jax_platforms", "cpu")
    model_cfg = config_lib.extract(config_lib.ModelParams, ns)
    pipe = config_lib.extract(config_lib.PipelineParams, ns)
    opt = config_lib.extract(config_lib.OptimizationParams, ns)
    save_iters = sorted(set(ns.save_iterations + [opt.iterations]))
    training(
        model_cfg, opt, pipe, set(ns.test_iterations), set(save_iters),
        set(ns.checkpoint_iterations), ns.start_checkpoint, ns.quiet,
        interpret=ns.cpu, profile_dir=ns.profile_dir,
        debug_image_interval=ns.debug_image_interval, dp=ns.dp,
    )
    print("Training complete.")


if __name__ == "__main__":
    main()
