"""Gaussian model state + adaptive density control (pure functional, jit-clean).

Replaces scene/gaussian_model.py (GaussianModel). Architectural difference by
design (SURVEY.md §7): parameters live in FIXED-CAPACITY padded arrays with an
`active` mask, so densify/clone/split/prune are functional masked scatters and
the whole training step stays inside one jit — no optimizer-state surgery
(gaussian_model.py:532-607); optax moments are zeroed at reused slots instead.
The host grows capacity (power-of-two) and re-jits only when the pool fills.

Parity notes (reference file:line):
- activations: scaling=exp, opacity=sigmoid, rotation=normalized quat
  (gaussian_model.py:77-93)
- 3D mip filter: min visible depth / max focal * sqrt(0.2), 15% screen margin
  (compute_3D_filter, gaussian_model.py:262-311)
- filtered scale sqrt(s^2+f^2) and opacity * sqrt(det(s^2)/det(s^2+f^2))
  (gaussian_model.py:156-194)
- init: SH-DC from RGB, log sqrt(3NN mean dist) scales, opacity 0.1
  (create_from_pcd, gaussian_model.py:317-340)
- densify: clone (sampled) / split (N=2, scale/1.6) selected by the OR of the
  classic grad threshold and the abs-grad quantile threshold
  (densify_and_prune, gaussian_model.py:631-707)
- opacity reset to <= 0.01 with inverse filter compensation
  (reset_opacity, gaussian_model.py:465-483)
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import sh as sh_lib
from ..ops import knn
from ..transforms import quat_to_rot

FRUSTUM_NEAR = 0.2
FILTER_SCALE = 0.2**0.5


class GaussianParams(NamedTuple):
    """Trainable leaves, all [CAP, ...]."""

    xyz: jnp.ndarray  # [C, 3]
    features_dc: jnp.ndarray  # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]
    scaling: jnp.ndarray  # [C, 3] log-scale
    rotation: jnp.ndarray  # [C, 4] unnormalized quat (w,x,y,z)
    opacity: jnp.ndarray  # [C] logit


class GaussianState(NamedTuple):
    """Non-trainable per-Gaussian state, all [CAP, ...]."""

    active: jnp.ndarray  # [C] bool
    filter_3d: jnp.ndarray  # [C] mip 3D filter stddev
    max_radii2d: jnp.ndarray  # [C]
    grad_accum: jnp.ndarray  # [C] sum of ||d mean2d xy||
    grad_abs_accum: jnp.ndarray  # [C] sum of |d mean2d| abs channel
    denom: jnp.ndarray  # [C]


def sigmoid(x):
    return jax.nn.sigmoid(x)


def inverse_sigmoid(x):
    return jnp.log(x / (1.0 - x))


def num_active(state: GaussianState) -> jnp.ndarray:
    return jnp.sum(state.active)


def get_scaling(params: GaussianParams) -> jnp.ndarray:
    return jnp.exp(params.scaling)


def get_opacity(params: GaussianParams) -> jnp.ndarray:
    return sigmoid(params.opacity)


def get_features(params: GaussianParams) -> jnp.ndarray:
    return jnp.concatenate([params.features_dc, params.features_rest], axis=1)


def filtered_scaling(params: GaussianParams, filter_3d: jnp.ndarray) -> jnp.ndarray:
    """sqrt(s^2 + f^2) (gaussian_model.py:156-162)."""
    s2 = jnp.exp(params.scaling) ** 2
    return jnp.sqrt(s2 + filter_3d[:, None] ** 2)


def filtered_opacity(params: GaussianParams, filter_3d: jnp.ndarray) -> jnp.ndarray:
    """opacity * sqrt(det(s^2) / det(s^2 + f^2)) (gaussian_model.py:183-194)."""
    s2 = jnp.exp(params.scaling) ** 2
    det1 = jnp.prod(s2, axis=-1)
    det2 = jnp.prod(s2 + filter_3d[:, None] ** 2, axis=-1)
    return sigmoid(params.opacity) * jnp.sqrt(det1 / det2)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int,
    capacity: int,
) -> Tuple[GaussianParams, GaussianState]:
    """create_from_pcd (gaussian_model.py:317-340) into padded capacity."""
    P = points.shape[0]
    assert capacity >= P, (capacity, P)
    K = sh_lib.num_sh_coeffs(sh_degree)
    pts = jnp.asarray(points, jnp.float32)
    dist2 = jnp.maximum(jnp.asarray(knn.mean_sq_dist_3nn_exact(points)), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (capacity - P,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    dc = sh_lib.rgb_to_sh_dc(jnp.asarray(colors, jnp.float32))[:, None, :]
    rot = jnp.zeros((P, 4), jnp.float32).at[:, 0].set(1.0)
    params = GaussianParams(
        xyz=pad(pts),
        features_dc=pad(dc),
        features_rest=pad(jnp.zeros((P, K - 1, 3), jnp.float32)),
        scaling=pad(scales, fill=-10.0),
        rotation=pad(rot, fill=0.0).at[P:, 0].set(1.0),
        opacity=pad(jnp.full((P,), inverse_sigmoid(jnp.float32(0.1)))),
    )
    z = jnp.zeros((capacity,), jnp.float32)
    state = GaussianState(
        active=jnp.arange(capacity) < P,
        filter_3d=z + 1e-4,
        max_radii2d=z,
        grad_accum=z,
        grad_abs_accum=z,
        denom=z,
    )
    return params, state


# ---------------------------------------------------------------------------
# Mip-Splatting 3D filter
# ---------------------------------------------------------------------------


def compute_3d_filter(
    xyz: jnp.ndarray,
    active: jnp.ndarray,
    world_views: jnp.ndarray,  # [N, 4, 4]
    focals_x: jnp.ndarray,  # [N]
    focals_y: jnp.ndarray,  # [N]
    widths: jnp.ndarray,  # [N]
    heights: jnp.ndarray,  # [N]
) -> jnp.ndarray:
    """Per-Gaussian 3D filter stddev over all training cameras
    (compute_3D_filter, gaussian_model.py:262-311)."""
    pv = jnp.einsum("nij,pj->npi", world_views[:, :3, :3], xyz) + world_views[:, None, :3, 3]
    z = pv[..., 2]
    in_front = z > FRUSTUM_NEAR
    zc = jnp.maximum(z, 0.001)
    x_pix = pv[..., 0] / zc * focals_x[:, None] + widths[:, None] / 2.0
    y_pix = pv[..., 1] / zc * focals_y[:, None] + heights[:, None] / 2.0
    in_screen = (
        (x_pix >= -0.15 * widths[:, None])
        & (x_pix <= 1.15 * widths[:, None])
        & (y_pix >= -0.15 * heights[:, None])
        & (y_pix <= 1.15 * heights[:, None])
    )
    visible = in_front & in_screen  # [N, P]
    dist = jnp.min(jnp.where(visible, zc, jnp.inf), axis=0)  # [P]
    any_vis = jnp.any(visible, axis=0)
    max_seen = jnp.max(jnp.where(any_vis & active, dist, -jnp.inf))
    max_seen = jnp.where(jnp.isfinite(max_seen), max_seen, 1.0)
    dist = jnp.where(any_vis, dist, max_seen)
    focal_max = jnp.max(focals_x)
    return dist / focal_max * FILTER_SCALE


# ---------------------------------------------------------------------------
# Densification statistics + control
# ---------------------------------------------------------------------------


def add_densification_stats(
    state: GaussianState, carrier_grad: jnp.ndarray, radii: jnp.ndarray, visible: jnp.ndarray
) -> GaussianState:
    """Accumulate per-step stats (add_densification_stats,
    gaussian_model.py:709-714 + max_radii2D update train.py:253-254)."""
    gxy = jnp.linalg.norm(carrier_grad[:, :2], axis=-1)
    gabs = jnp.abs(carrier_grad[:, 2])
    vis = visible & state.active
    return state._replace(
        grad_accum=state.grad_accum + jnp.where(vis, gxy, 0.0),
        grad_abs_accum=state.grad_abs_accum + jnp.where(vis, gabs, 0.0),
        denom=state.denom + vis.astype(jnp.float32),
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d, radii), state.max_radii2d),
    )


def _masked_quantile(x: jnp.ndarray, mask: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """torch.quantile-compatible linear-interpolation quantile over mask."""
    big = jnp.float32(3.4e38)
    xs = jnp.sort(jnp.where(mask, x, big))
    n = jnp.sum(mask)
    pos = jnp.clip(q, 0.0, 1.0) * jnp.maximum(n - 1, 0).astype(jnp.float32)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.ceil(pos).astype(jnp.int32)
    frac = pos - lo.astype(jnp.float32)
    lo = jnp.clip(lo, 0, x.shape[0] - 1)
    hi = jnp.clip(hi, 0, x.shape[0] - 1)
    return xs[lo] * (1 - frac) + xs[hi] * frac


class DensifyReport(NamedTuple):
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    pool_overflow: jnp.ndarray  # bool: ran out of capacity, host should grow


def _assign_free_slots(active: jnp.ndarray, want: jnp.ndarray):
    """For each source i with want[i]=True, pick a distinct inactive slot.

    Returns (target_slot [C] int32, ok [C] bool). Deterministic: the k-th
    selected source gets the k-th free slot.
    """
    C = active.shape[0]
    free = ~active
    free_idx = jnp.nonzero(free, size=C, fill_value=C - 1)[0].astype(jnp.int32)
    n_free = jnp.sum(free)
    rank = (jnp.cumsum(want.astype(jnp.int32)) - 1).astype(jnp.int32)
    ok = want & (rank < n_free)
    target = free_idx[jnp.clip(rank, 0, C - 1)]
    return target, ok


def _scatter_rows(dst, src, targets, ok):
    """dst[targets[i]] = src[i] where ok[i]; unique targets by construction."""
    t = jnp.where(ok, targets, dst.shape[0])  # out-of-range drops
    return dst.at[t].set(src, mode="drop")


def densify_and_prune(
    params: GaussianParams,
    state: GaussianState,
    opt_moments,  # pytree of (mu, nu)-like leaves shaped like params, or None
    rng: jnp.ndarray,
    max_grad: float,
    min_opacity: float,
    extent,
    percent_dense: float,
    use_size_prune,
) -> Tuple[GaussianParams, GaussianState, object, DensifyReport]:
    """Functional densify_and_prune (gaussian_model.py:683-707).

    The reference applies prune to freshly added clones/splits too (they are
    appended before pruning); we replicate by including new slots in the final
    prune mask evaluation. Note the reference resets max_radii2D in
    densification_postfix *before* its screen-size prune, so big_points_vs
    never fires there; we faithfully reproduce that by not size-pruning on
    max_radii2d (the world-size prune, scale > 0.1 * extent, does fire).
    """
    active = state.active
    denom = jnp.maximum(state.denom, 1e-12)
    grads = jnp.where(state.denom > 0, state.grad_accum / denom, 0.0)
    grads_abs = jnp.where(state.denom > 0, state.grad_abs_accum / denom, 0.0)

    n_act = jnp.maximum(jnp.sum(active), 1)
    classic = (grads >= max_grad) & active
    ratio = jnp.sum(classic) / n_act.astype(jnp.float32)
    Q = _masked_quantile(grads_abs, active, 1.0 - ratio)
    selected = (classic | ((grads_abs >= Q) & active))

    scaling = jnp.exp(params.scaling)
    maxscale = jnp.max(scaling, axis=-1)
    clone_mask = selected & (maxscale <= percent_dense * extent)
    split_mask = selected & (maxscale > percent_dense * extent)

    R = quat_to_rot(params.rotation)

    k1, k2, k3 = jax.random.split(rng, 3)

    def sampled_xyz(key, mask):
        eps = jax.random.normal(key, params.xyz.shape)
        offs = jnp.einsum("pij,pj->pi", R, eps * scaling)
        return params.xyz + offs

    # --- clones (sampled at a new position, gaussian_model.py:659-681) ---
    new_active = active
    new_params = params
    moments = opt_moments

    cap = params.xyz.shape[0]

    def place(new_params, new_active, moments, src_params, mask):
        targets, ok = _assign_free_slots(new_active, mask)
        p2 = GaussianParams(
            *[_scatter_rows(d, s, targets, ok) for d, s in zip(new_params, src_params)]
        )
        a2 = new_active.at[jnp.where(ok, targets, new_active.shape[0])].set(True, mode="drop")
        if moments is not None:
            # zero optimizer moments at reused slots; `moments` may be a whole
            # optax state — touched leaves are (a) shaped exactly like a
            # Gaussian param leaf (row zeroing) or (b) the fused Adam's dense
            # [NCOL, CAP] moment buffers (column zeroing; see
            # train.FusedAdamState for the layout rationale). Appearance
            # leaves match neither (their leading dim would have to coincide
            # with the capacity AND the shape with a param leaf).
            param_shapes = {tuple(p.shape) for p in params}

            def zero_slot(m):
                if not (hasattr(m, "shape")
                        and jnp.issubdtype(m.dtype, jnp.floating)):
                    return m
                if tuple(m.shape) in param_shapes:
                    return _scatter_rows(m, jnp.zeros_like(m), targets, ok)
                if m.ndim == 2 and m.shape[1] == cap and m.shape[0] != cap:
                    t = jnp.where(ok, targets, cap)
                    return m.at[:, t].set(0.0, mode="drop")
                return m

            moments = jax.tree.map(zero_slot, moments)
        dropped = jnp.sum(mask) - jnp.sum(ok)
        return p2, a2, moments, dropped

    clone_src = GaussianParams(
        xyz=sampled_xyz(k1, clone_mask),
        features_dc=params.features_dc,
        features_rest=params.features_rest,
        scaling=params.scaling,
        rotation=params.rotation,
        opacity=params.opacity,
    )
    new_params, new_active, moments, drop1 = place(new_params, new_active, moments, clone_src, clone_mask)

    # --- splits: N=2 children with scale / (0.8 * N) (gaussian_model.py:631-657)
    split_scaling = jnp.log(scaling / 1.6)
    child = lambda key: GaussianParams(
        xyz=sampled_xyz(key, split_mask),
        features_dc=params.features_dc,
        features_rest=params.features_rest,
        scaling=split_scaling,
        rotation=params.rotation,
        opacity=params.opacity,
    )
    new_params, new_active, moments, drop2 = place(new_params, new_active, moments, child(k2), split_mask)
    new_params, new_active, moments, drop3 = place(new_params, new_active, moments, child(k3), split_mask)

    # split originals are removed
    new_active = new_active & ~split_mask

    # --- prune (applies to clones/children too, with inherited opacity) ---
    op = sigmoid(new_params.opacity)
    prune = op < min_opacity
    ws = jnp.max(jnp.exp(new_params.scaling), axis=-1) > 0.1 * extent
    prune = jnp.where(use_size_prune, prune | ws, prune)
    # non-finite gaussians (a single NaN gradient poisons the Adam moments
    # permanently): the renderer culls them every view, but they would
    # otherwise occupy slots forever — NaN compares False against every
    # threshold, so the opacity/size prunes never catch them
    finite = (jnp.all(jnp.isfinite(new_params.xyz), axis=-1)
              & jnp.all(jnp.isfinite(new_params.scaling), axis=-1)
              & jnp.all(jnp.isfinite(new_params.rotation), axis=-1)
              & jnp.isfinite(new_params.opacity))
    prune = prune | ~finite
    n_before_prune = jnp.sum(new_active)
    new_active = new_active & ~prune

    new_state = GaussianState(
        active=new_active,
        filter_3d=state.filter_3d,  # recomputed right after by the caller
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        grad_accum=jnp.zeros_like(state.grad_accum),
        grad_abs_accum=jnp.zeros_like(state.grad_abs_accum),
        denom=jnp.zeros_like(state.denom),
    )
    report = DensifyReport(
        n_cloned=jnp.sum(clone_mask) - drop1,
        n_split=jnp.sum(split_mask),
        n_pruned=n_before_prune - jnp.sum(new_active),
        pool_overflow=(drop1 + drop2 + drop3) > 0,
    )
    return new_params, new_state, moments, report


def reset_opacity(params: GaussianParams, filter_3d: jnp.ndarray) -> GaussianParams:
    """reset_opacity (gaussian_model.py:465-483): clamp the filtered opacity
    to <= 0.01, undo the filter compensation, store the logit."""
    op_f = filtered_opacity(params, filter_3d)
    s2 = jnp.exp(params.scaling) ** 2
    coef = jnp.sqrt(jnp.prod(s2, axis=-1) / jnp.prod(s2 + filter_3d[:, None] ** 2, axis=-1))
    new = jnp.minimum(op_f, 0.01) / jnp.maximum(coef, 1e-12)
    new = jnp.clip(new, 1e-6, 1.0 - 1e-6)
    return params._replace(opacity=inverse_sigmoid(new))
