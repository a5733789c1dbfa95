"""Measure the dead-row fraction of the backward's per-slot gradients at
bench scale: rows past every pixel's saturation depth are exactly zero and
the reduce wastes ~20 ns on each."""
import sys

import jax
import jax.numpy as jnp
import numpy as np

import _path  # noqa: F401,E402  (repo-root bootstrap)
from bench import make_state  # noqa: E402

from gof_tpu import cameras  # noqa: E402
from gof_tpu.model import gaussians as gm  # noqa: E402
from gof_tpu.ops import binning, quadrics  # noqa: E402
from gof_tpu.ops import rasterize_pallas as rp  # noqa: E402

N = 100_000
W, H = 1237, 822
CAP = 1_638_400

rng = np.random.default_rng(1)
params, gstate = make_state(N, rng)
cam = cameras.look_at_camera(eye=(0, 0, 0), target=(0, 0, 5.0), width=W, height=H)
ntx, nty = binning.tile_grid(W, H)
ntiles = ntx * nty
bg = jnp.zeros(3)

scales_f = gm.filtered_scaling(params, gstate.filter_3d)
opac_f = gm.filtered_opacity(params, gstate.filter_3d)
shs = gm.get_features(params)


@jax.jit
def get_dslot():
    pre = quadrics.preprocess(params.xyz, scales_f, params.rotation, shs, 3, cam,
                              0.1, opacities=opac_f)
    rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty,
                                   radius_xy=pre.radius_xy)
    b = binning.bin_gaussians(pre.depth, rects, ntx, nty, CAP)
    op_eff = opac_f * jnp.where(pre.valid, pre.coef, 0.0)
    sigma6 = rp.pack_sigma6(pre.v2g_M)
    bvec = jnp.einsum("pji,pj->pi", pre.v2g_M, pre.v2g_u0)
    payload = rp.build_payload32(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, sigma6,
                                 bvec, pre.conic, pre.mean2d, b)
    mv = rp._meta_vec(cam.focal_x, cam.focal_y, bg, W, H)
    fout = rp.rasterize_fwd_pallas(payload, b, mv, ntx, ntiles)
    gout = jnp.ones_like(fout)  # generic cotangent on every channel
    dslot_t = rp.rasterize_bwd_pallas(payload, fout, gout, b, mv, ntx, ntiles,
                                      W / 2.0, H / 2.0)
    return dslot_t, b


dslot_t, b = get_dslot()
dslot = np.asarray(dslot_t).T  # [CAP, 32]
bounds = np.asarray(b.bounds)
nk = int(b.num_keys)
nz = np.any(dslot != 0.0, axis=1)
print(f"num_keys={nk} CAP={CAP}")
print(f"nonzero rows: {nz.sum()} = {nz.sum()/CAP*100:.1f}% of CAP, "
      f"{nz.sum()/max(nk,1)*100:.1f}% of keys")

# per-tile live prefix at 128-chunk granularity (what a live_chunks output
# from the kernel would give us)
live_rows = 0
for t in range(ntiles):
    s, e = bounds[t], bounds[t + 1]
    if e <= s:
        continue
    seg_nz = np.nonzero(nz[s:e])[0]
    if len(seg_nz) == 0:
        continue
    base = (s // 128) * 128
    last = s + seg_nz[-1]
    c_end = (last - base) // 128 + 1
    live_rows += min(e, base + c_end * 128) - s
print(f"live prefix rows (128-chunk granularity): {live_rows} = "
      f"{live_rows/CAP*100:.1f}% of CAP")

# chunk-skip at coarse granularity (what the scan would skip)
for CR in (16384, 65536):
    nch = -(-CAP // CR)
    live_ch = 0
    chunk_live = np.zeros(nch, bool)
    for t in range(ntiles):
        s, e = bounds[t], bounds[t + 1]
        if e <= s:
            continue
        seg_nz = np.nonzero(nz[s:e])[0]
        if len(seg_nz) == 0:
            continue
        base = (s // 128) * 128
        last = s + seg_nz[-1]
        live_end = min(e, base + ((last - base) // 128 + 1) * 128)
        chunk_live[s // CR : -(-live_end // CR)] = True
    print(f"live {CR}-row chunks: {chunk_live.sum()}/{nch} = "
          f"{chunk_live.sum()/nch*100:.1f}%")
