import time, numpy as np, jax, jax.numpy as jnp
from gof_tpu import cameras
from gof_tpu.ops import binning, quadrics, rasterize_pallas as rp
from gof_tpu.sh import rgb_to_sh_dc
cam = cameras.look_at_camera(eye=(0,0,0), target=(0,0,5.0), width=1237, height=822)
ntx, nty = binning.tile_grid(cam.width, cam.height); ntiles = ntx*nty
bg = jnp.zeros(3); mv = rp._meta_vec(cam.focal_x, cam.focal_y, bg, cam.width, cam.height)
n = 100_000
rng = np.random.default_rng(1)
z = rng.uniform(3, 9, n); x = rng.uniform(-1,1,n)*z*0.35; y = rng.uniform(-1,1,n)*z*0.25
means = jnp.asarray(np.stack([x,y,z],-1), jnp.float32)
scales = jnp.asarray(rng.uniform(0.008,0.03,(n,3)), jnp.float32)
q = rng.normal(size=(n,4)); q/=np.linalg.norm(q,axis=-1,keepdims=True)
rots = jnp.asarray(q, jnp.float32)
opac = jnp.asarray(rng.uniform(0.3,0.95,n), jnp.float32)
shs = rgb_to_sh_dc(jnp.asarray(rng.uniform(0,1,(n,3)), jnp.float32))[:,None,:]
pre = quadrics.preprocess(means, scales, rots, shs, 0, cam, 0.1, opacities=opac)
rects = binning.gaussian_rects(pre.mean2d, pre.radius, pre.valid, ntx, nty)
b = binning.bin_gaussians(pre.depth, rects, ntx, nty, capacity=1<<20)
op_eff = opac * jnp.where(pre.valid, pre.coef, 0.0)
sigma6 = rp.pack_sigma6(pre.v2g_M); bvec = jnp.einsum("pji,pj->pi", pre.v2g_M, pre.v2g_u0)
payload = rp.build_payload32(pre.rgb, op_eff, pre.v2g_M, pre.v2g_u0, sigma6, bvec, pre.conic, pre.mean2d, b)
mkbin = lambda ts, tc: rp.Binning(None, None, ts, tc, None, None, None, None, None)
def chain(fn, dep0, reps=10):
    @jax.jit
    def run(x):
        def body(i, carry):
            x, acc = carry
            out = fn(x); leaf = jax.tree.leaves(out)[0]
            return (x + leaf.reshape(-1)[0] * 1e-20, acc + leaf.reshape(-1)[1])
        return jax.lax.fori_loop(0, reps, body, (x, jnp.float32(0)))[1]
    np.asarray(run(dep0)); t0=time.time(); np.asarray(run(dep0))
    return (time.time()-t0-0.03)/reps*1000
print(f"fwd kernel: {chain(lambda p: rp.rasterize_fwd_pallas(p, mkbin(b.tile_start, b.tile_chunks), mv, ntx, ntiles), payload):.1f} ms", flush=True)
