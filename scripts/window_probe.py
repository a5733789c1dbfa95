"""Decompose the training-loop wall time: single-step vs scan-window
dispatch, with and without the per-window metrics readback, at a given
scale. Distinguishes device step cost / dispatch overhead / readback RTT."""
import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import _path  # noqa: F401,E402  (repo-root bootstrap)
from bench import make_state  # noqa: E402

from gof_tpu import cameras, config as config_lib, train as train_lib  # noqa: E402
from gof_tpu.model import appearance as app_lib  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gaussians", type=int, default=150_000)
    ap.add_argument("--capacity", type=int, default=458_752)
    ap.add_argument("--compact", type=int, default=131_072)
    ap.add_argument("--width", type=int, default=1237)
    ap.add_argument("--height", type=int, default=822)
    ap.add_argument("--windows", type=int, default=6)
    args = ap.parse_args()

    rng = np.random.default_rng(1)
    params, gstate = make_state(args.gaussians, rng, sigma=-3.6)
    n_cams = 8
    cams = [cameras.look_at_camera(eye=(0.2 * i - 0.8, 0, 0), target=(0, 0, 5.0),
                                   width=args.width, height=args.height, uid=i)
            for i in range(n_cams)]
    cam_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
    gt_stack = jnp.asarray(rng.uniform(0, 1, (n_cams, 3, args.height, args.width)),
                           jnp.float32)
    bg = jnp.zeros(3)
    opt = config_lib.OptimizationParams()
    model_cfg = config_lib.ModelParams(sh_degree=3, kernel_size=0.1)
    pipe = config_lib.PipelineParams(backend="pallas", key_capacity=args.capacity,
                                     compact_capacity=args.compact)
    tx = train_lib.make_optimizer(opt, 5.0)
    app_net, app_emb = app_lib.init_appearance(jax.random.PRNGKey(0))
    tp0 = train_lib.TrainParams(gauss=params, app_net=app_net, app_emb=app_emb)
    s0 = tx.init(tp0)
    s0 = jax.tree.map(lambda x: jnp.array(np.asarray(x)), s0)

    def prep():
        return jax.tree.map(jnp.copy, tp0), s0, gstate

    # --- single-step path ---
    f1 = train_lib.build_train_step(opt, model_cfg, pipe, tx,
                                    with_stats=True, with_reg=False, n_inner=1)
    tp, s, g = prep()
    step = jnp.asarray(5000, jnp.int32)
    cam0 = jax.tree.map(lambda x: x[0], cam_stack)
    gt0 = gt_stack[0]
    t0 = time.perf_counter()
    tp, s, g, m = f1(tp, s, g, gt0, step, cam0, bg)
    jax.block_until_ready(m["packed"])
    print(f"single-step compile: {time.perf_counter()-t0:.0f}s", flush=True)
    nk = float(np.asarray(m["packed"])[2])
    print(f"num_keys={int(nk)}", flush=True)

    for label, read in (("no readback", False), ("readback every step", True)):
        tp, s, g = prep()
        t0 = time.perf_counter()
        for _ in range(10 * args.windows):
            tp, s, g, m = f1(tp, s, g, gt0, m["step_next"], cam0, bg)
            if read:
                np.asarray(m["packed"])
        jax.block_until_ready(m["packed"])
        dt = (time.perf_counter() - t0) / (10 * args.windows)
        print(f"single-step, {label:22s}: {dt*1e3:7.1f} ms/iter", flush=True)

    # --- scan-window path ---
    f10 = train_lib.build_train_step(opt, model_cfg, pipe, tx,
                                     with_stats=True, with_reg=False, n_inner=10)
    tp, s, g = prep()
    ids = jnp.asarray(rng.integers(0, n_cams, 10), jnp.int32)
    t0 = time.perf_counter()
    tp, s, g, m = f10(tp, s, g, gt_stack, ids, step, cam_stack, bg)
    jax.block_until_ready(m["packed_all"])
    print(f"window compile: {time.perf_counter()-t0:.0f}s", flush=True)

    for label, read in (("no readback", False), ("readback every window", True)):
        tp, s, g = prep()
        sd = step
        t0 = time.perf_counter()
        for _ in range(args.windows):
            tp, s, g, m = f10(tp, s, g, gt_stack, ids, sd, cam_stack, bg)
            sd = m["step_next"]
            if read:
                np.asarray(m["packed_all"])
        jax.block_until_ready(m["packed_all"])
        dt = (time.perf_counter() - t0) / (10 * args.windows)
        print(f"scan-window, {label:22s}: {dt*1e3:7.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
