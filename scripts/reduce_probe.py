"""Correctness + timing of the Pallas sorted windowed reduce vs segment_sum."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from gof_tpu.ops import reduce as red

rng = np.random.default_rng(0)
P = 1_000_000
R = 917_504

# realistic id distribution: clustered + sparse tail + sentinels + zero tail
ids = np.concatenate([
    rng.integers(0, P, R - 20000),
    rng.integers(P - 1000, P, 10000),  # dense tail
    np.full(5000, P),  # sentinel
    np.zeros(5000, np.int64),  # zero tail
]).astype(np.int32)
rng.shuffle(ids)
rows = rng.normal(size=(16, R)).astype(np.float32)
rows_j = jnp.asarray(rows)
ids_j = jnp.asarray(ids)

out = jax.jit(lambda r, g: red.reduce_rows_by_gid(r, g, P))(rows_j, ids_j)
ref = jax.jit(lambda r, g: jax.ops.segment_sum(
    r.T, g, num_segments=P + 1)[:P])(rows_j, ids_j)
err = float(jnp.max(jnp.abs(out - ref)))
scale = float(jnp.max(jnp.abs(ref)))
print(f"max abs err {err:.3e} (scale {scale:.3e})", flush=True)
assert err / scale < 1e-5, "MISMATCH"

# tiny case: single chunk, all ids equal
ids2 = jnp.zeros((1024,), jnp.int32)
rows2 = jnp.ones((16, 1024), jnp.float32)
out2 = jax.jit(lambda r, g: red.reduce_rows_by_gid(r, g, 50))(rows2, ids2)
print("single-id sum:", float(out2[0, 0]), "(expect 1024)", flush=True)


def t(name, f, args_list, scalar_of):
    f = jax.jit(f)
    o = f(*args_list[0])
    _ = np.asarray(scalar_of(o))

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            o = f(*args_list[i % len(args_list)])
        _ = np.asarray(scalar_of(o))
        return time.perf_counter() - t0

    run(1)
    d2 = run(2)
    d10 = run(10)
    print(f"{name:44s} {(d10 - d2) / 8 * 1e3:8.2f} ms", flush=True)


rows_l = [rows_j, rows_j * 0.999, rows_j * 1.001]
t("pallas sorted reduce [16,R]->P", lambda r, g: red.reduce_rows_by_gid(r, g, P),
  [(r, ids_j) for r in rows_l], lambda o: o[0, 0])
t("segment_sum [R,16]->P", lambda r, g: jax.ops.segment_sum(
    r.T, g, num_segments=P + 1)[:P], [(r, ids_j) for r in rows_l],
  lambda o: o[0, 0])

rows24 = [jnp.concatenate([r, r[:8]], axis=0) for r in rows_l]
t("pallas sorted reduce [24,R]->P", lambda r, g: red.reduce_rows_by_gid(r, g, P),
  [(r, ids_j) for r in rows24], lambda o: o[0, 0])
