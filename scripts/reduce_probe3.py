"""D-scaling of the unsorted segment_sum at bench scale, plus variants."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K, P = 1_638_400, 100_000
rng = np.random.default_rng(0)
seg = jnp.asarray(rng.integers(0, P + 1, K), jnp.int32)


def timed(name, fn, x, reps=4):
    def body(x):
        out = fn(x)
        for _ in range(reps - 1):
            eps = (jax.tree.leaves(out)[0].ravel()[:1] * 1e-30).astype(x.dtype)
            x = x + eps.reshape((1,) * x.ndim)
            out = fn(x)
        return out
    f = jax.jit(body)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    print(f"{name:52s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/op")
    sys.stdout.flush()


for D in (32, 16, 8, 4):
    d = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    timed(f"segment_sum unsorted [K,{D}]",
          lambda x: jax.ops.segment_sum(x, seg, num_segments=P + 1), d)

# transposed layout: [D, K] with scatter along lanes?
d32t = jnp.asarray(rng.standard_normal((32, K)), jnp.float32)
timed("segment_sum on [32,K] transposed (axis 1 via vmap)",
      lambda x: jax.vmap(lambda r: jax.ops.segment_sum(r, seg, num_segments=P + 1))(x),
      d32t)
