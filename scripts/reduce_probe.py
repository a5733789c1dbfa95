import time
import jax, jax.numpy as jnp, numpy as np

K, P = 1_120_000, 100_000
rng = np.random.default_rng(0)
seg = jnp.asarray(rng.integers(0, P + 1, K), jnp.int32)

def timed(name, fn, x, reps=6):
    def body(x):
        out = fn(x)
        for _ in range(reps - 1):
            eps = (out.ravel()[:1] * 1e-30).astype(x.dtype)
            x = x + eps.reshape((1,) * x.ndim)
            out = fn(x)
        return out
    f = jax.jit(body)
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    jax.block_until_ready(f(x))
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms/op")

for D in (32, 8, 1):
    d = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
    timed(f"segment_sum [K,{D}] -> {P+1}", lambda x: jax.ops.segment_sum(x, seg, num_segments=P+1), d)

d32 = jnp.asarray(rng.standard_normal((K, 32)), jnp.float32)
# scatter in two halves concurrently? XLA serializes scatters to same buffer; use two buffers
def two_half(x):
    a = jax.ops.segment_sum(x[: K // 2], seg[: K // 2], num_segments=P + 1)
    b = jax.ops.segment_sum(x[K // 2 :], seg[K // 2 :], num_segments=P + 1)
    return a + b
timed("segment_sum split into 2 independent halves", two_half, d32)
def four_part(x):
    q = K // 4
    parts = [jax.ops.segment_sum(x[i*q:(i+1)*q], seg[i*q:(i+1)*q], num_segments=P+1) for i in range(4)]
    return parts[0] + parts[1] + parts[2] + parts[3]
timed("segment_sum split into 4 independent parts", four_part, d32)
