"""Decisive: per-dispatch vs per-op overhead on the axon backend."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
T, N, K, dup = 450, 5000, 512, 16


def bench(fn, inputs, label, iters=30):
    out = fn(*inputs)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(*inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*inputs)
    jax.block_until_ready(out)
    print(f"{label:46s} {(time.perf_counter()-t0)/iters*1e3:8.3f} ms",
          flush=True)
    return out


# pure dispatch floor
x1 = jnp.ones((8, 128), jnp.float32)
bench(jax.jit(lambda x: x + 1.0), (x1,), "tiny add (dispatch floor)")

# scalar gather: 1 op vs 10 chained (serial dependency, no CSE)
incflat = jnp.asarray(rng.normal(size=(T * N,)).astype(np.float32))
sidx = jnp.asarray(rng.integers(0, T * N, size=(N, dup)).astype(np.int32))


def chain_gather(a, i, reps):
    g = a[i]
    for _ in range(reps - 1):
        i = (i + g.astype(jnp.int32) % 7 + 1) % (T * N)
        g = a[i]
    return g


bench(jax.jit(lambda a, i: chain_gather(a, i, 1)), (incflat, sidx),
      "scalar gather 80k x1")
bench(jax.jit(lambda a, i: chain_gather(a, i, 10)), (incflat, sidx),
      "scalar gather 80k x10 (one jit)")

# row gather: 1 vs 4 chained
feats = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
pos_i = jnp.asarray(rng.integers(0, N, size=(T, K)).astype(np.int32))


def chain_row(f, p, reps):
    out = f[p]  # (T, K, 16)
    for _ in range(reps - 1):
        p = (p + out[..., 0].astype(jnp.int32) % 5 + 1) % N
        out = f[p]
    return out


bench(jax.jit(lambda f, p: chain_row(f, p, 1)), (feats, pos_i),
      "row gather (T,K,16) x1")
bench(jax.jit(lambda f, p: chain_row(f, p, 4)), (feats, pos_i),
      "row gather (T,K,16) x4 (one jit)")

# elementwise big: 1 vs 10 chained
big = jnp.asarray(rng.normal(size=(T, N)).astype(np.float32))


def chain_ew(x, reps):
    for _ in range(reps):
        x = x * 1.000001 + 0.5
    return x


bench(jax.jit(lambda x: chain_ew(x, 1)), (big,), "elementwise (T,N) x1")
bench(jax.jit(lambda x: chain_ew(x, 100)), (big,), "elementwise (T,N) x100")

# matmul: 1 vs 10
a = jnp.asarray(rng.normal(size=(4500, 512)).astype(np.float32))
b = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))


def chain_mm(a, b, reps):
    for _ in range(reps):
        a = jnp.dot(a, b, preferred_element_type=jnp.float32) * 1e-2
    return a


bench(jax.jit(lambda a, b: chain_mm(a, b, 1)), (a, b), "matmul 4500x512x512 x1")
bench(jax.jit(lambda a, b: chain_mm(a, b, 10)), (a, b),
      "matmul 4500x512x512 x10")
print("OK", flush=True)
