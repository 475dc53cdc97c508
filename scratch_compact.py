import time
import numpy as np, jax, jax.numpy as jnp

P = 8192
rng = np.random.default_rng(0)

def bench(name, f, *args):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(*args))
    t0=time.time(); n=10
    for _ in range(n): out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1e3:7.2f} ms", flush=True)
    return out

for M in (268, 1072, 2144, 4288):
    mask = jnp.asarray(rng.random((P, M)) < 30.0/M)
    ids = jnp.broadcast_to(jnp.arange(M, dtype=jnp.int32), (P, M))
    K = 124
    bench(f"sort    M={M}", lambda m: jax.lax.sort(jnp.where(m, ids, M), dimension=1)[:, :K], mask)
    bench(f"top_k   M={M}", lambda m: jax.lax.top_k(jnp.where(m, M - ids, 0), K)[1], mask)
    bench(f"cumsum  M={M}", lambda m: jnp.cumsum(m, axis=1), mask)
