import time
import numpy as np, jax, jax.numpy as jnp

def bench(name, f, *args, n=20):
    jf = jax.jit(f)
    out = jax.block_until_ready(jf(*args))
    t0=time.time()
    for _ in range(n): out = jf(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1e3:7.2f} ms", flush=True)
    return out

# dispatch floor probe
x = jnp.ones((8,), jnp.float32)
bench("tiny op (dispatch floor)", lambda x: x + 1, x)

P, M, L = 8192, 768, 4288
rng = np.random.default_rng(0)
idx = jnp.asarray(rng.integers(0, L, (P, M)), jnp.int32)
t3 = jnp.asarray(rng.random((3, L)), jnp.float32)
t8 = jnp.asarray(rng.random((L, 8)), jnp.float32)
t128 = jnp.asarray(rng.random((L, 128)), jnp.float32)

bench("elem gather (3,L)[:,idx]", lambda i: t3[:, i], idx)
bench("row gather (L,8)[idx]", lambda i: t8[i], idx)
bench("row gather (L,8)[idx] + transpose", lambda i: jnp.transpose(t8[i], (2,0,1)), idx)
bench("row gather (L,128)[idx] (quarter M)", lambda i: t128[i[:, :M//4]], idx)
