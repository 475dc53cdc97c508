import jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import sys

def probe(mb):
    n = int(mb * 1024 * 1024 / (8*128*4))
    x = jnp.ones((n, 8, 128), jnp.float32)
    def k(x_ref, o_ref):
        o_ref[...] = x_ref[0] + x_ref[n-1]
    try:
        out = pl.pallas_call(
            k,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        )(x)
        out.block_until_ready()
        print(f"{mb} MB: OK")
        return True
    except Exception as e:
        print(f"{mb} MB: FAIL {str(e)[:120]}")
        return False

for mb in (16, 32, 48, 64, 96, 120):
    if not probe(mb): break
