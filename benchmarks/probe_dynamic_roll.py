import functools
import numpy as np
import jax
import gsdx  # registers the axon plugin
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(shift_ref, x_ref, o_ref):
    s = shift_ref[0]
    o_ref[...] = pltpu.roll(x_ref[...], shift=s, axis=1)

@jax.jit
def run(x, shift):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(1,),
        in_specs=[pl.BlockSpec((8, 512), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 512), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(kern, grid_spec=grid_spec,
                          out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
                          )(shift, x)

x = jnp.asarray(np.arange(8*512, dtype=np.float32).reshape(8, 512))
for s in (0, 3, 130, 511):
    out = run(x, jnp.asarray([s], jnp.int32))
    ref = np.roll(np.asarray(x), s, axis=1)
    ok = np.array_equal(np.asarray(out), ref)
    print(f"shift={s}: match={ok}", flush=True)
print("PROBE OK", flush=True)
