import sys, time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

mode = sys.argv[1] if len(sys.argv) > 1 else "full"
IN, OUT, B = 2048, 5632, 8
group = 32
byte_rows = IN // 2
bt, ot = 512, 256
n_in, n_out = byte_rows // bt, OUT // ot
gpb = bt // group

def expand(s, g):
    gp, o = s.shape
    return jnp.broadcast_to(s[:, None, :], (gp, g, o)).reshape(gp * g, o)

def kern(x_lo, x_hi, qs, sc_lo, sc_hi, out, acc):
    k = pl.program_id(1)
    @pl.when(k == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
    q = qs[:].astype(jnp.int32)
    lo = (q & 0xF).astype(jnp.float32)
    hi = ((q >> 4) & 0xF).astype(jnp.float32)
    if mode in ("full", "noexpand"):
        if mode == "full":
            w_lo = (lo * expand(sc_lo[:], group)).astype(jnp.bfloat16)
            w_hi = (hi * expand(sc_hi[:], group)).astype(jnp.bfloat16)
        else:
            w_lo = lo.astype(jnp.bfloat16)
            w_hi = hi.astype(jnp.bfloat16)
    a = acc[:]
    a += jnp.dot(x_lo[:].astype(jnp.bfloat16), w_lo, preferred_element_type=jnp.float32)
    a += jnp.dot(x_hi[:].astype(jnp.bfloat16), w_hi, preferred_element_type=jnp.float32)
    acc[:] = a
    @pl.when(k == n_in - 1)
    def _():
        out[:] = acc[:]

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, IN)), jnp.bfloat16)
qs = jnp.asarray(rng.integers(-128, 127, (byte_rows, OUT)), jnp.int8)
sc = jnp.asarray(rng.normal(size=(IN // group, OUT)), jnp.float32)

f = pl.pallas_call(
    kern, grid=(n_out, n_in),
    in_specs=[
        pl.BlockSpec((B, bt), lambda i, k: (0, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, bt), lambda i, k: (0, k + n_in), memory_space=pltpu.VMEM),
        pl.BlockSpec((bt, ot), lambda i, k: (k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((gpb, ot), lambda i, k: (k, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((gpb, ot), lambda i, k: (k + n_in, i), memory_space=pltpu.VMEM),
    ],
    out_specs=pl.BlockSpec((B, ot), lambda i, k: (0, i), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((B, OUT), jnp.float32),
    scratch_shapes=[pltpu.VMEM((B, ot), jnp.float32)],
)
t0 = time.time()
out = f(x, x, qs, sc, sc)
out.block_until_ready()
print(f"mode={mode} first call {time.time()-t0:.1f}s")
t0 = time.time()
for _ in range(100):
    out = f(x, x, qs, sc, sc)
out.block_until_ready()
dt = (time.time()-t0)/100
nbytes = qs.size + sc.size*4*0  # weights only for full stream
print(f"mode={mode} steady {dt*1e6:.0f} us/call, {qs.size/dt/1e9:.1f} GB/s qs-stream")
