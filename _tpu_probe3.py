# Consistent comparison: dense bf16 XLA matmul vs q4-packed vs q8-int8
# pallas kernels, same [8,2048]x[2048,5632] problem, interleaved repeats.
import time
import numpy as np, jax, jax.numpy as jnp
from llama_box_tpu.ops.qmatmul import QTensor, q_matmul_pallas

IN, OUT, B = 2048, 5632, 8
group = 32
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(B, IN)), jnp.bfloat16)

qs4 = jnp.asarray(rng.integers(0, 255, (IN // 2, OUT), dtype=np.uint8).view(np.int8))
qs8 = jnp.asarray(rng.integers(-127, 127, (IN, OUT), dtype=np.int8))
sc = jnp.asarray(rng.uniform(0.001, 0.01, (IN // group, OUT)).astype(np.float32))
mn = jnp.asarray(rng.uniform(0, 0.01, (IN // group, OUT)).astype(np.float32))
w_bf = jnp.asarray(rng.normal(size=(IN, OUT), scale=0.02), jnp.bfloat16)

qt4 = QTensor(qs4, sc, mn, IN, group, True)
qt8 = QTensor(qs8, sc, None, IN, group, False)

f_q4 = jax.jit(lambda x, qt: q_matmul_pallas(x, qt))
f_q8 = jax.jit(lambda x, qt: q_matmul_pallas(x, qt))
_f_q4, _f_q8 = f_q4, f_q8
f_q4 = lambda x: _f_q4(x, qt4)
f_q8 = lambda x: _f_q8(x, qt8)
f_bf = jax.jit(lambda x: (x @ w_bf).astype(jnp.float32))

fns = {"q4": f_q4, "q8": f_q8, "bf16": f_bf}
for name, f in fns.items():
    f(x).block_until_ready()

for rep in range(3):
    line = []
    for name, f in fns.items():
        t0 = time.time()
        N = 300
        for _ in range(N):
            out = f(x)
        out.block_until_ready()
        dt = (time.time() - t0) / N
        line.append(f"{name}={dt*1e6:.0f}us")
    print(f"rep{rep}: " + " ".join(line))
