import numpy as np, jax, jax.numpy as jnp, time
from llama_box_tpu.ops.flash_attention import flash_attention_prefill

rng = np.random.default_rng(0)
Hkv, G, T, D, C = 4, 8, 512, 64, 2048
q = jnp.asarray(rng.normal(size=(Hkv, G, T, D)), jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.bfloat16)
v = jnp.asarray(rng.normal(size=(Hkv, C, D)), jnp.bfloat16)

f = jax.jit(lambda q, k, v: flash_attention_prefill(q, k, v, 1536))
t0 = time.time()
out = f(q, k, v); out.block_until_ready()
print(f"flash compile+run {time.time()-t0:.1f}s")

# correctness vs einsum
qf = np.asarray(q, np.float32); kf = np.asarray(k, np.float32); vf = np.asarray(v, np.float32)
qpos = 1536 + np.arange(T)[:, None]; kpos = np.arange(C)[None, :]
mask = (kpos <= qpos)
s = np.einsum("hgtd,hcd->hgtc", qf, kf) * (D ** -0.5)
s = np.where(mask[None, None], s, -1e30)
p = np.exp(s - s.max(-1, keepdims=True)); p /= p.sum(-1, keepdims=True)
want = np.einsum("hgtc,hcd->hgtd", p, vf)
got = np.asarray(out)
rel = np.abs(got - want) / (np.abs(want) + 1e-2)
print("flash rel err:", rel.mean())

t0 = time.time()
N = 50
for _ in range(N):
    out = f(q, k, v)
out.block_until_ready()
print(f"steady {(time.time()-t0)/N*1e6:.0f} us/call")
