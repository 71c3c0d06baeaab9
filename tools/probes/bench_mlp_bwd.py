import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import os, time, json
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
from pytorch_generative_tpu.ops import mlp_pallas as mp

R, C, F = 50176, 512, 2048
dtype = jnp.bfloat16
k = jax.random.PRNGKey(0); ks = jax.random.split(k, 8)
x = jax.random.normal(ks[0], (R, C), dtype)
gamma = jnp.ones((C,), jnp.float32); beta = jnp.zeros((C,), jnp.float32)
w1 = jax.random.normal(ks[3], (C, F), dtype) * 0.05
b1 = jnp.zeros((F,), jnp.float32)
w2 = jax.random.normal(ks[5], (F, C), dtype) * 0.05
b2 = jnp.zeros((C,), jnp.float32)
do = jax.random.normal(ks[7], (R, C), dtype)
y2 = mp._fused_fwd(x, gamma, beta, w1, b1, w2, b2, 1e-5, False, save_y=True)[1]

def fence(outs):
    return float(jnp.sum(jnp.asarray([jnp.sum(o.astype(jnp.float32)) for o in outs])))

def timeit(fn, n=30):
    outs = fn(); fence(outs)  # compile + warm
    outs = fn(); fence(outs)
    t0 = time.time()
    for _ in range(n):
        outs = fn()
    s = fence(outs)
    return (time.time() - t0) / n * 1000, s

mono_ms, s1 = timeit(lambda: mp._fused_bwd(x, do, gamma, beta, w1, b1, w2, 1e-5, False, y2=y2))
pipe_ms, s2 = timeit(lambda: mp._fused_bwd_pipelined(x, do, gamma, beta, w1, b1, w2, y2, 1e-5, False))
# correctness cross-check on-device
mono = mp._fused_bwd(x, do, gamma, beta, w1, b1, w2, 1e-5, False, y2=y2)
pipe = mp._fused_bwd_pipelined(x, do, gamma, beta, w1, b1, w2, y2, 1e-5, False)
errs = {n: float(jnp.max(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32))) /
               (jnp.max(jnp.abs(a.astype(jnp.float32)))+1e-30))
        for n, a, b in zip(["dx","dw1","db1","dw2","db2","dg","db"], mono, pipe)}
flops = 4 * R * C * F * 2
print(json.dumps({"mono_ms": round(mono_ms,3), "pipe_ms": round(pipe_ms,3),
  "mono_mxu_eff": round(flops/ (mono_ms/1e3) / 197e12, 3),
  "pipe_mxu_eff": round(flops/ (pipe_ms/1e3) / 197e12, 3),
  "max_rel_err": max(errs.values()), "errs": errs}))
