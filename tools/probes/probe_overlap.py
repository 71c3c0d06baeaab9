"""Does Mosaic overlap MXU and VPU issue for independent work in one kernel?

Three kernels over the same grid: (a) matmul only, (b) VPU chain only,
(c) both, data-independent. If t(c) ~= max(a, b): overlap exists and the
skewed two-stage backward should win — investigate why it didn't.
If t(c) ~= a + b: MXU/VPU issue is serial within a kernel body, the
VPU/MXU serialization in the fused backward is a hardware/compiler floor,
and the remedy must REDUCE VPU work, not rearrange it.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import time, json, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
assert jax.default_backend() == "tpu"

R, C, F = 50176, 512, 2048
ROWS = 1024
dtype = jnp.bfloat16


def _init_acc(acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)


def k_mm(x_ref, w_ref, v_ref, o_ref, acc_ref):
    # dW-shaped contraction: x^T (C,ROWS) · v (ROWS,F) -> (C,F), like the
    # backward's dw accumulations.
    _init_acc(acc_ref)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], v_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = x_ref[...]


def k_vpu(x_ref, w_ref, v_ref, o_ref, acc_ref):
    _init_acc(acc_ref)
    v = v_ref[...].astype(jnp.float32)
    g = jax.nn.gelu(v, approximate=True)
    d = g * jax.nn.sigmoid(v) + jnp.tanh(v)
    o_ref[...] = (x_ref[...].astype(jnp.float32)
                  + jnp.sum(d, 1, keepdims=True)).astype(o_ref.dtype)
    acc_ref[...] += jnp.sum(d, axis=0, keepdims=True) * jnp.ones(
        (acc_ref.shape[0], 1), jnp.float32)


def k_both(x_ref, w_ref, v_ref, o_ref, acc_ref):
    _init_acc(acc_ref)
    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], v_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    g = jax.nn.gelu(v, approximate=True)
    d = g * jax.nn.sigmoid(v) + jnp.tanh(v)
    o_ref[...] = (x_ref[...].astype(jnp.float32)
                  + jnp.sum(d, 1, keepdims=True)).astype(o_ref.dtype)


def run(kernel, name):
    nb = R // ROWS
    f = pl.pallas_call(
        kernel, grid=(nb,),
        in_specs=[pl.BlockSpec((ROWS, C), lambda i: (i, 0)),
                  pl.BlockSpec((C, F), lambda i: (0, 0)),
                  pl.BlockSpec((ROWS, F), lambda i: (i, 0))],
        out_specs=(pl.BlockSpec((ROWS, C), lambda i: (i, 0)),
                   pl.BlockSpec((C, F), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((R, C), dtype),
                   jax.ShapeDtypeStruct((C, F), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (R, C), dtype)
    w = jax.random.normal(jax.random.PRNGKey(1), (C, F), dtype)
    v = jax.random.normal(jax.random.PRNGKey(2), (R, F), dtype)
    g = jax.jit(lambda *a: f(*a))
    o = g(x, w, v); float(jnp.sum(o[1]))
    t0 = time.time()
    for _ in range(20):
        o = g(x, w, v)
    s = float(jnp.sum(o[1]))
    ms = (time.time() - t0) / 20 * 1000
    print(json.dumps({name: round(ms, 3)}), flush=True)
    return ms


a = run(k_mm, "matmul_only_ms")
b = run(k_vpu, "vpu_only_ms")
c = run(k_both, "both_ms")
print(json.dumps({"sum_ms": round(a + b, 3), "max_ms": round(max(a, b), 3),
                  "overlap_frac": round((a + b - c) / min(a, b), 3)}))
