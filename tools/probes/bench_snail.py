import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import os, time, json, sys
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()
from pytorch_generative_tpu import models
from pytorch_generative_tpu.ops import sampling as so

m = models.PixelSNAIL(
    jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_channels=64,
    n_pixel_snail_blocks=8, n_residual_blocks=2,
    attention_key_channels=4, attention_value_channels=32,
    in_shape=(28, 28, 1))
rng = jax.random.PRNGKey(1)

def fence(x):
    return float(jnp.sum(x.astype(jnp.float32)))

def timed(fn, n, rounds=3):
    t0 = time.time()
    out = fn(jax.random.PRNGKey(0)); fence(out)  # compile
    print(json.dumps({"compile_s": round(time.time() - t0, 1), "n": n}),
          flush=True)
    t0 = time.time()
    for i in range(rounds):
        out = fn(jax.random.PRNGKey(i + 1)); fence(out)
    return round(n * rounds / (time.time() - t0), 1)


for n in (16, 64, 256):
    tile = so._snail_loop_tile(m, n)
    row = {"n": n, "tile": tile}
    try:
        row["kernel_img_s"] = timed(
            jax.jit(lambda r, n=n: so._pixel_snail_sample_loop(m, r, n, None)),
            n)
    except Exception as e:
        row["kernel_error"] = repr(e)[:300]
    if os.environ.get("XLA_TOO") == "1":
        row["xla_img_s"] = timed(
            jax.jit(lambda r, n=n: so.pixel_snail_sample_fast(
                m, r, n, use_loop_kernel=False)), n)
    print(json.dumps(row), flush=True)
