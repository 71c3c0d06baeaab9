"""A/B the fused attention-block kernel (PGT_FUSED_ATTN) on the ImageGPT
train step at the C=512 production point and the reproduce() headline config.

Env knobs: BS (64), C (512), H (4), NB (8), DTYPE (bf16).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import os, time, json
import jax, jax.numpy as jnp, numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()

from pytorch_generative_tpu import core, models
from pytorch_generative_tpu import optim as optim_tpu

bs = int(os.environ.get("BS", "64"))
c = int(os.environ.get("C", "512"))
h = int(os.environ.get("H", "4"))
nb = int(os.environ.get("NB", "8"))
dtype = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" \
    else jnp.float32

model = models.ImageGPT(
    jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=28,
    n_transformer_blocks=nb, n_attention_heads=h, n_embedding_channels=c,
    in_shape=(28, 28, 1))
tx, _ = optim_tpu.adam_multiplicative(5e-3, 0.999977)
params, rest = core.partition(model)
x = jnp.asarray((np.random.default_rng(0).random(
    (bs, 28, 28, 1)) < 0.13).astype(np.float32))


def make_step():
    # A fresh function object per gate setting: the PGT_FUSED_ATTN env var is
    # read at TRACE time, so reusing one jit cache across settings would
    # silently serve the first trace.
    def loss_fn(params, xb):
        m = core.cast_floating(core.combine(params, rest), dtype)
        preds = m.forward(xb.astype(dtype)).astype(jnp.float32)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(axis=1).mean()

    def one(carry, xb):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, xb)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def step(params, opt_state, xb):
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), xb[None])
        return params, opt_state, losses[-1]

    return step


results = {}
for gate in ("0", "1"):
    os.environ["PGT_FUSED_ATTN"] = gate
    step = make_step()
    opt_state = tx.init(params)
    p, o, loss = step(params, opt_state, x)
    l0 = float(loss)
    t0 = time.time()
    n_it = 20
    for _ in range(n_it):
        p, o, loss = step(p, o, x)
    lN = float(loss)
    sps = n_it * bs / (time.time() - t0)
    results[f"fused_{gate}"] = {"samples_per_s": round(sps, 1),
                                "loss0": round(l0, 4),
                                "lossN": round(lN, 4)}
    print(json.dumps({f"fused_attn={gate}": results[f"fused_{gate}"]}),
          flush=True)

a, b = results["fused_0"], results["fused_1"]
print(json.dumps({
    "bs": bs, "c": c, "h": h, "dtype": str(dtype.__name__),
    "speedup": round(b["samples_per_s"] / a["samples_per_s"], 4),
    "loss_agree": abs(a["lossN"] - b["lossN"]) < 0.5,
}))
