"""Time the ImageGPT f32 train step under one PGT_FLASH_PRECISION setting.

Run once per setting (separate processes: the precision is read at trace
time and the packed wrappers are jitted, so one process = one setting).
Env knobs: BS (64), C (64), H (2), NB (8).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
assert jax.default_backend() == "tpu", jax.default_backend()

from pytorch_generative_tpu import core, models
from pytorch_generative_tpu import optim as optim_tpu

bs = int(os.environ.get("BS", "64"))
c = int(os.environ.get("C", "64"))
h = int(os.environ.get("H", "2"))
nb = int(os.environ.get("NB", "8"))

model = models.ImageGPT(
    jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=28,
    n_transformer_blocks=nb, n_attention_heads=h, n_embedding_channels=c,
    in_shape=(28, 28, 1))
tx, _ = optim_tpu.adam_multiplicative(5e-3, 0.999977)
params, rest = core.partition(model)
x = jnp.asarray((np.random.default_rng(0).random(
    (bs, 28, 28, 1)) < 0.13).astype(np.float32))


def loss_fn(params, xb):
    m = core.combine(params, rest)
    preds = m.forward(xb)
    n = xb.shape[0]
    return optax.sigmoid_binary_cross_entropy(
        preds.reshape(n, -1), xb.reshape(n, -1)).sum(axis=1).mean()


@jax.jit
def step(params, opt_state, xb):
    loss, grads = jax.value_and_grad(loss_fn)(params, xb)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


opt_state = tx.init(params)
p, o, loss = step(params, opt_state, x)
l0 = float(loss)
t0 = time.time()
n_it = 40
for _ in range(n_it):
    p, o, loss = step(p, o, x)
lN = float(loss)  # host fetch = the timing fence
sps = n_it * bs / (time.time() - t0)
print(json.dumps({
    "precision": os.environ.get("PGT_FLASH_PRECISION", "default"),
    "bs": bs, "c": c, "h": h,
    "samples_per_s": round(sps, 1), "loss0": round(l0, 4),
    "lossN": round(lN, 4)}), flush=True)
