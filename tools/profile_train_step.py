"""Profile a model's jitted train step on TPU and print top ops by time.

The executable form of the profiling recipe this project's perf work runs on
(the TensorBoard profile plugin is broken on this machine, so the xplane proto
is parsed directly):

    python tools/profile_train_step.py            # ImageGPT reproduce config
    BS=512 C=512 H=8 python tools/profile_train_step.py

Reads env knobs: BS (batch, 64), C (embed channels, 64), H (heads, 2),
NB (blocks, 8), DTYPE (bf16|f32, bf16), REMAT (0|1).
Writes the trace under /tmp/pgt_trace and prints per-op aggregates — the
"XLA Ops" line is synchronous device time (what the step is actually doing);
"Async XLA Ops" shows overlapped DMA (layout copies, prefetches).
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def run_and_trace():
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_generative_tpu import core, models
    from pytorch_generative_tpu import optim as optim_tpu

    bs = int(os.environ.get("BS", "64"))
    c = int(os.environ.get("C", "64"))
    h = int(os.environ.get("H", "2"))
    nb = int(os.environ.get("NB", "8"))
    dtype = jnp.bfloat16 if os.environ.get("DTYPE", "bf16") == "bf16" \
        else jnp.float32

    if os.environ.get("MODEL", "image_gpt") == "image_gpt_moe":
        model = models.ImageGPTMoE(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=28,
            n_transformer_blocks=nb, n_attention_heads=h,
            n_embedding_channels=c,
            n_experts=int(os.environ.get("E", "8")),
            n_selected=int(os.environ.get("TOPK", "1")),
            capacity_factor=float(os.environ.get("CF", "2.0")),
            group_size=(int(os.environ["GS"]) if os.environ.get("GS")
                        else None),
            in_shape=(28, 28, 1))
    else:
        model = models.ImageGPT(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=28,
            n_transformer_blocks=nb, n_attention_heads=h,
            n_embedding_channels=c,
            in_shape=(28, 28, 1), remat=os.environ.get("REMAT") == "1")
    tx, _ = optim_tpu.adam_multiplicative(5e-3, 0.999977)
    params, rest = core.partition(model)
    opt_state = tx.init(params)

    def loss_fn(params, x):
        m = core.cast_floating(core.combine(params, rest), dtype)
        preds = m.forward(x.astype(dtype))
        aux = 0.0
        if isinstance(preds, tuple):  # MoE: (logits, load-balance aux)
            preds, aux = preds
        preds = preds.astype(jnp.float32)
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean() \
            + 0.01 * aux

    # Scan-chunked like bench.py: one device dispatch per chunk AND the same
    # compiled-step shape bench measures (the plain un-scanned step can hit a
    # different XLA buffer-placement choice at wide configs).
    def one(carry, x):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, x)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def step(params, opt_state, x):
        (params, opt_state), losses = jax.lax.scan(
            one, (params, opt_state), x[None])
        return params, opt_state, losses[-1]

    x = jnp.asarray((np.random.default_rng(0).random(
        (bs, 28, 28, 1)) < 0.13).astype(np.float32))
    params, opt_state, loss = step(params, opt_state, x)
    float(loss)  # fence with a host fetch; block_until_ready lies here

    t0 = time.time()
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, x)
    float(loss)
    print(f"bs={bs} C={c} H={h}: {20 * bs / (time.time() - t0):.1f} samples/s")

    with jax.profiler.trace("/tmp/pgt_trace"):
        for _ in range(5):
            params, opt_state, loss = step(params, opt_state, x)
        float(loss)


def report(top=20):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = sorted(glob.glob("/tmp/pgt_trace/**/*.xplane.pb",
                            recursive=True))[-1]
    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "tpu" not in plane.name.lower():
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        tot, cnt = defaultdict(int), defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, "?")
                tot[(line.name, name)] += ev.duration_ps
                cnt[(line.name, name)] += 1
        by_line = defaultdict(list)
        for (ln, name), ps in tot.items():
            by_line[ln].append((ps, name))
        import re

        for ln in ("XLA Ops", "Async XLA Ops"):
            items = sorted(by_line.get(ln, []), reverse=True)
            total = sum(p for p, _ in items)
            print(f"-- {ln}: {total / 1e9:.3f} ms over the traced steps")
            for ps, name in items[:top]:
                print(f"  {ps / 1e9:8.3f} ms {100 * ps / total:5.1f}% "
                      f"x{cnt[(ln, name)]:4d}  {name[:100]}")
            # Category rollup: strip instance suffixes (".<n>") so the long
            # tail of small ops becomes visible as aggregate buckets.
            cat_tot, cat_cnt = defaultdict(int), defaultdict(int)
            for ps, name in items:
                cat = re.sub(r"[.\d]+$", "",
                             name.lstrip("%").split(" = ")[0].split("(")[0])
                cat_tot[cat] += ps
                cat_cnt[cat] += cnt[(ln, name)]
            print(f"-- {ln} by category:")
            for cat, ps in sorted(cat_tot.items(), key=lambda kv: -kv[1]):
                if ps / max(total, 1) < 0.002:
                    continue
                print(f"  {ps / 1e9:8.3f} ms {100 * ps / total:5.1f}% "
                      f"x{cat_cnt[cat]:5d}  {cat[:90]}")


if __name__ == "__main__":
    run_and_trace()
    report()
