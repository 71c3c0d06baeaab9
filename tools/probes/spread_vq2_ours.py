"""Measure this build's VQ-VAE-2 across init seeds on the TPU and cache the
spread (``ours/vq_vae_2_seed_spread``) — the ours-side counterpart of the
reference seed spread backing the codebook-health gate."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))))
import json
import time

import jax

import bench_quality as bq

assert jax.default_backend() == "tpu", jax.default_backend()

cache = bq._load_cache()
train_x, eval_x = bq.make_quality_dataset()
spec = bq.MODELS["vq_vae_2"]
tx, ex = bq._model_data("vq_vae_2", spec, train_x, eval_x)

rows = list(cache.get("ours/vq_vae_2_seed_spread", {}).get("rows", []))
base = cache.get("ours/vq_vae_2/tpu/float32")
if base and not any(r["seed"] == 0 for r in rows):
    rows.append({"seed": 0, "nll": round(base["nll"], 5),
                 "perp_b": round(base["perplexity_b"], 2),
                 "perp_t": round(base["perplexity_t"], 2),
                 "seconds": base["seconds"]})

for seed in (1, 2, 3):
    if any(r["seed"] == seed for r in rows):
        continue
    t0 = time.time()
    nll, _, extras = bq.run_ours("vq_vae_2", spec, tx, ex, backend="tpu",
                                 dtype="float32", init_seed=seed)
    rows.append({"seed": seed, "nll": round(nll, 5),
                 "perp_b": round(extras["perplexity_b"], 2),
                 "perp_t": round(extras["perplexity_t"], 2),
                 "seconds": round(time.time() - t0, 1)})
    print(json.dumps({"side": "ours", "model": "vq_vae_2", **rows[-1]}),
          flush=True)
    bq._cache_put(cache, "ours/vq_vae_2_seed_spread",
                  {"rows": sorted(rows, key=lambda r: r["seed"])})

print(json.dumps({"ours_vq_vae_2_seed_spread": rows}), flush=True)
