#!/usr/bin/env python
"""Measured model-quality (NLL) parity: torch reference vs this TPU build.

The reference's published numbers (/root/reference/README.md:177-211) come from
full MNIST reproduce() runs, impossible on this zero-egress box. This harness
proves quality parity the feasible way: BOTH frameworks train the SAME small
model configs on an IDENTICAL fixed synthetic dataset (a learnable
mixture-of-prototypes binary image distribution, not uniform noise) to loss
plateau, then report example-weighted eval NLL in nats computed with identical
formulas — the reference's reproduce() losses
(e.g. /root/reference/pytorch_generative/models/autoregressive/nade.py:130-134)
and its Trainer's example-weighted eval (reference trainer.py:269-277; ours
pytorch_generative_tpu/utils/evaluation.py).

Both frameworks run on CPU: model quality is hardware-independent, identical
hardware removes a confound, and the single tunneled TPU chip stays free. Batch
order is identical on both sides (pre-shuffled fixed arrays, no reshuffling);
weight inits follow each framework's own init RNG — parity at the *converged
loss* is the claim, not trajectory equality (that is tested separately in
tests/test_training_parity.py).

Usage:
    python bench_quality.py                 # all models, prints one JSON line each
    python bench_quality.py --models nade,made
    python bench_quality.py --record        # also update BASELINE_MEASURED.json
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REL_TOL = 0.03  # |nll_tpu - nll_ref| / nll_ref must be under this.


# ---------------------------------------------------------------------------
# Dataset: a fixed, learnable binary image distribution shared by both sides.
# ---------------------------------------------------------------------------

def make_quality_dataset(n_train=1024, n_eval=256, size=28, n_protos=8,
                         flip=0.05, seed=7):
    """Mixture of smooth thresholded prototypes with 5% pixel-flip noise.

    A perfect model scores ~ n_dims*H(flip) + log(n_protos) ≈ 157 nats — far
    from the ~543-nat uninformed base rate, so converged NLL actually measures
    learning quality (uniform-noise data would not).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    protos = []
    for _ in range(n_protos):
        field = np.zeros((size, size))
        for _ in range(6):
            fx, fy = rng.uniform(0.5, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            field += rng.normal() * (np.sin(2 * np.pi * fx * xx + ph[0])
                                     * np.sin(2 * np.pi * fy * yy + ph[1]))
        protos.append((field > 0).astype(np.float32))
    protos = np.stack(protos)

    def draw(n):
        idx = rng.integers(0, n_protos, n)
        x = protos[idx]
        flips = rng.random((n, size, size)) < flip
        return np.where(flips, 1.0 - x, x)[..., None].astype(np.float32)

    return draw(n_train), draw(n_eval)


# ---------------------------------------------------------------------------
# TPU-build side (runs on CPU here; the framework is backend-agnostic).
# ---------------------------------------------------------------------------

def run_ours(model_name, cfg, train_x, eval_x, epochs, batch, lr,
             eval_seeds=8):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    import pytorch_generative_tpu as pgt
    from pytorch_generative_tpu.utils import evaluation

    model = _build_ours(model_name, cfg, jax.random.PRNGKey(0))
    loss_fn = _loss_ours(model_name)
    train_loader = pgt.datasets.DataLoader(train_x, None, batch, shuffle=False)
    eval_loader = pgt.datasets.DataLoader(eval_x, None, batch, shuffle=False)
    import tempfile

    with tempfile.TemporaryDirectory() as log_dir:
        t = pgt.trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(lr),
            train_loader=train_loader, eval_loader=eval_loader,
            log_dir=log_dir, sample_epochs=10 ** 9,
            save_checkpoint_epochs=10 ** 9, use_tensorboard=False)
        t.interleaved_train_and_eval(epochs, restore=False)
        # Example-weighted eval NLL, averaged over RNG draws (the VAE's ELBO is
        # a 1-sample MC estimate; extra seeds shrink that noise for everyone).
        nlls = [evaluation.evaluate_loss(t.model, loss_fn, eval_loader,
                                         seed=s)["loss"]
                for s in range(eval_seeds)]
    return float(np.mean(nlls))


def _build_ours(name, cfg, key):
    from pytorch_generative_tpu import models

    if name == "nade":
        return models.NADE(key, input_dim=784, hidden_dim=cfg["hidden"],
                           in_shape=(28, 28, 1))
    if name == "made":
        return models.MADE(key, input_dim=784, hidden_dims=[cfg["hidden"]],
                           n_masks=1, in_shape=(28, 28, 1))
    if name == "pixel_cnn":
        return models.PixelCNN(
            key, in_channels=1, out_channels=1, n_residual=cfg["n_residual"],
            residual_channels=cfg["residual_channels"],
            head_channels=cfg["head_channels"], in_shape=(28, 28, 1))
    if name == "vae":
        return models.VAE(
            key, in_channels=1, out_channels=1,
            latent_channels=cfg["latent_channels"], strides=(4,),
            hidden_channels=cfg["hidden_channels"],
            residual_channels=cfg["residual_channels"], in_shape=(28, 28, 1))
    raise ValueError(name)


def _loss_ours(name):
    import jax.numpy as jnp
    import optax

    if name == "vae":
        def loss_fn(x, _, preds):
            preds, kl_div = preds
            n = x.shape[0]
            recon = optax.sigmoid_binary_cross_entropy(
                preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1)
            elbo = recon + kl_div
            return {"loss": elbo.mean(), "recon_loss": recon.mean(),
                    "kl_div": kl_div.mean()}
        return loss_fn

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()
    return loss_fn


# ---------------------------------------------------------------------------
# Torch-reference side.
# ---------------------------------------------------------------------------

def run_ref(model_name, cfg, train_x, eval_x, epochs, batch, lr,
            eval_seeds=8):
    import torch

    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests._reference_compat import load_reference

    ref = load_reference()
    torch.manual_seed(0)
    model = _build_ref(ref, model_name, cfg)
    flat = model_name in ("nade", "made")
    xs = torch.tensor(train_x).permute(0, 3, 1, 2).contiguous()
    ev = torch.tensor(eval_x).permute(0, 3, 1, 2).contiguous()
    if flat:
        xs, ev = xs.reshape(len(xs), -1), ev.reshape(len(ev), -1)
    loss_fn = _loss_ref(model_name)
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    model.train()
    for _ in range(epochs):
        for i in range(0, len(xs), batch):
            xb = xs[i:i + batch]
            metrics = loss_fn(xb, None, model(xb))
            loss = metrics["loss"] if isinstance(metrics, dict) else metrics
            opt.zero_grad()
            loss.backward()
            opt.step()
    model.eval()
    # The reference evaluates in train-mode semantics for the VAE's sampling
    # path (its forward always draws latents); eval() only affects layers like
    # dropout/BN, which these models lack. Example-weighted mean, averaged
    # over eval_seeds RNG draws (reference trainer.py:269-277 weighting).
    totals = []
    for s in range(eval_seeds):
        torch.manual_seed(1000 + s)
        total, n_total = 0.0, 0
        with torch.no_grad():
            for i in range(0, len(ev), batch):
                xb = ev[i:i + batch]
                metrics = loss_fn(xb, None, model(xb))
                loss = metrics["loss"] if isinstance(metrics, dict) else metrics
                total += float(loss) * len(xb)
                n_total += len(xb)
        totals.append(total / n_total)
    return float(np.mean(totals))


def _build_ref(ref, name, cfg):
    if name == "nade":
        return ref.models.NADE(input_dim=784, hidden_dim=cfg["hidden"])
    if name == "made":
        return ref.models.MADE(input_dim=784, hidden_dims=[cfg["hidden"]],
                               n_masks=1)
    if name == "pixel_cnn":
        return ref.models.PixelCNN(
            in_channels=1, out_channels=1, n_residual=cfg["n_residual"],
            residual_channels=cfg["residual_channels"],
            head_channels=cfg["head_channels"])
    if name == "vae":
        return ref.models.VAE(
            in_channels=1, out_channels=1,
            latent_channels=cfg["latent_channels"], strides=[4],
            hidden_channels=cfg["hidden_channels"],
            residual_channels=cfg["residual_channels"])
    raise ValueError(name)


def _loss_ref(name):
    import torch.nn.functional as F

    if name == "vae":
        def loss_fn(x, _, preds):
            preds, kl_div = preds
            recon = F.binary_cross_entropy_with_logits(
                preds, x, reduction="none").sum(dim=(1, 2, 3))
            elbo = recon + kl_div
            return {"loss": elbo.mean()}
        return loss_fn

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return F.binary_cross_entropy_with_logits(
            preds.reshape(n, -1), x.reshape(n, -1),
            reduction="none").sum(dim=1).mean()
    return loss_fn


# ---------------------------------------------------------------------------
# Protocol: per-model configs chosen to plateau in CPU-feasible time.
# ---------------------------------------------------------------------------

MODELS = {
    # name: (cfg, epochs, batch, lr)
    "nade": ({"hidden": 64}, 30, 128, 1e-3),
    "made": ({"hidden": 128}, 60, 128, 1e-3),
    "pixel_cnn": ({"n_residual": 2, "residual_channels": 8,
                   "head_channels": 8}, 40, 128, 1e-3),
    "vae": ({"latent_channels": 4, "hidden_channels": 16,
             "residual_channels": 8}, 60, 128, 1e-3),
}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--models", default=",".join(MODELS))
    parser.add_argument("--record", action="store_true",
                        help="write results into BASELINE_MEASURED.json")
    parser.add_argument("--skip-ref", action="store_true",
                        help="only run the TPU build side")
    args = parser.parse_args()

    train_x, eval_x = make_quality_dataset()
    results = {}
    for name in args.models.split(","):
        cfg, epochs, batch, lr = MODELS[name]
        t0 = time.time()
        nll_ours = run_ours(name, cfg, train_x, eval_x, epochs, batch, lr)
        t_ours = time.time() - t0
        if args.skip_ref:
            print(json.dumps({"model": name, "nll_tpu_nats": round(nll_ours, 3),
                              "train_seconds_tpu_build": round(t_ours, 1)}))
            continue
        t0 = time.time()
        nll_ref = run_ref(name, cfg, epochs=epochs, batch=batch, lr=lr,
                          train_x=train_x, eval_x=eval_x)
        t_ref = time.time() - t0
        rel = abs(nll_ours - nll_ref) / nll_ref
        row = {
            "model": name,
            "nll_tpu_nats": round(nll_ours, 3),
            "nll_ref_nats": round(nll_ref, 3),
            "rel_diff": round(rel, 4),
            "within_tolerance": bool(rel <= REL_TOL),
            "bits_per_dim_tpu": round(nll_ours / 784 / math.log(2), 4),
            "bits_per_dim_ref": round(nll_ref / 784 / math.log(2), 4),
            "train_seconds_tpu_build": round(t_ours, 1),
            "train_seconds_ref_cpu": round(t_ref, 1),
        }
        results[name] = row
        print(json.dumps(row))

    if args.record and results:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE_MEASURED.json")
        with open(path) as f:
            doc = json.load(f)
        doc["quality_parity"] = {
            "protocol": ("identical fixed synthetic mixture-of-prototypes "
                         "dataset (make_quality_dataset seed=7), identical "
                         "batch order, per-framework init RNG, trained to "
                         "plateau on CPU in both frameworks, example-weighted "
                         "eval NLL averaged over 8 RNG draws; see "
                         "bench_quality.py"),
            "tolerance_rel": REL_TOL,
            "results": results,
        }
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"recorded quality_parity for {sorted(results)} -> {path}")

    if results and not all(r["within_tolerance"] for r in results.values()):
        raise SystemExit("quality parity OUTSIDE tolerance: "
                         + json.dumps({k: v["rel_diff"]
                                       for k, v in results.items()}))


if __name__ == "__main__":
    main()
