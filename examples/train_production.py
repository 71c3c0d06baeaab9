"""Production-shaped training: every scaling feature on at once.

The kitchen-sink configuration this framework is built for — bf16 compute
with f32 master weights, gradient accumulation, ZeRO-3 state sharding over a
data mesh, the non-finite-step guard, async checkpointing with pruning, and
profiling hooks — on one model, in ~30 lines of user code. Runs on real TPU
meshes unchanged; pass --synthetic on data-free machines (the default here).

Usage:
    python examples/train_production.py [--devices 8] [--epochs 2]

`--tiny` shrinks the model and image size for smoke runs — the combined
GSPMD (FSDP) + scanned-accumulation program is expensive for XLA's *CPU*
backend to compile at full size, so use --tiny on the virtual CPU mesh;
real TPUs compile the full config in normal time.

On a multi-host pod, launch one process per host with the coordinator
environment set and add `jax.distributed.initialize()` (or use
`python train.py --multihost ...`); the mesh below then spans hosts over DCN
with no other changes.
"""

import os
import sys

# Runnable uninstalled: `python examples/<name>.py` puts examples/ on
# sys.path, not the repo root that holds the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import jax.numpy as jnp
import optax

import pytorch_generative_tpu as pgt


def main(args):
    if args.synthetic:
        train_loader, test_loader = pgt.datasets.get_synthetic_mnist_loaders(
            args.batch_size, n_train=256 if args.tiny else 2048,
            n_test=128 if args.tiny else 256,
            image_size=8 if args.tiny else 28)
    else:
        train_loader, test_loader = pgt.datasets.get_mnist_loaders(
            args.batch_size, dynamically_binarize=True)

    size = 8 if args.tiny else 28
    model = pgt.models.ImageGPT(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=size,
        n_transformer_blocks=2 if args.tiny else 8, n_attention_heads=2,
        n_embedding_channels=8 if args.tiny else 64,
        in_shape=(size, size, 1))

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()

    trainer = pgt.trainer.Trainer(
        model=model,
        loss_fn=loss_fn,
        optimizer=pgt.optim.adam_multiplicative(5e-3, 0.999977),
        train_loader=train_loader,
        eval_loader=test_loader,
        log_dir=args.logdir,
        # --- the production knobs ---
        compute_dtype=jnp.bfloat16,     # bf16 MXU compute, f32 masters
        grad_accumulation=args.grad_accumulation,  # exact virtual batching
        n_devices=args.devices,         # data mesh (ICI collectives)
        fsdp=args.devices > 1,          # ZeRO-3: shard params/grads/opt state
        skip_nonfinite=True,            # NaN step -> skipped, counted, logged
        async_checkpoint=True,          # npz write overlaps the next epoch
        keep_checkpoints=3,             # prune old checkpoint files
        clip_grad_norm=1.0,
    )
    trainer.interleaved_train_and_eval(args.epochs)

    samples = trainer.model.sample(jax.random.PRNGKey(1), 16)
    print(f"final samples: {samples.shape}, metrics in {args.logdir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--grad-accumulation", type=int, default=2)
    parser.add_argument("--devices", type=int, default=1)
    parser.add_argument("--logdir", type=str, default="/tmp/pgt_production")
    parser.add_argument("--tiny", action="store_true",
                        help="small model/images for smoke runs on CPU")
    parser.add_argument("--synthetic", action="store_true", default=True)
    parser.add_argument("--real-data", dest="synthetic", action="store_false")
    args = parser.parse_args()
    main(args)
