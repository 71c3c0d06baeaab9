"""End-to-end usage example: train ImageGPT on (binarized) MNIST on TPU.

With real MNIST files available (see datasets.py's search paths) this is the
`python train.py --model image_gpt` path; without them, pass --synthetic to run
the identical pipeline on random MNIST-shaped data (useful on zero-egress
machines to validate the full stack end-to-end).

Usage:
    python examples/train_mnist.py [--synthetic] [--epochs 3] [--devices 1]
"""

import os
import sys

# Runnable uninstalled: `python examples/<name>.py` puts examples/ on
# sys.path, not the repo root that holds the package.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax
import optax

import pytorch_generative_tpu as pgt


def main(args):
    size = 8 if args.tiny else 28
    if args.synthetic:
        train_loader, test_loader = pgt.datasets.get_synthetic_mnist_loaders(
            args.batch_size, n_train=256 if args.tiny else 4096,
            n_test=64 if args.tiny else 512, image_size=size)
    else:
        train_loader, test_loader = pgt.datasets.get_mnist_loaders(
            args.batch_size, dynamically_binarize=True)

    model = pgt.models.ImageGPT(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=size,
        n_transformer_blocks=2 if args.tiny else 8, n_attention_heads=2,
        n_embedding_channels=8 if args.tiny else 64,
        in_shape=(size, size, 1))
    optimizer = pgt.optim.adam_multiplicative(5e-3, 0.999977)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()

    trainer = pgt.trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optimizer,
        train_loader=train_loader, eval_loader=test_loader,
        log_dir=args.logdir, n_devices=args.devices)
    trainer.interleaved_train_and_eval(args.epochs)

    # Evaluate the NLL the way the reference's README tables report it.
    metrics = pgt.utils.evaluation.evaluate_loss(
        trainer.model, loss_fn, test_loader)
    dims = size * size
    print(f"eval NLL: {metrics['loss']:.2f} nats "
          f"({pgt.utils.evaluation.nats_to_bits_per_dim(metrics['loss'], dims):.3f} bits/dim)")

    # Generate a 16-image grid with the KV-cache incremental decoder.
    samples = jax.jit(lambda rng: trainer.model.sample(rng, 16))(
        jax.random.PRNGKey(1))
    print("samples:", samples.shape)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--devices", type=int, default=1)
    parser.add_argument("--logdir", type=str, default="/tmp/pgt_example")
    parser.add_argument("--tiny", action="store_true",
                        help="small model/images for smoke runs on CPU")
    main(parser.parse_args())
