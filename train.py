"""CLI entry point: train any registered model via its reproduce() recipe.

Parity surface: /root/reference/train.py (same 5 flags, with --gpus generalized
to --devices = TPU chips in the data-parallel mesh). The reference's per-rank
process spawn + NCCL rendezvous (train.py:27-43) is unnecessary under JAX's
single-controller model — one process drives the whole mesh — which also fixes
the reference's broken multi-GPU argument forwarding and its double-train
fallthrough (train.py:36-44).
"""

import argparse

from pytorch_generative_tpu.models.autoregressive import (
    fvbn,
    made,
    nade,
)

MODEL_DICT = {
    "fvbn": fvbn,
    "made": made,
    "nade": nade,
}


def _register_optional_models():
    """Extends MODEL_DICT as model families land (keeps import errors local)."""
    import importlib

    for name, module_path in {
        "gated_pixel_cnn": "pytorch_generative_tpu.models.autoregressive.gated_pixel_cnn",
        "image_gpt": "pytorch_generative_tpu.models.autoregressive.image_gpt",
        "image_gpt_moe": "pytorch_generative_tpu.models.autoregressive.image_gpt_moe",
        "pixel_cnn": "pytorch_generative_tpu.models.autoregressive.pixel_cnn",
        "pixel_snail": "pytorch_generative_tpu.models.autoregressive.pixel_snail",
        "vae": "pytorch_generative_tpu.models.vae.vae",
        "beta_vae": "pytorch_generative_tpu.models.vae.beta_vae",
        "vd_vae": "pytorch_generative_tpu.models.vae.vd_vae",
        "vq_vae": "pytorch_generative_tpu.models.vae.vq_vae",
        "vq_vae_2": "pytorch_generative_tpu.models.vae.vq_vae_2",
        "nice": "pytorch_generative_tpu.models.flow.nice",
    }.items():
        try:
            MODEL_DICT[name] = importlib.import_module(module_path)
        except ModuleNotFoundError:
            pass


_register_optional_models()


def maybe_init_multihost() -> bool:
    """Initializes jax.distributed when a multi-host coordinator is configured.

    Multi-host: one controller per host; the same data mesh then spans hosts
    over DCN (replacing the reference's per-rank NCCL rendezvous,
    train.py:27-43). On a single host with no coordinator environment this is
    a documented no-op (returns False) rather than a crash.
    """
    import os

    coordinator = (os.environ.get("JAX_COORDINATOR_ADDRESS")
                   or os.environ.get("COORDINATOR_ADDRESS"))
    if not coordinator and "SLURM_JOB_NUM_NODES" not in os.environ:
        print("--multihost: no coordinator environment detected; "
              "running single-host.")
        return False
    import jax

    # Explicit rendezvous when the generic env vars are set (manual clusters,
    # and the 2-process DCN test in tests/test_parallel.py); auto-detection
    # (SLURM / cloud metadata) otherwise.
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    process_id = os.environ.get("JAX_PROCESS_ID")
    if coordinator and num_processes is not None and process_id is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=int(num_processes),
                                   process_id=int(process_id))
    else:
        jax.distributed.initialize()
    return True


def main(args):
    if args.multihost:
        maybe_init_multihost()
    from pytorch_generative_tpu import trainer as _trainer

    _trainer.set_default_overrides(
        fsdp=args.fsdp or None,
        grad_accumulation=args.grad_accumulation,
        compute_dtype=("bfloat16" if args.bf16 else None),
        async_checkpoint=args.async_checkpoint or None,
        skip_nonfinite=args.skip_nonfinite or None,
        keep_checkpoints=args.keep_checkpoints)
    MODEL_DICT[args.model].reproduce(
        args.epochs, args.batch_size, args.logdir, args.devices)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--model", type=str, help="the model to train and evaluate",
        choices=list(MODEL_DICT.keys()), required=True)
    parser.add_argument(
        "--epochs", type=int, help="number of training epochs", default=457)
    parser.add_argument(
        "--batch-size", type=int, help="the training and evaluation batch_size",
        default=128)
    parser.add_argument(
        "--logdir", type=str, help="the directory where to log data",
        default="/tmp/run")
    parser.add_argument(
        "--devices", type=int,
        help="number of TPU devices to data-parallelize over", default=1)
    parser.add_argument(
        "--multihost", action="store_true",
        help="initialize jax.distributed for multi-host (DCN) meshes")
    parser.add_argument(
        "--fsdp", action="store_true",
        help="shard params/grads/optimizer state over the data mesh (ZeRO-3)")
    parser.add_argument(
        "--grad-accumulation", type=int, default=None,
        help="microbatches to average per optimizer step (exact virtual batch)")
    parser.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 compute (f32 master weights and optimizer state)")
    parser.add_argument(
        "--async-checkpoint", action="store_true",
        help="write checkpoints from a background thread")
    parser.add_argument(
        "--skip-nonfinite", action="store_true",
        help="skip optimizer steps with NaN/inf loss or gradients")
    parser.add_argument(
        "--keep-checkpoints", type=int, default=None,
        help="keep only the newest N checkpoint files")
    args = parser.parse_args()
    main(args)
