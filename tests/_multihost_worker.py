"""Worker for the 2-process multi-host (DCN) data-parallel test.

Spawned by tests/test_parallel.py::test_multihost_two_process_dp_step with:
    JAX_PLATFORMS=cpu
    XLA_FLAGS=--xla_force_host_platform_device_count=4
    JAX_COORDINATOR_ADDRESS=localhost:<port>
    JAX_NUM_PROCESSES=2  JAX_PROCESS_ID={0,1}

Each process is one "host" with 4 addressable devices; the global mesh spans
both (8 devices over simulated DCN). Exercises the REAL --multihost code path:
train.maybe_init_multihost() -> jax.distributed.initialize, parallel.make_mesh
over the global device list, parallel.replicate/shard_batch building global
arrays from per-process callbacks, the Trainer's shard_map train step with
cross-process psum. Process 0 writes the step's loss and updated params for
the parent to compare against a single-process run.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1]

    import train as train_cli

    assert train_cli.maybe_init_multihost(), "coordinator env must be detected"

    import jax
    import numpy as np
    import optax

    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4, len(jax.local_devices())

    from pytorch_generative_tpu import debug, models, trainer

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()

    model = models.PixelCNN(jax.random.PRNGKey(0), in_channels=1,
                            out_channels=1, n_residual=1,
                            residual_channels=4, head_channels=4,
                            in_shape=(8, 8, 1))
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=16)
    import tempfile

    with tempfile.TemporaryDirectory() as log_dir:
        t = trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.sgd(0.1),
            train_loader=loader, eval_loader=loader, log_dir=log_dir,
            n_devices=8, use_tensorboard=False)
        # Identical global batch on every host (the SPMD data contract).
        x = (np.random.default_rng(0).random((16, 8, 8, 1)) > 0.5).astype(
            np.float32)
        metrics, _ = t.train_one_step(x, None)
        loss = float(np.asarray(jax.device_get(metrics["loss"])))
        params = jax.device_get(t._params)

    if jax.process_index() == 0:
        leaves = jax.tree_util.tree_leaves(params)
        with open(out_path, "w") as f:
            json.dump({
                "loss": loss,
                "n_processes": jax.process_count(),
                "n_devices": len(jax.devices()),
                "param_sums": [float(np.sum(l)) for l in leaves],
                "param_l2": [float(np.linalg.norm(l)) for l in leaves],
            }, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
