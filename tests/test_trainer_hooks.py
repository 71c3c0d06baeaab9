"""The Trainer's overridable compute_metrics seam (reference: train_one_batch /
eval_one_batch hooks)."""

import jax
import numpy as np
import optax

from pytorch_generative_tpu import debug, models, trainer


class CustomTrainer(trainer.Trainer):
    def compute_metrics(self, model, x, y, rng, training):
        metrics, new_model = super().compute_metrics(model, x, y, rng,
                                                     training)
        metrics["doubled_loss"] = 2.0 * metrics["loss"]
        return metrics, new_model


def test_compute_metrics_override(tmp_path):
    model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                        in_shape=(4, 4, 1))
    loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=2)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    t = CustomTrainer(model=model, loss_fn=loss_fn,
                      optimizer=optax.adam(1e-3), train_loader=loader,
                      eval_loader=loader, log_dir=str(tmp_path),
                      use_tensorboard=False)
    x = np.random.default_rng(0).random((2, 4, 4, 1)).astype(np.float32)
    metrics, _ = t.train_one_step(x, None)
    metrics = jax.device_get(metrics)
    np.testing.assert_allclose(float(metrics["doubled_loss"]),
                               2 * float(metrics["loss"]), rtol=1e-6)
