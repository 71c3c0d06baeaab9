"""Trainer contract tests: metrics protocol, grad handling, checkpoint/resume."""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_generative_tpu import core, debug, models, trainer


def _make_trainer(log_dir, skip_grad_norm=None, clip_grad_norm=None,
                  loader=None, tb=False):
    model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                        in_shape=(4, 4, 1))
    loader = loader or debug.DummyLoader(shape=(4, 4, 1), batch_size=2)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        loss = optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1))
        return loss.sum(axis=1).mean()

    return trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
        train_loader=loader, eval_loader=loader, log_dir=log_dir,
        skip_grad_norm=skip_grad_norm, clip_grad_norm=clip_grad_norm,
        sample_epochs=1, use_tensorboard=tb)


def test_train_eval_checkpoint_and_metrics(tmp_path):
    log_dir = str(tmp_path)
    t = _make_trainer(log_dir)
    t.interleaved_train_and_eval(max_epochs=2, restore=False)

    ckpts = glob.glob(os.path.join(log_dir, "trainer_state_*.ckpt"))
    assert len(ckpts) == 2

    records = [json.loads(line)
               for line in open(os.path.join(log_dir, "metrics.jsonl"))]
    tags = {r["tag"] for r in records}
    # The reference's observability channels (trainer.py:159-163, 244-265).
    assert {"metrics/loss", "metrics/grad_norm", "speed/examples_per_sec",
            "speed/millis_per_example", "speed/epoch",
            "speed/step"} <= tags
    # Train and eval sub-tags both present for loss.
    loss_records = [r for r in records if r["tag"] == "metrics/loss"]
    assert any("train" in r for r in loss_records)
    assert any("eval" in r for r in loss_records)
    # Samples were generated (sample_epochs=1).
    assert glob.glob(os.path.join(log_dir, "sample_*.npy"))


def test_resume_from_checkpoint(tmp_path):
    log_dir = str(tmp_path)
    t = _make_trainer(log_dir)
    t.interleaved_train_and_eval(max_epochs=2, restore=False)
    params_after = jax.device_get(t._params)
    step_after = t._step

    # A fresh trainer restores the latest checkpoint and fast-forwards epochs.
    t2 = _make_trainer(log_dir)
    t2.interleaved_train_and_eval(max_epochs=2, restore=True)
    assert t2._epoch == 2
    assert t2._step == step_after
    assert core.tree_equal(jax.device_get(t2._params), params_after)


def test_skip_grad_norm_skips_update(tmp_path):
    t = _make_trainer(str(tmp_path), skip_grad_norm=1e-12)
    before = jax.device_get(t._params)
    x = np.random.default_rng(0).random((2, 4, 4, 1)).astype(np.float32)
    metrics, _ = t.train_one_step(x, None)
    jax.block_until_ready(metrics)
    after = jax.device_get(t._params)
    assert core.tree_equal(before, after)  # update skipped entirely
    assert float(np.asarray(metrics["grad_norm"])) > 0  # still logged


def test_clip_grad_norm_bounds_update(tmp_path):
    t = _make_trainer(str(tmp_path), clip_grad_norm=1e-6)
    before = jax.device_get(t._params)
    x = np.random.default_rng(0).random((2, 4, 4, 1)).astype(np.float32)
    metrics, _ = t.train_one_step(x, None)
    jax.block_until_ready(metrics)
    after = jax.device_get(t._params)
    assert not core.tree_equal(before, after)  # clipped but applied


def test_loss_fn_dict_protocol(tmp_path):
    model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                        in_shape=(4, 4, 1))
    loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=2)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        loss = optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()
        return {"loss": loss, "extra_metric": loss * 2}

    t = trainer.Trainer(model=model, loss_fn=loss_fn,
                        optimizer=optax.adam(1e-3), train_loader=loader,
                        eval_loader=loader, log_dir=str(tmp_path),
                        use_tensorboard=False)
    t.interleaved_train_and_eval(max_epochs=1, restore=False)
    records = [json.loads(line)
               for line in open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert any(r["tag"] == "metrics/extra_metric" for r in records)


def test_debug_loader_wrappers():
    from pytorch_generative_tpu.datasets import DataLoader

    xs = np.arange(40, dtype=np.float32).reshape(10, 4)
    loader = DataLoader(xs, None, batch_size=4)
    one_example = debug.OneExampleLoaderWrapper(loader)
    batches = list(one_example)
    assert len(batches) == 1 and batches[0][0].shape == (1, 4)

    one_batch = debug.OneBatchLoaderWrapper(loader)
    batches = list(one_batch)
    assert len(batches) == 1 and batches[0][0].shape == (4, 4)


def test_keep_checkpoints_prunes_old_files(tmp_path):
    """Trainer(keep_checkpoints=n) keeps only the newest n checkpoints —
    the reference's own TODO (reference trainer.py:111)."""
    model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                        in_shape=(4, 4, 1))
    loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=2)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()

    t = trainer.Trainer(model=model, loss_fn=loss_fn,
                        optimizer=optax.adam(1e-3), train_loader=loader,
                        eval_loader=loader, log_dir=str(tmp_path),
                        keep_checkpoints=2, sample_epochs=100,
                        use_tensorboard=False)
    t.interleaved_train_and_eval(max_epochs=5, restore=False)
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path),
                                          "trainer_state_*.ckpt")))
    assert len(ckpts) == 2
    assert ckpts[0].endswith("trainer_state_4.ckpt")
    assert ckpts[1].endswith("trainer_state_5.ckpt")
    # Restore still finds the latest surviving checkpoint.
    t2 = trainer.Trainer(model=model, loss_fn=loss_fn,
                         optimizer=optax.adam(1e-3), train_loader=loader,
                         eval_loader=loader, log_dir=str(tmp_path),
                         use_tensorboard=False)
    t2.restore_checkpoint()
    assert t2._epoch == 5


def test_logged_lr_tracks_applied_steps(tmp_path):
    """When skip_grad_norm drops steps, the optax schedule inside opt_state
    does not advance — the logged LR must track applied steps, not the raw
    batch counter (the reference logs the actual param_group lr)."""
    schedule = lambda step: 1e-3 * (0.5 ** step)

    def run(log_dir, skip):
        t = _make_trainer(log_dir, skip_grad_norm=skip)
        t.lr_schedule = schedule
        t.interleaved_train_and_eval(max_epochs=3, restore=False)
        records = [json.loads(line)
                   for line in open(os.path.join(log_dir, "metrics.jsonl"))]
        return [r for r in records if r["tag"] == "metrics/lr"]

    # Every step skipped (threshold 1e-12): the LR must stay at schedule(0).
    skipped = run(str(tmp_path / "skip"), 1e-12)
    assert len(skipped) >= 2
    vals = [list(v for k, v in r.items() if k not in ("tag", "step"))[0]
            for r in skipped]
    vals = [v["group_0"] if isinstance(v, dict) else v for v in vals]
    np.testing.assert_allclose(vals, schedule(0))

    # No skips: the LR advances per step.
    applied = run(str(tmp_path / "noskip"), None)
    vals = [list(v for k, v in r.items() if k not in ("tag", "step"))[0]
            for r in applied]
    vals = [v["group_0"] if isinstance(v, dict) else v for v in vals]
    np.testing.assert_allclose(vals, [schedule(i) for i in range(len(vals))])
