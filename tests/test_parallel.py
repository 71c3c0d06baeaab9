"""Multi-device data-parallelism tests on the simulated 8-device CPU mesh
(SURVEY.md section 4: the TPU-native answer to testing multi-chip without a
cluster)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_generative_tpu import core, debug, models, parallel, trainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _nade_loss(x, _, preds):
    n = x.shape[0]
    loss = optax.sigmoid_binary_cross_entropy(
        preds.reshape(n, -1), x.reshape(n, -1))
    return loss.sum(axis=1).mean()


def _make(n_devices, tmp_path):
    model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                        in_shape=(4, 4, 1))
    loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=8)
    return trainer.Trainer(
        model=model, loss_fn=_nade_loss, optimizer=optax.adam(1e-3),
        train_loader=loader, eval_loader=loader,
        log_dir=str(tmp_path / f"dp{n_devices}"), n_devices=n_devices,
        use_tensorboard=False)


def test_data_parallel_matches_single_device(tmp_path):
    """One DP step over 8 shards must equal one single-device step on the same
    global batch (pmean of shard-mean grads == global-mean grad)."""
    x = np.random.default_rng(0).random((8, 4, 4, 1)).astype(np.float32)

    t1 = _make(1, tmp_path)
    m1, _ = t1.train_one_step(x, None)
    t8 = _make(8, tmp_path)
    m8, _ = t8.train_one_step(x, None)

    np.testing.assert_allclose(float(np.asarray(m1["loss"])),
                               float(np.asarray(m8["loss"])), rtol=1e-5)
    np.testing.assert_allclose(float(np.asarray(m1["grad_norm"])),
                               float(np.asarray(m8["grad_norm"])), rtol=1e-4)
    p1 = jax.device_get(t1._params)
    p8 = jax.device_get(t8._params)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_vq_ema_psum_matches_single_device(tmp_path):
    """The VQ-EMA codebook after a DP step must equal the single-device result —
    the exact synchronization the reference's DDP silently lacks (SURVEY 2.8)."""

    def loss_fn(x, _, preds):
        preds, vq_loss = preds
        return jnp.mean((preds - x) ** 2) + vq_loss

    def make(n_devices):
        model = models.VectorQuantizedVAE(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1,
            hidden_channels=8, n_residual_blocks=1, residual_channels=4,
            n_embeddings=8, embedding_dim=4, in_shape=(8, 8, 1))
        loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)
        return trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
            train_loader=loader, eval_loader=loader,
            log_dir=str(tmp_path / f"vq{n_devices}"), n_devices=n_devices,
            use_tensorboard=False)

    x = np.random.default_rng(0).random((8, 8, 8, 1)).astype(np.float32)
    t1, t8 = make(1), make(8)
    t1.train_one_step(x, None)
    t8.train_one_step(x, None)
    vq1 = jax.device_get(t1.model.quantizer.vq)
    vq8 = jax.device_get(t8.model.quantizer.vq)
    np.testing.assert_allclose(np.asarray(vq8.ema_cluster_size),
                               np.asarray(vq1.ema_cluster_size), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vq8.ema_embedding),
                               np.asarray(vq1.ema_embedding), atol=1e-5)


def test_trainer_trims_ragged_batch(tmp_path):
    t = _make(8, tmp_path)
    x = np.random.default_rng(0).random((11, 4, 4, 1)).astype(np.float32)
    metrics, n = t.train_one_step(x, None)
    jax.block_until_ready(metrics)
    assert n == 8  # trimmed to a multiple of the mesh size


def test_tensor_parallel_matches_single_device(tmp_path):
    """A Megatron-sharded (data x model) ImageGPT step must match the
    unsharded single-device step (GSPMD inserts the collectives)."""
    import optax

    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=2,
                          n_attention_heads=2, n_embedding_channels=8,
                          in_shape=(8, 8, 1))
    params, rest = core.partition(gpt)
    # SGD: post-update params are a well-conditioned function of the grads
    # (Adam's first step is ~sign(g)*lr, amplifying reduction-order noise).
    tx = optax.sgd(0.1)
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)),
                    jnp.float32)

    def loss_fn(p, r, xb):
        m = core.combine(p, r)
        preds = m.forward(xb)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def step(p, r, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_fn)(p, r, xb)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), loss

    # Single device.
    p1, loss1 = jax.jit(step)(params, rest, tx.init(params), x)

    # 4 data x 2 model.
    mesh = parallel.make_2d_mesh(4, 2)
    p_sh = parallel.shard_tree(params, mesh)
    r_sh = parallel.shard_tree(rest, mesh)
    x_sh = parallel.shard_batch_2d(x, mesh)
    p2, loss2 = jax.jit(step)(p_sh, r_sh, tx.init(p_sh), x_sh)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("mask_center", [False, True])
def test_ring_attention_matches_full(mask_center):
    """Sequence-sharded ring attention over 8 devices == single-device full
    attention (incl. mask_center's zeroed first row)."""
    from pytorch_generative_tpu.ops import attention as attn_ops

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 2, 64, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 64, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 64, 16)), jnp.float32)

    expected = attn_ops.causal_attention(q, k, v, mask_center=mask_center)
    mesh = parallel.make_mesh(8, axis_name="seq")
    got = parallel.ring_attention_sharded(q, k, v, mesh,
                                          mask_center=mask_center)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5)
    if mask_center:
        np.testing.assert_allclose(np.asarray(got[:, :, 0]), 0.0)


@pytest.fixture
def pallas_interpret(monkeypatch):
    from pytorch_generative_tpu.ops import attention_pallas

    monkeypatch.setattr(attention_pallas, "_INTERPRET", True)


@pytest.mark.parametrize("mask_center", [False, True])
def test_ring_flash_attention_matches_full(mask_center, pallas_interpret):
    """Flash-kernel ring attention (each ring step a Pallas tile pass) == the
    single-device reference, values AND gradients (the custom VJP rotates the
    query bundle back around the ring)."""
    from pytorch_generative_tpu.ops import attention as attn_ops

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((2, 2, 128, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 2, 128, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 2, 128, 8)), jnp.float32)
    mesh = parallel.make_mesh(8, axis_name="seq")

    expected = attn_ops.causal_attention(q, k, v, mask_center=mask_center)
    got = parallel.ring_flash_attention_sharded(q, k, v, mesh,
                                                mask_center=mask_center)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5)

    def loss_ring(q, k, v):
        out = parallel.ring_flash_attention_sharded(
            q, k, v, mesh, mask_center=mask_center)
        return jnp.sum(jnp.sin(out))

    def loss_ref(q, k, v):
        out = attn_ops.causal_attention(q, k, v, mask_center=mask_center)
        return jnp.sum(jnp.sin(out))

    grads_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    grads_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(grads_ring, grads_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_ring_flash_attention_beyond_single_device_scale(pallas_interpret):
    """Ring == full attention at L=6272 — a sequence whose (L, L) f32 score
    matrix (157 MB/head) could not live in one v5e core's VMEM-resident flash
    working set per shard; each device only ever touches (784, 784) tiles."""
    from pytorch_generative_tpu.ops import attention as attn_ops

    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, 2, 6272, 8),
                                 jnp.float32) for i in range(3))
    mesh = parallel.make_mesh(8, axis_name="seq")
    got = parallel.ring_flash_attention_sharded(q, k, v, mesh)
    expected = attn_ops.causal_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=2e-5)


def test_sp_image_gpt_matches_forward(pallas_interpret):
    """SequenceParallelImageGPT == the wrapped model's plain forward, values
    and parameter gradients — SP is trainable end-to-end, not a demo."""
    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=16, n_transformer_blocks=2,
                          n_attention_heads=2, n_embedding_channels=16,
                          in_shape=(16, 16, 1))
    x = jnp.asarray(np.random.default_rng(0).random((2, 16, 16, 1)),
                    jnp.float32)
    mesh = parallel.make_mesh(8, axis_name="seq")
    sp = parallel.SequenceParallelImageGPT(gpt, mesh)

    np.testing.assert_allclose(np.asarray(sp.forward(x)),
                               np.asarray(gpt.forward(x)), atol=1e-5)

    def loss_sp(m):
        wrapped = parallel.SequenceParallelImageGPT(m, mesh)
        return jnp.mean(jnp.square(wrapped.forward(x)))

    def loss_ref(m):
        return jnp.mean(jnp.square(m.forward(x)))

    g_sp = jax.tree_util.tree_leaves(jax.grad(loss_sp)(gpt))
    g_ref = jax.tree_util.tree_leaves(jax.grad(loss_ref)(gpt))
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sp_image_gpt_trains_with_trainer(tmp_path, pallas_interpret):
    """The Trainer drives a SequenceParallelImageGPT unchanged (interleave,
    eval, checkpoint) — SP composes with the whole training contract."""
    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=1,
                          n_attention_heads=2, n_embedding_channels=16,
                          in_shape=(8, 8, 1))
    mesh = parallel.make_mesh(8, axis_name="seq")
    sp = parallel.SequenceParallelImageGPT(gpt, mesh)
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=4)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()

    t = trainer.Trainer(model=sp, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
                        train_loader=loader, eval_loader=loader,
                        log_dir=str(tmp_path / "sp"), sample_epochs=None,
                        use_tensorboard=False)
    before = jax.device_get(t._params)
    t.interleaved_train_and_eval(max_epochs=1, restore=False)
    after = jax.device_get(t._params)
    assert not core.tree_equal(before, after)  # parameters actually moved


# NOTE: the (8, 4) multi-block-per-stage variant also passes but compiles for
# ~7 minutes on the CPU mesh; add it back for exhaustive runs.
@pytest.mark.parametrize("n_blocks,n_stages", [(4, 4)])
def test_pipeline_parallel_matches_forward(n_blocks, n_stages):
    """GPipe-sharded ImageGPT == its plain forward (and grads flow)."""
    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=n_blocks,
                          n_attention_heads=2, n_embedding_channels=8,
                          in_shape=(8, 8, 1))
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)),
                    jnp.float32)
    mesh = parallel.make_mesh(n_stages, axis_name="stage")

    expected = gpt.forward(x)
    got = parallel.image_gpt_pipeline_forward(gpt, x, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4)

    # Gradients flow through the schedule (ppermute is linear).
    def loss(gpt):
        return jnp.sum(
            parallel.image_gpt_pipeline_forward(gpt, x, mesh, n_micro=4) ** 2)

    params, rest = core.partition(gpt)
    grads = jax.grad(
        lambda p: loss(core.combine(p, rest)))(params)
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_trainer_2d_mesh_gspmd(tmp_path):
    """Trainer with mesh_shape=(4, 2): GSPMD dp x tp training end-to-end."""
    import optax

    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=1,
                          n_attention_heads=2, n_embedding_channels=8,
                          in_shape=(8, 8, 1))
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    t = trainer.Trainer(model=gpt, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
                        train_loader=loader, eval_loader=loader,
                        log_dir=str(tmp_path), mesh_shape=(4, 2),
                        use_tensorboard=False)
    t.interleaved_train_and_eval(max_epochs=1, restore=False)
    assert t._step == 1


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape

    __graft_entry__.dryrun_multichip(8)


def test_data_parallel_eval_matches_single_device(tmp_path):
    """The sharded eval step (batch on 'data', metrics pmean'd) must equal
    the single-device eval on the same global batch."""
    x = np.random.default_rng(0).random((8, 4, 4, 1)).astype(np.float32)
    rng = jax.random.PRNGKey(7)

    t1, t8 = _make(1, tmp_path), _make(8, tmp_path)
    x1, _ = t1._prepare_batch(x, None)
    m1 = jax.device_get(t1._eval_step(t1._params, t1._rest,
                                      jnp.asarray(x1), None, rng))
    x8, _ = t8._prepare_batch(x, None)
    m8 = jax.device_get(t8._eval_step(t8._params, t8._rest, x8, None, rng))
    np.testing.assert_allclose(float(np.asarray(m1["loss"])),
                               float(np.asarray(m8["loss"])), rtol=1e-5)


def _tiny_dp_models():
    key = jax.random.PRNGKey(0)
    from pytorch_generative_tpu.models.vae.vd_vae import StackConfig

    return [
        ("gated_pixel_cnn", lambda: models.GatedPixelCNN(
            key, in_channels=1, out_channels=1, n_gated=1, gated_channels=2,
            head_channels=1, in_shape=(8, 8, 1)), "bce"),
        ("pixel_snail", lambda: models.PixelSNAIL(
            key, in_channels=1, out_channels=1, n_channels=2,
            n_pixel_snail_blocks=1, n_residual_blocks=1,
            attention_key_channels=1, attention_value_channels=1,
            in_shape=(8, 8, 1)), "bce"),
    ]


@pytest.mark.parametrize("name,make_model,loss_kind", _tiny_dp_models(),
                         ids=[n for n, _, _ in _tiny_dp_models()])
def test_dp_step_matches_single_device_more_models(name, make_model,
                                                   loss_kind, tmp_path):
    """One DP step == one single-device step for the model families that were
    previously untested under the mesh (GatedPixelCNN's pad/crop streams,
    PixelSNAIL's attention)."""
    import optax

    del loss_kind

    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()

    def run(n_devices):
        loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)
        t = trainer.Trainer(
            model=make_model(), loss_fn=loss_fn, optimizer=optax.sgd(0.1),
            train_loader=loader, eval_loader=loader,
            log_dir=str(tmp_path / f"{name}{n_devices}"),
            n_devices=n_devices, use_tensorboard=False)
        x = (np.random.default_rng(0).random((8, 8, 8, 1)) > 0.5).astype(
            np.float32)
        metrics, _ = t.train_one_step(x, None)
        return (float(np.asarray(jax.device_get(metrics)["loss"])),
                jax.device_get(t._params))

    loss1, p1 = run(1)
    loss8, p8 = run(8)
    np.testing.assert_allclose(loss1, loss8, rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_vd_vae_trains_under_data_parallelism(tmp_path):
    """VD-VAE (stochastic forward: per-shard reparam noise, so no exact
    single-device equality) trains and evaluates under the 8-device mesh."""
    import optax

    from pytorch_generative_tpu.models.vae.vd_vae import StackConfig

    model = models.VeryDeepVAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1,
        input_resolution=8, stack_configs=(StackConfig(1, 1),
                                           StackConfig(1, 1)),
        latent_channels=1, hidden_channels=8, bottleneck_channels=1,
        in_shape=(8, 8, 1))
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)

    def loss_fn(x, _, preds):
        preds, kl_div = preds
        n = x.shape[0]
        recon = optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(1).mean()
        return {"loss": recon + jnp.mean(kl_div), "kl_div": jnp.mean(kl_div)}

    t = trainer.Trainer(model=model, loss_fn=loss_fn,
                        optimizer=optax.adam(1e-3), train_loader=loader,
                        eval_loader=loader, log_dir=str(tmp_path),
                        n_devices=8, use_tensorboard=False)
    before = jax.device_get(t._params)
    t.interleaved_train_and_eval(max_epochs=1, restore=False)
    assert not core.tree_equal(before, jax.device_get(t._params))


def test_multihost_flag_single_host_noop():
    """--multihost on a single host (no coordinator env) must be a no-op, not
    a crash — the reference's counterpart path is its broken spawn
    (reference train.py:27-43)."""
    import train as train_cli

    assert train_cli.maybe_init_multihost() is False


def test_multihost_two_process_dp_step(tmp_path):
    """The REAL multi-host (DCN) path: a 2-process ``jax.distributed`` CPU
    cluster (local coordinator, 4 forced devices per process, 8-device global
    mesh) runs one Trainer DP train step through maybe_init_multihost /
    make_mesh / shard_batch / the shard_map psum step — and the result equals
    the single-process 8-device step on the same global batch."""
    import json
    import os
    import socket
    import subprocess
    import sys

    sock = socket.socket()
    sock.bind(("localhost", 0))
    port = sock.getsockname()[1]
    sock.close()

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    out_path = tmp_path / "multihost_result.json"
    # Strip the axon TPU plugin env: this box's sitecustomize registers the
    # PJRT plugin at interpreter start when PALLAS_AXON_POOL_IPS is set,
    # which initializes a backend BEFORE jax.distributed.initialize and
    # silently breaks process_count(). The workers are CPU-only.
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
                and not k.startswith("PALLAS_AXON")}
    procs, logs = [], []
    for pid in range(2):
        env = dict(
            env_base, JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
        log = open(tmp_path / f"worker{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, worker, str(out_path)], env=env,
            stdout=log, stderr=subprocess.STDOUT))
    try:
        for pid, p in enumerate(procs):
            rc = p.wait(timeout=600)
            if rc != 0:
                logs[pid].flush()
                raise AssertionError(
                    f"worker {pid} rc={rc}:\n"
                    + (tmp_path / f"worker{pid}.log").read_text()[-4000:])
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    got = json.loads(out_path.read_text())
    assert got["n_processes"] == 2 and got["n_devices"] == 8

    # Single-process comparison: identical model/batch/step on the in-process
    # virtual 8-device mesh.
    def loss_fn(x, _, preds):
        n = x.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), x.reshape(n, -1)).sum(axis=1).mean()

    model = models.PixelCNN(jax.random.PRNGKey(0), in_channels=1,
                            out_channels=1, n_residual=1,
                            residual_channels=4, head_channels=4,
                            in_shape=(8, 8, 1))
    loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=16)
    t = trainer.Trainer(
        model=model, loss_fn=loss_fn, optimizer=optax.sgd(0.1),
        train_loader=loader, eval_loader=loader,
        log_dir=str(tmp_path / "single"), n_devices=8, use_tensorboard=False)
    x = (np.random.default_rng(0).random((16, 8, 8, 1)) > 0.5).astype(
        np.float32)
    metrics, _ = t.train_one_step(x, None)
    want_loss = float(np.asarray(jax.device_get(metrics["loss"])))
    leaves = jax.tree_util.tree_leaves(jax.device_get(t._params))

    np.testing.assert_allclose(got["loss"], want_loss, rtol=1e-5)
    np.testing.assert_allclose(
        got["param_sums"], [float(np.sum(l)) for l in leaves], rtol=1e-4,
        atol=1e-6)
    np.testing.assert_allclose(
        got["param_l2"], [float(np.linalg.norm(l)) for l in leaves],
        rtol=1e-4)


def test_pixel_snail_tensor_parallel_matches_single_device():
    """PixelSNAIL with its residual-block channels Megatron-sharded over
    ('data', 'model') must match the unsharded step (PIXEL_SNAIL_TP_RULES)."""
    import optax

    snail = models.PixelSNAIL(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_channels=8,
        n_pixel_snail_blocks=2, n_residual_blocks=2,
        attention_key_channels=2, attention_value_channels=4,
        in_shape=(8, 8, 1))
    params, rest = core.partition(snail)
    tx = optax.sgd(0.1)
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)) < 0.5,
                    jnp.float32)

    def step(p, r, opt_state, xb):
        def loss_fn(p):
            m = core.combine(p, r)
            preds = m.forward(xb)
            n = xb.shape[0]
            return optax.sigmoid_binary_cross_entropy(
                preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), loss

    p1, loss1 = jax.jit(step)(params, rest, tx.init(params), x)

    mesh = parallel.make_2d_mesh(4, 2)
    rules = parallel.PIXEL_SNAIL_TP_RULES
    p_sh = parallel.shard_tree(params, mesh, rules)
    r_sh = parallel.shard_tree(rest, mesh, rules)
    x_sh = parallel.shard_batch_2d(x, mesh)
    p2, loss2 = jax.jit(step)(p_sh, r_sh, tx.init(p_sh), x_sh)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_vd_vae_tensor_parallel_matches_single_device():
    """VD-VAE with bottleneck widths Megatron-sharded must match the
    unsharded step exactly: GSPMD preserves program semantics, so even the
    reparameterization noise (same rng key, same program) is identical."""
    import optax

    from pytorch_generative_tpu.models.vae.vd_vae import StackConfig

    model = models.VeryDeepVAE(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1,
        input_resolution=8, stack_configs=(StackConfig(1, 1),
                                           StackConfig(1, 1)),
        latent_channels=2, hidden_channels=8, bottleneck_channels=4,
        in_shape=(8, 8, 1))
    params, rest = core.partition(model)
    tx = optax.sgd(0.01)
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)) < 0.5,
                    jnp.float32)
    rng = jax.random.PRNGKey(3)

    def step(p, r, opt_state, xb):
        def loss_fn(p):
            m = core.combine(p, r)
            (preds, kl_div), _ = m.forward_with_state(xb, rng=rng,
                                                      training=True)
            n = xb.shape[0]
            recon = optax.sigmoid_binary_cross_entropy(
                preds.reshape(n, -1), xb.reshape(n, -1)).sum(1)
            return (recon + kl_div).mean()

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), loss

    p1, loss1 = jax.jit(step)(params, rest, tx.init(params), x)

    mesh = parallel.make_2d_mesh(4, 2)
    rules = parallel.VD_VAE_TP_RULES
    p_sh = parallel.shard_tree(params, mesh, rules)
    r_sh = parallel.shard_tree(rest, mesh, rules)
    x_sh = parallel.shard_batch_2d(x, mesh)
    p2, loss2 = jax.jit(step)(p_sh, r_sh, tx.init(p_sh), x_sh)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_pipeline_activation_memory_is_sharded():
    """Per-device activation residency must scale down with stages: the
    pipelined forward's per-device output is the 1/S microbatch shard, and its
    per-device temp memory must not exceed the unpipelined (S=1) compile —
    i.e. microbatches ride the ICI ring rather than being replicated (the old
    x_all/psum schedule held the whole batch on every stage)."""
    def compile_stats(n_stages):
        mesh = parallel.make_mesh(n_stages, axis_name="stage")
        gpt = models.ImageGPT(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=8,
            n_transformer_blocks=8, n_attention_heads=2,
            n_embedding_channels=8, in_shape=(8, 8, 1))
        x = jnp.zeros((32, 8, 8, 1))
        f = jax.jit(lambda m, x: parallel.image_gpt_pipeline_forward(
            m, x, mesh, n_micro=8))
        return f.lower(gpt, x).compile().memory_analysis()

    one, eight = compile_stats(1), compile_stats(8)
    assert eight.output_size_in_bytes * 8 == one.output_size_in_bytes
    assert eight.temp_size_in_bytes <= one.temp_size_in_bytes * 1.2


def test_pixel_snail_pipeline_matches_forward():
    """GPipe-sharded PixelSNAIL == its plain forward: the raw-image extra
    rides the ring with each microbatch (and grads flow)."""
    snail = models.PixelSNAIL(
        jax.random.PRNGKey(0), in_channels=1, out_channels=1, n_channels=4,
        n_pixel_snail_blocks=2, n_residual_blocks=1,
        attention_key_channels=2, attention_value_channels=4,
        in_shape=(8, 8, 1))
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)) < 0.5,
                    jnp.float32)
    mesh = parallel.make_mesh(2, axis_name="stage")

    expected = snail.forward(x)
    got = parallel.pixel_snail_pipeline_forward(snail, x, mesh, n_micro=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               atol=1e-4)

    def loss(m):
        return jnp.sum(
            parallel.pixel_snail_pipeline_forward(m, x, mesh, n_micro=4) ** 2)

    params, rest = core.partition(snail)
    grads = jax.grad(lambda p: loss(core.combine(p, rest)))(params)
    total = sum(float(jnp.abs(g).sum())
                for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_dp_eval_counts_every_example(tmp_path):
    """Eval under the mesh must cover examples the sharded step can't
    (batch % n_devices != 0) via the replicated fallback — the reference
    evaluates every example (trainer.py:269-277)."""
    import json
    import os

    class CountingLoader:
        def __init__(self, xs):
            self.xs = xs

        def __iter__(self):
            return iter((x, None) for x in self.xs)

    rng = np.random.default_rng(0)
    # 11 = 8 sharded + 3 remainder; plus a 5-example batch (< n_devices).
    eval_xs = [rng.random((11, 4, 4, 1)).astype(np.float32),
               rng.random((5, 4, 4, 1)).astype(np.float32)]
    train_loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=8)

    def run(n_devices, log_dir):
        model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                            in_shape=(4, 4, 1))
        t = trainer.Trainer(
            model=model, loss_fn=_nade_loss, optimizer=optax.sgd(0.0),
            train_loader=train_loader, eval_loader=CountingLoader(eval_xs),
            log_dir=log_dir, n_devices=n_devices, use_tensorboard=False)
        t.interleaved_train_and_eval(max_epochs=1, restore=False)
        records = [json.loads(line)
                   for line in open(os.path.join(log_dir, "metrics.jsonl"))]
        evals = [r for r in records
                 if r["tag"] == "metrics/loss" and "eval" in r]
        return evals[-1]["eval"]

    # lr=0 so both runs evaluate identical weights; the example-weighted eval
    # loss must match the single-device run exactly (same 16 examples).
    loss1 = run(1, str(tmp_path / "d1"))
    loss8 = run(8, str(tmp_path / "d8"))
    np.testing.assert_allclose(loss8, loss1, rtol=1e-5)


def test_fsdp_matches_single_device():
    """A ZeRO-3 (param/grad/opt-state sharded) ImageGPT train step must match
    the unsharded single-device step, with the state actually sharded."""
    import optax

    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=2,
                          n_attention_heads=2, n_embedding_channels=8,
                          in_shape=(8, 8, 1))
    params, rest = core.partition(gpt)
    tx = optax.sgd(0.1)
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)), jnp.float32)

    def loss_fn(p, xb):
        m = core.combine(p, rest)
        preds = m.forward(xb)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def step(p, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p1, _, loss1 = jax.jit(step)(params, tx.init(params), x)

    mesh = parallel.make_mesh(8)
    # min_size=0: this toy model's weights are all tiny, force sharding.
    p_sh = parallel.shard_tree_fsdp(params, mesh, min_size=0)
    o_sh = parallel.shard_tree_fsdp(tx.init(params), mesh, min_size=0)
    fsdp_step = parallel.fsdp_jit_train_step(step, params, tx.init(params),
                                             mesh, min_size=0, donate=False)
    p2, _, loss2 = fsdp_step(p_sh, o_sh, x)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # State really is sharded: some leaf must carry the 'data' axis.
    def sharded_leaves(tree):
        return [l for l in jax.tree_util.tree_leaves(tree)
                if hasattr(l, "sharding") and l.sharding.spec
                and any(e == "data" for e in l.sharding.spec)]
    assert sharded_leaves(p2), "no parameter leaf is FSDP-sharded"
    # Adam moments (param-shaped) must pick up the same FSDP layout.
    adam_state = parallel.shard_tree_fsdp(optax.adam(1e-3).init(params), mesh,
                                          min_size=0)
    assert sharded_leaves(adam_state), "no optimizer-state leaf is FSDP-sharded"


def test_fsdp_plus_tp_matches_single_device():
    """FSDP composed with Megatron TP on a 2-D ('data','model') mesh: rules
    keep the model-axis placement, FSDP shards a remaining dimension."""
    import optax

    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=2,
                          n_attention_heads=2, n_embedding_channels=8,
                          in_shape=(8, 8, 1))
    params, rest = core.partition(gpt)
    tx = optax.sgd(0.1)
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)), jnp.float32)

    def loss_fn(p, xb):
        m = core.combine(p, rest)
        preds = m.forward(xb)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def step(p, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_fn)(p, xb)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p1, _, loss1 = jax.jit(step)(params, tx.init(params), x)

    mesh = parallel.make_2d_mesh(4, 2)
    rules = parallel.IMAGE_GPT_TP_RULES
    p_sh = parallel.shard_tree_fsdp(params, mesh, min_size=0, tp_rules=rules)
    o_sh = parallel.shard_tree_fsdp(tx.init(params), mesh, min_size=0,
                                    tp_rules=rules)
    fsdp_step = parallel.fsdp_jit_train_step(
        step, params, tx.init(params), mesh, min_size=0, tp_rules=rules,
        donate=False)
    p2, _, loss2 = fsdp_step(p_sh, o_sh, x)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # An MLP weight must be sharded on BOTH axes.
    flat = jax.tree_util.tree_leaves_with_path(p2)
    both = [l for path, l in flat
            if "mlp_conv1.weight" in jax.tree_util.keystr(path)
            and {"data", "model"} <= {e for e in l.sharding.spec
                                      if isinstance(e, str)}]
    assert both, "mlp_conv1.weight is not 2-D (data x model) sharded"


def test_trainer_fsdp_matches_single_device(tmp_path):
    """Trainer(fsdp=True) must produce the same step as the single-device
    Trainer, with parameters actually sharded over 'data'."""
    x = np.random.default_rng(0).random((8, 8, 8, 1)).astype(np.float32)

    def make(n_devices, fsdp):
        model = models.ImageGPT(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=8,
            n_transformer_blocks=2, n_attention_heads=2,
            n_embedding_channels=8, in_shape=(8, 8, 1))
        loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)

        def loss_fn(xb, _, preds):
            n = xb.shape[0]
            return optax.sigmoid_binary_cross_entropy(
                preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

        import optax as _optax
        return trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=_optax.sgd(0.1),
            train_loader=loader, eval_loader=loader,
            log_dir=str(tmp_path / f"fsdp{n_devices}_{fsdp}"),
            n_devices=n_devices, fsdp=fsdp, fsdp_min_size=0,
            use_tensorboard=False)

    import optax

    t1 = make(1, False)
    m1, _ = t1.train_one_step(x, None)
    t8 = make(8, True)
    m8, _ = t8.train_one_step(x, None)

    np.testing.assert_allclose(float(np.asarray(m1["loss"])),
                               float(np.asarray(m8["loss"])), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(t1._params)),
                    jax.tree_util.tree_leaves(jax.device_get(t8._params))):
        np.testing.assert_allclose(a, b, atol=1e-5)

    sharded = [l for l in jax.tree_util.tree_leaves(t8._params)
               if hasattr(l, "sharding") and l.sharding.spec
               and any(e == "data" for e in l.sharding.spec)]
    assert sharded, "Trainer(fsdp=True) left every parameter replicated"

    # Eval path works under FSDP too.
    xs, _ = t8._prepare_batch(x, None)
    em = t8._eval_step(t8._params, t8._rest, xs, None, jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(em["loss"])))


def test_fsdp_sharded_checkpoint_roundtrip(tmp_path):
    """FSDP checkpoints must be per-device shard files — no host allocation
    ever holds a full sharded leaf — and a fresh FSDP Trainer must restore to
    the exact saved state and continue training identically."""
    import json

    x = np.random.default_rng(0).random((8, 8, 8, 1)).astype(np.float32)

    def make(tag):
        model = models.ImageGPT(
            jax.random.PRNGKey(0), in_channels=1, out_channels=1, in_size=8,
            n_transformer_blocks=2, n_attention_heads=2,
            n_embedding_channels=8, in_shape=(8, 8, 1))
        loader = debug.DummyLoader(shape=(8, 8, 1), batch_size=8)

        def loss_fn(xb, _, preds):
            n = xb.shape[0]
            return optax.sigmoid_binary_cross_entropy(
                preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

        return trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-2),
            train_loader=loader, eval_loader=loader,
            log_dir=str(tmp_path / "ckpt"),  # shared dir: t2 restores t1's
            n_devices=8, fsdp=True, fsdp_min_size=0, use_tensorboard=False)

    t1 = make("a")
    t1.train_one_step(x, None)
    t1._epoch = 1
    t1._save_checkpoint()

    index_path = tmp_path / "ckpt" / "trainer_state_1.ckpt"
    assert index_path.exists()
    from pytorch_generative_tpu.utils import checkpoint as ckpt_utils
    assert ckpt_utils.is_sharded_checkpoint(str(index_path))
    index = json.loads(index_path.read_text())
    sharded_entries = [e for e in index["leaves"] if e["kind"] == "sharded"]
    assert sharded_entries, "no leaf was saved sharded under FSDP"
    # Every saved array is shard-sized: for each sharded leaf, each per-device
    # piece holds at most 1/8 of the global elements (+rounding).
    import glob as _glob
    shard_files = _glob.glob(str(index_path) + ".shard*.npz")
    assert len(shard_files) >= 8
    for e in sharded_entries:
        total = int(np.prod(e["shape"]))
        assert len(e["shards"]) == 8
        for s in e["shards"]:
            piece = int(np.prod([hi - lo for lo, hi in s["index"]]))
            assert piece <= -(-total // 8)

    t2 = make("b")
    t2.restore_checkpoint()
    assert t2._step == t1._step and t2._epoch == 1
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(t1._params)),
                    jax.tree_util.tree_leaves(jax.device_get(t2._params))):
        np.testing.assert_allclose(a, b)
    # Restored state is still sharded (not gathered by the restore).
    sharded = [l for l in jax.tree_util.tree_leaves(t2._params)
               if hasattr(l, "sharding") and l.sharding.spec
               and any(e == "data" for e in l.sharding.spec)]
    assert sharded
    m1, _ = t1.train_one_step(x, None)
    m2, _ = t2.train_one_step(x, None)
    np.testing.assert_allclose(float(np.asarray(m1["loss"])),
                               float(np.asarray(m2["loss"])), rtol=1e-6)


def test_fsdp_tp_rule_on_lower_rank_leaf():
    """A TP rule whose spec is longer than a matched leaf's rank (factored
    optimizer state mirroring a conv weight path) must truncate, not crash."""
    from jax.sharding import PartitionSpec as P

    mesh = parallel.make_2d_mesh(4, 2)
    rules = ((r"mlp_conv1.*weight", P(None, None, None, "model")),)
    tree = {"mlp_conv1": {"weight": jnp.zeros((5, 3, 8))}}  # rank 3 < 4
    sharded = parallel.shard_tree_fsdp(tree, mesh, min_size=0, tp_rules=rules)
    leaf = sharded["mlp_conv1"]["weight"]
    assert leaf.shape == (5, 3, 8)
    # 'model' fell off the truncated spec; FSDP still shards a data dim.
    assert any(e == "data" for e in (leaf.sharding.spec or ()))


def test_feature_combos_smoke(tmp_path):
    """bf16 compute, grad accumulation, DP, and FSDP compose: one train step
    of each combination runs and produces finite loss."""
    import jax.numpy as jnp
    import optax

    x = np.random.default_rng(0).random((16, 4, 4, 1)).astype(np.float32)

    def loss_fn(xb, _, preds):
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    combos = [
        dict(compute_dtype=jnp.bfloat16, grad_accumulation=4),
        dict(n_devices=8, grad_accumulation=2),
        dict(n_devices=8, fsdp=True, fsdp_min_size=0,
             compute_dtype=jnp.bfloat16),
        dict(n_devices=8, compute_dtype=jnp.bfloat16, skip_nonfinite=True),
    ]
    for i, kw in enumerate(combos):
        model = models.NADE(jax.random.PRNGKey(0), input_dim=16, hidden_dim=4,
                            in_shape=(4, 4, 1))
        loader = debug.DummyLoader(shape=(4, 4, 1), batch_size=16)
        t = trainer.Trainer(
            model=model, loss_fn=loss_fn, optimizer=optax.adam(1e-3),
            train_loader=loader, eval_loader=loader,
            log_dir=str(tmp_path / f"combo{i}"), use_tensorboard=False, **kw)
        m, _ = t.train_one_step(x, None)
        assert np.isfinite(float(np.asarray(m["loss"]))), f"combo {kw}"


def test_fsdp_plus_sp_matches_single_device(pallas_interpret):
    """FSDP composed with sequence parallelism on a 2-D ('data','seq') mesh —
    a production-shaped composition (ZeRO-3 memory scaling x long-context):
    params/grads/opt-state sharded over 'data' (GSPMD all-gathers them at the
    shard_map boundary), batch sharded over 'data' AND the transformer
    middle's sequence axis sharded over 'seq' (flash-kernel ring attention).
    One train step must equal the unsharded single-device step."""
    from jax.sharding import Mesh

    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=2,
                          n_attention_heads=2, n_embedding_channels=16,
                          in_shape=(8, 8, 1))
    params, rest = core.partition(gpt)
    tx = optax.sgd(0.1)
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)), jnp.float32)

    def loss_plain(p, xb):
        m = core.combine(p, rest)
        preds = m.forward(xb)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def step_plain(p, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_plain)(p, xb)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p1, _, loss1 = jax.jit(step_plain)(params, tx.init(params), x)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2), ("data", "seq"))

    def loss_sp(p, xb):
        m = parallel.SequenceParallelImageGPT(
            core.combine(p, rest), mesh, axis_name="seq", data_axis="data")
        preds = m.forward(xb)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def step_sp(p, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_sp)(p, xb)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p_sh = parallel.shard_tree_fsdp(params, mesh, min_size=0)
    o_sh = parallel.shard_tree_fsdp(tx.init(params), mesh, min_size=0)
    fsdp_step = parallel.fsdp_jit_train_step(
        step_sp, params, tx.init(params), mesh, min_size=0, donate=False)
    p2, _, loss2 = fsdp_step(p_sh, o_sh, x)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # The composition is real: some param leaf is FSDP-sharded over 'data'.
    sharded = [l for l in jax.tree_util.tree_leaves(p2)
               if hasattr(l, "sharding") and l.sharding.spec
               and any(e == "data" for e in l.sharding.spec)]
    assert sharded, "no parameter leaf is FSDP-sharded on the 2-D mesh"


def test_replica_x_fsdp_x_sp_matches_single_device(pallas_interpret):
    """THREE-axis composition on a (2, 2, 2) ('replica', 'data', 'seq') mesh —
    hybrid sharded data parallelism (HSDP) x sequence parallelism:

      * params/grads/opt-state ZeRO-3-sharded over 'data' ONLY (replicated
        across 'replica' — the HSDP layout: all-gathers stay within the small
        'data' group instead of spanning the whole slice),
      * the batch sharded over ('replica', 'data') jointly
        (fsdp_jit_train_step's batch_spec hook),
      * the transformer middle's sequence axis sharded over 'seq'
        (flash-kernel ring attention, interpret mode on the CPU mesh).

    One train step must equal the unsharded single-device step
    (VERDICT r4 item 5)."""
    from jax.sharding import Mesh, PartitionSpec as P

    gpt = models.ImageGPT(jax.random.PRNGKey(0), in_channels=1, out_channels=1,
                          in_size=8, n_transformer_blocks=2,
                          n_attention_heads=2, n_embedding_channels=16,
                          in_shape=(8, 8, 1))
    params, rest = core.partition(gpt)
    tx = optax.sgd(0.1)
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 8, 1)), jnp.float32)

    def loss_plain(p, xb):
        m = core.combine(p, rest)
        preds = m.forward(xb)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def step_plain(p, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_plain)(p, xb)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p1, _, loss1 = jax.jit(step_plain)(params, tx.init(params), x)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("replica", "data", "seq"))

    def loss_sp(p, xb):
        m = parallel.SequenceParallelImageGPT(
            core.combine(p, rest), mesh, axis_name="seq",
            data_axis=("replica", "data"))
        preds = m.forward(xb)
        n = xb.shape[0]
        return optax.sigmoid_binary_cross_entropy(
            preds.reshape(n, -1), xb.reshape(n, -1)).sum(1).mean()

    def step_sp(p, opt_state, xb):
        loss, grads = jax.value_and_grad(loss_sp)(p, xb)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    p_sh = parallel.shard_tree_fsdp(params, mesh, min_size=0)
    o_sh = parallel.shard_tree_fsdp(tx.init(params), mesh, min_size=0)
    fsdp_step = parallel.fsdp_jit_train_step(
        step_sp, params, tx.init(params), mesh, min_size=0, donate=False,
        batch_spec=P(("replica", "data")))
    p2, _, loss2 = fsdp_step(p_sh, o_sh, x)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(p1)),
                    jax.tree_util.tree_leaves(jax.device_get(p2))):
        np.testing.assert_allclose(a, b, atol=1e-5)

    # The composition is real: some leaf is FSDP-sharded over 'data' and NO
    # leaf is sharded over 'replica' (HSDP: state replicated across replicas).
    specs = [l.sharding.spec for l in jax.tree_util.tree_leaves(p2)
             if hasattr(l, "sharding")]
    assert any(any(e == "data" for e in s) for s in specs if s), (
        "no parameter leaf is FSDP-sharded on the 3-D mesh")
    flat = [e for s in specs for e in s if e]
    assert "replica" not in flat, "HSDP must not shard state over 'replica'"
