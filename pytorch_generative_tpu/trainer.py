"""Training/evaluation runtime with the reference Trainer's exact contract.

Behavioral parity with /root/reference/pytorch_generative/trainer.py:15-287:
  * ``loss_fn(inputs, targets, predictions)`` may return a scalar loss or a
    metrics dict that must contain "loss"; every metric is logged per step,
    train/eval separately.
  * The global L2 grad norm is always computed and logged as ``grad_norm``;
    ``clip_grad_norm`` rescales, ``skip_grad_norm`` drops the whole optimizer
    step (and LR-schedule tick) when exceeded.
  * The LR schedule advances per *batch*; per-step LR is logged.
  * Eval metrics are example-weighted means over the eval set.
  * Checkpoints ``trainer_state_{epoch}.ckpt`` every ``save_checkpoint_epochs``
    with auto-resume-from-latest and metric purge after restore.
  * Every ``sample_epochs`` epochs, 16 samples are generated and logged as an
    image grid; sampling failures are swallowed.
  * Cumulative ``speed/examples_per_sec`` / ``speed/millis_per_example``
    telemetry (the BASELINE.json training metric).

TPU-native differences: the per-batch train/eval steps are jitted pure functions
over a partitioned (params, buffers, opt_state) pytree with donated arguments;
device->host metric syncs happen once per epoch, not per step; data parallelism is
a ``shard_map`` over a device mesh with ICI psum on gradients (replacing DDP/NCCL).
"""

from __future__ import annotations

import collections
import os
import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from pytorch_generative_tpu import core, parallel
from pytorch_generative_tpu.utils import checkpoint as ckpt_utils
from pytorch_generative_tpu.utils.metrics import MetricsWriter


def _get_metrics_dict(loss_or_metrics):
    metrics = loss_or_metrics
    if not isinstance(metrics, dict):
        metrics = {"loss": metrics}
    assert "loss" in metrics, 'Metrics dictionary does not contain "loss" key.'
    return metrics


# Trainer arguments the CLI can default-override (train.py): the Trainer
# signature declares them as the _UNSET sentinel, so an explicit argument at
# any call site always wins over the override — even when it equals the
# documented default — and flags like --fsdp still reach the Trainers
# constructed inside reproduce() without changing every reproduce() signature.
_UNSET = object()
_DEFAULT_OVERRIDES = {}
_OVERRIDABLE_DEFAULTS = {
    "fsdp": False,
    "grad_accumulation": 1,
    "compute_dtype": None,
    "async_checkpoint": False,
    "skip_nonfinite": False,
    "keep_checkpoints": None,
}


def set_default_overrides(**kwargs):
    """Sets Trainer-argument defaults for this process (the train.py CLI
    hook). Only arguments in ``_OVERRIDABLE_DEFAULTS`` are accepted; ``None``
    values are ignored. An explicit argument at a Trainer call site always
    wins (the signature uses an _UNSET sentinel, so explicitly passing the
    documented default is distinguishable from not passing it)."""
    for k in kwargs:
        if k not in _OVERRIDABLE_DEFAULTS:
            raise ValueError(f"{k} is not an overridable Trainer default")
    _DEFAULT_OVERRIDES.clear()
    _DEFAULT_OVERRIDES.update(
        {k: v for k, v in kwargs.items() if v is not None})


def _tree_select(keep, a, b):
    """Elementwise pytree select: a where keep else b."""
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(keep, x, y) if x is not None else None, a, b,
        is_leaf=lambda x: x is None)


class Trainer:
    """Encapsulates the train/eval loop. Stateful: calling
    ``interleaved_train_and_eval`` twice resumes where it left off."""

    def __init__(
        self,
        model,
        loss_fn,
        optimizer,
        train_loader,
        eval_loader,
        lr_schedule=None,
        clip_grad_norm=None,
        skip_grad_norm=None,
        skip_nonfinite=_UNSET,
        grad_accumulation=_UNSET,
        log_dir=None,
        sample_epochs=3,
        save_checkpoint_epochs=1,
        keep_checkpoints=_UNSET,
        async_checkpoint=_UNSET,
        n_devices=1,
        mesh_shape=None,
        tp_rules=None,
        fsdp=_UNSET,
        fsdp_min_size=None,
        seed=0,
        use_tensorboard=True,
        profile_steps=None,
        compute_dtype=_UNSET,
    ):
        """Initializes a new Trainer.

        Args:
            model: A GenerativeModel (pytree module) to train.
            loss_fn: fn(inputs, targets, predictions) -> loss or metrics dict
                containing a "loss" key (reference contract, trainer.py:41-48).
            optimizer: An optax GradientTransformation, or the (transformation,
                lr_schedule) tuple returned by pytorch_generative_tpu.optim helpers.
            train_loader / eval_loader: Iterables of (x, y) NumPy batches.
            lr_schedule: Optional fn(step) -> lr used for logging (auto-filled when
                `optimizer` is a tuple).
            clip_grad_norm: L2 norm to scale gradients to if exceeded.
            skip_grad_norm: Max L2 norm above which the whole step is skipped.
            skip_nonfinite: Skip any optimizer step whose loss or gradient
                norm is NaN/inf instead of corrupting the parameters (a
                ``nonfinite_steps`` metric counts occurrences). Off by
                default: the reference steps through non-finite gradients,
                and parity tests depend on identical trajectories.
            grad_accumulation: Split each batch into this many scanned
                microbatches and average their gradients before the single
                optimizer update — numerically identical to the full-batch
                step (mean of equal-chunk means) while only one microbatch's
                activations are live, so the effective batch can exceed HBM.
            log_dir: Checkpoints + metrics directory (temp dir if None).
            sample_epochs: Epochs between 16-image sample grids (None
                disables sampling; the reference mods by it unconditionally,
                trainer.py:284).
            save_checkpoint_epochs: Epochs between checkpoints.
            keep_checkpoints: If set, only the newest n checkpoint files are
                kept on disk (older ones are pruned after each save) — the
                reference's own TODO at trainer.py:111.
            async_checkpoint: Write checkpoints from a background thread. The
                device->host state snapshot still happens synchronously (it
                must, to capture a consistent step), but the npz
                compression/disk write — the slow part for big models —
                overlaps the next epoch's training. Writes are serialized:
                a new save (or a restore) joins the previous writer first.
            n_devices: Data-parallel device count; > 1 shards the batch over a
                ``Mesh`` and psums gradients over ICI (shard_map path).
            mesh_shape: Optional (n_data, n_model) for combined data x tensor
                parallelism over a 2-D mesh via GSPMD sharding annotations
                (overrides n_devices). Parameters are sharded per ``tp_rules``
                (parallel/tp.py; default: Megatron MLP rules), the batch over
                'data', and XLA inserts all collectives.
            tp_rules: (path regex, PartitionSpec) rules for mesh_shape mode.
            fsdp: Shard parameters, gradients, and optimizer state over the
                'data' axis (ZeRO-3, parallel/fsdp.py) instead of replicating
                them — per-device state memory shrinks ~linearly with the
                mesh. With ``n_devices`` > 1 this uses a 1-D GSPMD mesh; with
                ``mesh_shape`` it composes with tensor parallelism (2-D
                'data' x 'model' sharded weights).
            fsdp_min_size: Minimum element count for a leaf to be FSDP-sharded
                (smaller leaves stay replicated; default
                parallel.fsdp.DEFAULT_MIN_SIZE).
            seed: Root RNG seed for model forward randomness & sampling.
            use_tensorboard: Also log to TensorBoard when available.
            profile_steps: Optional (start, stop) global-step pair; a
                jax.profiler trace of those steps is written to
                ``<log_dir>/profile`` (a superset of the reference's
                throughput-scalar observability, SURVEY.md section 5).
            compute_dtype: Optional dtype (e.g. jnp.bfloat16) for
                mixed-precision training: master weights, optimizer state, and
                the loss stay float32; parameters and inputs are cast for the
                forward/backward compute (MXU-native bf16).
        """
        # CLI default-overrides (set_default_overrides): applied only where
        # the call site did not pass the argument at all (_UNSET sentinel), so
        # explicit arguments — including explicitly-passed defaults — win.
        def _resolve(name, value):
            if value is not _UNSET:
                return value
            return _DEFAULT_OVERRIDES.get(name, _OVERRIDABLE_DEFAULTS[name])

        fsdp = _resolve("fsdp", fsdp)
        grad_accumulation = _resolve("grad_accumulation", grad_accumulation)
        compute_dtype = _resolve("compute_dtype", compute_dtype)
        async_checkpoint = _resolve("async_checkpoint", async_checkpoint)
        skip_nonfinite = _resolve("skip_nonfinite", skip_nonfinite)
        keep_checkpoints = _resolve("keep_checkpoints", keep_checkpoints)
        if isinstance(compute_dtype, str):  # CLI passes a dtype name
            compute_dtype = jnp.dtype(compute_dtype)

        if (isinstance(optimizer, tuple)
                and not isinstance(optimizer, optax.GradientTransformation)):
            optimizer, lr_schedule = optimizer
        self.loss_fn = loss_fn
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.lr_schedule = lr_schedule
        self.clip_grad_norm = clip_grad_norm
        self.skip_grad_norm = skip_grad_norm
        self.skip_nonfinite = bool(skip_nonfinite)
        self.grad_accumulation = max(int(grad_accumulation or 1), 1)
        self.log_dir = log_dir or tempfile.mkdtemp()
        self.sample_epochs = sample_epochs
        self.save_checkpoint_epochs = save_checkpoint_epochs
        self.keep_checkpoints = keep_checkpoints
        self.async_checkpoint = bool(async_checkpoint)
        self._ckpt_thread = None
        self._warned_ragged_accum = False
        self.compute_dtype = compute_dtype
        self.n_devices = max(int(n_devices or 1), 1)

        self._mesh = None
        self._mesh2d = None
        self._fsdp = bool(fsdp)
        from pytorch_generative_tpu.parallel.fsdp import DEFAULT_MIN_SIZE
        self._fsdp_min_size = (DEFAULT_MIN_SIZE if fsdp_min_size is None
                               else fsdp_min_size)
        self._tp_rules = ()
        if mesh_shape is not None:
            n_data, n_model = mesh_shape
            self._mesh2d = parallel.make_2d_mesh(n_data, n_model)
            self._tp_rules = tp_rules or parallel.IMAGE_GPT_TP_RULES
            self.n_devices = n_data  # batch divisibility requirement
        elif self._fsdp and self.n_devices > 1:
            # FSDP without TP: a 1-D 'data' GSPMD mesh (no shard_map — jit
            # with sharded state has global semantics, so VQ-EMA statistics
            # are globally correct without explicit psum).
            self._mesh2d = parallel.make_mesh(self.n_devices)
        elif self._fsdp:
            import warnings

            warnings.warn(
                "Trainer(fsdp=True) has no effect on a single device "
                "(n_devices == 1 and no mesh_shape): state stays replicated. "
                "Pass n_devices > 1 (or mesh_shape) to actually shard.",
                stacklevel=2)
        elif self.n_devices > 1:
            self._mesh = parallel.make_mesh(self.n_devices)
            model = parallel.set_vq_axis_name(model, parallel.DATA_AXIS)

        self._tx = optimizer
        self._params, self._rest = core.partition(model)
        # Decouple from the caller's arrays: the jitted step donates its
        # operands, which would otherwise invalidate the model the user still
        # holds after the first optimizer step.
        copy = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.array(x) if hasattr(x, "shape") else x, t,
            is_leaf=lambda v: v is None)
        self._params, self._rest = copy(self._params), copy(self._rest)
        if self._mesh2d is not None:
            self._params = self._shard_state(self._params)
            self._rest = self._shard_state(self._rest)
        self._opt_state = self._tx.init(self._params)
        if self._mesh2d is not None and self._fsdp:
            self._opt_state = self._shard_state(self._opt_state)
        if self._mesh is not None:
            self._params = parallel.replicate(self._params, self._mesh)
            self._rest = parallel.replicate(self._rest, self._mesh)
            self._opt_state = parallel.replicate(self._opt_state, self._mesh)

        self._rng = jax.random.PRNGKey(seed)
        self._step = 0
        self._applied_steps = 0  # optimizer steps actually taken (not skipped)
        self._epoch = 0
        self._examples_processed = 0
        self._time_taken = 0.0

        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._eval_step_replicated = self._build_eval_step_replicated()
        self._sample_batch = None  # built lazily (models may not sample)

        os.makedirs(self.log_dir, exist_ok=True)
        self._writer = MetricsWriter(self.log_dir, use_tensorboard=use_tensorboard)
        self._use_tensorboard = use_tensorboard
        self.profile_steps = profile_steps
        self._profiling = False

    # ------------------------------------------------------------------
    # Step builders
    # ------------------------------------------------------------------
    def _shard_state(self, tree):
        """Places a state pytree on the GSPMD mesh: FSDP shardings when
        ``fsdp`` is enabled (optionally composed with the TP rules),
        TP-rule/replicated placement otherwise."""
        if self._fsdp:
            return parallel.shard_tree_fsdp(tree, self._mesh2d,
                                            min_size=self._fsdp_min_size,
                                            tp_rules=self._tp_rules)
        return parallel.shard_tree(tree, self._mesh2d, self._tp_rules)

    def _cast_for_compute(self, tree):
        if self.compute_dtype is None:
            return tree
        dtype = self.compute_dtype

        def cast(x):
            if x is not None and hasattr(x, "dtype") and \
                    jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x

        return jax.tree_util.tree_map(cast, tree,
                                      is_leaf=lambda v: v is None)

    def compute_metrics(self, model, x, y, rng, training):
        """Computes one batch's metrics; returns (metrics_dict, new_model).

        The overridable seam for custom training/eval computation — the
        jit-traceable analogue of the reference Trainer's train_one_batch /
        eval_one_batch hooks (trainer.py:165-171, 195-201). Must be a pure
        function of its inputs.
        """
        if self.compute_dtype is not None:
            # Cast params and constant buffers for MXU-native compute; stateful
            # buffers (VQ-EMA statistics, core.state_field) stay f32 so their
            # long-horizon accumulation never sees 16-bit rounding.
            model = core.cast_floating(model, self.compute_dtype)
            x = self._cast_for_compute(x)
        preds, new_model = model.forward_with_state(x, rng=rng,
                                                    training=training)
        if self.compute_dtype is not None:
            to_f32 = lambda p: (p.astype(jnp.float32)
                                if hasattr(p, "dtype")
                                and jnp.issubdtype(p.dtype, jnp.floating)
                                else p)
            preds = jax.tree_util.tree_map(to_f32, preds)
            x = x.astype(jnp.float32)
            # Restore master precision on returned state (exact for binary
            # masks; a no-op for the state_field buffers, which stayed f32).
            new_model = jax.tree_util.tree_map(to_f32, new_model,
                                               is_leaf=lambda v: v is None)
        metrics = dict(_get_metrics_dict(self.loss_fn(x, y, preds)))
        return metrics, new_model

    def _build_train_step(self):
        tx = self._tx
        clip = self.clip_grad_norm
        skip = self.skip_grad_norm
        guard = self.skip_nonfinite
        accum = self.grad_accumulation
        axis = parallel.DATA_AXIS if self._mesh is not None else None

        def grad_and_metrics(params, rest, x, y, rng):
            """(mean grads, mean metrics, final model state) for the batch,
            computed whole or as ``accum`` scanned microbatches (identical
            math — mean of equal-chunk means — with only one microbatch's
            activations live at a time)."""

            def single(rest_c, xb, yb, r):
                def compute_loss(p):
                    model = core.combine(p, rest_c)
                    metrics, new_model = self.compute_metrics(
                        model, xb, yb, r, training=True)
                    return metrics["loss"], (metrics, new_model)

                grads, (metrics, new_model) = jax.grad(
                    compute_loss, has_aux=True)(params)
                _, new_rest = core.partition(new_model)
                return grads, metrics, new_rest

            # Ragged batches (loader remainder smaller than, or not divisible
            # by, accum) are computed whole: a new shape triggers a fresh jit
            # trace anyway, and silently truncating samples (or scanning zero-
            # row microbatches, whose mean is NaN) would break the exactness
            # contract below. The whole-batch step holds every activation live
            # at once, so if accumulation was sized to fit HBM, the remainder
            # step can OOM — warn (once; this branch runs at trace time).
            if accum <= 1 or x.shape[0] < accum or x.shape[0] % accum:
                if accum > 1 and not self._warned_ragged_accum:
                    self._warned_ragged_accum = True
                    import warnings

                    warnings.warn(
                        f"grad_accumulation={accum}: batch of "
                        f"{x.shape[0]} is not divisible by it; computing this "
                        "batch in ONE backward (all activations live — may "
                        "need more memory than the accumulated steps). Size "
                        "the loader so every batch divides grad_accumulation "
                        "to avoid this.", stacklevel=2)
                return single(rest, x, y, rng)

            mb = x.shape[0] // accum
            xs = x[: mb * accum].reshape(accum, mb, *x.shape[1:])
            ys = (None if y is None
                  else y[: mb * accum].reshape(accum, mb, *y.shape[1:]))
            rngs = jax.random.split(rng, accum)

            def body(rest_c, inp):
                grads, metrics, new_rest = single(
                    rest_c, inp["x"], inp.get("y"), inp["rng"])
                return new_rest, (grads, metrics)

            inp = {"x": xs, "rng": rngs}
            if ys is not None:
                inp["y"] = ys
            rest_out, (grads, metrics) = jax.lax.scan(body, rest, inp)
            grads = jax.tree_util.tree_map(lambda g: g.mean(0), grads)
            metrics = {k: v.mean(0) for k, v in metrics.items()}
            return grads, metrics, rest_out

        def step(params, rest, opt_state, x, y, rng):
            if axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

            grads, metrics, new_rest = grad_and_metrics(
                params, rest, x, y, rng)
            if axis is not None:
                grads = parallel.pmean_tree(grads, axis)
                metrics = {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
            norm = optax.global_norm(grads)
            metrics["grad_norm"] = norm
            if clip is not None:
                scale = jnp.minimum(1.0, clip / (norm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            keep = None
            if skip is not None:
                keep = norm <= skip
            if guard:
                finite = jnp.isfinite(norm) & jnp.isfinite(metrics["loss"])
                metrics["nonfinite_steps"] = 1.0 - finite.astype(jnp.float32)
                keep = finite if keep is None else (keep & finite)
                # Also revert stateful buffers (VQ-EMA statistics): NaNs that
                # reach them would poison every later forward even with the
                # params guarded. (skip_grad_norm alone intentionally commits
                # them — the reference's in-place buffer updates survive its
                # skipped steps.)
                new_rest = _tree_select(finite, new_rest, rest)
            if keep is not None:
                new_params = _tree_select(keep, new_params, params)
                new_opt_state = _tree_select(keep, new_opt_state, opt_state)
            return new_params, new_rest, new_opt_state, metrics

        if self._mesh is not None:
            step = jax.shard_map(
                step, mesh=self._mesh,
                in_specs=(P(), P(), P(), P(parallel.DATA_AXIS),
                          P(parallel.DATA_AXIS), P()),
                out_specs=(P(), P(), P(), P()),
                check_vma=False)
        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_eval_step(self):
        axis = parallel.DATA_AXIS if self._mesh is not None else None

        def step(params, rest, x, y, rng):
            if axis is not None:
                rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
            model = core.combine(params, rest)
            metrics, _ = self.compute_metrics(model, x, y, rng, training=False)
            if axis is not None:
                # Equal-size shards (the batch remainder is trimmed), so the
                # pmean of per-shard means is the global batch mean.
                metrics = {k: jax.lax.pmean(v, axis) for k, v in metrics.items()}
            return metrics

        if self._mesh is not None:
            # Evaluation scales over the mesh like training: batch sharded on
            # 'data', metrics pmean'd over ICI (the reference evaluates
            # replicated, trainer.py:268-278).
            step = jax.shard_map(
                step, mesh=self._mesh,
                in_specs=(P(), P(), P(parallel.DATA_AXIS),
                          P(parallel.DATA_AXIS), P()),
                out_specs=P(),
                check_vma=False)
        return jax.jit(step)

    def _build_eval_step_replicated(self):
        """Plain-jit eval step for the (< n_devices) batch remainder the
        sharded step can't cover — eval must count every example."""

        def step(params, rest, x, y, rng):
            model = core.combine(params, rest)
            metrics, _ = self.compute_metrics(model, x, y, rng, training=False)
            return metrics

        return jax.jit(step)

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------
    @property
    def model(self):
        return core.combine(self._params, self._rest)

    def _path(self, file_name):
        return os.path.join(self.log_dir, file_name)

    def _checkpoint_tree(self):
        return {"params": self._params, "rest": self._rest,
                "opt_state": self._opt_state, "rng": self._rng}

    def _save_checkpoint(self):
        if self._epoch % self.save_checkpoint_epochs != 0:
            return
        metadata = {
            "step": self._step,
            "applied_steps": self._applied_steps,
            "epoch": self._epoch,
            "examples_processed": self._examples_processed,
            "time_taken": self._time_taken,
        }
        path = self._path(f"trainer_state_{self._epoch}.ckpt")
        if self._fsdp and self._mesh2d is not None:
            # ZeRO-3: copy shard-by-shard and write one npz per device —
            # never reassemble the full state on the host (trainer state under
            # FSDP can exceed any single host allocation at scale).
            payload = ckpt_utils.snapshot_sharded(self._checkpoint_tree())
            write_fn = lambda: ckpt_utils.write_sharded(path, payload,
                                                        metadata)
        else:
            host_tree = jax.device_get(self._checkpoint_tree())
            write_fn = lambda: ckpt_utils.save_checkpoint(path, host_tree,
                                                          metadata)
        if self.async_checkpoint:
            import threading

            self.join_pending_checkpoint()

            def write():
                write_fn()
                self._prune_checkpoints()

            self._ckpt_thread = threading.Thread(target=write, daemon=True)
            self._ckpt_thread.start()
        else:
            write_fn()
            self._prune_checkpoints()

    def join_pending_checkpoint(self):
        """Blocks until any in-flight async checkpoint write has finished."""
        if self._ckpt_thread is not None:
            self._ckpt_thread.join()
            self._ckpt_thread = None

    def _prune_checkpoints(self):
        """Keeps only the newest ``keep_checkpoints`` checkpoint files
        (the reference's TODO at trainer.py:111)."""
        if self.keep_checkpoints is None:
            return
        import glob
        import re

        files = glob.glob(self._path("trainer_state_*.ckpt"))
        by_epoch = sorted(
            (int(re.findall(r"\d+", os.path.basename(f))[0]), f)
            for f in files)
        for _, path in by_epoch[: max(0, len(by_epoch) - self.keep_checkpoints)]:
            os.remove(path)
            for shard in glob.glob(path + ".shard*.npz"):
                os.remove(shard)

    def restore_checkpoint(self, epoch=None):
        """Restores Trainer state from self.log_dir (latest epoch by default)."""
        self.join_pending_checkpoint()
        epoch = epoch or ckpt_utils.find_latest_epoch(self.log_dir)
        name = f"trainer_state_{epoch}.ckpt"
        print(f"Restoring trainer state from checkpoint {name}.")
        if ckpt_utils.is_sharded_checkpoint(self._path(name)):
            # ZeRO-3 checkpoint: each shard goes straight back to its device;
            # the live (already-sharded) state supplies the target placement.
            tree, metadata = ckpt_utils.restore_checkpoint_sharded(
                self._path(name), self._checkpoint_tree())
            self._params, self._rest = tree["params"], tree["rest"]
            self._opt_state, self._rng = tree["opt_state"], tree["rng"]
        else:
            tree, metadata = ckpt_utils.restore_checkpoint(
                self._path(name), self._checkpoint_tree())
            self._params, self._rest = tree["params"], tree["rest"]
            self._opt_state, self._rng = tree["opt_state"], tree["rng"]
            if self._mesh is not None:
                self._params = parallel.replicate(self._params, self._mesh)
                self._rest = parallel.replicate(self._rest, self._mesh)
                self._opt_state = parallel.replicate(self._opt_state,
                                                     self._mesh)
            elif self._mesh2d is not None:
                self._params = self._shard_state(self._params)
                self._rest = self._shard_state(self._rest)
                if self._fsdp:
                    self._opt_state = self._shard_state(self._opt_state)
        self._step = metadata["step"]
        self._applied_steps = metadata.get("applied_steps", metadata["step"])
        self._epoch = metadata["epoch"]
        self._examples_processed = metadata["examples_processed"]
        self._time_taken = metadata["time_taken"]
        # Purge any metrics logged after the restored step (trainer.py:143-148).
        self._writer.close()
        self._writer = MetricsWriter(self.log_dir, purge_step=self._step,
                                     use_tensorboard=self._use_tensorboard)

    # ------------------------------------------------------------------
    # Train / eval / sample
    # ------------------------------------------------------------------
    def _prepare_batch(self, x, y):
        x = np.asarray(x, np.float32)
        y = None if y is None else np.asarray(y)
        if self._mesh is not None or self._mesh2d is not None:
            rem = x.shape[0] % self.n_devices
            if rem:
                x = x[: x.shape[0] - rem]
                y = None if y is None else y[: y.shape[0] - rem]
            if self._mesh2d is not None:
                x = parallel.shard_batch_2d(x, self._mesh2d)
                if y is not None:
                    y = parallel.shard_batch_2d(y, self._mesh2d)
            else:
                x = parallel.shard_batch(x, self._mesh)
                if y is not None:
                    y = parallel.shard_batch(y, self._mesh)
        return x, y

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def train_one_step(self, x, y):
        """Runs one jitted optimizer step; returns on-device metrics."""
        x, y = self._prepare_batch(x, y)
        self._params, self._rest, self._opt_state, metrics = self._train_step(
            self._params, self._rest, self._opt_state, x, y, self._next_rng())
        return metrics, x.shape[0]

    def sample_one_batch(self):
        """Generates 16 samples and logs them; failures are swallowed
        (trainer.py:212-220)."""
        try:
            if self._sample_batch is None:
                def _sample(params, rest, rng):
                    return core.combine(params, rest).sample(rng, 16)
                self._sample_batch = jax.jit(_sample)
            tensor = self._sample_batch(self._params, self._rest, self._next_rng())
            self._writer.add_images("sample", np.clip(jax.device_get(tensor), 0, 1),
                                    self._step)
        except Exception as e:  # noqa: BLE001
            print(f"Failed to sample from the model: {e}")

    def interleaved_train_and_eval(self, max_epochs, restore=True):
        """Trains, evaluating after each epoch. Auto-resumes when restore=True."""
        try:
            self._interleaved_train_and_eval(max_epochs, restore)
        finally:
            # Even when training raises mid-epoch, the in-flight async
            # checkpoint write must land: the writer is a daemon thread and
            # would be silently discarded at process exit.
            self.join_pending_checkpoint()

    def _interleaved_train_and_eval(self, max_epochs, restore):
        if restore:
            try:
                self.restore_checkpoint()
            except FileNotFoundError:
                print(f"No checkpoint found in {self.log_dir}. "
                      "Training from scratch.")

        for _ in range(max_epochs - self._epoch):
            # --- Train (device-synced once per epoch) ---
            start_time = time.time()
            pending = []  # (step, n_examples, on-device metrics)
            last_metrics = None
            for x, y in self.train_loader:
                self._maybe_profile()
                metrics, n = self.train_one_step(x, y)
                pending.append((self._step, n, metrics))
                self._step += 1
                last_metrics = metrics
            if last_metrics is not None:
                # Fence with a real host fetch: through remote-device tunnels
                # block_until_ready can return before execution completes.
                jax.device_get(last_metrics)
            epoch_time = time.time() - start_time

            # Attribute epoch wall time uniformly across steps for the cumulative
            # speed telemetry (values converge to the reference's per-batch
            # accounting while keeping the device pipeline free of host syncs).
            per_step_time = epoch_time / max(len(pending), 1)
            for step, n, metrics in pending:
                metrics = jax.device_get(metrics)
                if self.lr_schedule is not None:
                    # The LR actually applied at this step: the schedule inside
                    # opt_state only advances when the update is not skipped,
                    # so index by applied steps, not the raw batch counter
                    # (matches the reference's actual param_group lr).
                    lr = float(self.lr_schedule(self._applied_steps))
                    self._writer.add_scalars("metrics/lr", {"group_0": lr}, step)
                applied = True
                if self.skip_grad_norm is not None and "grad_norm" in metrics:
                    applied = float(metrics["grad_norm"]) <= self.skip_grad_norm
                if applied and float(metrics.get("nonfinite_steps", 0.0)):
                    applied = False  # skip_nonfinite reverted this update too
                if applied:
                    self._applied_steps += 1
                self._log_metrics(metrics, training=True, step=step)
                self._examples_processed += n
                self._time_taken += per_step_time
                self._writer.add_scalar(
                    "speed/examples_per_sec",
                    self._examples_processed / max(self._time_taken, 1e-12), step)
                self._writer.add_scalar(
                    "speed/millis_per_example",
                    self._time_taken / max(self._examples_processed, 1) * 1000, step)
                self._writer.add_scalar("speed/epoch", self._epoch, step)
                self._writer.add_scalar("speed/step", step, step)

            # --- Evaluate (example-weighted means, trainer.py:268-278) ---
            n_examples, sum_metrics = 0, collections.defaultdict(float)
            for x, y in self.eval_loader:
                x_full = np.asarray(x, np.float32)
                y_full = None if y is None else np.asarray(y)
                x, y_arr = self._prepare_batch(x_full, y_full)
                n_batch = x.shape[0]
                if n_batch:
                    metrics = jax.device_get(self._eval_step(
                        self._params, self._rest, jnp.asarray(x), y_arr,
                        self._next_rng()))
                    n_examples += n_batch
                    for key, metric in metrics.items():
                        sum_metrics[key] += float(metric) * n_batch
                # Examples the sharded step can't cover (batch % n_devices)
                # still count — the reference evaluates every example
                # (trainer.py:269-277) — via the replicated fallback step.
                rem = x_full.shape[0] - n_batch
                if rem:
                    metrics = jax.device_get(self._eval_step_replicated(
                        self._params, self._rest,
                        jnp.asarray(x_full[n_batch:]),
                        None if y_full is None else y_full[n_batch:],
                        self._next_rng()))
                    n_examples += rem
                    for key, metric in metrics.items():
                        sum_metrics[key] += float(metric) * rem
            if n_examples:
                eval_metrics = {k: v / n_examples for k, v in sum_metrics.items()}
                self._log_metrics(eval_metrics, training=False, step=self._step)

            self._epoch += 1
            self._save_checkpoint()
            if self.sample_epochs and self._epoch % self.sample_epochs == 0:
                self.sample_one_batch()
        # The last epoch's async write must land before we return: the writer
        # is a daemon thread, and losing it at interpreter exit would silently
        # drop the newest checkpoint.
        self.join_pending_checkpoint()

        self._writer.flush()

    def _maybe_profile(self):
        """Starts/stops a jax.profiler trace at the configured global steps."""
        if self.profile_steps is None:
            return
        start, stop = self.profile_steps
        if not self._profiling and self._step == start:
            jax.profiler.start_trace(self._path("profile"))
            self._profiling = True
        elif self._profiling and self._step >= stop:
            jax.profiler.stop_trace()
            self._profiling = False

    def _log_metrics(self, metrics, training, step):
        for key, metric in metrics.items():
            self._writer.add_scalars(
                f"metrics/{key}",
                {"train" if training else "eval": float(np.asarray(metric))}, step)
