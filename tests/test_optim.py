"""AdaBelief correctness (the reference's version crashes on step one,
/root/reference/pytorch_generative/optim.py:45) and optimizer helpers."""

import jax.numpy as jnp
import numpy as np
import optax

from pytorch_generative_tpu import optim


def test_adabelief_first_step_matches_manual():
    tx = optim.adabelief(learning_rate=0.1, b1=0.9, b2=0.999)
    params = {"w": jnp.asarray([1.0, -2.0])}
    grads = {"w": jnp.asarray([0.5, -0.25])}
    state = tx.init(params)
    updates, state = tx.update(grads, state, params)
    new = optax.apply_updates(params, updates)

    g = np.asarray([0.5, -0.25])
    ema_avg = 0.1 * g
    ema_var = 0.001 * (g - ema_avg) ** 2 + 1e-10
    avg_hat = ema_avg / (1 - 0.9)
    var_hat = ema_var / (1 - 0.999)
    expected = np.asarray([1.0, -2.0]) - 0.1 * avg_hat / (np.sqrt(var_hat) + 1e-10)
    np.testing.assert_allclose(np.asarray(new["w"]), expected, rtol=1e-5)


def test_adabelief_converges_on_quadratic():
    tx = optim.adabelief(learning_rate=0.1)
    params = jnp.asarray(5.0)
    state = tx.init(params)
    for _ in range(200):
        grads = 2 * params  # d/dx x^2
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert abs(float(params)) < 0.1


def test_adam_multiplicative_schedule():
    tx, schedule = optim.adam_multiplicative(1e-3, 0.9)
    np.testing.assert_allclose(float(schedule(0)), 1e-3)
    np.testing.assert_allclose(float(schedule(10)), 1e-3 * 0.9**10, rtol=1e-5)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(3)}, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_adam_multiplicative_identity_factor():
    tx, schedule = optim.adam_multiplicative(1e-3, 1.0)
    assert float(schedule(100)) == 1e-3
