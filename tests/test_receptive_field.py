"""Automated causality tests via the gradient receptive-field probe.

The reference only used debug.compute_receptive_field manually in notebooks;
here causality is a hard test: the output at pixel (r, c) must have zero
gradient w.r.t. any input pixel at or after (r, c) in raster order (strictly
after for type-B models, at-or-after for type-A / mask_center models).
"""

import jax
import numpy as np
import pytest

from pytorch_generative_tpu import debug, models

KEY = jax.random.PRNGKey(3)
SHAPE = (8, 8, 1)


def _check_causal(model, mask_center: bool, position=(4, 4)):
    rf = np.asarray(debug.compute_receptive_field(model, SHAPE, position))
    r, c = position
    # Pixels strictly after (r, c) in raster order must never be in the RF.
    assert rf[r, c + 1:].sum() == 0, "RF leaks to the right of the target"
    assert rf[r + 1:, :].sum() == 0, "RF leaks below the target"
    if mask_center:
        assert rf[r, c] == 0, "mask_center model attends to its own pixel"


def _models():
    return [
        ("pixel_cnn", models.PixelCNN(
            KEY, in_channels=1, out_channels=1, n_residual=2,
            residual_channels=4, head_channels=4, in_shape=SHAPE), True),
        ("gated_pixel_cnn", models.GatedPixelCNN(
            KEY, in_channels=1, out_channels=1, n_gated=2, gated_channels=4,
            head_channels=4, in_shape=SHAPE), True),
        ("image_gpt", models.ImageGPT(
            KEY, in_channels=1, out_channels=1, in_size=8,
            n_transformer_blocks=1, n_attention_heads=2,
            n_embedding_channels=4, in_shape=SHAPE), True),
        ("pixel_snail", models.PixelSNAIL(
            KEY, in_channels=1, out_channels=1, n_channels=4,
            n_pixel_snail_blocks=1, n_residual_blocks=1,
            attention_key_channels=2, attention_value_channels=2,
            in_shape=SHAPE), True),
        ("fvbn", models.FullyVisibleBeliefNetwork(KEY, n_dims=64,
                                                  in_shape=SHAPE), True),
    ]


@pytest.mark.parametrize("name,model,mask_center", _models(),
                         ids=[n for n, _, _ in _models()])
def test_model_is_causal(name, model, mask_center):
    _check_causal(model, mask_center)
    # Also probe an off-center position to catch pad/crop asymmetry bugs.
    _check_causal(model, mask_center, position=(2, 5))


def test_nade_is_causal():
    model = models.NADE(KEY, input_dim=64, hidden_dim=8, in_shape=SHAPE)
    rf = np.asarray(debug.compute_receptive_field(model, SHAPE, (4, 4)))
    flat = rf.reshape(-1)
    target = 4 * 8 + 4
    assert flat[target:].sum() == 0  # output i depends only on inputs < i


def test_made_is_causal():
    model = models.MADE(KEY, input_dim=64, hidden_dims=[32], in_shape=SHAPE)
    ordering = np.asarray(model.orderings[0])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64))

    # For every output dim i, grads w.r.t. inputs with ordering >= ordering[i]
    # must vanish (made.py's autoregressive property over its sampled ordering).
    jac = jax.jacobian(lambda v: model._forward(v[None, :], 0)[0])(x[0])
    jac = np.asarray(jac)
    for i in range(64):
        forbidden = ordering >= ordering[i]
        assert np.abs(jac[i][forbidden]).max() == 0


def test_causal_conv_mask_types():
    from pytorch_generative_tpu.ops.masks import causal_conv_mask

    mask_b = np.asarray(causal_conv_mask((3, 3), False))[:, :, 0, 0]
    np.testing.assert_array_equal(mask_b, [[1, 1, 1], [1, 1, 0], [0, 0, 0]])
    mask_a = np.asarray(causal_conv_mask((3, 3), True))[:, :, 0, 0]
    np.testing.assert_array_equal(mask_a, [[1, 1, 1], [1, 0, 0], [0, 0, 0]])
