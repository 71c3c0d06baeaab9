"""Numerical parity vs the PyTorch reference: identical weights, identical
inputs, identical outputs (atol ~1e-4 on CPU f32).

This is the strongest available stand-in for the nats-table parity targets in
BASELINE.md on a box with no dataset access: if forward passes (and hence
losses/gradients through XLA autodiff) agree to float tolerance, training
dynamics match up to optimizer numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests import _reference_compat as compat

from pytorch_generative_tpu import models, nn

ref = compat.load_reference()

KEY = jax.random.PRNGKey(42)
RNG = np.random.default_rng(0)


def _img(n=2, h=8, w=8, c=3):
    return RNG.random((n, h, w, c)).astype(np.float32)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mask_center", [False, True])
def test_causal_conv2d_parity(mask_center):
    ours = nn.CausalConv2d(KEY, mask_center, 3, 5, 3, padding=1)
    theirs = ref.nn.CausalConv2d(mask_center, in_channels=3, out_channels=5,
                                 kernel_size=3, padding=1)
    compat.copy_conv(ours, theirs)
    x = _img()
    got = np.asarray(ours(jnp.asarray(x)))
    want = compat.from_torch_nchw(theirs(compat.to_torch_nchw(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("mask_center,extra", [(False, 0), (True, 2)])
def test_causal_attention_parity(mask_center, extra):
    ours = nn.CausalAttention(KEY, in_channels=6, n_heads=2, embed_channels=4,
                              out_channels=6, mask_center=mask_center,
                              extra_input_channels=extra, use_flash=False)
    theirs = ref.nn.CausalAttention(
        in_channels=6, n_heads=2, embed_channels=4, out_channels=6,
        mask_center=mask_center, extra_input_channels=extra)
    compat.copy_conv(ours.q_proj, theirs._q)
    compat.copy_conv(ours.kv_proj, theirs._kv)
    compat.copy_conv(ours.out_proj, theirs._proj)
    x = _img(c=6)
    extra_x = _img(c=extra) if extra else None
    got = np.asarray(ours(jnp.asarray(x),
                          None if extra_x is None else jnp.asarray(extra_x)))
    want = compat.from_torch_nchw(theirs(
        compat.to_torch_nchw(x),
        None if extra_x is None else compat.to_torch_nchw(extra_x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vector_quantizer_parity():
    ours = nn.VectorQuantizer(KEY, n_embeddings=8, embedding_dim=4)
    theirs = ref.nn.VectorQuantizer(n_embeddings=8, embedding_dim=4)
    theirs._embedding.data = torch.tensor(np.asarray(ours.ema_embedding))
    theirs._embedding_avg.data = torch.tensor(
        np.asarray(ours.ema_embedding_avg))
    x = _img(c=4)
    quantized, loss, _ = ours(jnp.asarray(x))
    theirs.eval()  # no EMA update
    with torch.no_grad():
        q_ref, loss_ref = theirs(compat.to_torch_nchw(x))
    np.testing.assert_allclose(np.asarray(quantized),
                               compat.from_torch_nchw(q_ref), atol=1e-5)
    np.testing.assert_allclose(float(loss), float(loss_ref), atol=1e-5)


# ---------------------------------------------------------------------------
# Autoregressive models
# ---------------------------------------------------------------------------

def copy_nade(ours, theirs):
    theirs._in_W.data = torch.tensor(np.asarray(ours.in_W))
    theirs._in_b.data = torch.tensor(np.asarray(ours.in_b))
    theirs._h_W.data = torch.tensor(np.asarray(ours.h_W))
    theirs._h_b.data = torch.tensor(np.asarray(ours.h_b))


def test_nade_parity():
    ours = models.NADE(KEY, input_dim=64, hidden_dim=16, in_shape=(8, 8, 1))
    theirs = ref.models.NADE(input_dim=64, hidden_dim=16)
    copy_nade(ours, theirs)
    x = (RNG.random((2, 64)) < 0.5).astype(np.float32)
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        want = theirs(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fvbn_parity():
    ours = models.FullyVisibleBeliefNetwork(KEY, n_dims=16, in_shape=(4, 4, 1))
    theirs = ref.models.FullyVisibleBeliefNetwork(n_dims=16)
    w = np.asarray(ours.weight)
    b = np.asarray(ours.bias)
    for i, lin in enumerate(theirs._net):
        if i == 0:
            lin.weight.data = torch.zeros(1, 1)  # fed zeros in the reference
        else:
            lin.weight.data = torch.tensor(w[:i, i][None, :])
        lin.bias.data = torch.tensor(b[i: i + 1])
    x = (RNG.random((2, 16)) < 0.5).astype(np.float32)
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        want = theirs(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def copy_made(ours, theirs):
    ref_layers = [m for m in theirs._net.modules()
                  if isinstance(m, ref.models.autoregressive.made.MaskedLinear)]
    for our_layer, ref_layer in zip(ours.layers, ref_layers):
        compat.copy_linear(our_layer, ref_layer)


def test_made_parity():
    ours = models.MADE(KEY, input_dim=16, hidden_dims=[12], n_masks=1,
                       in_shape=(4, 4, 1))
    theirs = ref.models.MADE(input_dim=16, hidden_dims=[12], n_masks=1)
    copy_made(ours, theirs)
    # Same mask recipe: ours precomputes with seed 0; the reference samples
    # masks inside forward from the same seeded RNG.
    x = (RNG.random((2, 16)) < 0.5).astype(np.float32)
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        want = theirs(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def copy_pixel_cnn(ours, theirs):
    compat.copy_conv(ours.input_conv, theirs._input)
    for our_block, ref_block in zip(ours.causal_layers, theirs._causal_layers):
        compat.copy_conv(our_block.conv1, ref_block._net[1])
        compat.copy_conv(our_block.conv2, ref_block._net[3])
        compat.copy_conv(our_block.conv3, ref_block._net[5])
    compat.copy_conv(ours.head_conv1, theirs._head[1])
    compat.copy_conv(ours.head_conv2, theirs._head[3])


def test_pixel_cnn_parity():
    ours = models.PixelCNN(KEY, in_channels=3, out_channels=3, n_residual=2,
                           residual_channels=4, head_channels=4,
                           in_shape=(8, 8, 3))
    theirs = ref.models.PixelCNN(in_channels=3, out_channels=3, n_residual=2,
                                 residual_channels=4, head_channels=4)
    copy_pixel_cnn(ours, theirs)
    x = _img()
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        want = compat.from_torch_nchw(theirs(compat.to_torch_nchw(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def copy_gated_pixel_cnn(ours, theirs):
    def copy_layer(our_layer, ref_layer):
        compat.copy_conv(our_layer.vstack_1xN, ref_layer._vstack_1xN)
        compat.copy_conv(our_layer.vstack_Nx1, ref_layer._vstack_Nx1)
        compat.copy_conv(our_layer.vstack_1x1, ref_layer._vstack_1x1)
        compat.copy_conv(our_layer.link, ref_layer._link)
        compat.copy_conv(our_layer.hstack_1xN, ref_layer._hstack_1xN)
        compat.copy_conv(our_layer.hstack_residual, ref_layer._hstack_residual)
        compat.copy_conv(our_layer.hstack_skip, ref_layer._hstack_skip)

    copy_layer(ours.input_layer, theirs._input)
    for our_layer, ref_layer in zip(ours.gated_layers, theirs._gated_layers):
        copy_layer(our_layer, ref_layer)
    compat.copy_conv(ours.head_conv1, theirs._head[1])
    compat.copy_conv(ours.head_conv2, theirs._head[3])


def test_gated_pixel_cnn_parity():
    ours = models.GatedPixelCNN(KEY, in_channels=3, out_channels=3, n_gated=2,
                                gated_channels=4, head_channels=4,
                                in_shape=(8, 8, 3))
    theirs = ref.models.GatedPixelCNN(in_channels=3, out_channels=3, n_gated=2,
                                      gated_channels=4, head_channels=4)
    copy_gated_pixel_cnn(ours, theirs)
    x = _img()
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        want = compat.from_torch_nchw(theirs(compat.to_torch_nchw(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def copy_image_gpt(ours, theirs):
    theirs._pos.data = compat.to_torch_nchw(np.asarray(ours.pos))
    compat.copy_conv(ours.input_conv, theirs._input)
    for our_block, ref_block in zip(ours.blocks, theirs._transformer):
        compat.copy_layernorm(our_block.ln1, ref_block._ln1)
        compat.copy_layernorm(our_block.ln2, ref_block._ln2)
        compat.copy_conv(our_block.attn.q_proj, ref_block._attn._q)
        compat.copy_conv(our_block.attn.kv_proj, ref_block._attn._kv)
        compat.copy_conv(our_block.attn.out_proj, ref_block._attn._proj)
        compat.copy_conv(our_block.mlp_conv1, ref_block._out[0])
        compat.copy_conv(our_block.mlp_conv2, ref_block._out[2])
    compat.copy_layernorm(ours.ln, theirs._ln)
    compat.copy_conv(ours.out_conv, theirs._out)


def test_image_gpt_parity():
    ours = models.ImageGPT(KEY, in_channels=3, out_channels=3, in_size=8,
                           n_transformer_blocks=2, n_attention_heads=2,
                           n_embedding_channels=8, in_shape=(8, 8, 3))
    theirs = ref.models.ImageGPT(in_channels=3, out_channels=3, in_size=8,
                                 n_transformer_blocks=2, n_attention_heads=2,
                                 n_embedding_channels=8)
    copy_image_gpt(ours, theirs)
    x = _img()
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        want = compat.from_torch_nchw(theirs(compat.to_torch_nchw(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def copy_pixel_snail(ours, theirs):
    compat.copy_conv(ours.input_conv, theirs._input)
    for our_block, ref_block in zip(ours.pixel_snail_blocks,
                                    theirs._pixel_snail_blocks):
        for our_res, ref_res in zip(our_block.residual_blocks,
                                    ref_block._residual):
            compat.copy_conv(our_res.input_conv, ref_res._input_conv)
            compat.copy_conv(our_res.output_conv, ref_res._output_conv)
        compat.copy_conv(our_block.attention.q_proj, ref_block._attention._q)
        compat.copy_conv(our_block.attention.kv_proj, ref_block._attention._kv)
        compat.copy_conv(our_block.attention.out_proj,
                         ref_block._attention._proj)
        compat.copy_conv(our_block.residual_out, ref_block._residual_out)
        compat.copy_conv(our_block.attention_out, ref_block._attention_out)
        compat.copy_conv(our_block.out, ref_block._out)
    compat.copy_conv(ours.output_conv1, theirs._output[0])
    compat.copy_conv(ours.output_conv2, theirs._output[1])


def test_pixel_snail_parity():
    ours = models.PixelSNAIL(KEY, in_channels=3, out_channels=3, n_channels=4,
                             n_pixel_snail_blocks=2, n_residual_blocks=2,
                             attention_key_channels=2,
                             attention_value_channels=2, in_shape=(8, 8, 3))
    theirs = ref.models.PixelSNAIL(in_channels=3, out_channels=3, n_channels=4,
                                   n_pixel_snail_blocks=2, n_residual_blocks=2,
                                   attention_key_channels=2,
                                   attention_value_channels=2)
    copy_pixel_snail(ours, theirs)
    x = _img()
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        want = compat.from_torch_nchw(theirs(compat.to_torch_nchw(x)))
    np.testing.assert_allclose(got, want, atol=1e-4)


# ---------------------------------------------------------------------------
# VAE family (deterministic sub-paths) and NICE
# ---------------------------------------------------------------------------

def _copy_encoder(ours, theirs):
    seq = list(theirs._net)
    idx = 0
    for conv in ours.down_convs:
        compat.copy_conv(conv, seq[idx])
        idx += 2  # conv, relu
    stack = seq[idx]
    for our_block, ref_block in zip(ours.residual_stack.blocks,
                                    list(stack._net)[:-1]):
        compat.copy_conv(our_block.conv1, ref_block._net[1])
        compat.copy_conv(our_block.conv2, ref_block._net[3])
    compat.copy_conv(ours.out_conv, seq[idx + 1])


def _copy_decoder(ours, theirs):
    seq = list(theirs._net)
    compat.copy_conv(ours.in_conv, seq[0])
    for our_block, ref_block in zip(ours.residual_stack.blocks,
                                    list(seq[1]._net)[:-1]):
        compat.copy_conv(our_block.conv1, ref_block._net[1])
        compat.copy_conv(our_block.conv2, ref_block._net[3])
    idx = 2
    for conv in ours.up_convs:
        ref_conv = seq[idx]
        # Ours: (kh, kw, out, in) -> torch ConvTranspose2d (in, out, kh, kw).
        w = np.asarray(conv.weight).transpose(3, 2, 0, 1)
        ref_conv.weight.data = torch.tensor(w)
        ref_conv.bias.data = torch.tensor(np.asarray(conv.bias))
        idx += 2  # conv, relu (last conv has no relu but index is past end)
    return theirs


def copy_vae(ours, theirs):
    for our_enc, ref_enc in zip(ours.encoders, theirs._encoder):
        _copy_encoder(our_enc, ref_enc)
    for our_dec, ref_dec in zip(ours.decoders, theirs._decoder):
        _copy_decoder(our_dec, ref_dec)


def test_vae_encoder_decoder_parity():
    ours = models.VAE(KEY, in_channels=3, out_channels=3, latent_channels=2,
                      strides=(2, 2), hidden_channels=4, residual_channels=2,
                      in_shape=(8, 8, 3))
    theirs = ref.models.VAE(in_channels=3, out_channels=3, latent_channels=2,
                            strides=[2, 2], hidden_channels=4,
                            residual_channels=2)
    copy_vae(ours, theirs)

    x = _img()
    got_enc = np.asarray(ours._encode(jnp.asarray(x)))
    with torch.no_grad():
        want_enc = compat.from_torch_nchw(theirs._encoder(
            compat.to_torch_nchw(x)))
    np.testing.assert_allclose(got_enc, want_enc, atol=1e-4)

    latents = RNG.random((2, 2, 2, 2)).astype(np.float32)
    got_dec = np.asarray(ours._decode(jnp.asarray(latents)))
    with torch.no_grad():
        want_dec = compat.from_torch_nchw(theirs._decoder(
            compat.to_torch_nchw(latents)))
    np.testing.assert_allclose(got_dec, want_dec, atol=1e-4)


def copy_nice(ours, theirs):
    for our_block, ref_block in zip(ours.blocks, theirs.net):
        linears = [m for m in ref_block.net if isinstance(m, torch.nn.Linear)]
        for our_lin, ref_lin in zip(our_block.layers, linears):
            compat.copy_linear(our_lin, ref_lin)
        assert our_block.reverse == ref_block.reverse
    theirs.scaling.log_scale.data = torch.tensor(
        np.asarray(ours.scaling.log_scale))


def test_nice_parity():
    ours = models.NICE(KEY, n_features=16, n_coupling_blocks=4,
                       n_hidden_layers=2, n_hidden_features=8,
                       in_shape=(4, 4, 1))
    theirs = ref.models.NICE(n_features=16, n_coupling_blocks=4,
                             n_hidden_layers=2, n_hidden_features=8)
    copy_nice(ours, theirs)
    x = RNG.random((2, 16)).astype(np.float32)
    got_z = np.asarray(ours._forward(jnp.asarray(x)))
    with torch.no_grad():
        want_z = theirs._forward(torch.tensor(x)).numpy()
    np.testing.assert_allclose(got_z, want_z, atol=1e-5)
    # Inverse path parity too (sampling direction).
    got_x = np.asarray(ours._inverse(jnp.asarray(got_z)))
    with torch.no_grad():
        want_x = theirs._inverse(torch.tensor(want_z)).numpy()
    np.testing.assert_allclose(got_x, want_x, atol=1e-5)
    np.testing.assert_allclose(got_x, x, atol=1e-4)
