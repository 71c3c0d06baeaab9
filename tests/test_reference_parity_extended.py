"""Extended reference parity: VQ models end-to-end, VD-VAE deterministic
sub-paths, linear attention (forward AND gradients vs the reference's
hand-written autograd.Function), nonparametric estimators, and full
parameter-gradient parity on a conv model."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests import _reference_compat as compat
from tests.test_reference_parity import _copy_decoder, _copy_encoder

from pytorch_generative_tpu import core, models, nn

ref = compat.load_reference()

KEY = jax.random.PRNGKey(7)
RNG = np.random.default_rng(3)


def _img(n=2, h=8, w=8, c=3):
    return RNG.random((n, h, w, c)).astype(np.float32)


def test_vq_vae_full_forward_parity():
    ours = models.VectorQuantizedVAE(
        KEY, in_channels=3, out_channels=3, hidden_channels=4,
        n_residual_blocks=1, residual_channels=2, n_embeddings=8,
        embedding_dim=4, in_shape=(8, 8, 3))
    theirs = ref.models.VectorQuantizedVAE(
        in_channels=3, out_channels=3, hidden_channels=4, n_residual_blocks=1,
        residual_channels=2, n_embeddings=8, embedding_dim=4)
    _copy_encoder(ours.encoder, theirs._encoder)
    compat.copy_conv(ours.quantizer.conv, theirs._quantizer._net[0])
    ref_vq = theirs._quantizer._net[1]
    ref_vq._embedding.data = torch.tensor(
        np.asarray(ours.quantizer.vq.ema_embedding))
    _copy_decoder(ours.decoder, theirs._decoder)

    x = _img()
    (recon, vq_loss), _ = ours.forward_with_state(jnp.asarray(x))
    theirs.eval()
    with torch.no_grad():
        recon_ref, vq_loss_ref = theirs(compat.to_torch_nchw(x))
    np.testing.assert_allclose(np.asarray(recon),
                               compat.from_torch_nchw(recon_ref), atol=1e-4)
    np.testing.assert_allclose(float(vq_loss), float(vq_loss_ref), atol=1e-5)


def _copy_bottleneck(ours, theirs):
    compat.copy_conv(ours.conv1, theirs._net[1])
    compat.copy_conv(ours.conv2, theirs._net[3])
    compat.copy_conv(ours.conv3, theirs._net[5])
    compat.copy_conv(ours.conv4, theirs._net[7])


def test_vd_vae_deterministic_paths_parity():
    from pytorch_generative_tpu.models.vae.vd_vae import StackConfig

    configs = (StackConfig(1, 1), StackConfig(1, 1))
    ours = models.VeryDeepVAE(
        KEY, in_channels=3, out_channels=3, input_resolution=8,
        stack_configs=configs, latent_channels=2, hidden_channels=4,
        bottleneck_channels=2, in_shape=(8, 8, 3))
    ref_configs = [ref.models.vae.vd_vae.StackConfig(1, 1),
                   ref.models.vae.vd_vae.StackConfig(1, 1)]
    theirs = ref.models.VeryDeepVAE(
        in_channels=3, out_channels=3, input_resolution=8,
        stack_configs=ref_configs, latent_channels=2, hidden_channels=4,
        bottleneck_channels=2)

    compat.copy_conv(ours.input_conv, theirs._input)
    for our_stack, ref_stack in zip(ours.encoder, theirs._encoder):
        for our_block, ref_block in zip(our_stack.residuals,
                                        ref_stack._residuals):
            _copy_bottleneck(our_block, ref_block)

    # Bottom-up encoding (deterministic) must agree exactly.
    x = _img()
    h = ours.input_conv(jnp.asarray(x))
    mixins = []
    for stack in ours.encoder:
        h, mixin = stack(h)
        mixins.append(mixin)
    with torch.no_grad():
        ht = theirs._input(compat.to_torch_nchw(x))
        ref_mixins = []
        for stack in theirs._encoder:
            ht, mixin_t = stack(ht)
            ref_mixins.append(mixin_t)
    for got, want in zip(mixins, ref_mixins):
        np.testing.assert_allclose(np.asarray(got),
                                   compat.from_torch_nchw(want), atol=1e-4)

    # Prior-head (deterministic part of a TopDownBlock) must agree.
    our_td = ours.decoder[0].topdowns[0]
    ref_td = theirs._decoder[0]._topdowns[0]
    _copy_bottleneck(our_td.prior, ref_td._prior)
    z = RNG.random((2, 1, 1, 4)).astype(np.float32)
    got = np.asarray(our_td.prior(jnp.asarray(z)))
    with torch.no_grad():
        want = compat.from_torch_nchw(ref_td._prior(compat.to_torch_nchw(z)))
    # Channel split order differs only in layout; compare whole tensor.
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_linear_attention_numerator_forward_and_grad_parity():
    """Our cumsum numerator == the reference's hand-written autograd.Function
    (forward AND backward). The *denominator* intentionally diverges: the
    reference's einsum mislabels the heads axis as the sequence axis
    (attention.py:267), so its normalizer is not causal-cumulative — see
    nn/attention.py::LinearCausalAttention's docstring."""

    q = RNG.standard_normal((1, 2, 10, 3)).astype(np.float32)
    k = RNG.standard_normal((1, 2, 10, 3)).astype(np.float32)
    v = RNG.standard_normal((1, 2, 10, 4)).astype(np.float32)

    def our_numerator(q, k, v):
        kv = jnp.einsum("nhlk,nhlv->nhlkv", k, v)
        return jnp.einsum("nhlk,nhlkv->nhlv", q, jnp.cumsum(kv, axis=2))

    numerator = ref.nn.attention._UnnormalizedLinearCausalAttention.apply
    qt = torch.tensor(q, requires_grad=True)
    kt = torch.tensor(k, requires_grad=True)
    vt = torch.tensor(v, requires_grad=True)
    want = numerator(qt, kt, vt)
    got = our_numerator(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=1e-5)

    grads = jax.grad(
        lambda q, k, v: jnp.sum(our_numerator(q, k, v) ** 2),
        argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    torch.sum(want ** 2).backward()
    for got_g, want_g in zip(grads, (qt.grad, kt.grad, vt.grad)):
        np.testing.assert_allclose(np.asarray(got_g), want_g.numpy(),
                                   atol=1e-4)


def test_kde_parity():
    train = RNG.random((16, 3)).astype(np.float32)
    test = RNG.random((4, 3)).astype(np.float32)
    for our_kernel, ref_kernel in [
        (models.GaussianKernel(bandwidth=0.7),
         ref.models.GaussianKernel(bandwidth=0.7)),
        (models.ParzenWindowKernel(bandwidth=0.7),
         ref.models.ParzenWindowKernel(bandwidth=0.7)),
    ]:
        ours = models.KernelDensityEstimator(train, our_kernel)
        theirs = ref.models.KernelDensityEstimator(torch.tensor(train),
                                                   ref_kernel)
        got = np.asarray(ours.forward(jnp.asarray(test)))
        with torch.no_grad():
            want = theirs(torch.tensor(test)).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_gaussian_mixture_parity():
    ours = models.GaussianMixtureModel(3, 8, in_shape=(8,))
    theirs = ref.models.GaussianMixtureModel(n_components=3, n_features=8)
    theirs.mixture_logits.data = torch.tensor(np.asarray(ours.mixture_logits))
    theirs.mean.data = torch.tensor(np.asarray(ours.mean))
    theirs.log_std.data = torch.tensor(np.asarray(ours.log_std))
    x = RNG.random((4, 8)).astype(np.float32)
    got = np.asarray(ours.forward(jnp.asarray(x)))
    with torch.no_grad():
        # The reference returns shape (n, 1) for GMM (a double-unsqueeze in
        # _component_log_prob); values are what matters.
        want = theirs(torch.tensor(x)).numpy().reshape(-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pixel_cnn_gradient_parity():
    """Full parameter-gradient agreement through a masked-conv model."""
    ours = models.PixelCNN(KEY, in_channels=1, out_channels=1, n_residual=1,
                           residual_channels=2, head_channels=2,
                           in_shape=(6, 6, 1))
    theirs = ref.models.PixelCNN(in_channels=1, out_channels=1, n_residual=1,
                                 residual_channels=2, head_channels=2)
    compat.copy_conv(ours.input_conv, theirs._input)
    block, ref_block = ours.causal_layers[0], theirs._causal_layers[0]
    compat.copy_conv(block.conv1, ref_block._net[1])
    compat.copy_conv(block.conv2, ref_block._net[3])
    compat.copy_conv(block.conv3, ref_block._net[5])
    compat.copy_conv(ours.head_conv1, theirs._head[1])
    compat.copy_conv(ours.head_conv2, theirs._head[3])

    x = (RNG.random((2, 6, 6, 1)) < 0.5).astype(np.float32)
    params, rest = core.partition(ours)

    def loss(p):
        m = core.combine(p, rest)
        return jnp.sum(m.forward(jnp.asarray(x)) ** 2)

    grads = jax.grad(loss)(params)

    out = theirs(compat.to_torch_nchw(x))
    torch.sum(out ** 2).backward()

    # Input conv weight grads (HWIO vs OIHW). NOTE: torch's grad for a masked
    # conv includes masked-out positions (it masks weights in place *before*
    # conv, so grads flow to the raw weight everywhere); ours multiplies by the
    # mask inside the graph, so masked entries get exactly zero. Compare only
    # unmasked entries — the ones that affect optimization identically when
    # the mask is re-applied each step.
    got = np.asarray(grads.input_conv.weight).transpose(3, 2, 0, 1)
    want = theirs._input.weight.grad.numpy()
    mask = np.asarray(ours.input_conv.mask)[:, :, 0, 0]
    mask4 = np.broadcast_to(mask[None, None], got.shape)
    np.testing.assert_allclose(got * mask4, want * mask4, atol=1e-4)

    got_b = np.asarray(grads.input_conv.bias)
    np.testing.assert_allclose(got_b, theirs._input.bias.grad.numpy(),
                               atol=1e-4)
    got_head = np.asarray(grads.head_conv2.weight).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(got_head, theirs._head[3].weight.grad.numpy(),
                               atol=1e-4)
