"""Native C++ data-loader runtime vs the NumPy pipeline."""

import numpy as np
import pytest

from pytorch_generative_tpu import datasets
from pytorch_generative_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ toolchain unavailable")


def _data(n=100, h=4, w=4, c=1, seed=0):
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, 256, (n, h, w, c), dtype=np.uint8)
    ys = rng.integers(0, 10, (n,), dtype=np.int64)
    return xs, ys


def test_identity_transform_matches_numpy():
    xs, ys = _data()
    loader = datasets.NativeDataLoader(xs, ys, batch_size=32)
    batches = list(loader)
    assert sum(b[0].shape[0] for b in batches) == 100
    got = np.concatenate([b[0] for b in batches])
    np.testing.assert_allclose(got, xs.astype(np.float32) / 255.0)
    got_y = np.concatenate([b[1] for b in batches])
    np.testing.assert_array_equal(got_y, ys)


def test_shuffle_permutes_and_reshuffles_per_epoch():
    xs, ys = _data()
    loader = datasets.NativeDataLoader(xs, ys, batch_size=100, shuffle=True)
    (x1, y1), = list(loader)
    (x2, y2), = list(loader)
    # Same multiset of examples, different order across epochs.
    assert not np.array_equal(y1, y2)
    np.testing.assert_array_equal(np.sort(y1), np.sort(ys))
    np.testing.assert_array_equal(np.sort(y2), np.sort(ys))
    # x rows track their labels through the shuffle.
    idx = int(np.argwhere(y1 == ys[0])[0][0])
    candidates = xs[ys == ys[0]].astype(np.float32) / 255.0
    assert any(np.allclose(x1[idx], c) for c in candidates)


def test_binarize_is_stochastic_binary_and_epoch_fresh():
    xs, _ = _data(n=64)
    loader = datasets.NativeDataLoader(
        xs, None, batch_size=64,
        transform=datasets.NativeDataLoader.TRANSFORM_BINARIZE)
    (x1, _), = list(loader)
    (x2, _), = list(loader)
    assert set(np.unique(x1)) <= {0.0, 1.0}
    assert not np.array_equal(x1, x2)  # fresh noise every epoch
    # Bernoulli(p=x): empirical mean tracks the pixel intensities.
    np.testing.assert_allclose(x1.mean(), (xs / 255.0).mean(), atol=0.02)


def test_dequantize_range():
    xs, _ = _data(n=64)
    loader = datasets.NativeDataLoader(
        xs, None, batch_size=64,
        transform=datasets.NativeDataLoader.TRANSFORM_DEQUANTIZE)
    (x, _), = list(loader)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    np.testing.assert_allclose(x, (xs + 0.5) / 256.0, atol=0.5 / 256 + 1e-6)


def test_pad_to_32():
    xs = np.zeros((8, 28, 28, 1), np.uint8)
    loader = datasets.NativeDataLoader(xs, None, batch_size=4, pad_to_32=True)
    (x, _) = next(iter(loader))
    assert x.shape == (4, 32, 32, 1)


def test_shutdown_no_hang_on_abandoned_epochs():
    """Regression: Shutdown() must wake workers parked on order_cv_ (waiting
    for a predecessor batch that will never arrive) — previously only
    space_cv_ was notified, hanging join() on every start_epoch/__del__."""
    import gc
    import itertools

    xs, ys = _data(n=256)
    for trial in range(5):
        loader = datasets.NativeDataLoader(
            xs, ys, batch_size=8, shuffle=True, seed=trial,
            transform=datasets.NativeDataLoader.TRANSFORM_BINARIZE,
            n_threads=6, prefetch=1)
        for _ in range(3):  # each __iter__ shuts down the previous epoch
            for _ in itertools.islice(iter(loader), 2):
                pass
        del loader
        gc.collect()
