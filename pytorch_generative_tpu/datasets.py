"""Dataset loaders (MNIST, BinarizedMNIST, CIFAR10, blobs) without torch.

Parity surface: /root/reference/pytorch_generative/datasets.py. The torch
DataLoader/torchvision stack is replaced by a NumPy pipeline that emits fixed-size
NHWC float32 batches ready for device transfer: raw files are parsed directly
(MNIST IDX, Salakhutdinov-Murray .amat, CIFAR10 python pickles), per-epoch
shuffling and the stochastic transforms (dynamic binarization, dequantization) use
explicit NumPy RNG streams, and all transforms are applied per batch on the host.

Data files are searched in $PGT_DATA_DIR, /tmp/data, ./data and
~/.cache/pytorch_generative_tpu; set PGT_ALLOW_DOWNLOAD=1 to fetch them (requires
network egress).
"""

from __future__ import annotations

import gzip
import os
import pickle
import tarfile
import urllib.request

import numpy as np

_MNIST_FILES = {
    "train_images": "train-images-idx3-ubyte.gz",
    "train_labels": "train-labels-idx1-ubyte.gz",
    "test_images": "t10k-images-idx3-ubyte.gz",
    "test_labels": "t10k-labels-idx1-ubyte.gz",
}
_MNIST_URLS = [
    "https://storage.googleapis.com/cvdf-datasets/mnist/",
    "https://ossci-datasets.s3.amazonaws.com/mnist/",
]
_BINARIZED_MNIST_URL = (
    "http://www.cs.toronto.edu/~larocheh/public/datasets/binarized_mnist/"
    "binarized_mnist_")
_CIFAR10_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"


def _data_roots():
    roots = []
    if os.environ.get("PGT_DATA_DIR"):
        roots.append(os.environ["PGT_DATA_DIR"])
    roots += ["/tmp/data", "./data",
              os.path.expanduser("~/.cache/pytorch_generative_tpu")]
    return roots


def _find_or_download(relpath: str, urls) -> str:
    for root in _data_roots():
        path = os.path.join(root, relpath)
        if os.path.exists(path):
            return path
    if os.environ.get("PGT_ALLOW_DOWNLOAD") == "1":
        root = _data_roots()[0]
        path = os.path.join(root, relpath)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        last_err = None
        for url in urls:
            try:
                print(f"Downloading {url} -> {path}")
                urllib.request.urlretrieve(url, path)
                return path
            except Exception as e:  # noqa: BLE001
                last_err = e
        raise OSError(f"All downloads failed for {relpath}: {last_err}")
    raise FileNotFoundError(
        f"Dataset file {relpath} not found under {_data_roots()}. Place it there "
        f"or set PGT_ALLOW_DOWNLOAD=1 (requires network).")


# ---------------------------------------------------------------------------
# Raw parsers
# ---------------------------------------------------------------------------

def _read_idx(path: str) -> np.ndarray:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        data = f.read()
    magic = int.from_bytes(data[0:4], "big")
    ndim = magic & 0xFF
    dims = [int.from_bytes(data[4 + 4 * i: 8 + 4 * i], "big") for i in range(ndim)]
    return np.frombuffer(data, np.uint8, offset=4 + 4 * ndim).reshape(dims)


def load_mnist():
    """Returns ((train_x, train_y), (test_x, test_y)); images uint8 (N, 28, 28)."""
    arrays = {}
    for key, fname in _MNIST_FILES.items():
        path = _find_or_download(
            os.path.join("MNIST", "raw", fname),
            [base + fname for base in _MNIST_URLS])
        arrays[key] = _read_idx(path)
    return ((arrays["train_images"], arrays["train_labels"]),
            (arrays["test_images"], arrays["test_labels"]))


def load_binarized_mnist(split: str) -> np.ndarray:
    """The fixed Salakhutdinov-Murray binarization; returns uint8 (N, 28, 28).

    Parity with the reference's BinarizedMNIST dataset
    (/root/reference/pytorch_generative/datasets.py:67-157).
    """
    assert split in ("train", "valid", "test")
    fname = f"binarized_mnist_{split}.amat"
    path = _find_or_download(os.path.join("BinarizedMNIST", "raw", fname),
                             [_BINARIZED_MNIST_URL + f"{split}.amat"])
    cache = path + ".npy"
    if os.path.exists(cache):
        return np.load(cache)
    images = np.loadtxt(path, delimiter=" ", dtype=np.uint8).reshape(-1, 28, 28)
    try:
        np.save(cache, images)
    except OSError:
        pass
    return images


def load_cifar10():
    """Returns ((train_x, train_y), (test_x, test_y)); images uint8 NHWC 32x32x3."""
    base = None
    for root in _data_roots():
        candidate = os.path.join(root, "cifar-10-batches-py")
        if os.path.isdir(candidate):
            base = candidate
            break
    if base is None:
        tar_path = _find_or_download("cifar-10-python.tar.gz", [_CIFAR10_URL])
        extract_root = os.path.dirname(tar_path)
        with tarfile.open(tar_path) as tf:
            tf.extractall(extract_root)
        base = os.path.join(extract_root, "cifar-10-batches-py")

    def read_batch(name):
        with open(os.path.join(base, name), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        return x, np.asarray(d[b"labels"], np.int64)

    xs, ys = zip(*[read_batch(f"data_batch_{i}") for i in range(1, 6)])
    train_x, train_y = np.concatenate(xs), np.concatenate(ys)
    test_x, test_y = read_batch("test_batch")
    return (train_x, train_y), (test_x, test_y)


# ---------------------------------------------------------------------------
# Transforms (per-batch, host-side, explicit RNG)
# ---------------------------------------------------------------------------

def dynamically_binarize(rng: np.random.Generator, x: np.ndarray) -> np.ndarray:
    """Bernoulli(probs=x) per presentation — fresh noise every epoch."""
    return (rng.random(x.shape, dtype=np.float32) < x).astype(np.float32)


def dequantize(rng: np.random.Generator, x: np.ndarray) -> np.ndarray:
    """(x * 255 + U[0,1)) / 256."""
    return (x * 255.0 + rng.random(x.shape, dtype=np.float32)) / 256.0


def resize_to_32(x: np.ndarray) -> np.ndarray:
    """Zero-pads 28x28 NHWC images to 32x32."""
    return np.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))


# ---------------------------------------------------------------------------
# DataLoader
# ---------------------------------------------------------------------------

class DataLoader:
    """An iterable over (x, y) NumPy batches with per-epoch shuffling.

    ``transform(rng, x) -> x`` runs per batch with a fresh, deterministic RNG
    stream derived from (seed, epoch, batch index), so stochastic transforms like
    dynamic binarization re-sample every epoch — matching torchvision's behavior
    of applying transforms at access time.
    """

    def __init__(self, xs, ys=None, batch_size=128, shuffle=False, transform=None,
                 seed=0, drop_remainder=False):
        self.xs = xs
        self.ys = ys
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.transform = transform
        self.seed = seed
        self.drop_remainder = drop_remainder
        self._epoch = 0

    @property
    def dataset_size(self):
        return len(self.xs)

    def __len__(self):
        n = len(self.xs)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def __iter__(self):
        epoch = self._epoch
        self._epoch += 1
        order = np.arange(len(self.xs))
        if self.shuffle:
            np.random.default_rng((self.seed, epoch)).shuffle(order)
        for i in range(len(self)):
            idx = order[i * self.batch_size: (i + 1) * self.batch_size]
            x = self.xs[idx]
            if self.transform is not None:
                rng = np.random.default_rng((self.seed, epoch, i))
                x = self.transform(rng, x)
            y = self.ys[idx] if self.ys is not None else None
            yield x, y


class NativeDataLoader:
    """Iterable over (x, y) batches backed by the C++ prefetching runtime.

    Same iteration protocol as :class:`DataLoader`, but shuffling, the
    stochastic transforms, and uint8->float32 conversion run in a native
    worker pool (csrc/dataloader.cpp) that prefetches batches ahead of the
    training loop — the TPU build's equivalent of torch DataLoader's native
    multi-worker pipeline (reference datasets.py:57).
    """

    TRANSFORM_NONE = 0
    TRANSFORM_BINARIZE = 1
    TRANSFORM_DEQUANTIZE = 2

    def __init__(self, xs_uint8, ys=None, batch_size=128, shuffle=False,
                 transform=TRANSFORM_NONE, pad_to_32=False, seed=0,
                 n_threads=None, prefetch=2):
        from pytorch_generative_tpu.utils import native

        self._lib = native.load_library()
        xs_uint8 = np.ascontiguousarray(xs_uint8, dtype=np.uint8)
        if xs_uint8.ndim == 3:
            xs_uint8 = xs_uint8[..., None]
        self._shape = xs_uint8.shape[1:]
        self._example_size = int(np.prod(self._shape))
        self._n = len(xs_uint8)
        self.batch_size = batch_size
        self._pad_to_32 = pad_to_32
        self._has_labels = ys is not None
        self._epoch = 0
        ys_arr = (np.ascontiguousarray(ys, dtype=np.int64)
                  if ys is not None else None)
        import ctypes

        n_threads = n_threads or min(os.cpu_count() or 1, 8)
        self._handle = self._lib.pgt_loader_create(
            xs_uint8.ctypes.data_as(ctypes.c_void_p),
            (ys_arr.ctypes.data_as(ctypes.c_void_p)
             if ys_arr is not None else None),
            self._n, self._example_size, batch_size, int(transform),
            int(bool(shuffle)), int(seed), int(n_threads), int(prefetch))

    @property
    def dataset_size(self):
        return self._n

    def __len__(self):
        return int(self._lib.pgt_loader_n_batches(self._handle))

    def __iter__(self):
        import ctypes

        self._lib.pgt_loader_start_epoch(self._handle, self._epoch)
        self._epoch += 1
        n_batches = len(self)
        for _ in range(n_batches):
            x = np.empty((self.batch_size, self._example_size), np.float32)
            y = (np.empty((self.batch_size,), np.int64)
                 if self._has_labels else None)
            n = self._lib.pgt_loader_next(
                self._handle, x.ctypes.data_as(ctypes.c_void_p),
                (y.ctypes.data_as(ctypes.c_void_p) if y is not None else None))
            if n == 0:
                return
            x = x[:n].reshape((n,) + self._shape)
            if self._pad_to_32:
                x = resize_to_32(x)
            yield x, (y[:n] if y is not None else None)

    def __del__(self):
        try:
            self._lib.pgt_loader_destroy(self._handle)
        except Exception:  # noqa: BLE001 - interpreter teardown
            pass


def _to_float_nhwc(images: np.ndarray) -> np.ndarray:
    """uint8 (N, H, W[, C]) -> float32 NHWC in [0, 1]."""
    if images.ndim == 3:
        images = images[..., None]
    return images.astype(np.float32) / 255.0


# ---------------------------------------------------------------------------
# Public loader factories (parity with the reference)
# ---------------------------------------------------------------------------

def get_mnist_loaders(batch_size, dynamically_binarize=False, dequantize=False,
                      resize_to_32=False, seed=0, use_native=None):
    """Train/test loaders for MNIST (datasets.py:28-64 in the reference).

    ``use_native``: route through the C++ prefetching runtime (auto when the
    toolchain is available; falls back to the NumPy pipeline otherwise).
    """
    if dynamically_binarize and dequantize:
        raise ValueError("Cannot specify both dynamically_binarize and dequantize.")
    (train_x, train_y), (test_x, test_y) = load_mnist()

    if use_native is None:
        from pytorch_generative_tpu.utils import native as native_lib

        use_native = native_lib.available()
    if use_native:
        transform = NativeDataLoader.TRANSFORM_NONE
        if dynamically_binarize:
            transform = NativeDataLoader.TRANSFORM_BINARIZE
        elif dequantize:
            transform = NativeDataLoader.TRANSFORM_DEQUANTIZE
        train_loader = NativeDataLoader(
            train_x, train_y, batch_size, shuffle=True, transform=transform,
            pad_to_32=resize_to_32, seed=seed)
        test_loader = NativeDataLoader(
            test_x, test_y, batch_size, transform=transform,
            pad_to_32=resize_to_32, seed=seed + 1)
        return train_loader, test_loader

    train_x, test_x = _to_float_nhwc(train_x), _to_float_nhwc(test_x)

    def transform(rng, x):
        if dynamically_binarize:
            x = globals()["dynamically_binarize"](rng, x)
        if dequantize:
            x = globals()["dequantize"](rng, x)
        if resize_to_32:
            x = globals()["resize_to_32"](x)
        return x

    train_loader = DataLoader(train_x, train_y, batch_size, shuffle=True,
                              transform=transform, seed=seed)
    test_loader = DataLoader(test_x, test_y, batch_size, transform=transform,
                             seed=seed + 1)
    return train_loader, test_loader


class BinarizedMNIST:
    """The fixed Salakhutdinov-Murray binarization as an indexable dataset.

    API parity with the reference's BinarizedMNIST VisionDataset
    (/root/reference/pytorch_generative/datasets.py:67-157): splits 'train' /
    'valid' / 'test', items are (28, 28, 1) float32 arrays in {0, 1}, an
    optional transform applies per item. (Labels are not provided — this
    dataset evaluates generative models.)
    """

    def __init__(self, root=None, split: str = "train", transform=None):
        assert split in ("train", "valid", "test")
        if root is not None:
            os.environ.setdefault("PGT_DATA_DIR", root)
        self.split = split
        self.transform = transform
        self.data = _to_float_nhwc(load_binarized_mnist(split))

    def __getitem__(self, index):
        img = self.data[index]
        if self.transform is not None:
            img = self.transform(img)
        return img

    def __len__(self):
        return len(self.data)


def get_binarized_mnist_loaders(batch_size, merge_valid_into_train=True, seed=0):
    """Loaders over the fixed Salakhutdinov-Murray binarization.

    The reference merges the eval split into training (datasets.py:70-75).
    """
    train = load_binarized_mnist("train")
    if merge_valid_into_train:
        train = np.concatenate([train, load_binarized_mnist("valid")])
    test = load_binarized_mnist("test")
    train_loader = DataLoader(_to_float_nhwc(train), None, batch_size, shuffle=True,
                              seed=seed)
    test_loader = DataLoader(_to_float_nhwc(test), None, batch_size)
    return train_loader, test_loader


_CIFAR10_MEAN = np.asarray([0.4914, 0.4822, 0.4465], np.float32)
_CIFAR10_STD = np.asarray([0.2023, 0.1994, 0.2010], np.float32)


def get_cifar10_loaders(batch_size, normalize=False, seed=0):
    """Train/test loaders for CIFAR10 (datasets.py:160-187 in the reference)."""
    (train_x, train_y), (test_x, test_y) = load_cifar10()
    train_x, test_x = _to_float_nhwc(train_x), _to_float_nhwc(test_x)

    transform = None
    if normalize:
        def transform(rng, x):  # noqa: ARG001
            return (x - _CIFAR10_MEAN) / _CIFAR10_STD

    train_loader = DataLoader(train_x, train_y, batch_size, shuffle=True,
                              transform=transform, seed=seed)
    test_loader = DataLoader(test_x, test_y, batch_size, transform=transform)
    return train_loader, test_loader


def make_blobs(rng, n_samples, n_features=2, centers=2, center_box=(-10.0, 10.0),
               cluster_std=1.0):
    """Isotropic Gaussian blobs (replaces the sklearn dependency)."""
    centers_arr = rng.uniform(center_box[0], center_box[1], (centers, n_features))
    ys = rng.integers(0, centers, n_samples)
    xs = centers_arr[ys] + cluster_std * rng.standard_normal(
        (n_samples, n_features))
    return xs.astype(np.float32), ys


def get_blobs_loaders(batch_size, n_train=1000, n_test=200, n_features=2,
                      n_centers=2, seed=0):
    """Standardized Gaussian-blobs loaders (datasets.py:190-222 in the reference)."""
    rng = np.random.default_rng(seed)
    xs, _ = make_blobs(rng, n_train + n_test, n_features, n_centers)
    train_xs, test_xs = xs[:n_train], xs[n_train:]
    mean, std = train_xs.mean(axis=0), train_xs.std(axis=0, ddof=1)
    train_xs = (train_xs - mean) / std
    test_xs = (test_xs - mean) / std
    train_loader = DataLoader(train_xs, None, batch_size, shuffle=True, seed=seed)
    test_loader = DataLoader(test_xs, None, batch_size)
    return train_loader, test_loader


def get_synthetic_mnist_loaders(batch_size, n_train=4096, n_test=512, image_size=28,
                                binary=True, seed=0):
    """Random MNIST-shaped data for benchmarks/tests when real data is absent."""
    rng = np.random.default_rng(seed)
    shape_train = (n_train, image_size, image_size, 1)
    shape_test = (n_test, image_size, image_size, 1)
    if binary:
        train = (rng.random(shape_train) < 0.13).astype(np.float32)
        test = (rng.random(shape_test) < 0.13).astype(np.float32)
    else:
        train = rng.random(shape_train, dtype=np.float32)
        test = rng.random(shape_test, dtype=np.float32)
    return (DataLoader(train, None, batch_size, shuffle=True, seed=seed),
            DataLoader(test, None, batch_size))
