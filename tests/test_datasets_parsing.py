"""Raw dataset-file parsing against synthetic files.

The real MNIST/BinarizedMNIST/CIFAR10 files never exist on this zero-egress
box, so the parsers (`_read_idx`, .amat loading, CIFAR pickle batches —
reference counterparts /root/reference/pytorch_generative/datasets.py) are
exercised here with synthetic files written in the exact on-disk formats.
"""

import gzip
import os
import pickle

import numpy as np
import pytest

from pytorch_generative_tpu import datasets


def _write_idx(path, array):
    """Writes `array` (uint8) in IDX format (magic 0x08 dtype, ndim in LSB)."""
    ndim = array.ndim
    header = (0x0800 | ndim).to_bytes(4, "big")
    for d in array.shape:
        header += int(d).to_bytes(4, "big")
    payload = header + array.tobytes()
    if path.endswith(".gz"):
        with gzip.open(path, "wb") as f:
            f.write(payload)
    else:
        with open(path, "wb") as f:
            f.write(payload)


@pytest.mark.parametrize("suffix", ["", ".gz"])
def test_read_idx_roundtrip(tmp_path, suffix):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (5, 28, 28), dtype=np.uint8)
    labels = rng.integers(0, 10, (5,), dtype=np.uint8)
    img_path = str(tmp_path / f"images-idx3-ubyte{suffix}")
    lab_path = str(tmp_path / f"labels-idx1-ubyte{suffix}")
    _write_idx(img_path, images)
    _write_idx(lab_path, labels)
    np.testing.assert_array_equal(datasets._read_idx(img_path), images)
    np.testing.assert_array_equal(datasets._read_idx(lab_path), labels)


def test_load_mnist_from_synthetic_files(tmp_path, monkeypatch):
    """load_mnist() finds and parses IDX files placed under a data root."""
    monkeypatch.setenv("PGT_DATA_DIR", str(tmp_path))
    raw = tmp_path / "MNIST" / "raw"
    os.makedirs(raw)
    rng = np.random.default_rng(1)
    arrays = {
        "train-images-idx3-ubyte.gz": rng.integers(0, 256, (6, 28, 28),
                                                   dtype=np.uint8),
        "train-labels-idx1-ubyte.gz": rng.integers(0, 10, (6,),
                                                   dtype=np.uint8),
        "t10k-images-idx3-ubyte.gz": rng.integers(0, 256, (4, 28, 28),
                                                  dtype=np.uint8),
        "t10k-labels-idx1-ubyte.gz": rng.integers(0, 10, (4,),
                                                  dtype=np.uint8),
    }
    for name, arr in arrays.items():
        _write_idx(str(raw / name), arr)
    (train_x, train_y), (test_x, test_y) = datasets.load_mnist()
    np.testing.assert_array_equal(train_x,
                                  arrays["train-images-idx3-ubyte.gz"])
    np.testing.assert_array_equal(test_y,
                                  arrays["t10k-labels-idx1-ubyte.gz"])
    assert train_y.shape == (6,) and test_x.shape == (4, 28, 28)


def test_load_binarized_mnist_amat(tmp_path, monkeypatch):
    """.amat parsing (space-separated 784-wide 0/1 rows) + .npy caching."""
    monkeypatch.setenv("PGT_DATA_DIR", str(tmp_path))
    raw = tmp_path / "BinarizedMNIST" / "raw"
    os.makedirs(raw)
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, (3, 784), dtype=np.uint8)
    with open(raw / "binarized_mnist_valid.amat", "w") as f:
        for row in bits:
            f.write(" ".join(str(int(v)) for v in row) + "\n")
    images = datasets.load_binarized_mnist("valid")
    np.testing.assert_array_equal(images, bits.reshape(3, 28, 28))
    # Second load hits the .npy cache and must agree.
    np.testing.assert_array_equal(datasets.load_binarized_mnist("valid"),
                                  images)


def test_load_cifar10_from_synthetic_batches(tmp_path, monkeypatch):
    """CIFAR-10 python-batch parsing: 5 train batches + test, CHW->NHWC."""
    monkeypatch.setenv("PGT_DATA_DIR", str(tmp_path))
    base = tmp_path / "cifar-10-batches-py"
    os.makedirs(base)
    rng = np.random.default_rng(3)

    def write_batch(name, n):
        data = rng.integers(0, 256, (n, 3 * 32 * 32), dtype=np.uint8)
        labels = [int(v) for v in rng.integers(0, 10, (n,))]
        with open(base / name, "wb") as f:
            pickle.dump({b"data": data, b"labels": labels}, f)
        return data, np.asarray(labels, np.int64)

    parts = [write_batch(f"data_batch_{i}", 2) for i in range(1, 6)]
    test_data, test_labels = write_batch("test_batch", 3)

    (train_x, train_y), (test_x, test_y) = datasets.load_cifar10()
    assert train_x.shape == (10, 32, 32, 3) and test_x.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(train_y,
                                  np.concatenate([p[1] for p in parts]))
    np.testing.assert_array_equal(test_y, test_labels)
    # NHWC conversion: channel c of pixel (h, w) comes from the CHW flat
    # layout at c*1024 + h*32 + w.
    np.testing.assert_array_equal(
        test_x[0, 5, 7, 2], test_data[0, 2 * 1024 + 5 * 32 + 7])
