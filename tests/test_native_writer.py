"""Tests for the native (C++) asynchronous chain writer."""

import numpy as np
import pytest

from glabc_tpu.native import NativeChainWriter, native_available
from glabc_tpu.utils.io import ChainWriter

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable; native writer disabled"
)


def test_csv_roundtrip(tmp_path):
    path = str(tmp_path / "native.csv")
    data = np.random.RandomState(0).randn(1000, 3).astype(np.float32)
    with NativeChainWriter(path, 3) as w:
        w.write(data[:400])
        w.write(data[400:])
        w.flush()
    got = np.loadtxt(path, delimiter=",").astype(np.float32)
    np.testing.assert_array_equal(got, data)  # %.9g round-trips float32


def test_binary_roundtrip(tmp_path):
    path = str(tmp_path / "native.bin")
    data = np.random.RandomState(1).randn(512, 2).astype(np.float32)
    with NativeChainWriter(path, 2, binary=True) as w:
        w.write(data)
        w.flush()
    got = np.fromfile(path, dtype=np.float32).reshape(-1, 2)
    np.testing.assert_array_equal(got, data)


def test_native_multichain_binary_roundtrip(tmp_path):
    """chains='all' + use_native: one binary file of (C,S,d) blocks +
    sidecar, read back exactly via read_binary_chains."""
    from glabc_tpu.utils.io import read_binary_chains

    path = str(tmp_path / "all.bin")
    rng = np.random.RandomState(2)
    C, d = 16, 3
    theta0 = rng.randn(C, d).astype(np.float32)
    seg1 = rng.randn(C, 40, d).astype(np.float32)
    seg2 = rng.randn(C, 25, d).astype(np.float32)

    w = ChainWriter(path, chains="all", use_native=True)
    w.write_initial(theta0)
    w.on_segment(seg1, 0)
    w.on_segment(seg2, 40)
    w.close()

    got = read_binary_chains(path)
    expected = np.concatenate([theta0[:, None, :], seg1, seg2], axis=1)
    assert got.shape == (C, 66, d)
    np.testing.assert_array_equal(got, expected)


def test_async_queue_drains(tmp_path):
    path = str(tmp_path / "q.csv")
    w = NativeChainWriter(path, 2)
    for i in range(50):
        w.write(np.full((100, 2), float(i), dtype=np.float32))
    w.flush()
    assert w.queue_depth() == 0
    w.close()
    got = np.loadtxt(path, delimiter=",")
    assert got.shape == (5000, 2)
    # ordering preserved
    np.testing.assert_array_equal(got[:100], 0.0)
    np.testing.assert_array_equal(got[-100:], 49.0)


def test_chainwriter_native_backend_matches_python(tmp_path):
    theta0 = np.array([[0.5, -0.5]], dtype=np.float32)
    block = np.random.RandomState(2).randn(1, 200, 2).astype(np.float32)

    py_path = str(tmp_path / "py.csv")
    wp = ChainWriter(py_path)
    wp.write_initial(theta0)
    wp.on_segment(block, 0)

    nat_path = str(tmp_path / "nat.csv")
    wn = ChainWriter(nat_path, use_native=True)
    wn.write_initial(theta0)
    wn.on_segment(block, 0)
    wn.close()

    a = np.loadtxt(py_path, delimiter=",").astype(np.float32)
    b = np.loadtxt(nat_path, delimiter=",").astype(np.float32)
    np.testing.assert_array_equal(a, b)
