"""Native C++ data-loader tests: builds the .so and checks parity with the
NumPy fallback paths."""

import numpy as np
import pytest

from competesmoe_tpu.data import native_loader as nl
from competesmoe_tpu.data.lm_data import TokenChunkDataset


@pytest.fixture(scope="module")
def lib():
    lib = nl.get_lib()
    if lib is None:
        pytest.skip("g++ unavailable; native loader not built")
    return lib


def test_gather_windows(lib):
    chunk = np.arange(1000, dtype=np.uint16)
    ids = np.asarray([0, 3, 7], np.int64)
    out = nl.gather_windows(chunk, ids, window=10)
    np.testing.assert_array_equal(out[0], np.arange(10))
    np.testing.assert_array_equal(out[1], np.arange(30, 40))
    assert out.dtype == np.int32


def test_assemble_batch_multichunk(lib):
    c0 = np.arange(100, dtype=np.uint16)
    c1 = np.arange(5000, 5100, dtype=np.uint16)
    out = nl.assemble_batch([c0, c1], np.asarray([0, 1, 1]),
                            np.asarray([2, 0, 4]), window=10)
    np.testing.assert_array_equal(out[0], np.arange(20, 30))
    np.testing.assert_array_equal(out[1], np.arange(5000, 5010))
    np.testing.assert_array_equal(out[2], np.arange(5040, 5050))


def test_assemble_batch_threads_match(lib):
    rng = np.random.default_rng(0)
    chunks = [rng.integers(0, 60000, 10000).astype(np.uint16)
              for _ in range(3)]
    n = 257
    cids = rng.integers(0, 3, n)
    lids = rng.integers(0, 100, n)
    a = nl.assemble_batch(chunks, cids, lids, window=33, n_threads=1)
    b = nl.assemble_batch(chunks, cids, lids, window=33, n_threads=8)
    np.testing.assert_array_equal(a, b)


def test_pad_batch(lib):
    seqs = [np.asarray([1, 2, 3]), np.asarray([5]),
            np.asarray([7, 8, 9, 10, 11])]
    ids, mask = nl.pad_batch(seqs, max_len=4, pad_id=0)
    np.testing.assert_array_equal(ids[0], [1, 2, 3, 0])
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 0])
    np.testing.assert_array_equal(ids[2], [7, 8, 9, 10])  # truncated
    np.testing.assert_array_equal(mask[1], [1, 0, 0, 0])


def test_dataset_batch_uses_native_and_matches_python(lib, tmp_path):
    a = np.arange(200, dtype=np.uint16)
    b = np.arange(3000, 3100, dtype=np.uint16)
    pa, pb = tmp_path / "a.bin", tmp_path / "b.bin"
    a.tofile(pa)
    b.tofile(pb)
    ds = TokenChunkDataset([pa, pb], unroll_len=9)
    idx = np.asarray([0, 5, 19, 20, 24])
    batch = ds.batch(idx)
    want = np.stack([ds[int(i)] for i in idx])
    np.testing.assert_array_equal(batch, want)


def test_background_fetcher():
    from competesmoe_tpu.data.lm_data import BackgroundFetcher
    counter = {"n": 0}

    def fetch():
        counter["n"] += 1
        return counter["n"]

    f = BackgroundFetcher(fetch, depth=2)
    got = [f.get() for _ in range(5)]
    assert got == [1, 2, 3, 4, 5]
    f.stop()
