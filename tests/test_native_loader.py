"""Native C++ chunk decoder: build, parity with Python path, throughput."""
import time

import numpy as np
import pytest

from forest_tpu.data import native, zarrlite as zl


@pytest.fixture(scope="module")
def big_array(tmp_path_factory, ):
    rng = np.random.default_rng(0)
    p = tmp_path_factory.mktemp("nat") / "a"
    a = zl.create_array(p, (64, 256, 256), (1, 256, 256), np.float32,
                        fill_value=float("nan"))
    data = rng.normal(size=(64, 256, 256)).astype(np.float32)
    a[:] = data
    return p, data


class TestNative:
    def test_builds_and_loads(self):
        assert native.available(), "native loader failed to build/load"

    def test_parity_with_python(self, big_array):
        p, data = big_array
        a = zl.ZarrArray(p)
        cidxs = [(i, 0, 0) for i in range(16)]
        nat = a.read_chunks_batch(cidxs, use_native=True)
        py = a.read_chunks_batch(cidxs, use_native=False)
        np.testing.assert_array_equal(nat, py)
        np.testing.assert_array_equal(nat[:, 0], data[:16])

    def test_missing_chunks_filled(self, tmp_path):
        a = zl.create_array(tmp_path / "m", (8, 4), (4, 4), np.float32,
                            fill_value=float("nan"))
        a[0:4] = 1.0  # only chunk (0,0) written
        out = a.read_chunks_batch([(0, 0), (1, 0)], use_native=True)
        assert np.all(out[0] == 1.0)
        assert np.all(np.isnan(out[1]))

    def test_int_dtype(self, tmp_path):
        a = zl.create_array(tmp_path / "i", (4, 4), (4, 4), np.int16,
                            fill_value=-1)
        a[:] = np.arange(16, dtype=np.int16).reshape(4, 4)
        out = a.read_chunks_batch([(0, 0)], use_native=True)
        np.testing.assert_array_equal(out[0].ravel(), np.arange(16))

    def test_throughput_not_slower(self, big_array):
        """Native parallel decode should beat sequential Python decode."""
        p, _ = big_array
        a = zl.ZarrArray(p)
        cidxs = [(i, 0, 0) for i in range(64)]
        a.read_chunks_batch(cidxs[:2], use_native=True)  # warm
        t0 = time.perf_counter()
        a.read_chunks_batch(cidxs, use_native=False)
        t_py = time.perf_counter() - t0
        t0 = time.perf_counter()
        a.read_chunks_batch(cidxs, use_native=True, nthreads=8)
        t_nat = time.perf_counter() - t0
        print(f"python {t_py*1e3:.1f}ms native {t_nat*1e3:.1f}ms "
              f"({t_py/max(t_nat,1e-9):.1f}x)")
        # Log-only comparison plus a pure smoke guard: wall-clock ratios
        # on the single-core host are too noisy for a functional assert.
        assert t_nat < t_py * 10


class TestNativeRobustness:
    def test_truncated_chunk_errors_not_segfault(self, tmp_path):
        """0-byte / truncated chunk files must raise, never SIGSEGV or
        silently fill (review-pass regression)."""
        a = zl.create_array(tmp_path / "t", (4, 4), (4, 4), np.float32,
                            fill_value=7.0)
        a[:] = np.ones((4, 4), np.float32)
        chunk = tmp_path / "t" / "0.0"
        chunk.write_bytes(b"")  # interrupted writer
        with pytest.raises(RuntimeError):
            a.read_chunks_batch([(0, 0)], use_native=True)
        with pytest.raises(RuntimeError, match="truncated"):
            a.read_chunks_batch([(0, 0)], use_native=False)
        chunk.write_bytes(b"\x02\x01" * 4)  # 8 bytes < header
        with pytest.raises(RuntimeError):
            a.read_chunks_batch([(0, 0)], use_native=True)

    def test_short_decode_raises_both_paths(self, tmp_path):
        """A chunk whose payload decompresses to the wrong size must raise
        on the native path just like the Python reshape does."""
        small = zl.create_array(tmp_path / "s", (2, 4), (2, 4), np.float32)
        small[:] = np.ones((2, 4), np.float32)
        big = zl.create_array(tmp_path / "b", (4, 4), (4, 4), np.float32,
                              fill_value=7.0)
        big[:] = np.ones((4, 4), np.float32)
        # swap in the smaller chunk's file
        (tmp_path / "b" / "0.0").write_bytes(
            (tmp_path / "s" / "0.0").read_bytes())
        with pytest.raises((RuntimeError, ValueError)):
            big.read_chunks_batch([(0, 0)], use_native=True)
        with pytest.raises((RuntimeError, ValueError)):
            big.read_chunks_batch([(0, 0)], use_native=False)

    def test_empty_batch_consistent(self, tmp_path):
        a = zl.create_array(tmp_path / "e", (4, 4), (4, 4), np.float32)
        for un in (True, False):
            out = a.read_chunks_batch([], use_native=un)
            assert out.shape == (0, 4, 4)

    def test_int_index_bounds(self, tmp_path):
        a = zl.create_array(tmp_path / "i", (4, 4), (4, 4), np.float32,
                            fill_value=float("nan"))
        a[:] = np.ones((4, 4), np.float32)
        with pytest.raises(IndexError):
            a[10]
        with pytest.raises(IndexError):
            a[-7]
        np.testing.assert_array_equal(a[-1], np.ones(4))
