import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu import core


def test_clamp():
    assert core.clamp(5.0, 0.0, 1.0) == 1.0
    assert core.clamp(-5.0, 0.0, 1.0) == 0.0
    assert core.clamp(0.5, 0.0, 1.0) == 0.5
    # reversed range is swapped, like the Go reference
    assert core.clamp(5.0, 1.0, 0.0) == 1.0
    np.testing.assert_allclose(core.clamp(jnp.array([-1.0, 0.5, 2.0]), 0.0, 1.0),
                               [0.0, 0.5, 1.0])


def test_nearly_equal():
    assert bool(core.nearly_equal(1.0, 1.0))
    assert bool(core.nearly_equal(1.0, 1.0 + 1e-13))
    assert not bool(core.nearly_equal(1.0, 1.1))
    assert bool(core.nearly_equal(0.0, 0.0))
    # relative comparison for large values
    assert bool(core.nearly_equal(1e15, 1e15 * (1 + 1e-13)))


def test_db_conversions():
    np.testing.assert_allclose(core.db_to_linear(jnp.array(20.0)), 10.0, rtol=1e-12)
    np.testing.assert_allclose(core.db_to_linear(jnp.array(-20.0)), 0.1, rtol=1e-12)
    np.testing.assert_allclose(core.linear_to_db(jnp.array(10.0)), 20.0, rtol=1e-12)
    assert np.isneginf(core.linear_to_db(jnp.array(0.0)))
    assert np.isnan(core.linear_to_db(jnp.array(-1.0)))
    np.testing.assert_allclose(core.db_power_to_linear(jnp.array(10.0)), 10.0, rtol=1e-12)
    np.testing.assert_allclose(core.linear_power_to_db(jnp.array(100.0)), 20.0, rtol=1e-12)
    # round trip
    for db in [-60.0, -6.0, 0.0, 6.0, 60.0]:
        np.testing.assert_allclose(core.linear_to_db(core.db_to_linear(jnp.array(db))),
                                   db, rtol=1e-10)


def test_flush_denormals():
    x = jnp.array([1e-31, -1e-31, 1e-29, 1.0, 0.0])
    out = np.asarray(core.flush_denormals(x))
    np.testing.assert_array_equal(out, [0.0, 0.0, 1e-29, 1.0, 0.0])


def test_next_pow2():
    assert core.next_pow2(1) == 1
    assert core.next_pow2(2) == 2
    assert core.next_pow2(3) == 4
    assert core.next_pow2(1024) == 1024
    assert core.next_pow2(1025) == 2048


def test_buffer_semantics():
    """Host staging Buffer mirrors the reference reuse contract
    (`dsp/buffer/buffer.go:40-95`): grow preserves, resize zeroes newly
    exposed stale elements, zero_range clamps."""
    from algodsp_tpu.core import Buffer
    b = Buffer(4)
    b.samples[:] = [1, 2, 3, 4]
    b.grow(8)
    assert len(b) == 4 and b.capacity >= 8
    np.testing.assert_array_equal(b.samples, [1, 2, 3, 4])
    b.resize(2)            # shrink leaves stale data in capacity...
    b.resize(6)            # ...which re-expansion must zero
    np.testing.assert_array_equal(b.samples, [1, 2, 0, 0, 0, 0])
    b.samples[:] = 7
    b.zero_range(-5, 2)
    b.zero_range(4, 99)
    np.testing.assert_array_equal(b.samples, [0, 0, 7, 7, 0, 0])
    c = b.copy()
    c.samples[:] = 1
    assert b.samples[2] == 7  # deep copy
    w = Buffer.from_array(np.arange(3, dtype=np.float32))
    assert len(w) == 3 and w.samples[1] == 1.0


def test_pool_reuses_backing_storage():
    from algodsp_tpu.core import Pool
    p = Pool()
    b1 = p.get(64)
    b1.samples[:] = 5
    backing = b1.samples.ctypes.data
    p.put(b1)
    b2 = p.get(32)  # reuses the same backing array, zeroed
    assert b2.samples.ctypes.data == backing
    assert len(b2) == 32
    np.testing.assert_array_equal(b2.samples, np.zeros(32))
    b3 = p.get(16)  # pool empty -> fresh allocation, distinct storage
    assert b3.samples.ctypes.data != backing


def test_pool_threaded_smoke():
    import threading
    from algodsp_tpu.core import Pool
    p = Pool()
    errs = []

    def worker(seed):
        try:
            rng = np.random.default_rng(seed)
            for _ in range(200):
                n = int(rng.integers(1, 256))
                b = p.get(n)
                assert len(b) == n and not b.samples.any()
                b.samples[:] = seed
                p.put(b)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=worker, args=(i + 1,)) for i in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs


def test_pool_picks_largest_and_rejects_foreign_dtype():
    from algodsp_tpu.core import Buffer, Pool
    p = Pool()
    small, big = Buffer(16), Buffer(65536)
    big_ptr = big.samples.ctypes.data
    p.put(small)
    p.put(big)
    got = p.get(65536)  # must select the large backing, not LIFO
    assert got.samples.ctypes.data == big_ptr
    with pytest.raises(ValueError):
        p.put(Buffer(8, np.float64))
