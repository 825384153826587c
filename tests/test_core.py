import numpy as np
import jax.numpy as jnp

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
