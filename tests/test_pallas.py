"""Pallas kernel tests (interpret mode on CPU; compiled path exercised on
real TPU by bench tooling)."""
import jax
import jax.numpy as jnp
import numpy as np

from yolo_tpu.pallas.decode_kernel import (best_cell_decode,
                                           best_cell_decode_xla)


def test_best_cell_decode_matches_xla():
    key = jax.random.PRNGKey(0)
    merged = jax.random.normal(key, (4, 512, 80))
    rows_p, idx_p = best_cell_decode(merged, interpret=True)
    rows_x, idx_x = best_cell_decode_xla(merged)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(rows_p), np.asarray(rows_x),
                               atol=1e-6)


def test_best_cell_decode_tie_breaks_to_first():
    merged = jnp.zeros((1, 16, 8)).at[0, 3, 0].set(5.0).at[0, 9, 0].set(5.0)
    _, idx = best_cell_decode(merged, interpret=True)
    assert int(idx[0]) == 3


def test_best_cell_decode_under_jit():
    merged = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 16))
    f = jax.jit(lambda m: best_cell_decode(m, interpret=True))
    rows, idx = f(merged)
    assert rows.shape == (2, 16) and idx.shape == (2,)
