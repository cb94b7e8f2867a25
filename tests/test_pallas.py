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


def test_best_cell_decode_ignores_nonfinite_losers():
    """inf/NaN in a LOSING row must not corrupt the winner's columns
    (0 * inf = NaN under a multiplicative one-hot mask)."""
    merged = (jnp.ones((1, 16, 8))
              .at[0, 3, 0].set(5.0)            # winner: row 3
              .at[0, 9, 2].set(jnp.inf)        # overflowed losing row
              .at[0, 11, 4].set(jnp.nan))
    rows, idx = best_cell_decode(merged, interpret=True)
    assert int(idx[0]) == 3
    assert np.all(np.isfinite(np.asarray(rows)))
    np.testing.assert_allclose(
        np.asarray(rows[0]), np.asarray(merged[0, 3]), atol=1e-6)


def test_best_cell_decode_under_jit():
    merged = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 16))
    f = jax.jit(lambda m: best_cell_decode(m, interpret=True))
    rows, idx = f(merged)
    assert rows.shape == (2, 16) and idx.shape == (2,)


def test_decode_car_pallas_matches_xla():
    """The integrated fused decode must agree with the XLA path (and hence
    with the recorded reference semantics in tests/test_parity.py)."""
    import os
    from yolo_tpu.decode import decode_car, decode_car_pallas
    from yolo_tpu.ops.boxes import make_grid_tables

    g = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                             "parity.npz"))
    size = (320, 512)
    anchors = [
        [[0.2216, 0.1552], [0.2144, 0.2408], [0.2825, 0.3456]],
        [[0.3959, 0.2706], [0.3703, 0.4351], [0.5708, 0.4278]],
        [[0.4345, 0.6063], [0.5584, 0.7174], [0.7448, 0.6772]]]
    grids = make_grid_tables(size, [int(s) for s in g["car_steps"]], anchors)
    outs = [jnp.asarray(g[f"car_out{i}"]) for i in range(3)]
    ref = np.asarray(decode_car(outs, grids, [1, 3, 5, 6, 30], size))
    got = np.asarray(decode_car_pallas(outs, grids, [1, 3, 5, 6, 30], size))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_decode_lp_pallas_matches_xla():
    import os
    from yolo_tpu.decode import decode_lp, decode_lp_pallas

    g = np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                             "parity.npz"))
    lp_map = jnp.asarray(g["lp_map"])
    r_max = list(g["lp_r_max"])
    ref = np.asarray(decode_lp(lp_map, r_max))
    got = np.asarray(decode_lp_pallas(lp_map, r_max))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_fused_conv3x3_bn_leaky_matches_xla():
    from yolo_tpu.pallas.conv_kernel import (conv3x3_bn_leaky_xla,
                                             fused_conv3x3_bn_leaky)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 24, 32), jnp.float32)
    w = jax.random.normal(key, (3, 3, 32, 64), jnp.float32) * 0.05
    scale = jnp.linspace(0.5, 1.5, 64)
    bias = jnp.linspace(-1.0, 1.0, 64)
    ref = conv3x3_bn_leaky_xla(x, w, scale, bias)
    got = fused_conv3x3_bn_leaky(x, w, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)


def test_fused_conv_negative_slope_and_tiling():
    from yolo_tpu.pallas.conv_kernel import (conv3x3_bn_leaky_xla,
                                             fused_conv3x3_bn_leaky)
    key = jax.random.PRNGKey(3)
    # H=12 forces tile_h=12; Cout=96 forces tile_cout=96
    x = jax.random.normal(key, (1, 12, 20, 16), jnp.float32)
    w = jax.random.normal(key, (3, 3, 16, 96), jnp.float32) * 0.1
    scale = jnp.ones((96,))
    bias = jnp.zeros((96,))
    ref = conv3x3_bn_leaky_xla(x, w, scale, bias, alpha=0.25)
    got = fused_conv3x3_bn_leaky(x, w, scale, bias, alpha=0.25,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4)
    assert float(jnp.min(got)) < 0   # leaky, not relu


def test_convbnleaky_fused_dispatch_matches_xla(monkeypatch):
    """The per-shape dispatch in ConvBNLeaky must (a) fire only for the
    winning shapes, (b) reuse the standard Conv_0/BatchNorm_0 param tree
    (trained checkpoints restore unchanged), and (c) match the XLA path
    numerically with folded BN stats."""
    from yolo_tpu.models import layers

    m = layers.ConvBNLeaky(128, 3)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 56, 56, 64),
                          jnp.float32) * 0.5
    variables = m.init(jax.random.PRNGKey(1), x, train=True)
    # give BN stats non-trivial values so folding is actually exercised
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    bs = variables["batch_stats"]["BatchNorm_0"]
    bs["mean"] = jnp.linspace(-0.2, 0.2, 128)
    bs["var"] = jnp.linspace(0.5, 1.5, 128)

    ref = m.apply(variables, x, train=False)      # XLA path (CPU backend)

    # the dispatch is opt-in (the whole-model chip A/B favoured XLA:
    # 1079 vs 995 FPS) — enable it explicitly to exercise the path
    monkeypatch.setenv("YOLO_TPU_FUSED_CONV", "1")
    monkeypatch.setattr(layers, "_on_tpu", lambda: True)
    got = m.apply(variables, x, train=False)      # fused path (interpret)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4)

    # non-winning shape must stay on XLA even when "on tpu"
    m2 = layers.ConvBNLeaky(64, 3)
    x2 = jax.random.normal(jax.random.PRNGKey(2), (1, 14, 14, 32))
    v2 = m2.init(jax.random.PRNGKey(3), x2, train=True)
    out2 = m2.apply(v2, x2, train=False)
    assert out2.shape == (1, 14, 14, 64)

    # kill-switch honoured
    monkeypatch.setenv("YOLO_TPU_FUSED_CONV", "0")
    off = m.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(off), np.asarray(ref), atol=1e-6)
