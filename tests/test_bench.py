"""bench.py plumbing regression: every measurement path returns the
(fps, ms, ms_mean, ms_fused) tuple at a tiny shape, and the b1 fused-Pallas
paths are exact forwards of the same param tree (the driver runs bench.py
on real hardware every round — a broken path must fail HERE, not there)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("path,batch", [
    ("natural", 1),
    ("fast", 2),
    ("fastp", 2),
    ("b1", 1),
    ("b1_fold", 1),
])
def test_bench_measure_paths(path, batch):
    import bench
    from vst.models.faststyle import FastStyleNet

    model = FastStyleNet(n_styles=3)
    fps, ms, ms_mean, ms_fused = bench._measure(
        model, jnp.float32, batch, 16, 128, iters=2, path=path)
    assert fps > 0 and ms > 0 and ms_mean > 0
    assert np.isfinite(ms_fused) or np.isnan(ms_fused)


def test_bench_paths_agree_numerically():
    """All bench paths stylize identically (same param tree, exact math)."""
    from vst.models.faststyle import FastStyleNet
    from vst.models.faststyle_b1 import b1_stylize
    from vst.models.faststyle_fast import fast_stylize

    rng = np.random.RandomState(0)
    m = FastStyleNet(n_styles=3)
    x = jnp.asarray(rng.rand(1, 16, 128, 3).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x, 1.0, 0)["params"]
    _, want = m.apply({"params": p}, x, 1.0, 0)
    for name, got in [
        ("fast", fast_stylize(p, x, 1.0, 0, n_styles=3)[1]),
        ("fastp", fast_stylize(p, x, 1.0, 0, n_styles=3, trunk="pallas")[1]),
        ("b1", b1_stylize(p, x, 1.0, 0, n_styles=3)[1]),
        ("b1_fold", b1_stylize(p, x, 1.0, 0, n_styles=3, decoder="fold")[1]),
    ]:
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-3, err_msg=name)
