"""bench.py plumbing regression: every measurement config returns the
(fps, ms, ms_mean, ms_fused) tuple at a tiny shape (the driver runs
bench.py on real hardware every round — a broken path must fail HERE,
not there). The alternate layout-propagated / fused-Pallas forwards were
deleted in round 4 (kill-or-fix, VERDICT r3 item 2); the natural forward
keeps its own exactness coverage in tests/test_kernels.py (s2d stem) and
tests/test_layout.py (subpixel decoder)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("donate,batch", [
    (False, 1),
    (False, 2),
    (True, 1),
])
def test_bench_measure_paths(donate, batch):
    import bench
    from vst.models.faststyle import FastStyleNet

    model = FastStyleNet(n_styles=3)
    fps, ms, ms_mean, ms_fused = bench._measure(
        model, jnp.float32, batch, 16, 128, iters=2, donate=donate)
    assert fps > 0 and ms > 0 and ms_mean > 0
    assert np.isfinite(ms_fused) or np.isnan(ms_fused)


def test_bench_donated_path_agrees_numerically():
    """Buffer donation must not change the stylization output."""
    import bench
    from vst.models.faststyle import FastStyleNet

    rng = np.random.RandomState(0)
    m = FastStyleNet(n_styles=3)
    x = jnp.asarray(rng.rand(1, 16, 128, 3).astype(np.float32))
    p = m.init(jax.random.PRNGKey(0), x, 1.0, 0)["params"]
    _, want = m.apply({"params": p}, x, 1.0, 0)
    want = np.clip(np.asarray(want) / 255.0, 0.0, 1.0)

    import functools

    stylize = functools.partial(jax.jit, donate_argnums=(1,))(
        lambda p_, img: jnp.clip(
            m.apply({"params": p_}, img, 1.0, 0)[1] / 255.0, 0.0, 1.0))
    got = np.asarray(stylize(p, jnp.copy(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)
