"""vst.ops.lbfgs vs torch.optim.LBFGS — trajectory-exact parity.

The OBST pipeline-parity tests (test_pipeline_parity.py) need the vst
optimizer to walk the SAME iterates as the reference's
``while n <= max_iter: optimizer.step(closure)`` driver
(obst_eval.py:383-404); these tests pin that at the optimizer level on
objectives shaped like the OBST closure (quartic well + a Gram-style
quadratic term), including the first-step ``min(1, 1/‖g‖₁)`` scaling and
the closure-call counting of the outer while loop."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from vst.ops.lbfgs import lbfgs_minimize, torch_eval_counts


def _torch_reference_driver(loss_t, x0, max_iter):
    """The reference's exact driver: closure-call counter + default LBFGS."""
    x = torch.tensor(x0, requires_grad=True)
    opt = torch.optim.LBFGS([x])
    n_iter = [0]

    def closure():
        opt.zero_grad()
        loss = loss_t(x)
        loss.backward()
        n_iter[0] += 1
        return loss

    while n_iter[0] <= max_iter:
        opt.step(closure)
    return x.detach().numpy(), n_iter[0]


def _quartic_pair(A_np, b_np):
    A_t = torch.tensor(A_np)
    b_t = torch.tensor(b_np)
    A_j = jnp.asarray(A_np)
    b_j = jnp.asarray(b_np)

    def f_t(x):
        r = A_t @ x - b_t
        return (r ** 2).mean() + 0.01 * (x ** 4).sum()

    def f_j(x):
        r = A_j @ x - b_j
        return (r ** 2).mean() + 0.01 * (x ** 4).sum()

    return f_t, f_j


def test_eval_counts_match_reference_driver():
    """[50, 40, 30] really runs [60, 60, 40] closure calls (absent tolerance
    breaks — the style objectives never trigger them within a level), and
    when a tolerance break DOES fire early, the freeze emulation still lands
    on torch's final iterate."""
    assert torch_eval_counts([50, 40, 30]) == (60, 60, 40)
    rng = np.random.RandomState(0)
    A = rng.randn(6, 6).astype(np.float32)
    b = rng.randn(6).astype(np.float32)
    f_t, f_j = _quartic_pair(A, b)
    for cap in (50, 40, 30):
        ref, n = _torch_reference_driver(f_t, np.zeros(6, np.float32), cap)
        (iters,) = torch_eval_counts([cap])
        assert n <= iters  # breaks only shorten the torch run
        got, _ = lbfgs_minimize(f_j, jnp.zeros((6,)), num_iters=iters)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-3,
                                   atol=1e-4)


@pytest.mark.parametrize("seed,n,iters", [(0, 8, 20), (1, 24, 60)])
def test_lbfgs_trajectory_parity(seed, n, iters):
    rng = np.random.RandomState(seed)
    A = (rng.randn(n, n) / np.sqrt(n)).astype(np.float32)
    b = rng.randn(n).astype(np.float32)
    x0 = rng.randn(n).astype(np.float32)
    f_t, f_j = _quartic_pair(A, b)

    # drive torch for exactly `iters` internal iterations (3 × step(20))
    x = torch.tensor(x0, requires_grad=True)
    opt = torch.optim.LBFGS([x])

    def closure():
        opt.zero_grad()
        loss = f_t(x)
        loss.backward()
        return loss

    for _ in range(iters // 20):
        opt.step(closure)
    ref = x.detach().numpy()

    got, losses = lbfgs_minimize(f_j, jnp.asarray(x0), num_iters=iters)
    got = np.asarray(got)
    # identical arithmetic (the freeze emulation only reorders no-ops); f32
    # accumulation-order noise wobbles x along flat directions near the
    # optimum, so pin the objective value tightly and x loosely
    np.testing.assert_allclose(got, ref, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(float(f_j(jnp.asarray(got))),
                               float(f_j(jnp.asarray(ref))), rtol=1e-5)
    assert float(losses[-1]) < float(losses[0])


def test_lbfgs_first_step_scaling():
    """With a large gradient the first step must be ‖g‖₁-scaled (this is
    exactly what optax.scale_by_lbfgs does NOT do)."""
    g0 = 50.0

    def f_j(x):
        return g0 * x.sum() + 0.5 * (x ** 2).sum()

    x, _ = lbfgs_minimize(f_j, jnp.zeros((4,)), num_iters=1)
    # d = −g, t = min(1, 1/(4·50)) = 1/200 → x = −50/200 each
    np.testing.assert_allclose(np.asarray(x), -0.25 * np.ones(4), rtol=1e-6)


def test_lbfgs_matches_torch_on_image_shaped_objective():
    """2-D image iterate + Gram-flavored objective (what OBST optimizes)."""
    rng = np.random.RandomState(3)
    H = W = 6
    target = rng.rand(H, W).astype(np.float32)
    x0 = rng.rand(H, W).astype(np.float32)

    def f_t(x):
        gram = x @ x.T / W
        gt = torch.tensor(target) @ torch.tensor(target).T / W
        return ((gram - gt) ** 2).mean() + 0.1 * ((x - torch.tensor(target)) ** 2).mean()

    def f_j(x):
        gram = x @ x.T / W
        gt = jnp.asarray(target) @ jnp.asarray(target).T / W
        return ((gram - gt) ** 2).mean() + 0.1 * ((x - jnp.asarray(target)) ** 2).mean()

    ref, n = _torch_reference_driver(f_t, x0, max_iter=30)
    got, _ = lbfgs_minimize(f_j, jnp.asarray(x0), num_iters=n)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("seed,n,iters", [(0, 8, 20), (2, 24, 40)])
def test_compact_equals_two_loop(seed, n, iters):
    """The compact (Byrd–Nocedal–Schnabel) direction is mathematically the
    two-loop recursion — same iterates up to f32 reduction order."""
    rng = np.random.RandomState(seed)
    A = (rng.randn(n, n) / np.sqrt(n)).astype(np.float32)
    b = rng.randn(n).astype(np.float32)
    x0 = rng.randn(n).astype(np.float32)
    _, f_j = _quartic_pair(A, b)

    x_tl, l_tl = lbfgs_minimize(f_j, jnp.asarray(x0), num_iters=iters)
    x_cp, l_cp = lbfgs_minimize(f_j, jnp.asarray(x0), num_iters=iters,
                                impl="compact")
    np.testing.assert_allclose(np.asarray(l_cp), np.asarray(l_tl),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(float(f_j(x_cp)), float(f_j(x_tl)),
                               rtol=1e-4)


def test_compact_matches_torch_on_image_objective():
    rng = np.random.RandomState(3)
    H = W = 6
    target = rng.rand(H, W).astype(np.float32)
    x0 = rng.rand(H, W).astype(np.float32)

    def f_t(x):
        gram = x @ x.T / W
        gt = torch.tensor(target) @ torch.tensor(target).T / W
        return ((gram - gt) ** 2).mean() + 0.1 * ((x - torch.tensor(target)) ** 2).mean()

    def f_j(x):
        gram = x @ x.T / W
        gt = jnp.asarray(target) @ jnp.asarray(target).T / W
        return ((gram - gt) ** 2).mean() + 0.1 * ((x - jnp.asarray(target)) ** 2).mean()

    ref, nev = _torch_reference_driver(f_t, x0, max_iter=30)
    got, _ = lbfgs_minimize(f_j, jnp.asarray(x0), num_iters=nev,
                            impl="compact")
    np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-3, atol=5e-4)
