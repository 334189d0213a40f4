"""torch-exact L-BFGS under jit.

The reference's OBST drives ``torch.optim.LBFGS`` with the default
parameters — lr=1, max_iter=20 per ``.step(closure)``, NO line search,
history_size=100 — inside ``while n_iter[0] <= max_iter: optimizer.step(...)``
(obst_eval.py:383-404). That has two consequences the original vst OBST
(optax ``scale_by_lbfgs``) did not reproduce:

1. torch scales the FIRST step by ``min(1, 1/‖g‖₁)·lr`` (lbfgs.py
   "reset initial guess for step size"); optax steps the full unit step.
   L-BFGS trajectories never re-converge after a different first iterate,
   which capped pipeline-level parity with the living harness.
2. the outer while loop counts CLOSURE CALLS (20 per ``.step``), so the
   true per-level iteration counts for ``max_iters=[50,40,30]`` are
   ``[60,60,40]`` — each level keeps stepping until the call count
   EXCEEDS the configured max.

This module replicates ``torch.optim.LBFGS.step`` (no-line-search branch)
exactly: same two-loop recursion with ``ys > 1e-10`` curvature gating, same
``H_diag = ys/(y·y)`` scaling, same first-step rule, and the same four
break conditions (``max|g| ≤ tol_grad``, ``gtd > −tol_change``,
``max|t·d| ≤ tol_change``, ``|Δloss| < tol_change``) emulated as a
freeze flag inside a fixed-length ``lax.scan`` (data-dependent exits can't
change the compiled program; a frozen carry is bit-identical to torch's
early break because closure re-evaluations at an unchanged x are no-ops).

Unit-tested trajectory-exactly against ``torch.optim.LBFGS`` in
tests/test_lbfgs.py.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp


class _Carry(NamedTuple):
    x: jnp.ndarray          # flat iterate (n,)
    prev_g: jnp.ndarray     # gradient at x_{k-1}'s eval (n,)
    prev_loss: jnp.ndarray  # f(x_{k-1})
    d: jnp.ndarray          # last direction (n,)
    t: jnp.ndarray          # last step length ()
    S: jnp.ndarray          # (m, n) step history
    Y: jnp.ndarray          # (m, n) grad-diff history
    rho: jnp.ndarray        # (m,)
    count: jnp.ndarray      # valid history entries ()
    H_diag: jnp.ndarray     # ()
    done: jnp.ndarray       # bool () — a torch break condition triggered


def torch_eval_counts(max_iters: Sequence[int],
                      evals_per_step: int = 20) -> tuple:
    """Closure-call counts of ``while n <= max_iter: opt.step(closure)``
    with torch's default max_iter=20 per step: each full step adds 20
    calls, the loop runs until the count EXCEEDS the cap
    (obst_eval.py:386-404) — [50, 40, 30] really runs [60, 60, 40]."""
    out = []
    for mi in max_iters:
        n = 0
        while n <= mi:
            n += evals_per_step
        out.append(n)
    return tuple(out)


def _compact_direction(g, S, Y, rho, count, H_diag):
    """Compact-representation L-BFGS direction (Byrd–Nocedal–Schnabel):
    mathematically identical to the two-loop recursion on the same history,
    but built from TWO (m,n) matvecs + O(m²) small ops instead of 2·m
    SEQUENTIAL n-vector dots. On the TPU the sequential dots are pure
    latency (~120 tiny ops per L-BFGS iteration at OBST's full-res level —
    round-2 measured them dominating the whole OBST frame time); the
    compact form turns them into two MXU matvecs.

        H = γI + [S  γY] · [ R⁻ᵀ(D+γYᵀY)R⁻¹   −R⁻ᵀ ]   [Sᵀ ]
                           [ −R⁻¹               0   ] · [γYᵀ]

    with R = upper-triangular part of SᵀY (incl. diagonal), D = diag(SᵀY),
    γ = H_diag. Invalid history slots (≥ count) are masked out of R/D by
    giving them identity diagonal rows, which zeroes their contribution
    exactly like the two-loop's shorter python lists."""
    m = S.shape[0]
    valid = (jnp.arange(m) < count)
    Sg = S @ g          # (m,)  — one matvec reads the whole S buffer
    Yg = Y @ g          # (m,)
    STY = S @ Y.T       # (m, m) small vs n; recomputed for simplicity
    vv = jnp.outer(valid, valid)
    STY = jnp.where(vv, STY, 0.0)
    D = jnp.diag(jnp.diag(STY))  # diagonal MATRIX of s_i·y_i
    R = jnp.triu(STY)
    # identity rows for invalid slots keep R invertible and inert
    eye = jnp.eye(m, dtype=g.dtype)
    R = jnp.where(vv, R, 0.0) + jnp.where(valid, 0.0, 1.0)[:, None] * eye
    YTY = jnp.where(vv, Y @ Y.T, 0.0)

    from jax.scipy.linalg import solve_triangular

    g1 = jnp.where(valid, Sg, 0.0)
    g2 = H_diag * jnp.where(valid, Yg, 0.0)
    p2 = solve_triangular(R, g1, lower=False)          # R⁻¹ Sᵀg
    mid = (D + H_diag * YTY) @ p2 - g2
    p1 = solve_triangular(R.T, mid, lower=True)        # R⁻ᵀ(...)
    p1 = jnp.where(valid, p1, 0.0)
    p2 = jnp.where(valid, p2, 0.0)
    Hg = H_diag * g + S.T @ p1 - H_diag * (Y.T @ p2)
    return -Hg


def _two_loop(g, S, Y, rho, count, H_diag):
    """torch's collapsed two-loop recursion with validity masking (entries
    ≥ count are zeros; rho is 0 there so the al/beta contributions vanish
    exactly like torch's shorter python lists)."""
    m = S.shape[0]

    def bwd(i, qa):
        q, al = qa
        j = m - 1 - i
        valid = j < count
        al_j = jnp.where(valid, rho[j] * jnp.dot(S[j], q), 0.0)
        q = q - al_j * Y[j]
        return q, al.at[j].set(al_j)

    q, al = jax.lax.fori_loop(
        0, m, bwd, (-g, jnp.zeros((m,), g.dtype)))
    r = q * H_diag

    def fwd(j, r):
        valid = j < count
        be_j = jnp.where(valid, rho[j] * jnp.dot(Y[j], r), 0.0)
        return r + (al[j] - be_j) * S[j]

    return jax.lax.fori_loop(0, m, fwd, r)


def lbfgs_minimize(
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    num_iters: int,
    lr: float = 1.0,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
    history_size: int | None = None,
    impl: str = "two_loop",
):
    """Run ``num_iters`` torch-semantics L-BFGS iterations on ``loss_fn``
    from ``x0`` (any shape; flattened internally). Returns (x, losses).

    ``history_size`` defaults to num_iters (the reference never evicts:
    torch's default 100 exceeds every level's iteration count).
    ``impl``: "two_loop" = torch's literal recursion (2·m sequential
    n-dots — latency-bound on TPU); "compact" = the mathematically
    identical Byrd–Nocedal–Schnabel matrix form (two (m,n) matvecs +
    O(m²) ops — what OBST uses in production; unit-tested equal)."""
    shape = x0.shape
    n = x0.size
    m = history_size or num_iters
    assert m >= num_iters, (
        "history eviction is not implemented (torch's default history 100 "
        ">= every OBST level's iteration count)")

    def flat_loss(xf):
        return loss_fn(xf.reshape(shape))

    vg = jax.value_and_grad(flat_loss)

    def body(c: _Carry, k):
        loss, g = vg(c.x)
        first = k == 0

        # --- history update (skipped entirely on iteration 0) ------------
        y = g - c.prev_g
        s = c.d * c.t
        ys = jnp.dot(y, s)
        do_append = jnp.logical_and(jnp.logical_not(first), ys > 1e-10)
        idx = jnp.where(do_append, c.count, m - 1)  # write target (masked)
        upd = jnp.where(do_append, 1.0, 0.0)
        S = c.S.at[idx].set(jnp.where(do_append, s, c.S[idx]))
        Y = c.Y.at[idx].set(jnp.where(do_append, y, c.Y[idx]))
        rho = c.rho.at[idx].set(jnp.where(do_append, 1.0 / ys, c.rho[idx]))
        count = c.count + upd.astype(c.count.dtype)
        H_diag = jnp.where(do_append, ys / jnp.dot(y, y), c.H_diag)

        direction = (_compact_direction if impl == "compact"
                     else _two_loop)
        d = jnp.where(first, -g, direction(g, S, Y, rho, count, H_diag))
        t = jnp.where(first,
                      jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(g))) * lr,
                      lr)

        # --- torch break conditions --------------------------------------
        gtd = jnp.dot(g, d)
        opt_cond = jnp.max(jnp.abs(g)) <= tolerance_grad
        # evaluated BEFORE the update: these freeze x at x_k. The Δloss and
        # opt_cond breaks are torch's POST-update checks of iteration k−1,
        # which is the same program point (prev_loss starts at +inf, so the
        # Δloss term can't trigger on iteration 0).
        loss_stall = jnp.abs(loss - c.prev_loss) < tolerance_change
        done_pre = (c.done | opt_cond | (gtd > -tolerance_change)
                    | loss_stall)

        x_new = jnp.where(done_pre, c.x, c.x + t * d)
        # evaluated AFTER the update: these freeze x at x_{k+1}
        done_post = done_pre | (
            jnp.max(jnp.abs(t * d)) <= tolerance_change)

        new = _Carry(x=x_new, prev_g=g, prev_loss=loss, d=d, t=t,
                     S=S, Y=Y, rho=rho, count=count, H_diag=H_diag,
                     done=done_post)
        return new, loss

    dt = x0.dtype if jnp.issubdtype(x0.dtype, jnp.floating) else jnp.float32
    init = _Carry(
        x=x0.reshape(-1).astype(dt),
        prev_g=jnp.zeros((n,), dt),
        prev_loss=jnp.asarray(jnp.inf, dt),
        d=jnp.zeros((n,), dt),
        t=jnp.asarray(0.0, dt),
        S=jnp.zeros((m, n), dt),
        Y=jnp.zeros((m, n), dt),
        rho=jnp.zeros((m,), dt),
        count=jnp.asarray(0, jnp.int32),
        H_diag=jnp.asarray(1.0, dt),
        done=jnp.asarray(False),
    )
    final, losses = jax.lax.scan(body, init, jnp.arange(num_iters))
    return final.x.reshape(shape), losses
