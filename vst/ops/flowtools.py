"""Forward-backward consistency masking — parity with ``utils/flowtools.py``.

Note the optimization-based method's vendored copy disables the occlusion
term (``methods/optimization-based/flowtools.py:35-55``); ``fbc_mask`` takes
``use_occlusion`` to cover both variants.
"""

from __future__ import annotations

import jax.numpy as jnp

from vst.ops.sample import warp


def gradient(x: jnp.ndarray) -> jnp.ndarray:
    """Zero-padded central difference, parity with ``utils/flowtools.py:12-16``.

    x: (B, H, W) single-channel map. Returns (2, B, H, W) = (dx, dy), where
    out-of-range neighbours are treated as 0 (torch pads with zeros before
    differencing, so border entries are ±x[neighbour]/2, not one-sided diffs).
    """
    right = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))[:, :, 1:]
    left = jnp.pad(x, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    dx = (right - left) / 2.0
    down = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
    up = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    dy = (down - up) / 2.0
    return jnp.stack([dx, dy], axis=0)


def fbc_mask(
    ff: jnp.ndarray, bf: jnp.ndarray, use_occlusion: bool = True
) -> jnp.ndarray:
    """Forward-backward consistency + motion-boundary occlusion mask.

    Parity with ``utils/flowtools.py:34-57`` (``fbcCheckTorch``). ff, bf:
    (B, H, W, 2) forward / backward flow. Returns (B, H, W, 1) float mask:
    1 = consistent, 0 = occluded or on a motion boundary.

    occ:  |warp(ff,bf) + bf|² > 0.01·(|wf|² + |bf|²) + 0.5
    mob:  |∇bf_u|² + |∇bf_v|² > 0.01·|bf|² + 0.002

    ``use_occlusion=False`` reproduces the optimization-based variant that
    comments out the occ term.
    """
    wf = warp(ff, bf)
    B, H, W, _ = bf.shape

    norm_b = jnp.sum(bf * bf, axis=-1)  # (B, H, W)

    mob_grad_u = gradient(bf[..., 0])
    mob_grad_v = gradient(bf[..., 1])
    norm_u = jnp.sum(mob_grad_u * mob_grad_u, axis=0)
    norm_v = jnp.sum(mob_grad_v * mob_grad_v, axis=0)
    mob = (norm_u + norm_v) > (0.01 * norm_b + 0.002)

    mask = jnp.ones((B, H, W), dtype=bf.dtype)
    if use_occlusion:
        norm_wb = jnp.sum((wf + bf) ** 2, axis=-1)
        norm_w = jnp.sum(wf * wf, axis=-1)
        occ = norm_wb > (0.01 * (norm_w + norm_b) + 0.5)
        mask = jnp.where(occ, 0.0, mask)
    mask = jnp.where(mob, 0.0, mask)
    return mask[..., None]


def forward_interpolate(flow):
    """Forward-splat a flow field and re-interpolate onto the regular grid.

    Host-side parity with ``utils/raft/raft/utils/utils.py:26-54``
    (``forward_interpolate``) — the RAFT warm-start op: each source pixel is
    moved by its own flow vector, and the scattered (dx, dy) samples are
    nearest-neighbour interpolated (SciPy ``griddata``) back onto the
    regular grid. Points landing outside the open interval (0, W)×(0, H)
    are dropped, matching the reference's validity test.

    flow: (H, W, 2) numpy array, channel-last (u, v) — the vst layout
    (the reference takes (2, H, W)). Returns (H, W, 2) float32 numpy.
    This is an eval/warm-start host op, not a jit op (data-dependent
    scatter; the reference also runs it on host via SciPy).
    """
    import numpy as np
    from scipy import interpolate

    flow = np.asarray(flow, dtype=np.float32)
    dx, dy = flow[..., 0], flow[..., 1]
    ht, wd = dx.shape
    x0, y0 = np.meshgrid(np.arange(wd), np.arange(ht))

    x1 = (x0 + dx).reshape(-1)
    y1 = (y0 + dy).reshape(-1)
    dxf = dx.reshape(-1)
    dyf = dy.reshape(-1)

    valid = (x1 > 0) & (x1 < wd) & (y1 > 0) & (y1 < ht)
    x1, y1, dxf, dyf = x1[valid], y1[valid], dxf[valid], dyf[valid]

    flow_x = interpolate.griddata(
        (x1, y1), dxf, (x0, y0), method="nearest", fill_value=0)
    flow_y = interpolate.griddata(
        (x1, y1), dyf, (x0, y0), method="nearest", fill_value=0)
    return np.stack([flow_x, flow_y], axis=-1).astype(np.float32)
