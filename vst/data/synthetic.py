"""Synthetic-motion dataset generation (host-side numpy).

TPU-native rebuild of the COCO affine-motion tuple generator
(``methods/learning-based/dataset-generation/coco-generation.py:115-360``):
from a still image, synthesize an n-frame sequence by random
translate-scale-rotate (TSR) affine transforms, with **analytic** forward /
backward flow derived from the affine matrices and forward-backward
consistency masks. Because the flow is exact, this doubles as the analytic
oracle for warp/TCL unit tests (SURVEY.md §4).

Frames are center-cropped to the batch size after transforming, so motion
brings fresh content in from the borders rather than zeros.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import cv2


def _tsr_matrix(rng: np.random.RandomState, hw, pmin=-32, pmax=32) -> np.ndarray:
    """Random translate/scale/rotate 3×3 matrix, parameter ranges matching
    ``coco-generation.py:150-172`` (shifts/rot ∈ [−32,32), scale from the
    same pixel range relative to min(h, w))."""
    shift_y, shift_x, rot = rng.randint(pmin, pmax, size=3)
    pix_range = np.arange(pmin, pmax + 2, 2)
    scal_px = rng.choice(pix_range)
    rows, cols = hw
    size = min(rows, cols)
    scal = (size + scal_px) / size

    T = np.float32([[1, 0, shift_x], [0, 1, shift_y], [0, 0, 1]])
    RS = cv2.getRotationMatrix2D((cols / 2, rows / 2), float(rot), float(scal))
    RS = np.vstack((RS, np.float32([0, 0, 1])))
    return np.matmul(T, RS)


def _affine_flow(tsr: np.ndarray, hw) -> Tuple[np.ndarray, np.ndarray]:
    """Exact forward/backward flow of an affine map on the full grid.

    Forward flow at p (frame1 → frame2 content): A⁻¹·p − p; backward flow
    at p (frame2 → frame1): A·p − p — matching the reference's
    ``compute_flow`` (which warps the coordinate grid through the forward /
    inverse transforms, ``coco-generation.py:209-223``) but evaluated
    analytically instead of through cv2.warpAffine resampling.
    """
    h, w = hw
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    grid = np.stack([xs, ys, np.ones_like(xs)], axis=-1)  # (h, w, 3)

    inv = np.linalg.inv(tsr).astype(np.float32)
    fw = np.einsum("ij,hwj->hwi", inv[:2], grid) - grid[..., :2]
    bw = np.einsum("ij,hwj->hwi", tsr[:2].astype(np.float32), grid) - grid[..., :2]
    return fw, bw


def _fbc_mask_np(ff: np.ndarray, bf: np.ndarray) -> np.ndarray:
    """Host-side fb-consistency mask with the same thresholds as
    ``utils/flowtools.py:34-57`` (nearest-sample approximation of the warp —
    adequate for datagen masks, exact masks come from vst.ops.fbc_mask)."""
    h, w, _ = bf.shape
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    fx = xs + bf[..., 0]
    fy = ys + bf[..., 1]
    sx = np.clip(np.round(fx).astype(np.int64), 0, w - 1)
    sy = np.clip(np.round(fy).astype(np.int64), 0, h - 1)
    wf = ff[sy, sx]
    # zero padding outside the frame, like torch grid_sample — this is what
    # masks off content that left the crop (|0 + bf|² > 0.01·|bf|² + 0.5)
    inside = ((fx >= 0) & (fx <= w - 1) & (fy >= 0) & (fy <= h - 1))[..., None]
    wf = np.where(inside, wf, 0.0)

    norm_wb = np.sum((wf + bf) ** 2, axis=-1)
    norm_w = np.sum(wf ** 2, axis=-1)
    norm_b = np.sum(bf ** 2, axis=-1)
    occ = norm_wb > 0.01 * (norm_w + norm_b) + 0.5

    def grad(x):
        dx = (np.pad(x, ((0, 0), (0, 1)))[:, 1:] - np.pad(x, ((0, 0), (1, 0)))[:, :-1]) / 2
        dy = (np.pad(x, ((0, 1), (0, 0)))[1:, :] - np.pad(x, ((1, 0), (0, 0)))[:-1, :]) / 2
        return dx, dy

    gux, guy = grad(bf[..., 0])
    gvx, gvy = grad(bf[..., 1])
    mob = (gux**2 + guy**2 + gvx**2 + gvy**2) > 0.01 * norm_b + 0.002

    mask = np.ones((h, w), np.float32)
    mask[occ | mob] = 0.0
    return mask[..., None]


class AffineMotionGenerator:
    """Generates (frames, flows, masks) tuples from still images.

    Output per tuple (crop size (ch, cw), n frames):
      frames: (n, ch, cw, 3) float32 [0,1]
      flows:  (n−1, ch, cw, 2) backward flow frame_{i+1}→frame_i
      masks:  (n−1, ch, cw, 1) consistency masks
    """

    def __init__(self, crop_hw=(256, 256), seed: int = 0):
        self.crop_hw = crop_hw
        self.rng = np.random.RandomState(seed)

    def _center_crop(self, x: np.ndarray) -> np.ndarray:
        ch, cw = self.crop_hw
        h, w = x.shape[:2]
        cy, cx = h // 2, w // 2
        return x[cy - ch // 2: cy + ch - ch // 2, cx - cw // 2: cx + cw - cw // 2]

    def generate(self, image: np.ndarray, n_frames: int = 2):
        """image: (H, W, 3) float32 [0,1], H,W ≥ crop + 2·32 margin."""
        h, w = image.shape[:2]
        frames = [self._center_crop(image)]
        flows: List[np.ndarray] = []
        masks: List[np.ndarray] = []
        cur = image
        cur_mat = np.eye(3, dtype=np.float32)
        self._mats = [cur_mat.copy()]
        for _ in range(n_frames - 1):
            tsr = _tsr_matrix(self.rng, (h, w))
            nxt = cv2.warpAffine(cur, np.linalg.inv(tsr)[:2], (w, h), flags=cv2.INTER_LINEAR)
            fw, bw = _affine_flow(tsr, (h, w))
            fw_c = self._center_crop(fw)
            bw_c = self._center_crop(bw)
            flows.append(bw_c.astype(np.float32))
            masks.append(_fbc_mask_np(fw_c, bw_c))
            frames.append(self._center_crop(nxt))
            cur = nxt
            cur_mat = tsr @ cur_mat
            # frame_k → image-coords map: T_k = tsr_1 @ … @ tsr_k (frame_k(p)
            # = image(T_k·p)); note cur_mat accumulates the REVERSED product
            self._mats.append((self._mats[-1] @ tsr).astype(np.float32))
        self._full_hw = (h, w)
        return (
            np.stack(frames).astype(np.float32),
            np.stack(flows),
            np.stack(masks),
        )

    _mats: List[np.ndarray] = None  # cumulative per-frame transforms
    _full_hw = None

    def pairwise_flows(self, i: int, j: int):
        """Analytic forward/backward flow between frames i (earlier) and j
        of the LAST generate() call, center-cropped: the motion oracle for
        GT-flow TCL eval (frames are related by composed affines, so flow
        between ANY pair is exact — the reference's D2 synthesizer only
        materializes consecutive pairs). Returns (ff i→j, bf j→i)."""
        assert self._mats is not None, "call generate() first"
        # M_{j→i} = T_i⁻¹ @ T_j  (maps frame_j coords to frame_i coords);
        # for consecutive (k−1, k) this reduces to tsr_k, matching generate()
        t_ij = (np.linalg.inv(self._mats[i]) @ self._mats[j]).astype(np.float32)
        fw, bw = _affine_flow(t_ij, self._full_hw)
        return (self._center_crop(fw).astype(np.float32),
                self._center_crop(bw).astype(np.float32))


def _texture(rng: np.random.RandomState, hw) -> np.ndarray:
    """Deterministic colorful test texture: sum of random 2-D sinusoids."""
    h, w = hw
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32),
                         indexing="ij")
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(6):
        fx, fy = rng.uniform(0.01, 0.12, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.1, 0.4, 3)
        for c in range(3):
            img[..., c] += amp[c] * np.sin(2 * np.pi * (fx * xs + fy * ys) + phase[c])
    img -= img.min()
    img /= max(img.max(), 1e-6)
    return img


def _scene(rng: np.random.RandomState, hw) -> np.ndarray:
    """Structured content image: gradient background + random anti-aliased
    shapes (circles / rectangles / lines) + mild texture. Stands in for the
    photographic FC2/COCO content the reference trains on — unlike the
    sinusoid ``_texture``, scenes have edges and flat regions, so styled
    outputs visibly separate content structure from style statistics."""
    h, w = hw
    ys, xs = np.meshgrid(np.linspace(0, 1, h, dtype=np.float32),
                         np.linspace(0, 1, w, dtype=np.float32), indexing="ij")
    c0 = rng.uniform(0.1, 0.9, 3).astype(np.float32)
    c1 = rng.uniform(0.1, 0.9, 3).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    t = (np.cos(ang) * xs + np.sin(ang) * ys)
    t = (t - t.min()) / max(t.max() - t.min(), 1e-6)
    img = c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]

    canvas = np.ascontiguousarray(img)
    for _ in range(rng.randint(6, 14)):
        color = tuple(float(v) for v in rng.uniform(0.05, 0.95, 3))
        kind = rng.randint(3)
        if kind == 0:
            center = (int(rng.randint(0, w)), int(rng.randint(0, h)))
            cv2.circle(canvas, center, int(rng.randint(8, max(min(h, w) // 4, 9))),
                       color, -1, lineType=cv2.LINE_AA)
        elif kind == 1:
            x0, y0 = rng.randint(0, w), rng.randint(0, h)
            x1 = np.clip(x0 + rng.randint(10, w // 2), 0, w - 1)
            y1 = np.clip(y0 + rng.randint(10, h // 2), 0, h - 1)
            cv2.rectangle(canvas, (int(x0), int(y0)), (int(x1), int(y1)),
                          color, -1, lineType=cv2.LINE_AA)
        else:
            p0 = (int(rng.randint(0, w)), int(rng.randint(0, h)))
            p1 = (int(rng.randint(0, w)), int(rng.randint(0, h)))
            cv2.line(canvas, p0, p1, color, int(rng.randint(2, 8)),
                     lineType=cv2.LINE_AA)
    # mild multiplicative texture so flat regions carry gradients
    tex = _texture(rng, hw)
    out = np.clip(canvas * (0.85 + 0.3 * tex), 0.0, 1.0)
    return out.astype(np.float32)


def synthetic_batch(
    batch_size: int,
    hw=(256, 256),
    n_frames: int = 2,
    seed: int = 0,
):
    """A full FC2-style training batch from procedural textures:
    dict(imgs (B, n, H, W, 3), flows (B, n−1, H, W, 2), masks (B, n−1, H, W, 1)).
    Images in [0,1]; flows are backward flows like the FC2 .npy files."""
    rng = np.random.RandomState(seed)
    gen = AffineMotionGenerator(crop_hw=hw, seed=seed + 1)
    big = (hw[0] + 96, hw[1] + 96)
    frames, flows, masks = [], [], []
    for _ in range(batch_size):
        f, fl, m = gen.generate(_texture(rng, big), n_frames=n_frames)
        frames.append(f)
        flows.append(fl)
        masks.append(m)
    return {
        "imgs": np.stack(frames),
        "flows": np.stack(flows),
        "masks": np.stack(masks),
    }
