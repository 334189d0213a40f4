"""RAFT optical flow in flax (NHWC), parity with ``utils/raft/raft/``.

Architecture (raft.py:24-144): feature encoder (instance norm) + context
encoder (batch norm) → 4-level all-pairs correlation pyramid → iterative
update: windowed corr lookup → BasicMotionEncoder → SepConvGRU → FlowHead →
convex upsampling of the 1/8-res flow with a learned 9-way mask.

TPU-native choices: GRU iterations run under ``lax.scan`` (one trace,
static shapes); the corr volume is one MXU matmul (vst.flow.corr); the
convex upsample is expressed as patch-extraction + einsum (no unfold).

RAFT here is always an inference net (the reference only ever loads
pretrained `raft-chairs.pth` — vendored training code is unused, SURVEY S5),
so BatchNorm uses stored running statistics.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vst.nn.conv import TorchConv
from vst.nn.norm import instance_norm
from vst.flow.corr import build_pyramid, lookup_pyramid
from vst.ops.image import resize_bilinear


class _Norm(nn.Module):
    """RAFT's norm zoo (extractor.py:16-38): group/batch/instance/none.

    InstanceNorm2d here has NO affine params (torch default). BatchNorm runs
    in eval mode off stored running stats. GroupNorm has affine params.
    """

    norm_fn: str
    num_groups: int = 8

    @nn.compact
    def __call__(self, x):
        if self.norm_fn == "none":
            return x
        if self.norm_fn == "instance":
            return instance_norm(x)
        c = x.shape[-1]
        if self.norm_fn == "batch":
            mean = self.param("running_mean", nn.initializers.zeros, (c,))
            var = self.param("running_var", nn.initializers.ones, (c,))
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        if self.norm_fn == "group":
            scale = self.param("scale", nn.initializers.ones, (c,))
            bias = self.param("bias", nn.initializers.zeros, (c,))
            B, H, W, C = x.shape
            g = self.num_groups
            xg = x.reshape(B, H, W, g, C // g)
            mean = xg.mean(axis=(1, 2, 4), keepdims=True)
            var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
            xg = (xg - mean) / jnp.sqrt(var + 1e-5)
            return xg.reshape(B, H, W, C) * scale + bias
        raise ValueError(self.norm_fn)


class ResidualBlock(nn.Module):
    """extractor.py:6-56."""

    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Optional[Any] = None  # conv compute dtype; norms accumulate f32

    @nn.compact
    def __call__(self, x):
        ng = self.planes // 8
        y = TorchConv(self.planes, 3, stride=self.stride, padding=1,
                      dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_Norm(self.norm_fn, ng, name="norm1")(y))
        y = TorchConv(self.planes, 3, padding=1, dtype=self.dtype,
                      name="conv2")(y)
        y = nn.relu(_Norm(self.norm_fn, ng, name="norm2")(y))
        if self.stride != 1:
            x = TorchConv(self.planes, 1, stride=self.stride,
                          dtype=self.dtype, name="downsample")(x)
            x = _Norm(self.norm_fn, ng, name="norm3")(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    """extractor.py:60-116 (SmallEncoder)."""

    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        p4 = self.planes // 4
        ng = self.planes // 8
        y = TorchConv(p4, 1, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(_Norm(self.norm_fn, ng, name="norm1")(y))
        y = TorchConv(p4, 3, stride=self.stride, padding=1, dtype=self.dtype,
                      name="conv2")(y)
        y = nn.relu(_Norm(self.norm_fn, ng, name="norm2")(y))
        y = TorchConv(self.planes, 1, dtype=self.dtype, name="conv3")(y)
        y = nn.relu(_Norm(self.norm_fn, ng, name="norm3")(y))
        if self.stride != 1:
            x = TorchConv(self.planes, 1, stride=self.stride,
                          dtype=self.dtype, name="downsample")(x)
            x = _Norm(self.norm_fn, ng, name="norm4")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """extractor.py:118-192: conv7×7 s2 → 3 residual stages (64, 96, 128) →
    1×1 output conv."""

    output_dim: int = 128
    norm_fn: str = "batch"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = TorchConv(64, 7, stride=2, padding=3, dtype=self.dtype,
                      name="conv1")(x)
        x = nn.relu(_Norm(self.norm_fn, 8, name="norm1")(x))
        for i, (dim, stride) in enumerate([(64, 1), (96, 2), (128, 2)]):
            x = ResidualBlock(dim, self.norm_fn, stride, dtype=self.dtype,
                              name=f"layer{i+1}_0")(x)
            x = ResidualBlock(dim, self.norm_fn, 1, dtype=self.dtype,
                              name=f"layer{i+1}_1")(x)
        return TorchConv(self.output_dim, 1, dtype=self.dtype, name="conv2")(x)


class SmallEncoder(nn.Module):
    """extractor.py:195-267: conv7×7 s2 → bottleneck stages (32, 64, 96)."""

    output_dim: int = 128
    norm_fn: str = "instance"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = TorchConv(32, 7, stride=2, padding=3, dtype=self.dtype,
                      name="conv1")(x)
        x = nn.relu(_Norm(self.norm_fn, 8, name="norm1")(x))
        for i, (dim, stride) in enumerate([(32, 1), (64, 2), (96, 2)]):
            x = BottleneckBlock(dim, self.norm_fn, stride, dtype=self.dtype,
                                name=f"layer{i+1}_0")(x)
            x = BottleneckBlock(dim, self.norm_fn, 1, dtype=self.dtype,
                                name=f"layer{i+1}_1")(x)
        return TorchConv(self.output_dim, 1, dtype=self.dtype, name="conv2")(x)


class FlowHead(nn.Module):
    """update.py:6-14."""

    hidden_dim: int = 256
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(TorchConv(self.hidden_dim, 3, padding=1,
                              dtype=self.dtype, name="conv1")(x))
        # the delta-flow output conv always accumulates/returns f32
        return TorchConv(2, 3, padding=1, name="conv2")(x.astype(jnp.float32))


class BasicMotionEncoder(nn.Module):
    """update.py:79-97: corr → 256 → 192; flow → 128 → 64; fuse → 126 ⊕ flow."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, flow, corr):
        dt = self.dtype
        cor = nn.relu(TorchConv(256, 1, dtype=dt, name="convc1")(corr))
        cor = nn.relu(TorchConv(192, 3, padding=1, dtype=dt, name="convc2")(cor))
        flo = nn.relu(TorchConv(128, 7, padding=3, dtype=dt, name="convf1")(flow))
        flo = nn.relu(TorchConv(64, 3, padding=1, dtype=dt, name="convf2")(flo))
        out = nn.relu(
            TorchConv(126, 3, padding=1, dtype=dt,
                      name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class SmallMotionEncoder(nn.Module):
    """update.py:62-77."""

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(TorchConv(96, 1, name="convc1")(corr))
        flo = nn.relu(TorchConv(64, 7, padding=3, name="convf1")(flow))
        flo = nn.relu(TorchConv(32, 3, padding=1, name="convf2")(flo))
        out = nn.relu(
            TorchConv(80, 3, padding=1, name="conv")(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class SepConvGRU(nn.Module):
    """update.py:33-60: horizontal (1×5) then vertical (5×1) GRU passes.

    With ``dtype=bf16`` the gate convs compute bf16 while the hidden state
    update stays f32 (z/q promote against the f32 carry)."""

    hidden_dim: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        dt = self.dtype
        for tag, ks, pad in (("1", (1, 5), (0, 2)), ("2", (5, 1), (2, 0))):
            hx = jnp.concatenate([h.astype(x.dtype), x], axis=-1)
            z = nn.sigmoid(TorchConv(hd, ks, padding=pad, dtype=dt,
                                     name=f"convz{tag}")(hx))
            r = nn.sigmoid(TorchConv(hd, ks, padding=pad, dtype=dt,
                                     name=f"convr{tag}")(hx))
            q = jnp.tanh(
                TorchConv(hd, ks, padding=pad, dtype=dt, name=f"convq{tag}")(
                    jnp.concatenate([(r * h.astype(r.dtype)), x], axis=-1)
                )
            )
            h = (1 - z.astype(jnp.float32)) * h + \
                z.astype(jnp.float32) * q.astype(jnp.float32)
        return h


class ConvGRU(nn.Module):
    """update.py:16-31 (small variant)."""

    hidden_dim: int = 96

    @nn.compact
    def __call__(self, h, x):
        hd = self.hidden_dim
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(TorchConv(hd, 3, padding=1, name="convz")(hx))
        r = nn.sigmoid(TorchConv(hd, 3, padding=1, name="convr")(hx))
        q = jnp.tanh(
            TorchConv(hd, 3, padding=1, name="convq")(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class BasicUpdateBlock(nn.Module):
    """update.py:114-136 — GRU + flow head. The 0.25-scaled upsample-mask
    convs (update.py:119-123) live in :class:`UpMaskHead`, applied OUTSIDE
    the GRU scan: the mask depends only on the hidden state and eval
    consumes only the FINAL iteration's, so computing it per iteration
    wasted the mask convs × (iters−1) (~17% of the update-loop FLOPs)."""

    hidden_dim: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        dt = self.dtype
        if dt is not None:
            inp = inp.astype(dt)
            corr = corr.astype(dt)
            flow_c = flow.astype(dt)
        else:
            flow_c = flow
        motion = BasicMotionEncoder(dtype=dt, name="encoder")(flow_c, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, dtype=dt, name="gru")(net, x)
        delta = FlowHead(256, dtype=dt, name="flow_head")(net)
        return net, delta


class UpMaskHead(nn.Module):
    """update.py:119-123: 9-way convex-upsample mask logits (×0.25)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, net):
        m = nn.relu(TorchConv(256, 3, padding=1, dtype=self.dtype,
                              name="mask_0")(net))
        return 0.25 * TorchConv(64 * 9, 1, name="mask_2")(
            m.astype(jnp.float32))


class SmallUpdateBlock(nn.Module):
    """update.py:99-112 — no upsample mask (bilinear upflow8 instead)."""

    hidden_dim: int = 96

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(name="encoder")(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, name="gru")(net, x)
        delta = FlowHead(128, name="flow_head")(net)
        return net, None, delta


def coords_grid(batch: int, ht: int, wd: int) -> jnp.ndarray:
    """(B, ht, wd, 2) pixel grid, ch0 = x (utils.py:74-77)."""
    ys, xs = jnp.meshgrid(jnp.arange(ht, dtype=jnp.float32),
                          jnp.arange(wd, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """8× bilinear align_corners=True upsample ×8 magnitude (utils.py:80-82)."""
    B, H, W, _ = flow.shape
    return 8.0 * resize_bilinear(flow, (8 * H, 8 * W), align_corners=True)


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex-combination 8× upsample (raft.py:72-83).

    flow: (B, H, W, 2) at 1/8 res; mask: (B, H, W, 576) logits laid out as
    torch view(N, 1, 9, 8, 8, H, W) flattened from channel dim 64·9 — i.e.
    channel index = k·64 + di·8 + dj with k the 3×3 neighbour and (di, dj)
    the sub-pixel position.
    """
    B, H, W, _ = flow.shape
    m = mask.reshape(B, H, W, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)

    f = 8.0 * flow
    fp = jnp.pad(f, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3×3 patches in torch unfold order: k = dy·3 + dx, offsets −1..1
    patches = jnp.stack(
        [fp[:, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, H, W, 9, 2)

    up = jnp.einsum("bhwkij,bhwkc->bhwijc", m, patches)  # (B,H,W,8,8,2)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, 8 * H, 8 * W, 2)


class _IterUpdate(nn.Module):
    """One GRU refinement iteration, shaped for ``nn.scan``:
    carry = (net, coords1); loop-invariant side inputs (coords0, inp,
    pyramid) enter as broadcast xs — NOT through the carry, which would
    round-trip the ~200 MB correlation pyramid through HBM every iteration.
    Params are broadcast across iterations (weight sharing, raft.py:122-131).
    The per-iter ys collect (coords1, net); the hidden states feed the
    hoisted UpMaskHead only in train mode (dead-code-eliminated in eval)."""

    small: bool
    radius: int
    pallas_lookup: bool = False
    update_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, carry, const):
        net, coords1 = carry
        coords0, inp, pyramid = const
        coords1 = jax.lax.stop_gradient(coords1)  # raft.py:123
        if self.pallas_lookup:
            from vst.kernels.pallas_corr import pallas_lookup_pyramid

            corr = pallas_lookup_pyramid(pyramid, coords1, self.radius,
                                         coords1.shape[0])
        else:
            corr = lookup_pyramid(pyramid, coords1, self.radius,
                                  coords1.shape[0])
        flow = coords1 - coords0
        if self.small:
            block = SmallUpdateBlock(96, name="block")
            net, _, delta = block(net, inp, corr, flow)
        else:
            block = BasicUpdateBlock(128, dtype=self.update_dtype,
                                     name="block")
            net, delta = block(net, inp, corr, flow)
        coords1 = coords1 + delta.astype(coords1.dtype)
        return (net, coords1), (coords1, net)


class RAFT(nn.Module):
    """Full RAFT (raft.py:24-144). Images: (B, H, W, 3) RGB in [0, 255],
    H, W divisible by 8 (use vst.ops.InputPadder). Returns
    (flow_low, flow_up) like the reference's test mode (raft.py:141-142)."""

    small: bool = False
    iters: int = 12
    train_mode: bool = False  # return ALL per-iteration upsampled flows
    # (raft.py:121-144 flow_predictions) for the sequence loss
    pallas_lookup: bool = False  # 5× faster corr window sampling
    # (vst.kernels.pallas_corr; bf16 interpolation multiplies, ~0.2% rel)
    encoder_dtype: Optional[Any] = None  # bf16 fnet/cnet convs (norm stats
    # stay f32; GRU/corr unaffected) — ~2× the encoder cost, see bench notes
    update_dtype: Optional[Any] = None  # bf16 update-block convs (motion
    # encoder + GRU gates + flow-head hidden); hidden-state update, delta
    # output conv and mask conv stay f32

    @nn.compact
    def __call__(self, image1, image2,
                 flow_init: Optional[jnp.ndarray] = None):
        edt = self.encoder_dtype
        if self.small:
            hdim, cdim = 96, 64
            corr_levels, corr_radius = 4, 3
            fnet = SmallEncoder(128, "instance", dtype=edt, name="fnet")
            cnet = SmallEncoder(hdim + cdim, "none", dtype=edt, name="cnet")
        else:
            hdim, cdim = 128, 128
            corr_levels, corr_radius = 4, 4
            fnet = BasicEncoder(256, "instance", dtype=edt, name="fnet")
            cnet = BasicEncoder(hdim + cdim, "batch", dtype=edt, name="cnet")

        image1 = 2.0 * (image1 / 255.0) - 1.0
        image2 = 2.0 * (image2 / 255.0) - 1.0

        # reference runs fnet on the concatenated pair — batch-concat keeps
        # one conv dispatch (raft.py:100)
        fmaps = fnet(jnp.concatenate([image1, image2], axis=0))
        fmap1, fmap2 = jnp.split(fmaps, 2, axis=0)
        pyramid = build_pyramid(
            fmap1.astype(jnp.float32), fmap2.astype(jnp.float32),
            num_levels=corr_levels,
        )

        cfeat = cnet(image1).astype(jnp.float32)  # GRU runs f32
        net, inp = jnp.split(cfeat, [hdim], axis=-1)
        net = jnp.tanh(net)
        inp = nn.relu(inp)

        B, H, W, _ = image1.shape
        if H % 8 or W % 8:
            # Same contract as the reference (callers wrap InputPadder,
            # utils/raft/raft/utils/utils.py:9-24): at e.g. H=436 the
            # ceil-mode stride-2 encoder yields a 55-row fmap while the
            # H//8 coords grid has 54 — fail with a real message instead
            # of a deep reshape error.
            raise ValueError(
                f"RAFT requires H, W divisible by 8 (got {H}x{W}); "
                "pad with vst.ops.image.InputPadder first")
        coords0 = coords_grid(B, H // 8, W // 8)
        coords1 = coords_grid(B, H // 8, W // 8)
        if flow_init is not None:
            coords1 = coords1 + flow_init

        # GRU iterations under scan: one trace, update-block params broadcast
        # (shared) across iterations; loop invariants enter as broadcast xs
        scan = nn.scan(
            _IterUpdate,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            length=self.iters,
        )
        carry0 = (net, coords1)
        (net, coords1), (coords1_all, nets_all) = scan(
            small=self.small, radius=corr_radius,
            pallas_lookup=self.pallas_lookup,
            update_dtype=self.update_dtype, name="update_iter"
        )(carry0, (coords0, inp, pyramid))

        flow_low = coords1 - coords0
        if self.train_mode:
            if self.small:
                flow_preds = jax.vmap(
                    lambda c1: upflow8(c1 - coords0))(coords1_all)
            else:
                # per-iter masks from the hoisted head (shared params)
                vmask = nn.vmap(
                    UpMaskHead,
                    variable_axes={"params": None},
                    split_rngs={"params": False},
                    in_axes=0,
                )(dtype=self.update_dtype, name="mask_head")
                masks_all = vmask(nets_all)
                flow_preds = jax.vmap(
                    lambda c1, m: upsample_flow_convex(c1 - coords0, m)
                )(coords1_all, masks_all)
            return flow_low, flow_preds  # (iters, B, H, W, 2)
        if self.small:
            flow_up = upflow8(flow_low)
        else:
            up_mask = UpMaskHead(dtype=self.update_dtype,
                                 name="mask_head")(net)
            flow_up = upsample_flow_convex(flow_low, up_mask)
        return flow_low, flow_up


# ---------------------------------------------------------------------------
# torch state-dict conversion (raft-things/chairs .pth checkpoints)
# ---------------------------------------------------------------------------

def _t2j(w):
    try:
        w = w.detach().cpu().numpy()
    except AttributeError:
        w = np.asarray(w)
    if w.ndim == 4:  # conv (O, I, kh, kw) → (kh, kw, I, O)
        return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))
    return w


def raft_params_from_torch(sd: dict) -> dict:
    """Convert a torch RAFT state dict (optionally 'module.'-prefixed — the
    reference saves DataParallel-wrapped weights, utils/sintel_eval.py:44-47)
    to this module's param tree."""
    out: dict = {}

    def put(path, leaf, value):
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    for key, val in sd.items():
        k = key[len("module."):] if key.startswith("module.") else key
        if k.endswith("num_batches_tracked"):
            continue
        parts = k.split(".")
        net = parts[0]  # fnet | cnet | update_block

        if net in ("fnet", "cnet"):
            rest = parts[1:]
            if rest[0].startswith("layer"):
                # layer{i}.{j}.<sub>... → layer{i}_{j}/<sub>
                mod = [net, f"{rest[0]}_{rest[1]}"]
                sub = rest[2:]
                if sub[0] == "downsample":
                    # downsample.0 = conv, downsample.1 = norm3/norm4
                    if sub[1] == "0":
                        put(mod + ["downsample", "Conv_0"],
                            "kernel" if sub[2] == "weight" else "bias", _t2j(val))
                    else:
                        norm = "norm4" if "layer" in k and _is_bottleneck(sd, net) else "norm3"
                        put(mod + [norm], _norm_leaf(sub[2]), _t2j(val))
                    continue
                if sub[0].startswith("conv"):
                    put(mod + [sub[0], "Conv_0"],
                        "kernel" if sub[1] == "weight" else "bias", _t2j(val))
                    continue
                if sub[0].startswith("norm"):
                    put(mod + [sub[0]], _norm_leaf(sub[1]), _t2j(val))
                    continue
            if rest[0].startswith("conv"):
                put([net, rest[0], "Conv_0"],
                    "kernel" if rest[1] == "weight" else "bias", _t2j(val))
                continue
            if rest[0].startswith("norm"):
                put([net, rest[0]], _norm_leaf(rest[1]), _t2j(val))
                continue
            raise KeyError(f"unmapped key {key}")

        if net == "update_block":
            rest = parts[1:]
            if rest[0] == "mask":
                # the upsample-mask head is hoisted out of the GRU scan
                # (module UpMaskHead at the RAFT top level)
                put(["mask_head", f"mask_{rest[1]}", "Conv_0"],
                    "kernel" if rest[2] == "weight" else "bias", _t2j(val))
                continue
            # encoder.convc1 / gru.convz1 / flow_head.conv1
            put(["update_iter", "block", rest[0], rest[1], "Conv_0"],
                "kernel" if rest[2] == "weight" else "bias", _t2j(val))
            continue

        raise KeyError(f"unmapped key {key}")

    return out


def _is_bottleneck(sd, net):
    return any(k.startswith(f"{net}.layer1.0.conv3") for k in sd)


def _norm_leaf(torch_leaf: str) -> str:
    return {
        "weight": "scale",
        "bias": "bias",
        "running_mean": "running_mean",
        "running_var": "running_var",
        "num_batches_tracked": "_num_batches_tracked",  # dropped by caller
    }[torch_leaf]
