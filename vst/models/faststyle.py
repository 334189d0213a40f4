"""FastStyleNet — Johnson-style feed-forward transformer network.

Parity with ``methods/learning-based/network.py:263-298``:
3 down convs (9×9 s1, 3×3 s2, 3×3 s2) → 5 residual blocks with learned
per-block strength gates → 2 nearest-upsample convs → ConvTanh output
(tanh(x/255)·150 + 127.5). Multi-style via ConditionalInstanceNorm in the
conv/deconv stages (the residual blocks always use plain affine instance
norm — the conditional branch in the reference is commented out,
``network.py:227-258``).

Input channels: 3 (Johnson/Dumoulin/Huang/ReCoNet) or 7 (Ruder:
frame ⊕ mask ⊕ warped previous stylized frame).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from vst.nn.conv import ConvLayer, UpsampleConvLayer, ConvTanh
from vst.nn.norm import InstanceNorm, ConditionalInstanceNorm


class _Norm(nn.Module):
    """Plain or conditional instance norm, switched on n_styles — parity
    with ConvInstRelu / UpsampleConvInstRelu (``network.py:147-217``)."""

    n_styles: int

    @nn.compact
    def __call__(self, x, style_id):
        if self.n_styles == 1:
            return InstanceNorm(affine=True)(x)
        return ConditionalInstanceNorm(num_styles=self.n_styles)(x, style_id)


class ResidualBlock(nn.Module):
    """Parity with ``network.py:219-261``: two reflect-pad convs with affine
    instance norms; gated residual ``2|s·w|/(1+|s·w|)·out + x`` where w is the
    learned per-block ``layer_strength`` and s the runtime style strength."""

    features: int = 128
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x, style_strength=1.0):
        layer_strength = self.param(
            "layer_strength", nn.initializers.ones, (1,)
        )
        strength = style_strength * layer_strength
        strength = 2.0 * jnp.abs(strength) / (1.0 + jnp.abs(strength))

        out = ConvLayer(self.features, self.kernel_size)(x)
        out = InstanceNorm(affine=True)(out)
        out = nn.relu(out)
        out = ConvLayer(self.features, self.kernel_size)(out)
        out = InstanceNorm(affine=True)(out)
        return strength * out + x


class FastStyleNet(nn.Module):
    """The flagship feed-forward stylization net (north-star benchmark
    workload, BASELINE.md). Returns (features, styled) like the reference."""

    num_inp: int = 3  # kept for documentation; inferred from input
    n_styles: int = 1

    @nn.compact
    def __call__(self, x, style_strength=1.0, style_id=0):
        x = ConvLayer(32, 9, stride=1)(x)
        x = nn.relu(_Norm(self.n_styles)(x, style_id))
        x = ConvLayer(64, 3, stride=2)(x)
        x = nn.relu(_Norm(self.n_styles)(x, style_id))
        x = ConvLayer(128, 3, stride=2)(x)
        x = nn.relu(_Norm(self.n_styles)(x, style_id))

        for _ in range(5):
            x = ResidualBlock(128)(x, style_strength)

        features = x

        x = UpsampleConvLayer(64, 3, stride=1, upsample=2)(x)
        x = nn.relu(_Norm(self.n_styles)(x, style_id))
        x = UpsampleConvLayer(32, 3, stride=1, upsample=2)(x)
        x = nn.relu(_Norm(self.n_styles)(x, style_id))
        x = ConvTanh(3, 9, stride=1)(x)

        return features, x


def faststyle_params_from_torch(sd: dict) -> dict:
    """Convert a torch FastStyleNet state dict (``network.py:263-298``) to
    this module's param tree. Handles both the single-style layout
    (``instance.{weight,bias}`` = affine InstanceNorm2d) and the multi-style
    ConditionalBatchNorm2d layout (``instance.bn.{weight,bias}`` +
    ``instance.embed.weight``, network.py:120-145)."""
    import numpy as np

    def t2j(w):
        try:
            w = w.detach().cpu().numpy()
        except AttributeError:
            w = np.asarray(w)
        if w.ndim == 4:  # conv (O, I, kh, kw) → (kh, kw, I, O)
            w = w.transpose(2, 3, 1, 0)
        return w

    out: dict = {}

    def put(path, leaf, value):
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    def put_norm(scope, rest, val):
        # rest: ('weight'|'bias') | ('bn','weight'|'bias') | ('embed','weight')
        if rest[0] == "bn":
            put([scope, "ConditionalInstanceNorm_0"],
                "scale" if rest[1] == "weight" else "bias", t2j(val))
        elif rest[0] == "embed":
            put([scope, "ConditionalInstanceNorm_0"], "embed", t2j(val))
        else:
            put([scope, "InstanceNorm_0"],
                "scale" if rest[0] == "weight" else "bias", t2j(val))

    for key, val in sd.items():
        k = key[len("module."):] if key.startswith("module.") else key
        parts = k.split(".")
        mod, rest = parts[0], parts[1:]

        if mod.startswith("conv") and mod != "conv2d":  # conv1..conv3 stages
            i = int(mod[4:]) - 1
            if rest[0] == "conv2d":
                put([f"ConvLayer_{i}", "TorchConv_0", "Conv_0"],
                    "kernel" if rest[1] == "weight" else "bias", t2j(val))
            elif rest[0] == "instance":
                put_norm(f"_Norm_{i}", rest[1:], val)
            else:
                raise KeyError(f"unmapped key {key}")
        elif mod.startswith("res"):
            j = int(mod[3:]) - 1
            scope = f"ResidualBlock_{j}"
            if rest[0] == "layer_strength":
                put([scope], "layer_strength", t2j(val))
            elif rest[0] in ("conv1", "conv2"):
                put([scope, f"ConvLayer_{int(rest[0][-1]) - 1}",
                     "TorchConv_0", "Conv_0"],
                    "kernel" if rest[2] == "weight" else "bias", t2j(val))
            elif rest[0] in ("in1", "in2"):
                put([scope, f"InstanceNorm_{int(rest[0][-1]) - 1}"],
                    "scale" if rest[1] == "weight" else "bias", t2j(val))
            else:
                raise KeyError(f"unmapped key {key}")
        elif mod in ("deconv1", "deconv2"):
            i = int(mod[6:]) - 1
            if rest[0] == "conv2d":
                put([f"UpsampleConvLayer_{i}", "TorchConv_0", "Conv_0"],
                    "kernel" if rest[1] == "weight" else "bias", t2j(val))
            elif rest[0] == "instance":
                put_norm(f"_Norm_{3 + i}", rest[1:], val)
            else:
                raise KeyError(f"unmapped key {key}")
        elif mod == "deconv3":
            put(["ConvTanh_0", "ConvLayer_0", "TorchConv_0", "Conv_0"],
                "kernel" if rest[1] == "weight" else "bias", t2j(val))
        else:
            raise KeyError(f"unmapped key {key}")

    return out
