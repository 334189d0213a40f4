"""Render an artifacts/<method>/samples.png grid from a trained FastStyle
checkpoint: row 0 = corpus content frames, rows 1..S = stylized per style.

Usage: python scripts/make_samples.py <run_dir> <out_png> [n_styles]
"""
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import imageio.v2 as imageio

from vst.core import Checkpointer
from vst.models.faststyle import FastStyleNet


def main():
    run_dir, out_png = sys.argv[1], sys.argv[2]
    n_styles = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    n_cols = 4

    ck = Checkpointer(run_dir)
    net = FastStyleNet(n_styles=n_styles)
    tpl = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   1.0, 0)["params"]
    params = ck.restore(ck.latest_step(), params=tpl)["params"]
    # ruder variant stores a 7-channel stem (frame ‖ warped prev styled ‖
    # mask); sample in the zero-context mode (mask = 0), the branch the
    # trainer's 50% coin-flip exercises
    num_inp = params["ConvLayer_0"]["TorchConv_0"]["Conv_0"]["kernel"].shape[2]

    contents = []
    for i in range(n_cols):
        t = np.load(f"/root/corpus/DATAFiles/{i:07d}.npy")[0]
        contents.append(t[:, :, 0:3].astype(np.float32))  # frame 1, [0,1]
    x = jnp.asarray(np.stack(contents)) * 255.0
    x_in = x
    if num_inp == 7:
        zeros = jnp.zeros(x.shape[:3] + (4,), x.dtype)
        x_in = jnp.concatenate([x, zeros], axis=-1)

    rows = [np.concatenate(list(np.asarray(x) / 255.0), axis=1)]
    for sid in range(n_styles):
        _, out = net.apply({"params": params}, x_in, 1.0, sid)
        out = np.clip(np.asarray(out) / 255.0, 0, 1)
        rows.append(np.concatenate(list(out), axis=1))
    grid = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
    imageio.imwrite(out_png, grid)
    print("saved", out_png, grid.shape)


if __name__ == "__main__":
    main()
