"""Render a translation grid from a trained CycleGAN-family checkpoint:
row 0 = corpus content frames (domain A), row 1 = G_A(A) stylization,
row 2 = G_B(G_A(A)) cycle reconstruction — the visual convergence evidence
the reference collects via its Visualizer HTML (CycleGAN/util/visualizer.py).

Usage: python scripts/make_gan_samples.py <run_dir> <out_png> <variant> [sid]
"""
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import imageio.v2 as imageio

from vst.core import Checkpointer
from vst.train.cyclegan import CycleGANConfig, CycleGANTrainer


def main():
    run_dir, out_png, variant = sys.argv[1], sys.argv[2], sys.argv[3]
    n_cols = 4

    cfg = CycleGANConfig(variant=variant)
    # mogan/congan trainers assert a bound RAFT for their in-graph flow
    # losses; sample generation (G_A/G_B only) never invokes it
    stub_raft = None
    if variant in ("mogan", "congan"):
        def stub_raft(i1, i2):
            d = jnp.mean(i1 - i2, axis=-1, keepdims=True)
            return None, jnp.concatenate([d, -d], axis=-1)
    trainer = CycleGANTrainer(cfg, image_hw=(256, 256), raft_apply=stub_raft,
                              seed=0)
    tpl = trainer.init_state(0).params
    ck = Checkpointer(run_dir)
    params = ck.restore(ck.latest_step(), params=tpl)["params"]

    contents = []
    for i in range(n_cols):
        t = np.load(f"/root/corpus/DATAFiles/{i:07d}.npy")[0]
        contents.append(t[:, :, 0:3].astype(np.float32))  # frame 1, [0,1]
    # CycleGAN-family nets run in [-1, 1] (fc2_dataset.py normalization)
    x = jnp.asarray(np.stack(contents)) * 2.0 - 1.0

    g_a = trainer.generate_fn("G_A")
    g_b = trainer.generate_fn("G_B")
    fake_b = g_a(params, x)
    rec_a = g_b(params, fake_b)

    rows = []
    for t in (x, fake_b, rec_a):
        t = np.clip((np.asarray(t) + 1.0) / 2.0, 0, 1)
        rows.append(np.concatenate(list(t), axis=1))
    grid = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
    imageio.imwrite(out_png, grid)
    print("saved", out_png, grid.shape)


if __name__ == "__main__":
    main()
