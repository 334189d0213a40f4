"""One entry point per workload (replacing the reference's per-method
argparse mains + SLURM scripts, SURVEY §2 L6). Config-file-free: every flag
is explicit; datasets fall back to the synthetic generators when no path is
given so every command runs end-to-end out of the box.

Commands:
  train-faststyle   Johnson/Dumoulin/Huang/ReCoNet/Ruder perceptual training
  train-cyclegan    CycleGAN / +Con / MoGAN / ConGAN
  train-stargan     StarGAN v1 (WGAN-GP)
  train-stargan2    StarGAN v2 (Adv / AdvCon)
  eval-sintel       TCL-ST/LT/DT video benchmark
  datagen-fc2       Pack FC2-style .npy training tuples (affine motion)
  datagen-styled    Gatys batch styler → styled-files layout
  bench             The frames/sec/chip benchmark (same as root bench.py)
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _add_common(p):
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. 'cpu'); this environment "
                        "pins the backend at interpreter startup, so the "
                        "JAX_PLATFORMS env var is ignored — use this flag")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--hw", type=int, nargs=2, default=(64, 64))
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out-dir", type=str, default="runs/latest")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--ckpt-every", type=int, default=1000)
    p.add_argument("--data-dir", type=str, default=None,
                   help="FC2 DATAFiles dir; synthetic batches if omitted")
    p.add_argument("--device-cache", type=int, default=0,
                   help="cache N corpus samples in HBM once (uint8/f16) and "
                        "sample batches fully on-device — removes the "
                        "host→device transfer from the hot loop entirely "
                        "(the tunneled link here costs seconds per 256² "
                        "batch). 0 = stream from host")


def cmd_train_faststyle(args):
    import jax
    import jax.numpy as jnp

    from vst.core import Checkpointer, MetricsLogger
    from vst.data.styles import load_style_images
    from vst.data.synthetic import synthetic_batch
    from vst.data.loader import NpyDirDataset
    from vst.train.registry import select_method
    from vst.train.faststyle import FastStyleTrainer

    cfg = select_method(args.method, n_styles=args.n_styles,
                        batch_size=args.batch_size,
                        n_frames=3 if args.method == "ruder" else 2)
    styles = load_style_images(args.style_dir, size=256)[:max(args.n_styles, 1)]
    pre_style = None
    if args.pre_style_ckpt:
        # ruder bootstraps its first frame from a PRETRAINED Johnson/
        # Dumoulin model (fs_ruder.py:25-34) — load that run's params
        from vst.core import Checkpointer
        from vst.models.faststyle import FastStyleNet

        pre_ck = Checkpointer(args.pre_style_ckpt)
        pre_net = FastStyleNet(n_styles=args.n_styles)
        import jax as _jax

        tpl = pre_net.init(_jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 1.0, 0)["params"]
        pre_style = pre_ck.restore(pre_ck.latest_step(), params=tpl)["params"]
    trainer = FastStyleTrainer(cfg, styles, seed=args.seed,
                               pre_style_params=pre_style)

    def batches():
        if args.data_dir and args.device_cache:
            from vst.data.device_cache import DeviceFC2Cache

            cache = DeviceFC2Cache(args.data_dir, limit=args.device_cache,
                                   seed=args.seed)
            print(f"device cache: {cache.n} samples resident in HBM",
                  flush=True)
            while True:
                yield cache.sample(args.batch_size)
        elif args.data_dir:
            ds = NpyDirDataset(args.data_dir, args.batch_size)
            while True:
                for b in ds.epoch():
                    # loader emits 2-frame tuples; ruder needs n_frames
                    yield b
        else:
            i = 0
            while True:
                yield synthetic_batch(args.batch_size, hw=tuple(args.hw),
                                      n_frames=cfg.n_frames, seed=args.seed + i)
                i += 1

    it = batches()
    first = {k: jnp.asarray(v) for k, v in next(it).items()}
    state = trainer.init_state(first)
    step_fn = trainer.train_step()
    logger = MetricsLogger(f"{args.out_dir}/losses.txt")
    ckpt = Checkpointer(args.out_dir)
    rng = jax.random.PRNGKey(args.seed)

    batch = first
    for i in range(args.steps):
        rng, sub = jax.random.split(rng)
        sid = int(np.random.randint(args.n_styles)) if args.n_styles > 1 else 0
        state, metrics = step_fn(state, batch, sid, sub)
        if (i + 1) % args.log_every == 0:
            logger.log(i + 1, **{k: float(v) for k, v in metrics.items()})
            print(f"[{i + 1}/{args.steps}] " + " ".join(
                f"{k}: {float(v):.4f}" for k, v in metrics.items()))
        if (i + 1) % args.ckpt_every == 0 or i + 1 == args.steps:
            ckpt.save(i + 1, params=state.params)
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
    logger.save_curves(f"{args.out_dir}/loss_list.npy")


def cmd_train_cyclegan(args):
    import jax
    import jax.numpy as jnp

    from vst.core import Checkpointer, MetricsLogger
    from vst.data.fc2 import synthetic_fc2_batches
    from vst.train.cyclegan import CycleGANConfig, CycleGANTrainer

    raft_apply = None
    if args.variant in ("mogan", "congan"):
        raft_apply = _make_raft(args)
    cfg = CycleGANConfig(variant=args.variant, ngf=args.ngf, ndf=args.ndf,
                         steps_per_epoch=max(args.steps // 2, 1),
                         compute_dtype=args.compute_dtype)
    trainer = CycleGANTrainer(cfg, image_hw=tuple(args.hw),
                              raft_apply=raft_apply, seed=args.seed)
    state = trainer.init_state(args.seed)
    e_step = trainer.train_step()
    m_step = trainer.m_step() if args.variant == "mogan" else None
    logger = MetricsLogger(f"{args.out_dir}/losses.txt")
    ckpt = Checkpointer(args.out_dir)
    rng = jax.random.PRNGKey(args.seed)

    def cyclegan_batches():
        """Real pseudo-paired corpus (one model per style sid,
        CycleGAN_train_sid{1,2,3}.sh) when --data-dir is a corpus root,
        synthetic otherwise. The unpaired GAN objective samples A and B
        independently; the +Con/MoGAN temporal terms additionally use the
        GT mask/flow of the A-side pair."""
        import os

        if args.data_dir and args.device_cache:
            from vst.data.device_cache import DeviceStyledCache

            cache = DeviceStyledCache(
                args.data_dir, num_dom=max(args.sid + 1, 2),
                limit=args.device_cache, seed=args.seed)
            print(f"device cache: {cache.n} samples resident in HBM",
                  flush=True)
            while True:
                yield cache.sample_cyclegan(args.batch_size, args.sid)
        elif args.data_dir and os.path.isdir(
                os.path.join(args.data_dir, "styled-files")):
            from vst.data.fc2 import CycleGANFC2Dataset

            ds = CycleGANFC2Dataset(args.data_dir, sid=args.sid,
                                    with_flow=True)
            e = 0
            while True:
                yield from ds.epoch(args.batch_size, seed=args.seed + e)
                e += 1
        else:
            j = 0
            while True:
                for b in synthetic_fc2_batches(
                        4, args.batch_size, hw=tuple(args.hw),
                        num_dom=2, seed=args.seed + j):
                    yield {
                        "real_A": b["x_src"], "real_A2": b["x2_src"],
                        "real_B": b["x_ref"], "real_B2": b["x_ref"],
                        "mask": b["mask"], "flow": b["flow"],
                    }
                j += 4

    i = 0
    merged = {}  # mogan alternates E/M steps whose metric sets are
    # disjoint; log the union so losses.txt shows BOTH descent curves
    # (with log_every even, the bare metrics dict would always be the
    # M-step's AM losses and the E-step would never be recorded)
    for b in cyclegan_batches():
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        rng, sub = jax.random.split(rng)
        if m_step is not None and i % 2 == 1:
            state, metrics = m_step(state, batch)
        else:
            state, metrics = e_step(state, batch, sub)
        merged.update(metrics)
        i += 1
        if i % args.log_every == 0:
            logger.log(i, **{k: float(v) for k, v in merged.items()})
            print(f"[{i}/{args.steps}] G: {float(merged.get('G', 0)):.3f}",
                  flush=True)
        if i % args.ckpt_every == 0 or i == args.steps:
            ckpt.save(i, params=state.params)
        if i >= args.steps:
            break


def cmd_train_stargan(args):
    import jax
    import jax.numpy as jnp

    from vst.core import Checkpointer, MetricsLogger
    from vst.data.fc2 import synthetic_fc2_batches
    from vst.train.stargan import StarGANConfig, StarGANTrainer

    cfg = StarGANConfig(c_dim=args.num_domains, image_size=args.hw[0],
                        conv_dim=args.conv_dim, repeat_num=args.repeat_num,
                        n_critic=args.n_critic)
    trainer = StarGANTrainer(cfg, seed=args.seed)
    from vst.models.stargan import Discriminator

    d_repeat = min(cfg.repeat_num, int(np.log2(args.hw[0])) - 1)
    trainer.D = Discriminator(args.hw[0], cfg.conv_dim, cfg.c_dim, d_repeat)
    state = trainer.init_state(args.seed)
    d_step, g_step = trainer.d_step(), trainer.g_step()
    logger = MetricsLogger(f"{args.out_dir}/losses.txt")
    ckpt = Checkpointer(args.out_dir)
    rng = jax.random.PRNGKey(args.seed)

    def sg1_batches():
        if args.data_dir and args.device_cache:
            from vst.data.device_cache import DeviceStyledCache

            cache = DeviceStyledCache(args.data_dir, num_dom=args.num_domains,
                                      limit=args.device_cache, seed=args.seed)
            print(f"device cache: {cache.n} samples × {cache.num_dom} domains",
                  flush=True)
            while True:
                # v1 trains on plain multi-domain images (main.py:30), not
                # the SG2 pseudo-pair statistics
                yield cache.sample_multidomain(args.batch_size)
        else:
            j = 0
            while True:
                yield from synthetic_fc2_batches(
                    4, args.batch_size, hw=tuple(args.hw),
                    num_dom=args.num_domains, seed=args.seed + j)
                j += 4

    i = 0
    while i < args.steps:
        for b in sg1_batches():
            x = jnp.asarray(b["x_src"])
            c_org = jax.nn.one_hot(jnp.asarray(b["y_src"]), cfg.c_dim)
            c_trg = jax.nn.one_hot(jnp.asarray(b["y_ref"]), cfg.c_dim)
            rng, sub = jax.random.split(rng)
            state, dm = d_step(state, x, c_org, c_trg, sub)
            metrics = dict(dm)
            if (i + 1) % cfg.n_critic == 0:
                state, gm = g_step(state, x, c_org, c_trg)
                metrics.update(gm)
            i += 1
            if i % args.log_every == 0:
                logger.log(i, **{k: float(v) for k, v in metrics.items()})
                print(f"[{i}/{args.steps}] D: {float(dm['D/loss_real']):.3f}")
            if i % args.ckpt_every == 0 or i == args.steps:
                ckpt.save(i, G=state.g_params, D=state.d_params)
            if i >= args.steps:
                break


def cmd_train_stargan2(args):
    import jax
    import jax.numpy as jnp

    from vst.core import Checkpointer, MetricsLogger
    from vst.data.fc2 import synthetic_fc2_batches
    from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer

    cfg = StarGAN2Config(img_size=args.hw[0], num_domains=args.num_domains,
                         style_dim=args.style_dim, latent_dim=args.latent_dim,
                         max_conv_dim=args.max_conv_dim,
                         compute_dtype=args.compute_dtype,
                         lambda_tcl=args.lambda_tcl)
    trainer = StarGAN2Trainer(cfg, seed=args.seed)
    state = trainer.init_state(args.seed)
    logger = MetricsLogger(f"{args.out_dir}/losses.txt")
    ckpt = Checkpointer(args.out_dir)
    rng = jax.random.PRNGKey(args.seed)

    def fc2_batches():
        """Real corpus epochs when --data-dir holds the styled-files trio
        (97% train split, data_loader.py:295-317), synthetic otherwise."""
        import os

        if args.data_dir and args.device_cache:
            from vst.data.device_cache import DeviceStyledCache

            cache = DeviceStyledCache(args.data_dir, num_dom=args.num_domains,
                                      limit=args.device_cache, seed=args.seed)
            print(f"device cache: {cache.n} samples × {cache.num_dom} domains "
                  "resident in HBM", flush=True)
            while True:
                yield cache.sample(args.batch_size)
        elif args.data_dir and os.path.isdir(
                os.path.join(args.data_dir, "DATAFiles")):
            from vst.data.fc2 import DatasetFC2, FC2Loader, train_eval_split

            ds = DatasetFC2(os.path.join(args.data_dir, "DATAFiles"),
                            os.path.join(args.data_dir, "styled-files"),
                            os.path.join(args.data_dir, "styled-files3"),
                            num_dom=args.num_domains, base_len=None)
            tr, _ = train_eval_split(len(ds), split=0.97, seed=args.seed)
            loader = FC2Loader(ds, tr, args.batch_size, seed=args.seed)
            while True:
                yield from loader.epoch()
        else:
            j = 0
            while True:
                yield from synthetic_fc2_batches(
                    4, args.batch_size, hw=tuple(args.hw),
                    num_dom=args.num_domains, seed=args.seed + j)
                j += 4

    i = 0
    for b in fc2_batches():
        batch = {
            "x_real": jnp.asarray(b["x_src"]),
            "x_real2": jnp.asarray(b["x2_src"]),
            "x_ref": jnp.asarray(b["x_ref"]),
            "y_org": jnp.asarray(b["y_src"]),
            "y_trg": jnp.asarray(b["y_ref"]),
            "mask": jnp.asarray(b["mask"]),
            "flow": jnp.asarray(b["flow"]),
        }
        rng, sub = jax.random.split(rng)
        state, metrics = trainer.train_iteration(state, batch, sub)
        i += 1
        if i % args.log_every == 0:
            logger.log(i, **{k: float(v) for k, v in metrics.items()})
            print(f"[{i}/{args.steps}] adv: {float(metrics['G/latent_adv']):.3f}",
                  flush=True)
        if i % args.ckpt_every == 0 or i == args.steps:
            ckpt.save(i, nets=state.params, nets_ema=state.ema)
        if i % args.sample_every == 0 and args.out_dir:
            _stargan2_sample_grid(trainer, state, batch, args, i)
        if i >= args.steps:
            break


def _stargan2_sample_grid(trainer, state, batch, args, step):
    """Per-interval debug grid from the EMA nets (the reference's
    debug_image, core/utils.py:122-148) — visual convergence evidence."""
    import jax.numpy as jnp

    from vst.eval.video import translate_and_reconstruct

    n = min(4, batch["x_real"].shape[0])
    ema = state.ema

    def generate(x, s):
        return trainer.G.apply({"params": ema["generator"]}, x, s)

    def style_encode(x, y):
        return trainer.E.apply({"params": ema["style_enc"]}, x, jnp.asarray(y))

    translate_and_reconstruct(
        generate, style_encode,
        batch["x_real"][:n], batch["y_org"][:n],
        batch["x_ref"][:n], batch["y_trg"][:n],
        filename=f"{args.out_dir}/sample_{step:06d}.png")


def _make_raft(args):
    import jax
    import jax.numpy as jnp

    from vst.flow.raft import RAFT

    on_tpu = jax.default_backend() == "tpu"
    # bf16 encoders: 285→172 ms per batched fwd+bwd Sintel pair, 0.1% rel
    # flow delta (update block stays f32 — measured SLOWER in bf16: casts
    # break the scan-body fusion). Opt-out via --no-raft-bf16 so the metric
    # instrument can run at reference precision (ADVICE r2).
    use_bf16 = getattr(args, "raft_bf16", None)
    if use_bf16 is None:
        use_bf16 = on_tpu
    raft = RAFT(small=False, iters=args.raft_iters, pallas_lookup=on_tpu,
                encoder_dtype=jnp.bfloat16 if use_bf16 else None)
    H, W = args.hw
    # RAFT is fully convolutional: params are shape-independent, but the
    # init trace must satisfy the multiple-of-8 contract (the eval loop
    # pads frames with InputPadder before apply).
    H8, W8 = -(-H // 8) * 8, -(-W // 8) * 8
    img = jnp.zeros((1, H8, W8, 3), jnp.float32)
    params = raft.init(jax.random.PRNGKey(0), img, img)
    if args.raft_ckpt:
        import torch

        from vst.flow.raft import raft_params_from_torch

        sd = torch.load(args.raft_ckpt, map_location="cpu")
        params = {"params": raft_params_from_torch(sd)}
    return lambda a, b: raft.apply(params, a, b)


def _load_pre_style(args):
    """Ruder's frame-0 bootstrap model params (fs_ruder.py:25-34): the
    reference hardcodes a pretrained Johnson run; vst takes
    --pre-style-ckpt (default runs/johnson). Falls back to seeded init
    when the checkpoint does not exist (provenance: random bootstrap)."""
    import os

    import jax
    import jax.numpy as jnp

    from vst.core import Checkpointer
    from vst.models.faststyle import FastStyleNet

    ckpt_dir = getattr(args, "pre_style_ckpt", None) or "runs/johnson"
    pre_net = FastStyleNet(n_styles=args.n_styles)
    tpl = pre_net.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 64, 64, 3)), 1.0, 0)["params"]
    if os.path.isdir(ckpt_dir):
        ck = Checkpointer(ckpt_dir)
        step = ck.latest_step()
        if step:
            return ck.restore(step, params=tpl)["params"]
    print(f"pre-style ckpt {ckpt_dir} not found — seeded bootstrap",
          flush=True)
    return tpl


def cmd_eval_sintel(args):
    import jax
    import jax.numpy as jnp

    from vst.data.synthetic import AffineMotionGenerator, _texture
    from vst.eval.sintel import SintelVideo, load_sintel_videos
    from vst.eval.drivers import evaluate_sintel_faststyle
    from vst.train.registry import select_method
    from vst.train.faststyle import FastStyleTrainer
    from vst.data.styles import load_style_images

    # the SG2 generator's encoder/decoder needs /16 dims — the reference
    # crops Sintel frames to 432 rows for the same reason
    # (sintel_eval.py:82-88); mirror that on the synthetic video
    if args.family == "stargan2":
        args.hw = [args.hw[0] // 16 * 16, args.hw[1] // 16 * 16]

    flow_fn = None
    if args.sintel_dir:
        videos = load_sintel_videos(args.sintel_dir)
    else:
        rng = np.random.RandomState(args.seed)
        gen = AffineMotionGenerator(crop_hw=tuple(args.hw), seed=args.seed)
        big = (args.hw[0] + 96, args.hw[1] + 96)
        frames, _, _ = gen.generate(_texture(rng, big), n_frames=8)
        videos = [SintelVideo("synthetic_1", frames)]

        def flow_fn(video, i, j):
            """Analytic motion oracle: without pretrained RAFT weights the
            random-net flow fails the fb-consistency check everywhere
            (mask ≡ 0 → TCL ≡ 0); the affine generator knows the exact
            flow between ANY frame pair."""
            ff, bf = gen.pairwise_flows(j, i)  # j = earlier, i = current
            return ff, bf

    raft_apply = _make_raft(args)
    from vst.core import Checkpointer

    if args.family == "faststyle":
        n_frames = 3 if args.method == "ruder" else 2
        cfg = select_method(args.method, n_styles=args.n_styles,
                            n_frames=n_frames)
        styles = load_style_images(size=64)[:max(args.n_styles, 1)]
        pre_style = _load_pre_style(args) if args.method == "ruder" else None
        trainer = FastStyleTrainer(cfg, styles, seed=args.seed,
                                   pre_style_params=pre_style)
        from vst.data.synthetic import synthetic_batch
        import jax.numpy as jnp

        sample = {k: jnp.asarray(v) for k, v in
                  synthetic_batch(1, hw=tuple(args.hw),
                                  n_frames=n_frames).items()}
        state = trainer.init_state(sample)
        params = state.params
        if args.ckpt_dir:
            ckpt = Checkpointer(args.ckpt_dir)
            params = ckpt.restore(ckpt.latest_step(), params=params)["params"]
        if args.method == "ruder":
            # streaming protocol: Johnson bootstrap frame 0, 7-ch net with
            # (mask, warped prev stylized) after (fs_ruder.py:110-121)
            from vst.eval.drivers import evaluate_sintel_ruder

            results = evaluate_sintel_ruder(
                trainer, params, trainer.pre_style_params, videos,
                raft_apply, styles=list(range(max(args.n_styles, 3))),
                out_path=args.out_dir, dt_iters=args.dt_iters,
                flow_fn=flow_fn)
        else:
            results = evaluate_sintel_faststyle(
                trainer, params, videos, raft_apply,
                styles=list(range(max(args.n_styles, 3))),
                out_path=args.out_dir, dt_iters=args.dt_iters,
                flow_fn=flow_fn,
            )
    elif args.family == "stargan":
        # StarGAN v1 Sintel eval (solver.py:639-721): G conditioned on the
        # target-domain one-hot, domains 1..c_dim-1 as styles
        from vst.eval.drivers import evaluate_sintel_stargan
        from vst.train.stargan import StarGANConfig, StarGANTrainer

        cfg = StarGANConfig(c_dim=args.num_domains, image_size=128)
        trainer = StarGANTrainer(cfg, seed=args.seed)
        state = trainer.init_state(args.seed)
        g_params = state.g_params
        if args.ckpt_dir:
            ckpt = Checkpointer(args.ckpt_dir)
            g_params = ckpt.restore(ckpt.latest_step(), G=g_params)["G"]
        results = evaluate_sintel_stargan(
            trainer, g_params, videos, raft_apply, c_dim=args.num_domains,
            out_path=args.out_dir, dt_iters=args.dt_iters, flow_fn=flow_fn)
    elif args.family == "stargan2":
        # StarGAN-v2 Sintel eval via mapping-network latent styles
        # (core/solver.py:268-356); EMA nets like the reference
        from vst.eval.drivers import evaluate_sintel_stargan2
        from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer

        cfg = StarGAN2Config(img_size=256, num_domains=args.num_domains)
        trainer = StarGAN2Trainer(cfg, seed=args.seed)
        state = trainer.init_state(args.seed)
        params = state.ema
        if args.ckpt_dir:
            ckpt = Checkpointer(args.ckpt_dir)
            params = ckpt.restore(ckpt.latest_step(),
                                  nets_ema=state.ema)["nets_ema"]
        results = evaluate_sintel_stargan2(
            trainer, params, videos, raft_apply,
            num_domains=args.num_domains, out_path=args.out_dir,
            dt_iters=args.dt_iters, flow_fn=flow_fn)
    elif args.family == "cyclegan":
        # one model per style (fc2_eval.py:248-251); --ckpt-dir takes a
        # comma-list "variant:dir" (or plain dirs, variant=cyclegan)
        from vst.eval.drivers import cyclegan_stylize_fn
        from vst.eval.sintel import evaluate_videos
        from vst.train.cyclegan import CycleGANConfig, CycleGANTrainer

        tps = []
        for spec in (args.ckpt_dir or "").split(","):
            if not spec:
                continue
            variant, _, d = spec.rpartition(":")
            variant = variant or "cyclegan"
            tr = CycleGANTrainer(
                CycleGANConfig(variant=variant), image_hw=(256, 256),
                # mogan/congan trainers bind RAFT for their in-graph flow
                # losses; inference (G_A only) never calls it
                raft_apply=raft_apply if variant in ("mogan", "congan")
                else None, seed=args.seed)
            tpl = tr.init_state(args.seed).params
            ckpt = Checkpointer(d)
            tps.append((tr, ckpt.restore(ckpt.latest_step(), params=tpl)["params"]))
        if not tps:
            raise SystemExit("--ckpt-dir required for family=cyclegan")
        results = evaluate_videos(
            videos, cyclegan_stylize_fn(tps), raft_apply,
            styles=list(range(len(tps))), out_path=args.out_dir,
            frame_transform=lambda f: f * 2.0 - 1.0,
            dt_iters=args.dt_iters, flow_fn=flow_fn)
    else:
        raise SystemExit(f"unknown family {args.family}")
    print({k: v[f"{k}_mean"] for k, v in results.items()})


def _fc2_eval_batches(args, num_dom):
    """Eval batches for the FC2 metric harness: the materialized corpus'
    eval split when --data-dir points at a corpus root (DATAFiles +
    styled-files trio), synthetic stand-ins otherwise."""
    import os

    from vst.data.fc2 import (DatasetFC2, FC2Loader, synthetic_fc2_batches,
                              train_eval_split)

    if args.data_dir and os.path.isdir(
            os.path.join(args.data_dir, "DATAFiles")):
        ds = DatasetFC2(os.path.join(args.data_dir, "DATAFiles"),
                        os.path.join(args.data_dir, "styled-files"),
                        os.path.join(args.data_dir, "styled-files3"),
                        num_dom=num_dom, base_len=None)
        _, ev = train_eval_split(len(ds), split=args.split, seed=args.seed)
        loader = FC2Loader(ds, ev, args.batch_size, seed=args.seed)
        return list(loader.epoch(shuffle=False))
    return synthetic_fc2_batches(4, args.batch_size, hw=tuple(args.hw),
                                 num_dom=num_dom, seed=args.seed)


def cmd_eval_fc2(args):
    """FC2 FID/LPIPS/TCL metric eval — the reference's ``--mode fc2``
    drivers (``obst_eval.py:735-751``, ``StarGANv2Adv/core/solver.py``
    calculate_metrics call sites)."""
    import jax
    import jax.numpy as jnp

    from vst.core import Checkpointer
    from vst.eval.fc2 import calculate_metrics

    num_dom = args.num_domains
    batches = _fc2_eval_batches(args, num_dom)
    step = 0

    if args.family == "obst":
        # OBST FC2 protocol (obst_eval.py:570-724) computes its own
        # TCL/FID (no LPIPS) with warp-warm-started frame-2 stylization;
        # it bypasses calculate_metrics. Mirrors the reference's
        # committed eval_fc2/{0,2000}/{FID,TCL}.json golden layout.
        import os as _os

        from vst.data.styles import load_style_images
        from vst.eval.drivers import evaluate_fc2_obst
        from vst.metrics.fid import InceptionV3
        from vst.models.gatys import OBST

        for b in batches:  # harness speaks [−1,1]; OBST expects [0,1]
            for k in ("x_src", "x2_src", "x_ref"):
                b[k] = (np.asarray(b[k]) + 1.0) / 2.0
        styles = np.stack(load_style_images(args.style_dir, size=256)[:3])
        H, W = args.hw
        L = len(args.iters_pyr)
        pyr = tuple((H >> (L - 1 - i), W >> (L - 1 - i)) for i in range(L))
        obst = OBST(
            max_iters=tuple(args.iters_pyr), seed=args.seed,
            compute_dtype=jnp.bfloat16 if args.obst_bf16 else jnp.float32)
        inception = InceptionV3(seed=0)
        for wt in args.obst_lambdas:
            out = _os.path.join(args.out_dir, str(int(wt)))
            res = evaluate_fc2_obst(
                obst, batches, jnp.asarray(styles), pyr,
                weight_tcl=float(wt), num_domains=num_dom, out_dir=out,
                inception=inception)
            tcl = res["TCL"].get("TCL/mean", float("nan"))
            fid = res["FID"].get("FID/mean", float("nan"))
            print(f"lambda_tcl={wt}: TCL {tcl:.4f} FID {fid:.2f}")
        return

    if args.family == "stargan2":
        from vst.train.stargan2 import StarGAN2Config, StarGAN2Trainer

        cfg = StarGAN2Config(img_size=args.hw[0], num_domains=num_dom,
                             lambda_tcl=args.lambda_tcl)
        trainer = StarGAN2Trainer(cfg, seed=args.seed)
        state = trainer.init_state(args.seed)
        params = state.ema
        if args.ckpt_dir:
            ckpt = Checkpointer(args.ckpt_dir)
            step = ckpt.latest_step() or 0
            if step:
                params = ckpt.restore(step, nets_ema=state.ema)["nets_ema"]

        gen = jax.jit(lambda p, x, s: trainer.G.apply({"params": p}, x, s))
        map_fn = jax.jit(lambda p, z, y: trainer.F.apply({"params": p}, z, y))
        enc_fn = jax.jit(lambda p, x, y: trainer.E.apply({"params": p}, x, y))

        def style_fn(x, y, mode, rng, x_ref):
            if mode == "latent":
                z = jax.random.normal(rng, (x.shape[0], cfg.latent_dim))
                s = map_fn(params["mapping"], z, y)
            else:  # reference mode: style code from x_ref (eval.py:128)
                s = enc_fn(params["style_enc"], x_ref, y)
            return gen(params["generator"], x, s)

    elif args.family == "stargan":
        from vst.train.stargan import StarGANConfig, StarGANTrainer

        cfg = StarGANConfig(c_dim=num_dom, image_size=args.hw[0])
        trainer = StarGANTrainer(cfg, seed=args.seed)
        state = trainer.init_state(args.seed)
        g_params = state.g_params
        if args.ckpt_dir:
            ckpt = Checkpointer(args.ckpt_dir)
            step = ckpt.latest_step() or 0
            if step:
                g_params = ckpt.restore(step, G=state.g_params)["G"]
        gen = jax.jit(lambda x, c: trainer.G.apply({"params": g_params}, x, c))

        def style_fn(x, y, mode, rng, x_ref):
            return gen(x, jax.nn.one_hot(y, num_dom))

    elif args.family == "faststyle":
        from vst.data.styles import load_style_images
        from vst.train.registry import select_method
        from vst.train.faststyle import FastStyleTrainer

        n_frames = 3 if args.method == "ruder" else 2
        cfg = select_method(args.method, n_styles=max(num_dom - 1, 1),
                            batch_size=args.batch_size, n_frames=n_frames)
        styles = load_style_images(None, size=256)[:max(num_dom - 1, 1)]
        args.n_styles = max(num_dom - 1, 1)
        pre_style = _load_pre_style(args) if args.method == "ruder" else None
        trainer = FastStyleTrainer(cfg, styles, seed=args.seed,
                                   pre_style_params=pre_style)
        dummy = {"imgs": jnp.zeros((1, cfg.n_frames) + tuple(args.hw) + (3,)),
                 "masks": jnp.zeros((1, cfg.n_frames - 1) + tuple(args.hw) + (1,)),
                 "flows": jnp.zeros((1, cfg.n_frames - 1) + tuple(args.hw) + (2,))}
        state = trainer.init_state(dummy)
        params = state.params
        if args.ckpt_dir:
            ckpt = Checkpointer(args.ckpt_dir)
            step = ckpt.latest_step() or 0
            if step:
                params = ckpt.restore(step, params=state.params)["params"]
        if args.method == "ruder":
            # two-frame streaming protocol (fast_style_transfer.py:640-676)
            # — its own TCL/FID driver, like the OBST FC2 path
            import os as _os

            from vst.eval.drivers import evaluate_fc2_ruder

            res = evaluate_fc2_ruder(
                trainer, params, trainer.pre_style_params, batches,
                num_domains=num_dom, out_dir=args.out_dir)
            tclm = res["TCL"].get("TCL_mean", float("nan"))
            fidm = res["FID"].get("FID_mean", float("nan"))
            print(f"ruder FC2: TCL {tclm:.4f} FID {fidm:.2f}")
            return
        net = jax.jit(lambda x, sid: trainer.model.apply(
            {"params": params}, x, 1.0, sid)[1])

        def style_fn(x, y, mode, rng, x_ref):
            # LBST pipeline is [0,1]→[0,255]; harness speaks [−1,1]
            x01 = (x + 1.0) / 2.0
            sid = jnp.clip(y[0] - 1, 0, None)
            out = jnp.clip(net(x01, sid) / 255.0, 0.0, 1.0)
            return out * 2.0 - 1.0

    else:
        raise SystemExit(f"unknown family {args.family}")

    results = calculate_metrics(
        style_fn, batches, num_domains=num_dom, mode=args.mode,
        num_outs_per_domain=args.num_outs, step=step,
        out_dir=args.out_dir, rng_seed=args.seed,
        # StarGAN v1 (and the per-style faststyle heads) ignore the rng —
        # within-chunk LPIPS diversity is degenerate-by-construction
        deterministic=args.family in ("stargan", "faststyle"))
    for name, d in results.items():
        key = f"{name}_{args.mode}/mean"
        if key in d:
            print(f"{name}: {d[key]:.4f}")


def cmd_datagen_fc2(args):
    from vst.data.datagen import pack_fc2_npy

    pack_fc2_npy(args.out_dir, args.n_samples, hw=tuple(args.hw),
                 seed=args.seed)
    print(f"wrote {args.n_samples} tuples to {args.out_dir}")


def cmd_datagen_styled(args):
    from vst.data.datagen import generate_styled_dataset
    from vst.data.styles import load_style_images
    from vst.data.synthetic import _texture
    from vst.models.gatys import OBST

    rng = np.random.RandomState(args.seed)
    contents = [(f"{i:07d}", _texture(rng, (args.hw[0] + 32, args.hw[1] + 32)))
                for i in range(args.n_samples)]
    styles = load_style_images(args.style_dir, size=256)[:3]
    pyr = ((args.hw[0] // 4, args.hw[1] // 4),
           (args.hw[0] // 2, args.hw[1] // 2), tuple(args.hw))
    generate_styled_dataset(contents, styles, args.out_dir,
                            obst=OBST(max_iters=args.iters),
                            pyr_shapes=pyr, batch_size=args.batch_size)
    print(f"styled {args.n_samples} images into {args.out_dir}")


def cmd_align_faces(args):
    """align_faces parity (StarGANv2Adv/core/wing.py:413-436): align every
    image in input-dir to the landmark template and write output-dir."""
    import os

    import imageio.v2 as imageio
    import jax

    from vst.models.align import FaceAligner
    from vst.models.wing import FAN, fan_params_from_torch
    from vst.ops.image import resize_bilinear
    import jax.numpy as jnp

    fan = FAN()
    if args.wing_ckpt:
        import torch

        params = fan_params_from_torch(
            torch.load(args.wing_ckpt, map_location="cpu"))
    else:
        params = fan.init(jax.random.PRNGKey(args.seed),
                          jnp.zeros((1, 256, 256, 3)))["params"]
    ref = None
    if args.lm_path:
        ref = np.load(args.lm_path)["mean"].astype(np.float32)
    aligner = FaceAligner(fan, params, output_size=args.img_size,
                          ref_landmarks=ref)

    os.makedirs(args.output_dir_align, exist_ok=True)
    names = sorted(os.listdir(args.input_dir))
    for name in names:
        img = imageio.imread(os.path.join(args.input_dir, name))
        img = np.asarray(resize_bilinear(
            jnp.asarray(img.astype(np.float32) / 255.0)[None],
            (args.img_size, args.img_size), align_corners=False))[0]
        out = aligner.align(img[None] * 2.0 - 1.0)[0]
        imageio.imwrite(
            os.path.join(args.output_dir_align, name),
            (np.clip(out * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8))
    print(f"aligned {len(names)} images → {args.output_dir_align}")


def cmd_datagen_corpus(args):
    from vst.data.datagen import generate_fc2_corpus

    generate_fc2_corpus(args.out_dir, args.n_samples, hw=tuple(args.hw),
                        style_dir=args.style_dir, iters=tuple(args.iters),
                        batch_size=args.batch_size, seed=args.seed,
                        styler=args.styler)
    print(f"corpus of {args.n_samples} pairs × domains in {args.out_dir}")



def cmd_eval_obst(args):
    """OBST Sintel eval at one or more lambda_tcl settings — reproduces the
    thesis's core OBST result shape (eval_sintel/{0,2000}: the TCL-ST drop
    when the temporal term is on, ``obst_eval.py:413-566``) and writes a
    regenerable timing summary (DT ms/frame; NOTES r2 claim 2.43 s/frame
    vs reference 3.33, eval_sintel/2000/DT.json)."""
    import json
    import os
    import time

    import jax
    import jax.numpy as jnp

    from vst.data.styles import load_style_images
    from vst.data.synthetic import AffineMotionGenerator, _texture
    from vst.eval.drivers import evaluate_sintel_obst
    from vst.eval.sintel import SintelVideo, load_sintel_videos
    from vst.models.gatys import OBST

    if args.sintel_dir:
        videos = load_sintel_videos(args.sintel_dir)[: args.n_videos]
    else:
        rng = np.random.RandomState(args.seed)
        H, W = args.hw
        videos = []
        for v in range(args.n_videos):
            gen = AffineMotionGenerator(crop_hw=(H, W), seed=args.seed + v)
            frames, _, _ = gen.generate(
                _texture(rng, (H + 96, W + 96)), n_frames=args.n_frames)
            videos.append(SintelVideo(f"synthetic_{v + 1}", frames))

    raft_apply = _make_raft(args)
    styles = np.stack(load_style_images(args.style_dir, size=256)[:3])
    H, W = args.hw
    L = len(args.iters_pyr)  # pyramid levels follow the iters list
    pyr = tuple((H >> (L - 1 - i), W >> (L - 1 - i)) for i in range(L))
    obst = OBST(
        max_iters=tuple(args.iters_pyr), seed=args.seed,
        compute_dtype=jnp.bfloat16 if args.obst_bf16 else jnp.float32)

    summary = {
        "hw": list(args.hw), "n_videos": args.n_videos,
        "n_frames": args.n_frames, "iters_pyr": list(args.iters_pyr),
        "vgg_backbone": "random-he",
        "device": str(jax.devices()[0]),
        "obst_dtype": "bfloat16" if args.obst_bf16 else "float32",
        "methodology": (
            "DT timer wraps obst.run ONLY (the reference's t_start/t_end "
            "region, obst_eval.py:524-531); per-frame RAFT (fwd+bwd, and "
            "the t-5 pair where applicable) runs OUTSIDE the timer and is "
            "reported as RAFT_ms_mean. LBFGS iteration counts are the "
            "torch closure-call counts of the reference driver: "
            "[50,40,30] -> [60,60,40] (vst.ops.lbfgs.torch_eval_counts)."),
    }
    for wt in args.lambda_tcl:
        out = os.path.join(args.out_dir, str(int(wt)))
        t0 = time.time()
        res = evaluate_sintel_obst(
            obst, videos, raft_apply, jnp.asarray(styles), pyr,
            weight_tcl=float(wt), out_path=out)
        wall = time.time() - t0
        dts = [v for k, v in res["DT"].items()]
        sts = [v for k, v in res["TCL-ST"].items()]
        summary[str(int(wt))] = {
            "DT_ms_mean": float(np.mean(dts)),
            "TCL-ST_mean": float(np.mean(sts)),
            "TCL-LT_mean": float(np.mean(
                [v for v in res["TCL-LT"].values()])),
            "RAFT_ms_mean": float(np.mean(
                list(res["RAFT-MS"].values()))) if "RAFT-MS" in res else None,
            "wall_s": wall,
        }
        print(f"lambda_tcl={wt}: TCL-ST {summary[str(int(wt))]['TCL-ST_mean']:.4f} "
              f"DT {summary[str(int(wt))]['DT_ms_mean']:.0f} ms/frame")
    os.makedirs(args.out_dir, exist_ok=True)
    # merge-update: the λ settings are run as SEPARATE queue jobs (one TPU
    # client at a time), so a λ=0 run must not clobber the λ=2000 entry
    summary_path = os.path.join(args.out_dir, "summary.json")
    if os.path.exists(summary_path):
        with open(summary_path) as f:
            prev = json.load(f)
        prev.update(summary)
        summary = prev
    with open(summary_path, "w") as f:
        json.dump(summary, f, indent=2, sort_keys=True)



def cmd_stylize_video(args):
    """Offline batch video stylization — the production consumer of the
    batch-throughput path bench.py measures (frames are independent, so
    offline stylization batches them through ONE program; the reference
    can only write frames one-by-one, ``fast_style_transfer.py:313-390``).
    Reads a video file / frame directory / synthetic clip, stylizes in
    chunks of --batch-size, writes frames + a video, prints a throughput
    JSON line."""
    import json as _json
    import os
    import time

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from vst.data.styles import load_style_images
    from vst.train.faststyle import FastStyleTrainer
    from vst.train.registry import select_method

    # --- frames ---
    if args.source and os.path.isdir(args.source):
        names = sorted(os.listdir(args.source))
        frames = np.stack([
            imageio.imread(os.path.join(args.source, f)).astype(np.float32)
            / 255.0 for f in names if f.lower().endswith((".png", ".jpg"))])
    elif args.source:
        import cv2

        cap = cv2.VideoCapture(args.source)
        got = []
        while True:
            ok, bgr = cap.read()
            if not ok:
                break
            got.append(bgr[..., ::-1].astype(np.float32) / 255.0)
        frames = np.stack(got)
    else:
        from vst.data.synthetic import AffineMotionGenerator, _texture

        rng = np.random.RandomState(args.seed)
        gen = AffineMotionGenerator(crop_hw=tuple(args.hw), seed=args.seed)
        frames, _, _ = gen.generate(
            _texture(rng, (args.hw[0] + 96, args.hw[1] + 96)),
            n_frames=args.n_frames)
    T, H, W = frames.shape[:3]
    H4, W4 = H // 4 * 4, W // 4 * 4  # FastStyleNet needs /4 dims
    frames = frames[:, :H4, :W4]

    # --- model ---
    cfg = select_method(args.method, n_styles=args.n_styles)
    styles = load_style_images(args.style_dir, size=256)[:args.n_styles]
    trainer = FastStyleTrainer(cfg, styles, seed=args.seed)
    dummy = {"imgs": jnp.zeros((1, cfg.n_frames, H4, W4, 3)),
             "masks": jnp.zeros((1, cfg.n_frames - 1, H4, W4, 1)),
             "flows": jnp.zeros((1, cfg.n_frames - 1, H4, W4, 2))}
    params = trainer.init_state(dummy).params
    if args.ckpt_dir:
        from vst.core import Checkpointer

        ck = Checkpointer(args.ckpt_dir)
        step = ck.latest_step()
        if step:
            params = ck.restore(step, params=params)["params"]
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    p = jax.tree.map(lambda v: v.astype(dtype), params)

    import functools

    @functools.partial(jax.jit, donate_argnums=(1,))
    def stylize(p, imgs):
        _, out = trainer.model.apply(
            {"params": p}, imgs, args.strength, args.sid)
        return jnp.clip(out / 255.0, 0.0, 1.0)

    B = args.batch_size
    os.makedirs(args.out_dir, exist_ok=True)
    # warm (compile outside the timed region, like every vst benchmark)
    warm = jnp.zeros((B, H4, W4, 3), dtype)
    float(jnp.sum(stylize(p, warm)))
    outs = []
    t0 = time.perf_counter()
    for i in range(0, T, B):
        chunk = frames[i:i + B]
        n = chunk.shape[0]
        if n < B:  # pad the tail chunk — ONE compiled program total
            chunk = np.concatenate(
                [chunk, np.zeros((B - n,) + chunk.shape[1:], chunk.dtype)])
        y = stylize(p, jnp.asarray(chunk, dtype))
        outs.append(np.asarray(y[:n], np.float32))
    wall = time.perf_counter() - t0
    styled = np.concatenate(outs)

    for i, f in enumerate(styled):
        imageio.imwrite(os.path.join(args.out_dir, f"frame_{i:05d}.png"),
                        (f * 255).astype(np.uint8))
    from vst.eval.video import _writer

    vpath, w = _writer(os.path.join(args.out_dir, "styled.mp4"), fps=18)
    for f in styled:
        w.append_data((f * 255).astype(np.uint8))
    w.close()
    print(_json.dumps({
        "frames": int(T), "hw": [H4, W4], "batch_size": B,
        "dtype": "bfloat16" if args.bf16 else "float32",
        "wall_s": round(wall, 3),
        "frames_per_sec": round(T / wall, 2), "video": vpath}))


def cmd_bench_raft(args):
    """RAFT pair benchmark at Sintel resolution — writes a regenerable
    timing artifact (VERDICT r2 missing #5: the 86 ms/direction claim
    lived only in NOTES). Times the exact eval-path program: fwd+bwd in
    ONE batched call (vst/eval/sintel.py compute_raft_pair), chained
    timing with a scalar fetch (block_until_ready does not sync on the
    tunneled platform). Also reports the bf16-vs-f32 flow delta."""
    import json
    import os
    import time

    import jax
    import jax.numpy as jnp

    from vst.flow.raft import RAFT
    from vst.ops.image import InputPadder

    H, W = args.hw
    rng = np.random.RandomState(args.seed)
    img1 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32))
    on_tpu = jax.default_backend() == "tpu"

    results = {"hw": [H, W], "iters": args.raft_iters,
               "device": str(jax.devices()[0]),
               "methodology": "chained pair loop, best-of-3, scalar-fetch sync",
               "weights": "seeded-random (no egress; program identical to "
                          "converted-checkpoint path)"}
    flows = {}
    bf16 = jnp.bfloat16
    # (name, encoder_dtype, update_dtype, pad mult). pad 64 aligns every
    # corr-pyramid level to the 8-sublane tiling (436->448: 56/28/14/7
    # rows at levels 1/8..1/64 instead of 55/27/13/6) — candidate fix for
    # the layout-bound GRU loop (bisect_raft: 5.45 ms/iter, ~5x roofline).
    variants = (("f32", None, None, 8),
                ("bf16_enc", bf16, None, 8),
                ("bf16_full", bf16, bf16, 8),
                ("f32_pad64", None, None, 64),
                ("bf16_full_pad64", bf16, bf16, 64))
    for name, enc_dtype, upd_dtype, pmult in variants:
        raft = RAFT(small=False, iters=args.raft_iters, pallas_lookup=on_tpu,
                    encoder_dtype=enc_dtype, update_dtype=upd_dtype)
        padder = InputPadder(img1.shape, mult=pmult)
        i1, i2 = padder.pad(img1, img2)
        params = raft.init(jax.random.PRNGKey(0), i1, i2)
        a = jnp.concatenate([i1, i2], axis=0)
        b = jnp.concatenate([i2, i1], axis=0)

        @jax.jit
        def pair(a, b):
            _, up = raft.apply(params, a, b)
            return up

        up = pair(a, b)
        float(jnp.sum(up))  # compile + sync
        flows[name] = np.asarray(padder.unpad(up[:1]), np.float32)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            x = (a, b)
            for _i in range(args.iters):
                up = pair(x[0] + 0.0 * jnp.mean(up), x[1])
            float(jnp.sum(up))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        results[f"pair_ms_{name}"] = round(best * 1000.0, 2)
        print(f"{name}: {best * 1000:.1f} ms/pair (fwd+bwd batched)")

        # direction-batch slope (VERDICT r3 item 4): the Sintel harness
        # needs 2 flow pairs per frame (ST prev↔cur + LT i−5↔i) = 4
        # directions; if the update loop is latency- rather than
        # FLOP-bound, batching pairs through ONE program divides the
        # per-pair cost. The eval harness consumes the x2 row via
        # vst/eval/sintel.py compute_raft_multi (the fused tcl2 program
        # runs both pairs in one RAFT call at batch 4); x4 is the slope
        # evidence for batching across frames.
        for mult in (2, 4) if name in ("f32", "bf16_full_pad64") else ():
            am = jnp.concatenate([a] * mult, axis=0)
            bm = jnp.concatenate([b] * mult, axis=0)
            upm = pair(am, bm)
            float(jnp.sum(upm))
            bestm = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                x = (am, bm)
                for _i in range(args.iters):
                    upm = pair(x[0] + 0.0 * jnp.mean(upm), x[1])
                float(jnp.sum(upm))
                bestm = min(bestm, (time.perf_counter() - t0) / args.iters)
            results[f"pair_ms_{name}_x{mult}"] = round(
                bestm * 1000.0 / mult, 2)
            print(f"{name} x{mult}: {bestm * 1000 / mult:.1f} ms/pair "
                  f"({mult} pairs per program)")

    mag = np.sqrt((flows["f32"] ** 2).sum(-1)) + 1e-6
    for name in flows:
        if name == "f32":
            continue
        epe = np.sqrt(((flows[name] - flows["f32"]) ** 2).sum(-1))
        results[f"{name}_vs_f32_epe_mean"] = float(epe.mean())
        results[f"{name}_vs_f32_rel_mean"] = float((epe / mag).mean())
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "raft_timing.json"), "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(json.dumps(results))


def cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    parser = argparse.ArgumentParser(prog="vst", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("train-faststyle")
    _add_common(p)
    p.add_argument("--method", default="johnson",
                   choices=["johnson", "dumoulin", "huang", "reconet", "ruder"])
    p.add_argument("--n-styles", type=int, default=1)
    p.add_argument("--style-dir", type=str, default=None)
    p.add_argument("--pre-style-ckpt", type=str, default=None,
                   help="checkpoint dir of a trained Johnson/Dumoulin run; "
                        "ruder's first-frame bootstrap (fs_ruder.py:25-34)")
    p.set_defaults(fn=cmd_train_faststyle)

    p = sub.add_parser("train-cyclegan")
    _add_common(p)
    p.add_argument("--variant", default="cyclegan",
                   choices=["cyclegan", "cyclegan_con", "mogan", "congan"])
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--sid", type=int, default=1,
                   help="style id — one model per style (fc2_dataset.py)")
    p.add_argument("--raft-iters", type=int, default=20)
    p.add_argument("--raft-ckpt", type=str, default=None)
    p.add_argument("--raft-bf16", action=argparse.BooleanOptionalAction,
                   default=None, help="bf16 RAFT encoders (default: on for "
                   "TPU; --no-raft-bf16 runs the instrument at reference f32)")
    p.add_argument("--compute-dtype", type=str, default=None,
                   choices=[None, "bfloat16"],
                   help="G/D mixed-precision policy (vst/train/policy.py)")
    p.set_defaults(fn=cmd_train_cyclegan)

    p = sub.add_parser("train-stargan")
    _add_common(p)
    p.add_argument("--num-domains", type=int, default=4)
    p.add_argument("--conv-dim", type=int, default=64)
    p.add_argument("--repeat-num", type=int, default=6)
    p.add_argument("--n-critic", type=int, default=5)
    p.set_defaults(fn=cmd_train_stargan)

    p = sub.add_parser("train-stargan2")
    _add_common(p)
    p.add_argument("--num-domains", type=int, default=4)
    p.add_argument("--style-dim", type=int, default=64)
    p.add_argument("--latent-dim", type=int, default=16)
    p.add_argument("--max-conv-dim", type=int, default=512)
    p.add_argument("--lambda-tcl", type=float, default=0.0,
                   help="100 = AdvCon")
    p.add_argument("--sample-every", type=int, default=1000,
                   help="debug sample-grid interval (core/utils.py:122-148)")
    p.add_argument("--compute-dtype", type=str, default=None,
                   choices=[None, "bfloat16"],
                   help="G/F/E/D mixed-precision policy (vst/train/policy.py)")
    p.set_defaults(fn=cmd_train_stargan2)

    p = sub.add_parser("eval-sintel")
    _add_common(p)
    p.add_argument("--family", default="faststyle",
                   choices=["faststyle", "stargan", "stargan2", "cyclegan"])
    p.add_argument("--method", default="johnson")
    p.add_argument("--pre-style-ckpt", type=str, default="runs/johnson",
                   help="ruder frame-0 bootstrap run (fs_ruder.py:25-34)")
    p.add_argument("--num-domains", type=int, default=4)
    p.add_argument("--n-styles", type=int, default=3)
    p.add_argument("--sintel-dir", type=str, default=None)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--raft-iters", type=int, default=20)
    p.add_argument("--raft-ckpt", type=str, default=None)
    p.add_argument("--raft-bf16", action=argparse.BooleanOptionalAction,
                   default=None, help="bf16 RAFT encoders (default: on for "
                   "TPU; --no-raft-bf16 runs the instrument at reference f32)")
    # 20 chained iterations amortize the tunneled backend's end-of-window
    # sync RTT to <0.5 ms/frame (at the default 5 the sync added ~4 ms to
    # every committed DT mean; bench.py uses 20 for the same reason)
    p.add_argument("--dt-iters", type=int, default=20)
    p.set_defaults(fn=cmd_eval_sintel)

    p = sub.add_parser("bench-raft")
    _add_common(p)
    p.add_argument("--raft-iters", type=int, default=20)
    p.add_argument("--iters", type=int, default=5,
                   help="timing loop length")
    p.set_defaults(fn=cmd_bench_raft)

    p = sub.add_parser("eval-obst")
    _add_common(p)
    p.add_argument("--sintel-dir", type=str, default=None)
    p.add_argument("--style-dir", type=str, default=None)
    p.add_argument("--n-videos", type=int, default=2)
    p.add_argument("--n-frames", type=int, default=8)
    p.add_argument("--iters-pyr", type=int, nargs="+", default=[50, 40, 30])
    p.add_argument("--lambda-tcl", type=float, nargs="+", default=[0.0, 2000.0])
    p.add_argument("--raft-iters", type=int, default=20)
    p.add_argument("--raft-ckpt", type=str, default=None)
    p.add_argument("--raft-bf16", action=argparse.BooleanOptionalAction,
                   default=None)
    p.add_argument("--obst-bf16", action="store_true",
                   help="bf16 VGG closures (f32 Gram/loss accumulation)")
    p.set_defaults(fn=cmd_eval_obst)

    p = sub.add_parser("eval-fc2")
    _add_common(p)
    p.add_argument("--family", default="stargan2",
                   choices=["stargan2", "stargan", "faststyle", "obst"])
    p.add_argument("--method", default="johnson",
                   help="faststyle head (faststyle family only)")
    p.add_argument("--style-dir", type=str, default=None,
                   help="style images (obst family)")
    p.add_argument("--iters-pyr", type=int, nargs="+", default=[50, 40, 30],
                   help="LBFGS iters per pyramid level (obst family)")
    p.add_argument("--obst-lambdas", type=float, nargs="+",
                   default=[0.0, 2000.0],
                   help="weight_tcl settings, one out-subdir each (obst)")
    p.add_argument("--obst-bf16", action="store_true",
                   help="bf16 VGG closures (obst family)")
    p.add_argument("--mode", default="latent",
                   choices=["latent", "reference"])
    p.add_argument("--num-domains", type=int, default=4)
    p.add_argument("--num-outs", type=int, default=3,
                   help="fakes per eval sample (reference uses 10)")
    p.add_argument("--lambda-tcl", type=float, default=0.0)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--pre-style-ckpt", type=str, default="runs/johnson",
                   help="Ruder frame-0 bootstrap (fs_ruder.py:25-34)")
    p.add_argument("--split", type=float, default=0.97)
    p.set_defaults(fn=cmd_eval_fc2)

    p = sub.add_parser("datagen-fc2")
    _add_common(p)
    p.add_argument("--n-samples", type=int, default=64)
    p.set_defaults(fn=cmd_datagen_fc2)

    p = sub.add_parser("datagen-styled")
    _add_common(p)
    p.add_argument("--n-samples", type=int, default=8)
    p.add_argument("--style-dir", type=str, default=None)
    p.add_argument("--iters", type=int, nargs="+", default=(50, 40, 30))
    p.set_defaults(fn=cmd_datagen_styled)

    p = sub.add_parser("datagen-corpus")
    _add_common(p)
    p.add_argument("--n-samples", type=int, default=512)
    p.add_argument("--style-dir", type=str, default=None)
    p.add_argument("--iters", type=int, nargs="+", default=(30, 25, 20))
    p.add_argument("--styler", default="gatys",
                   choices=["gatys", "procedural"],
                   help="'procedural' = deterministic per-domain transforms "
                        "(for environments without pretrained VGG weights)")
    p.set_defaults(fn=cmd_datagen_corpus)

    p = sub.add_parser("align-faces",
                       help="FAN-landmark face alignment over an image dir "
                            "(the reference's main.py --mode align)")
    _add_common(p)
    p.add_argument("--input-dir", type=str, required=True)
    p.add_argument("--output-dir-align", type=str, required=True)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--wing-ckpt", type=str, default=None,
                   help="wing.ckpt torch state dict (seeded FAN otherwise)")
    p.add_argument("--lm-path", type=str, default=None,
                   help="celeba_lm_mean.npz; synthetic template otherwise")
    p.set_defaults(fn=cmd_align_faces)

    p = sub.add_parser("demo")
    _add_common(p)
    p.add_argument("--source", type=str, default=None,
                   help="'webcam', a video path, or omit for a synthetic clip")
    p.add_argument("--method", default="huang")
    p.add_argument("--n-styles", type=int, default=3)
    p.add_argument("--n-frames", type=int, default=60)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--show", action="store_true")
    p.set_defaults(fn=lambda a: __import__(
        "vst.cli.demo", fromlist=["run_demo"]).run_demo(
        source=a.source, ckpt_dir=a.ckpt_dir, method=a.method,
        n_styles=a.n_styles, n_frames=a.n_frames, hw=tuple(a.hw),
        out_path=a.out_dir + "/demo", show=a.show, seed=a.seed))

    p = sub.add_parser("stylize-video",
                       help="offline batch video stylization (the "
                            "batch-throughput production path)")
    _add_common(p)
    p.add_argument("--source", type=str, default=None,
                   help="video file, frame dir, or omit for synthetic")
    p.add_argument("--method", default="johnson")
    p.add_argument("--n-styles", type=int, default=3)
    p.add_argument("--style-dir", type=str, default=None)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--sid", type=int, default=0)
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--n-frames", type=int, default=24,
                   help="synthetic clip length when no --source")
    p.add_argument("--bf16", action="store_true")
    p.set_defaults(fn=cmd_stylize_video)

    p = sub.add_parser("demo-web",
                       help="browser GUI demo (the reference PyQt5 app's "
                            "surface: style buttons, strength slider, "
                            "resolution/source pickers, snapshot)")
    _add_common(p)
    p.add_argument("--source", type=str, default=None,
                   help="video path, webcam index, or omit for synthetic")
    p.add_argument("--method", default="huang")
    p.add_argument("--n-styles", type=int, default=3)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--port", type=int, default=8600)
    p.add_argument("--max-frames", type=int, default=None,
                   help="stop after N frames (testing)")
    p.set_defaults(fn=lambda a: __import__(
        "vst.cli.webdemo", fromlist=["run_web_demo"]).run_web_demo(
        port=a.port, max_frames=a.max_frames, source=a.source,
        ckpt_dir=a.ckpt_dir, method=a.method, n_styles=a.n_styles,
        hw=tuple(a.hw), out_path=a.out_dir + "/demo", seed=a.seed,
        platform=a.platform))

    p = sub.add_parser("bench")
    p.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    args.fn(args)


if __name__ == "__main__":
    main()
