"""Training CLI — mirrors ``train_net_unet.py:241-302``'s flags on top of
the typed config (no argparse-inside-the-model anti-pattern).

Usage:
    python -m lic_tpu.cli.train --train_data_path '/data/DIV2K/*.png' \
        --preset net_unet_ha_hs --lmbda 0.0025 --batch_size 8
"""

from __future__ import annotations

import argparse
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="lic_tpu trainer")
    p.add_argument("--train_data_path", required=True,
                   help="folder or glob of training images (e.g. DIV2K)")
    p.add_argument("--preset", default="net_unet_ha_hs",
                   help="model preset (see lic_tpu.models.PRESETS)")
    p.add_argument("--lmbda", type=float, default=0.0025,
                   help="R-D tradeoff (reference default, train_net_unet.py:273)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=256)
    p.add_argument("--epochs", type=int, default=5000)
    p.add_argument("--steps_per_epoch", type=int, default=100)
    p.add_argument("--checkpoint_dir", default="./ckpt")
    p.add_argument("--weight_path", default="",
                   help="npz params to resume/init from")
    p.add_argument("--high", action="store_true",
                   help="high-rate capacity N=384/M=32")
    p.add_argument("--post_processing", action="store_true",
                   help="train only the HAN post-processing phase")
    p.add_argument("--loss_type", choices=("mse", "msssim"), default="mse")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_devices", type=int, default=None,
                   help="restrict the data-parallel mesh size")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-host: host:port of process 0 "
                        "(jax.distributed.initialize; same flags on every "
                        "process, then the SAME mesh/pjit code spans the "
                        "pod)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    # persistent XLA compile cache: CLI invocations are separate
    # processes; without this every run pays multi-minute fresh
    # compiles on this host (round-5 finding: verify_cli spent
    # ~28 min in compiles the cache already knew)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ..config import TrainConfig
    from ..data import ImageFolderDataset, train_iterator
    from ..models import build_model
    from ..parallel import batch_sharding, initialize_multihost, make_mesh
    from ..training import train
    from ..utils.checkpoint import load_params, save_params

    if args.coordinator_address or args.num_processes or args.process_id:
        # must run before any other jax backend use on this process
        initialize_multihost(
            args.coordinator_address, args.num_processes, args.process_id
        )

    model = build_model(
        args.preset, is_high=args.high, post_processing=args.post_processing
    )
    tc = TrainConfig(
        lmbda=args.lmbda, lr=args.lr, batch_size=args.batch_size,
        crop_size=args.crop_size, epochs=args.epochs,
        loss_type=args.loss_type, seed=args.seed,
    )

    mesh = make_mesh(args.num_devices)
    ds = ImageFolderDataset(args.train_data_path, crop_size=args.crop_size)
    it = train_iterator(
        ds, args.batch_size, seed=args.seed, sharding=batch_sharding(mesh)
    )

    init_params = None
    if args.weight_path:
        import jax
        import jax.numpy as jnp
        import numpy as np

        sample = np.zeros(
            (args.batch_size, args.crop_size, args.crop_size, 3), np.float32
        )
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
            jnp.asarray(sample), training=True,
        )
        # phase-2 warm start: a base-phase checkpoint has no HAN-tail
        # leaves, so the load must be non-strict (fresh leaves keep their
        # init — the reference loads a HAN-less state dict the same way)
        init_params = load_params(
            args.weight_path, variables["params"],
            strict=not args.post_processing,
        )

    state = train(
        model, it, tc,
        steps_per_epoch=args.steps_per_epoch,
        checkpoint_dir=args.checkpoint_dir,
        post_processing_phase=args.post_processing,
        init_params=init_params,
        mesh=mesh,
        epochs=args.epochs,
    )
    save_params(os.path.join(args.checkpoint_dir, "final.npz"), state.params)


if __name__ == "__main__":
    main()
