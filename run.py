"""CLI entry point — same surface as the reference
(`/root/reference/run.py:14-67`):

    python run.py --cfg experiments/optic_sinkhorn/diversity.yaml \
                  --mode {search,train,test} [--output_dir out] [--seed N]

Distributed flags differ by design: JAX is single-controller, so there is
no mp.spawn/rendezvous surface (`distributed.py:15-31`); multi-chip data
parallelism is a mesh property (``--data_parallel N``, or all visible
devices by default). ``--mode test`` works (the reference's crashes:
`run.py:54` passes one arg to a two-arg worker, SURVEY §5 bugs).
"""

import argparse
import os
import sys

from aadg_tpu.config import load_config


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Adversarial AutoAugment (TPU)")
    parser.add_argument("--mode", default="search",
                        help="[search / train / test]")
    parser.add_argument("--cfg", required=True, type=str,
                        help="experiment configuration filename")
    parser.add_argument("--output_dir", default="output", type=str)
    parser.add_argument("--vis_dir", default="vis", type=str)
    parser.add_argument("--output_type", default="image", type=str)
    parser.add_argument("--seed", default=1023, type=int)
    parser.add_argument("--data_parallel", default=-1, type=int,
                        help="devices on the data mesh axis (-1 = all)")
    parser.add_argument("--smoke_test", action="store_true",
                        help="tiny run: 2 epochs (1 warmup), 2 steps/epoch")
    # multi-host launch (reference analogue: `distributed.py:15-31`'s
    # mp.spawn + tcp:// rendezvous). One process per host:
    #   python run.py --coordinator host0:1234 --num_processes 2 \
    #       --process_id $I ...
    # or env-driven (for launchers that can't edit the command line):
    #   AADG_COORDINATOR / AADG_NUM_PROCESSES / AADG_PROCESS_ID.
    # On TPU pods all three may be omitted (auto-discovery).
    parser.add_argument("--coordinator", type=str,
                        default=os.environ.get("AADG_COORDINATOR"),
                        help="multi-host coordinator address host:port")
    parser.add_argument("--num_processes", type=int,
                        default=int(os.environ.get(
                            "AADG_NUM_PROCESSES", "0")) or None,
                        help="total processes in the multi-host job")
    parser.add_argument("--process_id", type=int,
                        default=(int(os.environ["AADG_PROCESS_ID"])
                                 if "AADG_PROCESS_ID" in os.environ
                                 else None),
                        help="this process's rank in the multi-host job")
    # reference-launcher compat (`/root/reference/run.py:16-36`): accepted
    # so a reference command line runs unchanged; mapped onto the mesh or
    # ignored (JAX is single-controller — no rendezvous/worker procs)
    parser.add_argument("--multiprocessing_distributed", action="store_true",
                        help=argparse.SUPPRESS)
    parser.add_argument("--gpus", default=None, type=int,
                        help=argparse.SUPPRESS)
    for _ignored in ("--workers", "-j", "--world_size", "--rank", "--gpu"):
        parser.add_argument(_ignored, type=int, default=None,
                            help=argparse.SUPPRESS)
    parser.add_argument("--dist_url", type=str, default=None,
                        help=argparse.SUPPRESS)
    parser.add_argument("--dist_backend", type=str, default=None,
                        help=argparse.SUPPRESS)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="config overrides: KEY VALUE ...")
    args = parser.parse_args(argv)
    if (args.coordinator is None and args.dist_url
            and (args.world_size or 0) > 1):
        # reference launch line compat: --dist_url tcp://host:port
        # --world_size N --rank I (`distributed.py:19-23`)
        args.coordinator = args.dist_url.split("://", 1)[-1]
        args.num_processes = args.world_size
        args.process_id = args.rank
    if args.data_parallel == -1 and (args.gpus or 0) > 1:
        # the reference's "one process per GPU" ⇒ shard the batch over
        # that many chips on the data mesh axis (the -1 default already
        # auto-shards over all visible devices)
        args.data_parallel = args.gpus
        print(f"note: --gpus {args.gpus} maps to --data_parallel "
              f"{args.gpus} (single-controller JAX; no process launcher "
              "needed)", file=sys.stderr)
    return args


def maybe_initialize_multihost(args) -> bool:
    """Bring up `jax.distributed` from the CLI surface (before any backend
    use). Returns True when a multi-host rendezvous was performed."""
    if args.coordinator is None:
        # `--multiprocessing_distributed` alone stays a no-op: JAX is
        # single-controller, every local chip is already on the mesh.
        return False
    from aadg_tpu.parallel.mesh import initialize_multihost
    initialize_multihost(args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    return True


def main():
    args = parse_args()
    maybe_initialize_multihost(args)

    cfg = load_config(args.cfg, args.opts or None)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.SEED = args.seed
    cfg.TPU.DATA_PARALLEL = args.data_parallel
    if args.smoke_test:
        cfg.TRAIN.WARMUP_EPOCH = 1
        cfg.TRAIN.END_EPOCH = 2
        cfg.TPU.STEPS_PER_EPOCH = 2
    cfg.freeze()

    if args.mode == "test":
        from aadg_tpu.engine.test import run_test
        run_test(cfg, args.cfg, vis_dir=args.vis_dir,
                 output_type=args.output_type, seed=args.seed)
    elif args.mode == "search":
        from aadg_tpu.engine.search import run_search
        run_search(cfg, args.cfg)
    elif args.mode == "train":
        from aadg_tpu.engine.train import run_train
        run_train(cfg, args.cfg)
    else:
        raise NotImplementedError(
            "Only [search / train / test] are supported.")


if __name__ == "__main__":
    main()
