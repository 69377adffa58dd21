"""Export a zoo segmentor as a self-contained AOT serving artifact.

    python tools/export_serving.py --arch fcn --backbone cgnet \
        --num_classes 19 --size 512 --checkpoint seg.msgpack \
        --out seg.jaxexp [--dtype bfloat16] [--platforms tpu cpu] \
        [--mode slide --crop 512 512 --stride 341 341]

The output file deserializes with ``jax.export.deserialize`` in any JAX
process — no aadg_tpu/flax imports, no retracing; weights are baked in.
See ``aadg_tpu/models/zoo/export.py``.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arch", required=True)
    p.add_argument("--backbone", required=True)
    p.add_argument("--num_classes", type=int, required=True)
    p.add_argument("--size", type=int, nargs="+", required=True,
                   help="serving resolution H [W]")
    p.add_argument("--checkpoint", default=None,
                   help="flax msgpack variables (save_segmentor format)")
    p.add_argument("--out", required=True)
    p.add_argument("--dtype", default=None,
                   help="serving compute dtype, e.g. bfloat16")
    p.add_argument("--platforms", nargs="*", default=None,
                   help="lowering targets (default: current backend)")
    p.add_argument("--mode", default="whole", choices=["whole", "slide"])
    p.add_argument("--crop", type=int, nargs=2, default=None)
    p.add_argument("--stride", type=int, nargs=2, default=None)
    p.add_argument("--batch", default="b",
                   help="symbolic batch-dim name ('' pins batch=1)")
    args = p.parse_args()

    from aadg_tpu.models.zoo.api import init_segmentor
    from aadg_tpu.models.zoo.export import export_segmentor

    if len(args.size) not in (1, 2):
        p.error(f"--size takes 1 or 2 values (H [W]), got {args.size}")
    size = tuple(args.size) if len(args.size) == 2 \
        else (args.size[0], args.size[0])
    model, variables = init_segmentor(
        args.arch, args.backbone, args.num_classes,
        checkpoint=args.checkpoint)
    blob = export_segmentor(
        model, variables, size, batch=args.batch or None,
        platforms=args.platforms, mode=args.mode,
        crop=tuple(args.crop) if args.crop else None,
        stride=tuple(args.stride) if args.stride else None,
        dtype=args.dtype)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"wrote {args.out} ({len(blob)} bytes): {args.arch}/"
          f"{args.backbone} @{size}, batch={args.batch or 1}, "
          f"mode={args.mode}, dtype={args.dtype or 'float32'}")


if __name__ == "__main__":
    main()
