#!/usr/bin/env python
"""Convert reference torch checkpoints to/from druggen_tpu flax checkpoints.

The reference releases ``{submodel}-G.ckpt`` torch state_dicts (restored at
``/root/reference/inference.py:135-139``; saved at ``train.py:259-263``).
This CLI converts them into the msgpack param files our
:class:`druggen_tpu.infer.engine.InferenceEngine` and trainer load, and back.

Import the released AKT1 generator for inference:

    python scripts/import_torch_ckpt.py \
        --model generator --input experiments/models/DrugGEN-G.ckpt \
        --output experiments/models/DrugGEN-G.msgpack

Export a trained flax generator for the reference code:

    python scripts/import_torch_ckpt.py --reverse \
        --model generator --input mymodel/DrugGEN-G.msgpack \
        --output DrugGEN-G.ckpt

The output of --reverse is a torch ``state_dict`` loadable by the reference
``Generator.load_state_dict`` (``/root/reference/train.py:250-257``).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   choices=["generator", "discriminator", "simple_disc"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--reverse", action="store_true",
                   help="flax msgpack -> torch .ckpt instead of torch -> flax")
    p.add_argument("--scan-layers", action="store_true",
                   help="emit the lax.scan stacked blocks/block layout")
    args = p.parse_args(argv)

    from flax import serialization

    from druggen_tpu.interop import torch_ckpt as tc

    if args.reverse:
        with open(args.input, "rb") as f:
            variables = serialization.msgpack_restore(f.read())
        to_torch = {
            "generator": tc.flax_generator_to_torch,
            "discriminator": tc.flax_discriminator_to_torch,
            "simple_disc": tc.flax_simple_disc_to_torch,
        }[args.model]
        sd = tc.to_torch_tensors(to_torch(variables))
        import torch

        torch.save(sd, args.output)
        print(f"wrote torch state_dict ({len(sd)} tensors) -> {args.output}")
        return 0

    sd = tc.load_torch_state_dict(args.input)
    if args.model == "generator":
        variables = tc.torch_generator_to_flax(sd, scan_layers=args.scan_layers)
    elif args.model == "discriminator":
        variables = tc.torch_discriminator_to_flax(
            sd, scan_layers=args.scan_layers)
    else:
        variables = tc.torch_simple_disc_to_flax(sd)
    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(variables))
    print(f"wrote flax params -> {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
