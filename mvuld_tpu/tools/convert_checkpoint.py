"""Offline checkpoint conversion CLI: released torch weights → orbax.

Converts the checkpoints the reference fine-tunes from:
  * SwinV2 ImageNet checkpoints (``.pth`` with a ``model`` state dict) —
    including the cross-window/resolution surgery (mvuld/utils.py:31-141),
  * UniXcoder / fine-tuned RoBERTa ``pytorch_model.bin``.

Usage:
  python -m mvuld_tpu.tools.convert_checkpoint swinv2 in.pth out_dir \
      [--img-size 448] [--window 28] [--num-classes 2]
  python -m mvuld_tpu.tools.convert_checkpoint roberta pytorch_model.bin out_dir \
      [--layers 12] [--prefix roberta.]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("kind", choices=["swinv2", "roberta"])
    parser.add_argument("src")
    parser.add_argument("out_dir")
    parser.add_argument("--img-size", type=int, default=448)
    parser.add_argument("--window", type=int, default=28)
    parser.add_argument("--num-classes", type=int, default=2)
    parser.add_argument("--embed-dim", type=int, default=128)
    parser.add_argument("--depths", default="2,2,18,2")
    parser.add_argument("--heads", default="4,8,16,32")
    parser.add_argument("--pretrained-windows", default="12,12,12,6")
    parser.add_argument("--layers", type=int, default=12)
    parser.add_argument("--prefix", default="")
    parser.add_argument("--scan-layout", action="store_true",
                        help="repack SwinV2 params for scan_blocks=True")
    args = parser.parse_args(argv)

    import torch

    from mvuld_tpu.core.checkpoint import save_checkpoint

    sd = torch.load(args.src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]

    if args.kind == "swinv2":
        from mvuld_tpu.models.swin_convert import (swinv2_torch_to_flax,
                                                   to_scan_layout)
        from mvuld_tpu.models.swin_v2 import SwinV2Config
        cfg = SwinV2Config(
            img_size=args.img_size, num_classes=args.num_classes,
            embed_dim=args.embed_dim,
            depths=tuple(int(x) for x in args.depths.split(",")),
            num_heads=tuple(int(x) for x in args.heads.split(",")),
            window_size=args.window,
            pretrained_window_sizes=tuple(
                int(x) for x in args.pretrained_windows.split(",")))
        params = swinv2_torch_to_flax(sd, cfg)
        if args.scan_layout:
            params = to_scan_layout(params, cfg)
    else:
        from mvuld_tpu.utils.torch_convert import roberta_torch_to_flax
        params = roberta_torch_to_flax(sd, num_layers=args.layers,
                                       prefix=args.prefix)

    path = save_checkpoint(args.out_dir, 0, {"params": params})
    print(f"converted {args.kind} checkpoint → {path}")


if __name__ == "__main__":
    main()
