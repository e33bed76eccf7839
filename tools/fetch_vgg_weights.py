#!/usr/bin/env python
"""Download torchvision's VGG19 ImageNet weights and convert them to the
.npz format the perceptual loss consumes (models/vgg.py).

Run this on a machine with network access; this container is zero-egress.

Usage:
    python tools/fetch_vgg_weights.py --out vgg19_imagenet.npz
    # then: scripts/train.py --perceptual_weight 0.1 --vgg_weights vgg19_imagenet.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

VGG19_URL = "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output .npz path")
    ap.add_argument("--pth", default=None,
                    help="already-downloaded vgg19 .pth (skips the download)")
    ap.add_argument("--feature_layer_idx", type=int, default=35)
    args = ap.parse_args()

    import torch
    from mri_superresolution_tpu.models.vgg import (
        params_from_torch_state_dict, save_params_npz)

    if args.pth:
        sd = torch.load(args.pth, map_location="cpu", weights_only=False)
    else:
        print(f"Downloading {VGG19_URL} ...")
        sd = torch.hub.load_state_dict_from_url(VGG19_URL, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items() if k.startswith("features.")}
    params = params_from_torch_state_dict(sd, args.feature_layer_idx)
    save_params_npz(args.out, params)
    print(f"Wrote {args.out} ({len(params)} conv layers)")


if __name__ == "__main__":
    main()
