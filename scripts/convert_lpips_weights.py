"""Convert official torch VGG16 + LPIPS checkpoints to the .npz format
gof_tpu.metrics consumes (reference: lpipsPyTorch vendored weights).

Run OFFLINE on a machine with the checkpoints:
    python scripts/convert_lpips_weights.py \
        --vgg vgg16-397923af.pth --lpips vgg.pth --out lpips_vgg16.npz
then pass --lpips_weights lpips_vgg16.npz to gof_tpu.metrics (or set
GOF_LPIPS_WEIGHTS for the test suite's golden test).
"""
import argparse
import hashlib
import sys

import _path  # noqa: F401,E402  (repo-root bootstrap)

from gof_tpu.utils.lpips import convert_torch_weights  # noqa: E402

# torchvision checkpoints embed the first 8 hex chars of their sha256 in the
# filename; pin the official vgg16 so a wrong/corrupted download is caught
# before it silently skews every LPIPS number.
VGG16_SHA256_PREFIX = "397923af"


def _check_vgg(path: str, skip: bool):
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    if digest[:8] != VGG16_SHA256_PREFIX:
        msg = (f"{path}: sha256 {digest[:8]}... != expected torchvision "
               f"vgg16 prefix {VGG16_SHA256_PREFIX} (vgg16-397923af.pth)")
        if skip:
            print(f"WARNING: {msg}")
        else:
            raise SystemExit(msg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True,
                    help="torchvision vgg16 state_dict (.pth)")
    ap.add_argument("--lpips", required=True,
                    help="LPIPS vgg linear-head state_dict (.pth)")
    ap.add_argument("--out", required=True, help="output .npz")
    ap.add_argument("--skip_hash_check", action="store_true")
    args = ap.parse_args()
    _check_vgg(args.vgg, args.skip_hash_check)
    convert_torch_weights(args.vgg, args.lpips, args.out)
    print(f"wrote {args.out} (set GOF_LPIPS_WEIGHTS={args.out} or pass "
          f"--lpips_weights to gof_tpu.metrics)")


if __name__ == "__main__":
    main()
