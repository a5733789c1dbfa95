"""Convert official torch VGG16 + LPIPS checkpoints to the .npz format
gof_tpu.metrics consumes (reference: lpipsPyTorch vendored weights).

Run OFFLINE on a machine with the checkpoints:
    python scripts/convert_lpips_weights.py \
        --vgg vgg16-397923af.pth --lpips vgg.pth --out lpips_vgg16.npz
then pass --lpips_weights lpips_vgg16.npz to gof_tpu.metrics (or set
GOF_LPIPS_WEIGHTS for the test suite's golden test).
"""
import argparse
import sys

sys.path.insert(0, ".")

from gof_tpu.utils.lpips import convert_torch_weights  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg", required=True,
                    help="torchvision vgg16 state_dict (.pth)")
    ap.add_argument("--lpips", required=True,
                    help="LPIPS vgg linear-head state_dict (.pth)")
    ap.add_argument("--out", required=True, help="output .npz")
    args = ap.parse_args()
    convert_torch_weights(args.vgg, args.lpips, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
