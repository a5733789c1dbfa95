"""LPIPS pipeline tests.

Real VGG16/LPIPS weights are not shippable in this environment (no egress),
so the architecture is validated against a hand-written torch VGG16 forward
using RANDOM weights in the exact torchvision .npz layout that
`convert_torch_weights` produces — this catches conv orientation (OIHW vs
HWIO), padding, tap indices, input scaling, and the normalize/head math.
A second test runs against real converted weights when supplied via
GOF_LPIPS_WEIGHTS (reference: lpipsPyTorch/modules/lpips.py:20-61).
"""
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_platforms", "cpu")

# torchvision VGG16.features conv indices
CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
BLOCKS = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
TAP_CH = [64, 128, 256, 512, 512]


def make_random_npz(path, rng):
    out = {}
    cin = 3
    ci = 0
    for ch, n_layers in BLOCKS:
        for _ in range(n_layers):
            out[f"features.{CONV_IDS[ci]}.weight"] = rng.normal(
                0, 0.2, (ch, cin, 3, 3)).astype(np.float32)
            out[f"features.{CONV_IDS[ci]}.bias"] = rng.normal(
                0, 0.1, (ch,)).astype(np.float32)
            cin = ch
            ci += 1
    for k, ch in enumerate(TAP_CH):
        out[f"lin{k}.model.1.weight"] = np.abs(
            rng.normal(0, 0.05, (1, ch, 1, 1))).astype(np.float32)
    np.savez(path, **out)
    return out


def torch_lpips(data, img0, img1):
    """Reference LPIPS with a hand-written torch VGG16.features forward."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(im):  # im: [1, 3, H, W] in [0, 1]
        x = (im * 2.0 - 1.0 - shift) / scale
        taps = []
        ci = 0
        for b, (ch, n_layers) in enumerate(BLOCKS):
            for _ in range(n_layers):
                w = torch.tensor(data[f"features.{CONV_IDS[ci]}.weight"])
                bb = torch.tensor(data[f"features.{CONV_IDS[ci]}.bias"])
                x = F.relu(F.conv2d(x, w, bb, padding=1))
                ci += 1
            taps.append(x)
            if b < len(BLOCKS) - 1:
                x = F.max_pool2d(x, 2, 2)
        return taps

    total = 0.0
    for k, (a, b) in enumerate(zip(features(img0), features(img1))):
        a = a / torch.sqrt((a**2).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b**2).sum(1, keepdim=True) + 1e-10)
        w = torch.tensor(data[f"lin{k}.model.1.weight"]).view(1, -1, 1, 1)
        total = total + ((a - b) ** 2 * w).sum(1).mean()
    return float(total)


def test_lpips_matches_torch_random_weights(tmp_path):
    import torch

    from gof_tpu.utils import lpips as lp

    rng = np.random.default_rng(0)
    path = str(tmp_path / "w.npz")
    data = make_random_npz(path, rng)

    img0 = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape).astype(np.float32), 0, 1)

    fn = lp.lpips_fn(path)
    assert fn is not None
    got = float(fn(img0, img1))
    want = torch_lpips(data, torch.tensor(img0)[None], torch.tensor(img1)[None])
    assert abs(got - want) < 1e-4 * max(1.0, abs(want))

    # identity distance is ~0
    assert abs(float(fn(img0, img0))) < 1e-6


def test_lpips_converter_roundtrip(tmp_path):
    """Round-trip through the OFFLINE converter (convert_torch_weights):
    a randomly-initialized torch VGG16 state_dict + LPIPS lin-head .pth ->
    .npz -> lpips_fn must match the hand-written torch forward bit-for-
    tolerance. Proves the converter's key filtering/layout end to end
    without pretrained weights (reference checkpoints:
    lpipsPyTorch/modules/lpips.py:20-61)."""
    import torch

    from gof_tpu.utils import lpips as lp

    rng = np.random.default_rng(3)
    # same tensors the torchvision vgg16 state_dict carries for .features,
    # plus classifier keys the converter must DROP
    data = {}
    cin = 3
    ci = 0
    for ch, n_layers in BLOCKS:
        for _ in range(n_layers):
            data[f"features.{CONV_IDS[ci]}.weight"] = rng.normal(
                0, 0.2, (ch, cin, 3, 3)).astype(np.float32)
            data[f"features.{CONV_IDS[ci]}.bias"] = rng.normal(
                0, 0.1, (ch,)).astype(np.float32)
            cin = ch
            ci += 1
    vgg_sd = {k: torch.tensor(v) for k, v in data.items()}
    vgg_sd["classifier.0.weight"] = torch.zeros(4096, 25088)
    vgg_sd["classifier.0.bias"] = torch.zeros(4096)
    lin_sd = {}
    for k, ch in enumerate(TAP_CH):
        w = np.abs(rng.normal(0, 0.05, (1, ch, 1, 1))).astype(np.float32)
        data[f"lin{k}.model.1.weight"] = w
        lin_sd[f"lin{k}.model.1.weight"] = torch.tensor(w)

    vgg_pth = str(tmp_path / "vgg16.pth")
    lin_pth = str(tmp_path / "lin.pth")
    out_npz = str(tmp_path / "lpips.npz")
    torch.save(vgg_sd, vgg_pth)
    torch.save(lin_sd, lin_pth)
    lp.convert_torch_weights(vgg_pth, lin_pth, out_npz)

    loaded = dict(np.load(out_npz))
    assert not any(k.startswith("classifier") for k in loaded)
    assert set(loaded) == set(data), "converted npz key set mismatch"

    img0 = rng.uniform(0, 1, (3, 32, 32)).astype(np.float32)
    img1 = np.clip(img0 + rng.normal(0, 0.1, img0.shape).astype(np.float32), 0, 1)
    fn = lp.lpips_fn(out_npz)
    assert fn is not None
    got = float(fn(img0, img1))
    want = torch_lpips(data, torch.tensor(img0)[None], torch.tensor(img1)[None])
    assert abs(got - want) < 1e-4 * max(1.0, abs(want))


def test_lpips_fn_missing_weights_returns_none():
    from gof_tpu.utils import lpips as lp

    assert lp.lpips_fn("") is None
    assert lp.lpips_fn("/nonexistent/weights.npz") is None


@pytest.mark.skipif(not os.path.exists(os.environ.get("GOF_LPIPS_WEIGHTS", "")),
                    reason="real LPIPS weights not provided (GOF_LPIPS_WEIGHTS)")
def test_lpips_real_weights():
    from gof_tpu.utils import lpips as lp

    fn = lp.lpips_fn(os.environ["GOF_LPIPS_WEIGHTS"])
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape).astype(np.float32), 0, 1)
    assert abs(float(fn(img, img))) < 1e-5
    d1 = float(fn(img, noisy))
    d2 = float(fn(img, np.clip(
        img + rng.normal(0, 0.4, img.shape).astype(np.float32), 0, 1)))
    assert 0 < d1 < d2  # monotone in perturbation strength
