"""LPIPS math validation against an independent torch re-implementation.

No pretrained VGG16 weights exist in this image (no egress), so the *math*
is locked instead: random weights with the real VGG16 shapes, compared
against a from-the-paper torch implementation mirroring the reference's
lpipsPyTorch/modules/lpips.py:8-36 + networks.py:12-96.  With real weights
dropped in (see ops/lpips.py docstring), metrics.py produces real numbers
through exactly this code path.
"""

import numpy as np
import pytest

from gaussian_splatting_tpu.ops.lpips import VGG16_SLICES, _SCALE, _SHIFT, make_lpips

# torchvision VGG16 conv channel plan (features.N: out channels)
_VGG_CHANNELS = {
    0: (3, 64), 2: (64, 64),
    5: (64, 128), 7: (128, 128),
    10: (128, 256), 12: (256, 256), 14: (256, 256),
    17: (256, 512), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
_HEAD_CHANNELS = [64, 128, 256, 512, 512]


def _random_weights(rng):
    raw = {}
    for lid, (cin, cout) in _VGG_CHANNELS.items():
        raw[f"features.{lid}.weight"] = rng.normal(
            0, 0.08, (cout, cin, 3, 3)
        ).astype(np.float32)
        raw[f"features.{lid}.bias"] = rng.normal(0, 0.05, (cout,)).astype(np.float32)
    for si, c in enumerate(_HEAD_CHANNELS):
        raw[f"lin{si}.model.1.weight"] = np.abs(
            rng.normal(0, 0.3, (1, c, 1, 1))
        ).astype(np.float32)
    return raw


def _torch_lpips(raw, a_hwc, b_hwc):
    """Independent reference: mirrors lpipsPyTorch forward pass in torch."""
    import torch
    import torch.nn.functional as F

    def prep(x):
        t = torch.from_numpy(x.transpose(2, 0, 1))[None] * 2.0 - 1.0
        shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
        scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)
        return (t - shift) / scale

    xa, xb = prep(a_hwc), prep(b_hwc)
    total = 0.0
    for si, layer_ids in enumerate(VGG16_SLICES):
        for lid in layer_ids:
            w = torch.from_numpy(raw[f"features.{lid}.weight"])
            bias = torch.from_numpy(raw[f"features.{lid}.bias"])
            xa = F.relu(F.conv2d(xa, w, bias, padding=1))
            xb = F.relu(F.conv2d(xb, w, bias, padding=1))

        def norm(t):
            return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

        diff = (norm(xa) - norm(xb)).pow(2)
        head = torch.from_numpy(raw[f"lin{si}.model.1.weight"])
        total = total + F.conv2d(diff, head).mean()
        if si < len(VGG16_SLICES) - 1:
            xa = F.max_pool2d(xa, 2)
            xb = F.max_pool2d(xb, 2)
    return float(total)


def test_lpips_matches_torch_reference(tmp_path):
    torch = pytest.importorskip("torch")
    del torch
    rng = np.random.default_rng(0)
    raw = _random_weights(rng)
    npz = tmp_path / "lpips_rand.npz"
    np.savez(npz, **raw)

    a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)

    ours = make_lpips(str(npz))(a, b)
    ref = _torch_lpips(raw, a, b)
    assert ref > 0
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=1e-6)

    # identical inputs score ~0
    assert abs(make_lpips(str(npz))(a, a.copy())) < 1e-8
