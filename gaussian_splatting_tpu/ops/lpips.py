"""LPIPS perceptual metric (VGG16 backbone) in JAX.

Equivalent of the reference's ``lpipsPyTorch`` package (lpipsPyTorch/
modules/lpips.py:8-36): normalized VGG16 feature stacks compared per layer,
weighted by learned linear heads, averaged over space and summed over layers.

This image has no torchvision/pretrained weights and no network egress, so
the metric is *gated*: pass a weights file (``.npz``) containing the VGG16
conv kernels (`features.N.weight`/`.bias`, torch layout OIHW) and the LPIPS
linear heads (`lin{i}.model.1.weight`).  ``metrics.py --lpips_weights`` wires
it up (also honors ``$GS_LPIPS_WEIGHTS`` and ``~/.cache/gs_lpips_vgg16.npz``);
without weights LPIPS is reported as null.  The math itself is locked by
``tests/test_lpips.py`` against an independent torch implementation on
random real-shaped weights.

Weights export recipe (run once on any machine with egress)::

    import numpy as np, torch, torchvision, lpips  # pip install lpips
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    net = lpips.LPIPS(net="vgg")  # richzhang linear heads
    out = {}
    for i, m in enumerate(vgg):
        if isinstance(m, torch.nn.Conv2d):
            out[f"features.{i}.weight"] = m.weight.detach().numpy()
            out[f"features.{i}.bias"] = m.bias.detach().numpy()
    for i, lin in enumerate(net.lins):
        out[f"lin{i}.model.1.weight"] = lin.model[1].weight.detach().numpy()
    np.savez("gs_lpips_vgg16.npz", **out)
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layer indices in torchvision's features module, grouped into the
# 5 LPIPS slices (after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
VGG16_SLICES = [(0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28)]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
    )
    return out + b.reshape(1, -1, 1, 1)


def _normalize_feats(f, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(f**2, axis=1, keepdims=True))
    return f / (norm + eps)


def make_lpips(weights_path: str) -> Callable:
    """Build lpips(render_hwc, gt_hwc) -> scalar from an .npz weights file."""
    raw = dict(np.load(weights_path))

    def fn(a: np.ndarray, b: np.ndarray) -> float:
        xa = jnp.asarray(a.transpose(2, 0, 1))[None] * 2.0 - 1.0
        xb = jnp.asarray(b.transpose(2, 0, 1))[None] * 2.0 - 1.0
        shift = jnp.asarray(_SHIFT).reshape(1, 3, 1, 1)
        scale = jnp.asarray(_SCALE).reshape(1, 3, 1, 1)
        xa = (xa - shift) / scale
        xb = (xb - shift) / scale

        total = 0.0
        for si, layer_ids in enumerate(VGG16_SLICES):
            for lid in layer_ids:
                w = jnp.asarray(raw[f"features.{lid}.weight"])
                bb = jnp.asarray(raw[f"features.{lid}.bias"])
                xa = jax.nn.relu(_conv(xa, w, bb))
                xb = jax.nn.relu(_conv(xb, w, bb))
            fa = _normalize_feats(xa)
            fb = _normalize_feats(xb)
            diff = (fa - fb) ** 2
            head = jnp.asarray(raw[f"lin{si}.model.1.weight"]).reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(diff * head, axis=1))
            if si < len(VGG16_SLICES) - 1:
                xa = jax.lax.reduce_window(
                    xa, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
                xb = jax.lax.reduce_window(
                    xb, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
        return float(total)

    return fn
