"""Grad-CAM over cross-attention maps.

Counterpart of the reference ``lavis/common/gradcam.py:24``: given a
(heads, Q, K) cross-attention map and its gradient w.r.t. a target score,
produce a per-token relevance map (ReLU(grad) * attn summed over heads),
optionally reshaped to the image patch grid and upsampled.
"""

from __future__ import annotations

import numpy as np


def compute_gradcam(attn_map, attn_grad, patch_grid=None):
    """attn_map/attn_grad: (heads, Q, K) numpy arrays.

    Returns (Q, K) relevance, or (Q, H, W) when ``patch_grid=(H, W)`` and
    K == H*W (+1 for a cls token, which is dropped).
    """
    attn_map = np.asarray(attn_map, np.float32)
    attn_grad = np.maximum(np.asarray(attn_grad, np.float32), 0)
    cam = (attn_map * attn_grad).mean(axis=0)  # (Q, K)
    if patch_grid is not None:
        h, w = patch_grid
        k = cam.shape[-1]
        if k == h * w + 1:
            cam = cam[:, 1:]
        cam = cam.reshape(cam.shape[0], h, w)
    # normalize per query
    denom = cam.max(axis=tuple(range(1, cam.ndim)), keepdims=True)
    return cam / np.maximum(denom, 1e-8)
