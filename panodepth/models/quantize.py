"""Post-training int8 quantization of trained perspective checkpoints.

Converts f32 ``PerspectiveDepthNet`` params into the parameter tree of the
same architecture with ``quantized=True`` — every conv except the 1x1
output head becomes a :class:`~panodepth.models.perspective.QConv` with
per-output-channel symmetric int8 weights (absmax/127 scales).  Activation
quantization is dynamic (inside QConv), so no calibration set is needed.

Why PTQ at all: the perspective CNN is the largest single cost of the
on-device e2e graph (~5.5 of ~12.8 ms/pano at 42% MFU vs the bf16 peak —
PERF.md), and the v5e MXU's int8 peak is 2x its bf16 peak.  The reference
runs its perspective CNNs as external f32 processes (Main.cpp:465-474);
quantization is framework-side freedom, gated on the measured on-chip A/B
(scripts/int8_probe.py) and the 12-scene CLI accuracy proof.

Weight mapping (module auto-names follow flax per-parent, per-class
counters in creation order):

- every nested ``Conv_i`` (ResBlock / FusionBlock) -> ``QConv_i``;
- top level: ``Conv_0..Conv_3`` (stem, decoder-in, two decoder convs) ->
  ``QConv_0..QConv_3``; the output head ``Conv_4`` (1x1, cout=1, kept
  f32 for the softplus head's precision) stays an ``nn.Conv`` and is
  therefore renumbered ``Conv_0`` in the quantized graph.

The structural identity of this mapping against ``model.init`` is pinned
by ``tests/test_quantize.py``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_conv_kernel(kernel):
    """f32 (kh, kw, cin, cout) -> (int8 kernel_q, f32 per-cout scale)."""
    k = np.asarray(jax.device_get(kernel), np.float32)
    s = np.max(np.abs(k), axis=(0, 1, 2))  # per output channel
    s = np.maximum(s, 1e-12) / 127.0
    q = np.clip(np.round(k / s), -127, 127).astype(np.int8)
    return q, s.astype(np.float32)


def _is_head(name: str, leaf: dict, top_level: bool) -> bool:
    """The 1x1 -> 1-channel output head (stays f32, see module doc)."""
    if not top_level:
        return False
    kern = leaf.get("kernel")
    return kern is not None and kern.shape[-1] == 1 and kern.shape[:2] == (1, 1)


def quantize_perspective_params(params):
    """Rewrite a trained f32 param tree for the ``quantized=True`` graph."""

    def rewrite(tree, top_level):
        out = {}
        for name, sub in tree.items():
            if name.startswith("Conv_") and isinstance(sub, dict) \
                    and "kernel" in sub:
                if _is_head(name, sub, top_level):
                    out["Conv_0"] = sub  # renumbered: only nn.Conv left
                    continue
                q, s = quantize_conv_kernel(sub["kernel"])
                new = {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(s)}
                if "bias" in sub:
                    new["bias"] = jnp.asarray(
                        np.asarray(jax.device_get(sub["bias"]), np.float32))
                out["QConv_" + name[len("Conv_"):]] = new
            elif isinstance(sub, dict):
                out[name] = rewrite(sub, False)
            else:
                out[name] = sub
        return out

    root = dict(params)
    if "params" in root and isinstance(root["params"], dict):
        return {**root, "params": rewrite(root["params"], True)}
    return rewrite(root, True)


def int8_param_bytes(params) -> int:
    """Total serialized size of the quantized tree (diagnostic)."""
    return sum(np.asarray(x).nbytes
               for x in jax.tree_util.tree_leaves(params))
