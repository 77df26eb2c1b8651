"""Drop-in ``nn.GroupNorm`` with a fused Pallas TPU inference path.

The class is deliberately named ``GroupNorm`` so flax auto-naming keeps
the ``GroupNorm_N`` parameter paths — checkpoints are interchangeable
with stock ``nn.GroupNorm`` in both directions (same ``scale``/``bias``
params, same numerics on the fallback path, <=2 f32 ulps on the fused
one).

Routing: the fused kernel (:mod:`panodepth.kernels.groupnorm` — one HBM
read + one write instead of XLA's two reads + one write) runs only on the
bf16-norm TPU *inference* configuration (``dtype=jnp.bfloat16``, the
``norm_dtype`` the e2e drivers pass on TPU; see
``e2e.load_model_checkpoint``).  Training keeps the default f32 norm
dtype and therefore the stock flax path, which is differentiable (the
kernel defines no VJP).  Unsupported shapes fall back too.

The fallback re-enters flax's own ``_compute_stats``/``_normalize``
helpers rather than ``super().__call__`` (flax forbids invoking the
parent's compact method from an overriding one); the equivalence test
pins it bit-for-bit against stock ``nn.GroupNorm``.

``fuse_relu=True`` folds the call site's following ReLU into the same
pass (both paths apply it, so semantics never depend on routing).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import normalization as fnorm

# test hook: force the fused path (interpret mode) off-TPU
_FORCE_INTERPRET = False


def _enabled() -> bool:
    # default OFF until the kernel is validated/measured on the real chip
    # (PANODEPTH_FUSED_GN=1 to enable); the flax fallback is bit-exact
    return os.environ.get("PANODEPTH_FUSED_GN", "0") == "1"


class GroupNorm(nn.GroupNorm):
    fuse_relu: bool = False

    def _fusable(self, x) -> bool:
        from ..kernels import groupnorm

        if not (isinstance(self.num_groups, int)
                and self.group_size is None
                and self.reduction_axes is None
                and self.use_scale and self.use_bias
                and self.use_fast_variance
                # the kernel always computes f32 stats; a bf16-stats
                # config must keep the flax path for routing-independence
                and self.force_float32_reductions
                and self.axis_name is None
                and groupnorm.supported(x.shape, self.num_groups,
                                        x.dtype, self.dtype)):
            return False
        if _FORCE_INTERPRET:
            return True
        return (_enabled()
                and jax.default_backend() == "tpu"
                and self.dtype == jnp.bfloat16)

    @nn.compact
    def __call__(self, x, *, mask=None):
        if mask is None and self._fusable(x):
            from ..kernels import groupnorm

            c = x.shape[-1]
            scale = self.param("scale", self.scale_init, (c,),
                               self.param_dtype)
            bias = self.param("bias", self.bias_init, (c,),
                              self.param_dtype)
            return groupnorm.group_norm(
                x, scale, bias, self.num_groups, eps=float(self.epsilon),
                relu=self.fuse_relu, out_dtype=self.dtype,
                interpret=_FORCE_INTERPRET)

        # stock flax body (flax.linen.normalization.GroupNorm.__call__,
        # constrained to the trailing-feature-axis case), via flax's own
        # helpers so numerics match nn.GroupNorm exactly
        num_groups = self.num_groups
        if num_groups is None:
            # stock GroupNorm's group_size form (mutually exclusive)
            if self.group_size is None or x.shape[-1] % self.group_size:
                raise ValueError(
                    f"group_size {self.group_size} must divide the feature "
                    f"count {x.shape[-1]} (and exactly one of num_groups / "
                    "group_size must be set)")
            num_groups = x.shape[-1] // self.group_size
        elif self.group_size is not None:
            raise ValueError("pass num_groups or group_size, not both")
        reduction_axes = (list(range(1, x.ndim - 1)) + [-1]
                          if self.reduction_axes is None
                          else self.reduction_axes)
        reduction_axes = fnorm._canonicalize_axes(x.ndim, reduction_axes)
        group_size = x.shape[-1] // num_groups
        group_shape = x.shape[:-1] + (num_groups, group_size)
        gmask = (None if mask is None
                 else mask.reshape(mask.shape[:-1] + (num_groups,
                                                      group_size)))
        mean, var = fnorm._compute_stats(
            x.reshape(group_shape),
            list(reduction_axes[:-1]) + [-1],
            self.dtype, self.axis_name, self.axis_index_groups,
            use_fast_variance=self.use_fast_variance, mask=gmask,
            force_float32_reductions=self.force_float32_reductions,
        )
        mean = jnp.repeat(mean, group_size, axis=-1)
        var = jnp.repeat(var, group_size, axis=-1)
        y = fnorm._normalize(
            self, x, mean, var, reduction_axes[:-1], (-1,),
            self.dtype, self.param_dtype, self.epsilon,
            self.use_bias, self.use_scale, self.bias_init,
            self.scale_init, self.force_float32_reductions,
        )
        return nn.relu(y) if self.fuse_relu else y
