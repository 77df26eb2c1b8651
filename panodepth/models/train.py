"""Training: losses, optimizer step, data-parallel sharding, checkpoints.

The reference trains nothing (its CNNs are external); this is new surface
required by the on-TPU model families.  Losses are the standard monocular
depth pair: BerHu (reverse Huber) on values + multi-scale gradient matching
on log depth.  The train step is a pure function jit-compiled over a device
mesh with batch-sharded data and replicated params (the model sizes here
never warrant TP/PP; see SURVEY.md section 2.3).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def berhu_loss(pred, target, mask=None):
    """Reverse Huber: L1 near zero, scaled L2 beyond c = 0.2 * max|err|."""
    err = jnp.abs(pred - target)
    if mask is not None:
        err = jnp.where(mask, err, 0.0)
    c = 0.2 * jax.lax.stop_gradient(jnp.max(err)) + 1e-12
    l2 = (err * err + c * c) / (2.0 * c)
    loss = jnp.where(err <= c, err, l2)
    if mask is None:
        return jnp.mean(loss)
    return jnp.sum(loss) / jnp.maximum(jnp.sum(mask), 1.0)


def gradient_matching_loss(pred, target, mask=None, scales: int = 4):
    """Multi-scale log-depth gradient matching (MiDaS-style)."""
    eps = 1e-4
    lp = jnp.log(jnp.maximum(pred, eps))
    lt = jnp.log(jnp.maximum(target, eps))
    diff = lp - lt
    m = jnp.ones_like(diff) if mask is None else mask.astype(diff.dtype)
    total = 0.0
    for s in range(scales):
        d = diff[:, :: 2 ** s, :: 2 ** s]
        mm = m[:, :: 2 ** s, :: 2 ** s]
        gx = jnp.abs(jnp.diff(d, axis=2)) * mm[:, :, 1:] * mm[:, :, :-1]
        gy = jnp.abs(jnp.diff(d, axis=1)) * mm[:, 1:, :] * mm[:, :-1, :]
        total = total + (jnp.sum(gx) + jnp.sum(gy)) / jnp.maximum(
            jnp.sum(mm), 1.0)
    return total / scales


def depth_loss(pred, target, mask=None, grad_weight: float = 0.5):
    return berhu_loss(pred, target, mask) + grad_weight * \
        gradient_matching_loss(pred, target, mask)


from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


class EmaState(struct.PyTreeNode):
    ema: Any


def ema_of_params(decay: float) -> "optax.GradientTransformation":
    """Terminal optax transform tracking an EMA of the PARAMETERS.

    Sits last in the chain, so the incoming ``updates`` are the final
    deltas: the post-step params are ``params + updates`` and the EMA
    advances ``e <- d*e + (1-d)*p_new`` while the updates pass through
    untouched.  Riding inside ``opt_state`` keeps the TrainState
    structure (params, opt_state, step) unchanged — checkpoints,
    replication, and --resume all work with zero special-casing.
    """

    def init(params):
        # real copies: jnp.asarray would ALIAS the param buffers, and the
        # donated train step then sees the same buffer twice
        return EmaState(ema=jax.tree_util.tree_map(jnp.copy, params))

    def update(updates, state, params=None):
        new_p = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_p)
        return updates, EmaState(ema=ema)

    return optax.GradientTransformation(init, update)


def ema_params(opt_state):
    """Extract the EMA param pytree from an opt_state built with
    ``make_optimizer(ema=...)``; None when EMA was not enabled."""
    for leaf_state in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, EmaState)):
        if isinstance(leaf_state, EmaState):
            return leaf_state.ema
    return None


def make_optimizer(lr: float = 1e-4, weight_decay: float = 1e-5,
                   steps: Optional[int] = None, warmup: int = 200,
                   ema: Optional[float] = None):
    """AdamW with global-norm clipping.

    With ``steps``, uses linear warmup (``warmup`` steps) into cosine decay
    — the warmup keeps early AdamW updates from violently rescaling the
    network while the output head finds the target's scale (see
    perspective.py head comment).  The learning rate is ALWAYS passed as a
    schedule (constant without ``steps``) so the opt-state pytree structure
    is identical across variants and checkpoints restore either way.
    With ``ema``, an exponential moving average of the params (decay
    ``ema``) is tracked inside the opt_state (see :func:`ema_of_params`;
    read back with :func:`ema_params`).
    """
    if steps is not None:
        # the cosine tail must be non-empty: warmup < steps always
        w = min(warmup, max(steps // 10, 1), max(steps - 1, 0))
        schedule = optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps=w, decay_steps=steps, end_value=lr * 0.05)
    else:
        schedule = optax.constant_schedule(lr)
    chain = [
        optax.clip_by_global_norm(1.0),
        optax.adamw(schedule, weight_decay=weight_decay),
    ]
    if ema is not None:
        if not (0.0 < ema < 1.0):
            raise ValueError(f"ema decay must be in (0, 1), got {ema}")
        chain.append(ema_of_params(ema))
    return optax.chain(*chain)


def init_state(model, rng, sample_input, tx=None) -> TrainState:
    params = model.init(rng, sample_input)
    tx = tx or make_optimizer()
    return TrainState(params=params, opt_state=tx.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model, tx=None, grad_weight: float = 0.5,
                    remat: bool = False, teacher_fn: Optional[Callable] = None,
                    distill_weight: float = 0.5) -> Callable:
    """Pure (state, batch) -> (state, metrics) step.  batch = (rgb, depth,
    valid_mask).

    ``remat`` wraps the forward in :func:`jax.checkpoint`: the backward
    pass recomputes activations instead of keeping them resident in HBM
    between forward and backward — one extra forward's FLOPs for roughly
    the forward's activation footprint back, the standard TPU lever for
    larger batches/widths when a step OOMs.  Gradients are unchanged
    (same ops, recomputed).

    ``teacher_fn`` (rgb -> depth01) enables distillation: the loss adds
    ``distill_weight`` x the same depth loss against the (stop-gradient)
    teacher prediction — the student matches both the analytic ground
    truth and a slower high-accuracy family's behavior (the lever behind
    the TPU-fast baseline family; train_cli ``--distill-from``)."""
    tx = tx or make_optimizer()
    apply = jax.checkpoint(model.apply) if remat else model.apply

    def loss_fn(params, rgb, depth, mask):
        pred = apply(params, rgb)
        loss = depth_loss(pred, depth, mask, grad_weight)
        if teacher_fn is not None:
            t = jax.lax.stop_gradient(teacher_fn(rgb))
            loss = loss + distill_weight * depth_loss(pred, t, mask,
                                                      grad_weight)
        return loss

    def step(state: TrainState, batch):
        rgb, depth, mask = batch
        loss, grads = jax.value_and_grad(loss_fn)(state.params, rgb, depth,
                                                  mask)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gn = optax.global_norm(grads)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "grad_norm": gn}

    return step


def shard_train_step(step_fn, mesh: Mesh, batch_axis: str = "dp"):
    """jit the step with batch-sharded data and replicated state over
    ``mesh``.  XLA inserts the gradient psum across ``batch_axis`` (ICI)."""
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(batch_axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, (data, data, data)),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


# --------------------------------------------------------------------------
# checkpointing (orbax)


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)


def save_params_npz(path: str, params) -> None:
    """Compact params-only export: one .npz of bf16 leaves (f32 on load).

    Orbax checkpoints carry the full TrainState (params + two AdamW
    moments, ~3x f32 params); this is the small inference artifact that
    can be committed for the pretrained model zoo.
    """
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    # numpy's npz format has no bfloat16: store the raw bit patterns as
    # uint16 (load_params_npz views them back)
    arrays = {jax.tree_util.keystr(k): np.asarray(
        np.asarray(v, np.float32).astype(jnp.bfloat16)).view(np.uint16)
        for k, v in flat}
    np.savez_compressed(path, **arrays)


def load_params_npz(path: str, template_params):
    """Load a save_params_npz export back into the template's pytree."""
    import numpy as np

    with np.load(path, allow_pickle=False) as z:
        flat, treedef = jax.tree_util.tree_flatten_with_path(template_params)
        leaves = []
        for k, v in flat:
            a = z[jax.tree_util.keystr(k)]
            if a.dtype == np.uint16:  # stored bfloat16 bit patterns
                a = a.view(jnp.bfloat16)
            if tuple(a.shape) != tuple(v.shape):
                raise ValueError(
                    f"param {jax.tree_util.keystr(k)}: checkpoint shape "
                    f"{a.shape} != model shape {v.shape}")
            leaves.append(jnp.asarray(a, jnp.float32))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template_params), leaves)
