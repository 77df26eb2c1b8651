"""Multi-host (multi-process) SPMD support.

The reference is strictly single-process (SURVEY.md §2.3: OpenMP on one
CPU + one GL context).  The TPU-native framework scales past one host the
JAX way: one process per host, ``jax.distributed`` for the coordination
plane, ONE global :class:`jax.sharding.Mesh` over every process's devices,
and the same jitted programs as single-host — XLA routes the gradient
psum over ICI within a slice and DCN across slices; no program changes.

What this module adds on top of ``jax.distributed``:

* :func:`initialize` — coordinator bring-up from flags (or the TPU
  metadata auto-detection when no flags are given);
* :func:`global_mesh` — a (dp, sp) mesh over ALL processes' devices,
  dp-major so each host's local devices sit together on the dp axis
  (host-local batch entries never cross DCN on the input path);
* :func:`process_shard` — deterministic per-process slice of a work list
  (files, scenes) so hosts read disjoint data;
* :func:`global_batch` — assemble a globally-sharded array from each
  process's host-local numpy batch
  (``jax.make_array_from_process_local_data``);
* :func:`replicate` — replicate a host-identical pytree (params, opt
  state) onto the global mesh.

Validated by ``tests/test_multihost.py``, which really spawns two JAX
processes on the CPU backend (2 local devices each → a 4-device global
mesh) and trains data-parallel: per-step loss/params bit-identical across
processes, and the 2-process run matches a single-process run on the same
global batch stream.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Bring up the jax.distributed coordination plane.

    Call ONCE, before any device use.  With no arguments, defers to JAX's
    environment auto-detection (TPU pod metadata / cluster env vars).
    The local device set is the platform's own business (TPU: all chips
    bound to this host; CPU tests: ``--xla_force_host_platform_device_count``).
    Returns ``(process_index, process_count)``.
    """
    import jax

    kw = {}
    if coordinator is not None:
        kw.update(coordinator_address=coordinator,
                  num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kw)
    return jax.process_index(), jax.process_count()


def global_mesh(sp: int = 1):
    """(dp, sp) mesh over ALL processes' devices, dp-major.

    ``jax.devices()`` orders globally by process, so reshaping (dp, sp)
    row-major keeps each host's devices contiguous along dp — a host's
    local batch items land on its own devices and only gradient
    reductions cross DCN.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    if n % sp:
        raise ValueError(f"sp={sp} does not divide {n} global devices")
    return Mesh(np.asarray(devices).reshape(n // sp, sp), ("dp", "sp"))


def process_shard(items: Sequence, index: Optional[int] = None,
                  count: Optional[int] = None) -> list:
    """Deterministic round-robin slice of a work list for this process.

    Round-robin (``items[index::count]``) rather than contiguous blocks so
    datasets sorted by scene/building still spread across hosts.
    """
    if index is None or count is None:
        import jax

        index = jax.process_index() if index is None else index
        count = jax.process_count() if count is None else count
    if not (0 <= index < count):
        raise ValueError(f"process index {index} outside [0, {count})")
    return list(items[index::count])


def global_batch(mesh, local_np: np.ndarray, spec=None):
    """Assemble a globally dp-sharded array from this process's batch.

    ``local_np`` is the HOST-LOCAL slice: shape ``(B_global /
    process_count, ...)``.  Every process must call this collectively
    with its own slice; the result behaves like one (B_global, ...) array
    inside jit.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = spec if spec is not None else P("dp")
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(local_np))


def replicate(mesh, tree):
    """Replicate a host-identical pytree onto every device of ``mesh``.

    The value must be bit-identical on every process (e.g. params built
    from the same PRNGKey, or a restored checkpoint): each process
    donates its local copy to its own devices; no cross-host transfer.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_single_device_arrays(
            x.shape, repl,
            [jax.device_put(x, d) for d in mesh.local_devices])

    return jax.tree_util.tree_map(put, tree)


def barrier(name: str = "panodepth", timeout_ms: int = 600_000) -> None:
    """Host-process barrier over the coordination service (no devices).

    Use between compiling a collective program and first executing it:
    the compile is process-local and its duration can skew arbitrarily
    across hosts (cold vs warm compile cache), while the first execution
    opens the communicator rendezvous, whose window is short (30 s for
    XLA:CPU Gloo).  Compile -> barrier -> execute removes the skew.
    No-op when jax.distributed was never initialized.
    """
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def kv_set_once(key: str, value: str) -> None:
    """First-writer-wins put into the coordination KV store.

    A later set of the same key loses silently — exactly the semantics a
    cross-host "one process announces, everyone converges" protocol needs
    (see train_cli's preemption drain).  No-op without jax.distributed.
    """
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    try:
        client.key_value_set(key, value)
    except Exception:  # noqa: BLE001 — ALREADY_EXISTS from a racing writer
        pass


def kv_try_get(key: str) -> Optional[str]:
    """Non-blocking read from the coordination KV store (None if absent
    or jax.distributed was never initialized)."""
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return None
    try:
        return client.key_value_try_get(key)
    except Exception:  # noqa: BLE001 — NOT_FOUND
        return None


def fetch_replicated(tree):
    """Host copy of a fully-replicated global pytree (works on every
    process: the local shard IS the value)."""
    import jax

    def get(x):
        if hasattr(x, "addressable_shards"):
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)
