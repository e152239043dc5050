"""Multi-host correctness helpers (SURVEY §5.8).

Under a real ``--distributed`` run (``jax.process_count() > 1``) three
single-process assumptions in the trainer break:

* ``jax.device_put(x, NamedSharding(mesh, spec))`` raises when the mesh
  spans non-addressable devices — global arrays must instead be assembled
  from each process's addressable shards (``jax.make_array_from_callback``);
* every process would create its own ``experiment_N`` directory and race
  duplicate checkpoint/TB writes — only process 0 may write, and the run
  id must be agreed across processes;
* an unseeded run would draw a different ``manualSeed`` per process and
  train N silently divergent models.

These helpers centralize those rules; every one degrades to the obvious
single-process behavior so the non-distributed paths are untouched.

The data/RNG design makes the REST of the trainer multi-host-correct for
free: every host-side value fed to a step (loader index/flip draws, noise
keys, amps) is a pure function of the agreed seed, so each process holds an
identical local copy and ``global_put`` can assemble a consistent global
array from any process's shards without any data exchange.

Reference match: train_video.py:91-96 — the single-process DataParallel
wrap whose replacement must scale past one host.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = ["is_primary", "global_put", "agree", "broadcast_pytree",
           "barrier", "fetch"]


def is_primary() -> bool:
    """True on the process allowed to touch the experiment tree."""
    return jax.process_index() == 0


def global_put(x: Any, sharding: Optional[jax.sharding.Sharding]):
    """``jax.device_put`` that also works when ``sharding`` spans
    non-addressable devices.

    Multi-process requirement (guaranteed by the seeded loaders/streams,
    see module docstring): the host value ``x`` is identical on every
    process, so each process's addressable shards of the global array can
    be cut from its own local copy.
    """
    if sharding is None or jax.process_count() == 1 \
            or sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    a = np.asarray(x)
    return jax.make_array_from_callback(a.shape, sharding,
                                        lambda idx, a=a: a[idx])


def agree(value: int) -> int:
    """Process 0's value, on every process (run ids, drawn seeds)."""
    if jax.process_count() == 1:
        return int(value)
    from jax.experimental import multihost_utils
    return int(multihost_utils.broadcast_one_to_all(
        np.asarray(value, np.int64)))


def broadcast_pytree(tree: Any) -> Any:
    """Process 0's pytree, on every process (host leaves).  Non-primary
    callers pass a structure-matching pytree (e.g. freshly-initialized
    variables) whose values are ignored.  Used for checkpoint payloads
    that only process 0 reads from disk (critic warm starts)."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree)


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def fetch(x: Any) -> np.ndarray:
    """Device -> host that also works for arrays spanning non-addressable
    devices (visualization batches sharded over a cross-process 'data'
    axis): such arrays are first replicated by a tiny jitted identity."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable \
            or x.sharding.is_fully_replicated:
        return np.asarray(x)
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = x.sharding.mesh
    rep = jax.jit(lambda a: a,
                  out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(rep)
