"""Device mesh + sharding rules (the reference's only parallelism is
single-process DataParallel, train_video.py:91-96; here parallelism is
first-class via jax.sharding).

Model-family mapping (SURVEY.md §5.7-5.8): there is no attention/sequence
axis — the natural shardable axes are the BATCH (data parallel, replacing
DataParallel scatter/gather) and the SPATIAL H axis of the 4D/5D activations
(spatial parallel; XLA SPMD inserts conv halo exchanges automatically).
Gradient all-reduce falls out of sharded autodiff — no NCCL porting.

Usage: place the batch sharded and the params replicated, then call the
already-jitted step — XLA sharding propagation partitions the entire fused
program over the mesh (collectives ride ICI).
"""
from __future__ import annotations

import logging
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["parse_mesh_shape", "make_mesh", "batch_spec", "shard_batch",
           "replicated_sharding",
           "replicate", "shard_gvars", "spatial_constraint"]

AXIS_DATA = "data"
AXIS_SPATIAL = "spatial"

_log = logging.getLogger("hpvaegan_tpu.parallel")


def parse_mesh_shape(spec: str) -> Tuple[int, ...]:
    """'2x4' -> (2, 4); '8' -> (8,)."""
    return tuple(int(p) for p in spec.lower().split("x"))


def make_mesh(shape: Sequence[int],
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {tuple(shape)} needs {n} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(tuple(shape))
    names = (AXIS_DATA, AXIS_SPATIAL)[:len(shape)]
    return Mesh(arr, names)


def default_mesh_shape(n_devices: int) -> Tuple[int, ...]:
    """Split devices into (data, spatial): batch gets 2-way DP when even,
    the rest shards the H axis."""
    if n_devices >= 4 and n_devices % 2 == 0:
        return (2, n_devices // 2)
    return (n_devices,)


def batch_spec(mesh: Mesh, ndim_spatial: int,
               shape: Optional[Sequence[int]] = None) -> P:
    """PartitionSpec for a (B, [T,] H, W, C) batch at the jit BOUNDARY.

    ``jax.device_put`` requires the sharded dim to be divisible by the axis
    size, so given ``shape`` we pick the first divisible candidate among
    H, W, (3D) T.  If none divides, the input stays sharded on 'data' only
    — with a loud warning — and ``spatial_constraint`` (uneven, inside-jit)
    is what actually spans the activations over the spatial axis.  At the
    default pyramid geometry (H in {33..256}) that is 8 of 10 scales."""
    if AXIS_SPATIAL not in mesh.axis_names:
        if ndim_spatial == 3:
            return P(AXIS_DATA, None, None, None, None)
        return P(AXIS_DATA, None, None, None)
    # candidate activation dims for the 'spatial' mesh axis, in preference
    # order: H, W, then (3D) T
    if ndim_spatial == 3:  # (B, T, H, W, C)
        candidates = (2, 3, 1)
        n_axes = 5
    else:                  # (B, H, W, C)
        candidates = (1, 2)
        n_axes = 4
    chosen: Optional[int] = candidates[0]
    if shape is not None:
        n_spatial = mesh.shape[AXIS_SPATIAL]
        chosen = next((a for a in candidates
                       if shape[a] % n_spatial == 0), None)
        if chosen is None:
            _log.warning(
                "no spatial dim of %s divides the %d-way 'spatial' mesh "
                "axis; input stays data-sharded at the boundary (activations "
                "still span the mesh via the in-step uneven sharding "
                "constraint)", tuple(shape), n_spatial)
    parts = [None] * n_axes
    parts[0] = AXIS_DATA
    if chosen is not None:
        parts[chosen] = AXIS_SPATIAL
    return P(*parts)


def spatial_constraint(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """Inside-jit activation constraint: (B over 'data', H over 'spatial').

    Unlike ``device_put``, GSPMD sharding constraints accept UNEVENLY
    divisible dims (implicit padding), so this spans the activations over
    the spatial axis at every pyramid scale — including the 8/10 default
    scales where H %% n_spatial != 0.  Steps call this on their batch inputs
    (and the generated fake); XLA propagation then partitions the whole
    fused program.  No-op for a 1-axis (pure data) mesh or ``mesh=None``."""
    if mesh is None or AXIS_SPATIAL not in mesh.axis_names:
        return x
    ndim_spatial = 3 if x.ndim == 5 else 2
    parts = [None] * x.ndim
    parts[0] = AXIS_DATA
    parts[2 if ndim_spatial == 3 else 1] = AXIS_SPATIAL
    spec = P(*parts)
    x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    if _probe_callbacks:
        for cb in _probe_callbacks:
            jax.debug.inspect_array_sharding(x, callback=cb)
    return x


# test-only hook: callbacks receive the sharding chosen for each constrained
# activation (via jax.debug.inspect_array_sharding) so tests can assert the
# REAL train step's intermediates span the mesh
_probe_callbacks: list = []


def shard_batch(x: jax.Array, mesh: Mesh, ndim_spatial: int) -> jax.Array:
    from .multihost import global_put
    spec = batch_spec(mesh, ndim_spatial, x.shape)
    return global_put(x, NamedSharding(mesh, spec))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params, optimizer state) over the whole mesh
    (multi-host safe: every process holds an identical local copy by the
    shared-seed construction, parallel/multihost.py)."""
    from .multihost import global_put
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: global_put(a, sharding), tree)


def replicated_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    """The 'replicated on this mesh' placement as a sharding object (for
    APIs that take a sharding rather than an array, e.g. the device
    cache's store upload); None when not running under --spmd."""
    return None if mesh is None else NamedSharding(mesh, P())


def shard_gvars(gvars: Any, mesh: Mesh) -> Any:
    """Generator/critic variables are replicated: this model family is all
    3x3(x3) convs with <=25M params — replication is optimal; the FLOPs and
    memory live in activations, which the data/spatial axes shard."""
    return replicate(gvars, mesh)
