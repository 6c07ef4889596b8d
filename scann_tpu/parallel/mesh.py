"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from scann_tpu.errors import ScannError


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("db",),
              shape: Optional[Tuple[int, ...]] = None) -> Mesh:
    """Create a device mesh.

    Args:
        n_devices: devices to use (default: all available).
        axis_names: mesh axis names, e.g. ("db",) for database sharding or
            ("q", "db") for query-batch x database 2-D meshes.
        shape: explicit mesh shape; defaults to putting all devices on the
            last axis.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ScannError.invalid_argument(
            f"requested {n} devices, only {len(devs)} available"
        )
    if shape is None:
        shape = (1,) * (len(axis_names) - 1) + (n,)
    if int(np.prod(shape)) != n:
        raise ScannError.invalid_argument(f"mesh shape {shape} != {n} devices")
    arr = np.asarray(devs[:n]).reshape(shape)
    return Mesh(arr, axis_names)


def shard_rows(mesh: Mesh, arr, axis: str = "db"):
    """Place an array with its leading dim sharded over ``axis`` (pads rows
    to a multiple of the axis size first).

    Pass host (numpy) arrays for large data: padding then happens on host
    and ``device_put`` transfers straight into the sharded layout — no
    staging copy of the WHOLE array on one device, which would cap the
    shardable size at a single chip's HBM."""
    size = mesh.shape[axis]
    n = arr.shape[0]
    n_pad = ((n + size - 1) // size) * size
    if n_pad != n:
        if isinstance(arr, np.ndarray):
            pad = np.zeros((n_pad - n,) + arr.shape[1:], dtype=arr.dtype)
            arr = np.concatenate([arr, pad], axis=0)
        else:
            import jax.numpy as jnp

            arr = jnp.pad(arr, [(0, n_pad - n)] + [(0, 0)] * (arr.ndim - 1))
    spec = P(axis, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec)), n


def replicate(mesh: Mesh, arr):
    """Place an array fully replicated across the mesh."""
    spec = P(*([None] * arr.ndim))
    return jax.device_put(arr, NamedSharding(mesh, spec))
