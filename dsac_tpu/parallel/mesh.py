"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
HYP_AXIS = "hyp"


def make_mesh(data: int, hyp: int, devices=None) -> Mesh:
    """A (data, hyp) mesh over the first data*hyp devices.

    'data' shards frames (across hosts/DCN at scale); 'hyp' shards the
    per-frame hypothesis pool and the coordinate-CNN patch axis (within a
    slice, riding ICI).
    """
    if devices is None:
        devices = jax.devices()
    n = data * hyp
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, hyp)
    return Mesh(arr, (DATA_AXIS, HYP_AXIS))
