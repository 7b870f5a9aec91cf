"""Device mesh helpers.

The reference is single-process (SURVEY.md section 2: no goroutines, no
distributed backend); every parallel axis here is new TPU-native design:
  * "data"  — independent blobs (DP): embarrassingly parallel
  * "elem"  — the polynomial/CRS element axis (the sequence/tensor-parallel
              analogue): sharded FFT butterflies and MSM partial sums,
              exchanged over ICI with ppermute/all_to_all/all_gather
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axes=("data", "elem"),
              shape=None) -> Mesh:
    """Build a mesh over the first n_devices devices.

    With two axes and no explicit shape, puts as many devices as possible
    on "elem" (the communication-heavy axis rides the faster links) and
    the rest on "data".
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if shape is None:
        if len(axes) == 1:
            shape = (n_devices,)
        else:
            elem = 1
            while elem * 2 <= n_devices and n_devices % (elem * 2) == 0:
                elem *= 2
            shape = (n_devices // elem, elem)
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)
