"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(axes: Optional[Tuple[Tuple[str, int], ...]] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a mesh from (axis, size) pairs; sizes must multiply to the
    device count (a trailing -1 axis absorbs the remainder)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axes is None:
        axes = (("lists", n),)
    names = [a for a, _ in axes]
    sizes = [s for _, s in axes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    assert int(np.prod(sizes)) == n, (sizes, n)
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(names))
