"""Device-mesh construction.

Axes (SURVEY.md 'parallelism inventory' -- the reference is single-GPU, this
is the from-scratch multi-chip design):
  * ``dp``  -- data / CFG-pair axis.  Batch dimension; gradients psum here.
               Maps to DCN between slices, ICI within.
  * ``sp``  -- sequence axis.  The 13k-30k video-token dimension of the DiT
               is sharded here inside jit via sharding constraints; XLA
               inserts the all-gathers/reduce-scatters for attention.
  * ``tp``  -- tensor axis.  Attention heads / MLP hidden sharded here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int = 1, sp: int = 1, tp: int = 1, pp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    auto = devices is None
    devices = list(devices if devices is not None else jax.devices())
    n = dp * sp * tp * pp
    if n > len(devices):
        raise ValueError(
            f"mesh {dp}x{sp}x{tp}x{pp}={n} exceeds {len(devices)} devices")
    if auto and n < len(devices):
        import warnings

        warnings.warn(
            f"mesh {dp}x{sp}x{tp}x{pp} uses {n} of {len(devices)} visible "
            "devices; the rest stay idle (pass devices= to silence)",
            stacklevel=2)
    arr = np.array(devices[:n]).reshape(dp, sp, tp, pp)
    return Mesh(arr, axis_names=("dp", "sp", "tp", "pp"))
