"""Device-mesh construction helpers.

The reference has **no** distributed runtime (SURVEY.md §2.3); this module is
greenfield, mandated by BASELINE.json's north star.  Axis convention follows
the scaling-book recipe:

* ``dp``   — data parallel (across hosts / DCN)
* ``fsdp`` — parameter/optimizer sharding (within or across hosts)
* ``tp``   — tensor parallel (within a host, rides ICI)

``make_mesh(tp=8)`` on a v5e host maps tp onto the 8-chip ICI ring.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    tp: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a (dp, fsdp, tp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if tp is None:
        tp = n // (dp * fsdp)
    if dp * fsdp * tp != n:
        raise ValueError(f"dp*fsdp*tp = {dp * fsdp * tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, fsdp, tp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp"))


def multihost_initialize(**kwargs) -> None:
    """Initialize jax.distributed for multi-host runs (no-op if single process).

    TPU-native replacement for the reference's absent distributed init
    (roadmap item, reference README.md:28).
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # already initialized or single-process context
        pass
