"""Device-mesh construction for SPMD extraction and training.

The reference is single-process/single-GPU (SURVEY.md §2.5: serial per-file
loops, no distributed backend). The TPU-native design scales instead by
laying a logical ``(dp, mp)`` mesh over the chips:

* ``dp`` (data) — batches of files/sequences are sharded here; feature
  extraction and CV training are embarrassingly parallel over files, so dp
  rides ICI with no collectives beyond metric reductions (psum).
* ``mp`` (model) — weight matrices of the larger models (Wav2Vec2 attention
  heads / MLP, CNN-LSTM channels) shard here; XLA GSPMD inserts the
  all-reduces. At reference-model scale mp=1 is the right default; the axis
  exists so the same program runs unchanged when models outgrow one chip.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_axes() -> Tuple[str, str]:
    return ("dp", "mp")


def make_mesh(
    n_devices: Optional[int] = None,
    mp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (dp, mp) mesh over ``n_devices`` (default: all devices).

    ``mp`` must divide the device count; ``dp = n_devices / mp``.
    """
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % mp != 0:
        raise ValueError(f"mp={mp} does not divide device count {n}")
    arr = np.asarray(devs).reshape(n // mp, mp)
    return Mesh(arr, mesh_axes())


def auto_mesh(
    n_devices: Optional[int] = None, mp: int = 1
) -> Optional[Mesh]:
    """Mesh over the visible devices when there is more than one, else None.

    The orchestration layer's default: ``cli extract`` / ``cli cnnlstm`` on
    a pod shard file batches and trial lanes over all chips without any
    flag (SURVEY §2.5's headline capability — batch-of-files DP replacing
    the reference's serial per-file loop); on a single chip every mesh=
    kwarg stays None and the single-device paths run unchanged."""
    avail = len(jax.devices())
    n = avail if n_devices is None else min(n_devices, avail)
    if n <= 1:
        return None
    return make_mesh(n_devices=n, mp=mp)
