"""Host-side helpers (functional re-design of utils/tools.py): device
transfer, scalar conversion, TensorBoard scalar logging, running averages,
seeding."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def to_device(data, sharding=None):
    """Recursive host->device transfer of a dict of arrays (the reference's
    ``tocuda``, utils/tools.py:82)."""
    if isinstance(data, dict):
        return {k: to_device(v, sharding) for k, v in data.items()}
    if isinstance(data, (list, tuple)):
        return type(data)(to_device(v, sharding) for v in data)
    if isinstance(data, (np.ndarray, np.generic, int, float)):
        arr = jnp.asarray(data)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        return arr
    return data


def tensor2float(d):
    out = {}
    for k, v in d.items():
        try:
            out[k] = float(v)
        except (TypeError, ValueError):
            out[k] = v
    return out


def save_scalars(writer, mode, scalars, global_step):
    """TensorBoard scalar dump (utils/tools.py:109-117)."""
    for k, v in scalars.items():
        if isinstance(v, (int, float)):
            writer.add_scalar(f"{mode}/{k}", v, global_step)


class DictAverageMeter:
    def __init__(self):
        self.sum_data = {}
        self.avg_data = {}
        self.count = 0

    def update(self, new_input):
        self.count += 1
        for k, v in new_input.items():
            if not isinstance(v, (int, float)):
                continue
            self.sum_data[k] = self.sum_data.get(k, 0.0) + v
            self.avg_data[k] = self.sum_data[k] / self.count


def setup_seed(seed):
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
