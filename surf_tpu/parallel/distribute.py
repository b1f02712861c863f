"""Multi-host (multi-process) initialization for TPU slices.

TPU-native replacement for the reference's NCCL rendezvous
(utils/distribute.py:66-89: env:// RANK/WORLD_SIZE or SLURM_PROCID ->
torch.distributed.init_process_group).  On TPU the equivalent is
``jax.distributed.initialize()``: after it, ``jax.devices()`` spans every
chip in the slice and the same ``Mesh``-based data-parallel step
(parallel/mesh.py) runs unchanged — XLA routes the collectives over ICI
within a slice and DCN across slices; there is no hand-written backend.

Rendezvous detection mirrors the reference's precedence:
  1. explicit coordinator env (JAX_COORDINATOR_ADDRESS [+ JAX_NUM_PROCESSES,
     JAX_PROCESS_ID]) — the env:// analogue;
  2. SLURM (SLURM_NTASKS > 1) — jax.distributed reads SLURM_* itself;
  3. TPU pod metadata — on Cloud TPU pods ``initialize()`` needs no args;
     opted into with conf flag ``train.multihost = true`` since single-host
     runs must not block on a coordinator.
Single-process runs are a no-op (the reference's "Not using distributed
mode" branch).
"""

from __future__ import annotations

import os


def detect_multiprocess_env(environ=None):
    """Return kwargs for jax.distributed.initialize(), or None when this is
    a single-process run."""
    env = os.environ if environ is None else environ

    coord = env.get("JAX_COORDINATOR_ADDRESS") or env.get("COORDINATOR_ADDRESS")
    if coord:
        kwargs = {"coordinator_address": coord}
        if "JAX_NUM_PROCESSES" in env:
            kwargs["num_processes"] = int(env["JAX_NUM_PROCESSES"])
        if "JAX_PROCESS_ID" in env:
            kwargs["process_id"] = int(env["JAX_PROCESS_ID"])
        return kwargs

    if int(env.get("SLURM_NTASKS", "1")) > 1:
        # jax.distributed's SLURM cluster-detection fills in the coordinator
        # from SLURM_JOB_NODELIST / SLURM_PROCID (reference: SLURM_PROCID
        # branch, utils/distribute.py:71-73)
        return {}

    return None


_initialized = False


def maybe_initialize(conf=None, environ=None):
    """Initialize multi-host jax if the environment asks for it.

    Returns True when running multi-process (after initialize()), False for
    the single-process no-op path.  Idempotent.
    """
    global _initialized
    if _initialized:
        return True

    kwargs = detect_multiprocess_env(environ)
    force = bool(conf is not None and
                 conf.get_bool("train.multihost", default=False))
    if kwargs is None and not force:
        return False

    import jax
    jax.distributed.initialize(**(kwargs or {}))
    _initialized = True
    return True


def is_main_process():
    import jax
    return jax.process_index() == 0


def process_count():
    import jax
    return jax.process_count()
