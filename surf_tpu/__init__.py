"""surf_tpu: a TPU-native (JAX/XLA/Pallas/pjit) framework for generalizable
sparse-view neural surface reconstruction, with the capabilities of SuRF
(ECCV 2024, reference layout documented in SURVEY.md).

Design stance (TPU-first, see SURVEY.md §7):
  * functional core: every network is a pair of pure functions
    ``init(key, conf) -> params`` / ``apply(params, ...) -> out`` over pytrees;
  * static shapes everywhere: sparse voxel sets live in capacity-padded
    buffers with validity masks instead of data-dependent boolean indexing;
  * host/device split: data loading, marching cubes, mesh cleaning and
    Chamfer evaluation run on host (numpy / native C++); feature extraction,
    the sparse volume cascade, rendering and losses run on TPU under jit;
  * multi-chip scaling via ``jax.sharding.Mesh`` + shard_map (data axis over
    scenes / rays) with XLA collectives, replacing the reference's NCCL DDP.
"""

__version__ = "0.1.0"
