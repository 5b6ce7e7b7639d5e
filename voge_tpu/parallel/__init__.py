"""Parallel execution: chunking and multi-chip sharding.

  - :mod:`voge_tpu.parallel.batchify` -- memory-bounded chunked execution
    (the reference's ``Batchifier``, ``Utils.py:80-176``).
  - :mod:`voge_tpu.parallel.shard`    -- ``shard_map`` over device meshes:
    camera-axis data parallelism (the TPU-native replacement for the
    reference's thread-based ``DataParallelBatchifier``, ``Utils.py:179-333``)
    and Gaussian-axis sharding with per-shard top-K + merge (the
    context-parallel analog).
"""

from voge_tpu.parallel.batchify import Batchifier, batchify
from voge_tpu.parallel.shard import (
    DataParallelBatchifier,
    interpolate_attr_sharded,
    render_pipeline_sharded,
    sample_features_sharded,
    make_mesh,
)
