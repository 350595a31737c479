"""Multi-device execution: batch data-parallelism over a device mesh.

The reference is single-GPU with hard-coded ``.cuda()`` (SURVEY.md §2.8);
its attacks are embarrassingly parallel over the batch (all binary-search
state is per-example). The TPU-native equivalent: shard the eval batch
across a 1-D ``jax.sharding.Mesh`` axis ("dp"), let jit partition the
whole attack program, and psum only the scalar metric accumulators.
"""

from hitadv_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    shard_attack,
)
from hitadv_tpu.parallel.ring import ring_chamfer, ring_hausdorff  # noqa: F401
from hitadv_tpu.parallel.population import population_attack  # noqa: F401,E402
