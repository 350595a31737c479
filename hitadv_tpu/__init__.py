"""hitadv_tpu — TPU-native adversarial point-cloud attack framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the HiT-ADV
reference harness (CVPR'24 "Hide in Thicket", arXiv 2403.05247): victim
point-cloud classifiers, ~20 gradient-based attacks, and the ASR /
imperceptibility evaluation loop — redesigned for TPU:

  * whole attacks (inner Adam loop + outer binary search + bookkeeping)
    compile to single XLA programs via ``lax.scan``;
  * one geometry-ops layer (`ops/`) with pure-JAX and Pallas backends
    replaces the reference's CUDA extension and its five pure-torch dupes;
  * batch data-parallelism over a `jax.sharding.Mesh` replaces the absent
    distributed support of the reference.
"""

__version__ = "0.1.0"

from hitadv_tpu import ops  # noqa: F401
