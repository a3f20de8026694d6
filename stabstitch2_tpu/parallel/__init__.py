"""Multi-chip scaling utilities (mesh construction, sharding rules).

The reference is single-GPU (SURVEY.md §2: no distributed anything), so
parallelism here is a designed capability, not a port: data-parallel
training over a ``data`` mesh axis plus tensor-parallel sharding of the
large regression-head matmuls over a ``model`` axis, all via
``jax.sharding`` annotations — XLA inserts the collectives.
"""

from stabstitch2_tpu.parallel.sharding import (
    make_mesh,
    state_shardings,
    batch_sharding,
)

__all__ = ["make_mesh", "state_shardings", "batch_sharding"]
