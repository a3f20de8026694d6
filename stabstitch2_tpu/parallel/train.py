"""Data/model-parallel training drivers.

The reference trains on one GPU; here any stage's jitted train step scales
over a ``(data, model)`` mesh purely through shardings (see
parallel/sharding.py). ``parallelize_step`` wraps a step function with the
in/out shardings derived from a template state and batch; XLA inserts the
gradient all-reduces (params replicated over ``data``) and the TP
collectives (Dense kernels split over ``model``).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax

from stabstitch2_tpu.parallel.sharding import (
    batch_sharding,
    make_mesh,
    state_shardings,
)


def parallelize_step(step_fn: Callable, state: Any, batch_template: Any,
                     n_devices: int | None = None,
                     donate_state: bool = True
                     ) -> Tuple[Callable, Any, Any]:
    """Returns (jitted_step, sharded_state, mesh).

    ``step_fn(state, *batch, **kw) -> (new_state, metrics)``. The returned
    step takes the same arguments; feed it batches laid out like
    ``batch_template`` (leading dim divisible by the ``data`` axis size).
    """
    mesh = make_mesh(n_devices)
    st_sh = state_shardings(mesh, state)
    b_sh = batch_sharding(mesh, batch_template)
    if isinstance(b_sh, (list, tuple)):
        in_shardings = (st_sh, *b_sh)
    else:
        in_shardings = (st_sh, b_sh)
    # pin the output state to the same shardings as the input so the step
    # can be called in a loop (XLA would otherwise propagate TP shardings
    # onto extra leaves, e.g. the last Dense kernel's input dim, and the
    # next call's in_shardings check would reject the state)
    jitted = jax.jit(step_fn, in_shardings=in_shardings,
                     out_shardings=(st_sh, None),
                     donate_argnums=(0,) if donate_state else ())
    sharded_state = jax.device_put(state, st_sh)
    return jitted, sharded_state, mesh


def shard_batch(mesh, batch):
    """Place a host batch onto the mesh's ``data`` axis."""
    return jax.device_put(batch, batch_sharding(mesh, batch))
