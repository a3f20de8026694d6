"""Matmul precision policy.

On TPU the MXU's default f32 "matmul" runs bf16 passes (~3 decimal digits).
That is the right trade for the conv backbones, but geometry math — DLT
systems, homography/TPS grid evaluation, correlation softmax inputs — needs
true f32 accuracy or warped pixels visibly drift (the coordinate error from a
bf16 grid matmul is ~0.05 px, 3x our whole-solver error budget). Every
geometry matmul therefore pins ``precision=HIGHEST``, which XLA implements
as multi-pass bf16 (accurate to f32) on the MXU at a small, local cost.
"""

import jax

HIGHEST = jax.lax.Precision.HIGHEST
