"""Robust M-estimator kernels for registration/odometry.

Reference: t/pipelines/registration/RobustKernel.h:15-22 (L2, L1, Huber,
Cauchy, GermanMcClure, Tukey, GeneralizedLoss) and RobustKernelImpl.h
(compile-time dispatch). Here each kernel is a pure weight function
w(r) applied elementwise on the VPU; dispatch is static (python enum at
trace time), so XLA sees a single fused expression.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

L2 = "l2"
L1 = "l1"
HUBER = "huber"
CAUCHY = "cauchy"
GM = "gm"  # Geman-McClure
TUKEY = "tukey"
GENERALIZED = "generalized"


@dataclasses.dataclass(frozen=True)
class RobustKernel:
    """Static kernel spec (ref: registration/RobustKernel.h).

    scaling_parameter is the kernel scale k; shape_parameter is the alpha of
    the Barron generalized loss (only used by GENERALIZED).
    """

    kind: str = L2
    scaling_parameter: float = 1.0
    shape_parameter: float = 1.0

    def weight(self, r: jnp.ndarray) -> jnp.ndarray:
        """IRLS weight w(r) = (1/r) dρ/dr, matching RobustKernelImpl.h."""
        k = self.scaling_parameter
        if self.kind == L2:
            return jnp.ones_like(r)
        if self.kind == L1:
            return 1.0 / jnp.maximum(jnp.abs(r), 1e-12)
        if self.kind == HUBER:
            return k / jnp.maximum(jnp.abs(r), k)
        if self.kind == CAUCHY:
            return 1.0 / (1.0 + (r / k) ** 2)
        if self.kind == GM:
            return k / (k + r * r) ** 2
        if self.kind == TUKEY:
            u = 1.0 - jnp.minimum(jnp.abs(r) / k, 1.0) ** 2
            return u * u
        if self.kind == GENERALIZED:
            a, c = self.shape_parameter, k
            r2c2 = (r / c) ** 2
            if abs(a - 2.0) < 1e-9:
                return jnp.full_like(r, 1.0 / (c * c))
            if abs(a) < 1e-9:
                return 2.0 / (r * r + 2.0 * c * c)
            if a < -1e7:  # -inf: Welsch
                return jnp.exp(-0.5 * r2c2) / (c * c)
            return (1.0 / (c * c)) * (r2c2 / abs(a - 2.0) + 1.0) ** (a / 2.0 - 1.0)
        raise ValueError(f"unknown robust kernel {self.kind!r}")
