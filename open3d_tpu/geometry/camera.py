"""Pinhole camera models (reference: cpp/open3d/camera/PinholeCameraIntrinsic.h:32,
PinholeCameraParameters.h:21, PinholeCameraTrajectory.h:21).

Intrinsics are static metadata (python floats/ints) because image shapes must
be static under jit; the 3x3 matrix is materialized on demand.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PinholeCameraIntrinsic:
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float

    @property
    def intrinsic_matrix(self) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )

    def scaled(self, factor: float) -> "PinholeCameraIntrinsic":
        """Intrinsics for an image resized by `factor` (e.g. 0.5 per pyramid level)."""
        return PinholeCameraIntrinsic(
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
        )

    @staticmethod
    def prime_sense_default() -> "PinholeCameraIntrinsic":
        """Reference preset PinholeCameraIntrinsicParameters::PrimeSenseDefault
        (camera/PinholeCameraIntrinsic.cpp): 640x480, fx=fy=525, cx=319.5, cy=239.5."""
        return PinholeCameraIntrinsic(640, 480, 525.0, 525.0, 319.5, 239.5)

    @staticmethod
    def from_matrix(width: int, height: int, K) -> "PinholeCameraIntrinsic":
        import numpy as np

        K = np.asarray(K)
        return PinholeCameraIntrinsic(width, height, float(K[0, 0]), float(K[1, 1]), float(K[0, 2]), float(K[1, 2]))


@dataclasses.dataclass
class PinholeCameraParameters:
    """Intrinsic + world-to-camera extrinsic (reference: PinholeCameraParameters.h:21)."""

    intrinsic: PinholeCameraIntrinsic
    extrinsic: jnp.ndarray  # (4, 4) world -> camera


@dataclasses.dataclass
class PinholeCameraTrajectory:
    parameters: list[PinholeCameraParameters]
