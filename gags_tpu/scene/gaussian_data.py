"""GaussianScene: the on-device Gaussian field as a functional pytree.

Behavioural counterpart of the reference's stateful `GaussianModel`
(`scene/gaussian_model.py:25-180`) redesigned for JAX: raw (pre-activation)
parameters live in an immutable dataclass pytree; activations (exp / sigmoid
/ quat-normalise, reference lines 34-42) are applied functionally at use
sites so everything fuses under jit. Geometry is frozen in GAD training —
only `semantic_features` is a trainable leaf there.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gags_tpu.core.sh import rgb_to_sh
from gags_tpu.core.transforms import inverse_sigmoid
from gags_tpu.scene import ply as ply_io


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianScene:
    means: jnp.ndarray  # (N, 3)
    sh: jnp.ndarray  # (N, K, 3) SH coefficients, dc first
    opacities_raw: jnp.ndarray  # (N,) pre-sigmoid
    scales_raw: jnp.ndarray  # (N, 3) pre-exp
    quats: jnp.ndarray  # (N, 4) unnormalised wxyz
    semantic_features: Optional[jnp.ndarray] = None  # (N, F)
    max_sh_degree: int = dataclasses.field(default=3, metadata=dict(static=True))

    @property
    def num_gaussians(self) -> int:
        return self.means.shape[0]

    @property
    def opacities(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacities_raw)

    @property
    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.scales_raw)

    def with_features(self, features: jnp.ndarray) -> "GaussianScene":
        return dataclasses.replace(self, semantic_features=features)

    # -- I/O -------------------------------------------------------------
    @staticmethod
    def from_ply(path: str, max_sh_degree: int = 3) -> "GaussianScene":
        raw = ply_io.read_gaussian_ply(path, max_sh_degree)
        return GaussianScene(
            means=jnp.asarray(raw["means"]),
            sh=jnp.asarray(raw["sh"]),
            opacities_raw=jnp.asarray(raw["opacities_raw"]),
            scales_raw=jnp.asarray(raw["scales_raw"]),
            quats=jnp.asarray(raw["quats"]),
            semantic_features=(
                jnp.asarray(raw["semantic_features"])
                if "semantic_features" in raw
                else None
            ),
            max_sh_degree=max_sh_degree,
        )

    def save_ply(self, path: str) -> None:
        ply_io.write_gaussian_ply(
            path,
            np.asarray(self.means),
            np.asarray(self.sh),
            np.asarray(self.opacities_raw),
            np.asarray(self.scales_raw),
            np.asarray(self.quats),
            (
                np.asarray(self.semantic_features)
                if self.semantic_features is not None
                else None
            ),
        )

    # -- construction from an SfM seed cloud ------------------------------
    @staticmethod
    def from_point_cloud(
        xyz: np.ndarray,
        rgb: np.ndarray,
        max_sh_degree: int = 3,
        feature_dim: int = 16,
        knn_mean_sq_dist: Optional[np.ndarray] = None,
    ) -> "GaussianScene":
        """Initialise like the reference's create_from_pcd
        (`scene/gaussian_model.py:151-180`): SH dc from RGB, opacity 0.1,
        isotropic scale = sqrt(mean 3-NN squared distance), identity quats,
        zero semantic features (512/32 = 16-dim speedup default,
        gaussian_model.py:159-162)."""
        from gags_tpu.knn import mean_knn_sq_dist

        n = xyz.shape[0]
        k = (max_sh_degree + 1) ** 2
        sh = np.zeros((n, k, 3), np.float32)
        sh[:, 0, :] = np.asarray(rgb_to_sh(jnp.asarray(rgb)))
        if knn_mean_sq_dist is None:
            knn_mean_sq_dist = np.asarray(mean_knn_sq_dist(jnp.asarray(xyz)))
        dist2 = np.maximum(knn_mean_sq_dist, 1e-7)
        scales_raw = np.repeat(
            np.log(np.sqrt(dist2))[:, None], 3, axis=1
        ).astype(np.float32)
        quats = np.zeros((n, 4), np.float32)
        quats[:, 0] = 1.0
        opac = np.full((n,), float(inverse_sigmoid(jnp.asarray(0.1))), np.float32)
        feats = np.zeros((n, feature_dim), np.float32) if feature_dim else None
        return GaussianScene(
            means=jnp.asarray(xyz, jnp.float32),
            sh=jnp.asarray(sh),
            opacities_raw=jnp.asarray(opac),
            scales_raw=jnp.asarray(scales_raw),
            quats=jnp.asarray(quats),
            semantic_features=jnp.asarray(feats) if feats is not None else None,
            max_sh_degree=max_sh_degree,
        )
