"""Scene editing ops: colour transform / deletion / extraction of
relevancy-selected Gaussians.

The reference ships YAML edit configs (`configs/edit_{color,deletion,
extraction}.yaml`) with no consuming script in its snapshot (SURVEY.md
§2.1) — the capability is implemented here: select Gaussians by text
relevancy (argmax over the object list, or a threshold), then

  * color_func: apply a colour function to the selected Gaussians' SH dc,
  * deletion: remove them from the scene,
  * extraction: keep only them.

Edited scenes are plain GaussianScene pytrees → render/export as usual.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from gags_tpu.core.sh import rgb_to_sh, sh_to_rgb
from gags_tpu.scene.gaussian_data import GaussianScene


@dataclasses.dataclass
class EditConfig:
    objects: List[str]
    operation: str  # "color_func" | "deletion" | "extraction"
    targets: List[str]
    threshold: Optional[float] = None  # None → argmax over objects
    color_func: Optional[str] = None  # python lambda source over (N, 3) rgb

    @staticmethod
    def from_yaml(path: str) -> "EditConfig":
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)["edit"]
        targets = data.get("targets", [])
        if isinstance(targets, str):
            targets = [targets]
        ops = data.get("operations", "color_func")
        if isinstance(ops, (list, tuple)):
            ops = ops[0]
        return EditConfig(
            objects=list(data["objects"]),
            operation=str(ops),
            targets=targets,
            threshold=data.get("threshold"),
            color_func=data.get("colorFunc"),
        )


def select_by_text(
    decoded: jnp.ndarray,  # (N, D) CLIP-space per-Gaussian features
    object_embeds: jnp.ndarray,  # (L, D) one per object in cfg.objects
    target_ids: Sequence[int],
    threshold: Optional[float],
) -> jnp.ndarray:
    """(N,) bool: Gaussians assigned to any target object.

    argmax mode (threshold None): a Gaussian belongs to the object with the
    highest cosine similarity. threshold mode: similarity to the target
    exceeds the threshold.
    """
    d = decoded / jnp.maximum(jnp.linalg.norm(decoded, axis=-1, keepdims=True), 1e-9)
    e = object_embeds / jnp.maximum(
        jnp.linalg.norm(object_embeds, axis=-1, keepdims=True), 1e-9
    )
    sims = d @ e.T  # (N, L)
    tid = jnp.asarray(list(target_ids))
    if threshold is None:
        return jnp.isin(jnp.argmax(sims, axis=-1), tid)
    return jnp.any(sims[:, tid] > threshold, axis=-1)


def _subset(scene: GaussianScene, mask: jnp.ndarray) -> GaussianScene:
    idx = np.nonzero(np.asarray(mask))[0]
    return GaussianScene(
        means=scene.means[idx],
        sh=scene.sh[idx],
        opacities_raw=scene.opacities_raw[idx],
        scales_raw=scene.scales_raw[idx],
        quats=scene.quats[idx],
        semantic_features=(
            scene.semantic_features[idx]
            if scene.semantic_features is not None
            else None
        ),
        max_sh_degree=scene.max_sh_degree,
    )


def apply_edit(
    scene: GaussianScene,
    mask: jnp.ndarray,
    operation: str,
    color_func: Optional[Callable] = None,
) -> GaussianScene:
    if operation == "deletion":
        return _subset(scene, ~mask)
    if operation == "extraction":
        return _subset(scene, mask)
    if operation == "color_func":
        assert color_func is not None
        rgb = sh_to_rgb(scene.sh[:, 0, :])
        new_rgb = jnp.asarray(color_func(rgb))
        dc = jnp.where(mask[:, None], rgb_to_sh(new_rgb), scene.sh[:, 0, :])
        # zero higher-order SH on edited gaussians so the recolour is exact
        rest = jnp.where(mask[:, None, None], 0.0, scene.sh[:, 1:, :])
        sh = jnp.concatenate([dc[:, None, :], rest], axis=1)
        return dataclasses.replace(scene, sh=sh)
    raise ValueError(f"unknown edit operation {operation!r}")


def parse_color_func(src: str) -> Callable:
    """Compile the config's colour lambda in a numpy/jnp-only namespace
    (the reference documents a python lambda string in the yaml)."""
    allowed = {"np": np, "jnp": jnp, "__builtins__": {}}
    fn = eval(src, allowed)  # noqa: S307 — user-authored config, sandboxed env
    if not callable(fn):
        raise ValueError("colorFunc must be a lambda/callable")
    return fn
