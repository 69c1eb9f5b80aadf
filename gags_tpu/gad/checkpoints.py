"""Checkpoint / resume for GAD training.

Replaces the reference's three torch.save artifacts per checkpoint
(`train.py:230-242`: 13-tuple gaussians capture + two decoder state dicts)
with a single orbax save of the TrainState pytree, plus the same renderable
PLY snapshot (`point_cloud/iteration_N/point_cloud.ply` with semantic_{i}
fields, scene/__init__.py:88-90) for interop with reference tooling.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from gags_tpu.gad.train import TrainState
from gags_tpu.scene.gaussian_data import GaussianScene


def save_checkpoint(model_dir: str, state: TrainState, step: int) -> str:
    path = os.path.abspath(os.path.join(model_dir, f"chkpnt{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(model_dir: str, step: int, template: TrainState) -> TrainState:
    path = os.path.abspath(os.path.join(model_dir, f"chkpnt{step}"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template)


def latest_checkpoint_step(model_dir: str) -> Optional[int]:
    steps = []
    if not os.path.isdir(model_dir):
        return None
    for name in os.listdir(model_dir):
        if name.startswith("chkpnt") and name[6:].isdigit():
            steps.append(int(name[6:]))
    return max(steps) if steps else None


def export_ply(model_dir: str, scene: GaussianScene, state: TrainState, step: int) -> str:
    """Renderable snapshot in the reference's directory convention."""
    out = os.path.join(
        model_dir, "point_cloud", f"iteration_{step}", "point_cloud.ply"
    )
    scene.with_features(state.features).save_ply(out)
    return out
