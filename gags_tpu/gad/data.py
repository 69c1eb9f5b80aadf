"""GAD supervision loader: language features → static-shape device batches.

The reference np.loads every camera's `<name>_{f,s}.npy` up front and stages
them on CPU, shipping them to the GPU every iteration
(`dataset_readers.py:183-188`, `train.py:162-165`). Here each camera's
supervision is padded once to a static (max_masks, D) embedding table and a
render-resolution int32 seg map, then streamed to the device with a
one-batch-ahead prefetcher so the jitted step never waits on host I/O.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from gags_tpu.scene.dataset import CameraInfo, camera_from_info


def _nearest_resize_np(seg: np.ndarray, out_hw: Tuple[int, int]) -> np.ndarray:
    """(L, H, W) nearest resize, torch floor-index convention."""
    h_out, w_out = out_hw
    h_in, w_in = seg.shape[-2:]
    if (h_in, w_in) == (h_out, w_out):
        return seg
    ri = np.clip(np.floor(np.arange(h_out) * (h_in / h_out)).astype(np.int64), 0, h_in - 1)
    ci = np.clip(np.floor(np.arange(w_out) * (w_in / w_out)).astype(np.int64), 0, w_in - 1)
    return seg[..., ri[:, None], ci[None, :]]


@dataclasses.dataclass
class GadExample:
    name: str
    viewmat: np.ndarray  # (4, 4)
    K: np.ndarray  # (3, 3)
    img_embed: np.ndarray  # (max_masks, D)
    seg_map: np.ndarray  # (H, W, 4) int32, -1 invalid


class GadDataset:
    """Loads + pads per-camera supervision; all cameras share one render size."""

    def __init__(
        self,
        cam_infos: Sequence[CameraInfo],
        resolution: int = 2,
        max_masks: Optional[int] = None,
        clip_dim: int = 512,
    ):
        self.examples: List[GadExample] = []
        embeds = []
        metas = []
        for info in cam_infos:
            if not info.f_path:
                raise ValueError(f"camera {info.name} has no language features")
            emb = np.load(info.f_path)  # (M, D), typically float16 on disk
            if emb.dtype not in (np.float16, np.float32):
                emb = emb.astype(np.float32)
            seg = np.load(info.s_path)  # (4, h, w) float with -1
            cam = camera_from_info(info, resolution)
            # nearest-resize to RENDER resolution at load time — exactly
            # the reference's loadCam (camera_utils.py:61, mode='nearest').
            # Because of this, read_sam_clip_feature's bilinear branch is
            # a NO-OP in the reference's own training flow (seg res ==
            # scale-map res == render res), so the same-resolution fast
            # path in blend_gt_feature_map IS the parity path at any -r.
            seg = _nearest_resize_np(seg, (cam.height, cam.width))
            seg = np.moveaxis(seg, 0, -1).astype(np.int32)  # (H, W, 4)
            embeds.append(emb)
            metas.append((info.name, cam, seg))
        self.max_masks = max_masks or max(e.shape[0] for e in embeds)
        self.clip_dim = embeds[0].shape[1] if embeds else clip_dim
        for emb, (name, cam, seg) in zip(embeds, metas):
            if emb.shape[0] > self.max_masks:
                raise ValueError(
                    f"{name}: {emb.shape[0]} masks > max_masks={self.max_masks}"
                )
            pad = np.zeros((self.max_masks, emb.shape[1]), emb.dtype)
            pad[: emb.shape[0]] = emb
            self.examples.append(
                GadExample(
                    name=name,
                    viewmat=np.asarray(cam.viewmat),
                    K=np.asarray(cam.K),
                    img_embed=pad,
                    seg_map=seg,
                )
            )
        self.height = self.examples[0].seg_map.shape[0]
        self.width = self.examples[0].seg_map.shape[1]

    def __len__(self) -> int:
        return len(self.examples)

    def epoch_order(self, rng: np.random.Generator) -> np.ndarray:
        """Random no-replacement order, like the reference's stack-pop
        sampling (train.py:133-137)."""
        return rng.permutation(len(self.examples))

    def batch(self, idx: int) -> Dict[str, np.ndarray]:
        ex = self.examples[idx]
        return dict(
            viewmat=ex.viewmat,
            K=ex.K,
            img_embed=ex.img_embed,
            seg_map=ex.seg_map,
        )


def prefetch_to_device(
    batches: Iterator[Dict[str, np.ndarray]], size: int = 2
) -> Iterator[Dict[str, jax.Array]]:
    """Host→device pipeline: keeps `size` batches in flight so H2D transfer
    overlaps the previous step's compute (replaces the reference's
    synchronous .to('cuda') per iteration)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def producer():
        try:
            for b in batches:
                q.put(jax.device_put(b))
            q.put(sentinel)
        except BaseException as exc:  # surface in the consumer — a dead
            q.put(exc)                # producer must not hang the loop

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
