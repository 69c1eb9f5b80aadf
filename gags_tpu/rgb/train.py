"""RGB 3DGS pretraining — the stage the reference outsources to gsplat.

The reference pipeline needs a pretrained RGB Gaussian scene before GAS/GAD
(README recommends training it with external gsplat, README.md:101); here
it is a first-class trainer so the framework is fully self-contained:
L1 + 0.2*(1-SSIM) photometric loss, per-group Adam with the exponential
xyz schedule, SH-degree warm-up, and adaptive density control.

TPU-first twist on densification: instead of reallocating arrays every
interval (the reference rebuilds optimizer state, triggering host churn —
and under jit would force a recompile per densify event), the Gaussian
buffers have FIXED capacity with an alive mask. Clone/split write into
free slots, prune parks slots far behind every camera (z = -1e9 → frustum
cull → zero instances, zero cost) — so the entire training loop, including
density control, runs as a handful of compiled programs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from gags_tpu.core.transforms import inverse_sigmoid, quat_to_rotmat
from gags_tpu.scene.gaussian_data import GaussianScene
from gags_tpu.splat.rasterizer import RasterizeConfig, rasterize
from gags_tpu.utils.metrics import ssim

DEAD_Z = -1.0e9  # parked slots sit far behind every camera → culled


@dataclasses.dataclass(frozen=True)
class RgbConfig:
    capacity_factor: int = 4       # slots = factor * initial N
    sh_degree: int = 3
    lambda_dssim: float = 0.2
    # learning rates (3DGS defaults, arguments/__init__.py:83-93)
    position_lr_init: float = 1.6e-4
    position_lr_final: float = 1.6e-6
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    # densification (arguments/__init__.py:87-93)
    percent_dense: float = 0.01
    densify_grad_threshold: float = 2e-4
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densification_interval: int = 100
    opacity_reset_interval: int = 3_000
    min_opacity: float = 0.005
    raster: RasterizeConfig = RasterizeConfig(geometry_grads=True)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RgbState:
    step: jnp.ndarray
    means: jnp.ndarray          # (C, 3)
    sh: jnp.ndarray             # (C, K, 3)
    opacities_raw: jnp.ndarray  # (C,)
    scales_raw: jnp.ndarray     # (C, 3)
    quats: jnp.ndarray          # (C, 4)
    alive: jnp.ndarray          # (C,) bool
    grad_accum: jnp.ndarray     # (C,) view-space grad-norm accumulator
    denom: jnp.ndarray          # (C,)
    max_radii: jnp.ndarray      # (C,)
    opt: Any                    # per-group adam moments pytree
    rng: jnp.ndarray


def expon_lr(step, lr_init, lr_final, delay_mult, max_steps):
    """3DGS exponential schedule (reference general_utils.py:29-62)."""
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    delay = delay_mult + (1 - delay_mult) * jnp.sin(
        0.5 * jnp.pi * jnp.clip(step / max_steps, 0, 1)
    )
    return delay * log_lerp


def _park(means, alive):
    return jnp.where(alive[:, None], means, jnp.array([0.0, 0.0, DEAD_Z]))


def create_rgb_state(scene: GaussianScene, cfg: RgbConfig, seed: int = 0):
    """Fixed-capacity state from an initial scene (e.g. SfM seed cloud)."""
    n = scene.num_gaussians
    cap = n * cfg.capacity_factor
    k = (cfg.sh_degree + 1) ** 2

    def pad(x, fill=0.0):
        pads = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pads, constant_values=fill)

    alive = jnp.arange(cap) < n
    sh = jnp.zeros((cap, k, 3)).at[:n, : scene.sh.shape[1]].set(scene.sh[:, :k])
    state = RgbState(
        step=jnp.zeros((), jnp.int32),
        means=_park(pad(scene.means), alive),
        sh=sh,
        opacities_raw=pad(scene.opacities_raw),
        scales_raw=pad(scene.scales_raw, fill=-10.0),
        quats=pad(scene.quats).at[n:, 0].set(1.0),
        alive=alive,
        grad_accum=jnp.zeros((cap,)),
        denom=jnp.zeros((cap,)),
        max_radii=jnp.zeros((cap,)),
        opt=None,
        rng=jax.random.PRNGKey(seed),
    )
    params = _params_of(state)
    opt = jax.tree_util.tree_map(
        lambda x: dict(mu=jnp.zeros_like(x), nu=jnp.zeros_like(x)), params
    )
    return dataclasses.replace(state, opt=opt)


def _params_of(state: RgbState) -> Dict[str, jnp.ndarray]:
    return dict(
        means=state.means,
        sh_dc=state.sh[:, :1],
        sh_rest=state.sh[:, 1:],
        opacities_raw=state.opacities_raw,
        scales_raw=state.scales_raw,
        quats=state.quats,
    )


def _adam_update(p, g, m, lr, step, b1=0.9, b2=0.999, eps=1e-15):
    mu = b1 * m["mu"] + (1 - b1) * g
    nu = b2 * m["nu"] + (1 - b2) * g * g
    t = step.astype(jnp.float32) + 1.0
    mu_hat = mu / (1 - b1**t)
    nu_hat = nu / (1 - b2**t)
    return p - lr * mu_hat / (jnp.sqrt(nu_hat) + eps), dict(mu=mu, nu=nu)


def make_rgb_step(cfg: RgbConfig, width: int, height: int, spatial_scale: float):
    """Jitted photometric step: render RGB → L1 + λ·(1−SSIM) → Adam.

    batch: viewmat (4,4), K (3,3), image (H, W, 3), sh_degree passed
    statically via closure-free arg (recompiles 4x over the warm-up).
    Returns (state, metrics) with view-space gradient stats accumulated for
    the densifier (reference add_densification_stats semantics).
    """
    bg = jnp.zeros((3,))

    def loss_fn(params, m2d_tap, batch, sh_degree):
        from gags_tpu.core.sh import sh_colors

        sh = jnp.concatenate([params["sh_dc"], params["sh_rest"]], axis=1)
        campos = -batch["viewmat"][:3, :3].T @ batch["viewmat"][:3, 3]
        colors = sh_colors(sh_degree, sh, params["means"], campos)
        res = rasterize(
            params["means"],
            params["quats"],
            jnp.exp(params["scales_raw"]),
            jax.nn.sigmoid(params["opacities_raw"]),
            colors,
            batch["viewmat"],
            batch["K"],
            width,
            height,
            background=bg,
            config=cfg.raster,
            means2d_tap=m2d_tap,
        )
        img = res.image
        l1 = jnp.mean(jnp.abs(img - batch["image"]))
        dssim = 1.0 - ssim(img, batch["image"])
        loss = (1 - cfg.lambda_dssim) * l1 + cfg.lambda_dssim * dssim
        return loss, (res.radii, res.means2d)

    import functools

    @functools.partial(jax.jit, static_argnames=("sh_degree",))
    def step(state: RgbState, batch, xyz_lr, sh_degree: int):
        params = _params_of(state)
        m2d_tap = jnp.zeros((state.means.shape[0], 2), jnp.float32)
        (loss, (radii, means2d)), (grads, g_m2d) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, m2d_tap, batch, sh_degree)

        lrs = dict(
            means=xyz_lr,
            sh_dc=cfg.feature_lr,
            sh_rest=cfg.feature_lr / 20.0,
            opacities_raw=cfg.opacity_lr,
            scales_raw=cfg.scaling_lr,
            quats=cfg.rotation_lr,
        )
        new_params, new_opt = {}, {}
        for k in params:
            new_params[k], new_opt[k] = _adam_update(
                params[k], grads[k], state.opt[k], lrs[k], state.step
            )

        # densification stats: SCREEN-SPACE positional gradient magnitude,
        # normalised exactly like the reference (gaussian_model.py:476-482:
        # pixel grads scaled by W/2, H/2 before the norm — the 2e-4
        # threshold is calibrated in those units)
        g2d = jnp.linalg.norm(
            g_m2d * jnp.array([width * 0.5, height * 0.5]), axis=-1
        )
        vis = radii > 0
        alive = state.alive
        new_state = RgbState(
            step=state.step + 1,
            means=_park(new_params["means"], alive),
            sh=jnp.concatenate([new_params["sh_dc"], new_params["sh_rest"]], 1),
            opacities_raw=new_params["opacities_raw"],
            scales_raw=new_params["scales_raw"],
            quats=new_params["quats"],
            alive=alive,
            grad_accum=state.grad_accum + jnp.where(vis, g2d, 0.0),
            denom=state.denom + vis.astype(jnp.float32),
            max_radii=jnp.maximum(state.max_radii, radii.astype(jnp.float32)),
            opt=new_opt,
            rng=state.rng,
        )
        return new_state, dict(loss=loss, n_alive=jnp.sum(alive))

    return step


@jax.jit
def densify_step(state: RgbState, cfg_thr: float, percent_dense: float,
                 scene_extent: float, min_opacity: float):
    """Fixed-capacity adaptive density control (clone + split + prune).

    Mirrors gaussian_model.py:415-468 semantics with slot recycling:
    under-reconstructed small Gaussians clone into free slots; large ones
    split into 2 samples (scales / 1.6) and the parent is parked;
    transparent Gaussians are parked. Runs fully under jit.
    """
    cap = state.means.shape[0]
    grads = jnp.where(state.denom > 0, state.grad_accum / state.denom, 0.0)
    scales = jnp.exp(state.scales_raw)
    max_scale = jnp.max(scales, axis=-1)
    alive = state.alive

    sel = (grads >= cfg_thr) & alive
    sel_clone = sel & (max_scale <= percent_dense * scene_extent)
    sel_split = sel & (max_scale > percent_dense * scene_extent)

    # destinations: free slots, in order
    free_rank = jnp.cumsum(~alive) - 1  # rank among free slots
    n_free = jnp.sum(~alive)

    # sources: clones first, then two copies of each split parent
    n_clone = jnp.sum(sel_clone)
    clone_rank = jnp.where(sel_clone, jnp.cumsum(sel_clone) - 1, -1)
    split_rank = jnp.where(sel_split, jnp.cumsum(sel_split) - 1, -1)
    # new-slot index for each source occurrence
    dst_of_clone = clone_rank                     # [0, n_clone)
    dst_of_split_a = n_clone + 2 * split_rank     # first child
    dst_of_split_b = n_clone + 2 * split_rank + 1

    free_idx = jnp.nonzero(~alive, size=cap, fill_value=cap)[0]  # (cap,)

    def place(dst_rank, src_mask):
        """per-Gaussian destination slot (cap = dropped) for masked sources."""
        ok = src_mask & (dst_rank >= 0) & (dst_rank < n_free)
        slot = free_idx[jnp.clip(dst_rank, 0, cap - 1)]
        return jnp.where(ok, slot, cap)

    dst_c = place(dst_of_clone, sel_clone)
    dst_a = place(dst_of_split_a, sel_split)
    dst_b = place(dst_of_split_b, sel_split)

    rng, k1, k2 = jax.random.split(state.rng, 3)
    R = quat_to_rotmat(state.quats)
    noise_a = jax.random.normal(k1, state.means.shape) * scales
    noise_b = jax.random.normal(k2, state.means.shape) * scales
    child_a = state.means + jnp.einsum("nij,nj->ni", R, noise_a)
    child_b = state.means + jnp.einsum("nij,nj->ni", R, noise_b)
    split_scales_raw = state.scales_raw - jnp.log(1.6)  # / (0.8 * 2)

    def scatter(arr, dst, values):
        return arr.at[jnp.clip(dst, 0, cap)].set(values, mode="drop")

    def scatter_all(arr, vc, va, vb):
        arr = scatter(arr, dst_c, vc)
        arr = scatter(arr, dst_a, va)
        return scatter(arr, dst_b, vb)

    means = scatter_all(state.means, state.means, child_a, child_b)
    sh = scatter_all(state.sh, state.sh, state.sh, state.sh)
    opac = scatter_all(
        state.opacities_raw, state.opacities_raw, state.opacities_raw, state.opacities_raw
    )
    scr = scatter_all(state.scales_raw, state.scales_raw, split_scales_raw, split_scales_raw)
    quats = scatter_all(state.quats, state.quats, state.quats, state.quats)

    used = jnp.zeros((cap + 1,), bool).at[dst_c].set(True, mode="drop")
    used = used.at[dst_a].set(True, mode="drop").at[dst_b].set(True, mode="drop")
    new_alive = alive | used[:cap]
    # split parents die; transparent gaussians die
    new_alive = new_alive & ~sel_split
    new_alive = new_alive & ~(
        alive & (jax.nn.sigmoid(opac) < min_opacity)
    )

    means = _park(means, new_alive)

    opt = jax.tree_util.tree_map(
        lambda m: m.at[jnp.clip(dst_c, 0, cap)].set(0.0, mode="drop")
        .at[jnp.clip(dst_a, 0, cap)].set(0.0, mode="drop")
        .at[jnp.clip(dst_b, 0, cap)].set(0.0, mode="drop"),
        state.opt,
    )

    return dataclasses.replace(
        state,
        means=means,
        sh=sh,
        opacities_raw=opac,
        scales_raw=scr,
        quats=quats,
        alive=new_alive,
        grad_accum=jnp.zeros((cap,)),
        denom=jnp.zeros((cap,)),
        max_radii=jnp.zeros((cap,)),
        opt=opt,
        rng=rng,
    )


@jax.jit
def reset_opacity_step(state: RgbState, ceiling: float = 0.01):
    new = jnp.minimum(jax.nn.sigmoid(state.opacities_raw), ceiling)
    raw = inverse_sigmoid(jnp.clip(new, 1e-6, 1 - 1e-6))
    return dataclasses.replace(state, opacities_raw=raw)


def to_scene(state: RgbState, sh_degree: int, feature_dim: int = 16) -> GaussianScene:
    """Extract the alive Gaussians as a GaussianScene (host-side compact)."""
    import numpy as np

    alive = np.asarray(state.alive)
    idx = np.nonzero(alive)[0]
    return GaussianScene(
        means=state.means[idx],
        sh=state.sh[idx],
        opacities_raw=state.opacities_raw[idx],
        scales_raw=state.scales_raw[idx],
        quats=state.quats[idx],
        semantic_features=jnp.zeros((len(idx), feature_dim)),
        max_sh_degree=sh_degree,
    )
