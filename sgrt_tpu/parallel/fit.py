"""Differentiable scene fitting — the framework's training loop.

NEW capability vs the forward-only reference (SURVEY §0: "no backward pass
anywhere in the reference"): optimize Gaussian means / sigmas / magnitudes /
albedos against target pixels by gradient descent (optax), with rays sharded
across chips and parameter gradients all-reduced (psum) over ICI — the
north-star configuration of BASELINE.json.

Design: shard_map over a 1-D "rays" mesh; each device computes loss +
gradients on its pixel shard; `jax.lax.pmean` inside the shard_map produces
the ICI all-reduce, which XLA schedules so it overlaps with the remaining
backward computation. Parameters are replicated; the optimizer step is
identical on every device.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from sgrt_tpu.models.gaussians import GaussianScene
from sgrt_tpu.ops.render import render_rays_impl
from sgrt_tpu.parallel.mesh import RAYS_AXIS


class FitState(NamedTuple):
    scene: GaussianScene
    opt_state: Any
    step: jnp.ndarray


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def make_train_step(
    optimizer: optax.GradientTransformation,
    mesh: Mesh | None = None,
    loss_fn: Callable = l2_loss,
    q_block: int = 128,
    ray_block: int = 2048,
    trainable: tuple[str, ...] = ("mu", "sigma", "magnitude", "albedo"),
):
    """Build a jitted train step: (state, o, dirs, target) → (state, loss).

    mesh=None → single-device step. With a mesh, dirs/target must be sharded
    on the rays axis (parallel.mesh.shard_rays) and their length divisible by
    the mesh size.
    """

    def local_loss(scene, o, dirs, target):
        colors = render_rays_impl(o, dirs, scene, q_block, ray_block)
        return loss_fn(colors, target)

    def value_and_grad(scene, o, dirs, target):
        def masked(scene_):
            # Freeze non-trainable fields by re-inserting stopped gradients.
            fields = {
                f: (getattr(scene_, f) if f in trainable
                    else jax.lax.stop_gradient(getattr(scene_, f)))
                for f in ("mu", "sigma", "magnitude", "albedo")
            }
            return local_loss(GaussianScene(**fields), o, dirs, target)

        return jax.value_and_grad(masked)(scene)

    if mesh is not None:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(RAYS_AXIS), P(RAYS_AXIS)),
            out_specs=(P(), P()),
        )
        def sharded_vg(scene, o, dirs, target):
            loss, grads = value_and_grad(scene, o, dirs, target)
            # Gradient all-reduce over ICI; overlapped with backward by XLA.
            grads = jax.lax.pmean(grads, RAYS_AXIS)
            loss = jax.lax.pmean(loss, RAYS_AXIS)
            return loss, grads

        vg = sharded_vg
    else:
        vg = value_and_grad

    @jax.jit
    def train_step(state: FitState, o, dirs, target):
        loss, grads = vg(state.scene, o, dirs, target)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.scene)
        scene = optax.apply_updates(state.scene, updates)
        return FitState(scene, opt_state, state.step + 1), loss

    return train_step


def init_state(scene: GaussianScene, optimizer: optax.GradientTransformation) -> FitState:
    return FitState(scene, optimizer.init(scene), jnp.zeros((), jnp.int32))


def fit(
    scene: GaussianScene,
    o,
    dirs,
    target,
    steps: int = 200,
    learning_rate: float = 1e-2,
    mesh: Mesh | None = None,
    optimizer: optax.GradientTransformation | None = None,
    callback: Callable[[int, float], None] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 100,
    **step_kwargs,
) -> tuple[GaussianScene, list]:
    """Fit a scene to target ray colors. Returns (fitted scene, loss history).

    checkpoint_dir enables orbax checkpointing every `checkpoint_every` steps
    (resumable via sgrt_tpu.utils.checkpoint.restore_fit).
    """
    optimizer = optimizer or optax.adam(learning_rate)
    step_fn = make_train_step(optimizer, mesh=mesh, **step_kwargs)
    state = init_state(scene, optimizer)

    mgr = None
    if checkpoint_dir is not None:
        from sgrt_tpu.utils.checkpoint import make_manager, save_fit

        mgr = make_manager(checkpoint_dir)

    losses = []
    for i in range(steps):
        state, loss = step_fn(state, o, dirs, target)
        if callback is not None or (i + 1) % max(steps // 10, 1) == 0:
            lv = float(loss)
            losses.append(lv)
            if callback is not None:
                callback(i, lv)
        if mgr is not None and (i + 1) % checkpoint_every == 0:
            save_fit(mgr, int(state.step), state)
    if mgr is not None:
        save_fit(mgr, int(state.step), state)
        mgr.wait_until_finished()
    return state.scene, losses
