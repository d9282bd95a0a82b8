"""Multi-device rendering and differentiable training steps.

The ray bundle (H*W pixels) is sharded across the mesh's 'rays' axis; the
march runs embarrassingly parallel per shard (XLA GSPMD — no communication in
the forward pass), and in gradient mode the parameter gradients are
all-reduced (psum over ICI) automatically by GSPMD when the loss reduces over
the sharded axis.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from curvis_tpu.camera.camera import Camera, pixel_rays_world
from curvis_tpu.env.spherical_image import SphericalImage
from curvis_tpu.parallel.mesh import pad_to_multiple, shard_rays
from curvis_tpu.physics import planar as pl
from curvis_tpu.render.direct import shade
from curvis_tpu.geometry.rotations import normalize


def render_direct_sharded(metric, camera: Camera, bg_positive: SphericalImage,
                          bg_negative: SphericalImage, mesh: Mesh, *, dt,
                          max_steps, escape_radius, stepper="euler",
                          filtering="nearest", differentiable=False):
    """Planar direct render with the ray axis sharded over ``mesh``.

    Jit-compatible; call under ``jax.jit`` (GSPMD partitions the march).
    """
    n_dev = mesh.devices.size
    d_world = pixel_rays_world(camera)                     # (N, 3)
    rays = pl.spawn_planar(metric, camera.position, d_world)
    n_rays = rays.l.shape[0]
    padded = jax.tree_util.tree_map(
        lambda a: pad_to_multiple(a, n_dev, axis=0)[0], rays)
    padded = pl.PlanarRays(*shard_rays(tuple(padded), mesh))
    marcher = pl.march_planar_scan if differentiable else pl.march_planar_while
    res = marcher(metric, padded, dt=dt, max_steps=max_steps,
                  escape_radius=escape_radius, stepper=stepper)
    w = normalize(pl.planar_world_directions(metric, padded, res))
    colors = shade(bg_positive, bg_negative, w, res.sign, filtering=filtering)
    colors = colors[:n_rays]
    W, H = camera.resolution_x, camera.resolution_y
    return colors.reshape(W, H, 3).transpose(1, 0, 2)


def make_train_step(mesh: Mesh, *, dt, max_steps, escape_radius,
                    stepper="euler", filtering="bilinear", lr=1e-3):
    """Full differentiable training step: render -> L2 loss vs target image ->
    grads w.r.t. (metric params, camera pose) -> SGD update.

    Gradients flow through the checkpointed-scan march; the mean over the
    sharded ray axis makes GSPMD emit the cross-device psum for the parameter
    gradients (the only collective this workload needs, SURVEY.md section 5).
    """

    def loss_fn(metric, camera, bg_positive, bg_negative, target):
        img = render_direct_sharded(metric, camera, bg_positive, bg_negative,
                                    mesh, dt=dt, max_steps=max_steps,
                                    escape_radius=escape_radius,
                                    stepper=stepper, filtering=filtering,
                                    differentiable=True)
        return jnp.mean((img - target) ** 2)

    def train_step(metric, camera, bg_positive, bg_negative, target):
        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            metric, camera, bg_positive, bg_negative, target)
        g_metric, g_camera = grads
        metric = jax.tree_util.tree_map(lambda p, g: p - lr * g, metric,
                                        g_metric)
        camera = jax.tree_util.tree_map(lambda p, g: p - lr * g, camera,
                                        g_camera)
        return metric, camera, loss

    return train_step
