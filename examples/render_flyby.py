#!/usr/bin/env python
"""Relativistic fly-by: camera ORBITING a spinning black hole at its local
circular-orbit speed, with special-relativistic aberration + Doppler
brightness of the received field (--camera-velocity machinery) and the
frame-dragged blackbody disk — the DNGR moving-camera shot.

    python examples/render_flyby.py [outdir] [--frames 24] [--res 480x270]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent))
from render_wormholes import starfield  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", type=Path,
                    default=Path(__file__).parent / "out")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--res", default="480x270")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)
    W, H = (int(v) for v in args.res.split("x"))
    args.outdir.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp
    import curvis_tpu as cv
    from curvis_tpu.metrics.kerr import KerrMetric
    from curvis_tpu.render.disk import DiskParams
    from curvis_tpu.render.kerr import render_kerr_frames_batched
    from curvis_tpu.utils.assemble import assemble_gif

    m = KerrMetric(m=jnp.asarray(1.0, jnp.float32),
                   a=jnp.asarray(0.9, jnp.float32))
    sky = cv.make_spherical_image(starfield(512, 1024, 7, (0.7, 0.75, 1.0)))
    disk = DiskParams(r_inner=2.6, r_outer=12.0, doppler=True,
                      color_mode="blackbody", t_peak=7000.0, brightness=14.0)
    r0, th = 16.0, np.pi / 2 - 0.25
    # local static-frame circular-orbit speed at the camera radius
    beta = float(np.sqrt(1.0 / r0) / np.sqrt(1.0 - 2.0 / r0))
    print(f"orbital beta = {beta:.3f}")

    frames = []
    t0 = time.time()
    for k0 in range(0, args.frames, args.batch):
        ks = range(k0, min(k0 + args.batch, args.frames))
        cams, vels = [], []
        for k in ks:
            phi = 2.0 * np.pi * k / args.frames
            # camera keeps facing the hole while orbiting prograde
            cams.append(cv.make_camera(
                [0.0, r0, th, phi],
                [-np.sin(th) * np.cos(phi), -np.sin(th) * np.sin(phi),
                 -np.cos(th)],
                [0.0, 0.0, 1.0], 28.0, 43.0, W, H, dtype=jnp.float32))
            vels.append([-beta * np.sin(phi), beta * np.cos(phi), 0.0])
        imgs = np.asarray(render_kerr_frames_batched(
            m, cams, sky, dt=0.1, max_steps=24_000, escape_radius=50.0,
            disk=disk, camera_velocities=vels))
        tmp = args.outdir / "flyby_tmp"
        tmp.mkdir(exist_ok=True)
        for i, k in enumerate(ks):
            p = tmp / f"frame_{k:03d}.png"
            cv.save_image(imgs[i], p)
            frames.append(p)
        print(f"frames {list(ks)}: {time.time() - t0:.1f}s total",
              flush=True)
    gif = args.outdir / "kerr_flyby.gif"
    assemble_gif(args.outdir / "flyby_tmp", gif, frame_rate=12.0)
    for p in frames:
        p.unlink()
    (args.outdir / "flyby_tmp").rmdir()
    print(f"wrote {gif}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
