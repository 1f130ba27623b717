"""Headless app driver (the reference's main loop, main.cpp:737-1142,
without SDL): step the camera, render frames, dump PNGs, print the
title-bar stats line, persist camera state.

Usage:
    python -m planet_tpu.io.driver [--frames N] [--out DIR] [--orbit]
        [--width W] [--height H] [--save FILE] [--slot K] [--timing]

Camera controls are scripted (an orbit or saved slots) — the reference's
WASD/arrow interaction maps to `update_camera` calls, which scripts or an
embedding UI can drive at will.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.planet import PlanetEngine
from planet_tpu.io import checkpoint, png
from planet_tpu.utils import timing


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="frames")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--save", default="save.npz")
    ap.add_argument("--slot", type=int, default=-1,
                    help="recall saved camera slot (F1-F12 analogue)")
    ap.add_argument("--orbit", action="store_true",
                    help="orbit the planet instead of holding position")
    ap.add_argument("--altitude", type=float, default=None,
                    help="override camera altitude above the surface (m)")
    ap.add_argument("--timing", action="store_true",
                    help="per-block timing prints (reference key T)")
    ap.add_argument("--wireframe", action="store_true",
                    help="grid-line rendering (reference key P)")
    ap.add_argument("--no-skirts", action="store_true",
                    help="disable skirt drop (reference key K)")
    ap.add_argument("--supersample", type=int, default=None,
                    help="splat fragments per cell edge (default: by width)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the run to DIR")
    ap.add_argument("--check-finite", action="store_true",
                    help="per-frame NaN/inf tile guard")
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args(argv)

    ss = args.supersample or max(4, round(args.width / 240))
    cfg = EngineConfig(window_w=args.width, window_h=args.height,
                       raster_supersample=ss,
                       check_finite=args.check_finite)
    engine = PlanetEngine(cfg)
    engine.wireframe = args.wireframe
    engine.skirts = not args.no_skirts

    active, slots = checkpoint.load(args.save, cfg.radius)
    cam = slots[args.slot] if 0 <= args.slot < len(slots) else active
    cam = cam.copy()
    if args.altitude is not None:
        pos = cam.position
        r = np.linalg.norm(pos)
        if r == 0:
            pos, r = np.array([0.0, 0.0, -1.0]), 1.0
        cam.position = pos / r * (cfg.radius + args.altitude)

    if args.timing and not timing.timing_enabled():
        timing.toggle_timing()

    os.makedirs(args.out, exist_ok=True)

    profiler = None
    if args.profile:
        import jax
        profiler = jax.profiler.trace(args.profile)
        profiler.__enter__()

    for i in range(args.frames):
        if args.orbit:
            theta = 2.0 * np.pi * i / max(args.frames, 1) * 0.05
            r = np.linalg.norm(cam.position)
            cam.position = r * np.array(
                [np.sin(theta), 0.0, -np.cos(theta)])

        with timing.timed("frame"):
            out, image, _ = engine.render(cam, args.width, args.height)
            image = np.asarray(image)

        s = out.stats
        # the reference's window-title stats (main.cpp:1030-1037)
        print(f"frametime: {s.frametime_ms:.1f} ms, fps: {s.fps:.1f}, "
              f"tris: {s.tris}, quads: {s.quads}, "
              f"tiles: {s.tiles_generated}, texels: {s.texels_generated}",
              flush=True)
        png.write_png(os.path.join(args.out, f"frame_{i:04d}.png"), image)

    if profiler is not None:
        profiler.__exit__(None, None, None)

    if not args.no_save:
        checkpoint.save(args.save, cam, slots)


if __name__ == "__main__":
    main()
