"""Headless app driver (the reference's main loop, main.cpp:737-1142,
without SDL): step the camera, render frames, dump PNGs, print the
title-bar stats line, persist camera state.

Usage:
    python -m planet_tpu.io.driver [--frames N] [--out DIR] [--orbit]
        [--width W] [--height H] [--save FILE] [--slot K] [--save-slot K]
        [--timing] [--interactive]

Camera controls come three ways: scripted (an orbit or saved slots), the
slot flags (--slot recalls, --save-slot stores — the reference's F1-F12 /
shift+F1-F12, main.cpp:958-975), or `--interactive`, a line-oriented
terminal mode mapping the reference key set (main.cpp:947-1000) onto
`update_camera` and the engine toggles — see INTERACTIVE_HELP.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.planet import PlanetEngine
from planet_tpu.geom import camera as cam_mod
from planet_tpu.io import checkpoint, png
from planet_tpu.utils import timing

INTERACTIVE_HELP = """\
Interactive commands (one line = keys held for one 1/30 s step, then a
frame renders and its stats print; reference key map main.cpp:947-1000):
  w / s          move forward / back       a / d   strafe left / right
  up down left right   look (arrow keys)
  1..8           move speed 10^n m/s (number keys)
  f1..f12        recall camera slot K     sf1..sf12  save to slot K (shift+F)
  p              wireframe toggle          k       skirt toggle
  t              timing-print toggle       png     dump frame to --out
  help           this text                 q       quit (persists state)
"""


class DeviceInteractiveEngine:
    """run_interactive-compatible engine over the fully-fused device path
    (DeviceRenderer, fetch='u8', k x k-subsampled preview).

    The host-path PlanetEngine synchronizes per frame and fetches the full
    image; through the axon tunnel the u8 1080p fetch alone floors at
    ~90 ms (docs/RESULTS_r4.md "Interactive fetch floor"). Here the
    per-frame display payload is the on-device-subsampled preview
    (preview=2 at 1080p: 0.52 MB, ~4x less tunnel time) while the
    full-res u8 frame stays on device — `png` dumps fetch it lazily, so
    the PNG path is bit-exact, preview or not.

    wireframe toggling rebuilds the raster jit (it is a static kernel
    parameter); the skirt toggle is baked into the fused geometry program
    and is not toggleable here — use the host engine for key-K work."""

    def __init__(self, cfg: EngineConfig, width: int, height: int, *,
                 preview: int = 2, **kw):
        self.cfg = cfg
        self.width, self.height = int(width), int(height)
        self._preview = int(preview)
        self._kw = dict(kw)
        self._wireframe = False
        self._skirts = True
        self._build()
        self.pool = self._r.init_pool()

    @property
    def skirts(self):
        return self._skirts

    @skirts.setter
    def skirts(self, v):
        if bool(v) != self._skirts:
            print("(skirt toggle is baked into the fused device program; "
                  "ignored here — use the host engine for key-K work)",
                  flush=True)

    def _build(self):
        from planet_tpu.engine.device_step import DeviceRenderer
        rcfg = dict(self._kw.pop("raster_cfg", None) or {})
        rcfg["wireframe"] = self._wireframe
        self._r = DeviceRenderer(self.cfg, self.width, self.height,
                                 fetch="u8", preview=self._preview,
                                 raster_cfg=rcfg, **self._kw)
        self._kw["raster_cfg"] = {k: v for k, v in rcfg.items()
                                  if k != "wireframe"}

    @property
    def wireframe(self):
        return self._wireframe

    @wireframe.setter
    def wireframe(self, v):
        if bool(v) != self._wireframe:
            self._wireframe = bool(v)
            print("(wireframe toggle recompiles the device raster...)",
                  flush=True)
            self._build()

    def render(self, cam, width=None, height=None):
        from planet_tpu.engine.planet import FrameStats
        from planet_tpu.nums import df as dfm
        from planet_tpu.tess import mesh as mesh_mod
        t0 = time.perf_counter()
        c = self.cfg
        rot = cam_mod.camera_rotation(cam)
        pf = cam_mod.proj_factor_from_fovy(np.deg2rad(c.fovy_deg))
        proj = cam_mod.perspective_lh(pf, self.width / self.height,
                                      c.near_plane, c.far_plane)
        vp = np.asarray((proj @ cam_mod.view_from_rotation(rot))
                        .astype(np.float32))
        ch, cl = dfm.from_f64_np(cam.position)
        self.pool, frame = self._r.render(self.pool, ch, cl, vp)
        # the per-frame "display" fetch: preview only
        shown = frame.preview if frame.preview is not None else frame.image
        _ = np.asarray(shown)
        n = int(frame.n_leaves)
        gens = int(frame.n_generated)
        dt = time.perf_counter() - t0
        stats = FrameStats(
            frametime_ms=dt * 1e3, fps=1.0 / max(dt, 1e-9),
            tris=n * mesh_mod.interior_triangle_count(c.patch_verts),
            quads=n, tiles_generated=gens,
            texels_generated=gens * c.tile_dim * c.tile_dim)

        class _Out:
            pass

        out = _Out()
        out.stats = stats
        # full-res u8 image stays lazy on device until the caller (the
        # `png` command) converts it
        return out, frame.image, frame.depth


def run_interactive(engine: PlanetEngine, cam, slots, width: int,
                    height: int, out_dir: str, stream=None, echo=True):
    """Line-oriented interactive loop; `stream` defaults to stdin (tests
    feed a StringIO). Returns the final camera. dt is a fixed 1/30 s so
    command scripts are deterministic."""
    stream = stream if stream is not None else sys.stdin
    dt = 1.0 / 30.0
    look_speed = 1.5
    move_speed = cam_mod.speed_for_digit(3)
    frame_no = 0
    for line in stream:
        tokens = line.split()
        if "q" in tokens:
            break
        move = np.zeros(3, np.float32)
        look = np.zeros(3, np.float32)
        dump = False
        for tok in tokens:
            if tok == "w":
                move[2] += 1.0
            elif tok == "s":
                move[2] -= 1.0
            elif tok == "a":
                move[0] -= 1.0
            elif tok == "d":
                move[0] += 1.0
            elif tok == "up":
                look[0] -= 1.0            # pitch up (reference arrow look)
            elif tok == "down":
                look[0] += 1.0
            elif tok == "left":
                look[1] -= 1.0
            elif tok == "right":
                look[1] += 1.0
            elif tok.isdigit() and len(tok) == 1 and tok != "0":
                move_speed = cam_mod.speed_for_digit(int(tok))
            elif tok.startswith("sf") and tok[2:].isdigit():
                k = int(tok[2:]) - 1
                if 0 <= k < len(slots):
                    slots[k] = cam.copy()
            elif tok.startswith("f") and tok[1:].isdigit():
                k = int(tok[1:]) - 1
                if 0 <= k < len(slots):
                    cam = slots[k].copy()
            elif tok == "p":
                engine.wireframe = not engine.wireframe
            elif tok == "k":
                engine.skirts = not engine.skirts
            elif tok == "t":
                timing.toggle_timing()
            elif tok == "png":
                dump = True
            elif tok == "help":
                print(INTERACTIVE_HELP, flush=True)
            elif echo:
                print(f"? unknown key {tok!r} (try: help)", flush=True)
        cam_mod.update_camera(cam, move, look, move_speed, look_speed, dt)
        out, image, _ = engine.render(cam, width, height)
        s = out.stats
        print(f"frametime: {s.frametime_ms:.1f} ms, fps: {s.fps:.1f}, "
              f"tris: {s.tris}, quads: {s.quads}, "
              f"tiles: {s.tiles_generated}, speed: {move_speed:g} m/s",
              flush=True)
        if dump:
            png.write_png(
                os.path.join(out_dir, f"interactive_{frame_no:04d}.png"),
                np.asarray(image))
        frame_no += 1
    return cam


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--out", default="frames")
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--save", default="save.npz")
    ap.add_argument("--slot", type=int, default=-1,
                    help="recall saved camera slot (F1-F12 analogue)")
    ap.add_argument("--save-slot", type=int, default=-1,
                    help="store the camera into this slot before exiting "
                         "(shift+F1-F12 analogue, main.cpp:958-975)")
    ap.add_argument("--interactive", action="store_true",
                    help="line-oriented terminal control mode (see "
                         "driver.INTERACTIVE_HELP)")
    ap.add_argument("--device", action="store_true",
                    help="interactive mode on the fully-fused device path "
                         "(DeviceRenderer + u8 preview fetch)")
    ap.add_argument("--preview", type=int, default=2,
                    help="with --device: k x k preview subsampling for the "
                         "per-frame tunnel fetch (PNG dumps stay full-res "
                         "bit-exact; 1 disables)")
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
    ap.add_argument("--no-pallas", action="store_true",
                    help="XLA noise path instead of the Pallas kernels "
                         "(CPU runs)")
    ap.add_argument("--no-save", action="store_true")
    args = ap.parse_args(argv)

    ss = args.supersample or max(4, round(args.width / 240))
    cfg = EngineConfig(window_w=args.width, window_h=args.height,
                       raster_supersample=ss,
                       use_pallas=not args.no_pallas,
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

    if args.interactive:
        print(INTERACTIVE_HELP, flush=True)
        ieng = engine
        if args.device:
            ieng = DeviceInteractiveEngine(cfg, args.width, args.height,
                                           preview=args.preview)
            ieng.wireframe = args.wireframe
        cam = run_interactive(ieng, cam, slots, args.width, args.height,
                              args.out)
        if args.save_slot >= 0 and args.save_slot < len(slots):
            slots[args.save_slot] = cam.copy()
        if profiler is not None:
            profiler.__exit__(None, None, None)
        if not args.no_save:
            checkpoint.save(args.save, cam, slots)
        return

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

    if args.save_slot >= 0 and args.save_slot < len(slots):
        slots[args.save_slot] = cam.copy()
    if not args.no_save:
        checkpoint.save(args.save, cam, slots)


if __name__ == "__main__":
    main()
