"""Driver camera-control loop: interactive terminal commands and camera
slot save/recall (reference event loop, main.cpp:947-1010; slots
main.cpp:958-975)."""

import io

import numpy as np
import pytest

from planet_tpu.engine.config import EngineConfig
from planet_tpu.engine.planet import PlanetEngine
from planet_tpu.io import checkpoint, driver
from planet_tpu.geom import camera as cam_mod

pytestmark = pytest.mark.slow   # integration tier: big fused-program compiles

W, H = 64, 48


@pytest.fixture(scope="module")
def engine():
    cfg = EngineConfig(use_pallas=False, window_w=W, window_h=H,
                       raster_supersample=1)
    # smooth sphere: cheap frames, geometry still exercised end to end
    return PlanetEngine(cfg, height_fn=lambda p: np.zeros(len(p),
                                                          np.float32))


def _cam(radius=6371000.0, alt=100e3):
    return cam_mod.Camera(position=np.array([0.0, 0.0, -(radius + alt)]))


def test_interactive_moves_and_slots(engine, tmp_path, capsys):
    active, slots = checkpoint.default_state()
    cam = _cam()
    p0 = cam.position.copy()
    script = io.StringIO("w 4\nsf3 w\nf3\nq\n")
    out = driver.run_interactive(engine, cam, slots, W, H, str(tmp_path),
                                 stream=script)
    text = capsys.readouterr().out
    assert text.count("frametime:") == 3          # one frame per line
    # line 1: forward at default speed, then speed 10^4 set
    # line 2: slot 3 saved BEFORE the move (key order within a line),
    #         then another forward step at 10^4 m/s
    # line 3: recall slot 3 -> back to the post-line-1 position
    d1 = np.linalg.norm(np.asarray(slots[2].position) - p0)
    assert d1 > 0                                  # slot holds a moved cam
    np.testing.assert_array_equal(out.position, slots[2].position)


def test_interactive_look_and_toggles(engine, tmp_path, capsys):
    active, slots = checkpoint.default_state()
    cam = _cam()
    a0 = cam.angles.copy()
    wf0 = engine.wireframe
    script = io.StringIO("up left\np\np\nq\n")
    driver.run_interactive(engine, cam, slots, W, H, str(tmp_path),
                           stream=script)
    capsys.readouterr()
    assert cam.angles[0] < a0[0] and cam.angles[1] < a0[1]
    assert engine.wireframe == wf0                 # toggled twice

    script = io.StringIO("p\nq\n")
    driver.run_interactive(engine, cam, slots, W, H, str(tmp_path),
                           stream=script)
    capsys.readouterr()
    assert engine.wireframe != wf0
    engine.wireframe = wf0


def test_interactive_speed_digits(engine, tmp_path, capsys):
    active, slots = checkpoint.default_state()
    cam = _cam()
    p0 = cam.position.copy()
    driver.run_interactive(engine, cam, slots, W, H, str(tmp_path),
                           stream=io.StringIO("1 w\nq\n"))
    capsys.readouterr()
    d_slow = np.linalg.norm(cam.position - p0)
    cam2 = _cam()
    driver.run_interactive(engine, cam2, slots, W, H, str(tmp_path),
                           stream=io.StringIO("5 w\nq\n"))
    capsys.readouterr()
    d_fast = np.linalg.norm(cam2.position - p0)
    np.testing.assert_allclose(d_fast / d_slow, 1e4, rtol=1e-6)


def test_driver_save_slot_flag(tmp_path, monkeypatch, capsys):
    """--save-slot stores the session camera into the checkpoint (the
    shift+F analogue closing the persistence loop, main.cpp:958-975 +
    1118-1138)."""
    save = str(tmp_path / "save.npz")
    driver.main(["--frames", "1", "--width", "48", "--height", "36",
                 "--out", str(tmp_path / "frames"), "--save", save,
                 "--altitude", "250000", "--save-slot", "7", "--no-pallas"])
    capsys.readouterr()
    active, slots = checkpoint.load(save)
    np.testing.assert_array_equal(slots[7].position, active.position)
    assert np.linalg.norm(active.position) > 6371000.0
