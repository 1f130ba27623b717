"""Golden-freshness gate (SURVEY.md section 4.1).

All parity tests rest on the committed `tests/goldens/*.npy` files. This
test closes the drift hole: it rebuilds the C++ oracle from source with the
local toolchain, regenerates every golden into a temp dir, and asserts
byte-equality with the committed set — so a silent edit to either
`native/oracle_main.cpp` or a committed golden fails CI in both directions.

Cheap by construction (oracle builds in ~2 s, runs in ~0.2 s), so it stays
in the fast tier.
"""

import pathlib
import shutil
import subprocess

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]
NATIVE = ROOT / "native"
GOLDENS = ROOT / "tests" / "goldens"


@pytest.mark.skipif(shutil.which("g++") is None and shutil.which("c++") is None,
                    reason="no C++ compiler on this box")
def test_goldens_match_fresh_oracle(tmp_path):
    build = tmp_path / "build"
    build.mkdir()
    cxx = shutil.which("g++") or shutil.which("c++")
    subprocess.run(
        [cxx, "-O2", "-Wall", "-o", str(build / "oracle"),
         str(NATIVE / "oracle_main.cpp")],
        check=True, capture_output=True, text=True)
    out = tmp_path / "goldens"
    out.mkdir()
    subprocess.run([str(build / "oracle"), str(out)], check=True,
                   capture_output=True, text=True)

    fresh = sorted(p.name for p in out.glob("*.npy"))
    committed = sorted(p.name for p in GOLDENS.glob("*.npy"))
    assert fresh == committed, (
        f"golden set drift: fresh-only={set(fresh) - set(committed)}, "
        f"committed-only={set(committed) - set(fresh)}")
    stale = [n for n in fresh
             if (out / n).read_bytes() != (GOLDENS / n).read_bytes()]
    assert not stale, (
        f"committed goldens differ from a fresh oracle build: {stale} — "
        "regenerate with `cd native && make goldens` (and review the "
        "oracle diff that caused it)")
