"""Config-5 composite: turn the v5e-8 projection into a MEASUREMENT
(VERDICT r4 #4).

Runs `field_cube_strip` (the per-chip v5e-8 shard program) at all 8 row
offsets SEQUENTIALLY on the one real chip, compares each strip's heights
and shade bitwise ON DEVICE against the corresponding rows of the
monolithic `field_cube(8192)` program (no 3.2 GB tunnel fetch), and
reports per-strip slope times plus an XOR-reduce checksum of the
assembled field. Zero mismatches proves the 8 strips tile the full field
bit-exactly — including the in-kernel halo-recompute rows at every strip
seam — so the projected v5e-8 aggregate is the measured per-chip strip
time plus nothing but the face-edge ring psum (docs/multislice.md).

Usage: python tools/bench_config5_composite.py [n] [n_chips] [block_rows]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from planet_tpu.ops.kernels import field_pallas

n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
n_chips = int(sys.argv[2]) if len(sys.argv) > 2 else 8
br = int(sys.argv[3]) if len(sys.argv) > 3 else 256
radius = 6.371e6
rows = n // n_chips


@jax.jit
def mono():
    return field_pallas.field_cube(n, radius, block_rows=br)


@jax.jit
def strip(row0):
    return field_pallas.field_cube_strip(n, radius, row0, rows,
                                         block_rows=br)


@jax.jit
def strip_timed(row0, tick):
    """Timing twin: sum-reduced output (no 400 MB materialization per
    queued call) with a traced tick INSIDE the jit so every dispatch has
    distinct args — the axon tunnel dedupes identical (executable, args)
    dispatches and would otherwise time nothing (see bench_config5_field's
    slope note). tick*0.0 is NaN-propagating, not algebraically removable."""
    h, s = field_pallas.field_cube_strip(n, radius, row0, rows,
                                         block_rows=br)
    h = h + tick * jnp.float32(0.0)
    return jnp.sum(h, dtype=jnp.float32) + jnp.sum(s, dtype=jnp.float32)


@jax.jit
def compare(sh, ss, mh_slice, ms_slice):
    """Bitwise mismatch count + XOR checksum of the strip, on device."""
    shb = jax.lax.bitcast_convert_type(sh, jnp.uint32)
    ssb = jax.lax.bitcast_convert_type(ss, jnp.uint32)
    mhb = jax.lax.bitcast_convert_type(mh_slice, jnp.uint32)
    msb = jax.lax.bitcast_convert_type(ms_slice, jnp.uint32)
    bad = (jnp.sum((shb != mhb).astype(jnp.int32))
           + jnp.sum((ssb != msb).astype(jnp.int32)))
    # XOR-reduce is order-independent and exact: the assembled-field hash
    # is the XOR of the strip hashes.
    h = jax.lax.reduce(shb ^ ssb, jnp.uint32(0), jax.lax.bitwise_xor, (0, 1, 2))
    return bad, h


def slope_one(r0):
    """Queue-depth slope (cancels tunnel latency); distinct ticks per
    dispatch defeat dedupe."""
    tick = [0]

    def call():
        tick[0] += 1
        return strip_timed(jnp.int32(r0), jnp.float32(tick[0]))

    jax.block_until_ready(call())
    walls = []
    for q in (3, 9):
        t0 = time.perf_counter()
        outs = [call() for _ in range(q)]
        jax.block_until_ready(outs)
        walls.append(time.perf_counter() - t0)
    return (walls[1] - walls[0]) / 6


def main():
    t0 = time.perf_counter()
    mh, ms = mono()
    jax.block_until_ready((mh, ms))
    print(f"monolithic 6x{n}^2 materialized in {time.perf_counter()-t0:.1f} s "
          "(compile + 1 dispatch)")

    total_bad = 0
    hash_acc = np.uint32(0)
    strip_ms = []
    for k in range(n_chips):
        r0 = k * rows
        sh, ss = strip(jnp.int32(r0))
        bad, h = compare(sh, ss, jax.lax.dynamic_slice_in_dim(mh, r0, rows, 1),
                         jax.lax.dynamic_slice_in_dim(ms, r0, rows, 1))
        bad = int(bad)
        total_bad += bad
        hash_acc ^= np.uint32(h)
        dt = slope_one(r0)
        strip_ms.append(dt * 1e3)
        print(f"  strip {k} rows [{r0}, {r0+rows}): {dt*1e3:7.2f} ms  "
              f"mismatches={bad}")

    # note: hash_acc is XOR of (strip ^ mono) checksums == 0 iff every
    # word matched; also record the assembled-field content hash
    @jax.jit
    def content_hash(x):
        xb = jax.lax.bitcast_convert_type(x, jnp.uint32)
        return jax.lax.reduce(xb, jnp.uint32(0), jax.lax.bitwise_xor,
                              (0, 1, 2))
    field_hash = int(content_hash(mh))

    result = {
        "n": n, "n_chips": n_chips,
        "strip_ms": [round(v, 2) for v in strip_ms],
        "strip_ms_max": round(max(strip_ms), 2),
        "mismatch_total": total_bad,
        "diff_xor": int(hash_acc),
        "field_xor_hash": f"0x{field_hash:08x}",
        "bitwise_equal": total_bad == 0 and int(hash_acc) == 0,
    }
    print(json.dumps({"config5_composite": result}))
    out = pathlib.Path(__file__).resolve().parents[1] / "benchmarks" \
        / "config5_composite.json"
    out.write_text(json.dumps(result, indent=1) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
