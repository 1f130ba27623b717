"""Trace-based microbench of the REAL _run_class kernel (round 5).

microbench_span4 measures body variants of a standalone kernel copy; this
one times planet_tpu.raster.coverage_pallas._run_class itself (with the
per-block flag inputs) via xplane custom-call durations — dedupe-proof,
exact device time. Compare against span4's `full` rows to verify the
block-flag skip change (VERDICT r5 #1).

Usage: python tools/microbench_span5.py [cap] [live_frac]
"""
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp

from planet_tpu.raster import coverage_pallas as cp
from tools.microbench_span import make_records
from tools.microbench_span3 import fresh_fbs
from tools.microbench_span4 import device_ms

WPAD, HPAD = 1920, 1088


def bench(tag, winh, cap=32768, bw=14, live_frac=1.0, n=8):
    k = int(cap * live_frac)
    base = np.asarray(make_records(k, winh, bw=bw, cap=cap))
    recs = []
    for i in range(n):
        m = base.copy()
        m[:k, 15] += np.float32(1e-6 * (i + 1))
        recs.append(jnp.asarray(m))
    fbs = fresh_fbs(n + 1)
    run = lambda r, f: cp._run_class(r, f, winh=winh, cap=cap,
                                     width_pad=WPAD, height_pad=HPAD)
    jax.block_until_ready(run(recs[0], fbs[n]))
    outdir = tempfile.mkdtemp(prefix="span5_")
    with jax.profiler.trace(outdir):
        outs = [run(recs[i], fbs[i]) for i in range(n)]
        jax.block_until_ready(outs)
    ms, cnt = device_ms(outdir)
    if cnt == 0:
        print(f"{tag:44s}  NO EVENTS")
        return
    per = ms / cnt
    print(f"{tag:44s} {per:7.3f} ms/call {per*1e6/cap:7.1f} ns/rec "
          f"({cnt} calls)", flush=True)


if __name__ == "__main__":
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    lf = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    bench(f"real span1 flags live={lf}", 8, cap=cap, live_frac=lf)
    bench(f"real span2 flags live={lf}", 16, cap=cap, live_frac=lf)
    bench("real span1 flags live=0.5", 8, cap=cap, live_frac=0.5)
