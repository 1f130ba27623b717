"""Span-kernel cost attribution via device traces (round 5).

Wall-clock micro-timings through the axon tunnel are unreliable: repeated
dispatches dedupe/cache even with perturbed inputs (microbench_span3.py
measured ~0 ns/rec slopes). This bench traces each kernel config with
jax.profiler and reads the Pallas custom-call durations straight from the
xplane — deduped calls simply don't appear, and device time is exact.

Prints ns/record for body variants that attribute the per-record cost:
  full        exact _one_triangle body (scalar reads + math + RMW)
  noshade     drop normal interp + nlen/ndl/shade (~28 vec ops, 12 reads)
  fewscalar   full vector math, but only ~8 scalar reads (rest reused)
  rmw_only    dynamic-window load/min/store only
  empty       per-record nothing (grid + SMEM block DMA + skip test)
"""
import sys, glob, pathlib, tempfile
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
from tools.microbench_span3 import run, fresh_fbs
from tools.microbench_span import make_records


def device_ms(outdir, match="run"):
    """Sum (duration, count) of custom-call events whose name matches."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    tot_ps, cnt = 0, 0
    for fn in glob.glob(outdir + "/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fn, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    nm = ev_meta.get(ev.metadata_id, "")
                    if "custom-call" in nm and match in nm:
                        tot_ps += ev.duration_ps
                        cnt += 1
    return tot_ps / 1e9, cnt


def bench(tag, winh, body, tri_block=16, cap=32768, bw=14, n=8):
    recs = []
    base = np.asarray(make_records(cap, winh, bw=bw))
    for i in range(n):
        m = base.copy()
        m[:cap, 15] += np.float32(1e-6 * (i + 1))   # unique content
        recs.append(jnp.asarray(m))
    fbs = fresh_fbs(n + 2)
    o = run(recs[0], fbs[n], winh=winh, cap=cap, tri_block=tri_block,
            body=body)
    jax.block_until_ready(o)
    outdir = tempfile.mkdtemp(prefix="span4_")
    with jax.profiler.trace(outdir):
        outs = [run(recs[i], fbs[i], winh=winh, cap=cap,
                    tri_block=tri_block, body=body) for i in range(n)]
        jax.block_until_ready(outs)
    ms, cnt = device_ms(outdir)
    if cnt == 0:
        print(f"{tag:46s}  NO EVENTS (all deduped?)")
        return
    per_call = ms / cnt
    print(f"{tag:46s} {per_call:7.3f} ms/call {per_call*1e6/cap:7.1f} "
          f"ns/rec  ({cnt} calls)", flush=True)


if __name__ == "__main__":
    for body in ("full", "noshade", "fewscalar", "rmw_only", "empty"):
        bench(f"span1 {body:10s} TRI_BLOCK=16", 8, body)
    for tb in (8, 32, 64):
        bench(f"span1 full       TRI_BLOCK={tb}", 8, "full", tri_block=tb)
    bench("span2 full       TRI_BLOCK=16", 16, "full")
    bench("span2 noshade    TRI_BLOCK=16", 16, "noshade")
    bench("span3 full       TRI_BLOCK=16", 24, "full")
    bench("span1 full bw64  TRI_BLOCK=16", 8, "full", bw=64)
