import os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")
import __graft_entry__ as ge
fn, args = ge.entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry OK:", [getattr(o, 'shape', None) for o in out])
ge.dryrun_multichip(8)
print("dryrun_multichip(8) OK")
