import sys; sys.path.insert(0, "/root/repo")
import jax
from __graft_entry__ import entry, dryrun_multichip
fn, args = entry()
out = jax.jit(fn)(*args)
jax.block_until_ready(out)
print("entry OK")
