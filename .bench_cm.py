import time, sys, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _VOCE_PROPS
from exaconstit_tpu.config.options import ExaOptions, MechType, SlipType, XtalType
from exaconstit_tpu.models.ecmech import build_model

print("devices:", jax.devices())
opt = ExaOptions(); opt.mech_type = MechType.EXACMECH
opt.xtal_type = XtalType.FCC; opt.slip_type = SlipType.POWERVOCE
m = build_model(opt, _VOCE_PROPS)
N = 32768
rng = np.random.default_rng(0)
q = rng.normal(size=(N,4)); q /= np.linalg.norm(q,axis=1,keepdims=True)
state0 = jnp.asarray(m.init_state(q))
L = np.zeros((N,3,3)); L[:,2,2]=1e-3; L[:,0,0]=L[:,1,1]=-0.5e-3
L += rng.normal(size=(N,3,3))*1e-4
L = jnp.asarray(L)

def bench(m, tag, tangent):
    st = state0
    f = jax.jit(lambda s: m.model_setup(0.05, L, s, compute_tangent=tangent))
    # develop flow
    for _ in range(3):
        _, st, _ = f(st)
    jax.block_until_ready(st)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = f(st); jax.block_until_ready(out[0])
    el = (time.perf_counter()-t0)/reps
    print(f"{tag:28s} tangent={tangent!s:5s} {el*1e3:8.1f} ms  {N/el/1e3:8.1f}k pts/s")

for engine in ("vmap", "cm"):
    mm = dataclasses.replace(m, evptn=dataclasses.replace(m.evptn, engine=engine))
    bench(mm, f"engine={engine}", False)
    bench(mm, f"engine={engine}", True)
