import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_enable_x64", True)
import sys; sys.path.insert(0, "/root/repo/tests")
from test_evptn_cm import make_model, rand_inputs
from exaconstit_tpu.models import evptn_cm as CM

model = make_model(mixed_precision=True)
n = 4
d, w, e, q, h = rand_inputs(n, seed=7)
dt = 0.1
Dsm = CM.vecd_to_mat_cm(d.T)
f32 = jnp.float32
dt_sub = jnp.full((n,), dt)
args32 = (h.T.astype(f32), dt_sub.astype(f32), Dsm.astype(f32),
          w.T.astype(f32), e.T.astype(f32), q.T.astype(f32))
x0 = jnp.concatenate([e.T, jnp.zeros((3, n))]).astype(f32)
r, J = CM.residual_and_jac_cm(model, x0, *args32[0:1], args32[1], args32[2], args32[3], args32[4], args32[5], 298.0)
print("r dtype:", r.dtype, "J dtype:", J.dtype)
p = CM.solve_dense_cm(J, r)
print("p dtype:", p.dtype)
