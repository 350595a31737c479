import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from hitadv_tpu.ops import set_backend
from hitadv_tpu.models import pct

rng = np.random.default_rng(0)
pctp = pct.init(jax.random.PRNGKey(3), num_classes=40)
x3 = jnp.asarray(rng.uniform(size=(2, 700, 3)), jnp.float32)

def pct_loss(x):
    return jnp.sum(pct.apply(pctp, x) ** 2)

res = {}
for be in ("pallas", "xla"):
    set_backend(be)
    v, g = jax.jit(jax.value_and_grad(pct_loss))(x3)
    res[be] = (float(v), np.asarray(g))
set_backend("auto")
rel = abs(res["pallas"][0] - res["xla"][0]) / (abs(res["xla"][0]) + 1e-9)
gd = (np.linalg.norm(res["pallas"][1] - res["xla"][1])
      / (np.linalg.norm(res["xla"][1]) + 1e-9))
print(f"CPU interpret: rel={rel:.1e} gradL2={gd:.1e}")
