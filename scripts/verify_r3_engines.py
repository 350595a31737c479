"""TPU verification of the round-3 attack-engine changes.

Drives the changed engines (AOF ae_untargeted loss, AdvPC untargeted
stale bookkeeping, Add_Objects pre-step fallback, TAOF clip gating,
sat_forward) through the PUBLIC API on the real chip, user-style:
tiny shapes, full jitted attack programs, finite/shape/sense checks.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)

from hitadv_tpu import attacks, losses  # noqa: E402
from hitadv_tpu.attacks import base  # noqa: E402
from hitadv_tpu.models import autoencoder, pointnet  # noqa: E402

B, N = 4, 64
params = pointnet.init(jax.random.PRNGKey(0))
logits_fn = lambda p: pointnet.apply(params, p)  # noqa: E731
x = jnp.asarray(np.random.RandomState(0)
                .randn(B, N, 3).astype(np.float32) * 0.5)
labels = jnp.argmax(logits_fn(x), axis=-1).astype(jnp.int32)
key = jax.random.PRNGKey(1)
clip = lambda a, o: losses.clip_points_linf(a, o, 0.18)  # noqa: E731

ae_params = autoencoder.init(jax.random.PRNGKey(2), num_points=N)
ae_fn = lambda p: autoencoder.apply(ae_params, p)  # noqa: E731


def check(name, res, n_expected=N):
    adv = np.asarray(res.adv_points)
    assert np.isfinite(adv).all(), f"{name}: non-finite adv"
    assert adv.shape[0] == B and adv.shape[2] == 3, f"{name}: {adv.shape}"
    s = int(np.asarray(res.success).sum())
    print(f"{name}: adv {adv.shape}, success {s}/{B}  OK", flush=True)


t0 = time.time()

# UAEAOF: AE term now in the loss (the round-3 fix)
aof_cfg = attacks.AOFConfig(binary_step=1, num_iter=4, low_pass=10,
                            gamma=0.25, mode="ae_untargeted")
atk = attacks.make_aof(logits_fn,
                       base.make_adv_fn("logits", 0.0, targeted=False),
                       clip, aof_cfg, ae_fn=ae_fn)
check("uaeaof", atk(x, labels, key))

# TAOF: targeted mode, final clip skipped
taof_cfg = attacks.AOFConfig(binary_step=1, num_iter=4, low_pass=10,
                             mode="targeted")
atk = attacks.make_aof(logits_fn,
                       base.make_adv_fn("logits", 0.0, targeted=True),
                       clip, taof_cfg)
check("taof", atk(x, (labels + 3) % 40, key, y_truth=labels))

# UAdvPC: stale bookkeeping path
atk = attacks.make_advpc(
    logits_fn, ae_fn, base.make_adv_fn("logits", 0.0, targeted=False),
    clip, attacks.AdvPCConfig(binary_step=2, num_iter=4, targeted=False))
check("uadvpc", atk(x, labels, key))

# Add-Objects: pre-step fallback carry
atk = attacks.make_cw_add_objects(
    logits_fn, base.make_adv_fn("logits", 1.0, targeted=True),
    cfg=attacks.AddObjectConfig(binary_step=2, num_iter=4, num_add=2,
                                obj_num_p=16, num_cri=32))
check("add-object", atk(x, (labels + 5) % 40, key))

# sat_forward
sat = attacks.drop.make_sat_forward(
    logits_fn, 0.08, attacks.DropConfig(num_drop=10))
adv_pc, del_pc = sat(x, labels)
assert np.isfinite(np.asarray(adv_pc)).all()
assert adv_pc.shape == (B, N, 3) and del_pc.shape == (B, N - 10, 3)
print("sat_forward: OK", flush=True)

# grad through the changed AE loss (value+finite)
def ae_loss(pts):
    lg = logits_fn(ae_fn(pts))
    return jnp.mean(base.make_adv_fn("logits", 0.0, targeted=False)(
        lg, labels))

g = jax.jit(jax.grad(ae_loss))(x)
assert np.isfinite(np.asarray(g)).all()
print("ae-loss grad: OK", flush=True)

print(f"ALL OK in {time.time() - t0:.1f}s", flush=True)
sys.exit(0)
