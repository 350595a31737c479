"""bf16 compute-dtype mode tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.models import pointnet
from hitadv_tpu.nn import functional as F


@pytest.fixture(autouse=True)
def reset_dtype():
    yield
    F.set_compute_dtype(None)


class TestBF16Mode:
    def test_logits_close_and_argmax_stable(self, rng):
        params = pointnet.init(jax.random.PRNGKey(0))
        x = jnp.array(rng.randn(4, 256, 3).astype(np.float32) * 0.5)
        l32 = np.asarray(pointnet.apply(params, x))
        F.set_compute_dtype(jnp.bfloat16)
        lbf = np.asarray(pointnet.apply(params, x)).astype(np.float32)
        assert np.abs(l32 - lbf).max() < 0.15
        np.testing.assert_array_equal(l32.argmax(-1), lbf.argmax(-1))

    def test_grad_finite_under_bf16(self, rng):
        params = pointnet.init(jax.random.PRNGKey(0))
        x = jnp.array(rng.randn(2, 128, 3).astype(np.float32))
        F.set_compute_dtype(jnp.bfloat16)
        g = jax.grad(lambda x: jnp.sum(
            pointnet.apply(params, x).astype(jnp.float32)))(x)
        assert np.isfinite(np.asarray(g)).all()
        # gradients w.r.t. input stay f32 (input isn't cast)
        assert g.dtype == jnp.float32

    def test_margin_loss_f32_under_bf16_logits(self, rng):
        from hitadv_tpu.losses import untargeted_logits_adv_loss

        logits = jnp.array(rng.randn(4, 40).astype(np.float32))
        targets = jnp.zeros(4, jnp.int32)
        l_f32 = untargeted_logits_adv_loss(logits, targets, 30.0)
        l_bf = untargeted_logits_adv_loss(logits.astype(jnp.bfloat16),
                                          targets, 30.0)
        assert l_bf.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(l_f32), np.asarray(l_bf),
                                   atol=0.2)
