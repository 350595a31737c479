"""PointNet forward parity + checkpoint conversion tests.

Logit-parity (SURVEY.md §4 level c): build the *reference* torch model on
CPU with randomized weights/BN stats, convert its state_dict through
`utils.checkpoint`, and require logits to match to float tolerance.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.models import pointnet
from hitadv_tpu.utils import checkpoint as ckpt

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "model"))


def _randomized_torch_pointnet(seed=0, normal_channel=False):
    import torch

    sys.path.insert(0, REFERENCE)
    from model.pointnet_cls import get_model

    torch.manual_seed(seed)
    m = get_model(40, normal_channel=normal_channel).eval()
    # randomize BN running stats so conversion errors can't hide
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    return m


class TestPointNetParity:
    @pytest.mark.skipif(not HAS_REFERENCE, reason="reference not mounted")
    @pytest.mark.parametrize("normal_channel", [False, True])
    def test_logit_parity_random_weights(self, rng, normal_channel):
        import torch

        m = _randomized_torch_pointnet(normal_channel=normal_channel)
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
        params = ckpt.convert_state_dict(sd, pointnet.TORCH_SPEC)

        C = 6 if normal_channel else 3
        x = rng.randn(4, 256, C).astype(np.float32) * 0.5
        with torch.no_grad():
            want, want_trans = m(torch.from_numpy(
                np.swapaxes(x, 1, 2).copy()))
        out = pointnet.apply_full(params, jnp.array(x))
        np.testing.assert_allclose(np.asarray(out.logits),
                                   want.numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out.trans_feat),
                                   want_trans.numpy(), atol=2e-4)

    def test_apply_shapes(self, rng):
        params = pointnet.init(jax.random.PRNGKey(0))
        x = jnp.array(rng.randn(2, 128, 3).astype(np.float32))
        out = pointnet.apply_full(params, x)
        assert out.logits.shape == (2, 40)
        assert out.trans_feat.shape == (2, 64, 64)
        assert len(out.features) == 8
        assert np.isfinite(np.asarray(out.logits)).all()

    def test_grad_wrt_input(self, rng):
        params = pointnet.init(jax.random.PRNGKey(0))
        x = jnp.array(rng.randn(2, 128, 3).astype(np.float32))

        def loss(x):
            return jnp.sum(pointnet.apply(params, x))

        g = jax.grad(loss)(x)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_permutation_invariance(self, rng):
        # max-pool architecture must be point-permutation invariant
        params = pointnet.init(jax.random.PRNGKey(0))
        x = rng.randn(1, 64, 3).astype(np.float32)
        perm = rng.permutation(64)
        l1 = np.asarray(pointnet.apply(params, jnp.array(x)))
        l2 = np.asarray(pointnet.apply(params, jnp.array(x[:, perm])))
        np.testing.assert_allclose(l1, l2, atol=1e-4)

    def test_save_load_roundtrip(self, tmp_path, rng):
        params = pointnet.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "pn.pkl")
        ckpt.save_params(path, params)
        loaded = ckpt.load_params(path)
        x = jnp.array(rng.randn(1, 64, 3).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(pointnet.apply(params, x)),
            np.asarray(pointnet.apply(loaded, x)), atol=1e-6)
