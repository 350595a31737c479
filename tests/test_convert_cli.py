"""Checkpoint converter CLI test: torch .checkpoint file -> pytree."""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

REFERENCE = "/root/reference"
HAS_REFERENCE = os.path.isdir(os.path.join(REFERENCE, "model"))


@pytest.mark.skipif(not HAS_REFERENCE, reason="reference not mounted")
class TestConvertCLI:
    def test_convert_pointnet_checkpoint(self, tmp_path):
        import torch

        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from model.pointnet_cls import get_model

        torch.manual_seed(3)
        m = get_model(40, normal_channel=False).eval()
        src = str(tmp_path / "PN_NT.checkpoint")
        # the reference's wrapper convention (`eval.py:79,123`)
        torch.save({"model_state_dict": m.state_dict()}, src)

        dst = str(tmp_path / "pn.pkl")
        from hitadv_tpu.convert import main

        main(["--model", "pointnet", "--src", src, "--dst", dst])
        assert os.path.exists(dst)

        # loaded params match the torch model's logits
        from hitadv_tpu.models import pointnet
        from hitadv_tpu.utils import checkpoint as ckpt

        params = ckpt.load_params(dst)
        rng = np.random.RandomState(0)
        x = rng.randn(2, 128, 3).astype(np.float32) * 0.5
        with torch.no_grad():
            want, _ = m(torch.from_numpy(np.swapaxes(x, 1, 2).copy()))
        got = pointnet.apply(params, jnp.array(x))
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   atol=2e-4)

    def test_convert_with_last_wrapper(self, tmp_path):
        import torch

        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from model.pointnet_cls import get_model

        m = get_model(40, normal_channel=False).eval()
        src = str(tmp_path / "last.checkpoint")
        torch.save({"last": m.state_dict()}, src)
        from hitadv_tpu.convert import main

        main(["--model", "pointnet", "--src", src,
              "--dst", str(tmp_path / "out.pkl")])
