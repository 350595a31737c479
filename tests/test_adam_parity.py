"""Functional Adam vs torch.optim.Adam parity (underpins every attack)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hitadv_tpu.attacks.base import adam_init, adam_update


class TestAdamParity:
    @pytest.mark.parametrize("lr", [1e-2, 5e-2])
    def test_matches_torch_on_quadratic(self, rng, lr):
        import torch

        x0 = rng.randn(4, 3).astype(np.float32)
        target = rng.randn(4, 3).astype(np.float32)

        # torch trajectory
        xt = torch.tensor(x0, requires_grad=True)
        tt = torch.tensor(target)
        opt = torch.optim.Adam([xt], lr=lr, weight_decay=0.0)
        torch_traj = []
        for _ in range(25):
            opt.zero_grad()
            loss = torch.sum((xt - tt) ** 2) + torch.sum(xt ** 3) * 0.1
            loss.backward()
            opt.step()
            torch_traj.append(xt.detach().numpy().copy())

        # ours
        xj = jnp.array(x0)
        tj = jnp.array(target)
        state = adam_init(xj)
        for i in range(25):
            grad = 2 * (xj - tj) + 0.3 * xj ** 2
            xj, state = adam_update(grad, state, xj, lr)
            np.testing.assert_allclose(np.asarray(xj), torch_traj[i],
                                       atol=1e-5,
                                       err_msg=f"step {i}")

    def test_per_group_lr_independent_state(self, rng):
        # two variables with different lrs behave as separate groups
        a = jnp.array(rng.randn(3).astype(np.float32))
        b = jnp.array(rng.randn(3).astype(np.float32))
        sa, sb = adam_init(a), adam_init(b)
        ga, gb = jnp.ones(3), jnp.ones(3)
        a1, sa = adam_update(ga, sa, a, 5e-2)
        b1, sb = adam_update(gb, sb, b, 3e-2)
        # first Adam step size equals lr regardless of grad scale
        np.testing.assert_allclose(np.asarray(a - a1), 5e-2, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(b - b1), 3e-2, rtol=1e-4)
