"""Train-mode BatchNorm parity vs torch + train-step integration.

VERDICT.md Weak #6: round-1 training used frozen BN (running stats never
updated). These tests pin the replacement:
  * two-step batch-stat + EMA parity against torch.nn.BatchNorm1d
    (torch semantics: biased variance in the forward, unbiased in the
    running update, momentum 0.1);
  * make_train_step actually updates every BN dict of real victims
    (catches models that rebuild param dicts and would break the
    id-based record matching).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from hitadv_tpu.nn import functional as nnF
from hitadv_tpu.train import _bn_paths, make_train_step

torch = pytest.importorskip("torch")


class TestBNTorchParity:
    def test_two_step_stats_and_outputs(self, rng):
        C, B, N, m = 6, 4, 17, 0.1
        tbn = torch.nn.BatchNorm1d(C, momentum=m).train()
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(
                rng.rand(C).astype(np.float32) + 0.5))
            tbn.bias.copy_(torch.from_numpy(
                rng.randn(C).astype(np.float32)))

        p = nnF.batchnorm_init(C)
        p["scale"] = jnp.asarray(tbn.weight.detach().numpy())
        p["bias"] = jnp.asarray(tbn.bias.detach().numpy())

        for step in range(2):
            x = rng.randn(B, N, C).astype(np.float32) * (step + 1.0)
            want = tbn(torch.from_numpy(
                np.swapaxes(x, 1, 2).copy())).detach().numpy()

            records = []
            with nnF.bn_training(records):
                got = nnF.batchnorm(p, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(got),
                                       np.swapaxes(want, 1, 2), atol=1e-5)
            assert len(records) == 1
            _, bm, bv = records[0]
            p["mean"] = (1 - m) * p["mean"] + m * bm
            p["var"] = (1 - m) * p["var"] + m * bv

        np.testing.assert_allclose(np.asarray(p["mean"]),
                                   tbn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(p["var"]),
                                   tbn.running_var.numpy(), atol=1e-5)

    def test_eval_mode_unchanged_outside_context(self, rng):
        p = nnF.batchnorm_init(3)
        p["mean"] = jnp.asarray([1.0, 2.0, 3.0])
        x = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
        y = nnF.batchnorm(p, x)
        want = (np.asarray(x) - np.asarray(p["mean"])) / np.sqrt(1 + 1e-5)
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


class TestTrainStepBN:
    @pytest.mark.parametrize("name,n_points", [("pointnet", 64),
                                               ("dgcnn", 64)])
    def test_every_bn_dict_updates(self, rng, name, n_points):
        from hitadv_tpu import models

        init, apply = models.get_model(name)
        params = init(jax.random.PRNGKey(0))
        n_bn = len(_bn_paths(params))
        assert n_bn > 0

        optimizer = optax.adam(1e-3)
        step = make_train_step(apply, optimizer)
        x = jnp.asarray(rng.randn(4, n_points, 3).astype(np.float32) * .5)
        y = jnp.asarray(rng.randint(0, 40, size=(4,)))
        new_params, _, loss, _ = step(params, optimizer.init(params), x, y)
        assert np.isfinite(float(loss))

        old_stats = {p: v for p, v in _flat_bn_stats(params)}
        changed = [p for p, v in _flat_bn_stats(new_params)
                   if not np.allclose(v, old_stats[p])]
        # every BN dict must have at least its var EMA moved
        changed_dicts = {p.rsplit("/", 1)[0] for p in changed}
        all_dicts = {p.rsplit("/", 1)[0] for p in old_stats}
        assert changed_dicts == all_dicts, (
            sorted(all_dicts - changed_dicts))

    def test_frozen_bn_flag_keeps_stats(self, rng):
        from hitadv_tpu import models

        init, apply = models.get_model("pointnet")
        params = init(jax.random.PRNGKey(0))
        optimizer = optax.adam(1e-3)
        step = make_train_step(apply, optimizer, frozen_bn=True)
        x = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32) * .5)
        y = jnp.asarray(rng.randint(0, 40, size=(2,)))
        new_params, _, _, _ = step(params, optimizer.init(params), x, y)
        for (p, old), (_, new) in zip(_flat_bn_stats(params),
                                      _flat_bn_stats(new_params)):
            np.testing.assert_array_equal(old, new, err_msg=p)


def _flat_bn_stats(params, prefix=""):
    out = []
    if isinstance(params, dict):
        if set(params.keys()) == {"scale", "bias", "mean", "var"}:
            out.append((prefix + "/mean", np.asarray(params["mean"])))
            out.append((prefix + "/var", np.asarray(params["var"])))
        else:
            # jax pytree ops re-create dicts with sorted keys; iterate
            # sorted so lists from before/after trees align
            for k in sorted(params, key=str):
                out.extend(_flat_bn_stats(params[k],
                                          prefix + "/" + str(k)))
    return out
