"""Resumable eval sweeps + extra dataset loaders."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu.attacks import base, fgm
from hitadv_tpu.data import synthetic_batches
from hitadv_tpu.evaluation import eval_asr
from hitadv_tpu.models import pointnet
from hitadv_tpu.utils import EvalProgress


@pytest.fixture(scope="module")
def victim():
    params = pointnet.init(jax.random.PRNGKey(42))
    return lambda x: pointnet.apply(params, x)


class TestEvalResume:
    def test_resume_matches_uninterrupted(self, victim, tmp_path):
        attack = fgm.make_ifgsm(victim, base.make_adv_fn("cross_entropy"),
                                fgm.FGMConfig(budget=0.2, num_iter=3))

        def attack6(points, labels, key):
            return attack(points[..., :3], labels, key)

        def batches():
            return synthetic_batches(4, 4, num_points=128, seed=30)

        want = eval_asr(victim, attack6, batches(), uniform_k=2,
                        verbose=False)

        # interrupted run: process only 2 batches, then resume
        path = str(tmp_path / "prog.pkl")
        prog = EvalProgress(path)
        import itertools
        eval_asr(victim, attack6, itertools.islice(batches(), 2),
                 uniform_k=2, verbose=False, progress=prog)
        prog2 = EvalProgress(path)
        assert prog2.next_batch == 2
        got = eval_asr(victim, attack6, batches(), uniform_k=2,
                       verbose=False, progress=prog2)
        for k in ("asr", "knn_dist", "uniform_dist", "curv_std_dist",
                  "total"):
            assert got[k] == pytest.approx(want[k], abs=1e-9), k


class TestExtraH5:
    @pytest.fixture
    def partseg_dir(self, tmp_path, rng):
        import h5py

        d = tmp_path / "partseg"
        d.mkdir()
        with h5py.File(d / "ply_data_test0.h5", "w") as f:
            f["data"] = rng.randn(6, 256, 3).astype("float32")
            f["label"] = rng.randint(0, 16, (6, 1)).astype("int64")
            f["pid"] = rng.randint(0, 50, (6, 256)).astype("int64")
        return str(d)

    def test_shapenet_part_h5(self, partseg_dir):
        from hitadv_tpu.data import ShapeNetPartH5

        ds = ShapeNetPartH5(partseg_dir, num_points=128)
        assert len(ds) == 6
        pc, label, seg = ds[0]
        assert pc.shape == (128, 3)
        assert seg.shape == (128,)
        assert 0 <= label < 16

    def test_class_choice_filters(self, partseg_dir):
        from hitadv_tpu.data import ShapeNetPartH5
        import numpy as np

        ds_all = ShapeNetPartH5(partseg_dir, num_points=64)
        some_label = int(ds_all.label[0])
        name = [k for k, v in
                __import__("hitadv_tpu.data.extra_h5",
                           fromlist=["SHAPENET_CAT2ID"])
                .SHAPENET_CAT2ID.items() if v == some_label][0]
        ds = ShapeNetPartH5(partseg_dir, num_points=64,
                            class_choice=name)
        assert (ds.label == some_label).all()
        assert len(ds) >= 1
