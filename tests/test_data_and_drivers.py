"""Data layer + CLI driver tests."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hitadv_tpu import data
from hitadv_tpu.data import provider


class TestProvider:
    def test_normalize(self, rng):
        pc = rng.randn(2, 64, 3).astype(np.float32) * 5 + 3
        out = provider.normalize_data(pc)
        for b in range(2):
            np.testing.assert_allclose(out[b].mean(0), 0, atol=1e-5)
            assert abs(np.linalg.norm(out[b], axis=1).max() - 1) < 1e-5

    def test_rotations_preserve_norms(self, rng):
        pc = rng.randn(2, 64, 3).astype(np.float32)
        r = np.random.RandomState(0)
        for fn in (provider.rotate_point_cloud,
                   provider.rotate_point_cloud_z,
                   provider.rotate_perturbation_point_cloud):
            out = fn(pc, rng=r)
            np.testing.assert_allclose(np.linalg.norm(out, axis=-1),
                                       np.linalg.norm(pc, axis=-1),
                                       atol=1e-4)

    def test_rotate_with_normal_consistent(self, rng):
        pc = rng.randn(2, 64, 6).astype(np.float32)
        out = provider.rotate_point_cloud_with_normal(
            pc, rng=np.random.RandomState(1))
        # dot(xyz, normal) is rotation invariant
        dot_in = np.sum(pc[..., :3] * pc[..., 3:6], -1)
        dot_out = np.sum(out[..., :3] * out[..., 3:6], -1)
        np.testing.assert_allclose(dot_in, dot_out, atol=1e-4)

    def test_jitter_clip(self, rng):
        pc = np.zeros((1, 64, 3), np.float32)
        out = provider.jitter_point_cloud(pc, sigma=1.0, clip=0.05,
                                          rng=np.random.RandomState(0))
        assert np.abs(out).max() <= 0.05

    def test_dropout_replaces_with_first(self, rng):
        pc = rng.randn(1, 64, 3).astype(np.float32)
        out = provider.random_point_dropout(
            pc, rng=np.random.RandomState(3))
        changed = ~np.all(out[0] == pc[0], axis=1)
        if changed.any():
            np.testing.assert_array_equal(out[0][changed],
                                          np.tile(pc[0, 0],
                                                  (changed.sum(), 1)))

    def test_scale_and_shift_shapes(self, rng):
        pc = rng.randn(2, 32, 3).astype(np.float32)
        assert provider.random_scale_point_cloud(pc).shape == pc.shape
        assert provider.shift_point_cloud(pc).shape == pc.shape


class TestModelNetTxt:
    @pytest.fixture
    def fake_root(self, tmp_path, rng):
        root = tmp_path / "mn"
        root.mkdir()
        names = ["airplane", "chair"]
        (root / "modelnet40_shape_names.txt").write_text(
            "\n".join(names) + "\n")
        ids = []
        for name in names:
            (root / name).mkdir()
            for i in range(2):
                sid = f"{name}_{i:04d}"
                ids.append(sid)
                pts = rng.randn(2000, 6).astype(np.float32)
                np.savetxt(root / name / f"{sid}.txt", pts,
                           delimiter=",", fmt="%.6f")
        (root / "modelnet40_test.txt").write_text("\n".join(ids) + "\n")
        (root / "modelnet40_train.txt").write_text("")
        return str(root)

    def test_load_and_normalize(self, fake_root):
        ds = data.ModelNetDataset(fake_root, num_points=256,
                                  split="test", use_normals=True)
        assert len(ds) == 4
        pts, label = ds[0]
        assert pts.shape == (256, 6)
        assert label in (0, 1)
        # unit-sphere normalized xyz
        assert abs(np.linalg.norm(pts[:, :3], axis=1).max() - 1.0) < 1e-5

    def test_uniform_fps_mode(self, fake_root):
        ds = data.ModelNetDataset(fake_root, num_points=64, split="test",
                                  use_normals=False, uniform=True)
        pts, _ = ds[0]
        assert pts.shape == (64, 3)

    def test_process_data_cache(self, fake_root):
        ds1 = data.ModelNetDataset(fake_root, num_points=128,
                                   split="test", process_data=True)
        assert os.path.exists(ds1.save_path)
        ds2 = data.ModelNetDataset(fake_root, num_points=128,
                                   split="test", process_data=True)
        np.testing.assert_allclose(ds1[1][0], ds2[1][0])

    def test_batch_iterator_threaded(self, fake_root):
        ds = data.ModelNetDataset(fake_root, num_points=128,
                                  split="test")
        serial = list(data.batch_iterator(ds, 2))
        threaded = list(data.batch_iterator(ds, 2, num_workers=3))
        assert len(serial) == len(threaded) == 2
        for (p1, l1), (p2, l2) in zip(serial, threaded):
            np.testing.assert_allclose(p1, p2)
            np.testing.assert_array_equal(l1, l2)


class TestGeoA3Mat:
    @pytest.fixture
    def mat_file(self, tmp_path, rng):
        from scipy.io import savemat

        path = str(tmp_path / "geo.mat")
        savemat(path, {
            "data": rng.randn(5, 3, 64).astype(np.float32),
            "normal": rng.randn(5, 3, 64).astype(np.float32),
            "label": np.array([[17], [9], [3], [15], [20]]),
        })
        return path

    def test_all_mode_9_targets(self, mat_file):
        ds = data.GeoA3ModelNet40(mat_file, attack_label="All")
        pcs, normals, gts, targets = ds[0]
        assert pcs.shape == (9, 64, 3)
        assert len(targets) == 9
        assert 17 not in targets            # true label excluded
        assert (gts == 17).all()

    def test_untarget_mode(self, mat_file):
        ds = data.GeoA3ModelNet40(mat_file, attack_label="Untarget")
        pcs, normals, gts = ds[1]
        assert pcs.shape == (1, 64, 3)
        assert gts[0] == 9

    def test_random_mode_excludes_truth(self, mat_file):
        ds = data.GeoA3ModelNet40(mat_file, attack_label="Random")
        for i in range(5):
            out = ds[i]
            assert out[3][0] != out[2][0]

    def test_resample(self, mat_file):
        ds = data.GeoA3ModelNet40(mat_file, attack_label="Untarget",
                                  resample_num=32)
        pcs, _, _ = ds[0]
        assert pcs.shape == (1, 32, 3)


class TestTrainAndEvalPipeline:
    def test_train_improves_and_attack_succeeds(self):
        """End-to-end: train a victim on synthetic classes, verify clean
        accuracy, run IFGSM through the CLI registry, verify ASR > 0."""
        from hitadv_tpu import models
        from hitadv_tpu.train import train_victim
        from hitadv_tpu.eval import build_attack
        from hitadv_tpu.evaluation import eval_asr
        from hitadv_tpu.config import EvalConfig
        from hitadv_tpu.data import synthetic_batches, synthetic_clouds

        init, apply = models.get_model("pointnet")
        pts, labels = synthetic_clouds(128, num_points=128,
                                       num_classes=4, seed=1)
        params = train_victim(init, apply, pts[..., :3], labels,
                              jax.random.PRNGKey(0), epochs=12,
                              batch_size=16)
        logits_fn = lambda x: apply(params, x)  # noqa: E731
        acc = float(np.mean(np.argmax(np.asarray(
            logits_fn(jnp.asarray(pts[..., :3]))), -1) == labels))
        assert acc > 0.5, f"victim failed to train (acc={acc})"

        cfg = EvalConfig(attack_type="IFGSM", budget=0.3, num_iter=10,
                         num_point=128)
        attack = build_attack(cfg, logits_fn)
        metrics = eval_asr(
            logits_fn, attack,
            synthetic_batches(2, 8, num_points=128, num_classes=4,
                              seed=1),
            uniform_k=2, verbose=False)
        assert metrics["clean_correct"] > 0
        assert metrics["asr"] > 0.2


class TestShapeNetPart:
    @pytest.fixture
    def fake_root(self, tmp_path, rng):
        import json

        root = tmp_path / "snp"
        root.mkdir()
        (root / "synsetoffset2category.txt").write_text(
            "Airplane\t02691156\nChair\t03001627\n")
        ids = {"02691156": ["a1", "a2"], "03001627": ["c1"]}
        test_list, train_list = [], []
        for offset, names in ids.items():
            (root / offset).mkdir()
            for n in names:
                pts = np.concatenate(
                    [rng.randn(900, 6).astype(np.float32),
                     rng.randint(0, 4, (900, 1)).astype(np.float32)], 1)
                np.savetxt(root / offset / f"{n}.txt", pts, fmt="%.5f")
                test_list.append(f"shape_data/{offset}/{n}")
        (root / "train_test_split").mkdir()
        for split, lst in (("train", []), ("val", []),
                           ("test", test_list)):
            (root / "train_test_split" /
             f"shuffled_{split}_file_list.json").write_text(
                json.dumps(lst))
        return str(root)

    def test_load_and_resample(self, fake_root):
        ds = data.PartNormalDataset(fake_root, npoints=512,
                                    split="test", normal_channel=True)
        assert len(ds) == 3
        pts, cls = ds[0]
        assert pts.shape == (512, 6)
        assert cls in (0, 1)
        # unit-sphere normalized (resample may miss the extreme point)
        m = np.linalg.norm(pts[:, :3], axis=1).max()
        assert 0.5 < m <= 1 + 1e-5

    def test_class_choice(self, fake_root):
        ds = data.PartNormalDataset(fake_root, npoints=128,
                                    split="test",
                                    class_choice=["Chair"])
        assert len(ds) == 1
        _, cls = ds[0]
        assert cls == 1


class TestCLIMeshAndDefense:
    def test_eval_cli_n_devices(self):
        from hitadv_tpu.eval import main

        m = main(["--dataset", "synthetic", "--batch_size", "8",
                  "--num_point", "64", "--synthetic_size", "8",
                  "--attack_type", "FGSM", "--budget", "0.1",
                  "--n_devices", "8", "--log_dir", ""])
        assert np.isfinite(m["asr"])

    def test_eval_cli_defense(self):
        from hitadv_tpu.eval import main

        m = main(["--dataset", "synthetic", "--batch_size", "4",
                  "--num_point", "64", "--synthetic_size", "4",
                  "--attack_type", "FGSM", "--budget", "0.1",
                  "--defense_method", "sor", "--log_dir", ""])
        assert np.isfinite(m["asr"])

    def test_eval_cli_eval_defense(self):
        """--eval_defense_method defends only the JUDGING forward: the
        attacker optimizes against the undefended model (`eval.py:65`
        declares the flag; unimplemented in the reference)."""
        from hitadv_tpu.eval import main

        m = main(["--dataset", "synthetic", "--batch_size", "4",
                  "--num_point", "64", "--synthetic_size", "4",
                  "--attack_type", "FGSM", "--budget", "0.1",
                  "--eval_defense_method", "srs", "--log_dir", ""])
        assert np.isfinite(m["asr"])


class TestCLIRestarts:
    """--restarts R: population parallelism through the eval CLI
    (`parallel/population.py` wired in `eval.py::main`; SURVEY.md §2.8
    "independent restarts across devices")."""

    def test_eval_cli_restarts(self):
        from hitadv_tpu.eval import main

        m = main(["--dataset", "synthetic", "--batch_size", "8",
                  "--num_point", "64", "--synthetic_size", "8",
                  "--attack_type", "FGSM_RS", "--budget", "0.05",
                  "--num_iter", "2", "--restarts", "8",
                  "--log_dir", ""])
        assert np.isfinite(m["asr"])

    def test_eval_cli_restarts_non_divisible(self, monkeypatch):
        """R not divisible by the device count still shards: the driver
        meshes the LARGEST device subset whose size divides R (R=12 on
        the 8-device suite mesh -> 2 restarts on each of 6 devices)
        instead of silently running all restarts on one device. The
        mesh size is asserted via a population_attack spy — a finite
        ASR alone also holds for the unsharded fallback and would not
        catch a regression."""
        from hitadv_tpu import parallel
        from hitadv_tpu.eval import main

        seen = {}
        real = parallel.population_attack

        def spy(attack, restarts, mesh=None):
            seen["restarts"] = restarts
            seen["mesh_devices"] = None if mesh is None else mesh.size
            return real(attack, restarts, mesh=mesh)

        monkeypatch.setattr(parallel, "population_attack", spy)
        m = main(["--dataset", "synthetic", "--batch_size", "4",
                  "--num_point", "64", "--synthetic_size", "4",
                  "--attack_type", "FGSM_RS", "--budget", "0.05",
                  "--num_iter", "2", "--restarts", "12",
                  "--log_dir", ""])
        assert np.isfinite(m["asr"])
        assert seen == {"restarts": 12, "mesh_devices": 6}

    def test_restart_superset_of_successes_e2e(self):
        """The population-wrapped attack built by the driver keeps, per
        example, the OR of the restarts' successes: every example any
        individual restart cracks is cracked by the --restarts run."""
        import jax
        import jax.numpy as jnp
        from hitadv_tpu import data
        from hitadv_tpu.config import EvalConfig
        from hitadv_tpu.eval import build_attack, build_model
        from hitadv_tpu.parallel import population_attack

        cfg = EvalConfig(dataset="synthetic", batch_size=8, num_point=64,
                         synthetic_size=8, attack_type="FGSM_RS",
                         budget=0.05, num_iter=2, restarts=4, log_dir="")
        params, logits_fn = build_model(cfg)
        attack = build_attack(cfg, logits_fn, params=params)
        pts, labels = next(iter(data.synthetic_batches(
            1, cfg.batch_size, cfg.num_point, cfg.num_class, seed=0)))
        pts, labels = jnp.asarray(pts), jnp.asarray(labels)
        key = jax.random.PRNGKey(0)
        pop = population_attack(attack, cfg.restarts)(pts, labels, key)
        singles = [attack(pts, labels, k)
                   for k in jax.random.split(key, cfg.restarts)]
        union = np.zeros(cfg.batch_size, bool)
        for s in singles:
            union |= np.asarray(s.success)
        np.testing.assert_array_equal(np.asarray(pop.success), union)
        # picked clouds come from the FIRST successful restart
        first = np.argmax(np.stack(
            [np.asarray(s.success) for s in singles]), axis=0)
        for b in range(cfg.batch_size):
            if union[b]:
                np.testing.assert_allclose(
                    np.asarray(pop.adv_points)[b],
                    np.asarray(singles[first[b]].adv_points)[b],
                    atol=1e-6)

    def test_restarts_mesh_exclusive(self):
        from hitadv_tpu.eval import main

        args = ["--dataset", "synthetic", "--batch_size", "8",
                "--num_point", "64", "--synthetic_size", "8",
                "--attack_type", "FGSM_RS", "--restarts", "4",
                "--log_dir", ""]
        with pytest.raises(ValueError, match="mutually exclusive"):
            main(args + ["--n_devices", "8"])
        with pytest.raises(ValueError, match="mutually exclusive"):
            main(args + ["--dist_func", "chamfer", "--sp_devices", "2",
                         "--attack_type", "CW-Perturb"])


class TestAdvPCAutoencoderPath:
    """VERDICT.md Missing #4: AdvPC must never silently run with a
    random AE (`CW/AdvPC.py:83-99,142` assume a pretrained one)."""

    ARGS = ["--dataset", "synthetic", "--batch_size", "4",
            "--num_point", "64", "--synthetic_size", "4",
            "--attack_type", "AdvPC", "--num_iter", "3",
            "--binary_step", "1", "--log_dir", ""]

    def test_fit_and_cache(self, tmp_path, monkeypatch, capsys):
        from hitadv_tpu.eval import main

        monkeypatch.setenv("HITADV_CACHE_DIR", str(tmp_path))
        m = main(self.ARGS + ["--ae_fit_steps", "5"])
        assert np.isfinite(m["asr"])
        cached = list(tmp_path.glob("ae_*.pkl"))
        assert len(cached) == 1
        out = capsys.readouterr().out
        assert "fitting the AE" in out

        # second run reuses the cache
        m2 = main(self.ARGS + ["--ae_fit_steps", "5"])
        out2 = capsys.readouterr().out
        assert "loading cached fitted AE" in out2
        assert m2["asr"] == m["asr"]

    def test_ae_checkpoint_flag(self, tmp_path, monkeypatch):
        import jax
        from hitadv_tpu.eval import main
        from hitadv_tpu.models import autoencoder
        from hitadv_tpu.utils import checkpoint as ckpt

        params = autoencoder.init(jax.random.PRNGKey(3), num_points=64)
        path = str(tmp_path / "ae.pkl")
        ckpt.save_params(path, params)
        monkeypatch.setenv("HITADV_CACHE_DIR", str(tmp_path / "cache"))
        m = main(self.ARGS + ["--ae_checkpoint", path])
        assert np.isfinite(m["asr"])
        assert not (tmp_path / "cache").exists()   # no fit happened

    def test_random_ae_warns(self, tmp_path, monkeypatch, capsys):
        from hitadv_tpu.eval import main

        monkeypatch.setenv("HITADV_CACHE_DIR", str(tmp_path))
        m = main(self.ARGS + ["--ae_fit_steps", "0"])
        assert np.isfinite(m["asr"])
        assert "RANDOM" in capsys.readouterr().out
