"""Headless visual driver test."""

import os

import numpy as np
import jax

from hitadv_tpu import visual


class TestVisual:
    def test_main_synthetic_fgsm(self, tmp_path):
        adv = visual.main([
            "--dataset", "synthetic", "--num_point", "128",
            "--attack_type", "FGSM", "--budget", "0.1",
            "--out_dir", str(tmp_path), "--log_dir", "",
        ])
        assert adv.shape == (128, 3)
        files = os.listdir(tmp_path)
        assert any(f.endswith(".asc") for f in files)
        asc = [f for f in files if f.endswith(".asc")][0]
        loaded = np.loadtxt(tmp_path / asc)
        np.testing.assert_allclose(loaded, adv, atol=1e-5)

    def test_main_from_txt_input(self, tmp_path, rng):
        cloud = rng.randn(300, 6).astype(np.float32)
        path = str(tmp_path / "in.txt")
        np.savetxt(path, cloud, delimiter=",", fmt="%.6f")
        adv = visual.main([
            "--input", path, "--target", "3", "--num_point", "256",
            "--attack_type", "IFGSM", "--num_iter", "3",
            "--budget", "0.1", "--out_dir", str(tmp_path),
            "--log_dir", "",
        ])
        assert adv.shape == (256, 3)
