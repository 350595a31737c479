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
        # interactive viewer: self-contained HTML with both clouds
        html = [f for f in files if f.endswith(".html")][0]
        text = (tmp_path / html).read_text()
        assert text.startswith("<!DOCTYPE html>")
        assert '"clean"' in text and '"adv"' in text
        # all 128 adv points embedded (3 floats each)
        import json
        import re
        clouds = json.loads(
            re.search(r"const CLOUDS = (.*?);\n", text).group(1))
        assert len(clouds["adv"]) == 128 * 3
        np.testing.assert_allclose(
            np.asarray(clouds["adv"]).reshape(128, 3), adv, atol=1e-4)
        assert "<script>" in text and "onmousedown" in text

    def test_spectral_mode_cli(self, tmp_path):
        lfc = visual.main([
            "--dataset", "synthetic", "--num_point", "96",
            "--mode", "spectral", "--low_pass", "20",
            "--out_dir", str(tmp_path), "--log_dir", "",
        ])
        assert lfc.shape == (96, 3)
        files = os.listdir(tmp_path)
        for stem in ("ori", "lfc", "hfc"):
            assert any(f.startswith(stem) and f.endswith(".asc")
                       for f in files), files

        ori = np.loadtxt(tmp_path / [f for f in files
                                     if f.startswith("ori")
                                     and f.endswith(".asc")][0])
        hfc = np.loadtxt(tmp_path / [f for f in files
                                     if f.startswith("hfc")
                                     and f.endswith(".asc")][0])
        # eigenbasis is orthonormal -> lfc + hfc reconstructs the cloud
        np.testing.assert_allclose(lfc + hfc, ori, atol=2e-4)
        # low-pass is a real smoothing: lfc differs from the original
        assert np.abs(lfc - ori).max() > 1e-3

    def test_spectral_full_band_is_identity(self, rng):
        pts = rng.randn(64, 3).astype(np.float32)
        lfc, hfc = visual.spectral_decompose(pts, low_pass=64, k=16)
        np.testing.assert_allclose(lfc, pts, atol=2e-4)
        np.testing.assert_allclose(hfc, 0.0, atol=2e-4)

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
