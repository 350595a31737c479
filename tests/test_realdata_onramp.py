"""Real-ModelNet40 on-ramp — skipped unless the data is present.

The reference distributes its datasets and pretrained checkpoints
out-of-band (Baidu link, `/root/reference/README.md:24-26`); this
mirror has them pruned, so the BASELINE.md 1%-ASR-parity target cannot
be measured yet. This test keeps the WIRING verified and ready
(VERDICT r2 next-round item 10): the moment a round supplies the
blobs, dropping them at the paths below (or pointing the env vars at
them) turns the end-to-end ModelNet40 evaluation on without any code
changes.

Activation:
  HITADV_MODELNET40_DIR  — ModelNet40 root (`modelnet40_normal_resampled`
                           txt layout, `/root/reference/eval.py:79-84`
                           dataset contract), default
                           ``<repo>/data/modelnet40_normal_resampled``
  HITADV_POINTNET_CKPT   — torch PointNet checkpoint (.pth/.t7/.tar or a
                           converted .pkl), default
                           ``<repo>/checkpoints/pointnet_cls.pth``
  HITADV_REALDATA_FULL=1 — run the full reference attack config of
                           record (10x100 iters, central 192 — TPU
                           scale); default is a truncated 2x10 wiring
                           pass sized for the CPU suite.

What it asserts when active: the checkpoint-converted victim scores
>= 0.85 clean accuracy on the test split (paper-level PointNet is
~0.89 — a conversion bug craters this), and HiT-ADV produces finite
adversarial clouds with ASR > 0 through the same `eval_asr` loop the
CLI driver uses.
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.environ.get(
    "HITADV_MODELNET40_DIR",
    os.path.join(REPO, "data", "modelnet40_normal_resampled"))
CKPT = os.environ.get(
    "HITADV_POINTNET_CKPT",
    os.path.join(REPO, "checkpoints", "pointnet_cls.pth"))
# DGCNN-format HDF5 variant — publicly mirrored; fetched (checksummed)
# by `scripts/fetch_modelnet40.py`
H5_DIR = os.environ.get(
    "HITADV_MODELNET40_H5_DIR",
    os.path.join(REPO, "data", "modelnet40_ply_hdf5_2048"))

HAVE_DATA = (os.path.isdir(DATA_DIR)
             and os.path.exists(os.path.join(DATA_DIR,
                                             "modelnet40_shape_names.txt")))
HAVE_CKPT = os.path.isfile(CKPT)
HAVE_H5 = os.path.isfile(os.path.join(H5_DIR, "ply_data_test0.h5"))
FULL = os.environ.get("HITADV_REALDATA_FULL", "0") == "1"


@pytest.mark.skipif(not HAVE_DATA, reason=(
    f"ModelNet40 not present at {DATA_DIR} (set HITADV_MODELNET40_DIR); "
    "distributed out-of-band — see BASELINE.md"))
class TestRealModelNet40:
    @pytest.fixture(scope="class")
    def test_batches(self):
        from hitadv_tpu import data

        ds = data.ModelNetDataset(DATA_DIR, num_points=1024,
                                  split="test", use_normals=True)
        n = len(ds) if FULL else min(len(ds), 64)
        pts = np.stack([ds[i][0] for i in range(n)])
        labels = np.asarray([ds[i][1] for i in range(n)],
                            dtype=np.int64).reshape(n)
        bs = 16
        return [(pts[i:i + bs], labels[i:i + bs])
                for i in range(0, n, bs)]

    @pytest.mark.skipif(not HAVE_CKPT, reason=(
        f"PointNet checkpoint not present at {CKPT} "
        "(set HITADV_POINTNET_CKPT)"))
    def test_clean_accuracy_of_converted_checkpoint(self, test_batches):
        import jax.numpy as jnp

        from hitadv_tpu.config import EvalConfig
        from hitadv_tpu.eval import build_model

        cfg = EvalConfig(model="pointnet", checkpoint=CKPT)
        _, logits_fn = build_model(cfg)
        correct = total = 0
        for pts, labels in test_batches:
            pred = np.asarray(jnp.argmax(
                logits_fn(jnp.asarray(pts[..., :3])), -1))
            correct += int((pred == labels).sum())
            total += len(labels)
        acc = correct / total
        assert acc >= 0.85, (
            f"converted checkpoint scores {acc:.3f} clean accuracy on "
            f"{total} ModelNet40 test clouds — conversion regression")

    @pytest.mark.skipif(not HAVE_CKPT, reason=(
        f"PointNet checkpoint not present at {CKPT} "
        "(set HITADV_POINTNET_CKPT)"))
    def test_hit_adv_asr_modelnet40(self, test_batches):
        import jax

        from hitadv_tpu import evaluation
        from hitadv_tpu.config import EvalConfig
        from hitadv_tpu.eval import build_attack, build_model

        # reference configuration of record (BASELINE.md): full scale
        # only when HITADV_REALDATA_FULL=1 — on the CPU suite mesh a
        # truncated schedule validates the identical program shape.
        cfg = EvalConfig(
            model="pointnet", checkpoint=CKPT, attack_type="HiT-ADV",
            budget=0.55, min_sigm=0.1, max_sigm=1.2,
            cd_weight=1e-4, ker_weight=1.0, hide_weight=1.0,
            curv_loss_knn=16,
            central_num=192 if FULL else 16,
            total_central_num=256 if FULL else 24,
            attack_lr=1e-2,
            binary_step=10 if FULL else 2,
            num_iter=100 if FULL else 10)
        _, logits_fn = build_model(cfg)
        attack = build_attack(cfg, logits_fn)
        metrics = evaluation.eval_asr(logits_fn, attack, test_batches,
                                      key=jax.random.PRNGKey(0),
                                      verbose=False)
        assert np.isfinite(metrics["knn_dist"])
        assert 0.0 < metrics["asr"] <= 1.0
        if FULL:
            # BASELINE.md target: ASR within 1% of the torch reference.
            # The reference value must be measured by running the torch
            # pipeline on the same blobs; record it here when available.
            print("FULL ModelNet40 HiT-ADV metrics:", metrics)


@pytest.mark.skipif(not HAVE_H5, reason=(
    f"modelnet40_ply_hdf5_2048 not present at {H5_DIR} — fetch it with "
    "scripts/fetch_modelnet40.py (needs network egress)"))
class TestRealModelNet40H5:
    """On-ramp for the publicly-mirrored DGCNN-format HDF5 ModelNet40
    (`Dataset/data.py:76-91`), fetched checksummed by
    `scripts/fetch_modelnet40.py`. Runs the real test split through the
    same loaders and attack builder the CLI uses."""

    @pytest.fixture(scope="class")
    def h5_test(self):
        from hitadv_tpu import data

        return data.ModelNet40H5(H5_DIR, num_points=1024,
                                 partition="test")

    def test_split_contract(self, h5_test):
        from hitadv_tpu.data import load_h5_cls

        assert len(h5_test) == 2468                 # reference test split
        pts, label = h5_test[0]
        assert pts.shape == (1024, 3)
        assert 0 <= label < 40
        _, labels = load_h5_cls(H5_DIR, "test")
        assert labels.min() >= 0 and labels.max() == 39

    def test_hit_adv_on_real_h5(self, h5_test):
        import jax
        import jax.numpy as jnp

        from hitadv_tpu import evaluation
        from hitadv_tpu.config import EvalConfig
        from hitadv_tpu.eval import build_attack, build_model

        n = 256 if FULL else 16
        pts = np.stack([h5_test[i][0] for i in range(n)])
        labels = np.asarray([h5_test[i][1] for i in range(n)],
                            dtype=np.int64)
        cfg = EvalConfig(
            model="pointnet",
            checkpoint=CKPT if HAVE_CKPT else None,
            attack_type="HiT-ADV", budget=0.55,
            central_num=192 if FULL else 16,
            total_central_num=256 if FULL else 24,
            binary_step=10 if FULL else 2,
            num_iter=100 if FULL else 10)
        _, logits_fn = build_model(cfg)
        attack = build_attack(cfg, logits_fn)
        bs = 16
        batches = [(pts[i:i + bs], labels[i:i + bs])
                   for i in range(0, n, bs)]
        metrics = evaluation.eval_asr(logits_fn, attack, batches,
                                      key=jax.random.PRNGKey(0),
                                      verbose=False)
        assert np.isfinite(metrics["knn_dist"])
        assert 0.0 < metrics["asr"] <= 1.0
        if FULL and HAVE_CKPT:
            print("FULL h5 ModelNet40 HiT-ADV metrics:", metrics)
