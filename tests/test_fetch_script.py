"""Offline tests for scripts/fetch_modelnet40.py.

The script needs network egress to do its real job; these tests pin its
checksum gating, structural validation, graceful offline failure, and
the --zip happy path — all without a network.
"""

import hashlib
import importlib.util
import os
import sys
import zipfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fetch_modelnet40.py")

spec = importlib.util.spec_from_file_location("fetch_modelnet40", SCRIPT)
fetch = importlib.util.module_from_spec(spec)
spec.loader.exec_module(fetch)

h5py = pytest.importorskip("h5py")


def make_archive(path, n_train=12, n_test=6, shape=(2048, 3),
                 max_label=39):
    """A miniature but structurally-correct modelnet40 archive."""
    files = {}
    rng = np.random.RandomState(0)
    for name in fetch.EXPECTED_FILES:
        n = n_train if "train" in name else n_test
        files[name] = (rng.randn(n, *shape).astype("float32"),
                       rng.randint(0, max_label + 1,
                                   (n, 1)).astype("uint8"))
    # make sure max label is actually reached
    first = fetch.EXPECTED_FILES[0]
    files[first][1][0, 0] = max_label
    tmp = os.path.dirname(path)
    d = os.path.join(tmp, fetch.DIR_NAME)
    os.makedirs(d, exist_ok=True)
    for name, (data, label) in files.items():
        with h5py.File(os.path.join(d, name), "w") as f:
            f["data"] = data
            f["label"] = label
    with zipfile.ZipFile(path, "w") as z:
        for name in files:
            z.write(os.path.join(d, name),
                    arcname=f"{fetch.DIR_NAME}/{name}")
    return path


@pytest.fixture
def tiny_counts(monkeypatch):
    monkeypatch.setattr(fetch, "EXPECTED_COUNTS",
                        {"train": 5 * 12, "test": 2 * 6})


class TestFetchScript:
    def test_zip_happy_path(self, tmp_path, tiny_counts, capsys):
        z = make_archive(str(tmp_path / "src" / "a.zip"))
        digest = fetch._sha256_of(z)
        dest = tmp_path / "data"
        rc = fetch.main(["--zip", z, "--dest", str(dest),
                         "--sha256", digest])
        assert rc == 0
        assert (dest / fetch.DIR_NAME / "ply_data_test0.h5").exists()
        assert "sha256 ok" in capsys.readouterr().out
        # second run: already-present short-circuit, validate only
        rc = fetch.main(["--zip", z, "--dest", str(dest)])
        assert rc == 0

    def test_checksum_mismatch_refuses(self, tmp_path, tiny_counts,
                                       capsys):
        z = make_archive(str(tmp_path / "src" / "a.zip"))
        rc = fetch.main(["--zip", z, "--dest", str(tmp_path / "data"),
                         "--sha256", "0" * 64])
        assert rc == 1
        assert "CHECKSUM MISMATCH" in capsys.readouterr().err
        assert not (tmp_path / "data" / fetch.DIR_NAME).exists()

    def test_structural_validation_rejects_bad_counts(self, tmp_path):
        # correct files, wrong split sizes vs the REAL expected counts
        z = make_archive(str(tmp_path / "src" / "a.zip"))
        digest = fetch._sha256_of(z)
        with pytest.raises(ValueError, match="expected 9840"):
            fetch.main(["--zip", z, "--dest", str(tmp_path / "data"),
                        "--sha256", digest])

    def test_structural_validation_rejects_bad_shape(self, tmp_path,
                                                     tiny_counts):
        z = make_archive(str(tmp_path / "src" / "a.zip"),
                         shape=(1024, 3))
        digest = fetch._sha256_of(z)
        with pytest.raises(ValueError, match="2048"):
            fetch.main(["--zip", z, "--dest", str(tmp_path / "data"),
                        "--sha256", digest])

    def test_offline_graceful(self, tmp_path, monkeypatch, capsys):
        import urllib.error
        import urllib.request

        def boom(*a, **k):
            raise urllib.error.URLError("no egress")

        monkeypatch.setattr(urllib.request, "urlopen", boom)
        rc = fetch.main(["--dest", str(tmp_path / "data")])
        assert rc == 2
        err = capsys.readouterr().err
        assert "FETCH FAILED" in err and "egress" in err

    def test_archive_traversal_rejected(self, tmp_path, tiny_counts):
        z = str(tmp_path / "evil.zip")
        with zipfile.ZipFile(z, "w") as zf:
            zf.writestr("../evil.txt", "x")
        digest = fetch._sha256_of(z)
        with pytest.raises(ValueError, match="suspicious"):
            fetch.main(["--zip", z, "--dest", str(tmp_path / "data"),
                        "--sha256", digest])
