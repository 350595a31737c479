#!/usr/bin/env python
"""Fetch the public DGCNN-format ModelNet40 (`modelnet40_ply_hdf5_2048`).

The reference's primary datasets/checkpoints are distributed out-of-band
(Baidu link, `/root/reference/README.md:24-26`), but this HDF5 variant
is publicly mirrored and is exactly what the reference's own DGCNN data
path downloads (`Dataset/data.py:27-37,76-91`). Fetching it turns the
BASELINE.md real-data targets from "blocked" into runnable:
`tests/test_realdata_onramp.py::TestRealModelNet40H5` activates the
moment the files exist.

Integrity: the archive's SHA-256 is verified against
`scripts/modelnet40_ply_hdf5_2048.sha256` when that file exists (or
`--sha256`); on a first successful fetch without a recorded hash the
computed digest is written there so later fetches are pinned. The
extracted h5 files are then structurally validated (file list, shapes
[*, 2048, 3], 40 classes, 9840 train / 2468 test) — corruption or a
swapped mirror fails loudly either way.

Offline behavior is graceful: a clear message and exit code 2, no
traceback — the test suite stays green (skipped) without the data.

Usage:
    python scripts/fetch_modelnet40.py [--dest DIR] [--url URL]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import shutil
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_DEST = os.path.join(REPO, "data")
DIR_NAME = "modelnet40_ply_hdf5_2048"
# The URL the reference itself uses (`Dataset/data.py:33`); --url for
# the HuggingFace/Zenodo mirrors when Stanford's host is down.
DEFAULT_URL = ("https://shapenet.cs.stanford.edu/media/"
               "modelnet40_ply_hdf5_2048.zip")
SHA_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"{DIR_NAME}.sha256")

EXPECTED_FILES = (
    [f"ply_data_train{i}.h5" for i in range(5)]
    + [f"ply_data_test{i}.h5" for i in range(2)]
)
EXPECTED_COUNTS = {"train": 9840, "test": 2468}


def _download(url: str, out_path: str) -> str:
    """Stream ``url`` to ``out_path``; return the SHA-256 hex digest."""
    import urllib.error
    import urllib.request

    h = hashlib.sha256()
    try:
        req = urllib.request.Request(
            url, headers={"User-Agent": "hitadv_tpu-fetch/1.0"})
        with urllib.request.urlopen(req, timeout=60) as r, \
                open(out_path, "wb") as f:
            total = int(r.headers.get("Content-Length") or 0)
            done = 0
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                h.update(chunk)
                f.write(chunk)
                done += len(chunk)
                if total:
                    print(f"\r  {done / 1e6:.0f}/{total / 1e6:.0f} MB",
                          end="", flush=True)
            print()
    except (urllib.error.URLError, OSError, TimeoutError) as e:
        raise ConnectionError(
            f"could not download {url}: {e}\n"
            "This environment may have no network egress — rerun when a "
            "network grant is available, pass --url for a mirror, or "
            f"drop the archive manually and rerun (see --zip)."
        ) from e
    return h.hexdigest()


def _sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _validate_h5_tree(d: str) -> None:
    import h5py
    import numpy as np

    missing = [f for f in EXPECTED_FILES
               if not os.path.isfile(os.path.join(d, f))]
    if missing:
        raise ValueError(f"extracted tree at {d} is missing {missing}")
    for split, want in EXPECTED_COUNTS.items():
        n, labels = 0, []
        for name in EXPECTED_FILES:
            if split not in name:
                continue
            with h5py.File(os.path.join(d, name), "r") as f:
                data, label = f["data"][:], f["label"][:]
            if data.ndim != 3 or data.shape[1:] != (2048, 3):
                raise ValueError(
                    f"{name}: data shape {data.shape} != [*, 2048, 3]")
            if len(label) != len(data):
                raise ValueError(f"{name}: label/data length mismatch")
            n += len(data)
            labels.append(label)
        labels = np.concatenate(labels).ravel()
        if n != want:
            raise ValueError(
                f"{split} split has {n} clouds, expected {want}")
        if labels.min() < 0 or labels.max() != 39:
            raise ValueError(
                f"{split} labels span [{labels.min()}, {labels.max()}], "
                "expected 40 classes (max label 39)")
    print(f"validated: {EXPECTED_COUNTS['train']} train + "
          f"{EXPECTED_COUNTS['test']} test clouds, [*, 2048, 3], "
          "40 classes")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="fetch modelnet40_ply_hdf5_2048 (checksummed)")
    ap.add_argument("--dest", default=DEFAULT_DEST,
                    help=f"parent dir for {DIR_NAME} (default: data/)")
    ap.add_argument("--url", default=DEFAULT_URL)
    ap.add_argument("--zip", default=None,
                    help="use a pre-downloaded archive instead of "
                         "fetching (still checksummed + validated)")
    ap.add_argument("--sha256", default=None,
                    help="expected archive sha256 (overrides the "
                         f"recorded {os.path.basename(SHA_FILE)})")
    args = ap.parse_args(argv)

    target = os.path.join(args.dest, DIR_NAME)
    if os.path.isdir(target):
        print(f"{target} already present — validating only")
        _validate_h5_tree(target)
        return 0

    expected = args.sha256
    if expected is None and os.path.isfile(SHA_FILE):
        expected = open(SHA_FILE).read().split()[0].strip()

    tmpdir = tempfile.mkdtemp(prefix="modelnet40_")
    try:
        if args.zip:
            zpath = args.zip
            digest = _sha256_of(zpath)
        else:
            zpath = os.path.join(tmpdir, f"{DIR_NAME}.zip")
            print(f"downloading {args.url}")
            try:
                digest = _download(args.url, zpath)
            except ConnectionError as e:
                print(f"FETCH FAILED (offline?): {e}", file=sys.stderr)
                return 2

        if expected is not None:
            if digest != expected:
                print(f"CHECKSUM MISMATCH: got {digest}, expected "
                      f"{expected} — refusing to extract",
                      file=sys.stderr)
                return 1
            print(f"sha256 ok: {digest}")

        print("extracting...")
        with zipfile.ZipFile(zpath) as z:
            for m in z.namelist():   # no absolute paths / traversal
                if m.startswith("/") or ".." in m:
                    raise ValueError(f"suspicious archive member {m!r}")
            z.extractall(tmpdir)
        src = os.path.join(tmpdir, DIR_NAME)
        if not os.path.isdir(src):
            raise ValueError(
                f"archive did not contain {DIR_NAME}/ at its root")
        _validate_h5_tree(src)
        if expected is None:
            # Trust-on-first-use: record the pin only AFTER the archive
            # extracted and validated — a truncated download or an
            # HTML-200 error page must never become the pinned hash.
            with open(SHA_FILE, "w") as f:
                f.write(f"{digest}  {DIR_NAME}.zip\n")
            print(f"sha256 {digest} recorded to {SHA_FILE} — commit it "
                  "to pin future fetches")
        os.makedirs(args.dest, exist_ok=True)
        shutil.move(src, target)
        print(f"ready: {target}")
        return 0
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
