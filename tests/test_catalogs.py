"""Optional-dependency catalog ingestion (run/catalogs.py).

Parity: reference `run/register.py:120-260` — the fitsio/asdf/abacusnbody
readers; here exercised through the suffix-dispatched loaders on the formats
available in this environment (.npy/.npz/.h5), plus the guarded-import error
contract for the formats that are not.
"""
import sys
from pathlib import Path

import h5py
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from run.catalogs import (  # noqa: E402
    has_module, load_box_catalog, load_cutsky_catalog, load_ic_mesh,
    read_table,
)


def test_box_catalog_npy(tmp_path):
    pos = np.random.default_rng(0).uniform(0, 100, (64, 3))
    np.save(tmp_path / "cat.npy", pos)
    out = load_box_catalog(tmp_path / "cat.npy")
    np.testing.assert_array_equal(out["pos"], pos)
    assert "vel" not in out


def test_box_catalog_tabular_h5(tmp_path):
    rng = np.random.default_rng(1)
    cols = {c: rng.uniform(0, 10, 32) for c in ("x", "y", "z", "vx", "vy", "vz")}
    with h5py.File(tmp_path / "cat.h5", "w") as f:
        for c, v in cols.items():
            f[c] = v
    out = load_box_catalog(tmp_path / "cat.h5", pos_cols=("x", "y", "z"),
                           vel_cols=("vx", "vy", "vz"))
    np.testing.assert_allclose(out["pos"][:, 1], cols["y"])
    np.testing.assert_allclose(out["vel"][:, 2], cols["vz"])
    assert out["pos"].shape == out["vel"].shape == (32, 3)


def test_cutsky_npz_weight_default(tmp_path):
    rng = np.random.default_rng(2)
    base = {"RA": rng.uniform(0, 360, 16), "DEC": rng.uniform(-90, 90, 16),
            "Z": rng.uniform(0.5, 1.5, 16)}
    np.savez(tmp_path / "noweight.npz", **base)
    np.savez(tmp_path / "weighted.npz", **base, WEIGHT=np.full(16, 2.0))

    out = load_cutsky_catalog(tmp_path / "noweight.npz")
    np.testing.assert_array_equal(out["WEIGHT"], np.ones(16))
    out = load_cutsky_catalog(tmp_path / "weighted.npz")
    np.testing.assert_array_equal(out["WEIGHT"], np.full(16, 2.0))
    np.testing.assert_allclose(out["RA"], base["RA"])


def test_ic_mesh_npy(tmp_path):
    mesh = np.random.default_rng(3).normal(size=(8, 8, 8)).astype(np.float32)
    np.save(tmp_path / "ic.npy", mesh)
    np.testing.assert_array_equal(load_ic_mesh(tmp_path / "ic.npy"), mesh)


def test_missing_optional_dependency_message(tmp_path):
    (tmp_path / "cat.fits").write_bytes(b"SIMPLE  =  T")
    if has_module("fitsio"):
        pytest.skip("fitsio installed in this environment")
    with pytest.raises(ImportError, match="fitsio"):
        read_table(tmp_path / "cat.fits", ["RA"])
    with pytest.raises(ImportError, match="fitsio"):
        load_cutsky_catalog(tmp_path / "cat.fits")


def test_unknown_format_rejected(tmp_path):
    (tmp_path / "cat.dat").write_text("1 2 3")
    with pytest.raises(ValueError, match="unsupported"):
        load_box_catalog(tmp_path / "cat.dat")
