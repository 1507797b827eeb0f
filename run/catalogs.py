"""Real-catalog ingestion with optional dependencies.

Generic loaders that turn survey data products into the uniform catalog dicts
consumed by `FieldLevelModel.register_catalog`:

  * cartesian box catalogs: {'pos': (n,3) [Mpc/h], optional 'vel': (n,3) [km/s]}
  * cut-sky catalogs:       {'RA', 'DEC', 'Z', 'WEIGHT'} (+ matching randoms)

Format is dispatched on the file suffix; formats whose reader package is not
installed raise a single clear ImportError naming the missing dependency
instead of failing at import time, so the synthetic/array paths stay hermetic.

Parity: reference `run/register.py:120-260` (fitsio/asdf/abacusnbody/
hdf5plugin NERSC readers) — here re-cut as suffix-dispatched loaders with
guarded imports rather than site-specific getters, since those data products
(and their reader packages) are optional in this environment.
"""
from __future__ import annotations

import importlib
from pathlib import Path

import numpy as np

_MISSING = {
    "fitsio": "reading .fits catalogs requires the optional dependency "
              "'fitsio' (pip install fitsio)",
    "asdf": "reading .asdf meshes/catalogs requires the optional dependency "
            "'asdf' (pip install asdf)",
    "abacusnbody": "reading AbacusSummit particle files requires the optional "
                   "dependency 'abacusnbody' (pip install abacusutils)",
    "cosmoprimo": "Boltzmann-grade linear power requires the optional "
                  "dependency 'cosmoprimo' (pip install cosmoprimo[class]); "
                  "falling back to the native EH98+BAO spectrum otherwise",
}


def optional_import(name: str):
    """Import `name` or raise an ImportError with an actionable message."""
    try:
        return importlib.import_module(name)
    except ImportError as exc:
        raise ImportError(_MISSING.get(name, f"missing optional dependency {name!r}")) from exc


def has_module(name: str) -> bool:
    return importlib.util.find_spec(name) is not None


# --------------------------------------------------------------------- tables
def _native(arr):
    """fitsio returns big-endian (>f8) columns; jnp.asarray wants native."""
    arr = np.asarray(arr)
    if arr.dtype.byteorder not in ("=", "|", "<"):
        arr = arr.astype(arr.dtype.newbyteorder("="))
    return arr


def read_table(path, columns):
    """Read named columns from .fits (fitsio), .npz, or .h5 into a dict of
    native-endian float arrays."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix in (".fits", ".fit", ".gz"):
        fitsio = optional_import("fitsio")
        rec = fitsio.read(str(path), columns=list(columns))
        return {c: _native(rec[c]).astype(np.float64) for c in columns}
    if suffix == ".npz":
        with np.load(path) as f:
            return {c: np.asarray(f[c], dtype=np.float64) for c in columns}
    if suffix in (".h5", ".hdf5"):
        import h5py
        with h5py.File(path, "r") as f:
            return {c: np.asarray(f[c], dtype=np.float64) for c in columns}
    raise ValueError(f"unsupported catalog table format {path.suffix!r} ({path})")


def load_box_catalog(path, pos_cols=("x", "y", "z"), vel_cols=None):
    """Cartesian catalog -> {'pos', optional 'vel'}.

    .npy files hold a (n, 3) position array directly; tabular formats
    (.fits/.npz/.h5) are read column-wise with configurable column names
    (e.g. AbacusSummit CubicBox uses x,y,z/vx,vy,vz); .asdf files are
    AbacusSummit particle products read via abacusnbody.
    """
    path = Path(path)
    if path.suffix.lower() == ".npy":
        return {"pos": np.asarray(np.load(path), dtype=np.float64)}
    if path.suffix.lower() == ".asdf":
        read_abacus = optional_import("abacusnbody.data.read_abacus")
        cat = read_abacus.read_asdf(str(path), load=["pos", "vel"])
        out = {"pos": _native(cat["pos"]).astype(np.float64)}
        if "vel" in cat:
            out["vel"] = _native(cat["vel"]).astype(np.float64)
        return out
    cols = list(pos_cols) + (list(vel_cols) if vel_cols else [])
    tab = read_table(path, cols)
    out = {"pos": np.column_stack([tab[c] for c in pos_cols])}
    if vel_cols:
        out["vel"] = np.column_stack([tab[c] for c in vel_cols])
    return out


def load_cutsky_catalog(path, columns=("RA", "DEC", "Z", "WEIGHT")):
    """Cut-sky catalog (data or randoms) -> {'RA','DEC','Z','WEIGHT'}.
    Missing WEIGHT columns default to unit weights."""
    try:
        return read_table(path, columns)
    except (KeyError, ValueError) as exc:
        if "WEIGHT" not in columns or isinstance(exc, ValueError):
            raise
    tab = read_table(path, [c for c in columns if c != "WEIGHT"])
    tab["WEIGHT"] = np.ones_like(tab[columns[0]])
    return tab


# ---------------------------------------------------------------- IC meshes
def load_ic_mesh(path, growth_index=None):
    """Real-space linear IC mesh from .npy or an AbacusSummit ic_dens .asdf
    (optionally scaled by the stored growth table at `growth_index`)."""
    path = Path(path)
    if path.suffix.lower() == ".npy":
        return np.asarray(np.load(path), dtype=np.float32)
    if path.suffix.lower() == ".asdf":
        asdf = optional_import("asdf")
        with asdf.open(str(path)) as af:
            mesh = np.asarray(af["data"]["density"], dtype=np.float32)
            if growth_index is not None:
                mesh = mesh * np.float32(af["header"]["GrowthTable"][growth_index])
        return mesh
    raise ValueError(f"unsupported IC mesh format {path.suffix!r} ({path})")


# ---------------------------------------------------------------- cosmology
def lin_kpow_cosmoprimo(cosmo_name="AbacusSummit", kmin=1e-4, kmax=1e1,
                        n_interp=256, **cosmo_kw):
    """(k, P(k)/sigma8^2) from a cosmoprimo Boltzmann engine, matching the
    native `ops.power.lin_power` contract. `cosmo_name` is a fiducial factory
    in cosmoprimo.fiducial (e.g. AbacusSummit, Planck2018FullFlatLCDM)."""
    cosmoprimo = optional_import("cosmoprimo")
    fiducial = optional_import("cosmoprimo.fiducial")
    cosmo = getattr(fiducial, cosmo_name)(**cosmo_kw)
    fo = cosmo.get_fourier()
    pk = fo.pk_interpolator().to_1d(z=0.0)
    ks = np.logspace(np.log10(kmin), np.log10(kmax), n_interp)
    return np.stack((ks, np.asarray(pk(ks)) / fo.sigma8_m**2)), {
        "Omega_m": float(cosmo.Omega0_cdm + cosmo.Omega0_b),
        "sigma8": float(fo.sigma8_m),
    }
