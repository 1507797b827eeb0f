#!/usr/bin/env python
"""EFT field-level inference campaign: full bias expansion + stochasticity.

Parity: reference `run/infer_eft.py` — the EFT-likelihood variant of the
inference campaign: infer the complete 3rd-order Lagrangian bias set and the
field-level stochasticity parameters alongside cosmology and the initial
field, with the quad-Gaussian (or SHASH) likelihood and NUFFT painting.

Usage:
  python run/infer_eft.py --register registered/register_*.h5 --self-data
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from infer import infer  # noqa: E402  (same campaign machinery)

# EFT campaign: observe only geometry/PNG nuisance; infer cosmology, the full
# bias set, and the stochasticity amplitudes.
EFT_OBS = [
    "count_mesh", "alpha_iso", "alpha_ap",
    "fNL", "fNL_bp", "fNL_bpd", "fNL_bpd2", "fNL_bps2", "fNL_bn2p",
    "s_k2e", "s_kmu2e", "ngbars",
]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--register", required=True)
    ap.add_argument("--lik-type", default="quad_gauss",
                    choices=["quad_gauss", "two_quad_gauss", "shash"])
    ap.add_argument("--evolution", default="lpt",
                    choices=["kaiser", "lpt", "nbody"])
    ap.add_argument("--self-data", action="store_true")
    ap.add_argument("--overwrite", action="store_true")
    ap.add_argument("--n-chains", type=int, default=4)
    ap.add_argument("--n-runs", type=int, default=8)
    ap.add_argument("--thinning", type=int, default=64)
    ap.add_argument("--save-root", default="results")
    args = ap.parse_args()

    infer(args.register, png_type=None, lik_type=args.lik_type,
          evolution=args.evolution, self_data=args.self_data,
          expe="eft", overwrite=args.overwrite, obs_names=sorted(set(EFT_OBS)),
          n_chains=args.n_chains, tune_mass=True, n_runs=args.n_runs,
          thinning=args.thinning, save_root=args.save_root)


if __name__ == "__main__":
    main()
