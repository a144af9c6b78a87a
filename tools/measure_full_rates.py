"""Measure the exact-autodiff training step rate of the two 'full' (U-Net)
model variants at their reference envelopes, to size their at-scale training
walls (VERDICT r4 missing #3: pipn-pp-full / pi-gano-pp-full are the two
variants without at-scale held-out numbers AND without analytic fast paths —
their FeaturePropagation decoders interpolate across internal points, so they
replay reference autograd semantics).

Usage: python tools/measure_full_rates.py [--steps 8]
Prints one JSON line {family: steps_per_sec}.
"""
import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--families", default="pipn_pp_full,pi_gano_pp_full")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import BATCH, N_BOUNDARY, N_INTERNAL, N_OBS
    from porous_cfd_tpu.data.synthetic import make_foam_batch, make_scalers
    from porous_cfd_tpu.models.pi_gano import pi_gano_pp_full
    from porous_cfd_tpu.models.pipn import pipn_foam_pp_full
    from porous_cfd_tpu.physics.scaling import FixedLossScaler
    from porous_cfd_tpu.train.engine import (gather_cases, make_optimizer,
                                             make_train_functions)
    from porous_cfd_tpu.utils.profiling import steps_per_sec

    n_dim, n_bid = 2, 4
    scalers = make_scalers()
    fixed_scaler = FixedLossScaler.from_dict(
        {"continuity": [1], "momentum": [1] * 2, "boundary": [1] * 3,
         "observations": [100] * 3})

    def duct_pp_full():
        # examples/duct_fixed_boundary/train.py 'pipn-pp-full'
        return pipn_foam_pp_full(
            nu=1489.4e-6, d=14000.0, f=17.11,
            enc_layers=[[n_dim * 2 + 1 + n_bid, 64, 64, 128],
                        [128 + n_dim, 128, 128, 256],
                        [256 + n_dim, 1024]],
            enc_radius=[0.4, 0.8], enc_fraction=[0.5, 0.25],
            dec_layers=[[1024 + 256, 256, 256],
                        [128 + 256, 128, 128],
                        [128 + n_bid + n_dim + 1, 128, 128, 128, 3]],
            dec_k=[3, 3, 3],
            dec_dropout=[0.0, 0.0, [0.15, 0.15, 0.0, 0.0]],
            scalers=scalers)

    def vardense_gano_pp_full():
        # examples/duct_variable_boundary/train.py 'pi-gano-pp-full'
        return pi_gano_pp_full(
            nu=1489.4e-6, out_features=3,
            branch_layers=[8, 128, 256, 256, 256],
            enc_layers=[[n_dim * 2 + n_bid + 1, 64, 64, 128],
                        [128 + n_dim, 128, 128, 256],
                        [256 + n_dim, 512]],
            enc_radius=[0.5, 1], enc_fraction=[0.5, 0.25],
            dec_layers=[[512 + 256, 256, 256],
                        [128 + 256, 128, 128],
                        [128 + n_dim + n_bid + 1, 128, 128, 128, 3]],
            dec_k=[3, 3, 3],
            fp_dropout=[0.0, 0.0, [0.0, 0.2, 0.2, 0.0]],
            scalers=scalers,
            variable_boundaries={"Subdomains": ["inlet", "internal"],
                                 "Features": ["U-inlet", "d", "f"]})

    makers = {"pipn_pp_full": duct_pp_full,
              "pi_gano_pp_full": vardense_gano_pp_full}
    out = {}
    for fam in args.families.split(","):
        model = makers[fam]()
        rng = np.random.default_rng(8421)
        ds = make_foam_batch(BATCH, N_INTERNAL, N_BOUNDARY, N_OBS, rng=rng)
        ds = jax.device_put(model.attach_neighbors(ds))
        tx = make_optimizer(model, 1)
        fns = make_train_functions(model, tx, loss_scaler=fixed_scaler)
        batch = gather_cases(ds, jnp.arange(BATCH))
        state = fns.init_state(batch)
        rate, _ = steps_per_sec(fns.train_step, state, batch,
                                n_steps=args.steps)
        out[fam] = round(rate, 2)
        print(f"  {fam}: {out[fam]} steps/s", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
