"""Epoch-1 ELBO seed sweep (VERDICT r3 item 5): bound the -3.9-nat
epoch-1 gap in the north-star curve comparison by measurement instead of
attribution.

Runs 5 seeds per side of the shared VAE protocol (vae_protocol.py) for 2
epochs each — seed changes ONLY the parameter init and the in-graph
binarization/sampling streams; the data, data order, architecture, and
optimizer are identical by construction. Writes
baseline_ref/vae_seed_sweep.json with per-seed epoch-1/epoch-2 lower
bounds and the mean +/- sd per side.

Run: ``python -m baseline_ref.seed_sweep_vae``.
"""

import json
import os

import numpy as np

SEEDS = [1, 2, 3, 4, 5]
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "vae_seed_sweep.json")


def main():
    from baseline_ref import measure_vae_ours, measure_vae_ref

    ours = {}
    for seed in SEEDS:
        curve = measure_vae_ours.main(seed=seed, epochs=2, write=False)
        ours[seed] = [round(v, 3) for v in curve]
        print("ours seed %d: %s" % (seed, ours[seed]), flush=True)

    ref = {}
    for seed in SEEDS:
        curve = measure_vae_ref.main(seed=seed, epochs=2, write=False)
        ref[seed] = [round(float(v), 3) for v in curve]
        print("ref seed %d: %s" % (seed, ref[seed]), flush=True)

    def stats(side, epoch_idx):
        vals = np.array([side[s][epoch_idx] for s in SEEDS])
        return {"mean": round(float(vals.mean()), 2),
                "sd": round(float(vals.std(ddof=1)), 2),
                "min": round(float(vals.min()), 2),
                "max": round(float(vals.max()), 2)}

    result = {
        "what": "5-seed epoch-1/2 ELBO spread, identical protocol both "
                "sides (seed varies init + in-graph sampling only)",
        "seeds": SEEDS,
        "ours_curves": ours,
        "ref_curves": ref,
        "epoch1": {"ours": stats(ours, 0), "ref": stats(ref, 0)},
        "epoch2": {"ours": stats(ours, 1), "ref": stats(ref, 1)},
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"epoch1": result["epoch1"],
                      "epoch2": result["epoch2"]}))


if __name__ == "__main__":
    main()
