"""Integrity of the measured-baseline artifacts (baseline_ref/).

The north star (BASELINE.json) has two halves: a throughput ratio against
the REAL reference and matching ELBO curves. Both are recorded as JSON
artifacts produced by baseline_ref/measure_*.py (TF1 reference run via
tf.compat.v1). These tests pin the artifacts' invariants so a regression
in the harness (or an accidentally clobbered file) fails loudly rather
than silently feeding bench.py a bogus denominator.
"""

import json
import os

import numpy as np

BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "baseline_ref")


def _load(name):
    with open(os.path.join(BASE, name)) as f:
        return json.load(f)


class TestMeasuredBaselines:
    def test_hmc_denominator_recorded_and_sane(self):
        ref = _load("ref_hmc.json")
        assert ref["n_chains"] == 1000 and ref["dim"] == 100
        # Real-reference CPU HMC sits in the tens-of-thousands ESS/sec;
        # a 10x departure means the harness (or the file) broke.
        assert 5e3 < ref["ess_per_sec"] < 5e5
        assert 0.6 < ref["mean_acceptance"] < 0.95

    def test_reference_plateaus_with_chain_count(self):
        # The dispatch-bound analysis (SURVEY.md 3.3): 8x the chains buys
        # the reference < 1.5x the throughput.
        r1k = _load("ref_hmc.json")["ess_per_sec"]
        r8k = _load("ref_hmc_8192c.json")["ess_per_sec"]
        assert r8k < 1.5 * r1k

    def test_elbo_curves_agree_within_noise(self):
        """North star part 2: identical-protocol curves must agree within
        +-1 nat from epoch 2 on (measured agreement is +-0.2; epoch 1
        carries init-seed noise)."""
        ref = np.array(_load("ref_vae.json")["elbo_curve"])
        ours = np.array(_load("ours_vae.json")["elbo_curve"])
        assert ref.shape == ours.shape and len(ref) >= 10
        gap = np.abs(ref[1:] - ours[1:])
        assert gap.max() < 1.0, gap
        # Both converge (late epochs better than epoch 1).
        assert ref[-1] > ref[0] and ours[-1] > ours[0]

    def test_protocols_match(self):
        ref = _load("ref_vae.json")
        ours = _load("ours_vae.json")
        for k in ("n_train", "batch", "epochs", "z_dim", "lr"):
            assert ref[k] == ours[k], k
