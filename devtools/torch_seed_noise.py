"""Torch-vs-torch seed-noise control for the dual-training late-curve gap
(VERDICT r4 item 5b).

The 400-step torch-vs-ours lockstep run (docs/VERIFICATION.md) separates
at the plateau by ~6.3% loss / ~3.7% RMSE, attributed to f32
accumulation-order chaos after bit-parity breaks. This control trains the
TORCH reference alone N times with different parameter-init seeds (same
data, same optimizer) and reports the pairwise plateau spreads — if
torch-vs-torch spread is of the same magnitude, the torch-vs-ours gap is
within run-to-run noise, not a systematic bias.

    JAX_PLATFORMS=cpu python devtools/torch_seed_noise.py [steps] [seeds...]
"""

import itertools
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
seeds = [int(s) for s in sys.argv[2:]] or [42, 43, 44]

import test_reference_parity as trp  # noqa: E402

runs = {}
for ps in seeds:
    print(f"--- torch run, param_seed={ps} ---", flush=True)
    c = trp.run_dual_training(n_steps=n_steps, log_every=100,
                              param_seed=ps, torch_only=True)
    runs[ps] = {"loss": c["t_loss"], "rmse": c["t_rmse"]}

summary = {"steps": n_steps, "seeds": seeds, "pairs": []}
for a, b in itertools.combinations(seeds, 2):
    la = np.asarray(runs[a]["loss"][-50:]).mean()
    lb = np.asarray(runs[b]["loss"][-50:]).mean()
    ra = np.asarray(runs[a]["rmse"][-50:]).mean()
    rb = np.asarray(runs[b]["rmse"][-50:]).mean()
    summary["pairs"].append({
        "seeds": [a, b],
        "final50_loss": [float(la), float(lb)],
        "final50_rmse": [float(ra), float(rb)],
        "loss_rel_diff": float(abs(la - lb) / max(la, 1e-6)),
        "rmse_rel_diff": float(abs(ra - rb) / max(ra, 1e-6)),
    })
summary["max_loss_rel_diff"] = max(p["loss_rel_diff"]
                                   for p in summary["pairs"])
summary["max_rmse_rel_diff"] = max(p["rmse_rel_diff"]
                                   for p in summary["pairs"])
print(json.dumps(summary, indent=2))

out = os.path.join(os.path.dirname(__file__), "torch_seed_noise.json")
with open(out, "w") as f:
    json.dump({"summary": summary,
               "final50": {str(s): {
                   "loss": float(np.asarray(r["loss"][-50:]).mean()),
                   "rmse": float(np.asarray(r["rmse"][-50:]).mean())}
                   for s, r in runs.items()}}, f, indent=1)
print(f"wrote {out}")
