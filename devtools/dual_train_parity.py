"""Dual-training convergence parity recorder (VERDICT r3 item 2).

Trains the stubbed-DCN torch reference and our JAX model in lockstep from
identical init on identical synthetic batches at fork-default model config
(prop_time=12, GRU, S2D, conf_prop, preserve_input, TGASS; f32), then
emits the sampled loss/RMSE curves as JSON + a markdown table for
VERIFICATION.md. The shared runner lives in
tests/test_reference_parity.py:run_dual_training (also exercised by the
slow-marked pytest there).

Run (CPU):
    JAX_PLATFORMS=cpu python devtools/dual_train_parity.py [steps]
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np  # noqa: E402

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400

import test_reference_parity as trp  # noqa: E402

curves = trp.run_dual_training(n_steps=n_steps, log_every=25)

t_l, j_l = np.asarray(curves["t_loss"]), np.asarray(curves["j_loss"])
t_r, j_r = np.asarray(curves["t_rmse"]), np.asarray(curves["j_rmse"])

rows = []
for s in list(range(0, n_steps, 25)) + [n_steps - 1]:
    rows.append((s, t_l[s], j_l[s], t_r[s], j_r[s]))

rm = lambda x, w=25: np.convolve(np.asarray(x, np.float64),
                                 np.ones(w) / w, mode="valid")
rm_rel = np.abs(rm(t_l) - rm(j_l)) / np.maximum(np.abs(rm(t_l)), 1e-3)

summary = {
    "steps": n_steps,
    "final50_loss_torch": float(t_l[-50:].mean()),
    "final50_loss_ours": float(j_l[-50:].mean()),
    "final50_rmse_torch": float(t_r[-50:].mean()),
    "final50_rmse_ours": float(j_r[-50:].mean()),
    "final50_loss_rel_diff": float(abs(t_l[-50:].mean() - j_l[-50:].mean())
                                   / t_l[-50:].mean()),
    "final50_rmse_rel_diff": float(abs(t_r[-50:].mean() - j_r[-50:].mean())
                                   / t_r[-50:].mean()),
    "max_rolling25_loss_rel_diff": float(rm_rel.max()),
}
print(json.dumps(summary, indent=2))

out = os.path.join(os.path.dirname(__file__), "dual_train_curves.json")
with open(out, "w") as f:
    json.dump({"summary": summary, "rows_every_25": [
        {"step": int(s), "t_loss": float(a), "j_loss": float(b),
         "t_rmse": float(c), "j_rmse": float(d)} for s, a, b, c, d in rows],
        "curves": {k: [float(x) for x in v] for k, v in curves.items()}},
        f, indent=1)
print(f"curves -> {out}")

print("\n| step | torch loss | ours loss | torch RMSE | ours RMSE |")
print("|---|---|---|---|---|")
for s, a, b, c, d in rows:
    print(f"| {s} | {a:.4f} | {b:.4f} | {c:.4f} | {d:.4f} |")
