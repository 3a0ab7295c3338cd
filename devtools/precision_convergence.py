"""bf16-vs-f32 convergence control (VERDICT r4 item 5a).

Trains OUR model twice from identical init on identical synthetic batches
— once at the reference-parity f32 default, once at the recommended TPU
training precision bf16 (fp32 params/optimizer, bfloat16 compute) — and
pins the drift of the loss/RMSE curves. The recommended precision
previously had no convergence evidence beyond the on-device synthetic
overfit (tests_tpu/test_convergence.py).

    JAX_PLATFORMS=cpu python devtools/precision_convergence.py [steps]

Writes devtools/precision_curves.json; summary table goes to
docs/VERIFICATION.md. Reference training semantics this mirrors:
/root/reference/src/main.py:205-256.
"""

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
h, w, bsz, n_batches, lr, seed = 32, 48, 2, 8, 1e-3, 17


def train_ours(precision: str):
    import jax
    import jax.numpy as jnp
    import optax

    from nlspn_eccv20_tpu.config import Config
    from nlspn_eccv20_tpu.losses import get_loss
    from nlspn_eccv20_tpu.models import get_model

    cfg = Config(patch_height=h, patch_width=w, precision=precision,
                 prop_impl="xla", loss="1.0*L1+1.0*L2").finalize()
    model = get_model(cfg)
    loss_fn = get_loss(cfg)

    rng = np.random.default_rng(seed)
    data = []
    for _ in range(n_batches):
        rgb = rng.standard_normal((bsz, h, w, 3)).astype(np.float32)
        gt = np.clip(rng.random((bsz, h, w, 1)) * 8.0, 0.05,
                     None).astype(np.float32)
        dep = (gt * (rng.random((bsz, h, w, 1)) > 0.95)).astype(np.float32)
        data.append({"rgb": rgb, "dep": dep, "gt": gt})

    # identical init for both precisions: params are fp32 either way
    # (bf16 is compute dtype only — train.Engine semantics)
    variables = model.init(jax.random.PRNGKey(0), data[0], train=True)
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch):
        def loss_of(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, batch,
                train=True, mutable=["batch_stats"])
            return loss_fn(batch, out)[0] / bsz, (mut["batch_stats"], out)

        (lv, (bs, out)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        pred = jnp.clip(out["pred"], 0, cfg.max_depth)
        mask = (batch["gt"] > 1e-4).astype(jnp.float32)
        se = ((pred - batch["gt"]) * mask) ** 2
        num = jnp.sum(mask, axis=(1, 2, 3))
        rmse = jnp.mean(jnp.sqrt(jnp.sum(se, axis=(1, 2, 3)) / (num + 1e-8)))
        return optax.apply_updates(params, updates), bs, opt_state2, lv, rmse

    losses, rmses = [], []
    for step in range(n_steps):
        params, batch_stats, opt_state, lv, rmse = train_step(
            params, batch_stats, opt_state, data[step % n_batches])
        losses.append(float(lv))
        rmses.append(float(rmse))
        if step % 50 == 0 or step == n_steps - 1:
            print(f"[{precision}] step {step:4d} loss {lv:.4f} "
                  f"rmse {rmse:.4f}", flush=True)
    return losses, rmses


f32_l, f32_r = train_ours("f32")
bf16_l, bf16_r = train_ours("bf16")

f32_l, bf16_l = np.asarray(f32_l), np.asarray(bf16_l)
f32_r, bf16_r = np.asarray(f32_r), np.asarray(bf16_r)
rm = lambda x, k=25: np.convolve(np.asarray(x, np.float64),
                                 np.ones(k) / k, mode="valid")
rel = np.abs(rm(f32_l) - rm(bf16_l)) / np.maximum(np.abs(rm(f32_l)), 1e-3)

summary = {
    "steps": n_steps,
    "final50_loss_f32": float(f32_l[-50:].mean()),
    "final50_loss_bf16": float(bf16_l[-50:].mean()),
    "final50_rmse_f32": float(f32_r[-50:].mean()),
    "final50_rmse_bf16": float(bf16_r[-50:].mean()),
    "final50_loss_rel_diff": float(
        abs(f32_l[-50:].mean() - bf16_l[-50:].mean()) / f32_l[-50:].mean()),
    "final50_rmse_rel_diff": float(
        abs(f32_r[-50:].mean() - bf16_r[-50:].mean()) / f32_r[-50:].mean()),
    "max_rolling25_loss_rel_diff": float(rel.max()),
}
print(json.dumps(summary, indent=2))

out = os.path.join(os.path.dirname(__file__), "precision_curves.json")
with open(out, "w") as f:
    json.dump({"summary": summary,
               "curves": {"f32_loss": f32_l.tolist(),
                          "bf16_loss": bf16_l.tolist(),
                          "f32_rmse": f32_r.tolist(),
                          "bf16_rmse": bf16_r.tolist()}}, f)
print(f"wrote {out}")
