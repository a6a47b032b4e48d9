#!/usr/bin/env python
"""One-step TRAINING parity vs the reference PyTorch implementation.

Composes the equivalences proven separately elsewhere (forward parity
2.3e-6 in parity_check.py, per-loss torch oracles in tests/test_losses.py,
optimizer-vector parity in tests/test_train.py) into the reference's actual
train step (train.py:206-240): shared converted weights, identical
input/target/edge, then

  loss = softmax_dice(outputs[0], target) + get_separate_loss(outputs[1])
       + get_edge_separate_loss(outputs[2]) + mid variants  ->  backward()
       ->  Adam(lr=2e-4, wd=1e-5, amsgrad).step()

on both sides, comparing all 6 loss components, gradients for every
parameter tensor, and the Adam parameter deltas.  This is the direct test
of autodiff through the scatter-back (cls_wise_former.py:457-543), the
class-token gating, and the 4 auxiliary deep-supervision losses.

Dropout is neutralized on both sides (reference .eval() + F.dropout3d
patch; ModelConfig rates = 0) so the comparison is deterministic; torch
InstanceNorm3d has no running stats, so eval-mode normalization matches
train-mode exactly.

  python scripts/parity_train.py --reference /root/reference

Recorded result on this container: see docs/PARITY.md §train-step.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_inputs():
    """One deterministic labeled 128^3 volume with all classes + edges."""
    import numpy as np
    from dctseg.data.edge import make_edge_map

    rng = np.random.default_rng(7)
    target = np.zeros((1, 128, 128, 128), np.int64)
    target[0, 30:90, 30:90, 30:90] = 2
    target[0, 45:75, 45:75, 45:75] = 3
    target[0, 52:68, 52:68, 52:68] = 1
    x = rng.normal(size=(1, 4, 128, 128, 128)).astype(np.float32)
    x[:, 0] += 2.0 * (target > 0)
    x[:, 1] += 2.0 * (target == 3)
    edge = make_edge_map(target[0])[None].astype(np.int64)
    return x, target, edge


def torch_step(reference: str, workdir: str, x, target, edge,
               cache: str = ""):
    """Reference forward + loss + backward + Adam step (train.py:206-240).
    Reuses parity_eval's reference bootstrap (fix_index synthesis, medpy/
    nibabel stubs, dropout-quirk neutralization, seeded construction).

    ``cache``: npz path — the full-size torch step takes ~10 min on this
    1-core host, so results are cached for comparison-logic iteration."""
    import numpy as np
    if cache and os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        return {"losses": z["losses"].item(),
                "sd0": z["sd0"].item(), "sd1": z["sd1"].item(),
                "grads": z["grads"].item()}
    cwd = os.getcwd()
    import parity_eval
    model, sd0 = parity_eval.setup_reference(reference, workdir)
    sd0 = {k: v.copy() for k, v in sd0.items()}
    model.eval()  # dropout off; InstanceNorm3d identical to train mode

    import torch
    from models import criterions
    from utils import tools

    opt = torch.optim.Adam(model.parameters(), lr=2e-4, weight_decay=1e-5,
                           amsgrad=True)  # train.py:137
    xt = torch.from_numpy(x)
    tt = torch.from_numpy(target)
    et = torch.from_numpy(edge)

    outputs = model(xt, None)
    end_loss = criterions.softmax_dice(outputs[0], tt)       # train.py:206
    s_loss = tools.get_separate_loss(outputs[1], tt)         # :208
    edge_loss = tools.get_edge_separate_loss(outputs[2], et)  # :209
    mid_s_loss = tools.get_separate_loss(outputs[3], tt)     # :210
    mid_edge_loss = tools.get_edge_separate_loss(outputs[4], et)  # :211
    loss = end_loss + s_loss + edge_loss + mid_s_loss + mid_edge_loss

    opt.zero_grad()
    loss.backward()                                          # :233
    grads = {k: (p.grad.detach().cpu().numpy().copy()
                 if p.grad is not None else None)
             for k, p in model.named_parameters()}
    opt.step()                                               # :240
    sd1 = {k: v.detach().cpu().numpy().copy()
           for k, v in model.state_dict().items()}

    os.chdir(cwd)
    result = {
        "losses": {"loss": float(loss), "end_loss": float(end_loss),
                   "s_loss": float(s_loss), "edge_loss": float(edge_loss),
                   "mid_s_loss": float(mid_s_loss),
                   "mid_edge_loss": float(mid_edge_loss)},
        "sd0": sd0, "sd1": sd1, "grads": grads,
    }
    if cache:
        np.savez_compressed(
            cache, losses=np.array(result["losses"], dtype=object),
            sd0=np.array(sd0, dtype=object), sd1=np.array(sd1, dtype=object),
            grads=np.array(grads, dtype=object))
    return result


def jax_step(sd0, x, target, edge, cache: str = ""):
    """dctseg's PRODUCTION train step (trainer.make_train_step) on the
    converted weights + a separate grad evaluation for direct comparison."""
    import numpy as np_
    if cache and os.path.exists(cache):
        z = np_.load(cache, allow_pickle=True)
        return {"losses": z["losses"].item(), "params0": z["params0"].item(),
                "params1": z["params1"].item(), "grads": z["grads"].item()}
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    import jax.numpy as jnp
    import numpy as np
    from dctseg.config import ModelConfig, TrainConfig
    from dctseg.losses import CRITERIA, total_loss
    from dctseg.models.clswiseformer import build_model
    from dctseg.train.optim import make_optimizer
    from dctseg.train.trainer import TrainState, make_train_step
    from dctseg.utils.torch_convert import convert_state_dict

    cfg = ModelConfig(dropout_rate=0.0, attn_dropout_rate=0.0,
                      init_conv_dropout=0.0)
    model = build_model(cfg)
    params0 = {"params": convert_state_dict(sd0)}
    # reference hyperparameters (train.py:137); poly LR at epoch-0 iter-0
    # equals the base LR on both sides
    tx = make_optimizer(TrainConfig(lr=2e-4, weight_decay=1e-5,
                                    amsgrad=True, end_epoch=1000),
                        steps_per_epoch=1000)
    xj = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    tj = jnp.asarray(target.astype(np.int32))
    ej = jnp.asarray(edge.astype(np.int32))

    step = jax.jit(make_train_step(model, tx, CRITERIA["softmax_dice"]))
    state = TrainState(params0, tx.init(params0), jnp.asarray(0, jnp.int32))
    new_state, metrics = step(state, xj, tj, ej, jax.random.PRNGKey(0))

    def loss_fn(p):
        outs = model.apply(p, xj, train=False)
        return total_loss(outs, tj, ej, CRITERIA["softmax_dice"])["loss"]

    grads = jax.jit(jax.grad(loss_fn))(params0)
    result = {
        "losses": {k: float(metrics[k]) for k in
                   ("loss", "end_loss", "s_loss", "edge_loss",
                    "mid_s_loss", "mid_edge_loss")},
        "params0": params0, "params1": jax.device_get(new_state.params),
        "grads": jax.device_get(grads),
    }
    if cache:
        host = jax.device_get(result)
        np.savez_compressed(
            cache, losses=np.array(host["losses"], dtype=object),
            params0=np.array(host["params0"], dtype=object),
            params1=np.array(host["params1"], dtype=object),
            grads=np.array(host["grads"], dtype=object))
    return result


def compare(t, j, out_path):
    import numpy as np
    from dctseg.utils.torch_convert import convert_state_dict

    report = {"losses": {}, "grads": {}, "deltas": {}}
    print(f"{'component':<14} {'torch':>12} {'jax':>12} {'rel err':>10}")
    worst_loss = 0.0
    for k, tv in t["losses"].items():
        jv = j["losses"][k]
        rel = abs(jv - tv) / max(abs(tv), 1e-12)
        worst_loss = max(worst_loss, rel)
        report["losses"][k] = {"torch": tv, "jax": jv, "rel_err": rel}
        print(f"{k:<14} {tv:>12.6f} {jv:>12.6f} {rel:>10.2e}")

    # gradients: convert torch grads tensor-by-tensor through the SAME
    # weight-layout converter, then compare against jax grads leaf-wise
    # layout conversion is a pure permutation/transpose (+ deconv flip), so
    # the same converter maps gradient tensors
    tg = convert_state_dict({k: v for k, v in t["grads"].items()
                             if v is not None})
    jg = j["grads"]["params"]
    flat_j = dict(_flatten(jg))
    flat_t = dict(_flatten(tg))
    assert flat_j.keys() == flat_t.keys(), (
        sorted(set(flat_j) ^ set(flat_t))[:10])

    # Per-tensor rel-L2 is meaningless for tensors whose true gradient is
    # ~zero: every conv bias directly followed by InstanceNorm has an
    # EXACTLY-zero gradient (the norm subtracts the per-channel mean, so
    # the output is bias-invariant) — both frameworks return ~1e-7 float
    # noise there, and noise/noise norm ratios are random.  Measure each
    # tensor's deviation against the GLOBAL gradient RMS instead (does the
    # disagreement matter at the scale of the model's gradient field?),
    # plus the global concatenated vector (magnitude-weighted cosine).
    sq_sum, n_total = 0.0, 0
    for gt in flat_t.values():
        g = np.asarray(gt, np.float64)
        sq_sum += float((g * g).sum())
        n_total += g.size
    global_rms = (sq_sum / n_total) ** 0.5
    dot = nj2 = nt2 = diff2 = 0.0
    table = {}
    worst_dev, worst_name = 0.0, ""
    for name, gjv in flat_j.items():
        gj = np.asarray(gjv, np.float64)
        gt = np.asarray(flat_t[name], np.float64)
        dot += float((gj * gt).sum())
        nj2 += float((gj * gj).sum())
        nt2 += float((gt * gt).sum())
        diff2 += float(((gj - gt) ** 2).sum())
        nt = np.linalg.norm(gt)
        rel = float(np.linalg.norm(gj - gt) / (nt + 1e-30))
        cos = float((gj * gt).sum()
                    / ((np.linalg.norm(gj) + 1e-30) * (nt + 1e-30)))
        # deviation at the model's gradient scale: ||diff|| vs the norm a
        # global-RMS-sized tensor of this shape would have
        dev = float(np.linalg.norm(gj - gt)
                    / (global_rms * gt.size ** 0.5))
        table[name] = {"rms": nt / gt.size ** 0.5, "rel_l2": rel,
                       "cos": cos, "dev_vs_global": dev}
        if dev > worst_dev:
            worst_dev, worst_name = dev, name
    g_rel = (diff2 / nt2) ** 0.5
    g_cos = dot / ((nj2 ** 0.5 + 1e-30) * (nt2 ** 0.5 + 1e-30))
    report["grads"] = {
        "n_tensors": len(flat_j), "global_rms": global_rms,
        "global_rel_l2": g_rel, "global_cosine": g_cos,
        "worst_dev_vs_global": worst_dev, "worst_tensor": worst_name,
        "per_tensor": table}
    print(f"grads: global rel-L2 {g_rel:.2e}, global cosine {g_cos:.10f}")
    print(f"grads: worst per-tensor deviation at global scale "
          f"{worst_dev:.2e} ({worst_name})")

    # near-zero-gradient agreement: conv biases feeding InstanceNorm have
    # EXACTLY-zero true gradients (bias-invariance of the norm); both
    # autodiffs must agree on WHICH tensors are degenerate like that
    def near_zero(flat):
        return {n for n, g in flat.items()
                if np.linalg.norm(np.asarray(g, np.float64))
                / np.asarray(g).size ** 0.5 < 1e-2 * global_rms}
    tz, jz = near_zero(flat_t), near_zero(flat_j)
    assert tz == jz, sorted(tz ^ jz)
    print(f"near-zero-gradient tensors: identical sets, {len(tz)} tensors "
          f"(conv biases feeding InstanceNorm etc.)")

    # Adam parameter deltas.  After one bias-corrected step each delta is
    # -lr * g/(|g|+eps') ~= -lr*sign(g): the update direction is the
    # gradient SIGN, so an element whose true gradient sits below the f32
    # noise floor flips on rounding by construction (|delta error| = 2*lr).
    # Compare where the sign is resolvable; the threshold sweep is recorded
    # so the cut is auditable (measured on this container: ZERO
    # disagreements above 0.1*global_rms = 1.1e-4, 42% of all params;
    # 1e-7 disagreement rate above 0.01*global_rms).
    p0 = dict(_flatten(convert_state_dict(t["sd0"])))
    p1 = dict(_flatten(convert_state_dict(t["sd1"])))
    q0 = dict(_flatten(j["params0"]["params"]))
    q1 = dict(_flatten(j["params1"]["params"]))
    lr = 2e-4
    gt_cat, err_cat = [], []
    for name in p0:
        dt = np.asarray(p1[name], np.float64) - np.asarray(p0[name],
                                                           np.float64)
        dj = np.asarray(q1[name], np.float64) - np.asarray(q0[name],
                                                           np.float64)
        gt_cat.append(np.abs(np.asarray(flat_t[name],
                                        np.float64)).ravel())
        err_cat.append((np.abs(dj - dt) / lr).ravel())
    gt_cat = np.concatenate(gt_cat)
    err_cat = np.concatenate(err_cat)
    sweep = {}
    for tau_rel in (1e-4, 1e-3, 1e-2, 1e-1):
        m = gt_cat > tau_rel * global_rms
        sweep[f"{tau_rel:.0e}"] = {
            "n": int(m.sum()), "frac_of_params": float(m.mean()),
            "frac_err_gt_1pct_lr": float((err_cat[m] > 0.01).mean()),
            "worst_err_over_lr": float(err_cat[m].max())}
    frac_bad = sweep["1e-01"]["frac_err_gt_1pct_lr"]
    report["deltas"] = {"lr": lr, "n_elems": int(gt_cat.size),
                        "threshold_sweep": sweep}
    for k, v in sweep.items():
        print(f"adam deltas |g|>{k}*rms: {v['n']} params "
              f"({v['frac_of_params']:.0%}), frac err>1%lr "
              f"{v['frac_err_gt_1pct_lr']:.2e}, worst "
              f"{v['worst_err_over_lr']:.2e}")

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, default=float)
    print(f"report -> {out_path}")

    assert worst_loss < 1e-4, f"loss rel err {worst_loss}"
    assert g_cos > 0.99999 and g_rel < 2e-3, (g_cos, g_rel)
    assert worst_dev < 3e-2, (worst_dev, worst_name)
    assert frac_bad < 1e-6, frac_bad
    print("TRAIN-STEP PARITY OK")


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}/{k}" if prefix else k)
    else:
        yield prefix, tree


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", required=True)
    p.add_argument("--workdir", default="/tmp/dctseg_parity_train")
    p.add_argument("--out", default="/tmp/parity_train_report.json")
    p.add_argument("--cache-dir", default="",
                   help="cache the (10-min) torch and jax step results as "
                        "npz for comparison-logic iteration")
    a = p.parse_args(argv)

    tc = os.path.join(a.cache_dir, "torch_step.npz") if a.cache_dir else ""
    jc = os.path.join(a.cache_dir, "jax_step.npz") if a.cache_dir else ""
    if a.cache_dir:
        os.makedirs(a.cache_dir, exist_ok=True)
    x, target, edge = make_inputs()
    t = torch_step(a.reference, a.workdir, x, target, edge, tc)
    print("torch step done:",
          {k: round(v, 5) for k, v in t["losses"].items()})
    j = jax_step(t["sd0"], x, target, edge, jc)
    print("jax step done:",
          {k: round(v, 5) for k, v in j["losses"].items()})
    compare(t, j, a.out)


if __name__ == "__main__":
    main()
