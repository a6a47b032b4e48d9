"""Golden tests for the loss suite against torch-computed oracles.

Each oracle re-derives the reference formula (documented in dctseg/losses.py
with file:line sources) in torch on NCDHW tensors, so a parity failure in our
channels-last JAX implementations is caught directly.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from dctseg import losses


def _rand_probs(shape, seed):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=shape).astype(np.float32)
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    return (e / e.sum(axis=-1, keepdims=True)).astype(np.float32)


def torch_dice_loss(output, target, num_cls, eps=1e-7):
    target = target.float()
    dice = 0.0
    for i in range(num_cls):
        num = torch.sum(output[:, i] * target[:, i])
        l = torch.sum(output[:, i])
        r = torch.sum(target[:, i])
        dice = dice + 2.0 * num / (l + r + eps)
    return 1.0 - dice / num_cls


def torch_weighted_ce(output, target, num_cls):
    target = target.float()
    B, _, H, W, Z = output.size()
    cross = 0.0
    for i in range(num_cls):
        ti = target[:, i]
        oi = output[:, i]
        w = 1.0 - torch.sum(ti, (1, 2, 3)) / torch.sum(target, (1, 2, 3, 4))
        w = w.reshape(-1, 1, 1, 1)
        cross = cross + (-w * ti * torch.log(torch.clamp(oi, 0.005, 1.0)))
    return torch.mean(cross)


def test_softmax_dice_matches_oracle():
    probs = _rand_probs((2, 6, 6, 6, 4), seed=0)
    rng = np.random.default_rng(1)
    target = rng.integers(0, 4, size=(2, 6, 6, 6)).astype(np.int32)

    ours = float(losses.softmax_dice(jnp.asarray(probs), jnp.asarray(target)))

    pt = torch.from_numpy(probs).permute(0, 4, 1, 2, 3)
    onehot = F.one_hot(torch.from_numpy(target).long(), 4)
    onehot = onehot.permute(0, 4, 1, 2, 3)
    oracle = (torch_dice_loss(pt, onehot, 4)
              + torch_weighted_ce(pt, onehot, 4))
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5)


def test_separate_loss_matches_oracle():
    rng = np.random.default_rng(2)
    target = rng.integers(0, 4, size=(1, 8, 8, 8)).astype(np.int32)
    out = {k: _rand_probs((1, 8, 8, 8, 2), seed=i)
           for i, k in enumerate(("01", "02", "04"))}
    ours = float(losses.get_separate_loss(
        {k: jnp.asarray(v) for k, v in out.items()}, jnp.asarray(target)))

    tt = torch.from_numpy(target).long()
    oracle = 0.0
    for k, lab in (("01", 1), ("02", 2), ("04", 3)):
        bin_t = (tt == lab).long()
        oh = F.one_hot(bin_t, 2).permute(0, 4, 1, 2, 3)
        p = torch.from_numpy(out[k]).permute(0, 4, 1, 2, 3)
        oracle = oracle + torch_weighted_ce(p, oh, 2) + torch_dice_loss(p, oh, 2)
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5)


def test_edge_separate_loss_decode_table():
    """Edge code decode matches utils/tools.py:174-218:
    r1 <- {1,5,6,7}, r2 <- {2,5,6,8}, r4 <- {4,5,7,8}."""
    rng = np.random.default_rng(3)
    edge = rng.choice([0, 1, 2, 4, 5, 6, 7, 8], size=(1, 8, 8, 8)).astype(
        np.int32)
    out = {k: _rand_probs((1, 8, 8, 8, 2), seed=10 + i)
           for i, k in enumerate(("01", "02", "04"))}
    ours = float(losses.get_edge_separate_loss(
        {k: jnp.asarray(v) for k, v in out.items()}, jnp.asarray(edge)))

    et = torch.from_numpy(edge).long()
    oracle = 0.0
    for k, pos in (("01", (1, 5, 6, 7)), ("02", (2, 5, 6, 8)),
                   ("04", (4, 5, 7, 8))):
        bin_t = torch.zeros_like(et)
        for c in pos:
            bin_t = bin_t | (et == c).long()
        oh = F.one_hot(bin_t, 2).permute(0, 4, 1, 2, 3)
        p = torch.from_numpy(out[k]).permute(0, 4, 1, 2, 3)
        oracle = oracle + torch_weighted_ce(p, oh, 2) + torch_dice_loss(p, oh, 2)
    np.testing.assert_allclose(ours, float(oracle), rtol=1e-5)


def test_total_loss_components_sum():
    rng = np.random.default_rng(4)
    target = rng.integers(0, 4, size=(1, 8, 8, 8)).astype(np.int32)
    edge = rng.choice([0, 1, 2, 4, 5, 6, 7, 8], size=(1, 8, 8, 8)).astype(
        np.int32)
    seg = jnp.asarray(_rand_probs((1, 8, 8, 8, 4), seed=5))
    dicts = []
    for j in range(4):
        dicts.append({k: jnp.asarray(_rand_probs((1, 8, 8, 8, 2),
                                                 seed=20 + 3 * j + i))
                      for i, k in enumerate(("01", "02", "04"))})
    comp = losses.total_loss((seg, *dicts), jnp.asarray(target),
                             jnp.asarray(edge))
    total = (comp["end_loss"] + comp["s_loss"] + comp["edge_loss"]
             + comp["mid_s_loss"] + comp["mid_edge_loss"])
    np.testing.assert_allclose(float(comp["loss"]), float(total), rtol=1e-6)


def test_total_loss_accepts_every_criterion():
    """--criterion is user-selectable on the train driver; all 5 must flow
    through total_loss (the alternate ones return (loss, dice...) tuples
    like the reference, whose train.py:206 unpacks loss only — total_loss
    must scalarize, not crash on tuple+scalar)."""
    rng = np.random.default_rng(8)
    target = jnp.asarray(rng.integers(0, 4, size=(1, 8, 8, 8)), jnp.int32)
    edge = jnp.asarray(rng.choice([0, 1, 2, 4, 5, 6, 7, 8],
                                  size=(1, 8, 8, 8)), jnp.int32)
    seg = jnp.asarray(_rand_probs((1, 8, 8, 8, 4), seed=9))
    dicts = [{k: jnp.asarray(_rand_probs((1, 8, 8, 8, 2),
                                         seed=40 + 3 * j + i))
              for i, k in enumerate(("01", "02", "04"))} for j in range(4)]
    for name, crit in losses.CRITERIA.items():
        comp = losses.total_loss((seg, *dicts), target, edge, crit)
        assert comp["loss"].shape == (), name
        assert np.isfinite(float(comp["loss"])), name


def test_alternate_criteria_run():
    probs = jnp.asarray(_rand_probs((1, 6, 6, 6, 4), seed=6))
    rng = np.random.default_rng(7)
    target = jnp.asarray(
        rng.choice([0, 1, 2, 4], size=(1, 6, 6, 6)).astype(np.int32))
    for name in ("softmax_dice2", "sigmoid_dice", "Generalized_dice",
                 "Dual_focal_loss"):
        out = losses.CRITERIA[name](
            probs[..., :3] if name == "sigmoid_dice" else probs, target)
        val = out[0] if isinstance(out, tuple) else out
        assert np.isfinite(float(val)), name
