"""Unit tests for the driver-run bench artifact (bench.py).

The driver runs ``python bench.py`` at the end of every round and records
its one-line JSON; a logic regression there costs a round's artifact, so
the ladder/JSON plumbing gets CPU coverage here with the heavy pieces
(full-size model, 240^3 tiled inference, accelerator probe) stubbed out.
The real chip numbers live in docs/PERF.md; this only proves the harness.
"""

import json

import jax.numpy as jnp
import pytest

import bench


class _FakeModel:
    def init(self, key, x0, train=False):
        # Non-empty pytree so jax.jit has something array-like to return.
        return {"w": jnp.zeros((1,))}


class _FakePredictor:
    """Stands in for dctseg.infer.engine.Predictor: records which
    (quantize, V) rungs ran and optionally fails selected quant modes."""

    calls = []
    fail_quants = set()

    def __init__(self, model, params):
        self.quant = getattr(model, "quant", None)

    def tiled_probs_batch(self, group):
        if self.quant in self.fail_quants:
            raise RuntimeError("forced rung failure (test)")
        v = group.shape[0]
        type(self).calls.append((self.quant, v))
        return jnp.zeros((v, 1, 1, 1, 1))


@pytest.fixture
def bench_env(monkeypatch):
    def fake_build_model(cfg):
        m = _FakeModel()
        m.quant = cfg.quantize
        return m

    _FakePredictor.calls = []
    _FakePredictor.fail_quants = set()
    monkeypatch.setattr(bench, "_wait_for_accelerator", lambda: None)
    monkeypatch.setattr("dctseg.models.clswiseformer.build_model",
                        fake_build_model)
    monkeypatch.setattr("dctseg.infer.engine.Predictor", _FakePredictor)
    # jax_setup.enable_compile_cache is idempotent/cheap on CPU; leave it.
    return _FakePredictor


def _run_bench(capsys):
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_bench_emits_contract_json_top_rung(bench_env, capsys):
    rec = _run_bench(capsys)
    # Driver contract: one JSON line with these fields.
    assert rec["metric"] == "sliding_window_inference"
    assert rec["unit"] == "volumes/sec"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert rec["rounds"] == sorted(rec["rounds"])
    assert rec["median"] == rec["rounds"][1]
    assert rec["value"] == rec["rounds"][-1]
    # Top rung is the measured-fastest config: int8, V=2 paired.
    assert rec["quantize"] == "int8"
    assert rec["paired_volumes"] == 2
    assert all(q == "int8" for q, _ in bench_env.calls)
    assert all(v == 2 for _, v in bench_env.calls)


def test_bench_falls_back_to_bf16_when_int8_rung_fails(bench_env, capsys):
    bench_env.fail_quants = {"int8"}
    rec = _run_bench(capsys)
    assert rec["quantize"] == "bfloat16"
    assert rec["paired_volumes"] == 3
    assert rec["value"] > 0


def test_bench_raises_when_every_rung_fails(bench_env):
    bench_env.fail_quants = {"int8", "none"}  # ModelConfig default is "none"
    with pytest.raises(RuntimeError, match="every ladder rung failed"):
        bench.main()
