"""Model profiling: parameter count, FLOPs, and runtime tracing.

Replaces the reference's thop-based ``__main__`` blocks
(cls_wise_former.py:783-801, Unet_skipconnection.py:147-161: FLOPs/params on
a (1,4,128^3) input) with XLA's own cost analysis, plus a ``jax.profiler``
trace context for on-device timeline capture (reference had only wall-clock
timing with cuda.synchronize, predict_cls.py:137-144).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, Optional

import jax


def count_params(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def flops_of(fn: Callable, *example_args) -> Dict[str, float]:
    """Compile ``fn`` and read XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
    }


def profile_model(model, params, x) -> Dict[str, float]:
    """FLOPs/params for a forward pass (thop.profile equivalent)."""
    stats = flops_of(lambda p, x: model.apply(p, x, train=False)[0],
                     params, x)
    stats["params"] = count_params(params)
    return stats


def clever_format(value: float) -> str:
    """thop.clever_format-style human units."""
    for unit, div in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if abs(value) >= div:
            return f"{value / div:.3f}{unit}"
    return f"{value:.3f}"


@contextlib.contextmanager
def trace(log_dir: Optional[str] = "/tmp/dctseg_trace"):
    """On-device profiler trace (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
