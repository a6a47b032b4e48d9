"""Deep-supervision heads producing per-region 2-class probability maps.

Semantic head (SuperviseLabel.py:7-81): conv(C->32) -> conv(32->2) ->
trilinear x8 upsample -> softmax, per region {'01','02','04'}.
Edge head (EdgeSuperviseLabel.py:5-76): conv(C->8) -> conv(8->2) ->
trilinear x4 upsample -> softmax.

Both are applied twice in the reference: on the decoupled features ("mid"
supervision, cls_wise_former.py:332-333) and on the coupled, scattered-back
features ("final", :545-546).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dctseg.models.layers import Conv3d
from dctseg.ops.resize import trilinear_upsample


class SuperviseHead(nn.Module):
    """One shared-structure head for the three regions.

    Returns a dict {'01','02','04'} of (B, S*scale, S*scale, S*scale, 2)
    probability maps.
    """
    mid_channels: int          # 32 for semantic heads, 8 for edge heads
    upsample_scale: int        # 8 for semantic (16^3->128^3), 4 for edge
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fea_01, fea_02, fea_04):
        out = {}
        for key, fea in (("01", fea_01), ("02", fea_02), ("04", fea_04)):
            y = Conv3d(self.mid_channels, dtype=self.dtype,
                       name=f"supervise_{key}")(fea)
            y = Conv3d(2, dtype=self.dtype, name=f"down_{key}")(y)
            y = trilinear_upsample(y.astype(jnp.float32), self.upsample_scale)
            out[key] = nn.softmax(y, axis=-1)
        return out
