"""CMU (VGG-19) two-branch OpenPose network.

TPU-native flax rebuild of the reference graph builder
(``tf_pose/network_cmu.py:~1-110``): VGG-19 prefix conv1_1..conv4_2,
CPM feature convs conv4_3_CPM(256)/conv4_4_CPM(128), stage 1 branches
``conv5_x_CPM_L{1,2}`` (L1 -> 38 PAF, L2 -> 19 heat), stages 2..6 each
consuming concat(prev L1, prev L2, conv4_4_CPM) through seven 7x7/1x1
convs ``Mconv1..7_stage{n}_L{1,2}``. Output ``concat_stage7`` =
concat(heat 19, paf 38) = 57 channels at stride 8.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from tfpose_tpu.models.layers import Conv, max_pool


class CmuNetwork(nn.Module):
    """VGG-19 CPM network. Input NHWC in [-0.5, 0.5]; output dict with
    per-stage branch outputs and the 57-channel ``concat_stage7``."""

    dtype: Any = jnp.float32
    num_stages: int = 6
    quant: str = "none"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        q = self.quant
        x = x.astype(d)

        # VGG-19 prefix
        for name, ch in (("conv1_1", 64), ("conv1_2", 64)):
            x = Conv(ch, (3, 3), dtype=d, quant=q, name=name)(x)
        x = max_pool(x)
        for name, ch in (("conv2_1", 128), ("conv2_2", 128)):
            x = Conv(ch, (3, 3), dtype=d, quant=q, name=name)(x)
        x = max_pool(x)
        for name in ("conv3_1", "conv3_2", "conv3_3", "conv3_4"):
            x = Conv(256, (3, 3), dtype=d, quant=q, name=name)(x)
        x = max_pool(x)
        for name in ("conv4_1", "conv4_2"):
            x = Conv(512, (3, 3), dtype=d, quant=q, name=name)(x)
        x = Conv(256, (3, 3), dtype=d, quant=q, name="conv4_3_CPM")(x)
        feat = Conv(128, (3, 3), dtype=d, quant=q, name="conv4_4_CPM")(x)

        # stage 1
        def stage1_branch(li: int, out_ch: int, h):
            for i in (1, 2, 3):
                h = Conv(128, (3, 3), dtype=d, quant=q,
                         name=f"conv5_{i}_CPM_L{li}")(h)
            h = Conv(512, (1, 1), dtype=d, quant=q, name=f"conv5_4_CPM_L{li}")(h)
            h = Conv(out_ch, (1, 1), relu=False, dtype=d, quant=q,
                     name=f"conv5_5_CPM_L{li}")(h)
            return h

        paf = stage1_branch(1, 38, feat)
        heat = stage1_branch(2, 19, feat)
        stages = [(paf, heat)]

        # stages 2..num_stages
        for s in range(2, self.num_stages + 1):
            inp = jnp.concatenate([paf, heat, feat], axis=-1)

            def refine_branch(li: int, out_ch: int, h):
                for i in (1, 2, 3, 4, 5):
                    h = Conv(128, (7, 7), dtype=d, quant=q,
                             name=f"Mconv{i}_stage{s}_L{li}")(h)
                h = Conv(128, (1, 1), dtype=d, quant=q,
                         name=f"Mconv6_stage{s}_L{li}")(h)
                h = Conv(out_ch, (1, 1), relu=False, dtype=d, quant=q,
                         name=f"Mconv7_stage{s}_L{li}")(h)
                return h

            paf = refine_branch(1, 38, inp)
            heat = refine_branch(2, 19, inp)
            stages.append((paf, heat))

        out = jnp.concatenate([heat, paf], axis=-1)  # (N, H/8, W/8, 57)
        return {"concat_stage7": out, "stages": stages}
