"""ResNet backbone (flax.linen, NHWC).

Parity target: mmdet models/backbones/resnet.py:671 (ResNet-18/34/50/101/152,
style='pytorch': stride on the 3x3 conv of each bottleneck) with the
detection-specific switches the reference configs use:
`frozen_stages` (stop-gradient over early stages) and `norm_eval`
(BN uses running stats during training — the TinyPerson configs freeze
backbone BN, e.g. configs2/TinyPerson/base/faster_rcnn_r50_fpn_1x_
TinyPerson640.py:17 requires_grad=False).

TPU notes: convs run in NHWC so XLA tiles them straight onto the MXU;
bfloat16-friendly (params stay f32, compute dtype configurable).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...utils.registry import BACKBONES

__all__ = ["ResNet", "ResNeXt"]

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    norm_use_running_average: bool = True
    conv_ws: bool = False    # gn+ws family: weight-standardized convs

    def _conv3(self, feats, stride=1):
        if self.conv_ws:
            from ..utils import WSConv
            return WSConv(feats, (3, 3), strides=(stride, stride),
                          padding=1, dtype=self.dtype)
        return nn.Conv(feats, (3, 3), strides=(stride, stride), padding=1,
                       use_bias=False, dtype=self.dtype)

    @nn.compact
    def __call__(self, x):
        identity = x
        y = self._conv3(self.planes, self.stride)(x)
        y = nn.BatchNorm(use_running_average=self.norm_use_running_average,
                         dtype=self.dtype)(y)
        y = nn.relu(y)
        y = self._conv3(self.planes)(y)
        y = nn.BatchNorm(use_running_average=self.norm_use_running_average,
                         dtype=self.dtype)(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            identity = nn.BatchNorm(
                use_running_average=self.norm_use_running_average,
                dtype=self.dtype)(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32
    norm_use_running_average: bool = True
    groups: int = 1          # ResNeXt: grouped 3x3 (mmdet backbones/resnext.py)
    base_width: int = 64
    with_dcn: bool = False           # mmdet dcn=dict(type='DCN'/'DCNv2')
    dcn_modulated: bool = False
    gcb_ratio: float = 0.0           # GCNet ContextBlock after conv3
    conv_ws: bool = False            # gn+ws: weight-standardized 3x3

    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        if self.groups == 1:
            mid = self.planes
        else:
            mid = (self.planes * self.base_width // 64) * self.groups
        y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=self.norm_use_running_average,
                         dtype=self.dtype)(y)
        y = nn.relu(y)
        # pytorch style: stride on the 3x3
        if self.with_dcn:
            from ...ops.dcn import DeformConv2d
            y = DeformConv2d(mid, kernel_size=3, stride=self.stride,
                             modulated=self.dcn_modulated, dtype=self.dtype,
                             name="dcn_conv2")(y)
        elif self.conv_ws:
            from ..utils import WSConv
            y = WSConv(mid, (3, 3), strides=(self.stride, self.stride),
                       padding=1, feature_group_count=self.groups,
                       dtype=self.dtype)(y)
        else:
            y = nn.Conv(mid, (3, 3), strides=(self.stride, self.stride),
                        padding=1, use_bias=False, dtype=self.dtype,
                        feature_group_count=self.groups)(y)
        y = nn.BatchNorm(use_running_average=self.norm_use_running_average,
                         dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = nn.BatchNorm(use_running_average=self.norm_use_running_average,
                         dtype=self.dtype)(y)
        if self.gcb_ratio > 0:
            y = ContextBlock(ratio=self.gcb_ratio, dtype=self.dtype,
                             name="gcb")(y)
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            identity = nn.BatchNorm(
                use_running_average=self.norm_use_running_average,
                dtype=self.dtype)(identity)
        return nn.relu(y + identity)


class GeneralizedAttention(nn.Module):
    """Empirical-attention plugin (mmcv cnn/bricks/generalized_attention.py,
    reference configs/empirical_attention): multi-head self-attention over
    the feature map inserted into ResNet stages. The reference's four
    attention-term toggles ('1111' etc.) reduce, in its best-performing
    configs, to query-key content attention plus a learned relative-position
    bias — implemented here with downsampled keys (kv_stride) so the
    (HW x HW) score matrix stays small; zero-init output proj keeps the
    block an identity at init."""
    num_heads: int = 8
    kv_stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = self.num_heads
        dim = max(c // heads, 1)
        q = nn.Conv(heads * dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="query")(x)
        kv = x[:, ::self.kv_stride, ::self.kv_stride, :]
        kh, kw = kv.shape[1:3]
        k = nn.Conv(heads * dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="key")(kv)
        v = nn.Conv(heads * dim, (1, 1), use_bias=False, dtype=self.dtype,
                    name="value")(kv)
        q = q.reshape(b, h * w, heads, dim)
        k = k.reshape(b, kh * kw, heads, dim)
        v = v.reshape(b, kh * kw, heads, dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(dim, q.dtype))
        # learned relative-position bias over the (dy, dx) offset grid
        qy = jnp.arange(h)[:, None] // 1
        ky = jnp.arange(kh)[None, :] * self.kv_stride
        qx = jnp.arange(w)[:, None]
        kx = jnp.arange(kw)[None, :] * self.kv_stride
        dy = (qy - ky) + (kh - 1) * self.kv_stride      # >= 0
        dx = (qx - kx) + (kw - 1) * self.kv_stride
        max_dy = h + (kh - 1) * self.kv_stride
        max_dx = w + (kw - 1) * self.kv_stride
        bias_y = self.param("rel_bias_y", nn.initializers.zeros,
                            (heads, max_dy)).astype(q.dtype)
        bias_x = self.param("rel_bias_x", nn.initializers.zeros,
                            (heads, max_dx)).astype(q.dtype)
        by = bias_y[:, dy]                               # (heads, H, KH)
        bx = bias_x[:, dx]                               # (heads, W, KW)
        pos = (by[:, :, None, :, None] + bx[:, None, :, None, :]).reshape(
            heads, h * w, kh * kw)
        attn = jax.nn.softmax(logits + pos[None], axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w,
                                                            heads * dim)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                      dtype=self.dtype, name="proj")(out)
        return x + out


class ContextBlock(nn.Module):
    """GCNet global-context block (mmcv cnn/bricks/context_block.py, used by
    the reference's configs/gcnet plugins=[ContextBlock]): softmax attention
    pooling over all positions -> bottleneck transform (LN + relu) ->
    broadcast add. Zero-init output conv keeps identity at init."""
    ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        attn = nn.Conv(1, (1, 1), dtype=self.dtype,
                       name="conv_mask")(x)                 # (B, H, W, 1)
        attn = jax.nn.softmax(attn.reshape(b, h * w, 1), axis=1)
        ctx = jnp.einsum("bnc,bn1->bc", x.reshape(b, h * w, c),
                         attn)                              # (B, C)
        planes = max(int(c * self.ratio), 1)
        t = nn.Dense(planes, dtype=self.dtype, name="channel_add_fc1")(ctx)
        t = nn.relu(nn.LayerNorm(dtype=self.dtype)(t))
        t = nn.Dense(c, kernel_init=nn.initializers.zeros,
                     dtype=self.dtype, name="channel_add_fc2")(t)
        return x + t[:, None, None, :]


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    frozen_stages: int = -1          # handled by the optimizer mask upstream
    norm_eval: bool = True           # BN always uses running stats
    base_channels: int = 64
    groups: int = 1
    base_width: int = 64
    dcn: Optional[dict] = None           # dict(type='DCN'|'DCNv2', ...)
    stage_with_dcn: Sequence[bool] = (False, False, False, False)
    conv_ws: bool = False                # gn+ws family
    plugins: Optional[Sequence[dict]] = None  # [dict(cfg=dict(type='ContextBlock', ratio=r), stages=(...))]
    dtype: Any = jnp.float32

    def _stage_gcb_ratio(self, i: int) -> float:
        for pl in (self.plugins or ()):
            cfg = dict(pl.get("cfg", {}))
            if cfg.get("type") == "ContextBlock":
                stages = pl.get("stages", (True,) * self.num_stages)
                if stages[i]:
                    return float(cfg.get("ratio", 0.25))
        return 0.0

    def _stage_attention(self, i: int) -> Optional[dict]:
        for pl in (self.plugins or ()):
            cfg = dict(pl.get("cfg", {}))
            if cfg.get("type") == "GeneralizedAttention":
                stages = pl.get("stages", (True,) * self.num_stages)
                if stages[i]:
                    return cfg
        return None

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_name, stage_blocks = ARCH_SETTINGS[self.depth]
        block_cls = BasicBlock if block_name == "basic" else Bottleneck
        expansion = 1 if block_name == "basic" else 4
        use_ra = (not train) or self.norm_eval

        # stem: 7x7/2 conv + BN + relu + 3x3/2 maxpool
        x = nn.Conv(self.base_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=use_ra, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = self.base_channels
        in_ch = self.base_channels
        for i in range(self.num_stages):
            nblocks = stage_blocks[i]
            stride = self.strides[i]
            for j in range(nblocks):
                s = stride if j == 0 else 1
                need_down = (j == 0) and (s != 1 or in_ch != planes * expansion)
                kwargs = {}
                if block_cls is Bottleneck:
                    kwargs = dict(groups=self.groups,
                                  base_width=self.base_width,
                                  with_dcn=bool(self.dcn)
                                  and bool(self.stage_with_dcn[i]),
                                  dcn_modulated=(self.dcn or {}).get(
                                      "type") == "DCNv2",
                                  gcb_ratio=self._stage_gcb_ratio(i),
                                  conv_ws=self.conv_ws)
                else:
                    kwargs = dict(conv_ws=self.conv_ws)
                x = block_cls(planes=planes, stride=s, downsample=need_down,
                              dtype=self.dtype,
                              norm_use_running_average=use_ra,
                              name=f"layer{i + 1}_block{j}", **kwargs)(x)
                in_ch = planes * expansion
            attn_cfg = self._stage_attention(i)
            if attn_cfg is not None:
                x = GeneralizedAttention(
                    num_heads=int(attn_cfg.get("num_heads", 8)),
                    kv_stride=int(attn_cfg.get("kv_stride", 2)),
                    dtype=self.dtype, name=f"attn{i + 1}")(x)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


@BACKBONES.register_module()
class ResNeXt(ResNet):
    """ResNeXt (mmdet models/backbones/resnext.py parity): grouped 3x3 convs
    in the bottleneck; configs pass groups=32, base_width=4."""
    groups: int = 32
    base_width: int = 4
