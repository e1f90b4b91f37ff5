"""Torch re-statement of the COMPLETE reference forward pass (test helper).

A clean-room NCHW re-implementation of the reference network exactly as the
reference composes it — Detectron2 ResNet-50/101 (FrozenBN, stride-in-1x1,
caffe-style stem) -> FPN over res3-5 with LastLevelP6P7 -> DAFNe head
(GN or per-level-BN towers, shared conv weights, per-level Scale,
center-to-corner strategy) — with module names chosen so a Detectron2-style
DAFNe checkpoint state_dict loads with `strict=True`.

Re-stated contracts (clean-room, from the cited reference structure):
  - ResNet/FrozenBN/stem:   detectron2 v0.5 `modeling/backbone/resnet.py`
                            semantics as used via
                            /root/reference/dafne/modeling/backbone/fpn.py:58-91
                            (BasicStem 7x7/2 + 3x3/2 maxpool; BottleneckBlock
                            with stride on the 1x1; FrozenBN eps=1e-5)
  - FPN assembly:           d2 FPN (lateral 1x1 + nearest-2x top-down sum +
                            output 3x3) + LastLevelP6P7 on p5
                            (/root/reference/dafne/modeling/backbone/fpn.py:16-37)
  - DAFNe head:             /root/reference/dafne/modeling/dafne/dafne.py:167-494
                            (towers, ModuleListDial BN, Scale, cls_logits /
                            ctrness / corners_pred / center_pred wiring,
                            center-to-corner: reg = center.repeat(4) + delta)

Used by tests/test_full_forward_parity.py to catch composed-forward drift
(conv padding conventions, FrozenBN epsilon, P6/P7 wiring, Scale placement)
that per-op golden tests cannot see.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn

RESNET_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


class FrozenBN(nn.Module):
    """d2 FrozenBatchNorm2d semantics: affine with fixed running stats,
    eps=1e-5; all four tensors are state_dict entries."""

    def __init__(self, c, eps=1e-5):
        super().__init__()
        self.eps = eps
        self.register_buffer("weight", torch.ones(c))
        self.register_buffer("bias", torch.zeros(c))
        self.register_buffer("running_mean", torch.zeros(c))
        self.register_buffer("running_var", torch.ones(c))

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale.view(1, -1, 1, 1) + bias.view(1, -1, 1, 1)


class C2Conv(nn.Conv2d):
    """Conv2d with an attached `.norm` submodule applied after the conv
    (d2's Conv2d wrapper convention -> keys `<name>.weight`,
    `<name>.norm.weight`, ...)."""

    def __init__(self, cin, cout, k, stride=1, padding=0, bias=False,
                 norm=None):
        super().__init__(cin, cout, k, stride=stride, padding=padding,
                         bias=bias)
        self.norm = norm

    def forward(self, x):
        x = self._conv_forward(x, self.weight, self.bias)
        if self.norm is not None:
            x = self.norm(x)
        return x


class Bottleneck(nn.Module):
    """1x1(stride) -> 3x3 -> 1x1 with FrozenBN after each conv; projection
    shortcut on channel/stride change; relu after the residual add."""

    def __init__(self, cin, cout, cmid, stride=1):
        super().__init__()
        if cin != cout or stride != 1:
            self.shortcut = C2Conv(cin, cout, 1, stride=stride,
                                   norm=FrozenBN(cout))
        else:
            self.shortcut = None
        # stride_in_1x1=True (caffe/MSRA convention, d2 default)
        self.conv1 = C2Conv(cin, cmid, 1, stride=stride, norm=FrozenBN(cmid))
        self.conv2 = C2Conv(cmid, cmid, 3, padding=1, norm=FrozenBN(cmid))
        self.conv3 = C2Conv(cmid, cout, 1, norm=FrozenBN(cout))

    def forward(self, x):
        sc = self.shortcut(x) if self.shortcut is not None else x
        y = F.relu(self.conv1(x))
        y = F.relu(self.conv2(y))
        y = self.conv3(y)
        return F.relu(y + sc)


class Stem(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = C2Conv(3, 64, 7, stride=2, padding=3, norm=FrozenBN(64))

    def forward(self, x):
        x = F.relu(self.conv1(x))
        return F.max_pool2d(x, kernel_size=3, stride=2, padding=1)


class TorchResNet(nn.Module):
    """d2-structured trunk: stem + res2..res5, returns {res3, res4, res5}."""

    def __init__(self, depth):
        super().__init__()
        self.stem = Stem()
        cin = 64
        for stage, nblocks in enumerate(RESNET_BLOCKS[depth], start=2):
            cmid = 64 * 2 ** (stage - 2)
            cout = cmid * 4
            blocks = []
            for b in range(nblocks):
                stride = 2 if (stage > 2 and b == 0) else 1
                blocks.append(Bottleneck(cin, cout, cmid, stride))
                cin = cout
            self.add_module(f"res{stage}", nn.Sequential(*blocks))

    def forward(self, x):
        x = self.stem(x)
        x = self.res2(x)
        c3 = self.res3(x)
        c4 = self.res4(c3)
        c5 = self.res5(c4)
        return c3, c4, c5


class TopBlock(nn.Module):
    """LastLevelP6P7 (fpn.py:16-37): p6 = conv(p5); p7 = conv(relu(p6))."""

    def __init__(self, c):
        super().__init__()
        self.p6 = nn.Conv2d(c, c, 3, 2, 1)
        self.p7 = nn.Conv2d(c, c, 3, 2, 1)

    def forward(self, p5):
        p6 = self.p6(p5)
        p7 = self.p7(F.relu(p6))
        return p6, p7


class TorchFPNBackbone(nn.Module):
    """d2 FPN over res3-5 + P6P7, with d2 checkpoint key names
    (fpn_lateral{l}, fpn_output{l}, top_block.p6/p7, bottom_up.*)."""

    def __init__(self, depth, c=256):
        super().__init__()
        self.bottom_up = TorchResNet(depth)
        for lvl, cin in zip((3, 4, 5), (512, 1024, 2048)):
            self.add_module(f"fpn_lateral{lvl}", nn.Conv2d(cin, c, 1))
            self.add_module(f"fpn_output{lvl}", nn.Conv2d(c, c, 3, 1, 1))
        self.top_block = TopBlock(c)

    def forward(self, x):
        c3, c4, c5 = self.bottom_up(x)
        l5 = self.fpn_lateral5(c5)
        l4 = self.fpn_lateral4(c4) + F.interpolate(l5, scale_factor=2,
                                                   mode="nearest")
        l3 = self.fpn_lateral3(c3) + F.interpolate(l4, scale_factor=2,
                                                   mode="nearest")
        p5 = self.fpn_output5(l5)
        p4 = self.fpn_output4(l4)
        p3 = self.fpn_output3(l3)
        p6, p7 = self.top_block(p5)
        return [p3, p4, p5, p6, p7]


class Scale(nn.Module):
    def __init__(self, init_value=1.0):
        super().__init__()
        self.scale = nn.Parameter(torch.full((1,), float(init_value)))

    def forward(self, x):
        return x * self.scale


class Dial(nn.ModuleList):
    """ModuleListDial semantics (dafne.py:56-66): each forward call applies
    the next module, cycling — one BatchNorm per FPN level."""

    def __init__(self, modules):
        super().__init__(modules)
        self.cur = 0

    def forward(self, x):
        y = self[self.cur](x)
        self.cur = (self.cur + 1) % len(self)
        return y


def _tower(num_convs, c, norm, num_levels):
    layers = []
    for _ in range(num_convs):
        layers.append(nn.Conv2d(c, c, 3, 1, 1, bias=True))
        if norm == "GN":
            layers.append(nn.GroupNorm(c // 8, c))
        elif norm == "BN":
            layers.append(Dial([nn.BatchNorm2d(c) for _ in range(num_levels)]))
        layers.append(nn.ReLU())
    return nn.Sequential(*layers)


class TorchDAFNeHead(nn.Module):
    """The headline configuration of the reference head (dafne.py:167-494):
    center-to-corner, CORNER_TOWER_ON_CENTER_TOWER, oriented centerness on
    the corners tower, USE_SCALE, no share tower / deformable."""

    def __init__(self, num_classes, num_levels=5, c=256, num_convs=4,
                 norm="GN"):
        super().__init__()
        self.cls_tower = _tower(num_convs, c, norm, num_levels)
        self.corners_tower = _tower(num_convs, c, norm, num_levels)
        self.center_tower = _tower(num_convs, c, norm, num_levels)
        self.cls_logits = nn.Conv2d(c, num_classes, 3, 1, 1)
        self.ctrness = nn.Conv2d(c, 1, 3, 1, 1)
        self.corners_pred = nn.Conv2d(c, 8, 3, 1, 1)
        self.center_pred = nn.Conv2d(c, 2, 3, 1, 1)
        self.scales = nn.ModuleList([Scale(1.0) for _ in range(num_levels)])

    def forward(self, feats):
        logits, corners, ctrness = [], [], []
        for level, feat in enumerate(feats):
            cls_t = self.cls_tower(feat)
            cent_t = self.center_tower(feat)
            corn_t = self.corners_tower(cent_t)  # CORNER_TOWER_ON_CENTER_TOWER
            reg_center = self.center_pred(cent_t)
            delta = self.corners_pred(corn_t)
            reg_corners = reg_center.repeat(1, 4, 1, 1) + delta
            reg_corners = self.scales[level](reg_corners)
            logits.append(self.cls_logits(cls_t))
            corners.append(reg_corners)
            ctrness.append(self.ctrness(corn_t))  # CTR_ON_REG
        return logits, corners, ctrness


class _ProposalGenerator(nn.Module):
    def __init__(self, head):
        super().__init__()
        self.dafne_head = head


class TorchDAFNe(nn.Module):
    """Full reference network: normalize -> ResNet -> FPN -> head.  Its
    state_dict keys are exactly a Detectron2 DAFNe checkpoint's."""

    def __init__(self, depth=50, num_classes=15, norm="GN"):
        super().__init__()
        self.backbone = TorchFPNBackbone(depth)
        self.proposal_generator = _ProposalGenerator(
            TorchDAFNeHead(num_classes, norm=norm)
        )
        self.register_buffer("pixel_mean", torch.zeros(3))
        self.register_buffer("pixel_std", torch.ones(3))

    def forward(self, x):
        x = (x - self.pixel_mean.view(1, 3, 1, 1)) / self.pixel_std.view(
            1, 3, 1, 1
        )
        feats = self.backbone(x)
        return self.proposal_generator.dafne_head(feats)


# ---------------------------------------------------------------------------
# ResNet-LPF trunk (anti-aliased; reference resnet_lpf.py:104-260 + lpf.py)
# ---------------------------------------------------------------------------


class TorchBlurPool(nn.Module):
    """lpf.py Downsample, filt_size=3: REFLECT pad (1,1) then depthwise
    [1,2,1]x[1,2,1]/16 conv at the given stride."""

    def __init__(self, channels, stride=2):
        super().__init__()
        a = torch.tensor([1.0, 2.0, 1.0])
        filt = a[:, None] * a[None, :]
        filt = filt / filt.sum()
        self.register_buffer("filt", filt[None, None].repeat(channels, 1, 1, 1))
        self.stride = stride

    def forward(self, x):
        x = F.pad(x, (1, 1, 1, 1), mode="reflect")
        return F.conv2d(x, self.filt, stride=self.stride, groups=x.shape[1])


class TorchLPFBottleneck(nn.Module):
    """resnet_lpf.py Bottleneck: 1x1 -> 3x3 (stride moved out) -> [blur] ->
    1x1; shortcut = [blur] -> 1x1 -> norm.  Submodule names mirror the flax
    LPFBottleneck so state dicts map 1:1 (kernel<->weight transpose only)."""

    def __init__(self, cin, cout, cmid, stride=1):
        super().__init__()
        self.stride = stride
        if cin != cout or stride != 1:
            self.shortcut = nn.Conv2d(cin, cout, 1, bias=False)
            self.shortcut_norm = FrozenBN(cout)
            self.shortcut_blur = (
                TorchBlurPool(cin, stride) if stride != 1 else None
            )
        else:
            self.shortcut = None
        self.conv1 = nn.Conv2d(cin, cmid, 1, bias=False)
        self.conv1_norm = FrozenBN(cmid)
        self.conv2 = nn.Conv2d(cmid, cmid, 3, padding=1, bias=False)
        self.conv2_norm = FrozenBN(cmid)
        self.blur = TorchBlurPool(cmid, stride) if stride != 1 else None
        self.conv3 = nn.Conv2d(cmid, cout, 1, bias=False)
        self.conv3_norm = FrozenBN(cout)

    def forward(self, x):
        if self.shortcut is not None:
            s = x
            if self.shortcut_blur is not None:
                s = self.shortcut_blur(s)
            sc = self.shortcut_norm(self.shortcut(s))
        else:
            sc = x
        y = F.relu(self.conv1_norm(self.conv1(x)))
        y = F.relu(self.conv2_norm(self.conv2(y)))
        if self.blur is not None:
            y = self.blur(y)
        y = self.conv3_norm(self.conv3(y))
        return F.relu(y + sc)


class TorchResNetLPF(nn.Module):
    """Anti-aliased trunk (resnet_lpf.py:149-260, pool_only=True,
    filter_size=3): 7x7/2 stem -> 2x2 stride-1 VALID max -> blur-pool,
    then res2..res5 with blurred strides.  Returns {res3, res4, res5}."""

    def __init__(self, depth=50):
        super().__init__()
        self.stem_conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.stem_conv1_norm = FrozenBN(64)
        self.stem_blur = TorchBlurPool(64, 2)
        cin = 64
        for stage, nblocks in enumerate(RESNET_BLOCKS[depth], start=2):
            cmid = 64 * 2 ** (stage - 2)
            cout = cmid * 4
            for b in range(nblocks):
                stride = 2 if (stage > 2 and b == 0) else 1
                self.add_module(
                    f"res{stage}_{b}", TorchLPFBottleneck(cin, cout, cmid, stride)
                )
                cin = cout
        self._blocks = RESNET_BLOCKS[depth]

    def forward(self, x):
        y = F.relu(self.stem_conv1_norm(self.stem_conv1(x)))
        y = F.max_pool2d(y, kernel_size=2, stride=1)
        y = self.stem_blur(y)
        outs = {}
        for stage, nblocks in enumerate(self._blocks, start=2):
            for b in range(nblocks):
                y = getattr(self, f"res{stage}_{b}")(y)
            if stage >= 3:
                outs[f"res{stage}"] = y
        return outs
