"""Exhaustive weight-import proof (VERDICT round-1 item #2).

Builds the COMPLETE synthetic key inventory of a real DAFNe checkpoint —
every tensor the reference torch model emits for the headline recipes
(Detectron2 ResNet/FPN naming + the head names from
dafne/modeling/dafne/dafne.py:209-348) — runs the importer, and asserts
the mapping is *total*: zero unmatched reference keys AND zero unfilled
flax target leaves.  A single silently-dropped tensor costs the whole
mAP-parity gate, so anecdotal spot-checks are not enough.

Also proves forward consistency: random weights pushed through a minimal
torch re-statement of one head tower and through the flax tower produce
identical outputs (NCHW vs NHWC, OIHW vs HWIO handled by the importer).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dafne_tpu.config import get_cfg
from dafne_tpu.models import build_model
from dafne_tpu.utils.weight_import import (
    convert_c2_names,
    import_state_dict,
)

RESNET_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def make_resnet_state(depth, rng, prefix="backbone.bottom_up."):
    """Full Detectron2 ResNet key inventory (stem + res2-5, FrozenBN)."""
    sd = {}

    def norm(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    def conv(name, cout, cin, k):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)

    conv(f"{prefix}stem.conv1", 64, 3, 7)
    norm(f"{prefix}stem.conv1.norm", 64)

    in_ch = 64
    for stage, nblocks in enumerate(RESNET_BLOCKS[depth], start=2):
        bottleneck = 64 * 2 ** (stage - 2)
        out_ch = bottleneck * 4
        for b in range(nblocks):
            base = f"{prefix}res{stage}.{b}"
            if b == 0:
                conv(f"{base}.shortcut", out_ch, in_ch, 1)
                norm(f"{base}.shortcut.norm", out_ch)
            conv(f"{base}.conv1", bottleneck, in_ch, 1)
            norm(f"{base}.conv1.norm", bottleneck)
            conv(f"{base}.conv2", bottleneck, bottleneck, 3)
            norm(f"{base}.conv2.norm", bottleneck)
            conv(f"{base}.conv3", out_ch, bottleneck, 1)
            norm(f"{base}.conv3.norm", out_ch)
            in_ch = out_ch
    return sd


def make_dafne_checkpoint(depth, num_classes, rng, fpn=256):
    """Complete model_final.pth inventory for the headline GN recipes
    (center-to-corner, oriented centerness, USE_SCALE, no deformable)."""
    sd = make_resnet_state(depth, rng)

    def conv(name, cout, cin, k, bias=True):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32)

    # FPN over res3-5 + P6/P7 from P5 (dafne/modeling/backbone/fpn.py:70-91)
    for lvl, cin in zip((3, 4, 5), (512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", fpn, cin, 1)
        conv(f"backbone.fpn_output{lvl}", fpn, fpn, 3)
    conv("backbone.top_block.p6", fpn, fpn, 3)
    conv("backbone.top_block.p7", fpn, fpn, 3)

    # head towers: torch Sequential [conv, GN, ReLU] x 4 -> indices 0,1 / 3,4 ...
    head = "proposal_generator.dafne_head"
    for tower in ("cls", "corners", "center"):
        for i in range(4):
            conv(f"{head}.{tower}_tower.{3 * i}", fpn, fpn, 3)
            sd[f"{head}.{tower}_tower.{3 * i + 1}.weight"] = rng.rand(fpn).astype(
                np.float32
            )
            sd[f"{head}.{tower}_tower.{3 * i + 1}.bias"] = rng.randn(fpn).astype(
                np.float32
            )
    conv(f"{head}.cls_logits", num_classes, fpn, 3)
    conv(f"{head}.ctrness", 1, fpn, 3)
    conv(f"{head}.corners_pred", 8, fpn, 3)
    conv(f"{head}.center_pred", 2, fpn, 3)
    for lvl in range(5):
        sd[f"{head}.scales.{lvl}.scale"] = np.asarray(
            [1.0 + 0.1 * lvl], np.float32
        )

    # buffers present in real checkpoints that the importer must skip
    sd["pixel_mean"] = np.asarray([103.53, 116.28, 123.675], np.float32)
    sd["pixel_std"] = np.asarray([1.0, 1.0, 1.0], np.float32)
    return sd


def _build_params(depth, num_classes=15):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = depth
    cfg.MODEL.DAFNE.NUM_CLASSES = num_classes
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))[
        "params"
    ]
    return model, params


@pytest.mark.parametrize("depth,num_classes", [(50, 15), (101, 54)])
def test_full_checkpoint_mapping_is_total(depth, num_classes):
    rng = np.random.RandomState(depth)
    sd = make_dafne_checkpoint(depth, num_classes, rng)
    # the importer drops pixel_mean/std at file-load; emulate here
    sd_in = {k: v for k, v in sd.items() if not k.startswith("pixel_")}
    _, params = _build_params(depth, num_classes)
    new_params, report = import_state_dict(sd_in, params)

    assert report.unmatched == [], f"unmatched reference keys: {report.unmatched[:20]}"
    assert report.unfilled == [], f"unfilled target leaves: {report.unfilled[:20]}"
    assert len(report.used) == len(sd_in)

    # spot-verify value + layout on a few structurally-distinct tensors
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"]["res4_2"]["conv2"]["kernel"]),
        sd["backbone.bottom_up.res4.2.conv2.weight"].transpose(2, 3, 1, 0),
    )
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"]["res2_0"]["shortcut_norm"]["running_var"]),
        sd["backbone.bottom_up.res2.0.shortcut.norm.running_var"],
    )
    np.testing.assert_allclose(
        np.asarray(new_params["head"]["corners_tower"]["norm3"]["scale"]),
        sd["proposal_generator.dafne_head.corners_tower.10.weight"],
    )
    np.testing.assert_allclose(
        np.asarray(new_params["head"]["scales"]),
        [1.0, 1.1, 1.2, 1.3, 1.4],
        rtol=1e-6,
    )


def test_ddp_module_prefixed_checkpoint_is_total():
    """Regression: 'module.'-prefixed (DDP-wrapped) checkpoints must map the
    FPN and head too, not just the backbone — the non-backbone patterns
    previously matched the UNstripped key."""
    rng = np.random.RandomState(7)
    sd = make_dafne_checkpoint(50, 15, rng)
    sd_in = {
        f"module.{k}": v for k, v in sd.items() if not k.startswith("pixel_")
    }
    _, params = _build_params(50, 15)
    _, report = import_state_dict(sd_in, params)
    assert report.unmatched == [], report.unmatched[:10]
    assert report.unfilled == [], report.unfilled[:10]


def test_no_norm_tower_checkpoint_maps_convs():
    """Regression: NORM='none' towers are torch Sequential [conv, relu]*N
    (convs at 2i); the importer must infer the layout stride from the
    checkpoint instead of assuming the 3-stride conv/norm/relu layout."""
    rng = np.random.RandomState(11)
    sd = make_dafne_checkpoint(50, 15, rng)
    head = "proposal_generator.dafne_head"
    # rewrite towers to the no-norm layout
    for k in [k for k in list(sd) if "_tower." in k]:
        del sd[k]
    for tower in ("cls", "corners", "center"):
        for i in range(4):
            sd[f"{head}.{tower}_tower.{2 * i}.weight"] = rng.randn(
                256, 256, 3, 3
            ).astype(np.float32)
            sd[f"{head}.{tower}_tower.{2 * i}.bias"] = rng.randn(256).astype(
                np.float32
            )
    cfg = get_cfg()
    cfg.MODEL.DAFNE.NORM = "none"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))[
        "params"
    ]
    sd_in = {k: v for k, v in sd.items() if not k.startswith("pixel_")}
    new_params, report = import_state_dict(sd_in, params)
    assert report.unmatched == [], report.unmatched[:10]
    assert report.unfilled == [], report.unfilled[:10]
    np.testing.assert_allclose(
        np.asarray(new_params["head"]["cls_tower"]["conv3"]["kernel"]),
        sd[f"{head}.cls_tower.6.weight"].transpose(2, 3, 1, 0),
    )


def test_imagenet_pkl_fills_backbone_exactly():
    """An ImageNet R-50 pickle must fill every backbone leaf and nothing else.

    Uses the Caffe2 naming of the real detectron2://ImageNetPretrained/MSRA
    pickles (conv1_w, res2_0_branch2a_w, res_conv1_bn_s, ...), which have
    affine-only FrozenBN (means/vars folded at conversion)."""
    rng = np.random.RandomState(7)
    d2 = make_resnet_state(50, rng, prefix="")
    c2 = {}
    for k, v in d2.items():
        if k.endswith("running_mean") or k.endswith("running_var"):
            continue  # MSRA pkls carry only folded scale/bias
        k2 = (
            k.replace("stem.conv1.norm.weight", "res_conv1_bn_s")
            .replace("stem.conv1.norm.bias", "res_conv1_bn_b")
            .replace("stem.conv1.weight", "conv1_w")
        )
        import re

        m = re.match(r"res(\d)\.(\d+)\.(conv\d|shortcut)(?:\.norm)?\.(\w+)$", k2)
        if m:
            branch = {
                "conv1": "branch2a",
                "conv2": "branch2b",
                "conv3": "branch2c",
                "shortcut": "branch1",
            }[m[3]]
            suffix = {"weight": "w"}[m[4]] if ".norm." not in k2 else None
            if ".norm." in k2:
                suffix = {"weight": "bn_s", "bias": "bn_b"}[m[4]]
            k2 = f"res{m[1]}_{m[2]}_{branch}_{suffix}"
        c2[k2] = v
    c2["fc1000_w"] = rng.randn(1000, 2048).astype(np.float32)
    c2["fc1000_b"] = rng.randn(1000).astype(np.float32)

    _, params = _build_params(50)
    new_params, report = import_state_dict(c2, params)
    assert report.unmatched == [], report.unmatched[:10]

    backbone_paths = {p for p in report.target_paths if p[0] == "backbone"}
    stats = {p for p in backbone_paths if p[-1] in ("running_mean", "running_var")}
    # every backbone affine/conv leaf filled; running stats stay at init (0/1)
    assert report.filled == backbone_paths - stats, (
        sorted(backbone_paths - stats - report.filled)[:10]
    )
    np.testing.assert_allclose(
        np.asarray(new_params["backbone"]["res3_1"]["conv3"]["kernel"]),
        d2["res3.1.conv3.weight"].transpose(2, 3, 1, 0),
    )


def test_c2_name_conversion_roundtrip():
    c2 = {
        "conv1_w": np.zeros((64, 3, 7, 7), np.float32),
        "res_conv1_bn_s": np.ones(64, np.float32),
        "res5_2_branch2c_w": np.zeros((2048, 512, 1, 1), np.float32),
        "res5_2_branch2c_bn_b": np.zeros(2048, np.float32),
        "res4_0_branch1_w": np.zeros((1024, 512, 1, 1), np.float32),
        "fc1000_w": np.zeros((1000, 2048), np.float32),
    }
    out = convert_c2_names(c2)
    assert set(out) == {
        "stem.conv1.weight",
        "stem.conv1.norm.weight",
        "res5.2.conv3.weight",
        "res5.2.conv3.norm.bias",
        "res4.0.shortcut.weight",
    }


def test_tower_forward_consistency_torch_vs_flax():
    """Random weights -> identical tower outputs in torch (NCHW) and flax
    (NHWC) after the importer's layout conversion.  This pins down conv
    padding/stride conventions, GN grouping order, and the OIHW->HWIO
    transpose in one assertion."""
    torch = pytest.importorskip("torch")
    from dafne_tpu.models.head import Tower

    C, num_convs = 32, 2
    rng = np.random.RandomState(3)

    # torch re-statement of the reference tower (dafne.py:310-348):
    # Sequential [conv3x3, GN(C/8), ReLU] x num_convs
    layers = []
    for _ in range(num_convs):
        layers += [
            torch.nn.Conv2d(C, C, 3, 1, 1, bias=True),
            torch.nn.GroupNorm(C // 8, C),
            torch.nn.ReLU(),
        ]
    tt = torch.nn.Sequential(*layers)
    with torch.no_grad():
        for m in tt:
            if isinstance(m, torch.nn.Conv2d):
                m.weight.copy_(torch.from_numpy(rng.randn(C, C, 3, 3).astype(np.float32) * 0.1))
                m.bias.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))
            elif isinstance(m, torch.nn.GroupNorm):
                m.weight.copy_(torch.from_numpy(rng.rand(C).astype(np.float32) + 0.5))
                m.bias.copy_(torch.from_numpy(rng.randn(C).astype(np.float32)))

    x = rng.randn(2, C, 13, 17).astype(np.float32)
    with torch.no_grad():
        ref = tt(torch.from_numpy(x)).numpy()

    tower = Tower(num_convs=num_convs, channels=C, norm="GN")
    params = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, C)))["params"]
    # fill via the importer's key mapping (proposal_generator head names)
    sd = {}
    for i in range(num_convs):
        conv = tt[3 * i]
        gn = tt[3 * i + 1]
        p = "proposal_generator.dafne_head.cls_tower"
        sd[f"{p}.{3 * i}.weight"] = conv.weight.detach().numpy()
        sd[f"{p}.{3 * i}.bias"] = conv.bias.detach().numpy()
        sd[f"{p}.{3 * i + 1}.weight"] = gn.weight.detach().numpy()
        sd[f"{p}.{3 * i + 1}.bias"] = gn.bias.detach().numpy()
    wrapped = {"head": {"cls_tower": params}}
    new_wrapped, report = import_state_dict(sd, wrapped)
    assert report.unmatched == [] and report.unfilled == []

    ours = tower.apply(
        {"params": new_wrapped["head"]["cls_tower"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )
