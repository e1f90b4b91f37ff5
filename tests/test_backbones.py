"""Forward-shape tests for every backbone family through the full detector."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dafne_tpu.config import get_cfg
from dafne_tpu.models import build_model

BACKBONES = [
    ("build_dafne_resnet_fpn_backbone", False),
    ("build_dafne_resnet_fpn_backbone", True),  # ANTI_ALIAS -> LPF
    ("build_dafne_dla_fpn_backbone", False),
    ("build_vovnet_fpn_backbone", False),
    ("build_mnv2_backbone", False),
]


@pytest.mark.parametrize("name,anti_alias", BACKBONES)
def test_backbone_forward(name, anti_alias):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = name
    cfg.MODEL.BACKBONE.ANTI_ALIAS = anti_alias
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.VOVNET.CONV_BODY = "V-19-eSE"
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.DAFNE.NUM_CLASSES = 2
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert len(out["logits"]) == 5
    # p3..p7 at strides 8..128
    for lvl, size in enumerate([16, 8, 4, 2, 1]):
        assert out["logits"][lvl].shape == (1, size, size, 2), (name, lvl)
        assert out["corners"][lvl].shape == (1, size, size, 8)
    assert np.isfinite(np.asarray(out["corners"][0])).all()


def test_lpf_blur_pool_shift_smoothing():
    """Blur-pool output varies less under 1px shifts than strided subsample."""
    from dafne_tpu.models.backbones import blur_pool

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 32, 32, 4).astype(np.float32))
    a = np.asarray(blur_pool(x, 2))
    assert a.shape == (1, 16, 16, 4)
    shifted = jnp.roll(x, 1, axis=1)
    b = np.asarray(blur_pool(shifted, 2))
    raw_a = np.asarray(x)[:, ::2, ::2]
    raw_b = np.asarray(shifted)[:, ::2, ::2]
    assert np.abs(a - b).mean() < np.abs(raw_a - raw_b).mean()


@pytest.mark.parametrize("body", sorted(__import__("dafne_tpu.models.backbones", fromlist=["DLA_SPECS"]).DLA_SPECS))
def test_dla_variants_forward(body):
    """Every DLA variant (dla.py:310-441) constructs and produces the
    res3/4/5 pyramid at the spec'd channel widths."""
    from dafne_tpu.models.backbones import DLA, DLA_SPECS

    trunk = DLA(body=body)
    x = jnp.zeros((1, 64, 64, 3))
    params = trunk.init(jax.random.PRNGKey(0), x)["params"]
    outs = trunk.apply({"params": params}, x)
    _, ch, _, _, _ = DLA_SPECS[body]
    assert outs["res3"].shape == (1, 8, 8, ch[3]), body
    assert outs["res4"].shape == (1, 4, 4, ch[4])
    assert outs["res5"].shape == (1, 2, 2, ch[5])


def test_dla_variant_through_full_detector():
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_dafne_dla_fpn_backbone"
    cfg.MODEL.DLA.CONV_BODY = "DLA60"
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.DAFNE.NUM_CLASSES = 2
    cfg.MODEL.DAFNE.NUM_CLS_CONVS = 1
    cfg.MODEL.DAFNE.NUM_BOX_CONVS = 1
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    x = jnp.zeros((1, 128, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out["logits"][0].shape == (1, 16, 16, 2)


def test_resnet_lpf_numeric_parity_vs_torch():
    """ResNet-LPF trunk numeric parity vs a torch re-statement of the
    reference (VERDICT r3 #6; resnet_lpf.py:104-260 + lpf.py Downsample).
    LPF is config-reachable (MODEL.BACKBONE.ANTI_ALIAS, reference
    fpn.py:67-68) so shape-only testing was not enough: this pins the
    reflect-pad blur-pool, the 2x2 stride-1 VALID stem max-pool, and the
    blur placement inside the bottleneck (after conv2's relu, before conv3;
    shortcut blurred before its 1x1) with shared random weights."""
    torch = pytest.importorskip("torch")
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from torch_reference_model import TorchResNetLPF

    from dafne_tpu.models.backbones import ResNetLPF

    model = ResNetLPF(depth=50, freeze_at=0, dtype=jnp.float32)
    x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

    # randomize every leaf (kernels, BN affine AND stats) so identity-init
    # can't mask a mapping error
    rng = np.random.RandomState(1)

    def randomize(path, leaf):
        name = path[-1].key
        if name == "running_var":
            return rng.uniform(0.5, 1.5, leaf.shape).astype(np.float32)
        if name in ("weight",):  # BN scale
            return rng.normal(1.0, 0.2, leaf.shape).astype(np.float32)
        if name in ("bias", "running_mean"):
            return rng.normal(0.0, 0.2, leaf.shape).astype(np.float32)
        return rng.normal(0.0, 0.05, leaf.shape).astype(np.float32)

    params = jax.tree_util.tree_map_with_path(randomize, params)

    tmodel = TorchResNetLPF(50).eval()
    sd = {}
    from flax.traverse_util import flatten_dict

    for path, leaf in flatten_dict(params).items():
        key = ".".join(path)
        arr = np.asarray(leaf)
        if path[-1] == "kernel":
            key = key.replace(".kernel", ".weight")
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW
        sd[key] = torch.from_numpy(arr.copy())
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    # only the fixed blur filters are allowed to be unmatched
    assert all("blur" in k or "filt" in k for k in missing), missing
    assert unexpected == [], unexpected

    j_out = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    for lvl in ("res3", "res4", "res5"):
        t = t_out[lvl].numpy().transpose(0, 2, 3, 1)
        j = np.asarray(j_out[lvl])
        assert t.shape == j.shape, (lvl, t.shape, j.shape)
        scale = max(1.0, float(np.abs(t).max()))
        err = np.abs(t - j).max() / scale
        assert err < 1e-4, (lvl, err)
