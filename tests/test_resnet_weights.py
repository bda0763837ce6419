"""ResNet-101 pretrained path (SURVEY.md §2 #17, BASELINE config 5).

torchvision isn't installed here, so we build a torch ResNet mirror whose
``state_dict`` keys match torchvision's layout exactly (conv1/bn1/layer{s}.{b}.
conv{k}/bn{k}/downsample.{0,1}), run it in eval mode with RANDOM weights and
RANDOM BatchNorm running stats, and assert our folded-FrozenBN flax backbone
reproduces its feature maps. This proves the converter + fold math against the
real layout; the moment a real resnet101.pth appears it loads unchanged.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from tdrn_tpu.models.resnet import ResNetBackbone, _DEPTHS
from tdrn_tpu.utils.torch_weights import resnet_backbone_from_torchvision


# --------------------------------------------------------------------------
# A torch ResNet with torchvision-identical state_dict keys (random stats).
# --------------------------------------------------------------------------


class _Bottleneck(tnn.Module):
    def __init__(self, cin, f, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, f, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(f)
        self.conv2 = tnn.Conv2d(f, f, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(f)
        self.conv3 = tnn.Conv2d(f, 4 * f, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(4 * f)
        self.relu = tnn.ReLU(inplace=True)
        self.downsample = None
        if cin != 4 * f or stride != 1:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, 4 * f, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(4 * f),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + identity)


class _TorchResNet(tnn.Module):
    """Emits C3/C4/C5 + nothing extra (extra1/2 are ours, not pretrained)."""

    def __init__(self, depth, width_mult):
        super().__init__()
        w = lambda c: max(8, int(c * width_mult))
        self.conv1 = tnn.Conv2d(3, w(64), 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(w(64))
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        blocks = _DEPTHS[depth]
        widths = (w(64), w(128), w(256), w(512))
        cin = w(64)
        for si, (n, f) in enumerate(zip(blocks, widths)):
            layers = []
            for bi in range(n):
                stride = 2 if (bi == 0 and si > 0) else 1
                layers.append(_Bottleneck(cin, f, stride))
                cin = 4 * f
            setattr(self, f"layer{si + 1}", tnn.Sequential(*layers))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        c3 = self.layer2(x)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c3, c4, c5


def _randomize_bn_stats(model, gen):
    """Random running stats so the fold is actually exercised (not mean=0/var=1)."""
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            c = m.num_features
            m.running_mean.copy_(torch.from_numpy(gen.normal(size=c).astype("f4")))
            m.running_var.copy_(
                torch.from_numpy(gen.uniform(0.5, 2.0, size=c).astype("f4"))
            )
            m.weight.data.copy_(
                torch.from_numpy(gen.uniform(0.5, 1.5, size=c).astype("f4"))
            )
            m.bias.data.copy_(torch.from_numpy(gen.normal(size=c).astype("f4")))


@pytest.mark.parametrize("depth", [50])
def test_torchvision_resnet_conversion_feature_parity(depth):
    gen = np.random.default_rng(0)
    torch.manual_seed(0)
    tm = _TorchResNet(depth, width_mult=0.25).eval()
    _randomize_bn_stats(tm, gen)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    fb = ResNetBackbone(depth=depth, width_mult=0.25)
    x = gen.normal(size=(1, 64, 64, 3)).astype("f4")
    params = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    new_backbone, loaded, skipped = resnet_backbone_from_torchvision(
        sd, params["params"]
    )
    # Everything except the extra stage must come from the checkpoint.
    assert all(s.startswith(("extra1", "extra2")) for s in skipped), skipped
    assert len(loaded) > 100

    sources = fb.apply({"params": new_backbone}, jnp.asarray(x))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
    for ours, theirs in zip(sources[:3], ref):
        theirs = theirs.permute(0, 2, 3, 1).numpy()
        assert ours.shape == theirs.shape
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-4)


def test_resnet101_full_width_conversion_shapes():
    """Full-width resnet101 template converts against a shape-only synthetic
    state dict (proves key coverage at the real geometry without the FLOPs)."""
    depth = 101
    tm = _TorchResNet(depth, width_mult=1.0)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    fb = ResNetBackbone(depth=depth, width_mult=1.0)
    params = jax.eval_shape(
        lambda: fb.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 3)))
    )
    template = jax.tree.map(lambda s: np.zeros(s.shape, np.float32), params)
    new_backbone, loaded, skipped = resnet_backbone_from_torchvision(
        sd, template["params"]
    )
    assert all(s.startswith(("extra1", "extra2")) for s in skipped)
    # 101-layer: 1 stem + 33 bottlenecks x 3 convs + 4 projections = 104 convs.
    kernels = [k for k in loaded if k.endswith("kernel")]
    assert len(kernels) == 104


@pytest.mark.slow
def test_resnet_detector_overfit_groupnorm():
    """Full detector with the ResNet backbone (GroupNorm) overfits a fixed
    batch — the trainability evidence VERDICT flagged as missing for #17."""
    from tdrn_tpu.config import TINY_64
    from tdrn_tpu.models import build_detector
    from tdrn_tpu.train import init_train_state, make_optimizer, make_train_step
    from tests.test_loss import synth_batch

    model = build_detector(
        TINY_64, backbone="resnet101", backbone_norm="group", temporal=False,
        tcb_channels=32, width_mult=0.0625,
    )
    rng = np.random.RandomState(0)
    images, targets = synth_batch(rng, batch=2)
    opt = make_optimizer(base_lr=5e-3, warmup_steps=1, milestones=(10**9,))
    ts = init_train_state(model, jax.random.PRNGKey(1), opt, batch=2)
    step = make_train_step(model, opt, clip_mode=False)
    losses = []
    for _ in range(10):
        ts, metrics = step(ts, images, targets)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.9, losses


def test_groupnorm_resnet_trains_from_scratch():
    """GroupNorm variant: gradients are finite and a few SGD steps reduce a
    simple regression loss — the from-scratch trainability FrozenBN lacks."""
    import optax

    fb = ResNetBackbone(depth=50, width_mult=0.125, norm="group")
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 64, 64, 3))
    params = fb.init(key, x)
    tx = optax.sgd(1e-2)
    opt_state = tx.init(params)

    def loss_fn(p):
        sources = fb.apply(p, x)
        return sum(jnp.mean(s**2) for s in sources)

    losses = []
    for _ in range(4):
        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert jnp.isfinite(loss)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
