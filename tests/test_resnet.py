"""ResNet trunk parity: primitive ops vs torch functional oracles, plus a
full small-depth trunk against a torch replica built from the torchvision
architecture description."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F
import pytest

from mgnns_tpu.nn import resnet


def test_conv_matches_torch(rng):
    x = rng.standard_normal((2, 9, 9, 3)).astype(np.float32)
    p = resnet.conv_init(jax.random.key(0), 3, 3, 3, 8)
    ours = np.asarray(resnet.conv_apply(p, jnp.asarray(x), stride=2, padding=((1, 1), (1, 1))))
    w = np.asarray(p["w"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
    theirs = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
                      stride=2, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_maxpool_matches_torch(rng):
    x = rng.standard_normal((2, 11, 11, 4)).astype(np.float32)
    ours = np.asarray(resnet.max_pool(jnp.asarray(x), 3, 2, 1))
    theirs = F.max_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 3, 2, 1)
    np.testing.assert_allclose(ours, theirs.numpy().transpose(0, 2, 3, 1), atol=1e-6)


@pytest.mark.parametrize("train", [False, True])
def test_bn_matches_torch(rng, train):
    x = rng.standard_normal((4, 5, 5, 6)).astype(np.float32)
    p, s = resnet.bn_init(6)
    p = {"scale": p["scale"] * 1.3, "bias": p["bias"] + 0.2}
    s = {"mean": jnp.asarray(rng.standard_normal(6).astype(np.float32)),
         "var": jnp.asarray(rng.uniform(0.5, 2.0, 6).astype(np.float32))}
    bn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(np.asarray(p["scale"])))
        bn.bias.copy_(torch.from_numpy(np.asarray(p["bias"])))
        bn.running_mean.copy_(torch.from_numpy(np.asarray(s["mean"])))
        bn.running_var.copy_(torch.from_numpy(np.asarray(s["var"])))
    bn.train(train)
    y_t = bn(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy().transpose(0, 2, 3, 1)
    y_j, ns = resnet.bn_apply(p, s, jnp.asarray(x), train=train)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-4)
    if train:
        np.testing.assert_allclose(np.asarray(ns["mean"]), bn.running_mean.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ns["var"]), bn.running_var.numpy(), atol=1e-5)


class TorchBottleneck(torch.nn.Module):
    """Torchvision-style bottleneck written from the architecture spec."""

    def __init__(self, cin, width, stride):
        super().__init__()
        cout = width * 4
        self.conv1 = torch.nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(width)
        self.conv2 = torch.nn.Conv2d(width, width, 3, stride, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(width)
        self.conv3 = torch.nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = torch.nn.Sequential(
                torch.nn.Conv2d(cin, cout, 1, stride, bias=False),
                torch.nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return F.relu(out + idn)


class TorchTrunk(torch.nn.Module):
    def __init__(self, layers):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(64)
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        cin = 64
        stages = []
        for li, (blocks, width) in enumerate(zip(layers, (64, 128, 256, 512)), 1):
            blocks_mods = []
            for b in range(blocks):
                stride = 2 if (b == 0 and li > 1) else 1
                blocks_mods.append(TorchBottleneck(cin, width, stride))
                cin = width * 4
            stages.append(torch.nn.Sequential(*blocks_mods))
        self.layer1, self.layer2, self.layer3, self.layer4 = stages

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        return self.layer4(self.layer3(self.layer2(self.layer1(x))))


def _torch_state_dict(trunk):
    sd = {}
    for name, t in trunk.state_dict().items():
        name = name.replace(".down.", ".downsample.")
        sd[name] = t
    return sd


def test_full_trunk_matches_torch_replica(rng):
    torch.manual_seed(0)
    trunk = TorchTrunk(resnet.RESNET_LAYERS[50]).eval()
    sd = _torch_state_dict(trunk)
    params, state = resnet.import_torch_state_dict(sd, 50)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours, _ = resnet.resnet_apply(params, state, jnp.asarray(x), depth=50, train=False)
    with torch.no_grad():
        theirs = trunk(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape == (1, 2, 2, 2048)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-3)


def test_resnet_init_shapes():
    params, state = resnet.resnet_init(jax.random.key(0), depth=101)
    # 23 blocks: 1 standalone + 22 stacked for lax.scan
    assert params["layer3"]["rest"]["conv1"]["w"].shape[0] == 22
    x = jnp.zeros((1, 96, 96, 3))
    out, ns = resnet_apply_smoke = resnet.resnet_apply(params, state, x, depth=101, train=True)
    assert out.shape == (1, 3, 3, 2048)
    # train mode must produce updated stats pytree with same structure
    assert set(ns.keys()) == set(state.keys())


def test_stem_s2d_exact_equivalence(rng):
    """The space-to-depth stem (4x4/s1 over s2d-2 input) computes the SAME
    multiply-adds as the native 7x7/s2 stem: outputs match to float
    reassociation and the weight/input gradients match exactly (the w->w4
    scatter is a linear pad/reshape/transpose)."""
    for H, W, C in [(64, 64, 3), (14, 20, 5), (30, 16, 2)]:
        x = jnp.asarray(rng.standard_normal((2, H, W, C)), jnp.float32)
        p = {"w": jnp.asarray(rng.standard_normal((7, 7, C, 8)) * 0.1,
                              jnp.float32)}
        ref = resnet.conv_apply(p, x, 2, ((3, 3), (3, 3)))
        got = resnet.stem_s2d_apply(p, x)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)

    def loss(stem_fn, w, x):
        return jnp.sum(stem_fn({"w": w}, x) ** 2)

    native = lambda p_, x_: resnet.conv_apply(p_, x_, 2, ((3, 3), (3, 3)))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 3, 8)) * 0.1, jnp.float32)
    for argnum in (1, 2):
        g_ref = jax.grad(loss, argnum)(native, w, x)
        g_s2d = jax.grad(loss, argnum)(resnet.stem_s2d_apply, w, x)
        np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref),
                                   atol=5e-4, rtol=1e-5)


def test_trunk_stem_s2d_matches_native(rng):
    """resnet_apply(stem_s2d=True) matches the native trunk end to end, and
    falls back to the native stem for odd spatial sizes."""
    params, stats = resnet.resnet_init(jax.random.key(0), depth=50)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    ref, _ = resnet.resnet_apply(params, stats, x, depth=50, train=False)
    got, _ = resnet.resnet_apply(params, stats, x, depth=50, train=False,
                                 stem_s2d=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)

    # odd size: silently uses the native stem (shape would not divide)
    x_odd = jnp.asarray(rng.standard_normal((1, 63, 63, 3)), jnp.float32)
    a, _ = resnet.resnet_apply(params, stats, x_odd, depth=50, train=False,
                               stem_s2d=True)
    b, _ = resnet.resnet_apply(params, stats, x_odd, depth=50, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0, rtol=0)
