"""THE model-parity test: transplant the reference torch U-Net's weights into
the flax U-Net and assert bit-close outputs on identical inputs.

This catches any structural mismatch (padding, upsample mode, concat order,
BN parameters, head wiring) that shape/param-count checks cannot. The torch
model is imported READ-ONLY from /root/reference and run in eval mode (no
dropout); our model runs deterministically too.
"""
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")


def torch_unet(depth, start_filters, in_channels, nb_classes, sigma=False):
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from common.model.unet import UNet as TorchUNet
    model = TorchUNet(nb_classes=nb_classes, in_channels=in_channels,
                      depth=depth, start_filters=start_filters, dropout=None,
                      sigma_out=sigma)
    model.eval()
    return model


def conv_to_flax(conv):
    return {"kernel": conv.weight.detach().numpy().transpose(2, 3, 1, 0),
            "bias": conv.bias.detach().numpy()}


def bn_to_flax(bn):
    params = {"scale": bn.weight.detach().numpy(),
              "bias": bn.bias.detach().numpy()}
    stats = {"mean": bn.running_mean.detach().numpy(),
             "var": bn.running_var.detach().numpy()}
    return params, stats


def cbr_to_flax(torch_cbr):
    """reference Conv2dBnRelu -> flax ConvBnRelu param/stat dicts."""
    seq = torch_cbr.conv2d_batch_relu
    params = {"Conv_0": conv_to_flax(seq.conv)}
    stats = {}
    if hasattr(seq, "bn"):
        p, s = bn_to_flax(seq.bn)
        params["BatchNorm_0"] = p
        stats["BatchNorm_0"] = s
    return params, stats


def block_to_flax(torch_block):
    """reference ConvBlock -> flax ConvBlock dicts."""
    params, stats = {}, {}
    for j, cbr in enumerate(torch_block.block):
        p, s = cbr_to_flax(cbr)
        params[f"ConvBnRelu_{j}"] = p
        if s:
            stats[f"ConvBnRelu_{j}"] = s
    return params, stats


def transplant(torch_model, depth):
    """Build the flax param/batch_stats trees from the torch model."""
    params, stats = {}, {}
    nb_blocks = 0
    for down in torch_model.down_convs:           # ConvBlock_0..depth-1
        p, s = block_to_flax(down.block)
        params[f"ConvBlock_{nb_blocks}"] = p
        stats[f"ConvBlock_{nb_blocks}"] = s
        nb_blocks += 1
    p, s = block_to_flax(torch_model.bottom_convs)  # bottom
    params[f"ConvBlock_{nb_blocks}"] = p
    stats[f"ConvBlock_{nb_blocks}"] = s
    nb_blocks += 1
    for k, up in enumerate(torch_model.up_convs):  # Conv_k (upconv) + block
        params[f"Conv_{k}"] = conv_to_flax(up.upconv[1])
        p, s = block_to_flax(up.block)
        params[f"ConvBlock_{nb_blocks}"] = p
        stats[f"ConvBlock_{nb_blocks}"] = s
        nb_blocks += 1
    # head: ConvBnRelu_0 + Conv_depth (1x1 cls)
    p, s = cbr_to_flax(torch_model.conv_cls[0])
    params["ConvBnRelu_0"] = p
    stats["ConvBnRelu_0"] = s
    params[f"Conv_{depth}"] = conv_to_flax(torch_model.conv_cls[1])
    if torch_model.conv_sigma is not None:
        p, s = cbr_to_flax(torch_model.conv_sigma[0])
        params["ConvBnRelu_1"] = p
        stats["ConvBnRelu_1"] = s
        params[f"Conv_{depth + 1}"] = conv_to_flax(torch_model.conv_sigma[1])
    return params, stats


@pytest.mark.parametrize("depth,hw,sigma", [(2, (32, 32), False),
                                            (4, (48, 48), False),
                                            (2, (32, 32), True)])
def test_same_weights_same_logits(depth, hw, sigma):
    import torch

    import jax
    from rcu_tpu.models import get_model

    torch.manual_seed(0)
    tm = torch_unet(depth, 8, 3, 2, sigma)
    params, stats = transplant(tm, depth)

    fm = get_model("unet", dict(nb_classes=2, in_channels=3, depth=depth,
                                start_filters=8, dropout=None,
                                sigma_out=sigma))
    # sanity: transplanted tree matches the model's own init structure
    x0 = np.zeros((1, *hw, 3), np.float32)
    ref_vars = fm.init({"params": jax.random.PRNGKey(0)}, x0, train=False)
    ref_flat = jax.tree_util.tree_structure(ref_vars["params"])
    got_flat = jax.tree_util.tree_structure(params)
    assert ref_flat == got_flat, "param tree mismatch"

    rng = np.random.RandomState(5)
    x = rng.rand(2, *hw, 3).astype(np.float32)
    with torch.no_grad():
        torch_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    if sigma:
        torch_logits, torch_sigma = (t.numpy().transpose(0, 2, 3, 1)
                                     for t in torch_out)
    else:
        torch_logits = torch_out.numpy().transpose(0, 2, 3, 1)

    out = fm.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(out.logits), torch_logits,
                               rtol=1e-3, atol=2e-4)
    if sigma:
        np.testing.assert_allclose(np.asarray(out.sigma), torch_sigma,
                                   rtol=1e-3, atol=2e-4)


def test_odd_shape_same_logits():
    """155x241-style odd shapes exercise the upsample padding path."""
    import torch

    import jax
    from rcu_tpu.models import get_model

    torch.manual_seed(1)
    tm = torch_unet(3, 4, 2, 2)
    params, stats = transplant(tm, 3)
    fm = get_model("unet", dict(nb_classes=2, in_channels=2, depth=3,
                                start_filters=4, dropout=None))
    rng = np.random.RandomState(6)
    x = rng.rand(1, 45, 53, 2).astype(np.float32)
    with torch.no_grad():
        torch_logits = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))) \
            .numpy().transpose(0, 2, 3, 1)
    out = fm.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.asarray(out.logits), torch_logits,
                               rtol=1e-3, atol=5e-4)


def test_mc_dropout_distributional_parity():
    """Same transplanted weights + dropout active: both implementations'
    MC-mean probabilities converge to the same expectation (validates the
    channel-dropout placement/scaling semantics, not just the deterministic
    graph)."""
    import torch

    import jax
    import jax.numpy as jnp
    from rcu_tpu.models import get_model

    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from common.model.unet import UNet as TorchUNet

    torch.manual_seed(0)
    tm = TorchUNet(nb_classes=2, in_channels=2, depth=2, start_filters=4,
                   dropout=0.3)
    tm.eval()
    params, stats = transplant(tm, 2)
    fm = get_model("unet", dict(nb_classes=2, in_channels=2, depth=2,
                                start_filters=4, dropout=0.3))
    rng = np.random.RandomState(3)
    x = rng.rand(1, 16, 16, 2).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))

    for m in tm.modules():  # the reference's MC switch
        if isinstance(m, torch.nn.Dropout2d):
            m.train()
    T = 400
    with torch.no_grad():
        acc = sum(torch.softmax(tm(xt), 1) for _ in range(T))
    torch_mean = (acc / T).numpy().transpose(0, 2, 3, 1)

    def one(key):
        out = fm.apply({"params": params, "batch_stats": stats}, x,
                       train=False, mc_dropout=True, rngs={"dropout": key})
        return jax.nn.softmax(out.logits, -1)

    keys = jax.random.split(jax.random.PRNGKey(0), T)
    flax_mean = np.asarray(jnp.mean(jax.vmap(one)(keys), axis=0))
    np.testing.assert_allclose(flax_mean, torch_mean, atol=0.02)
