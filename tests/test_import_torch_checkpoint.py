"""Torch->rcu_tpu checkpoint migration: converted checkpoints must produce
bit-close outputs to the source torch model (the same guarantee the
weight-transplant parity tests give, but through the on-disk tool)."""
import importlib.util
import json
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_tool():
    spec = importlib.util.spec_from_file_location(
        "import_torch_checkpoint",
        os.path.join(REPO_ROOT, "scripts", "import_torch_checkpoint.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_ref_model_dir(tmp_path, torch_model, model_type, model_params,
                       epochs=(0, 1), best_epoch=1):
    import torch
    ref_dir = tmp_path / "model_ref"
    (ref_dir / "checkpoints").mkdir(parents=True)
    with open(ref_dir / "model.json", "w") as f:
        json.dump({"model": {"type": model_type, "params": model_params},
                   "optimizer": {"type": "adam", "params": {"lr": 1e-4}}}, f)
    for epoch in epochs:
        best = "-best" if epoch == best_epoch else ""
        torch.save({"state_dict": torch_model.state_dict(), "epoch": epoch,
                    "optimizer": {}, "best_score": 0.5},
                   str(ref_dir / "checkpoints" /
                       f"checkpoint_ep{epoch:03d}{best}.ckpt.pth"))
    # the reference names files checkpoint_ep###[-best].pth — fix the names
    for f in (ref_dir / "checkpoints").iterdir():
        f.rename(str(f).replace(".ckpt.pth", ".pth"))
    return str(ref_dir)


class TestUNetImport:
    def test_converted_checkpoint_matches_torch_logits(self, tmp_path):
        import torch
        from tests.test_model_weight_parity import torch_unet
        from rcu_tpu.engine import checkpoint as ckpt_lib
        from rcu_tpu.models import get_model

        params_cfg = {"nb_classes": 2, "in_channels": 3, "depth": 2,
                      "start_filters": 4, "dropout": None}
        tmodel = torch_unet(2, 4, 3, 2)
        ref_dir = make_ref_model_dir(tmp_path, tmodel, "unet", params_cfg)

        tool = load_tool()
        out_dir = str(tmp_path / "model_tpu")
        written = tool.import_model_dir(ref_dir, out_dir)
        assert len(written) == 2
        names = sorted(os.path.basename(p) for p in written)
        assert names == ["checkpoint_ep000.ckpt", "checkpoint_ep001-best.ckpt"]

        mf = ckpt_lib.ModelFiles.from_model_dir(out_dir)
        model_node, opt_node = ckpt_lib.load_model_parameters(mf)
        assert model_node.type == "unet" and opt_node.type == "adam"
        model = get_model(model_node.type, model_node.params)
        raw = ckpt_lib.load_checkpoint(
            ckpt_lib.find_checkpoint_file(mf, "best"))
        assert int(raw["epoch"]) == 1

        x = np.random.RandomState(0).rand(2, 24, 24, 3).astype(np.float32)
        with torch.no_grad():
            expected = tmodel(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = model.apply({"params": raw["params"],
                           "batch_stats": raw["batch_stats"]},
                          x, train=False).logits
        np.testing.assert_allclose(np.asarray(got), expected,
                                   rtol=1e-4, atol=1e-4)

    def test_sigma_head_roundtrips(self, tmp_path):
        import torch
        from tests.test_model_weight_parity import torch_unet
        from rcu_tpu.engine import checkpoint as ckpt_lib
        from rcu_tpu.models import get_model

        params_cfg = {"nb_classes": 2, "in_channels": 2, "depth": 2,
                      "start_filters": 4, "dropout": None, "sigma_out": True}
        tmodel = torch_unet(2, 4, 2, 2, sigma=True)
        ref_dir = make_ref_model_dir(tmp_path, tmodel, "unet", params_cfg,
                                     epochs=(3,), best_epoch=3)
        tool = load_tool()
        out_dir = str(tmp_path / "model_tpu")
        tool.import_model_dir(ref_dir, out_dir)
        mf = ckpt_lib.ModelFiles.from_model_dir(out_dir)
        raw = ckpt_lib.load_checkpoint(ckpt_lib.find_checkpoint_file(mf, "best"))
        model_node, _ = ckpt_lib.load_model_parameters(mf)
        model = get_model(model_node.type, model_node.params)
        x = np.random.RandomState(1).rand(1, 16, 16, 2).astype(np.float32)
        with torch.no_grad():
            t_logits, t_sigma = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out = model.apply({"params": raw["params"],
                           "batch_stats": raw["batch_stats"]}, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out.sigma), t_sigma.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4)


class TestResidualImport:
    def test_residual_blocks_convert_and_match(self, tmp_path):
        import torch
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from common.model.unet import UNet as TorchUNet
        from rcu_tpu.engine import checkpoint as ckpt_lib
        from rcu_tpu.models import get_model

        params_cfg = {"nb_classes": 2, "in_channels": 2, "depth": 2,
                      "start_filters": 4, "dropout": None, "residual": True}
        tmodel = TorchUNet(nb_classes=2, in_channels=2, depth=2,
                           start_filters=4, dropout=None, residual=True)
        tmodel.eval()
        ref_dir = make_ref_model_dir(tmp_path, tmodel, "unet", params_cfg,
                                     epochs=(0,), best_epoch=0)
        tool = load_tool()
        out_dir = str(tmp_path / "model_tpu")
        tool.import_model_dir(ref_dir, out_dir)
        mf = ckpt_lib.ModelFiles.from_model_dir(out_dir)
        raw = ckpt_lib.load_checkpoint(ckpt_lib.find_checkpoint_file(mf, "best"))
        assert any(k.startswith("ConvResidualBlock") for k in raw["params"])
        model_node, _ = ckpt_lib.load_model_parameters(mf)
        model = get_model(model_node.type, model_node.params)
        x = np.random.RandomState(3).rand(1, 16, 16, 2).astype(np.float32)
        with torch.no_grad():
            expected = tmodel(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = model.apply({"params": raw["params"],
                           "batch_stats": raw["batch_stats"]},
                          x, train=False).logits
        np.testing.assert_allclose(np.asarray(got), expected,
                                   rtol=1e-4, atol=1e-4)


class TestMultiModelImport:
    def test_postfixed_checkpoints_use_their_own_model_json(self, tmp_path):
        """Multi-model run dirs carry checkpoint-<name>_ep*.pth converted
        with model-<name>.json, not the main model's architecture."""
        import torch
        from tests.test_model_weight_parity import torch_unet
        from rcu_tpu.engine import checkpoint as ckpt_lib
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from common.model.postnet import PostNet as TorchPostNet

        tmodel = torch_unet(2, 4, 3, 2)
        ref_dir = make_ref_model_dir(
            tmp_path, tmodel, "unet",
            {"nb_classes": 2, "in_channels": 3, "depth": 2,
             "start_filters": 4, "dropout": None}, epochs=(0,), best_epoch=-1)
        aux = TorchPostNet(in_channels=4, nb_classes=2, nb_convs=2)
        # an underscore in the postfix (free-form model_names) must parse
        with open(os.path.join(ref_dir, "model-post_net.json"), "w") as f:
            json.dump({"model": {"type": "postnet",
                                 "params": {"in_channels": 4, "nb_classes": 2,
                                            "nb_convs": 2}},
                       "optimizer": {"type": "adam", "params": {"lr": 1e-4}}},
                      f)
        torch.save({"state_dict": aux.state_dict(), "epoch": 0,
                    "optimizer": {}, "best_score": None},
                   os.path.join(ref_dir, "checkpoints",
                                "checkpoint-post_net_ep000.pth"))
        tool = load_tool()
        out_dir = str(tmp_path / "model_tpu")
        written = tool.import_model_dir(ref_dir, out_dir)
        names = sorted(os.path.basename(p) for p in written)
        assert names == ["checkpoint-post_net_ep000.ckpt",
                         "checkpoint_ep000.ckpt"]
        mf = ckpt_lib.ModelFiles.from_model_dir(out_dir)
        raw = ckpt_lib.load_checkpoint(
            ckpt_lib.find_checkpoint_file(mf, 0, postfix="post_net"))
        assert "ConvBnRelu_1" in raw["params"]  # postnet tree, not unet
        # best_score None -> the engine's -inf "unset" sentinel
        assert np.isneginf(float(raw["best_score"]))
        # the aux architecture record is preserved and loadable
        aux_node, _ = ckpt_lib.load_model_parameters(mf, postfix="post_net")
        assert aux_node.type == "postnet" and aux_node.params["nb_convs"] == 2

    def test_imported_checkpoint_is_resumable(self, tmp_path):
        """Imported payloads carry a fresh opt_state, so resume's template
        restore finds every key (torch moments are not mapped)."""
        from tests.test_model_weight_parity import torch_unet
        from rcu_tpu.engine import checkpoint as ckpt_lib
        tmodel = torch_unet(2, 4, 3, 2)
        ref_dir = make_ref_model_dir(
            tmp_path, tmodel, "unet",
            {"nb_classes": 2, "in_channels": 3, "depth": 2,
             "start_filters": 4, "dropout": None}, epochs=(0,), best_epoch=0)
        tool = load_tool()
        out_dir = str(tmp_path / "model_tpu")
        tool.import_model_dir(ref_dir, out_dir)
        mf = ckpt_lib.ModelFiles.from_model_dir(out_dir)
        raw = ckpt_lib.load_checkpoint(ckpt_lib.find_checkpoint_file(mf, "best"))
        assert "opt_state" in raw and raw["opt_state"] is not None


class TestPostNetImport:
    def test_postnet_matches_torch(self, tmp_path):
        import torch
        from rcu_tpu.engine import checkpoint as ckpt_lib
        from rcu_tpu.models import get_model
        if REFERENCE not in sys.path:
            sys.path.insert(0, REFERENCE)
        from common.model.postnet import PostNet as TorchPostNet

        tmodel = TorchPostNet(in_channels=4, nb_classes=2, nb_convs=3)
        tmodel.eval()
        ref_dir = make_ref_model_dir(
            tmp_path, tmodel, "postnet",
            {"in_channels": 4, "nb_classes": 2, "nb_convs": 3},
            epochs=(0,), best_epoch=0)
        tool = load_tool()
        out_dir = str(tmp_path / "model_tpu")
        tool.import_model_dir(ref_dir, out_dir)
        mf = ckpt_lib.ModelFiles.from_model_dir(out_dir)
        raw = ckpt_lib.load_checkpoint(ckpt_lib.find_checkpoint_file(mf, "best"))
        model_node, _ = ckpt_lib.load_model_parameters(mf)
        model = get_model(model_node.type, model_node.params)
        x = np.random.RandomState(2).rand(2, 8, 8, 4).astype(np.float32)
        with torch.no_grad():
            expected = tmodel(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
        got = model.apply({"params": raw["params"],
                           "batch_stats": raw["batch_stats"]},
                          x, train=False).logits
        np.testing.assert_allclose(np.asarray(got), expected,
                                   rtol=1e-4, atol=1e-4)

    def test_unknown_model_type_rejected(self, tmp_path):
        ref_dir = tmp_path / "model_ref"
        (ref_dir / "checkpoints").mkdir(parents=True)
        with open(ref_dir / "model.json", "w") as f:
            json.dump({"model": {"type": "resnet", "params": {}}}, f)
        tool = load_tool()
        with pytest.raises(ValueError, match="cannot convert"):
            tool.import_model_dir(str(ref_dir), str(tmp_path / "out"))
