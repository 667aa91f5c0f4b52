"""Torch-checkpoint import: numerics parity (torch ops as oracle) + tree structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_unet.models import AnomalyUNet, UNet
from tpu_unet.utils.torch_import import convert_state_dict

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(np.float32) * 0.1


def make_reference_named_state_dict(base=4, n_channels=3, model="unet", n_classes=1):
    """Random tensors under the reference's state_dict names (src/model.py layout)."""
    sd = {}
    seed = [0]

    def t(*shape):
        seed[0] += 1
        return rand(*shape, seed=seed[0])

    def double_conv(prefix, cin, cmid, cout):
        sd[f"{prefix}.double_conv.0.weight"] = t(cmid, cin, 3, 3)
        for stem, c in ((1, cmid), (4, cout)):
            sd[f"{prefix}.double_conv.{stem}.weight"] = np.abs(t(c)) + 0.5
            sd[f"{prefix}.double_conv.{stem}.bias"] = t(c)
            sd[f"{prefix}.double_conv.{stem}.running_mean"] = t(c)
            sd[f"{prefix}.double_conv.{stem}.running_var"] = np.abs(t(c)) + 0.5
        sd[f"{prefix}.double_conv.3.weight"] = t(cout, cmid, 3, 3)

    ladder = [base, 2 * base, 4 * base, 8 * base, 16 * base]
    double_conv("inc", n_channels, base, base)
    cin = base
    for i, cout in enumerate(ladder[1:], start=1):
        double_conv(f"down{i}.maxpool_conv.1", cin, cout, cout)
        cin = cout

    def decoder(suffix):
        cin_d = ladder[4]
        for i, cout in enumerate([ladder[3], ladder[2], ladder[1], ladder[0]], start=1):
            sd[f"up{i}{suffix}.up.weight"] = t(cin_d, cin_d // 2, 2, 2)
            sd[f"up{i}{suffix}.up.bias"] = t(cin_d // 2)
            double_conv(f"up{i}{suffix}.conv", cin_d, cout, cout)
            cin_d = cout

    if model == "anomaly_unet":
        decoder("_recon")
        decoder("_seg")
        sd["outc_recon.conv.weight"] = t(n_channels, base, 1, 1)
        sd["outc_recon.conv.bias"] = t(n_channels)
        sd["outc_seg.conv.weight"] = t(1, base, 1, 1)
        sd["outc_seg.conv.bias"] = t(1)
    else:
        decoder("")
        sd["outc.conv.weight"] = t(n_classes, base, 1, 1)
        sd["outc.conv.bias"] = t(n_classes)
    return sd


def torch_double_conv(x, sd, prefix):
    """Reference DoubleConv semantics via torch functional ops (eval mode)."""
    for conv_i, bn_i in ((0, 1), (3, 4)):
        x = F.conv2d(x, torch.tensor(sd[f"{prefix}.double_conv.{conv_i}.weight"]),
                     padding=1)
        x = F.batch_norm(x,
                         torch.tensor(sd[f"{prefix}.double_conv.{bn_i}.running_mean"]),
                         torch.tensor(sd[f"{prefix}.double_conv.{bn_i}.running_var"]),
                         torch.tensor(sd[f"{prefix}.double_conv.{bn_i}.weight"]),
                         torch.tensor(sd[f"{prefix}.double_conv.{bn_i}.bias"]),
                         training=False, eps=1e-5)
        x = F.relu(x)
    return x


def torch_unet_forward(x, sd, base=4):
    """Full reference-UNet forward in torch functional ops (transposed-conv mode)."""
    x1 = torch_double_conv(x, sd, "inc")
    skips = [x1]
    xi = x1
    for i in range(1, 5):
        xi = F.max_pool2d(xi, 2)
        xi = torch_double_conv(xi, sd, f"down{i}.maxpool_conv.1")
        skips.append(xi)
    x = skips[4]
    for i, skip in zip(range(1, 5), [skips[3], skips[2], skips[1], skips[0]]):
        x = F.conv_transpose2d(x, torch.tensor(sd[f"up{i}.up.weight"]),
                               torch.tensor(sd[f"up{i}.up.bias"]), stride=2)
        x = torch.cat([skip, x], dim=1)
        x = torch_double_conv(x, sd, f"up{i}.conv")
    return F.conv2d(x, torch.tensor(sd["outc.conv.weight"]),
                    torch.tensor(sd["outc.conv.bias"]))


def test_unet_forward_parity_with_torch_weights():
    base = 4
    sd = make_reference_named_state_dict(base=base, model="unet")
    params, stats = convert_state_dict(sd, model="unet")

    model = UNet(n_classes=1, base_features=base)
    x = rand(2, 3, 32, 32, seed=99)

    theirs = torch_unet_forward(torch.tensor(x), sd, base).numpy()
    ours = model.apply({"params": params, "batch_stats": stats},
                       jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
    ours_nchw = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours_nchw, theirs, atol=1e-3)  # f32 conv-order noise over 23 layers


def test_converted_tree_matches_model_structure():
    base = 4
    sd = make_reference_named_state_dict(base=base, model="anomaly_unet")
    params, stats = convert_state_dict(sd, model="anomaly_unet")

    model = AnomalyUNet(base_features=base)
    ref = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)

    def paths(tree):
        return {jax.tree_util.keystr(k): v.shape
                for k, v in jax.tree_util.tree_leaves_with_path(tree)}

    assert paths(params) == paths(ref["params"])
    assert paths(stats) == paths(ref["batch_stats"])

    # And the converted weights run through the model.
    recon, amap = model.apply({"params": params, "batch_stats": stats},
                              jnp.zeros((1, 32, 32, 3)), train=False)
    assert recon.shape == (1, 32, 32, 3) and amap.shape == (1, 32, 32, 1)


def test_full_checkpoint_blob_roundtrip(tmp_path):
    """torch.save'd {model_state_dict: ...} blob loads via load_torch_checkpoint."""
    from tpu_unet.utils.torch_import import load_torch_checkpoint

    sd = make_reference_named_state_dict(base=4, model="unet")
    blob = {"epoch": 3, "loss": 0.5,
            "model_state_dict": {k: torch.tensor(v) for k, v in sd.items()}}
    path = str(tmp_path / "ckpt.pth")
    torch.save(blob, path)
    params, stats = load_torch_checkpoint(path, model="unet")
    model = UNet(n_classes=1, base_features=4)
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 32, 32, 1)


def test_export_roundtrips_to_reference_names():
    """export_state_dict is the exact inverse of convert_state_dict: same key set
    as a reference checkpoint, and import(export(x)) == x bitwise."""
    from tpu_unet.utils.torch_import import export_state_dict

    for model_name in ("unet", "anomaly_unet"):
        sd = make_reference_named_state_dict(base=4, model=model_name)
        params, stats = convert_state_dict(sd, model=model_name)
        exported = export_state_dict(params, stats, model=model_name)
        # Key parity with the reference naming (+ num_batches_tracked, which the
        # fixture omits but real torch checkpoints contain).
        exp_keys = {k for k in exported if not k.endswith("num_batches_tracked")}
        assert exp_keys == set(sd), model_name
        for k in sd:
            np.testing.assert_array_equal(exported[k], sd[k], err_msg=k)


def test_export_pth_loads_in_torch_and_reimports(tmp_path):
    """A framework-trained model exports to .pth, loads with torch, and re-imports
    with identical weights (full migration circle)."""
    from tpu_unet.utils.torch_import import load_torch_checkpoint, save_torch_checkpoint

    model = AnomalyUNet(base_features=4)
    variables = model.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), train=False)
    params = jax.device_get(variables["params"])
    stats = jax.device_get(variables["batch_stats"])

    path = str(tmp_path / "exported.pth")
    save_torch_checkpoint(path, params, stats, model="anomaly_unet",
                          epoch=7, loss=0.25)
    blob = torch.load(path, map_location="cpu", weights_only=True)
    assert blob["epoch"] == 7 and abs(blob["loss"] - 0.25) < 1e-9
    assert "inc.double_conv.0.weight" in blob["model_state_dict"]
    assert blob["model_state_dict"]["inc.double_conv.1.num_batches_tracked"].dtype == torch.int64

    params2, stats2 = load_torch_checkpoint(path, model="anomaly_unet")
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(params2)):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a, np.float32), b, err_msg=jax.tree_util.keystr(ka))
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(stats),
            jax.tree_util.tree_leaves_with_path(stats2)):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b, err_msg=jax.tree_util.keystr(ka))
