"""Import reference PyTorch checkpoints (.pth) into tpu_unet models.

Lets a user of the reference stack (ukeSJTU/tiaozhanbei-unet) bring trained weights
into this framework: maps the reference's state_dict naming
(/root/reference/src/model.py module structure — inc.double_conv.N.*,
downK.maxpool_conv.1.*, upK.up.*, upK.conv.*, upK_recon/_seg.*, outc.conv.*) onto
our Flax param/batch_stats trees, with layout conversion:

- Conv2d weight OIHW -> flax HWIO (transpose 2,3,1,0)
- ConvTranspose2d weight (in,out,kh,kw) -> flax ConvTranspose kernel (kh,kw,in,out)
- BatchNorm weight/bias -> scale/bias; running_mean/var -> batch_stats

Tensors arrive as numpy (torch is only needed to deserialize the .pth; the mapping
itself is torch-free). Conversion is numerics-tested against torch ops in
tests/test_torch_import.py.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(sd: Dict[str, np.ndarray], torch_prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(sd[f"{torch_prefix}.weight"], (2, 3, 1, 0))}
    if f"{torch_prefix}.bias" in sd:
        out["bias"] = sd[f"{torch_prefix}.bias"]
    return out


def _conv_transpose(sd: Dict[str, np.ndarray], torch_prefix: str) -> Dict[str, np.ndarray]:
    # torch ConvTranspose2d weight: (in, out, kh, kw) -> flax (kh, kw, in, out).
    out = {"kernel": np.transpose(sd[f"{torch_prefix}.weight"], (2, 3, 0, 1))}
    if f"{torch_prefix}.bias" in sd:
        out["bias"] = sd[f"{torch_prefix}.bias"]
    return out


def _bn(sd: Dict[str, np.ndarray], torch_prefix: str):
    params = {"scale": sd[f"{torch_prefix}.weight"], "bias": sd[f"{torch_prefix}.bias"]}
    stats = {"mean": sd[f"{torch_prefix}.running_mean"],
             "var": sd[f"{torch_prefix}.running_var"]}
    return params, stats


def _double_conv(sd, torch_prefix: str):
    """Reference DoubleConv: Sequential(conv0, bn1, relu, conv3, bn4, relu)."""
    p: Dict = {}
    s: Dict = {}
    p["conv1"] = _conv(sd, f"{torch_prefix}.double_conv.0")
    p["bn1"], s["bn1"] = _bn(sd, f"{torch_prefix}.double_conv.1")
    p["conv2"] = _conv(sd, f"{torch_prefix}.double_conv.3")
    p["bn2"], s["bn2"] = _bn(sd, f"{torch_prefix}.double_conv.4")
    return p, s


def _down(sd, torch_prefix: str):
    """Reference Down: Sequential(maxpool, DoubleConv) -> ours: Down.conv."""
    p, s = _double_conv(sd, f"{torch_prefix}.maxpool_conv.1")
    return {"conv": p}, {"conv": s}


def _up(sd, torch_prefix: str, bilinear: bool):
    p: Dict = {}
    s: Dict = {}
    if not bilinear:
        p["up"] = _conv_transpose(sd, f"{torch_prefix}.up")
    cp, cs = _double_conv(sd, f"{torch_prefix}.conv")
    p["conv"] = cp
    s["conv"] = cs
    return p, s


def _encoder(sd):
    p: Dict = {}
    s: Dict = {}
    p["inc"], s["inc"] = _double_conv(sd, "inc")
    for i in range(1, 5):
        p[f"down{i}"], s[f"down{i}"] = _down(sd, f"down{i}")
    return p, s


def _decoder(sd, torch_suffix: str, our_prefix: str, bilinear: bool):
    p: Dict = {}
    s: Dict = {}
    for i in range(1, 5):
        tp = f"up{i}{torch_suffix}"
        p[f"{our_prefix}{i}"], s[f"{our_prefix}{i}"] = _up(sd, tp, bilinear)
    return p, s


def convert_state_dict(sd: Dict[str, np.ndarray], model: str = "anomaly_unet",
                       bilinear: bool = False) -> Tuple[Dict, Dict]:
    """torch state_dict (numpy values) -> (params, batch_stats) trees.

    model: 'unet' | 'seg_unet' | 'anomaly_unet'.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}
    params["encoder"], stats["encoder"] = _encoder(sd)

    if model == "anomaly_unet":
        params["decoder_recon"], stats["decoder_recon"] = _decoder(
            sd, "_recon", "up_recon", bilinear)
        params["decoder_seg"], stats["decoder_seg"] = _decoder(
            sd, "_seg", "up_seg", bilinear)
        params["outc_recon"] = {"conv": _conv(sd, "outc_recon.conv")}
        params["outc_seg"] = {"conv": _conv(sd, "outc_seg.conv")}
    else:
        params["decoder"], stats["decoder"] = _decoder(sd, "", "up", bilinear)
        params["outc"] = {"conv": _conv(sd, "outc.conv")}
    return params, stats


def load_torch_checkpoint(path: str, model: str = "anomaly_unet",
                          bilinear: bool = False) -> Tuple[Dict, Dict]:
    """Load a reference .pth (full checkpoint or bare state_dict) and convert."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("model_state_dict", blob) if isinstance(blob, dict) else blob
    sd_np = {k: v.detach().numpy() for k, v in sd.items()}
    return convert_state_dict(sd_np, model=model, bilinear=bilinear)


# ---------------------------------------------------------------------------
# Export (the inverse direction): tpu_unet trees -> reference state_dict
# ---------------------------------------------------------------------------

def _exp_conv(out: Dict[str, np.ndarray], p: Dict, torch_prefix: str) -> None:
    out[f"{torch_prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
    if "bias" in p:
        out[f"{torch_prefix}.bias"] = np.asarray(p["bias"])


def _exp_conv_transpose(out, p: Dict, torch_prefix: str) -> None:
    # flax ConvTranspose kernel (kh, kw, in, out) -> torch (in, out, kh, kw).
    out[f"{torch_prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (2, 3, 0, 1))
    if "bias" in p:
        out[f"{torch_prefix}.bias"] = np.asarray(p["bias"])


def _exp_bn(out, p: Dict, s: Dict, torch_prefix: str) -> None:
    out[f"{torch_prefix}.weight"] = np.asarray(p["scale"])
    out[f"{torch_prefix}.bias"] = np.asarray(p["bias"])
    out[f"{torch_prefix}.running_mean"] = np.asarray(s["mean"])
    out[f"{torch_prefix}.running_var"] = np.asarray(s["var"])
    out[f"{torch_prefix}.num_batches_tracked"] = np.asarray(0, np.int64)


def _exp_double_conv(out, p: Dict, s: Dict, torch_prefix: str) -> None:
    _exp_conv(out, p["conv1"], f"{torch_prefix}.double_conv.0")
    _exp_bn(out, p["bn1"], s["bn1"], f"{torch_prefix}.double_conv.1")
    _exp_conv(out, p["conv2"], f"{torch_prefix}.double_conv.3")
    _exp_bn(out, p["bn2"], s["bn2"], f"{torch_prefix}.double_conv.4")


def _exp_decoder(out, params: Dict, stats: Dict, torch_suffix: str,
                 our_prefix: str, bilinear: bool) -> None:
    for i in range(1, 5):
        p, s = params[f"{our_prefix}{i}"], stats[f"{our_prefix}{i}"]
        if not bilinear:
            _exp_conv_transpose(out, p["up"], f"up{i}{torch_suffix}.up")
        _exp_double_conv(out, p["conv"], s["conv"], f"up{i}{torch_suffix}.conv")


def export_state_dict(params: Dict, batch_stats: Dict,
                      model: str = "anomaly_unet",
                      bilinear: bool = False) -> Dict[str, np.ndarray]:
    """tpu_unet (params, batch_stats) -> reference-named torch state_dict (numpy).

    Exact inverse of :func:`convert_state_dict` (roundtrip-tested); lets models
    trained here run in the reference PyTorch stack (src/utils.py:49-58 loads the
    resulting .pth).
    """
    out: Dict[str, np.ndarray] = {}
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    _exp_double_conv(out, enc_p["inc"], enc_s["inc"], "inc")
    for i in range(1, 5):
        _exp_double_conv(out, enc_p[f"down{i}"]["conv"], enc_s[f"down{i}"]["conv"],
                         f"down{i}.maxpool_conv.1")

    if model == "anomaly_unet":
        _exp_decoder(out, params["decoder_recon"], batch_stats["decoder_recon"],
                     "_recon", "up_recon", bilinear)
        _exp_decoder(out, params["decoder_seg"], batch_stats["decoder_seg"],
                     "_seg", "up_seg", bilinear)
        _exp_conv(out, params["outc_recon"]["conv"], "outc_recon.conv")
        _exp_conv(out, params["outc_seg"]["conv"], "outc_seg.conv")
    else:
        _exp_decoder(out, params["decoder"], batch_stats["decoder"], "", "up",
                     bilinear)
        _exp_conv(out, params["outc"]["conv"], "outc.conv")
    return out


def save_torch_checkpoint(path: str, params: Dict, batch_stats: Dict,
                          model: str = "anomaly_unet", bilinear: bool = False,
                          epoch: int = 0, loss: float = 0.0) -> None:
    """Write a reference-layout .pth: {epoch, model_state_dict, optimizer_state_dict,
    loss} (mirrors /root/reference/src/utils.py:37-46)."""
    import torch

    def to_t(v):
        v = np.asarray(v)
        if v.dtype == np.int64:  # num_batches_tracked stays integral
            return torch.from_numpy(v.copy())
        # np.array always copies -> writable buffer (torch warns on read-only
        # jax.device_get views otherwise).
        return torch.from_numpy(np.array(v, np.float32))

    sd = {k: to_t(v)
          for k, v in export_state_dict(params, batch_stats, model, bilinear).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd,
                "optimizer_state_dict": {}, "loss": loss}, path)
