"""Export this framework's variables to reference-layout PyTorch state_dicts.

Exact inverse of `torch_convert` (same weight-layout contracts, see
ops/conv.py docstrings and torch_convert.py:10-16): produces the key names
the reference's torch modules load with `load_state_dict(strict=True)`
(srcs/modules/seanet.py Sequential indices, srcs/modules/unet.py attribute
names, srcs/quantization/core_vq.py codebook buffers).

Used by scripts/quality_parity.py --from_jax to decode the same clips through
the torch reference pipeline with OUR trained weights (SURVEY §7 M2).
"""

from __future__ import annotations

import typing as tp

import numpy as np

Array = np.ndarray
StateDict = tp.Dict[str, Array]


def _n(x) -> Array:
    return np.asarray(x, np.float32)


def conv1d(p: tp.Mapping, prefix: str, sd: StateDict) -> None:
    """NormConv1d params -> `{prefix}.{weight_v,weight_g,bias}`."""
    if "kernel_v" in p:
        sd[f"{prefix}.weight_v"] = _n(p["kernel_v"]).transpose(2, 1, 0)
        sd[f"{prefix}.weight_g"] = _n(p["kernel_g"]).reshape(-1, 1, 1)
    else:
        sd[f"{prefix}.weight"] = _n(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _n(p["bias"])


def convtr1d(p: tp.Mapping, prefix: str, sd: StateDict) -> None:
    """NormConvTranspose1d kernel (k, in, out) -> torch (in, out, k)."""
    if "kernel_v" in p:
        sd[f"{prefix}.weight_v"] = _n(p["kernel_v"]).transpose(1, 2, 0)
        sd[f"{prefix}.weight_g"] = _n(p["kernel_g"]).reshape(-1, 1, 1)
    else:
        sd[f"{prefix}.weight"] = _n(p["kernel"]).transpose(1, 2, 0)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _n(p["bias"])


def dense(p: tp.Mapping, prefix: str, sd: StateDict) -> None:
    sd[f"{prefix}.weight"] = _n(p["kernel"]).T
    if "bias" in p:
        sd[f"{prefix}.bias"] = _n(p["bias"])


def lstm(p: tp.Mapping, prefix: str, sd: StateDict) -> None:
    for name, lp in p.items():  # layer_{n}
        n = name.split("_")[1]
        sd[f"{prefix}.weight_ih_l{n}"] = _n(lp["w_ih"]).T
        sd[f"{prefix}.weight_hh_l{n}"] = _n(lp["w_hh"]).T
        sd[f"{prefix}.bias_ih_l{n}"] = _n(lp["b_ih"])
        sd[f"{prefix}.bias_hh_l{n}"] = _n(lp["b_hh"])


def _resblock(p: tp.Mapping, prefix: str, sd: StateDict) -> None:
    for name, bp in p.items():
        if name.startswith("block_"):
            i = int(name.split("_")[1])
            conv1d(bp["conv"], f"{prefix}.block.{2 * i + 1}.conv.conv", sd)
        elif name == "shortcut":
            conv1d(bp["conv"], f"{prefix}.shortcut.conv.conv", sd)


def seanet_encoder(
    params: tp.Mapping,
    prefix: str = "encoder",
    ratios: tp.Sequence[int] = (8, 5, 4, 2),
    n_residual_layers: int = 1,
    lstm_layers: int = 0,
) -> StateDict:
    """Inverse of torch_convert.seanet_encoder (same Sequential walk)."""
    base = (prefix + ".") if prefix else ""
    sd: StateDict = {}
    idx = 0
    conv1d(params["init_conv"]["conv"], f"{base}model.{idx}.conv.conv", sd)
    idx += 1
    for i in range(len(ratios)):
        for j in range(n_residual_layers):
            _resblock(params[f"res_{i}_{j}"], f"{base}model.{idx}", sd)
            idx += 1
        idx += 1  # activation
        conv1d(params[f"down_{i}"]["conv"], f"{base}model.{idx}.conv.conv", sd)
        idx += 1
    if lstm_layers:
        lstm(params["lstm"], f"{base}model.{idx}.lstm", sd)
        idx += 1
    idx += 1  # activation
    conv1d(params["final_conv"]["conv"], f"{base}model.{idx}.conv.conv", sd)
    return sd


def seanet_decoder(
    params: tp.Mapping,
    prefix: str = "decoder",
    ratios: tp.Sequence[int] = (8, 5, 4, 2),
    n_residual_layers: int = 1,
    lstm_layers: int = 0,
) -> StateDict:
    base = (prefix + ".") if prefix else ""
    sd: StateDict = {}
    idx = 0
    conv1d(params["init_conv"]["conv"], f"{base}model.{idx}.conv.conv", sd)
    idx += 1
    if lstm_layers:
        lstm(params["lstm"], f"{base}model.{idx}.lstm", sd)
        idx += 1
    for i in range(len(ratios)):
        idx += 1  # activation
        convtr1d(params[f"up_{i}"]["convtr"], f"{base}model.{idx}.convtr.convtr", sd)
        idx += 1
        for j in range(n_residual_layers):
            _resblock(params[f"res_{i}_{j}"], f"{base}model.{idx}", sd)
            idx += 1
    idx += 1  # activation
    conv1d(params["final_conv"]["conv"], f"{base}model.{idx}.conv.conv", sd)
    return sd


def rvq_state_dict(state, prefix: str = "quantizer") -> StateDict:
    """RVQState (stacked) -> per-stage EuclideanCodebook buffers."""
    base = (prefix + ".") if prefix else ""
    sd: StateDict = {}
    embed = _n(state.embed)
    embed_avg = _n(state.embed_avg)
    cluster = _n(state.cluster_size)
    inited = np.asarray(state.inited)
    for q in range(embed.shape[0]):
        p = f"{base}vq.layers.{q}._codebook"
        sd[f"{p}.embed"] = embed[q]
        sd[f"{p}.embed_avg"] = embed_avg[q]
        sd[f"{p}.cluster_size"] = cluster[q]
        sd[f"{p}.inited"] = np.asarray([inited[q]], np.float32)
    return sd


def _plain_conv(p: tp.Mapping, prefix: str, sd: StateDict) -> None:
    sd[f"{prefix}.weight"] = _n(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _n(p["bias"])


def _unet_resblock(p: tp.Mapping, prefix: str, sd: StateDict) -> None:
    for b in ("block1", "block2"):
        _plain_conv(p[b]["proj"], f"{prefix}.{b}.proj", sd)
        sd[f"{prefix}.{b}.norm.weight"] = _n(p[b]["norm"]["scale"])
        sd[f"{prefix}.{b}.norm.bias"] = _n(p[b]["norm"]["bias"])
    if "mlp" in p:
        dense(p["mlp"], f"{prefix}.mlp.1", sd)
    if "res_conv" in p:
        _plain_conv(p["res_conv"], f"{prefix}.res_conv", sd)
    if "scale_layer" in p:
        dense(p["scale_layer"], f"{prefix}.scale_layer", sd)
        dense(p["shift_layer"], f"{prefix}.shift_layer", sd)


def _unet_attention(p: tp.Mapping, prefix: str, linear: bool, sd: StateDict) -> None:
    # torch: Residual(PreNorm(dim, Attn)) -> {prefix}.norm.g, {prefix}.fn.*
    sd[f"{prefix}.norm.g"] = _n(p["norm"]["g"]).reshape(1, -1, 1)
    fn = p["fn"]
    _plain_conv(fn["to_qkv"], f"{prefix}.fn.to_qkv", sd)
    if linear:
        _plain_conv(fn["to_out"], f"{prefix}.fn.to_out.0", sd)
        sd[f"{prefix}.fn.to_out.1.g"] = _n(fn["out_norm"]["g"]).reshape(1, -1, 1)
    else:
        _plain_conv(fn["to_out"], f"{prefix}.fn.to_out", sd)


def unet1d(
    params: tp.Mapping,
    prefix: str = "diff_model",
    n_stages: int = 5,
) -> StateDict:
    """Inverse of torch_convert.unet1d — reference srcs/modules/unet.py names."""
    d = (prefix + ".") if prefix else ""
    sd: StateDict = {}
    _plain_conv(params["init_conv"], f"{d}init_conv", sd)
    dense(params["time_mlp_1"], f"{d}time_mlp.1", sd)
    dense(params["time_mlp_2"], f"{d}time_mlp.3", sd)
    if "sinu_pos_emb" in params:
        sd[f"{d}time_mlp.0.weights"] = _n(params["sinu_pos_emb"]["weights"])
    _unet_resblock(params["mid_block1"], f"{d}mid_block1", sd)
    _unet_attention(params["mid_attn"], f"{d}mid_attn.fn", False, sd)
    _unet_resblock(params["mid_block2"], f"{d}mid_block2", sd)
    _unet_resblock(params["final_res_block"], f"{d}final_res_block", sd)
    _plain_conv(params["final_conv"], f"{d}final_conv", sd)
    for i in range(n_stages):
        _unet_resblock(params[f"down_{i}_block1"], f"{d}downs.{i}.0", sd)
        _unet_resblock(params[f"down_{i}_block2"], f"{d}downs.{i}.1", sd)
        _unet_attention(params[f"down_{i}_attn"], f"{d}downs.{i}.2.fn", True, sd)
        if i < n_stages - 1:
            _plain_conv(params[f"down_{i}_downsample"], f"{d}downs.{i}.3", sd)
        else:
            _plain_conv(params[f"down_{i}_conv"], f"{d}downs.{i}.3", sd)
        _unet_resblock(params[f"up_{i}_block1"], f"{d}ups.{i}.0", sd)
        _unet_resblock(params[f"up_{i}_block2"], f"{d}ups.{i}.1", sd)
        _unet_attention(params[f"up_{i}_attn"], f"{d}ups.{i}.2.fn", True, sd)
        if i < n_stages - 1:
            _plain_conv(params[f"up_{i}_upsample"], f"{d}ups.{i}.3.1", sd)
        else:
            _plain_conv(params[f"up_{i}_upsample"], f"{d}ups.{i}.3", sd)
    if "cond_upsampler" in params:
        cu = params["cond_upsampler"]
        for name, lp in cu.items():  # layer_{i}
            i = name.split("_")[1]
            convtr1d(lp["convtr"], f"{d}upsampling_layers.{i}.convtr.convtr", sd)
    return sd
