"""Convert reference PyTorch checkpoints (.amlt state_dicts) to this
framework's variables.

The reference saves plain `state_dict()`s (srcs/utils.py:85-95) whose key
names follow torch Sequential indices; this module maps them onto our named
flax modules.  Covered: SEANet encoder/decoder (incl. LSTM and weight-norm
parametrization), the RVQ codebooks, Unet1D (incl. cond upsamplers), and the
MS-STFT discriminator — i.e. everything in the released 1.5k/3k checkpoints.

Weight-layout contracts (see ops/conv.py docstrings):
  torch Conv1d weight (out, in, k)      -> kernel (k, in, out)
  torch ConvTranspose1d (in, out, k)    -> kernel (k, in, out)
  torch weight_norm `weight_g`          -> `kernel_g` (broadcast-reshaped)
  torch LSTM weight_ih_l{n} (4H, in)    -> w_ih (in, 4H); gate order kept
  torch Linear weight (out, in)         -> Dense kernel (in, out)
"""

from __future__ import annotations

import typing as tp

import numpy as np

Array = np.ndarray
StateDict = tp.Mapping[str, Array]


def _t(x) -> Array:
    x = np.asarray(x, np.float32)
    return x


def conv1d(sd: StateDict, prefix: str) -> tp.Dict[str, Array]:
    """NormConv1d params from `{prefix}.conv.{weight_v,weight_g,bias}`."""
    out: tp.Dict[str, Array] = {}
    if f"{prefix}.weight_v" in sd:
        v = _t(sd[f"{prefix}.weight_v"])  # (out, in, k)
        g = _t(sd[f"{prefix}.weight_g"])  # (out, 1, 1)
        out["kernel_v"] = v.transpose(2, 1, 0)
        out["kernel_g"] = g.reshape(1, 1, -1)
    else:
        out["kernel"] = _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def convtr1d(sd: StateDict, prefix: str) -> tp.Dict[str, Array]:
    """NormConvTranspose1d params; torch weight (in, out, k) -> (k, in, out)."""
    out: tp.Dict[str, Array] = {}
    if f"{prefix}.weight_v" in sd:
        v = _t(sd[f"{prefix}.weight_v"])
        g = _t(sd[f"{prefix}.weight_g"])  # (in, 1, 1)
        out["kernel_v"] = v.transpose(2, 0, 1)
        out["kernel_g"] = g.reshape(1, -1, 1)
    else:
        out["kernel"] = _t(sd[f"{prefix}.weight"]).transpose(2, 0, 1)
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv2d(sd: StateDict, prefix: str) -> tp.Dict[str, Array]:
    """NormConv2d params; torch (out, in, kh, kw) -> (kh, kw, in, out)."""
    out: tp.Dict[str, Array] = {}
    if f"{prefix}.weight_v" in sd:
        v = _t(sd[f"{prefix}.weight_v"])
        g = _t(sd[f"{prefix}.weight_g"])  # (out,1,1,1)
        out["kernel_v"] = v.transpose(2, 3, 1, 0)
        out["kernel_g"] = g.reshape(1, 1, 1, -1)
    else:
        out["kernel"] = _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def dense(sd: StateDict, prefix: str) -> tp.Dict[str, Array]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def lstm(sd: StateDict, prefix: str, num_layers: int) -> tp.Dict[str, Array]:
    out: tp.Dict[str, tp.Any] = {}
    for n in range(num_layers):
        out[f"layer_{n}"] = {
            "w_ih": _t(sd[f"{prefix}.weight_ih_l{n}"]).T,
            "w_hh": _t(sd[f"{prefix}.weight_hh_l{n}"]).T,
            "b_ih": _t(sd[f"{prefix}.bias_ih_l{n}"]),
            "b_hh": _t(sd[f"{prefix}.bias_hh_l{n}"]),
        }
    return out


def _resblock(sd: StateDict, prefix: str, n_convs: int = 2, true_skip: bool = False):
    """SEANetResnetBlock: torch Sequential block = [act, conv, act, conv]."""
    out: tp.Dict[str, tp.Any] = {}
    for i in range(n_convs):
        torch_idx = 2 * i + 1  # activations occupy even slots
        out[f"block_{i}"] = {"conv": conv1d(sd, f"{prefix}.block.{torch_idx}.conv.conv")}
    if not true_skip and f"{prefix}.shortcut.conv.conv.weight_v" in sd:
        out["shortcut"] = {"conv": conv1d(sd, f"{prefix}.shortcut.conv.conv")}
    return out


def seanet_encoder(
    sd: StateDict,
    prefix: str = "encoder",
    ratios: tp.Sequence[int] = (8, 5, 4, 2),
    n_residual_layers: int = 1,
    lstm_layers: int = 0,
) -> tp.Dict[str, tp.Any]:
    """Map the torch Sequential indices of SEANetEncoder
    (srcs/modules/seanet.py:106-151) onto our named modules."""
    base = (prefix + ".") if prefix else ""
    out: tp.Dict[str, tp.Any] = {}
    idx = 0
    out["init_conv"] = {"conv": conv1d(sd, f"{base}model.{idx}.conv.conv")}
    idx += 1
    for i in range(len(ratios)):  # encoder iterates reversed(ratios)
        for j in range(n_residual_layers):
            out[f"res_{i}_{j}"] = _resblock(sd, f"{base}model.{idx}")
            idx += 1
        idx += 1  # activation
        out[f"down_{i}"] = {"conv": conv1d(sd, f"{base}model.{idx}.conv.conv")}
        idx += 1
    if lstm_layers:
        out["lstm"] = lstm(sd, f"{base}model.{idx}.lstm", lstm_layers)
        idx += 1
    idx += 1  # activation
    out["final_conv"] = {"conv": conv1d(sd, f"{base}model.{idx}.conv.conv")}
    return out


def seanet_decoder(
    sd: StateDict,
    prefix: str = "decoder",
    ratios: tp.Sequence[int] = (8, 5, 4, 2),
    n_residual_layers: int = 1,
    lstm_layers: int = 0,
) -> tp.Dict[str, tp.Any]:
    """srcs/modules/seanet.py:202-244 Sequential order."""
    base = (prefix + ".") if prefix else ""
    out: tp.Dict[str, tp.Any] = {}
    idx = 0
    out["init_conv"] = {"conv": conv1d(sd, f"{base}model.{idx}.conv.conv")}
    idx += 1
    if lstm_layers:
        out["lstm"] = lstm(sd, f"{base}model.{idx}.lstm", lstm_layers)
        idx += 1
    for i in range(len(ratios)):
        idx += 1  # activation
        out[f"up_{i}"] = {"convtr": convtr1d(sd, f"{base}model.{idx}.convtr.convtr")}
        idx += 1
        for j in range(n_residual_layers):
            out[f"res_{i}_{j}"] = _resblock(sd, f"{base}model.{idx}")
            idx += 1
    idx += 1  # activation
    out["final_conv"] = {"conv": conv1d(sd, f"{base}model.{idx}.conv.conv")}
    return out


def rvq_state(sd: StateDict, prefix: str = "quantizer", n_q: tp.Optional[int] = None):
    """Stack per-stage EuclideanCodebook buffers into our RVQState."""
    from ..quantization.core import RVQState

    base = (prefix + ".") if prefix else ""
    qs = []
    q = 0
    while f"{base}vq.layers.{q}._codebook.embed" in sd:
        qs.append(q)
        q += 1
        if n_q is not None and q >= n_q:
            break
    embed = np.stack([_t(sd[f"{base}vq.layers.{q}._codebook.embed"]) for q in qs])
    embed_avg = np.stack([_t(sd[f"{base}vq.layers.{q}._codebook.embed_avg"]) for q in qs])
    cluster = np.stack([_t(sd[f"{base}vq.layers.{q}._codebook.cluster_size"]) for q in qs])
    inited = np.stack(
        [_t(sd[f"{base}vq.layers.{q}._codebook.inited"]).reshape(()) for q in qs]
    ).astype(bool)
    import jax.numpy as jnp

    return RVQState(
        embed=jnp.asarray(embed),
        embed_avg=jnp.asarray(embed_avg),
        cluster_size=jnp.asarray(cluster),
        inited=jnp.asarray(inited),
    )


def _plain_conv(sd: StateDict, prefix: str) -> tp.Dict[str, Array]:
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _unet_resblock(sd: StateDict, prefix: str, has_film: bool = False):
    out: tp.Dict[str, tp.Any] = {
        "block1": {
            "proj": _plain_conv(sd, f"{prefix}.block1.proj"),
            "norm": {
                "scale": _t(sd[f"{prefix}.block1.norm.weight"]),
                "bias": _t(sd[f"{prefix}.block1.norm.bias"]),
            },
        },
        "block2": {
            "proj": _plain_conv(sd, f"{prefix}.block2.proj"),
            "norm": {
                "scale": _t(sd[f"{prefix}.block2.norm.weight"]),
                "bias": _t(sd[f"{prefix}.block2.norm.bias"]),
            },
        },
    }
    if f"{prefix}.mlp.1.weight" in sd:
        out["mlp"] = dense(sd, f"{prefix}.mlp.1")
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _plain_conv(sd, f"{prefix}.res_conv")
    if has_film and f"{prefix}.scale_layer.weight" in sd:
        out["scale_layer"] = dense(sd, f"{prefix}.scale_layer")
        out["shift_layer"] = dense(sd, f"{prefix}.shift_layer")
    return out


def _unet_attention(sd: StateDict, prefix: str, linear: bool):
    fn: tp.Dict[str, tp.Any] = {"to_qkv": _plain_conv(sd, f"{prefix}.fn.to_qkv")}
    if linear:
        fn["to_out"] = _plain_conv(sd, f"{prefix}.fn.to_out.0")
        fn["out_norm"] = {"g": _t(sd[f"{prefix}.fn.to_out.1.g"]).reshape(-1)}
    else:
        fn["to_out"] = _plain_conv(sd, f"{prefix}.fn.to_out")
    return {"norm": {"g": _t(sd[f"{prefix}.norm.g"]).reshape(-1)}, "fn": fn}


def unet1d(
    sd: StateDict,
    prefix: str = "diff_model",
    n_stages: int = 5,
    use_film: bool = False,
    upsampling_ratios: tp.Optional[tp.Sequence[int]] = (5, 4, 2),
) -> tp.Dict[str, tp.Any]:
    """Map reference Unet1D (srcs/modules/unet.py:250-377) names."""
    p = prefix if prefix else ""
    d = (p + ".") if p else ""
    out: tp.Dict[str, tp.Any] = {
        "init_conv": _plain_conv(sd, f"{d}init_conv"),
        "time_mlp_1": dense(sd, f"{d}time_mlp.1"),
        "time_mlp_2": dense(sd, f"{d}time_mlp.3"),
        "mid_block1": _unet_resblock(sd, f"{d}mid_block1"),
        "mid_attn": _unet_attention(sd, f"{d}mid_attn.fn", linear=False),
        "mid_block2": _unet_resblock(sd, f"{d}mid_block2"),
        "final_res_block": _unet_resblock(sd, f"{d}final_res_block"),
        "final_conv": _plain_conv(sd, f"{d}final_conv"),
    }
    if f"{d}time_mlp.0.weights" in sd:
        # RandomOrLearnedSinusoidalPosEmb (reference unet.py:118-135)
        out["sinu_pos_emb"] = {"weights": np.asarray(sd[f"{d}time_mlp.0.weights"])}
    for i in range(n_stages):
        out[f"down_{i}_block1"] = _unet_resblock(sd, f"{d}downs.{i}.0")
        out[f"down_{i}_block2"] = _unet_resblock(sd, f"{d}downs.{i}.1", has_film=use_film)
        out[f"down_{i}_attn"] = _unet_attention(sd, f"{d}downs.{i}.2.fn", linear=True)
        if i < n_stages - 1:
            out[f"down_{i}_downsample"] = _plain_conv(sd, f"{d}downs.{i}.3")
        else:
            out[f"down_{i}_conv"] = _plain_conv(sd, f"{d}downs.{i}.3")
        out[f"up_{i}_block1"] = _unet_resblock(sd, f"{d}ups.{i}.0")
        out[f"up_{i}_block2"] = _unet_resblock(sd, f"{d}ups.{i}.1", has_film=use_film)
        out[f"up_{i}_attn"] = _unet_attention(sd, f"{d}ups.{i}.2.fn", linear=True)
        if i < n_stages - 1:
            # torch Upsample = Sequential(Upsample, Conv1d): conv at .1
            out[f"up_{i}_upsample"] = _plain_conv(sd, f"{d}ups.{i}.3.1")
        else:
            out[f"up_{i}_upsample"] = _plain_conv(sd, f"{d}ups.{i}.3")
    has_up = any(
        f"{d}upsampling_layers.0.convtr.convtr.{s}" in sd for s in ("weight_v", "weight")
    )
    if upsampling_ratios is not None and has_up:
        cu = {}
        for i in range(len(upsampling_ratios)):
            cu[f"layer_{i}"] = {
                "convtr": convtr1d(sd, f"{d}upsampling_layers.{i}.convtr.convtr")
            }
        out["cond_upsampler"] = cu
    return out


def msstftd(sd: StateDict, prefix: str = "", n_discs: int = 3, n_convs: int = 5):
    out: tp.Dict[str, tp.Any] = {}
    p = prefix + "discriminators" if not prefix or prefix.endswith(".") else prefix
    for d in range(n_discs):
        disc: tp.Dict[str, tp.Any] = {}
        for c in range(n_convs - 1):
            disc[f"conv_{c}"] = conv2d(sd, f"{d}{d}.convs.{c}.conv")
        disc["conv_last"] = conv2d(sd, f"{d}{d}.convs.{n_convs - 1}.conv")
        disc["conv_post"] = conv2d(sd, f"{d}{d}.conv_post.conv")
        out[f"disc_{d}"] = disc
    return out


def diff_audio_rep(
    sd: StateDict,
    enc_ratios: tp.Sequence[int] = (8, 5, 4, 2),
    n_residual_layers: int = 1,
    lstm_layers: int = 0,
    quantization: bool = False,
    run_diff: bool = False,
    use_film: bool = False,
    upsampling_ratios: tp.Optional[tp.Sequence[int]] = (5, 4, 2),
) -> tp.Dict[str, tp.Any]:
    """Full DiffAudioRep variables {'params': ..., 'quantizer': ...} from a
    reference state_dict (strip any DDP 'module.' prefix first)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    params: tp.Dict[str, tp.Any] = {
        "encoder": seanet_encoder(sd, "encoder", enc_ratios, n_residual_layers, lstm_layers),
        "decoder": seanet_decoder(sd, "decoder", enc_ratios, n_residual_layers, lstm_layers),
    }
    if run_diff:
        params["diff_model"] = unet1d(
            sd, "diff_model", use_film=use_film, upsampling_ratios=upsampling_ratios
        )
    variables: tp.Dict[str, tp.Any] = {"params": params}
    if quantization:
        variables["quantizer"] = {"state": rvq_state(sd)}
    return variables


def load_torch_state_dict(path: str) -> tp.Dict[str, Array]:
    """Load a .amlt / .pth state_dict into numpy (torch cpu available)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def encodec_variables(
    sd: StateDict,
    ratios: tp.Sequence[int] = (8, 5, 4, 2),
    n_residual_layers: int = 1,
    lstm_layers: int = 2,
) -> tp.Dict[str, tp.Any]:
    """Variables for bitstream.EncodecModel from a Meta EnCodec state_dict
    (keys: encoder.model.* / decoder.model.* / quantizer.vq.layers.*)."""
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    return {
        "encoder": seanet_encoder(sd, "encoder", ratios, n_residual_layers, lstm_layers),
        "decoder": seanet_decoder(sd, "decoder", ratios, n_residual_layers, lstm_layers),
        "rvq": rvq_state(sd, "quantizer"),
    }


def _mha(sd: StateDict, prefix: str) -> tp.Dict[str, Array]:
    """torch nn.MultiheadAttention (packed in_proj) -> our StreamingMHA
    (separate q/k/v Dense)."""
    w = _t(sd[f"{prefix}.in_proj_weight"])  # (3E, E)
    b = _t(sd[f"{prefix}.in_proj_bias"])  # (3E,)
    E = w.shape[1]
    out = {}
    for i, name in enumerate(["q", "k", "v"]):
        out[name] = {"kernel": w[i * E:(i + 1) * E].T, "bias": b[i * E:(i + 1) * E]}
    out["out"] = dense(sd, f"{prefix}.out_proj")
    return out


def _ln(sd: StateDict, prefix: str) -> tp.Dict[str, Array]:
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def streaming_transformer(sd: StateDict, prefix: str = "transformer",
                          num_layers: int = 5) -> tp.Dict[str, tp.Any]:
    """StreamingTransformerEncoder params from the torch layout
    (reference transformer_encodec.py:62-119)."""
    base = (prefix + ".") if prefix else ""
    out: tp.Dict[str, tp.Any] = {}
    if f"{base}norm_in.weight" in sd:
        out["norm_in"] = _ln(sd, f"{base}norm_in")
    for i in range(num_layers):
        p = f"{base}layers.{i}"
        out[f"layer_{i}"] = {
            "norm1": _ln(sd, f"{p}.norm1"),
            "norm2": _ln(sd, f"{p}.norm2"),
            "self_attn": _mha(sd, f"{p}.self_attn"),
            "linear1": dense(sd, f"{p}.linear1"),
            "linear2": dense(sd, f"{p}.linear2"),
        }
    return out


def lm_model(sd: StateDict, n_q: int = 32, num_layers: int = 5) -> tp.Dict[str, tp.Any]:
    """LMModel params (reference model-checkpoint.py:32-70): per-codebook
    embeddings + linears + the streaming transformer."""
    out: tp.Dict[str, tp.Any] = {
        "transformer": streaming_transformer(sd, "transformer", num_layers)
    }
    for k in range(n_q):
        out[f"emb_{k}"] = {"embedding": _t(sd[f"emb.{k}.weight"])}
        out[f"linear_{k}"] = dense(sd, f"linears.{k}")
    return {"params": out}
