"""Quality-parity harness vs released reference checkpoints (SURVEY §7 M2).

Given the reference's released .amlt checkpoints (not downloadable in this
zero-egress container — provide paths), this script:
  1. converts cond codec + diffusion model weights to this framework,
  2. decodes a directory of wavs BOTH ways — the torch reference pipeline
     (via tests/ref_shim) and the JAX pipeline — with the same midway_t,
  3. reports SI-SNR between the two decodes and against the originals.

Usage:
  python scripts/quality_parity.py \
      --ladiff_ckpt model_1.5k.amlt --cond_ckpt codec_1.5k.amlt \
      --input_dir wavs/ [--midway_t 100] [--n_files 8]

With --from_jax the two checkpoint args are orbax TrainState directories
written by our trainer (stage-3 diffusion / stage-1 codec); they are exported
to reference-layout torch state_dicts (utils/torch_export) so the SAME
trained weights drive both pipelines.

With trained checkpoints the JAX-vs-torch SI-SNR is the BASELINE.json
"decoded waveforms matching the PyTorch reference" gate (samplers draw
independent noise, so compare via SI-SNR/spectral distance, not sample-exact
equality; pass --midway_t 1 for the deterministic variant).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def si_snr(ref, est, eps=1e-8):
    ref = ref - ref.mean()
    est = est - est.mean()
    s = np.dot(est, ref) * ref / (np.dot(ref, ref) + eps)
    e = est - s
    return float(10 * np.log10((np.dot(s, s) + eps) / (np.dot(e, e) + eps)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ladiff_ckpt", required=True, help=".amlt of the diffusion model")
    p.add_argument("--cond_ckpt", required=True, help=".amlt of the cond codec")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--midway_t", type=int, default=100)
    p.add_argument("--n_files", type=int, default=8)
    p.add_argument("--bandwidth", type=float, default=1.5)
    p.add_argument("--enc_ratios", nargs="+", type=int, default=[8])
    p.add_argument("--cond_enc_ratios", nargs="+", type=int, default=[8, 5, 4, 2])
    p.add_argument("--upsampling_ratios", nargs="+", type=int, default=[5, 4, 2])
    p.add_argument("--diff_dims", type=int, default=256)
    p.add_argument("--from_jax", action="store_true",
                   help="checkpoint args are orbax TrainState dirs from our trainer")
    p.add_argument("--cond_lstm", type=int, default=2)
    p.add_argument("--dec_lstm", type=int, default=0)
    args = p.parse_args()

    import torch
    import jax
    import jax.numpy as jnp
    from ref_shim import reference_modules, reference_quantization, _load, REF
    from ladiffcodec_tpu.utils import torch_convert as tc
    from ladiffcodec_tpu.data.audio_io import read_wav, resample

    ref = reference_modules()
    refq = reference_quantization()
    ddpm = _load("refmod", f"{REF}/losses", "ddpm_loss")

    if args.from_jax:
        from ladiffcodec_tpu.utils import torch_export as texp
        from ladiffcodec_tpu.utils.checkpoint import load_checkpoint_path, _rebuild_quantizer

        raw3 = load_checkpoint_path(None, args.ladiff_ckpt)
        raw1 = load_checkpoint_path(None, args.cond_ckpt)
        cond_sd = texp.seanet_encoder(
            raw1["params"]["encoder"], "encoder", args.cond_enc_ratios, 1, args.cond_lstm)
        cond_sd.update(texp.rvq_state_dict(
            _rebuild_quantizer(raw1["quantizer"])["state"], "quantizer"))
        ladiff_sd = texp.unet1d(raw3["params"]["diff_model"], "diff_model",
                                n_stages=5)
        ladiff_sd.update(texp.seanet_decoder(
            raw3["params"]["decoder"], "decoder", args.enc_ratios, 1, args.dec_lstm))
    else:
        ladiff_sd = tc.load_torch_state_dict(args.ladiff_ckpt)
        cond_sd = tc.load_torch_state_dict(args.cond_ckpt)

    # ---- torch side ----
    tsd = {k: torch.from_numpy(v) for k, v in ladiff_sd.items()}
    csd = {k: torch.from_numpy(v) for k, v in cond_sd.items()}
    cond_enc_t = ref.SEANetEncoder(channels=1, ratios=list(args.cond_enc_ratios),
                                   causal=True, lstm=args.cond_lstm)
    n_q = int(1000 * args.bandwidth // (50 * 10))
    # the checkpoint may carry more codebooks than the target bandwidth uses
    n_layers = 1 + max(
        int(k.split("quantizer.vq.layers.")[1].split(".")[0])
        for k in cond_sd if k.startswith("quantizer.vq.layers."))
    rvq_t = refq.vq.ResidualVectorQuantizer(dimension=128, n_q=n_layers, bins=1024)
    unet_t = ref.unet.Unet1D(dim=args.diff_dims, dim_mults=(1, 2, 2, 4, 4),
                             inp_channels=128, other_cond=True, cond_channels=128,
                             upsampling_ratios=list(args.upsampling_ratios),
                             unet_scale_cond=True)
    dec_t = ref.SEANetDecoder(channels=1, ratios=list(args.enc_ratios), causal=True,
                              lstm=args.dec_lstm)
    cond_enc_t.load_state_dict({k[len("encoder."):]: v for k, v in csd.items()
                                if k.startswith("encoder.")})
    rvq_t.load_state_dict({k[len("quantizer."):]: v for k, v in csd.items()
                           if k.startswith("quantizer.")})
    unet_t.load_state_dict({k[len("diff_model."):]: v for k, v in tsd.items()
                            if k.startswith("diff_model.")})
    dec_t.load_state_dict({k[len("decoder."):]: v for k, v in tsd.items()
                           if k.startswith("decoder.")})
    for m in (cond_enc_t, rvq_t, unet_t, dec_t):
        m.eval()
    gd_t = ddpm.GaussianDiffusion1D(model=unet_t, seq_length=1200).eval()

    # ---- JAX side (converted) ----
    from ladiffcodec_tpu.models.seanet import SEANetEncoder, SEANetDecoder
    from ladiffcodec_tpu.models.unet1d import Unet1D
    from ladiffcodec_tpu.quantization import rvq_encode, rvq_decode
    from ladiffcodec_tpu.diffusion import GaussianDiffusion1D, make_schedule

    enc_j = SEANetEncoder(channels=1, ratios=tuple(args.cond_enc_ratios), causal=True,
                          lstm=args.cond_lstm)
    unet_j = Unet1D(dim=args.diff_dims, dim_mults=(1, 2, 2, 4, 4), inp_channels=128,
                    other_cond=True, cond_channels=128,
                    upsampling_ratios=tuple(args.upsampling_ratios), unet_scale_cond=True)
    dec_j = SEANetDecoder(channels=1, ratios=tuple(args.enc_ratios), causal=True,
                          lstm=args.dec_lstm)
    enc_p = {"params": tc.seanet_encoder(cond_sd, "encoder", args.cond_enc_ratios, 1,
                                         args.cond_lstm)}
    rvq_s = tc.rvq_state(cond_sd, "quantizer")
    unet_p = {"params": tc.unet1d(ladiff_sd, "diff_model", 5,
                                  upsampling_ratios=tuple(args.upsampling_ratios))}
    dec_p = {"params": tc.seanet_decoder(ladiff_sd, "decoder", args.enc_ratios, 1,
                                         args.dec_lstm)}
    gd_j = GaussianDiffusion1D(schedule=make_schedule(1000, "cosine"))

    files = sorted(glob.glob(os.path.join(args.input_dir, "**/*.wav"),
                             recursive=True))[: args.n_files]
    scores_tj, scores_to, scores_jo, scores_lat, scores_dec = [], [], [], [], []
    for f in files:
        audio, sr = read_wav(f)
        audio = resample(audio, sr, 16000)
        L = audio.shape[-1] // 640 * 640
        wav = audio[:1, :L]

        with torch.no_grad():
            xt = torch.from_numpy(wav[None])
            c = cond_enc_t(xt)
            q, _, _ = rvq_t.vq(c, n_q=n_q)
            img = q
            for layer in unet_t.upsampling_layers:
                img = layer(img)
            img = img / (img.abs().max() + 1e-8)
            s = gd_t.halfway_sampling(img=img, condition=q, t=args.midway_t)
            y_t = dec_t(s).numpy()[0, 0]

        xj = jnp.asarray(wav.T[None])
        cj = enc_j.apply(enc_p, xj)
        codes = rvq_encode(rvq_s, cj, n_q)
        qj = rvq_decode(rvq_s, codes)
        raw = unet_j.apply(unet_p, qj, method=lambda m, cc: m.cond_upsampler(cc))
        imgj = raw / (jnp.max(jnp.abs(raw)) + 1e-8)
        model_fn = lambda xx, tt, cc: unet_j.apply(unet_p, xx, tt, cc)
        sj = gd_j.halfway_sampling(model_fn, imgj, args.midway_t, jax.random.PRNGKey(0), qj)
        y_j = np.asarray(dec_j.apply(dec_p, sj))[0, :, 0]

        # latent-domain agreement (pre-decoder): localizes divergence —
        # the causal LSTM decoder chaotically amplifies tiny kernel-level
        # differences when the sample rides the clip boundary
        lat_t = s.numpy()[0].T.reshape(-1)
        lat_j = np.asarray(sj)[0].reshape(-1)
        scores_lat.append(si_snr(lat_t, lat_j))

        # decoder-only agreement: both decoders on the SAME (torch) latent
        y_cross = np.asarray(dec_j.apply(dec_p, jnp.asarray(s.numpy().transpose(0, 2, 1))))[0, :, 0]
        scores_dec.append(si_snr(y_t, y_cross))

        scores_tj.append(si_snr(y_t, y_j))
        scores_to.append(si_snr(wav[0], y_t))
        scores_jo.append(si_snr(wav[0], y_j))
        print(f"{os.path.basename(f)}: torch-vs-jax {scores_tj[-1]:.2f} dB "
              f"(latent {scores_lat[-1]:.2f}) | "
              f"torch-vs-orig {scores_to[-1]:.2f} | jax-vs-orig {scores_jo[-1]:.2f}")

    print(f"\nmean torch-vs-jax SI-SNR: {np.mean(scores_tj):.2f} dB over {len(files)} files"
          f" (latent domain {np.mean(scores_lat):.2f} dB, decoder-only "
          f"{np.mean(scores_dec):.2f} dB)")
    print(f"mean vs original: torch {np.mean(scores_to):.2f} dB, jax {np.mean(scores_jo):.2f} dB")


if __name__ == "__main__":
    main()
