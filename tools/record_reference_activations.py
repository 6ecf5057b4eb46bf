#!/usr/bin/env python
"""Record per-stage activations from the reference implementation for the
parity harness (tools/parity_check.py).

Run this on a machine with the reference's torch environment (torch,
transformers, timm, torchdiffeq) and the FLOAT checkpoint:

    python tools/record_reference_activations.py \
        --reference /path/to/ComfyUI-FLOAT_Optimized \
        --checkpoint FLOAT.safetensors \
        --image face_512.npy --audio audio_16k.npy -o acts.npz

It drives the reference's own modules at runtime (nothing is copied);
the recorded .npz is the golden input for parity_check.py.
"""
import argparse
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np


def load_reference_pkg(ref_root: Path):
    """Import the reference model modules without the ComfyUI host."""
    models = ref_root / "src" / "nodes" / "models"
    pkg = types.ModuleType("refm")
    pkg.__path__ = [str(models)]
    sys.modules["refm"] = pkg

    def load(name, path, package):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        mod.__package__ = package
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("refm.misc", models / "misc.py", "refm")
    sub = types.ModuleType("refm.float")
    sub.__path__ = [str(models / "float")]
    sys.modules["refm.float"] = sub
    enc = load("refm.float.encoder", models / "float" / "encoder.py", "refm.float")
    dec = load("refm.float.styledecoder", models / "float" / "styledecoder.py",
               "refm.float")
    w2v = load("refm.wav2vec2", models / "wav2vec2.py", "refm")
    ser = load("refm.wav2vec2_ser", models / "wav2vec2_ser.py", "refm")
    return enc, dec, w2v, ser


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--image", required=True, help="(1,3,S,S) [-1,1] .npy")
    ap.add_argument("--audio", required=True, help="(1,N) normalized .npy")
    ap.add_argument("--nfe", type=int, default=10)
    ap.add_argument("--a-cfg", type=float, default=2.0)
    ap.add_argument("--e-cfg", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=15)
    ap.add_argument("-o", "--output", default="acts.npz")
    args = ap.parse_args()

    import torch
    from safetensors.torch import load_file

    enc_mod, dec_mod, w2v_mod, _ser_mod = load_reference_pkg(Path(args.reference))

    sd = load_file(args.checkpoint)

    def sub(prefix):
        plen = len(prefix) + 1
        return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}

    # motion autoencoder
    encoder = enc_mod.Encoder(512, 512, 20).eval()
    encoder.load_state_dict(sub("motion_autoencoder.enc"), strict=False)
    synthesis = dec_mod.Synthesis(512, 512, 20).eval()
    synthesis.load_state_dict(sub("motion_autoencoder.dec"), strict=False)

    image = torch.as_tensor(np.load(args.image))
    audio = torch.as_tensor(np.load(args.audio))

    out = {"image": image.numpy(), "audio": audio.numpy()}
    with torch.no_grad():
        s_r, _, feats = encoder(image, None)
        lam = encoder.fc(s_r)
        r_s = synthesis.direction(lam)
        out.update(s_r=s_r.numpy(), r_s_lambda=lam.numpy(), r_s=r_s.numpy())

        # audio latents via the reference wav2vec2 path
        from transformers import Wav2Vec2Config
        cfg_json = Path(args.reference) / "src/nodes/model_configs/wav2vec2_base/config.json"
        w2v_cfg = Wav2Vec2Config.from_json_file(str(cfg_json))
        w2v = w2v_mod.Wav2VecModel(w2v_cfg).eval()
        w2v.load_state_dict(sub("audio_encoder.wav2vec2"), strict=False)
        proj_sd = sub("audio_encoder.audio_projection")
        proj = torch.nn.Sequential(torch.nn.Linear(9216, 512),
                                   torch.nn.LayerNorm(512), torch.nn.SiLU())
        proj.load_state_dict(proj_sd)

        fps, sr = 25.0, 16000
        import math
        t_frames = math.ceil(audio.shape[-1] * fps / sr)
        target = int(t_frames * sr / fps)
        a = audio
        if a.shape[1] < target:
            a = torch.nn.functional.pad(a, (0, target - a.shape[1]),
                                        mode="replicate")
        res = w2v(a, seq_len=t_frames, output_hidden_states=True)
        stacked = torch.stack(res.hidden_states[1:], dim=1).permute(0, 2, 1, 3)
        stacked = stacked.reshape(stacked.shape[0], stacked.shape[1], -1)
        wa = proj(stacked)
        out["wa"] = wa.numpy()

    np.savez(args.output, **out)
    print(f"recorded {sorted(out)} -> {args.output}")
    print("note: we/noise/r_d/frames require the full FLOAT composite + "
          "torchdiffeq; record them by patching torch.randn in FLOAT.sample "
          "to capture per-chunk noise.")


if __name__ == "__main__":
    main()
