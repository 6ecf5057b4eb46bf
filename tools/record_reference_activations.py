#!/usr/bin/env python
"""Record per-stage activations from the reference implementation for the
parity harness (tools/parity_check.py).

Drives the reference's own modules at runtime (nothing is copied).  Missing
reference deps are shimmed from their public specs: `timm` (Mlp +
use_fused_attn -> True — the fused-SDPA branch, which real installs use
and which is the only branch that applies the banded alignment mask,
FMT.py:70-87), `torchdiffeq.odeint` (fixed-step euler / midpoint /
heun2 / heun3 / rk4 — the only methods the reference whitelists,
src/nodes/__init__.py:15-23), and `comfy.utils.ProgressBar` (no-op).

With no real checkpoint available (no egress), ``--synthesize PATH``
instantiates the reference's full FLOAT composite with seeded torch init
and writes its state_dict as a unified FLOAT.safetensors — the exact key
hierarchy, weight-norm parametrizations, and buffers of the real file
(reference: tools/save_combined_tool.py:98-115).  Both sides then load the
SAME file, so parity_check.py validates every load + compute path at full
size:

    python tools/record_reference_activations.py \\
        --synthesize /tmp/synth_FLOAT.safetensors \\
        --checkpoint /tmp/synth_FLOAT.safetensors -o /tmp/acts.npz
    python tools/parity_check.py /tmp/acts.npz \\
        --checkpoint /tmp/synth_FLOAT.safetensors

Recorded stages: image, audio, s_r, r_s_lambda, r_s, wa, we, noise (the
per-chunk x0 draws captured from FLOAT.sample), r_d, frames.
"""
import argparse
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np


# ---------------------------------------------------------------------------
# dependency shims (public specs; loaded only if the real package is absent)
# ---------------------------------------------------------------------------

def _shim_module(name):
    import importlib.machinery
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod


def _install_shims():
    import torch
    import torch.nn as nn

    if "comfy" not in sys.modules:
        comfy = _shim_module("comfy")
        cutils = _shim_module("comfy.utils")

        class ProgressBar:
            def __init__(self, total=0):
                self.total = total

            def update(self, n=1):
                pass

            def update_absolute(self, *a, **k):
                pass

        cutils.ProgressBar = ProgressBar
        comfy.utils = cutils
        sys.modules["comfy"] = comfy
        sys.modules["comfy.utils"] = cutils

    try:
        import timm  # noqa: F401
    except ImportError:
        timm = _shim_module("timm")
        layers = _shim_module("timm.layers")
        # True selects the reference's F.scaled_dot_product_attention branch.
        # This is the behavior of a real install (timm reports fused attn
        # available) AND the only branch that applies the banded alignment
        # mask — the manual branch ignores its ``mask`` argument entirely
        # (reference FMT.py:70-87: mask only reaches attn_mask=~mask in the
        # fused call).
        layers.use_fused_attn = lambda: True

        class Mlp(nn.Module):
            """timm.models.vision_transformer.Mlp public spec:
            fc1 -> act -> drop -> norm(identity) -> fc2 -> drop."""

            def __init__(self, in_features, hidden_features=None,
                         out_features=None, act_layer=nn.GELU,
                         norm_layer=None, bias=True, drop=0.0):
                super().__init__()
                out_features = out_features or in_features
                hidden_features = hidden_features or in_features
                self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
                self.act = act_layer()
                self.drop1 = nn.Dropout(drop)
                self.norm = (norm_layer(hidden_features) if norm_layer
                             else nn.Identity())
                self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
                self.drop2 = nn.Dropout(drop)

            def forward(self, x):
                return self.drop2(
                    self.fc2(self.norm(self.drop1(self.act(self.fc1(x))))))

        vit = _shim_module("timm.models.vision_transformer")
        vit.Mlp = Mlp
        models = _shim_module("timm.models")
        models.vision_transformer = vit
        timm.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = layers
        sys.modules["timm.models"] = models
        sys.modules["timm.models.vision_transformer"] = vit

    for name in ("face_alignment", "librosa"):
        # import-only stubs: nodes_adv's transitive imports hard-require
        # these at module level, but the sampling loop never calls them
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = _shim_module(name)

    if "seconohe" not in sys.modules:
        sec = _shim_module("seconohe")
        sec_torch = _shim_module("seconohe.torch")

        class _NullCtx:
            def __init__(self, *a, **k):
                pass

            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        sec_torch.model_to_target = _NullCtx
        sec.torch = sec_torch
        sys.modules["seconohe"] = sec
        sys.modules["seconohe.torch"] = sec_torch

    try:
        import torchdiffeq  # noqa: F401
    except ImportError:
        tde = _shim_module("torchdiffeq")

        def odeint(func, y0, t, atol=None, rtol=None, method="euler"):
            """Fixed-step solvers (torchdiffeq public formulas)."""
            ys = [y0]
            y = y0
            for i in range(len(t) - 1):
                t0, t1 = t[i], t[i + 1]
                h = t1 - t0
                k1 = func(t0, y)
                if method == "euler":
                    y = y + h * k1
                elif method == "midpoint":
                    y = y + h * func(t0 + h / 2, y + h / 2 * k1)
                elif method == "heun2":
                    k2 = func(t1, y + h * k1)
                    y = y + h / 2 * (k1 + k2)
                elif method == "heun3":
                    k2 = func(t0 + h / 3, y + h / 3 * k1)
                    k3 = func(t0 + 2 * h / 3, y + 2 * h / 3 * k2)
                    y = y + h / 4 * (k1 + 3 * k3)
                elif method == "rk4":
                    k2 = func(t0 + h / 2, y + h / 2 * k1)
                    k3 = func(t0 + h / 2, y + h / 2 * k2)
                    k4 = func(t1, y + h * k3)
                    y = y + h / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
                else:
                    raise ValueError(f"unsupported method {method}")
                ys.append(y)
            import torch
            return torch.stack(ys)

        tde.odeint = odeint
        sys.modules["torchdiffeq"] = tde


# ---------------------------------------------------------------------------
# reference package loading (runtime import; nothing copied)
# ---------------------------------------------------------------------------

def _load(fullname, path, package):
    spec = importlib.util.spec_from_file_location(fullname, path)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = package
    sys.modules[fullname] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference(ref_root: Path):
    """Import the reference model stack without the ComfyUI host.

    Builds a synthetic package tree 'refn(.models(.float))' so the
    reference's relative imports (`from ... import NODES_NAME`,
    `from .. import FLOAT_UNIFIED_MODEL`) resolve without executing the
    real package __init__ (which needs seconohe/ComfyUI).
    """
    _install_shims()
    nodes = ref_root / "src" / "nodes"

    refn = types.ModuleType("refn")
    refn.__path__ = [str(nodes)]
    refn.NODES_NAME = "FLOAT_Optimized_ref"
    refn.FLOAT_UNIFIED_MODEL = "FLOAT.safetensors"
    sys.modules["refn"] = refn

    models = types.ModuleType("refn.models")
    models.__path__ = [str(nodes / "models")]
    sys.modules["refn.models"] = models
    fl = types.ModuleType("refn.models.float")
    fl.__path__ = [str(nodes / "models" / "float")]
    sys.modules["refn.models.float"] = fl
    options = types.ModuleType("refn.options")
    options.__path__ = [str(nodes / "options")]
    sys.modules["refn.options"] = options

    m = nodes / "models"
    _load("refn.models.misc", m / "misc.py", "refn.models")
    _load("refn.models.basemodel", m / "basemodel.py", "refn.models")
    _load("refn.models.wav2vec2", m / "wav2vec2.py", "refn.models")
    _load("refn.models.wav2vec2_ser", m / "wav2vec2_ser.py", "refn.models")
    _load("refn.models.float.encoder", m / "float" / "encoder.py",
          "refn.models.float")
    _load("refn.models.float.styledecoder", m / "float" / "styledecoder.py",
          "refn.models.float")
    _load("refn.models.float.generator", m / "float" / "generator.py",
          "refn.models.float")
    _load("refn.models.float.FMT", m / "float" / "FMT.py", "refn.models.float")
    float_mod = _load("refn.models.float.FLOAT", m / "float" / "FLOAT.py",
                      "refn.models.float")
    opts_mod = _load("refn.options.base_options",
                     nodes / "options" / "base_options.py", "refn.options")
    return float_mod, opts_mod


def load_reference_adv(ref_root: Path):
    """Also load nodes_adv (the Advanced tier's shared ODE sampling loop,
    incl. dynamic per-frame emotion bookkeeping).  Requires load_reference
    to have run (reuses the refn package tree)."""
    nodes = ref_root / "src" / "nodes"
    refn = sys.modules["refn"]
    refn.EMOTIONS = ["none", "angry", "disgust", "fear", "happy",
                     "neutral", "sad", "surprise"]
    refn.TORCHDIFFEQ_FIXED_STEP_SOLVERS = ["euler", "midpoint", "rk4",
                                           "heun2", "heun3"]
    utils = types.ModuleType("refn.utils")
    utils.__path__ = [str(nodes / "utils")]
    sys.modules["refn.utils"] = utils
    _load("refn.utils.image", nodes / "utils" / "image.py", "refn.utils")
    _load("refn.resample", nodes / "resample.py", "refn")
    _load("refn.generate", nodes / "generate.py", "refn")
    return _load("refn.nodes_adv", nodes / "nodes_adv.py", "refn")


def build_model(ref_root: Path, seed: int):
    import torch
    float_mod, opts_mod = load_reference(ref_root)
    opt = opts_mod.BaseOptions()
    opt.rank = torch.device("cpu")
    torch.manual_seed(seed)
    model = float_mod.FLOAT(opt, node_root_path=str(ref_root / "src" / "nodes"))
    model.eval()
    # decode/sample use self.pbar (set by inference(); we drive stages directly)
    from comfy.utils import ProgressBar
    model.pbar = ProgressBar(0)
    model.first_run = False
    return model, opt


def synthetic_inputs(size: int, duration_s: float, sr: int, seed: int):
    """Smooth random portrait in [-1,1] + normalized audio waveform."""
    import torch
    g = torch.Generator().manual_seed(seed)
    small = torch.randn(1, 3, size // 16, size // 16, generator=g)
    image = torch.nn.functional.interpolate(
        small, size=(size, size), mode="bilinear", align_corners=False)
    image = torch.tanh(image)
    n = int(duration_s * sr)
    audio = torch.randn(1, n, generator=g)
    audio = (audio - audio.mean()) / (audio.std() + 1e-7)  # fe-normalized
    return image, audio


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--checkpoint", default=None,
                    help="unified safetensors to load (omit with --synthesize "
                         "to record from the freshly initialized model)")
    ap.add_argument("--synthesize", default=None, metavar="PATH",
                    help="write the model's state_dict as a unified "
                         "safetensors checkpoint to PATH")
    ap.add_argument("--duration", type=float, default=2.3,
                    help="audio seconds (2.3 -> T=58 -> 2 chunks: exercises "
                         "the autoregressive carry + replicate pad)")
    ap.add_argument("--perturb", type=float, default=0.02,
                    help="std of noise added to every parameter after init "
                         "(breaks the adaLN-zero head's exact zeros, which "
                         "would otherwise make the FMT vector field — and "
                         "the r_d parity stage — identically x0)")
    ap.add_argument("--nfe", type=int, default=10)
    ap.add_argument("--a-cfg", type=float, default=2.0)
    ap.add_argument("--e-cfg", type=float, default=1.3)
    ap.add_argument("--seed", type=int, default=15)
    ap.add_argument("-o", "--output", default="acts.npz")
    args = ap.parse_args()

    import torch

    model, opt = build_model(Path(args.reference), seed=args.seed)
    opt.nfe = args.nfe

    if args.perturb and args.synthesize:
        g = torch.Generator().manual_seed(args.seed + 1)
        with torch.no_grad():
            for name, p in model.named_parameters():
                # pos_embed is a requires_grad=False Parameter that BOTH
                # sides rebuild from config (reference skips loading it,
                # nodes_vadv_loader.py:825-837) — perturbing it would make
                # the reference compute with a table no loader ever sees
                if name.endswith("pos_embed"):
                    continue
                p.add_(args.perturb * torch.randn(p.shape, generator=g,
                                                  dtype=p.dtype))

    if args.checkpoint and not args.synthesize:
        from safetensors.torch import load_file
        missing, unexpected = model.load_state_dict(
            load_file(args.checkpoint), strict=False)
        print(f"loaded {args.checkpoint}: {len(missing)} missing, "
              f"{len(unexpected)} unexpected")

    if args.synthesize:
        from safetensors.torch import save_file
        sd = {k: v.detach().contiguous().clone()
              for k, v in model.state_dict().items()}
        save_file(sd, args.synthesize)
        gb = sum(v.numel() * v.element_size() for v in sd.values()) / 2**30
        print(f"synthesized checkpoint ({len(sd)} tensors, {gb:.2f} GiB) "
              f"-> {args.synthesize}")

    image, audio = synthetic_inputs(opt.input_size, args.duration,
                                    opt.sampling_rate, args.seed)
    out = {"image": image.numpy(), "audio": audio.numpy()}

    with torch.no_grad():
        s_r, lam, feats = model.encode_image_into_latent(image)
        r_s = model.motion_autoencoder.dec.direction(lam)
        out.update(s_r=s_r.numpy(), r_s_lambda=lam.numpy(), r_s=r_s.numpy())

        import math
        t_frames = math.ceil(audio.shape[-1] * opt.fps / opt.sampling_rate)
        wa = model.audio_encoder.inference(audio, seq_len=t_frames)
        out["wa"] = wa.numpy()
        we = model.emotion_encoder.predict_emotion(audio).unsqueeze(1)
        out["we"] = we.numpy()

        # capture the per-chunk x0 draws from FLOAT.sample (FLOAT.py:215)
        noises = []
        real_randn = torch.randn

        def randn_capture(*a, **k):
            x = real_randn(*a, **k)
            noises.append(x.detach().cpu().numpy())
            return x

        torch.randn = randn_capture
        try:
            r_d = model.sample(
                data={"r_s": r_s, "a": audio},
                a_cfg_scale=args.a_cfg, r_cfg_scale=1.0,
                e_cfg_scale=args.e_cfg, emo=None,
                nfe=args.nfe, seed=args.seed)
        finally:
            torch.randn = real_randn
        out["noise"] = np.stack(noises)          # (n_chunks, 1, clip, dim_w)
        out["r_d"] = r_d.numpy()

        frames = model.decode_latent_into_processed_images(s_r, feats, r_d)
        out["frames"] = frames.numpy()

        # trained-regime decode: r_d scaled to the magnitude real motion
        # latents have, where the synthesis is well-conditioned and strict
        # tolerances are meaningful
        r_d_small = 0.05 * r_d
        out["r_d_small"] = r_d_small.numpy()
        frames_small = model.decode_latent_into_processed_images(
            s_r, feats, r_d_small)
        out["frames_small"] = frames_small.numpy()

        # conditioning floor: the reference's OWN fp64 decode.  With random
        # (synthetic) weights and unit-variance latents the synthesis is
        # chaotically conditioned (measured: torch f32 vs f64 differ by
        # ~0.15 on the worst frame), so full-scale frames are judged
        # relative to this floor rather than an absolute tolerance.
        # dynamic per-frame emotion sampling parity: drive the reference's
        # shared ODE loop (nodes_adv._perform_ode_sampling_loop — the
        # Advanced/VA sampler with per-chunk we slicing + prev_we carry)
        adv = load_reference_adv(Path(args.reference))
        g2 = torch.Generator().manual_seed(args.seed + 2)
        we_dyn = torch.softmax(
            torch.randn(1, t_frames, opt.dim_e, generator=g2) * 1.5, dim=-1)
        out["we_dyn"] = we_dyn.numpy()
        noise_gen = torch.Generator().manual_seed(args.seed)
        noises_dyn = []

        def randn_capture2(*a, **k):
            x = real_randn(*a, **k)
            noises_dyn.append(x.detach().cpu().numpy())
            return x

        torch.randn = randn_capture2
        try:
            r_d_dyn = adv._perform_ode_sampling_loop(
                fmt_model=model.fmt, r_s_latent_dev=r_s,
                wa_latent_dev=wa, we_latent_dev=we_dyn,
                audio_num_frames=t_frames,
                model_num_prev_frames=model.num_prev_frames,
                model_num_frames_for_clip=model.num_frames_for_clip,
                model_dim_w=opt.dim_w,
                ode_nfe=args.nfe, ode_method="euler",
                ode_atol=opt.ode_atol, ode_rtol=opt.ode_rtol,
                target_device=torch.device("cpu"),
                a_cfg_scale=args.a_cfg, r_cfg_scale=1.0,
                e_cfg_scale=args.e_cfg, include_r_cfg=False,
                noise_seed_generator=noise_gen)
        finally:
            torch.randn = real_randn
        out["noise_dyn"] = np.stack(noises_dyn)
        out["r_d_dyn"] = r_d_dyn.numpy()

        m64 = model.to(torch.float64)
        feats64 = [f.double() for f in feats]
        frames64 = m64.decode_latent_into_processed_images(
            s_r.double(), feats64, r_d.double())
        out["frames_f64"] = frames64.float().numpy()
        frames_small64 = m64.decode_latent_into_processed_images(
            s_r.double(), feats64, r_d_small.double())
        out["frames_small_f64"] = frames_small64.float().numpy()

    np.savez(args.output, **out)
    print(f"recorded {sorted(out)} -> {args.output}")
    print(f"T={t_frames} frames, {out['noise'].shape[0]} chunks, "
          f"a_cfg={args.a_cfg} e_cfg={args.e_cfg} nfe={args.nfe}")


if __name__ == "__main__":
    main()
