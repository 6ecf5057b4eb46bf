"""Bound the in-graph cost of the last-level (512²) styled convs.

Monkeypatches the two 512² StyledConvs (up 64->32 + plain 32->32) with
cheap shape-matching stubs (nearest upsample + channel slice / identity)
and measures the chunk delta — the honest upper bound on any conv
optimization at that level (isolated conv benches mislead; PERF.md).
NOT exact math — measurement only.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp


def main():
    from float_tpu.config import FloatConfig
    from float_tpu.runtime.pipeline import build_synthetic_pipeline, audio_num_frames
    from float_tpu.runtime import decode as D
    from float_tpu.models import synthesis as S

    cfg = FloatConfig(compute_dtype="bfloat16", decode_batch=16)
    pipe = build_synthetic_pipeline(cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 3, 512, 512)).astype(np.float32) * 0.3)
    wave = jnp.asarray(rng.standard_normal((1, 160000)).astype(np.float32) * 0.1)
    t = audio_num_frames(160000, cfg)
    s_r, _lam, feats, r_s = pipe.encode_image(img)
    wa = pipe.encode_audio(wave, t)
    we = pipe.emotion_latent(wave, "none")
    r_d = pipe.sample(r_s, wa, we, seed=15)[0]
    pipe.decode(s_r, feats, r_d[:64])          # converge ratchets

    dtype = jnp.bfloat16
    wa_full = (s_r.astype(jnp.float32) + r_d.astype(jnp.float32)).astype(dtype)
    feats_c = [jnp.transpose(f.astype(dtype), (0, 2, 3, 1)) for f in feats]
    params_c = pipe._syn_cast
    disp = D._ratchet_get(512)
    paths = D._path_get(512)
    print("D:", disp, "paths:", paths)

    def run(tag, fn):
        out = [fn(wa_full[i * 16:(i + 1) * 16]) for i in range(3)]
        float(jnp.sum(out[-1][0][0, 0, 0].astype(jnp.float32)))
        t0 = time.perf_counter()
        res = None
        for i in range(12):
            res = fn(wa_full[(i % 15) * 16:((i % 15) + 1) * 16])
        float(jnp.sum(res[0][0, 0, 0].astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / 12
        print(f"{tag}: {dt*1e3:.1f} ms/chunk")
        return dt

    def chunk(wa_c):
        return D._decode_chunk(params_c, wa_c, feats_c, 512,
                               warp_disp=disp, with_stats=True,
                               fixup=False, warp_path=paths)

    base = run("baseline", chunk)

    orig = S._styled_conv_cl

    def stub_styled_conv(x, style, p, up, blur_kernel=(1, 3, 3, 1)):
        out_c = p["conv"]["weight"].shape[1]
        if x.shape[1] == 256 and up:          # 512² up-conv stub
            y = jnp.repeat(jnp.repeat(x[..., :out_c], 2, 1), 2, 2)
            return y
        if x.shape[1] == 512:                 # 512² plain conv stub
            return x
        return orig(x, style, p, up, blur_kernel)

    S._styled_conv_cl = stub_styled_conv
    try:
        def chunk2(wa_c):
            return D._decode_chunk(params_c, wa_c, feats_c, 512,
                                   warp_disp=disp, with_stats=True,
                                   fixup=False, warp_path=paths,
                                   out_u8=True)   # different static key
        no512 = run("no-512²-styled-convs", chunk2)
    finally:
        S._styled_conv_cl = orig

    # also stub the ToFlow conv at 512²? keep simple: report delta
    print(f"512² styled-conv pair in-graph cost ≈ {1e3*(base-no512):.1f} "
          f"ms/chunk (upper bound for conv optimization at that level)")


if __name__ == "__main__":
    main()
