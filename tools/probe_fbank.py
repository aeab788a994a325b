"""Micro-probe: where do fbank+gather's ~28 ms/wave go?

Times fbank_jax alone, the packed-row gather alone, and a DFT-as-matmul
power-spectrum variant (rfft replaced by two [400,257] matmuls — the MXU
answer to XLA's slow TPU FFT lowering), at the bench wave geometry.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import numpy as np


def timeit(fn, iters=20, repeats=3):
    r = fn()
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    best = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn()
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        best.append((time.perf_counter() - t0) / iters)
    return min(best)


def main():
    from bench import synth_utterances
    from fun_asr_vllm_tpu.audio.frontend import (
        WavFrontend, fbank_jax, _mel_const, _window_const,
    )
    from fun_asr_vllm_tpu.engine.packed import plan_frame_pack

    utts = synth_utterances(480.0)[:16]
    frontend = WavFrontend(dither=0.0, bucket_seconds=4.0)
    speech, _ = frontend.batchify(utts)
    speech = jnp.asarray(speech)
    n_pad = speech.shape[1]
    t_pad = frontend.frame_count(n_pad)
    frames_c = np.asarray([frontend.frame_count(len(u)) for u in utts],
                          np.int32)
    fp = plan_frame_pack(frames_c, t_pad)
    src_idx = jnp.asarray(fp.src_idx)
    gap = jnp.asarray((fp.seg_ids >= 0)[:, None].astype(np.float32))

    f_full = jax.jit(lambda sp: fbank_jax(sp.astype(jnp.float32)))
    feats = f_full(speech)
    print(f"fbank_jax [{speech.shape}] -> {feats.shape}: "
          f"{timeit(lambda: f_full(speech))*1e3:7.2f} ms")

    @jax.jit
    def f_gather(fe):
        b, t, d = fe.shape
        flat = fe.reshape(b * t, d)
        return flat[src_idx] * gap

    print(f"gather [{feats.shape}] -> [{fp.tt},80]    : "
          f"{timeit(lambda: f_gather(feats))*1e3:7.2f} ms")

    # ---- stage-by-stage inside fbank
    import math
    b, n = speech.shape
    L, S, NF = 400, 160, 512
    t = 1 + (n - L) // S
    g = math.gcd(L, S)
    step, span = S // g, L // g

    @jax.jit
    def f_frames(sp):
        sp = sp.astype(jnp.float32)
        rows = sp.reshape(b, n // g, g)
        parts = [
            jax.lax.slice_in_dim(rows, j, j + (t - 1) * step + 1, step,
                                 axis=1)
            for j in range(span)
        ]
        fr = jnp.concatenate(parts, axis=-1)
        fr = fr - jnp.mean(fr, axis=-1, keepdims=True)
        first = fr[..., :1] * (1.0 - 0.97)
        rest = fr[..., 1:] - 0.97 * fr[..., :-1]
        fr = jnp.concatenate([first, rest], axis=-1)
        return fr * jnp.asarray(_window_const(L, "hamming"))

    fr = f_frames(speech)
    print(f"framing+preemph+win -> {fr.shape}     : "
          f"{timeit(lambda: f_frames(speech))*1e3:7.2f} ms")

    @jax.jit
    def f_fft(fr):
        spec = jnp.fft.rfft(fr, n=NF, axis=-1)
        power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
        mel_t = jnp.asarray(_mel_const(80, NF, 16000, 20.0, 0.0))
        mel = jnp.einsum("btf,fm->btm", power[..., : NF // 2], mel_t,
                         preferred_element_type=jnp.float32)
        return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07))

    print(f"rfft+mel+log                        : "
          f"{timeit(lambda: f_fft(fr))*1e3:7.2f} ms")

    # ---- DFT-as-matmul variant
    k = np.arange(NF // 2)[None, :]          # 256 bins (kaldi drops last)
    nn = np.arange(L)[:, None]
    ang = -2.0 * np.pi * nn * k / NF
    C = jnp.asarray(np.cos(ang).astype(np.float32))  # [400, 256]
    Sm = jnp.asarray(np.sin(ang).astype(np.float32))
    mel_t = jnp.asarray(_mel_const(80, NF, 16000, 20.0, 0.0))

    @jax.jit
    def f_dft(fr):
        fr2 = fr.reshape(b * t, L)
        re = fr2 @ C
        im = fr2 @ Sm
        power = re * re + im * im
        mel = power @ mel_t
        return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07)).reshape(
            b, t, 80)

    out_dft = f_dft(fr)
    out_fft = f_fft(fr)
    err = float(jnp.max(jnp.abs(out_dft - out_fft)))
    print(f"dftmm+mel+log                       : "
          f"{timeit(lambda: f_dft(fr))*1e3:7.2f} ms   max|d|={err:.2e}")

    # fold mel through? power is quadratic — can't; but fuse gather into
    # the matmul path by gathering FRAMES first (128-aligned width 400)
    @jax.jit
    def f_dft_packed(sp):
        fr = f_frames(sp)
        fr2 = fr.reshape(b * t, L)[src_idx]
        re = fr2 @ C
        im = fr2 @ Sm
        power = re * re + im * im
        mel = power @ mel_t
        return jnp.log(jnp.maximum(mel, 1.1920928955078125e-07)) * gap

    print(f"frames->gather->dftmm (packed rows) : "
          f"{timeit(lambda: f_dft_packed(speech))*1e3:7.2f} ms")

    @jax.jit
    def f_all_current(sp):
        fe = fbank_jax(sp.astype(jnp.float32))
        bb, tt_, d = fe.shape
        return fe.reshape(bb * tt_, d)[src_idx] * gap

    print(f"CURRENT fbank+gather                : "
          f"{timeit(lambda: f_all_current(speech))*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
