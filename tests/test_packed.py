"""Packed (ragged) pipeline parity vs the padded-batch path.

The packed layout must reproduce per-utterance numerics exactly:
zero gaps ≡ SAME/p=1 conv padding, segment masks ≡ per-utt attention.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.engine.packed import (
    FramePack,
    PromptPack,
    plan_frame_pack,
    plan_prompt_pack,
)
from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
from fun_asr_vllm_tpu.models import encoder as encoder_mod
from fun_asr_vllm_tpu.models.adaptor import downsampled_length


FRAMES = [50, 33, 70]
T_PAD = 80


def _feats(rng, b, t_pad, d=40):
    return rng.normal(size=(b, t_pad, d)).astype(np.float32) * 0.3


class TestPlan:
    def test_frame_pack_layout(self):
        fp = plan_frame_pack(FRAMES, T_PAD, bucket=256)
        assert fp.tt % 256 == 0
        for i, t in enumerate(FRAMES):
            s = fp.starts[i]
            assert s % 16 == 0
            assert (fp.seg_ids[s : s + t] == i).all()
            assert (fp.pos_ids[s : s + t] == np.arange(t)).all()
            assert (fp.src_idx[s : s + t] == i * T_PAD + np.arange(t)).all()
            # ≥16 gap frames after each segment
            alloc_end = s + (-(-t // 16) * 16) + 16
            assert (fp.seg_ids[s + t : alloc_end] == -1).all()
            assert fp.tok_counts[i] == downsampled_length(t)
            assert fp.tok_starts[i] == s // 8

    def test_prompt_pack_layout(self):
        tables = np.arange(1, 33).reshape(4, 8)
        pp = plan_prompt_pack(3, 2, [0, 16, 32, 48], [5, 7, 4, 6],
                              tables, block_size=4, bucket=128)
        assert pp.ttp % 128 == 0
        lens = [3 + c + 2 for c in (5, 7, 4, 6)]
        off = 0
        for i, L in enumerate(lens):
            assert (pp.seg_ids[off : off + L] == i).all()
            assert (pp.pos_ids[off : off + L] == np.arange(L)).all()
            assert pp.last_idx[i] == off + L - 1
            # page destinations follow within-prompt positions
            assert (pp.write_blocks[off : off + L]
                    == tables[i][np.arange(L) // 4]).all()
            off += -(-L // 16) * 16
        # gaps write to garbage block 0
        assert (pp.write_blocks[pp.seg_ids < 0] == 0).all()


class TestEncodePacked:
    def test_matches_per_utt_encode(self):
        rng = np.random.default_rng(0)
        cfg = encoder_mod.SANMEncoderConfig(
            input_size=40, output_size=64, attention_heads=2,
            linear_units=96, num_blocks=3, dtype=jnp.float32,
        )
        params = encoder_mod.init_params(cfg, jax.random.PRNGKey(0))
        feats = _feats(rng, len(FRAMES), T_PAD)
        fp = plan_frame_pack(FRAMES, T_PAD, bucket=256)
        flat = feats.reshape(-1, feats.shape[-1])
        x = flat[fp.src_idx] * (fp.seg_ids >= 0)[:, None]
        packed = np.asarray(encoder_mod.encode_packed(
            params, cfg, jnp.asarray(x), jnp.asarray(fp.seg_ids),
            jnp.asarray(fp.pos_ids),
        ))
        ref, _ = encoder_mod.encode(
            params, cfg, jnp.asarray(feats),
            jnp.asarray(np.asarray(FRAMES, np.int32)),
        )
        ref = np.asarray(ref)
        for i, t in enumerate(FRAMES):
            s = fp.starts[i]
            np.testing.assert_allclose(
                packed[s : s + t], ref[i, :t], atol=2e-4, rtol=1e-3
            )

    def test_adaptor_packed_matches(self):
        """Packed adaptor ≡ the PADDED-BATCH adaptor (funasr batched
        semantics, incl. the conv1 boundary slot the last conv2 output
        reads past each utterance's valid range)."""
        rng = np.random.default_rng(1)
        cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=64, llm_dim=48, ffn_dim=96, dtype=jnp.float32
        )
        params = adaptor_mod.init_params(cfg, jax.random.PRNGKey(1))
        fp = plan_frame_pack(FRAMES, T_PAD, bucket=256)
        # encoder output: valid frames random, padding/gaps zero (the
        # encoder masks its output) — SAME values laid out both ways
        enc_b = np.zeros((len(FRAMES), T_PAD, 64), np.float32)
        for i, t in enumerate(FRAMES):
            enc_b[i, :t] = rng.normal(size=(t, 64)) * 0.5
        enc = np.zeros((fp.tt, 64), np.float32)
        for i, t in enumerate(FRAMES):
            enc[fp.starts[i] : fp.starts[i] + t] = enc_b[i, :t]
        packed = np.asarray(adaptor_mod.forward_packed(
            params, cfg, jnp.asarray(enc), jnp.asarray(fp.m1),
            jnp.asarray(fp.m2),
        ))
        ref, ref_lens = adaptor_mod.forward(
            params, cfg, jnp.asarray(enc_b),
            jnp.asarray(np.asarray(FRAMES, np.int32)),
        )
        for i in range(len(FRAMES)):
            n = int(ref_lens[i])
            assert n == fp.tok_counts[i]
            np.testing.assert_allclose(
                packed[fp.tok_starts[i] : fp.tok_starts[i] + n],
                np.asarray(ref)[i, :n], atol=2e-4, rtol=1e-3,
            )


class TestPrefillPacked:
    def test_matches_padded_prefill(self):
        from fun_asr_vllm_tpu.engine.kv_cache import (
            CacheConfig,
            _prefill_core,
            _prefill_core_packed,
            init_cache,
        )
        from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod

        cfg = qwen3_mod.Qwen3Config(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=96, dtype=jnp.float32,
        )
        params = qwen3_mod.init_params(cfg, jax.random.PRNGKey(2))
        cc = CacheConfig(num_blocks=64, block_size=4,
                         max_blocks_per_seq=16, dtype=jnp.float32)
        rng = np.random.default_rng(3)
        lens = [9, 14, 6]
        b = len(lens)
        tb = 16
        embeds = rng.normal(size=(b, tb, 64)).astype(np.float32) * 0.3
        for i, n in enumerate(lens):
            embeds[i, n:] = 0.0
        tables = np.zeros((b, cc.max_blocks_per_seq), np.int32)
        nb = 1
        for i, n in enumerate(lens):
            need = -(-n // cc.block_size)
            tables[i, :need] = np.arange(nb, nb + need)
            nb += need

        kc, vc = init_cache(cfg, cc)
        (logits_ref, ids_ref), kc_ref, vc_ref = _prefill_core(
            params, cfg, kc, vc, jnp.asarray(embeds),
            jnp.asarray(lens, np.int32), jnp.asarray(tables),
        )

        # pack the same prompts
        allocs = [-(-n // 16) * 16 for n in lens]
        ttp = 64
        seg = np.full(ttp, -1, np.int32)
        pos = np.zeros(ttp, np.int32)
        wb = np.zeros(ttp, np.int32)
        wo = np.zeros(ttp, np.int32)
        packed_emb = np.zeros((ttp, 64), np.float32)
        last = np.zeros(b, np.int32)
        off = 0
        for i, n in enumerate(lens):
            seg[off : off + n] = i
            pos[off : off + n] = np.arange(n)
            wb[off : off + n] = tables[i][np.arange(n) // cc.block_size]
            wo[off : off + n] = np.arange(n) % cc.block_size
            packed_emb[off : off + n] = embeds[i, :n]
            last[i] = off + n - 1
            off += allocs[i]

        kc2, vc2 = init_cache(cfg, cc)
        (logits_p, ids_p), kc_p, vc_p = _prefill_core_packed(
            params, cfg, kc2, vc2, jnp.asarray(packed_emb),
            jnp.asarray(pos), jnp.asarray(seg), jnp.asarray(wb),
            jnp.asarray(wo), jnp.asarray(last), use_flash=False,
        )
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(logits_ref),
            atol=1e-4, rtol=1e-3,
        )
        assert list(np.asarray(ids_p)) == list(np.asarray(ids_ref))
        # cache pages for valid positions must match
        for i, n in enumerate(lens):
            for t in range(n):
                blk = tables[i][t // cc.block_size]
                o = t % cc.block_size
                np.testing.assert_allclose(
                    np.asarray(kc_p)[:, blk, :, o], np.asarray(kc_ref)[:, blk, :, o],
                    atol=1e-4, rtol=1e-3,
                )


class TestPrefillDense:
    """Per-seq padded DENSE prompt attention (the short-prompt route,
    ops.attention.prompt_dense_attention) must reproduce the padded
    reference prefill exactly — same masked-softmax math, different
    layout."""

    def _setup(self):
        from fun_asr_vllm_tpu.engine.kv_cache import CacheConfig, init_cache
        from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod

        cfg = qwen3_mod.Qwen3Config(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=96, dtype=jnp.float32,
        )
        params = qwen3_mod.init_params(cfg, jax.random.PRNGKey(2))
        cc = CacheConfig(num_blocks=64, block_size=4,
                         max_blocks_per_seq=16, dtype=jnp.float32)
        return cfg, params, cc, init_cache

    def test_dense_route_matches_padded_prefill(self):
        from fun_asr_vllm_tpu.engine.kv_cache import (
            _prefill_core, _prefill_core_packed,
        )

        cfg, params, cc, init_cache = self._setup()
        rng = np.random.default_rng(5)
        lens = [9, 14, 6, 11]
        b = len(lens)
        tb = 16
        embeds = rng.normal(size=(b, tb, 64)).astype(np.float32) * 0.3
        for i, n in enumerate(lens):
            embeds[i, n:] = 0.0
        tables = np.zeros((b, cc.max_blocks_per_seq), np.int32)
        nb = 1
        for i, n in enumerate(lens):
            need = -(-n // cc.block_size)
            tables[i, :need] = np.arange(nb, nb + need)
            nb += need

        kc, vc = init_cache(cfg, cc)
        (logits_ref, ids_ref), kc_ref, vc_ref = _prefill_core(
            params, cfg, kc, vc, jnp.asarray(embeds),
            jnp.asarray(lens, np.int32), jnp.asarray(tables),
        )

        # pack via the real planner (it emits the dense maps)
        tok_starts = [0] * b   # prompts only: p=0, q=0, counts=lens
        ppk = plan_prompt_pack(0, 0, tok_starts, lens, tables,
                               cc.block_size, bucket=64)
        packed_emb = np.zeros((ppk.ttp, 64), np.float32)
        for i, n in enumerate(lens):
            s = int(np.argmax(ppk.seg_ids == i))
            packed_emb[s : s + n] = embeds[i, :n]

        kc2, vc2 = init_cache(cfg, cc)
        (logits_d, ids_d), kc_d, vc_d = _prefill_core_packed(
            params, cfg, kc2, vc2, jnp.asarray(packed_emb),
            jnp.asarray(ppk.pos_ids), jnp.asarray(ppk.seg_ids),
            jnp.asarray(ppk.write_blocks), jnp.asarray(ppk.write_offsets),
            jnp.asarray(ppk.last_idx), use_flash=False,
            pad_idx=jnp.asarray(ppk.pad_idx),
            unpad_idx=jnp.asarray(ppk.unpad_idx),
            lens=jnp.asarray(lens, np.int32),
            dense_lmax=ppk.dense_lmax,
        )
        np.testing.assert_allclose(
            np.asarray(logits_d), np.asarray(logits_ref),
            atol=1e-4, rtol=1e-3,
        )
        assert list(np.asarray(ids_d)) == list(np.asarray(ids_ref))
        # cache pages written by the dense-route prefill must match too
        for i, n in enumerate(lens):
            for t in range(n):
                blk = tables[i][t // cc.block_size]
                o = t % cc.block_size
                np.testing.assert_allclose(
                    np.asarray(kc_d)[:, blk, :, o],
                    np.asarray(kc_ref)[:, blk, :, o],
                    atol=1e-4, rtol=1e-3,
                )

    def test_prompt_dense_attention_matches_segment_xla(self):
        from fun_asr_vllm_tpu.ops.attention import (
            prompt_dense_attention, segment_attention_xla,
        )

        rng = np.random.default_rng(7)
        lens = [5, 12, 3]
        tables = np.zeros((3, 8), np.int32)
        ppk = plan_prompt_pack(0, 0, [0, 0, 0], lens, tables, 4,
                               bucket=48)
        tt, nq, nkv, d = ppk.ttp, 4, 2, 16
        q = rng.normal(size=(tt, nq, d)).astype(np.float32)
        k = rng.normal(size=(tt, nkv, d)).astype(np.float32)
        v = rng.normal(size=(tt, nkv, d)).astype(np.float32)
        seg = jnp.asarray(ppk.seg_ids)
        want = segment_attention_xla(
            jnp.asarray(q.reshape(tt, -1)), jnp.asarray(k.reshape(tt, -1)),
            jnp.asarray(v.reshape(tt, -1)), seg, nq, d, causal=True,
        )
        got = prompt_dense_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(ppk.pad_idx), jnp.asarray(ppk.unpad_idx), seg,
            jnp.asarray(lens, np.int32),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-4)

class TestPlanProperties:
    def test_random_lengths_invariants(self):
        """Planner invariants over random utterance mixes: 16-aligned
        non-overlapping segments, >=16 gap frames, mask spans exactly
        [o1+1]/[o2] slots, token regions disjoint, prompt pack covers
        every token with correct page destinations."""
        rng = np.random.default_rng(0)
        for trial in range(25):
            n = int(rng.integers(1, 9))
            frames = [int(rng.integers(1, 400)) for _ in range(n)]
            t_pad = max(frames)
            fp = plan_frame_pack(frames, t_pad, bucket=256)
            assert fp.tt % 256 == 0
            prev_end = None
            for i, t in enumerate(frames):
                s = fp.starts[i]
                assert s % 16 == 0
                if prev_end is not None:
                    assert s - prev_end >= 16  # gap
                assert (fp.seg_ids[s : s + t] == i).all()
                prev_end = s + t
                o1 = 1 + (t - 1) // 2
                o2 = 1 + (o1 - 1) // 2
                # m1 covers o1 valid slots + ONE boundary slot
                m1 = fp.m1[:, 0]
                assert m1[s // 2 : s // 2 + o1 + 1].all()
                if s // 2 + o1 + 1 < len(m1):
                    nxt = fp.starts[i + 1] // 2 if i + 1 < n else len(m1)
                    assert not m1[s // 2 + o1 + 1 : nxt].any()
                m2 = fp.m2[:, 0]
                assert m2[s // 4 : s // 4 + o2].all()
                assert fp.tok_counts[i] == downsampled_length(t)
            # token regions disjoint and ordered
            for i in range(1, n):
                assert (fp.tok_starts[i]
                        >= fp.tok_starts[i - 1] + fp.tok_counts[i - 1])

            tables = np.arange(1, 1 + n * 64).reshape(n, 64)
            pp = plan_prompt_pack(3, 2, fp.tok_starts, fp.tok_counts,
                                  tables, block_size=4, bucket=128)
            off = 0
            for i, c in enumerate(fp.tok_counts):
                L = 3 + c + 2
                assert (pp.seg_ids[off : off + L] == i).all()
                assert (pp.write_blocks[off : off + L]
                        == tables[i][np.arange(L) // 4]).all()
                assert pp.last_idx[i] == off + L - 1
                off += -(-L // 16) * 16
            assert (pp.write_blocks[pp.seg_ids < 0] == 0).all()


class TestEncodePackedOneshotKernel:
    def test_oneshot_kernel_matches_xla(self):
        """encode_packed routed through the ONE-SHOT windowed segmented
        kernel (interpret mode) matches the XLA segment-attention path
        — the configuration the TPU bench runs (k_window_rows > 0)."""
        import dataclasses

        rng = np.random.default_rng(3)
        # head_dim must be 128 for the kernel: 2 heads x 128 = 256
        cfg = encoder_mod.SANMEncoderConfig(
            input_size=40, output_size=256, attention_heads=2,
            linear_units=128, num_blocks=2, dtype=jnp.float32,
        )
        params = encoder_mod.init_params(cfg, jax.random.PRNGKey(0))
        feats = _feats(rng, len(FRAMES), T_PAD)
        fp = plan_frame_pack(FRAMES, T_PAD, bucket=256)
        assert fp.k_window_rows > 0
        flat = feats.reshape(-1, feats.shape[-1])
        x = flat[fp.src_idx] * (fp.seg_ids >= 0)[:, None]
        ref = np.asarray(encoder_mod.encode_packed(
            params, cfg, jnp.asarray(x), jnp.asarray(fp.seg_ids),
            jnp.asarray(fp.pos_ids),
        ))
        cfg_k = dataclasses.replace(cfg, use_flash=True,
                                    fused_interpret=True)
        got = np.asarray(encoder_mod.encode_packed(
            params, cfg_k, jnp.asarray(x), jnp.asarray(fp.seg_ids),
            jnp.asarray(fp.pos_ids), k_window_rows=fp.k_window_rows,
        ))
        np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)
