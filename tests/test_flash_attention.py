"""Pallas flash attention vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.ops.attention import gqa_attention
from fun_asr_vllm_tpu.ops.flash_attention import flash_attention


def _mk(seed, b=2, t=160, nq=4, nkv=4, d=64):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, t, nq, d)).astype(np.float32)
    k = rng.normal(size=(b, t, nkv, d)).astype(np.float32)
    v = rng.normal(size=(b, t, nkv, d)).astype(np.float32)
    return map(jnp.asarray, (q, k, v))


class TestFlashAttention:
    def test_full_attention_matches(self):
        q, k, v = _mk(0)
        lens = jnp.asarray([160, 100], jnp.int32)
        ref = gqa_attention(q, k, v, causal=False, kv_lengths=lens)
        got = flash_attention(q, k, v, lens, causal=False, block_q=64,
                              block_k=64, interpret=True)
        # valid rows match; skipped padding-q blocks finalize to zeros
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], np.asarray(ref)[b, :n],
                atol=2e-5, rtol=1e-4,
            )
        blk_end = -(-int(lens[1]) // 64) * 64  # rows past the last live block
        np.testing.assert_array_equal(np.asarray(got)[1, blk_end:], 0.0)

    def test_causal_matches(self):
        q, k, v = _mk(1, t=128)
        lens = jnp.asarray([128, 77], jnp.int32)
        ref = gqa_attention(q, k, v, causal=True, kv_lengths=lens)
        got = flash_attention(q, k, v, lens, causal=True, block_q=64,
                              block_k=64, interpret=True)
        # compare only valid rows (masked tail rows differ harmlessly)
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], np.asarray(ref)[b, :n],
                atol=2e-5, rtol=1e-4,
            )

    def test_gqa_grouping(self):
        q, k, v = _mk(2, t=64, nq=8, nkv=2, d=128)
        lens = jnp.asarray([64, 50], jnp.int32)
        ref = gqa_attention(q, k, v, causal=True, kv_lengths=lens)
        got = flash_attention(q, k, v, lens, causal=True, block_q=32,
                              block_k=32, interpret=True)
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], np.asarray(ref)[b, :n],
                atol=2e-5, rtol=1e-4,
            )

    def test_unaligned_lengths_padded(self):
        q, k, v = _mk(3, t=100)  # not a block multiple
        lens = jnp.asarray([100, 33], jnp.int32)
        ref = gqa_attention(q, k, v, causal=False, kv_lengths=lens)
        got = flash_attention(q, k, v, lens, causal=False, block_q=64,
                              block_k=64, interpret=True)
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], np.asarray(ref)[b, :n],
                atol=2e-5, rtol=1e-4,
            )


class TestFlashAttentionColumnBlock:
    """The native-layout fast path: d=128, T/S block-divisible, auto
    blocks → heads as column blocks of [B, T, N*D] (no transposes)."""

    def test_full_attention_matches(self):
        q, k, v = _mk(10, t=160, d=128)
        lens = jnp.asarray([160, 100], jnp.int32)
        ref = gqa_attention(q, k, v, causal=False, kv_lengths=lens)
        got = flash_attention(q, k, v, lens, causal=False, interpret=True)
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], np.asarray(ref)[b, :n],
                atol=2e-5, rtol=1e-4,
            )

    def test_causal_gqa_matches(self):
        q, k, v = _mk(11, t=96, nq=8, nkv=2, d=128)
        lens = jnp.asarray([96, 41], jnp.int32)
        ref = gqa_attention(q, k, v, causal=True, kv_lengths=lens)
        got = flash_attention(q, k, v, lens, causal=True, interpret=True)
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], np.asarray(ref)[b, :n],
                atol=2e-5, rtol=1e-4,
            )

    def test_multi_block_divisor(self):
        # t=256 forces block choice 256 (whole seq); also check a shape
        # whose divisor block < t (t=1536 → 768) via _pick_blocks_fast
        from fun_asr_vllm_tpu.ops.flash_attention import _pick_blocks_fast

        assert _pick_blocks_fast(1536, 1536, jnp.bfloat16) == (768, 768)
        assert _pick_blocks_fast(2048, 2048, jnp.bfloat16) == (1024, 1024)
        assert _pick_blocks_fast(1280, 1280, jnp.float32) == (1280, 1280)
        # 16×prime admits no usable divisor → legacy path
        assert _pick_blocks_fast(16 * 113, 16 * 113, jnp.bfloat16) is None

        q, k, v = _mk(12, t=256, d=128)
        lens = jnp.asarray([256, 137], jnp.int32)
        ref = gqa_attention(q, k, v, causal=False, kv_lengths=lens)
        got = flash_attention(q, k, v, lens, causal=False, interpret=True)
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(got)[b, :n], np.asarray(ref)[b, :n],
                atol=2e-5, rtol=1e-4,
            )

    def test_matches_legacy_path(self):
        # the two lowerings must agree bit-for-bit on the same shapes
        q, k, v = _mk(13, t=128, d=128)
        lens = jnp.asarray([128, 90], jnp.int32)
        fast = flash_attention(q, k, v, lens, causal=False, interpret=True)
        legacy = flash_attention(q, k, v, lens, causal=False, block_q=64,
                                 block_k=64, interpret=True)
        for b in range(2):
            n = int(lens[b])
            np.testing.assert_allclose(
                np.asarray(fast)[b, :n], np.asarray(legacy)[b, :n],
                atol=2e-5, rtol=1e-4,
            )


class TestFlashAttentionSegmented:
    """Packed/varlen kernel vs per-utterance reference attention."""

    def _pack(self, lens, align=16, t_total=None):
        starts, seg = [], []
        off = 0
        for i, n in enumerate(lens):
            starts.append(off)
            seg += [i] * n
            alloc = -(-n // align) * align + align
            seg += [-1] * (alloc - n)
            off += alloc
        if t_total:
            seg += [-1] * (t_total - len(seg))
        return starts, np.asarray(seg, np.int32)

    def test_full_matches_per_utt(self):
        from fun_asr_vllm_tpu.ops.flash_attention import (
            flash_attention_segmented,
        )

        rng = np.random.default_rng(20)
        lens = [50, 33, 70]
        starts, seg = self._pack(lens, t_total=256)
        t, nq, nkv, d = 256, 4, 4, 128
        q = rng.normal(size=(t, nq, d)).astype(np.float32)
        k = rng.normal(size=(t, nkv, d)).astype(np.float32)
        v = rng.normal(size=(t, nkv, d)).astype(np.float32)
        got = flash_attention_segmented(
            jnp.asarray(q.reshape(t, -1)), jnp.asarray(k.reshape(t, -1)),
            jnp.asarray(v.reshape(t, -1)), jnp.asarray(seg),
            nq=nq, nkv=nkv, d=d, block_q=64, block_k=64, interpret=True,
        )
        got = np.asarray(got).reshape(t, nq, d)
        for i, n in enumerate(lens):
            s = starts[i]
            ref = gqa_attention(
                jnp.asarray(q[None, s : s + n]),
                jnp.asarray(k[None, s : s + n]),
                jnp.asarray(v[None, s : s + n]),
                causal=False,
            )
            np.testing.assert_allclose(
                got[s : s + n], np.asarray(ref)[0], atol=2e-5, rtol=1e-4
            )
        # gap rows finalize to zeros
        np.testing.assert_array_equal(got[seg < 0], 0.0)

    def test_causal_gqa_matches_per_utt(self):
        from fun_asr_vllm_tpu.ops.flash_attention import (
            flash_attention_segmented,
        )

        rng = np.random.default_rng(21)
        lens = [40, 61]
        starts, seg = self._pack(lens, t_total=192)
        t, nq, nkv, d = 192, 8, 2, 128
        q = rng.normal(size=(t, nq, d)).astype(np.float32)
        k = rng.normal(size=(t, nkv, d)).astype(np.float32)
        v = rng.normal(size=(t, nkv, d)).astype(np.float32)
        got = flash_attention_segmented(
            jnp.asarray(q.reshape(t, -1)), jnp.asarray(k.reshape(t, -1)),
            jnp.asarray(v.reshape(t, -1)), jnp.asarray(seg),
            nq=nq, nkv=nkv, d=d, causal=True, block_q=64, block_k=64,
            interpret=True,
        )
        got = np.asarray(got).reshape(t, nq, d)
        for i, n in enumerate(lens):
            s = starts[i]
            ref = gqa_attention(
                jnp.asarray(q[None, s : s + n]),
                jnp.asarray(k[None, s : s + n]),
                jnp.asarray(v[None, s : s + n]),
                causal=True,
            )
            np.testing.assert_allclose(
                got[s : s + n], np.asarray(ref)[0], atol=2e-5, rtol=1e-4
            )

    def test_tight_k_window(self):
        """Explicit k_window smaller than the dense grid must still
        cover every segment's keys."""
        from fun_asr_vllm_tpu.ops.flash_attention import (
            flash_attention_segmented,
        )

        rng = np.random.default_rng(22)
        lens = [60, 50, 45]
        starts, seg = self._pack(lens, t_total=256)
        t, nq, nkv, d = 256, 4, 4, 128
        q = rng.normal(size=(t, nq, d)).astype(np.float32)
        k = rng.normal(size=(t, nkv, d)).astype(np.float32)
        v = rng.normal(size=(t, nkv, d)).astype(np.float32)
        # block 64, segments ≤ 60+pad → span ≤ 2 blocks → W=3 is safe
        got = flash_attention_segmented(
            jnp.asarray(q.reshape(t, -1)), jnp.asarray(k.reshape(t, -1)),
            jnp.asarray(v.reshape(t, -1)), jnp.asarray(seg),
            nq=nq, nkv=nkv, d=d, block_q=64, block_k=64, k_window=3,
            interpret=True,
        )
        got = np.asarray(got).reshape(t, nq, d)
        for i, n in enumerate(lens):
            s = starts[i]
            ref = gqa_attention(
                jnp.asarray(q[None, s : s + n]),
                jnp.asarray(k[None, s : s + n]),
                jnp.asarray(v[None, s : s + n]),
                causal=False,
            )
            np.testing.assert_allclose(
                got[s : s + n], np.asarray(ref)[0], atol=2e-5, rtol=1e-4
            )


class TestSegmentedOneshot:
    """One-shot windowed segment attention (the packed encoder + prompt
    prefill kernel since round 4) vs the XLA segment reference."""

    def _pack(self, seed=0, tt=1024):
        rng = np.random.default_rng(seed)
        seg = np.full(tt, -1, np.int32)
        for s, e, i in [(0, 300, 0), (320, 500, 1), (512, 900, 2),
                        (912, 1000, 3)]:
            seg[s:e] = i
        return rng, seg

    @pytest.mark.parametrize("window,bq", [(1028, 256), (1024, 512),
                                           (640, 128)])
    def test_full_attention_matches_xla(self, window, bq):
        from fun_asr_vllm_tpu.ops.attention import segment_attention_xla
        from fun_asr_vllm_tpu.ops.flash_attention import (
            flash_attention_segmented_oneshot,
        )

        rng, seg = self._pack()
        tt, nq, nkv, d = len(seg), 4, 4, 128
        q2 = rng.normal(size=(tt, nq * d)).astype(np.float32)
        k2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        v2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        ref = segment_attention_xla(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq, d)
        got = flash_attention_segmented_oneshot(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq=nq, nkv=nkv, d=d, window=window,
            block_q=bq, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_causal_gqa_matches_xla(self):
        """The prompt-prefill configuration: causal, nq=4 over nkv=2."""
        from fun_asr_vllm_tpu.ops.attention import segment_attention_xla
        from fun_asr_vllm_tpu.ops.flash_attention import (
            flash_attention_segmented_oneshot,
        )

        rng, seg = self._pack(seed=2)
        tt, nq, nkv, d = len(seg), 4, 2, 128
        q2 = rng.normal(size=(tt, nq * d)).astype(np.float32)
        k2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        v2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        ref = segment_attention_xla(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq, d, causal=True)
        got = flash_attention_segmented_oneshot(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq=nq, nkv=nkv, d=d, window=1024,
            block_q=256, causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_16_head_two_pass(self):
        """nq=16 (Qwen3 prompt config) splits into two 8-head passes
        inside the wrapper — a fully-unrolled 16-head body exceeds the
        VMEM scoped limit at any legal block size."""
        from fun_asr_vllm_tpu.ops.attention import segment_attention_xla
        from fun_asr_vllm_tpu.ops.flash_attention import (
            flash_attention_segmented_oneshot,
        )

        rng, seg = self._pack(seed=5)
        tt, nq, nkv, d = len(seg), 16, 8, 128
        q2 = rng.normal(size=(tt, nq * d)).astype(np.float32)
        k2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        v2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        ref = segment_attention_xla(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq, d, causal=True)
        got = flash_attention_segmented_oneshot(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq=nq, nkv=nkv, d=d, window=1024,
            causal=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    @pytest.mark.parametrize("causal", [False, True])
    def test_ring_scratch_long_pack(self, causal):
        """Round-5 rolling ring scratch: a LONG pack (tt=4096, window
        1024 → kstart advances across 24 q-blocks with many mod-wb
        wrap-arounds and repeated-kstart no-copy steps) must still match
        the XLA reference exactly. Randomized segment layout with gaps
        so empty q-blocks inherit windows via the running max."""
        from fun_asr_vllm_tpu.ops.attention import segment_attention_xla
        from fun_asr_vllm_tpu.ops.flash_attention import (
            flash_attention_segmented_oneshot,
        )

        rng = np.random.default_rng(11)
        tt, nq, nkv, d = 4096, 4, 2, 128
        seg = np.full(tt, -1, np.int32)
        pos, sid = 0, 0
        while pos < tt - 64:
            # window coverage: a q-block can touch a segment starting
            # L-1 rows before it and another ending L-1 rows after, so
            # window >= 2L + block_q + 127 (alignment slack); L<=300
            # keeps 896 legal while still wrapping the wb=7 ring often
            ln = int(rng.integers(40, 300))
            ln = min(ln, tt - pos)
            seg[pos : pos + ln] = sid
            sid += 1
            pos += ln + int(rng.integers(0, 90))
        q2 = rng.normal(size=(tt, nq * d)).astype(np.float32)
        k2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        v2 = rng.normal(size=(tt, nkv * d)).astype(np.float32)
        ref = segment_attention_xla(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq, d, causal=causal)
        got = flash_attention_segmented_oneshot(
            jnp.asarray(q2), jnp.asarray(k2), jnp.asarray(v2),
            jnp.asarray(seg), nq=nq, nkv=nkv, d=d, window=896,
            block_q=128, causal=causal, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
