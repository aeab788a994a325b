"""Pallas paged decode attention vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.engine.kv_cache import paged_attention_xla
from fun_asr_vllm_tpu.ops.paged_attention import paged_attention_pallas


def _setup(seed=0, s=3, nq=8, nkv=4, d=128, nb=16, bs=8, mb=4):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(s, nq, d)).astype(np.float32)
    # head-major pages [NB, Nkv, BS, D] (engine/kv_cache.py layout)
    k_cache = rng.normal(size=(nb, nkv, bs, d)).astype(np.float32)
    v_cache = rng.normal(size=(nb, nkv, bs, d)).astype(np.float32)
    # distinct random block tables (block 0 reserved garbage)
    block_tables = np.zeros((s, mb), dtype=np.int32)
    avail = list(range(1, nb))
    rng.shuffle(avail)
    it = iter(avail)
    for i in range(s):
        for j in range(mb):
            block_tables[i, j] = next(it)
    seq_lens = np.array([5, bs * mb, bs + 3][:s], dtype=np.int32)
    return map(jnp.asarray, (q, k_cache, v_cache, block_tables, seq_lens))


class TestPagedAttention:
    def test_matches_xla_reference(self):
        q, kc, vc, bt, sl = _setup()
        ref = paged_attention_xla(q, kc, vc, bt, sl)
        got = paged_attention_pallas(q, kc, vc, bt, sl, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_single_token_sequence(self):
        q, kc, vc, bt, sl = _setup(seed=1, s=2, mb=2)
        sl = jnp.asarray([1, 1], jnp.int32)
        ref = paged_attention_xla(q, kc, vc, bt, sl)
        got = paged_attention_pallas(q, kc, vc, bt, sl, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_gqa_grouping(self):
        # 16 q heads / 8 kv heads — the Qwen3-0.6B shape
        q, kc, vc, bt, sl = _setup(seed=2, s=2, nq=16, nkv=8, bs=16, mb=3, nb=12)
        ref = paged_attention_xla(q, kc, vc, bt, sl)
        got = paged_attention_pallas(q, kc, vc, bt, sl, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


def _quantize_cache(cache):
    from fun_asr_vllm_tpu.engine.kv_cache import _quantize_kv

    q, s = _quantize_kv(jnp.asarray(cache))
    return {"q": q, "s": s}


class TestPagedAttentionInt8:
    """int8 KV pages through the Pallas kernel (VERDICT r2 item 3): the
    in-kernel dequant must match the XLA gather path's post-gather
    dequant bit-for-bit (both dequantize scale·int8 in f32)."""

    def test_int8_pages_match_xla_reference(self):
        q, kc, vc, bt, sl = _setup(seed=5)
        kq, vq = _quantize_cache(kc), _quantize_cache(vc)
        ref = paged_attention_xla(q, kq, vq, bt, sl,
                                  out_dtype=jnp.float32)
        got = paged_attention_pallas(q, kq, vq, bt, sl, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_int8_stats_match_xla_stats(self):
        from fun_asr_vllm_tpu.engine.kv_cache import _paged_attention_stats
        from fun_asr_vllm_tpu.ops.paged_attention import (
            paged_attention_pallas_stats,
        )

        q, kc, vc, bt, sl = _setup(seed=6)
        kq, vq = _quantize_cache(kc), _quantize_cache(vc)
        acc0, m0, l0 = _paged_attention_stats(q, kq, vq, bt, sl,
                                              out_dtype=jnp.float32)
        acc1, m1, l1 = paged_attention_pallas_stats(
            q, kq, vq, bt, sl, interpret=True
        )
        out0 = np.asarray(acc0 / np.maximum(np.asarray(l0), 1e-30))
        out1 = np.asarray(acc1 / np.maximum(np.asarray(l1), 1e-30))
        np.testing.assert_allclose(out1, out0, atol=2e-5, rtol=1e-4)

    def test_int8_close_to_fp(self):
        # quantization error bound: int8 KV attention ≈ fp attention
        q, kc, vc, bt, sl = _setup(seed=7)
        ref = paged_attention_xla(q, kc, vc, bt, sl)
        got = paged_attention_pallas(
            q, _quantize_cache(kc), _quantize_cache(vc), bt, sl,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=0.08, rtol=0.1
        )


class TestPagedStats:
    def test_stats_match_xla_stats(self):
        from fun_asr_vllm_tpu.engine.kv_cache import (
            _merge_softmax_segments, _paged_attention_stats,
        )
        from fun_asr_vllm_tpu.ops.paged_attention import (
            paged_attention_pallas_stats,
        )

        q, kc, vc, bt, sl = _setup(seed=3)
        acc0, m0, l0 = _paged_attention_stats(q, kc, vc, bt, sl)
        acc1, m1, l1 = paged_attention_pallas_stats(
            q, kc, vc, bt, sl, interpret=True
        )
        # the normalized outputs must agree (raw m/l may differ by the
        # masking constant when a row has no valid tokens)
        out0 = np.asarray(acc0 / np.maximum(np.asarray(l0), 1e-30))
        out1 = np.asarray(acc1 / np.maximum(np.asarray(l1), 1e-30))
        np.testing.assert_allclose(out1, out0, atol=2e-5, rtol=1e-4)
        # and merging with a second segment must agree end-to-end
        rng = np.random.default_rng(9)
        s, nq, d = q.shape
        acc2 = jnp.asarray(rng.normal(size=(s, nq, d)).astype(np.float32))
        m2 = jnp.asarray(rng.normal(size=(s, nq, 1)).astype(np.float32))
        l2 = jnp.asarray(rng.uniform(1, 2, size=(s, nq, 1)).astype(np.float32))
        ref = _merge_softmax_segments(acc0, m0, l0, acc2, m2, l2)
        got = _merge_softmax_segments(acc1, m1, l1, acc2, m2, l2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )

    def test_zero_length_row(self):
        from fun_asr_vllm_tpu.engine.kv_cache import (
            _merge_softmax_segments, _paged_attention_stats,
        )
        from fun_asr_vllm_tpu.ops.paged_attention import (
            paged_attention_pallas_stats,
        )

        q, kc, vc, bt, sl = _setup(seed=4, s=2, mb=2)
        sl = jnp.asarray([0, 7], jnp.int32)  # row 0: nothing cached
        acc0, m0, l0 = _paged_attention_stats(q, kc, vc, bt, sl)
        acc1, m1, l1 = paged_attention_pallas_stats(
            q, kc, vc, bt, sl, interpret=True
        )
        rng = np.random.default_rng(10)
        s, nq, d = q.shape
        acc2 = jnp.asarray(rng.normal(size=(s, nq, d)).astype(np.float32))
        m2 = jnp.asarray(rng.normal(size=(s, nq, 1)).astype(np.float32))
        l2 = jnp.asarray(rng.uniform(1, 2, size=(s, nq, 1)).astype(np.float32))
        ref = _merge_softmax_segments(acc0, m0, l0, acc2, m2, l2)
        got = _merge_softmax_segments(acc1, m1, l1, acc2, m2, l2)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
        )


class TestChunkedStatsV2:
    """The multi-page streaming kernel (v2) vs the XLA stats reference —
    the long-context burst route (engine/kv_cache.py `chunked_kernel`)."""

    def _check(self, seed, s, bs, mb, pp=None, quantized=False):
        from fun_asr_vllm_tpu.engine.kv_cache import _paged_attention_stats
        from fun_asr_vllm_tpu.ops.paged_attention import (
            paged_attention_pallas_stats_v2,
        )

        rng = np.random.default_rng(seed)
        nq, nkv, d = 16, 8, 128
        nb = s * mb + 1
        q = jnp.asarray(rng.normal(size=(s, nq, d)).astype(np.float32))
        kc = jnp.asarray(rng.normal(size=(nb, nkv, bs, d)).astype(np.float32))
        vc = jnp.asarray(rng.normal(size=(nb, nkv, bs, d)).astype(np.float32))
        if quantized:
            kc, vc = _quantize_cache(kc), _quantize_cache(vc)
        bt = np.zeros((s, mb), np.int32)
        sl = np.zeros((s,), np.int32)
        for i in range(s):
            n = int(rng.integers(0, bs * mb + 1))
            sl[i] = n
            need = -(-n // bs)
            if need:
                bt[i, :need] = rng.choice(
                    np.arange(1, nb), size=need, replace=False)
        bt, sl = jnp.asarray(bt), jnp.asarray(sl)
        kw = {} if pp is None else {"chunk_tokens": pp * bs}
        a2, m2, l2 = paged_attention_pallas_stats_v2(
            q, kc, vc, bt, sl, interpret=True, **kw)
        a1, m1, l1 = _paged_attention_stats(q, kc, vc, bt, sl,
                                            out_dtype=jnp.float32)
        # zero-length rows diverge BY DESIGN: the XLA reference gathers
        # garbage pages (l=T, junk acc — callers never consume dead
        # rows), the v2 kernel emits the neutral element (acc=0, l=0,
        # m=-1e30) which merges as a no-op — compare live rows only and
        # pin v2's neutral stats for dead rows
        live = np.asarray(sl) > 0
        o1 = np.asarray(a1) / np.where(np.asarray(l1) == 0, 1, l1)
        o2 = np.asarray(a2) / np.where(np.asarray(l2) == 0, 1, l2)
        np.testing.assert_allclose(o2[live], o1[live], atol=3e-5, rtol=1e-4)
        # m/l must match too (segment merging consumes them)
        np.testing.assert_allclose(np.asarray(m2)[live], np.asarray(m1)[live],
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(l2)[live], np.asarray(l1)[live],
                                   atol=2e-5, rtol=1e-4)
        if (~live).any():
            dead = ~live
            assert np.all(np.asarray(a2)[dead] == 0.0)
            assert np.all(np.asarray(l2)[dead] == 0.0)
            assert np.all(np.asarray(m2)[dead] == -1e30)
        return sl

    def test_random_lengths(self):
        self._check(seed=0, s=4, bs=16, mb=9)

    def test_zero_length_row_neutral_stats(self):
        """A dead slot (seq_len 0) must emit the merge-neutral element."""
        from fun_asr_vllm_tpu.ops.paged_attention import (
            paged_attention_pallas_stats_v2,
        )

        rng = np.random.default_rng(7)
        s_, nq, nkv, d, bs, mb = 3, 16, 8, 128, 16, 4
        nb = s_ * mb + 1
        q = jnp.asarray(rng.normal(size=(s_, nq, d)).astype(np.float32))
        kc = jnp.asarray(
            rng.normal(size=(nb, nkv, bs, d)).astype(np.float32))
        vc = jnp.asarray(
            rng.normal(size=(nb, nkv, bs, d)).astype(np.float32))
        bt = jnp.asarray(
            np.arange(s_ * mb).reshape(s_, mb) % (nb - 1) + 1, jnp.int32)
        sl = jnp.asarray([0, 37, 0], jnp.int32)
        a2, m2, l2 = paged_attention_pallas_stats_v2(
            q, kc, vc, bt, sl, interpret=True)
        for i in (0, 2):
            assert np.all(np.asarray(a2)[i] == 0.0)
            assert np.all(np.asarray(l2)[i] == 0.0)
            assert np.all(np.asarray(m2)[i] == -1e30)
        assert float(np.asarray(l2)[1].max()) > 0.0

    def test_chunk_not_dividing_pages(self):
        self._check(seed=1, s=3, bs=16, mb=7, pp=4)  # 7 pages, chunks of 4

    def test_single_page_chunks(self):
        self._check(seed=2, s=2, bs=16, mb=5, pp=1)

    def test_large_pages(self):
        self._check(seed=3, s=2, bs=64, mb=4)

    def test_int8_pages_random_lengths(self):
        """int8 pages through v2: the lane-aligned window-scale route
        must match the XLA gather reference's f32 dequant. Scales are
        applied in score/probability space (q·(k·s) = (q·k)·s), so only
        f32-associativity noise separates the two."""
        self._check(seed=4, s=4, bs=16, mb=9, quantized=True)

    def test_int8_pages_multi_chunk(self):
        # mb·bs > chunk_toks forces c > 0 — exercises the dynamic
        # 128-aligned lane slicing of the scale inputs
        self._check(seed=5, s=2, bs=16, mb=24, pp=8, quantized=True)

    def test_int8_pages_large_pages(self):
        self._check(seed=6, s=2, bs=64, mb=4, quantized=True)
