"""TP-sharded Pallas paged attention on the virtual 8-device CPU mesh.

Round-3 verdict: the Pallas kernel over a head-axis-sharded KV cache was
the one engine configuration with zero coverage. These tests run
`paged_attention_pallas_tp` (jax.shard_map over the tp axis, each shard's
kernel in interpret mode) against `paged_attention_xla` on the same
sharded operands, f32 and int8 pages, and the engine decode_step routed
through it end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from fun_asr_vllm_tpu.ops.paged_attention import paged_attention_pallas_tp
from fun_asr_vllm_tpu.engine.kv_cache import paged_attention_xla
from fun_asr_vllm_tpu.parallel.mesh import make_mesh


def _mk_pages(rng, nb, nkv, bs, d, quantized=False):
    k = rng.normal(size=(nb, nkv, bs, d)).astype(np.float32)
    v = rng.normal(size=(nb, nkv, bs, d)).astype(np.float32)
    if not quantized:
        return jnp.asarray(k), jnp.asarray(v)

    def q8(x):
        s = np.max(np.abs(x), axis=-1, keepdims=True) / 127.0 + 1e-8
        return {"q": jnp.asarray(np.round(x / s).astype(np.int8)),
                "s": jnp.asarray(s.astype(np.float32))}

    return q8(k), q8(v)


def _shard(mesh, arr_or_dict, spec):
    if isinstance(arr_or_dict, dict):
        return {k: jax.device_put(v, NamedSharding(mesh, spec[k]))
                for k, v in arr_or_dict.items()}
    return jax.device_put(arr_or_dict, NamedSharding(mesh, spec))


class TestPagedAttentionPallasTP:
    @pytest.mark.parametrize("quantized", [False, True],
                             ids=["f32", "int8pages"])
    def test_matches_xla_on_tp_mesh(self, quantized):
        """Kernel over the head-sharded cache == XLA gather reference,
        with ragged seq_lens and a live block-table prefix."""
        mesh = make_mesh(dp=2, tp=4)
        s, nq, nkv, d, bs, nb, mb = 4, 8, 4, 128, 8, 16, 4
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(s, nq, d)).astype(np.float32))
        kl, vl = _mk_pages(rng, nb, nkv, bs, d, quantized)
        tables = jnp.asarray(
            rng.permutation(nb)[: s * mb].reshape(s, mb).astype(np.int32))
        seq_lens = jnp.asarray([5, bs * mb, 17, 1], jnp.int32)

        ref = paged_attention_xla(q, kl, vl, tables, seq_lens,
                                  out_dtype=jnp.float32)

        pages = P(None, "tp", None, None)
        kv_spec = {"q": pages, "s": pages} if quantized else pages
        q_sh = _shard(mesh, q, P(None, "tp", None))
        kl_sh = _shard(mesh, kl, kv_spec)
        vl_sh = _shard(mesh, vl, kv_spec)
        got = paged_attention_pallas_tp(
            q_sh, kl_sh, vl_sh, tables, seq_lens, mesh=mesh,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_decode_step_mesh_pallas_matches_xla(self):
        """Engine decode_step with use_pallas under a (dp, tp) mesh:
        logits match the XLA-attention mesh path (the configuration the
        engine runs when use_pallas=True and mesh is not None)."""
        from fun_asr_vllm_tpu.engine.kv_cache import (
            CacheConfig, decode_step, init_cache)
        from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod
        from fun_asr_vllm_tpu.parallel.mesh import (
            qwen3_param_sharding, shard_params)

        cfg = qwen3_mod.Qwen3Config(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=8, num_key_value_heads=4, head_dim=128,
            intermediate_size=96, dtype=jnp.float32, use_flash=False)
        params = qwen3_mod.init_params(cfg, jax.random.PRNGKey(0))
        mesh = make_mesh(dp=2, tp=4)
        params = shard_params(mesh, params, qwen3_param_sharding(mesh))
        s, nb, bs, mb = 4, 16, 8, 4
        kv_sharding = NamedSharding(mesh, P(None, None, "tp", None, None))

        cc = CacheConfig(num_blocks=nb, block_size=bs,
                         max_blocks_per_seq=mb, dtype=jnp.float32)

        def fresh_cache():
            kc, vc = init_cache(cfg, cc)
            # pre-fill pages with signal so attention reads real history
            kc = jax.random.normal(jax.random.PRNGKey(7), kc.shape,
                                   kc.dtype) * 0.3
            vc = jax.random.normal(jax.random.PRNGKey(8), vc.shape,
                                   vc.dtype) * 0.3
            return (jax.device_put(kc, kv_sharding),
                    jax.device_put(vc, kv_sharding))

        rng = np.random.default_rng(3)
        tokens = jnp.asarray(rng.integers(0, 128, s), jnp.int32)
        positions = jnp.asarray([9, 3, 30, 0], jnp.int32)
        tables = jnp.asarray(
            rng.permutation(nb)[: s * mb].reshape(s, mb).astype(np.int32))
        seq_lens = positions + 1
        active = jnp.ones(s, bool)

        kc, vc = fresh_cache()
        ref, kr, vr = decode_step(params, cfg, kc, vc, tokens, positions,
                                  tables, seq_lens, active,
                                  use_pallas=False, mesh=mesh)
        kc, vc = fresh_cache()
        got, kg, vg = decode_step(params, cfg, kc, vc, tokens, positions,
                                  tables, seq_lens, active,
                                  use_pallas=True, mesh=mesh,
                                  pallas_interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        # cache writes agree too (same scatter; layer>0 K values carry
        # the previous layer's attention numerics, hence the tolerance)
        np.testing.assert_allclose(np.asarray(kg), np.asarray(kr),
                                   atol=1e-5)
