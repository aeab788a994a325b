"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
dp/tp-sharded train step and sharded decode parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestDryrun:
    def test_dryrun_multichip_8(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_entry_compiles(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import __graft_entry__

        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


class TestShardedDecode:
    def test_tp_sharded_logits_match_replicated(self):
        """Qwen3 forward with tp-sharded params == replicated params."""
        from fun_asr_vllm_tpu.models.qwen3 import (
            Qwen3Config, forward_logits, init_params,
        )
        from fun_asr_vllm_tpu.parallel.mesh import (
            make_mesh, qwen3_param_sharding, shard_params,
        )

        cfg = Qwen3Config(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=128, dtype=jnp.float32,
        )
        params = init_params(cfg, jax.random.PRNGKey(0))
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, 128, size=(2, 9))
        )
        ref = np.asarray(forward_logits(params, cfg, ids))

        mesh = make_mesh(dp=4, tp=2)
        sharded = shard_params(mesh, params, qwen3_param_sharding(mesh))
        with mesh:
            got = np.asarray(forward_logits(sharded, cfg, ids))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


class TestMeshEngine:
    """Engine-level tp/dp execution (LLM(mesh=...)): token-identical to the
    single-device engine."""

    def _cfg_params(self):
        from fun_asr_vllm_tpu.models.qwen3 import Qwen3Config, init_params

        cfg = Qwen3Config(
            vocab_size=128, hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            intermediate_size=96, eos_token_id=1, pad_token_id=0,
            dtype=jnp.float32,
        )
        return cfg, init_params(cfg, jax.random.PRNGKey(3))

    def test_generate_on_mesh_matches_single_device(self):
        from fun_asr_vllm_tpu.engine import LLM, SamplingParams
        from fun_asr_vllm_tpu.parallel.mesh import make_mesh

        cfg, params = self._cfg_params()
        sp = SamplingParams(temperature=0.0, max_tokens=6)
        rng = np.random.default_rng(7)
        embeds = [rng.normal(scale=0.3, size=(t, 64)).astype(np.float32)
                  for t in (5, 9, 7, 6)]

        llm0 = LLM(params=params, config=cfg, dtype="float32",
                   max_num_seqs=4, block_size=4, use_pallas=False)
        want = [o.outputs[0].token_ids
                for o in llm0.generate([{"prompt_embeds": e} for e in embeds], sp)]

        mesh = make_mesh(dp=4, tp=2)
        llm1 = LLM(params=params, config=cfg, dtype="float32",
                   max_num_seqs=4, block_size=4, use_pallas=False, mesh=mesh)
        got = [o.outputs[0].token_ids
               for o in llm1.generate([{"prompt_embeds": e} for e in embeds], sp)]
        assert got == want

    def test_fused_path_on_mesh(self):
        """The single-dispatch encode+prefill+decode program must run and
        match the unsharded engine under a (dp, tp) mesh."""
        from fun_asr_vllm_tpu.audio.frontend import WavFrontend
        from fun_asr_vllm_tpu.engine import LLM, SamplingParams
        from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
        from fun_asr_vllm_tpu.models import encoder as encoder_mod
        from fun_asr_vllm_tpu.parallel.mesh import (
            adaptor_param_sharding, encoder_param_sharding, make_mesh,
            shard_params,
        )

        cfg, params = self._cfg_params()
        enc_cfg = encoder_mod.SANMEncoderConfig(
            input_size=80, output_size=32, attention_heads=4,
            linear_units=64, num_blocks=2, dtype=jnp.float32,
        )
        ad_cfg = adaptor_mod.NanoAdaptorConfig(
            encoder_dim=32, llm_dim=64, ffn_dim=64, dtype=jnp.float32
        )
        key = jax.random.PRNGKey(5)
        enc_params = encoder_mod.init_params(enc_cfg, key)
        ad_params = adaptor_mod.init_params(ad_cfg, key)
        fe = WavFrontend(dither=0.0)
        rng = np.random.default_rng(11)
        wavs = [rng.normal(scale=0.05, size=n).astype(np.float32)
                for n in (16000, 12000, 9000, 14000)]
        pcm, frames = fe.batchify(wavs)
        prefix = jnp.asarray(rng.normal(scale=0.3, size=(3, 64)), jnp.float32)
        suffix = jnp.asarray(rng.normal(scale=0.3, size=(2, 64)), jnp.float32)
        sp = SamplingParams(temperature=0.0, max_tokens=5)

        def run(mesh):
            ep, ap = enc_params, ad_params
            if mesh is not None:
                ep = shard_params(mesh, ep, encoder_param_sharding(mesh))
                ap = shard_params(mesh, ap, adaptor_param_sharding(mesh))
            llm = LLM(params=params, config=cfg, dtype="float32",
                      max_num_seqs=4, block_size=4, use_pallas=False,
                      mesh=mesh)
            outs = llm.generate_fused(
                pcm, frames, ep, enc_cfg, ap, ad_cfg, fe, prefix, suffix, sp
            )
            return [o.outputs[0].token_ids for o in outs]

        want = run(None)
        got = run(make_mesh(dp=4, tp=2))
        assert got == want

    def test_int8_quantized_engine_on_mesh(self):
        """Weight-only int8 composes with tensor parallelism: quantized
        leaves shard (q gets the weight spec, per-channel scales stay
        replicated on broadcast dims) and generation runs."""
        from fun_asr_vllm_tpu.engine import LLM, SamplingParams
        from fun_asr_vllm_tpu.parallel.mesh import make_mesh

        cfg, params = self._cfg_params()
        sp = SamplingParams(temperature=0.0, max_tokens=5)
        rng = np.random.default_rng(13)
        e = rng.normal(scale=0.3, size=(7, 64)).astype(np.float32)

        llm0 = LLM(params=params, config=cfg, dtype="float32",
                   max_num_seqs=2, block_size=4, use_pallas=False,
                   quantize="int8")
        want = llm0.generate([{"prompt_embeds": e}], sp)[0].outputs[0].token_ids

        mesh = make_mesh(dp=4, tp=2)
        llm1 = LLM(params=params, config=cfg, dtype="float32",
                   max_num_seqs=2, block_size=4, use_pallas=False,
                   quantize="int8", mesh=mesh)
        got = llm1.generate([{"prompt_embeds": e}], sp)[0].outputs[0].token_ids
        assert got == want

    def test_int8_kv_cache_on_mesh(self):
        """int8 KV pages compose with tensor parallelism (VERDICT r2
        item 3): the {q, s} cache pytree shards over kv heads like the
        fp cache, and decode is token-identical to the single-device
        int8-KV engine."""
        from fun_asr_vllm_tpu.engine import LLM, SamplingParams
        from fun_asr_vllm_tpu.parallel.mesh import make_mesh

        cfg, params = self._cfg_params()
        sp = SamplingParams(temperature=0.0, max_tokens=6)
        rng = np.random.default_rng(17)
        embeds = [rng.normal(scale=0.3, size=(t, 64)).astype(np.float32)
                  for t in (5, 9)]

        llm0 = LLM(params=params, config=cfg, dtype="float32",
                   max_num_seqs=2, block_size=4, use_pallas=False,
                   kv_cache_dtype="int8")
        want = [o.outputs[0].token_ids for o in llm0.generate(
            [{"prompt_embeds": e} for e in embeds], sp)]

        mesh = make_mesh(dp=4, tp=2)
        llm1 = LLM(params=params, config=cfg, dtype="float32",
                   max_num_seqs=2, block_size=4, use_pallas=False,
                   kv_cache_dtype="int8", mesh=mesh)
        got = [o.outputs[0].token_ids for o in llm1.generate(
            [{"prompt_embeds": e} for e in embeds], sp)]
        assert got == want


class TestInt4GroupDimSharding:
    def test_indivisible_group_dim_replicates(self):
        """A tp size that divides the input dim but not G = in/group_size
        must replicate the int4 group dim instead of failing device_put
        (review finding: tp=4 with G=6 raised at engine init)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from jax.sharding import PartitionSpec as P

        from fun_asr_vllm_tpu.models.qwen3 import quantize_int4
        from fun_asr_vllm_tpu.parallel.mesh import make_mesh, shard_params

        mesh = make_mesh(dp=2, tp=4)
        w = jnp.asarray(
            np.random.default_rng(0).normal(size=(768, 16)), jnp.float32)
        leaf = quantize_int4(w, group_size=128)  # G = 6, not % 4
        out = shard_params(mesh, leaf, P("tp", None))
        # replicated group dim: every device holds all 6 groups
        assert out["q4"].sharding.spec == P(None, None, None)
        # divisible case keeps the tp axis on the group dim
        w2 = jnp.asarray(
            np.random.default_rng(1).normal(size=(1024, 16)), jnp.float32)
        leaf2 = quantize_int4(w2, group_size=128)  # G = 8, % 4 ok
        out2 = shard_params(mesh, leaf2, P("tp", None))
        assert out2["q4"].sharding.spec == P("tp", None, None)
