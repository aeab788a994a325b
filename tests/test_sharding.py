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
