"""Training-step tests (the reference `forward` loss path, model.py:132-248):
loss decreases under adamw, audio-span splice semantics, stats dict."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fun_asr_vllm_tpu.models import adaptor as adaptor_mod
from fun_asr_vllm_tpu.models import encoder as encoder_mod
from fun_asr_vllm_tpu.models import qwen3 as qwen3_mod
from fun_asr_vllm_tpu.parallel.train import (
    NanoConfigs,
    make_optimizer,
    make_synthetic_batch,
    make_train_step,
    nano_loss,
    splice_audio_embeds,
)


@pytest.fixture(scope="module")
def setup():
    enc_cfg = encoder_mod.SANMEncoderConfig(
        input_size=80, output_size=32, attention_heads=4, linear_units=64,
        num_blocks=2, dtype=jnp.float32,
    )
    ad_cfg = adaptor_mod.NanoAdaptorConfig(
        encoder_dim=32, llm_dim=32, ffn_dim=64, dtype=jnp.float32
    )
    llm_cfg = qwen3_mod.Qwen3Config(
        vocab_size=64, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        intermediate_size=64, dtype=jnp.float32,
    )
    cfgs = NanoConfigs(enc_cfg, ad_cfg, llm_cfg)
    key = jax.random.PRNGKey(0)
    params = {
        "audio_encoder": encoder_mod.init_params(enc_cfg, key),
        "audio_adaptor": adaptor_mod.init_params(ad_cfg, key),
        "llm": qwen3_mod.init_params(llm_cfg, key),
    }
    return cfgs, params


class TestSplice:
    def test_audio_replaces_span(self):
        b, l, h, ta = 2, 10, 4, 6
        tok = jnp.zeros((b, l, h))
        audio = jnp.ones((b, ta, h))
        lens = jnp.asarray([3, 6])
        beg = jnp.asarray([2, 0])
        out = np.asarray(splice_audio_embeds(tok, audio, lens, beg))
        # row 0: positions 2..4 are audio
        assert (out[0, 2:5] == 1).all()
        assert (out[0, :2] == 0).all() and (out[0, 5:] == 0).all()
        # row 1: positions 0..5 are audio
        assert (out[1, :6] == 1).all() and (out[1, 6:] == 0).all()


class TestLoss:
    def test_loss_and_stats(self, setup):
        cfgs, params = setup
        batch = {k: jnp.asarray(v) for k, v in
                 make_synthetic_batch(cfgs, 2, 32, 24).items()}
        loss, stats = nano_loss(params, cfgs, batch)
        assert np.isfinite(float(loss))
        assert 0.0 <= float(stats["acc"]) <= 1.0
        assert float(stats["batch_tokens"]) > 0
        # random init → loss near ln(vocab)
        assert abs(float(loss) - np.log(cfgs.llm.vocab_size)) < 1.5

    def test_loss_decreases(self, setup):
        cfgs, params = setup
        opt = make_optimizer(lr=5e-3)
        # the train step donates its inputs — copy so the module-scoped
        # fixture's buffers survive for later tests
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        opt_state = opt.init(params)
        step = make_train_step(cfgs, opt)
        batch = {k: jnp.asarray(v) for k, v in
                 make_synthetic_batch(cfgs, 2, 32, 24).items()}
        losses = []
        for _ in range(8):
            params, opt_state, stats = step(params, opt_state, batch)
            losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0] - 0.3, losses

    def test_label_masking(self, setup):
        """-100-masked positions must not contribute: fully-masked labels →
        zero batch tokens handled without nan."""
        cfgs, params = setup
        batch = make_synthetic_batch(cfgs, 2, 32, 24)
        batch["labels"] = np.full_like(batch["labels"], -100)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        loss, stats = nano_loss(params, cfgs, batch)
        assert float(stats["batch_tokens"]) == 0.0
        assert np.isfinite(float(loss)) and float(loss) == 0.0


class TestTrainToServe:
    def test_overfit_then_engine_reproduces_targets(self, setup):
        """End-to-end coherence: train the full stack (encoder+adaptor+
        LLM via the pjit train step) to overfit two synthetic
        audio→transcript pairs, then the SERVING ENGINE must decode those
        exact token sequences from the trained weights — proving the
        training loss path, the audio-span splice, the prompt layout and
        the paged-KV engine all agree."""
        from fun_asr_vllm_tpu.engine import LLM, SamplingParams
        from fun_asr_vllm_tpu.parallel.train import (
            make_optimizer, make_train_step,
        )

        cfgs, params = setup
        rng = np.random.default_rng(0)
        B, F, S = 2, 32, 12
        eos = 1  # in-vocab EOS for the tiny config
        prompt_len = 2  # tokens before the audio span
        audio_tokens = adaptor_mod.downsampled_length(F)
        # target transcripts (disjoint, then EOS)
        targets = np.array([[10, 11, 12, eos], [20, 21, 22, eos]], np.int32)
        t_len = targets.shape[1]
        seq_len = prompt_len + audio_tokens + t_len

        speech = rng.normal(size=(B, F, cfgs.encoder.input_size)
                            ).astype(np.float32)
        input_ids = np.zeros((B, seq_len), np.int32)
        input_ids[:, :prompt_len] = 2  # fixed prompt token
        input_ids[:, prompt_len + audio_tokens:] = targets
        labels = np.full((B, seq_len), -100, np.int32)
        labels[:, prompt_len + audio_tokens:] = targets
        batch = {
            "speech": speech,
            "speech_lengths": np.full((B,), F, np.int32),
            "input_ids": input_ids,
            "labels": labels,
            "fbank_beg": np.full((B,), prompt_len, np.int32),
            "attention_lengths": np.full((B,), seq_len, np.int32),
        }

        optimizer = make_optimizer(lr=3e-3)
        opt_state = optimizer.init(params)
        step = make_train_step(cfgs, optimizer)
        import jax as _jax

        # the train step donates params/opt_state — real copies, so the
        # module-scoped fixture's buffers survive for later tests
        params = _jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        opt_state = optimizer.init(params)
        state = (params, opt_state)
        for i in range(150):
            p, o, stats = step(*state, batch)
            state = (p, o)
        assert float(stats["acc"]) == 1.0, float(stats["acc"])
        params = state[0]

        # serve: [prompt ⧺ audio ⧺ nothing] → greedy decode == target
        enc_out, enc_lens = encoder_mod.encode(
            params["audio_encoder"], cfgs.encoder,
            jnp.asarray(speech), jnp.asarray(batch["speech_lengths"]),
        )
        audio, audio_lens = adaptor_mod.forward(
            params["audio_adaptor"], cfgs.adaptor, enc_out, enc_lens
        )
        prompt_emb = np.asarray(qwen3_mod.embed_tokens(
            params["llm"], jnp.asarray([2, 2], jnp.int32)
        ), np.float32)
        llm = LLM(params=params["llm"], config=cfgs.llm, dtype="float32",
                  max_num_seqs=2, max_model_len=64, block_size=4,
                  use_pallas=False)
        audio_np = np.asarray(audio, np.float32)
        outs = llm.generate(
            [{"prompt_embeds": np.concatenate(
                [prompt_emb, audio_np[i, : int(audio_lens[i])]])}
             for i in range(B)],
            SamplingParams(temperature=0.0, max_tokens=8,
                           stop_token_ids=[eos]),
        )
        for i, o in enumerate(outs):
            want = [t for t in targets[i].tolist() if t != eos]
            assert o.outputs[0].token_ids == want, (
                i, o.outputs[0].token_ids, want
            )


def test_remat_grads_identical(setup):
    """remat=True (the reference's activation_checkpoint analogue) must
    change memory, not math: loss and every gradient leaf match the
    non-remat step."""
    import dataclasses as dc

    cfgs, params = setup
    batch = {k: jnp.asarray(v) for k, v in
             make_synthetic_batch(cfgs, batch=2, frames=24, seq_len=16).items()}
    cfgs_r = NanoConfigs(
        dc.replace(cfgs.encoder, remat=True),
        cfgs.adaptor,
        dc.replace(cfgs.llm, remat=True),
    )
    (l0, _), g0 = jax.value_and_grad(
        lambda p: nano_loss(p, cfgs, batch), has_aux=True)(params)
    (l1, _), g1 = jax.value_and_grad(
        lambda p: nano_loss(p, cfgs_r, batch), has_aux=True)(params)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)
    ok = jax.tree.map(
        lambda a, b: bool(np.allclose(np.asarray(a), np.asarray(b),
                                      rtol=1e-5, atol=1e-6)), g0, g1)
    assert all(jax.tree.leaves(ok))


def test_collate_pin_not_multiple_of_bucket():
    """A pinned global shape (--max_seq/--max_frames) IS the final padded
    shape: samples within the pin must collate even when the pin is not a
    multiple of token_multiple/frame_multiple (regression: rounding-first
    rejected valid samples and could desync a multi-host run)."""
    from fun_asr_vllm_tpu.parallel.train import collate_samples

    s = {
        "speech": np.zeros((1, 70, 80), np.float32),
        "speech_lengths": np.asarray([70], np.int32),
        "input_ids": list(range(97)),
        "labels_ids": [-100] * 97,
        "fbank_beg": np.asarray([1], np.int32),
    }
    b = collate_samples([s], frame_multiple=64, token_multiple=16,
                        frames_to=100, tokens_to=100)
    assert b["input_ids"].shape == (1, 100)
    assert b["speech"].shape[1] == 100
    long = dict(s, input_ids=list(range(101)), labels_ids=[-100] * 101)
    with pytest.raises(ValueError):
        collate_samples([long], tokens_to=100)
