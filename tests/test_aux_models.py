"""Aux model tests: SenseVoiceSmall (tagging/ASR) and CT-Transformer
punctuation — conversion from synthetic funasr-format state dicts (the
encoder core is already golden-tested in test_convert.py), CTC decode,
and the data-factory seams."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from fun_asr_vllm_tpu.models.ct_punc import (  # noqa: E402
    CTPunc,
    CTPuncConfig,
    GreedyVocabTokenizer,
)
from fun_asr_vllm_tpu.models.ct_punc import (  # noqa: E402
    forward as punc_forward,
)
from fun_asr_vllm_tpu.models.ct_punc import (  # noqa: E402
    from_funasr_sd as punc_from_sd,
)
from fun_asr_vllm_tpu.models.ct_punc import (  # noqa: E402
    init_params as punc_init,
)
from fun_asr_vllm_tpu.models.sensevoice import (  # noqa: E402
    LID_DICT,
    SenseVoiceConfig,
    SenseVoiceSmall,
    ctc_greedy_decode,
    forward_ctc_logits,
    from_funasr_sd,
    init_params,
)

SV_SMALL = SenseVoiceConfig(
    input_size=80, output_size=32, attention_heads=4, linear_units=48,
    num_blocks=2, tp_blocks=1, kernel_size=7, vocab_size=50,
    embed_entries=16,
)


class TestSenseVoice:
    def test_forward_shapes_and_queries(self):
        params = init_params(SV_SMALL, jax.random.PRNGKey(0))
        rng = np.random.default_rng(1)
        speech = jnp.asarray(rng.normal(size=(2, 10, 80)), jnp.float32)
        lens = jnp.asarray([10, 7], jnp.int32)
        logits, out_lens = forward_ctc_logits(
            params, SV_SMALL, speech, lens,
            jnp.asarray([LID_DICT["zh"], LID_DICT["auto"]]),
            jnp.asarray([14, 15]),
        )
        assert logits.shape == (2, 14, 50)  # 4 query frames prepended
        assert out_lens.tolist() == [14, 11]
        # language query changes the output
        logits2, _ = forward_ctc_logits(
            params, SV_SMALL, speech, lens,
            jnp.asarray([LID_DICT["en"], LID_DICT["auto"]]),
            jnp.asarray([14, 15]),
        )
        assert not np.allclose(np.asarray(logits[0]), np.asarray(logits2[0]))

    def test_ctc_greedy_decode(self):
        v = 5
        logits = np.full((6, v), -10.0, np.float32)
        for t, tok in enumerate([0, 2, 2, 0, 3, 3]):
            logits[t, tok] = 10.0
        assert ctc_greedy_decode(logits, 6) == [2, 3]
        assert ctc_greedy_decode(logits, 2) == [2]

    def test_conversion_from_funasr_sd(self):
        """Synthetic funasr-named state dict (embed + encoder.* + ctc)
        converts and reproduces the torch encoder wiring."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_convert import SANMEncoderRef

        torch.manual_seed(0)
        enc_ref = SANMEncoderRef(80, 32, 4, 48, 2, 7, tp_blocks=1)
        sd = {"encoder." + k: v.detach().numpy()
              for k, v in enc_ref.state_dict().items()}
        g = torch.Generator().manual_seed(1)
        sd["embed.weight"] = torch.randn(16, 80, generator=g) * 0.02
        sd["ctc.ctc_lo.weight"] = torch.randn(50, 32, generator=g) * 0.1
        sd["ctc.ctc_lo.bias"] = torch.zeros(50)
        params = from_funasr_sd(
            {k: (v.numpy() if hasattr(v, "numpy") else v)
             for k, v in sd.items()}, SV_SMALL,
        )
        rng = np.random.default_rng(2)
        speech = jnp.asarray(rng.normal(size=(1, 8, 80)), jnp.float32)
        logits, _ = forward_ctc_logits(
            params, SV_SMALL, speech, jnp.asarray([8]),
            jnp.asarray([3]), jnp.asarray([14]),
        )
        # reproduce with torch: prepend the same 4 query rows, run the
        # torch encoder, apply the ctc linear
        emb = sd["embed.weight"]
        x = torch.cat([
            emb[3][None], emb[1][None], emb[2][None], emb[14][None],
            torch.from_numpy(np.asarray(speech[0])),
        ])[None]
        with torch.no_grad():
            enc = enc_ref(x, torch.tensor([12]))
            want = enc @ sd["ctc.ctc_lo.weight"].T + sd["ctc.ctc_lo.bias"]
        np.testing.assert_allclose(
            np.asarray(logits)[0], want[0].numpy(), atol=3e-4, rtol=1e-3
        )

    def test_generate_end_to_end(self):
        model = SenseVoiceSmall(config=SV_SMALL)
        # frontend expects 560-dim (lfr 7) — use a matching tiny config
        # via raw features instead: drive generate with a real wav array
        model.frontend.lfr_m, model.frontend.lfr_n = 1, 1  # 80-dim feats
        wav = np.random.default_rng(0).normal(
            scale=0.05, size=16000
        ).astype(np.float32)
        out = model.generate(input=wav)
        assert isinstance(out[0]["text"], str)


class TestCTPunc:
    TINY = CTPuncConfig(vocab_size=600, embed_unit=16, att_unit=16,
                        attention_heads=4, linear_units=24, num_blocks=2,
                        kernel_size=5)

    def test_forward_shapes(self):
        params = punc_init(self.TINY, jax.random.PRNGKey(0))
        ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
        logits = punc_forward(params, self.TINY, ids, jnp.asarray([4]))
        assert logits.shape == (1, 4, self.TINY.num_classes)

    def test_tokenizer_longest_match(self):
        tok = GreedyVocabTokenizer(["<unk>", "今天", "天气", "今", "好"])
        pieces, ids = tok.tokenize("今天天气好吗")
        assert pieces == ["今天", "天气", "好", "吗"]
        assert ids[-1] == 0  # 吗 → <unk>

    def test_callable_appends_punctuation(self):
        punc = CTPunc(config=self.TINY,
                      tokens=["<unk>"] + list("今天气好吗我们去公园"))
        out = punc("今天天气好吗我们去公园")
        assert out.endswith("。")
        # no characters lost
        import re

        assert re.sub(r"[，。？、]", "", out) == "今天天气好吗我们去公园"

    def test_conversion_from_funasr_sd(self):
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_convert import SANMEncoderRef

        torch.manual_seed(2)
        enc_ref = SANMEncoderRef(16, 16, 4, 24, 2, 5)
        sd = {"encoder." + k: v.detach().numpy()
              for k, v in enc_ref.state_dict().items()}
        g = torch.Generator().manual_seed(3)
        sd["embed.weight"] = (torch.randn(600, 16, generator=g) * 0.02).numpy()
        sd["decoder.weight"] = (torch.randn(6, 16, generator=g) * 0.1).numpy()
        sd["decoder.bias"] = np.zeros(6, np.float32)
        params = punc_from_sd(sd, self.TINY)
        ids = jnp.asarray([[5, 6, 7]], jnp.int32)
        logits = punc_forward(params, self.TINY, ids, jnp.asarray([3]))
        x = torch.from_numpy(sd["embed.weight"][[5, 6, 7]])[None]
        with torch.no_grad():
            enc = enc_ref(x, torch.tensor([3]))
            want = (enc @ torch.from_numpy(sd["decoder.weight"]).T
                    + torch.from_numpy(sd["decoder.bias"]))
        np.testing.assert_allclose(
            np.asarray(logits)[0], want[0].numpy(), atol=3e-4, rtol=1e-3
        )


class TestSeams:
    def test_make_punctuator_fallback(self, tmp_path):
        from fun_asr_vllm_tpu.data.punc import RulePunctuator, make_punctuator

        assert isinstance(make_punctuator(None), RulePunctuator)

    def test_make_tagger_fallback(self):
        from fun_asr_vllm_tpu.data.sensevoice_tags import (
            HeuristicTagger, make_tagger,
        )

        assert isinstance(make_tagger(None), HeuristicTagger)
