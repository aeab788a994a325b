"""Real-checkpoint golden-activation tests (OPTIONAL — skipped unless a
goldens bundle exists).

When Fun-ASR-Nano weights become available, run `tools/dump_goldens.py`
against the funasr reference to produce `goldens.npz`, place the
checkpoint dir + bundle here, and this module closes the CER-parity
loop: frontend bit-closeness, encoder/adaptor activation parity through
the converted weights, and token-exact greedy decode.

    FUN_ASR_GOLDENS=/path/goldens.npz \\
    FUN_ASR_MODEL_DIR=/path/Fun-ASR-Nano-2512 \\
    python -m pytest tests/test_goldens_optional.py -v
"""

import os

import numpy as np
import pytest

GOLDENS = os.environ.get("FUN_ASR_GOLDENS")
MODEL_DIR = os.environ.get("FUN_ASR_MODEL_DIR")

pytestmark = pytest.mark.skipif(
    not (GOLDENS and os.path.exists(GOLDENS)
         and MODEL_DIR and os.path.isdir(MODEL_DIR)),
    reason="set FUN_ASR_GOLDENS + FUN_ASR_MODEL_DIR to run "
           "real-checkpoint parity",
)


@pytest.fixture(scope="module")
def bundle():
    return np.load(GOLDENS, allow_pickle=True)


@pytest.fixture(scope="module")
def model():
    from fun_asr_vllm_tpu.models.nano import FunASRNano

    m, _ = FunASRNano.from_pretrained(model=MODEL_DIR, dtype="float32")
    return m


class TestRealCheckpointParity:
    def test_frontend_matches(self, bundle, model):
        feats, lens = model.frontend.extract([bundle["wav"]])
        n = int(bundle["fbank_len"])
        got = np.asarray(feats[0, :n])
        np.testing.assert_allclose(
            got, bundle["fbank"][:n], atol=1e-3, rtol=1e-3
        )

    def test_encoder_matches(self, bundle, model):
        feats, lens = model.frontend.extract([bundle["wav"]])
        enc, enc_lens = model.audio_encoder(feats, lens)
        n = min(int(enc_lens[0]), bundle["encoder_out"].shape[0])
        np.testing.assert_allclose(
            np.asarray(enc[0, :n]), bundle["encoder_out"][:n],
            atol=5e-2, rtol=5e-2,  # bf16-tolerant; tighten with fp32 runs
        )

    def test_adaptor_matches(self, bundle, model):
        feats, lens = model.frontend.extract([bundle["wav"]])
        enc, enc_lens = model.audio_encoder(feats, lens)
        ad, ad_lens = model.audio_adaptor(enc, enc_lens)
        n = min(int(ad_lens[0]), bundle["adaptor_out"].shape[0])
        np.testing.assert_allclose(
            np.asarray(ad[0, :n]), bundle["adaptor_out"][:n],
            atol=5e-2, rtol=5e-2,
        )

    def test_greedy_transcript_matches(self, bundle, model):
        results, _ = model.inference(data_in=[bundle["wav"]], itn=True)
        assert results[0]["text"] == str(bundle["reference_text"])
