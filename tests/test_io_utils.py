"""WAV I/O, checkpoint/resume, config presets, metrics (SURVEY.md §5, T5)."""

import json
import os

import numpy as np
import pytest

import llzlab_tpu as lz
from llzlab_tpu.io.wav import read_wav, write_wav, wav_info
from llzlab_tpu.utils.checkpoint import load_state, save_state
from llzlab_tpu.utils.config import PRESETS, from_json, to_json
from llzlab_tpu.utils.metrics import MetricsLogger, config_hash


class TestWav:
    def test_float32_roundtrip(self, tmp_path):
        rng = np.random.default_rng(91)
        x = rng.standard_normal((2, 4800)).astype(np.float32) * 0.5
        p = str(tmp_path / "t.wav")
        write_wav(p, x, 48000)
        y, rate = read_wav(p)
        assert rate == 48000
        np.testing.assert_array_equal(x, y)

    def test_pcm16_roundtrip(self, tmp_path):
        rng = np.random.default_rng(92)
        x = (rng.standard_normal((1, 1000)) * 0.3).astype(np.float32)
        p = str(tmp_path / "t16.wav")
        write_wav(p, x, 44100, fmt="pcm", bits=16)
        y, rate = read_wav(p)
        assert rate == 44100
        np.testing.assert_allclose(x[0], y[0], atol=1.0 / 32768)

    def test_pcm24_roundtrip(self, tmp_path):
        rng = np.random.default_rng(93)
        x = (rng.standard_normal((3, 500)) * 0.5).astype(np.float32)
        x = np.clip(x, -1.0, 1.0 - 2.0 / (1 << 23))  # writer clips pcm
        p = str(tmp_path / "t24.wav")
        write_wav(p, x, 96000, fmt="pcm", bits=24)
        y, rate = read_wav(p)
        np.testing.assert_allclose(x, y, atol=2.0 / (1 << 23))

    def test_info(self, tmp_path):
        p = str(tmp_path / "i.wav")
        write_wav(p, np.zeros((4, 123), np.float32), 48000)
        info = wav_info(p)
        assert (info.channels, info.frames, info.sample_rate) == (4, 123, 48000)

    def test_mono_1d(self, tmp_path):
        p = str(tmp_path / "m.wav")
        write_wav(p, np.ones(100, np.float32) * 0.25, 8000)
        y, _ = read_wav(p)
        assert y.shape == (1, 100)


class TestCheckpoint:
    def test_roundtrip_pytree(self, tmp_path):
        import jax.numpy as jnp

        state = (jnp.arange(5, dtype=jnp.float32),
                 {"a": jnp.ones((2, 3)), "b": jnp.zeros(1)})
        p = str(tmp_path / "ck.npz")
        save_state(p, state, block_index=7, config_hash="abc")
        loaded, bi, meta = load_state(p, like=state)
        assert bi == 7 and meta["config_hash"] == "abc"
        np.testing.assert_array_equal(np.asarray(loaded[0]), np.arange(5))
        np.testing.assert_array_equal(np.asarray(loaded[1]["a"]), np.ones((2, 3)))

    def test_resume_bit_identical(self, tmp_path):
        """Checkpoint mid-stream and resume: output equals uninterrupted run."""
        from llzlab_tpu.pipeline import Chain, SOSStage

        sos = lz.peaking_eq_sos([300, 3000], [5, -4], 48000.0)
        chain = Chain([SOSStage(sos, block_size=1024)])
        rng = np.random.default_rng(94)
        x = rng.standard_normal((2, 4 * 2048)).astype(np.float32)
        y_full = np.asarray(chain(x))

        state = chain.init_state((2,))
        p = str(tmp_path / "mid.npz")
        y0, state = chain.apply(x[:, :2048], state)
        y1, state = chain.apply(x[:, 2048:4096], state)
        save_state(p, state, block_index=2)
        # "crash" — restart from checkpoint
        state2, bi, _ = load_state(p, like=chain.init_state((2,)))
        assert bi == 2
        y2, state2 = chain.apply(x[:, 4096:6144], state2)
        y3, _ = chain.apply(x[:, 6144:], state2)
        y_cat = np.concatenate(
            [np.asarray(v) for v in (y0, y1, y2, y3)], axis=-1
        )
        np.testing.assert_array_equal(y_cat, y_full)

    def test_resume_spectral_stage_bit_identical(self, tmp_path):
        """r5: the SpectralGainStage WOLA state dict (x_hist/ola/env/
        pos) checkpoints and resumes bit-identically — engine cwola
        forced so the composed path's state layout is the one saved."""
        from llzlab_tpu.pipeline import Chain, SpectralGainStage

        gain = np.linspace(1.0, 0.25, 1025).astype(np.float32)
        chain = Chain([SpectralGainStage(gain, engine="cwola")])
        rng = np.random.default_rng(95)
        x = rng.standard_normal((2, 4 * 4096)).astype(np.float32)

        state = chain.init_state((2,))
        ys_full = []
        for j in range(4):
            y, state = chain.apply(x[:, j * 4096 : (j + 1) * 4096], state)
            ys_full.append(np.asarray(y))
        y_full = np.concatenate(ys_full, axis=-1)

        state = chain.init_state((2,))
        p = str(tmp_path / "spec.npz")
        outs = []
        for j in range(2):
            y, state = chain.apply(x[:, j * 4096 : (j + 1) * 4096], state)
            outs.append(np.asarray(y))
        save_state(p, state, block_index=2)
        state2, bi, _ = load_state(p, like=chain.init_state((2,)))
        assert bi == 2
        for j in range(2, 4):
            y, state2 = chain.apply(x[:, j * 4096 : (j + 1) * 4096],
                                    state2)
            outs.append(np.asarray(y))
        np.testing.assert_array_equal(
            np.concatenate(outs, axis=-1), y_full)


class TestConfig:
    def test_presets_cover_baseline(self):
        assert set(PRESETS) == {
            "fir_lowpass_1ch", "resample_8ch", "iir_eq_64ch",
            "stft_gain_256ch", "channelizer_1024ch",
        }
        assert PRESETS["channelizer_1024ch"].channels == 1024
        assert PRESETS["resample_8ch"].resample.up == 147

    def test_json_roundtrip(self):
        cfg = PRESETS["iir_eq_64ch"]
        s = to_json(cfg)
        back = from_json(s)
        assert back == cfg

    def test_config_hash_stable(self):
        h1 = config_hash({"a": 1, "b": [2, 3]})
        h2 = config_hash({"b": [2, 3], "a": 1})
        assert h1 == h2 and len(h1) == 12


class TestMetrics:
    def test_jsonl_events(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        log = MetricsLogger(p, run="r1", echo=False)
        log.event("start", foo=1)
        log.stage("fir", samples=1_000_000, seconds=0.5)
        lines = [json.loads(l) for l in open(p)]
        assert lines[0]["kind"] == "start" and lines[0]["run"] == "r1"
        assert lines[1]["msps"] == 2.0
