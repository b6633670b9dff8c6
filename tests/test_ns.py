"""Noise-suppression tests: STFT round-trip, oracle match, SNR gain."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import pytest

import xmtpu  # noqa: F401
from xmtpu.graph import fx as fxg
from xmtpu.ops import ns

from .conftest import rms_db

SR = 16000


def test_stft_istft_roundtrip(signals):
    """Identity (gain 1) reconstruction is exact to f32 (COLA check)."""
    x = signals(9600, SR)["noise"]
    X = ns.stft(jnp.asarray(x))
    y = ns.istft(X, len(x))
    db = rms_db(np.asarray(y, np.float64) - x, x)
    assert db <= -100.0, db


def test_suppress_matches_oracle(signals):
    rng = np.random.default_rng(5)
    clean = signals(16000, SR)["sine"]
    noisy = clean + (0.05 * rng.standard_normal(len(clean))).astype(np.float32)
    ref = ns.suppress_np(noisy)
    y = ns.suppress(jnp.asarray(noisy))
    db = rms_db(np.asarray(y, np.float64) - ref, ref)
    assert db <= -80.0, db


def test_suppress_improves_snr(signals):
    """Stationary white noise under a tone: NS must improve SNR by
    >= 6 dB (lead-in is noise-only for the noise estimate)."""
    rng = np.random.default_rng(6)
    n = 16000
    clean = np.zeros(n, np.float32)
    t = np.arange(n - 4000) / SR
    clean[4000:] = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    noise = (0.03 * rng.standard_normal(n)).astype(np.float32)
    noisy = clean + noise
    y = np.asarray(ns.suppress(jnp.asarray(noisy)), np.float64)

    def snr(sig):
        e_n = np.mean((sig[:3500] - clean[:3500]) ** 2)  # noise-only region
        e_s = np.mean(clean[4000:] ** 2)
        return 10 * np.log10(e_s / e_n)

    gain = snr(y) - snr(noisy.astype(np.float64))
    assert gain >= 6.0, gain


def test_suppress_transparent_on_clean_speechlike(signals):
    """Little damage to a clean signal (floor keeps low-SNR bins alive)."""
    x = signals(16000, SR)["sweep"]
    y = np.asarray(ns.suppress(jnp.asarray(x)), np.float64)
    # energy mostly preserved after the noise-estimate lead-in
    e_in = np.mean(x[8000:].astype(np.float64) ** 2)
    e_out = np.mean(y[8000:] ** 2)
    assert 0.5 < e_out / e_in <= 1.2


def test_ns_in_effect_chain(signals):
    rng = np.random.default_rng(7)
    x = signals(9600, SR)["sine"] + (0.02 * rng.standard_normal(9600)
                                     ).astype(np.float32)
    y = fxg.apply_chain(x, SR, [{"name": "noise_suppression"}])
    assert y.shape == x.shape and y.dtype == np.float32
    assert np.all(np.isfinite(y))


# --- streaming (causal) NS ---------------------------------------------------


def test_stream_ns_block_invariance_and_offline_match(signals):
    import jax
    from xmtpu.ops import ns as _ns

    rng = np.random.default_rng(5)
    n = 16384
    noisy = (signals(n, SR)["sine"] * 0.5
             + 0.03 * rng.standard_normal(n)).astype(np.float32)[None]
    off = np.asarray(_ns.suppress(jnp.asarray(noisy)))

    def run(blk):
        st = _ns.stream_init(1)
        outs = []
        for i in range(0, n, blk):
            y, st = _ns.stream_suppress(jnp.asarray(noisy[:, i:i + blk]), st)
            outs.append(np.asarray(y))
        return np.concatenate(outs, -1)

    y1, y2 = run(512), run(1024)
    np.testing.assert_array_equal(y1, y2)  # bit-exact block invariance
    # after the lead-in, streaming == offline shifted by the hop delay
    delay, skip = 256, 10 * 256
    a = y1[0, delay + skip:].astype(np.float64)
    b = off[0, skip: n - delay].astype(np.float64)
    assert rms_db(a - b, b) <= -100.0


def test_stream_ns_in_session(signals):
    from xmtpu.config.schema import EffectConfig, PipelineConfig, TrackConfig
    from xmtpu.graph.streaming import StreamSession

    rng = np.random.default_rng(9)
    voice = (signals(16000, SR)["sine"]
             + 0.05 * rng.standard_normal(16000)).astype(np.float32)
    cfg = PipelineConfig(
        tracks=(TrackConfig(url="v"),),
        master_effects=(EffectConfig("noise_suppression", {}),),
        sample_rate=SR, normalize=None,
    )
    s = StreamSession(cfg, frame_ms=20.0, sources={"v": (voice, SR)},
                      output_dtype=np.float32)
    frames = np.concatenate([s.read() for _ in range(40)], axis=0)[:, 0]
    assert np.all(np.isfinite(frames))
    # noise floor in the delayed silence... just check output is non-trivial
    assert np.max(np.abs(frames)) > 0.1
