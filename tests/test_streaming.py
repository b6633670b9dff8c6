"""M6 streaming tests: Session frame loop == offline pipeline
(SURVEY.md §4.2 "streaming(20 ms)==offline" invariant; BASELINE.json:11).
"""

from __future__ import annotations

import numpy as np
import pytest

import xmtpu
from xmtpu.config.schema import PipelineConfig, TrackConfig, EffectConfig
from xmtpu.graph import fx as fxg
from xmtpu.graph import mixer as mixg
from xmtpu.graph.streaming import StreamSession

from .conftest import rms_db

SR = 16000


@pytest.fixture(scope="module")
def two_tracks():
    rng = np.random.default_rng(3)
    n_v = 44100 * 2  # 2 s voice at 44.1k
    voice = (0.3 * rng.standard_normal(n_v)).astype(np.float32)
    n_b = 16000  # 1 s bgm at bus rate, looped
    t = np.arange(n_b) / SR
    bgm = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    return voice, bgm


def _config(effects=(), voice_kw=None, bgm_kw=None):
    return PipelineConfig(
        tracks=(
            TrackConfig(url="voice", volume=0.9, fade_in_ms=50.0,
                        fade_out_ms=100.0, **(voice_kw or {})),
            TrackConfig(url="bgm", kind="bgm", volume=0.4, loop=True,
                        **(bgm_kw or {})),
        ),
        master_effects=tuple(effects),
        sample_rate=SR,
        normalize=None,
    )


def _offline(voice, bgm, cfg, total):
    """Offline oracle: mixer.mix + fx chain on the full clip."""
    dur_ms = total * 1000.0 / SR
    out = mixg.mix(
        [
            mixg.MixTrack(pcm=voice, sr=44100, gain=0.9,
                          fade_in_ms=50.0, fade_out_ms=100.0),
            mixg.MixTrack(pcm=bgm, sr=SR, gain=0.4, loop=True),
        ],
        SR,
        normalize=None,
        duration_ms=dur_ms,
    )
    if cfg.master_effects:
        out = fxg.apply_chain(out, SR, list(cfg.master_effects))
    return out


def _read_frames(sess, n_frames):
    return np.concatenate([sess.read() for _ in range(n_frames)], axis=0)


def test_streaming_equals_offline_mix_only(two_tracks):
    voice, bgm = two_tracks
    cfg = _config()
    sess = StreamSession(cfg, frame_ms=20.0,
                         sources={"voice": (voice, 44100), "bgm": (bgm, SR)},
                         output_dtype=np.float32)
    assert sess.frame_out == 320  # 20 ms at 16 kHz, multiple of L=160
    n_frames = 100  # 2 s — exactly the voice length, so offline trim
    # and natural track end coincide (fade-out semantics match)
    got = _read_frames(sess, n_frames)[:, 0]
    ref = _offline(voice, bgm, cfg, n_frames * sess.frame_out)
    ref = np.asarray(ref[: len(got)], np.float64)
    db = rms_db(got.astype(np.float64) - ref, ref)
    assert db <= -80.0, db


def test_streaming_equals_offline_with_effects(two_tracks):
    voice, bgm = two_tracks
    chain = (
        EffectConfig("equalizer", {"bands": [
            {"freq_hz": 120.0, "gain_db": 3.0, "q": 1.0},
            {"freq_hz": 2500.0, "gain_db": -2.0, "q": 1.0},
        ]}),
        EffectConfig("reverb", {"ir_seconds": 0.2, "wet": 0.25, "dry": 0.75}),
        EffectConfig("limiter", {"threshold_db": -6.0}),
    )
    cfg = _config(effects=chain)
    sess = StreamSession(cfg, frame_ms=20.0,
                         sources={"voice": (voice, 44100), "bgm": (bgm, SR)},
                         output_dtype=np.float32)
    n_frames = 100
    got = _read_frames(sess, n_frames)[:, 0]
    ref = _offline(voice, bgm, cfg, n_frames * sess.frame_out)
    ref = np.asarray(ref[: len(got)], np.float64)
    db = rms_db(got.astype(np.float64) - ref, ref)
    assert db <= -80.0, db


def test_streaming_seek(two_tracks):
    voice, bgm = two_tracks
    cfg = _config()
    src = {"voice": (voice, 44100), "bgm": (bgm, SR)}
    sess = StreamSession(cfg, frame_ms=20.0, sources=src,
                         output_dtype=np.float32)
    # read sequentially to frame 10, then seek back to frame 5
    frames = [sess.read() for _ in range(10)]
    sess.seek(5 * 20.0)  # ms
    again = sess.read()
    np.testing.assert_allclose(again, frames[5], atol=1e-7)


def test_streaming_state_resume(two_tracks):
    voice, bgm = two_tracks
    cfg = _config()
    src = {"voice": (voice, 44100), "bgm": (bgm, SR)}
    s1 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    for _ in range(7):
        s1.read()
    st = s1.state
    next_a = s1.read()
    s2 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    s2.load_state(st)
    next_b = s2.read()
    np.testing.assert_array_equal(next_a, next_b)


def test_streaming_int16_output(two_tracks):
    voice, bgm = two_tracks
    sess = StreamSession(_config(), frame_ms=20.0,
                         sources={"voice": (voice, 44100), "bgm": (bgm, SR)})
    f = sess.read()
    assert f.dtype == np.int16 and f.shape == (320, 1)


def test_session_public_api(two_tracks):
    voice, bgm = two_tracks
    s = xmtpu.Session(_config(), frame_ms=20.0,
                      sources={"voice": (voice, 44100), "bgm": (bgm, SR)})
    s.seek(100.0)
    f = s.read()
    assert f.shape == (320, 1)
    assert "frame_idx" in s.state


def test_streaming_load_state_accepts_legacy_scalar_ns_counter():
    """Round-5 review find: the in-memory load_state used to refuse
    pre-round-5 NS states (scalar shared counter vs today's per-item
    (ch,) counters) that load_state_file happily restored. Both paths
    now broadcast integer prefix leaves."""
    import jax
    import jax.numpy as jnp

    from xmtpu.config.schema import EffectConfig, PipelineConfig, TrackConfig

    rng = np.random.default_rng(5)
    voice = (0.3 * rng.standard_normal(int(44100 * 0.8))).astype(np.float32)
    cfg = PipelineConfig(
        tracks=(TrackConfig(url="v"),),
        effects=(EffectConfig("noise_suppression", {"nfft": 320}),),
        sample_rate=SR, normalize=None,
    )
    src = {"v": (voice, 44100)}
    s1 = StreamSession(cfg, frame_ms=20.0, sources=src)
    for _ in range(6):
        s1.read()
    st = dict(s1.state)
    next_a = s1.read()
    # rewrite into the pre-round-5 layout: int32 per-item counters
    # collapse to the shared scalar they used to be
    st["fx_state"] = jax.tree.map(
        lambda v: (jnp.asarray(np.asarray(v).reshape(-1)[0], jnp.int32)
                   if v.dtype == jnp.int32 else v),
        st["fx_state"])
    s2 = StreamSession(cfg, frame_ms=20.0, sources=src)
    s2.load_state(st)
    next_b = s2.read()
    np.testing.assert_array_equal(next_a, next_b)


def test_streaming_load_state_rejects_foreign_chain(two_tracks):
    """A state dict captured under a DIFFERENT effects chain must refuse
    at restore with a typed error (it can share frame_out, and used to
    blow up as an opaque jit pytree error at the next read)."""
    import dataclasses

    from xmtpu.config.schema import EffectConfig
    from xmtpu.utils.errors import ConfigError

    voice, bgm = two_tracks
    src = {"voice": (voice, 44100), "bgm": (bgm, SR)}
    cfg = _config()
    other = dataclasses.replace(
        cfg, master_effects=cfg.master_effects + (
            EffectConfig("volume", {"gain_db": -3.0}),
            EffectConfig("limiter", {}),
        ))
    s1 = StreamSession(other, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    s1.read()
    s2 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    with pytest.raises(ConfigError, match="effects chain"):
        s2.load_state(s1.state)


def test_streaming_state_file_roundtrip(tmp_path, two_tracks):
    voice, bgm = two_tracks
    chain = (EffectConfig("limiter", {"threshold_db": -6.0}),)
    cfg = _config(effects=chain)
    src = {"voice": (voice, 44100), "bgm": (bgm, SR)}
    s1 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    for _ in range(5):
        s1.read()
    p = str(tmp_path / "sess.npz")
    s1.save_state(p)
    nxt = s1.read()
    s2 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    s2.load_state_file(p)
    np.testing.assert_array_equal(s2.read(), nxt)


def test_read_many_equals_sequential_reads(two_tracks):
    voice, bgm = two_tracks
    cfg = _config(effects=(EffectConfig("limiter", {"threshold_db": -6.0}),))
    src = {"voice": (voice, 44100), "bgm": (bgm, SR)}
    s1 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    seq = np.concatenate([s1.read() for _ in range(12)], axis=0)
    s2 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    f0 = s2.read()  # engage the prefetch path — and CHECK its output
    # (the old splice compared seq[:320] against itself, so a bug
    # confined to the first returned frame was invisible — review find)
    first = s2.read_many(5)
    rest = s2.read_many(6)
    got = np.concatenate([f0, first, rest], axis=0)  # frame 0 + 11
    np.testing.assert_allclose(got, seq, atol=1e-7)
    assert s2.frame_idx == 12


def test_streaming_side_duck_equals_offline(two_tracks):
    """BGM ducking in the streaming session == offline mixer ducking
    (envelope state carried across frames)."""
    voice, bgm = two_tracks
    dk = {"depth_db": 12.0, "threshold_db": -40.0, "attack_ms": 5.0,
          "release_ms": 50.0}
    cfg = PipelineConfig(
        tracks=(
            TrackConfig(url="voice", volume=0.9),
            TrackConfig(url="bgm", kind="bgm", volume=0.4, loop=True,
                        side_duck=True),
        ),
        sample_rate=SR, normalize=None,
    )
    sess = StreamSession(cfg, frame_ms=20.0,
                         sources={"voice": (voice, 44100), "bgm": (bgm, SR)},
                         output_dtype=np.float32, duck_params=dk)
    n_frames = 100
    got = _read_frames(sess, n_frames)[:, 0]
    ref = mixg.mix(
        [
            mixg.MixTrack(pcm=voice, sr=44100, gain=0.9),
            mixg.MixTrack(pcm=bgm, sr=SR, gain=0.4, loop=True,
                          kind="bgm", side_duck=True),
        ],
        SR, normalize=None, duration_ms=n_frames * 20.0, duck_params=dk,
    )
    ref = np.asarray(ref[: len(got)], np.float64)
    db = rms_db(got.astype(np.float64) - ref, ref)
    assert db <= -80.0, db


def test_seek_invalidates_prefetch(two_tracks):
    """Regression: seek() must drop the prefetched frame (stale state)."""
    voice, bgm = two_tracks
    cfg = _config(effects=(EffectConfig("limiter", {"threshold_db": -6.0}),))
    src = {"voice": (voice, 44100), "bgm": (bgm, SR)}
    s1 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    s1.read()  # consume frame 0, prefetch frame 1 with post-frame-0 state
    s1.seek(20.0)  # frame 1 — state must RESET
    got = s1.read()
    s2 = StreamSession(cfg, frame_ms=20.0, sources=src,
                       output_dtype=np.float32)
    s2.seek(20.0)
    np.testing.assert_array_equal(got, s2.read())


def test_voice_effects_apply_pre_mix(two_tracks):
    """config.effects run on the voice bus BEFORE bgm joins the mix."""
    voice, bgm = two_tracks
    cfg = PipelineConfig(
        tracks=(
            TrackConfig(url="voice", volume=1.0),
            TrackConfig(url="bgm", kind="bgm", volume=0.5, loop=True),
        ),
        effects=(EffectConfig("volume", {"gain_db": -100.0}),),  # kill voice
        sample_rate=SR, normalize=None,
    )
    sess = StreamSession(cfg, frame_ms=20.0,
                         sources={"voice": (voice, 44100), "bgm": (bgm, SR)},
                         output_dtype=np.float32)
    got = _read_frames(sess, 25)[:, 0]
    # voice muted pre-mix: output is just the bgm at 0.5 gain
    ref = 0.5 * bgm[: len(got)].astype(np.float64)
    db = rms_db(got.astype(np.float64) - ref, ref)
    assert db <= -80.0, db


def test_streaming_voice_effects_parity_native_rate(two_tracks):
    """The §4.2 invariant for ``config.effects`` with a 44.1k-NATIVE
    voice track and a real EQ+reverb+limiter chain: both modes apply the
    chain to the summed voice bus at the bus rate post-placement, so
    they must agree (round-1 weak #3 — previously only a rate-invariant
    volume effect was tested here)."""
    voice, bgm = two_tracks
    chain = (
        EffectConfig("equalizer", {"bands": [
            {"freq_hz": 120.0, "gain_db": 3.0, "q": 1.0},
            {"freq_hz": 2500.0, "gain_db": -2.0, "q": 1.0},
        ]}),
        EffectConfig("reverb", {"ir_seconds": 0.2, "wet": 0.25, "dry": 0.75}),
        EffectConfig("limiter", {"threshold_db": -6.0}),
    )
    cfg = PipelineConfig(
        tracks=(
            TrackConfig(url="voice", volume=0.9, fade_in_ms=50.0,
                        fade_out_ms=100.0),
            TrackConfig(url="bgm", kind="bgm", volume=0.4, loop=True),
        ),
        effects=chain, sample_rate=SR, normalize=None,
    )
    sess = StreamSession(cfg, frame_ms=20.0,
                         sources={"voice": (voice, 44100), "bgm": (bgm, SR)},
                         output_dtype=np.float32)
    n_frames = 100
    got = _read_frames(sess, n_frames)[:, 0]
    ref = mixg.mix(
        [
            mixg.MixTrack(pcm=voice, sr=44100, gain=0.9,
                          fade_in_ms=50.0, fade_out_ms=100.0),
            mixg.MixTrack(pcm=bgm, sr=SR, gain=0.4, loop=True, kind="bgm"),
        ],
        SR, normalize=None, duration_ms=n_frames * 20.0,
        voice_effects=list(chain),
    )
    ref = np.asarray(ref[: len(got)], np.float64)
    db = rms_db(got.astype(np.float64) - ref, ref)
    assert db <= -80.0, db


def test_loop_with_end_trim_matches_offline():
    """A looped track with end_time_ms loops the end-TRIMMED clip in
    both modes (round-2 review find: streaming used to wrap the full
    untrimmed source)."""
    from xmtpu.graph.pipeline import process

    rng = np.random.default_rng(3)
    src = (rng.standard_normal(16000) * 0.2).astype(np.float32)  # 1 s
    cfg = PipelineConfig(
        sample_rate=16000,
        normalize=None,  # normalization is offline-only (doc'd pin)
        tracks=[
            TrackConfig(url="v", kind="voice", start_time_ms=0.0),
            TrackConfig(url="b", kind="bgm", loop=True,
                        start_time_ms=0.0, end_time_ms=250.0),
        ],
    )
    voice = (rng.standard_normal(16000) * 0.2).astype(np.float32)
    srcs = {"v": (voice, 16000), "b": (src, 16000)}
    offline = process(srcs, cfg).astype(np.float64) / 32768.0
    s = StreamSession(cfg, frame_ms=20, sources=srcs)
    frames = [s.read() for _ in range(len(offline) // s.frame_out)]
    stream = np.concatenate([f.reshape(-1) for f in frames]).astype(
        np.float64)[: len(offline)] / 32768.0
    err = rms_db(stream - offline[: len(stream)], offline[: len(stream)])
    assert err < -80, err


def test_prefetch_depth_matches_depth1(rng):
    """Depth-k dispatch-ahead (frames computed + host-copied ahead of
    the read cadence) must be byte-identical to the depth-1 default,
    including across a mid-stream seek that discards the speculative
    frames."""
    cfg = PipelineConfig(
        tracks=(TrackConfig(url="v", fade_in_ms=40.0),),
        effects=(EffectConfig("limiter", {}),),
        sample_rate=SR, normalize=None)
    src = {"v": ((0.3 * rng.standard_normal(SR)).astype(np.float32), SR)}
    s1 = StreamSession(cfg, frame_ms=20.0, sources=src)
    s4 = StreamSession(cfg, frame_ms=20.0, sources=src, prefetch_depth=4)
    for _ in range(7):
        np.testing.assert_array_equal(s4.read(), s1.read())
    s1.seek(310.0)
    s4.seek(310.0)
    for _ in range(3):
        np.testing.assert_array_equal(s4.read(), s1.read())
    # read() -> read_many -> read() transitions stay aligned
    np.testing.assert_array_equal(s4.read_many(3), s1.read_many(3))
    np.testing.assert_array_equal(s4.read(), s1.read())
    from xmtpu.utils.errors import ConfigError

    with pytest.raises(ConfigError, match="prefetch_depth"):
        StreamSession(cfg, frame_ms=20.0, sources=src, prefetch_depth=0)
