"""One-shot file -> file pipeline (generator parity).

Reference analogue: ``xm_audio_generator_start/get_progress/stop``
(``src/xm_audio_generator.c`` [upstream, SURVEY.md §2.1/§3.1]) — voice
PCM + JSON config -> mixed encoded file with progress callback. The
reference runs a per-frame pthread loop; here the whole clip is one
fused device computation (decode and encode stay host-side,
``BASELINE.json:5``), so "progress" has coarse stage granularity rather
than frame granularity.
"""

from __future__ import annotations

import numpy as np

from xmtpu.config.schema import PipelineConfig
from xmtpu.graph import mixer as _mixer
from xmtpu.io import open_audio
from xmtpu.ops import convert as _convert
from xmtpu.utils.errors import ConfigError


def resolve_source(track, sources, default_sr: int, index: int = 0):
    """One track's (pcm, native_sr): in-memory ``sources`` dict entry
    (pcm or (pcm, sr)) by url, else decode the url from disk. SHARED by
    the offline pipeline and the streaming session so the two modes can
    never drift (round-2 review find: two copies had already diverged
    on the end_time_ms trim)."""
    if sources and track.url in sources:
        src = sources[track.url]
        return src if isinstance(src, tuple) else (src, default_sr)
    if track.url:
        with open_audio(track.url) as d:
            return d.read_all(), d.sample_rate
    raise ConfigError(f"track {index}: no url and no in-memory input")


def _resolve_tracks(inputs, config: PipelineConfig):
    """Build MixTracks from config.tracks, decoding urls from disk.

    ``inputs``: optional dict name->pcm/(pcm, sr) overriding track urls
    (the reference passes voice PCM in-memory and bgm/music by url).
    """
    tracks = []
    for i, t in enumerate(config.tracks):
        pcm, sr = resolve_source(t, inputs, config.sample_rate, i)
        # endTimeMs is a point on the OUTPUT timeline (schema.py), so the
        # playable content is end - start ms (matches the streaming path)
        end = t.end_time_ms
        if end is not None:
            keep_ms = max(0.0, end - t.start_time_ms)
            if keep_ms < pcm.shape[0] * 1000.0 / sr:
                pcm = pcm[: int(round(keep_ms * sr / 1000.0))]
        tracks.append(
            _mixer.MixTrack(
                pcm=pcm,
                sr=sr,
                gain=t.volume,
                start_ms=t.start_time_ms,
                fade_in_ms=t.fade_in_ms,
                fade_out_ms=t.fade_out_ms,
                loop=t.loop,
                kind=t.kind,
                side_duck=t.side_duck,
            )
        )
    return tracks


def process(inputs, config: PipelineConfig, progress=None) -> np.ndarray:
    """Run the configured pipeline, returning int16 PCM at config rate."""

    def report(p):
        if progress:
            progress(p)

    report(0.0)
    tracks = _resolve_tracks(inputs, config)
    report(10.0)

    # voice-bus effects: applied to the summed voice bus AT THE BUS RATE
    # inside the mixer, after placement/gain/fades — the same placement
    # the streaming session uses, so streaming == offline holds for any
    # effects chain and any track native rate (SURVEY.md §4.2).
    mixed = _mixer.mix(
        tracks,
        config.sample_rate,
        normalize=config.normalize,
        target_db=config.normalize_target_db,
        voice_effects=list(config.effects) if config.effects else None,
    )
    report(80.0)

    if config.master_effects:
        from xmtpu.graph import fx as _fx

        # long clips run through the N3 block scheduler (constant
        # memory); apply_chain itself takes the unblocked path when
        # block_size >= n
        try:
            mixed = _fx.apply_chain(mixed, config.sample_rate,
                                    list(config.master_effects),
                                    block_size=config.block_size)
        except ConfigError as e:
            # whole-clip fallback ONLY for the blocked scheduler's
            # offline-only-NS rejection — a genuinely invalid chain
            # used to be rebuilt unblocked just to raise the same
            # error again (review find)
            if "offline-only" not in str(e):
                raise
            mixed = _fx.apply_chain(mixed, config.sample_rate,
                                    list(config.master_effects))
    if mixed.dtype != np.int16:
        import jax.numpy as jnp

        mixed = np.asarray(_convert.f32_to_pcm16(jnp.asarray(mixed)))
    report(95.0)
    return mixed


def process_file(inputs, config: PipelineConfig, out_path, progress=None):
    """Full generator: decode -> pipeline -> encoded file. The output
    format follows the extension via the io.encode_audio registry
    (AAC/MP3/... when the FFmpeg shim is active; WAV always) — the
    reference's generator writes M4A, so compressed extensions must
    not silently receive RIFF bytes (round-2 review find)."""
    from xmtpu.io import encode_audio

    pcm = process(inputs, config, progress=progress)
    encode_audio(out_path, pcm, config.sample_rate,
                 bitrate=config.bitrate)
    if progress:
        progress(100.0)
    return out_path
