"""Effect-chain stage: ordered effects over a PCM stream.

Reference analogue: the voice-effects chain (``xm_audio_effects.c``
[upstream, SURVEY.md §2.1] — ordered NS -> EQ -> reverb -> volume ->
limiter over a voice stream). All of those are implemented here (plus a
finite-ratio compressor); the headline chain per ``BASELINE.json:9`` is
EQ -> reverb -> limiter.

Each effect is a small object with ``init_state`` / ``apply`` so the
same code serves the offline whole-clip path and the streaming
block-carry path (M6): state is a pytree, apply is pure and jittable.
The chain compiles once per (chain-config, input-shape) and is cached.
"""

from __future__ import annotations

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmtpu.ops import biquad as _biquad
from xmtpu.ops import limiter as _limiter
from xmtpu.ops import reverb as _reverb
from xmtpu.utils.errors import ConfigError


class EqualizerFx:
    """Cascaded RBJ biquad EQ. params: bands=[{freq_hz, gain_db, q, kind}]."""

    def __init__(self, sample_rate: int, bands=None):
        if not bands:
            raise ConfigError("equalizer: 'bands' is required and non-empty")
        self.sos = _biquad.eq_sos(list(bands), sample_rate)

    def init_state(self, nch: int):
        return jnp.zeros((self.sos.shape[0], nch, 2), jnp.float64)

    def apply(self, x, state):
        return _biquad.sosfilt_scan(self.sos, x, zi=state)


class ReverbFx:
    """FIR reverb. params: ir (array) | ir_wav (path) | ir_seconds, wet, dry."""

    def __init__(self, sample_rate: int, params):
        p = dict(params)
        self.wet = float(p.get("wet", 0.3))
        self.dry = float(p.get("dry", 0.7))
        if "ir" in p:
            ir = np.asarray(p["ir"], np.float64)
        elif "ir_wav" in p:
            from xmtpu.io.wav import read_wav
            from xmtpu.ops import convert as _c

            pcm, ir_sr = read_wav(p["ir_wav"])
            if pcm.ndim > 1:
                pcm = pcm[:, 0]
            ir = _c.pcm16_to_f32_np(pcm).astype(np.float64)
            if ir_sr != sample_rate:
                from xmtpu.ops.resample import resample_oracle_np

                ir = resample_oracle_np(ir, ir_sr, sample_rate)
        else:
            ir = _reverb.synthetic_ir(
                float(p.get("ir_seconds", 0.5)), sample_rate,
                rt60=p.get("rt60"), seed=int(p.get("seed", 7)),
            )
        self.ir = ir.astype(np.float32)

    def init_state(self, nch: int):
        return _reverb.reverb_tail_init((nch,), len(self.ir))

    def apply(self, x, state):
        ir = jnp.asarray(self.ir, x.dtype)
        return _reverb.reverb_block(x, ir, state, wet=self.wet, dry=self.dry)


class LimiterFx:
    """Soft-knee limiter. params: threshold_db, knee_db, attack_ms,
    release_ms, ceiling_db."""

    def __init__(self, sample_rate: int, params):
        p = dict(params)
        self.sr = sample_rate
        self.kw = dict(
            threshold_db=float(p.get("threshold_db", -3.0)),
            knee_db=float(p.get("knee_db", 6.0)),
            attack_ms=float(p.get("attack_ms", 1.0)),
            release_ms=float(p.get("release_ms", 100.0)),
            ceiling_db=float(p.get("ceiling_db", 0.0)),
        )

    def init_state(self, nch: int):
        return (jnp.zeros((), jnp.float64), jnp.zeros((), jnp.float64))

    def apply(self, x, state):
        return _limiter.limiter(x, self.sr, state=state, **self.kw)


class CompressorFx(LimiterFx):
    """SoX-compand-style downward compressor (finite ratio + makeup).

    params: threshold_db, ratio, knee_db, attack_ms, release_ms,
    makeup_db, ceiling_db. Shares the limiter's envelope machinery
    (reference: the compand-style limiter/compressor, SURVEY.md §2.1).
    """

    def __init__(self, sample_rate: int, params):
        p = dict(params)
        super().__init__(sample_rate, p)
        self.kw["ratio"] = float(p.get("ratio", 4.0))
        self.kw["makeup_db"] = float(p.get("makeup_db", 0.0))


class NoiseSuppressFx:
    """STFT Wiener noise suppression.

    params: nfft, noise_frames, smooth, floor. Offline chains process
    the whole clip in one transform stack; under a streaming session
    (:meth:`set_streaming`) it switches to the causal frame-carry twin
    (``ops.ns.stream_suppress``: nfft adapts to the session frame so
    the hop divides every block; output delayed by nfft/2 samples,
    lead-in frames pass at unity while the noise estimate builds —
    matches the offline gains exactly after the lead-in, tested).
    """

    def __init__(self, sample_rate: int, params):
        p = dict(params)
        self.kw = dict(
            nfft=int(p.get("nfft", 512)),
            noise_frames=int(p.get("noise_frames", 8)),
            smooth=float(p.get("smooth", 0.7)),
            floor=float(p.get("floor", 0.1)),
        )
        self._stream_nfft = None

    def set_streaming(self, frame_len: int) -> None:
        if frame_len % 2:
            raise ConfigError(
                f"streaming noise_suppression needs an even frame, got {frame_len}"
            )
        self._stream_nfft = int(frame_len)

    def init_state(self, nch: int):
        if self._stream_nfft is None:
            return ()
        from xmtpu.ops import ns as _ns

        return _ns.stream_init(nch, nfft=self._stream_nfft,
                               noise_frames=self.kw["noise_frames"])

    def apply(self, x, state):
        from xmtpu.ops import ns as _ns

        if self._stream_nfft is None:
            return _ns.suppress(x, **self.kw), state
        kw = dict(self.kw)
        kw["nfft"] = self._stream_nfft
        return _ns.stream_suppress(x, state, **kw)


class VolumeFx:
    """Static gain. params: gain_db | gain (linear)."""

    def __init__(self, sample_rate: int, params):
        p = dict(params)
        if "gain" in p:
            self.gain = float(p["gain"])
        else:
            self.gain = float(10.0 ** (float(p.get("gain_db", 0.0)) / 20.0))

    def init_state(self, nch: int):
        return ()

    def apply(self, x, state):
        return x * jnp.asarray(self.gain, x.dtype), state


_EFFECTS = {
    "equalizer": lambda sr, p: EqualizerFx(sr, p.get("bands", [])),
    "eq": lambda sr, p: EqualizerFx(sr, p.get("bands", [])),
    "reverb": ReverbFx,
    "limiter": LimiterFx,
    "compressor": CompressorFx,
    "volume": VolumeFx,
    "noise_suppression": NoiseSuppressFx,
    "ns": NoiseSuppressFx,
}


def build_chain(sample_rate: int, chain):
    """Resolve a list of EffectConfig/dicts into effect objects."""
    out = []
    for e in chain:
        if hasattr(e, "name"):
            name, params = e.name, dict(e.params)
        else:
            d = dict(e)
            if "name" not in d:
                raise ConfigError(f"effect entry missing 'name': {e!r}")
            name = d.pop("name")
            params = d.pop("params", d)
        if name not in _EFFECTS:
            raise ConfigError(
                f"unknown effect {name!r}; known: {sorted(_EFFECTS)}"
            )
        out.append(_EFFECTS[name](sample_rate, params))
    return out


def chain_init_state(effects, nch: int):
    return tuple(fx.init_state(nch) for fx in effects)


def chain_apply(effects, x, states):
    """Run the chain over one block (ch, n). Pure; jittable with the
    effects list closed over (all effect params are static constants)."""
    new_states = []
    for fx, st in zip(effects, states):
        x, st = fx.apply(x, st)
        new_states.append(st)
    return x, tuple(new_states)


# --- compiled-chain cache -------------------------------------------------

_cache: dict = {}


def _chain_key(sample_rate: int, chain) -> str:
    def canon(e):
        if hasattr(e, "name"):
            name, params = e.name, e.params
        else:
            d = dict(e)
            if "name" not in d:
                raise ConfigError(f"effect entry missing 'name': {e!r}")
            name = d.pop("name")
            params = d.pop("params", d)
        params = dict(params)
        if "ir_wav" in params:
            # key IR files by CONTENT signature, not path: a rewritten
            # file must not reuse the stale baked-in IR (round-2
            # review find)
            import os

            try:
                st = os.stat(str(params["ir_wav"]))
                params["ir_wav"] = (str(params["ir_wav"]), st.st_size,
                                    st.st_mtime_ns)
            except OSError:
                params["ir_wav"] = str(params["ir_wav"])
        return {"name": name, "params": params}

    return json.dumps(
        {"sr": sample_rate, "chain": [canon(e) for e in chain]},
        sort_keys=True, default=_json_default,
    )


def _json_default(v):
    """json.dumps ``default`` that canonicalizes arrays by CONTENT.

    np/jnp arrays hash by sha1 of their bytes (``default=str`` would
    collapse two different large arrays to the same truncated repr —
    a stale-executable cache bug, round-2 advisor find); np scalars
    unbox; anything else stringifies.
    """
    import hashlib

    if isinstance(v, (np.ndarray, jnp.ndarray)):
        a = np.asarray(v)
        return f"<array:{hashlib.sha1(a.tobytes()).hexdigest()}:{a.shape}:{a.dtype}>"
    if isinstance(v, np.generic):
        return v.item()
    try:  # Path-like / other stringifiable params build_chain accepts
        return str(v)
    except Exception:
        raise TypeError(f"unhashable effect param: {type(v)}")


def get_compiled_chain(sample_rate: int, chain):
    """-> (effects, jitted fn(x, states) -> (y, states)). Cached so repeat
    calls with the same chain config reuse the XLA executable."""
    key = _chain_key(sample_rate, chain)
    hit = _cache.get(key)
    if hit is None:
        effects = build_chain(sample_rate, chain)
        fn = jax.jit(partial(chain_apply, effects))
        hit = (effects, fn)
        _cache[key] = hit
        if len(_cache) > 64:  # bound the executable cache
            _cache.pop(next(iter(_cache)))
    return hit


def apply_chain(pcm, sample_rate: int, chain, block_size: int | None = None):
    """Public effects entry (BASELINE.json:9 config 3).

    ``pcm``: int16 or f32, (n,) or (n, ch); returns the same format.
    ``block_size``: process in fixed blocks with carried state (the N3
    block scheduler, SURVEY.md §1.2 — constant device memory for
    arbitrarily long clips; one compiled shape, last block zero-padded).
    Output is block-size invariant (SURVEY.md §4.2) because every effect
    carries exact state. Offline-only effects (noise suppression) reject
    blocked mode.
    """
    from xmtpu.api import _from_f32_device, _to_f32_device

    x, was_i16, was_1d = _to_f32_device(pcm)
    effects, fn = get_compiled_chain(sample_rate, chain)
    states = chain_init_state(effects, x.shape[0])
    n = x.shape[-1]
    if block_size is None or block_size >= n:
        y, _ = fn(x, states)
        return _from_f32_device(y, was_i16, was_1d)

    for e in effects:
        if isinstance(e, NoiseSuppressFx):
            raise ConfigError(
                "noise_suppression needs the whole clip (offline-only); "
                "run it unblocked or before the blocked chain"
            )
    outs = []
    for i in range(0, n, block_size):
        blk = jax.lax.slice_in_dim(x, i, min(i + block_size, n), axis=-1)
        pad = block_size - blk.shape[-1]
        if pad:  # keep ONE compiled shape; zero tail only feeds past-end state
            blk = jnp.pad(blk, [(0, 0)] * (blk.ndim - 1) + [(0, pad)])
        y, states = fn(blk, states)
        outs.append(y[..., : block_size - pad] if pad else y)
    return _from_f32_device(jnp.concatenate(outs, axis=-1), was_i16, was_1d)
