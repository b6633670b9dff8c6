"""Pooled serving mode: K concurrent streaming sessions, ONE device step.

Reference analogue: the upstream library's deployment shape is MANY
independent ``xm_audio_utils`` handles in one process (SURVEY.md
§1.1 L4 "interactive handle API", §3.2) — each handle a single-stream
frame loop on its own core. On TPU, K separate per-session dispatches
leave 127/128 VPU lanes idle and pay K host round trips per frame
group; :class:`SessionPool` stacks K same-config sessions' input
windows and DSP state pytrees and runs ONE jitted (vmapped) step, so
sessions fill the lane dimension exactly like the batch pipeline fills
it with clips (round-2 VERDICT directive #2).

Design:

* All slots share one ``PipelineConfig`` (same tracks/effects/rates) —
  the serving pattern is one DSP graph, many users. Per-slot variation
  is the SOURCE AUDIO (and its length), the frame clock, and the DSP
  state; source length rides through the step as a traced scalar
  (``_session_step_fn(n_out_traced=True)``), so one executable serves
  every slot.
* ``join``/``leave``/``seek`` are per-slot and never retrace: an empty
  slot contributes zero windows (exact silence through the chain) and
  its state slice is re-initialized on join via an ``at[i].set``
  scatter — static shapes throughout.
* ``read(k)`` gathers k frames of windows for every slot on the host,
  runs a ``lax.scan`` over frames of the vmapped step (one dispatch,
  one device->host fetch for the whole K x k group — the high-RTT-link
  rule from BASELINE.md), and returns (K, k*frame, ch) PCM.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from xmtpu.config.schema import PipelineConfig, config_from_dict
from xmtpu.graph import fx as _fx
from xmtpu.graph.streaming import _session_step_fn, _TrackStream
from xmtpu.ops import convert as _convert
from xmtpu.utils.errors import ConfigError


class SessionPool:
    """K concurrent streaming sessions batched into one device program.

    ``config``: the shared pipeline config (dict or PipelineConfig).
    ``n_slots``: pool capacity K. ``sources``: optional list of per-slot
    source dicts (name -> pcm | (pcm, sr), as :class:`StreamSession`);
    missing/None entries start empty. Attach a user with
    :meth:`join`, detach with :meth:`leave`, reposition with
    :meth:`seek`; :meth:`read` advances every active slot.
    """

    def __init__(self, config, n_slots: int, frame_ms: float = 20.0,
                 sources=None, output_dtype=np.int16,
                 duck_params: dict | None = None):
        if isinstance(config, dict):
            config = config_from_dict(config)
        if not isinstance(config, PipelineConfig):
            raise ConfigError("config must be PipelineConfig or dict")
        if n_slots < 1:
            raise ConfigError("n_slots must be >= 1")
        self.config = config
        self.n_slots = int(n_slots)
        self.sr = config.sample_rate
        self.output_dtype = output_dtype
        self.frame_ms = float(frame_ms)

        sources = list(sources or [])
        if len(sources) > self.n_slots:
            raise ConfigError(
                f"{len(sources)} source sets for {self.n_slots} slots")
        if not sources or sources[0] is None:
            raise ConfigError(
                "SessionPool needs sources for slot 0 at construction: "
                "track native rates fix the pool's frame geometry")

        # --- shared geometry from slot 0 (validated on every join) ---
        self._slot_tracks: list = [None] * self.n_slots
        self._frame_idx = np.zeros(self.n_slots, np.int64)
        geom = self._build_tracks(sources[0])
        base_frame = max(1, int(round(self.frame_ms * self.sr / 1000.0)))
        lcm = 1
        for ts in geom:
            lcm = lcm * ts.L // math.gcd(lcm, ts.L)
        self.frame_out = -(-base_frame // lcm) * lcm
        # rebuild with the final frame size (frame_out must be a multiple
        # of every track's polyphase L — StreamSession geometry)
        geom = self._build_tracks(sources[0])
        self._geom = geom
        self.nch = max((ts.nch for ts in geom), default=config.channels)

        # scan backend: oracle-grade f64 state carry on short frames,
        # identical math to StreamSession (pool == K sessions, tested)
        self.voice_effects = _fx.build_chain(self.sr, list(config.effects),
                                             default_backend="scan")
        self.master_effects = _fx.build_chain(
            self.sr, list(config.master_effects), default_backend="scan")
        for e in self.voice_effects + self.master_effects:
            if hasattr(e, "set_streaming"):
                e.set_streaming(self.frame_out)

        self.has_duck = any(ts.cfg.side_duck for ts in geom)
        self.duck_params = dict(duck_params or {})
        self._state0 = self._init_state_single()
        K = self.n_slots
        self.states = jax.tree.map(
            lambda s: jnp.broadcast_to(s[None], (K,) + s.shape), self._state0)

        step1 = _session_step_fn(
            geom, self.voice_effects, self.master_effects, self.nch,
            self.frame_out, self.has_duck, self.duck_params, self.sr,
            n_out_traced=True,
        )
        self._scan_steps: dict[int, object] = {}
        self._vstep = jax.vmap(step1)  # leading axis = slot
        self._pending = None  # speculative next group (read prefetch)

        for i, src in enumerate(sources):
            if src is not None:
                self.join(i, src)

    # -- slot lifecycle --------------------------------------------------

    def _build_tracks(self, src) -> list:
        from xmtpu.graph.pipeline import resolve_source

        frame_out = getattr(self, "frame_out", None)
        tracks = []
        for i, t in enumerate(self.config.tracks):
            pcm, sr_nat = resolve_source(t, src, self.sr, i)
            if frame_out is None:
                # pre-geometry pass: any L-multiple works for probing
                g = math.gcd(int(sr_nat), self.sr)
                frame_probe = self.sr // g
                tracks.append(_TrackStream(t, pcm, int(sr_nat), self.sr,
                                           frame_probe))
            else:
                tracks.append(_TrackStream(t, pcm, int(sr_nat), self.sr,
                                           frame_out))
        return tracks

    def join(self, slot: int, sources) -> None:
        """Attach a user's sources to ``slot`` (state + clock reset).

        The slot's track native rates and channel counts must match the
        pool geometry (one executable serves all slots)."""
        self._check_slot(slot)
        tracks = self._build_tracks(sources)
        for j, (ts, gs) in enumerate(zip(tracks, self._geom)):
            if (ts.L, ts.M) != (gs.L, gs.M):
                raise ConfigError(
                    f"slot {slot} track {j}: native rate gives polyphase "
                    f"L/M {ts.L}/{ts.M}, pool geometry is {gs.L}/{gs.M}")
            if ts.nch != gs.nch:
                raise ConfigError(
                    f"slot {slot} track {j}: {ts.nch} channels, pool "
                    f"geometry has {gs.nch}")
        self._slot_tracks[slot] = tracks
        self._frame_idx[slot] = 0
        self._pending = None  # stale windows/state
        self._reset_state(slot)

    def leave(self, slot: int) -> None:
        """Detach ``slot``: its lanes output exact silence until the
        next :meth:`join` (zero windows + state reset — a departed
        user's filter tails must not ring into the freed slot; no
        retrace)."""
        self._check_slot(slot)
        self._slot_tracks[slot] = None
        self._pending = None
        self._reset_state(slot)

    def seek(self, slot: int, ms: float) -> None:
        """Frame-aligned reposition of one slot + state reset (the
        reference's per-handle seek semantics)."""
        self._check_slot(slot)
        sample = int(round(ms * self.sr / 1000.0))
        self._frame_idx[slot] = sample // self.frame_out
        self._pending = None
        self._reset_state(slot)

    def active(self) -> list[int]:
        return [i for i, t in enumerate(self._slot_tracks) if t is not None]

    def _check_slot(self, slot: int) -> None:
        if not (0 <= slot < self.n_slots):
            raise ConfigError(f"slot {slot} out of range [0, {self.n_slots})")

    def _init_state_single(self):
        vfx = _fx.chain_init_state(self.voice_effects, self.nch)
        mfx = _fx.chain_init_state(self.master_effects, self.nch)
        if not self.has_duck:
            return (vfx, mfx, ())
        z = jnp.zeros((self.nch,), jnp.float64)
        return (vfx, mfx, (z, z))

    def _reset_state(self, slot: int) -> None:
        self.states = jax.tree.map(
            lambda S, s0: S.at[slot].set(s0), self.states, self._state0)

    # -- reading ----------------------------------------------------------

    def _gather(self, k: int, frame_idx):
        """Host-side window stacks for k frames of every slot ->
        (wstacks, ostacks, nstacks): per track, (k, K, ch, w) windows,
        (k, K) offsets, (K,) track lengths. One vectorized
        strided-union gather per (slot, track) — the per-frame Python
        loop was the serving bottleneck (round 3)."""
        K = self.n_slots
        ws_t, os_t, ns_t = [], [], []
        for j, gs in enumerate(self._geom):
            w_shape = gs.window_always(0)[0].shape
            wk = np.zeros((k, K) + w_shape, np.float32)
            ok = np.zeros((k, K), np.float64)
            nk = np.zeros((K,), np.float64)
            for i in range(K):
                tr = self._slot_tracks[i]
                if tr is None:
                    continue  # zero windows, zero n_out -> exact silence
                ts = tr[j]
                nk[i] = float(ts.n_out)
                w, t0s = ts.windows_block(int(frame_idx[i]), k)
                wk[:, i] = w
                ok[:, i] = t0s
            ws_t.append(jnp.asarray(wk))
            os_t.append(jnp.asarray(ok))
            ns_t.append(jnp.asarray(nk))
        return tuple(ws_t), tuple(os_t), tuple(ns_t)

    def _make_scan(self, k: int):
        vstep = self._vstep
        K, nch, frame_out = self.n_slots, self.nch, self.frame_out

        def scan_fn(wstacks, ostacks, nstacks, state):
            def body(st, xs):
                ws, os_ = xs
                out, st = vstep(ws, os_, st, nstacks)
                return st, out

            state, outs = jax.lax.scan(body, state, (wstacks, ostacks))
            # outs (k, K, ch, frame) -> (K, ch, k*frame)
            out = jnp.transpose(outs, (1, 2, 0, 3)).reshape(
                K, nch, k * frame_out)
            return out, state

        return jax.jit(scan_fn)

    def _dispatch(self, k: int):
        """Enqueue one K x k group for the current clocks (non-blocking:
        JAX async dispatch) -> (k, clock snapshot, out_dev, new_states)."""
        fn = self._scan_steps.get(k)
        if fn is None:
            fn = self._scan_steps[k] = self._make_scan(k)
            if len(self._scan_steps) > 8:
                self._scan_steps.pop(next(iter(self._scan_steps)))
        ws, os_, ns = self._gather(k, self._frame_idx)
        out_dev, states = fn(ws, os_, ns, self.states)
        return (k, self._frame_idx.copy(), out_dev, states)

    def read(self, k: int = 1) -> np.ndarray:
        """Advance every active slot by k frames -> (K, k*frame, ch) PCM
        (empty slots return silence). ONE device dispatch and ONE host
        fetch for the whole K x k group; the NEXT group is dispatched
        speculatively before this group's fetch, so on a high-RTT host
        link the device computes group g+1 while group g transfers
        (the StreamSession depth-1 prefetch, pooled). Any join/leave/
        seek drops the speculative group (stale windows/state)."""
        if k < 1:
            raise ConfigError("read(k) needs k >= 1")
        pend = self._pending
        if (pend is None or pend[0] != k
                or not np.array_equal(pend[1], self._frame_idx)):
            pend = self._dispatch(k)
        self._pending = None
        _, _, out_dev, self.states = pend
        for i in range(self.n_slots):
            if self._slot_tracks[i] is not None:
                self._frame_idx[i] += k
        self._pending = self._dispatch(k)  # overlap: next group computes
        out = np.moveaxis(np.asarray(out_dev), 1, 2)  # fetch blocks here
        if self.output_dtype == np.int16:
            out = _convert.f32_to_pcm16_np(out)
        return out
