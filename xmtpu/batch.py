"""Batched offline pipeline (layer N6; BASELINE.json:10 config 4).

Reference analogue: processing many clips by invoking the C library once
per clip [upstream has no batch mode — SURVEY.md §2.2]. The TPU-native
replacement is a **batch axis**: a [B, n] clip tensor runs the whole
decode-side chain (resample -> mix -> EQ -> reverb -> limiter -> i16)
as ONE jitted computation; clips shard over chips via a ``("dp",)``
mesh (``jax.sharding.NamedSharding``), the data-parallel strategy of
SURVEY.md §2.2.

``flagship_step`` is the framework's headline computation: it is what
``bench.py`` times and what ``__graft_entry__`` compile-checks.
"""

from __future__ import annotations


import math as _math

import jax
import jax.numpy as jnp
import numpy as np

from xmtpu.ops import biquad as _biquad
from xmtpu.ops import convert as _convert
from xmtpu.ops import limiter as _limiter
from xmtpu.ops import mix as _mix
from xmtpu.ops import resample as _resample
from xmtpu.ops import reverb as _reverb

DEFAULT_BANDS = (
    {"freq_hz": 100.0, "gain_db": 4.0, "q": 1.0},
    {"freq_hz": 400.0, "gain_db": -3.0, "q": 1.2},
    {"freq_hz": 1000.0, "gain_db": 2.5, "q": 0.9},
    {"freq_hz": 4000.0, "gain_db": -2.0, "q": 1.1},
    {"freq_hz": 7000.0, "gain_db": 3.0, "q": 0.8},
)


def _interpret_auto() -> bool:
    """Pallas interpret mode off-TPU (CPU mesh dryrun, CI)."""
    return jax.devices()[0].platform == "cpu"


# Limiter detector time constants shared by the fused (eq_env kernel)
# and non-fused (ops.limiter) chain paths — one source of truth so the
# two paths stay the same filter (they are compared to -80 dB in tests).
LIM_RELEASE_MS = 100.0
LIM_ATTACK_MS = 1.0


def _reverb_block(m: int) -> tuple[int, int]:
    """(block, gp) for an m-tap IR: the power-of-two overlap-save block
    >= 4*(m-1) keeps the hop above block/2 (kernels/fftconv.py
    requirement) with alignment slack, floored at 32768 — the measured
    optimum for the headline 4000-tap IR. gp follows the round-3 chip
    sweep (same table as graph.fx._reverb_block_for): 16 at 32768, 4 at
    65536, 1 above — a fixed gp=16 at large blocks both misses the
    sweep optimum and presses the per-grid-step VMEM footprint
    (review find)."""
    b = 32768
    while b < 4 * max(1, m - 1):
        b *= 2
    if b > 131072:
        # every batch.py caller feeds backend="pallas"; past this bound
        # the fftconv kernel exceeds its VMEM plan and the failure used
        # to surface as an opaque Mosaic error at the first on-chip
        # step (graph/fx.py refuses/downgrades at the same bound —
        # review find). interpret mode has no VMEM and sailed through.
        from xmtpu.utils.errors import ConfigError

        raise ConfigError(
            f"combined IR of {m} taps needs overlap-save block {b} > "
            f"131072 (the fftconv kernel's VMEM plan); use a shorter "
            f"ir_seconds or the XLA reverb path (ops.reverb "
            f"backend='xla')")
    return b, _reverb.fftconv_gp(b)


def _combined_ir(sos, ir, wet: float, dry: float):
    """Host-precomputed combined impulse response of EQ -> reverb.

    LTI fold (round 3): the EQ cascade is LTI, so on the fused path it
    folds into the reverb convolution — ``dry*h_eq + wet*(h_eq (*) ir)``
    with ``h_eq`` truncated at a -120 dB l1 tail (``ops.biquad.
    sos_impulse_np``). The MXU DFT pipeline then does the EQ for free
    and the sequential kernel shrinks from the fused EQ+envelope pass
    (~20 dependent VPU ops/step) to the envelope alone (~4). Same math
    as ``graph.fx.FusedLTIFx``; parity gated in tests/test_batch.py.
    Returns None (caller keeps the eq_env path) if the cascade's
    response will not truncate."""
    h_eq = _biquad.sos_impulse_np(sos)
    if h_eq is None:
        return None
    c = wet * np.convolve(h_eq, np.asarray(ir, np.float64))
    c[: len(h_eq)] += dry * h_eq
    # re-trim (shared helper, see ops.reverb.trim_ir_tail): the
    # composition can decay sooner than len(h_eq)+len(ir)-1, and the
    # dead tail can push _reverb_block past a power-of-two boundary
    return _reverb.trim_ir_tail(c).astype(np.float32)


def flagship_oracle_np(voice_i16, bgm_i16, sr_in: int = 44100,
                       sr_bus: int = 16000, bands=DEFAULT_BANDS,
                       ir_seconds: float = 0.25, wet: float = 0.25,
                       dry: float = 0.75, bgm_gain: float = 0.4,
                       fade_ms: float = 250.0,
                       threshold_db: float = -3.0) -> np.ndarray:
    """Float64 HOST oracle of the full flagship chain — no jax, pure
    numpy/scipy composition of the per-op pinned oracles
    (``resample_oracle_np``/``sosfilt_np``/``reverb_np``/``limiter_np``).
    This is the accuracy reference bench.py reports ``accuracy_db``
    against (round-4 VERDICT item 4: the end-to-end margin must land in
    a driver artifact, not just in tests). Math mirrors
    :func:`make_flagship_step`: mixfirst is exact (the resampler is LTI
    and both tracks share the fade window), and the EQ<->reverb fold
    commutes exactly, so ONE oracle covers every production backend.
    Python-loop oracles are O(n) per clip — pass one clip, not a batch.
    """
    v = np.asarray(voice_i16)
    b = np.asarray(bgm_i16)
    x = (v.astype(np.float64) + bgm_gain * b.astype(np.float64)) / 32768.0
    m = _resample.resample_oracle_np(x, sr_in, sr_bus)
    nb = m.shape[-1]
    fade = int(round(fade_ms * sr_bus / 1000.0))
    out = m * _mix.fade_ramp_np(nb, fade, fade, nb)
    peak = np.max(np.abs(out), axis=-1, keepdims=True)
    scale = np.where(peak > 0, _mix.db_to_amp(-1.0) / np.maximum(peak, 1e-30),
                     1.0)
    out = out * scale
    sos = _biquad.eq_sos(list(bands), sr_bus)
    out, _ = _biquad.sosfilt_np(sos, out)
    ir = _reverb.synthetic_ir(ir_seconds, sr_bus).astype(np.float64)
    out = _reverb.reverb_np(out, ir, wet=wet, dry=dry)
    y, _ = _limiter.limiter_np(out[..., None, :], sr_bus,
                               threshold_db=threshold_db,
                               release_ms=LIM_RELEASE_MS,
                               attack_ms=LIM_ATTACK_MS)
    return _convert.f32_to_pcm16_np(y[..., 0, :].astype(np.float32))


def make_flagship_step(
    sr_in: int = 44100,
    sr_bus: int = 16000,
    bands=DEFAULT_BANDS,
    ir_seconds: float = 0.25,
    wet: float = 0.25,
    dry: float = 0.75,
    bgm_gain: float = 0.4,
    fade_ms: float = 250.0,
    threshold_db: float = -3.0,
    iir_backend: str = "pallas",
    resample_backend: str = "mixfirst",
    interpret: bool | None = None,
    fused: bool | None = None,
    lti_fold: bool = True,
    envelope_block: int | None = None,
    limiter_fuse: bool = True,
):
    """Build the full-chain step fn(voice_i16[B,n], bgm_i16[B,n]) -> i16[B,m].

    Chain per BASELINE.json:5: int16->f32, polyphase resample sr_in->
    sr_bus, voice+BGM mix with gain/fade, peak normalize, 5-band EQ,
    FIR reverb, soft-knee limiter, f32->int16 — all fused in one jit,
    never leaving HBM between stages.

    ``iir_backend``: "pallas" (sequential f32 kernels, batch-parallel —
    the production batch path) or "scan" (f64 associative scans, the
    oracle-grade twin; its unrolled HLO compiles very slowly at long n
    on the remote TPU compiler, so reserve it for short clips/tests).
    """
    sos = _biquad.eq_sos(list(bands), sr_bus)
    ir = _reverb.synthetic_ir(ir_seconds, sr_bus).astype("float32")
    if interpret is None:
        interpret = _interpret_auto()
    ir_comb = _combined_ir(sos, ir, wet, dry) if (
        lti_fold and iir_backend == "pallas") else None

    def eq(x):
        if iir_backend == "pallas":
            from xmtpu.kernels.iir import sosfilt_pallas

            y, _ = sosfilt_pallas(sos, x, interpret=interpret)
            return y
        y, _ = _biquad.sosfilt_scan(sos, x, state_dtype=jnp.float64)
        return y

    lim_backend = (
        ("pallas_interpret" if interpret else "pallas")
        if iir_backend == "pallas"
        else "scan"
    )

    def _rs(x, a, b):
        # measured: the Pallas resample wins standalone (68k vs 53k
        # audio-sec/s at 128x10s) but loses inside the fused chain where
        # XLA overlaps the einsum with neighboring stages (24.3k vs
        # 29.5k chain total) — so the chain default stays XLA and the
        # kernel is opt-in.
        if resample_backend == "pallas":
            from xmtpu.kernels.resample import resample_pallas

            return resample_pallas(x, a, b, interpret=interpret)
        return _resample.polyphase_resample(x, a, b)

    def step(voice_i16: jnp.ndarray, bgm_i16: jnp.ndarray) -> jnp.ndarray:
        from xmtpu.utils.profiling import stage

        fade = int(round(fade_ms * sr_bus / 1000.0))
        B_, n_in = voice_i16.shape
        deferred_ramp = None  # set by mixfirst; applied in-kernel or below
        use_rsmix = False
        if resample_backend == "rsmix":  # opt-in only: import lazily
            from xmtpu.kernels.rsmix import (resample_mix_pallas,
                                             resample_mix_supported)

            use_rsmix = resample_mix_supported(n_in, B_, sr_in, sr_bus)
        if use_rsmix:
            with stage("rsmix"):
                # fused i16 resample+gain/fade+mix kernel (kernels/
                # rsmix.py). STANDALONE it beats the XLA front
                # (9.3 vs 12.3 ms at batch 256) but IN-CHAIN the
                # XLA stages overlap with the next iteration's
                # VPU-bound kernels while an opaque pallas_call does
                # not (chain measured 96.4k vs 125.9k a-s/s) — so
                # this is an explicit OPT-IN backend, not the default.
                out = resample_mix_pallas(
                    voice_i16, bgm_i16, sr_in, sr_bus, bgm_gain=bgm_gain,
                    fade=fade, interpret=interpret)
                out = out * jnp.float32(1.0 / 32768.0)
        elif resample_backend in ("mixfirst", "mixfirst_pad"):
            with stage("mixfirst"):
                # mix BEFORE the rate conversion: both tracks share the
                # same fade window, so out = ramp (.) (v + g*b) with the
                # ramp applied at the bus rate — and the resampler is
                # LTI, so resample(voice) + g*resample(bgm) ==
                # resample(voice + g*bgm) exactly. Halves the resample's
                # rows (256 vs 512 at the headline shape) and drops the
                # i16 concat pass.
                gmix = jnp.float32(bgm_gain)
                if _resample.aligned_supported(n_in, sr_in, sr_bus):
                    # frame the i16 inputs FIRST (a true bitcast), so
                    # the convert+mix fusion writes the resample
                    # matmul's (.., nc, M) operand layout directly —
                    # the (B, n) -> (B, nc, M) reshape AFTER the mix
                    # materialized as a full 1.38 ms copy (layout
                    # assignment; see ops.resample._apply_aligned)
                    Mloc = sr_in // _math.gcd(sr_in, sr_bus)
                    v3 = voice_i16.reshape(B_, n_in // Mloc, Mloc)
                    b3 = bgm_i16.reshape(B_, n_in // Mloc, Mloc)
                    m3 = (_convert.pcm16_to_f32(v3)
                          + gmix * _convert.pcm16_to_f32(b3))
                    if resample_backend == "mixfirst_pad":
                        # lane-pad the frame minor dim to a multiple of
                        # 128 so the resample dot's operand is natively
                        # (8,128)-tileable — probing whether this skips
                        # the 1.38 ms operand-retile pass (pad fuses
                        # into the convert+mix loop; padded filter rows
                        # are zero so pad values are never observed)
                        Mp = -(-Mloc // 128) * 128
                        m3 = jnp.pad(
                            m3, [(0, 0)] * (m3.ndim - 1) + [(0, Mp - Mloc)])
                    # HIGH (3-pass bf16): -98 dB vs the f64 oracle —
                    # well inside the chain's -80 dB gate, ~9% faster
                    # than HIGHEST (3.54 vs 3.86 ms standalone, chip)
                    m = _resample.polyphase_resample_framed(
                        m3, sr_in, sr_bus,
                        precision=jax.lax.Precision.HIGH).reshape(B_, -1)
                else:
                    m = (_convert.pcm16_to_f32(voice_i16)
                         + gmix * _convert.pcm16_to_f32(bgm_i16))
                    m = _rs(m, sr_in, sr_bus)
                nb = m.shape[-1]
                # the fade ramp is DEFERRED on this path: the fold-path
                # reverb kernel applies it in-kernel on the tile load
                # (pre_col=), and the peak detector fuses |m|*ramp into
                # its reduce — the faded bus signal never hits HBM
                ramp = _mix.fade_ramp(nb, fade, fade, nb)
                out, deferred_ramp = m, ramp
        else:
            with stage("resample"):
                # concat the i16 inputs BEFORE the f32 convert: the
                # concat copy then moves half the bytes (i16), and XLA
                # folds the convert into the resample matmul's operand
                # read (measured 14.4 -> 10.6 ms at batch 256)
                vb = _convert.pcm16_to_f32(
                    jnp.concatenate([voice_i16, bgm_i16], axis=0))
                vb = _rs(vb, sr_in, sr_bus)
                v, b = jnp.split(vb, 2, axis=0)
            with stage("mix"):
                nb = v.shape[-1]
                v = _mix.apply_gain_fade(v, 1.0, fade, fade, length=nb)
                b = _mix.apply_gain_fade(b, bgm_gain, fade, fade, length=nb)
                out = v + b
        n = out.shape[-1]
        with stage("normalize"):
            # per-clip peak normalize (NOT global: clips are independent,
            # and dp-sharded must match single-chip bit-for-bit).
            # The gain is NOT applied here: the next stage is an opaque
            # Pallas call which XLA cannot fuse into, so a multiply now
            # costs a full HBM write+read; reverb is linear, so the
            # scale folds into its wet/dry epilogue (prescale=) on the
            # fused path and into the elementwise pre-EQ pass otherwise.
            det = jnp.abs(out)
            if deferred_ramp is not None:
                det = det * deferred_ramp  # == |ramp*out|: ramp >= 0
            peak = jnp.max(det, axis=-1, keepdims=True)
            scale = jnp.where(
                peak > 0, _mix.db_to_amp(-1.0) / jnp.maximum(peak, 1e-30), 1.0
            )
        # The fused EQ+envelope kernel has no small-batch time
        # segmentation, so use it only when the batch already fills the
        # 128 VPU lanes; smaller batches keep the segmented kernels.
        use_fused = fused if fused is not None else (
            iir_backend == "pallas" and int(np.prod(out.shape[:-1])) >= 128
        )
        # NOTE: the auto decision sees the PER-SHARD batch under
        # shard_map — pass ``fused`` explicitly when sharding a >=128
        # global batch into <128-row shards, or the sharded program
        # takes the non-fused path and only matches single-chip to the
        # -80 dB gate instead of using the same kernels.
        if use_fused:
            k_rel = _limiter._release_coeff(LIM_RELEASE_MS, sr_bus)
            c_att = _limiter._attack_coeff(LIM_ATTACK_MS, sr_bus)
            if ir_comb is not None:
                # LTI fold: EQ rides the reverb convolution (one
                # combined IR, see _combined_ir) — the sequential pass
                # is the envelope alone.
                from xmtpu.kernels.envelope import envelope_pallas

                with stage("eq+reverb"):
                    # trim=False: the hop-padded kernel output flows to
                    # padded-aware consumers (envelope n_valid=, sliced
                    # elementwise epilogues) — the standalone trim copy
                    # between two opaque kernels is saved
                    blk, gp = _reverb_block(ir_comb.shape[-1])
                    out = _reverb.reverb(
                        out, ir_comb, wet=1.0, dry=0.0, block=blk,
                        gp=gp, backend="pallas", interpret=interpret,
                        pre_row=scale[..., 0], pre_col=deferred_ramp,
                        trim=False)
                with stage("limiter"):
                    if limiter_fuse:
                        # curve + clamp applied in-kernel on the VMEM
                        # tile (kernels.envelope.limiter_pallas): the
                        # XLA gain pass's re-reads of out and e2 are
                        # saved at the cost of in-kernel exp/log.
                        # DEFAULT since 2026-08-19: with the pad-free
                        # fftconv in, the chain measured 274.0/274.4k
                        # vs 264.8-270.7k over four base runs (it was
                        # within spread pre-pad-free: 248.5 vs 246.1k).
                        from xmtpu.kernels.envelope import limiter_pallas

                        out, _ = limiter_pallas(
                            out, k_rel, c_att, threshold_db,
                            interpret=interpret, n_valid=n,
                            block=envelope_block)
                    else:
                        e2, _ = envelope_pallas(
                            jnp.abs(out), k_rel, c_att,
                            interpret=interpret, n_valid=n,
                            block=envelope_block)
                        out = _limiter.apply_gain_curve(
                            out[..., None, :n], e2, threshold_db)[..., 0, :]
                return _convert.f32_to_pcm16(out)
            if deferred_ramp is not None:
                out = out * deferred_ramp
            # EQ and reverb are both LTI over the full row, so they
            # commute exactly; evaluating reverb FIRST makes EQ adjacent
            # to the limiter, and kernels/eq_env.py runs the 5-section
            # cascade + limiter detector/envelope in ONE sequential pass
            # (two sequential kernels' loop+HBM cost -> one).
            from xmtpu.kernels.eq_env import eq_env_pallas

            with stage("reverb"):
                # VMEM-resident overlap-save DFT kernel (kernels/
                # fftconv.py): 7.1 ms vs 16-24 ms for the XLA einsum
                # four-step at batch 256 (HBM-bound on intermediates);
                # the normalize gain rides the wet/dry epilogue
                blk, gp = _reverb_block(ir.shape[-1])
                out = _reverb.reverb(out, ir, wet=wet, dry=dry,
                                     block=blk, gp=gp, backend="pallas",
                                     interpret=interpret, prescale=scale)
            with stage("eq+limiter"):
                y, e2, _, _ = eq_env_pallas(sos, out, k_rel, c_att,
                                            interpret=interpret)
                out = _limiter.apply_gain_curve(
                    y[..., None, :], e2, threshold_db)[..., 0, :]
            return _convert.f32_to_pcm16(out)
        if deferred_ramp is not None:
            out = out * deferred_ramp
        with stage("eq"):
            out = eq(out * scale)
        with stage("reverb"):
            out = _reverb.reverb(out, ir, wet=wet, dry=dry,
                                 block=_reverb_block(ir.shape[-1])[0],
                                 backend="pallas", interpret=interpret)
        with stage("limiter"):
            out, _ = _limiter.limiter(
                out[..., None, :], sr_bus, threshold_db=threshold_db,
                release_ms=LIM_RELEASE_MS, attack_ms=LIM_ATTACK_MS,
                backend=lim_backend,
            )
        return _convert.f32_to_pcm16(out[..., 0, :])

    return step


def make_batch_step(
    sr_in: int = 44100,
    sr_bus: int = 16000,
    bands=DEFAULT_BANDS,
    ir_seconds: float = 0.25,
    wet: float = 0.25,
    dry: float = 0.75,
    bgm_gain: float = 0.4,
    fade_ms: float = 250.0,
    threshold_db: float = -3.0,
    interpret: bool | None = None,
    fused: bool | None = None,
    lti_fold: bool = True,
):
    """Masked flagship step for RAGGED clip batches (BASELINE.json:10).

    fn(voice_i16[B,n_pad], bgm_i16[B,n_pad], lengths[B]) -> i16[B,m_pad].
    Clips are zero-padded to a common n_pad; ``lengths`` carries each
    clip's true sample count so fades, the peak scan and the output mask
    ignore pad (SURVEY.md §7.3 "Ragged clip lengths"). Values in
    [0, out_len_i) match the unbatched flagship step on the lone clip.
    """
    sos = _biquad.eq_sos(list(bands), sr_bus)
    ir = _reverb.synthetic_ir(ir_seconds, sr_bus).astype("float32")
    if interpret is None:
        interpret = _interpret_auto()
    ir_comb = _combined_ir(sos, ir, wet, dry) if lti_fold else None
    g = _math.gcd(sr_in, sr_bus)
    L, M = sr_bus // g, sr_in // g

    def step(voice_i16, bgm_i16, lengths):
        from xmtpu.kernels.iir import sosfilt_pallas

        # mixfirst front (see make_flagship_step): the gain/ramp/mask
        # all apply at the bus rate, so mixing at the NATIVE rate and
        # resampling ONCE is exact by LTI commutation and halves the
        # resample rows (measured 129k -> 152k on the flagship chain)
        v = (_convert.pcm16_to_f32(voice_i16)
             + jnp.float32(bgm_gain) * _convert.pcm16_to_f32(bgm_i16))
        v = _resample.polyphase_resample(v, sr_in, sr_bus)
        n = v.shape[-1]
        # per-clip output lengths at the bus rate: ceil(len * L / M).
        # int64: int32 lengths*L wraps negative for clips >= ~304 s at
        # 44.1k->16k (L=160), silently zero-masking the whole clip.
        out_len = -(-(lengths.astype(jnp.int64) * L) // M)  # [B] ceil —
        # parens matter: -(-a*L)//M is floor, dropping the last sample
        # f64 index: f32 arange is exact only below 2^24 (~17 min @16k)
        i = jnp.arange(n, dtype=jnp.float64)[None, :]  # [1, n]
        lenf = out_len.astype(jnp.float64)[:, None]  # [B, 1]
        mask = i < lenf
        fade = float(round(fade_ms * sr_bus / 1000.0))
        if fade > 0:
            ramp = (jnp.minimum((i + 1.0) / fade, 1.0) * jnp.clip(
                (lenf - i) / fade, 0.0, 1.0
            )).astype(jnp.float32)
        else:  # no 0/0 NaN (would poison the peak normalize)
            ramp = jnp.float32(1.0)
        out = v * ramp * mask  # v already carries the mixed bgm
        peak = jnp.max(jnp.abs(out), axis=-1, keepdims=True)  # pad is 0
        # normalize gain folds into the next stage (see the twin
        # comment in make_flagship_step — no HBM pass before the
        # opaque Pallas call)
        scale = jnp.where(
            peak > 0, _mix.db_to_amp(-1.0) / jnp.maximum(peak, 1e-30), 1.0
        )
        use_fused = fused if fused is not None else (
            int(np.prod(out.shape[:-1])) >= 128
        )
        if use_fused:
            k_rel = _limiter._release_coeff(LIM_RELEASE_MS, sr_bus)
            c_att = _limiter._attack_coeff(LIM_ATTACK_MS, sr_bus)
            if ir_comb is not None:
                # LTI fold — see the twin comment in make_flagship_step
                from xmtpu.kernels.envelope import envelope_pallas

                blk, gp = _reverb_block(ir_comb.shape[-1])
                out = _reverb.reverb(out, ir_comb, wet=1.0, dry=0.0,
                                     block=blk, gp=gp, backend="pallas",
                                     interpret=interpret, prescale=scale)
                e2, _ = envelope_pallas(jnp.abs(out), k_rel, c_att,
                                        interpret=interpret)
                out = _limiter.apply_gain_curve(
                    out[..., None, :], e2, threshold_db)[..., 0, :]
                return _convert.f32_to_pcm16(out * mask)
            # reverb-first + fused EQ/envelope kernel — see the twin
            # comment in make_flagship_step (LTI stages commute)
            from xmtpu.kernels.eq_env import eq_env_pallas

            blk, gp = _reverb_block(ir.shape[-1])
            out = _reverb.reverb(out, ir, wet=wet, dry=dry,
                                 block=blk, gp=gp, backend="pallas",
                                 interpret=interpret, prescale=scale)
            y, e2, _, _ = eq_env_pallas(sos, out, k_rel, c_att,
                                        interpret=interpret)
            out = _limiter.apply_gain_curve(
                y[..., None, :], e2, threshold_db)[..., 0, :]
            return _convert.f32_to_pcm16(out * mask)
        out, _ = sosfilt_pallas(sos, out * scale, interpret=interpret)
        out = _reverb.reverb(out, ir, wet=wet, dry=dry,
                             block=_reverb_block(ir.shape[-1])[0],
                             backend="pallas", interpret=interpret)
        out, _ = _limiter.limiter(
            out[..., None, :], sr_bus, threshold_db=threshold_db,
            release_ms=LIM_RELEASE_MS, attack_ms=LIM_ATTACK_MS,
            backend=("pallas_interpret" if interpret else "pallas"),
        )
        return _convert.f32_to_pcm16(out[..., 0, :] * mask)

    return step


def shard_over_batch(n_devices: int | None = None):
    """1-D data-parallel mesh over clips (SURVEY.md §2.2 DP row)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    mesh = jax.sharding.Mesh(np.asarray(devs[:n]), ("dp",))
    return mesh, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec("dp", None)
    )


def flagship_step_sharded(mesh, **kw):
    """Flagship step SPMD over the ``dp`` (clip batch) mesh axis via
    shard_map: each device runs the identical per-shard program (Pallas
    kernels included); no collectives needed for pure DP (SURVEY.md
    §2.2 — peak stats stay per-clip, not global).

    When ``fused`` is not given, the auto decision is made here from
    the GLOBAL (pre-shard) batch shape at trace time — inside shard_map
    the step only sees the per-shard shape, so a >=128 global batch
    sharded into <128-row shards would silently flip to the non-fused
    kernels and match single-chip only to the -80 dB gate instead of
    bit-for-bit (round-2 advisor find)."""
    P = jax.sharding.PartitionSpec

    def spmd(voice_i16, bgm_i16):
        kw2 = dict(kw)
        if kw2.get("fused") is None:
            kw2["fused"] = (
                kw2.get("iir_backend", "pallas") == "pallas"
                and int(np.prod(voice_i16.shape[:-1])) >= 128
            )
        step = make_flagship_step(**kw2)
        return jax.shard_map(
            step, mesh=mesh,
            in_specs=(P("dp", None), P("dp", None)),
            out_specs=P("dp", None),
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )(voice_i16, bgm_i16)

    return jax.jit(spmd)
