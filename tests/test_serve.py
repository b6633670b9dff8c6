"""PoolServer: heterogeneous-config serving over SessionPool buckets.

Reference usage model: one process, many independent xm_audio_utils
handles, each with its OWN config (SURVEY.md §3.2). Tests share server
fixtures and keep configs effect-free + sources at the bus rate so the
pool step programs stay tiny (the axon suite pays a remote compile per
distinct program — CLAUDE.md budget rule).
"""

from __future__ import annotations

import numpy as np
import pytest

import xmtpu  # noqa: F401
from xmtpu import PoolServer
from xmtpu.config.schema import PipelineConfig, TrackConfig
from xmtpu.graph.streaming import StreamSession
from xmtpu.utils.errors import ConfigError, XmtpuError

from .conftest import rms_db

SR = 16000


def _cfg(volume: float = 1.0) -> PipelineConfig:
    return PipelineConfig(
        tracks=(TrackConfig(url="v", volume=volume, fade_in_ms=30.0),),
        sample_rate=SR, normalize=None,
    )


def _src(rng, seconds: float = 0.5) -> dict:
    # clip to ±0.9 full scale: 0.3·σ noise crosses ±1.0 about once per
    # 1.2k samples, and a clipped-at-i16 sample breaks the
    # volume-linearity assertion below by ~1000 LSBs (the session-scoped
    # rng makes which draws land here depend on suite order — this
    # failed at −59.9 dB in one full-suite ordering, −85.9 standalone)
    pcm = (0.3 * rng.standard_normal(int(SR * seconds))).astype(np.float32)
    return {"v": (pcm.clip(-0.9, 0.9), SR)}


@pytest.fixture(scope="module")
def server():
    # ONE shared server -> most tests reuse one compiled pool step
    return PoolServer(n_slots=2, frame_ms=20.0, max_seconds=1.0)


def test_read_matches_independent_session(server, rng):
    srcs = [_src(rng), _src(rng)]
    sids = [server.open(_cfg(), s) for s in srcs]
    sess = StreamSession(_cfg(), frame_ms=20.0, sources=srcs[1])
    got = server.read(sids[1], 4)
    ref = np.concatenate([sess.read() for _ in range(4)], axis=0)
    assert got.shape == ref.shape
    assert rms_db(got.astype(np.float64) - ref, ref + 1e-12) <= -80.0
    # sid 0 advanced in the same groups: its frames are buffered, and
    # draining them costs no further pool advance
    s0 = server._sessions[sids[0]]
    fi_before = int(s0.pool._frame_idx[s0.slot])
    got0 = server.read(sids[0], 4)
    assert got0.shape == ref.shape and np.any(got0 != 0)
    assert int(s0.pool._frame_idx[s0.slot]) == fi_before
    for sid in sids:
        server.close(sid)


def test_pump_drains_every_session(server, rng):
    sids = [server.open(_cfg(), _src(rng)) for _ in range(2)]
    out = server.pump(2)
    assert set(out) == set(sids)
    for sid in sids:
        assert out[sid].shape[0] == 2 * server._sessions[sid].pool.frame_out
        assert np.any(out[sid] != 0)
    assert server.pump(1).keys() == set(sids)  # cadence continues
    for sid in sids:
        server.close(sid)
    assert server.pump(1) == {}  # nothing open -> nothing produced


def test_eos_short_tail_then_none(server, rng):
    # 0.205 s at 20 ms frames = 10 frames + a 5 ms tail frame
    sid = server.open(_cfg(), _src(rng, seconds=0.205))
    got = server.read(sid, 64)  # asks past the end: returns what exists
    assert got.shape[0] == 11 * server._sessions[sid].pool.frame_out
    assert server.at_end(sid)
    assert server.read(sid) is None  # reference get_frame <= 0 analogue
    server.close(sid)


def test_seek_drops_stale_buffer(server, rng):
    src = _src(rng)
    sids = [server.open(_cfg(), src), server.open(_cfg(), _src(rng))]
    server.read(sids[1], 3)  # sid 0 now has 3 stale frames buffered
    server.seek(sids[0], 0.0)
    assert server.stats()["buffered_frames"][sids[0]] == 0
    sess = StreamSession(_cfg(), frame_ms=20.0, sources=src)
    got = server.read(sids[0], 2)
    ref = np.concatenate([sess.read() for _ in range(2)], axis=0)
    assert rms_db(got.astype(np.float64) - ref, ref + 1e-12) <= -80.0
    for sid in sids:
        server.close(sid)


def test_close_frees_slot_for_reuse(server, rng):
    a = server.open(_cfg(), _src(rng))
    b = server.open(_cfg(), _src(rng))
    pools_before = server.stats()["pools"]
    server.close(a)
    c = server.open(_cfg(), _src(rng))  # reuses a's slot, no new pool
    assert server.stats()["pools"] == pools_before
    assert np.any(server.read(c, 1) != 0)
    with pytest.raises(XmtpuError, match="unknown session"):
        server.read(a)
    server.close(b)
    server.close(c)


def test_per_client_files_share_one_pool(server, rng):
    # THE serving shape: same pipeline, each client its own audio. The
    # step program never reads the url, so these must ride ONE pool
    # (urls used to be part of the bucket key: every client founded its
    # own K-slot pool and compiled a fresh step)
    cfg_w = PipelineConfig(
        tracks=(TrackConfig(url="w", volume=1.0, fade_in_ms=30.0),),
        sample_rate=SR, normalize=None,
    )
    src_w = {"w": ((0.3 * rng.standard_normal(SR // 2))
                   .astype(np.float32), SR)}
    a = server.open(_cfg(), _src(rng))
    pools_before = server.stats()["pools"]
    b = server.open(cfg_w, src_w)  # different url, same pipeline
    assert server.stats()["pools"] == pools_before
    sa, sb = server._sessions[a], server._sessions[b]
    assert sa.pool is sb.pool
    # and the joiner's audio was re-keyed correctly: b's output matches
    # an independent session over ITS OWN source
    got = server.read(b, 3)
    sess = StreamSession(cfg_w, frame_ms=20.0, sources=src_w)
    ref = np.concatenate([sess.read() for _ in range(3)], axis=0)
    assert rms_db(got.astype(np.float64) - ref, ref + 1e-12) <= -80.0
    server.close(a)
    server.close(b)


def test_heterogeneous_configs_bucket_separately(server, rng):
    src = _src(rng)
    a = server.open(_cfg(volume=1.0), src)
    b = server.open(_cfg(volume=0.5), src)  # different step program
    st = server.stats()
    assert st["buckets"] >= 2
    ga = server.read(a, 2).astype(np.float64)
    gb = server.read(b, 2).astype(np.float64)
    # same audio through both: the 0.5x config is ~6 dB down, not equal
    assert rms_db(gb - 0.5 * ga, ga + 1e-12) <= -80.0
    server.close(a)
    server.close(b)
    # released bucket machinery can be dropped once idle
    assert server.release_idle_pools() >= 1


def test_pool_growth_capacity_and_laggard(rng):
    srv = PoolServer(n_slots=1, frame_ms=20.0, max_buffer_frames=2)
    a = srv.open(_cfg(), _src(rng, seconds=0.3))
    b = srv.open(_cfg(), _src(rng, seconds=0.3))  # pool full -> grow
    assert srv.stats()["pools"] == 2
    srv.close(a)  # pool 1 now has a free slot sized for 0.3 s clips
    # a clip beyond that capacity must fall through the join refusal
    # (validated before mutation) and found a correctly-sized pool
    c = srv.open(_cfg(), _src(rng, seconds=0.9))
    assert srv.stats()["pools"] == 3
    assert np.any(srv.read(c, 1) != 0)
    srv.close(b)
    srv.close(c)
    # laggard refusal: n_slots=1 pools never co-buffer, so grow one
    # pool to 2 sessions via the shared-bucket path
    srv2 = PoolServer(n_slots=2, frame_ms=20.0, max_buffer_frames=2)
    x = srv2.open(_cfg(), _src(rng))
    y = srv2.open(_cfg(), _src(rng))
    srv2.read(x, 2)  # y now holds 2 unread frames == the cap
    with pytest.raises(XmtpuError, match="unread frames"):
        srv2.read(x, 1)
    srv2.read(y, 2)  # draining the laggard unblocks the pool
    assert np.any(srv2.read(x, 1) != 0)


def test_duplicate_file_urls_without_overrides(server, rng, tmp_path):
    # two tracks sharing one file url, NO sources dict: sources are
    # keyed by url, so one decoded entry must serve both tracks (the
    # old fallback handed the pool sources=None and refused with
    # "needs sources for slot 0")
    from xmtpu.io import write_wav

    p = str(tmp_path / "bed.wav")
    write_wav(p, (6000 * rng.standard_normal(SR // 2))
              .clip(-32768, 32767).astype(np.int16), SR)
    cfg = PipelineConfig(
        tracks=(TrackConfig(url=p, volume=0.5),
                TrackConfig(url=p, volume=0.5)),
        sample_rate=SR, normalize=None,
    )
    sid = server.open(cfg, None)
    got = server.read(sid, 2)
    assert got is not None and np.any(got != 0)
    server.close(sid)


def test_buffered_frames_do_not_pin_group_buffer(server, rng):
    # a laggard's buffered frames must be views into ITS OWN copied row,
    # not into the whole (K, k*frame, ch) group fetch (K x memory
    # amplification per buffered frame otherwise)
    sids = [server.open(_cfg(), _src(rng)) for _ in range(2)]
    server.read(sids[1], 3)  # sid 0 buffers 3 frames it hasn't read
    s0 = server._sessions[sids[0]]
    f = s0.pool.frame_out
    for frame in s0.frames:
        root = frame.base if frame.base is not None else frame
        # the root buffer is one session's (<=3*f, ch) row copy, not the
        # 3-D (K, 3*f, ch) group fetch
        assert root.ndim == 2
        assert root.nbytes <= 3 * f * frame.shape[1] * frame.itemsize
    for sid in sids:
        server.close(sid)


def test_server_dp_mesh_parity(rng):
    """Sharded serving == single-device serving (SURVEY.md §2.2 DP row
    through the PoolServer front end: every pool it founds rides the
    mesh)."""
    from .test_pool import _dp_mesh

    mesh, ndp = _dp_mesh()
    srcs = [_src(rng) for _ in range(ndp)]
    srv = PoolServer(n_slots=ndp, frame_ms=20.0, mesh=mesh)
    sids = [srv.open(_cfg(), s) for s in srcs]
    assert srv.stats()["pools"] == 1
    for sid, src in zip(sids, srcs):
        got = srv.read(sid, 3).astype(np.float64)
        sess = StreamSession(_cfg(), frame_ms=20.0, sources=src)
        ref = np.concatenate([sess.read() for _ in range(3)], axis=0)
        assert rms_db(got - ref.astype(np.float64), ref + 1e-12) <= -80.0
    with pytest.raises(ConfigError, match="divide evenly"):
        PoolServer(n_slots=ndp + 1, mesh=mesh)
    with pytest.raises(ConfigError, match="no axis"):
        PoolServer(n_slots=ndp, mesh=mesh, mesh_axis="tp")


def test_server_thread_safety_open_close_during_reads(rng):
    """One thread reads its own session while another churns open/
    close/seek — including co-resident slots in the reader's own pool
    and a second bucket. The server lock must keep every read
    consistent: no exceptions, stable shapes, correct bookkeeping."""
    import threading

    srv = PoolServer(n_slots=4, frame_ms=20.0, max_seconds=1.0,
                     max_buffer_frames=4096)
    loop_cfg = PipelineConfig(
        tracks=(TrackConfig(url="v", loop=True),),  # reader never ends
        sample_rate=SR, normalize=None,
    )
    src = _src(rng)
    r = srv.open(loop_cfg, src)
    errs: list = []
    stop = threading.Event()

    def churn():
        try:
            for i in range(20):
                sid = srv.open(loop_cfg, _src(rng))  # reader's pool
                other = srv.open(_cfg(volume=0.5), _src(rng))  # 2nd bucket
                srv.seek(sid, 20.0 * (i % 3))
                srv.close(sid)
                srv.close(other)
        except Exception as e:  # noqa: BLE001 — surface to main thread
            errs.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=churn)
    t.start()
    outs = []
    while not stop.is_set():
        outs.append(srv.read(r, 2))
    t.join()
    assert not errs, errs
    assert all(o.shape == outs[0].shape for o in outs)
    assert any(np.any(o != 0) for o in outs)
    st = srv.stats()
    assert st["sessions"] == 1  # every churned session closed cleanly
    srv.close(r)


def test_open_rejects_bad_inputs(server):
    with pytest.raises(ConfigError, match="no tracks"):
        server.open(PipelineConfig(sample_rate=SR), None)
    with pytest.raises(ConfigError, match="PipelineConfig or dict"):
        server.open("nonsense", None)
    with pytest.raises(XmtpuError, match="unknown session"):
        server.seek(10**9, 0.0)
    with pytest.raises(ConfigError, match="max_buffer_frames"):
        server.read(0, k=10**6)  # k-guard fires before the sid lookup
    with pytest.raises(ConfigError, match="max_buffer_frames"):
        server.pump(k=10**6)
